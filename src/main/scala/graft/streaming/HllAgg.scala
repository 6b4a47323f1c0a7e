package graft.streaming

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed HyperLogLog register [[Aggregator]]: the streaming twin of the
  * batch HLL (q201), the second mergeable-sketch state class next to
  * [[KmvAgg]]. The buffer is the register file — `m` leading-zero
  * ranks, one per bucket — so state and every shuffle carry exactly
  * `m` ints per key regardless of stream volume, and partials merge
  * EXACTLY (element-wise max: HLL's union identity, which is what lets
  * per-partition/per-batch registers combine without re-scanning).
  *
  * Input is the 60-bit hash (the q201 hash discipline): bucket = low
  * log2(m) bits, rank = (61 − log2(m)) − bit-length of the remaining
  * 60 − log2(m) bits (the full 61 − log2(m) for an all-zero
  * remainder — m = 64 gives the q201 constants, shift 6 / rank base
  * 55). An empty register holds rank 0.
  */
class HllAgg(m: Int)(implicit seqEnc: Encoder[Seq[Int]])
  extends Aggregator[Long, Seq[Int], Seq[Int]] {

  require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two, got $m")
  require(m <= (1 << 30), s"m must leave remainder bits in the 60-bit hash, got $m")
  private val mask = (m - 1).toLong
  private val bucketBits = java.lang.Integer.numberOfTrailingZeros(m)
  private val rhoMax = 61 - bucketBits

  override def zero: Seq[Int] = Seq.fill(m)(0)

  override def reduce(buf: Seq[Int], h: Long): Seq[Int] = {
    val bucket = (h & mask).toInt
    val w = h >>> bucketBits
    val rho =
      if (w == 0L) rhoMax
      else rhoMax - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (buf(bucket) >= rho) buf else buf.updated(bucket, rho)
  }

  override def merge(x: Seq[Int], y: Seq[Int]): Seq[Int] =
    x.lazyZip(y).map(math.max)

  override def finish(buf: Seq[Int]): Seq[Int] = buf

  override def bufferEncoder: Encoder[Seq[Int]] = seqEnc
  override def outputEncoder: Encoder[Seq[Int]] = seqEnc
}
