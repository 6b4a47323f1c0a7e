package graft.streaming

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded k-minimum-values sketch [[Aggregator]]: the streaming
  * twin of the batch KMV estimators (q39/q138). The buffer is the
  * sketch — the k smallest DISTINCT hash values seen so far, sorted
  * ascending — so state and every shuffle carry at most k longs per
  * key regardless of stream volume, and partials merge exactly
  * (k-min of a union ≡ k-min of the k-minima, the q138 identity).
  *
  * This is a distinct state CLASS from [[TopKAgg]]: top-k keeps
  * duplicates (two events may tie), a KMV sketch must NOT (the same
  * user's hash arriving a million times is one distinct value), so
  * reduce and merge both deduplicate against the sorted buffer — an
  * O(k) scan-and-splice per update (the TopKAgg posture: k is a small
  * model constant, and the common can't-enter case exits on the first
  * comparison against the buffer tail).
  */
class KmvAgg(k: Int)(implicit seqEnc: Encoder[Seq[Long]])
  extends Aggregator[Long, Seq[Long], Seq[Long]] {

  require(k > 0, s"k must be positive, got $k")

  // Invariant: buffers are sorted ascending, duplicate-free, ≤ k long.

  override def zero: Seq[Long] = Nil

  override def reduce(buf: Seq[Long], a: Long): Seq[Long] =
    if (buf.lengthCompare(k) >= 0 && buf.last <= a) buf
    else {
      val (lo, hi) = buf.span(_ < a)
      if (hi.headOption.contains(a)) buf // already sketched
      else ((lo :+ a) ++ hi).take(k)
    }

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = {
    // linear merge of two sorted distinct runs, dropping cross-side
    // duplicates, stopping at k
    val out = Seq.newBuilder[Long]
    var (xs, ys, n) = (x, y, 0)
    while (n < k && (xs.nonEmpty || ys.nonEmpty)) {
      if (ys.isEmpty || (xs.nonEmpty && xs.head < ys.head)) {
        out += xs.head; xs = xs.tail
      } else if (xs.isEmpty || ys.head < xs.head) {
        out += ys.head; ys = ys.tail
      } else { // equal heads: emit once
        out += xs.head; xs = xs.tail; ys = ys.tail
      }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] = seqEnc
  override def outputEncoder: Encoder[Seq[Long]] = seqEnc
}
