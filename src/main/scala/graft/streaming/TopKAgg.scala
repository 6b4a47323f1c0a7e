package graft.streaming

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k [[Aggregator]]: the `Dataset`/streaming
  * counterpart of the batch whole-operator `graft.plans.TopKPerKey`.
  *
  * Use with `ds.groupByKey(...).agg(new TopKAgg(k).toColumn)` — in
  * batch, or in a streaming aggregation (update/complete mode), where a
  * physical shuffle-limit operator can't apply because state must be
  * mergeable across micro-batches. The buffer IS the answer bound: at
  * most k elements per key ever live in state or cross a shuffle, so
  * partial aggregation ships k rows per key per map side and streaming
  * state stays O(keys · k) regardless of input volume.
  *
  * `ord` orders "best first" (rank 1 = `ord.min`); supply a total order
  * (tie-break key included) for deterministic output, as everywhere
  * else in graft.
  */
class TopKAgg[T](k: Int)(implicit ord: Ordering[T], seqEnc: Encoder[Seq[T]])
  extends Aggregator[T, Seq[T], Seq[T]] {

  require(k > 0, s"k must be positive, got $k")

  // Invariant: every buffer is sorted best-first and has ≤ k elements
  // (zero trivially; reduce/merge preserve it; the encoder round-trip
  // keeps element order). That makes reduce — the per-record hot loop in
  // the streaming state path — O(1) for the common can't-enter case and
  // O(k) list insertion otherwise, instead of re-sorting the whole
  // buffer (O(k log k)) on every input row.

  override def zero: Seq[T] = Nil

  override def reduce(buf: Seq[T], a: T): Seq[T] =
    if (buf.lengthCompare(k) >= 0 && ord.lteq(buf.last, a)) buf
    else {
      val (better, worse) = buf.span(ord.lteq(_, a))
      ((better :+ a) ++ worse).take(k)
    }

  override def merge(x: Seq[T], y: Seq[T]): Seq[T] = {
    // linear merge of two sorted runs, stopping at k
    val out = Seq.newBuilder[T]
    var (xs, ys, n) = (x, y, 0)
    while (n < k && (xs.nonEmpty || ys.nonEmpty)) {
      if (ys.isEmpty || (xs.nonEmpty && ord.lteq(xs.head, ys.head))) {
        out += xs.head; xs = xs.tail
      } else {
        out += ys.head; ys = ys.tail
      }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[T]): Seq[T] = buf

  override def bufferEncoder: Encoder[Seq[T]] = seqEnc
  override def outputEncoder: Encoder[Seq[T]] = seqEnc
}
