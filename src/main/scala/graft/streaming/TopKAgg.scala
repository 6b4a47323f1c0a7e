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

  override def zero: Seq[T] = Nil

  override def reduce(buf: Seq[T], a: T): Seq[T] = trim(a +: buf)

  override def merge(x: Seq[T], y: Seq[T]): Seq[T] = trim(x ++ y)

  override def finish(buf: Seq[T]): Seq[T] = buf.sorted(ord)

  private def trim(s: Seq[T]): Seq[T] = s.sorted(ord).take(k)

  override def bufferEncoder: Encoder[Seq[T]] = seqEnc
  override def outputEncoder: Encoder[Seq[T]] = seqEnc
}
