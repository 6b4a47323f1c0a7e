package graft.streaming

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark
import graft.operators.{Events, Similarity}
import graft.sources.Tables

/** Retry-determinism gate: the hash contract claims a gated query's
  * output is stable under re-runs AND under task retry/speculation.
  * This spec proves the failure half: a first-attempt task failure is
  * injected into the scan stage of three representative gated shapes —
  * a window query, a DECIMAL-exact aggregate, and a streaming drain —
  * and the retried run must produce byte-identical rows to the clean
  * run ([[TestSpark]] runs `local[4, 4]`, i.e. `spark.task.maxFailures
  * = 4`, so the injected failure is retried instead of failing the
  * job). A query whose result depended on partition-order or
  * accumulation-order side effects would move here.
  */
class RetryDeterminismSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  /** The failure injection: partition 0's FIRST attempt throws, every
    * retry passes the rows through untouched. Each fresh task (new
    * stage, new micro-batch) starts again at attempt 0, so every job
    * that computes this stage exercises one real retry.
    */
  private def flaky(df: DataFrame): DataFrame = {
    implicit val enc: Encoder[Row] = Encoders.row(df.schema)
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
        RetryDeterminismSpec.injections.incrementAndGet()
        throw new RuntimeException("injected first-attempt task failure")
      }
      it
    }
  }

  /** Proves the injection actually fired inside `f` (an accumulator
    * would drop failed-task updates; tests run in-process under local
    * mode, so a JVM-static counter sees them).
    */
  private def assertInjected(f: => Unit): Unit = {
    val before = RetryDeterminismSpec.injections.get()
    f
    assert(RetryDeterminismSpec.injections.get() > before,
      "the failure injection never fired — the retry gate would be vacuous")
  }

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  describe("gated outputs under injected task failure (maxFailures=4)") {
    it("q28 event windows: the window query is retry-invariant") {
      val clean = canon(Events.eventWindowsFrom(Tables.events(spark, sf)))
      assertInjected {
        val retried =
          canon(Events.eventWindowsFrom(flaky(Tables.events(spark, sf))))
        assert(retried == clean)
      }
    }

    it("q61 k-means training: the DECIMAL-exact aggregate is retry-invariant") {
      val clean = canon(Similarity.kmeansTrainFrom(Tables.embeddings(spark, sf)))
      assertInjected {
        val retried = canon(
          Similarity.kmeansTrainFrom(flaky(Tables.embeddings(spark, sf))))
        assert(retried == clean)
      }
    }

    it("q49 windowed-rate drain: the streaming pipeline is retry-invariant") {
      EventStream.drain(
        EventStream.windowedRates(EventStream.source(spark, sf)),
        "graft_retry_clean")
      val cleanRows = canon(spark.table("graft_retry_clean"))
      assertInjected {
        EventStream.drain(
          EventStream.windowedRates(flaky(EventStream.source(spark, sf))),
          "graft_retry_flaky")
      }
      val retriedRows = canon(spark.table("graft_retry_flaky"))
      assert(cleanRows.nonEmpty)
      assert(retriedRows == cleanRows)
    }
  }
}

object RetryDeterminismSpec {
  /** JVM-static injection counter (see [[RetryDeterminismSpec.assertInjected]]). */
  val injections = new java.util.concurrent.atomic.AtomicLong(0)
}
