package graft.gen

import org.scalacheck.Gen
import org.scalacheck.rng.{Seed => ScSeed}
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark
import graft.operators.SupplierDomain

/** Property tests (SURVEY §5.2): generator-range invariants and risk
  * semantics hold for arbitrary seeds and sizes, not just seed 42.
  * ScalaCheck draws the seeds; each case materializes real Spark plans,
  * so the case count stays small.
  */
class DataGenPropSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark

  private val seedGen = Gen.choose(0L, 1000000L)
  private val seeds: Seq[Long] = (1 to 4).flatMap(i =>
    seedGen.apply(Gen.Parameters.default, ScSeed(i.toLong)))

  private def forAll(gs: Seq[Long])(f: Long => Unit): Unit =
    gs.foreach(seed => withClue(s"seed=$seed: ")(f(seed)))

  private def withClue[A](c: String)(f: => A): A =
    try f catch {
      case e: org.scalatest.exceptions.TestFailedException =>
        throw e.modifyMessage(m => Some(c + m.getOrElse("")))
    }

  describe("DataGen invariants across seeds") {
    it("respects declared value ranges") {
      forAll(seeds) { seed =>
        val s = DataGen.suppliers(spark, 6, seed)
        val po = DataGen.purchaseOrders(spark, 80, 6, seed)
        val d = DataGen.deliveries(po, s, seed)

        s.collect().foreach { r =>
          val fin = r.getAs[Int]("financial_risk_score")
          assert(fin >= 0 && fin <= 100)
          assert(DataGen.Categories.contains(r.getAs[String]("category")))
          assert(DataGen.Countries.contains(r.getAs[String]("country")))
        }
        po.collect().foreach { r =>
          val lead = r.getAs[java.sql.Date]("promised_date").toLocalDate.toEpochDay -
            r.getAs[java.sql.Date]("order_date").toLocalDate.toEpochDay
          assert(lead >= 3 && lead <= 21)
          val q = r.getAs[Int]("quantity_ordered")
          assert(q >= 10 && q <= 500)
        }
        assert(d.count() == 80) // exactly one delivery per PO
      }
    }

    it("keeps risk scores in [0,1] and monotone in performance") {
      forAll(seeds) { seed =>
        val s = DataGen.suppliers(spark, 6, seed)
        val po = DataGen.purchaseOrders(spark, 60, 6, seed)
        val d = DataGen.deliveries(po, s, seed)
        val risk = SupplierDomain.risk(SupplierDomain.kpis(s, po, d)).collect()
        risk.foreach { r =>
          val score = r.getAs[Double]("risk_score")
          assert(score >= 0.0 && score <= 1.0)
          val recomputed = 0.7 * (1.0 - r.getAs[Double]("performance_score")) +
            0.3 * (r.getAs[Int]("financial_risk_score") / 100.0)
          assert(score == recomputed)
        }
        // fill_rate within (0, 1]: partials fill >= 60%
        SupplierDomain.kpis(s, po, d).collect().foreach { r =>
          val fill = r.getAs[Double]("fill_rate")
          assert(fill > 0.0 && fill <= 1.0)
        }
      }
    }
  }
}
