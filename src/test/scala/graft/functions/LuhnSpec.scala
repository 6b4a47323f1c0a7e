package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class LuhnSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark

  private def counts(s: String): (Long, Long) = {
    val a = Luhn.counts(UTF8String.fromString(s))
    (a.getLong(0), a.getLong(1))
  }

  describe("Luhn PAN validation (q239)") {
    it("validates the textbook example and rejects single-digit damage") {
      // the classic worked example from the algorithm's description
      assert(Luhn.isValid("79927398713", 0, 11))
      assert(!Luhn.isValid("79927398714", 0, 11))
      // check-digit completion round-trips
      val body = Seq(7, 9, 9, 2, 7, 3, 9, 8, 7, 1)
      val c = Luhn.checkDigit(body)
      assert(Luhn.isValid(body.mkString + c.toString, 0, 11))
    }

    it("counts only MAXIMAL 16-digit runs") {
      val valid = graft.operators.TextAnalysis.Pans(3)
      assert(counts(s"pay $valid now") == ((1L, 1L)))
      // 17 digits: not a PAN
      assert(counts(s"pay ${valid}7 now") == ((0L, 0L)))
      // 15 digits: not a PAN
      assert(counts(s"pay ${valid.drop(1)} now") == ((0L, 0L)))
      // two runs, one broken
      val broken = graft.operators.TextAnalysis.BrokenPans(3)
      assert(counts(s"$valid and $broken") == ((2L, 1L)))
      assert(counts("no digits at all") == ((0L, 0L)))
      // run at string boundaries
      assert(counts(valid) == ((1L, 1L)))
    }

    it("every fixture PAN is valid and every broken twin is not") {
      graft.operators.TextAnalysis.Pans.foreach { p =>
        assert(p.length == 16 && Luhn.isValid(p, 0, 16))
      }
      graft.operators.TextAnalysis.BrokenPans.foreach { p =>
        assert(p.length == 16 && !Luhn.isValid(p, 0, 16))
      }
    }

    it("audits the corpus distributed with arm-exact counts") {
      import graft.operators.TextAnalysis
      val rows = TextAnalysis.luhnAudit(spark, TestSpark.Sf).collect()
      assert(rows.map(_.getAs[Long]("n_docs")).sum == 500L)
      val shaped = rows.map(_.getAs[Long]("n_pan_shaped")).sum
      val valid = rows.map(_.getAs[Long]("n_luhn_valid")).sum
      assert(shaped > 0L && valid > 0L && valid < shaped)
      // local arm replay
      def arm(id: Long): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"luhn|$id".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        java.lang.Long.parseLong(hex.take(8), 16) % TextAnalysis.LuhnMod
      }
      val ids = graft.sources.Tables.documents(spark, TestSpark.Sf)
        .select("doc_id").collect().map(_.getLong(0))
      assert(shaped == ids.count(id => arm(id) <= 1).toLong)
      assert(valid == ids.count(id => arm(id) == 0).toLong)
    }
  }
}
