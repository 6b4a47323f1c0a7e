package graft.functions

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class BlocklistSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark

  private def brute(s: String, p: String): Long =
    (0 to s.length - p.length).count(i => s.startsWith(p, i)).toLong

  describe("Aho-Corasick blocklist kernel (q233)") {
    it("no phrase has a self-border (the oracle-equality precondition)") {
      // a proper prefix equal to a suffix would make every-occurrence
      // counting diverge from the oracle's non-overlapping replace census
      Blocklist.Patterns.foreach { case (_, p) =>
        (1 until p.length).foreach { k =>
          assert(p.take(k) != p.takeRight(k), s"self-border in '$p' at $k")
        }
      }
      // and no phrase is a substring of another (keeps counts independent)
      for ((_, a) <- Blocklist.Patterns; (_, b) <- Blocklist.Patterns
           if a != b) assert(!b.contains(a), s"'$a' inside '$b'")
    }

    it("matches a brute-force occurrence count on adversarial strings") {
      val phrases = Blocklist.Patterns.map(_._2)
      val cases = Seq(
        "buy nowbuy now buy now",
        "click here click here and click her",
        "tracking pixeltracking pixel",
        "utm_source=utm_source=x",
        "wire transfer of a lottery winner act immediately",
        "buy nobuy now limited offe limited offer",
        "", "b", "buy no",
        phrases.mkString(""), phrases.mkString(" "),
        phrases.reverse.mkString("buy"))
      val rng = new scala.util.Random(42)
      val words = phrases.flatMap(_.split(" ")) ++ Seq("data", "row", "x")
      val fuzz = (0 until 50).map(_ =>
        (0 until 30).map(_ => words(rng.nextInt(words.size))).mkString(" "))
      (cases ++ fuzz).foreach { s =>
        val got = Blocklist.countAll(s).toSeq
        val want = phrases.map(p => brute(s, p))
        assert(got == want, s"mismatch on '${s.take(60)}'")
      }
    }

    it("reports contiguous class ranges covering the whole list") {
      val total = Blocklist.ClassRanges.map(_._3).sum
      assert(total == Blocklist.Patterns.size)
      assert(Blocklist.ClassRanges.map(_._1) == Seq("promo", "scam", "tracking"))
    }

    it("screens the corpus distributed, agreeing with a local replay") {
      import graft.operators.TextAnalysis
      val rows = TextAnalysis.blocklistScreen(spark, TestSpark.Sf).collect()
      assert(rows.map(_.getAs[Long]("n_docs")).sum == 500L)
      assert(rows.map(_.getAs[Long]("n_flagged")).sum > 0L)
      // local replay of the planted-arm closed form
      def arm(id: Long): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"bl|$id".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        java.lang.Long.parseLong(hex.take(8), 16) % TextAnalysis.BlArmMod
      }
      def cls(c: String) = Blocklist.Patterns.filter(_._1 == c).map(_._2)
      val docs = graft.sources.Tables.documents(spark, TestSpark.Sf)
        .select("doc_id", "source", "text").collect()
      val local = docs.map { r =>
        val id = r.getLong(0)
        val plant = arm(id) match {
          case 0 => " " + cls("promo")((id % 6).toInt)
          case 1 => " " + cls("scam")((id % 4).toInt)
          case 2 => " " + cls("tracking")((id % 3).toInt)
          case _ => ""
        }
        (r.getString(1), Blocklist.countAll(r.getString(2) + plant).sum)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      rows.foreach { r =>
        val s = r.getAs[String]("source")
        val tot = r.getAs[Long]("promo_hits") + r.getAs[Long]("scam_hits") +
          r.getAs[Long]("tracking_hits")
        assert(tot == local(s), s"source $s")
      }
    }
  }
}
