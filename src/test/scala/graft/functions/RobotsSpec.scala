package graft.functions

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class RobotsSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark

  private def pol(txt: String, agent: String = "graftbot") =
    Robots.parse(txt, agent)

  describe("RFC 9309 evaluation (q237)") {
    it("selects the agent's own group over the catch-all") {
      val txt = "User-agent: graftbot\nDisallow: /x/\n\n" +
        "User-agent: *\nDisallow: /\n"
      assert(Robots.allowed(pol(txt), "/ok"))
      assert(!Robots.allowed(pol(txt), "/x/page"))
      // unknown agent falls back to * (everything blocked)
      assert(!Robots.allowed(pol(txt, "otherbot"), "/ok"))
      // agent match is case-insensitive
      assert(Robots.allowed(pol(txt, "GraftBot"), "/ok"))
    }

    it("resolves conflicts by longest match, allow winning ties") {
      val txt = "User-agent: graftbot\n" +
        "Disallow: /private/\nAllow: /private/open/\n"
      val p = pol(txt)
      assert(!Robots.allowed(p, "/private/secret"))
      assert(Robots.allowed(p, "/private/open/doc"))
      assert(Robots.allowed(p, "/elsewhere"))
      // exact tie: allow wins
      val tie = pol("User-agent: graftbot\nDisallow: /a/\nAllow: /a/\n")
      assert(Robots.allowed(tie, "/a/x"))
    }

    it("treats rules as string prefixes (the /a/1 vs /a/12 trap)") {
      val p = pol("User-agent: graftbot\nDisallow: /a/1\n")
      assert(!Robots.allowed(p, "/a/1"))
      assert(!Robots.allowed(p, "/a/12"))
      assert(!Robots.allowed(p, "/a/1.json"))
      assert(Robots.allowed(p, "/a/2"))
      assert(Robots.allowed(p, "/a/21"))
    }

    it("matches * wildcards and $ end anchors") {
      val p = pol("User-agent: graftbot\nDisallow: /*.json$\n")
      assert(!Robots.allowed(p, "/a/1.json"))
      assert(Robots.allowed(p, "/a/1.jsonl")) // anchored: must END there
      assert(Robots.allowed(p, "/a/1"))
      val mid = pol("User-agent: graftbot\nDisallow: /a/*/tmp\n")
      assert(!Robots.allowed(mid, "/a/x/tmp"))
      assert(!Robots.allowed(mid, "/a/x/tmp/deeper"))
      assert(Robots.allowed(mid, "/a/x/t"))
      val anchoredPair = pol("User-agent: graftbot\nDisallow: /d*x$\n")
      assert(!Robots.allowed(anchoredPair, "/dax"))
      assert(!Robots.allowed(anchoredPair, "/dxax")) // later x closes it
      assert(Robots.allowed(anchoredPair, "/daxy"))
    }

    it("parses tolerantly: comments, case, empty disallow, shared groups") {
      val txt = "# header\nUSER-AGENT: graftbot # inline\n" +
        "user-agent: otherbot\nDISALLOW: /x/\nDisallow:\n" +
        "Crawl-Delay: 4\n"
      val p = pol(txt)
      assert(!Robots.allowed(p, "/x/1"))
      assert(Robots.allowed(p, "/y")) // empty Disallow matches nothing
      assert(p.crawlDelay.contains(4))
      // the shared group also governs otherbot
      assert(!Robots.allowed(pol(txt, "otherbot"), "/x/1"))
    }

    it("audits the fixture corpus, agreeing with a local replay") {
      import graft.operators.Html
      val rows = Html.robotsAudit(spark, TestSpark.Sf).collect()
      assert(rows.map(_.getAs[Long]("n_docs")).sum == 500L)
      val blocked = rows.map(_.getAs[Long]("n_blocked")).sum
      // local replay of the closed form
      val docs = graft.sources.Tables.documents(spark, TestSpark.Sf)
        .select("doc_id").collect().map(_.getLong(0))
      val want = docs.count { id =>
        (id % 20 == id % 5) || (id % 5 == 1 && id % 20 >= 10) ||
          (id % 4 == 0 && id % 11 == 0)
      }.toLong
      assert(blocked == want && blocked > 0L && blocked < 500L)
    }
  }
}
