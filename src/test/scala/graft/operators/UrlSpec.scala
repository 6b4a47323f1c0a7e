package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class UrlSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Html.canonicalUrl(col("u"))).as[String].collect().toSeq

  describe("URL canonicalization (q235)") {
    it("normalizes case, default ports, fragments, tracking params, slashes") {
      assert(canon(
        "HTTPS://WWW.SITE3.COM:443/a/5?r=2&q=1#frag",
        "https://www.site3.com/a/5/?q=1&r=2&utm_source=feed",
        "http://host.org:80/x?b=2&a=1&fbclid=abc",
        "http://host.org/x?a=1&b=2") == Seq(
        "https://www.site3.com/a/5?q=1&r=2",
        "https://www.site3.com/a/5?q=1&r=2",
        "http://host.org/x?a=1&b=2",
        "http://host.org/x?a=1&b=2"))
    }

    it("keeps non-default ports, root paths, and empty queries distinct") {
      assert(canon(
        "https://h.io:8080/p?x=1",
        "http://h.io:443/p", // 443 is NOT http's default
        "https://h.io/",
        "https://h.io/p/") == Seq(
        "https://h.io:8080/p?x=1",
        "http://h.io:443/p",
        "https://h.io",
        "https://h.io/p"))
    }

    it("canonicalizes every fixture URL to its analytic identity") {
      // the oracle identity, asserted Spark-side: real parse_url
      // normalization of the messy closed form == the analytic canon
      val docs = graft.sources.Tables.documents(spark, TestSpark.Sf)
      val id = col("doc_id")
      val analytic = concat(
        when(id % 9 === 0, lit("http")).otherwise(lit("https")),
        lit("://www.site"), (id % 40).cast("string"), lit(".com/a/"),
        (id % 20).cast("string"), lit("?q="), (id % 5).cast("string"),
        lit("&r=2"))
      val bad = docs.select(Html.canonicalUrl(Html.rawUrl).as("c"),
        analytic.as("a")).filter(col("c") =!= col("a")).count()
      assert(bad == 0L)
    }

    it("audits per-source duplicate mass with consistent counts") {
      val rows = Html.urlCanonical(spark, TestSpark.Sf).collect()
      assert(rows.map(_.getAs[Long]("n_docs")).sum == 500L)
      rows.foreach { r =>
        assert(r.getAs[Long]("n_canon") <= r.getAs[Long]("n_raw"))
        assert(r.getAs[Long]("n_raw") <= r.getAs[Long]("n_docs"))
      }
      // residue collisions guarantee real dup mass on 500 docs
      assert(rows.map(_.getAs[Long]("n_dup_docs")).sum > 0L)
    }
  }
}
