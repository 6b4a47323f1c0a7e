package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class WarcSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark

  describe("WARC reader (q231)") {
    it("recovers the closed forms through the real framing walk") {
      val a200 = Warc.auditOne(4L, Warc.warcBytes(4L, "hello warc"))
      assert(a200.n_records == 3 && a200.n_request == 1 && a200.n_response == 1)
      assert(a200.uri == "https://site-4.example.org/page/4")
      assert(a200.http_status == 200 && !a200.compressed && a200.parse_ok)
      assert(a200.payload_len == 10L)
      assert(a200.content_type == "text/plain; charset=utf-8")
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest("hello warc".getBytes(UTF_8))
        .map(b => f"$b%02x").mkString
      assert(a200.payload_sha256 == hex)

      val a404 = Warc.auditOne(13L, Warc.warcBytes(13L, "ignored body"))
      assert(a404.http_status == 404 && a404.payload_len == 10L &&
        a404.compressed && a404.parse_ok)
    }

    it("yields identical audits for the gzip and plain framings") {
      // same id, both framings: only the compressed flag may differ
      val plain = Warc.auditOne(7L, Warc.warcBytes(6L, "same text") /* 6 = plain */)
      val gz = Warc.auditOne(7L, Warc.warcBytes(7L, "same text") /* 7 = gzipped */)
      assert(!plain.compressed && gz.compressed)
      // ids differ in the URI closed form, so compare the parse-shape
      // and payload fields that must be framing-invariant
      assert((plain.n_records, plain.http_status, plain.payload_len,
        plain.payload_sha256, plain.parse_ok) ==
        (gz.n_records, gz.http_status, gz.payload_len,
          gz.payload_sha256, gz.parse_ok))
    }

    it("inflates multi-member gzip archives (the .warc.gz convention)") {
      val gz = Warc.warcBytes(1L, "member test")
      val flat = Warc.gunzipAll(gz)
      assert(flat.isDefined)
      val (recs, ok) = Warc.parseRecords(flat.get)
      assert(ok && recs.size == 3)
      assert(recs.map(_.warcType) == List("warcinfo", "request", "response"))
    }

    it("quarantines hostile Content-Length without allocating") {
      val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "Content-Length: 9999999999\r\n\r\n").getBytes(UTF_8)
      val a = Warc.auditOne(1L, rec)
      assert(!a.parse_ok && a.n_records == 0)
    }

    it("keeps records framed before a truncation and flags the file") {
      val whole = Warc.warcBytes(2L, "truncate me")
      val cut = whole.take(whole.length - 40) // cut into the response
      val a = Warc.auditOne(2L, cut)
      assert(!a.parse_ok)
      assert(a.n_records >= 1) // warcinfo (+ request) still framed
    }

    it("quarantines non-WARC bytes and corrupt gzip") {
      assert(!Warc.auditOne(3L, "HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8)).parse_ok)
      val corrupt = Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3, 4, 5)
      assert(!Warc.auditOne(3L, corrupt).parse_ok)
    }

    it("audits the fixture corpus distributed and matches auditOne") {
      val rows = Warc.warcIngest(spark, TestSpark.Sf).collect()
      assert(rows.length == 500)
      assert(rows.forall(_.getAs[Boolean]("parse_ok")))
      val docs = Tables.documents(spark, TestSpark.Sf)
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val spot = rows.take(20)
      spot.foreach { r =>
        val id = r.getAs[Long]("doc_id")
        val one = Warc.auditOne(id, Warc.warcBytes(id, docs(id)))
        assert(r.getAs[String]("payload_sha256") == one.payload_sha256)
        assert(r.getAs[String]("uri") == one.uri)
      }
    }
  }
}
