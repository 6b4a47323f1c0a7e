package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC/1.0 (ISO 28500) web-archive ingestion — the wire format every
  * web-scale training corpus starts from (Common Crawl publishes
  * nothing else), and the one source family the engine lacked: before
  * a byte of text analysis can run, the pipeline must walk
  * Content-Length-framed records, split the stored HTTP message, and
  * digest the payload.
  *
  * Framing (ISO 28500 §4): a record is a `WARC/1.0` version line,
  * CRLF-terminated named headers, a blank line, exactly
  * `Content-Length` content octets, then a CRLF CRLF record separator.
  * Response records store the raw HTTP message
  * (`application/http;msgtype=response`), so the payload is recovered
  * by splitting the message at its own blank line. The `.warc.gz`
  * convention compresses EACH RECORD as its own gzip member and
  * concatenates the members — that is what makes petabyte archives
  * record-addressable without decompressing a whole file, and the
  * reader here consumes multi-member streams exactly as written.
  *
  * Scale shape: parsing is pure per-file map work — no shuffle until
  * the audit's presentation sort; at 100 TB each executor walks its
  * own archive splits and only audit-grain rows move. Hostile framing
  * (Content-Length past the extent, truncated headers, non-WARC bytes)
  * quarantines via `parse_ok=false` after extent checks that run
  * BEFORE any allocation or slice, so a poisoned archive cannot OOM an
  * executor (the q213 fMP4 discipline).
  *
  * The fixture corpus (one synthetic archive per document, the doc's
  * text as the 200-response body, closed-form URI/status, odd ids
  * per-record-gzipped) is regenerated analytically by the DuckDB
  * oracle, so every gated value must survive the real framing walk,
  * gzip-member decode, HTTP split, and SHA-256 digest — nothing is
  * echoed.
  */
object Warc {

  /** Fixture closed forms (the oracle mirrors these in SQL). */
  val WarcDate = "2026-01-01T00:00:00Z"
  def uriOf(id: Long): String = s"https://site-${id % 97}.example.org/page/$id"
  def statusOf(id: Long): Int = if (id % 13 == 0) 404 else 200
  def payloadOf(id: Long, text: String): String =
    if (id % 13 == 0) "not found\n" else text
  def compressedOf(id: Long): Boolean = id % 2 == 1

  /** One framed WARC record: version line, headers, blank line,
    * `body` verbatim, record separator.
    */
  private def record(typ: String, id: Long, uri: Option[String],
      contentType: String, body: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $typ\r\n")
    sb.append(f"WARC-Record-ID: <urn:uuid:00000000-0000-4000-8000-$id%012d>\r\n")
    sb.append(s"WARC-Date: $WarcDate\r\n")
    uri.foreach(u => sb.append(s"WARC-Target-URI: $u\r\n"))
    sb.append(s"Content-Type: $contentType\r\n")
    sb.append(s"Content-Length: ${body.length}\r\n")
    sb.append("\r\n")
    val out = new ByteArrayOutputStream
    out.write(sb.toString.getBytes(UTF_8))
    out.write(body)
    out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  private def gzipMember(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream
    val gz = new GZIPOutputStream(bos)
    gz.write(b)
    gz.close()
    bos.toByteArray
  }

  /** The synthetic archive for doc `id`: warcinfo + request + response
    * (carrying `text` as the 200 body, or a 404 stub on the id%13 arm),
    * per-record-gzipped on odd ids.
    */
  def warcBytes(id: Long, text: String): Array[Byte] = {
    val uri = uriOf(id)
    val host = s"site-${id % 97}.example.org"
    val info = record("warcinfo", id, None, "application/warc-fields",
      "software: graft-fetcher/1.0\r\n".getBytes(UTF_8))
    val req = record("request", id, Some(uri),
      "application/http;msgtype=request",
      (s"GET /page/$id HTTP/1.1\r\nHost: $host\r\n" +
        "User-Agent: graft\r\n\r\n").getBytes(UTF_8))
    val payload = payloadOf(id, text).getBytes(UTF_8)
    val status = statusOf(id)
    val reason = if (status == 200) "OK" else "Not Found"
    val resp = record("response", id, Some(uri),
      "application/http;msgtype=response",
      (s"HTTP/1.1 $status $reason\r\n" +
        "Content-Type: text/plain; charset=utf-8\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes(UTF_8) ++ payload)
    if (compressedOf(id)) gzipMember(info) ++ gzipMember(req) ++ gzipMember(resp)
    else info ++ req ++ resp
  }

  /** Decompressed-size ceiling per archive: a gzip bomb inflates up to
    * ~1000×, so an unbounded copy loop is an OOM vector — the reader
    * aborts past the ceiling and the record walk quarantines the file.
    */
  val MaxInflatedBytes: Int = 1 << 26

  /** Inflate a (possibly multi-member) gzip stream, size-capped.
    * `GZIPInputStream` consumes concatenated members natively — the
    * `.warc.gz` layout. Returns None on corrupt gzip or cap breach.
    */
  def gunzipAll(raw: Array[Byte]): Option[Array[Byte]] = {
    try {
      val in = new GZIPInputStream(new java.io.ByteArrayInputStream(raw))
      val out = new ByteArrayOutputStream
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        if (out.size + n > MaxInflatedBytes) return None
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }
  }

  /** One parsed record: type, named headers (lower-cased keys), and the
    * content extent [from, until) inside the inflated archive.
    */
  final case class WarcRec(warcType: String, headers: Map[String, String],
      from: Int, until: Int)

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Walk the framed records. Returns the records parsed before the
    * first framing violation plus an ok flag (true iff the whole
    * archive framed cleanly). Every extent is checked BEFORE a slice.
    */
  def parseRecords(bytes: Array[Byte]): (List[WarcRec], Boolean) = {
    val out = List.newBuilder[WarcRec]
    var pos = 0
    var ok = true
    while (ok && pos < bytes.length) {
      val hdrEnd = indexOfCrlfCrlf(bytes, pos)
      if (hdrEnd < 0) ok = false
      else {
        val head = new String(bytes, pos, hdrEnd - pos, UTF_8)
        val lines = head.split("\r\n", -1)
        if (lines.isEmpty || !lines(0).startsWith("WARC/")) ok = false
        else {
          val hs = lines.iterator.drop(1).flatMap { l =>
            val c = l.indexOf(':')
            if (c < 0) None
            else Some(l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim)
          }.toMap
          val lenOk = hs.get("content-length").flatMap(_.toLongOption)
          lenOk match {
            case Some(len) if len >= 0 && hdrEnd + 4 + len <= bytes.length =>
              val from = hdrEnd + 4
              val until = from + len.toInt
              out += WarcRec(hs.getOrElse("warc-type", ""), hs, from, until)
              // record separator: CRLF CRLF (tolerate a clean EOF)
              if (until == bytes.length) pos = until
              else if (until + 4 <= bytes.length &&
                bytes(until) == '\r' && bytes(until + 1) == '\n' &&
                bytes(until + 2) == '\r' && bytes(until + 3) == '\n')
                pos = until + 4
              else { ok = false; pos = until }
            case _ => ok = false
          }
        }
      }
    }
    (out.result(), ok)
  }

  /** One audited archive (the q231 gate row). */
  final case class WarcAudit(doc_id: Long, compressed: Boolean,
      n_records: Int, n_request: Int, n_response: Int, uri: String,
      http_status: Int, content_type: String, payload_len: Long,
      payload_sha256: String, parse_ok: Boolean)

  private def sha256Hex(b: Array[Byte], from: Int, until: Int): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(b, from, until - from)
    md.digest().map(x => f"$x%02x").mkString
  }

  /** Audit one raw archive: inflate if gzipped, walk the records, split
    * the stored HTTP response, digest the payload.
    */
  def auditOne(id: Long, raw: Array[Byte]): WarcAudit = {
    val compressed = raw.length >= 2 &&
      (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b
    val inflated = if (compressed) gunzipAll(raw) else Some(raw)
    inflated match {
      case None =>
        WarcAudit(id, compressed, 0, 0, 0, "", 0, "", 0L, "", parse_ok = false)
      case Some(bytes) =>
        val (recs, framedOk) = parseRecords(bytes)
        val nReq = recs.count(_.warcType == "request")
        val resps = recs.filter(_.warcType == "response")
        val resp = resps.headOption
        val http = resp.flatMap { r =>
          val sep = indexOfCrlfCrlf(bytes, r.from)
          if (sep < 0 || sep + 4 > r.until) None
          else {
            val head = new String(bytes, r.from, sep - r.from, UTF_8)
            val lines = head.split("\r\n", -1)
            val status = lines(0).split(" ") match {
              case parts if parts.length >= 2 => parts(1).toIntOption
              case _ => None
            }
            val ctype = lines.iterator.drop(1).collectFirst {
              case l if l.toLowerCase.startsWith("content-type:") =>
                l.substring("content-type:".length).trim
            }
            status.map(st => (st, ctype.getOrElse(""), sep + 4, r.until))
          }
        }
        http match {
          case Some((st, ct, pFrom, pUntil)) =>
            WarcAudit(id, compressed, recs.size, nReq, resps.size,
              resp.get.headers.getOrElse("warc-target-uri", ""), st, ct,
              (pUntil - pFrom).toLong, sha256Hex(bytes, pFrom, pUntil),
              parse_ok = framedOk)
          case None =>
            WarcAudit(id, compressed, recs.size, nReq, resps.size,
              "", 0, "", 0L, "", parse_ok = false)
        }
    }
  }

  /** Synthetic archive table (the q231 corpus). */
  def payloads(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) => (id, warcBytes(id, t)) }
      .toDF("doc_id", "payload")
  }

  /** q231 — WARC ingestion audit over an explicit archive relation. */
  def auditOf(payloads: DataFrame): Dataset[WarcAudit] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .map { case (id, raw) => auditOne(id, raw) }
  }

  /** q231 — WARC ingestion audit over the synthetic archive corpus. */
  def warcIngest(spark: SparkSession, dir: String): DataFrame =
    auditOf(payloads(spark, dir)).toDF().orderBy("doc_id")
}
