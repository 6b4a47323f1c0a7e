package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.util.{ArrayData, CollationFactory, CollationSupport, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass tokenize→shingle→hash kernels backing graft's native text
  * expressions (`minhash_sig`, `minhash_band_keys`,
  * `sorted_shingle_hashes`, `simhash32`).
  *
  * Why this exists: the compositional form —
  * `explode(transform(sequence(...), i => concat(element_at(split(...), i))))`
  * — runs interpreted (higher-order functions never enter codegen), and
  * projection collapse inlines the `split` into every `element_at`, so
  * each shingle re-splits the document and `String.split` recompiles its
  * regex `Pattern` per call. Thread dumps at sf0.1 showed ~90 pattern
  * compiles per document per evaluation; these kernels do one split and
  * one md5 per shingle, called once per row from generated code.
  *
  * Oracle parity (bit-exact with the DuckDB SQL twins in
  * [[graft.operators.Dedup]]):
  *  - tokens = `split(lower(trim(text)), '\\s+')`: `UTF8String.trim`
  *    (0x20 only) then `CollationSupport.Lower.exec` with UTF8_BINARY and
  *    the session's `spark.sql.icu.caseMappings.enabled` — the exact
  *    runtime path of Spark's default-collation `lower()` under either
  *    conf value — then a precompiled `\\s+` Java regex with limit -1,
  *    the same call `UTF8String.split` makes per row.
  *  - hashes are md5 prefixes: first 15 hex chars as a 60-bit long
  *    (≡ `conv(substring(md5(s),1,15),16,10)`), first 8 as a 32-bit
  *    unsigned (≡ `conv(substring(md5(s),1,8),16,10)`), computed
  *    directly from the digest bytes.
  */
object TextCore {

  /** MinHash family size (keep in sync with Dedup.NumHashes). */
  val NumHashes = 8

  /** Bands over the signature (NumBands * RowsPerBand == NumHashes). */
  val NumBands = 4
  val RowsPerBand = 2

  /** Deterministic xor salts: one base 60-bit hash per shingle, then
    * `min(h ⊕ salt_j)` per signature — one md5 per shingle instead of
    * [[NumHashes]]. md5-derived so the oracle embeds identical literals.
    */
  val XorSalts: Array[Long] = Array.tabulate(NumHashes) { j =>
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"mhsalt$j".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private val Whitespace = Pattern.compile("\\s+")
  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val HexChars = "0123456789abcdef".toCharArray

  /** `split(lower(trim(text)), "\\s+")` — same value path as the Spark
    * built-ins, with the regex compiled once per JVM. `useICU` is the
    * session's `spark.sql.icu.caseMappings.enabled` captured by the
    * calling expression (exactly like Spark's `Lower` does), so the
    * kernels stay bit-identical to the compositional built-ins even on a
    * session with ICU case mapping disabled (ß, final sigma, …).
    */
  def tokens(text: UTF8String, useICU: Boolean): Array[String] = {
    val lowered = CollationSupport.Lower.exec(
      text.trim(), CollationFactory.UTF8_BINARY_COLLATION_ID, useICU)
    Whitespace.split(lowered.toString, -1)
  }

  /** First 15 hex chars of the digest as a 60-bit non-negative long. */
  private def take60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** First 8 hex chars of the digest as a 32-bit unsigned long. */
  private def take32(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)

  /** 60-bit hash of the word bigram `a + " " + b` (no string concat —
    * the digest is fed the exact UTF-8 bytes `md5(concat(...))` sees).
    */
  private def shingleHash60(md: MessageDigest, a: String, b: String): Long = {
    md.update(a.getBytes("UTF-8"))
    md.update(' '.toByte)
    md.update(b.getBytes("UTF-8"))
    take60(md.digest())
  }

  /** MinHash signature: `mh_j = min over shingles of (h60 ⊕ salt_j)`.
    * Null when the document has no bigram shingles (< 2 tokens) — the
    * doc then contributes no LSH bands, matching the grouped-aggregate
    * formulation where it simply has no shingle rows.
    */
  def minhashSig(text: UTF8String, useICU: Boolean): ArrayData = {
    val w = tokens(text, useICU)
    if (w.length < 2) return null
    val md = mdLocal.get()
    val mh = Array.fill(NumHashes)(Long.MaxValue)
    var i = 0
    while (i < w.length - 1) {
      val h = shingleHash60(md, w(i), w(i + 1))
      var j = 0
      while (j < NumHashes) {
        val s = h ^ XorSalts(j)
        if (s < mh(j)) mh(j) = s
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mh)
  }

  /** 32-char lowercase md5 hex of a string's UTF-8 bytes. */
  private def md5Hex(md: MessageDigest, s: String): UTF8String = {
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) & 0xf0) >> 4).toByte
      out(2 * i + 1) = HexChars(d(i) & 0x0f).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** LSH band keys: element b is
    * `md5(concat_ws('|', mh(2b), mh(2b+1)))` over the decimal renderings
    * of the signature values — identical to the SQL band arms. Null when
    * the doc has no shingles (posexplode then yields no rows).
    */
  def minhashBandKeys(text: UTF8String, useICU: Boolean): ArrayData = {
    val sig = minhashSig(text, useICU)
    if (sig == null) return null
    val md = mdLocal.get()
    val keys = new Array[UTF8String](NumBands)
    var b = 0
    while (b < NumBands) {
      val sb = new java.lang.StringBuilder(44)
      var r = 0
      while (r < RowsPerBand) {
        if (r > 0) sb.append('|')
        sb.append(sig.getLong(RowsPerBand * b + r))
        r += 1
      }
      keys(b) = md5Hex(md, sb.toString)
      b += 1
    }
    new GenericArrayData(keys.asInstanceOf[Array[Any]])
  }

  /** Sorted 60-bit hashes of the document's *distinct* bigram shingle
    * strings (dedup before hashing, like
    * `explode(array_distinct(shingles))` then `hash60`; a 60-bit
    * collision between two distinct shingles keeps both entries, exactly
    * like the exploded stream it replaces). Empty for < 2 tokens.
    */
  def sortedShingleHashes(text: UTF8String, useICU: Boolean): ArrayData = {
    val w = tokens(text, useICU)
    if (w.length < 2) return new GenericArrayData(Array.emptyLongArray)
    val md = mdLocal.get()
    val seen = new java.util.HashSet[String](math.max(8, w.length * 2))
    var arr = new Array[Long](w.length - 1)
    var n = 0
    var i = 0
    while (i < w.length - 1) {
      val s = w(i) + " " + w(i + 1)
      if (seen.add(s)) {
        arr(n) = shingleHash60(md, w(i), w(i + 1))
        n += 1
      }
      i += 1
    }
    if (n < arr.length) arr = java.util.Arrays.copyOf(arr, n)
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  /** SimHash over 32-bit token hashes: per-bit majority vote (+1 set,
    * −1 clear), bit b of the result set iff the vote is positive.
    * `split` of a trimmed-empty string yields one "" token, which is
    * hashed like any other — same as exploding the token array.
    */
  def simhash32(text: UTF8String, useICU: Boolean): Long = {
    val w = tokens(text, useICU)
    val md = mdLocal.get()
    val votes = new Array[Int](32)
    var i = 0
    while (i < w.length) {
      val h = take32(md.digest(w(i).getBytes("UTF-8")))
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** SimHash over 60-bit token hashes — the WIDE-signature dial of the
    * q238 Hamming join's scale story: at 32 bits the r+1 pigeonhole
    * slices are 8-bit (256 buckets) and slice-bucket occupancy — hence
    * candidate fan-out — grows with corpus size past ~10⁵ docs; 60
    * bits give 15-bit slices (32k buckets), pushing the same geometry
    * two orders of magnitude further. Same per-bit majority vote as
    * [[simhash32]], over [[take60]] token hashes.
    */
  def simhash60(text: UTF8String, useICU: Boolean): Long = {
    val w = tokens(text, useICU)
    val md = mdLocal.get()
    val votes = new Array[Int](60)
    var i = 0
    while (i < w.length) {
      val h = take60(md.digest(w(i).getBytes("UTF-8")))
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Count of matching element pairs between two sorted long arrays,
    * multiset-style: a value occurring `ca` times in `a` and `cb` times
    * in `b` contributes `ca * cb` — exactly the row count an equi-join
    * of the two exploded streams would produce.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var count = 0L
    while (i < n && j < m) {
      val av = a.getLong(i)
      val bv = b.getLong(j)
      if (av < bv) i += 1
      else if (av > bv) j += 1
      else {
        var ca = 0L
        while (i < n && a.getLong(i) == av) { ca += 1; i += 1 }
        var cb = 0L
        while (j < m && b.getLong(j) == av) { cb += 1; j += 1 }
        count += ca * cb
      }
    }
    count
  }

  /** q82 kernel: maximal runs of duplicated gram positions in one pass.
    * `kh` is a doc's per-position gram hashes (document order), `dup`
    * the SORTED global duplicated-gram set (broadcast). A position is
    * duplicated when its hash binary-searches into `dup`; consecutive
    * duplicated positions chain into maximal runs. Each run is packed
    * as `(start << 32) | endPos` (both fit: positions are token
    * indexes) — the caller unpacks and adds the gram width to get span
    * token length, keeping this kernel width-agnostic.
    */
  def dupSpanRuns(kh: ArrayData, dup: ArrayData): ArrayData = {
    val n = kh.numElements()
    val m = dup.numElements()
    val out = new Array[Long](math.min(n, (n + 1) / 2 + 1))
    var cnt = 0
    var runStart = -1
    var prev = -2
    var p = 0
    while (p < n) {
      val h = kh.getLong(p)
      // binary search in the sorted dup set
      var lo = 0
      var hi = m - 1
      var found = false
      while (lo <= hi && !found) {
        val mid = (lo + hi) >>> 1
        val v = dup.getLong(mid)
        if (v == h) found = true
        else if (v < h) lo = mid + 1
        else hi = mid - 1
      }
      if (found) {
        if (p != prev + 1) {
          if (runStart >= 0) { out(cnt) = (runStart.toLong << 32) | prev.toLong; cnt += 1 }
          runStart = p
        }
        prev = p
      }
      p += 1
    }
    if (runStart >= 0) { out(cnt) = (runStart.toLong << 32) | prev.toLong; cnt += 1 }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }
  /** NFC normalization (the `nfc_normalize` expression's kernel):
    * returns the INPUT object untouched on the already-normalized fast
    * path (the overwhelmingly common case — `Normalizer.isNormalized`
    * is a cheap quick-check scan for ASCII/latin text), else the
    * composed form. Canonical composition only — NFC never changes
    * meaning, unlike NFKC's compatibility folding.
    */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
