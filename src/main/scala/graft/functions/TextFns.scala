package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text / hashing column builders for the LLM-data-pipeline
  * operators (dedup, text analysis, fingerprinting).
  *
  * Everything here is a pure Catalyst expression — no UDFs — so whole-stage
  * codegen applies and the same logic is expressible as ANSI SQL for the
  * DuckDB oracle (each builder has a 1:1 SQL twin in its operator module).
  *
  * Hashing is md5-based rather than xxhash/murmur because the oracle must
  * reproduce identical values: md5 is the one hash both engines (and any
  * SQL engine) share. At 100 TB scale md5 costs ~2× murmur per call; swap
  * [[hash32]]'s body for `xxhash64` when differential testing is not in
  * the loop — call sites are agnostic.
  */
object TextFns {

  /** Lower-cased whitespace tokens (oracle: regexp_split_to_array). */
  def toks(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Deterministic 32-bit hash of a string as a non-negative long:
    * first 8 hex chars of md5, base-16 → base-10.
    * Oracle: CAST(('0x' || substring(md5(s),1,8)) AS UBIGINT).
    */
  def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** 60-bit variant (15 hex chars) — low collision odds for shingle /
    * fingerprint keys while staying inside a signed 64-bit long on any
    * engine. Oracle: CAST(('0x' || substring(md5(s),1,15)) AS BIGINT).
    */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Word-bigram shingles; empty array when fewer than 2 tokens (guards
    * Spark's `sequence(0, -1)` descending-sequence footgun).
    */
  def shingles2(w: Column): Column =
    when(size(w) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(w) - 2),
        i => concat(element_at(w, i + 1), lit(" "), element_at(w, i + 2))))

  /** MinHash signature value j over a shingle set: the lexicographic min
    * of per-shingle salted md5 digests. Equivalent to k independent hash
    * functions (salt = "mh<j>|"); min over hex strings == min over the
    * 128-bit values they encode.
    */
  def minhash(shingles: Column, j: Int): Column =
    array_min(transform(shingles, s => md5(concat(lit(s"mh$j|"), s))))

  /** Token array with only stop-set members kept (for ratio features). */
  def keepIn(w: Column, set: Seq[String]): Column =
    filter(w, t => t.isInCollection(set))

  /** KMV distinct-count estimate from a k-min sketch over [[hash60]]
    * values: exact below saturation, `(k−1)·2^60 / h_k` above — the
    * ONE estimator q39 and q138 share (the SQL twins restate it per
    * dialect; a convention change must touch those texts too).
    * `(k−1)·2^60` is exact in double for the k's in use (k−1 has few
    * significant bits).
    */
  def kmvEstimate(nK: Column, kthMin: Column, k: Int): Column =
    when(nK < k, nK.cast("double"))
      .otherwise(lit((k - 1).toDouble * 1152921504606846976.0) /
        kthMin.cast("double"))

  /** SQL twins, for building oracle text. */
  object sql {
    val toks = "regexp_split_to_array(lower(trim(text)), '\\s+')"
    def hash32(s: String) = s"CAST(('0x' || substring(md5($s),1,8)) AS UBIGINT)"
    def hash60(s: String) = s"CAST(('0x' || substring(md5($s),1,15)) AS BIGINT)"
    def minhash(shingles: String, j: Int) =
      s"list_min(list_transform($shingles, s -> md5('mh$j|' || s)))"
    def keepIn(w: String, set: Seq[String]) =
      s"list_filter($w, t -> list_contains(${set.mkString("['", "','", "']")}, t))"
  }
}
