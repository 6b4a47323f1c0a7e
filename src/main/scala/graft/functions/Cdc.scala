package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (the CDC family behind rsync, LBFS, and
  * FastCDC): chunk boundaries are chosen by the CONTENT of a sliding
  * window — a boundary falls wherever the window's hash clears a
  * divisor — so inserting or deleting bytes shifts only the chunks
  * that actually changed, while every chunk after the next content
  * boundary re-aligns. Fixed-grid chunking (q58's token grid) loses
  * alignment at the first insertion and re-hashes the whole tail;
  * this is the primitive that makes storage-level dedup and dataset
  * versioning work under edits.
  *
  * The boundary rule here is STATELESS (every window position is
  * tested independently; no FastCDC min/max clamp) so the DuckDB
  * oracle can replay it exactly with a position spine + lag window.
  * The window hash is the engine's shared md5-prefix `hash32` idiom —
  * chosen for cross-engine gate exactness; a production deployment
  * would swap in a rolling Rabin polynomial with the SAME plan shape
  * (the kernel is one pass either way).
  */
object Cdc {

  /** Window width (chars) and the boundary divisor (expected chunk
    * length ≈ [[Divisor]] chars).
    */
  val Window = 8
  val Divisor = 64

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 8 md5 hex chars as an unsigned 32-bit long — the Scala twin
    * of `TextFns.hash32` / the oracle's hex-cast idiom.
    */
  def hash32Str(s: String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Boundary positions of `s`: every b = i + [[Window]] with
    * i ∈ [0, n − Window − 1] whose window `s[i, i+Window)` hashes to
    * 0 mod [[Divisor]] (strictly interior: b ≤ n − 1).
    */
  def boundaries(s: String): Seq[Int] = {
    val n = s.length
    val out = Seq.newBuilder[Int]
    var i = 0
    while (i + Window <= n - 1) {
      if (hash32Str(s.substring(i, i + Window)) % Divisor == 0)
        out += i + Window
      i += 1
    }
    out.result()
  }

  /** Hashes of the chunks `[0,b1), [b1,b2), …, [bk, n)` — the
    * expression kernel (one pass per row from generated code).
    */
  def chunkHashes(t: UTF8String): ArrayData = {
    val s = t.toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var start = 0
    boundaries(s).foreach { b =>
      out += hash32Str("ch|" + s.substring(start, b))
      start = b
    }
    if (n > start) out += hash32Str("ch|" + s.substring(start, n))
    new GenericArrayData(out.toArray)
  }
}
