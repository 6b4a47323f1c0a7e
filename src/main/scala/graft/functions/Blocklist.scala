package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern blocklist matching via an Aho-Corasick automaton
  * (Aho & Corasick, CACM 1975) — the classic "bad phrase" content
  * screen every public web-corpus pipeline runs (C4's blocklist filter
  * is exactly this shape). One pass over the document finds EVERY
  * occurrence of EVERY phrase simultaneously: the automaton's goto/
  * fail/output structure makes the scan O(|text| + hits) regardless of
  * how many phrases the list carries, where a per-phrase `contains`
  * loop pays O(|text|·|phrases|) — the difference between one corpus
  * pass and dozens at 100 TB.
  *
  * The automaton is built once per JVM from [[Patterns]] and read-only
  * thereafter — the executor-side equivalent of broadcasting a
  * compiled matcher. The phrases are chosen with NO self-border (no
  * proper prefix equal to a suffix), so every-occurrence counting
  * (this kernel) coincides with left-to-right non-overlapping counting
  * (the oracle's `replace`-based census) and the DuckDB gate is exact.
  */
object Blocklist {

  /** (class, phrase) blocklist. Order is the array index the kernel
    * reports counts under.
    */
  val Patterns: IndexedSeq[(String, String)] = IndexedSeq(
    "promo" -> "buy now",
    "promo" -> "limited offer",
    "promo" -> "free shipping",
    "promo" -> "click here",
    "promo" -> "subscribe today",
    "promo" -> "best price",
    "scam" -> "wire transfer",
    "scam" -> "lottery winner",
    "scam" -> "act immediately",
    "scam" -> "guaranteed income",
    "tracking" -> "utm_source=",
    "tracking" -> "doubleclick",
    "tracking" -> "tracking pixel")

  /** Index ranges of each class inside [[Patterns]] (firstIdx, len). */
  val ClassRanges: Seq[(String, Int, Int)] = {
    val byClass = Patterns.zipWithIndex.groupBy(_._1._1)
    Seq("promo", "scam", "tracking").map { c =>
      val idx = byClass(c).map(_._2)
      require(idx.max - idx.min + 1 == idx.size, s"class $c not contiguous")
      (c, idx.min, idx.size)
    }
  }

  private final class Node {
    val next = new java.util.HashMap[Character, Integer]()
    var fail: Int = 0
    var out: List[Int] = Nil
  }

  /** goto/fail/output automaton; nodes(0) is the root. */
  private val nodes: IndexedSeq[Node] = {
    val ns = scala.collection.mutable.ArrayBuffer(new Node)
    Patterns.map(_._2).zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        val nx = ns(s).next.get(c)
        s = if (nx != null) nx.intValue
        else {
          ns += new Node
          ns(s).next.put(c, ns.size - 1)
          ns.size - 1
        }
      }
      ns(s).out ::= pi
    }
    // BFS fail links: a node's fail target is strictly shallower, so
    // its output list is final before any deeper node reads it
    val q = new java.util.ArrayDeque[Integer]()
    ns(0).next.values.forEach { v => ns(v.intValue).fail = 0; q.add(v) }
    while (!q.isEmpty) {
      val u = q.poll().intValue
      ns(u).next.forEach { (c, v) =>
        q.add(v)
        var f = ns(u).fail
        while (f != 0 && !ns(f).next.containsKey(c)) f = ns(f).fail
        val fn = ns(f).next.get(c)
        val fv = if (fn != null && fn.intValue != v.intValue) fn.intValue else 0
        ns(v.intValue).fail = fv
        ns(v.intValue).out = ns(v.intValue).out ++ ns(fv).out
      }
    }
    ns.toIndexedSeq
  }

  /** Per-pattern occurrence counts over `t` — the expression kernel
    * (one static call per row from generated code).
    */
  def hitCounts(t: UTF8String): ArrayData =
    new GenericArrayData(countAll(t.toString))

  def countAll(s: String): Array[Long] = {
    val counts = new Array[Long](Patterns.length)
    var st = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      while (st != 0 && !nodes(st).next.containsKey(c)) st = nodes(st).fail
      val nx = nodes(st).next.get(c)
      st = if (nx != null) nx.intValue else 0
      var o = nodes(st).out
      while (o.nonEmpty) { counts(o.head) += 1; o = o.tail }
      i += 1
    }
    counts
  }
}
