package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.{Seed => ScSeed}
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark
import graft.plans.GraftFunctions

/** Property tests: the one-pass TextCore kernels are bit-identical to
  * the compositional Spark forms they replaced (split/transform/
  * explode/groupBy), on arbitrary strings — including unicode,
  * repeated/mixed whitespace, empties, and duplicate shingles. This is
  * the guard behind the "same values, 100× less work" claim: the
  * kernels may be fast, but they must never drift from the built-ins
  * the DuckDB oracle mirrors.
  */
class TextCorePropSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val wordGen = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf("a", "B", "ü", "Σσ", "ß", "x y", "", " ", "\t", "0"),
    Gen.listOfN(3, Gen.choose('!', '~')).map(_.mkString))
  private val textGen: Gen[String] = Gen.oneOf(
    Gen.const(""),
    Gen.const("   "),
    Gen.const("one"),
    Gen.listOf(wordGen).map(_.mkString(" ")),
    Gen.listOf(wordGen).map(_.mkString("  ")),
    // duplicate-heavy: exercises distinct-shingle dedup + multiset paths
    Gen.listOfN(6, Gen.oneOf("dup", "dup", "other")).map(_.mkString(" ")))

  private def sample(n: Int): Seq[String] =
    (1 to n).flatMap(i => textGen.apply(Gen.Parameters.default, ScSeed(i.toLong)))

  private def docs(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  describe("TextCore kernels vs compositional built-ins") {
    val texts = sample(120)

    it("minhash_sig equals grouped MIN over exploded salted shingle hashes") {
      GraftFunctions.register(spark)
      val df = docs(texts)
      val native = df.select(col("doc_id"),
          call_function("minhash_sig", col("text")).as("mh"))
        .where(col("mh").isNotNull)
        .select(col("doc_id"), posexplode(col("mh")).as(Seq("j", "h")))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val sh = df
        .select(col("doc_id"),
          explode(TextFns.shingles2(TextFns.toks(col("text")))).as("s"))
        .select(col("doc_id"), TextFns.hash60(col("s")).as("h"))
      val composed = TextCore.XorSalts.zipWithIndex.map { case (salt, j) =>
        sh.groupBy("doc_id")
          .agg(min(col("h").bitwiseXOR(lit(salt))).as("mh"))
          .select(col("doc_id"), lit(j).as("j"), col("mh"))
      }.reduce(_ union _)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(native == composed)
    }

    it("sorted_shingle_hashes equals sorted hash60 over distinct shingles") {
      GraftFunctions.register(spark)
      val df = docs(texts)
      val native = df.select(col("doc_id"),
          call_function("sorted_shingle_hashes", col("text")).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val composed = df
        .select(col("doc_id"),
          explode(array_distinct(TextFns.shingles2(TextFns.toks(col("text"))))).as("s"))
        .select(col("doc_id"), TextFns.hash60(col("s")).as("h"))
        .collect().groupBy(_.getLong(0))
        .map { case (id, rs) => id -> rs.map(_.getLong(1)).sorted.toSeq }
      // docs with no shingles: kernel gives empty array, explode gives no rows
      native.foreach { case (id, sh) =>
        assert(sh == composed.getOrElse(id, Seq.empty), s"doc $id")
      }
    }

    it("simhash32 equals the exploded bit-vote aggregation") {
      GraftFunctions.register(spark)
      val df = docs(texts)
      val native = df.select(col("doc_id"),
          call_function("simhash32", col("text")).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val th = df
        .select(col("doc_id"), explode(TextFns.toks(col("text"))).as("tok"))
        .select(col("doc_id"), TextFns.hash32(col("tok")).as("h"))
      val votes = (0 until 32).map(b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b"))
      val sig = (0 until 32)
        .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _)
      val composed = th.groupBy("doc_id").agg(votes.head, votes.tail: _*)
        .select(col("doc_id"), sig.as("sig"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(native == composed)
    }

    it("sorted_intersect_count equals the equi-join match count") {
      val gen = Gen.listOf(Gen.choose(0L, 12L))
      val pairs = (1 to 60).map { i =>
        val a = gen.apply(Gen.Parameters.default, ScSeed(i.toLong)).get.sorted
        val b = gen.apply(Gen.Parameters.default, ScSeed((i + 1000).toLong)).get.sorted
        (a, b)
      }
      pairs.foreach { case (a, b) =>
        val expected = a.flatMap(x => b.filter(_ == x)).size.toLong
        val got = TextCore.sortedIntersectCount(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray),
          new org.apache.spark.sql.catalyst.util.GenericArrayData(b.toArray))
        assert(got == expected, s"a=$a b=$b")
      }
    }
  }
}
