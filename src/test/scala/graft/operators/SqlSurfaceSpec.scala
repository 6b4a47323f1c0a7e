package graft.operators

import org.scalatest.funspec.AnyFunSpec

import graft.SparkEntry
import graft.TestSpark

/** Gates the `spark.sql` text surface (SURVEY §3.2: every core query in
  * both forms). Each SQL form must be BIT-IDENTICAL to its DataFrame
  * form — schema (names + types) and row values — on the test corpus;
  * the DataFrame forms are in turn driver-gated against the DuckDB
  * oracle, so equality here transitively oracle-gates the SQL surface.
  * Bit-exactness holds because every double in q01–q16 is produced by an
  * order-independent formula (int-sum/count rates, exact decimal
  * accumulators — see graft.functions.Det) and every query ends in a
  * fully tie-broken ORDER BY.
  */
class SqlSurfaceSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  it("covers exactly the reference surface q01-q16") {
    val expected = (1 to 16).map(i => f"q$i%02d").toSet
    assert(SqlSurface.sql.keySet.map(_.take(3)) == expected)
  }

  SqlSurface.sql.keys.toSeq.sorted.foreach { name =>
    it(s"$name: SQL form matches the DataFrame form bit-exactly") {
      val df = SparkEntry.queries(name)(spark, sf)
      val sq = SqlSurface.run(spark, sf, name)
      assert(
        sq.schema.map(f => (f.name, f.dataType)) ==
          df.schema.map(f => (f.name, f.dataType)),
        "schema drift between SQL and DataFrame forms")
      assert(sq.collect().toSeq == df.collect().toSeq)
    }
  }
}
