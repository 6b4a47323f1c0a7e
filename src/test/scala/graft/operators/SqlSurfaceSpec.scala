package graft.operators

import org.scalatest.funspec.AnyFunSpec

import graft.SparkEntry
import graft.TestSpark

/** Gates the `spark.sql` text surface (SURVEY §3.2: every query in both
  * forms). Each SQL form must be BIT-IDENTICAL to its DataFrame form —
  * schema (names + types) and row values — on the test corpus; the
  * DataFrame forms are in turn driver-gated against the DuckDB oracle,
  * so equality here transitively oracle-gates the SQL surface.
  * Bit-exactness holds because every emitted double is produced by an
  * order-independent or fixed-order formula (int-sum/count rates, exact
  * decimal accumulators, fixed-order fold sums — see
  * graft.functions.Det) and every query ends in a fully tie-broken
  * ORDER BY (or is a ≤1-row aggregate).
  */
class SqlSurfaceSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  it("covers the full catalog minus the documented non-SQL operators") {
    val all = SparkEntry.queries.keySet
    assert(SqlSurface.notSqlExpressible.keySet.subsetOf(all),
      "notSqlExpressible names unknown queries")
    assert(SqlSurface.sql.keySet == all -- SqlSurface.notSqlExpressible.keySet,
      "every catalog query needs a SQL form or a documented exclusion")
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
