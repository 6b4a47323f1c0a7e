package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}
import org.scalatest.funspec.AnyFunSpec

/** Pins the r8 lesson as an invariant: NO gated query may emit a
  * DecimalType output column (at any nesting depth). DECIMAL(38,0) is
  * the right internal accumulator for exact wide sums, but the
  * driver's result hasher canonicalizes wide decimals through a
  * precision-losing path — in r8 the only three DECIMAL(38,0)-emitting
  * queries (q161/q162/q167) were the only hash-gate reds while passing
  * rows+schema and the repo's own checker at both scales. Wide exact
  * values must ship as hi/lo BIGINT halves ([[graft.functions.Wide]])
  * or strings; decimals stay behind the final projection.
  */
class SchemaGateSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private def hasDecimal(t: DataType): Boolean = t match {
    case _: DecimalType => true
    case a: ArrayType => hasDecimal(a.elementType)
    case m: MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
    case s: StructType => s.fields.exists(f => hasDecimal(f.dataType))
    case _ => false
  }

  it("flags a deliberately-decimal schema (the gate is live)") {
    val df = spark.range(1)
      .select(sum(col("id").cast(DecimalType(38, 0))).as("wide"))
    assert(df.schema.fields.exists(f => hasDecimal(f.dataType)))
    val nested = spark.range(1)
      .select(array(col("id").cast(DecimalType(20, 0))).as("v"))
    assert(nested.schema.fields.exists(f => hasDecimal(f.dataType)))
  }

  it("no gated query emits a DecimalType output column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, mk) =>
        val bad = mk(spark, sf).schema.fields
          .collect { case f if hasDecimal(f.dataType) => f.name }
        if (bad.isEmpty) Nil else Seq(s"$name -> ${bad.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"decimal output columns break the driver's hash gate (ship " +
        s"hi/lo BIGINT halves via graft.functions.Wide instead): " +
        offenders.mkString("; "))
  }
}
