package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused int8-quantization statistics over an `ARRAY<DOUBLE>` embedding:
  * returns `[max_abs, dot_ee, dot_eq, dot_qq]` where `q_i =
  * round(x_i / (max_abs/127))` — everything q51's report derives
  * (scale, MSE, reconstruction cosine) in closed form from these four.
  *
  * Why custom: the composed form runs two interpreted higher-order
  * `transform` lambdas (abs-max, then the quantized copy) and
  * materializes the quantized array just to feed three dot products —
  * the last interpreted per-element loop in the vector path. This is
  * two tight generated loops (abs-max pass, then one accumulation pass)
  * with no intermediate array.
  *
  * Determinism: pass 2 accumulates `dot/na/nb` per element in the same
  * statement order as [[CosineSimilarity]]/[[DotProduct]] — each
  * accumulator sees the identical IEEE add sequence, so every derived
  * value is bit-equal to the composed form and the DuckDB oracle.
  * Rounding matches Spark's `round(x, 0)` on doubles exactly
  * (`BigDecimal.valueOf(x).setScale(0, HALF_UP)` — half away from
  * zero, like DuckDB's `round`).
  *
  * Edge semantics: null in → null out; an all-zero or empty vector
  * returns `[0,0,0,0]` (callers filter on `max_abs > 0`, and skipping
  * the second loop avoids `BigDecimal.valueOf(NaN)` from the 0/0
  * scale).
  */
case class QuantizeStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<DOUBLE> argument, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "quantize_stats"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(x.getDouble(i))
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val out = new Array[Double](4)
    out(0) = maxAbs
    if (maxAbs > 0) {
      val scale = maxAbs / 127.0
      var ee = 0.0; var eq = 0.0; var qq = 0.0
      i = 0
      while (i < n) {
        val xi = x.getDouble(i)
        val qi = java.math.BigDecimal.valueOf(xi / scale)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
        eq += xi * qi; ee += xi * xi; qq += qi * qi
        i += 1
      }
      out(1) = ee; out(2) = eq; out(3) = qq
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val maxAbs = ctx.freshName("maxAbs")
      val v = ctx.freshName("v")
      val scale = ctx.freshName("scale")
      val xv = ctx.freshName("xv")
      val qv = ctx.freshName("qv")
      val ee = ctx.freshName("ee")
      val eq = ctx.freshName("eq")
      val qq = ctx.freshName("qq")
      val out = ctx.freshName("out")
      s"""
         |int $n = $x.numElements();
         |double $maxAbs = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = java.lang.Math.abs($x.getDouble($i));
         |  if ($v > $maxAbs) $maxAbs = $v;
         |}
         |double[] $out = new double[4];
         |$out[0] = $maxAbs;
         |if ($maxAbs > 0) {
         |  double $scale = $maxAbs / 127.0;
         |  double $ee = 0.0, $eq = 0.0, $qq = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = $x.getDouble($i);
         |    double $qv = java.math.BigDecimal.valueOf($xv / $scale)
         |      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue();
         |    $eq += $xv * $qv; $ee += $xv * $xv; $qq += $qv * $qv;
         |  }
         |  $out[1] = $ee; $out[2] = $eq; $out[3] = $qq;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeStats =
    copy(child = newChild)
}
