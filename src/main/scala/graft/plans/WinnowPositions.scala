package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Winnowing selection over a k-gram hash array: for each w-wide window
  * keep the position of its LEFTMOST minimum, deduplicated — the
  * selection step of q84 as one generated loop.
  *
  * Why custom: the composed form runs an interpreted `transform` lambda
  * per window that slices a fresh w-element array, scans it twice
  * (`array_min` + `array_position`), then `array_distinct`s the result —
  * measured ~75% of q84's cost at sf0.1. This kernel is a single pass
  * with no allocations beyond the output buffer.
  *
  * Determinism: identical selection to the composed form (leftmost
  * minimum per window). Dedup-by-adjacency equals `array_distinct`
  * here because selected positions are non-decreasing in j: window j+1
  * drops only index j, and every index strictly between j and the old
  * selection held a strictly larger hash (else it would have been the
  * leftmost min), so the new selection is either the old position or
  * the newly entered index.
  *
  * Null in → null out; fewer than w hashes → empty array.
  */
case class WinnowPositions(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT>, INT), got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_positions"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val kh = a.asInstanceOf[ArrayData]
    val w = b.asInstanceOf[Int]
    val n = kh.numElements()
    if (n < w) return new GenericArrayData(new Array[Long](0))
    val out = new Array[Long](n - w + 1)
    var m = 0
    var last = -1L
    var j = 0
    while (j <= n - w) {
      var best = j
      var k = j + 1
      while (k < j + w) {
        if (kh.getLong(k) < kh.getLong(best)) best = k
        k += 1
      }
      if (best != last) { out(m) = best; m += 1; last = best }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (kh, w) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val last = ctx.freshName("last")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val best = ctx.freshName("best")
      s"""
         |int $n = $kh.numElements();
         |long[] $out = new long[$n >= $w ? $n - $w + 1 : 0];
         |int $m = 0;
         |long $last = -1L;
         |for (int $j = 0; $j + $w <= $n; $j++) {
         |  int $best = $j;
         |  for (int $k = $j + 1; $k < $j + $w; $k++) {
         |    if ($kh.getLong($k) < $kh.getLong($best)) $best = $k;
         |  }
         |  if ($best != $last) { $out[$m++] = $best; $last = $best; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($out, $m));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WinnowPositions =
    copy(left = newLeft, right = newRight)
}
