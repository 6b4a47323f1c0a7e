package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Compiled (scalac, not Janino) bodies for the codebook kernels below.
  * The generated code calls these static forwarders INSTEAD of inlining
  * the nested loops: the q136 r13 decomposition found the PQ map stage
  * (8 subspaces × 2 kernel call sites + slices + struct writers in ONE
  * `generate_doConsume` method) exceeded the JVM's 8,000-bytecode
  * DontCompileHugeMethods limit, so HotSpot silently refused to JIT it
  * and the whole stage ran in the bytecode interpreter (~0.9 s/task for
  * 2,000 rows; ~0.35 s once JIT-able — proven by an A/B under
  * `-XX:-DontCompileHugeMethods`). A one-line static call per site
  * keeps the consume method small, and these bodies JIT once, shared
  * by every plan.
  */
object VecKernels {
  /** Spark's SQL double comparison (SQLOrderingUtil.compareDoubles):
    * IEEE `==` first (so -0.0 equals 0.0), else java.lang.Double.compare
    * (so NaN sorts greatest). array_min/array_max/array_position all
    * order doubles this way — the argmin/argmax kernels below must use
    * the SAME comparator to keep first-min/first-max tie indices
    * bit-identical to the composed form.
    */
  @inline private def cmp(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** First-max cell of dot(v, cb[k]) — single pass, ≡
    * `array_position(s, array_max(s)) - 1` over codebookScores output.
    * -1 on an empty codebook (unreachable: model codebooks are
    * non-empty literals).
    */
  def argmaxDotCell(v: ArrayData, cb: ArrayData): Int = {
    val k = cb.numElements()
    var bestIdx = -1
    var best = 0.0
    var j = 0
    while (j < k) {
      val c = cb.getArray(j)
      val n = math.min(v.numElements(), c.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * c.getDouble(i); i += 1 }
      if (bestIdx < 0 || cmp(dot, best) > 0) { best = dot; bestIdx = j }
      j += 1
    }
    bestIdx
  }

  /** First-min cell of (−2·dot(v, cb[k]) + cc[k]) — single pass, ≡
    * `array_position(s, array_min(s)) - 1` over adcCellScores output.
    */
  def argminAdcCell(v: ArrayData, cb: ArrayData, cc: ArrayData): Int = {
    val k = cb.numElements()
    var bestIdx = -1
    var best = 0.0
    var j = 0
    while (j < k) {
      val ck = cb.getArray(j)
      val n = math.min(v.numElements(), ck.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * ck.getDouble(i); i += 1 }
      val s = -2.0 * dot + cc.getDouble(j)
      if (bestIdx < 0 || cmp(s, best) < 0) { best = s; bestIdx = j }
      j += 1
    }
    bestIdx
  }

  def codebookScores(v: ArrayData, cb: ArrayData): UnsafeArrayData = {
    val k = cb.numElements()
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val c = cb.getArray(j)
      val n = math.min(v.numElements(), c.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * c.getDouble(i); i += 1 }
      out(j) = dot
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def adcCellScores(v: ArrayData, cb: ArrayData, cc: ArrayData): UnsafeArrayData = {
    val k = cb.numElements()
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val ck = cb.getArray(j)
      val n = math.min(v.numElements(), ck.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * ck.getDouble(i); i += 1 }
      out(j) = -2.0 * dot + cc.getDouble(j)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Fused codebook scoring: `out[k] = dot(v, cb[k])` for every centroid
  * of a (model-constant, literal) codebook, as ONE tight compiled loop
  * per row ([[VecKernels.codebookScores]], called from the generated
  * code).
  *
  * Why custom (guide §4 — eliminate non-codegen expressions in the hot
  * path): the composed form `transform(sequence(0, K-1), k ->
  * dot_product(v, cb[k+1]))` is a higher-order function, which never
  * enters whole-stage codegen — every row walks K interpreted
  * expression trees (lambda-variable rebinding + boxed eval per
  * centroid). And see [[VecKernels]] for why the loop is a static call
  * rather than inlined Janino code: inlining 16 of these loops pushed
  * the stage's consume method past the JVM's 8,000-bytecode JIT limit
  * and the whole stage de-compiled to the bytecode interpreter.
  *
  * Determinism: element k is the same sequential left-fold dot product
  * [[DotProduct]] computes (`dot += v_i · c_i` from 0.0, i ascending),
  * and the output array is built in ascending k — bit-identical to the
  * composed form, so assignment argmin/argmax boundaries and every
  * downstream mean are unchanged.
  *
  * Edge semantics: null if either input is null; per-element lengths
  * clamp to the shorter array (as [[DotProduct]]); the codebooks here
  * are literal `Seq[Seq[Double]]`, which cannot carry nulls.
  */
case class CodebookScores(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<DOUBLE>, ARRAY<ARRAY<DOUBLE>>), " +
          s"got ${l.sql} and ${r.sql}")
    }
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "codebook_scores"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.codebookScores(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) =>
      s"${ev.value} = graft.plans.VecKernels.codebookScores($v, $cb);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodebookScores =
    copy(left = newLeft, right = newRight)
}

/** Fused PQ/ADC cell scoring: `out[k] = -2.0 · dot(v, cb[k]) + cc[k]`
  * — the Euclidean-argmin score (`||v−c||² − v·v`, the row-constant
  * `v·v` cancelled) the PQ trainer and encoder both evaluate per
  * subspace. Same motivation, loop shape and IEEE op order as
  * [[CodebookScores]] (`(-2.0 · dot) + cc[k]`, exactly the composed
  * `lit(-2.0) * dot_product(...) + element_at(cc, ...)` tree it
  * replaces).
  */
case class AdcCellScores(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _),
          ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<DOUBLE>, ARRAY<ARRAY<DOUBLE>>, " +
          s"ARRAY<DOUBLE>), got ${a.sql}, ${b.sql} and ${c.sql}")
    }
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "adc_cell_scores"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    VecKernels.adcCellScores(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb, cc) =>
      s"${ev.value} = graft.plans.VecKernels.adcCellScores($v, $cb, $cc);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): AdcCellScores =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Fused first-max assignment: the cell index `argmax_k dot(v, cb[k])`
  * as ONE compiled pass ([[VecKernels.argmaxDotCell]]) — replaces the
  * three-expression chain `array_position(codebook_scores(v, cb),
  * array_max(codebook_scores(v, cb))) - 1`, which (a) evaluated the
  * K-dot kernel TWICE per row (the scores subtree is duplicated and
  * Generate/Project consume paths get no subexpression elimination) and
  * (b) walked array_min/array_position's interpreted per-element
  * ordering loops. Same comparator as those expressions
  * ([[VecKernels.cmp]] ≡ SQLOrderingUtil.compareDoubles), same
  * first-occurrence tie index — value-identical.
  */
case class CodebookArgmaxCell(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<DOUBLE>, ARRAY<ARRAY<DOUBLE>>), " +
          s"got ${l.sql} and ${r.sql}")
    }
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "codebook_argmax_cell"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.argmaxDotCell(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) =>
      s"${ev.value} = graft.plans.VecKernels.argmaxDotCell($v, $cb);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodebookArgmaxCell =
    copy(left = newLeft, right = newRight)
}

/** Fused first-min ADC assignment: the cell index
  * `argmin_k (-2·dot(v, cb[k]) + cc[k])` as ONE compiled pass
  * ([[VecKernels.argminAdcCell]]) — the Euclidean-argmin twin of
  * [[CodebookArgmaxCell]], replacing
  * `array_position(adc_cell_scores(..), array_min(adc_cell_scores(..)))
  * - 1`. Same comparator, same first-occurrence tie index —
  * value-identical.
  */
case class AdcArgminCell(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _),
          ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<DOUBLE>, ARRAY<ARRAY<DOUBLE>>, " +
          s"ARRAY<DOUBLE>), got ${a.sql}, ${b.sql} and ${c.sql}")
    }
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "adc_argmin_cell"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    VecKernels.argminAdcCell(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb, cc) =>
      s"${ev.value} = graft.plans.VecKernels.argminAdcCell($v, $cb, $cc);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): AdcArgminCell =
    copy(first = newFirst, second = newSecond, third = newThird)
}
