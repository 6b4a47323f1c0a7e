package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, Decimal, DecimalType}

/** Native vector-sum aggregate: component-wise exact sum of
  * `array<decimal(38,12)>` columns.
  *
  * Why a custom aggregate: Spark has no built-in array-sum, so the usual
  * workaround is `posexplode` → `groupBy(key, pos)` → re-assemble with
  * `sort_array(collect_list(...))` — the shuffle carries dim× the rows
  * and the re-assembly adds a second exchange. This aggregate keeps ONE
  * fixed-size buffer per (partition, group) on the map side and the
  * exchange carries one array per group per partition — the same
  * partial/final contract as any built-in agg, so AQE and two-phase
  * aggregation apply unchanged.
  *
  * Why decimal: the repo-wide determinism rule (graft.functions.Det) —
  * double addition is order-dependent across partitions, exact
  * DECIMAL(38,12) sums are not, so results hash-match a single-threaded
  * oracle and re-runs at any parallelism. The input cast
  * `array<double> → array<decimal(38,12)>` is done by Catalyst at the
  * call site (identical semantics to the oracle's per-element CAST);
  * the buffer holds unscaled BigIntegers (scale pinned at 12).
  */
case class VectorSumDec(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[BigInteger]]
    with UnaryLike[Expression] {

  private val elemType = DecimalType(38, 12)

  override def dataType: DataType = ArrayType(elemType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_sum_dec"

  override def createAggregationBuffer(): Array[BigInteger] = null

  override def update(buffer: Array[BigInteger], input: InternalRow): Array[BigInteger] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return buffer
    val n = arr.numElements()
    val b = if (buffer == null) Array.fill(n)(BigInteger.ZERO) else buffer
    var i = 0
    val lim = math.min(b.length, n)
    while (i < lim) {
      if (!arr.isNullAt(i)) {
        b(i) = b(i).add(arr.getDecimal(i, 38, 12).toJavaBigDecimal.unscaledValue())
      }
      i += 1
    }
    b
  }

  override def merge(a: Array[BigInteger], b: Array[BigInteger]): Array[BigInteger] = {
    if (a == null) return b
    if (b == null) return a
    var i = 0
    val lim = math.min(a.length, b.length)
    while (i < lim) { a(i) = a(i).add(b(i)); i += 1 }
    a
  }

  override def eval(buffer: Array[BigInteger]): Any =
    if (buffer == null) null
    else new GenericArrayData(buffer.map(bi =>
      Decimal(new java.math.BigDecimal(bi, 12), 38, 12)))

  override def serialize(buffer: Array[BigInteger]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (buffer == null) out.writeInt(-1)
    else {
      out.writeInt(buffer.length)
      buffer.foreach { bi =>
        val bytes = bi.toByteArray
        out.writeInt(bytes.length)
        out.write(bytes)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[BigInteger] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    if (n < 0) null
    else Array.fill(n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      new BigInteger(buf)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumDec =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumDec =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumDec =
    copy(child = newChild)
}
