package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Symmetric int8 embedding quantization — the storage-compression step
  * of an embedding pipeline (4x smaller than float32, cosine error well
  * under 1%). Per-vector scale = maxAbs/127, codes are one byte per
  * dimension in a BinaryType column; both directions are single-pass
  * native expressions (pure map over the scan, no shuffle, codegen'd).
  *
  * At 100 TB the quantized corpus is what sits on disk and flows through
  * the ANN candidate stages; only the final re-rank touches float32.
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = QuantizeInt8.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantize_int8"
  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    QuantizeInt8.quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QuantizeInt8.quantize($c);")
}

object QuantizeInt8 {
  val schema: StructType = StructType(Seq(
    StructField("scale", FloatType, nullable = false),
    StructField("codes", BinaryType, nullable = false)))

  def quantize(v: ArrayData): InternalRow = {
    val n = v.numElements()
    var maxAbs = 0f
    var i = 0
    while (i < n) {
      val a = math.abs(v.getFloat(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127f
    val codes = new Array[Byte](n)
    if (scale > 0f) {
      i = 0
      while (i < n) {
        codes(i) = math.round(v.getFloat(i) / scale).max(-127).min(127).toByte
        i += 1
      }
    }
    InternalRow(scale, codes)
  }

  def apply(v: Column): Column =
    Bridge.toColumn(QuantizeInt8(Bridge.toExpression(v)))
}

/** codes(i) * scale back to float32. */
case class DequantizeInt8(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dequantize_int8"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DequantizeInt8 =
    copy(left = l, right = r)

  override def nullSafeEval(scale: Any, codes: Any): Any =
    DequantizeInt8.dequantize(scale.asInstanceOf[Float], codes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, c) =>
      s"${ev.value} = graft.functions.DequantizeInt8.dequantize($s, $c);")
}

object DequantizeInt8 {
  def dequantize(scale: Float, codes: Array[Byte]): GenericArrayData = {
    val out = new Array[Float](codes.length)
    var i = 0
    while (i < codes.length) { out(i) = codes(i) * scale; i += 1 }
    new GenericArrayData(out)
  }

  def apply(scale: Column, codes: Column): Column =
    Bridge.toColumn(DequantizeInt8(Bridge.toExpression(scale), Bridge.toExpression(codes)))
}
