package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product over two float-array columns as a native codegen'd
  * expression: a tight primitive loop over ArrayData — no struct
  * allocation per element (the zip_with+aggregate formulation allocates an
  * intermediate struct array per row, which dominates pair-join dedup and
  * ANN workloads).
  *
  * Accumulation is a sequential left-to-right double sum, bit-identical
  * to both the lambda-fold formulation and DuckDB's list kernels — oracle
  * parity is preserved exactly.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProduct.dot($a, $b);")
}

object DotProduct {
  /** Shared by interpreted and generated code paths. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }
}

object VectorFns {
  def dotProduct(a: Column, b: Column): Column =
    Bridge.toColumn(DotProduct(Bridge.toExpression(a), Bridge.toExpression(b)))

  /** L2 norm of a float-array column. */
  def l2norm(v: Column): Column = sqrt(dotProduct(v, v))

  /** Exact cosine via the codegen'd dot product — numerically identical
    * to the sequential-fold definition (see DotProduct scaladoc).
    */
  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2norm(a) * l2norm(b))
}
