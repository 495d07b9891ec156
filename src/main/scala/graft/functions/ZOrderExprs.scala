package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two 16-bit keys as a native codegen'd
  * expression: five mask-shift rounds per operand (the classic
  * bit-spread) instead of the 32-term shift/AND/OR tree the composed
  * Column formulation builds — ~6x fewer JVM ops in the generated code
  * and a far smaller codegen method for the write path that z-orders
  * every row of a 100 TB table. Values are bit-identical to the
  * composed form (SqlFunctionsSpec asserts equality exhaustively on the
  * table keys and on adversarial bit patterns).
  */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "morton_interleave"

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MortonInterleave =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    MortonInterleave.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MortonInterleave.interleave($a, $b);")
}

object MortonInterleave {

  /** Spread the low 16 bits of x to even positions 0,2,..,30. */
  def spread(x0: Long): Long = {
    var x = x0 & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Bit i of `a` lands at 2i+1, bit i of `b` at 2i — the same layout
    * as the composed-Column and DuckDB SQL formulations in
    * queries.Parity (a is the "major" dimension).
    */
  def interleave(a: Long, b: Long): Long =
    (spread(a) << 1) | spread(b)

  /** Column-API entry point; inputs are normalized to LongType here
    * because the expression itself evaluates raw longs.
    */
  def morton(a: Column, b: Column): Column =
    Bridge.toColumn(MortonInterleave(
      Bridge.toExpression(a.cast("long")), Bridge.toExpression(b.cast("long"))))
}
