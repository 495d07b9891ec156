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

/** Sign-random-projection LSH bucket for a float-array column: bit i of
  * the result is sign(v · h_i), hyperplane components h_i[j] derived
  * deterministically from an avalanche hash of (i, j) — no stored model,
  * one compiled pass per row.
  */
case class SrpSignature(child: Expression, bits: Int) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "srp_signature"
  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
  override def nullSafeEval(input: Any): Any =
    SrpSignature.signature(input.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SrpSignature.signature($c, $bits);")
}

/** The splitmix64 finalizer (golden-ratio multiply + two avalanche
  * rounds) — the ONE definition behind every hash-derived construction
  * that a DuckDB oracle mirrors (SRP hyperplanes, the HLL key hash):
  * three formerly-private copies had to stay bit-identical by
  * discipline; now they delegate here.
  */
object Mix {
  @inline def splitmix64(x0: Long): Long = {
    var x = x0 * 0x9e3779b97f4a7c15L
    x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
    x ^= x >>> 27; x *= 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}

object SrpSignature {
  @inline private def mix(x0: Long): Long = Mix.splitmix64(x0)

  /** Hyperplane component in [-1, 1). */
  @inline private def component(bit: Int, j: Int): Double =
    (mix(bit.toLong << 32 | j.toLong).toDouble / Long.MaxValue)

  def signature(v: ArrayData, bits: Int): Long = {
    val n = v.numElements()
    var out = 0L
    var bit = 0
    while (bit < bits) {
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v.getFloat(j).toDouble * component(bit, j); j += 1 }
      if (dot >= 0) out |= (1L << bit)
      bit += 1
    }
    out
  }
}

/** [[Mix.splitmix64]] of a long column as a native codegen'd expression —
  * the deterministic hash ORDER both engines can reproduce (vs Spark's
  * xxhash64, which DuckDB cannot mirror); the SQL twin is
  * [[MixSql.mix]]. Used to hash-order training samples so a
  * `LIMIT sampleN` draw is independent of the corpus's id layout.
  */
case class Splitmix64Col(child: Expression) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "splitmix64"
  override protected def withNewChildInternal(newChild: Expression): Splitmix64Col =
    copy(child = newChild)
  override def nullSafeEval(input: Any): Any =
    Mix.splitmix64(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Mix.splitmix64($c);")
}

object VectorFns {
  def dotProduct(a: Column, b: Column): Column =
    Bridge.toColumn(DotProduct(Bridge.toExpression(a), Bridge.toExpression(b)))

  /** splitmix64 of a long column (signed-long value; order with the
    * oracle's [[MixSql.toS64]] image for cross-engine sort parity).
    */
  def mix64(c: Column): Column =
    Bridge.toColumn(Splitmix64Col(Bridge.toExpression(c)))

  def srpSignature(v: Column, bits: Int): Column =
    Bridge.toColumn(SrpSignature(Bridge.toExpression(v), bits))

  /** L2 norm of a float-array column. */
  def l2norm(v: Column): Column = sqrt(dotProduct(v, v))

  /** Exact cosine via the codegen'd dot product — numerically identical
    * to the sequential-fold definition (see DotProduct scaladoc).
    */
  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2norm(a) * l2norm(b))
}
