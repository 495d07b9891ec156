package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Product-quantization encoder as a compiled expression: split a
  * float-array column into M contiguous subvectors and emit, per
  * subspace, the index of the nearest codebook centroid by L2 distance —
  * M small ints (byte-range) replacing dim floats. Like
  * [[NearestCentroids]], the codebooks ride inside the expression as a
  * reference object (they are the MODEL — M·ksub·(dim/M) floats — not
  * data), so encoding is a pure map over the scan: no shuffle, no join,
  * inside whole-stage codegen.
  *
  * Public algorithm: Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search", IEEE TPAMI 2011.
  */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Float]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  @transient private lazy val evaluator =
    new PqEncode.Evaluator(codebooks.map(_.map(_.toArray).toArray).toArray)

  override def nullSafeEval(input: Any): Any =
    evaluator.eval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evalRef = ctx.addReferenceObj("pqEncodeEvaluator", evaluator,
      classOf[PqEncode.Evaluator].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $evalRef.eval($c);")
  }
}

object PqEncode {

  /** codebooks(m)(k) is the k-th centroid of subspace m, each of length
    * dim/M; assignment is argmin-L2 per subspace, ties to the lower index.
    */
  final class Evaluator(codebooks: Array[Array[Array[Float]]]) extends Serializable {
    def eval(v: ArrayData): GenericArrayData = {
      val m = codebooks.length
      val codes = new Array[Int](m)
      var s = 0
      var offset = 0
      while (s < m) {
        val cents = codebooks(s)
        val subDim = cents(0).length
        var best = 0
        var bestDist = Double.MaxValue
        var k = 0
        while (k < cents.length) {
          val c = cents(k)
          var dist = 0.0
          var j = 0
          while (j < subDim) {
            val d = v.getFloat(offset + j).toDouble - c(j)
            dist += d * d
            j += 1
          }
          if (dist < bestDist) { bestDist = dist; best = k }
          k += 1
        }
        codes(s) = best
        offset += subDim
        s += 1
      }
      new GenericArrayData(codes)
    }
  }

  def apply(v: Column, codebooks: Seq[Seq[Seq[Float]]]): Column =
    Bridge.toColumn(PqEncode(Bridge.toExpression(v), codebooks))
}
