package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** IVF coarse quantizer as a compiled expression: the top-n nearest
  * centroids (by cosine) of a float-array column. The centroid table is a
  * reference object carried inside the expression (it is tiny — k·dim
  * floats — the model, not the data), so corpus assignment (n=1) and
  * query probing (n=nProbe) are pure maps over the scan: no shuffle, no
  * join against a centroid table, and the expression stays inside
  * whole-stage codegen.
  *
  * Scoring uses dot(v, c/|c|): the candidate ranking per input vector is
  * unaffected by |v|, so normalizing only the centroids (once, at
  * construction) gives the cosine ordering without a per-row sqrt.
  */
case class NearestCentroids(child: Expression, centroids: Seq[Seq[Float]], n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroids"
  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)

  @transient private lazy val evaluator =
    new NearestCentroids.Evaluator(centroids.map(_.toArray).toArray, n)

  override def nullSafeEval(input: Any): Any =
    evaluator.eval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evalRef = ctx.addReferenceObj("nearestCentroidsEvaluator", evaluator,
      classOf[NearestCentroids.Evaluator].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $evalRef.eval($c);")
  }
}

object NearestCentroids {

  final class Evaluator(centroids: Array[Array[Float]], n: Int) extends Serializable {
    private val normalized: Array[Array[Double]] = centroids.map { c =>
      val nrm = math.sqrt(c.map(x => x.toDouble * x).sum)
      c.map(x => if (nrm > 0) x / nrm else 0.0)
    }

    def eval(v: ArrayData): GenericArrayData = {
      val k = normalized.length
      val scores = new Array[Double](k)
      var ci = 0
      while (ci < k) {
        val c = normalized(ci)
        val dim = math.min(v.numElements(), c.length)
        var dot = 0.0
        var j = 0
        while (j < dim) { dot += v.getFloat(j).toDouble * c(j); j += 1 }
        scores(ci) = dot
        ci += 1
      }
      // top-n indices, score desc, index asc on ties — selection sort over
      // k entries (k is small; no allocation-heavy sort needed)
      val take = math.min(n, k)
      val picked = new Array[Int](take)
      val used = new Array[Boolean](k)
      var slot = 0
      while (slot < take) {
        var best = -1
        var i = 0
        while (i < k) {
          if (!used(i) && (best < 0 || scores(i) > scores(best))) best = i
          i += 1
        }
        used(best) = true
        picked(slot) = best
        slot += 1
      }
      new GenericArrayData(picked)
    }
  }

  def apply(v: Column, centroids: Seq[Seq[Float]], n: Int): Column =
    Bridge.toColumn(NearestCentroids(Bridge.toExpression(v), centroids, n))
}
