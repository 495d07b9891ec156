package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point-frequency estimate from a Count-Min sketch, as a native
  * codegen'd expression. The sketch rides along as a plan reference
  * (`ctx.addReferenceObj`) — decoded ONCE per executor, not per row —
  * so the probe is a handful of hash-and-min lookups inside
  * whole-stage codegen.
  *
  * The estimate never undercounts (each of the d counters only ever
  * gains collisions), which is what makes the two-pass heavy-hitter
  * query exact: pass 1 builds the fixed-size sketch (no shuffle of
  * distinct keys), pass 2 drops tokens whose ESTIMATE is already below
  * the support threshold — provably not heavy — and exact-counts only
  * the survivors, whose group-by state is bounded by the false-positive
  * rate instead of the vocabulary size. At 100 TB a raw
  * `groupBy(token)` shuffles billions of distinct keys; the sketch stays
  * at its configured width no matter the corpus
  * (ref: the frequency/rollup reports in nrg_sql_queries.py re-shaped
  * for unbounded key domains).
  */
case class CmsEstimate(child: Expression, sketch: CountMinSketch)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_estimate"

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)

  override def nullSafeEval(v: Any): Any =
    sketch.estimateCount(v.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", sketch, classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.estimateCount($c.toString());")
  }
}

object CmsEstimate {
  def estimate(tok: Column, sketch: CountMinSketch): Column =
    Bridge.toColumn(CmsEstimate(Bridge.toExpression(tok), sketch))
}
