package graft

import graft.queries.Parity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution

/** Physical-plan assertions: the properties that make these queries hold
  * up at 100 TB — scan pruning/pushdown, broadcast join selection,
  * whole-stage codegen, top-k lowering — asserted against
  * explain("formatted") output so regressions fail loudly.
  */
class PlanSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  def planOf(df: DataFrame): String = {
    val qe: QueryExecution = df.queryExecution
    qe.explainString(org.apache.spark.sql.execution.FormattedMode)
  }

  test("projection prunes the parquet scan to selected columns only") {
    val p = planOf(Parity.qProjRename(spark, dir))
    assert(p.contains("ReadSchema"))
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_discount"), s"unused column not pruned: $read")
    assert(read.contains("l_orderkey"))
  }

  test("filter is pushed down to the scan") {
    val p = planOf(Parity.qAgg(spark, dir))
    assert(p.contains("PushedFilters"), "expected parquet PushedFilters")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).get
    assert(pushed.contains("l_shipdate"), s"shipdate filter not pushed: $pushed")
  }

  test("small-dimension left join broadcasts (no shuffle of the fact side)") {
    val p = planOf(Parity.qLeftJoin(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("semi-join executes as BroadcastHashJoin LeftSemi") {
    val p = planOf(Parity.qSemiJoin(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("global top-k lowers to TakeOrderedAndProject (no full sort)") {
    val p = planOf(Parity.qTopkGlobal(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("aggregations use two-phase hash aggregation (map-side partials)") {
    val p = planOf(Parity.qAgg(spark, dir))
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial"), s"expected partial aggregation phase: $p")
  }

  test("flagship aggregation runs inside whole-stage codegen") {
    // under AQE codegen markers appear on the final (post-execution) plan
    val df = Parity.qAgg(spark, dir)
    df.collect()
    val p = planOf(df)
    assert(p.contains("isFinalPlan=true"), p)
    assert(p.contains("* HashAggregate"), s"aggregate not codegen'd:\n$p")
  }

  test("native sketch expressions stay inside whole-stage codegen") {
    val df = ext.Dedup.simhashTable(Tables.documents(spark, dir))
    val p = planOf(df)
    // '*' prefix = node participates in whole-stage codegen
    assert(p.contains("* Project"), p)
    assert(p.contains("simhash"), p)
  }

  test("pivot with explicit values is a single aggregate, no distinct job") {
    val p = planOf(Parity.qPivot(spark, dir))
    // one partial + one final HashAggregate pair; pivot lowered to
    // max(CASE WHEN ...) so no extra stage computing distinct pivot values
    assert(p.contains("HashAggregate"))
    assert(!p.toLowerCase.contains("collectlimit"), p)
  }

  test("correlated EXISTS decorrelates to a semi join, not per-row subqueries") {
    val p = planOf(Parity.qExistsSubquery(spark, dir))
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("curation is a narrow pipeline: only the dedup window and final sort shuffle") {
    val p = planOf(ext.Curation.qCurate(spark, dir))
    // quality/langid/split are pure maps fused into the scan stage; the
    // only exchanges are the window's hash partitioning and the output
    // range sort — no joins, no extra aggregations
    val exchanges = p.linesIterator.count(l => l.contains("Exchange") && l.contains("("))
    assert(exchanges <= 4, s"expected at most window+sort exchanges, got $exchanges:\n$p")
    assert(!p.contains("Join"), s"curation must not join:\n$p")
  }
}
