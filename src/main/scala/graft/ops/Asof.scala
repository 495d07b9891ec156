package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the time-series alignment operator.
  *
  * Built-ins CAN express this (preference order (a), SURVEY §4.2): tag
  * both sides, union, and take `last(payload, ignoreNulls)` over a
  * per-key window ordered by (ts, side) with right-side rows sorting
  * before left-side rows at equal timestamps (inclusive `right.ts <=
  * left.ts` semantics, matching DuckDB's ASOF LEFT JOIN which is the
  * oracle). One shuffle on the key — the same cost as the dedicated
  * merge-join implementations in native engines — and the window is
  * running-state only (no full-partition buffering).
  */
object Asof {

  /** Left as-of join: every `left` row gains the latest `payload` values
    * from the `right` row with the same `key` and `right.ts <= left.ts`
    * (null when no prior right row exists).
    *
    * The payload columns are carried through the window as ONE struct per
    * right row — never per-column — so (a) the winning right row's values
    * stay together (no cross-row column mixing), and (b) a right row whose
    * payload value IS null still wins: the struct wrapper is non-null, and
    * the matched row's null is what comes out, matching DuckDB ASOF
    * semantics. Ties on (key, ts) between right rows are broken
    * deterministically by the payload struct itself (largest wins),
    * independent of partition order.
    */
  def joinLast(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p).copy(name = p)))
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(payloadType))
    val r0 = right.select(col(key), col(ts),
      struct(payload.map(col): _*).as("__p")).withColumn("__side", lit(0))
    val r = leftCols.foldLeft(r0) {
      (df, c) => if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }
    val outCols = leftCols :+ "__p" :+ "__side"
    val unioned = l.select(outCols.map(col): _*).unionByName(r.select(outCols.map(col): _*))
    // __p as the final ordering key: right rows (side 0) with equal ts get
    // a total order; left rows all carry null __p so their relative order
    // cannot affect the ignoreNulls fill.
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"__p.$p").as(p)): _*)
  }

  /** Driver-contract entry: each event annotated with the user's most
    * recent prior (or same-instant) purchase value.
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("last_purchase"))
    joinLast(
      events.select("event_id", "user_id", "ts"),
      purchases, "user_id", "ts", Seq("last_purchase"))
      .select("event_id", "last_purchase")
      .orderBy("event_id")
  }

  /** The same as-of semantics through the CUSTOM PHYSICAL OPERATOR
    * ([[graft.plans.AsofJoinExec]]): co-partition by key, sort each side,
    * one streaming merge per partition with O(1) state — no union of the
    * sides, no window carrying left rows. The payload columns are
    * appended to the left schema (nullable).
    */
  def joinLastExec(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    // manual pruning + FRESH ids: the logical node is opaque to
    // ColumnPruning, and self-joins share attribute ids between sides —
    // the analyzer's DeduplicateRelations rewrites child plans but not a
    // custom node's captured attributes, so reference the right side
    // through explicit aliases (always new exprIds, never remapped)
    val rightP = right.select((Seq(key, ts) ++ payload).map(n => col(n).as(n)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightP.queryExecution.analyzed
    def attr(pl: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      pl.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${pl.output.map(_.name)}"))
    val payloadAttrs = payload.map(attr(rPlan, _))
    val payloadOut = payloadAttrs.map(a =>
      AttributeReference(a.name, a.dataType, nullable = true)())
    org.apache.spark.sql.graftbridge.Bridge.ofRows(
      left.sparkSession,
      graft.plans.AsofJoinPlan(lPlan, rPlan,
        attr(lPlan, key), attr(lPlan, ts), attr(rPlan, key), attr(rPlan, ts),
        payloadAttrs, payloadOut))
  }

  /** Driver-contract entry for the custom operator, against the SAME
    * DuckDB ASOF oracle as the composed form — a correctness gate on the
    * physical operator itself.
    */
  def qAsofExec(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("last_purchase"))
    joinLastExec(
      events.select("event_id", "user_id", "ts"),
      purchases, "user_id", "ts", Seq("last_purchase"))
      .select("event_id", "last_purchase")
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _),
    "q_asof_exec" -> (qAsofExec _),
  )

  private val asofOracle =
    """WITH p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
      |SELECT e.event_id, p.value AS last_purchase
      |FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND p.ts <= e.ts
      |ORDER BY e.event_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_asof_join" -> asofOracle,
    "q_asof_exec" -> asofOracle,
  )
}
