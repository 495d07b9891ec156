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
    */
  def joinLast(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = payload.foldLeft(left.withColumn("__side", lit(1))) {
      (df, p) => df.withColumn(p, lit(null).cast(right.schema(p).dataType))
    }
    val r = leftCols.foldLeft(right.select((key +: ts +: payload).map(col): _*)
        .withColumn("__side", lit(0))) {
      (df, c) => if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }
    val unioned = l.select((leftCols ++ payload :+ "__side").map(col): _*)
      .unionByName(r.select((leftCols ++ payload :+ "__side").map(col): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).select((leftCols ++ payload).map(col): _*)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _),
  )

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id, p.value AS last_purchase
        |FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND p.ts <= e.ts
        |ORDER BY e.event_id""".stripMargin,
  )
}
