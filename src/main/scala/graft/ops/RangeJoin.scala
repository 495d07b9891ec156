package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval (range) join: fact rows carrying a point value joined to an
  * intervals table on `lo <= point <= hi`.
  *
  * Spark has no native range-join operator, and the naive plan for a pure
  * range predicate is BroadcastNestedLoopJoin — every fact row compared to
  * every interval, O(|facts|·|intervals|), the classic 100 TB killer.
  * [[joinBinned]] rewrites it as an EQUI join on a bin key (the standard
  * bucketed interval-join technique used by distributed range-join
  * implementations): each interval is exploded to the fixed-width bins it
  * overlaps, each fact maps to exactly one bin, the engine hash-joins on
  * the bin (shuffle or broadcast, Catalyst's choice by size), and the
  * BETWEEN residual filters inside the bucket. Pairwise work drops to
  * sum-over-bins of |facts_bin|·|intervals_bin|, bounded by bin width.
  * Because a fact lives in exactly one bin, no post-join dedup is needed.
  *
  * Bin width tuning: ~the typical interval length. Much smaller ⇒ interval
  * replication grows; much larger ⇒ buckets degrade toward all-pairs.
  */
object RangeJoin {

  /** Equi-join-by-bin range join. `point`, `lo`, `hi` must be numeric
    * (cast dates/timestamps to epoch days/seconds first); the result has
    * the fact columns plus the interval columns, one row per matching
    * (fact, interval) pair.
    */
  def joinBinned(
      facts: DataFrame, point: Column,
      intervals: DataFrame, lo: Column, hi: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val f = facts.withColumn("__point", point)
      .withColumn("__bin", floor(col("__point") / binWidth))
    val iv = intervals.withColumn("__lo", lo).withColumn("__hi", hi)
      .withColumn("__bin",
        explode(sequence(floor(col("__lo") / binWidth), floor(col("__hi") / binWidth))))
    f.join(iv, Seq("__bin"))
      .filter(col("__point").between(col("__lo"), col("__hi")))
      .drop("__bin", "__point", "__lo", "__hi")
  }

  /** Driver-contract entry: for every order placed in March 1995, count
    * the lineitems (across ALL orders — a genuine non-equi join, no key
    * equality) whose ship date falls in the 7 days following the order
    * date. Bin width 7 days ⇒ each interval lands in ≤2 bins.
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    val iv = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-03-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      .select(col("o_orderkey"), datediff(col("o_orderdate"), epoch).as("lo"))
      .withColumn("hi", col("lo") + 7)
    val facts = Tables.lineitem(spark, dir)
      .select(datediff(col("l_shipdate"), epoch).as("ship_day"))
    joinBinned(facts, col("ship_day"), iv, col("lo"), col("hi"), binWidth = 7L)
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_shipped_in_window"))
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_range_join" -> (qRangeJoin _),
  )

  val oracles: Map[String, String] = Map(
    // DuckDB evaluates the BETWEEN join natively (IEJoin); same pairs.
    "q_range_join" ->
      """WITH iv AS (
        |  SELECT o_orderkey,
        |         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS lo,
        |         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 7 AS hi
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-03-01' AND o_orderdate < TIMESTAMP '1995-04-01'),
        |f AS (SELECT datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS ship_day FROM lineitem)
        |SELECT iv.o_orderkey, count(*) AS n_shipped_in_window
        |FROM f JOIN iv ON f.ship_day BETWEEN iv.lo AND iv.hi
        |GROUP BY iv.o_orderkey ORDER BY iv.o_orderkey""".stripMargin,
  )
}
