package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the shared test tables (`/root/testdata/sf&#42;/name.parquet`).
  *
  * All readers are plain parquet scans so Catalyst keeps pushdown/pruning;
  * the only normalization is `events.ts`, which the generator has stored two
  * ways across testdata revisions:
  *   - TIMESTAMP(NANOS): no native Spark type; the session reads it as a
  *     nanosecond long (`spark.sql.legacy.parquet.nanosAsLong`) and we
  *     convert with integer arithmetic (`div`, not `/` — a double
  *     round-trip would lose precision above 2^53 ns);
  *   - timestamp[us] without zone: Spark 4 reads it as TIMESTAMP_NTZ, which
  *     time functions like `unix_millis` reject; the session timezone is
  *     pinned UTC, so a cast to TIMESTAMP is wall-clock-preserving.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so the whole surface is usable
    * from `spark.sql` (the reference's execution style) as well as the
    * DataFrame API.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n        => load(spark, dir, n).createOrReplaceTempView(n)
    }

  /** `events` with `ts` normalized to a proper TimestampType column. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
}
