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

  /** Row count WITHOUT a Spark job when the frame is a bare parquet scan:
    * sums the footer record counts of the scan's input files on the
    * driver (one footer read per file — the same metadata a scan
    * planner already touches), falling back to `df.count()` for any
    * frame that is not a plain file relation (constructed test frames,
    * filtered/unioned inputs — where footer counts would be wrong).
    *
    * Used by the auto-bits staircase sizers (`Similarity.annKnnGraph`,
    * `bitextMine`, `Dedup.dedupEmbeddingLshCandidates`): at 100 TB a
    * `count()` is a full-scan job launched BEFORE the real query, while
    * the footers answer the same question driver-side in file-count
    * time. Bits chosen are identical either way — footer counts are
    * exact, not estimates.
    */
  def metadataRowCount(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    df.queryExecution.analyzed match {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        val conf = df.sparkSession.sessionState.newHadoopConf()
        df.inputFiles.iterator.map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.sum
      case _ => df.count()
    }
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
