package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities: skew-tolerant aggregation/joins and bucketed layout
  * for co-located (shuffle-free) joins.
  *
  * Posture: AQE (on in GraftSession) already splits skewed partitions for
  * sort-merge joins at runtime; these helpers cover the residual cases —
  * aggregation skew (one hot group key) and repeated joins on the same key
  * where paying one bucketed write removes the exchange from every
  * subsequent join.
  */
object Scale {

  /** Two-phase salted aggregation for hot grouping keys: rows are spread
    * over `nSalts` sub-groups, partially aggregated per (key, salt), then
    * merged per key — the hot key's work lands on `nSalts` tasks instead
    * of one. Caller supplies both phases because only algebraic
    * aggregates decompose (sum/count/min/max and compositions).
    *
    * saltedAggregate(li, Seq(col("k")), 16,
    *   Seq(sum("x").as("px"), count(lit(1)).as("pc")),
    *   Seq(sum("px").as("sum_x"), sum("pc").as("n")))
    */
  def saltedAggregate(
      df: DataFrame, keys: Seq[Column], nSalts: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(nSalts.toLong)))
    salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
      .drop("__salt")
      .groupBy(keys: _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Skew-tolerant equi-join of a skewed big side against a small side
    * that is broadcast-marginal: the small side is replicated `nSalts`
    * times, the big side salted per row, and the join key becomes
    * (key, salt) so one hot key spreads over `nSalts` tasks.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, joinKey: String, nSalts: Int,
      joinType: String = "inner"): DataFrame = {
    // Replicating the small side nSalts times would emit each unmatched
    // small-side row nSalts times under right/full outer joins — only
    // big-side-preserving join types are sound here.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
        "left_anti", "leftanti").contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti joins, got: $joinType")
    val saltedBig = big.withColumn(
      "__salt", pmod(monotonically_increasing_id(), lit(nSalts.toLong)))
    val replicatedSmall = small.withColumn(
      "__salt", explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(joinKey, "__salt"), joinType).drop("__salt")
  }

  /** Bucketed, sorted table layout: pays one clustered write so that every
    * later equi-join/aggregation on `key` between same-bucketing tables
    * runs without an exchange (SortMergeJoin reads co-located buckets).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(bytes / targetFileBytes) files. Incremental pipelines accrete
    * tiny files (one-per-task-per-batch); at scale the file count, not
    * the data volume, starts to dominate listing and scan startup.
    * Rewrite goes through a staging dir (write-audit-publish — never
    * overwrite a path mid-read), then replaces the original atomically
    * per-filesystem-rename.
    */
  def compact(spark: SparkSession, path: String, targetFileBytes: Long = 128L << 20): Unit = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val staging = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__compact")
    spark.read.parquet(path)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    fs.delete(p, true)
    fs.rename(staging, p)
  }
}
