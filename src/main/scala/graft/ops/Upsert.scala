package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-style upsert into a hive-partitioned parquet table, touching
  * ONLY the partitions the changeset lands in.
  *
  * The 100 TB cadence is "daily corrections hit a handful of date
  * partitions"; rewriting the whole table per merge is the anti-pattern.
  * Shape:
  *   1. the touched partition set comes from the changeset (distinct
  *      partition values — tiny, collected driver-side like any partition
  *      spec) and becomes a predicate on partition columns only, so the
  *      read of current data is pruned at file-listing time;
  *   2. current rows whose key appears in the changeset are dropped via a
  *      broadcast left-anti join (update = replace-by-key), the changeset
  *      is unioned in (insert);
  *   3. the merged rows are STAGED to a scratch path first (write-audit-
  *      publish — Spark cannot lazily overwrite a path it is reading,
  *      and a failed merge must not corrupt the table), then published
  *      with dynamic partition overwrite, replacing exactly the touched
  *      partitions.
  *
  * Cost: read + rewrite of the touched partitions only; untouched
  * partitions are never listed, read, or written.
  */
object Upsert {

  def upsertPartitioned(
      spark: SparkSession, tablePath: String, changes: DataFrame,
      keyCols: Seq[String], partCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty && partCols.nonEmpty)
    def partKey(df: String => org.apache.spark.sql.Column) =
      concat_ws("\u0001", partCols.map(c => df(c).cast("string")): _*)

    val touched = changes.select(partKey(changes(_)).as("pk"))
      .distinct().collect().map(_.getString(0))
    val current = spark.read.parquet(tablePath)
      .filter(partKey(col).isin(touched.toSeq: _*)) // partition-cols-only ⇒ pruned at listing
    // null-safe key match: a null-keyed current row must still be
    // REPLACED by a null-keyed change, or replaying a batch duplicates it
    val changeKeys = changes.select(
      keyCols.map(k => col(k).as(s"__ck_$k")): _*).distinct()
    val kept = current.join(broadcast(changeKeys),
      keyCols.map(k => current(k) <=> changeKeys(s"__ck_$k")).reduce(_ && _),
      "left_anti")
    val merged = kept.unionByName(changes.select(current.columns.map(col): _*))

    val staging = tablePath.stripSuffix("/") + "__staging"
    merged.write.mode(SaveMode.Overwrite).parquet(staging)
    spark.read.parquet(staging)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .parquet(tablePath)
    // best-effort scratch cleanup (same filesystem as the table)
    val p = new org.apache.hadoop.fs.Path(staging)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
