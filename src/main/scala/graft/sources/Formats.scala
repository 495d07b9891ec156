package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Interchange formats beyond parquet/CSV: columnar ORC and row-wise
  * JSON-lines, both as sinks and scans (ref: the reference engine's
  * format matrix — its readers/writers cover the same interchange set;
  * Avro is omitted here because the Spark-Avro connector is not on the
  * classpath, a deployment concern rather than an engine one).
  *
  * Scale posture mirrors the parquet path: ORC is a splittable columnar
  * format with min/max stride statistics, so filters and column pruning
  * push into the scan exactly as with parquet (FormatsSpec asserts
  * PushedFilters on the ORC scan); JSON-lines is the lowest-common-
  * denominator export — schema-on-read with an explicit StructType (a
  * schemaless read would silently widen every int to bigint and every
  * timestamp to string), gzip-splittable only at file granularity, so
  * writers size files via repartition before the sink, not after.
  */
object Formats {

  /** Columnar ORC sink; optional hive-style partition columns (same
    * layout contract as the parquet sink in etl.Pipeline).
    */
  def writeOrc(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).orc(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSON-lines sink. Timestamps serialize as ISO-8601 strings — the
    * reader's explicit schema restores the typed column, which is why
    * [[readJsonl]] requires one.
    */
  def writeJsonl(df: DataFrame, path: String, gzip: Boolean = false): Unit = {
    val w = df.write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }

  /** Schema-first JSON-lines scan: the schema pins numeric widths and
    * timestamp types that schemaless inference would widen or
    * stringify. Corrupt lines land in the PERMISSIVE null-row path
    * (same contract as the CSV audit read in etl.Pipeline).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Format conversion: columnar re-encode without a shuffle — the
    * compaction/interchange job shape (read → optional coalesce to
    * target file count → write). `targetFiles` bounds output file
    * count via coalesce (no shuffle), never repartition.
    */
  def convertOrc(spark: SparkSession, inParquet: String, outPath: String,
                 targetFiles: Int = 0): Unit = {
    val df = spark.read.parquet(inParquet)
    writeOrc(if (targetFiles > 0) df.coalesce(targetFiles) else df, outPath)
  }
}
