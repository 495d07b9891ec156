package graft.qc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality harness (ref: nrg_qc.py data_qc), with the
  * reference's three bugs intent-corrected (SURVEY §4.3):
  *   1. count_rows returned the function object instead of the SQL —
  *      here checks are typed values, not stringly-built;
  *   2. Row-vs-int comparison made every equality check fail — here the
  *      scalar is extracted (`first().getLong(0)`);
  *   3. the JSON error report used a driver-local open() on an HDFS URI —
  *      here the report is written through the Spark writer, so any
  *      Hadoop-supported filesystem works.
  */
object Checks {

  /** One declarative assertion: run `sql`, compare the single LONG scalar
    * against `expected` (equals when `expectEqual`, not-equals otherwise —
    * the reference's equal_flag=False rows assert "row count must NOT be
    * 0").
    */
  final case class Check(name: String, sql: String, expectEqual: Boolean, expected: Long) {
    /** Build the result from an already-known actual (shared by the
      * SQL-scan path [[run]] and the observed-counter path
      * [[graft.etl.Pipeline.runEtlObserved]] so pass/fail semantics
      * cannot diverge).
      */
    def result(actual: Long): CheckResult =
      CheckResult(name, sql, expectEqual, expected, actual,
        if (expectEqual) actual == expected else actual != expected)
  }

  final case class CheckResult(
      name: String, sql: String, expectEqual: Boolean,
      expected: Long, actual: Long, passed: Boolean)

  def nullChecker(table: String, column: String): Check =
    Check(s"${table}.${column}_not_null",
      s"SELECT COUNT(*) FROM $table WHERE `$column` IS NULL",
      expectEqual = true, expected = 0L)

  def countRows(table: String): Check =
    Check(s"${table}_non_empty", s"SELECT COUNT(*) FROM $table",
      expectEqual = false, expected = 0L)

  /** The nine fuel-type components of net_generation — the ONE source of
    * truth from which both languages of the consistency invariant are
    * built (the SQL check below and the observed Column in
    * [[graft.etl.Pipeline.runEtlObserved]]); adding or renaming a fuel
    * column is a one-line change that reaches both paths.
    */
  val netGenParts: Seq[String] = Seq(
    "net_generation_coal", "net_generation_nat_gas", "net_generation_nuclear",
    "net_generation_petro", "net_generation_hydro", "net_generation_solar",
    "net_generation_wind", "net_generation_other", "net_generation_unknown")

  /** [[netGenParts]] as a Column sum, for the observed (single-pass)
    * form of the invariant.
    */
  def netGenPartsSum: org.apache.spark.sql.Column =
    netGenParts.map(col).reduce(_ + _)

  /** Cross-column invariant: total net generation equals the sum of its
    * nine fuel-type parts (ref net_gen_qc). Measures are typed double at
    * ingest, so the comparison is numeric, not string (SURVEY §4.3.5).
    */
  val netGenConsistency: Check = Check(
    "net_generation_sum_of_parts",
    s"""SELECT COUNT(*) FROM (
      |  SELECT net_generation,
      |         ${netGenParts.mkString(" + ")} AS sum_of_parts
      |  FROM balancing_authorities) main
      |WHERE abs(main.net_generation - main.sum_of_parts) > 1e-6""".stripMargin,
    expectEqual = true, expected = 0L)

  /** The reference's 8 checks over the two output tables (nrg_qc.py:27-34). */
  val referenceChecks: Seq[Check] = Seq(
    countRows("balancing_authorities"),
    nullChecker("balancing_authorities", "bal_auth"),
    netGenConsistency,
    countRows("weather"),
    nullChecker("weather", "station_id"),
    nullChecker("weather", "date"),
    nullChecker("weather", "TMIN"),
    nullChecker("weather", "TMAX"))

  def run(spark: SparkSession, checks: Seq[Check]): Seq[CheckResult] =
    checks.map(c => c.result(spark.sql(c.sql).first().getLong(0)))

  /** Error report: failures only, one JSON object per line, written via
    * the Spark writer (S6 intent-fixed — works on hdfs/s3a/local alike).
    */
  def writeErrorReport(spark: SparkSession, results: Seq[CheckResult], path: String): Unit = {
    import spark.implicits._
    spark.createDataset(results.filterNot(_.passed))
      .coalesce(1)
      .write.mode("overwrite").json(path)
  }

  /** ZERO-EXTRA-PASS QC via `Dataset.observe`: the row count and
    * per-column null counts are accumulated INSIDE whatever job
    * materializes the frame (the ETL write itself), so at 100 TB the
    * quality counters cost nothing beyond the write that was happening
    * anyway — where the reference's QC (and [[run]]) re-scans the output
    * once per check. Call, run exactly one action on the returned frame,
    * then read the metrics row from the `Observation`.
    */
  def observed(df: DataFrame, nullCols: Seq[String],
      extra: org.apache.spark.sql.Column*)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val metrics =
      count(lit(1)).as("n_rows") +:
        (nullCols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_null_$c")) ++
          extra)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** [[observed]] surfaced on the driver contract: richer profile
    * metrics (row count, conditional count, exact DECIMAL money sum,
    * ts range) accumulated inside a REAL parquet write of the events
    * table — one scan total — then emitted as a 1-row frame. The oracle
    * is the plain dedicated-pass aggregate, so the hash check proves
    * the piggy-backed counters equal what a second scan would have
    * computed. Money discipline per Parity: DECIMAL(18,2) sum, cast to
    * double only at the end.
    */
  def qObserve(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ev = graft.Tables.events(spark, dir)
    val obs = org.apache.spark.sql.Observation()
    val outPath = java.nio.file.Files.createTempDirectory("graft_observe")
    // the write exists only to drive the observed scan; remove its
    // output afterwards so repeated bench/oracle invocations of this
    // registered query don't accrete a table copy per run
    val m = try {
      ev.observe(obs,
          count(lit(1)).as("n_rows"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
          sum(col("value").cast(DecimalType(18, 2))).as("sum_value_dec"),
          min(unix_millis(col("ts"))).as("min_ts_ms"),
          max(unix_millis(col("ts"))).as("max_ts_ms"))
        .write.mode("overwrite").parquet(outPath.toString)
      obs.get
    } finally {
      org.apache.spark.network.util.JavaUtils.deleteRecursively(outPath.toFile)
    }
    import spark.implicits._
    // sum/min/max aggregate to NULL over an empty table — carry the
    // nulls through (the oracle's dedicated pass returns the same row
    // of NULLs) instead of NPE-ing on the cast
    Seq((
      m("n_rows").asInstanceOf[Long],
      Option(m("n_purchases")).map(_.asInstanceOf[Long]),
      Option(m("sum_value_dec")).map(_.asInstanceOf[java.math.BigDecimal].doubleValue()),
      Option(m("min_ts_ms")).map(_.asInstanceOf[Long]),
      Option(m("max_ts_ms")).map(_.asInstanceOf[Long]),
    )).toDF("n_rows", "n_purchases", "sum_value", "min_ts_ms", "max_ts_ms")
  }
}
