package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the scale-oriented defaults every entry point shares.
  *
  * Design notes (100 TB posture):
  *   - AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  *     replaces hand-tuned `spark.sql.shuffle.partitions` on a real cluster.
  *   - Shuffle partitions default to the local core count here; on a cluster
  *     this is overridden to ~2-3x total cores and AQE coalesces down.
  *   - Parquet nanos-as-long: kept for testdata revisions that stored
  *     `events.ts` as TIMESTAMP(NANOS) (vanilla Spark rejects it; the flag
  *     reads the raw long instead). The current testdata stores zoneless
  *     micros, which [[Tables.events]] normalizes via an NTZ cast — both
  *     encodings funnel through that one loader.
  */
object GraftSession {
  def cpus: Int = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
    .getOrElse(Runtime.getRuntime.availableProcessors())

  /** AQE advisory partition size override (bytes). The round-12 scale
    * rehearsal measured that for pair-heavy dedup joins the binding
    * single-box term is NOT spill (zero spill bytes) but the partial
    * aggregation's per-task hash-map state falling out of CPU cache:
    * at the 64 MB default one task holds ~4M (src,dst) pairs (~200 MB
    * of map), and the hot stage's CPU halves when 8 MB advisory
    * partitions keep each task's state cache-resident (BENCH_SCALE.md
    * round 12). Spark cannot know a stage's state-per-input-byte, so
    * this stays an operator knob: set SPARK_GRAFT_ADVISORY_PART_BYTES
    * (e.g. 8388608) for corpus-scale pair-aggregation workloads; the
    * Spark default (64 MB) holds otherwise.
    */
  def advisoryPartBytes: Option[String] =
    sys.env.get("SPARK_GRAFT_ADVISORY_PART_BYTES")

  def builder(appName: String = "graft"): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // top-k above this falls back to a GLOBAL sort; the default
      // (10000) silently turns orderBy+limit(65536) — the nbClassify
      // vocab cap — into a full-vocabulary sort. Per-partition top-k
      // heaps of ~1M entries are still executor-cheap.
      .config("spark.sql.execution.topKSortFallbackThreshold", "1048576")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    advisoryPartBytes.fold(b)(
      b.config("spark.sql.adaptive.advisoryPartitionSizeInBytes", _))
  }

  /** Local session for tests / ad-hoc runs. */
  def local(appName: String = "graft"): SparkSession =
    builder(appName).master(s"local[$cpus]").getOrCreate()
}
