package graft.ext

import graft.Tables
import graft.functions.CommonPrefixLength
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Suffix-adjacency span dedup — the suffix-array detector for verbatim
  * duplicated passages (Lee et al. 2022 build a suffix array and scan
  * adjacent entries; two documents sharing ANY long passage have
  * adjacent suffixes with a long common prefix). Complements
  * [[Dedup.dedupSpans]]: the hash-window form detects fixed-width-48
  * copies; this ranks doc pairs by the LENGTH of their longest shared
  * span (up to a cap) and needs no anchor luck.
  *
  * Design decision — capped windows instead of full prefix doubling:
  * the reported LCP is capped at [[LcpCap]] chars, and under a cap the
  * full suffix order is observably equivalent to ordering by the
  * leading `LcpCap`-char window (suffixes equal in their first LcpCap
  * chars yield lcp = cap whichever way they tie-break, and the
  * tie-break is pinned to (window, doc_id, off) in both engines). That
  * turns O(log n) prefix-doubling rounds — each a corpus-wide shuffle —
  * into ONE range-sort on fixed 64-char keys, which is exactly what any
  * SQL ORDER BY already does at scale. Prefix doubling only pays when
  * unbounded match lengths must be exact; a dedup pipeline thresholds
  * on "long enough", so the cap is the semantics, not a compromise.
  *
  * Scale shape: suffix starts are WORD-ALIGNED (off = 0 or preceded by
  * a space — the standard practical reduction, ~6× fewer positions on
  * prose; a copied passage still produces word-aligned suffixes in both
  * documents). Positions explode map-side, the only wide operations are
  * the range partition on (window, doc_id, off) and the adjacency
  * self-join on rank — both linear in corpus characters, nothing
  * quadratic anywhere. Global rank uses the same range-partition +
  * partition-offset technique as the exact ntile (one bounded driver
  * collect of per-partition counts); adjacent pairs join on rank r =
  * r+1, so partition boundaries need no special casing. The LCP is one
  * compiled byte-walk per adjacent pair ([[CommonPrefixLength]]).
  */
object SuffixDedup {

  val LcpCap = 64
  val TopK = 20

  def qSuffixDups(spark: SparkSession, dir: String): DataFrame =
    suffixDups(Tables.documents(spark, dir))

  /** The pre-materialization stage: word-aligned windows exploded by
    * the compiled byte-walk, range-partitioned into the suffix order
    * (disjoint ordered partitions — the basis for exact global ranks).
    * Exposed so PlanSpec can assert this stage's shape; suffixDups
    * checkpoints it (two downstream passes: partition counts + ranked
    * adjacency).
    */
  def rankedInput(docs: DataFrame): DataFrame =
    docs.filter(col("n_chars") > 0)
      .select(col("doc_id"),
        explode(graft.functions.WordSuffixWindows(col("text"), LcpCap)).as("sw"))
      .select(col("doc_id"), col("sw.off").as("off"), col("sw.win").as("win"))
      .repartitionByRange(col("win"), col("doc_id"), col("off"))
      .withColumn("pid", spark_partition_id())

  /** Materializes the exploded window stage to a parquet scratch path and
    * reads it back. The exploded windows amplify the corpus ~10× (one
    * ~64-byte window per ~6-char word of prose), so the materialization
    * discipline matters at scale: parquet scratch is spill-safe (columnar,
    * compressed — the windows are highly redundant), fault-tolerant (an
    * executor loss re-reads files instead of killing the job, which a
    * `localCheckpoint` of a ~10× blow-up would at 100 TB), and resumable.
    * Production points `spark.graft.scratchDir` at durable shared storage
    * (HDFS/S3); the default is a JVM temp dir, right for local runs.
    */
  private def stageRanked(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val root = spark.conf.getOption("spark.graft.scratchDir")
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val scratch = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(root), "suffix_sa").toString
    rankedInput(docs).write.mode("overwrite").parquet(scratch)
    spark.read.parquet(scratch)
  }

  def suffixDups(docs: DataFrame, topK: Int = TopK): DataFrame = {
    // global suffix rank: range partitions are disjoint and ordered, so
    // partition-local row numbers plus cumulative partition offsets are
    // the exact global sort position (the qNtile technique)
    val parts = stageRanked(docs)
    val counts = parts.groupBy(col("pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nParts = if (counts.isEmpty) 1 else counts.keys.max + 1
    val offsets = (0 until nParts).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val offsetCol = element_at(array(offsets.take(nParts).map(lit): _*), col("pid") + 1)
    val w = Window.partitionBy(col("pid"))
      .orderBy(col("win"), col("doc_id"), col("off"))
    val sa = parts
      .withColumn("r", offsetCol + row_number().over(w))
      .select(col("r"), col("doc_id"), col("off"), col("win"))
    val lhs = sa.select(col("r"), col("doc_id").as("da"),
      col("off").as("oa"), col("win").as("wa"))
    val rhs = sa.select((col("r") - 1).as("r"), col("doc_id").as("db"),
      col("off").as("ob"), col("win").as("wb"))
    lhs.join(rhs, "r")
      .filter(col("da") =!= col("db"))
      .withColumn("lcp", CommonPrefixLength(col("wa"), col("wb")))
      .filter(col("lcp") > 0)
      .groupBy(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"))
      .agg(max(col("lcp")).as("max_lcp"), count(lit(1)).as("n_adj"))
      .orderBy(col("max_lcp").desc, col("doc_a"), col("doc_b"))
      .limit(topK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_suffix" -> (qSuffixDups _),
  )

  val oracles: Map[String, String] = Map(
    // brute force: materialize every word-aligned capped window as a
    // string, sort, LCP adjacent entries by first-mismatch scan —
    // quadratic in nothing but fine at oracle scale
    "dedup_suffix" ->
      s"""WITH pos AS (
         |  SELECT doc_id, unnest(range(CAST(n_chars AS BIGINT))) AS off, text
         |  FROM documents WHERE n_chars > 0),
         |wp AS (
         |  SELECT doc_id, off, substr(text, CAST(off + 1 AS INT), $LcpCap) AS win
         |  FROM pos WHERE off = 0 OR substr(text, CAST(off AS INT), 1) = ' '),
         |sa AS MATERIALIZED (
         |  SELECT doc_id, off, win,
         |         row_number() OVER (ORDER BY win, doc_id, off) AS r
         |  FROM wp),
         |adj AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db, a.win AS wa, b.win AS wb,
         |         CAST(least(len(a.win), len(b.win)) AS BIGINT) AS lmax
         |  FROM sa a JOIN sa b ON b.r = a.r + 1
         |  WHERE a.doc_id <> b.doc_id),
         |lcps AS (
         |  SELECT da, db,
         |    CAST(coalesce(
         |      list_filter(range(1, lmax + 1),
         |        i -> substr(wa, CAST(i AS INT), 1) <> substr(wb, CAST(i AS INT), 1))[1] - 1,
         |      lmax) AS INT) AS lcp
         |  FROM adj)
         |SELECT least(da, db) AS doc_a, greatest(da, db) AS doc_b,
         |       max(lcp) AS max_lcp, count(*) AS n_adj
         |FROM lcps WHERE lcp > 0
         |GROUP BY 1, 2
         |ORDER BY max_lcp DESC, doc_a, doc_b
         |LIMIT $TopK""".stripMargin,
  )
}
