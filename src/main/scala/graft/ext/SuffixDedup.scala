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
  * documents). Positions explode map-side, and the ONLY wide operation
  * is the range partition on (window, doc_id, off) — linear in corpus
  * characters, nothing quadratic anywhere. Adjacency comes from lead()
  * INSIDE the range partitioning (a global-rank self-join would
  * hash-shuffle the amplified window table twice); the nParts-1
  * partition-boundary pairs are reconstructed from each partition's
  * first/last row — bounded driver metadata. The LCP is one compiled
  * byte-walk per adjacent pair ([[CommonPrefixLength]]).
  */
object SuffixDedup {

  val LcpCap = 64
  val TopK = 20

  def qSuffixDups(spark: SparkSession, dir: String): DataFrame =
    suffixDups(Tables.documents(spark, dir))

  /** The pre-materialization stage: word-aligned windows exploded by
    * the compiled byte-walk, range-partitioned into the suffix order
    * (disjoint ordered partitions — the basis for exact adjacency).
    * Exposed so PlanSpec can assert this stage's shape; suffixDups
    * materializes it (three bounded downstream passes: lead adjacency
    * + the first/last boundary rows).
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
    // Adjacency WITHOUT a global-rank self-join: range partitions are
    // disjoint and ordered, so lead() inside each partition yields every
    // adjacent suffix pair except the nParts-1 partition-boundary pairs,
    // which are reconstructed from the (bounded, driver-metadata-sized)
    // first/last row of each partition. The earlier formulation ranked
    // globally and joined rank r with r+1 — correct, but it hash-shuffled
    // the ~10x-amplified window table twice; lead() keeps the whole
    // adjacency inside the existing range partitioning (measured
    // 2.6 -> 1.5 s at sf0.1, identical output).
    val parts = stageRanked(docs)
    val wOrd = Window.partitionBy(col("pid"))
      .orderBy(col("win"), col("doc_id"), col("off"))
    val inner = parts
      .withColumn("nb_doc", lead(col("doc_id"), 1).over(wOrd))
      .withColumn("nb_win", lead(col("win"), 1).over(wOrd))
      .filter(col("nb_doc").isNotNull)
      .select(col("doc_id").as("da"), col("win").as("wa"),
        col("nb_doc").as("db"), col("nb_win").as("wb"))
    // Partition-boundary adjacency: the last row of each NONEMPTY range
    // partition is globally adjacent to the first row of the next
    // nonempty one (chaining consecutive nonempty pids also covers empty
    // range partitions, which the rank join used to absorb via
    // contiguous global ranks). min_by/max_by under the suffix order
    // finds both rows with ONE partially-aggregated pass — no sort; the
    // result is bounded by the partition count (driver metadata, the
    // same collect discipline the rank offsets used).
    val ord = struct(col("win"), col("doc_id"), col("off"))
    val bounds = parts.groupBy(col("pid")).agg(
        min_by(struct(col("doc_id"), col("win")), ord).as("first"),
        max_by(struct(col("doc_id"), col("win")), ord).as("last"))
      .collect()
      .map { r =>
        val f = r.getStruct(1); val l = r.getStruct(2)
        r.getInt(0) -> ((f.getLong(0), f.getString(1), l.getLong(0), l.getString(1)))
      }.toMap
    val pids = bounds.keys.toSeq.sorted
    val boundary = pids.zip(pids.drop(1)).map { case (p, q) =>
      val (_, _, da, wa) = bounds(p)
      val (db, wb, _, _) = bounds(q)
      (da, wa, db, wb)
    }
    val spark = docs.sparkSession
    import spark.implicits._
    inner.unionByName(boundary.toDF("da", "wa", "db", "wb"))
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
