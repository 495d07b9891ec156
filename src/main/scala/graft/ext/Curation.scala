package graft.ext

import graft.Tables
import graft.functions.{LangId, TextFns, TextStats}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset curation primitives for a training-data pipeline: reproducible
  * hash-based sampling, train/val/test split assignment, and an
  * end-to-end curation query composing quality scoring + language ID +
  * exact dedup + splitting.
  *
  * Split/sample decisions hash the STABLE document id (never `rand()`):
  * every run, every engine, and every retry of a failed task assigns the
  * same document to the same split — the property a reproducible corpus
  * build needs. The hash is md5 of the decimal id string, which DuckDB
  * computes identically, so even these ops are oracle-checkable. All of
  * it is a pure map over the scan — no shuffle, no state — so at 100 TB
  * the split step is free (it fuses into whatever scan follows).
  */
object Curation {

  /** First hex byte of md5(id) — 256 evenly-loaded lexicographic buckets
    * (hex digits are ASCII-ordered, so string comparison = numeric
    * comparison on the bucket).
    */
  def hashBucket(id: Column): Column =
    substring(md5(id.cast("string").cast("binary")), 1, 2)

  /** ~80/10/10 split on the 256 hash buckets: 'cd' = 205 ⇒ 205/256 train,
    * 'e6' = 230 ⇒ 25/256 val, rest test. Deterministic in the id alone.
    */
  def splitAssign(id: Column): Column = {
    val h = hashBucket(id)
    when(h < "cd", "train").when(h < "e6", "val").otherwise("test")
  }

  /** Reproducible ~rate sampling by hash prefix; rate is quantized to
    * 1/256ths (pass the threshold bucket count).
    */
  def sampleByHash(df: DataFrame, id: Column, buckets: Int): DataFrame = {
    require(buckets >= 1 && buckets <= 256, "buckets in [1, 256]")
    // 256 formats to three hex chars, which would break the 2-char
    // lexicographic compare — and means "keep everything" anyway
    if (buckets == 256) df
    else df.filter(hashBucket(id) < lit(f"${buckets}%02x"))
  }

  /** Per-split document counts over the whole corpus. */
  def qSplitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(splitAssign(col("doc_id")).as("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("split")

  /** Reproducible ~12.5% sample (32/256 buckets) of the documents. */
  def qSampleHash(spark: SparkSession, dir: String): DataFrame =
    sampleByHash(Tables.documents(spark, dir), col("doc_id"), 32)
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")

  /** End-to-end curation: language-agnostic quality gates (punctuation
    * ratio, mean token length), predicted-language == declared-language
    * agreement, exact dedup (min-id representative per content hash),
    * then split assignment. One shuffle total (the dedup window); the
    * quality/lang columns come from the native single-pass expressions.
    */
  def qCurate(spark: SparkSession, dir: String): DataFrame = {
    val st = TextStats(col("text"), Seq("the", "a", "of", "and", "to", "in"))
    val pred = LangId(col("text"))
    val w = Window.partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("st", st)
      .withColumn("punct_ratio", round(col("st.n_punct").cast("double") / col("st.n_chars"), 4))
      .withColumn("mean_token_len",
        round(col("st.sum_token_len").cast("double") / col("st.n_tokens"), 4))
      .withColumn("lang_pred", pred.getField("lang"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 &&
        col("punct_ratio") <= 0.2 &&
        col("mean_token_len").between(2.0, 15.0) &&
        col("lang_pred") === col("lang"))
      .select(col("doc_id"), col("lang"), splitAssign(col("doc_id")).as("split"))
      .orderBy("doc_id")
  }

  /** Stratified sampling: exactly ceil(frac·n) documents per stratum,
    * chosen by hash rank — reproducible (the same documents every run,
    * every engine) and exactly proportional per stratum, which plain
    * hash-threshold sampling only achieves in expectation.
    *
    * The rank is a window per stratum, so work shuffles on the stratum
    * key. With low-cardinality strata and a huge corpus, a hot stratum
    * serializes into one task; the fix at that scale is selection rather
    * than ranking — approx-quantile the hash within each stratum to a
    * threshold, keep below it, and fix up the boundary bucket exactly.
    * The rank form here IS the exactness oracle for that optimization.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, id: Column, frac: Double): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(hashBucketFull(id), id)
    val n = Window.partitionBy(stratum)
    df.withColumn("rn", row_number().over(w))
      .withColumn("n_stratum", count(lit(1)).over(n))
      .filter(col("rn") <= ceil(lit(frac) * col("n_stratum")))
      .drop("rn", "n_stratum")
  }

  /** Full md5 hex of the id — the per-stratum sampling order. */
  private def hashBucketFull(id: Column): Column =
    md5(id.cast("string").cast("binary"))

  /** The hot-stratum scale path for [[stratifiedSample]], result-equal
    * by construction (RetrievalSpec asserts it): instead of ranking the
    * whole stratum in one task, a per-stratum hash threshold keeps
    * ~slack·frac of the rows (hashes are uniform, so the frac-quantile
    * of the hash IS ≈frac), and only that slice is ranked exactly.
    * The single hot-stratum window task shrinks from n to ~slack·frac·n
    * rows. Correctness: if the kept slice has ≥ k rows, it provably
    * contains the true top-k (every row outside it hashes strictly
    * higher); strata where the slice came up short — possible but
    * exponentially unlikely with slack — fall back to ranking the full
    * stratum via the `deficient` flag, all inside one plan.
    */
  def stratifiedSampleThreshold(
      df: DataFrame, stratum: Column, id: Column, frac: Double,
      slack: Double = 1.5): DataFrame = {
    val withU = df
      .withColumn("__h", hashBucketFull(id))
      // numeric prefix of the hash: consistent with the hex sort order
      .withColumn("__u",
        conv(substring(col("__h"), 1, 8), 16, 10).cast("long").cast("double")
          / lit(4294967296.0))
    val counts = withU.groupBy(stratum.as("__s"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__k", ceil(lit(frac) * col("__n")))
      .withColumn("__t", least(lit(1.0), lit(frac * slack) + lit(32.0) / col("__n")))
    val below = withU.join(broadcast(counts), stratum === col("__s"))
      .filter(col("__u") < col("__t"))
    val belowCounts = below.groupBy(col("__s").as("__s2"))
      .agg(count(lit(1)).as("__bn"))
    val flags = counts.join(belowCounts, col("__s") === col("__s2"), "left")
      .select(col("__s"), col("__k"), col("__t"),
        (coalesce(col("__bn"), lit(0L)) < col("__k")).as("__deficient"))
    val w = Window.partitionBy(stratum).orderBy(col("__h"), id)
    withU.join(broadcast(flags), stratum === col("__s"))
      .filter(col("__u") < col("__t") || col("__deficient"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__k"))
      .drop("__h", "__u", "__s", "__k", "__t", "__deficient", "__rn")
  }

  /** 20% per-language reproducible sample of the documents. */
  def qStratifiedSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.documents(spark, dir), col("lang"), col("doc_id"), 0.2)
      .select("doc_id", "lang")
      .orderBy("doc_id")

  /** Deterministic weighted sampling (Efraimidis-Spirakis A-Res): keep
    * the k rows with the largest u^(1/w), where u is a hash-derived
    * uniform in [0,1) — higher weight ⇒ proportionally higher keep
    * probability, and the decision is a pure function of the id (no
    * rand(): reproducible across runs, engines, and task retries, like
    * every other curation op here). The top-k lowers to
    * TakeOrderedAndProject — per-partition heaps, no global sort.
    */
  def weightedSample(df: DataFrame, id: Column, weight: Column, k: Int): DataFrame = {
    // first 8 md5 hex chars as an unsigned 32-bit uniform
    val u = conv(substring(md5(id.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)
    df.withColumn("__k", pow(u, lit(1.0) / weight.cast("double")))
      .orderBy(col("__k").desc, id)
      .limit(k)
      .drop("__k")
  }

  /** 100 documents sampled with probability proportional to length. */
  def qWeightedSample(spark: SparkSession, dir: String): DataFrame =
    weightedSample(Tables.documents(spark, dir), col("doc_id"), col("n_chars"), 100)
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_weighted_sample" -> (qWeightedSample _),
    "q_split_assign" -> (qSplitAssign _),
    "q_sample_hash" -> (qSampleHash _),
    "q_curate" -> (qCurate _),
    "q_stratified_sample" -> (qStratifiedSample _),
  )

  private val splitSql =
    """CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
      |     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
      |     ELSE 'test' END""".stripMargin

  // langid argmax structs generated from the SAME profile list the Spark
  // side scores with (mirrors Text.oracles("text_langid"))
  private def langStructs: String = TextFns.langProfiles.map { case (code, words) =>
    val lst = words.map(w => s"'$w'").mkString("[", ",", "]")
    s"{score: CAST(len(list_filter(w, x -> list_contains($lst, x))) AS DOUBLE) / greatest(len(w), 1), lang: '$code'}"
  }.mkString(",\n        ")

  val oracles: Map[String, String] = Map(
    "q_split_assign" ->
      s"""SELECT $splitSql AS split, count(*) AS n_docs
         |FROM documents GROUP BY 1 ORDER BY split""".stripMargin,
    "q_sample_hash" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '20'
        |ORDER BY doc_id""".stripMargin,
    "q_weighted_sample" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |         pow((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
        |             / 4294967296.0, 1.0 / n_chars) AS k
        |  FROM documents
        |  ORDER BY k DESC, doc_id LIMIT 100) t
        |ORDER BY doc_id""".stripMargin,
    "q_stratified_sample" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |         count(*) OVER (PARTITION BY lang) AS n_stratum
        |  FROM documents)
        |SELECT doc_id, lang FROM r
        |WHERE rn <= ceil(0.2 * n_stratum) ORDER BY doc_id""".stripMargin,
    "q_curate" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, text,
         |         string_split_regex(trim(lower(text)), '\\s+') AS w,
         |         round(CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
         |               / length(text), 4) AS punct_ratio,
         |         round(CAST(list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
         |               x -> length(x))) AS DOUBLE)
         |               / len(string_split_regex(trim(text), '\\s+')), 4) AS mean_token_len,
         |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |  FROM documents),
         |l AS (SELECT doc_id AS l_doc_id, (list_sort([
         |        $langStructs], 'DESC'))[1].lang AS lang_pred
         |      FROM t),
         |kept AS (
         |  SELECT t.doc_id AS doc_id, t.lang AS lang
         |  FROM t JOIN l ON t.doc_id = l.l_doc_id
         |  WHERE t.rn = 1 AND t.punct_ratio <= 0.2
         |    AND t.mean_token_len BETWEEN 2.0 AND 15.0 AND l.lang_pred = t.lang)
         |SELECT doc_id, lang, $splitSql AS split
         |FROM kept ORDER BY doc_id""".stripMargin,
  )
}
