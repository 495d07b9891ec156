package graft.ext

import graft.Tables
import graft.functions.{TextFns, WordShingles}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus retrieval / audit operators a training-data pipeline runs over
  * the document store: BM25 ranked retrieval (the classic quality-biased
  * selector for "find documents about X" curation passes) and
  * benchmark-contamination detection (n-gram overlap between a held-out
  * evaluation set and the training corpus).
  *
  * Scale shape: both are explode→partial-aggregate pipelines. The
  * per-term and per-gram fan-out is absorbed map-side by partial aggregation
  * before any exchange; the tiny side (term stats, the benchmark gram
  * set) broadcasts, so the corpus is scanned exactly once and never
  * shuffled in full.
  */
object Retrieval {

  val K1 = 1.2
  val B = 0.75

  /** Default query for the driver-contract entry. */
  val QueryTerms: Seq[String] = Seq("spark", "hash", "join")

  /** BM25 over whitespace tokens: score(d) = Σ_t idf(t) · tf·(k1+1) /
    * (tf + k1·(1 − b + b·dl/avgdl)) with idf(t) = ln(1 + (N − df + ½)/(df + ½)).
    *
    * Plan: one corpus scan → explode to query-term hits only (the filter
    * sits inside the generator's child, so non-query tokens never leave
    * the mapper) → partial-agg tf per (doc, term); df and the corpus
    * stats are two scalar-sized aggregates broadcast back. Top-k lowers
    * to TakeOrderedAndProject.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k: Int = 20): DataFrame = {
    val toks = docs
      .select(col("doc_id"), TextFns.tokens(lower(col("text"))).as("w"))
      .withColumn("dl", size(col("w")))
    val stats = toks.agg(
      count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("w")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(K1 + 1)) /
          (col("tf") + lit(K1) * (lit(1.0) - lit(B) + lit(B) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")), 4).as("score"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  def qBm25(spark: SparkSession, dir: String): DataFrame =
    bm25(Tables.documents(spark, dir), QueryTerms)

  /** Benchmark contamination: for each held-out document (doc_id ≡ 0 mod
    * 100 stands in for the eval set), how many corpus documents share at
    * least one word-5-gram with it, and how many of its distinct 5-grams
    * leak. Emits one row per benchmark document (zero counts included),
    * so the result is stable even on a clean corpus.
    *
    * The benchmark gram set is tiny relative to the corpus and
    * broadcasts; the corpus side is a single explode→join→partial-agg
    * pass, never shuffled in full. 5-grams (not shorter) keep accidental
    * collisions near zero so a hit means real leakage.
    */
  def contamination(docs: DataFrame, n: Int = 5): DataFrame = {
    val isBench = col("doc_id") % 100 === 0
    val grams = docs.select(col("doc_id"),
      explode(WordShingles(col("text"), n)).as("g"))
    val bench = grams.filter(isBench).select(col("doc_id").as("bench_id"), col("g"))
    val corpus = grams.filter(!isBench).select(col("doc_id").as("corpus_id"), col("g"))
    val hits = corpus.join(broadcast(bench), "g")
      .groupBy(col("bench_id"))
      .agg(
        countDistinct(col("corpus_id")).as("n_contam_docs"),
        countDistinct(col("g")).as("n_shared_grams"))
    docs.filter(isBench).select(col("doc_id").as("bench_id"))
      .join(hits, Seq("bench_id"), "left")
      .select(col("bench_id"),
        coalesce(col("n_contam_docs"), lit(0L)).as("n_contam_docs"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
      .orderBy("bench_id")
  }

  def qContamination(spark: SparkSession, dir: String): DataFrame =
    contamination(Tables.documents(spark, dir))

  /** Distinct benchmark n-gram set — the static probe side shared by the
    * batch [[quarantine]] and the streaming ingest guard
    * ([[graft.streaming.Streaming.runQuarantineStream]]).
    */
  def benchGramSet(docs: DataFrame, n: Int = 5): DataFrame =
    docs.filter(col("doc_id") % 100 === 0)
      .select(explode(WordShingles(col("text"), n)).as("g"))
      .distinct()

  /** Ingest-time decontamination quarantine — [[contamination]] turned
    * around to the per-CORPUS-document view: each non-benchmark document
    * that shares ≥1 word-5-gram with the benchmark suite, with its
    * distinct shared-gram count. Where `q_contamination` is the audit a
    * corpus build runs per benchmark document, this is the FILTER shape:
    * the quarantined ids are exactly what an ingest pipeline subtracts
    * (anti-join) before training. Stateless per document against a
    * static benchmark side — which is why the streaming form needs no
    * state store and the per-micro-batch union equals the batch result
    * exactly (StreamingSpec).
    *
    * The gram join is UNHINTED: the benchmark gram set scales with the
    * eval suite, not the corpus — AQE broadcasts a small suite and
    * shuffles a giant one (the contaminationBloom rationale; compose
    * with that bloom screen when the suite outgrows a broadcast).
    */
  def quarantine(docs: DataFrame, benchGrams: DataFrame, n: Int = 5): DataFrame =
    docs.filter(col("doc_id") % 100 =!= 0)
      .select(col("doc_id"), explode(WordShingles(col("text"), n)).as("g"))
      .join(benchGrams, "g")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_shared_grams"))

  def qQuarantine(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    quarantine(docs, benchGramSet(docs)).orderBy("doc_id")
  }

  /** Bloom-screened contamination — same RESULT as [[contamination]],
    * different scale posture: instead of broadcasting the benchmark gram
    * SET into the join, the benchmark grams aggregate into a fixed-size
    * Bloom filter (Spark's native `BloomFilterAggregate`, the runtime-
    * filter machinery) and the corpus side drops non-members with a
    * codegen'd `might_contain` BEFORE the join. At 100 TB the gram set
    * of a large eval suite outgrows a broadcast hash relation; the bloom
    * stays at its configured bit size no matter the corpus, and false
    * positives only cost a little extra join input — the exact join
    * confirms, so false positives never reach the result and false
    * negatives are impossible. Oracle: the same SQL as q_contamination.
    */
  def contaminationBloom(docs: DataFrame, n: Int = 5): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types.BinaryType
    val isBench = col("doc_id") % 100 === 0
    val grams = docs.select(col("doc_id"),
      explode(WordShingles(col("text"), n)).as("g"))
    val bench = grams.filter(isBench).select(col("doc_id").as("bench_id"), col("g"))
    // one distributed pass builds the sketch; the driver relays the
    // fixed-size binary into a literal (the same shape Spark's own
    // InjectRuntimeFilter produces via a scalar subquery)
    val bf = bench.select(Bridge.toColumn(
        new BloomFilterAggregate(new XxHash64(Seq(Bridge.toExpression(col("g")))))
          .toAggregateExpression()).as("bf"))
      .first().getAs[Array[Byte]](0)
    val screened = grams.filter(!isBench)
      .filter(Bridge.toColumn(BloomFilterMightContain(
        Literal.create(bf, BinaryType),
        new XxHash64(Seq(Bridge.toExpression(col("g")))))))
      .select(col("doc_id").as("corpus_id"), col("g"))
    // no broadcast hint: the rationale above is precisely that the bench
    // gram set can outgrow a broadcast relation — AQE broadcasts a small
    // suite and shuffles a large one (the tfidf/annTopkFiltered discipline)
    val hits = screened.join(bench, "g")
      .groupBy(col("bench_id"))
      .agg(
        countDistinct(col("corpus_id")).as("n_contam_docs"),
        countDistinct(col("g")).as("n_shared_grams"))
    docs.filter(isBench).select(col("doc_id").as("bench_id"))
      .join(hits, Seq("bench_id"), "left")
      .select(col("bench_id"),
        coalesce(col("n_contam_docs"), lit(0L)).as("n_contam_docs"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
      .orderBy("bench_id")
  }

  def qContaminationBloom(spark: SparkSession, dir: String): DataFrame =
    contaminationBloom(Tables.documents(spark, dir))

  /** Per-document top-3 TF-IDF terms (tf · ln(N/df), ties broken by
    * term) — the keyword-extraction pass of a corpus indexing pipeline.
    * df is a VOCABULARY-sized aggregate, which grows with the corpus, so
    * its join carries no broadcast hint (AQE broadcasts a small
    * vocabulary, shuffles a web-scale one on the term key — tf is
    * already term-keyed from its own aggregation, so the exchange often
    * reuses); the per-doc rank uses the Spark 4 window-group-limit
    * partial top-k, so no document's term list is ever sorted in full
    * on one task.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col("doc_id"), explode(TextFns.tokens(lower(col("text")))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(stats))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
      .orderBy("doc_id", "rank")
  }

  def qTfidf(spark: SparkSession, dir: String): DataFrame =
    tfidfTopTerms(Tables.documents(spark, dir))

  /** Hybrid retrieval via reciprocal-rank fusion (RRF): the lexical
    * (BM25) and dense (cosine top-k) candidate lists merge by
    * Σ 1/(c + rank) — the standard fusion rule for text+vector search,
    * robust to the two scorers' incomparable score scales because only
    * RANKS enter the sum.
    *
    * Scale shape: each retriever runs its own scale-safe plan (BM25's
    * explode→partial-agg, the vector side's one-scan
    * TakeOrderedAndProject); fusion then touches only 2×depth candidate
    * rows — the rank windows and the full-outer merge are bounded by the
    * `depth` constant, independent of corpus size.
    */
  def rrfFusion(
      spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 10, depth: Int = 50, c: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val text = bm25(Tables.documents(spark, dir), QueryTerms, depth)
      .select(col("doc_id"), col("score"))
    val tRank = text
      .withColumn("text_rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("text_rank"))
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") === queryId).select(col("embedding").as("query_emb"))
    val vec = e.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        round(Similarity.cosine(col("embedding"), col("query_emb")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("doc_id"))
      .limit(depth)
    val vRank = vec
      .withColumn("vec_rank",
        row_number().over(Window.orderBy(col("cosine").desc, col("doc_id"))))
      .select(col("doc_id"), col("vec_rank"))
    tRank.join(vRank, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        round(
          coalesce(lit(1.0) / (lit(c) + col("text_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(c) + col("vec_rank")), lit(0.0)), 6).as("rrf_score"),
        col("text_rank"), col("vec_rank"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(k)
  }

  def qRrfFusion(spark: SparkSession, dir: String): DataFrame =
    rrfFusion(spark, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bm25" -> (qBm25 _),
    "q_contamination" -> (qContamination _),
    "q_contamination_bloom" -> (qContaminationBloom _),
    "q_quarantine" -> (qQuarantine _),
    "q_tfidf" -> (qTfidf _),
    "q_rrf_fusion" -> (qRrfFusion _),
  )

  private def termList = QueryTerms.map(t => s"'$t'").mkString("[", ", ", "]")

  /** Shared CTE chain ending in `bscore(doc_id, score, n_terms_hit)` —
    * BM25 scores for [[QueryTerms]] (mirrors [[bm25]]); shared by the
    * `q_bm25` and `q_rrf_fusion` oracles so the scoring semantics cannot
    * drift between them.
    */
  private def bm25ScoreCte: String =
    s"""t AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents),
       |d AS (SELECT doc_id, len(w) AS dl, unnest(w) AS tok FROM t),
       |stats AS (SELECT count(*) AS n_docs, avg(len(w)) AS avgdl FROM t),
       |tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM d
       |       WHERE list_contains($termList, tok) GROUP BY 1, 2, 3),
       |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
       |bscore AS (
       |  SELECT doc_id,
       |         round(sum(ln(1.0 + (n_docs - df.df + 0.5) / (df.df + 0.5))
       |               * (tf.tf * ${K1 + 1}) /
       |                 (tf.tf + $K1 * (1.0 - $B + $B * dl / avgdl))), 4) AS score,
       |         count(*) AS n_terms_hit
       |  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN stats
       |  GROUP BY doc_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_bm25" ->
      s"""WITH $bm25ScoreCte
         |SELECT doc_id, score, n_terms_hit FROM bscore
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q_rrf_fusion" ->
      s"""WITH $bm25ScoreCte,
         |btop AS (SELECT doc_id, score FROM bscore ORDER BY score DESC, doc_id LIMIT 50),
         |brank AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS text_rank
         |          FROM btop),
         |vtop AS (
         |  SELECT e.vec_id AS doc_id,
         |         round(list_cosine_similarity(e.embedding::DOUBLE[], q.query_emb::DOUBLE[]), 4) AS cosine
         |  FROM embeddings e, (SELECT embedding AS query_emb FROM embeddings WHERE vec_id = 0) q
         |  WHERE e.vec_id <> 0 ORDER BY cosine DESC, doc_id LIMIT 50),
         |vrank AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS INTEGER) AS vec_rank
         |          FROM vtop)
         |SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
         |       round(coalesce(CAST(1 AS DOUBLE) / (60 + b.text_rank), 0)
         |             + coalesce(CAST(1 AS DOUBLE) / (60 + v.vec_rank), 0), 6) AS rrf_score,
         |       b.text_rank AS text_rank, v.vec_rank AS vec_rank
         |FROM brank b FULL JOIN vrank v ON b.doc_id = v.doc_id
         |ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin,
    // rank by the ROUNDED score on both sides so tie-breaks agree
    "q_tfidf" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |stats AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, tf.term AS term,
        |         round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df), 4) AS tfidf
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN stats),
        |ranked AS (
        |  SELECT doc_id, term, tfidf,
        |         CAST(row_number() OVER (PARTITION BY doc_id
        |                ORDER BY tfidf DESC, term) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT doc_id, rank, term, tfidf FROM ranked
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q_contamination" -> contaminationSql,
    // bloom pre-screen changes the PLAN, not the result — same oracle
    "q_contamination_bloom" -> contaminationSql,
    // same shingle construction as contaminationSql (shared gram5Cte),
    // per-corpus-doc view
    "q_quarantine" ->
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
        |${gram5Cte("t")},
        |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 100 = 0)
        |SELECT c.doc_id, CAST(count(DISTINCT c.g) AS BIGINT) AS n_shared_grams
        |FROM g c JOIN bench USING (g)
        |WHERE c.doc_id % 100 <> 0
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
  )

  /** DuckDB word-5-gram fragment: from a tokenized CTE `$src(doc_id, w)`
    * (the `\s+` trim split — [[Dedup.minhashPairsCte]]'s `t` is exactly
    * this), produce `g(doc_id, g)` with each doc's DISTINCT 5-grams
    * (whole text when shorter). ONE definition shared by the
    * q_contamination / q_quarantine oracles and the corpus-build funnel
    * ([[Curation]]), mirroring [[graft.functions.WordShingles]] at n=5.
    */
  private[graft] def gram5Cte(src: String): String =
    s"""g AS (SELECT doc_id, unnest(list_distinct(
       |        CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
       |             ELSE list_transform(range(1, len(w) - 3),
       |                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]) END)) AS g
       |      FROM $src)""".stripMargin

  private lazy val contaminationSql: String =
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
        |${gram5Cte("t")},
        |hits AS (
        |  SELECT b.doc_id AS bench_id,
        |         count(DISTINCT c.doc_id) AS n_contam_docs,
        |         count(DISTINCT b.g) AS n_shared_grams
        |  FROM g b JOIN g c ON b.g = c.g
        |  WHERE b.doc_id % 100 = 0 AND c.doc_id % 100 <> 0
        |  GROUP BY 1)
        |SELECT d.doc_id AS bench_id,
        |       coalesce(n_contam_docs, 0) AS n_contam_docs,
        |       coalesce(n_shared_grams, 0) AS n_shared_grams
        |FROM documents d LEFT JOIN hits ON d.doc_id = hits.bench_id
        |WHERE d.doc_id % 100 = 0 ORDER BY bench_id""".stripMargin
}
