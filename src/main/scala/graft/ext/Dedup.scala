package graft.ext

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` / `embeddings` (SURVEY §2.11):
  * exact (hash groupBy), MinHash+LSH (shingle→minhash→band→bucket join),
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design: every variant is candidate-generation-by-key (hash
  * bucket / LSH band / block) followed by verification INSIDE buckets, so
  * the only shuffles are groupBys on bucket keys and the pairwise work is
  * bounded by bucket size — never all-pairs over the corpus. At 100 TB
  * the band/bucket cardinality keeps partitions balanced; skewed buckets
  * (a viral duplicate cluster) are handled by AQE skew splitting.
  */
object Dedup {

  // --- exact ---------------------------------------------------------------

  /** Exact dedup via content hash: one shuffle on md5(text); the kept row
    * is min(doc_id) per group (deterministic representative).
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies", "content_hash")
      .orderBy("doc_id")

  // --- MinHash + LSH -------------------------------------------------------

  val NumHashes = 128
  val Bands = 32 // rows per band r = 4; catch-probability at j: 1-(1-j^4)^32

  /** Per-document MinHash signature: for seed i, min over shingles of
    * xxhash64(i, shingle). Pure expression work — no UDF, no shuffle.
    */
  def minhashSignature(shingles: Column): Column =
    transform(
      sequence(lit(0), lit(NumHashes - 1)),
      i => array_min(transform(shingles, s => xxhash64(i, s))))

  /** Banded candidate pairs + exact word-3-gram Jaccard verification.
    * LSH recall at the 0.8 threshold with r=4,b=32 is 1-(1-0.8^4)^32
    * ≈ 1-2e-7 — the oracle computes exact all-pairs truth and the two
    * agree because the planted near-dups sit at j≥0.97.
    */
  def dedupMinhash(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.wordShingles(col("text"), 3).as("shingles"))
      .withColumn("sig", minhashSignature(col("shingles")))

    val r = NumHashes / Bands
    val banded = docs.select(
      col("doc_id"), col("shingles"),
      posexplode(transform(
        sequence(lit(0), lit(Bands - 1)),
        b => hash(slice(col("sig"), b * r + 1, lit(r))))).as(Seq("band_idx", "band_hash")))

    // bucket join: same (band_idx, band_hash) → candidate pair, doc_a < doc_b
    val a = banded.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b = banded.select(col("band_idx").as("band_idx_b"), col("band_hash").as("band_hash_b"),
      col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    val candidates = a.join(b,
        col("band_idx") === col("band_idx_b") &&
          col("band_hash") === col("band_hash_b") &&
          col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b")
      .dropDuplicates("doc_a", "doc_b")

    candidates
      .withColumn("jaccard", TextFns.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  // --- SimHash -------------------------------------------------------------

  val SimhashBits = 64

  /** 64-bit SimHash over word shingles, computed relationally: explode
    * shingles, hash once per shingle, then ONE groupBy(doc_id) carrying 64
    * per-bit vote sums (sign of bit b of the shingle hash). Map-side
    * partial aggregation makes the exchange carry 64 longs per doc — this
    * is the scalable form (a per-row nested-lambda version re-evaluates
    * the vote array per fold step, a 64x runtime blowup).
    */
  def simhashTable(docs: DataFrame): DataFrame = {
    val exploded = docs
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .withColumn("h", xxhash64(col("s")))
    val votes = (0 until SimhashBits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$b")
    }
    val assembled = (0 until SimhashBits).map { b =>
      when(col(s"b$b") > 0L, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    exploded.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), assembled.as("simhash"))
  }

  /** Per-doc SimHash + near-dup pairs at Hamming distance ≤ 3, found by
    * the 4-chunk pigeonhole: any pair within distance 3 shares at least
    * one exact 16-bit chunk, so candidates come from chunk-bucket joins.
    */
  def dedupSimhash(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val docs = simhashTable(
      Tables.documents(spark, dir)
        .select(col("doc_id"), TextFns.wordShingles(col("text"), 3).as("shingles")))

    val chunks = docs.select(
      col("doc_id"), col("simhash"),
      posexplode(transform(
        sequence(lit(0), lit(3)),
        c => call_function("shiftright", col("simhash"), (c * 16).cast("int"))
          .bitwiseAND(lit(0xffffL)))).as(Seq("chunk_idx", "chunk")))

    val a = chunks.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = chunks.select(col("chunk_idx").as("ci_b"), col("chunk").as("ch_b"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    a.join(b, col("chunk_idx") === col("ci_b") && col("chunk") === col("ch_b") &&
        col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  // --- n-gram Jaccard (blocked exact) --------------------------------------

  /** Character-set Jaccard over language blocks: exact pairwise similarity
    * inside each `lang` block (bounded block size), top-100 pairs.
    * Matches DuckDB's `jaccard(a, b)` string function exactly, which makes
    * this the oracle-checked member of the family.
    */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), TextFns.charSet(col("text")).as("cs"))
    val a = docs.select(col("lang"), col("doc_id").as("doc_a"), col("cs").as("cs_a"))
    val b = docs.select(col("lang").as("lang_b"), col("doc_id").as("doc_b"), col("cs").as("cs_b"))
    a.join(b, col("lang") === col("lang_b") && col("doc_a") < col("doc_b"))
      .select(col("lang"), col("doc_a"), col("doc_b"),
        round(TextFns.jaccard(col("cs_a"), col("cs_b")), 4).as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(100)
  }

  // --- embedding cosine near-dup -------------------------------------------

  /** Top-50 most-similar embedding pairs by exact cosine, blocked by
    * `label` (the natural shard key here; at scale the block key is an
    * LSH bucket — see Similarity.annLshBuckets).
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("label"), col("vec_id"), col("embedding"))
    val a = e.select(col("label"), col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = e.select(col("label").as("label_b"), col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(b, col("label") === col("label_b") && col("vec_a") < col("vec_b"))
      .select(col("label"), col("vec_a"), col("vec_b"),
        round(Similarity.cosine(col("emb_a"), col("emb_b")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
      .limit(50)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_minhash" -> ((s: SparkSession, d: String) => dedupMinhash(s, d)),
    "dedup_simhash" -> ((s: SparkSession, d: String) => dedupSimhash(s, d)),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_embedding" -> (dedupEmbedding _),
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies, md5(text) AS content_hash
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,
    // exact all-pairs truth for the LSH pipeline (recall ≈ 1 at j≥0.8)
    "dedup_minhash" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |    ELSE list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END)) AS s
        |  FROM t),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |       round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_ngram_jaccard" ->
      """SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       round(jaccard(a.text, b.text), 4) AS jaccard
        |FROM documents a JOIN documents b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 100""".stripMargin,
  )
}
