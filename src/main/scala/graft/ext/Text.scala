package graft.ext

import graft.Tables
import graft.functions.{CharNgrams, RollingHashFingerprint, TextFns}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (SURVEY §2.11):
  * token counting, quality scoring, language ID, document fingerprinting.
  * All per-row computations — embarrassingly parallel, no shuffle; at
  * 100 TB these run as a single mapper stage over the parquet scan with
  * only doc_id/text read (column pruning).
  */
object Text {

  /** Token counting: whitespace tokens + a BPE-ish regex pre-tokenizer. */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(TextFns.tokens(col("text"))).as("n_ws_tokens"),
        size(TextFns.bpeishTokens(col("text"))).as("n_bpe_tokens"),
        length(col("text")).as("n_chars_measured"))
      .orderBy("doc_id")

  /** Quality scoring: structural ratios used for corpus filtering, from
    * ONE byte-walk per document (native [[graft.functions.TextStats]];
    * the composed form — see TextFns ratio helpers — tokenizes three
    * times and runs two regex passes, ~25x slower at bench scale).
    */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val st = graft.functions.TextStats(
      col("text"), Seq("the", "a", "of", "and", "to", "in"))
    Tables.documents(spark, dir)
      .withColumn("st", st)
      .select(
        col("doc_id"),
        round(col("st.n_punct").cast("double") / col("st.n_chars"), 4).as("punct_ratio"),
        round(col("st.n_digit").cast("double") / col("st.n_chars"), 4).as("digit_ratio"),
        round(col("st.sum_token_len").cast("double") / col("st.n_tokens"), 4).as("mean_token_len"),
        round(col("st.stopword_hits").cast("double") / col("st.n_tokens"), 4).as("stopword_ratio"))
      .orderBy("doc_id")
  }

  /** Language ID via stopword-profile scoring. Oracle-checked: the
    * stopword-profile argmax is expressed in DuckDB as a descending
    * `list_sort` over (score, lang) structs — struct comparison orders by
    * score then lang code, mirroring Spark's array_max tie-break exactly.
    */
  def textLangId(spark: SparkSession, dir: String): DataFrame = {
    val pred = graft.functions.LangId(col("text"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        pred.getField("lang").as("lang_pred"),
        round(pred.getField("score"), 4).as("lang_score"),
        col("lang").as("lang_declared"))
      .orderBy("doc_id")
  }

  /** Threshold-free detector evaluation AS A QUERY: one-vs-rest ROC AUC of
    * each stopword-profile language score against the declared labels, via
    * the Mann–Whitney rank-sum identity AUC = (R⁺ − n⁺(n⁺+1)/2)/(n⁺·n⁻)
    * with midrank tie handling. The [[graft.ext.Similarity.annRecallReport]]
    * / [[qTextNbReport]] discipline extended to the raw scorer: the
    * confusion matrix grades one operating point, AUC grades EVERY
    * threshold at once — the number a pipeline reads before picking a
    * language-gate cutoff.
    *
    * Numerics: scores come from ONE compiled walk per document
    * ([[graft.functions.LangScores]]) as exact IEEE quotients
    * hits/max(n_tokens,1), so grouping on the double is engine-portable;
    * the rank-sum runs in DOUBLED integer units (midrank = cum + (n+1)/2
    * lives in halves, so 2·R⁺ = Σ n⁺·(2·cum + n + 1) is an exact
    * integer, accumulated in DECIMAL(38,0) — Spark — / HUGEINT — DuckDB
    * — because it is O(n_docs²) and would wrap a BIGINT past ~1.7e9
    * docs) and the only division is the final AUC — one IEEE op,
    * rounded.
    *
    * Scale shape: the corpus-sized work is the single explode absorbed by
    * partial aggregation on (profile, score); distinct scores are
    * RATIONALS hits/denom with hits ≤ denom ≤ max tokens per doc, so the
    * aggregate is bounded by |profiles|·maxlen² rows INDEPENDENT of corpus
    * size, and the rank window sorts only that. Degenerate classes (a
    * profile with no positives or no negatives) emit NULL rather than a
    * NaN division.
    */
  def textAuc(spark: SparkSession, dir: String): DataFrame =
    langAucDf(Tables.documents(spark, dir))

  def langAucDf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the doubled rank-sum runs in DECIMAL(38,0) (DuckDB: HUGEINT):
    // r2 ≈ npos·2·cum with cum up to the per-profile row count, so the
    // per-profile sum is O(n_docs²) — past ~1.7e9 docs a BIGINT r2sum
    // wraps silently in Spark while DuckDB raises; 38 digits hold the
    // rank-sum for any BIGINT-countable corpus (bound < 3·n² < 2.6e38
    // only at n beyond 5.3e18 docs)
    val d380 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val byScore = docs
      .select(col("lang"), explode(graft.functions.LangScores(col("text"))).as("ls"))
      .select(col("ls.lang").as("lang_profile"), col("ls.score").as("score"),
        when(col("lang") === col("ls.lang"), 1L).otherwise(0L).as("pos"))
      .groupBy(col("lang_profile"), col("score"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("npos"))
    val asc = Window.partitionBy(col("lang_profile")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byScore
      .withColumn("cum", sum(col("n")).over(asc) - col("n"))
      .withColumn("r2",
        col("npos").cast(d380) * (col("cum").cast(d380) * 2 + col("n") + 1))
      .groupBy(col("lang_profile"))
      .agg(
        sum(col("npos")).as("n_pos"),
        sum(col("n") - col("npos")).as("n_neg"),
        sum(col("r2")).as("r2sum"))
      .select(
        col("lang_profile").as("lang"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("r2sum") - col("n_pos").cast(d380) * (col("n_pos") + lit(1L)))
              .cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
      .orderBy("lang")
  }

  /** Vocabulary-growth (Heaps-law) curve — the marginal-data-value
    * diagnostic: cumulative distinct types vs cumulative occurrences at
    * 10 corpus checkpoints in ingestion (doc_id) order, at TWO
    * granularities: unigram tokens (classic Heaps) and the distinct
    * word-3-shingles that are the dedup unit. A flattening type curve
    * says new data is re-treading existing vocabulary; a flattening
    * SHINGLE curve says it is re-treading existing passages — near-zero
    * shingle novelty in the tail buckets means the next crawl slice buys
    * almost no deduplicated content. This is the curve a mixture
    * designer reads before paying for more data.
    *
    * Checkpoints are VALUE-based doc_id buckets, bucket =
    * (doc_id−lo)·10 div (hi−lo+1), from one broadcast min/max aggregate —
    * exact integer arithmetic in both engines, and no rank window over
    * the corpus (an ntile bucketing would global-sort). "First
    * occurrence" is min(bucket) per type: a VOCAB-bounded aggregate with
    * map-side partial mins, so the corpus-sized work is the two explodes
    * (tokens; per-doc-distinct shingles via the compiled
    * [[graft.functions.WordShingles]] walk); everything downstream
    * (cumulative sums, ratios) runs on ≤10 rows.
    */
  def textHeaps(spark: SparkSession, dir: String): DataFrame =
    heapsCurveDf(Tables.documents(spark, dir))

  /** Value-based doc_id decile buckets — bucket = (doc_id−lo)·10 div
    * (hi−lo+1) from one broadcast min/max aggregate; exact integer
    * arithmetic in both engines and no rank window over the corpus. ONE
    * definition shared by the heaps curve and the novelty sketch
    * ([[graft.streaming.Streaming.qStreamNovelty]]) so their checkpoints
    * cannot drift.
    */
  def docBuckets(docs: DataFrame): DataFrame = {
    val mm = docs.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
    docs.crossJoin(broadcast(mm))
      .withColumn("bucket",
        expr("(doc_id - lo) * 10 div (hi - lo + 1)").cast("int"))
  }

  /** The ONE SQL mirror of [[docBuckets]]'s rule (expects `lo`/`hi` in
    * scope) — shared by the text_heaps and q_stream_novelty oracles so
    * the two curves' checkpoints cannot drift in DuckDB either.
    */
  private[graft] def bucketSql(idCol: String): String =
    s"CAST(($idCol - lo) * 10 // (hi - lo + 1) AS INT)"

  def heapsCurveDf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docBuckets(docs)
    def curve(unit: DataFrame, occName: String, newName: String): DataFrame = {
      // TWO streaming passes per unit, DELIBERATELY not materialized:
      // the occurrence count groups by bucket (10 rows) and the
      // first-occurrence count groups by type — different keys, so one
      // shared intermediate would have to be the (bucket, type) table,
      // which for SHINGLES is corpus-sized (distinct shingles grow
      // near-linearly — that growth is the very signal this query
      // measures). Pinning corpus-scale state in the block manager to
      // save a re-scan is the wrong trade at 100 TB; a second pruned
      // scan + map-side-absorbed explode is a streaming pass. (A
      // checkpointed variant measured ~25% faster at x100 on ONE box —
      // and would not survive a cluster-sized corpus.)
      val occ = unit.groupBy(col("bucket")).agg(count(lit(1)).as(occName))
      val firsts = unit.groupBy(col("u")).agg(min(col("bucket")).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(newName))
      occ.join(firsts, Seq("bucket"), "left")
        .withColumn(newName, coalesce(col(newName), lit(0L)))
    }
    val toks = curve(
      base.select(col("bucket"), explode(TextFns.tokens(lower(col("text")))).as("u")),
      "n_tokens", "new_types")
    val shingles = curve(
      base.select(col("bucket"),
        explode(graft.functions.WordShingles(lower(col("text")), 3)).as("u")),
      "n_shingles", "new_shingles")
    val nDocs = base.groupBy(col("bucket")).agg(count(lit(1)).as("n_docs"))
    val cum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nDocs.join(toks, "bucket").join(shingles, "bucket")
      .withColumn("cum_tokens", sum(col("n_tokens")).over(cum))
      .withColumn("cum_types", sum(col("new_types")).over(cum))
      .withColumn("cum_shingle_types", sum(col("new_shingles")).over(cum))
      .select(col("bucket"), col("n_docs"), col("n_tokens"), col("new_types"),
        col("cum_tokens"), col("cum_types"),
        round(col("cum_types").cast("double") / col("cum_tokens"), 6).as("ttr"),
        col("n_shingles"), col("new_shingles"), col("cum_shingle_types"),
        round(col("new_shingles").cast("double") / col("n_shingles"), 6)
          .as("shingle_novelty"))
      .orderBy("bucket")
  }

  /** Document fingerprinting with the native rolling-hash expression.
    * Oracle-checked: the 64-bit-wraparound polynomial is reproduced in
    * DuckDB with HUGEINT arithmetic (see [[fingerprintOracleCte]]).
    */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        RollingHashFingerprint(col("text"), 16).as("fingerprint"),
        RollingHashFingerprint(col("text"), 64).as("fingerprint_w64"))
      .orderBy("doc_id")

  /** Winnowing fingerprint parameters (shared with [[Dedup.dedupWinnow]]):
    * 24-byte k-grams winnowed over windows of 8 consecutive hashes — the
    * guarantee threshold is t = k + w - 1 = 31 bytes (any shared
    * substring of ≥31 bytes produces ≥1 shared fingerprint), and density
    * is ~2/(w+1) ≈ 22% of k-gram positions before de-duplication. k=24
    * was tuned on the corpus: at k=8 common-word 8-grams collide across
    * unrelated documents (~100k accidental pairs at sf0.01); at k=24
    * accidental collisions vanish while the planted near-dup pairs all
    * share ≥5 fingerprints.
    */
  val WinnowK = 24
  val WinnowW = 8

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
    * MOSS): the sorted distinct set of window-min k-gram hashes per
    * document, reported as count + order-insensitive digest + minimum.
    * Unlike [[textFingerprint]]'s single global min, the winnowed SET
    * supports span-level overlap counting (see `dedup_winnow`). Pure
    * per-row map over a pruned 2-column scan — one compiled pass per
    * document ([[graft.functions.WinnowFingerprints]]), no shuffle
    * except the output order.
    */
  def textWinnow(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // empty texts have no fingerprints and no row — mirrors the
      // oracle's octet_length > 0 filter; also guarantees fps is
      // non-empty below (n > 0 ⇒ m ≥ 1 ⇒ ≥1 selection), so the
      // element_at(…, 1) can't hit ANSI INVALID_ARRAY_INDEX
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        graft.functions.WinnowFingerprints(col("text"), WinnowK, WinnowW).as("fps"))
      .select(
        col("doc_id"),
        size(col("fps")).cast("long").as("n_selected"),
        md5(concat_ws(",", transform(col("fps"), x => x.cast("string")))).as("fp_digest"),
        element_at(col("fps"), 1).as("fp_min"))
      .orderBy("doc_id")

  /** Corpus-level n-gram document frequency: explode per-doc distinct
    * bigrams (the Generator/explode path) → groupBy count → top-20.
    * At scale: partial aggregation absorbs the explode fan-out before the
    * exchange; the final top-k is TakeOrderedAndProject.
    */
  def textTopNgrams(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(graft.functions.WordShingles(col("text"), 2)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("ngram"))
      .limit(20)

  /** Repetition signals (the Gopher-style quality rules adapted to
    * newline-free documents): per document, the fraction of repeated
    * words (1 − distinct/total) and the share of word-bigram occurrences
    * taken by the single most frequent bigram. Highly repetitive
    * machine-generated text scores near 1 on both and gets filtered.
    *
    * Shape at scale: all four ingredients (token count, distinct
    * tokens, top bigram multiplicity, bigram total) come from ONE
    * compiled pass per document ([[graft.functions.RepetitionStats]]) —
    * a pure map, so the only exchange is the output order. The earlier
    * explode → (doc, bigram) partial-agg → per-doc max/sum → join
    * formulation is retained in ExtSpec as the semantics oracle.
    */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    val r = graft.functions.RepetitionStats(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), r.as("r"))
      .select(
        col("doc_id"),
        col("r.n_tokens").as("n_tokens"),
        round(lit(1.0) - col("r.n_distinct").cast("double") / col("r.n_tokens"), 4)
          .as("dup_word_frac"),
        round(col("r.top_bigram").cast("double") / col("r.n_bigrams"), 4)
          .as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  /** Canonical text normalization for hashing/dedup keys: lowercase,
    * strip everything but alphanumerics and whitespace, collapse
    * whitespace runs, trim. Emitting the md5 of the normalized form
    * (not the text itself) keeps the result narrow — at corpus scale
    * the normalized-key column is what downstream exact dedup joins on.
    * Pure per-row map over a pruned 2-column scan.
    */
  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9\\s]", ""), "\\s+", " "))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(norm).as("n_chars_norm"),
        md5(norm.cast("binary")).as("norm_hash"))
      .orderBy("doc_id")
  }

  /** Per-language alphabet profile: the OR of every document's 128-bit
    * char bitmap, i.e. which ASCII codepoints the language's corpus
    * uses and how many. bit_or is algebraic, so this is a one-pass
    * partial-aggregable map+combine over the scan — profiling a 100 TB
    * corpus costs one shuffle of 5 tiny rows. Oracle: DuckDB counts the
    * distinct characters directly.
    */
  def textAlphabet(spark: SparkSession, dir: String): DataFrame = {
    val mask = graft.functions.SketchFns.charBitmap(col("text"))
    Tables.documents(spark, dir)
      .select(col("lang"),
        element_at(mask, 1).as("m0"), element_at(mask, 2).as("m1"))
      .groupBy(col("lang"))
      .agg(bit_or(col("m0")).as("u0"), bit_or(col("m1")).as("u1"))
      .select(col("lang"),
        (bit_count(col("u0")) + bit_count(col("u1"))).as("n_alphabet"))
      .orderBy("lang")
  }

  /** PII patterns shared by detection and redaction. ASCII-explicit and
    * boundary-free on purpose: Java regex (Spark) and RE2 (DuckDB) agree
    * on character classes and leftmost-first greedy matching, but NOT on
    * `\b` around non-ASCII word characters — so word boundaries are
    * avoided and both engines see byte-identical semantics.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII detection + redaction — the curation stage every shipped corpus
    * runs: emails, NANP-style phone numbers, and IPv4 literals counted
    * (pre-redaction) and masked by three nested codegen'd regexp passes,
    * email → phone → ip so an address inside a redacted email never
    * double-counts. The synthetic corpus carries no PII, so the query
    * plants one deterministic contact line per document (identical
    * expression on the oracle side); detection then operates on real
    * matches. Pure map over the scan — no shuffle at any scale.
    */
  def textPii(spark: SparkSession, dir: String): DataFrame = {
    val planted = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"), lit("@example.com or 555-"),
      lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"), lit("-0199 from 10.0."),
      pmod(col("doc_id"), lit(256)).cast("string"), lit(".7"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), planted.as("t"))
      .select(col("doc_id"),
        regexp_count(col("t"), lit(EmailRe)).as("n_email"),
        regexp_count(col("t"), lit(PhoneRe)).as("n_phone"),
        regexp_count(col("t"), lit(Ipv4Re)).as("n_ipv4"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("t"), EmailRe, "[EMAIL]"),
            PhoneRe, "[PHONE]"),
          Ipv4Re, "[IP]").as("redacted"))
      .orderBy("doc_id")
  }

  /** Char-trigram language-model quality score — the perplexity proxy a
    * corpus-filtering pipeline runs without a neural LM: train
    * P(c3 | c1c2) = count(c1c2c3) / Σ count(c1c2·) on the corpus itself,
    * score each document by its mean trigram log-probability (less
    * negative = more typical text; gibberish and corrupt encodings sink).
    * Two-pass shape that scales: the explode feeds a partial aggregate
    * (trigram counts never leave the mapper un-combined), the model is
    * bounded by the observed alphabet³ so it BROADCASTS back, and the
    * per-doc average is one doc-keyed shuffle. No driver-side loops;
    * self-trained, so every scored trigram has count ≥ 1 (no smoothing
    * term needed).
    */
  def textLmScore(spark: SparkSession, dir: String): DataFrame = {
    val tris = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(CharNgrams(col("text"), 3)).as("g"))
    // Neither branch ever shuffles the raw (doc, trigram) stream — that
    // exchange (near one row per corpus character) was the whole cost of
    // the earlier pre-aggregated formulation. Training groups by trigram
    // alone, so map-side partial aggregation compresses each task's
    // output to its distinct-trigram count (alphabet³-bounded) before
    // the exchange; scoring broadcast-joins the exploded stream in place
    // and partially aggregates per doc, so the final exchange carries
    // one row per document. The explode runs once per branch, but
    // re-running a pure map over a columnar scan is far cheaper than
    // exchanging the un-aggregated pairs.
    // bounded (alphabet³) model aggregate, consumed by both the context
    // rollup and the model join — materialize once
    val triCounts = tris.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val biCounts = triCounts.groupBy(substring(col("g"), 1, 2).as("b"))
      .agg(sum(col("cnt")).as("ctx"))
    val model = triCounts
      .join(biCounts, substring(col("g"), 1, 2) === col("b"))
      .select(col("g"), log(col("cnt").cast("double") / col("ctx").cast("double")).as("lp"))
    // Per-occurrence Σ lp ≡ Σ c·lp over per-doc trigram counts; the two
    // orders of double addition agree well past the rounded 4th decimal.
    tris.join(broadcast(model), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("lp")) / count(lit(1)), 4).as("lm_logprob"),
        count(lit(1)).as("n_trigrams"))
      .orderBy("doc_id")
  }

  /** Overlapping token-window chunking — the retrieval/training prep
    * step that splits long documents into model-sized pieces: 64-token
    * windows every 48 tokens (16-token overlap so no boundary context is
    * lost). Tokenize once, explode one small int per chunk, slice the
    * kept token array — a pure map-side fan-out absorbed by the scan;
    * the only exchange is the deterministic output order.
    */
  def textChunks(spark: SparkSession, dir: String): DataFrame = {
    val win = 64
    val stride = 48
    val toks = split(trim(col("text")), "\\s+")
    Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("toks"), size(toks).as("n_tok"))
      .withColumn("n_chunks",
        greatest(ceil((col("n_tok") - lit(win)).cast("double") / stride).cast("int") + 1, lit(1)))
      .select(col("doc_id"), col("n_tok"), col("toks"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        least(col("n_tok") - col("chunk_id") * stride, lit(win)).cast("int").as("chunk_tokens"),
        concat_ws(" ", slice(col("toks"), col("chunk_id") * stride + 1, lit(win))).as("chunk"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Compression-ratio quality gate (Gopher/RefinedWeb-style): deflate
    * output bytes / input bytes per document via the compiled
    * [[graft.functions.DeflateRatio]] expression — a pure map fused into
    * the scan, no shuffle except output order. Low ratios mark
    * repetitive/machine-generated text; the flag threshold (0.35) is the
    * kind of corpus-specific knob a curation run tunes. Engine-local
    * signal (zlib has no canonical cross-implementation output size), so
    * rows-only + ExtSpec ordering/determinism assertions.
    */
  def textCompress(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        round(graft.functions.DeflateRatio(col("text")), 4).as("compress_ratio"))
      .withColumn("low_entropy", col("compress_ratio") < 0.35)
      .orderBy("doc_id")

  /** Hash-green companion of [[textCompress]] (round-11 verdict item 5):
    * the oracle-expressible slice of the compression gate. The zlib byte
    * count itself is engine-local (deflate has no canonical
    * cross-implementation output size — the precise reason
    * text_compress stays rows-only), but two exact quantities bracket
    * and explain it: the raw-deflate STORED-mode ceiling (a compliant
    * deflater never emits more than the input plus 5 bytes per
    * 65535-byte stored block, +10 margin for the final-block epilogue)
    * and the order-0 character-entropy code length — the classic
    * compressibility reference signal the ratio tracks. Both are
    * integer/closed-form SQL; ExtSpec then pins the engine's
    * [[graft.functions.DeflateRatio]] inside the ceiling for EVERY
    * document, tying the rows-only value to this oracle-checked frame.
    * Entropy terms quantize c·ln c to DECIMAL(18,9) pre-sum (the
    * [[textEntropy]] discipline) so both engines add bit-identical
    * addends.  Scale: ONE scan — n_bytes rides the char-explode (an
    * int per exploded row, folded back out by max() in the same
    * partial agg that absorbs the explode) so no second corpus scan or
    * doc_id join exists; everything after the (doc_id, ch) agg is
    * doc-bounded math.
    */
  def textCompressBound(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val nb = octet_length(col("text"))
    val cc = Tables.documents(spark, dir)
      .select(col("doc_id"), nb.cast("int").as("n_bytes"),
        explode(split(col("text"), "")).as("ch"))
      .groupBy(col("doc_id"), col("ch"))
      .agg(max(col("n_bytes")).as("n_bytes"), count(lit(1)).as("c"))
    val nBytes = max(col("n_bytes"))
    val ceilBytes = (nBytes +
      lit(5) * ceil(nBytes.cast("double") / 65535).cast("long") + lit(10))
      .cast("long")
    cc.groupBy(col("doc_id"))
      .agg(
        nBytes.as("nb"), ceilBytes.as("ceil_bytes"),
        sum(col("c")).as("n_chars"),
        sum((col("c") * log(col("c"))).cast(DecimalType(18, 9))).as("sclc"))
      .select(col("doc_id"), col("nb").as("n_bytes"), col("ceil_bytes"),
        round(col("ceil_bytes").cast("double") / col("nb"), 4).as("ceil_ratio"),
        round((log(col("n_chars")) - col("sclc").cast("double") / col("n_chars"))
          / log(lit(2.0)) / 8, 4).as("h0_ratio"))
      .orderBy("doc_id")
  }

  /** Vocabulary coverage / OOV-rate scoring — the tokenizer-fit metric a
    * pretraining pipeline tracks per document (high OOV = the tokenizer
    * fragments this text; gate or re-route it). Two corpus passes by
    * design, mirroring production shape: pass 1 builds the vocabulary
    * (explode absorbed by partial agg, TakeOrderedAndProject for the
    * top-k — in production this is a separate artifact built once), pass
    * 2 scores documents against the BROADCAST vocab — the corpus-sized
    * join never shuffles the token stream, and per-doc aggregation is
    * the only exchange. Vocab size 16 fits the synthetic corpus's
    * 31-token vocabulary so rates are non-degenerate; ties break
    * deterministically (count DESC, token ASC).
    */
  def textVocabOov(spark: SparkSession, dir: String, vocabSize: Int = 16): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
    val vocab = toks.groupBy(col("tok")).count()
      .orderBy(col("count").desc, col("tok"))
      .limit(vocabSize)
      .select(col("tok"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 4))
      .orderBy("doc_id")
  }

  /** Per-source corpus health report — the daily dashboard artifact of a
    * corpus build: document counts, token volume, quality ratios, and
    * exact-dup rate per source, in ONE pass (the native TextStats struct
    * is computed map-side once per document and partially aggregated;
    * countDistinct of the content hash adds the usual two-level distinct
    * plan). Every ratio divides exact integer sums, so the doubles are
    * bit-identical across engines and ship UNROUNDED — round(x, k) of an
    * int/int rational can land exactly on a decimal half (the q_anomaly
    * lesson) where engines disagree.
    */
  def qSourceReport(spark: SparkSession, dir: String): DataFrame = {
    val st = graft.functions.TextStats(
      col("text"), Seq("the", "a", "of", "and", "to", "in"))
    Tables.documents(spark, dir)
      .select(col("source"), col("text"), st.as("st"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text").cast("binary"))).as("n_unique"),
        sum(col("st.n_tokens").cast("long")).as("total_tokens"),
        sum(col("st.n_chars").cast("long")).as("total_chars"),
        sum(col("st.n_punct").cast("long")).as("punct_sum"),
        sum(col("st.n_digit").cast("long")).as("digit_sum"),
        sum(col("st.stopword_hits").cast("long")).as("stop_sum"))
      .select(
        col("source"), col("n_docs"), col("total_tokens"),
        (col("total_tokens").cast("double") / col("n_docs")).as("mean_tokens"),
        (col("punct_sum").cast("double") / col("total_chars").cast("double")).as("punct_ratio"),
        (col("digit_sum").cast("double") / col("total_chars").cast("double")).as("digit_ratio"),
        (col("stop_sum").cast("double") / col("total_tokens").cast("double")).as("stopword_ratio"),
        (lit(1.0) - col("n_unique").cast("double") / col("n_docs")).as("dup_rate"))
      .orderBy("source")
  }

  /** Collocation mining via pointwise mutual information: top word
    * bigrams by PMI = ln(P(xy) / (P(x)·P(y))) over corpus unigram/bigram
    * frequencies, with a minimum-support filter — the phrase-extraction
    * pass of corpus analysis (multi-word expressions surface as high-PMI
    * pairs; high-frequency/low-PMI pairs are grammatical noise).
    *
    * Scale shape: unigram and bigram counting are explode→partial-agg
    * passes (the fan-out is absorbed map-side before the exchange; the
    * bigram explode comes from the compiled
    * [[graft.functions.WordShingles]] byte-walk, multiplicities kept).
    * Corpus totals are scalar re-aggregations of the grouped counts
    * (exchange reuse runs each explode once) and broadcast; the two
    * unigram joins key on the word, so work is bounded by DISTINCT
    * bigram count, never corpus size. Top-k lowers to
    * TakeOrderedAndProject.
    */
  def textPmi(spark: SparkSession, dir: String, minCount: Int = 5, k: Int = 20): DataFrame =
    pmiBigrams(Tables.documents(spark, dir), minCount, k)

  def pmiBigrams(docs: DataFrame, minCount: Int, k: Int): DataFrame = {
    import graft.functions.WordShingles
    // both count tables are BOUNDED (vocab-sized) aggregates consumed
    // by multiple branches (totals + the lookup joins) — materialize
    // each once so the corpus tokenizes exactly twice (unigram pass +
    // bigram pass) instead of once per consuming branch
    val uni = docs
      .select(explode(TextFns.tokens(lower(col("text")))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
      .localCheckpoint()
    val uniTotal = uni.agg(sum(col("c_w")).as("n_uni"))
    val bigAll = docs
      .select(explode(WordShingles(lower(col("text")), 2, distinct = false)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c_xy"))
      .localCheckpoint()
    val bigTotal = bigAll.agg(sum(col("c_xy")).as("n_big"))
    bigAll.filter(col("c_xy") >= minCount)
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_y")), "w2")
      .crossJoin(broadcast(uniTotal))
      .crossJoin(broadcast(bigTotal))
      .select(
        col("bg").as("bigram"), col("c_xy"), col("c_x"), col("c_y"),
        round(log(col("c_xy").cast("double") * col("n_uni") * col("n_uni") /
          (col("c_x").cast("double") * col("c_y") * col("n_big"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(k)
  }

  def qTextPmi(spark: SparkSession, dir: String): DataFrame = textPmi(spark, dir)

  /** Self-trained multinomial Naive Bayes classifier — the fastText-style
    * "train a cheap classifier on weak labels, score the corpus" pass of
    * a curation pipeline (CCNet/GPT-3 quality filtering), here labeled by
    * the declared `lang`. Training is one explode→partial-agg pass into
    * the BOUNDED per-(class, token) count table (materialized once —
    * see the localCheckpoint note in the body), densified over the full
    * vocab×class grid (add-one smoothing needs the ZERO cells — a
    * sparse join would silently drop the unseen-token penalty), plus
    * class priors. Scoring joins each token occurrence against the
    * BROADCAST model and sums log-likelihoods per (doc, class); argmax
    * by window rank.
    *
    * Determinism: per-token log-probs are quantized to DECIMAL(18,9)
    * BEFORE summing (the embedStats pattern) — double sums associate
    * differently across engines/partitionings, decimal sums are exact —
    * so the scores and the argmax are bit-stable and oracle-checkable.
    *
    * Scale shape: the model is a vocab×classes aggregate artifact
    * (bounded, broadcast); the corpus explodes once; the |classes|-way
    * fan-out collapses into the partial aggregate keyed (doc, class);
    * the argmax window partitions by doc_id — no global ordering.
    */
  def nbClassify(docs: DataFrame, labelCol: String, vocabCap: Int = 65536): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("label"))
    nbScores(docs, labelCol, vocabCap)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(col("doc_id"), col("label").as("label_pred"),
        round(col("score").cast("double"), 4).as("nb_score"), col("label_declared"))
      .orderBy("doc_id")
  }

  /** The full (doc, class) score table behind [[nbClassify]] — every
    * class's exact-DECIMAL posterior score per scored document (docs whose
    * tokens are all out-of-vocab have no rows, as in the classifier).
    * Factored out so evaluation passes that need MORE than the argmax
    * (the margin curve, [[qTextNbMargin]]) share the one model/scoring
    * chain with the classifier instead of re-deriving it.
    */
  def nbScores(docs: DataFrame, labelCol: String, vocabCap: Int = 65536): DataFrame = {
    val d9 = org.apache.spark.sql.types.DataTypes.createDecimalType(18, 9)
    // The corpus tokenizes exactly TWICE — once for the training
    // aggregate, once for scoring. Everything between (vocab top-k,
    // class totals, vocab size, the smoothing grid) derives from
    // allCounts, a BOUNDED aggregate (distinct (class, token) pairs),
    // which localCheckpoint materializes once on the executors: without
    // it each of those branches is an independent lineage replay and the
    // explode runs per branch (measured: 7 Generate nodes in the
    // physical plan, ~5 full corpus passes to build a 65536-row model).
    val toks = docs.select(col("doc_id"), col(labelCol).as("label"),
      explode(TextFns.tokens(lower(col("text")))).as("tok"))
    val allCounts = toks.groupBy(col("label"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // BOUNDED model vocabulary: top-K tokens by corpus frequency (the
    // fastText discipline — the model artifact must stay broadcastable
    // at ANY corpus size; an uncapped web-corpus vocabulary is not).
    // Out-of-vocab tokens simply drop out of scoring (inner model join).
    val vocab = allCounts.groupBy(col("tok")).agg(sum(col("c")).as("ctot"))
      .orderBy(col("ctot").desc, col("tok"))
      .limit(vocabCap)
      .select(col("tok"))
    val classCounts = allCounts.join(broadcast(vocab), "tok")
    val classTotals = classCounts.groupBy(col("label")).agg(sum(col("c")).as("tot"))
    val vocabSize = vocab.agg(count(lit(1)).as("v"))
    // dense vocab x class grid with add-one smoothing
    val model = vocab.crossJoin(classTotals)
      .join(classCounts, Seq("label", "tok"), "left")
      .crossJoin(broadcast(vocabSize))
      .select(col("label"), col("tok"),
        log((coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") / (col("tot") + col("v")))
          .cast(d9).as("lp"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val priors = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_class"))
      .crossJoin(broadcast(nDocs))
      .select(col("label"),
        log(col("n_class").cast("double") / col("n_docs")).cast(d9).as("prior"))
    toks.withColumnRenamed("label", "label_declared")
      .join(broadcast(model), "tok")
      .groupBy(col("doc_id"), col("label_declared"), col("label"))
      .agg(sum(col("lp")).as("ll"))
      .join(broadcast(priors), "label")
      .select(col("doc_id"), col("label"), col("label_declared"),
        (col("prior") + col("ll")).as("score"))
  }

  def qTextNbLang(spark: SparkSession, dir: String): DataFrame =
    nbClassify(Tables.documents(spark, dir), "lang")

  /** Classifier-quality evaluation AS A QUERY — the confusion matrix of
    * the bounded-vocab NB language classifier against the declared
    * labels, with each cell's fraction of its declared-label row (the
    * per-class recall diagonal): the measurement a pipeline runs before
    * trusting a learned quality/language gate at corpus scale — the
    * [[graft.ext.Similarity.annRecallReport]] discipline applied to the
    * classifier. Deterministic end-to-end (the NB model and argmax
    * tie-breaks are), so the DuckDB oracle recomputes the entire chain:
    * the prediction CTEs are ONE shared fragment with the text_nb_lang
    * oracle, making classifier/evaluation drift structurally
    * impossible. Output is |labels|²-bounded regardless of corpus size.
    */
  def qTextNbReport(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    nbClassify(Tables.documents(spark, dir), "lang")
      .groupBy(col("label_declared"), col("label_pred"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_declared",
        sum(col("n")).over(Window.partitionBy("label_declared")))
      .select(col("label_declared"), col("label_pred"), col("n"),
        round(col("n").cast("double") / col("n_declared"), 4).as("frac"))
      .orderBy("label_declared", "label_pred")
  }

  /** Margin thresholds for [[qTextNbMargin]] — quarter steps from "keep
    * everything" to "keep only the most confident calls". Measured NB
    * log-score margins on this corpus concentrate in 0..3 (median ≈ 0.7),
    * so this grid traces the whole operating curve; every step is an
    * exact binary fraction (k/4), so the threshold literals are the same
    * doubles in both engines.
    */
  val NbMarginGrid: Array[Double] =
    Array(0.0, 0.25, 0.5, 0.75, 1.0, 1.25, 1.5, 2.0, 3.0)

  /** Selective-prediction operating curve of the NB language gate:
    * accuracy vs coverage at each margin threshold, where margin = top-1
    * minus top-2 class score. The third leg of the classifier-evaluation
    * triple ([[qTextNbReport]] grades the argmax at full coverage; this
    * grades EVERY confidence cutoff — the curve a pipeline reads to pick
    * the margin below which documents route to a slower fallback
    * detector).
    *
    * Exactness: scores are DECIMAL sums ([[nbScores]]), so the margin is
    * an exact decimal difference — bit-identical across engines — and its
    * double cast is exact at these magnitudes (|margin|·10⁹ ≪ 2⁵³); the
    * grid comparison, counts, and two final divisions are then
    * engine-portable. Deliberately NOT an ntile reliability diagram: rank
    * deciles need a global sort over the corpus, while a fixed threshold
    * grid is one explode + aggregate at any scale.
    *
    * Scale shape: the top-2 window partitions by doc_id (no global
    * order); the grid fan-out is ×|grid| on the DOC-level margin table
    * (not the corpus text); output is |grid|-bounded.
    */
  def qTextNbMargin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("label"))
    val m = nbScores(Tables.documents(spark, dir), "lang")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2)
      .groupBy(col("doc_id"), col("label_declared"))
      .agg(
        max(when(col("rank") === 1, struct(col("score"), col("label")))).as("t1"),
        max(when(col("rank") === 2, col("score"))).as("s2"))
      // population = docs WITH a top-2 margin: a doc with no rank-2
      // score (reachable only when the model has a single class — the
      // dense smoothed NB scores every class otherwise) has no margin
      // to threshold, so it belongs in neither n_kept nor n_total; the
      // oracle's rank-2 inner join draws the same line
      .filter(col("s2").isNotNull)
      .select(
        (col("t1.score") - col("s2")).cast("double").as("margin"),
        when(col("t1.label") === col("label_declared"), 1L).otherwise(0L).as("ok"))
    val total = m.agg(count(lit(1)).as("n_total"))
    // a threshold nothing clears is still an operating point: the grid
    // left-join keeps it as (tau, 0, 0, 0.0, NULL) so the curve always
    // has |grid| rows (the dedup_threshold_sweep discipline)
    val grid = m.sparkSession.range(1)
      .select(explode(lit(NbMarginGrid)).as("min_margin"))
    val agg = m.select(explode(lit(NbMarginGrid)).as("min_margin"), col("margin"), col("ok"))
      .filter(col("margin") >= col("min_margin"))
      .groupBy(col("min_margin"))
      .agg(count(lit(1)).as("n_kept"), sum(col("ok")).as("n_correct"))
    grid.join(agg, Seq("min_margin"), "left")
      .crossJoin(broadcast(total))
      .select(col("min_margin"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_correct"), lit(0L)).as("n_correct"),
        round(coalesce(col("n_kept"), lit(0L)).cast("double") / col("n_total"), 6)
          .as("coverage"),
        round(col("n_correct").cast("double") / col("n_kept"), 6).as("acc"))
      .orderBy("min_margin")
  }

  /** Shared DuckDB NB prediction chain — vocab/model/prior/score CTEs
    * through `rk` (all per-doc class ranks) ending in
    * `pred(doc_id, label_pred, nb_score, label_declared)`; consumed by
    * the text_nb_lang, text_nb_report (via pred), and text_nb_margin
    * (via rk, ranks 1–2) oracles — one NB definition behind the
    * classifier and every evaluation of it.
    */
  private val nbPredCtes: String =
    """t AS (SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
      |tok AS (SELECT doc_id, lang, unnest(w) AS tok FROM t),
      |cc0 AS (SELECT lang AS label, tok, count(*) AS c FROM tok GROUP BY 1, 2),
      |vocab AS (SELECT tok FROM (
      |  SELECT tok, sum(c) AS ctot FROM cc0 GROUP BY tok
      |  ORDER BY ctot DESC, tok LIMIT 65536)),
      |cc AS (SELECT cc0.label AS label, cc0.tok AS tok, cc0.c AS c
      |       FROM cc0 JOIN vocab ON cc0.tok = vocab.tok),
      |ct AS (SELECT label, sum(c) AS tot FROM cc GROUP BY 1),
      |vs AS (SELECT count(*) AS v FROM vocab),
      |model AS (
      |  SELECT ct.label AS label, vocab.tok AS tok,
      |         CAST(ln(CAST(COALESCE(cc.c, 0) + 1 AS DOUBLE) / (ct.tot + v)) AS DECIMAL(18,9)) AS lp
      |  FROM vocab CROSS JOIN ct
      |  LEFT JOIN cc ON cc.label = ct.label AND cc.tok = vocab.tok
      |  CROSS JOIN vs),
      |nd AS (SELECT count(*) AS n_docs FROM documents),
      |pri AS (SELECT lang AS label,
      |               CAST(ln(CAST(count(*) AS DOUBLE) / n_docs) AS DECIMAL(18,9)) AS prior
      |        FROM documents CROSS JOIN nd GROUP BY lang, n_docs),
      |ll AS (SELECT d.doc_id AS doc_id, m.label AS label, sum(m.lp) AS ll
      |       FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      |             FROM documents) d
      |       JOIN model m ON m.tok = d.tok GROUP BY 1, 2),
      |sc AS (SELECT ll.doc_id AS doc_id, ll.label AS label, pri.prior + ll.ll AS score
      |       FROM ll JOIN pri ON ll.label = pri.label),
      |rk AS (SELECT doc_id, label, score,
      |              row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS rank
      |       FROM sc),
      |pred AS (SELECT rk.doc_id AS doc_id, rk.label AS label_pred,
      |                round(CAST(rk.score AS DOUBLE), 4) AS nb_score,
      |                docs.lang AS label_declared
      |         FROM rk JOIN documents docs ON docs.doc_id = rk.doc_id
      |         WHERE rank = 1)""".stripMargin

  /** Per-document token-distribution Shannon entropy + type/token ratio —
    * the lexical-diversity signals a corpus-quality filter thresholds on
    * (low entropy ⇒ boilerplate/repetition, near-max ⇒ random noise).
    * H = ln(n) − (Σ c·ln c)/n over per-doc token counts; each c·ln c
    * term quantizes to DECIMAL(18,9) before the per-doc sum, so both
    * engines add BIT-IDENTICAL addends in an association-free type.
    * Scale: explode is absorbed by partial aggregation on (doc_id, tok);
    * everything after is doc-bounded.
    */
  def textEntropy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val tc = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextFns.tokens(lower(col("text")))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    tc.groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum((col("c") * log(col("c"))).cast(DecimalType(18, 9))).as("sclc"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_types"),
        round(log(col("n_tokens")) - col("sclc").cast("double") / col("n_tokens"), 4)
          .as("entropy"),
        (col("n_types").cast("double") / col("n_tokens")).as("ttr"))
      .orderBy("doc_id")
  }

  /** Corpus heavy hitters — every token whose frequency is at least
    * phi of all tokens, computed EXACTLY in two passes with bounded
    * state. Pass 1 folds the token stream into a fixed-size Count-Min
    * sketch (partial sketches merge associatively; nothing key-shaped
    * shuffles). Pass 2 re-scans, drops tokens whose sketch ESTIMATE is
    * below the support count — the estimate never undercounts, so no
    * true heavy hitter is dropped — and exact-counts only the
    * survivors, with a final HAVING discarding sketch false positives.
    * The group-by state in pass 2 is bounded by the sketch error
    * (eps·N extra mass per counter), not by the vocabulary, which is
    * the property that lets this run over a 100 TB corpus whose
    * distinct-token domain dwarfs executor memory. Oracle: the plain
    * one-pass GROUP BY ... HAVING, equal by the no-false-negative
    * argument (see [[graft.functions.CmsEstimate]]).
    */
  def textHeavyHitters(docs: DataFrame, phi: Double = 0.002): DataFrame = {
    val toks = docs.select(explode(TextFns.tokens(lower(col("text")))).as("tok"))
    val cms = toks.stat.countMinSketch(col("tok"), eps = 1e-4, confidence = 0.99, seed = 42)
    val support = math.ceil(phi * cms.totalCount()).toLong
    toks
      .filter(graft.functions.CmsEstimate.estimate(col("tok"), cms) >= lit(support))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(support))
      .orderBy(desc("cnt"), asc("tok"))
  }

  def qTextHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    textHeavyHitters(Tables.documents(spark, dir))

  /** Per-language heavy hitters — tokens above phi of each language's
    * token mass, exactly, with per-group aggregate state bounded by the
    * Misra-Gries capacity instead of the language's vocabulary (the
    * GROUPED companion to [[textHeavyHitters]]; a 100 TB corpus has
    * billions of distinct (lang, token) pairs, but each group's summary
    * here is ≤127 entries at every point of the aggregation). The
    * summary's undercount is at most n/(capacity+1) < phi·n, so every
    * true heavy hitter survives into the candidate array; the confirm
    * pass joins the token stream against the broadcast candidate set
    * and exact-counts only those, with the final HAVING removing
    * candidate false positives. See [[graft.functions.MisraGriesAgg]]
    * for the mergeability argument.
    */
  def textHeavyHittersByLang(docs: DataFrame, phi: Double = 0.02,
      capacity: Int = 127): DataFrame = {
    require(phi > 1.0 / (capacity + 1), "support must exceed the summary error bound")
    val toks = docs.select(col("lang"), explode(TextFns.tokens(lower(col("text")))).as("tok"))
    val cand = toks.groupBy(col("lang"))
      .agg(
        graft.functions.MisraGriesAgg.candidates(col("tok"), capacity).as("cands"),
        count(lit(1)).as("lang_total"))
      .select(col("lang"), col("lang_total"), explode(col("cands")).as("tok"))
    toks.join(broadcast(cand), Seq("lang", "tok"))
      .groupBy(col("lang"), col("tok"), col("lang_total"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= ceil(lit(phi) * col("lang_total")).cast("long"))
      .select(col("lang"), col("tok"), col("cnt"))
      .orderBy(col("lang"), desc("cnt"), col("tok"))
  }

  def qTextHeavyHittersByLang(spark: SparkSession, dir: String): DataFrame =
    textHeavyHittersByLang(Tables.documents(spark, dir))

  /** Learned BPE subword tokenization — the real tokenizer-fitting
    * step of an LLM data pipeline (the `text_tokens` BPE-ish regex
    * only approximates one). Training follows the engine's
    * driver-trains/cluster-applies pattern: ONE distributed top-k
    * supplies the word-frequency sample (TakeOrderedAndProject — the
    * corpus is never collected), the sequential merge loop runs on the
    * driver (it is inherently iterative: each merge changes the pair
    * statistics), and the learned ranks broadcast into a native
    * `bpe_encode` expression that encodes every document inside
    * whole-stage codegen. Output is the per-doc tokenization profile
    * (fertility = subwords per word — THE metric tokenizer work
    * optimizes). Oracle-checked end to end (training AND encoding) by
    * [[bpeOracleSql]] — 40 unrolled merge-round CTEs plus a recursive
    * greedy-encode CTE; semantics are additionally pinned by
    * SketchPropertiesSpec (roundtrip, full application, frequent-word
    * compression) and a determinism check.
    */
  def textBpe(docs: DataFrame, numMerges: Int = 40, sampleWords: Int = 2048): DataFrame = {
    val freq = docs
      .select(explode(TextFns.tokens(lower(col("text")))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("tok"))
      .limit(sampleWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = graft.functions.Bpe.train(freq, numMerges)
    docs
      .withColumn("sub", graft.functions.BpeEncode.encode(col("text"), merges))
      .select(
        col("doc_id"),
        size(TextFns.tokens(lower(col("text")))).as("n_ws_tokens"),
        size(col("sub")).as("n_bpe_tokens"),
        size(array_distinct(col("sub"))).as("n_subword_types"))
      .withColumn("fertility",
        round(col("n_bpe_tokens").cast("double") / col("n_ws_tokens"), 4))
      .orderBy("doc_id")
  }

  def qTextBpe(spark: SparkSession, dir: String): DataFrame =
    textBpe(Tables.documents(spark, dir))

  /** Zipf rank-frequency diagnostic — the corpus-health check run
    * before trusting token statistics: natural text follows
    * freq ∝ rank^(-s) with s ≈ 1, so the least-squares slope of
    * ln(freq) on ln(rank) (and its r²) flags synthetic, truncated, or
    * boilerplate-dominated corpora whose curve bends away from a power
    * law. The least-squares moments (Σx, Σy, Σxy, Σx², Σy²) are
    * quantized to DECIMAL(18,9) BEFORE summing — the [[textEntropy]]
    * discipline — because the built-in `regr_slope` family merges
    * double partials in task-completion order and is therefore not
    * bit-stable across runs; integer-decimal sums are associative, so
    * any partitioning yields the same fit. Ranks tie-break on the
    * token so both engines rank identically, and the fit rounds at
    * the [[graft.queries.Parity]] corr convention (6 decimals).
    * Scale: one shuffle to token counts, then the top-k truncation is
    * a distributed TakeOrderedAndProject — the global rank window only
    * ever sees the topK surviving rows, never the unbounded vocab.
    */
  def textZipf(docs: DataFrame, topK: Int = 1000): DataFrame = {
    val counts = docs
      .select(explode(TextFns.tokens(lower(col("text")))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val ranked = counts
      .orderBy(desc("c"), asc("tok")).limit(topK)
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(desc("c"), asc("tok"))))
      .select(log(col("r")).as("lnr"), log(col("c")).as("lnf"))
    val dec = "decimal(18,9)"
    val s = ranked
      .select(
        col("lnr").cast(dec).as("x"), col("lnf").cast(dec).as("y"),
        (col("lnr") * col("lnf")).cast(dec).as("xy"),
        (col("lnr") * col("lnr")).cast(dec).as("xx"),
        (col("lnf") * col("lnf")).cast(dec).as("yy"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum("x").cast("double").as("sx"), sum("y").cast("double").as("sy"),
        sum("xy").cast("double").as("sxy"), sum("xx").cast("double").as("sxx"),
        sum("yy").cast("double").as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val denX = col("n") * col("sxx") - col("sx") * col("sx")
    val denY = col("n") * col("syy") - col("sy") * col("sy")
    s.select(
      col("n").cast("long").as("n_ranks"),
      round(num / denX, 6).as("zipf_slope"),
      round((col("sy") - (num / denX) * col("sx")) / col("n"), 6).as("zipf_intercept"),
      round((num * num) / (denX * denY), 6).as("fit_r2"))
  }

  def qTextZipf(spark: SparkSession, dir: String): DataFrame =
    textZipf(Tables.documents(spark, dir))

  /** Corpus-frequency boilerplate detection (the CCNet/C4 line-dedup
    * shape re-expressed for segment granularity): each document is cut
    * into non-overlapping `segTokens`-token segments (tail included), a
    * segment is boilerplate when its EXACT text recurs in `dfThreshold`+
    * distinct documents, and the per-document report carries the kept
    * token volume and boilerplate ratio a curation gate filters on.
    * Scale shape: the segment table carries (doc_id, md5) — fixed-width
    * keys, never the text — through two shuffles (document-frequency
    * aggregation with map-side partials, then the df re-join keyed on
    * the same hash); both are corpus-linear and skew-free because a
    * segment's df is bounded by the corpus and the JOIN fan-out equals
    * segment multiplicity, not df². All ratios are exact small-integer
    * rationals, so the doubles are bit-identical across engines.
    */
  def textBoilerplate(
      spark: SparkSession, dir: String,
      segTokens: Int = 5, dfThreshold: Int = 2): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val segs = Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("w"), size(toks).as("n_tok"))
      .select(col("doc_id"), col("n_tok"), col("w"),
        explode(sequence(lit(0),
          ceil(col("n_tok").cast("double") / segTokens).cast("int") - 1)).as("seg_id"))
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(col("w"), col("seg_id") * segTokens + 1, lit(segTokens)))
          .cast("binary")).as("seg_hash"),
        least(col("n_tok") - col("seg_id") * segTokens, lit(segTokens)).as("seg_tokens"))
    val segDf = segs.groupBy(col("seg_hash"))
      .agg(countDistinct(col("doc_id")).as("dfreq"))
    segs.join(segDf, Seq("seg_hash"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("dfreq") >= dfThreshold, 1L).otherwise(0L)).as("n_boiler"),
        sum(when(col("dfreq") < dfThreshold, col("seg_tokens").cast("long"))
          .otherwise(0L)).as("clean_tokens"))
      .withColumn("boiler_ratio",
        col("n_boiler").cast("double") / col("n_segments"))
      .orderBy("doc_id")
  }

  def qTextBoilerplate(spark: SparkSession, dir: String): DataFrame =
    textBoilerplate(spark, dir)

  /** DSIR-style hashed-n-gram importance weighting (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * token unigrams feature-hash into `buckets` buckets (md5-derived, so
    * the oracle reproduces the bucketing exactly), the target
    * distribution is the `targetLang` slice of the corpus, and each
    * document scores the mean log-likelihood ratio
    * ln(p_target/p_raw) of its hashed features (add-one smoothing both
    * sides). The top `topK` documents by score are the importance-
    * resampled selection a pretraining mix would up-weight. Scale
    * shape: the bucket vocabulary is FIXED (64 entries), so the weight
    * table is a broadcast join onto per-doc bucket counts — the token
    * stream shuffles once into (doc_id, bucket) counts with map-side
    * partials, and the global top-k is a TakeOrderedAndProject, never a
    * full sort. Determinism: each bucket weight quantizes to
    * DECIMAL(18,9) (the [[textEntropy]]/[[nbClassify]] discipline), so
    * per-document sums add exact decimals in an association-free type
    * and the final double is bit-identical across engines and
    * partitionings.
    */
  def textDsir(
      spark: SparkSession, dir: String, buckets: Int = 64,
      targetLang: String = "en", topK: Int = 100): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(split(trim(col("text")), "\\s+")).as("tok"))
    // ONE tokenize+md5 pass: every downstream branch (totals, target and
    // raw marginals, per-doc scores) derives from this BOUNDED aggregate
    // (docs x <=buckets rows), materialized once — the nbClassify
    // discipline; without it each of the four branches replays the
    // explode+md5 lineage as an independent corpus pass.
    val bucketCounts = toks.select(col("doc_id"), col("lang"),
        (conv(substring(md5(col("tok").cast("binary")), 1, 8), 16, 10)
          .cast("long") % buckets).as("bucket"))
      .groupBy(col("doc_id"), col("lang"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val totals = bucketCounts.agg(
      sum(col("cnt")).as("rt"),
      sum(when(col("lang") === targetLang, col("cnt")).otherwise(0L)).as("tt"))
    val tgt = bucketCounts.filter(col("lang") === targetLang)
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("tcnt"))
    val raw = bucketCounts.groupBy(col("bucket")).agg(sum(col("cnt")).as("rcnt"))
    val weights = raw.join(tgt, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      // ONE ln of an exactly-representable integer ratio: the two-ln
      // form ln(p_t) - ln(p_r) cancels catastrophically (results ~0.02
      // from operands ~4), amplifying a 1-ulp libm divergence between
      // the JVM and DuckDB to ~1e-15 — observed crossing a DECIMAL(18,9)
      // rounding boundary. The single-ln form's absolute error is the
      // ulp of the RESULT (~1e-18), comfortably inside the quantum.
      .select(col("bucket"),
        log(((coalesce(col("tcnt"), lit(0L)) + lit(1.0)) * (col("rt") + lit(buckets)))
          / ((col("rcnt") + lit(1.0)) * (col("tt") + lit(buckets))))
          .cast("decimal(18,9)").as("w"))
    bucketCounts
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_tokens"),
        // cnt at DECIMAL(10,0): a LONG operand (decimal(20,0)) would push
        // the product past precision 38 and Spark silently drops the
        // scale to 8, rounding away the 9th weight decimal
        sum(col("cnt").cast("decimal(10,0)") * col("w")).as("swc"))
      .select(col("doc_id"), col("n_tokens"),
        (col("swc").cast("double") / col("n_tokens")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  def qTextDsir(spark: SparkSession, dir: String): DataFrame =
    textDsir(spark, dir)

  /** Readability scoring (Flesch reading-ease + Flesch-Kincaid grade),
    * the classic document-difficulty signal a curriculum or quality
    * filter buckets on. Syllables are approximated as vowel-run counts
    * (the standard hyphenation-free heuristic); the corpus has no
    * sentence punctuation, so each document scores as one sentence —
    * the formula constants are kept verbatim and the scaladoc records
    * the convention rather than inventing a private variant. Pure
    * per-row map over a 2-column pruned scan: both counts come from
    * codegen'd regex/split expressions, no shuffle but the output sort.
    */
  def readability(docs: DataFrame): DataFrame = {
    val words = size(TextFns.tokens(col("text")))
    val syl = size(regexp_extract_all(lower(col("text")), lit("[aeiou]+"), lit(0)))
    // Grid round as floor(x·10^d + 0.5)/10^d instead of round(): the
    // formula constants make values land EXACTLY on .xx5 in decimal
    // (0.39·56 + 11.8·1.375 − 15.59 = 22.475), where Spark's
    // BigDecimal HALF_UP and DuckDB's scaled-double rounding disagree;
    // floor over identical IEEE ops is tie-free across engines.
    def grid(c: Column, d: Int): Column = {
      val s = math.pow(10, d)
      floor(c * lit(s) + lit(0.5)).cast("double") / lit(s)
    }
    docs
      .select(
        col("doc_id"),
        words.as("n_words"),
        syl.as("n_syllables"),
        grid(syl.cast("double") / words, 4).as("syl_per_word"),
        grid(lit(206.835) - lit(1.015) * words
          - lit(84.6) * (syl.cast("double") / words), 2).as("flesch"),
        grid(lit(0.39) * words + lit(11.8) * (syl.cast("double") / words)
          - lit(15.59), 2).as("fk_grade"))
      .orderBy("doc_id")
  }

  def textReadability(spark: SparkSession, dir: String): DataFrame =
    readability(Tables.documents(spark, dir))

  /** Drift vocabulary bound: top-V corpus tokens kept, everything else
    * pooled into one OOV bucket — per-source state is V+1 counters no
    * matter the corpus. 24 at test scale so the pooling path is
    * EXERCISED (the synthetic corpus has 31 distinct tokens); a
    * production run sets thousands — the shape is identical, only the
    * constant changes.
    */
  val DriftVocab = 24

  /** Corpus drift — per-source token-distribution shift, the monitoring
    * query a training-data pipeline runs per ingest batch: the
    * Jensen-Shannon divergence between each source's unigram
    * distribution and the REST of the corpus, over the corpus top-V
    * vocabulary with all remaining tokens pooled into one OOV bucket
    * (the [[qTextNbLang]] bounded-vocab discipline). JSD is symmetric,
    * bounded [0, ln 2], zero iff the distributions agree; a source
    * whose crawl changed character — language mix, boilerplate,
    * spam — moves here before any downstream metric.
    *
    * Cross-engine arithmetic: every per-term contribution derives from
    * exact integer counts with the SAME double expression tree on both
    * engines (one division per side, pointwise-nonnegative by the
    * log-sum inequality), quantized to DECIMAL(18,12) BEFORE the sum
    * ([[textEntropy]]'s association-free discipline), halved and
    * rounded at the end.
    *
    * Scale: the token explode folds into a partial agg on
    * (source, tok) — the one corpus-sized shuffle; the vocabulary is a
    * TakeOrdered top-V; everything downstream operates on
    * ≤ sources × (V+1) rows (localCheckpointed once, reused for the
    * totals and the zero-filled grid).
    */
  def textDrift(spark: SparkSession, dir: String): DataFrame =
    textDriftDf(Tables.documents(spark, dir))

  /** The drift core over any (source, text) frame — ExtSpec feeds
    * constructed corpora through this (identical-distribution source →
    * jsd 0; disjoint-vocabulary source → jsd ln 2).
    */
  def textDriftDf(docs: DataFrame, vocabN: Int = DriftVocab): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val st0 = docs
      .select(col("source"), explode(TextFns.tokens(lower(col("text")))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val vocab = st0.groupBy(col("tok")).agg(sum(col("c")).as("ct"))
      .orderBy(col("ct").desc, col("tok")).limit(vocabN)
      .select(col("tok"), lit(1).as("in_v"))
    val st = st0.join(broadcast(vocab), Seq("tok"), "left")
      .select(col("source"),
        when(col("in_v").isNotNull, col("tok")).otherwise(lit("\u0001OOV")).as("tok"),
        col("c"))
      .groupBy(col("source"), col("tok")).agg(sum(col("c")).as("c"))
      .localCheckpoint()
    val tot = st.groupBy(col("tok")).agg(sum(col("c")).as("ct"))
    val nsrc = st.groupBy(col("source")).agg(sum(col("c")).as("ns"))
    val nAll = st.agg(sum(col("c")).as("n"))
    // zero-filled grid: a token the source never emits still contributes
    // (the rest-distribution has mass there) — absent (source, tok)
    // cells become cs = 0 via the left join
    val grid = nsrc.crossJoin(broadcast(tot))
      .join(st, Seq("source", "tok"), "left")
      .crossJoin(broadcast(nAll))
      .select(col("source"), col("ns"),
        coalesce(col("c"), lit(0L)).as("cs"),
        (col("ct") - coalesce(col("c"), lit(0L))).as("cr"),
        (col("n") - col("ns")).as("nr"))
    val x = col("cs").cast("double") / col("ns")
    val y = col("cr").cast("double") / col("nr")
    // nr = 0 means the source holds the ENTIRE corpus (single-source
    // input, or every other source empty): there is no rest-distribution
    // to drift from, so jsd is undefined — emit NULL for that source
    // rather than letting 0/0 leak NaN through the public API (the
    // null terms sum to a null jsd; n_tokens still reports)
    val term = when(col("nr") === 0, lit(null).cast("double"))
      .when(col("cs") === 0 && col("cr") === 0, lit(0.0))
      .when(col("cs") === 0, y * log(lit(2.0)))
      .when(col("cr") === 0, x * log(lit(2.0)))
      .otherwise(x * log(lit(2.0) * x / (x + y)) + y * log(lit(2.0) * y / (x + y)))
    grid.select(col("source"), col("ns"), term.cast(DecimalType(18, 12)).as("trm"))
      .groupBy(col("source"))
      .agg(max(col("ns")).as("n_tokens"), sum(col("trm")).as("s"))
      .select(col("source"), col("n_tokens"),
        round(col("s").cast("double") / 2, 6).as("jsd"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_drift" -> (textDrift _),
    "text_readability" -> (textReadability _),
    "text_boilerplate" -> (qTextBoilerplate _),
    "text_dsir" -> (qTextDsir _),
    "text_zipf" -> (qTextZipf _),
    "text_heavy_hitters" -> (qTextHeavyHitters _),
    "text_heavy_hitters_lang" -> (qTextHeavyHittersByLang _),
    "text_bpe" -> (qTextBpe _),
    "q_source_report" -> (qSourceReport _),
    "text_entropy" -> (textEntropy _),
    "text_pmi" -> (qTextPmi _),
    "text_nb_lang" -> (qTextNbLang _),
    "text_nb_report" -> (qTextNbReport _),
    "text_nb_margin" -> (qTextNbMargin _),
    "text_auc" -> (textAuc _),
    "text_heaps" -> (textHeaps _),
    "text_vocab_oov" -> ((s: SparkSession, d: String) => textVocabOov(s, d)),
    "text_compress" -> (textCompress _),
    "text_compress_bound" -> (textCompressBound _),
    "text_chunks" -> (textChunks _),
    "text_lm_score" -> (textLmScore _),
    "text_pii" -> (textPii _),
    "text_top_ngrams" -> (textTopNgrams _),
    "text_tokens" -> (textTokens _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangId _),
    "text_fingerprint" -> (textFingerprint _),
    "text_winnow" -> (textWinnow _),
    "text_repetition" -> (textRepetition _),
    "text_normalize" -> (textNormalize _),
    "text_alphabet" -> (textAlphabet _),
  )

  /** One window size of the [[graft.functions.RollingHashFingerprint]]
    * semantics in DuckDB: min over all `w`-byte windows of the UTF-8
    * text of the base-257 polynomial with 64-bit WRAPAROUND. DuckDB's
    * BIGINT errors on overflow instead of wrapping, so the hash runs in
    * HUGEINT with the powers 257^k precomputed mod 2^64 (mod is a ring
    * homomorphism, so one final `% 2^64` over the exact HUGEINT window
    * sum equals the per-step-wrapped JVM result), then maps the
    * unsigned residue back to the signed BIGINT the JVM long holds.
    * Bytes come from hex(encode(text)) — DuckDB 1.0 has no blob
    * indexing — extracted ONCE per doc into a list (the windowed form
    * would re-substr per (position, offset): measured 63 s vs 0.8 s at
    * sf0.01 for w=64). Short docs hash whole (the power slice keeps the
    * tail of the w-sized table = the powers for the shorter window);
    * empty docs fingerprint 0 like the JVM kernel.
    */
  private def fingerprintOracleCte(tag: String, w: Int): String = {
    val m = BigInt(1) << 64
    val powers = (0 until w)
      .map(k => s"CAST('${BigInt(257).modPow(BigInt(w - 1 - k), m)}' AS HUGEINT)")
      .mkString("[", ",", "]")
    s"""${tag}sel AS MATERIALIZED (
       |  SELECT doc_id, octet_length(encode(text)) AS n,
       |         least($w, octet_length(encode(text))) AS we,
       |         list_transform(range(octet_length(encode(text))),
       |           i -> CAST(CAST('0x' || substr(hex(encode(text)), CAST(2 * i + 1 AS INT), 2) AS UBIGINT) AS HUGEINT)) AS bl,
       |         ($powers)[$w - least($w, octet_length(encode(text))) + 1 :] AS pws
       |  FROM documents WHERE octet_length(encode(text)) > 0),
       |${tag}win AS (
       |  SELECT doc_id, unnest(range(1, n - we + 2)) AS p, bl, pws, we FROM ${tag}sel),
       |${tag}hsh AS (
       |  SELECT doc_id,
       |    list_sum(list_transform(range(we), k -> pws[k + 1] * bl[p + k]))
       |      % CAST('$m' AS HUGEINT) AS hu
       |  FROM ${tag}win),
       |${tag}fp AS (
       |  SELECT d.doc_id, coalesce(min(CAST(CASE WHEN hu >= CAST('${BigInt(1) << 63}' AS HUGEINT)
       |    THEN hu - CAST('$m' AS HUGEINT) ELSE hu END AS BIGINT)), 0) AS fp
       |  FROM documents d LEFT JOIN ${tag}hsh h ON d.doc_id = h.doc_id
       |  GROUP BY d.doc_id)""".stripMargin
  }

  private lazy val fingerprintSql: String =
    s"""WITH ${fingerprintOracleCte("a", 16)},
       |${fingerprintOracleCte("b", 64)}
       |SELECT a.doc_id, a.fp AS fingerprint, b.fp AS fingerprint_w64
       |FROM afp a JOIN bfp b ON a.doc_id = b.doc_id
       |ORDER BY a.doc_id""".stripMargin

  /** DuckDB mirror of [[graft.functions.WinnowFingerprints]], ending in
    * `wsel(doc_id, sel)` — the distinct selected (signed) hashes per
    * document. Same byte-extraction discipline as
    * [[fingerprintOracleCte]] (hex bytes pulled ONCE per doc; exact
    * HUGEINT window sums, mod 2^64 at the end — ring homomorphism);
    * the per-position hash maps to SIGNED BIGINT *before* the window
    * min because the JVM kernel compares signed longs. The winnow
    * window is `ROWS CURRENT..w-1 FOLLOWING` with starts clamped to
    * `p <= m - least(w, m) + 1`: for m >= w that is exactly the m-w+1
    * full windows; for 0 < m < w the single p=1 row's frame covers all
    * m hashes (frames clamp at the partition edge) — both match the
    * kernel's `ww = min(w, m)` clamp. Shared by the `text_winnow` and
    * `dedup_winnow` oracles so the selection semantics cannot drift.
    */
  private[ext] lazy val winnowSelectedCte: String = {
    val m = BigInt(1) << 64
    val powers = (0 until WinnowK)
      .map(j => s"CAST('${BigInt(257).modPow(BigInt(WinnowK - 1 - j), m)}' AS HUGEINT)")
      .mkString("[", ",", "]")
    s"""wsrc AS MATERIALIZED (
       |  SELECT doc_id, octet_length(encode(text)) AS n,
       |         least($WinnowK, octet_length(encode(text))) AS kw,
       |         list_transform(range(octet_length(encode(text))),
       |           i -> CAST(CAST('0x' || substr(hex(encode(text)), CAST(2*i+1 AS INT), 2) AS UBIGINT) AS HUGEINT)) AS bl,
       |         ($powers)[$WinnowK - least($WinnowK, octet_length(encode(text))) + 1 :] AS pws
       |  FROM documents WHERE octet_length(encode(text)) > 0),
       |wpos AS (
       |  SELECT doc_id, n - kw + 1 AS m, kw,
       |         CAST(unnest(range(1, n - kw + 2)) AS BIGINT) AS p, bl, pws
       |  FROM wsrc),
       |whash AS (
       |  SELECT doc_id, m, p,
       |         CAST(CAST(list_sum(list_transform(range(kw),
       |             j -> bl[CAST(p + j AS INT)] * pws[CAST(j + 1 AS INT)]))
       |           % CAST('$m' AS HUGEINT) AS UBIGINT) AS HUGEINT) AS hu
       |  FROM wpos),
       |whs AS (
       |  SELECT doc_id, m, p,
       |         CAST(CASE WHEN hu >= CAST('${BigInt(1) << 63}' AS HUGEINT)
       |           THEN hu - CAST('$m' AS HUGEINT) ELSE hu END AS BIGINT) AS h
       |  FROM whash),
       |wmin AS (
       |  SELECT doc_id, m, p,
       |         min(h) OVER (PARTITION BY doc_id ORDER BY p
       |           ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS sel
       |  FROM whs),
       |wsel AS (
       |  SELECT DISTINCT doc_id, sel FROM wmin WHERE p <= m - least($WinnowW, m) + 1)""".stripMargin
  }

  private lazy val winnowSql: String =
    s"""WITH $winnowSelectedCte
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_selected,
       |  md5(array_to_string(list_sort(list(sel)), ',')) AS fp_digest,
       |  min(sel) AS fp_min
       |FROM wsel GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Full-pipeline DuckDB oracle for `text_bpe`: the 40-round training
    * loop is UNROLLED as chained CTEs (the Lloyd's/matrix-squaring
    * technique), and the greedy rank-ordered encode is a recursive CTE
    * over the distinct vocabulary. Key representation trick: a word's
    * symbol sequence is ONE chr(31)-delimited string (US-separator
    * sentinels around every symbol), so the Scala kernel's non-overlapping
    * left-to-right `mergeAll` is exactly SQL `replace()` — both consume
    * the match and continue after the replacement (verified on the
    * `.e.e.e.` overlap case), and a freshly merged symbol `a||b` can
    * never re-match as the left operand `a` within the round (b is
    * non-empty), so one `replace` per round IS the kernel's pass.
    * Per training round k: count adjacent weighted pairs from the
    * delimited strings (pure list ops), pick the best by
    * (count DESC, a, b) with the count>=2 stop mirrored as an empty
    * 1-row table (LEFT JOIN makes later rounds no-ops, which is stable:
    * unchanged words keep producing no eligible pair). Encoding: each
    * recursion step applies `replace` for the LOWEST-rank present pair
    * (list_position against the rank-ordered pattern list; absent -> 0,
    * filtered), terminating when no pair applies — at most |word|
    * iterations. Character split `string_split(tok,'')` yields code
    * points vs the kernel's UTF-16 units — identical for ASCII+BMP
    * corpora (non-BMP text would diverge; the testdata is ASCII).
    */
  private lazy val bpeOracleSql: String = {
    val numMerges = 40
    val sampleWords = 2048
    val U = "chr(31)"
    val train = (0 until numMerges).map { k =>
      s"""p$k AS (
         |  SELECT sy[i] AS a, sy[i+1] AS b, sum(c) AS cnt
         |  FROM (SELECT c, list_filter(string_split(s, $U), x -> x <> '') AS sy FROM w$k),
         |       unnest(range(1, len(sy))) AS r(i)
         |  GROUP BY 1, 2),
         |b$k AS (SELECT a, b, $U||a||$U||b||$U AS pat, $U||a||b||$U AS rep
         |  FROM p$k WHERE cnt >= 2 ORDER BY cnt DESC, a, b LIMIT 1),
         |w${k + 1} AS MATERIALIZED (
         |  SELECT w.c, CASE WHEN b.pat IS NULL THEN w.s ELSE replace(w.s, b.pat, b.rep) END AS s
         |  FROM w$k w LEFT JOIN b$k b ON true)""".stripMargin
    }.mkString(",\n")
    val mrgUnion = (0 until numMerges)
      .map(k => s"SELECT $k AS rank, pat, rep FROM b$k").mkString(" UNION ALL ")
    s"""WITH RECURSIVE
       |tok AS MATERIALIZED (
       |  SELECT doc_id, t.tok FROM documents,
       |  unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)),
       |freq AS MATERIALIZED (
       |  SELECT tok, count(*) AS c FROM tok WHERE len(tok) > 0
       |  GROUP BY tok ORDER BY c DESC, tok LIMIT $sampleWords),
       |w0 AS MATERIALIZED (
       |  SELECT c, $U || array_to_string(string_split(tok, ''), $U) || $U || '</w>' || $U AS s
       |  FROM freq),
       |$train,
       |mrg AS ($mrgUnion),
       |marr AS (SELECT list(pat ORDER BY rank) AS pats, list(rep ORDER BY rank) AS reps FROM mrg),
       |vocab AS MATERIALIZED (SELECT DISTINCT tok FROM tok WHERE len(tok) > 0),
       |enc AS (
       |  SELECT tok,
       |    $U || array_to_string(string_split(tok, ''), $U) || $U || '</w>' || $U AS s,
       |    0 AS it
       |  FROM vocab
       |  UNION ALL
       |  SELECT e.tok, replace(e.s, m.pats[e.bi], m.reps[e.bi]), e.it + 1
       |  FROM (
       |    SELECT tok, s, it,
       |      list_min(list_filter(list_transform(
       |        (SELECT list_transform(range(1, len(sy)), i -> $U||sy[i]||$U||sy[i+1]||$U)
       |         FROM (SELECT list_filter(string_split(s, $U), x -> x <> '') AS sy)),
       |        p -> list_position(m0.pats, p)), x -> x > 0)) AS bi
       |    FROM enc, marr m0) e, marr m
       |  WHERE e.bi IS NOT NULL AND e.it < 100),
       |encf AS MATERIALIZED (
       |  SELECT tok, list_filter(string_split(s, $U), x -> x <> '') AS subs
       |  FROM (SELECT tok, s, row_number() OVER (PARTITION BY tok ORDER BY it DESC) AS rn FROM enc)
       |  WHERE rn = 1),
       |occ AS (SELECT t.doc_id, e.subs FROM tok t JOIN encf e USING (tok)),
       |agg AS (SELECT doc_id, CAST(sum(len(subs)) AS INTEGER) AS n_bpe_tokens FROM occ GROUP BY doc_id),
       |typ AS (SELECT doc_id, CAST(count(DISTINCT sub) AS INTEGER) AS n_subword_types
       |  FROM occ, unnest(subs) AS u(sub) GROUP BY doc_id),
       |nws AS (SELECT doc_id,
       |  CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INTEGER) AS n_ws_tokens
       |  FROM documents)
       |SELECT n.doc_id, n.n_ws_tokens,
       |  coalesce(a.n_bpe_tokens, 0) AS n_bpe_tokens,
       |  coalesce(t.n_subword_types, 0) AS n_subword_types,
       |  round(CAST(coalesce(a.n_bpe_tokens, 0) AS DOUBLE) / n.n_ws_tokens, 4) AS fertility
       |FROM nws n LEFT JOIN agg a USING (doc_id) LEFT JOIN typ t USING (doc_id)
       |ORDER BY n.doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // same tokenizer discipline as text_chunks (split of trim, no
    // filter — corpus texts are non-empty); segment slice upper bound
    // clamps at the list end exactly like Spark's slice
    "text_boilerplate" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |seg AS (
        |  SELECT doc_id,
        |         md5(array_to_string(w[CAST(i*5+1 AS INT):CAST(i*5+5 AS INT)], ' ')) AS seg_hash,
        |         least(len(w) - i*5, 5) AS seg_tokens
        |  FROM t, unnest(range(CAST(ceil(len(w)/5.0) AS BIGINT))) r(i)),
        |sdf AS (SELECT seg_hash, count(DISTINCT doc_id) AS dfreq FROM seg GROUP BY 1)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(sum(CASE WHEN dfreq >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |  CAST(sum(CASE WHEN dfreq < 2 THEN seg_tokens ELSE 0 END) AS BIGINT) AS clean_tokens,
        |  CAST(sum(CASE WHEN dfreq >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS boiler_ratio
        |FROM seg JOIN sdf USING (seg_hash)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // md5-derived feature hashing reproduced bit-for-bit (first 8 hex
    // chars as an unsigned int, mod 64); the per-doc score folds
    // bucket-ordered contributions exactly like the Spark
    // sort_array+aggregate, with ln applied to the same double ratios
    "text_dsir" ->
      """WITH t AS (SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |           FROM documents),
        |bk AS (SELECT doc_id, lang,
        |         CAST(CAST('0x' || substr(md5(tok), 1, 8) AS UBIGINT) % 64 AS BIGINT) AS bucket
        |       FROM t),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS rt,
        |               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tt
        |        FROM bk),
        |tgt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS tcnt FROM bk WHERE lang = 'en' GROUP BY 1),
        |rw AS (SELECT bucket, CAST(count(*) AS BIGINT) AS rcnt FROM bk GROUP BY 1),
        |wt AS (SELECT rw.bucket,
        |         CAST(ln(((coalesce(tcnt, 0) + 1.0) * (rt + 64)) / ((rcnt + 1.0) * (tt + 64)))
        |              AS DECIMAL(18,9)) AS w
        |       FROM rw LEFT JOIN tgt USING (bucket) CROSS JOIN tot),
        |pd AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt FROM bk GROUP BY 1, 2),
        |sc AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |         sum(CAST(cnt AS DECIMAL(10,0)) * w) AS swc
        |       FROM pd JOIN wt USING (bucket) GROUP BY doc_id)
        |SELECT doc_id, n_tokens, CAST(swc AS DOUBLE) / n_tokens AS score
        |FROM sc ORDER BY score DESC, doc_id LIMIT 100""".stripMargin,
    "text_bpe" -> bpeOracleSql,
    "text_fingerprint" -> fingerprintSql,
    "text_winnow" -> winnowSql,
    // mirrors textZipf exactly: DECIMAL(18,9) moment quantization
    // before summing, double arithmetic in the same expression shape
    "text_zipf" ->
      """WITH t AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |           FROM documents),
        |c AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
        |rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r FROM c),
        |p AS (SELECT ln(r) AS lnr, ln(c) AS lnf FROM rk WHERE r <= 1000),
        |q AS (SELECT CAST(lnr AS DECIMAL(18,9)) AS x, CAST(lnf AS DECIMAL(18,9)) AS y,
        |             CAST(lnr*lnf AS DECIMAL(18,9)) AS xy,
        |             CAST(lnr*lnr AS DECIMAL(18,9)) AS xx,
        |             CAST(lnf*lnf AS DECIMAL(18,9)) AS yy FROM p),
        |s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |             CAST(sum(xy) AS DOUBLE) AS sxy, CAST(sum(xx) AS DOUBLE) AS sxx,
        |             CAST(sum(yy) AS DOUBLE) AS syy FROM q)
        |SELECT CAST(n AS BIGINT) AS n_ranks,
        |       round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS zipf_slope,
        |       round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6) AS zipf_intercept,
        |       round(((n*sxy - sx*sy) * (n*sxy - sx*sy)) / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS fit_r2
        |FROM s""".stripMargin,
    // the sketch screen provably drops nothing above support, and the
    // final HAVING drops its false positives — so the plain GROUP BY
    // HAVING is the exact answer textHeavyHitters must reproduce
    "text_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |           FROM documents),
        |n AS (SELECT CAST(ceil(0.002 * count(*)) AS BIGINT) AS support FROM t)
        |SELECT tok, count(*) AS cnt FROM t
        |GROUP BY tok
        |HAVING count(*) >= (SELECT support FROM n)
        |ORDER BY cnt DESC, tok""".stripMargin,
    // the Misra-Gries candidate screen is a provable superset of the
    // >= ceil(phi·n_lang) tokens, so the grouped exact HAVING is the
    // answer the bounded-state two-pass must reproduce
    "text_heavy_hitters_lang" ->
      """WITH t AS (SELECT lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |           FROM documents),
        |g AS (SELECT lang, count(*) AS lang_total FROM t GROUP BY 1)
        |SELECT t.lang, tok, count(*) AS cnt
        |FROM t JOIN g USING (lang)
        |GROUP BY t.lang, tok, g.lang_total
        |HAVING count(*) >= CAST(ceil(0.02 * lang_total) AS BIGINT)
        |ORDER BY lang, cnt DESC, tok""".stripMargin,
    // per-term JSD contributions quantized to DECIMAL(18,12) pre-sum;
    // every double expression tree mirrors textDrift exactly
    "text_drift" ->
      s"""WITH t AS (SELECT source,
         |             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
         |           FROM documents),
         |st0 AS (SELECT source, tok, count(*) AS c FROM t GROUP BY 1, 2),
         |voc AS (SELECT tok FROM (
         |    SELECT tok, sum(c) AS ct, row_number() OVER (ORDER BY sum(c) DESC, tok) AS rn
         |    FROM st0 GROUP BY tok) WHERE rn <= ${DriftVocab}),
         |st AS (SELECT source,
         |         CASE WHEN v.tok IS NOT NULL THEN st0.tok ELSE chr(1) || 'OOV' END AS tok,
         |         CAST(sum(c) AS BIGINT) AS c
         |       FROM st0 LEFT JOIN voc v ON v.tok = st0.tok GROUP BY 1, 2),
         |tot AS (SELECT tok, sum(c) AS ct FROM st GROUP BY tok),
         |nsrc AS (SELECT source, sum(c) AS ns FROM st GROUP BY source),
         |nall AS (SELECT sum(c) AS n FROM st),
         |grid AS (
         |  SELECT s.source, s.ns,
         |         coalesce(x.c, 0) AS cs, tt.ct - coalesce(x.c, 0) AS cr,
         |         (SELECT n FROM nall) - s.ns AS nr
         |  FROM nsrc s CROSS JOIN tot tt
         |  LEFT JOIN st x ON x.source = s.source AND x.tok = tt.tok),
         |terms AS (
         |  SELECT source, ns,
         |    CAST(CASE WHEN cs = 0 AND cr = 0 THEN 0.0
         |      WHEN cs = 0 THEN (CAST(cr AS DOUBLE) / nr) * ln(2.0)
         |      WHEN cr = 0 THEN (CAST(cs AS DOUBLE) / ns) * ln(2.0)
         |      ELSE (CAST(cs AS DOUBLE) / ns) *
         |             ln(2.0 * (CAST(cs AS DOUBLE) / ns) /
         |                ((CAST(cs AS DOUBLE) / ns) + (CAST(cr AS DOUBLE) / nr)))
         |         + (CAST(cr AS DOUBLE) / nr) *
         |             ln(2.0 * (CAST(cr AS DOUBLE) / nr) /
         |                ((CAST(cs AS DOUBLE) / ns) + (CAST(cr AS DOUBLE) / nr)))
         |      END AS DECIMAL(18,12)) AS trm
         |  FROM grid)
         |SELECT source, CAST(max(ns) AS BIGINT) AS n_tokens,
         |       round(CAST(sum(trm) AS DOUBLE) / 2, 6) AS jsd
         |FROM terms GROUP BY source ORDER BY source""".stripMargin,
    // textCompressBound's mirror: per-CHAR counts via the empty-pattern
    // split (both engines split per character, no trailing empty for
    // nonempty text), c·ln c quantized DECIMAL(18,9) pre-sum, and the
    // stored-mode ceiling in pure integer arithmetic
    "text_compress_bound" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |c AS (SELECT doc_id, ch, count(*) AS c FROM t GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
        |             sum(CAST(c * ln(c) AS DECIMAL(18,9))) AS sclc
        |      FROM c GROUP BY doc_id),
        |b AS (SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |             CAST(octet_length(encode(text))
        |               + 5 * CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / 65535) AS BIGINT)
        |               + 10 AS BIGINT) AS ceil_bytes
        |      FROM documents)
        |SELECT a.doc_id, b.n_bytes, b.ceil_bytes,
        |       round(CAST(b.ceil_bytes AS DOUBLE) / b.n_bytes, 4) AS ceil_ratio,
        |       round((ln(a.n_chars) - CAST(a.sclc AS DOUBLE) / a.n_chars) / ln(2) / 8, 4) AS h0_ratio
        |FROM a JOIN b ON a.doc_id = b.doc_id ORDER BY a.doc_id""".stripMargin,
    // c·ln(c) quantized to DECIMAL(18,9) pre-sum, mirroring textEntropy
    "text_entropy" ->
      """WITH t AS (SELECT doc_id,
        |             unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |           FROM documents),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types,
        |             sum(CAST(c * ln(c) AS DECIMAL(18,9))) AS sclc
        |      FROM c GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_types,
        |       round(ln(n_tokens) - CAST(sclc AS DOUBLE) / n_tokens, 4) AS entropy,
        |       CAST(n_types AS DOUBLE) / n_tokens AS ttr
        |FROM a ORDER BY doc_id""".stripMargin,
    // bigram construction mirrors WordShingles(n=2, distinct=false):
    // <2-token docs contribute their tokens joined as ONE shingle
    "text_pmi" ->
      """WITH t AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
        |uc AS (SELECT wd, count(*) AS c_w
        |       FROM (SELECT unnest(w) AS wd FROM t) GROUP BY wd),
        |ut AS (SELECT sum(c_w) AS n_uni FROM uc),
        |bc AS (SELECT bg, count(*) AS c_xy FROM (
        |         SELECT unnest(CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
        |                            ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) END) AS bg
        |         FROM t) GROUP BY bg),
        |bt AS (SELECT sum(c_xy) AS n_big FROM bc)
        |SELECT f.bg AS bigram, f.c_xy AS c_xy, x.c_w AS c_x, y.c_w AS c_y,
        |       round(ln(CAST(f.c_xy AS DOUBLE) * n_uni * n_uni /
        |             (CAST(x.c_w AS DOUBLE) * y.c_w * n_big)), 4) AS pmi
        |FROM (SELECT bg, c_xy FROM bc WHERE c_xy >= 5) f
        |JOIN uc x ON string_split(f.bg, ' ')[1] = x.wd
        |JOIN uc y ON string_split(f.bg, ' ')[2] = y.wd
        |CROSS JOIN ut CROSS JOIN bt
        |ORDER BY pmi DESC, bigram LIMIT 20""".stripMargin,
    // mirrors nbClassify: dense vocab x class smoothing grid, DECIMAL(18,9)
    // log-prob quantization before summing (exact, association-free)
    "text_nb_lang" ->
      s"""WITH $nbPredCtes
         |SELECT doc_id, label_pred, nb_score, label_declared
         |FROM pred ORDER BY doc_id""".stripMargin,
    // the confusion rollup over the SAME prediction chain — one NB
    // definition behind the classifier and its evaluation
    "text_nb_report" ->
      s"""WITH $nbPredCtes,
         |cm AS (SELECT label_declared, label_pred, count(*) AS n
         |       FROM pred GROUP BY 1, 2)
         |SELECT label_declared, label_pred, n,
         |       round(CAST(n AS DOUBLE) /
         |             sum(n) OVER (PARTITION BY label_declared), 4) AS frac
         |FROM cm ORDER BY label_declared, label_pred""".stripMargin,
    // the margin curve over the SAME rk CTE as the classifier: margin is
    // an exact decimal difference of rank-1/rank-2 scores, the grid join
    // mirrors the Spark explode, and every count/division is integer
    // until the two final rounded quotients
    "text_nb_margin" -> {
      val grid = NbMarginGrid.map(t => BigDecimal(t).bigDecimal.toPlainString)
        .mkString("[", ", ", "]")
      s"""WITH $nbPredCtes,
         |mg AS (SELECT r1.doc_id AS doc_id,
         |              CAST(r1.score - r2.score AS DOUBLE) AS margin,
         |              CASE WHEN r1.label = d.lang THEN 1 ELSE 0 END AS ok
         |       FROM rk r1
         |       JOIN rk r2 ON r1.doc_id = r2.doc_id AND r1.rank = 1 AND r2.rank = 2
         |       JOIN documents d ON d.doc_id = r1.doc_id),
         |tot AS (SELECT count(*) AS n_total FROM mg),
         |grid AS (SELECT CAST(unnest($grid) AS DOUBLE) AS min_margin),
         |agg AS (
         |  SELECT min_margin,
         |         CAST(count(*) AS BIGINT) AS n_kept,
         |         CAST(sum(ok) AS BIGINT) AS n_correct
         |  FROM grid JOIN mg ON mg.margin >= grid.min_margin
         |  GROUP BY min_margin)
         |SELECT g.min_margin AS min_margin,
         |       CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
         |       CAST(COALESCE(n_correct, 0) AS BIGINT) AS n_correct,
         |       round(CAST(COALESCE(n_kept, 0) AS DOUBLE) / n_total, 6) AS coverage,
         |       round(CAST(n_correct AS DOUBLE) / n_kept, 6) AS acc
         |FROM grid g LEFT JOIN agg ON agg.min_margin = g.min_margin
         |CROSS JOIN tot
         |ORDER BY g.min_margin""".stripMargin
    },
    // one-vs-rest rank-sum AUC over the SAME per-profile quotient scores
    // as the text_langid oracle; the rank-sum runs in doubled integer
    // units so the only float op is the final division
    "text_auc" -> {
      val structs = TextFns.langProfiles.map { case (code, words) =>
        val lst = words.map(w => s"'$w'").mkString("[", ",", "]")
        s"{lang: '$code', score: CAST(len(list_filter(w, x -> list_contains($lst, x))) AS DOUBLE) / greatest(len(w), 1)}"
      }.mkString(",\n        ")
      s"""WITH t AS (SELECT lang, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents),
         |s AS (SELECT lang, unnest([
         |        $structs]) AS ls FROM t),
         |p AS (SELECT ls.lang AS lang_profile, ls.score AS score,
         |             CASE WHEN lang = ls.lang THEN 1 ELSE 0 END AS pos
         |      FROM s),
         |g AS (SELECT lang_profile, score, count(*) AS n, CAST(sum(pos) AS BIGINT) AS npos
         |      FROM p GROUP BY 1, 2),
         |c AS (SELECT lang_profile, n, npos,
         |             sum(n) OVER (PARTITION BY lang_profile ORDER BY score
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS cum
         |      FROM g),
         |a AS (SELECT lang_profile AS lang,
         |             CAST(sum(npos) AS BIGINT) AS n_pos,
         |             CAST(sum(n - npos) AS BIGINT) AS n_neg,
         |             sum(CAST(npos AS HUGEINT) * (2 * CAST(cum AS HUGEINT) + n + 1)) AS r2
         |      FROM c GROUP BY 1)
         |SELECT lang, n_pos, n_neg,
         |       CASE WHEN n_pos > 0 AND n_neg > 0
         |         THEN round(CAST(r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS DOUBLE) / (2.0 * n_pos * n_neg), 6)
         |       END AS auc
         |FROM a ORDER BY lang""".stripMargin
    },
    // value-based integer doc_id buckets (div, not ntile) + vocab-level
    // min-bucket first occurrences at both granularities (unigram tokens;
    // the per-doc-distinct word-3-shingles of the dedup unit); cumulative
    // sums over the 10-row curve
    "text_heaps" ->
      s"""WITH mm AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
        |d AS (SELECT ${bucketSql("doc_id")} AS bucket,
        |             string_split_regex(trim(lower(text)), '\\s+') AS w
        |      FROM documents CROSS JOIN mm),
        |nd AS (SELECT bucket, count(*) AS n_docs FROM d GROUP BY bucket),
        |tk AS (SELECT bucket, unnest(w) AS u FROM d),
        |sg AS (SELECT bucket,
        |              unnest(list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |                ELSE list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END)) AS u
        |       FROM d),
        |occ_t AS (SELECT bucket, count(*) AS n_tokens FROM tk GROUP BY bucket),
        |new_t AS (SELECT bucket, count(*) AS new_types
        |          FROM (SELECT u, min(bucket) AS bucket FROM tk GROUP BY u) GROUP BY bucket),
        |occ_s AS (SELECT bucket, count(*) AS n_shingles FROM sg GROUP BY bucket),
        |new_s AS (SELECT bucket, count(*) AS new_shingles
        |          FROM (SELECT u, min(bucket) AS bucket FROM sg GROUP BY u) GROUP BY bucket),
        |cur AS (SELECT nd.bucket AS bucket, n_docs, n_tokens,
        |               COALESCE(new_types, 0) AS new_types,
        |               n_shingles, COALESCE(new_shingles, 0) AS new_shingles
        |        FROM nd
        |        JOIN occ_t ON nd.bucket = occ_t.bucket
        |        LEFT JOIN new_t ON nd.bucket = new_t.bucket
        |        JOIN occ_s ON nd.bucket = occ_s.bucket
        |        LEFT JOIN new_s ON nd.bucket = new_s.bucket)
        |SELECT bucket, n_docs, n_tokens, new_types,
        |       CAST(sum(n_tokens) OVER cw AS BIGINT) AS cum_tokens,
        |       CAST(sum(new_types) OVER cw AS BIGINT) AS cum_types,
        |       round(CAST(sum(new_types) OVER cw AS DOUBLE) /
        |             CAST(sum(n_tokens) OVER cw AS DOUBLE), 6) AS ttr,
        |       n_shingles, new_shingles,
        |       CAST(sum(new_shingles) OVER cw AS BIGINT) AS cum_shingle_types,
        |       round(CAST(new_shingles AS DOUBLE) / n_shingles, 6) AS shingle_novelty
        |FROM cur
        |WINDOW cw AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY bucket""".stripMargin,
    // integer sums mirror TextStats exactly (same classes as text_quality);
    // ratios unrounded — int/int doubles are bit-identical cross-engine
    "q_source_report" ->
      """WITH per AS (
        |  SELECT source, text,
        |    length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct,
        |    length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
        |    length(text) AS n_chars,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |        x -> list_contains(['the','a','of','and','to','in'], x))) AS n_stop
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_tokens) AS DOUBLE) / count(*) AS mean_tokens,
        |  CAST(sum(n_punct) AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE) AS punct_ratio,
        |  CAST(sum(n_digit) AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE) AS digit_ratio,
        |  CAST(sum(n_stop) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE) AS stopword_ratio,
        |  1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*) AS dup_rate
        |FROM per GROUP BY source ORDER BY source""".stripMargin,
    // top-16 vocab by (count DESC, token ASC); OOV = token not in vocab
    "text_vocab_oov" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS c FROM toks GROUP BY 1
        |    ORDER BY c DESC, tok LIMIT 16)),
        |j AS (
        |  SELECT t.doc_id, v.tok AS vtok
        |  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok)
        |SELECT doc_id, count(*) AS n_tokens,
        |       CAST(count(*) FILTER (WHERE vtok IS NULL) AS BIGINT) AS n_oov,
        |       round(CAST(count(*) FILTER (WHERE vtok IS NULL) AS DOUBLE) / count(*), 4)
        |         AS oov_rate
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, toks, CAST(len(toks) AS INTEGER) AS n_tok,
        |         GREATEST(CAST(ceil((len(toks) - 64) / 48.0) AS INTEGER) + 1, 1) AS n_chunks
        |  FROM t)
        |SELECT doc_id, CAST(u.chunk_id AS INTEGER) AS chunk_id,
        |       CAST(LEAST(n_tok - u.chunk_id * 48, 64) AS INTEGER) AS chunk_tokens,
        |       array_to_string(toks[u.chunk_id * 48 + 1 : u.chunk_id * 48 + 64], ' ') AS chunk
        |FROM n, unnest(generate_series(0, n_chunks - 1)) AS u(chunk_id)
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "text_lm_score" ->
      """WITH tri AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, length(text) - 1), i -> substr(text, i, 3))) AS g
        |  FROM documents WHERE length(text) >= 3),
        |dt AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY 1, 2),
        |tc AS (SELECT g, sum(c) AS cnt FROM dt GROUP BY g),
        |bc AS (SELECT substr(g, 1, 2) AS b, sum(cnt) AS ctx FROM tc GROUP BY 1),
        |model AS (SELECT g, ln(CAST(cnt AS DOUBLE) / CAST(ctx AS DOUBLE)) AS lp
        |          FROM tc JOIN bc ON substr(tc.g, 1, 2) = bc.b)
        |SELECT doc_id, round(sum(c * lp) / sum(c), 4) AS lm_logprob,
        |       CAST(sum(c) AS BIGINT) AS n_trigrams
        |FROM dt JOIN model USING (g)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_pii" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 555-' ||
         |         lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199 from 10.0.' ||
         |         CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
         |  FROM documents)
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(t, '$EmailRe')) AS INTEGER) AS n_email,
         |       CAST(len(regexp_extract_all(t, '$PhoneRe')) AS INTEGER) AS n_phone,
         |       CAST(len(regexp_extract_all(t, '$Ipv4Re')) AS INTEGER) AS n_ipv4,
         |       regexp_replace(regexp_replace(regexp_replace(t,
         |         '$EmailRe', '[EMAIL]', 'g'), '$PhoneRe', '[PHONE]', 'g'),
         |         '$Ipv4Re', '[IP]', 'g') AS redacted
         |FROM t ORDER BY doc_id""".stripMargin,
    "text_top_ngrams" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(
        |        CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
        |             ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) END)) AS ng
        |      FROM t)
        |SELECT ng AS ngram, count(*) AS df FROM g
        |GROUP BY ng ORDER BY df DESC, ngram LIMIT 20""".stripMargin,
    // formula literals forced to DOUBLE (DuckDB parses decimal literals
    // as DECIMAL and would multiply exactly where the JVM rounds in
    // binary); rounding is the same floor-grid the Spark side uses —
    // identical IEEE ops, no round-half tie (see textReadability)
    "text_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_words,
        |         CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS INTEGER) AS n_syl
        |  FROM documents)
        |SELECT doc_id, n_words, n_syl AS n_syllables,
        |       floor((CAST(n_syl AS DOUBLE) / n_words) * 10000.0 + 0.5) / 10000.0 AS syl_per_word,
        |       floor((CAST(206.835 AS DOUBLE) - CAST(1.015 AS DOUBLE) * n_words
        |             - CAST(84.6 AS DOUBLE) * (CAST(n_syl AS DOUBLE) / n_words)) * 100.0 + 0.5) / 100.0 AS flesch,
        |       floor((CAST(0.39 AS DOUBLE) * n_words
        |             + CAST(11.8 AS DOUBLE) * (CAST(n_syl AS DOUBLE) / n_words)
        |             - CAST(15.59 AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS fk_grade
        |FROM c ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      s"""SELECT doc_id,
         |       CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_ws_tokens,
         |       CAST(len(regexp_extract_all(text, '${TextFns.bpePattern.replace("'", "''")}')) AS INTEGER) AS n_bpe_tokens,
         |       CAST(length(text) AS INTEGER) AS n_chars_measured
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        |  round(CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE) / length(text), 4) AS punct_ratio,
        |  round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text), 4) AS digit_ratio,
        |  round(CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'), x -> length(x))) AS DOUBLE)
        |        / len(string_split_regex(trim(text), '\s+')), 4) AS mean_token_len,
        |  round(CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |        x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE)
        |        / len(string_split_regex(trim(lower(text)), '\s+')), 4) AS stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    // CharBitmap covers ASCII 0-127; the test corpus is ASCII, so the
    // distinct-character count is the popcount of the OR'd masks
    "text_alphabet" ->
      """SELECT lang, CAST(count(DISTINCT c) AS INTEGER) AS n_alphabet
        |FROM (SELECT lang, unnest(string_split(text, '')) AS c FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id,
        |         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
        |              '\s+', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, CAST(length(norm) AS INTEGER) AS n_chars_norm,
        |       md5(norm) AS norm_hash
        |FROM n ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |b AS (SELECT doc_id, unnest(
        |        CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
        |             ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) END) AS bg
        |      FROM t),
        |c AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2),
        |p AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_bg FROM c GROUP BY 1)
        |SELECT t.doc_id AS doc_id,
        |       CAST(len(w) AS INTEGER) AS n_tokens,
        |       round(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 4) AS dup_word_frac,
        |       round(CAST(top_c AS DOUBLE) / n_bg, 4) AS top_bigram_frac
        |FROM t JOIN p ON t.doc_id = p.doc_id ORDER BY doc_id""".stripMargin,
    // generated from the SAME langProfiles list the Spark side scores with,
    // so the two can't drift
    "text_langid" -> {
      val structs = TextFns.langProfiles.map { case (code, words) =>
        val lst = words.map(w => s"'$w'").mkString("[", ",", "]")
        s"{score: CAST(len(list_filter(w, x -> list_contains($lst, x))) AS DOUBLE) / greatest(len(w), 1), lang: '$code'}"
      }.mkString(",\n        ")
      s"""WITH t AS (SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents),
         |s AS (SELECT doc_id, lang, (list_sort([
         |        $structs], 'DESC'))[1] AS best
         |      FROM t)
         |SELECT doc_id, best.lang AS lang_pred, round(best.score, 4) AS lang_score,
         |       lang AS lang_declared
         |FROM s ORDER BY doc_id""".stripMargin
    },
  )
}
