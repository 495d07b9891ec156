package graft.functions

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** The native expressions must be first-class from SQL too. */
class SqlFunctionsSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  test("registered SQL functions match the Column API results") {
    GraftFunctions.registerAll(spark)
    Tables.documents(spark, dir).createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """SELECT doc_id, simhash(text, 3) AS sh,
        |       rolling_hash_fingerprint(text, 16) AS fp
        |FROM docs_sql ORDER BY doc_id LIMIT 20""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val viaApi = Tables.documents(spark, dir)
      .select(col("doc_id"),
        SketchFns.simhash(col("text"), 3),
        RollingHashFingerprint(col("text"), 16))
      .orderBy("doc_id").limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaSql.toSeq === viaApi.toSeq)
  }

  test("dot_product and jaccard_sorted work in SQL expressions") {
    GraftFunctions.registerAll(spark)
    Tables.embeddings(spark, dir).createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      """SELECT a.vec_id, dot_product(a.embedding, b.embedding) AS d
        |FROM emb_sql a JOIN emb_sql b ON b.vec_id = 0
        |WHERE a.vec_id IN (1, 2) ORDER BY a.vec_id""".stripMargin).collect()
    assert(r.length === 2)
    assert(r.forall(row => !row.isNullAt(1)))
    val j = spark.sql(
      "SELECT jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j").first().getDouble(0)
    assert(j === 0.5)
  }

  test("withExtensions wiring registers the same functions") {
    // the extensions class is exercised through its injection list
    val ext = new GraftExtensions
    assert(GraftFunctions.all.map(_._1).toSet ===
      Set("rolling_hash_fingerprint", "winnow_fingerprints", "minhash_signature", "simhash",
        "shingle_hash_set", "jaccard_sorted", "dot_product", "morton_interleave",
        "lang_id", "word_shingles", "char_ngrams", "repetition_stats",
        "quantize_int8", "dequantize_int8", "char_bitmap", "srp_signature",
        "deflate_ratio", "anchored_spans", "common_prefix_length",
        "word_suffix_windows", "text_stats",
        "hll_regs", "hll_regs_merge", "hll_estimate"))
    assert(ext != null)
  }

  test("hll SQL registrations match the Column API and the exact count on small domains") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    (1 to 500).map(_.toLong).toDF("uid").createOrReplaceTempView("hll_in")
    val viaSql = spark.sql(
      "SELECT hll_estimate(hll_regs_merge(sk)) FROM " +
        "(SELECT uid % 5 AS g, hll_regs(uid) AS sk FROM hll_in GROUP BY 1)")
      .first().getLong(0)
    val viaApi = (1 to 500).foldLeft(new Array[Byte](HllSketch.M)) { (b, i) =>
      HllSketch.add(b, i.toLong); b
    }
    assert(viaSql === HllSketch.estimate(viaApi))
    assert(math.abs(viaSql - 500) < 25, s"estimate $viaSql far from 500")
  }

  test("round-7 registrations match their Column API results") {
    GraftFunctions.registerAll(spark)
    Tables.documents(spark, dir).createOrReplaceTempView("docs_sql7")
    val viaSql = spark.sql(
      """SELECT doc_id, char_bitmap(text) AS cb, deflate_ratio(text) AS dr,
        |       size(anchored_spans(text, 48, 16)) AS ns,
        |       text_stats(text).n_tokens AS nt
        |FROM docs_sql7 ORDER BY doc_id LIMIT 10""".stripMargin)
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getDouble(2), r.getInt(3), r.getInt(4)))
    val viaApi = Tables.documents(spark, dir)
      .select(col("doc_id"),
        SketchFns.charBitmap(col("text")).as("cb"),
        DeflateRatio(col("text")).as("dr"),
        size(AnchoredSpans(col("text"), 48, 16)).as("ns"),
        TextStats(col("text"), Seq("the", "a", "of", "and", "to", "in"))
          .getField("n_tokens").as("nt"))
      .orderBy("doc_id").limit(10)
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getDouble(2), r.getInt(3), r.getInt(4)))
    assert(viaSql.toSeq === viaApi.toSeq)
    // srp_signature over the embeddings table
    Tables.embeddings(spark, dir).createOrReplaceTempView("emb_sql7")
    val sig = spark.sql(
      "SELECT srp_signature(embedding, 12) FROM emb_sql7 WHERE vec_id = 0").first().getLong(0)
    val api = Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
      .select(VectorFns.srpSignature(col("embedding"), 12)).first().getLong(0)
    assert(sig === api)
  }

  test("morton_interleave equals the composed 32-term formulation and a reference bit loop") {
    GraftFunctions.registerAll(spark)
    // exhaustive over the table's real keys: native == composed-Column
    val mism = Tables.lineitem(spark, dir)
      .select(
        MortonInterleave.morton(col("l_partkey"), col("l_suppkey")).as("native"),
        graft.queries.Parity.zvalueComposed(col("l_partkey"), col("l_suppkey")).as("composed"))
      .filter(col("native") =!= col("composed"))
      .count()
    assert(mism === 0L)
    // adversarial bit patterns against a per-bit reference loop
    def ref(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i)))
        .reduce(_ | _)
    val rng = new scala.util.Random(42)
    val cases = Seq((0L, 0L), (0xFFFFL, 0xFFFFL), (0xAAAAL, 0x5555L),
      (1L, 0x8000L), (0xFFFFL, 0L)) ++
      Seq.fill(200)((rng.nextLong() & 0xFFFFL, rng.nextLong() & 0xFFFFL))
    cases.foreach { case (a, b) =>
      assert(MortonInterleave.interleave(a, b) === ref(a, b), s"($a, $b)")
    }
    // SQL surface
    val viaSql = spark.sql("SELECT morton_interleave(43690L, 21845L) AS z").first().getLong(0)
    assert(viaSql === ref(0xAAAAL, 0x5555L))
  }

  test("cms_estimate never undercounts and screens exactly the heavy-hitter domain") {
    val toks = Tables.documents(spark, dir)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
    val cms = toks.stat.countMinSketch(col("tok"), eps = 1e-4, confidence = 0.99, seed = 42)
    // overcount property over EVERY distinct token: estimate >= exact
    val under = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
      .withColumn("est", CmsEstimate.estimate(col("tok"), cms))
      .filter(col("est") < col("exact"))
      .count()
    assert(under === 0L, "count-min must never undercount")
    // totalCount equals the token stream length (threshold denominator)
    assert(cms.totalCount() === toks.count())
    // the two-pass query therefore equals the one-pass exact HAVING
    val twoPass = graft.ext.Text.textHeavyHitters(
      Tables.documents(spark, dir), phi = 0.002).collect().map(r => (r.getString(0), r.getLong(1)))
    val support = math.ceil(0.002 * cms.totalCount()).toLong
    val onePass = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= support)
      .orderBy(desc("cnt"), asc("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(twoPass.toSeq === onePass.toSeq)
  }
}
