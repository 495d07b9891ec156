package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  test("WordShingles non-distinct mode keeps bigram multiplicities") {
    val df = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val all = df.select(explode(graft.functions.WordShingles(col("text"), 2, distinct = false)))
      .as[String].collect()
    assert(all === Array("a b", "b a", "a b", "b a"))
    val dist = df.select(explode(graft.functions.WordShingles(col("text"), 2)))
      .as[String].collect()
    assert(dist === Array("a b", "b a"))
  }

  test("bm25 favors term frequency and rarity") {
    val docs = Seq(
      (1L, "spark spark spark noise noise noise"),
      (2L, "spark noise noise noise noise noise"),
      (3L, "noise noise noise noise noise noise"),
      (4L, "rare noise noise noise noise noise"),
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25(docs, Seq("spark", "rare"), 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // doc 3 has no query term at all
    assert(!got.contains(3L))
    // higher tf at equal df and length ranks higher
    assert(got(1L) > got(2L))
    // "rare" (df=1) outscores a single "spark" (df=2) at equal tf/length
    assert(got(4L) > got(2L))
  }

  test("contamination flags a corpus copy of a benchmark document") {
    val bench = "w1 w2 w3 w4 w5 w6 w7 w8"
    val docs = Seq(
      (100L, bench),                         // benchmark doc (id % 100 == 0)
      (1L, bench),                           // verbatim leak
      (2L, "x1 x2 x3 x4 x5 x6 x7 x8"),       // clean
      (200L, "y1 y2 y3 y4 y5 y6 y7 y8"),     // clean benchmark doc
    ).toDF("doc_id", "text")
    val rows = Retrieval.contamination(docs).collect()
    val byBench = rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byBench(100L) === ((1L, 4L))) // 4 distinct 5-grams of an 8-token doc all leak
    assert(byBench(200L) === ((0L, 0L))) // clean benchmark rows still present
  }

  test("threshold-based stratified sampling equals the rank-based form") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    for (frac <- Seq(0.2, 0.02)) {
      val rank = Curation.stratifiedSample(docs, col("lang"), col("doc_id"), frac)
        .select("doc_id").as[Long].collect().sorted
      val thresh = Curation.stratifiedSampleThreshold(docs, col("lang"), col("doc_id"), frac)
        .select("doc_id").as[Long].collect().sorted
      assert(thresh === rank, s"frac=$frac")
    }
  }

  test("stratifiedSample keeps exactly ceil(frac*n) rows per stratum") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val kept = Curation.stratifiedSample(docs, col("lang"), col("doc_id"), 0.2)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept.keySet === totals.keySet)
    totals.foreach { case (lang, n) =>
      assert(kept(lang) === math.ceil(0.2 * n).toLong, s"stratum $lang")
    }
    // reproducible: same rows on a second evaluation
    val a = Curation.stratifiedSample(docs, col("lang"), col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().sorted
    val b = Curation.stratifiedSample(docs, col("lang"), col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().sorted
    assert(a === b)
  }
}
