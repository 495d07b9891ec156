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

  test("RRF fusion scores are exactly the reciprocal-rank sums of its lists") {
    val dir = "/root/testdata/sf0.001"
    val rows = Retrieval.rrfFusion(spark, dir)
      .as[(Long, Double, Option[Int], Option[Int])].collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // returned ranks reconstruct the score bit-for-bit
    rows.foreach { case (id, score, tr, vr) =>
      assert(tr.isDefined || vr.isDefined, s"doc $id in neither list")
      val expect = tr.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        vr.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(score === math.rint(expect * 1e6) / 1e6, s"doc $id")
      tr.foreach(r => assert(r >= 1 && r <= 50)); vr.foreach(r => assert(r >= 1 && r <= 50))
    }
    // descending by fused score with doc_id tiebreak
    val pairs = rows.map(r => (r._2, r._1))
    assert(pairs.sameElements(pairs.sortBy { case (s, id) => (-s, id) }))
  }

  test("PMI surfaces a planted collocation and matches the closed form") {
    // "alpha beta" always adjacent; fillers independent. 8 docs x "alpha
    // beta" once per doc + noise
    val docs = (0L until 8L).map { i =>
      (i, s"alpha beta w$i x$i y$i z$i w$i x$i")
    }.toDF("doc_id", "text")
    val got = Text.pmiBigrams(docs, minCount = 5, k = 5)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.head._1 === "alpha beta")
    val (_, cxy, cx, cy, pmi) = got.head
    assert(cxy === 8L && cx === 8L && cy === 8L)
    // every doc has 8 tokens -> 64 unigrams, 7 bigrams -> 56 bigrams
    val expect = math.log(cxy.toDouble * 64 * 64 / (cx.toDouble * cy * 56))
    assert(pmi === math.rint(expect * 1e4) / 1e4)
  }

  test("bloom-screened contamination equals the broadcast-set form and keeps the screen in-plan") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plain = Retrieval.contamination(docs).collect().map(_.toString)
    val bloomed = Retrieval.contaminationBloom(docs)
    assert(bloomed.queryExecution.executedPlan.toString.contains("might_contain"),
      "corpus side must be bloom-screened before the join")
    assert(bloomed.collect().map(_.toString).toSeq === plain.toSeq)
  }

  test("NB classifier separates planted disjoint-vocab classes") {
    val docs = (
      (0L until 10L).map(i => (i, "aa bb cc aa bb", "A")) ++
        (10L until 20L).map(i => (i, "xx yy zz xx yy", "B"))
      ).toDF("doc_id", "text", "lang")
    val got = Text.nbClassify(docs, "lang")
      .as[(Long, String, Double, String)].collect()
    assert(got.length === 20)
    got.foreach { case (id, pred, score, declared) =>
      assert(pred === declared, s"doc $id predicted $pred")
      assert(score < 0, s"log-likelihood must be negative, got $score")
    }
  }

  test("hard negatives are label-disjoint, rank-exact vs brute force, and HARD") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, dir)
    val labels = emb.select("vec_id", "label")
      .as[(Long, Int)].collect().toMap
    val got = Similarity.qHardNegatives(spark, dir)
      .as[(Long, Long, Int, Double, Int)].collect()
    assert(got.length === 25)
    got.foreach { case (qid, vid, lbl, _, _) =>
      assert(lbl !== labels(qid), s"negative $vid shares query $qid's label")
      assert(lbl === labels(vid))
    }
    // rank-exact: per query, the brute-force best cross-label cosine
    // equals the rn=1 row's score
    import org.apache.spark.sql.functions._
    val brute = emb.as("e").crossJoin(
        emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("label").as("ql")))
      .filter(col("e.label") =!= col("ql"))
      .groupBy(col("qid"))
      .agg(max(round(Similarity.cosine(col("e.embedding"), col("qe")), 4)).as("best"))
      .as[(Long, Double)].collect().toMap
    got.filter(_._5 == 1).foreach { case (qid, _, _, cos, _) =>
      assert(cos === brute(qid), s"query $qid: top negative $cos vs brute ${brute(qid)}")
    }
    // hard: the mined negatives sit close to the boundary — well above
    // the average cross-label similarity
    got.foreach { case (_, _, _, cos, _) => assert(cos > 0.0) }
  }

  test("split-leakage rollup partitions the near-dup pairs by endpoint splits") {
    val dir = "/root/testdata/sf0.001"
    val report = Curation.qSplitLeakage(spark, dir)
      .as[(String, String, Long, Double)].collect()
    val pairs = Dedup.dedupMinhash(spark, dir)
      .withColumn("sa", Curation.splitAssign(col("doc_a")))
      .withColumn("sb", Curation.splitAssign(col("doc_b")))
      .select(least(col("sa"), col("sb")), greatest(col("sa"), col("sb")))
      .as[(String, String)].collect()
    assert(report.map(_._3).sum === pairs.length.toLong)
    val expected = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(report.map(r => (r._1, r._2) -> r._3).toMap === expected)
    // canonical ordering: lo <= hi on every row
    report.foreach { case (lo, hi, _, _) => assert(lo <= hi) }
  }
}
