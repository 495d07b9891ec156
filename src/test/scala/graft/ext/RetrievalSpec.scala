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

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("threshold-based per-key cap equals the rank-based form") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    for ((k, slack) <- Seq((18, 1.5), (5, 1.5), (100, 1.5))) {
      val rank = Curation.capPerKey(docs, col("source"), col("doc_id"), k)
        .select("doc_id").as[Long].collect().sorted
      val thresh = Curation.capPerKeyThreshold(docs, col("source"), col("doc_id"), k, slack)
        .select("doc_id").as[Long].collect().sorted
      assert(thresh === rank, s"k=$k slack=$slack")
    }
  }

  test("per-key cap deficient fallback still returns the exact hash-order top-k") {
    // one hot key, slack tuned so the kept slice is provably short:
    // t = (0.01*64 + 32)/1000 ≈ 0.033 ⇒ E[below] ≈ 33 < k=64 ⇒ the
    // deficient flag must trip and rank the full key
    val docs = (0L until 1000L).toDF("doc_id").withColumn("key", lit("hot"))
    val got = Curation.capPerKeyThreshold(docs, col("key"), col("doc_id"), 64, slack = 0.01)
      .select("doc_id").as[Long].collect().sorted
    val expect = (0L until 1000L).sortBy(id => md5hex(id.toString)).take(64).sorted
    assert(got === expect)
    // and matches the rank form
    val rank = Curation.capPerKey(docs, col("key"), col("doc_id"), 64)
      .select("doc_id").as[Long].collect().sorted
    assert(got === rank)
  }

  test("per-key cap treats a NULL key as its own group (null-safe joins)") {
    val docs = Seq[(Long, Option[String])](
      (1L, Some("a")), (2L, Some("a")), (3L, Some("a")),
      (4L, None), (5L, None), (6L, None), (7L, None),
    ).toDF("doc_id", "key")
    val rank = Curation.capPerKey(docs, col("key"), col("doc_id"), 2)
      .select("doc_id").as[Long].collect().sorted
    val thresh = Curation.capPerKeyThreshold(docs, col("key"), col("doc_id"), 2)
      .select("doc_id").as[Long].collect().sorted
    assert(thresh === rank)
    // 2 kept from "a", 2 kept from the NULL group
    assert(rank.length === 4)
  }

  test("domain cap keeps at most k per source, a prefix of the hash order") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val kept = Curation.qDomainCap(spark, "/root/testdata/sf0.01")
      .as[(Long, String)].collect()
    val bySource = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val all = docs.select("doc_id", "source").as[(Long, String)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    all.foreach { case (src, ids) =>
      val expect = ids.sortBy(id => (md5hex(id.toString), id)).take(18).toSet
      assert(bySource(src) === expect, s"source $src")
    }
  }

  test("token-budget selection spends each source's budget best-quality-first") {
    val stop = Set("the", "a", "of", "and", "to", "in")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val sel = Curation.qTokenBudget(spark, "/root/testdata/sf0.01")
      .as[(Long, String, Double, Long)].collect()
    // in-JVM reference: per source, order by (stopword-ratio desc, id),
    // keep while the running char total stays <= 2000
    val ref = docs.select("doc_id", "source", "text", "n_chars")
      .as[(Long, String, String, Long)].collect()
      .groupBy(_._2).toSeq.flatMap { case (_, rows) =>
        val scored = rows.map { case (id, src, text, nc) =>
          val toks = text.trim.split("\\s+")
          (id, src, toks.count(t => stop(t.toLowerCase)).toDouble / toks.length, nc)
        }.sortBy(t => (-t._3, t._1))
        var cum = 0L
        scored.takeWhile { t => cum += t._4; cum <= 2000L }.map(_._1).toSeq
      }.toSet
    assert(sel.map(_._1).toSet === ref)
    sel.foreach { case (id, _, q, cum) =>
      assert(cum <= 2000L, s"doc $id over budget")
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("histogram-cutoff token budget equals the full-rank form at any budget") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    for (budget <- Seq(500L, 2000L, 6000L)) {
      val rank = Curation.tokenBudgetSelect(docs, budget)
        .select("doc_id").as[Long].collect().sorted
      val thresh = Curation.tokenBudgetSelectThreshold(docs, budget)
        .select("doc_id").as[Long].collect().sorted
      assert(thresh === rank, s"budget=$budget")
    }
    // hot-source shape: one source, quality spread across buckets
    val hot = (0L until 500L).map { i =>
      val stops = Seq.fill((i % 7).toInt)("the")
      val noise = Seq.tabulate(6)(j => s"w${i}x$j")
      (i, (stops ++ noise).mkString(" "), "en", "hot", 100L + i % 50)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = Curation.tokenBudgetSelect(hot, 5000L)
      .select("doc_id").as[Long].collect().sorted
    val b = Curation.tokenBudgetSelectThreshold(hot, 5000L)
      .select("doc_id").as[Long].collect().sorted
    assert(a === b)
    assert(a.nonEmpty && a.length < 500)
  }

  test("water-filling allocation: budget met exactly, caps respected, level shared") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val epochCap = 2
    val budgetEpochs = 1.5
    val rows = Curation.mixtureWaterfill(docs, epochCap, budgetEpochs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val totalChars = rows.map(_._2).sum
    val budget = totalChars.toDouble * budgetEpochs
    val sumCap = rows.map(_._3).sum.toDouble
    // the allocation spends exactly min(budget, total capacity)
    assert(math.abs(rows.map(_._4).sum - math.min(budget, sumCap)) < 1e-6)
    rows.foreach { case (lang, chars, cap, alloc, epochs) =>
      assert(cap === chars * epochCap)
      assert(alloc <= cap.toDouble + 1e-9, s"$lang over capacity")
      assert(epochs <= epochCap.toDouble + 1e-9)
      assert(math.abs(epochs - alloc / chars.toDouble) < 1e-12)
    }
    // uncapped slices all sit AT the water level; capped ones below it
    val level = rows.map(_._4).max // the largest allocation is uncapped here
    val (capped, uncapped) = rows.partition(r => r._4 >= r._3.toDouble - 1e-9)
    assert(uncapped.nonEmpty, "params must exercise the level (en subsampled)")
    assert(capped.nonEmpty, "params must exercise the cap (scarce langs repeated)")
    uncapped.foreach(r => assert(math.abs(r._4 - level) < 1e-6,
      s"${r._1}: uncapped slices share one level"))
    capped.foreach(r => assert(r._3.toDouble <= level + 1e-6))
    // the dominant slice is subsampled below one epoch of repetition cap
    val en = rows.find(_._1 == "en").get
    assert(en._5 < epochCap, "en must be level-capped")
  }

  test("water-filling spends the budget with MULTIPLE uncapped slices (level = max valid)") {
    import spark.implicits._
    // capacities (x2 cap): [2, 8, 10, 10] with budget 1.5x total chars
    // = 22.5 < 30 = Sigma(c): true level lambda solves 2 + 3*lambda =
    // 22.5 -> 6.8333...; the k=3/k=4 candidates are valid but SMALLER,
    // so a min-over-valid level (the reviewed bug) underspends
    val docs = Seq(
      (1L, "a", "s", "aa", 1L), (2L, "b", "de", "bb", 4L),
      (3L, "c", "fr", "cc", 5L), (4L, "d", "es", "dd", 5L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Curation.mixtureWaterfill(docs, epochCap = 2, budgetEpochs = 1.5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val budget = rows.map(_._2).sum.toDouble * 1.5
    assert(math.abs(rows.map(_._4).sum - budget) < 1e-9,
      s"budget $budget must be spent exactly, got ${rows.map(_._4).sum}")
    val level = (budget - 2.0) / 3.0
    rows.foreach { case (lang, _, cap, alloc, _) =>
      assert(math.abs(alloc - math.min(cap.toDouble, level)) < 1e-9,
        s"$lang: alloc $alloc != min(cap=$cap, level=$level)")
    }
  }

  test("corpus fingerprint: order-insensitive, mergeable, change-sensitive") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    def bysource(df: org.apache.spark.sql.DataFrame) =
      Curation.corpusFingerprint(df).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), BigInt(r.getString(3)))).toMap
    val rows = bysource(docs)
    // partitioning/order cannot change the fingerprint
    val shuffled = bysource(docs.repartition(7).sortWithinPartitions(desc("doc_id")))
    assert(shuffled === rows)
    // shard fingerprints merge by xor/sum into the corpus fingerprint
    val whole = bysource(docs.withColumn("source", lit("all")))("all")
    assert(rows.values.map(_._2).reduce(_ ^ _) === whole._2)
    assert(rows.values.map(_._3).sum === whole._3)
    assert(rows.values.map(_._1).sum === whole._1)
    // a single edited document changes (at least) its source's folds
    val edited = bysource(docs.withColumn("text",
      when(col("doc_id") === 1L, concat(col("text"), lit("!"))).otherwise(col("text"))))
    val src = docs.filter(col("doc_id") === 1L).select("source").first().getString(0)
    assert(edited(src) !== rows(src))
    assert((edited - src) === (rows - src), "untouched sources keep their fingerprint")
  }

  test("filter funnel attributes each doc to its first failing gate") {
    val docs = Seq(
      // n_chars is the gate input (metadata column), text drives the rest
      (1L, "whatever tiny", "en", "s0", 10L),                      // 1_too_short
      (2L, "!!! ??? ...", "en", "s0", 200L),                       // 2_quality (punct)
      (3L, "the a of and to in", "zh", "s0", 200L),                // 3_lang_mismatch
      (4L, "the the the the the the the the", "en", "s0", 200L),   // 4_repetitive
      (5L, "the quick brown fox and a dog of note to win in rain", "en", "s0", 200L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Curation.filterFunnel(docs)
      .as[(String, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got === Map(
      "1_too_short" -> ((1L, 10L)),
      "2_quality" -> ((1L, 200L)),
      "3_lang_mismatch" -> ((1L, 200L)),
      "4_repetitive" -> ((1L, 200L)),
      "pass" -> ((1L, 200L))))
    // on the shared corpus the report partitions the documents exactly
    val full = Curation.qFilterFunnel(spark, "/root/testdata/sf0.01")
      .as[(String, Long, Long)].collect()
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    assert(full.map(_._2).sum === corpus.count())
    assert(full.map(_._3).sum === corpus.agg(sum("n_chars")).as[Long].head())
    // thresholds must discriminate: survivors exist and at least two
    // gates actually fire at sf0.01
    assert(full.exists(_._1 == "pass"))
    assert(full.count(_._1 != "pass") >= 2, full.mkString(", "))
  }

  test("shuffle shards partition the corpus and pin the shard-order endpoints") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
    val res = Curation.qShuffleShards(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    val all = docs.select("doc_id", "n_chars").as[(Long, Long)].collect()
    assert(res.map(_._2).sum === all.length.toLong)
    assert(res.map(_._3).sum === all.map(_._2).sum)
    // in-JVM reference shard assignment + hash-order endpoints
    val ref = all.map { case (id, nc) =>
      val h = md5hex(id.toString)
      (java.lang.Long.parseLong(h.substring(0, 8), 16) % 8, id, nc, h)
    }.groupBy(_._1)
    res.foreach { case (shard, n, sumChars, first, last) =>
      val grp = ref(shard)
      assert(n === grp.length.toLong, s"shard $shard")
      assert(sumChars === grp.map(_._3).sum)
      assert(first === grp.minBy(_._4)._2)
      assert(last === grp.maxBy(_._4)._2)
    }
  }
}
