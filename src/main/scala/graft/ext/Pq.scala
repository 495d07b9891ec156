package graft.ext

import graft.Tables
import graft.functions.{PqEncode, VectorFns}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., TPAMI 2011) — the ANN family's
  * memory-compression serving path: each L2-normalized vector becomes M
  * byte-range codes (64 floats → 8 codes = 32× smaller payload), and
  * queries score the compressed corpus by Asymmetric Distance
  * Computation: a per-query lookup table of dot(query_sub, centroid) per
  * subspace, so scoring a candidate is M table lookups — no float vector
  * ever leaves storage.
  *
  * Scale shape: training is driver-side Lloyd's per subspace over a
  * BOUNDED lowest-id sample (deterministic, like [[Ivf.trainCentroids]]);
  * encoding is the compiled [[graft.functions.PqEncode]] expression — a
  * pure map, no shuffle; search broadcasts the per-query ADC tables
  * (query metadata, M·ksub doubles each) over one scan of the code
  * table, ranked by per-query window top-k. At 100 TB the code table is
  * the only thing read — the 32× read-volume cut is the point.
  */
object Pq {

  val M = 8
  val Ksub = 256
  val Iters = 5
  val SampleN = 4096

  private def normalize(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (n > 0) v.map(x => (x / n).toFloat) else v
  }

  /** Deterministic per-subspace k-means on the L2-normalized lowest-id
    * sample: evenly-spaced sample init, fixed iterations, argmin-L2
    * assignment with ties to the lower index (the same rule
    * [[graft.functions.PqEncode.Evaluator]] applies at serve time, so
    * train and serve agree). Empty clusters keep their centroid.
    */
  def trainCodebooks(
      emb: DataFrame, m: Int = M, ksub: Int = Ksub, iters: Int = Iters,
      sampleN: Int = SampleN): Seq[Seq[Seq[Float]]] = {
    val sample: Array[Array[Float]] = emb
      .orderBy("vec_id").limit(sampleN)
      .select("embedding")
      .collect().map(r => normalize(r.getSeq[Float](0).toArray))
    require(sample.nonEmpty, "cannot train on an empty corpus")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    (0 until m).map { s =>
      val subs = sample.map(_.slice(s * subDim, (s + 1) * subDim))
      var cents: Array[Array[Float]] =
        Array.tabulate(ksub)(i => subs(((i.toLong * subs.length) / ksub).toInt).clone())
      for (_ <- 0 until iters) {
        val sums = Array.ofDim[Double](ksub, subDim)
        val counts = new Array[Long](ksub)
        subs.foreach { v =>
          var best = 0
          var bestDist = Double.MaxValue
          var k = 0
          while (k < ksub) {
            var d = 0.0
            var j = 0
            while (j < subDim) { val t = v(j) - cents(k)(j); d += t * t; j += 1 }
            if (d < bestDist) { bestDist = d; best = k }
            k += 1
          }
          counts(best) += 1
          var j = 0
          while (j < subDim) { sums(best)(j) += v(j); j += 1 }
        }
        cents = Array.tabulate(ksub) { k =>
          if (counts(k) == 0) cents(k)
          else Array.tabulate(subDim)(j => (sums(k)(j) / counts(k)).toFloat)
        }
      }
      cents.toSeq.map(_.toSeq)
    }
  }

  /** L2-normalized copy of a float-array column (norm computed once). */
  private def normalizedCol(v: Column): Column = {
    val nrm = VectorFns.l2norm(v)
    transform(v, x => (x / nrm).cast("float"))
  }

  /** Corpus → (vec_id, codes): one compiled map over the scan. A
    * production format packs the M byte-range ints into a binary column;
    * the int array keeps the codes readable for the oracle/specs without
    * changing the plan shape.
    */
  def encodeCorpus(emb: DataFrame, codebooks: Seq[Seq[Seq[Float]]]): DataFrame =
    emb.select(col("vec_id"),
      PqEncode(normalizedCol(col("embedding")), codebooks).as("codes"))

  /** ADC search: per-query lookup tables (flat m·ksub doubles,
    * table[m·ksub + k] = dot(query_sub_m, centroid_mk)) are computed
    * driver-side from the BOUNDED query block and broadcast; scoring is
    * a codegen'd fold over the M codes — table lookups only. Exact
    * cosine of the reconstruction, ranked per query.
    */
  def search(
      corpusCodes: DataFrame, queryVecs: DataFrame,
      codebooks: Seq[Seq[Seq[Float]]], k: Int): DataFrame = {
    val spark = corpusCodes.sparkSession
    val m = codebooks.length
    val ksub = codebooks(0).length
    val queries: Array[(Long, Array[Float])] = queryVecs
      .select(col("query_id"), col("query_emb"))
      .collect().map(r => r.getLong(0) -> normalize(r.getSeq[Float](1).toArray))
    val tables = queries.map { case (qid, q) =>
      val subDim = q.length / m
      val t = new Array[Double](m * ksub)
      for (s <- 0 until m; c <- 0 until ksub) {
        val cent = codebooks(s)(c)
        var dot = 0.0
        var j = 0
        while (j < subDim) { dot += q(s * subDim + j).toDouble * cent(j); j += 1 }
        t(s * ksub + c) = dot
      }
      (qid, t.toSeq)
    }.toSeq
    import spark.implicits._
    val tablesDf = tables.toDF("query_id", "qtable")
    val adc = expr(s"aggregate(sequence(0, ${m - 1}), CAST(0.0 AS DOUBLE), " +
      s"(acc, s) -> acc + element_at(qtable, s * $ksub + element_at(codes, s + 1) + 1))")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_score").desc, col("vec_id"))
    corpusCodes.crossJoin(broadcast(tablesDf))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), round(adc, 4).as("adc_score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy("query_id", "rn")
  }

  /** Driver-contract entry: PQ-compressed top-5 for the first 5 vectors
    * (rows-only; learned codebooks have no SQL oracle — code shape,
    * planted-pair recall, and ADC faithfulness are asserted in ExtSpec).
    */
  def annPqSearch(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val codebooks = trainCodebooks(emb)
    val corpus = encodeCorpus(emb, codebooks)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_emb"))
    search(corpus, queries, codebooks, k = 5)
  }

  /** IVF+PQ (IVFADC, Jégou et al. §IV) — the composition that serves
    * billion-vector corpora: the IVF coarse quantizer restricts each
    * query to its nProbe nearest inverted lists (at 100 TB, with the
    * corpus hive-partitioned by list as [[Ivf.writeIvfPartitioned]]
    * lays it out, that is partition pruning), and PQ codes are all that
    * is scored inside a probed list — so a query reads nProbe/K of the
    * corpus at 1/32 the bytes per vector. Probes join on list_id
    * (broadcast — they are query metadata), each corpus vector lives in
    * exactly one list so no candidate dedup is needed, and ranking is
    * the same per-query ADC window top-k as the flat PQ search.
    */
  def ivfPqSearch(
      corpusCodes: DataFrame, queryVecs: DataFrame, centroids: Seq[Seq[Float]],
      codebooks: Seq[Seq[Seq[Float]]], k: Int, nProbe: Int = Ivf.NProbe): DataFrame = {
    val spark = corpusCodes.sparkSession
    val m = codebooks.length
    val ksub = codebooks(0).length
    val queries: Array[(Long, Array[Float])] = queryVecs
      .select(col("query_id"), col("query_emb"))
      .collect().map(r => r.getLong(0) -> normalize(r.getSeq[Float](1).toArray))
    // probe lists + ADC tables, both driver-computed from the bounded
    // query block (the corpus is never touched before the list join)
    val probeEval = new graft.functions.NearestCentroids.Evaluator(
      centroids.map(_.toArray).toArray, nProbe)
    val probes = queries.flatMap { case (qid, q) =>
      val lists = probeEval.eval(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(q))
      (0 until nProbe).map(i => (qid, lists.getInt(i)))
    }.toSeq
    val tables = queries.map { case (qid, q) =>
      val subDim = q.length / m
      val t = new Array[Double](m * ksub)
      for (s <- 0 until m; c <- 0 until ksub) {
        val cent = codebooks(s)(c)
        var dot = 0.0
        var j = 0
        while (j < subDim) { dot += q(s * subDim + j).toDouble * cent(j); j += 1 }
        t(s * ksub + c) = dot
      }
      (qid, t.toSeq)
    }.toSeq
    import spark.implicits._
    val probesDf = probes.toDF("query_id", "list_id")
    val tablesDf = tables.toDF("query_id", "qtable")
    val adc = expr(s"aggregate(sequence(0, ${m - 1}), CAST(0.0 AS DOUBLE), " +
      s"(acc, s) -> acc + element_at(qtable, s * $ksub + element_at(codes, s + 1) + 1))")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_score").desc, col("vec_id"))
    corpusCodes
      .join(broadcast(probesDf), Seq("list_id"))
      .join(broadcast(tablesDf), Seq("query_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("list_id"), round(adc, 4).as("adc_score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy("query_id", "rn")
  }

  /** Driver-contract entry: IVFADC top-5 for the first 5 vectors
    * (rows-only; ExtSpec asserts equality with the flat ADC search
    * restricted to the probed lists, and planted-neighbor recall).
    */
  def annIvfPqSearch(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cents = Ivf.trainCentroids(emb)
    val codebooks = trainCodebooks(emb)
    val corpus = Ivf.assignLists(emb, cents)
      .select(col("vec_id"), col("list_id"),
        PqEncode(normalizedCol(col("embedding")), codebooks).as("codes"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_emb"))
    ivfPqSearch(corpus, queries, cents, codebooks, k = 5)
  }

  /** Code-space occupancy (rows-only): distinct codes used per subspace —
    * the quantity that says whether the codebook is actually spreading
    * the corpus (a collapsed subspace means wasted bits).
    */
  def annPqOccupancy(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val corpus = encodeCorpus(emb, trainCodebooks(emb))
    corpus.select(posexplode(col("codes")).as(Seq("subspace", "code")))
      .groupBy(col("subspace"))
      .agg(countDistinct(col("code")).as("codes_used"), count(lit(1)).as("n"))
      .orderBy("subspace")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_pq_search" -> (annPqSearch _),
    "ann_pq_occupancy" -> (annPqOccupancy _),
    "ann_ivfpq_search" -> (annIvfPqSearch _),
  )

  val oracles: Map[String, String] = Map.empty
}
