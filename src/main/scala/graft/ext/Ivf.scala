package graft.ext

import graft.Tables
import graft.functions.{NearestCentroids, VectorFns}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the learned-centroid
  * complement to the data-independent SRP-LSH path in [[Similarity]]:
  * a coarse quantizer (k-means centroids) is trained on a bounded sample,
  * the corpus is assigned to its nearest centroid's inverted list once at
  * ingest (a pure compiled map — [[graft.functions.NearestCentroids]]),
  * and a query scans only its nProbe nearest lists, re-ranked by exact
  * cosine.
  *
  * 100 TB shape: training touches a fixed-size sample (driver Lloyd's over
  * ≤4096 vectors — the model is k·dim floats); assignment is shuffle-free;
  * at serving time the corpus is written partitioned by `list_id`
  * ([[writeIvfPartitioned]] / [[ivfSearchPartitioned]] — same layout
  * discipline as [[Similarity.writeBucketedCorpus]]) so a probe
  * reads nProbe/k of the data. Expected recall is tunable via nProbe;
  * candidates per query ≈ nProbe·N/k versus LSH's occupancy-dependent
  * buckets — IVF adapts to the data distribution where SRP hyperplanes
  * cannot.
  */
object Ivf {

  val K = 16
  val Iters = 5
  val SampleN = 4096
  val NProbe = 4

  /** Deterministic k-means: the sample is the lowest-id vectors (stable
    * across runs and partitionings), init is evenly-spaced sample vectors,
    * and Lloyd's runs a fixed number of iterations on the driver.
    * Assignment during training uses the same centroid-normalized cosine
    * as the serving-path expression, so train and serve agree.
    */
  def trainCentroids(
      emb: DataFrame, k: Int = K, iters: Int = Iters, sampleN: Int = SampleN)
      : Seq[Seq[Float]] = {
    val sample: Array[Array[Float]] = emb
      .orderBy("vec_id").limit(sampleN)
      .select("embedding")
      .collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "cannot train on an empty corpus")
    val dim = sample(0).length
    var cents: Array[Array[Float]] =
      Array.tabulate(k)(i => sample(((i.toLong * sample.length) / k).toInt).clone())
    for (_ <- 0 until iters) {
      val eval = new NearestCentroids.Evaluator(cents, 1)
      val sums = Array.ofDim[Double](k, dim)
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val c = eval.eval(new org.apache.spark.sql.catalyst.util.GenericArrayData(v)).getInt(0)
        counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += v(j); j += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c) // empty list keeps its centroid
        else Array.tabulate(dim)(j => (sums(c)(j) / counts(c)).toFloat)
      }
    }
    cents.toSeq.map(_.toSeq)
  }

  /** Ingest-time assignment: one compiled map, no shuffle. */
  def assignLists(emb: DataFrame, centroids: Seq[Seq[Float]]): DataFrame =
    emb.withColumn("list_id",
      element_at(NearestCentroids(col("embedding"), centroids, 1), 1))

  /** Probe + exact re-rank: queries explode to their nProbe nearest lists,
    * the corpus is hash-joined on list_id (probes broadcast — they are
    * query metadata), and candidates are re-ranked by exact cosine.
    */
  def search(
      corpus: DataFrame, queryVecs: DataFrame, centroids: Seq[Seq[Float]],
      k: Int, nProbe: Int = NProbe): DataFrame = {
    val assigned = assignLists(corpus, centroids)
      .select(col("vec_id"), col("embedding"), col("list_id"),
        VectorFns.l2norm(col("embedding")).as("nrm"))
    val probes = queryVecs.select(
      col("query_id"), col("query_emb"),
      VectorFns.l2norm(col("query_emb")).as("qnrm"),
      explode(NearestCentroids(col("query_emb"), centroids, nProbe)).as("list_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(VectorFns.dotProduct(col("embedding"), col("query_emb")) / (col("nrm") * col("qnrm")), 4)
          .as("cosine"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy("query_id", "rn")
  }

  /** The 100 TB serving layout: corpus written hive-partitioned by
    * inverted list, with the nearest-centroid assignment and the vector
    * norm computed ONCE at ingest — the learned-quantizer twin of
    * [[Similarity.writeBucketedCorpus]]. A probe then reads nProbe of k
    * directories instead of the corpus.
    */
  def writeIvfPartitioned(emb: DataFrame, centroids: Seq[Seq[Float]], path: String): Unit =
    assignLists(emb, centroids)
      .select(col("vec_id"), col("embedding"),
        VectorFns.l2norm(col("embedding")).as("nrm"), col("list_id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("list_id").parquet(path)

  /** Probe + exact re-rank against the [[writeIvfPartitioned]] layout.
    * The probe list ids (nProbe ints per query — query metadata, not
    * corpus data) are collected driver-side and become a STATIC partition
    * filter, so the scan's PartitionFilters prune the read to the probed
    * inverted-list directories at file-listing time (asserted in
    * ExtSpec) — the same point-lookup shape as
    * [[Similarity.annLshSearchPartitioned]].
    */
  def ivfSearchPartitioned(
      spark: SparkSession, path: String, queryVecs: DataFrame,
      centroids: Seq[Seq[Float]], k: Int, nProbe: Int = NProbe): DataFrame = {
    val probes = queryVecs.select(
      col("query_id"), col("query_emb"),
      VectorFns.l2norm(col("query_emb")).as("qnrm"),
      explode(NearestCentroids(col("query_emb"), centroids, nProbe)).as("list_id"))
    val probeKeys = probes.select("list_id").distinct().collect().map(_.getInt(0)).toSeq
    val corpus = spark.read.parquet(path).filter(col("list_id").isin(probeKeys: _*))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    corpus.join(broadcast(probes), Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(VectorFns.dotProduct(col("embedding"), col("query_emb")) / (col("nrm") * col("qnrm")), 4)
          .as("cosine"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy("query_id", "rn")
  }

  /** Driver-contract entry: IVF top-5 for the first 5 vectors (rows-only;
    * learned centroids have no SQL oracle — recall and exact-scoring
    * properties are asserted in ExtSpec).
    */
  def annIvfSearch(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val centroids = trainCentroids(emb)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_emb"))
    search(emb, queries, centroids, k = 5)
  }

  /** Inverted-list occupancy (rows-only): how balanced the learned
    * partition is — the quantity that determines probe cost.
    */
  def annIvfLists(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    assignLists(emb, trainCentroids(emb))
      .groupBy(col("list_id"))
      .agg(count(lit(1)).as("list_size"))
      .orderBy("list_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_ivf_search" -> (annIvfSearch _),
    "ann_ivf_lists" -> (annIvfLists _),
  )

  val oracles: Map[String, String] = Map.empty
}
