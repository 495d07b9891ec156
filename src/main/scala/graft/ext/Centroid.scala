package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Per-cluster embedding centroids + semantic outlier scoring — the
  * embedding-space curation step that drops documents least like their
  * cluster before training. Demonstrates the TYPED custom-aggregation
  * surface (`org.apache.spark.sql.expressions.Aggregator` over
  * `groupByKey`, case-class/tuple encoders) that complements the
  * engine's Catalyst-level `TypedImperativeAggregate`
  * ([[graft.functions.MisraGriesAgg]]): same partial/merge/finish
  * shape, but type-checked end to end.
  *
  * Determinism contract: each element quantizes to floor(x·1e9) and
  * accumulates in EXACT integer arithmetic, so partial sums are
  * associative and the centroid is bit-identical under any partitioning
  * (FP summation order — the usual cross-engine/cross-run hazard — is
  * eliminated; ExtSpec asserts repartition invariance). The cosine
  * against the centroid follows the [[Dedup.dedupEmbedding]] parity
  * convention: double arithmetic, round(4), rank on the ROUNDED score
  * with vec_id tiebreak.
  *
  * 100 TB shape: one partial+final typed aggregation (state = dim longs
  * per group), centroids broadcast back, scoring is a pure map, bottom-k
  * per group is a windowed group-limit.
  */
object Centroid {

  /** Scaled-integer centroid accumulator over (label, embedding) pairs. */
  class CentroidAgg(dim: Int)
      extends Aggregator[(Int, Seq[Float]), (Array[Long], Long), Seq[Double]] {
    def zero: (Array[Long], Long) = (new Array[Long](dim), 0L)
    def reduce(b: (Array[Long], Long), in: (Int, Seq[Float])): (Array[Long], Long) = {
      val v = in._2
      var i = 0
      while (i < dim) { b._1(i) += math.floor(v(i).toDouble * 1e9).toLong; i += 1 }
      (b._1, b._2 + 1)
    }
    def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) = {
      var i = 0
      while (i < dim) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
    def finish(b: (Array[Long], Long)): Seq[Double] =
      b._1.toSeq.map(s => s.toDouble / 1e9 / b._2)
    def bufferEncoder: Encoder[(Array[Long], Long)] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  /** Per-label centroids as a DataFrame `(label, centroid: array<double>)`. */
  def centroids(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    emb.select(col("label").cast("int"), col("embedding")).as[(Int, Seq[Float])]
      .groupByKey(_._1)
      .agg(new CentroidAgg(dim).toColumn.name("centroid"))
      .toDF("label", "centroid")
  }

  /** Every vector scored by cosine against its label centroid (the
    * shared head of [[embedOutliers]] and [[coverageSample]]): centroid
    * table broadcast (bounded by cluster count), scoring a pure map.
    */
  private def scoredAgainstCentroid(emb: DataFrame): DataFrame = {
    val e = emb.withColumn("e", transform(col("embedding"), x => x.cast("double")))
    e.join(broadcast(centroids(emb)), "label")
      .withColumn("dot", aggregate(
        zip_with(col("e"), col("centroid"), (a, b) => a * b), lit(0.0), (acc, x) => acc + x))
      .withColumn("ne", sqrt(aggregate(col("e"), lit(0.0), (acc, x) => acc + x * x)))
      .withColumn("nc", sqrt(aggregate(col("centroid"), lit(0.0), (acc, x) => acc + x * x)))
      .withColumn("cos_centroid", round(col("dot") / (col("ne") * col("nc")), 4))
  }

  /** Bottom-k vectors per label by cosine to their label centroid. */
  def embedOutliers(emb: DataFrame, bottomK: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("label"))
      .orderBy(col("cos_centroid").asc, col("vec_id").asc)
    scoredAgainstCentroid(emb).withColumn("rn", row_number().over(w))
      .filter(col("rn") <= bottomK)
      .select(col("label"), col("vec_id"), col("cos_centroid"))
      .orderBy("label", "cos_centroid", "vec_id")
  }

  /** Cluster-coverage (prototype) sampling — the diversity-preserving
    * shrink step of an embedding-curated corpus (the allocation side of
    * the SemDeDup/diversity-sampling recipe): keep exactly ceil(frac·n)
    * vectors per cluster, most-central first, so every mode of the
    * distribution stays represented at proportional mass instead of the
    * head clusters swallowing a global top-k. Complements
    * [[embedOutliers]] (which removes the least-representative tail).
    *
    * Scale shape: scoring is a pure map behind a broadcast centroid
    * table; the per-cluster rank is one window keyed on the cluster id.
    * A giant cluster serializes its window task — same hot-key shape as
    * `Curation.capPerKey`, and the same fix applies (threshold-preselect
    * on the score quantile, rank the slice).
    */
  def coverageSample(emb: DataFrame, frac: Double): DataFrame = {
    val w = Window.partitionBy(col("label"))
      .orderBy(col("cos_centroid").desc, col("vec_id").asc)
    val n = Window.partitionBy(col("label"))
    scoredAgainstCentroid(emb)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_cluster", count(lit(1)).over(n))
      .filter(col("rn") <= ceil(lit(frac) * col("n_cluster")))
      .select(col("label"), col("vec_id"), col("cos_centroid"))
      .orderBy("label", "vec_id")
  }

  def qEmbedCoverage(spark: SparkSession, dir: String): DataFrame =
    coverageSample(Tables.embeddings(spark, dir), 0.2)

  def qEmbedOutliers(spark: SparkSession, dir: String): DataFrame =
    embedOutliers(Tables.embeddings(spark, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_outliers" -> (qEmbedOutliers _),
    "embed_coverage" -> (qEmbedCoverage _),
  )

  val oracles: Map[String, String] = Map(
    // floor(x·1e9) integer sums make the centroid engine-exact; the
    // cosine mirrors the dedup_embedding round(4) convention
    "embed_outliers" ->
      """WITH q AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
        |u AS (SELECT label, vec_id, generate_subscripts(e, 1) AS i, unnest(e) AS v FROM q),
        |c AS (SELECT label, i, sum(CAST(floor(v * 1000000000) AS BIGINT)) AS sc, count(*) AS n
        |      FROM u GROUP BY 1, 2),
        |cent AS (SELECT label, list(CAST(sc AS DOUBLE) / 1000000000 / n ORDER BY i) AS centroid
        |         FROM c GROUP BY label),
        |s AS (SELECT q.label, q.vec_id,
        |        round(list_cosine_similarity(q.e, cent.centroid), 4) AS cos_centroid
        |      FROM q JOIN cent USING (label)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY label ORDER BY cos_centroid, vec_id) AS rn
        |      FROM s)
        |SELECT label, vec_id, cos_centroid FROM r WHERE rn <= 5
        |ORDER BY label, cos_centroid, vec_id""".stripMargin,
    // same centroid/cosine CTE, proportional per-cluster prototype keep
    "embed_coverage" ->
      """WITH q AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
        |u AS (SELECT label, vec_id, generate_subscripts(e, 1) AS i, unnest(e) AS v FROM q),
        |c AS (SELECT label, i, sum(CAST(floor(v * 1000000000) AS BIGINT)) AS sc, count(*) AS n
        |      FROM u GROUP BY 1, 2),
        |cent AS (SELECT label, list(CAST(sc AS DOUBLE) / 1000000000 / n ORDER BY i) AS centroid
        |         FROM c GROUP BY label),
        |s AS (SELECT q.label, q.vec_id,
        |        round(list_cosine_similarity(q.e, cent.centroid), 4) AS cos_centroid
        |      FROM q JOIN cent USING (label)),
        |r AS (SELECT *,
        |        row_number() OVER (PARTITION BY label ORDER BY cos_centroid DESC, vec_id) AS rn,
        |        count(*) OVER (PARTITION BY label) AS n
        |      FROM s)
        |SELECT label, vec_id, cos_centroid FROM r WHERE rn <= ceil(0.2 * n)
        |ORDER BY label, vec_id""".stripMargin,
  )
}
