package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed PCA over the embedding corpus — the top principal
  * direction of the centered covariance, computed from a Gram matrix
  * accumulated in ONE corpus pass and an eigen solve that never leaves
  * the driver. The retrieval-preprocessing use: embedding sets from
  * contrastive encoders carry a dominant "hubness" direction; measuring
  * it (and projecting it out) is standard whitening-lite before cosine
  * retrieval.
  *
  * Scale shape: each partition folds its rows into a local d×(d+3)/2-
  * double accumulator (count, per-dim sum, upper-triangle Gram) inside
  * `mapPartitions` — one of the few places imperative per-partition
  * code beats the relational form, because the alternative explodes
  * d(d+1)/2 rows per vector into a shuffle. The driver collects one
  * 33 KB accumulator per partition (d = 64), forms the centered
  * covariance C = G/n − μμᵀ, and power-iterates to machine precision in
  * microseconds. ONE pass over the corpus, ZERO shuffles, driver state
  * O(d²) — the right trade until d reaches the tens of thousands, where
  * the matrix-free per-pass iteration (same aggregation, v-weighted)
  * takes over. Deterministic: fixed init, fixed in-partition fold order,
  * partition partials reduced in partition order on the driver.
  */
object Pca {

  private def embDouble(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  private def litArray(v: Array[Double]) = array(v.map(lit): _*)

  /** Σ_j e_j·v_j over double arrays — the projection map. */
  private def dotD(e: org.apache.spark.sql.Column, v: Array[Double]) =
    aggregate(zip_with(e, litArray(v), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** One-pass (count, Σe, upper-triangle Gram) accumulation. */
  private def moments(e: DataFrame): (Double, Array[Double], Array[Double]) = {
    import e.sparkSession.implicits._
    val d = e.head().getSeq[Double](1).size
    val tri = d * (d + 1) / 2
    val partials = e.select(col("e")).as[Seq[Double]]
      .mapPartitions { it =>
        val acc = new Array[Double](1 + d + tri)
        it.foreach { row =>
          val v = row.toArray
          acc(0) += 1.0
          var j = 0; var t = 0
          while (j < d) {
            acc(1 + j) += v(j)
            var k = j
            while (k < d) { acc(1 + d + t) += v(j) * v(k); k += 1; t += 1 }
            j += 1
          }
        }
        Iterator.single(acc)
      }.collect()
    val tot = new Array[Double](1 + d + tri)
    partials.foreach { p => var i = 0; while (i < tot.length) { tot(i) += p(i); i += 1 } }
    (tot(0), tot.slice(1, 1 + d), tot.slice(1 + d, 1 + d + tri))
  }

  /** Per-dimension mean of the corpus (from the one-pass moments). */
  def meanVector(emb: DataFrame): Array[Double] = {
    val (n, s, _) = moments(embDouble(emb))
    s.map(_ / n)
  }

  /** Top principal direction and eigenvalue of the centered covariance
    * (1/n)·Σ(e−μ)(e−μ)ᵀ. Returns (direction, eigenvalue, μ).
    */
  def topComponent(emb: DataFrame, iters: Int = 10000): (Array[Double], Double, Array[Double]) = {
    val (comps, mu, _) = topComponents(emb, 1, iters)
    (comps.head._1, comps.head._2, mu)
  }

  /** Top-k eigenpairs of the centered covariance, plus μ and trace(C)
    * (the total variance, for explained-variance ratios). The corpus is
    * touched ONCE (the moments pass); components come from driver-side
    * power iteration with deflation C ← C − λvvᵀ — at d=64 each extra
    * component is microseconds, not another corpus scan.
    */
  def topComponents(emb: DataFrame, k: Int, iters: Int = 10000)
      : (Seq[(Array[Double], Double)], Array[Double], Double) = {
    val (n, sums, gTri) = moments(embDouble(emb))
    val d = sums.length
    val mu = sums.map(_ / n)
    // dense centered covariance from the upper triangle
    val c = Array.ofDim[Double](d, d)
    var j = 0; var t = 0
    while (j < d) {
      var k2 = j
      while (k2 < d) {
        val v = gTri(t) / n - mu(j) * mu(k2)
        c(j)(k2) = v; c(k2)(j) = v
        k2 += 1; t += 1
      }
      j += 1
    }
    val trace = (0 until d).map(i => c(i)(i)).sum
    val comps = (1 to k).map { _ =>
      // driver power iteration to machine precision (deterministic init
      // with an index tilt so no coordinate symmetry traps it)
      var v = Array.tabulate(d)(i => 1.0 + 1e-3 * i)
      val norm = math.sqrt(v.map(x => x * x).sum)
      v = v.map(_ / norm)
      var lambda = 0.0
      var it = 0
      var moved = Double.MaxValue
      while (it < iters && moved > 1e-15) {
        val w = Array.tabulate(d)(i => {
          var acc = 0.0; var k2 = 0
          while (k2 < d) { acc += c(i)(k2) * v(k2); k2 += 1 }
          acc
        })
        val nrm = math.sqrt(w.map(x => x * x).sum)
        val nv = w.map(_ / nrm)
        moved = v.indices.map(i => math.abs(nv(i) - v(i))).max
        v = nv; lambda = nrm
        it += 1
      }
      // deflate: C <- C - lambda v v^T
      var a = 0
      while (a < d) {
        var b = 0
        while (b < d) { c(a)(b) -= lambda * v(a) * v(b); b += 1 }
        a += 1
      }
      (v, lambda)
    }
    (comps, mu, trace)
  }

  /** The top-3 directions, one row per (component, dimension) — the
    * audit artifact (which dims each dominant component loads on) with
    * eigenvalue and explained-variance ratio.
    */
  def qPcaTop(spark: SparkSession, dir: String): DataFrame = {
    val (comps, _, trace) = topComponents(Tables.embeddings(spark, dir), 3)
    import spark.implicits._
    comps.zipWithIndex.flatMap { case ((v, lambda), c) =>
      v.zipWithIndex.map { case (x, j) =>
        (c + 1, j, x, lambda, math.rint(lambda / trace * 10000) / 10000)
      }
    }.toDF("component", "dim", "loading", "eigenvalue", "var_ratio")
      .orderBy("component", "dim")
  }

  /** Per-vector projection onto the top component — the outlier /
    * hubness score a curation pass thresholds on. Pure map over the
    * corpus once the (2d + 1)-double driver state exists.
    */
  def pcaScores(emb: DataFrame, iters: Int = 10000): DataFrame = {
    val (v, _, mu) = topComponent(emb, iters)
    val muDotV = mu.indices.map(j => mu(j) * v(j)).sum
    embDouble(emb)
      .select(col("vec_id"),
        round(dotD(col("e"), v) - lit(muDotV), 4).as("pc1_score"))
      .orderBy("vec_id")
  }

  def qPcaScores(spark: SparkSession, dir: String): DataFrame =
    pcaScores(Tables.embeddings(spark, dir))

  /** Whitened-cosine top-k: cosine over the residuals after projecting
    * out the dominant component — the hubness correction that keeps one
    * shared direction from dominating every similarity. No residual
    * vector is ever materialized: with r_q = (q−μ) − s_q·v precomputed
    * on the driver (r_q ⊥ v), the per-row algebra reduces every
    * residual dot/norm to dot products against three constant vectors
    * (r_q, μ, v) plus the row's self-dot — a pure map over one corpus
    * scan, lowered to TakeOrderedAndProject exactly like `ann_topk`.
    */
  def whitenedTopk(emb: DataFrame, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val (v, _, mu) = topComponent(emb)
    val d = mu.length
    val q = embDouble(emb).filter(col("vec_id") === queryId)
      .head().getSeq[Double](1).toArray
    val qc = Array.tabulate(d)(j => q(j) - mu(j))
    val sq = qc.indices.map(j => qc(j) * v(j)).sum
    val rq = Array.tabulate(d)(j => qc(j) - sq * v(j))
    val rqNorm = math.sqrt(rq.map(x => x * x).sum)
    val muDotV = mu.indices.map(j => mu(j) * v(j)).sum
    val muDotRq = mu.indices.map(j => mu(j) * rq(j)).sum
    val muDotMu = mu.map(x => x * x).sum
    embDouble(emb)
      .filter(col("vec_id") =!= queryId)
      .withColumn("s", dotD(col("e"), v) - lit(muDotV))
      .withColumn("num", dotD(col("e"), rq) - lit(muDotRq))
      .withColumn("rn2",
        dotD(col("e"), mu) * lit(-2.0) + dotD2(col("e")) + lit(muDotMu)
          - col("s") * col("s"))
      .filter(col("rn2") > 0)
      .select(col("vec_id"),
        round(col("num") / (sqrt(col("rn2")) * lit(rqNorm)), 4).as("wcos"))
      .orderBy(col("wcos").desc, col("vec_id"))
      .limit(k)
  }

  /** Row self-dot Σ e_j², same HOF shape as [[dotD]]. */
  private def dotD2(e: org.apache.spark.sql.Column) =
    aggregate(transform(e, x => x * x), lit(0.0), (acc, x) => acc + x)

  def qAnnWhitened(spark: SparkSession, dir: String): DataFrame =
    whitenedTopk(Tables.embeddings(spark, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_pca_top" -> (qPcaTop _),
    "embed_pca_scores" -> (qPcaScores _),
    "ann_topk_whitened" -> (qAnnWhitened _),
  )

  // no ANSI oracle: eigenvectors of an iterative solver are not
  // SQL-expressible — PcaSpec checks the eigenpair property (C·v ≈ λ·v)
  // against driver-side exact arithmetic instead
  val oracles: Map[String, String] = Map.empty
}
