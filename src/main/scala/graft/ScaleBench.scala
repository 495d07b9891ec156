package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal: measure the heavy dedup/ANN/packing pipelines on a
  * deterministically expanded corpus (1x/3x/10x the sf0.1 tables) so the
  * 100 TB design claims rest on observed scaling curves, not plan shape
  * alone. Results land in BENCH_SCALE.md.
  *
  * Expansion preserves the WORKLOAD character rather than photocopying
  * rows:
  *
  *  - documents: replica k rotates the lowercase alphabet by k
  *    (`translate`), so every token — and therefore every shingle,
  *    minhash band, simhash vote, and suffix window — differs across
  *    replicas while the INTRA-replica near-duplicate structure is
  *    preserved exactly (length, whitespace, and duplicate topology are
  *    invariant under a letter substitution). Verbatim replication would
  *    instead give every document N-1 exact copies and blow candidate
  *    pair counts up quadratically — a different (and unrealistic)
  *    workload. True pair count scales exactly N-fold.
  *  - embeddings: replica k perturbs each component by a small
  *    k-and-position-keyed factor, so replicas are distinct points with
  *    the same distribution (no artificial exact-duplicate neighbors),
  *    and vec_ids shift by k*10M.
  *
  * Replicas are a UNION of per-k literal projections (translate needs a
  * literal mapping), which Spark plans as factor parallel scans of the
  * small source file — negligible against the pipelines being measured.
  */
object ScaleBench {

  private val Alpha = "abcdefghijklmnopqrstuvwxyz"

  def expandDocuments(spark: SparkSession, srcDir: String, factor: Int): DataFrame = {
    val src = Tables.documents(spark, srcDir)
    (0 until factor).map { k =>
      val rot = Alpha.drop(k % 26) + Alpha.take(k % 26)
      src.select(
        (col("doc_id") + lit(k.toLong * 10_000_000L)).as("doc_id"),
        translate(col("text"), Alpha, rot).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_.unionAll(_))
  }

  def expandEmbeddings(spark: SparkSession, srcDir: String, factor: Int): DataFrame = {
    val src = Tables.embeddings(spark, srcDir)
    (0 until factor).map { k =>
      src.select(
        (col("vec_id") + lit(k.toLong * 10_000_000L)).as("vec_id"),
        expr(s"transform(embedding, (x, i) -> x * (1.0f + cast(($k * 31 + i) % 7 - 3 as float) * 0.01f))")
          .as("embedding"),
        col("label"))
    }.reduce(_.unionAll(_))
  }

  /** Stage an expanded corpus under `outDir` with the testdata layout
    * (documents.parquet / embeddings.parquet directories), so every
    * `(spark, dir)` query entry runs against it unchanged.
    */
  def stage(spark: SparkSession, srcDir: String, outDir: String, factor: Int): Unit = {
    expandDocuments(spark, srcDir, factor)
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    expandEmbeddings(spark, srcDir, factor)
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  val HeavyQueries = Seq(
    "dedup_minhash", "dedup_suffix", "dedup_containment",
    "split_cluster_safe", "ann_ivfpq_search", "q_pack_sequences",
    "text_boilerplate", "ann_knn_graph",
    // per-key cap: expansion preserves the 20 sources, so each source
    // grows factor-fold — the hot-key shape the threshold path targets
    "q_domain_cap", "q_token_budget")

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "1,3,10")
      .split(",").map(_.trim.toInt).toSeq
    // Dev loop: restrict to a query subset (e.g. the steepest curves at
    // a larger factor without paying for the flat ones)
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY").map(_.split(",").toSet)
    val heavy = only.fold(HeavyQueries)(s => HeavyQueries.filter(s))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val root = java.nio.file.Files.createTempDirectory("graft_scale").toString
    val spark = GraftSession.builder("graft-scale")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup (classloading + codegen) on the smallest SF, untimed
    val warm = new java.io.File("/root/testdata/sf0.001")
    if (warm.isDirectory) heavy.foreach { q =>
      try SparkEntry.queries(q)(spark, warm.toString)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    val results = factors.map { f =>
      val dir = s"$root/x$f"
      stage(spark, srcDir, dir, f)
      val times = heavy.flatMap { q =>
        System.gc()
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
          Some(q -> (System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[scale x$f] $q FAILED: ${e.toString.take(200)}")
            None
        }
      }
      f -> times
    }
    val json = results.map { case (f, times) =>
      val qs = times.map { case (q, t) => f""""$q":$t%.2f""" }.mkString("{", ",", "}")
      s""""x$f":$qs"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale","unit":"sec","src":"$srcDir","factors":$json}""")
    spark.stop()
  }
}
