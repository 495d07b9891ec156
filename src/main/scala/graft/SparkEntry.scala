package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Parity

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the parity surface (SURVEY §2 over the shared
  * test tables) and the extension surface (§2.11: dedup, similarity, text,
  * multimodal). `oracleSql` carries the DuckDB-equivalent SQL for every
  * query whose semantics ANSI SQL can express; the rest get rows-only
  * checks plus ScalaTest coverage.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The corpus-build funnel composes the engine's curation stages end to
    * end (dedup -> near-dedup -> decontaminate -> quality), so it
    * exercises the native expressions, the pair pipeline, and the gram
    * join in one smoke check.
    */
  def entry(spark: SparkSession): DataFrame =
    ext.Curation.qCorpusBuild(spark, "/root/testdata/sf0.001")

  def queryGroups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Parity.queries, Parity.oracles),
      (ext.Text.queries, ext.Text.oracles),
      (ext.Dedup.queries, ext.Dedup.oracles),
      (ext.SuffixDedup.queries, ext.SuffixDedup.oracles),
      (ext.Cluster.queries, ext.Cluster.oracles),
      (ext.Retrieval.queries, ext.Retrieval.oracles),
      (ext.Similarity.queries, ext.Similarity.oracles),
      (ext.Ivf.queries, ext.Ivf.oracles),
      (ext.Pq.queries, ext.Pq.oracles),
      (ext.Curation.queries, ext.Curation.oracles),
      (ext.Packing.queries, ext.Packing.oracles),
      (ext.Backfill.queries, ext.Backfill.oracles),
      (ext.Pca.queries, ext.Pca.oracles),
      (ext.Centroid.queries, ext.Centroid.oracles),
      (ext.Multimodal.queries, ext.Multimodal.oracles),
      (streaming.Streaming.queries, streaming.Streaming.oracles),
      (ops.Asof.queries, ops.Asof.oracles),
      (ops.IncrAgg.queries, ops.IncrAgg.oracles),
      (ops.RangeJoin.queries, ops.RangeJoin.oracles),
    )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryGroups.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    queryGroups.map(_._2).reduce(_ ++ _)
}
