package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY §2.11): image/audio/video payloads
  * modeled as opaque `binary` columns plus typed metadata, with
  * decode / feature-extract / frame-sample implemented as per-partition
  * batch transforms over a typed Dataset.
  *
  * The actual media decode is STUBBED (no codec libraries in this
  * environment) with a deterministic fake — [[MediaCodec.decodeStub]] —
  * but the Spark-side plumbing is real and tested: binary payload column,
  * metadata struct, partition-batched processing (mapPartitions ≈ the
  * batch shape a vectorized decode UDF needs), and a feature schema that
  * downstream similarity ops consume. At 100 TB this stage is a pure map
  * over the scan — no shuffle — and partition sizing is governed by
  * `spark.sql.files.maxPartitionBytes` against media blob sizes.
  */
object Multimodal {

  /** Typed rows: payload + metadata in, fixed-width features out. */
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Int,
      n_frames: Int, features: Array[Float])

  /** Deterministic stand-in for the real decoder: byte-histogram features
    * + a fake frame count derived from payload length. A production build
    * replaces ONLY this object (e.g. JNI image/audio codecs); the
    * surrounding Spark plumbing is unchanged.
    */
  object MediaCodec {
    val FeatureDim = 16
    def decodeStub(row: MediaRow): MediaFeatures = {
      val hist = new Array[Float](FeatureDim)
      var i = 0
      while (i < row.payload.length) {
        hist((row.payload(i) & 0xff) % FeatureDim) += 1f
        i += 1
      }
      val n = math.max(row.payload.length, 1)
      var j = 0
      while (j < FeatureDim) { hist(j) /= n; j += 1 }
      val frames = row.media_type match {
        case "video" => math.max(row.payload.length / 64, 1)
        case "audio" => math.max(row.payload.length / 256, 1)
        case _       => 1
      }
      MediaFeatures(row.doc_id, row.media_type, row.payload.length, frames, hist)
    }

    /** Frame sampling stub: every k-th 16-byte slice of the payload. */
    def sampleFrames(payload: Array[Byte], everyK: Int): Seq[Array[Byte]] =
      payload.grouped(16).zipWithIndex
        .collect { case (b, i) if i % everyK == 0 => b }.toSeq
  }

  /** The media table: documents' text bytes standing in for media blobs,
    * with a deterministic modality assignment. Binary column + metadata.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      to_binary(col("text"), lit("utf-8")).as("payload"),
      struct(
        octet_length(col("text")).as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** Partition-batched decode: one decoder instance per partition (the
    * expensive-initialization shape), rows processed as an iterator batch.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions { batch =>
        // per-partition decoder init would go here
        batch.map(MediaCodec.decodeStub)
      }
  }

  /** Query entry: decoded feature table (rows-only; binary+mapPartitions
    * has no SQL oracle).
    */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(spark, mediaTable(spark, dir))
      .toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"), col("n_frames"),
        round(element_at(col("features"), 1).cast("double"), 4).as("f0"))
      .orderBy("doc_id")
  }

  /** Query entry: metadata projection — the SQL-expressible face of the
    * media table (payload length + modality), oracle-checked.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("doc_id"), col("media_type"),
        octet_length(col("payload")).as("n_bytes"),
        col("meta.origin").as("origin"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> (multimodalFeatures _),
    "multimodal_meta" -> (multimodalMeta _),
  )

  val oracles: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id,
        |       CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |       source AS origin
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
