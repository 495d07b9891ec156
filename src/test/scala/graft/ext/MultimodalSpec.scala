package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Multimodal plumbing: binary payload column, partition-batched stub
  * decode, deterministic features.
  */
class MultimodalSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  test("media table carries a real binary payload + typed metadata") {
    val m = Multimodal.mediaTable(spark, dir)
    assert(m.schema("payload").dataType === BinaryType)
    val row = m.filter(col("doc_id") === 0).first()
    val payload = row.getAs[Array[Byte]]("payload")
    assert(payload.length === row.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("n_bytes"))
    assert(Set("image", "audio", "video").contains(row.getAs[String]("media_type")))
  }

  test("stub decode produces normalized histogram features per row") {
    val f = Multimodal.decodeFeatures(spark, Multimodal.mediaTable(spark, dir)).collect()
    assert(f.length === 500)
    f.take(20).foreach { r =>
      assert(r.features.length === Multimodal.MediaCodec.FeatureDim)
      assert(math.abs(r.features.sum - 1.0f) < 1e-3, "histogram should normalize")
      assert(r.n_frames >= 1)
    }
    // determinism
    val again = Multimodal.decodeFeatures(spark, Multimodal.mediaTable(spark, dir)).collect()
    assert(f.map(_.doc_id).sorted.toSeq === again.map(_.doc_id).sorted.toSeq)
  }

  test("frame sampling keeps every k-th frame") {
    val frames = Multimodal.MediaCodec.sampleFrames(Array.fill[Byte](160)(1), 2)
    assert(frames.length === 5) // 10 chunks of 16 bytes, every 2nd
  }
}
