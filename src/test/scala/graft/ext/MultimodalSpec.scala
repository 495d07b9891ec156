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

  test("BMP golden fixture decodes byte-exactly") {
    import Multimodal.MediaCodec
    // 2x2 image: red, green / blue, white (row-major RGB)
    val rgb = Array[Int](
      255, 0, 0,   0, 255, 0,
      0, 0, 255,   255, 255, 255).map(_.toByte)
    val bmp = MediaCodec.encodeBmp(2, 2, rgb)
    // golden header: 'BM', file size 54+16 (2 rows of stride 8), offset 54,
    // BITMAPINFOHEADER 40, 2x2, 1 plane, 24 bpp, uncompressed
    val goldenHeader = Array[Int](
      'B', 'M', 70, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0,
      40, 0, 0, 0, 2, 0, 0, 0, 2, 0, 0, 0, 1, 0, 24, 0, 0, 0, 0, 0,
      16, 0, 0, 0, 19, 11, 0, 0, 19, 11, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
      .map(_.toByte)
    assert(bmp.take(54).toSeq === goldenHeader.toSeq)
    // pixel data: bottom-up BGR — bottom row (blue, white) first, padded to 8
    val goldenPixels = Array[Int](
      255, 0, 0,  255, 255, 255,  0, 0,
      0, 0, 255,  0, 255, 0,      0, 0).map(_.toByte)
    assert(bmp.drop(54).toSeq === goldenPixels.toSeq)

    val img = MediaCodec.decodeBmp(bmp).get
    assert(img.width === 2 && img.height === 2)
    // channel means over {red, green, blue, white} / 255
    assert(math.abs(img.meanR - 2.0 / 4) < 1e-9)
    assert(math.abs(img.meanG - 2.0 / 4) < 1e-9)
    assert(math.abs(img.meanB - 2.0 / 4) < 1e-9)
  }

  test("WAV golden fixture decodes byte-exactly") {
    import Multimodal.MediaCodec
    val samples = Array[Short](0, 16384, -16384, 32767)
    val wav = MediaCodec.encodeWav(samples, 8000)
    // golden header: RIFF size 36+8, WAVE, fmt(16) PCM mono 8kHz 16-bit, data(8)
    val goldenHeader = Array[Int](
      'R', 'I', 'F', 'F', 44, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0, 1, 0, 1, 0, 0x40, 0x1f, 0, 0,
      0x80, 0x3e, 0, 0, 2, 0, 16, 0, 'd', 'a', 't', 'a', 8, 0, 0, 0)
      .map(_.toByte)
    assert(wav.take(44).toSeq === goldenHeader.toSeq)

    val audio = MediaCodec.decodeWav(wav).get
    assert(audio.sampleRate === 8000)
    assert(audio.nSamples === 4)
    val xs = samples.map(_ / 32768.0)
    assert(math.abs(audio.meanAbs - xs.map(math.abs).sum / 4) < 1e-12)
    assert(math.abs(audio.rms - math.sqrt(xs.map(x => x * x).sum / 4)) < 1e-12)
  }

  test("PNG golden fixture decodes byte-exactly via ImageIO") {
    import Multimodal.{MediaCodec, MediaRow}
    // same 2x2 golden image as the BMP fixture: red, green / blue, white.
    // PNG is lossless, so the decoded pixels — and therefore the channel
    // means — must be EXACTLY the source values, not approximations.
    val rgb = Array[Int](
      255, 0, 0,   0, 255, 0,
      0, 0, 255,   255, 255, 255).map(_.toByte)
    val png = MediaCodec.encodePng(2, 2, rgb)
    // pinned container bytes: PNG signature + IHDR declaring 2x2, 8-bit
    assert(png.take(8).toSeq === Seq(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte))
    assert(new String(png.slice(12, 16), "US-ASCII") === "IHDR")
    assert(java.nio.ByteBuffer.wrap(png, 16, 8).getInt === 2) // width
    assert(java.nio.ByteBuffer.wrap(png, 20, 4).getInt === 2) // height
    assert(png(24) === 8.toByte) // bit depth

    val img = MediaCodec.decodePng(png).get
    assert(img.width === 2 && img.height === 2)
    assert(img.meanR === 2.0 / 4 && img.meanG === 2.0 / 4 && img.meanB === 2.0 / 4)

    // dispatch: a PNG payload takes the ImageIO path, not the stub
    val feats = MediaCodec.decode(MediaRow(7L, "image", png))
    assert(feats.features(0) === 2f && feats.features(1) === 2f && feats.n_frames === 1)
    // non-PNG magic and truncated payloads fall through cleanly
    assert(MediaCodec.decodePng("not a png".getBytes).isEmpty)
    assert(MediaCodec.decodePng(png.take(10)).isEmpty)
  }

  test("JPEG golden fixture decodes within tolerance bounds via ImageIO") {
    import Multimodal.{MediaCodec, MediaRow}
    // JPEG is lossy AND its IDCT varies across JDK builds, so this
    // fixture pins TOLERANCES, not bytes: a flat mid-gray 16x16 image
    // (a single DC coefficient — the best-conditioned JPEG case) must
    // decode to channel means within 2/255 of the source, and a
    // gradient image within 0.02 (quality-0.9 quantization noise).
    val gray = Array.fill(16 * 16 * 3)(128.toByte)
    val jpg = MediaCodec.encodeJpeg(16, 16, gray)
    // container magic: SOI + marker
    assert((jpg(0) & 0xff) === 0xff && (jpg(1) & 0xff) === 0xd8 && (jpg(2) & 0xff) === 0xff)
    val img = MediaCodec.decodeJpeg(jpg).get
    assert(img.width === 16 && img.height === 16)
    val want = 128.0 / 255.0
    for (m <- Seq(img.meanR, img.meanG, img.meanB))
      assert(math.abs(m - want) <= 2.0 / 255.0, s"mean $m vs $want")
    // quantized to the 0.01 grid (the cross-build determinism contract)
    for (m <- Seq(img.meanR, img.meanG, img.meanB))
      assert(m === math.rint(m * 100) / 100)

    val grad = Array.tabulate(16 * 16 * 3)(i => (i % 256).toByte)
    val srcMean = Array(0, 1, 2).map { ch =>
      (0 until 16 * 16).map(p => grad(p * 3 + ch) & 0xff).sum / (256 * 255.0)
    }
    val gimg = MediaCodec.decodeJpeg(MediaCodec.encodeJpeg(16, 16, grad)).get
    assert(math.abs(gimg.meanR - srcMean(0)) <= 0.02, s"${gimg.meanR} vs ${srcMean(0)}")
    assert(math.abs(gimg.meanG - srcMean(1)) <= 0.02, s"${gimg.meanG} vs ${srcMean(1)}")
    assert(math.abs(gimg.meanB - srcMean(2)) <= 0.02, s"${gimg.meanB} vs ${srcMean(2)}")

    // same-JVM determinism: two decodes agree bit-for-bit
    assert(MediaCodec.decodeJpeg(jpg).get === img)
    // dispatch: a JPEG payload takes the ImageIO path, not the stub
    val feats = MediaCodec.decode(MediaRow(11L, "image", jpg))
    assert(feats.features(0) === 16f && feats.features(1) === 16f && feats.n_frames === 1)
    // non-JPEG magic and truncated payloads fall through cleanly
    assert(MediaCodec.decodeJpeg("not a jpeg".getBytes).isEmpty)
    assert(MediaCodec.decodeJpeg(jpg.take(2)).isEmpty)
  }

  test("BMP resize samples nearest pixels and round-trips through the codec") {
    import Multimodal.MediaCodec
    // 4x4 quadrant image: TL red, TR green, BL blue, BR white
    val rgb = new Array[Byte](4 * 4 * 3)
    for (y <- 0 until 4; x <- 0 until 4) {
      val o = (y * 4 + x) * 3
      val c: (Int, Int, Int) =
        if (y < 2 && x < 2) (255, 0, 0)
        else if (y < 2) (0, 255, 0)
        else if (x < 2) (0, 0, 255)
        else (255, 255, 255)
      rgb(o) = c._1.toByte; rgb(o + 1) = c._2.toByte; rgb(o + 2) = c._3.toByte
    }
    val bmp = MediaCodec.encodeBmp(4, 4, rgb)
    val resized = MediaCodec.resizeBmp(bmp, 2, 2).get
    val (w, h, out) = MediaCodec.decodeBmpPixels(resized).get
    assert(w === 2 && h === 2)
    // 2x2 nearest-neighbor keeps one pixel per quadrant
    assert(out.toSeq.map(_ & 0xff) === Seq(
      255, 0, 0,   0, 255, 0,
      0, 0, 255,   255, 255, 255))
    // upscale is lossless for a solid region; non-BMP input is None
    assert(MediaCodec.resizeBmp(bmp, 8, 8).flatMap(MediaCodec.decodeBmp).get.width === 8)
    assert(MediaCodec.resizeBmp("nope".getBytes, 2, 2).isEmpty)
  }

  test("decode dispatches on magic bytes and falls back to the stub") {
    import Multimodal.{MediaCodec, MediaRow}
    val bmpRow = MediaRow(1L, "image", MediaCodec.encodeBmp(4, 3, Array.fill[Byte](36)(10)))
    val got = MediaCodec.decode(bmpRow)
    assert(got.features(0) === 4f && got.features(1) === 3f && got.n_frames === 1)
    val wavRow = MediaRow(2L, "audio", MediaCodec.encodeWav(Array.fill[Short](2048)(100), 16000))
    val wa = MediaCodec.decode(wavRow)
    assert(wa.features(0) === 16000f && wa.features(1) === 2048f && wa.n_frames === 2)
    // non-media bytes: histogram stub, unchanged semantics
    def same(a: Multimodal.MediaFeatures, b: Multimodal.MediaFeatures): Boolean =
      a.doc_id == b.doc_id && a.n_frames == b.n_frames &&
        a.n_bytes == b.n_bytes && a.features.toSeq == b.features.toSeq
    val textRow = MediaRow(3L, "text", "just some text".getBytes("UTF-8"))
    assert(same(MediaCodec.decode(textRow), MediaCodec.decodeStub(textRow)))
    // truncated BMP header must not throw — falls back
    val broken = MediaRow(4L, "image", Array[Byte]('B', 'M', 1, 2, 3))
    assert(same(MediaCodec.decode(broken), MediaCodec.decodeStub(broken)))
  }

  test("multimodal_decode query parses real WAV/BMP/PNG payloads at scale shape") {
    val df = Multimodal.multimodalDecode(spark, dir)
    val rows = df.collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % 3 == 0) { // audio: sampleRate, nSamples
        assert(r.getString(1) === "audio")
        assert(r.getDouble(4) === 16000.0 && r.getDouble(5) === 512.0)
      } else if (id % 3 == 1) { // BMP image: width, height
        assert(r.getString(1) === "image")
        assert(r.getDouble(4) === 16.0 && r.getDouble(5) === 16.0)
      } else { // PNG image via ImageIO: width, height
        assert(r.getString(1) === "image")
        assert(r.getDouble(4) === 8.0 && r.getDouble(5) === 8.0)
      }
    }
  }

  test("video container round-trips and frame sampling decodes every 4th frame") {
    import Multimodal.MediaCodec
    // container round-trip preserves frame bytes exactly
    val frames = Seq.tabulate(7) { f =>
      MediaCodec.encodeBmp(8, 8, Array.tabulate(8 * 8 * 3)(i => ((i + f * 11) % 256).toByte))
    }
    val video = MediaCodec.encodeVideo(frames)
    val Some((n, back)) = MediaCodec.decodeVideoFrames(video)
    assert(n === 7)
    assert(back.zip(frames).forall { case (a, b) => a.sameElements(b) })
    // malformed input is refused, not thrown
    assert(MediaCodec.decodeVideoFrames(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaCodec.decodeVideoFrames(video.take(20)).isEmpty)

    // query: ceil(nFrames/4) sampled frames per doc, luma matches a direct
    // computation from the same generator
    val got = Multimodal.multimodalFrames(spark, dir)
    val byDoc = got.collect().groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, rows) =>
      val nFrames = 4 + (id % 13).toInt
      assert(rows.length === (nFrames + 3) / 4, s"doc $id: every 4th of $nFrames frames")
      assert(rows.forall(_.getInt(2) === nFrames))
      assert(rows.map(_.getInt(1)).sorted.toSeq === (0 until nFrames by 4).toSeq)
    }
    val sample = byDoc(byDoc.keys.min).minBy(_.getInt(1))
    val rgb = Array.tabulate(8 * 8 * 3)(i => ((i * 3 + byDoc.keys.min + 0 * 11) % 256).toByte)
    val img = MediaCodec.decodeBmp(MediaCodec.encodeBmp(8, 8, rgb)).get
    val lum = 0.299 * img.meanR + 0.587 * img.meanG + 0.114 * img.meanB
    assert(sample.getDouble(5) === math.rint(lum * 10000) / 10000)
  }

  test("analyzeWav matches the closed forms for a pure tone") {
    import Multimodal.MediaCodec
    // c cycles per 64 samples over 512 samples: 2c crossings per cycle,
    // 8 full cycles => zcr ~ 2c/64 per sample; rms = amp/sqrt(2) for
    // integer cycle counts; peak <= amp (hit exactly when 64/(4c) lands
    // on a sample)
    for (c <- Seq(1, 4, 8); ampRaw <- Seq(8192, 16384)) {
      val amp = ampRaw / 32768.0
      val samples = Array.tabulate(512)(i =>
        (math.sin(2 * math.Pi * i * c / 64.0) * ampRaw).toShort)
      val a = MediaCodec.analyzeWav(MediaCodec.encodeWav(samples, 16000)).get
      assert(a.sampleRate === 16000 && a.nSamples === 512)
      assert(a.durationS === 512.0 / 16000)
      assert(math.abs(a.rms - amp / math.sqrt(2)) < 0.01, s"c=$c rms=${a.rms}")
      assert(math.abs(a.zcr - 2.0 * c / 64) < 0.005, s"c=$c zcr=${a.zcr}")
      assert(a.peak <= amp + 1e-9 && a.peak > amp * 0.95, s"c=$c peak=${a.peak}")
    }
    // silence: zero everything
    val silent = MediaCodec.analyzeWav(
      MediaCodec.encodeWav(Array.fill[Short](256)(0), 8000)).get
    assert(silent.rms === 0.0 && silent.zcr === 0.0 && silent.peak === 0.0)
    // decodeWav still agrees with analyzeWav on the shared stats
    val tone = MediaCodec.encodeWav(
      Array.tabulate(512)(i => (math.sin(2 * math.Pi * i / 64.0) * 16384).toShort), 16000)
    val (dec, ana) = (MediaCodec.decodeWav(tone).get, MediaCodec.analyzeWav(tone).get)
    assert(dec.sampleRate === ana.sampleRate && dec.nSamples === ana.nSamples)
    assert(math.abs(dec.rms - ana.rms) < 1e-12)
  }

  test("multimodal_audio query emits one analyzed row per document") {
    val got = Multimodal.multimodalAudio(spark, dir).collect()
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(got.length === nDocs)
    got.foreach { r =>
      val id = r.getLong(0)
      val amp = 4096 * (1 + (id % 4).toInt) / 32768.0
      assert(r.getInt(1) === 16000 && r.getInt(2) === 512)
      assert(math.abs(r.getDouble(4) - amp / math.sqrt(2)) < 0.01, s"doc $id rms")
      assert(math.abs(r.getDouble(5) - 2.0 * (1 + (id % 31)) / 64) < 0.01, s"doc $id zcr")
    }
  }

  test("dHash is invariant to brightness shift and sensitive to structure") {
    val rgb = Array.tabulate(16 * 16 * 3)(i => ((i * 5) % 200).toByte)
    val base = Multimodal.MediaCodec.dHash(
      Multimodal.MediaCodec.encodeBmp(16, 16, rgb)).get
    // uniform brightness shift: every comparison bit unchanged
    val brighter = rgb.map(b => ((b & 0xff) + 40).min(255).toByte)
    val shifted = Multimodal.MediaCodec.dHash(
      Multimodal.MediaCodec.encodeBmp(16, 16, brighter)).get
    assert(shifted === base)
    // structural change (gradient reversed): hash far away
    val reversed = Array.tabulate(16 * 16 * 3)(i => rgb(rgb.length - 1 - i))
    val rev = Multimodal.MediaCodec.dHash(
      Multimodal.MediaCodec.encodeBmp(16, 16, reversed)).get
    assert(java.lang.Long.bitCount(base ^ rev) > 10)
  }

  test("image dedup equals brute-force Hamming pairs and pairs only same-pattern ids") {
    val got = Multimodal.imageDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty)
    // brute force over the same synthesized hashes
    import spark.implicits._
    val hashes = graft.Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long].collect().flatMap { id =>
        val pattern = (id % 83).toInt
        val jitter = (id / 83).toInt
        // pattern-keyed pseudo-random texture: dHash bits are gradient
        // SIGNS, so distinct patterns need sign-diverse content (stripes
        // or offset gradients all hash alike); a per-(pattern, pixel)
        // integer hash gives each pattern an independent 64-bit signature
        val rgb = Array.tabulate(16 * 16 * 3) { i =>
          val px = i / 3; val x = px % 16; val y = px / 16
          val h = pattern * 73856093 ^ x * 19349663 ^ y * 83492791
          (((h * 2654435761L) >>> 24) & 0xff).toByte
        }
        val p = (jitter * 37) % (16 * 16)
        rgb(p * 3) = ((rgb(p * 3) & 0xff) ^ (jitter & 3)).toByte
        Multimodal.MediaCodec.dHash(Multimodal.MediaCodec.encodeBmp(16, 16, rgb))
          .map(h => (id, h))
      }
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb).toLong)).toSet
    assert(got === brute)
    // near-dup pairs are overwhelmingly the planted same-pattern ones
    // (dHash is 64-bit but structured, so rare cross-pattern collisions
    // can occur — the engine contract is got == brute, checked above)
    val samePattern = got.count { case (a, b, _) => a % 83 == b % 83 }
    assert(samePattern.toDouble / got.size > 0.9,
      s"$samePattern of ${got.size} pairs same-pattern")
  }

  test("audioHash is volume-invariant and envelope-sensitive") {
    def clip(env: Int => Double, gain: Double): Array[Byte] = {
      val samples = Array.tabulate(1040) { i =>
        (env(i * 65 / 1040) * math.sin(2 * math.Pi * i / 16.0) * 8192 * gain).toShort
      }
      Multimodal.MediaCodec.encodeWav(samples, 16000)
    }
    val envA = (w: Int) => 0.2 + 0.8 * ((w * 37 % 19).toDouble / 19)
    val base = Multimodal.MediaCodec.audioHash(clip(envA, 1.0)).get
    val louder = Multimodal.MediaCodec.audioHash(clip(envA, 1.9)).get
    assert(louder === base)
    val envB = (w: Int) => 0.2 + 0.8 * ((w * 53 % 23).toDouble / 23)
    val other = Multimodal.MediaCodec.audioHash(clip(envB, 1.0)).get
    assert(java.lang.Long.bitCount(base ^ other) > 10)
  }

  test("decode check covers the lossless slice with canonical containers") {
    val rows = Multimodal.multimodalDecodeCheck(spark, dir).collect()
    val ids = graft.Tables.documents(spark, dir).select("doc_id")
      .collect().map(_.getLong(0))
    assert(rows.length === ids.count(_ % 6 != 4), "one row per non-JPEG doc")
    rows.foreach { r =>
      val id = r.getLong(0)
      val kind = r.getString(1)
      // kind mirrors the decode dispatch exactly
      assert(kind === (if (id % 3 == 0) "wav" else if (id % 3 == 1) "bmp" else "png"))
      kind match {
        case "wav" =>
          assert(r.getInt(2) === 1068 && r.getLong(3) === 16000L && r.getLong(4) === 512L)
          assert(r.getLong(7) === -1L)
        case "bmp" =>
          assert(r.getInt(2) === 822 && r.getLong(3) === 16L && r.getLong(4) === 16L)
          // decoded channel sums equal the generator's closed form
          val exp = (0 until 256).map(p => (3L * p + id) % 256).sum
          assert(r.getLong(5) === exp)
        case "png" =>
          assert(r.getInt(2) === -1 && r.getLong(3) === 8L && r.getLong(4) === 8L)
          val exp = (0 until 64).map(p => (21L * p + 7 + id) % 256).sum
          assert(r.getLong(6) === exp)
      }
    }
  }

  test("audio dedup finds planted same-pattern clips through the pigeonhole join") {
    val got = Multimodal.audioDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val samePattern = got.count { case (a, b, _) => a % 83 == b % 83 }
    assert(samePattern.toDouble / got.length > 0.9,
      s"$samePattern of ${got.length} pairs same-pattern")
    // near-dups really are near: most planted pairs at distance 0-1
    assert(got.count(_._3 <= 1).toDouble / got.length > 0.5)
  }
}
