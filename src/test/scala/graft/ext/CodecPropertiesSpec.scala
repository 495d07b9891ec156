package graft.ext

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests for the pure-JVM media codecs (no Spark
  * session). The decode-check oracle's validity rests on the lossless
  * codecs being EXACT round-trips for arbitrary content, not just the
  * gradient fixtures the registered query generates — ScalaCheck
  * generators with a fixed seed sample that space deterministically.
  */
class CodecPropertiesSpec extends AnyFunSuite {
  import Multimodal.MediaCodec

  def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.iterate(Seed(42L))(_.next)
      .map(s => g.apply(Gen.Parameters.default, s))
      .collect { case Some(v) => v }
      .take(n).toSeq

  val image: Gen[(Int, Int, Array[Byte])] = for {
    w <- Gen.choose(1, 16)
    h <- Gen.choose(1, 16)
    bs <- Gen.listOfN(w * h * 3, Gen.choose(0, 255))
  } yield (w, h, bs.map(_.toByte).toArray)

  test("BMP encode/decode round-trips pixels exactly at any geometry (incl. odd strides)") {
    samples(image, 100).foreach { case (w, h, rgb) =>
      val (dw, dh, out) = MediaCodec.decodeBmpPixels(MediaCodec.encodeBmp(w, h, rgb)).get
      assert(dw === w && dh === h && out.toSeq === rgb.toSeq)
    }
  }

  test("PNG encode/decode channel sums are lossless for arbitrary pixels") {
    samples(image, 60).foreach { case (w, h, rgb) =>
      val (dw, dh, sr, sg, sb) =
        MediaCodec.decodePngSums(MediaCodec.encodePng(w, h, rgb)).get
      def s(ch: Int): Long =
        rgb.indices.collect { case i if i % 3 == ch => (rgb(i) & 0xff).toLong }.sum
      assert(dw === w && dh === h)
      assert(sr === s(0) && sg === s(1) && sb === s(2))
    }
  }

  test("WAV raw decode equals direct integer sums for arbitrary PCM (incl. Short.MinValue)") {
    val clip: Gen[(Int, Array[Short])] = for {
      sr <- Gen.oneOf(8000, 16000, 44100)
      n <- Gen.choose(1, 600)
      ss <- Gen.listOfN(n, Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
    } yield (sr, ss.map(_.toShort).toArray)
    samples(clip, 100).foreach { case (sr, ss) =>
      val (dsr, n, sumAbs, sumSq) = MediaCodec.decodeWavRaw(MediaCodec.encodeWav(ss, sr)).get
      assert(dsr === sr && n === ss.length)
      assert(sumAbs === ss.map(s => math.abs(s.toLong)).sum)
      assert(sumSq === ss.map(s => s.toLong * s).sum)
    }
  }

  test("GVID container round-trips frame count and bytes for arbitrary frames") {
    val frames: Gen[Seq[Array[Byte]]] = for {
      k <- Gen.choose(0, 8)
      fs <- Gen.listOfN(k, Gen.choose(0, 64).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0, 255)).map(_.map(_.toByte).toArray)))
    } yield fs
    samples(frames, 60).foreach { fs =>
      val (count, out) = MediaCodec.decodeVideoFrames(MediaCodec.encodeVideo(fs)).get
      assert(count === fs.length)
      assert(out.map(_.toSeq) === fs.map(_.toSeq))
    }
  }

  test("bitsFor is the minimal staircase at/above its floor (exact integer semantics)") {
    val cases: Gen[(Long, Long, Int)] = for {
      occ <- Gen.oneOf(1L, 8L, 32L)
      floor <- Gen.oneOf(0, 6, 12)
      base <- Gen.choose(0L, 1L << 40)
      // weight exact powers and off-by-ones: the boundaries a float
      // log's ceil would get wrong are the point of the integer rule
      n <- Gen.oneOf(base, occ << (base % 30).toInt,
        (occ << (base % 30).toInt) + 1)
    } yield (n, occ, floor)
    samples(cases, 300).foreach { case (n, occ, floor) =>
      val b = Similarity.bitsFor(n, occ, floor)
      assert(b >= floor)
      assert((1L << b) * occ >= n, s"2^$b*$occ must cover n=$n")
      if (b > floor)
        assert((1L << (b - 1)) * occ < n, s"$b not minimal for n=$n occ=$occ")
    }
  }
}
