package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests for the pure sketch kernels (no Spark session —
  * these are the functions the native expressions delegate to). Uses
  * ScalaCheck generators with a fixed seed so every run checks the same
  * 200 sampled inputs deterministically.
  */
class SketchPropertiesSpec extends AnyFunSuite {

  val word: Gen[String] = Gen.choose(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  val text: Gen[String] = Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  def samples(g: Gen[String], n: Int): Seq[String] =
    Iterator.iterate(Seed(42L))(_.next)
      .map(s => g.apply(Gen.Parameters.default, s))
      .collect { case Some(v) => v }
      .take(n).toSeq

  def hashSet(s: String): GenericArrayData =
    new GenericArrayData(Sketches.shingleHashSet(s.getBytes("UTF-8"), 3))

  val texts: Seq[String] = samples(text, 200)

  test("jaccardSorted is bounded, symmetric, and 1 on self") {
    texts.sliding(2).foreach { case Seq(a, b) =>
      val (ha, hb) = (hashSet(a), hashSet(b))
      val ab = Sketches.jaccardSorted(ha, hb)
      assert(ab >= 0.0 && ab <= 1.0)
      assert(ab === Sketches.jaccardSorted(hb, ha))
      assert(Sketches.jaccardSorted(ha, ha) === 1.0)
    }
  }

  test("minhash signature is deterministic, length-k, duplicate-invariant") {
    texts.foreach { t =>
      val a = Sketches.minhash(t.getBytes("UTF-8"), 3, 64)
      val b = Sketches.minhash(t.getBytes("UTF-8"), 3, 64)
      assert(a.toSeq === b.toSeq)
      assert(a.length === 64)
    }
    val a = Sketches.minhash("aa bb cc dd ee ff gg hh".getBytes, 3, 128)
    val b = Sketches.minhash("zz yy xx ww vv uu tt ss".getBytes, 3, 128)
    val agree = a.zip(b).count { case (x, y) => x == y }
    assert(agree < 16, s"disjoint-vocab texts should rarely agree, got $agree/128")
  }

  test("simhash is deterministic; near-identical texts land close") {
    texts.take(50).foreach { t =>
      assert(Sketches.simhash(t.getBytes("UTF-8"), 3) === Sketches.simhash(t.getBytes("UTF-8"), 3))
    }
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = base + " tail"
    val d = java.lang.Long.bitCount(
      Sketches.simhash(base.getBytes, 3) ^ Sketches.simhash(near.getBytes, 3))
    assert(d <= 8, s"near-dup hamming was $d")
  }

  test("rolling-hash fingerprint: a superset of windows can only lower the min") {
    texts.take(100).foreach { t =>
      if (t.getBytes("UTF-8").length >= 16) {
        val inner = RollingHashFingerprint.fingerprint(t.getBytes("UTF-8"), 16)
        val outer = RollingHashFingerprint.fingerprint(s"pre $t post".getBytes("UTF-8"), 16)
        assert(outer <= inner)
      }
    }
  }

  test("charBitmap sets exactly the bits of occurring ASCII codepoints") {
    (texts :+ "" :+ "\t\n\f\r ~" :+ "héllo ünïcode").foreach { t =>
      val Array(m0, m1) = Sketches.charBitmap(t.getBytes("UTF-8"))
      val expected = t.getBytes("UTF-8").map(_ & 0xff).filter(_ < 128).toSet
      (0 until 128).foreach { c =>
        val bit = if (c < 64) (m0 >>> c) & 1L else (m1 >>> (c - 64)) & 1L
        assert((bit == 1L) === expected.contains(c), s"codepoint $c of '$t'")
      }
    }
  }

  test("shingle hash sets are sorted and distinct") {
    texts.foreach { t =>
      val hs = Sketches.shingleHashSet(t.getBytes("UTF-8"), 3)
      assert(hs.toSeq === hs.toSeq.sorted)
      assert(hs.toSet.size === hs.length)
    }
  }

  // unicode text: ascii + latin-1 + CJK so multi-byte decode paths and
  // the trigram-hash anchor rule are both exercised across byte widths
  val uniChar: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.const('é'),
    1 -> Gen.const('日'), 1 -> Gen.const('ـ'))
  val uniText: Gen[String] =
    Gen.choose(0, 120).flatMap(n => Gen.stringOfN(n, uniChar))

  test("AnchoredSpans equals a naive codepoint-based reference on unicode text") {
    def reference(s: String, window: Int, mod: Int): Seq[String] = {
      val cps = s.codePoints().toArray // all test chars are BMP
      def cp(i: Int): Long = if (i < cps.length) cps(i).toLong else 0L
      (0 to cps.length - window)
        .filter(i => (((961L * cp(i) + 31L * cp(i + 1) + cp(i + 2)) * 2654435761L)
          & 0xffffffffL) < 0x100000000L / mod)
        .map(i => new String(cps, i, window))
    }
    samples(uniText, 200).foreach { s =>
      val got = AnchoredSpans.compute(s.getBytes("UTF-8"), 8, 16)
        .array.map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString).toSeq
      assert(got === reference(s, 8, 16), s"text=${s.take(40)}")
    }
  }

  test("CommonPrefixLength equals a naive codepoint reference on unicode text") {
    def reference(a: String, b: String): Int = {
      val ca = a.codePoints().toArray
      val cb = b.codePoints().toArray
      var i = 0
      while (i < math.min(ca.length, cb.length) && ca(i) == cb(i)) i += 1
      i
    }
    val pairs = samples(uniText, 200)
    pairs.sliding(2).foreach { case Seq(a, b) =>
      val got = CommonPrefixLength.compute(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      assert(got === reference(a, b), s"a=${a.take(30)} b=${b.take(30)}")
      // and against a shifted copy of itself: long guaranteed prefixes
      val self = a + "X"
      assert(CommonPrefixLength.compute(
        a.getBytes("UTF-8"), self.getBytes("UTF-8")) === a.codePointCount(0, a.length))
    }
  }

  test("WordSuffixWindows equals a naive codepoint reference on unicode text") {
    def reference(s: String, cap: Int): Seq[(Int, String)] = {
      val cps = s.codePoints().toArray
      (0 until cps.length)
        .filter(i => i == 0 || cps(i - 1) == ' ')
        .map(i => (i, new String(cps, i, math.min(cap, cps.length - i))))
    }
    samples(uniText, 200).filter(_.nonEmpty).foreach { s =>
      val got = WordSuffixWindows.compute(s.getBytes("UTF-8"), 8)
        .array.map { r =>
          val row = r.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
          (row.getInt(0), row.getUTF8String(1).toString)
        }.toSeq
      assert(got === reference(s, 8), s"text=${s.take(40)}")
    }
  }

  test("DeflateRatio: monotone under repetition, deterministic, defined on empty") {
    samples(uniText, 100).foreach { s =>
      val r1 = DeflateRatio.ratio(s.getBytes("UTF-8"))
      assert(r1 === DeflateRatio.ratio(s.getBytes("UTF-8")))
      assert(r1 > 0)
      if (s.length >= 20) {
        // repeating the same content must compress at least as well
        val rep = DeflateRatio.ratio((s * 20).getBytes("UTF-8"))
        assert(rep <= r1 * 1.05, s"repetition ratio $rep vs single $r1")
      }
    }
    assert(DeflateRatio.ratio(Array.emptyByteArray) === 1.0)
  }

  test("HllSketch: accuracy, merge=union exactness, order-invariance, edge cases") {
    // empty registers estimate 0 (linear counting of an untouched sketch)
    assert(HllSketch.estimate(new Array[Byte](HllSketch.M)) === 0L)
    // estimate within 3 sigma (1.04/sqrt(4096) ~ 1.6%) across scales
    Seq(100, 5000, 200000).foreach { n =>
      val regs = new Array[Byte](HllSketch.M)
      (1 to n).foreach(i => HllSketch.add(regs, i.toLong * 0x51ab3f27L + 17))
      val est = HllSketch.estimate(regs)
      assert(math.abs(est - n).toDouble / n < 0.05, s"n=$n est=$est")
    }
    // merge of disjoint halves equals the sketch of the union, bit-exactly,
    // and insertion order never matters
    val keys = (1 to 3000).map(i => (i * 2654435761L) ^ (i << 7)).toArray
    val (a, b) = keys.splitAt(keys.length / 2)
    val ra = new Array[Byte](HllSketch.M); a.foreach(HllSketch.add(ra, _))
    val rb = new Array[Byte](HllSketch.M); b.foreach(HllSketch.add(rb, _))
    val direct = new Array[Byte](HllSketch.M)
    scala.util.Random.shuffle(keys.toSeq).foreach(HllSketch.add(direct, _))
    HllSketch.merge(ra, rb)
    assert(ra.toSeq === direct.toSeq, "merged registers differ from direct")
    // duplicates never move a register
    val dup = direct.clone()
    keys.take(100).foreach(HllSketch.add(dup, _))
    assert(dup.toSeq === direct.toSeq)
    // negative keys are legal (wrap as unsigned lanes)
    val neg = new Array[Byte](HllSketch.M)
    HllSketch.add(neg, -1L); HllSketch.add(neg, Long.MinValue)
    assert(HllSketch.estimate(neg) >= 1L)
    // serde roundtrip, both encodings: sparse for few touched registers
    // (and strictly smaller than dense), dense once the sketch fills
    Seq(neg, direct).foreach { r =>
      assert(HllSketch.deserializeRegs(HllSketch.serializeRegs(r)).toSeq === r.toSeq)
    }
    assert(HllSketch.serializeRegs(neg).length < 1 + HllSketch.M)
    assert(HllSketch.serializeRegs(neg)(0) === 1.toByte)
    val full = new Array[Byte](HllSketch.M)
    java.util.Arrays.fill(full, 3.toByte)
    assert(HllSketch.serializeRegs(full)(0) === 0.toByte)
    assert(HllSketch.deserializeRegs(HllSketch.serializeRegs(full)).toSeq === full.toSeq)
  }

  test("MisraGries: bounded size, merge keeps every > n/(k+1) item, serde roundtrip") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val k = 15
    val agg = MisraGriesAgg(BoundReference(0, StringType, nullable = true), k)
    // harmonic-skewed stream: item i appears 600/i times, order shuffled
    val stream = (1 to 60).flatMap(i => Seq.fill(600 / i)(s"w$i"))
    val shuffled = new scala.util.Random(7).shuffle(stream)
    // simulate partial aggregation: 8 partitions, then a merge tree
    val bufs = shuffled.grouped((shuffled.size + 7) / 8).map { chunk =>
      val b = agg.createAggregationBuffer()
      chunk.foreach(s => agg.update(b, InternalRow(UTF8String.fromString(s))))
      assert(b.size <= k, "partial summary must stay bounded")
      b
    }.toSeq
    val roundTripped = agg.deserialize(agg.serialize(bufs.head))
    assert(roundTripped === bufs.head)
    val merged = bufs.reduce((a, b) => agg.merge(a, agg.deserialize(agg.serialize(b))))
    assert(merged.size <= k, "merged summary must stay bounded")
    val keys = agg.eval(merged).asInstanceOf[GenericArrayData]
      .toObjectArray(StringType).map(_.toString).toSet
    val exact = shuffled.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val thresh = shuffled.size.toDouble / (k + 1)
    exact.foreach { case (w, c) =>
      if (c > thresh) assert(keys.contains(w), s"$w freq $c > $thresh must survive")
    }
    // and nulls are ignored
    val nb = agg.createAggregationBuffer()
    agg.update(nb, InternalRow(null))
    assert(nb.isEmpty)
  }

  test("BPE: roundtrip, full application, frequent-word compression, determinism") {
    val corpus = Seq("low" -> 50L, "lower" -> 20L, "newest" -> 60L,
      "widest" -> 30L, "the" -> 500L, "them" -> 40L, "these" -> 25L)
    val merges = Bpe.train(corpus, numMerges = 60)
    assert(merges.nonEmpty && merges.distinct === merges, "merges are unique")
    assert(merges === Bpe.train(corpus, 60), "training is deterministic")
    val ranks = Bpe.ranksOf(merges)
    // roundtrip: concatenated subwords reproduce the word + end marker
    val words = corpus.map(_._1) ++ Seq("lowest", "newer", "unseen", "a")
    words.foreach { w =>
      val subs = Bpe.encodeWord(w, ranks)
      assert(subs.mkString === w + Bpe.EndMark, s"roundtrip failed for $w")
      // full application: no adjacent pair in the output is still mergeable
      subs.sliding(2).foreach {
        case Array(x, y) =>
          assert(ranks.get(x + " " + y) == null, s"unapplied merge ($x,$y) in $w")
        case _ =>
      }
    }
    // the dominant training word compresses to a single symbol
    assert(Bpe.encodeWord("the", ranks).length === 1)
    // texts encode word-by-word: whitespace never crosses a merge
    val enc = Bpe.encodeText(
      org.apache.spark.unsafe.types.UTF8String.fromString("  The  newest THE "), ranks)
    val toks = enc.toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString)
    assert(toks.count(_ == "the" + Bpe.EndMark) === 2)
    assert(toks.mkString === "the</w>newest</w>the</w>")
  }

  test("winnowing: sorted-distinct output, density bound, substring guarantee (fuzzed)") {
    val K = 24; val W = 8
    def fps(s: String): Array[Long] =
      WinnowFingerprints.winnow(s.getBytes("UTF-8"), K, W)
    texts.foreach { t =>
      val f = fps(t)
      // sorted distinct, deterministic
      assert(f.toSeq == f.toSeq.sorted && f.distinct.length == f.length)
      assert(f.toSeq == fps(t).toSeq)
      val n = t.getBytes("UTF-8").length
      val m = math.max(n - K + 1, 1)
      if (m >= W) {
        // at most one NEW selection per window position, at least one
        // overall. (No ~m/w density FLOOR in general: on periodic text
        // the same hash value recurs at many positions and one value can
        // serve arbitrarily many windows — the 2/(w+1) expectation holds
        // only for distinct hash sequences.)
        assert(f.length <= m - W + 1)
        assert(f.length >= 1)
      } else assert(f.length == 1)
    }
    // guarantee fuzz: any shared run of K + W - 1 bytes yields a shared
    // fingerprint regardless of surrounding content
    val run = samples(Gen.stringOfN(K + W - 1, Gen.alphaLowerChar), 50)
    val ctx = samples(text, 100)
    run.zip(ctx.grouped(2).toSeq).foreach { case (r, Seq(c1, c2)) =>
      val a = fps(c1 + " " + r)
      val b = fps(r + " " + c2)
      assert(a.toSet.intersect(b.toSet).nonEmpty,
        s"guarantee failed for run=$r between [$c1] and [$c2]")
    }
  }
}
