package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Stopword-profile language ID as a native expression: ONE walk over the
  * UTF-8 bytes scores every language profile at once. The composed form
  * ([[TextFns.langId]]) runs five interpreted `filter`/`array_contains`
  * lambdas, each re-evaluating the tokenization (Spark 4.1 HOFs have no
  * codegen and re-evaluate captured subexpressions per element) — the
  * same trap already fixed for charMask/TextStats.
  *
  * Semantics mirror the composed form so the DuckDB oracle is unchanged:
  * tokens split on Java \s whitespace, ASCII case-fold for matching
  * (profile words are lowercase ASCII or Chinese, so full Unicode
  * lowercasing is equivalent on them), score = hits / max(n_tokens, 1),
  * argmax with ties broken toward the lexicographically greatest language
  * code (Spark's array_max struct ordering). `ExtSpec` asserts
  * native == composed over the documents table.
  */
case class LangId(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LangId.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_id"
  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    LangId.evaluator.eval(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evalRef = ctx.addReferenceObj("langIdEvaluator", LangId.evaluator,
      classOf[LangId.Evaluator].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $evalRef.eval($c.getBytes());")
  }
}

object LangId {
  val schema: StructType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("lang", StringType, nullable = false)))

  final class Evaluator(profiles: Seq[(String, Seq[String])]) extends Serializable {
    private val codes: Array[UTF8String] =
      profiles.map(p => UTF8String.fromString(p._1)).toArray
    private val words: Array[Array[Array[Byte]]] =
      profiles.map(_._2.map(_.getBytes("UTF-8")).toArray).toArray

    /** Per-profile hit counts + token count in one byte-walk — the shared
      * kernel of the argmax ([[eval]]) and the full score vector
      * ([[evalAll]]).
      */
    private def countHits(bytes: Array[Byte]): (Array[Int], Int) = {
      val len = bytes.length
      val hits = new Array[Int](codes.length)
      var nTokens = 0
      var i = 0
      var tokStart = -1
      while (i <= len) {
        val atEnd = i == len
        val b = if (atEnd) ' '.toByte else bytes(i)
        val space = atEnd || b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
        if (space) {
          if (tokStart >= 0) {
            nTokens += 1
            var l = 0
            while (l < words.length) {
              if (inProfile(bytes, tokStart, i, words(l))) hits(l) += 1
              l += 1
            }
            tokStart = -1
          }
        } else if (tokStart < 0) tokStart = i
        i += 1
      }
      (hits, nTokens)
    }

    def eval(bytes: Array[Byte]): InternalRow = {
      val (hits, nTokens) = countHits(bytes)
      // split(trim(""), "\s+") yields one (empty) token
      val denom = math.max(nTokens, 1)
      // argmax; ascending profile order + >= ties toward the greatest code,
      // matching array_max over (score, lang) structs
      var best = 0
      var bestScore = hits(0).toDouble / denom
      var l = 1
      while (l < hits.length) {
        val s = hits(l).toDouble / denom
        if (s >= bestScore) { best = l; bestScore = s }
        l += 1
      }
      InternalRow(bestScore, codes(best))
    }

    /** EVERY profile's score from the same single walk, in profile order —
      * the one-vs-rest evaluation surface ([[LangScores]]): each score is
      * the exact IEEE quotient hits/max(n_tokens,1), so grouping on it is
      * engine-portable.
      */
    def evalAll(bytes: Array[Byte]): GenericArrayData = {
      val (hits, nTokens) = countHits(bytes)
      val denom = math.max(nTokens, 1)
      val out = new Array[Any](codes.length)
      var l = 0
      while (l < codes.length) {
        out(l) = InternalRow(codes(l), hits(l).toDouble / denom)
        l += 1
      }
      new GenericArrayData(out)
    }

    private def inProfile(
        bytes: Array[Byte], from: Int, until: Int, ws: Array[Array[Byte]]): Boolean = {
      val n = until - from
      var s = 0
      while (s < ws.length) {
        val w = ws(s)
        if (w.length == n) {
          var k = 0
          var ok = true
          while (ok && k < n) {
            var c = bytes(from + k)
            if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
            if (c != w(k)) ok = false
            k += 1
          }
          if (ok) return true
        }
        s += 1
      }
      false
    }
  }

  // shared singleton: profiles are fixed, the evaluator is stateless
  lazy val evaluator: Evaluator = new Evaluator(TextFns.langProfiles)

  def apply(text: Column): Column =
    Bridge.toColumn(LangId(Bridge.toExpression(text)))
}

/** ALL language-profile scores from the one byte-walk that [[LangId]]
  * argmaxes over — array<struct<lang,score>> in fixed profile order. The
  * detector-evaluation surface: one-vs-rest metrics (text_auc) need every
  * profile's score per document, and running [[graft.functions.TextStats]]
  * once per profile would re-tokenize the corpus |profiles| times.
  */
case class LangScores(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LangScores.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_scores"
  override protected def withNewChildInternal(newChild: Expression): LangScores =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    LangId.evaluator.evalAll(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evalRef = ctx.addReferenceObj("langIdEvaluator", LangId.evaluator,
      classOf[LangId.Evaluator].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $evalRef.evalAll($c.getBytes());")
  }
}

object LangScores {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  def apply(text: Column): Column =
    Bridge.toColumn(LangScores(Bridge.toExpression(text)))
}

/** Distinct word n-gram shingles (as strings) in one compiled pass. The
  * composed form ([[TextFns.wordShingles]]) re-evaluates the `split` per
  * shingle inside an interpreted `transform` lambda — quadratic in
  * tokens. Shingle strings are built directly from the token byte ranges;
  * first-occurrence order is preserved (array_distinct semantics), and a
  * text with fewer than n tokens yields its tokens joined by single
  * spaces as one shingle (the concat_ws fallback of the composed form).
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String].getBytes, n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c.getBytes(), $n, $distinct);")
}

object WordShingles {

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\r' || b == '\f'

  def compute(bytes: Array[Byte], n: Int, distinct: Boolean): GenericArrayData = {
    val len = bytes.length
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        starts.add(i)
        while (i < len && !isSpace(bytes(i))) i += 1
        ends.add(i)
      }
    }
    val nTok = starts.size()
    if (nTok == 0) return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val span = math.min(n, nTok)
    val count = if (nTok < n) 1 else nTok - n + 1
    // LinkedHashSet dedups preserving first-occurrence order; the
    // non-distinct mode (repetition statistics need multiplicities)
    // appends every shingle instead.
    val seen: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String](count)
    var s = 0
    while (s < count) {
      var size = span - 1 // separators
      var t = s
      while (t < s + span) { size += ends.get(t) - starts.get(t); t += 1 }
      val out = new Array[Byte](size)
      var p = 0
      t = s
      while (t < s + span) {
        if (t > s) { out(p) = ' '; p += 1 }
        val st = starts.get(t); val e = ends.get(t)
        System.arraycopy(bytes, st, out, p, e - st)
        p += e - st
        t += 1
      }
      seen.add(UTF8String.fromBytes(out))
      s += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  def apply(text: Column, n: Int): Column =
    Bridge.toColumn(WordShingles(Bridge.toExpression(text), n))

  def apply(text: Column, n: Int, distinct: Boolean): Column =
    Bridge.toColumn(WordShingles(Bridge.toExpression(text), n, distinct))
}

/** Character n-grams (with multiplicity, in order) in one compiled pass —
  * the trigram feed of the LM quality scorer. The composed form
  * (`transform(sequence(1, len-n+1), i -> substr(text, i, n))`) is an
  * interpreted HOF whose per-element `substr` seeks from the string start
  * (UTF-8 has no random access), so it is quadratic in characters; this
  * records each character's byte offset once and slices n-gram byte
  * ranges directly. Texts shorter than n characters yield an empty
  * array, matching the composed form's guard.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_ngrams"
  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String].getBytes, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNgrams.compute($c.getBytes(), $n);")
}

object CharNgrams {

  def compute(bytes: Array[Byte], n: Int): GenericArrayData = {
    val len = bytes.length
    var offs = new Array[Int](math.max(len / 2, 8))
    var nChars = 0
    var i = 0
    while (i < len) {
      if (nChars == offs.length) offs = java.util.Arrays.copyOf(offs, offs.length * 2)
      offs(nChars) = i
      nChars += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    if (nChars < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nChars - n + 1)
    var s = 0
    while (s < out.length) {
      val from = offs(s)
      val until = if (s + n < nChars) offs(s + n) else len
      out(s) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, from, until))
      s += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column, n: Int): Column =
    Bridge.toColumn(CharNgrams(Bridge.toExpression(text), n))
}

/** Per-document repetition statistics in one compiled pass: token count,
  * distinct-token count, the highest bigram multiplicity, and the bigram
  * total. The composed formulation explodes every (doc, bigram) pair
  * into TWO corpus-sized shuffles plus a join back to the tokens — this
  * expression is a pure map, so the repetition query's only exchange is
  * its output order. Tokens intern to dense ids while the distinct set
  * is built, so bigram counting hashes one long per pair instead of
  * re-hashing string bytes.
  *
  * Semantics mirror the composed form: tokens split on Java \s runs
  * (all-whitespace text = one empty token), bigrams are
  * `WordShingles(2, distinct=false)` — a sub-2-token text yields its
  * tokens joined as ONE shingle.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_stats"
  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionStats.compute($c.getBytes());")
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_bigram", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false)))

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\r' || b == '\f'

  def compute(bytes: Array[Byte]): InternalRow = {
    val len = bytes.length
    val ids = new java.util.HashMap[UTF8String, Integer]()
    val tokIds = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isSpace(bytes(i))) i += 1
        val tok = UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, i))
        var id = ids.get(tok)
        if (id == null) { id = ids.size(); ids.put(tok, id) }
        tokIds.add(id)
      }
    }
    val nTok = tokIds.size()
    // split(trim(""), "\s+") yields one empty token; WordShingles emits
    // the joined tokens as a single shingle whenever nTok < 2
    if (nTok < 2)
      return InternalRow(1, 1, 1L, 1L)
    val counts = new java.util.HashMap[java.lang.Long, Integer]()
    var top = 0
    var t = 0
    while (t < nTok - 1) {
      val key = java.lang.Long.valueOf(
        (tokIds.get(t).toLong << 32) | (tokIds.get(t + 1).toLong & 0xffffffffL))
      val c = counts.merge(key, 1, (a, b) => a + b)
      if (c > top) top = c
      t += 1
    }
    InternalRow(nTok, ids.size(), top.toLong, (nTok - 1).toLong)
  }

  def apply(text: Column): Column =
    Bridge.toColumn(RepetitionStats(Bridge.toExpression(text)))
}

/** Content-anchored span windows in one compiled pass: every
  * `window`-codepoint substring starting where the multiplicative hash
  * of the leading codepoint TRIGRAM lands in the low 1/`modulus` of the
  * 32-bit range, for span-level dedup ([[graft.ext.Dedup.dedupSpans]]).
  *
  * Anchor rule: `((961·a + 31·b + c) · 2654435761) mod 2^32 <
  * 2^32/modulus` over codepoints (a,b,c) at the start (out-of-range
  * positions read as 0). A single-codepoint mod rule is a trap on prose
  * — ' ' = 32 ≡ 0 (mod 16) anchors nearly every word boundary (~6×
  * the intended density, measured 19.7% on the test corpus) — and the
  * LOW bits of a multiplicative hash are equally bad (for odd K,
  * `(x·K) mod 16` is a bijection of `x mod 16`). Hashing the trigram
  * and comparing the full 32-bit product against a threshold uses the
  * high bits, measuring 6.2% ≈ 1/16 on the same corpus.
  *
  * Semantics exactly mirror the SQL formulation the oracle runs —
  * positions are CODEPOINTS (not bytes), and only starts with `window`
  * codepoints remaining qualify — but in ONE byte-walk per document.
  * The composed explode(sequence(1, n))-then-filter form materializes
  * an int array the size of the text and pays an O(position) UTF-8
  * re-seek per substring call (quadratic per document); this expression
  * emits only the ~n/modulus surviving windows, each sliced by
  * precomputed byte offsets.
  */
case class AnchoredSpans(child: Expression, window: Int, modulus: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "anchored_spans"
  override protected def withNewChildInternal(newChild: Expression): AnchoredSpans =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    AnchoredSpans.compute(input.asInstanceOf[UTF8String].getBytes, window, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AnchoredSpans.compute($c.getBytes(), $window, $modulus);")
}

/** Word-aligned suffix windows in one compiled byte-walk: for every
  * position that starts the text or follows a space codepoint, emit
  * (char offset, leading `cap`-codepoint window), for
  * [[graft.ext.SuffixDedup]]. The composed
  * explode(sequence)+substring(text, off, 1) form pays an O(off) UTF-8
  * re-seek PER POSITION — quadratic per document, the same trap
  * [[AnchoredSpans]] exists to avoid (measured 7.1 s → 1.4 s at sf0.1
  * for dedup_suffix); this walk slices each window by precomputed byte
  * offsets. Semantics mirror the oracle's
  * `off = 0 OR substr(text, off, 1) = ' '` exactly (the PRECEDING char
  * decides; consecutive spaces emit consecutive starts).
  */
case class WordSuffixWindows(child: Expression, cap: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("off", IntegerType, nullable = false),
      StructField("win", StringType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_suffix_windows"
  override protected def withNewChildInternal(newChild: Expression): WordSuffixWindows =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    WordSuffixWindows.compute(input.asInstanceOf[UTF8String].getBytes, cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordSuffixWindows.compute($c.getBytes(), $cap);")
}

object WordSuffixWindows {
  def compute(bytes: Array[Byte], cap: Int): GenericArrayData = {
    val len = bytes.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    // one pass: byte offset per char (same layout as AnchoredSpans)
    var offs = new Array[Int](math.max(len / 2, 8))
    var nChars = 0
    var i = 0
    while (i < len) {
      if (nChars == offs.length) offs = java.util.Arrays.copyOf(offs, offs.length * 2)
      offs(nChars) = i
      nChars += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any](nChars / 6 + 1)
    var s = 0
    while (s < nChars) {
      if (s == 0 || bytes(offs(s - 1)) == ' ') {
        val from = offs(s)
        val until = if (s + cap < nChars) offs(s + cap) else len
        out += InternalRow(s,
          UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, from, until)))
      }
      s += 1
    }
    new GenericArrayData(out.toArray)
  }

  def apply(text: Column, cap: Int): Column =
    Bridge.toColumn(WordSuffixWindows(Bridge.toExpression(text), cap))
}

/** Common prefix length of two strings in CODEPOINTS, as one compiled
  * byte-walk: UTF-8 byte order equals codepoint order, so the shared
  * prefix is found by comparing whole codepoint blocks until the first
  * mismatch — no decoding, no per-character substring calls. Used by
  * [[graft.ext.SuffixDedup]] for adjacent-suffix LCP; mirrors the
  * oracle's per-character substr comparison exactly (char granularity —
  * a mismatch inside a multi-byte codepoint does not count the partial
  * codepoint).
  */
case class CommonPrefixLength(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "common_prefix_length"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CommonPrefixLength =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    CommonPrefixLength.compute(
      a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CommonPrefixLength.compute($a.getBytes(), $b.getBytes());")
}

object CommonPrefixLength {
  def compute(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    var chars = 0
    while (i < n) {
      val nb = UTF8String.numBytesForFirstByte(a(i))
      if (i + nb > a.length || i + nb > b.length) return chars
      var j = 0
      while (j < nb) {
        if (a(i + j) != b(i + j)) return chars
        j += 1
      }
      i += nb
      chars += 1
    }
    chars
  }

  def apply(a: Column, b: Column): Column =
    Bridge.toColumn(CommonPrefixLength(Bridge.toExpression(a), Bridge.toExpression(b)))
}

object AnchoredSpans {

  def compute(bytes: Array[Byte], window: Int, modulus: Int): GenericArrayData = {
    val len = bytes.length
    // one pass: byte offset + decoded codepoint per char
    var offs = new Array[Int](math.max(len / 2, 8))
    var cps = new Array[Int](math.max(len / 2, 8))
    var nChars = 0
    var i = 0
    while (i < len) {
      if (nChars == offs.length) {
        offs = java.util.Arrays.copyOf(offs, offs.length * 2)
        cps = java.util.Arrays.copyOf(cps, cps.length * 2)
      }
      val b0 = bytes(i) & 0xff
      val nb = UTF8String.numBytesForFirstByte(bytes(i))
      val cp =
        if (b0 < 0x80) b0
        else if (nb == 2) ((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f)
        else if (nb == 3) ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) | (bytes(i + 2) & 0x3f)
        else ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)
      offs(nChars) = i
      cps(nChars) = cp
      nChars += 1
      i += nb
    }
    if (nChars < window) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](nChars / modulus + 1)
    var s = 0
    val lastStart = nChars - window
    val thresh = 0x100000000L / modulus
    while (s <= lastStart) {
      val a = cps(s)
      val b = if (s + 1 < nChars) cps(s + 1) else 0
      val c = if (s + 2 < nChars) cps(s + 2) else 0
      if ((((961L * a + 31L * b + c) * 2654435761L) & 0xffffffffL) < thresh) {
        val from = offs(s)
        val until = if (s + window < nChars) offs(s + window) else len
        out += UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, from, until))
      }
      s += 1
    }
    new GenericArrayData(out.toArray)
  }

  def apply(text: Column, window: Int, modulus: Int): Column =
    Bridge.toColumn(AnchoredSpans(Bridge.toExpression(text), window, modulus))
}
