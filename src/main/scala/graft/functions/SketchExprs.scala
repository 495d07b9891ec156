package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch expressions for dedup: whole-document MinHash signatures
  * and SimHash, each computed in ONE compiled pass over the UTF-8 bytes —
  * no shingle array materialization, no explode, no shuffle. The
  * composed-builtin formulations either run interpreted (higher-order
  * functions have no codegen) or need an explode + wide groupBy; at corpus
  * scale this expression turns the sketch stage into a pure map.
  *
  * Shingling: word n-grams over whitespace tokens, hashed incrementally
  * (FNV-1a over the token bytes with a separator, then an avalanche
  * finalizer). Hash family i remixes the base hash with splitmix64 —
  * deterministic, seed-free.
  */
object Sketches {

  @inline private def avalanche(x0: Long): Long = {
    var x = x0
    x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
    x ^= x >>> 27; x *= 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  @inline def mix(i: Int, h: Long): Long = avalanche(h ^ (i.toLong * 0x9e3779b97f4a7c15L))

  /** Base hashes of all word n-gram shingles (multiset; duplicates are
    * harmless for min/vote sketches). Texts with fewer than n tokens hash
    * as a single whole-text shingle.
    */
  def shingleBaseHashes(bytes: Array[Byte], n: Int): Array[Long] = {
    // token boundaries over ASCII whitespace
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        starts.add(i)
        while (i < len && !isSpace(bytes(i))) i += 1
        ends.add(i)
      }
    }
    val nTok = starts.size()
    if (nTok == 0) return Array(avalanche(0xcbf29ce484222325L))
    val count = if (nTok < n) 1 else nTok - n + 1
    val span = math.min(n, nTok)
    val out = new Array[Long](count)
    var s = 0
    while (s < count) {
      var h = 0xcbf29ce484222325L // FNV-1a offset basis
      var t = s
      while (t < s + span) {
        var p = starts.get(t)
        val e = ends.get(t)
        while (p < e) { h ^= (bytes(p) & 0xffL); h *= 0x100000001b3L; p += 1 }
        h ^= ' '.toLong; h *= 0x100000001b3L // token separator
        t += 1
      }
      out(s) = avalanche(h)
      s += 1
    }
    out
  }

  // Mirrors Java \s (the tokenizer the DuckDB '\s+' oracles use):
  // space, tab, newline, vertical tab (0x0b), form feed, carriage return.
  // The simhash DuckDB oracle mirrors this walk exactly: tokens are the
  // non-empty '\s+' splits (list_filter drops the empty edge splits), and a
  // zero-token text hashes zero bytes (avalanche of the bare FNV offset).
  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\r' || b == '\f'

  def minhash(bytes: Array[Byte], n: Int, k: Int): Array[Long] = {
    val hs = shingleBaseHashes(bytes, n)
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < hs.length) {
      val h = hs(j)
      var i = 0
      while (i < k) {
        val v = mix(i, h)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    sig
  }

  def simhash(bytes: Array[Byte], n: Int): Long = {
    val hs = shingleBaseHashes(bytes, n)
    // distinct shingles: SimHash votes are set-based
    val seen = new java.util.HashSet[java.lang.Long](hs.length * 2)
    val votes = new Array[Int](64)
    var j = 0
    while (j < hs.length) {
      val h = hs(j)
      if (seen.add(h)) {
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Distinct, sorted shingle hashes — the exact-verification companion
    * of the sketches: pair jaccard over two sorted long arrays is a
    * merge walk (see [[JaccardSorted]]).
    */
  def shingleHashSet(bytes: Array[Byte], n: Int): Array[Long] = {
    val hs = shingleBaseHashes(bytes, n)
    java.util.Arrays.sort(hs)
    var uniq = 0
    var j = 0
    while (j < hs.length) {
      if (j == 0 || hs(j) != hs(j - 1)) { hs(uniq) = hs(j); uniq += 1 }
      j += 1
    }
    java.util.Arrays.copyOf(hs, uniq)
  }

  /** 128-bit ASCII character-set bitmap as two longs: bit k of half h is
    * set iff codepoint h*64+k occurs in the text. One byte-walk per
    * document; bytes ≥ 0x80 (every byte of a multi-byte UTF-8 sequence)
    * fall outside the bitmap, matching the composed
    * ascii()/filter/aggregate formulation this replaces — which ran
    * interpreted (HOFs have no codegen) and materialized a per-character
    * string array per document.
    */
  def charBitmap(bytes: Array[Byte]): Array[Long] = {
    var m0 = 0L
    var m1 = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b < 64) m0 |= 1L << b
      else if (b < 128) m1 |= 1L << (b - 64)
      i += 1
    }
    Array(m0, m1)
  }

  /** |A∩B| / |A∪B| for two sorted distinct long arrays. */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }
}

case class ShingleHashSet(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hash_set"
  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Sketches.shingleHashSet(input.asInstanceOf[UTF8String].getBytes, n))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Sketches.shingleHashSet($c.getBytes(), $n));""".stripMargin)
}

case class JaccardSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaccard_sorted"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSorted =
    copy(left = l, right = r)
  override def nullSafeEval(a: Any, b: Any): Any =
    Sketches.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Sketches.jaccardSorted($a, $b);")
}

case class MinHashSignature(child: Expression, n: Int, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Sketches.minhash(input.asInstanceOf[UTF8String].getBytes, n, k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Sketches.minhash($c.getBytes(), $n, $k));""".stripMargin)
}

case class CharBitmap(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_bitmap"
  override protected def withNewChildInternal(newChild: Expression): CharBitmap =
    copy(child = newChild)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Sketches.charBitmap(input.asInstanceOf[UTF8String].getBytes))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Sketches.charBitmap($c.getBytes()));""".stripMargin)
}

case class SimHash(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash"
  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
  override def nullSafeEval(input: Any): Any =
    Sketches.simhash(input.asInstanceOf[UTF8String].getBytes, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sketches.simhash($c.getBytes(), $n);")
}

object SketchFns {
  def minhashSignature(text: Column, n: Int, k: Int): Column =
    Bridge.toColumn(MinHashSignature(Bridge.toExpression(text), n, k))
  def simhash(text: Column, n: Int): Column =
    Bridge.toColumn(SimHash(Bridge.toExpression(text), n))
  def shingleHashSet(text: Column, n: Int): Column =
    Bridge.toColumn(ShingleHashSet(Bridge.toExpression(text), n))
  def charBitmap(text: Column): Column =
    Bridge.toColumn(CharBitmap(Bridge.toExpression(text)))
  def jaccardSorted(a: Column, b: Column): Column =
    Bridge.toColumn(JaccardSorted(Bridge.toExpression(a), Bridge.toExpression(b)))
}
