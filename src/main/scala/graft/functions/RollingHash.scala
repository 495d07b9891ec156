package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin document fingerprint as a native Catalyst expression.
  *
  * Semantics: polynomial rolling hash (base 257, 64-bit wraparound) over
  * every `window`-byte substring of the UTF-8 text; the fingerprint is the
  * MINIMUM window hash (winnowing-style min-sampling, per the standard
  * document-fingerprinting construction). Texts shorter than the window
  * hash whole. Deterministic, seed-free, and O(n) per document via the
  * rolling update h' = (h - b_out * base^(w-1)) * base + b_in.
  *
  * Implemented with `doGenCode` (not a Scala UDF) so it participates in
  * whole-stage codegen: no boxing, no serialization boundary, and the
  * generated loop runs fused with the surrounding operators — this is the
  * preference-order (b) path for operators Spark lacks.
  */
case class RollingHashFingerprint(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash_fingerprint"

  override protected def withNewChildInternal(newChild: Expression): RollingHashFingerprint =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    RollingHashFingerprint.fingerprint(input.asInstanceOf[UTF8String].getBytes, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHashFingerprint.fingerprint($c.getBytes(), $window);")
}

object RollingHashFingerprint {
  val Base = 257L

  /** Shared by interpreted eval and generated code. */
  def fingerprint(bytes: Array[Byte], window: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    var pow = 1L // Base^(w-1)
    var i = 1
    while (i < w) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    var min = h
    i = w
    while (i < n) {
      h = (h - (bytes(i - w) & 0xffL) * pow) * Base + (bytes(i) & 0xffL)
      if (h < min) min = h
      i += 1
    }
    min
  }

  def apply(text: Column, window: Int): Column =
    Bridge.toColumn(RollingHashFingerprint(Bridge.toExpression(text), window))
}

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * SIGMOD 2003 — the MOSS construction): hash every `kgram`-byte window
  * of the UTF-8 text with the same base-257 / 64-bit-wraparound rolling
  * polynomial as [[RollingHashFingerprint]], then slide a winnowing
  * window of `winnowWin` consecutive k-gram hashes and record the
  * window MINIMUM (signed comparison). The result is the sorted distinct
  * selected-hash set — the guarantee is that any shared substring of at
  * least `kgram + winnowWin - 1` bytes between two documents produces at
  * least one shared fingerprint, while per-document fingerprint density
  * is ~2/(winnowWin+1) of the k-gram count.
  *
  * Unlike the single min-hash fingerprint, the winnowed SET localizes
  * overlap: the number of shared fingerprints between two documents is
  * a span-coverage signal (see `dedup_winnow`), which is what
  * plagiarism/copy detection and span-level dedup consume. Texts shorter
  * than `kgram` hash whole; hash sequences shorter than `winnowWin`
  * winnow over the clamped window (one global minimum) — both clamps
  * mirror the DuckDB oracle exactly.
  *
  * Per-document cost is O(n * winnowWin) signed compares with
  * `winnowWin` a small constant (a monotonic deque would make it O(n)
  * but loses to the constant-factor simplicity at w=8); runs fused in
  * whole-stage codegen like the other sketch kernels.
  */
case class WinnowFingerprints(child: Expression, kgram: Int, winnowWin: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowFingerprints.winnow(input.asInstanceOf[UTF8String].getBytes, kgram, winnowWin))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WinnowFingerprints.winnow($c.getBytes(), $kgram, $winnowWin));""".stripMargin)
}

object WinnowFingerprints {
  import RollingHashFingerprint.Base

  /** Shared by interpreted eval and generated code: sorted distinct
    * selected hashes (signed ascending, matching DuckDB `list_sort`).
    */
  def winnow(bytes: Array[Byte], kgram: Int, winnowWin: Int): Array[Long] = {
    val n = bytes.length
    if (n == 0) return Array.emptyLongArray
    val kw = math.min(kgram, n)
    var pow = 1L // Base^(kw-1)
    var i = 1
    while (i < kw) { pow *= Base; i += 1 }
    val m = n - kw + 1
    val hs = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < kw) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    hs(0) = h
    i = kw
    while (i < n) {
      h = (h - (bytes(i - kw) & 0xffL) * pow) * Base + (bytes(i) & 0xffL)
      hs(i - kw + 1) = h
      i += 1
    }
    val ww = math.min(winnowWin, m)
    val sel = new java.util.TreeSet[java.lang.Long]()
    var p = 0
    while (p + ww <= m) {
      var mn = hs(p)
      var j = 1
      while (j < ww) { if (hs(p + j) < mn) mn = hs(p + j); j += 1 }
      sel.add(mn)
      p += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    out
  }

  def apply(text: Column, kgram: Int, winnowWin: Int): Column =
    Bridge.toColumn(WinnowFingerprints(Bridge.toExpression(text), kgram, winnowWin))
}
