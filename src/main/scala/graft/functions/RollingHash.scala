package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
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
