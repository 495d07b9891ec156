package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal as a native codegen expression:
  * deflate(level 6) output bytes / input bytes over the UTF-8 text.
  *
  * This is the standard cheap entropy proxy a pretraining corpus filter
  * runs (machine-generated/repetitive text compresses far below prose;
  * the Gopher and RefinedWeb curation stacks both gate on it). Shaped
  * like every other hot-path function here: a compiled `doGenCode`
  * expression (no UDF serialization boundary), a thread-local `Deflater`
  * so the per-row cost is a `reset()` rather than a native allocation,
  * and a fixed level/strategy so the score is deterministic for a given
  * input. The ratio is an engine-local signal (zlib emits no canonical
  * cross-implementation byte count), so queries over it take the
  * rows-only check plus ScalaTest semantics, like the sketch hashes.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_ratio"

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    DeflateRatio.ratio(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateRatio.ratio($c.getBytes());")
}

object DeflateRatio {

  private val local = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true)
  }

  /** deflate-compressed size / raw size; 1.0 for empty input. Shared by
    * interpreted eval and generated code.
    */
  def ratio(bytes: Array[Byte]): Double = {
    val n = bytes.length
    if (n == 0) return 1.0
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val scratch = new Array[Byte](8192)
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(scratch)
    compressed.toDouble / n
  }

  def apply(text: Column): Column = Bridge.toColumn(DeflateRatio(Bridge.toExpression(text)))
}
