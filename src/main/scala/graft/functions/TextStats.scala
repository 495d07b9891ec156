package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text quality statistics as a native expression: punctuation
  * and digit counts, token count, summed token length, and stopword hits,
  * all from one walk over the UTF-8 bytes (the composed-builtin version
  * tokenizes three times and runs two regex passes per document).
  *
  * Semantics mirror the builtin formulation exactly so the DuckDB oracle
  * is unchanged: "punct" is the ASCII \p{Punct} class, tokens split on
  * Java \s whitespace, char counts are Unicode codepoints, and an
  * all-whitespace text yields the same 1-empty-token edge case as
  * split(trim(x), "\\s+").
  */
case class TextStats(child: Expression, stopwords: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = TextStats.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_stats"
  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)

  @transient private lazy val evaluator = new TextStats.Evaluator(stopwords.toArray)

  override def nullSafeEval(input: Any): Any =
    evaluator.eval(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evalRef = ctx.addReferenceObj("textStatsEvaluator", evaluator,
      classOf[TextStats.Evaluator].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $evalRef.eval($c.getBytes());")
  }
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false),
    StructField("stopword_hits", IntegerType, nullable = false)))

  final class Evaluator(stopwords: Array[String]) extends Serializable {
    // lowercase stopword bytes for case-insensitive token matching
    private val stopBytes: Array[Array[Byte]] =
      stopwords.map(_.toLowerCase.getBytes("UTF-8"))

    def eval(bytes: Array[Byte]): InternalRow = {
      val len = bytes.length
      var nChars = 0; var nPunct = 0; var nDigit = 0
      var nTokens = 0; var sumTokLen = 0L; var stopHits = 0
      var i = 0
      var tokStart = -1
      var tokChars = 0
      while (i <= len) {
        val atEnd = i == len
        val b = if (atEnd) ' '.toByte else bytes(i)
        val isCont = !atEnd && (b & 0xc0) == 0x80 // UTF-8 continuation byte
        if (!atEnd && !isCont) {
          nChars += 1
          if (b >= '0' && b <= '9') nDigit += 1
          else if ((b >= '!' && b <= '/') || (b >= ':' && b <= '@') ||
                   (b >= '[' && b <= '`') || (b >= '{' && b <= '~')) nPunct += 1
        }
        val space = atEnd || b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
        if (space) {
          if (tokStart >= 0) {
            nTokens += 1
            sumTokLen += tokChars
            if (isStopword(bytes, tokStart, i)) stopHits += 1
            tokStart = -1; tokChars = 0
          }
        } else {
          if (tokStart < 0) tokStart = i
          if (!isCont) tokChars += 1
        }
        i += 1
      }
      // split(trim(""), "\s+") yields one empty token
      if (nTokens == 0) nTokens = 1
      InternalRow(nChars, nPunct, nDigit, nTokens, sumTokLen, stopHits)
    }

    private def isStopword(bytes: Array[Byte], from: Int, until: Int): Boolean = {
      val n = until - from
      var s = 0
      while (s < stopBytes.length) {
        val sw = stopBytes(s)
        if (sw.length == n) {
          var k = 0
          var ok = true
          while (ok && k < n) {
            var c = bytes(from + k)
            if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
            if (c != sw(k)) ok = false
            k += 1
          }
          if (ok) return true
        }
        s += 1
      }
      false
    }
  }

  def apply(text: Column, stopwords: Seq[String]): Column =
    Bridge.toColumn(TextStats(Bridge.toExpression(text), stopwords))
}
