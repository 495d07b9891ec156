package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.LongType

/** SQL-surface registration for the native expressions, so the engine's
  * custom operators are first-class from `spark.sql(...)` as well as the
  * Column API:
  *
  *   spark.sql("SELECT simhash(text, 3) FROM docs")
  *
  * Two registration paths: [[GraftExtensions]] for
  * `SparkSession.builder.withExtensions` / the
  * `spark.sql.extensions` config (cluster deployment), and
  * [[registerAll]] for an already-built session (tests, driver contract).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftFunctions._
  override def apply(ext: SparkSessionExtensions): Unit = {
    all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // whole-plan rewrites: range-predicate joins become binned equi joins
    ext.injectOptimizerRule(_ => new graft.plans.RangeJoinRule)
    // whole-operator semantics Spark lacks: the as-of join's logical node
    // plans to the streaming merge exec (preference-order (c))
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}

object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int argument, got $other")
  }

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("rolling_hash_fingerprint",
      new ExpressionInfo(classOf[RollingHashFingerprint].getName, "rolling_hash_fingerprint"),
      (args: Seq[Expression]) =>
        RollingHashFingerprint(args.head, intArg(args(1), "window"))),
    ("winnow_fingerprints",
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (args: Seq[Expression]) =>
        WinnowFingerprints(args.head, intArg(args(1), "kgram"), intArg(args(2), "winnowWin"))),
    ("minhash_signature",
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) =>
        MinHashSignature(args.head, intArg(args(1), "n"), intArg(args(2), "k"))),
    ("simhash",
      new ExpressionInfo(classOf[SimHash].getName, "simhash"),
      (args: Seq[Expression]) => SimHash(args.head, intArg(args(1), "n"))),
    ("shingle_hash_set",
      new ExpressionInfo(classOf[ShingleHashSet].getName, "shingle_hash_set"),
      (args: Seq[Expression]) => ShingleHashSet(args.head, intArg(args(1), "n"))),
    ("jaccard_sorted",
      new ExpressionInfo(classOf[JaccardSorted].getName, "jaccard_sorted"),
      (args: Seq[Expression]) => JaccardSorted(args.head, args(1))),
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))),
    ("morton_interleave",
      new ExpressionInfo(classOf[MortonInterleave].getName, "morton_interleave"),
      // normalize int-typed SQL keys to long (the expression evaluates raw longs)
      (args: Seq[Expression]) => MortonInterleave(
        Cast(args.head, LongType), Cast(args(1), LongType))),
    ("lang_id",
      new ExpressionInfo(classOf[LangId].getName, "lang_id"),
      (args: Seq[Expression]) => LangId(args.head)),
    ("word_shingles",
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => WordShingles(args.head, intArg(args(1), "n"))),
    ("char_ngrams",
      new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
      (args: Seq[Expression]) => CharNgrams(args.head, intArg(args(1), "n"))),
    ("repetition_stats",
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      (args: Seq[Expression]) => RepetitionStats(args.head)),
    ("quantize_int8",
      new ExpressionInfo(classOf[QuantizeInt8].getName, "quantize_int8"),
      (args: Seq[Expression]) => QuantizeInt8(args.head)),
    ("dequantize_int8",
      new ExpressionInfo(classOf[DequantizeInt8].getName, "dequantize_int8"),
      (args: Seq[Expression]) => DequantizeInt8(args.head, args(1))),
    ("char_bitmap",
      new ExpressionInfo(classOf[CharBitmap].getName, "char_bitmap"),
      (args: Seq[Expression]) => CharBitmap(args.head)),
    ("srp_signature",
      new ExpressionInfo(classOf[SrpSignature].getName, "srp_signature"),
      (args: Seq[Expression]) => SrpSignature(args.head, intArg(args(1), "bits"))),
    ("deflate_ratio",
      new ExpressionInfo(classOf[DeflateRatio].getName, "deflate_ratio"),
      (args: Seq[Expression]) => DeflateRatio(args.head)),
    ("anchored_spans",
      new ExpressionInfo(classOf[AnchoredSpans].getName, "anchored_spans"),
      (args: Seq[Expression]) =>
        AnchoredSpans(args.head, intArg(args(1), "window"), intArg(args(2), "modulus"))),
    ("common_prefix_length",
      new ExpressionInfo(classOf[CommonPrefixLength].getName, "common_prefix_length"),
      (args: Seq[Expression]) => CommonPrefixLength(args.head, args(1))),
    ("word_suffix_windows",
      new ExpressionInfo(classOf[WordSuffixWindows].getName, "word_suffix_windows"),
      (args: Seq[Expression]) => WordSuffixWindows(args.head, intArg(args(1), "cap"))),
    // the standard quality-gate stopword set (same list every caller uses)
    ("text_stats",
      new ExpressionInfo(classOf[TextStats].getName, "text_stats"),
      (args: Seq[Expression]) =>
        TextStats(args.head, Seq("the", "a", "of", "and", "to", "in"))),
    // deterministic cross-engine HLL (see HllSketch): register aggregate,
    // union aggregate, and closed-form estimate
    ("hll_regs",
      new ExpressionInfo(classOf[HllRegAgg].getName, "hll_regs"),
      (args: Seq[Expression]) => HllRegAgg(args.head).toAggregateExpression()),
    ("hll_regs_merge",
      new ExpressionInfo(classOf[HllRegMergeAgg].getName, "hll_regs_merge"),
      (args: Seq[Expression]) => HllRegMergeAgg(args.head).toAggregateExpression()),
    ("hll_estimate",
      new ExpressionInfo(classOf[HllEstimate].getName, "hll_estimate"),
      (args: Seq[Expression]) => HllEstimate(args.head)))

  /** Register on a live session (temp functions in the session registry). */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
