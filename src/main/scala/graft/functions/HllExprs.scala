package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Deterministic HyperLogLog with a cross-engine closed form — the
  * approximate-distinct sketch the warehouse pattern stores as a column
  * (per-day / per-source registers that union by elementwise max), built
  * so a DuckDB oracle can recompute the registers AND the estimate
  * bit-for-bit:
  *
  *  - hash = splitmix64 finalizer of the raw long key (the same mix as
  *    [[SrpSignature]] — multiply by the golden-ratio increment, two
  *    avalanche rounds), mirrored in SQL via split 32-bit multiplies;
  *  - p = 12 (m = 4096 byte registers, ~1.6% standard error): register
  *    index = top 12 hash bits, rho = leading-zero rank of the remaining
  *    52-bit window + 1 (53 when the window is zero) — all integer, so
  *    the register ARRAYS agree exactly across engines;
  *  - estimate: E = alpha_m * m^2 / sum_j 2^(-M_j) with the standard
  *    small-range linear-counting branch (E <= 2.5m and empty registers
  *    present -> m * ln(m/V)). The harmonic sum is computed EXACTLY as
  *    the integer K = sum_j 2^(64-M_j) (fits well inside 128 bits), and
  *    K enters double arithmetic through the SAME high/low-32-bit split
  *    on both engines — sidestepping DuckDB's HUGEINT->DOUBLE cast,
  *    which is off nearest-even by 1 ulp near 2^67 (measured; see the
  *    corpus-fingerprint scaladoc). The only libm call is the ln of the
  *    linear-counting branch, rounded to a whole count.
  *
  * Unlike the engine-specific Datasketches HLL this replaces on the
  * driver surface, the estimate is oracle-checkable end to end — and
  * because the oracle aggregates the RAW table while the engine merges
  * pre-sketched register columns, a hash-green result PROVES the
  * merge algebra (union-of-sketches = sketch-of-union) rather than
  * assuming it.
  */
object HllSketch {
  val P = 12
  val M: Int = 1 << P // 4096
  val RhoMax = 53 // 64 - P + 1

  /** alpha_m * m^2 * 2^64 — the raw-estimate numerator, one double. */
  val C: Double =
    0.7213 / (1.0 + 1.079 / M) * M.toDouble * M.toDouble * 1.8446744073709552e19

  /** The ONE splitmix64 definition ([[Mix.splitmix64]]) — shared with
    * SrpSignature and the SRP oracle so the cross-engine hash story has
    * a single source of truth.
    */
  @inline def mix(x0: Long): Long = Mix.splitmix64(x0)

  /** Shuffle/storage encoding for partial register arrays: fine-grained
    * groups (hourly windows, small sources) touch few registers, so a
    * dense 4 KiB buffer per (group, partition) partial is mostly zeros.
    * Sparse form = 0x01 marker + (index:2B, value:1B) per non-zero
    * register, chosen whenever it is smaller; dense form = 0x00 + the
    * raw array. The aggregation buffer itself stays dense (O(1)
    * update/merge); only serialized bytes — what the exchange and the
    * sketch-column parquet actually carry — shrink. The OUTPUT column
    * (eval) stays dense so estimate expressions and the DuckDB mirror
    * read a fixed layout.
    */
  def serializeRegs(buf: Array[Byte]): Array[Byte] = {
    var nz = 0
    var i = 0
    while (i < buf.length) { if (buf(i) != 0) nz += 1; i += 1 }
    if (1 + 3 * nz >= 1 + buf.length) {
      val out = new Array[Byte](1 + buf.length)
      out(0) = 0
      System.arraycopy(buf, 0, out, 1, buf.length)
      out
    } else {
      val out = new Array[Byte](1 + 3 * nz)
      out(0) = 1
      var o = 1
      i = 0
      while (i < buf.length) {
        if (buf(i) != 0) {
          out(o) = (i >>> 8).toByte; out(o + 1) = i.toByte; out(o + 2) = buf(i)
          o += 3
        }
        i += 1
      }
      out
    }
  }

  def deserializeRegs(bytes: Array[Byte]): Array[Byte] = {
    val buf = new Array[Byte](M)
    if (bytes(0) == 0) {
      System.arraycopy(bytes, 1, buf, 0, M)
    } else {
      var o = 1
      while (o < bytes.length) {
        val j = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
        buf(j) = bytes(o + 2)
        o += 3
      }
    }
    buf
  }

  /** Fold one raw key into the register array (mutates buf). */
  def add(buf: Array[Byte], key: Long): Unit = {
    val h = mix(key)
    val j = (h >>> (64 - P)).toInt
    val w = h & ((1L << (64 - P)) - 1)
    val rho = if (w == 0L) RhoMax else java.lang.Long.numberOfLeadingZeros(w) - P + 1
    if (rho > buf(j)) buf(j) = rho.toByte
  }

  /** Elementwise-max merge (mutates a). */
  def merge(a: Array[Byte], b: Array[Byte]): Unit = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
  }

  /** The closed-form estimate from a register array — see the object
    * scaladoc for the cross-engine determinism argument.
    */
  def estimate(regs: Array[Byte]): Long = {
    // a wrong-length input is not a sketch — fail loudly rather than
    // return a silently absurd count (an empty array would estimate
    // C/0 = Infinity -> Long.MaxValue)
    require(regs.length == M,
      s"hll_estimate expects a $M-byte register array, got ${regs.length} bytes")
    // K = sum_j 2^(64-M_j) exactly, via a value histogram: register
    // values are bounded by RhoMax, so <=54 BigInt terms replace 4096
    // per-register shift-adds in this per-row scalar (identical exact K,
    // same cross-engine determinism argument)
    val hist = new Array[Int](RhoMax + 1)
    var i = 0
    while (i < regs.length) { hist(regs(i).toInt) += 1; i += 1 }
    val v = hist(0)
    var k = BigInt(0)
    var mj = 0
    while (mj <= RhoMax) {
      if (hist(mj) > 0) k += BigInt(hist(mj)) << (64 - mj)
      mj += 1
    }
    val kd = (k >> 32).toDouble * 4294967296.0 + (k & 0xffffffffL).toDouble
    val raw = C / kd
    val e = if (raw <= 2.5 * M && v > 0) M * math.log(M.toDouble / v) else raw
    math.round(e)
  }

  // ---- DuckDB oracle mirror ----------------------------------------

  // wrapping-multiply emulation + BIGINT<->UBIGINT lane casts live in
  // the shared [[MixSql]] (the IVF/PQ sample-order CTEs use them too)
  private def mixSql(x: String): String = MixSql.mix(x)
  private def toU64(col: String): String = MixSql.toU64(col)

  /** Oracle CTE chain: expects a prior CTE `hin($grpCols, uid BIGINT
    * NOT NULL)` (one row per raw key occurrence; duplicates fine) and
    * ends in `hest($grpCols, est_users)`. Callers LEFT JOIN `hest`
    * from their full group list and coalesce to 0 (a group whose keys
    * are all NULL has empty registers -> estimate 0 on the JVM side).
    */
  def estimateCtes(grpCols: String): String = {
    val rhoCase = (1 to 52)
      .map(r => s"WHEN w >= ${BigInt(1) << (52 - r)} THEN $r").mkString(" ")
    val p2rows = (1 to RhoMax)
      .map(mj => s"($mj, CAST('${BigInt(1) << (64 - mj)}' AS HUGEINT))").mkString(",")
    s"""hmix AS (SELECT $grpCols, ${mixSql(toU64("uid"))} AS h FROM hin),
       |hjw AS (SELECT $grpCols, CAST(h >> 52 AS INT) AS j,
       |        CAST(h % ${BigInt(1) << 52} AS UBIGINT) AS w FROM hmix),
       |hreg AS (SELECT $grpCols, j, max(CASE $rhoCase ELSE 53 END) AS mj
       |         FROM hjw GROUP BY $grpCols, j),
       |hp2(mj, pv) AS (VALUES $p2rows),
       |hk AS (SELECT $grpCols, $M - count(*) AS v,
       |         sum(hp2.pv) + ($M - count(*)) * CAST('18446744073709551616' AS HUGEINT) AS k
       |       FROM hreg JOIN hp2 ON hp2.mj = hreg.mj GROUP BY $grpCols),
       |hkd AS (SELECT $grpCols, v,
       |          CAST(k // 4294967296 AS DOUBLE) * 4294967296.0 +
       |          CAST(k % 4294967296 AS DOUBLE) AS kd FROM hk),
       |hest AS (SELECT $grpCols,
       |  CAST(round(CASE WHEN ($C / kd) <= ${2.5 * M} AND v > 0
       |    THEN $M.0 * ln($M.0 / v) ELSE $C / kd END, 0) AS BIGINT) AS est_users
       |  FROM hkd)""".stripMargin
  }
}

/** Per-group HLL register array over a LONG key column. */
case class HllRegAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_regs"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hll_regs needs a BIGINT key, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](HllSketch.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllSketch.add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    HllSketch.merge(buf, other); buf
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = HllSketch.serializeRegs(buf)
  override def deserialize(bytes: Array[Byte]): Array[Byte] = HllSketch.deserializeRegs(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegAgg =
    copy(child = newChild)
}

/** Union of pre-sketched register arrays (elementwise max) — the rollup
  * aggregate of the sketch-warehouse pattern.
  */
case class HllRegMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_regs_merge"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hll_regs_merge needs BINARY registers, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](HllSketch.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val regs = v.asInstanceOf[Array[Byte]]
      require(regs.length == HllSketch.M,
        s"register array of ${regs.length} bytes; expected the dense " +
          s"${HllSketch.M}-byte form hll_regs eval() emits — serialize()" +
          " output is the SPARSE encoding (pass it through" +
          " deserializeRegs first)")
      HllSketch.merge(buf, regs)
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    HllSketch.merge(buf, other); buf
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = HllSketch.serializeRegs(buf)
  override def deserialize(bytes: Array[Byte]): Array[Byte] = HllSketch.deserializeRegs(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegMergeAgg =
    copy(child = newChild)
}

/** Closed-form estimate from a register array (see [[HllSketch]]). */
case class HllEstimate(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hll_estimate"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hll_estimate needs BINARY registers, got ${child.dataType.catalogString}")
  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
  override def nullSafeEval(input: Any): Any =
    HllSketch.estimate(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HllSketch.estimate($c);")
}

object Hll {
  /** Column API: per-group registers over a BIGINT key. */
  def regAgg(key: Column): Column =
    Bridge.toColumn(HllRegAgg(Bridge.toExpression(key)).toAggregateExpression())

  /** Column API: union of register columns. */
  def mergeAgg(regs: Column): Column =
    Bridge.toColumn(HllRegMergeAgg(Bridge.toExpression(regs)).toAggregateExpression())

  /** Column API: distinct estimate of a register column. */
  def estimate(regs: Column): Column =
    Bridge.toColumn(HllEstimate(Bridge.toExpression(regs)))
}
