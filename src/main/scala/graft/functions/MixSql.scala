package graft.functions

/** DuckDB-SQL mirror of [[Mix.splitmix64]] — the ONE place the oracle
  * side of every hash-derived construction (HLL key hashing, the
  * IVF/PQ training-sample order) re-expresses the JVM's wrapping
  * 64-bit arithmetic. DuckDB BIGINT multiplication raises on overflow,
  * so the golden-ratio multiplies are emulated as split 32-bit products
  * mod 2^64 over HUGEINT ([[mulMod64]]); shifts and xors act on
  * UBIGINT lanes directly.
  */
object MixSql {

  /** `(x * k) mod 2^64` over a UBIGINT SQL expression with the multiply
    * split into 32-bit halves of k — the direct HUGEINT product of two
    * 64-bit values overflows INT128. Public: the FNV/avalanche shingle
    * CTEs ([[graft.ext.Dedup]]) build their own multiply chains from it.
    */
  def mulMod64(x: String, k: BigInt): String = {
    val m = BigInt(1) << 64
    val (kh, kl) = (k >> 32, k & 0xffffffffL)
    s"""CAST(CAST(((CAST($x AS HUGEINT) * $kl) +
       |  ((((CAST($x AS HUGEINT) % 4294967296) * $kh) % 4294967296) * 4294967296))
       |  % CAST('$m' AS HUGEINT) AS HUGEINT) AS UBIGINT)""".stripMargin
  }

  /** splitmix64 of a UBIGINT SQL expression, as nested CTE-free SQL. */
  def mix(x: String): String = {
    val s1 = mulMod64(x, BigInt("9e3779b97f4a7c15", 16))
    val s2 = mulMod64(s"xor(($s1), ($s1) >> 30)", BigInt("bf58476d1ce4e5b9", 16))
    val s3 = mulMod64(s"xor(($s2), ($s2) >> 27)", BigInt("94d049bb133111eb", 16))
    s"xor(($s3), ($s3) >> 31)"
  }

  /** Two's-complement BIGINT -> UBIGINT (negative keys wrap, matching
    * the JVM's untyped 64-bit lanes).
    */
  def toU64(col: String): String =
    s"""CAST(CASE WHEN $col >= 0 THEN CAST($col AS HUGEINT)
       |  ELSE CAST($col AS HUGEINT) + CAST('18446744073709551616' AS HUGEINT)
       |  END AS UBIGINT)""".stripMargin

  /** UBIGINT -> the signed two's-complement HUGEINT value — an
    * ORDER-preserving image of how the JVM compares the same 64 bits as
    * a signed Long (sort keys must agree across engines, and DuckDB
    * sorts UBIGINT unsigned while Spark sorts LongType signed).
    */
  def toS64(col: String): String =
    s"""(CAST($col AS HUGEINT) -
       |  CASE WHEN $col >= CAST('9223372036854775808' AS UBIGINT)
       |       THEN CAST('18446744073709551616' AS HUGEINT) ELSE 0 END)""".stripMargin

  /** CTE chain ending in `<p>samp($key, rk)`: the first `limit` rows of
    * `table` in splitmix64($key) order with $key tie-break, rk the
    * 0-based position in that order — the SQL mirror of a Spark
    * `orderBy(mix64(key), key).limit(n)` draw. ONE definition behind
    * the IVF and PQ training-sample oracles so the sampling discipline
    * cannot drift between the two quantizers.
    */
  def hashSampleCtes(p: String, table: String, key: String, limit: Int): String =
    s"""${p}sampu AS (SELECT $key,
       |  ${mix(toU64(key))} AS mku
       |  FROM $table),
       |${p}sampo AS (SELECT $key, ${toS64("mku")} AS mk FROM ${p}sampu),
       |${p}samp AS MATERIALIZED (
       |  SELECT $key, row_number() OVER (ORDER BY mk, $key) - 1 AS rk
       |  FROM ${p}sampo ORDER BY mk, $key LIMIT $limit)""".stripMargin
}
