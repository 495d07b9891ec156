package graft

/** Smoke coverage: every declared query runs non-empty on sf0.001 and
  * every oracle key has a matching query (value-level parity is the
  * driver's DuckDB gate + tools/check_oracle.py).
  */
class ParitySpec extends SparkSuite {
  val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs non-empty on sf0.001") {
      assert(fn(spark, sfDir).count() > 0)
    }
  }
}
