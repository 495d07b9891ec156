package graft.ops

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  test("binned range join equals the naive range-predicate join") {
    val epoch = lit("1970-01-01").cast("date")
    val iv = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-03-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      .select(col("o_orderkey"), datediff(col("o_orderdate"), epoch).as("lo"))
      .withColumn("hi", col("lo") + 7)
    val facts = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        datediff(col("l_shipdate"), epoch).as("ship_day"))

    val binned = RangeJoin
      .joinBinned(facts, col("ship_day"), iv, col("lo"), col("hi"), binWidth = 7L)
      .select("l_orderkey", "l_linenumber", "o_orderkey")
      .collect().map(_.toString).sorted
    val naive = facts.join(iv,
        col("ship_day") >= col("lo") && col("ship_day") <= col("hi"))
      .select("l_orderkey", "l_linenumber", "o_orderkey")
      .collect().map(_.toString).sorted

    assert(binned.nonEmpty)
    assert(binned.toSeq === naive.toSeq)
  }

  test("binned range join plans as a hash join on the bin key, not a nested loop") {
    val plan = RangeJoin.qRangeJoin(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join must not degrade to a nested loop:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi hash join on the bin key:\n$plan")
  }

  test("optimizer rule turns a RAW range-predicate join into a hash join automatically") {
    val epoch = lit("1970-01-01").cast("date")
    val iv = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-03-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      .select(col("o_orderkey"), datediff(col("o_orderdate"), epoch).as("lo"))
      .withColumn("hi", col("lo") + 7)
    val facts = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        datediff(col("l_shipdate"), epoch).as("ship_day"))
    def raw() = facts.join(iv,
      col("ship_day") >= col("lo") && col("ship_day") <= col("hi"))

    spark.conf.set("spark.graft.rangejoin.binShift", "3") // 8-day bins
    try {
      val plan = raw().queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rule must eliminate the nested loop:\n$plan")
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
      val rewritten = raw().select("l_orderkey", "l_linenumber", "o_orderkey")
        .collect().map(_.toString).sorted

      spark.conf.set("spark.graft.rangejoin.enabled", "false")
      val vanilla = raw()
      val vplan = vanilla.queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(vplan.contains("BroadcastNestedLoopJoin"),
        s"kill switch must restore the default plan:\n$vplan")
      val expected = vanilla.select("l_orderkey", "l_linenumber", "o_orderkey")
        .collect().map(_.toString).sorted
      assert(rewritten.nonEmpty)
      assert(rewritten.toSeq === expected.toSeq)
    } finally {
      spark.conf.unset("spark.graft.rangejoin.enabled")
      spark.conf.unset("spark.graft.rangejoin.binShift")
    }
  }

  test("optimizer rule stands down for equi joins and strict single bounds") {
    import spark.implicits._
    val a = Seq((1L, 5L)).toDF("k", "v")
    val b = Seq((1L, 3L)).toDF("k2", "w")
    // equi join: untouched (no Generate node in the plan)
    val equi = a.join(b, col("k") === col("k2")).queryExecution.optimizedPlan.toString
    assert(!equi.contains("__graft_bin"))
    // single inequality (no lower+upper pair): untouched
    val ineq = a.join(b, col("v") > col("w")).queryExecution.optimizedPlan.toString
    assert(!ineq.contains("__graft_bin"))
  }

  test("rule rewrite is exact on random intervals including negatives and strict bounds") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val facts = Seq.fill(400)((rnd.nextInt(4001) - 2000).toLong).toDF("p")
    val iv = Seq.tabulate(80) { i =>
      val a = (rnd.nextInt(4001) - 2000).toLong
      (i.toLong, a, a + rnd.nextInt(200))
    }.toDF("iv_id", "lo", "hi")

    def run(cond: org.apache.spark.sql.Column): Seq[String] =
      facts.join(iv, cond).select("p", "iv_id").collect().map(_.toString).sorted.toSeq

    for (cond <- Seq(
        col("p") >= col("lo") && col("p") <= col("hi"),
        col("p") > col("lo") && col("p") < col("hi"))) {
      val rewritten = run(cond)
      spark.conf.set("spark.graft.rangejoin.enabled", "false")
      val expected = try run(cond)
      finally spark.conf.unset("spark.graft.rangejoin.enabled")
      assert(rewritten === expected)
      assert(rewritten.nonEmpty)
    }
  }

  test("interval spanning multiple bins matches facts in every bin; one-bin facts never duplicate") {
    import spark.implicits._
    // interval [0, 20] with binWidth 7 covers bins 0..2; facts at 0, 7, 14, 20, 21
    val iv = Seq((1L, 0L, 20L)).toDF("iv_id", "lo", "hi")
    val facts = Seq(0L, 7L, 14L, 20L, 21L).toDF("p")
    val got = RangeJoin.joinBinned(facts, col("p"), iv, col("lo"), col("hi"), 7L)
      .select("p", "iv_id").collect().map(r => r.getLong(0)).sorted
    assert(got.toSeq === Seq(0L, 7L, 14L, 20L)) // 21 outside; no duplicates
  }
}
