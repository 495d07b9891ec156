package graft.ops

import graft.SparkSuite

/** As-of join semantics on a handcrafted frame: prior-match, no-match,
  * same-instant inclusive match, and per-key isolation.
  */
class AsofSpec extends SparkSuite {

  test("joinLast attaches most recent prior right row, inclusive at ties") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 10L), // before any right row -> null
      (2L, "u1", 20L), // right at 20 exists -> inclusive match 200.0
      (3L, "u1", 35L), // latest right <= 35 is at 30 -> 300.0
      (4L, "u2", 50L), // other key, right at 15 -> 150.0
      (5L, "u3", 99L)  // key with no right rows -> null
    ).toDF("event_id", "user_id", "t")
    val right = Seq(
      ("u1", 20L, 200.0),
      ("u1", 30L, 300.0),
      ("u2", 15L, 150.0)
    ).toDF("user_id", "t", "px")

    val got = Asof.joinLast(left, right, "user_id", "t", Seq("px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(got(1L).isEmpty)
    assert(got(2L).contains(200.0))
    assert(got(3L).contains(300.0))
    assert(got(4L).contains(150.0))
    assert(got(5L).isEmpty)
  }

  test("duplicate (key, ts) right rows resolve deterministically; matched row's NULL payload survives") {
    import spark.implicits._
    val left = Seq((1L, "u1", 25L), (2L, "u2", 30L)).toDF("event_id", "user_id", "t")
    val right = Seq(
      ("u1", 20L, Option(200.0)),
      ("u1", 20L, Option(900.0)), // tie on (key, ts): largest payload struct wins
      ("u2", 10L, Option(100.0)),
      ("u2", 20L, Option.empty[Double]) // most recent prior row carries NULL
    ).toDF("user_id", "t", "px")
    def run(r: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
      Asof.joinLast(left, r, "user_id", "t", Seq("px"))
        .collect().map(row => row.getLong(0) -> Option(row.get(3)).map(_.asInstanceOf[Double])).toMap
    // result must not depend on the right side's partition layout
    Seq(right, right.repartition(7), right.coalesce(1)).foreach { r =>
      val got = run(r)
      assert(got(1L).contains(900.0), "tie must break to the largest payload, deterministically")
      assert(got(2L).isEmpty, "the matched row's NULL must win over an older non-null value")
    }
  }

  test("driver query runs and covers all events") {
    val df = Asof.qAsofJoin(spark, "/root/testdata/sf0.001")
    assert(df.count() === 1000)
    // purchases themselves must be matched to at least their own value
    assert(df.filter("last_purchase IS NOT NULL").count() > 0)
  }

  test("custom AsofJoinExec matches the composed form on every handcrafted case") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 10L), (2L, "u1", 20L), (3L, "u1", 35L),
      (4L, "u2", 50L), (5L, "u3", 99L)
    ).toDF("event_id", "user_id", "t")
    val right = Seq(
      ("u1", 20L, Option(200.0)), ("u1", 20L, Option(900.0)),
      ("u1", 30L, Option(300.0)), ("u2", 15L, Option(150.0)),
      ("u2", 40L, Option.empty[Double])
    ).toDF("user_id", "t", "px")
    def collectMap(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
      df.collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    // exec == composed, independent of the right side's partition layout
    val want = collectMap(Asof.joinLast(left, right, "user_id", "t", Seq("px")))
    Seq(right, right.repartition(7), right.coalesce(1)).foreach { r =>
      val got = collectMap(Asof.joinLastExec(left, r, "user_id", "t", Seq("px")))
      assert(got === want)
    }
    // spot-check semantics directly: tie -> largest payload; null-carrying
    // most-recent row wins; no-prior and no-key rows null
    assert(want(1L).isEmpty && want(2L).contains(900.0) && want(3L).contains(300.0))
    assert(want(5L).isEmpty)
  }

  test("AsofJoinExec over bucketed tables runs without an exchange") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, dir)
    Scale.writeBucketed(
      ev.select("event_id", "user_id", "ts"), "asof_left_b", "user_id", 8)
    Scale.writeBucketed(
      ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
        .select(org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("ts"),
          org.apache.spark.sql.functions.col("value").as("last_purchase")),
      "asof_right_b", "user_id", 8)
    val joined = Asof.joinLastExec(
      spark.table("asof_left_b"), spark.table("asof_right_b"),
      "user_id", "ts", Seq("last_purchase"))
    val plan = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"co-bucketed sides must merge without shuffling:\n$plan")
    // and the bucketed run returns the same rows as the plain one
    val want = Asof.joinLastExec(
      ev.select("event_id", "user_id", "ts"),
      ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
        .select(org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("ts"),
          org.apache.spark.sql.functions.col("value").as("last_purchase")),
      "user_id", "ts", Seq("last_purchase"))
      .collect().map(_.toString).sorted.toSeq
    assert(joined.collect().map(_.toString).sorted.toSeq === want)
  }

  test("AsofJoinExec equals joinLast on the full events table and plans as a streaming merge") {
    val df = Asof.qAsofExec(spark, "/root/testdata/sf0.001")
    val want = Asof.qAsofJoin(spark, "/root/testdata/sf0.001")
    assert(df.collect().map(_.toString).toSeq === want.collect().map(_.toString).toSeq)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("AsofJoin"), s"custom exec node must plan:\n$plan")
    assert(!plan.contains("Window"), s"no window pass in the exec path:\n$plan")
    assert(!plan.contains("Union"), s"no union of the sides in the exec path:\n$plan")
  }
}
