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
}
