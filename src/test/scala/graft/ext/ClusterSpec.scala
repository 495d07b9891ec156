package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ClusterSpec extends SparkSuite {
  import spark.implicits._

  test("connectedComponents labels each node with its component minimum") {
    // two paths, a triangle, and a 2-cycle through shared structure
    val edges = Seq(
      (1L, 2L), (2L, 3L),          // path 1-2-3
      (10L, 11L),                  // pair
      (20L, 21L), (21L, 22L), (22L, 20L), // triangle
    ).toDF("u", "v")
    val got = Cluster.connectedComponents(edges)
      .orderBy("id").as[(Long, Long)].collect()
    assert(got === Array(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents converges past the 1-hop neighborhood (long chain)") {
    // a chain of diameter 7 requires multiple propagation rounds
    val edges = (1L until 8L).map(i => (i, i + 1)).toDF("u", "v")
    val labels = Cluster.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(labels.size === 8)
    assert(labels.values.toSet === Set(1L))
  }

  test("connectedComponents handles edge duplicates and both orientations") {
    val edges = Seq((2L, 1L), (1L, 2L), (2L, 1L), (3L, 2L)).toDF("u", "v")
    val labels = Cluster.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("connectedComponents matches a union-find reference on random graphs") {
    val rnd = new scala.util.Random(20260812L)
    for (_ <- 1 to 3) {
      val n = 60
      val es = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(ra) = rb
      }
      val expected = es.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> es.flatMap(e => Seq(e._1, e._2)).distinct
          .filter(u => find(u.toInt) == find(v.toInt)).min).toMap
      val got = Cluster.connectedComponents(es.toDF("u", "v"))
        .as[(Long, Long)].collect().toMap
      assert(got === expected)
    }
  }

  test("dedupCluster is consistent with the minhash pairs it clusters") {
    val dir = "/root/testdata/sf0.001"
    val clusters = Cluster.dedupCluster(spark, dir).collect()
    val byDoc = clusters.map(r => r.getLong(0) -> r.getLong(1)).toMap

    // every pair's endpoints land in the same cluster
    val pairs = Dedup.dedupMinhash(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) => assert(byDoc(a) === byDoc(b), s"pair ($a,$b) split") }

    // cluster id is the minimum member; exactly one canonical row per cluster
    val members = clusters.groupBy(_.getLong(1))
    members.foreach { case (cid, rows) =>
      assert(rows.map(_.getLong(0)).min === cid)
      assert(rows.count(_.getBoolean(3)) === 1)
      // cluster_size matches the member count
      rows.foreach(r => assert(r.getInt(2) === rows.length))
    }

    // clustered docs == docs that appear in at least one pair
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(byDoc.keySet === paired)
  }
}
