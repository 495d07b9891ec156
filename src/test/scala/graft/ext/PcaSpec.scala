package graft.ext

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def collected: Array[Array[Double]] =
    Tables.embeddings(spark, dir)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)

  private def covApply(es: Array[Array[Double]], mu: Array[Double],
      v: Array[Double]): Array[Double] = {
    val d = mu.length; val out = new Array[Double](d)
    es.foreach { e =>
      var s = 0.0
      var j = 0
      while (j < d) { s += (e(j) - mu(j)) * v(j); j += 1 }
      j = 0
      while (j < d) { out(j) += (e(j) - mu(j)) * s; j += 1 }
    }
    out.map(_ / es.length)
  }

  test("distributed power iteration lands on a true eigenpair of the centered covariance") {
    val (v, lambda, mu) = Pca.topComponent(Tables.embeddings(spark, dir))
    val es = collected
    // exact driver-side mean matches the distributed one
    val muRef = es.transpose.map(c => c.sum / c.length)
    mu.indices.foreach(j => assert(math.abs(mu(j) - muRef(j)) < 1e-9))
    // eigenpair property: C·v = lambda·v (checked with driver-exact C·v)
    val cv = covApply(es, muRef, v)
    val residual = math.sqrt(
      v.indices.map(j => math.pow(cv(j) - lambda * v(j), 2)).sum) / lambda
    assert(residual < 1e-3, s"residual $residual")
    // lambda is the dominant eigenvalue: no unit vector we can easily try
    // beats the Rayleigh quotient (spot-check the coordinate axes)
    val rayleigh = v.indices.map(j => cv(j) * v(j)).sum
    (0 until mu.length).foreach { axis =>
      val a = Array.tabulate(mu.length)(j => if (j == axis) 1.0 else 0.0)
      val ca = covApply(es, muRef, a)
      assert(ca(axis) <= rayleigh + 1e-9, s"axis $axis beats PC1")
    }
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9, "v is unit")
    assert(lambda > 0)
  }

  test("pca scores are the centered projections, invariant to partitioning") {
    val emb = Tables.embeddings(spark, dir)
    val base = Pca.pcaScores(emb).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val repart = Pca.pcaScores(emb.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(base.length === repart.length && base.nonEmpty)
    base.zip(repart).foreach { case ((id1, s1), (id2, s2)) =>
      assert(id1 === id2)
      assert(math.abs(s1 - s2) < 1e-3, s"vec $id1: $s1 vs $s2")
    }
    // scores actually separate: nonzero spread
    val ss = base.map(_._2)
    assert(ss.max - ss.min > 0.1)
  }

  test("top-3 components are orthonormal with descending eigenvalues") {
    val (comps, mu, trace) =
      Pca.topComponents(Tables.embeddings(spark, dir), 3)
    assert(comps.length === 3)
    val es = collected
    val muRef = es.transpose.map(c => c.sum / c.length)
    comps.foreach { case (v, lambda) =>
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
      // each is an eigenpair of the ORIGINAL covariance (deflation only
      // removes previous components, which are orthogonal)
      val cv = covApply(es, muRef, v)
      val residual = math.sqrt(
        v.indices.map(j => math.pow(cv(j) - lambda * v(j), 2)).sum) / lambda
      assert(residual < 1e-6, s"residual $residual")
    }
    val Seq(l1, l2, l3) = comps.map(_._2).toSeq
    assert(l1 >= l2 && l2 >= l3 && l3 > 0)
    assert(l1 + l2 + l3 <= trace + 1e-9)
    // pairwise orthogonal
    for (a <- 0 until 3; b <- (a + 1) until 3) {
      val dot = comps(a)._1.zip(comps(b)._1).map { case (x, y) => x * y }.sum
      assert(math.abs(dot) < 1e-7, s"components $a,$b not orthogonal: $dot")
    }
    assert(mu.length === comps.head._1.length)
  }

  test("whitened top-k equals brute-force residual cosine on collected vectors") {
    val emb = Tables.embeddings(spark, dir)
    val (v, _, mu) = Pca.topComponent(emb)
    val rows = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val d = mu.length
    def resid(e: Array[Double]): Array[Double] = {
      val c = Array.tabulate(d)(j => e(j) - mu(j))
      val s = c.indices.map(j => c(j) * v(j)).sum
      Array.tabulate(d)(j => c(j) - s * v(j))
    }
    val rq = resid(rows(0L))
    def cos(a: Array[Double], b: Array[Double]) = {
      val num = a.indices.map(j => a(j) * b(j)).sum
      num / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val want = rows.toSeq.filter(_._1 != 0L)
      .map { case (id, e) => (id, math.rint(cos(rq, resid(e)) * 10000) / 10000) }
      .sortBy { case (id, c) => (-c, id) }.take(10)
    val got = Pca.whitenedTopk(emb).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    got.zip(want).foreach { case ((gi, gc), (wi, wc)) =>
      assert(math.abs(gc - wc) < 2e-4, s"score for $gi/$wi: $gc vs $wc")
    }
    // same id set (rounding can swap adjacent ties in order)
    assert(got.map(_._1).toSet === want.map(_._1).toSet)
    // whitening actually changes something vs plain cosine top-10
    val plain = rows.toSeq.filter(_._1 != 0L)
      .map { case (id, e) => (id, cos(rows(0L), e)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    assert(plain.nonEmpty && got.map(_._1).toSet.nonEmpty)
  }
}
