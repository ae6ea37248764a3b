package graft

import graft.operators.Pca

/** PCA: known-answer eigensolve, axis-aligned recovery, fixture gates. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen solves a known symmetric 2x2") {
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(vals.sorted.zip(Seq(1.0, 3.0)).forall {
      case (a, b) => math.abs(a - b) < 1e-10 })
    // eigenvector columns stay orthonormal
    val dot = vecs(0)(0) * vecs(0)(1) + vecs(1)(0) * vecs(1)(1)
    assert(math.abs(dot) < 1e-10)
  }

  test("fit recovers an axis-aligned dominant component, sign-fixed") {
    val df = Seq(
      Array(2.0f, 0.1f, 0.0f), Array(-2.0f, -0.1f, 0.0f),
      Array(1.0f, 0.05f, 0.1f), Array(-1.0f, -0.05f, -0.1f))
      .map(Tuple1(_)).toDF("v")
    val m = Pca.fit(df, "v", r = 1)
    assert(m.components.length == 1)
    val c = m.components(0)
    // dominant direction ≈ e1, sign-fixed positive
    assert(c(0) > 0.99, s"expected ~e1, got ${c.toSeq}")
    assert(m.eigenvalues(0) > 0.9 * m.totalVariance)
    // deterministic across fits
    val m2 = Pca.fit(df, "v", r = 1)
    assert(m2.components(0).toSeq == c.toSeq &&
      m2.eigenvalues.toSeq == m.eigenvalues.toSeq)
  }

  test("fixture embeddings: trace conserved, components orthonormal, projection shape") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val gate = Pca.metrics(emb, "embedding", r = 8, varianceFloor = 0.0)
      .as[(Long, Double, Boolean, Boolean, Boolean)].head()
    assert(gate._1 == 64L)
    assert(gate._3, "trace must equal the eigenvalue sum")
    assert(gate._4, "components must be orthonormal")
    val model = Pca.fit(emb, "embedding", r = 8)
    val proj = Pca.project(emb, "vec_id", "embedding", model)
    assert(proj.count() == emb.count())
    assert(proj.select("pca").head().getSeq[Double](0).length == 8)
    // captured variance is monotone in r and bounded by the total
    val m16 = Pca.fit(emb, "embedding", r = 16)
    val cap8 = model.eigenvalues.take(8).sum
    val cap16 = m16.eigenvalues.take(16).sum
    assert(cap8 <= cap16 + 1e-9 && cap16 <= m16.totalVariance + 1e-9)
  }

  test("projection coordinates have variance equal to the eigenvalues") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val model = Pca.fit(emb, "embedding", r = 3)
    val proj = Pca.project(emb, "vec_id", "embedding", model)
    val vars = proj.selectExpr(
      "var_pop(pca[0]) AS v0", "var_pop(pca[1]) AS v1", "var_pop(pca[2]) AS v2")
      .as[(Double, Double, Double)].head()
    Seq(vars._1, vars._2, vars._3).zip(model.eigenvalues.take(3)).foreach {
      case (v, l) => assert(math.abs(v - l) < 1e-6 * math.max(1.0, l),
        s"projected variance $v must match eigenvalue $l")
    }
  }
}
