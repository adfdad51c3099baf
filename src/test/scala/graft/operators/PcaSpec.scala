package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Pca]] — planted-covariance recovery, projection laws, and the
  * distributed-moments invariances.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic anisotropic 3-d cloud: x = t·u + small structured
  // noise, with u the dominant axis. Variances along the three PCA axes
  // are well separated by construction.
  private val u = Array(3.0 / math.sqrt(50), 4.0 / math.sqrt(50),
    5.0 / math.sqrt(50))
  private lazy val cloud: Seq[Array[Double]] = (0 until 2000).map { i =>
    val t = math.sin(i * 0.7) * 10.0 // spread along u, sd ~ 7
    val n1 = math.cos(i * 1.3) * 1.0 // orthogonal-ish noise
    val n2 = math.sin(i * 2.1) * 0.3
    Array(
      t * u(0) + n1 * 0.8 + n2 * 0.1,
      t * u(1) - n1 * 0.6 + n2 * 0.2,
      t * u(2) + n2 * 0.9)
  }

  private lazy val df = cloud.map(Tuple1(_)).toDF("v")

  test("top component aligns with the planted dominant axis and " +
      "eigenvalues descend") {
    val m = Pca.fit(df, "v", k = 3, dim = 3)
    assert(m.n === 2000L)
    val cos = m.components(0).zip(u).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.99, s"top component off-axis: $cos")
    assert(m.eigenvalues(0) >= m.eigenvalues(1) &&
      m.eigenvalues(1) >= m.eigenvalues(2))
    assert(m.eigenvalues(0) > 10 * m.eigenvalues(1),
      "planted dominance not recovered")
    // trace = sum of ALL eigenvalues at k = dim
    assert(math.abs(m.eigenvalues.sum - m.trace) < 1e-9 * m.trace)
  }

  test("kept components are orthonormal") {
    val m = Pca.fit(df, "v", k = 3, dim = 3)
    for (i <- 0 until 3; j <- i until 3) {
      val dot = m.components(i).zip(m.components(j))
        .map { case (a, b) => a * b }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"($i,$j)")
    }
  }

  test("projected coordinates have variance == eigenvalue and mean 0 " +
      "(the distributed MatVec projection matches the model)") {
    val m = Pca.fit(df, "v", k = 2, dim = 3)
    val p = df.select(Pca.project(col("v"), m).as("p"))
    val r = p.agg(
      var_pop(col("p")(0)), var_pop(col("p")(1)),
      avg(col("p")(0)), avg(col("p")(1))).head()
    assert(math.abs(r.getDouble(0) - m.eigenvalues(0)) < 1e-9 * m.trace)
    assert(math.abs(r.getDouble(1) - m.eigenvalues(1)) < 1e-9 * m.trace)
    assert(math.abs(r.getDouble(2)) < 1e-9 && math.abs(r.getDouble(3)) < 1e-9)
  }

  test("moments pass is repartition-invariant (to merge-order ulps)") {
    val m1 = Pca.fit(df.repartition(1), "v", k = 3, dim = 3)
    val m7 = Pca.fit(df.repartition(7), "v", k = 3, dim = 3)
    m1.eigenvalues.zip(m7.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9 * math.max(1.0, m1.trace))
    }
    m1.mean.zip(m7.mean).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12)
    }
  }

  test("float input casts through; dim mismatch raises") {
    val f = cloud.take(10).map(a => Tuple1(a.map(_.toFloat))).toDF("v")
    val m = Pca.fit(f, "v", k = 1, dim = 3)
    assert(m.n === 10L)
    val bad = Seq(Tuple1(Array(1.0, 2.0))).toDF("v")
    val e = intercept[Exception] { Pca.fit(bad, "v", k = 1, dim = 3) }
    assert(e.getMessage != null)
  }
}
