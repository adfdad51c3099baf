package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class OpqSpec extends AnyFunSuite {

  private def matMulVec(a: Array[Array[Double]], x: Array[Double]) =
    Array.tabulate(a.length)(i =>
      a(i).zip(x).map { case (v, w) => v * w }.sum)

  test("jacobi eigensolver: A v = lambda v on a known symmetric matrix") {
    val a = Array(
      Array(4.0, 1.0, 0.5),
      Array(1.0, 3.0, 0.25),
      Array(0.5, 0.25, 2.0))
    val (eig, v) = Opq.jacobiEigSym(a)
    for (j <- 0 until 3) {
      val vj = Array.tabulate(3)(r => v(r)(j))
      val av = matMulVec(a, vj)
      for (r <- 0 until 3)
        assert(math.abs(av(r) - eig(j) * vj(r)) < 1e-8,
          s"column $j: A*v=${av.toSeq} vs lambda*v=${vj.map(_ * eig(j)).toSeq}")
    }
  }

  test("procrustes returns an orthogonal matrix; recovers a pure rotation") {
    // C already orthogonal (a permutation-ish rotation) -> R == C
    val theta = 0.7
    val c = Array(
      Array(math.cos(theta), -math.sin(theta), 0.0),
      Array(math.sin(theta), math.cos(theta), 0.0),
      Array(0.0, 0.0, 1.0))
    val r = Opq.procrustes(c)
    for (i <- 0 until 3; j <- 0 until 3)
      assert(math.abs(r(i)(j) - c(i)(j)) < 1e-8, s"R($i)($j)=${r(i)(j)}")
    // orthogonality: R R^T = I
    for (i <- 0 until 3; j <- 0 until 3) {
      val dot = (0 until 3).map(k => r(i)(k) * r(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8)
    }
  }

  test("OPQ monotonically improves on plain PQ for cross-subspace correlation") {
    // pairs (x1,x2) and (x5,x6) strongly correlated ACROSS the subDim=2
    // subspace boundaries {0,1}|{2,3}|{4,5}|{6,7}: the identity grid wastes
    // bits; a rotation aligns each correlated pair into one subspace
    val rng = new scala.util.Random(11)
    val sample = Array.fill(600) {
      val z1 = rng.nextGaussian(); val z2 = rng.nextGaussian()
      val z3 = rng.nextGaussian(); val z4 = rng.nextGaussian()
      Array(
        z1, z2, z2 + 0.02 * rng.nextGaussian(), z3,
        z3 + 0.02 * rng.nextGaussian(), z4, z4 + 0.02 * rng.nextGaussian(),
        z1 + 0.02 * rng.nextGaussian())
    }
    val model = Opq.train(sample, m = 4, codebookSize = 8, opqIters = 10)
    val e0 = model.errors.head // plain PQ (R = identity)
    val eN = model.errors.last
    assert(eN <= e0 + 1e-9, s"OPQ worsened: $eN > $e0")
    assert(eN < 0.93 * e0,
      s"OPQ should clearly beat plain PQ on correlated data: $eN vs $e0")
    // the learned rotation is orthogonal
    val r = model.rotation
    val dim = r.length
    for (i <- 0 until dim; j <- 0 until dim) {
      val dot = (0 until dim).map(k => r(i)(k) * r(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-7,
        s"R R^T($i)($j) = $dot")
    }
  }
}
