package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class HnswSpec extends AnyFunSuite {

  private def randUnit(rng: scala.util.Random, dim: Int): Array[Double] =
    Pq.normalize(Array.fill(dim)(rng.nextGaussian()))

  test("HNSW top-k recall >= 0.9 vs brute force on random unit vectors") {
    val dim = 16
    val n = 500
    val rng = new scala.util.Random(3)
    val vecs = Array.fill(n)(randUnit(rng, dim))
    val g = new Hnsw(dim, m = 16, efConstruction = 128, seed = 5L)
    vecs.zipWithIndex.foreach { case (v, i) => g.insert(i.toLong, v) }

    val k = 10
    var hits = 0
    var total = 0
    for (qi <- 0 until 20) {
      val q = randUnit(rng, dim)
      val exact = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.zip(q).map(t => t._1 * t._2).sum) }
        .sortBy { case (i, s) => (-s, i) }
        .take(k).map(_._1).toSet
      val approx = g.search(q, k, ef = 128).map(_._1).toSet
      hits += exact.intersect(approx).size
      total += k
    }
    val recall = hits.toDouble / total
    assert(recall >= 0.9, s"HNSW recall $recall too low")
  }

  test("HNSW returns exact cosines for the neighbors it finds") {
    val dim = 8
    val rng = new scala.util.Random(9)
    val vecs = Array.fill(100)(randUnit(rng, dim))
    val g = new Hnsw(dim)
    vecs.zipWithIndex.foreach { case (v, i) => g.insert(i.toLong, v) }
    val q = randUnit(rng, dim)
    g.search(q, 5, 64).foreach { case (id, cos) =>
      val exact = vecs(id.toInt).zip(q).map(t => t._1 * t._2).sum
      assert(math.abs(cos - exact) < 1e-12)
    }
  }

  test("dump/restore answers searches identically to the original graph") {
    val dim = 12
    val rng = new scala.util.Random(21)
    val vecs = Array.fill(300)(randUnit(rng, dim))
    val g = new Hnsw(dim, seed = 13L)
    vecs.zipWithIndex.foreach { case (v, i) => g.insert(i.toLong, v) }
    val restored = Hnsw.restore(dim, g.dump().toSeq)
    for (qi <- 0 until 10) {
      val q = randUnit(rng, dim)
      assert(g.search(q, 8, 64) == restored.search(q, 8, 64))
    }
  }

  test("restored graph accepts incremental inserts") {
    val dim = 12
    val rng = new scala.util.Random(31)
    val vecs = Array.fill(200)(randUnit(rng, dim))
    val g = new Hnsw(dim, seed = 3L)
    vecs.take(150).zipWithIndex.foreach { case (v, i) => g.insert(i.toLong, v) }
    val restored = Hnsw.restore(dim, g.dump().toSeq)
    // append the remaining 50 to the RESTORED graph
    vecs.drop(150).zipWithIndex.foreach { case (v, i) =>
      restored.insert(150L + i, v)
    }
    assert(restored.size == 200)
    // a query very close to an appended vector must find it
    val probe = vecs(180)
    val top = restored.search(probe, 1, 64)
    assert(top.head._1 == 180L, s"expected appended node, got $top")
  }

  test("deterministic for fixed seed and insert order") {
    val dim = 8
    val rng = new scala.util.Random(1)
    val vecs = Array.fill(200)(randUnit(rng, dim))
    def run(): Seq[(Long, Double)] = {
      val g = new Hnsw(dim, seed = 77L)
      vecs.zipWithIndex.foreach { case (v, i) => g.insert(i.toLong, v) }
      g.search(vecs(0), 10, 64)
    }
    assert(run() == run())
  }
}
