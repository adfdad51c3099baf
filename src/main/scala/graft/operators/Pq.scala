package graft.operators

import scala.util.Random

/** Driver-side training for IVF-PQ (coarse quantizer + per-subspace product
  * codebooks). Training always runs on a BOUNDED sample collected to the
  * driver (a few thousand vectors), so its cost is independent of corpus
  * size; the trained arrays are inlined into native expressions
  * ([[graft.functions.expr.PqEncodeExpr]] /
  * [[graft.functions.expr.IvfPqAdcScoreExpr]]) for the distributed encode and
  * scan phases. Jegou et al., "Product Quantization for Nearest Neighbor
  * Search" (TPAMI 2011) is the published reference for the method.
  */
object Pq {

  /** IVF-PQ model: `coarse` cell centroids (nList x dim) and per-subspace
    * residual codebooks (m x codebookSize x subDim).
    */
  final case class IvfPqModel(
      coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def subDim: Int = codebooks(0)(0).length
    def dim: Int = m * subDim
  }

  /** Seeded Lloyd's k-means over primitive double arrays; empty clusters are
    * re-seeded from random points. Deterministic for a fixed seed.
    */
  def lloyd(points: Array[Array[Double]], k: Int, iters: Int,
      seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "k-means needs a non-empty sample")
    val dim = points(0).length
    val n = points.length
    val kk = math.min(k, n)
    val rng = new Random(seed)
    val cents = rng.shuffle(points.indices.toVector).take(kk)
      .map(points(_).clone).toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      var pi = 0
      while (pi < n) {
        val p = points(pi)
        var best = 0
        var bd = Double.MaxValue
        var j = 0
        while (j < kk) {
          val c = cents(j)
          var d = 0.0
          var i = 0
          while (i < dim) { val r = p(i) - c(i); d += r * r; i += 1 }
          if (d < bd) { bd = d; best = j }
          j += 1
        }
        counts(best) += 1
        val sb = sums(best)
        var i = 0
        while (i < dim) { sb(i) += p(i); i += 1 }
        pi += 1
      }
      var j = 0
      while (j < kk) {
        if (counts(j) > 0) {
          var i = 0
          while (i < dim) { cents(j)(i) = sums(j)(i) / counts(j); i += 1 }
        } else cents(j) = points(rng.nextInt(n)).clone
        j += 1
      }
      it += 1
    }
    cents
  }

  /** L2-normalize in place-copy; zero vectors pass through unchanged. */
  def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    if (s == 0.0) v
    else {
      val n = math.sqrt(s)
      val out = new Array[Double](v.length)
      i = 0
      while (i < v.length) { out(i) = v(i) / n; i += 1 }
      out
    }
  }

  /** Train coarse centroids and residual codebooks from a normalized sample.
    *
    * @param sample        already-collected (and normalized) vectors
    * @param nList         number of IVF cells
    * @param m             number of PQ subspaces (must divide dim)
    * @param codebookSize  entries per subspace codebook
    */
  def train(sample: Array[Array[Double]], nList: Int, m: Int,
      codebookSize: Int, iters: Int = 10, seed: Long = 42L): IvfPqModel = {
    val dim = sample(0).length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    val coarse = lloyd(sample, nList, iters, seed)

    // residuals of each sample point against its nearest coarse centroid
    val residuals = sample.map { p =>
      var best = 0
      var bd = Double.MaxValue
      var j = 0
      while (j < coarse.length) {
        val c = coarse(j)
        var d = 0.0
        var i = 0
        while (i < dim) { val r = p(i) - c(i); d += r * r; i += 1 }
        if (d < bd) { bd = d; best = j }
        j += 1
      }
      val c = coarse(best)
      val r = new Array[Double](dim)
      var i = 0
      while (i < dim) { r(i) = p(i) - c(i); i += 1 }
      r
    }

    val codebooks = Array.tabulate(m) { s =>
      val sub = residuals.map(_.slice(s * subDim, (s + 1) * subDim))
      lloyd(sub, codebookSize, iters, seed + 1 + s)
    }
    IvfPqModel(coarse, codebooks)
  }

  /** Two-level model: [[IvfPqModel]] plus per-subspace codebooks for the
    * SECOND-ORDER residual (what level 1 failed to reconstruct).
    */
  final case class IvfPq2Model(base: IvfPqModel,
      codebooks2: Array[Array[Array[Double]]]) {
    def coarse: Array[Array[Double]] = base.coarse
    def codebooks: Array[Array[Array[Double]]] = base.codebooks
  }

  /** Residual re-quantization (two-level PQ / RQ): train level-1 codebooks
    * as in [[train]], encode the sample with them, then train level-2
    * codebooks on the reconstruction error. Doubles the code bytes per
    * vector but squares down the quantization error — the standard
    * accuracy/size middle ground between PQ and exact re-rank (Chen et al.
    * 2010 residual vector quantization; the refinement stage of
    * Jegou et al. 2011 §V).
    */
  def train2(sample: Array[Array[Double]], nList: Int, m: Int,
      codebookSize: Int, iters: Int = 10, seed: Long = 42L): IvfPq2Model = {
    val base = train(sample, nList, m, codebookSize, iters, seed)
    val dim = sample(0).length
    val subDim = dim / m

    // second-order residuals: r2 = (p - coarse) - cb1[nearest]
    val residuals2 = sample.map { p =>
      var best = 0
      var bd = Double.MaxValue
      var j = 0
      while (j < base.coarse.length) {
        val c = base.coarse(j)
        var d = 0.0
        var i = 0
        while (i < dim) { val r = p(i) - c(i); d += r * r; i += 1 }
        if (d < bd) { bd = d; best = j }
        j += 1
      }
      val cent = base.coarse(best)
      val r2 = new Array[Double](dim)
      var s = 0
      while (s < m) {
        val off = s * subDim
        val cb = base.codebooks(s)
        var bestE = 0
        var bestD = Double.MaxValue
        var e = 0
        while (e < cb.length) {
          val entry = cb(e)
          var d = 0.0
          var i = 0
          while (i < subDim) {
            val r = p(off + i) - cent(off + i) - entry(i)
            d += r * r
            i += 1
          }
          if (d < bestD) { bestD = d; bestE = e }
          e += 1
        }
        val chosen = cb(bestE)
        var i = 0
        while (i < subDim) {
          r2(off + i) = p(off + i) - cent(off + i) - chosen(i)
          i += 1
        }
        s += 1
      }
      r2
    }

    val codebooks2 = Array.tabulate(m) { s =>
      val sub = residuals2.map(_.slice(s * subDim, (s + 1) * subDim))
      lloyd(sub, codebookSize, iters, seed + 1000 + s)
    }
    IvfPq2Model(base, codebooks2)
  }
}
