package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Principal component analysis over an embedding column — the classic
  * dimensionality-reduction front for ANN indexing and embedding-drift
  * QA (project 64-d vectors to the top-k variance directions before
  * clustering/visualisation; OPQ's rotation, [[Opq]], is the
  * quantization-specific cousin and donates its Jacobi eigensolver).
  *
  * Scale design — PCA at 100 TB is a MOMENTS problem, not a data
  * problem: the corpus collapses in ONE combiner-backed pass to
  * `(n, Σx, upper-tri ΣxxT)` — a single ~d²/2-double buffer per task,
  * merged elementwise exactly like the classifier's [[graft.functions
  * .Aggregators.DenseGrad]] — and only that fixed-size buffer reaches
  * the driver. The d×d covariance eigendecomposition is driver-side
  * (d = 64 → trivial); the learned projection rides back into a
  * [[graft.functions.expr.MatVecExpr]] kernel, so projecting the corpus
  * is one exchange-free O(d·k) projection per row. Nothing data-sized
  * ever collects; the only corpus-wide jobs are the moments pass and
  * (optionally) the caller's projected-output write.
  *
  * Determinism: partition merge order perturbs the double moment sums
  * at ~1 ulp; downstream eigenvalues are stable to ~1e-10 relative, so
  * query-level contracts round at 4dp / compare laws at 1e-6 — the
  * x46/x79 convention.
  */
object Pca {

  /** Input row wrapper (udaf needs a product encoder). */
  case class VecIn(v: Array[Double])

  /** Moments buffer: `n`, `s(d)` = Σx, `g(d(d+1)/2)` = upper-triangular
    * Σ x xᵀ packed row-major (`g(idx(i,j))`, i ≤ j).
    */
  case class MomBuf(n: Long, s: Array[Double], g: Array[Double])

  /** One-pass mergeable (count, sum, Gram) accumulator. */
  class Moments(d: Int) extends Aggregator[VecIn, MomBuf, MomBuf] {
    override def zero: MomBuf =
      MomBuf(0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))

    override def reduce(buf: MomBuf, in: VecIn): MomBuf = {
      val x = in.v
      require(x.length == d, s"pca: vector dim ${x.length} != $d")
      var i = 0
      var t = 0
      while (i < d) {
        val xi = x(i)
        buf.s(i) += xi
        var j = i
        while (j < d) { buf.g(t) += xi * x(j); j += 1; t += 1 }
        i += 1
      }
      MomBuf(buf.n + 1, buf.s, buf.g)
    }

    override def merge(a: MomBuf, b: MomBuf): MomBuf = {
      var i = 0
      while (i < a.s.length) { a.s(i) += b.s(i); i += 1 }
      i = 0
      while (i < a.g.length) { a.g(i) += b.g(i); i += 1 }
      MomBuf(a.n + b.n, a.s, a.g)
    }

    override def finish(buf: MomBuf): MomBuf = buf
    override def bufferEncoder: Encoder[MomBuf] = Encoders.product[MomBuf]
    override def outputEncoder: Encoder[MomBuf] = Encoders.product[MomBuf]
  }

  /** Fitted model: descending eigenvalues (population covariance), the
    * matching unit eigenvectors as rows, the mean vector, and the
    * covariance trace (= total variance = Σ all d eigenvalues).
    */
  case class Model(n: Long, dim: Int, mean: Array[Double],
      eigenvalues: Array[Double], components: Array[Array[Double]],
      trace: Double) {
    /** Variance fraction captured by each kept component. */
    def explainedRatios: Array[Double] = eigenvalues.map(_ / trace)
  }

  /** Fit top-`k` principal components of `vecCol` (array<float|double>)
    * in one distributed moments pass + a driver-side d×d Jacobi solve.
    */
  def fit(df: DataFrame, vecCol: String, k: Int, dim: Int): Model = {
    require(k >= 1 && k <= dim, s"pca: need 1 <= k=$k <= dim=$dim")
    val agg = udaf(new Moments(dim), Encoders.product[VecIn])
    val row = df
      .select(col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull)
      .select(agg(col("v")).as("m"))
      .head()
    val m = row.getStruct(0)
    val n = m.getLong(0)
    require(n > 0, "pca: empty input")
    val s = m.getSeq[Double](1).toArray
    val g = m.getSeq[Double](2).toArray
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var t = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = g(t) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
        t += 1
      }
      i += 1
    }
    val trace = (0 until dim).map(d => cov(d)(d)).sum
    val (eig, vecs) = Opq.jacobiEigSym(cov)
    // sort descending; tie-break on index for a deterministic order
    val order = eig.zipWithIndex.sortBy { case (e, idx) => (-e, idx) }
    val topEig = order.take(k).map(_._1).toArray
    val comps = order.take(k).map { case (_, c) =>
      Array.tabulate(dim)(r => vecs(r)(c))
    }.toArray
    Model(n, dim, mean, topEig, comps, trace)
  }

  /** Project `vecCol` onto a fitted model: `array<double>` of length k,
    * `(x − mean) · componentsᵀ`, as one exchange-free kernel projection
    * (the mean shift folds into a constant offset subtracted after the
    * [[graft.functions.expr.MatVecExpr]] product).
    */
  def project(vecCol: Column, model: Model): Column = {
    // components as d×k so MatVec's row-vector convention gives x·M
    val mat = Array.tabulate(model.dim, model.eigenvalues.length)(
      (r, c) => model.components(c)(r))
    val offset = model.components.map(comp =>
      comp.zip(model.mean).map { case (a, b) => a * b }.sum)
    import org.apache.spark.sql.graftshim.ColumnBridge
    val xm = ColumnBridge.column(graft.functions.expr.MatVecExpr(
      ColumnBridge.expression(vecCol.cast("array<double>")), mat))
    zip_with(xm, lit(offset), (a, b) => a - b)
  }
}
