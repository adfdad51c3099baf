package graft.operators

/** Optimized Product Quantization (Ge et al., CVPR 2013, non-parametric
  * variant): learn an orthogonal rotation R that aligns the data with the
  * PQ subspace grid before quantizing, by alternating
  *   (1) codebook training on the rotated sample Y = X·R, and
  *   (2) the orthogonal Procrustes solve  R = U·Vᵀ  from  SVD(Xᵀ·B) where
  *       B is the quantized reconstruction of Y.
  * Each step does not increase ‖X·R − B‖², and R starts at identity, so
  * the final training error is ≤ plain PQ's (iteration 0) — asserted in
  * the spec. All of this is driver-side on the same bounded sample
  * [[Pq.train]] uses; the learned R rides into a native rotation
  * expression for the distributed encode/query phases.
  *
  * The SVD comes from a cyclic Jacobi eigensolver on CᵀC (dim×dim,
  * symmetric PSD) — no linear-algebra dependency.
  */
object Opq {

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * returns (eigenvalues, eigenvectors-as-columns), unsorted.
    */
  def jacobiEigSym(a0: Array[Array[Double]],
      sweeps: Int = 30): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone)
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < sweeps) {
      var off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          off += apq * apq
          if (math.abs(apq) > 1e-12) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < n) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
      if (off < 1e-20) sweep = sweeps // converged
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  private def matMul(a: Array[Array[Double]],
      b: Array[Array[Double]]): Array[Array[Double]] = {
    val n = a.length; val m = b(0).length; val k = b.length
    val out = Array.fill(n)(new Array[Double](m))
    var i = 0
    while (i < n) {
      var l = 0
      while (l < k) {
        val ail = a(i)(l)
        if (ail != 0.0) {
          val bl = b(l)
          var j = 0
          while (j < m) { out(i)(j) += ail * bl(j); j += 1 }
        }
        l += 1
      }
      i += 1
    }
    out
  }

  private def transpose(a: Array[Array[Double]]): Array[Array[Double]] =
    Array.tabulate(a(0).length, a.length)((i, j) => a(j)(i))

  /** Orthogonal Procrustes: the nearest orthogonal matrix R = U·Vᵀ from
    * SVD(C). U is recovered as C·V·S⁻¹; near-null singular directions fall
    * back to completing an orthonormal basis via Gram-Schmidt against the
    * established columns.
    */
  def procrustes(c: Array[Array[Double]]): Array[Array[Double]] = {
    val n = c.length
    val (eig, vMat) = jacobiEigSym(matMul(transpose(c), c))
    // sort by eigenvalue descending for stable null-space handling
    val order = eig.indices.sortBy(i => -eig(i))
    val s = order.map(i => math.sqrt(math.max(eig(i), 0.0))).toArray
    val vCols = order.map(i => Array.tabulate(n)(r => vMat(r)(i))).toArray
    val uCols = Array.fill(n)(new Array[Double](n))
    var j = 0
    while (j < n) {
      if (s(j) > 1e-9) {
        // u_j = C v_j / s_j
        var r = 0
        while (r < n) {
          var acc = 0.0
          var k = 0
          while (k < n) { acc += c(r)(k) * vCols(j)(k); k += 1 }
          uCols(j)(r) = acc / s(j)
          r += 1
        }
      } else {
        // complete an orthonormal basis: start from e_j, orthogonalize
        val u = new Array[Double](n)
        u(j) = 1.0
        var jj = 0
        while (jj < j) {
          var dot = 0.0
          var r = 0
          while (r < n) { dot += u(r) * uCols(jj)(r); r += 1 }
          r = 0
          while (r < n) { u(r) -= dot * uCols(jj)(r); r += 1 }
          jj += 1
        }
        val norm = math.sqrt(u.map(x => x * x).sum)
        var r = 0
        while (r < n) { uCols(j)(r) = if (norm > 1e-12) u(r) / norm else 0.0; r += 1 }
      }
      j += 1
    }
    // R = U V^T  (both stored as columns)
    Array.tabulate(n, n) { (r, cIdx) =>
      var acc = 0.0
      var k = 0
      while (k < n) { acc += uCols(k)(r) * vCols(k)(cIdx); k += 1 }
      acc
    }
  }

  /** OPQ training result: rotation + per-subspace codebooks + the
    * training-sample quantization error after each alternation (index 0 =
    * plain PQ with R = I).
    */
  final case class OpqModel(rotation: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], errors: Array[Double])

  /** Non-parametric OPQ on a (normalized) sample: `opqIters` alternations
    * of codebook training and Procrustes rotation update.
    */
  def train(sample: Array[Array[Double]], m: Int, codebookSize: Int,
      opqIters: Int = 5, kmeansIters: Int = 8, seed: Long = 42L): OpqModel = {
    val dim = sample(0).length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    var r = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var codebooks: Array[Array[Array[Double]]] = null
    val errs = Array.newBuilder[Double]

    def rotate(x: Array[Double], rm: Array[Array[Double]]): Array[Double] = {
      val out = new Array[Double](dim)
      var j = 0
      while (j < dim) {
        var acc = 0.0
        var i = 0
        while (i < dim) { acc += x(i) * rm(i)(j); i += 1 }
        out(j) = acc
        j += 1
      }
      out
    }

    var it = 0
    while (it <= opqIters) {
      val y = sample.map(rotate(_, r))
      // train codebooks on the rotated sample
      codebooks = Array.tabulate(m) { s =>
        val sub = y.map(_.slice(s * subDim, (s + 1) * subDim))
        Pq.lloyd(sub, codebookSize, kmeansIters, seed + 1 + s)
      }
      // quantized reconstructions + objective
      val b = y.map { yv =>
        val out = new Array[Double](dim)
        var s = 0
        while (s < m) {
          val off = s * subDim
          val cb = codebooks(s)
          var best = 0
          var bestD = Double.MaxValue
          var e = 0
          while (e < cb.length) {
            var d = 0.0
            var i = 0
            while (i < subDim) {
              val diff = yv(off + i) - cb(e)(i); d += diff * diff; i += 1
            }
            if (d < bestD) { bestD = d; best = e }
            e += 1
          }
          System.arraycopy(cb(best), 0, out, off, subDim)
          s += 1
        }
        out
      }
      var err = 0.0
      var i = 0
      while (i < y.length) {
        var j = 0
        while (j < dim) {
          val d = y(i)(j) - b(i)(j); err += d * d; j += 1
        }
        i += 1
      }
      errs += err
      if (it < opqIters) {
        // R <- Procrustes(X^T B)
        val c = Array.fill(dim)(new Array[Double](dim))
        var n = 0
        while (n < sample.length) {
          val x = sample(n); val bv = b(n)
          var p = 0
          while (p < dim) {
            val xp = x(p)
            if (xp != 0.0) {
              var q = 0
              while (q < dim) { c(p)(q) += xp * bv(q); q += 1 }
            }
            p += 1
          }
          n += 1
        }
        r = procrustes(c)
      }
      it += 1
    }
    OpqModel(r, codebooks, errs.result())
  }
}
