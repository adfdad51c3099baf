package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for IVF-PQ (inverted file + product
  * quantization) approximate nearest-neighbor search — the memory/IO scale
  * path for similarity over 100 TB embedding corpora: the candidate scan
  * reads `m`-byte PQ codes instead of `4*dim`-byte float vectors (32x less
  * I/O at dim=64, m=8), and exact re-ranking touches full vectors only for
  * the few `refine` survivors per query.
  *
  * Model arrays (coarse centroids, per-subspace codebooks) are driver-trained
  * (bounded sample) and bound into the expressions as literals — plan-stable,
  * no broadcast machinery, serialized once with the task binary.
  */

private[expr] object PqMath {
  /** dot(a[off..off+n), b[0..n)) for primitive double arrays. */
  @inline def subDot(a: Array[Double], off: Int, b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < b.length) { s += a(off + i) * b(i); i += 1 }
    s
  }

  /** null when ANY element is NULL: a null coordinate has no numeric
    * reading — GenericArrayData would NPE mid-task, UnsafeArrayData
    * would silently read 0.0 (a plausible but wrong vector, the exact
    * failure cosine_sim's element-poison contract exists to prevent).
    * Every caller propagates the null (all are nullable).
    */
  def toDoubles(v: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      out(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    out
  }

  def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def vecTypeOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
}

/** `l2_normalize(vec)` -> `array<double>` unit vector (zero vectors pass
  * through). Native single-pass replacement for the HOF formulation
  * ([[graft.functions.VectorFunctions.l2Normalize]]), which walks the array
  * through the lambda interpreter three times and — worse — can be inlined
  * by projection collapse into every consumer lambda, multiplying its cost
  * by the consumer's iteration count.
  */
case class L2NormalizeExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqMath.vecTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2_normalize expects array<float|double>, got " +
        child.dataType.catalogString)

  override def nullSafeEval(v: Any): Any = {
    val a = PqMath.toDoubles(v.asInstanceOf[ArrayData],
      PqMath.isFloatArray(child))
    if (a == null) return null
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    if (s > 0.0) {
      val n = math.sqrt(s)
      i = 0
      while (i < a.length) { a(i) /= n; i += 1 }
    }
    new GenericArrayData(a)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "l2_normalize"
}

/** `centroid_cosines(vec)` -> `array<double>` of cosine(vec, centroid_i) for
  * a literal centroid table, in ONE pass: the vector's norm is computed once
  * and every centroid dot shares the same tight loop — versus per-centroid
  * `cosine_sim` lambdas that re-walk (and with projection collapse,
  * re-normalize) the input for each centroid.
  */
case class CentroidCosinesExpr(child: Expression,
    centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  private val norms: Array[Double] = centroids.map { c =>
    var s = 0.0
    var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqMath.vecTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"centroid_cosines expects array<float|double>, got " +
        child.dataType.catalogString)

  override def nullSafeEval(v: Any): Any = {
    val a = PqMath.toDoubles(v.asInstanceOf[ArrayData],
      PqMath.isFloatArray(child))
    if (a == null) return null
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    val an = math.sqrt(s)
    val out = new Array[Double](centroids.length)
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      // dimension mismatch is MISCONFIGURATION, not data: emitting 0.0
      // would hand every row a plausible score and argmax would
      // deterministically dump the whole corpus into cell 0 — NULL, per
      // cosine_sim's documented mismatch contract
      if (a.length != c.length) return null
      if (an > 0.0 && norms(j) > 0.0) {
        var d = 0.0
        i = 0
        while (i < c.length) { d += a(i) * c(i); i += 1 }
        out(j) = d / (an * norms(j))
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "centroid_cosines"
}

/** `pq_encode(vec, cell)` -> `array<int>` of `m` codebook indices.
  *
  * Encodes the residual `vec - coarse(cell)`: for each of the `m` subspaces,
  * the index of the codebook entry nearest (L2) to the residual subvector.
  * One primitive loop per row; cost m * k * subDim multiplies at encode time
  * (build-side, once per corpus row).
  */
case class PqEncodeExpr(left: Expression, right: Expression,
    coarse: Array[Array[Double]], codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression with CodegenFallback {

  private val m = codebooks.length
  private val subDim = codebooks(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqMath.vecTypeOk(left.dataType) && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects (array<float|double>, int), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullSafeEval(v: Any, c: Any): Any = {
    val vec = PqMath.toDoubles(v.asInstanceOf[ArrayData],
      PqMath.isFloatArray(left))
    if (vec == null) return null
    val cell = c.asInstanceOf[Int]
    if (vec.length != m * subDim || cell < 0 || cell >= coarse.length)
      return null
    val cent = coarse(cell)
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * subDim
      val cb = codebooks(s)
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cb.length) {
        val e = cb(j)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val r = vec(off + i) - cent(off + i) - e(i)
          d += r * r
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_encode"
}

/** `ivfpq_adc_score(qvec, cell, codes)` -> double approximate dot product.
  *
  * Asymmetric distance computation for inner product: with the corpus vector
  * approximated as `coarse(cell) + concat_s(codebook_s(code_s))`,
  * `dot(q, x) ~ dot(q, coarse(cell)) + sum_s dot(q_s, codebook_s(code_s))`.
  * On L2-normalized inputs this approximates cosine. The scan side touches
  * only (cell, codes) — never the corpus vector.
  */
case class IvfPqAdcScoreExpr(first: Expression, second: Expression,
    third: Expression, coarse: Array[Array[Double]],
    codebooks: Array[Array[Array[Double]]])
    extends TernaryExpression with CodegenFallback {

  private val m = codebooks.length
  private val subDim = codebooks(0)(0).length

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqMath.vecTypeOk(first.dataType) && second.dataType == IntegerType &&
      (third.dataType match {
        case ArrayType(IntegerType, _) => true
        case _ => false
      }))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ivfpq_adc_score expects (array<float|double>, int, array<int>), got " +
        s"${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
        s"${third.dataType.catalogString}")

  override def nullSafeEval(q: Any, c: Any, cd: Any): Any = {
    val qv = PqMath.toDoubles(q.asInstanceOf[ArrayData],
      PqMath.isFloatArray(first))
    if (qv == null) return null
    val cell = c.asInstanceOf[Int]
    val codes = cd.asInstanceOf[ArrayData]
    if (qv.length != m * subDim || cell < 0 || cell >= coarse.length ||
      codes.numElements() != m) return null
    var score = PqMath.subDot(qv, 0, coarse(cell))
    var s = 0
    while (s < m) {
      val code = codes.getInt(s)
      val cb = codebooks(s)
      if (code < 0 || code >= cb.length) return null
      score += PqMath.subDot(qv, s * subDim, cb(code))
      s += 1
    }
    score
  }

  override protected def withNewChildrenInternal(
      f: Expression, sE: Expression, t: Expression): Expression =
    copy(first = f, second = sE, third = t)

  override def prettyName: String = "ivfpq_adc_score"
}

/** `pq_encode2(vec, cell, codes1)` -> `array<int>`: level-2 codes of the
  * residual left after level-1 reconstruction (residual re-quantization).
  * Per subspace: nearest `codebooks2` entry to
  * `vec_s - coarse(cell)_s - codebooks1_s(code1_s)`.
  */
case class PqEncode2Expr(children: Seq[Expression],
    coarse: Array[Array[Double]], codebooks1: Array[Array[Array[Double]]],
    codebooks2: Array[Array[Array[Double]]])
    extends Expression with CodegenFallback {
  require(children.length == 3, "pq_encode2(vec, cell, codes1)")

  private val m = codebooks1.length
  private val subDim = codebooks1(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqMath.vecTypeOk(children(0).dataType) &&
      children(1).dataType == IntegerType &&
      (children(2).dataType match {
        case ArrayType(IntegerType, _) => true
        case _ => false
      })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_encode2 expects (array<float|double>, int, array<int>)")

  override def eval(input: InternalRow): Any = {
    val v = children(0).eval(input)
    val c = children(1).eval(input)
    val cd = children(2).eval(input)
    if (v == null || c == null || cd == null) return null
    val vec = PqMath.toDoubles(v.asInstanceOf[ArrayData],
      PqMath.isFloatArray(children(0)))
    if (vec == null) return null
    val cell = c.asInstanceOf[Int]
    val codes1 = cd.asInstanceOf[ArrayData]
    if (vec.length != m * subDim || cell < 0 || cell >= coarse.length ||
      codes1.numElements() != m) return null
    val cent = coarse(cell)
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * subDim
      val c1 = codes1.getInt(s)
      if (c1 < 0 || c1 >= codebooks1(s).length) return null
      val e1 = codebooks1(s)(c1)
      val cb2 = codebooks2(s)
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cb2.length) {
        val e2 = cb2(j)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val r = vec(off + i) - cent(off + i) - e1(i) - e2(i)
          d += r * r
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(children = cs)
  override def prettyName: String = "pq_encode2"
}

/** `pq_codes_dot(qvec, codes)` -> double: `sum_s dot(q_s, codebook_s(code_s))`
  * — the additive ADC refinement a second quantization level contributes.
  * Composes with [[IvfPqAdcScoreExpr]]: `score2 = adc_score(...) +
  * pq_codes_dot(q, codes2)`.
  */
case class PqCodesDotExpr(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression with CodegenFallback {

  private val m = codebooks.length
  private val subDim = codebooks(0)(0).length

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqMath.vecTypeOk(left.dataType) &&
      (right.dataType match {
        case ArrayType(IntegerType, _) => true
        case _ => false
      })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_codes_dot expects (array<float|double>, array<int>)")

  override def nullSafeEval(q: Any, cd: Any): Any = {
    val qv = PqMath.toDoubles(q.asInstanceOf[ArrayData],
      PqMath.isFloatArray(left))
    if (qv == null) return null
    val codes = cd.asInstanceOf[ArrayData]
    if (qv.length != m * subDim || codes.numElements() != m) return null
    var score = 0.0
    var s = 0
    while (s < m) {
      val code = codes.getInt(s)
      val cb = codebooks(s)
      if (code < 0 || code >= cb.length) return null
      score += PqMath.subDot(qv, s * subDim, cb(code))
      s += 1
    }
    score
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "pq_codes_dot"
}

/** `mat_vec(vec)` -> array<double>: y = x·M for a literal matrix (row-vector
  * convention, matching driver-side OPQ training). One O(dim²) pass per row;
  * used to apply the learned OPQ rotation in the distributed encode and
  * query phases.
  */
case class MatVecExpr(child: Expression, matrix: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqMath.vecTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mat_vec expects array<float|double>, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any = {
    val x = PqMath.toDoubles(v.asInstanceOf[ArrayData],
      PqMath.isFloatArray(child))
    if (x == null) return null
    if (x.length != matrix.length) return null
    val n = matrix(0).length
    val out = new Array[Double](n)
    var i = 0
    while (i < x.length) {
      val xi = x(i)
      if (xi != 0.0) {
        val row = matrix(i)
        var j = 0
        while (j < n) { out(j) += xi * row(j); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "mat_vec"
}

object PqExprs {
  def l2normalize(vec: Column): Column =
    ColumnBridge.column(L2NormalizeExpr(ColumnBridge.expression(vec)))

  def centroidCosines(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(
      CentroidCosinesExpr(ColumnBridge.expression(vec), centroids))

  def pqEncode(vec: Column, cell: Column, coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(vec),
      ColumnBridge.expression(cell), coarse, codebooks))

  def adcScore(qvec: Column, cell: Column, codes: Column,
      coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(IvfPqAdcScoreExpr(ColumnBridge.expression(qvec),
      ColumnBridge.expression(cell), ColumnBridge.expression(codes),
      coarse, codebooks))

  def pqEncode2(vec: Column, cell: Column, codes1: Column,
      coarse: Array[Array[Double]], codebooks1: Array[Array[Array[Double]]],
      codebooks2: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode2Expr(
      Seq(vec, cell, codes1).map(ColumnBridge.expression),
      coarse, codebooks1, codebooks2))

  def pqCodesDot(qvec: Column, codes: Column,
      codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqCodesDotExpr(ColumnBridge.expression(qvec),
      ColumnBridge.expression(codes), codebooks))

  def matVec(vec: Column, matrix: Array[Array[Double]]): Column =
    ColumnBridge.column(MatVecExpr(ColumnBridge.expression(vec), matrix))
}
