package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` embedding columns,
  * expressed with Spark higher-order functions (`zip_with` / `aggregate`) —
  * pure projections, no shuffle, no UDF serialization cost.
  *
  * For the similarity-search hot path (N x M candidate scoring) the
  * HOF lambda interpreter adds per-element overhead; [[graft.functions.expr.CosineSimilarityExpr]]
  * provides a tight-loop native Expression alternative. Part of the
  * LLM-pipeline extension tier (SURVEY.md §7.4) — the reference has no
  * array columns at all (SURVEY.md §1.2).
  */
object VectorFunctions {

  /** Elementwise dot product, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na > 0 && nb > 0, d / (na * nb)).otherwise(lit(0.0))
  }

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b,
        (x, y) => {
          val d = x.cast("double") - y.cast("double")
          d * d
        }),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2-normalize a vector to unit length (pre-normalizing a corpus once
    * turns every cosine into a plain dot product — the right trade at scale).
    */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n > 0, transform(a, x => x.cast("double") / n))
      .otherwise(transform(a, x => x.cast("double")))
  }

  /** Random-hyperplane (SimHash) LSH bucket id for a vector: sign-bit of the
    * dot product against `planes` deterministic pseudo-random hyperplanes.
    * Vectors with high cosine similarity collide with high probability
    * (Charikar 2002). `planes` are generated driver-side from a seed and
    * inlined as literals — broadcast-free and plan-stable.
    */
  def hyperplaneBucket(a: Column, planes: Seq[Array[Double]]): Column = {
    val dim = planes.head.length
    val bits: Seq[Column] = planes.map { p =>
      val planeCol = array(p.map(lit(_)): _*)
      when(dot(a, planeCol) >= 0, lit(1L)).otherwise(lit(0L))
    }
    val bucket = bits.zipWithIndex
      .map { case (b, i) => b * lit(1L << i) }
      .reduce(_ + _)
    // a vector whose length differs from the planes' dim would null-pad
    // every dot (zip_with), read every sign bit as 0, and land the WHOLE
    // corpus in bucket 0 — LSH silently degenerates to a cross product
    // (or, under a bucket cap, to zero candidates and a no-op dedup).
    // Misconfiguration fails loudly instead. A NULL vector is acknowledged
    // input (trainVectors/labelOutliers filter them): it gets a NULL bucket,
    // which never equi-joins with any probe — the row simply produces no
    // candidates, rather than raise_error killing the whole job with a
    // null-message "dimension mismatch".
    when(a.isNull, lit(null).cast("long"))
      .when(size(a) === dim, bucket)
      .otherwise(raise_error(concat(
        lit("hyperplaneBucket: vector dimension "), size(a).cast("string"),
        lit(s" does not match the configured dim $dim"))))
  }

  /** Deterministic pseudo-random unit hyperplanes (xorshift-seeded). */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }
}
