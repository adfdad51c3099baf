package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-preserving curation: k-anonymity by generalization ladder.
  *
  * Training corpora carry quasi-identifiers (source, language, region,
  * demographic tags); releasing or joining them re-identifies individuals
  * when an attribute combination is rare (Sweeney 2002, "k-anonymity: a
  * model for protecting privacy"). This operator makes every released
  * equivalence class hold at least `k` rows: classes already of size >= k
  * keep their full quasi-identifier tuple; smaller classes are pooled by
  * progressively blanking ladder columns to `"*"`; rows whose pooled class
  * is still smaller than `k` after the last ladder step are SUPPRESSED
  * (dropped) — the textbook generalize-then-suppress scheme.
  *
  * Scale shape (100 TB): the corpus shuffles ONCE — the level-0
  * `groupBy(qi)` whose shuffle rows carry only the quasi-identifier
  * strings and a partial count. Every later ladder level re-aggregates the
  * LEVEL-0 GROUP TABLE (rows bounded by QI-combination cardinality, i.e.
  * config-bounded — never by corpus size), and the per-class level
  * assignment broadcast-joins back to the rows, so data rows are never
  * shuffled at all. Complements [[TextPipeline]]'s PII redaction (x40),
  * which scrubs identifiers INSIDE the text; this governs the structured
  * columns AROUND it.
  */
object Anonymize {

  /** Per-LEVEL-0-class level assignment: one row per distinct full QI
    * tuple with its class size `n0`, resolved generalization `lvl`
    * (0 = kept untouched, i = pooled at ladder step i, `ladder.size + 1`
    * = suppressed), and the pooled class size `n` at that level.
    *
    * `ladder(i)` lists the QI columns blanked to `"*"` at level i+1;
    * steps are cumulative (level 2 blanks `ladder(0) ++ ladder(1)`). QI
    * columns must be string-typed — callers cast up front so the `"*"`
    * sentinel type-checks (and so engines agree on the class key).
    *
    * A level-0 class pools at level i only if every finer level rejected
    * it, so assignments are unique per class — the pooled level-i class
    * (A, *) never absorbs rows of a class (A, x) already kept at a finer
    * level, even though the starred keys coincide.
    */
  def assignments(df: DataFrame, qi: Seq[String], k: Int,
      ladder: Seq[Seq[String]]): DataFrame = {
    require(qi.nonEmpty && k >= 1 && ladder.nonEmpty, "qi/k/ladder empty")
    require(ladder.flatten.toSet.subsetOf(qi.toSet), "ladder outside qi")
    def starred(blanked: Set[String], c: String): Column =
      if (blanked(c)) lit("*") else col(c)
    // the ONE corpus-sized aggregation: QI tuple -> count
    val g0 = df.groupBy(qi.map(col): _*).agg(count(lit(1)).as("n0"))
    var assigned = g0.filter(col("n0") >= k)
      .select(qi.map(col) ++
        Seq(col("n0"), lit(0L).as("lvl"), col("n0").as("n")): _*)
    var rest = g0.filter(col("n0") < k) // still carries the FULL qi key
    var blanked = Set.empty[String]
    for ((step, i) <- ladder.zipWithIndex) {
      blanked ++= step
      // pool the still-unanonymized level-0 classes under the coarser
      // key; `rest` is QI-cardinality-bounded, so this re-agg shuffles at
      // most a few thousand rows regardless of corpus size. A window
      // (sum over the coarse key) instead of agg+self-join keeps the
      // full-QI key attached to each pooled size.
      val pooledN = sum(col("n0")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(qi.map(c => starred(blanked, c)): _*))
      val pooled = rest.withColumn("n", pooledN)
      assigned = assigned.unionByName(
        pooled.filter(col("n") >= k)
          .select(qi.map(col) ++
            Seq(col("n0"), lit(i + 1L).as("lvl"), col("n")): _*))
      rest = pooled.filter(col("n") < k).drop("n")
    }
    assigned.unionByName(
      rest.select(qi.map(col) ++ Seq(col("n0"),
        lit(ladder.size + 1L).as("lvl"), col("n0").as("n")): _*))
  }

  /** Released-class audit: one row per surviving equivalence class with
    * its generalized QI values, `lvl`, and class size `n` (suppressed
    * classes absent). The class table, not the row table — row-level
    * release is [[kAnonymize]].
    */
  def audit(df: DataFrame, qi: Seq[String], k: Int,
      ladder: Seq[Seq[String]]): DataFrame = {
    val levels = ladder.scanLeft(Set.empty[String])(_ ++ _)
    val a = assignments(df, qi, k, ladder)
      .filter(col("lvl") <= ladder.size.toLong)
    val genQi = qi.map { c =>
      levels.zipWithIndex.foldLeft(lit("*")) { case (acc, (bl, i)) =>
        when(col("lvl") === i.toLong,
          if (bl(c)) lit("*") else col(c)).otherwise(acc)
      }.as(c)
    }
    // class size = sum of member level-0 class sizes (equals the pooled
    // `n` the assignment already carries; re-deriving it keeps the audit
    // a pure function of the per-class rows)
    a.select(genQi ++ Seq(col("lvl"), col("n0")): _*)
      .groupBy(qi.map(col) :+ col("lvl"): _*)
      .agg(sum(col("n0")).as("n"))
  }

  /** Row-level k-anonymized release: `df` with each QI column replaced by
    * its value at the row's class generalization level (or `"*"`), plus a
    * `lvl` column; rows of suppressed classes are dropped. Non-QI columns
    * pass through untouched.
    *
    * The row side never shuffles: the assignment table is bounded by QI
    * cardinality and broadcast, and one inner join on the FULL level-0
    * key resolves each row's level; the starred projection is then
    * row-local.
    */
  def kAnonymize(df: DataFrame, qi: Seq[String], k: Int,
      ladder: Seq[Seq[String]]): DataFrame = {
    val levels = ladder.scanLeft(Set.empty[String])(_ ++ _)
    val dec = assignments(df, qi, k, ladder)
      .filter(col("lvl") <= ladder.size.toLong) // drop suppressed classes
      .select(qi.map(c => col(c).as(s"__k_$c")) :+ col("lvl"): _*)
    val out = df.columns.filterNot(qi.contains)
    val genQi = qi.map { c =>
      levels.zipWithIndex.foldLeft(lit("*")) { case (acc, (bl, i)) =>
        when(col("lvl") === i.toLong,
          if (bl(c)) lit("*") else col(c)).otherwise(acc)
      }.as(c)
    }
    df.join(broadcast(dec),
        qi.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _), "inner")
      .select(out.map(col) ++ genQi :+ col("lvl"): _*)
  }
}
