package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered event-funnel conversion: of the users who performed step 1, how
  * many went on to step 2 AFTER it, and step 3 after that — the product
  * analytics staple (view → click → purchase), which is also the shape of
  * multi-stage data-collection audits ("crawled → parsed → kept").
  *
  * Strictly ordered semantics: a step counts only if its event is strictly
  * later than the chosen instance of the previous step, and the chosen
  * instance is always the EARLIEST qualifying one (first view; first click
  * after that view; first purchase after that click). Earliest-qualifying
  * is the standard greedy ATTRIBUTION rule, not a completion maximizer: a
  * later intermediate instance shifts (not shrinks) the next step's
  * window, so a user can complete some valid chain yet not convert under
  * this rule — `FunnelSpec`'s greedy-anchor test pins exactly that case
  * as intended behavior.
  *
  * Scale shape: three per-user hash aggregations, each with map-side
  * partial aggregation, chained by co-partitioned joins — every exchange
  * hashes on `userCol`, so AQE/EnsureRequirements inserts ONE shuffle of
  * the events table per step and reuses the user-keyed partitioning for
  * the joins (no window functions, no per-user sorts, no event buffering:
  * state per user is one timestamp per step). The final rollup is a
  * single-row global aggregate. At 100 TB of events this is 3 shuffles of
  * (user, ts) pairs pre-filtered to one event type each — the step
  * filters prune the scan before any exchange.
  */
object Funnel {

  /** First-order Markov transition matrix over per-user event sequences:
    * `(cur, next, n, p)` where `n` counts consecutive (ts, id)-ordered
    * event-type pairs across all users and `p = n / Σ_cur n` is the
    * empirical next-event probability. The funnel/path reports answer
    * "did the journey happen"; this is the generative summary behind
    * them (and the input to expected-path / dropout simulations).
    *
    * Determinism: the within-user order is total, counts are exact, `p`
    * is one division of exact longs — bit-identical cross-engine.
    * Scale: one user-keyed window (per-partition size = a user's event
    * count), then a combiner-backed pair count whose cardinality is
    * |types|² — the per-cur normalizer joins on that tiny frame.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("cur"), col("__next").as("next"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("cur")).agg(sum(col("n")).as("__tot"))
    pairs.join(totals, Seq("cur"))
      .select(col("cur"), col("next"), col("n"),
        (col("n").cast("double") / col("__tot").cast("double")).as("p"))
  }

  /** One-row funnel report over `events`: `n_users`, per-step completion
    * counts (`n_s1`, `n_s12`, `n_s123`, … — the name concatenates the
    * step indices reached) and exact-ratio conversion rates
    * `rate_s2..rate_sK`. `steps` are event-type names in funnel order,
    * any length >= 1. A step converts only within `windowSeconds` of the
    * previous step's chosen instance (the standard attribution window);
    * the comparison is exact integer microsecond arithmetic, so the
    * window edge is engine-portable.
    */
  def conversion(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      windowSeconds: Long = 24L * 3600): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    val winUs = windowSeconds * 1000000L
    def within(later: Column, earlier: Column): Column =
      later > earlier &&
        unix_micros(later) - unix_micros(earlier) <= winUs
    // step k's frame: the earliest step-k event strictly after (and
    // within the window of) the user's chosen step-(k-1) instance
    val stepFrames = steps.zipWithIndex
      .foldLeft(List.empty[(DataFrame, String)]) {
        case (acc, (s, i)) =>
          val c = s"__t${i + 1}"
          val base = events.filter(col(typeCol) === s)
          val frame = acc match {
            case Nil =>
              base.groupBy(col(userCol)).agg(min(col(tsCol)).as(c))
            case (prev, prevCol) :: _ =>
              base.join(prev.select(col(userCol), col(prevCol)),
                  Seq(userCol))
                .filter(within(col(tsCol), col(prevCol)))
                .groupBy(col(userCol)).agg(min(col(tsCol)).as(c))
          }
          (frame, c) :: acc
      }.reverse

    // one declarative plan, no driver-side counts: the step frames chain
    // with user-co-partitioned left joins (t1 ⊇ t2 ⊇ … by construction),
    // collapse to one row, and cross-join the single-row distinct-user
    // count — two single-row broadcast sides, zero eager jobs here.
    val names = (1 to steps.size).map(k => "n_s" + (1 to k).mkString(""))
    val joined = stepFrames.tail.foldLeft(stepFrames.head._1) {
      case (acc, (f, c)) =>
        acc.join(f.select(col(userCol), col(c)), Seq(userCol), "left")
    }
    val aggExprs = stepFrames.zipWithIndex.map {
      case ((_, _), 0) => count(lit(1)).as(names(0))
      case ((_, c), i) => count(col(c)).as(names(i))
    }
    val funnel = joined.agg(aggExprs.head, aggExprs.tail: _*)
    (2 to steps.size).foldLeft(
      events.agg(countDistinct(col(userCol)).as("n_users"))
        .crossJoin(funnel)) { (acc, k) =>
      acc.withColumn(s"rate_s$k",
        when(col(names(k - 2)) > 0,
          col(names(k - 1)).cast("double") / col(names(k - 2)))
          .otherwise(0.0))
    }
  }
}
