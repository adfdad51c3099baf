package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Conform, DateDim, DedupLatest}

/** Core relational query inventory (SURVEY.md §2 re-expressed over the driver
  * testdata star schema), each paired with a DuckDB oracle in
  * [[QueriesCore.oracles]].
  *
  * Cross-engine determinism rules used throughout (Spark vs DuckDB):
  *  - money aggregates go through DECIMAL(18,2) (all money columns carry
  *    exactly 2dp, so the cast is lossless) and the exact decimal result is
  *    cast to DOUBLE at the end — bit-identical in both engines regardless of
  *    aggregation order;
  *  - counts are BIGINT on both sides (DuckDB SUM/COUNT hugeint is cast);
  *  - quantities are integral doubles (exact under summation);
  *  - every query ends in a deterministic ORDER BY over unique keys.
  */
object QueriesCore {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** exact-decimal sum of a 2dp money column, surfaced as double */
  private def moneySum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast("decimal(18,2)")).cast("double")

  // ---------------------------------------------------------------- queries

  /** A3/P9/P10 — pricing summary (grouped SUM over flags). */
  def aggPricing(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        moneySum("l_extendedprice").as("revenue"),
        sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
          .cast("double").as("disc_revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("l_returnflag", "l_linestatus")

  /** A4/F5 — orders per status per month. */
  def aggStatusMonth(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("month"),
        col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("total_orders"))
      .orderBy("month", "status")

  /** A5 — average ticket per order (exact decimal sum / count). */
  def aggAvgTicket(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(
        (moneySum("l_extendedprice") /
          count(lit(1)).cast("double")).as("avg_ticket"),
        count(lit(1)).as("n_items"))
      .orderBy("l_orderkey")

  /** J4/A3/O1/O2 — revenue top-10 customers (3-way star join + sort-limit).
    * Dimension sides are broadcast: at any scale factor customer/orders keys
    * stay orders of magnitude smaller than lineitem, and the explicit
    * broadcast keeps the big fact from ever shuffling.
    */
  def topkRevenue(spark: SparkSession, dir: String): DataFrame = {
    // aggregate on the integer key alone and fetch names AFTER the top-k:
    // the fact-sized hash-agg keys ints instead of (int, string) pairs and
    // the name dimension joins onto 10 rows, not 10^8 — at scale this also
    // drops the customer broadcast out of the fact pipeline entirely
    val top = t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("custkey"))
      .agg(moneySum("l_extendedprice").as("revenue"))
      .orderBy(desc("revenue"), col("custkey"))
      .limit(10)
    top
      .join(broadcast(t(spark, dir, "customer").select("c_custkey", "c_name")),
        col("custkey") === col("c_custkey"))
      .select(col("custkey"), col("c_name").as("name"), col("revenue"))
      .orderBy(desc("revenue"), col("custkey"))
  }

  /** P13/F6 — rolling 90-day window relative to the data's max date
    * (the reference uses current_date()-90; testdata is historical, so the
    * anchor is MAX(o_orderdate) — same rolling-window capability).
    */
  def rollingWindow(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val cutoff = orders
      .agg((max(col("o_orderdate")) - expr("INTERVAL 90 DAY")).as("__cut"))
    t(spark, dir, "lineitem")
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .crossJoin(broadcast(cutoff))
      .filter(col("o_orderdate") >= col("__cut"))
      .groupBy(col("o_custkey").as("custkey"))
      .agg(moneySum("l_extendedprice").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("custkey")
  }

  /** W1/D1 — latest-record dedup: most recent order per customer with a
    * deterministic tiebreak (SURVEY.md §7.3 improvement).
    */
  def dedupLatest(spark: SparkSession, dir: String): DataFrame =
    DedupLatest(t(spark, dir, "orders"), Seq("o_custkey"), "o_orderdate",
      extraTiebreak = Seq("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .orderBy("o_orderkey")

  /** J1/P7 — left-join FK existence probe with null-key -> -1 patch. */
  def joinLeftProbe(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select(col("c_custkey"))
    t(spark, dir, "orders")
      .join(broadcast(c), col("o_custkey") === col("c_custkey"), "left")
      .select(
        col("o_orderkey").as("orderkey"),
        when(col("c_custkey").isNull, lit(-1L))
          .otherwise(col("o_custkey")).as("cust_fk"))
      .orderBy("orderkey")
  }

  /** J2 — inner equi-join keeps only matched rows. */
  def joinInner(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders").select("o_orderkey", "o_orderstatus"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_items"))
      .orderBy("status")

  /** J3 — anti join: lineitems whose part is NOT a small part. */
  def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    val smallParts = t(spark, dir, "part")
      .filter(col("p_size") <= 10).select("p_partkey")
    t(spark, dir, "lineitem")
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"),
        "left_anti")
      .select("l_orderkey", "l_partkey", "l_linenumber")
      .orderBy("l_orderkey", "l_partkey", "l_linenumber")
  }

  /** left_semi — customers with at least one order (EXISTS). */
  def joinSemi(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** U2/U3/A2 — positional union + distinct (SQL UNION). */
  def unionDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderdate").cast("date").cast("string").as("d"))
      .union(t(spark, dir, "lineitem")
        .select(col("l_shipdate").cast("date").cast("string").as("d")))
      .distinct()
      .orderBy("d")

  /** U1/D9 — union-by-name with the conformed UNKNOWN member. */
  def unknownMember(spark: SparkSession, dir: String): DataFrame = {
    val dim = t(spark, dir, "customer")
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
        col("c_mktsegment").as("segment"))
    Conform.withUnknownMember(dim, "custkey", unknownKey = -1L)
      .orderBy("custkey")
  }

  /** D10/F1-F4 — derived calendar dimension over order dates. The `date`
    * column is surfaced as a string for comparer-agnostic oracle matching
    * (python date objects vs datetime64 disagree under naive comparison).
    */
  def dateDim(spark: SparkSession, dir: String): DataFrame =
    DateDim.fromDateColumns(Seq((t(spark, dir, "orders"), "o_orderdate")))
      .withColumn("date", col("date").cast("string"))

  /** D2/D3/D4/A6 — the DQ rate checks as one fully-distributed plan: a
    * single-pass aggregate over orders (null + dup rates) cross-joined with
    * a key-only anti-join count over lineitem (orphan rate). No driver-side
    * collect anywhere — the rates materialize as one job when the sink runs
    * (the reference runs 6+ sequential count jobs for the same answers).
    */
  def dqRates(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val li = t(spark, dir, "lineitem")
    val orderAgg = orders.agg(
      count(lit(1)).as("__n"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("__nulls"),
      countDistinct(col("o_orderkey")).as("__uniq"))
    val orphanAgg = li
      .select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("__orphans"))
    val liCount = li.agg(count(lit(1)).as("__li_n"))
    orderAgg.crossJoin(orphanAgg).crossJoin(liCount)
      .select(
        (col("__nulls").cast("double") / col("__n"))
          .as("null_rate_custkey"),
        // (count - countDistinct)/count, countDistinct excluding nulls —
        // the exact formula of both the reference and the DuckDB oracle
        // (null keys therefore inflate this rate; they are reported
        // separately by the null-rate check)
        ((col("__n") - col("__uniq")).cast("double") /
          col("__n")).as("dup_rate_orderkey"),
        (col("__orphans").cast("double") / col("__li_n"))
          .as("orphan_rate_lineitem"))
  }

  /** P2/P7/P8/P11/P12/F7 + string functions — scalar projection gallery. */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_uc"),
        substring(col("p_name"), 1, 10).as("name_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        when(col("p_size").isin(1, 5, 10), lit("small"))
          .otherwise(lit("big")).as("size_class"),
        coalesce(col("p_retailprice"), lit(0.0)).as("price"),
        (col("p_retailprice").cast("decimal(18,2)") * lit(2))
          .cast("double").as("double_price"),
        (-col("p_size")).as("neg_size"))
      .orderBy("p_partkey")

  /** Analytic windows — rank / lag / running decimal sum per customer. */
  def windowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .select(
        col("o_custkey").as("custkey"),
        col("o_orderkey").as("orderkey"),
        rank().over(w).cast("long").as("order_rank"),
        lag(col("o_totalprice"), 1).over(w).as("prev_total"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("running_total"))
      .orderBy("custkey", "orderkey")
  }

  /** ROLLUP grouping sets over status x priority. */
  def rollupCounts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"))
      .orderBy("status", "priority")

  /** Top-k per group — top 3 parts by price within each brand. */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    t(spark, dir, "part")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 3)
      .select("p_brand", "p_partkey", "p_retailprice")
      .orderBy("p_brand", "p_partkey")
  }

  /** PIVOT — orders count by status x priority as a wide table. */
  private val Priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")
  def pivotCounts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .pivot("o_orderpriority", Priorities)
      .agg(count(lit(1)))
      .na.fill(0L, Priorities)
      .orderBy("status")

  /** Exact order statistics per group: median (linear interpolation — exact
    * on integral quantities), min/max, distinct count.
    */
  def groupStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5D)").as("median_qty"),
        min("l_quantity").as("min_qty"),
        max("l_quantity").as("max_qty"),
        countDistinct("l_partkey").as("n_parts"))
      .orderBy("l_returnflag")

  /** INTERSECT / EXCEPT — dates in both fact tables vs orders-only dates. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(col("o_orderdate").cast("date").cast("string").as("d"))
    val l = t(spark, dir, "lineitem")
      .select(col("l_shipdate").cast("date").cast("string").as("d"))
    o.intersect(l).withColumn("op", lit("both"))
      .union(o.except(l).withColumn("op", lit("orders_only")))
      .orderBy("d", "op")
  }

  /** SQL entry point (S4): temp-view registration + spark.sql text — the
    * same metric-2-shaped query the reference runs through its SQL surface
    * (`/root/reference/src/pipeline.py:279-318`).
    */
  def sqlEntry(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT date_format(date_trunc('month', o_orderdate), 'yyyy-MM-dd')
        |         AS month,
        |       o_orderstatus AS status,
        |       count(*) AS total_orders
        |FROM orders_v
        |GROUP BY 1, 2
        |ORDER BY month, status""".stripMargin)
  }

  /** Scalar subquery — orders above the average total, compared in exact
    * integer/decimal space (`price * n > sum` avoids cross-engine AVG
    * rounding differences). Runs through spark.sql to exercise subquery
    * planning.
    */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_ssq")
    spark.sql(
      """SELECT o_orderkey FROM orders_ssq
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |      (SELECT COUNT(*) FROM orders_ssq) >
        |      (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders_ssq)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** RANGE-frame window — rolling 7-day order total per customer over a
    * day-number ordering (numeric range frames behave identically across
    * engines; decimal sums keep it exact).
    */
  def rangeWindow(spark: SparkSession, dir: String): DataFrame = {
    val dayNum = datediff(col("o_orderdate").cast("date"),
      to_date(lit("1992-01-01")))
    val w = Window.partitionBy("o_custkey").orderBy(col("day_num"))
      .rangeBetween(-6, Window.currentRow)
    t(spark, dir, "orders")
      .withColumn("day_num", dayNum)
      .select(
        col("o_custkey").as("custkey"),
        col("o_orderkey").as("orderkey"),
        col("day_num"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("rolling_7d_total"))
      .orderBy("custkey", "orderkey")
  }

  /** Date-function family beyond the reference's F1-F6: month arithmetic
    * with end-of-month clamping, last_day, day offsets, ISO week, quarter.
    */
  def dateFunctions(spark: SparkSession, dir: String): DataFrame = {
    val d = col("d")
    t(spark, dir, "orders")
      .select(col("o_orderdate").cast("date").as("d")).distinct()
      .select(
        d.cast("string").as("d"),
        add_months(d, 3).cast("string").as("plus_3m"),
        last_day(d).cast("string").as("month_end"),
        date_add(d, 7).cast("string").as("plus_7d"),
        weekofyear(d).as("week"),
        quarter(d).as("quarter"),
        date_trunc("quarter", d).cast("date").cast("string")
          .as("quarter_start"))
      .orderBy("d")
  }

  /** Conditional / boolean / collection aggregates: count_if, bool_and,
    * bool_or, and a deterministic string aggregation (sorted collect_set).
    */
  def condAggs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        count_if(col("o_totalprice") > 100000).as("n_big"),
        bool_and(col("o_totalprice") > 0).as("all_positive"),
        bool_or(col("o_orderpriority") === "1-URGENT").as("any_urgent"),
        array_join(sort_array(collect_set(col("o_orderpriority"))), ",")
          .as("priorities"))
      .orderBy("status")

  /** Regex family: group extraction, boolean match, global replace. */
  def regexFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        regexp_extract(col("p_type"), "(\\w+)$", 1).as("last_type"),
        col("p_name").rlike("\\d").as("has_digit"),
        regexp_replace(col("p_brand"), "#", "-").as("brand_dashed"))
      .orderBy("p_partkey")

  /** TPC-H Q3-shaped shipping-priority query: segment-filtered 3-way join,
    * discounted-revenue aggregation, top-10. Filters push to the scans;
    * customer probe broadcasts.
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val disc = sum(col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
      .cast("double")
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1996-01-01"))
      .join(t(spark, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        col("o_orderdate").cast("date").cast("string").as("orderdate"),
        col("o_orderpriority").as("priority"))
      .agg(disc.as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped local-supplier-volume query: 6-way star join through
    * region/nation with customer-supplier nation co-location.
    */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val disc = sum(col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
      .cast("double")
    val nation = broadcast(t(spark, dir, "nation")
      .join(broadcast(t(spark, dir, "region")
        .filter(col("r_name") === "ASIA").select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name"))
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(spark, dir, "supplier")
        .select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(spark, dir, "customer")
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(disc.as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  /** CUBE grouping sets with grouping() indicators (beyond q17's ROLLUP). */
  def cubeCounts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        // grouping() must resolve against the Aggregate node itself — in a
        // later projection it has no grouping-set context and fails analysis
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("g_status"), col("g_priority"), col("n"))
      .orderBy("status", "priority", "g_status", "g_priority")

  /** Correlated EXISTS subquery (TPC-H Q4 shape): orders having at least one
    * bulk lineitem, counted per priority. Runs through spark.sql to exercise
    * subquery decorrelation (rewritten to a left-semi join on o_orderkey).
    */
  def existsCorrelated(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_ec")
    t(spark, dir, "lineitem").createOrReplaceTempView("lineitem_ec")
    spark.sql(
      """SELECT o_orderpriority AS priority, count(*) AS n_orders
        |FROM orders_ec o
        |WHERE EXISTS (SELECT 1 FROM lineitem_ec l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_quantity >= 45)
        |GROUP BY 1 ORDER BY priority""".stripMargin)
  }

  /** Analytic window family: ntile / percent_rank / cume_dist /
    * first_value / last_value over a tie-free per-status ordering (unique
    * (o_totalprice, o_orderkey) makes every rank function deterministic and
    * the rank ratios exact integer-over-integer doubles).
    */
  def windowFamily(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    t(spark, dir, "orders")
      .select(
        col("o_orderkey").as("orderkey"),
        col("o_orderstatus").as("status"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cum_dist"),
        first_value(col("o_orderkey")).over(wFull).as("cheapest_key"),
        last_value(col("o_orderkey")).over(wFull).as("priciest_key"))
      .orderBy("orderkey")
  }

  /** FULL OUTER join of two per-date aggregates (order dates vs ship dates),
    * null-coalesced on both key and measures.
    */
  def fullOuterDates(spark: SparkSession, dir: String): DataFrame = {
    val od = t(spark, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").cast("string").as("od"))
      .agg(count(lit(1)).as("n_orders"))
    val ld = t(spark, dir, "lineitem")
      .groupBy(col("l_shipdate").cast("date").cast("string").as("ld"))
      .agg(count(lit(1)).as("n_shipped"))
    od.join(ld, col("od") === col("ld"), "full")
      .select(
        coalesce(col("od"), col("ld")).as("d"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_shipped"), lit(0L)).as("n_shipped"))
      .orderBy("d")
  }

  /** Cross join (small x small): every nation-region combination. */
  def crossJoinSmall(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "nation").select(col("n_name"))
      .crossJoin(t(spark, dir, "region").select(col("r_name")))
      .orderBy("n_name", "r_name")

  /** Map-typed column surface: per status, build priority->count map
    * (map_from_entries over a sorted entry list), then read it back with
    * element_at / size / sorted keys — outputs are scalars so the oracle
    * stays engine-portable.
    */
  def mapOps(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus").as("status"),
        col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("status"))
      .agg(map_from_entries(sort_array(
        collect_list(struct(col("priority"), col("cnt"))))).as("m"))
      .select(
        col("status"),
        element_at(col("m"), "1-URGENT").as("n_urgent"),
        size(col("m")).cast("int").as("n_priorities"),
        array_join(map_keys(col("m")), ",").as("priorities"))
      .orderBy("status")

  /** IN subquery + HAVING: orders of customers with >= 15 orders (the
    * testdata's per-customer order counts top out around 18-25, so this
    * selects a real, non-empty slice at every scale factor).
    */
  def inSubqueryHaving(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_in")
    spark.sql(
      """SELECT o_orderkey, o_custkey FROM orders_in
        |WHERE o_custkey IN (SELECT o_custkey FROM orders_in
        |                    GROUP BY o_custkey HAVING count(*) >= 15)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Extended string-function gallery: translate / pad / repeat / reverse /
    * position / substring-by-side / edit distance — every function here has
    * identical semantics in DuckDB, making the whole projection
    * hash-comparable.
    */
  def stringGallery(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        translate(col("p_brand"), "#", "_").as("brand_t"),
        lpad(col("p_brand"), 12, "*").as("brand_lpad"),
        rpad(col("p_brand"), 12, "*").as("brand_rpad"),
        repeat(col("p_brand"), 2).as("brand_x2"),
        reverse(col("p_brand")).as("brand_rev"),
        instr(col("p_name"), "a").cast("long").as("first_a"),
        expr("left(p_name, 5)").as("left5"),
        expr("right(p_name, 5)").as("right5"),
        levenshtein(col("p_brand"), col("p_type")).cast("long").as("edit_dist"),
        ascii(col("p_brand")).cast("int").as("first_code"))
      .orderBy("p_partkey")

  /** Null-handling gallery: nullif / nvl / nvl2 / coalesce chains /
    * null-safe equality, over a column made nullable via nullif.
    */
  def nullGallery(spark: SparkSession, dir: String): DataFrame = {
    val maybeNull = nullif(col("o_orderpriority"), lit("3-MEDIUM"))
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        maybeNull.as("prio_or_null"),
        coalesce(maybeNull, lit("DEFAULTED")).as("prio_filled"),
        when(maybeNull.isNull, lit(0L)).otherwise(lit(1L)).as("has_prio"),
        (maybeNull <=> lit("1-URGENT")).as("urgent_nullsafe"),
        greatest(col("o_totalprice"), lit(0.0)).as("price_floor"))
      .orderBy("o_orderkey")
  }

  /** Timestamp/date conversion gallery: epoch seconds round-trip, make_date,
    * date_part extraction, day-difference arithmetic.
    */
  def timestampGallery(spark: SparkSession, dir: String): DataFrame = {
    val d = col("o_orderdate").cast("date")
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        unix_date(d).cast("long").as("epoch_days"),
        date_part(lit("year"), d).cast("long").as("y"),
        date_part(lit("doy"), d).cast("long").as("day_of_year"),
        make_date(lit(2024), month(d), lit(1)).cast("string").as("anchor_month"),
        datediff(lit("1998-12-31").cast("date"), d).cast("long")
          .as("days_to_end"))
      .orderBy("o_orderkey")
  }

  /** Skew-safe two-phase aggregation ([[graft.operators.Skew.saltedSum]]):
    * partial aggregate on (key, salt) then final on key, so one hot key
    * spreads over saltFactor reducers. The oracle is the PLAIN group-by —
    * salting must be invisible in the result (sums of integral quantities
    * stay exact under any partial-aggregation order).
    */
  def skewSaltedAgg(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedSum(
      t(spark, dir, "lineitem"), "l_returnflag", "l_quantity",
      saltFactor = 16)
      .orderBy("l_returnflag")

  /** Correlated scalar subquery: each customer's maximal-price orders
    * (q23 covers the uncorrelated scalar form; this exercises per-row
    * correlation, which Catalyst decorrelates into an aggregate + join).
    */
  def correlatedScalar(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_cs")
    spark.sql(
      """SELECT o1.o_orderkey, o1.o_custkey FROM orders_cs o1
        |WHERE o1.o_totalprice = (SELECT MAX(o2.o_totalprice)
        |                         FROM orders_cs o2
        |                         WHERE o2.o_custkey = o1.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** LATERAL correlated derived table: top-2 orders per customer by price
    * through a per-row subquery with ORDER BY + LIMIT (the planner turns
    * this into a ranked window; semantically it is the SQL-standard lateral
    * form both engines support).
    */
  def lateralTopOrders(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("customer_lat")
    t(spark, dir, "orders").createOrReplaceTempView("orders_lat")
    spark.sql(
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer_lat c,
        | LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat o
        |          WHERE o.o_custkey = c.c_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey
        |          LIMIT 2) t
        |ORDER BY c_custkey, o_orderkey""".stripMargin)
  }

  /** Statistical moment aggregates per group: sample stddev/variance,
    * correlation, covariance, linear-regression slope/intercept, boolean
    * aggregates, count_if. Both engines compute identical mathematical
    * quantities; results are rounded to 4dp on BOTH sides to absorb
    * summation-order float noise (the money columns stay decimal-exact
    * elsewhere; second-moment aggregates have no decimal form).
    */
  def statMoments(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4)
          .as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 4)
          .as("covar_qty_disc"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4)
          .as("slope_price_qty"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4)
          .as("icept_price_qty"),
        bool_and(col("l_quantity") > 0).as("all_pos_qty"),
        bool_or(col("l_discount") > lit(0.09)).as("any_big_disc"),
        count_if(col("l_tax") > lit(0.05)).as("n_high_tax"))
      .orderBy("l_returnflag")

  /** IGNORE NULLS window navigation over a sparse measure: last non-null
    * carried forward (gap fill), next non-null, and the group's 2nd
    * non-null — the time-series repair idioms.
    */
  def windowIgnoreNulls(spark: SparkSession, dir: String): DataFrame = {
    val sparse = when(col("o_totalprice") > 150000, col("o_totalprice"))
    val w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
    val wFull = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    t(spark, dir, "orders")
      .select(
        col("o_orderkey").as("orderkey"),
        col("o_orderstatus").as("status"),
        lag(sparse, 1, null, ignoreNulls = true).over(w).as("prev_big"),
        lead(sparse, 1, null, ignoreNulls = true).over(w).as("next_big"),
        nth_value(sparse, 2, ignoreNulls = true).over(wFull)
          .as("second_big"))
      .orderBy("orderkey")
  }

  /** Explicit GROUPING SETS (beyond q17 rollup / q30 cube): totals by
    * (status, priority), by status alone, and the grand total in one pass,
    * with GROUPING() flags disambiguating real nulls from subtotal rows.
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT o_orderstatus AS status, o_orderpriority AS priority,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        | CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), ())
        |ORDER BY g_status, g_priority, status, priority""".stripMargin)
  }

  /** Multiset set operations (ALL variants keep duplicates with bag
    * semantics — q21 covers the distinct forms): ship-date bags vs
    * order-date bags.
    */
  def setOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(col("o_orderdate").cast("date").cast("string").as("d"))
    val l = t(spark, dir, "lineitem")
      .select(col("l_shipdate").cast("date").cast("string").as("d"))
    l.intersectAll(o).groupBy("d").agg(count(lit(1)).as("n"))
      .withColumn("op", lit("intersect_all"))
      .unionByName(
        l.exceptAll(o).groupBy("d").agg(count(lit(1)).as("n"))
          .withColumn("op", lit("except_all")))
      .orderBy("op", "d")
  }

  /** Date-spine gap fill: generate the full month spine between the first
    * and last order date (`sequence` + explode — the generator idiom), left
    * join monthly order totals, and zero-fill empty months. The standard
    * time-series densification pattern; months with no orders MUST appear.
    */
  def dateSpineFill(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(date_trunc("month", col("o_orderdate")).cast("date").as("m"),
        col("o_totalprice"))
    val bounds = o.agg(min("m").as("lo"), max("m").as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("interval 1 month")))
        .as("m"))
    val monthly = o.groupBy("m")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
    spine.join(monthly, Seq("m"), "left")
      .select(col("m").cast("string").as("month"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"))
      .orderBy("month")
  }

  /** UNPIVOT (melt): wide per-flag quantity/revenue aggregates back to long
    * (measure, value) rows — the inverse of q19's PIVOT.
    */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame = {
    val wide = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"),
        countDistinct("l_partkey").cast("double").as("n_parts"))
    wide.unpivot(
      Array(col("l_returnflag")),
      Array(col("sum_qty"), col("sum_price"), col("n_parts")),
      "measure", "value")
      .orderBy("l_returnflag", "measure")
  }

  // ---------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_pricing" -> aggPricing _,
    "q02_agg_status_month" -> aggStatusMonth _,
    "q03_agg_avg_ticket" -> aggAvgTicket _,
    "q04_topk_revenue" -> topkRevenue _,
    "q05_rolling_window" -> rollingWindow _,
    "q06_dedup_latest" -> dedupLatest _,
    "q07_join_left_probe" -> joinLeftProbe _,
    "q08_join_inner" -> joinInner _,
    "q09_join_anti" -> joinAnti _,
    "q10_join_semi" -> joinSemi _,
    "q11_union_distinct" -> unionDistinct _,
    "q12_unknown_member" -> unknownMember _,
    "q13_date_dim" -> dateDim _,
    "q14_dq_rates" -> dqRates _,
    "q15_scalar_funcs" -> scalarFuncs _,
    "q16_window_analytics" -> windowAnalytics _,
    "q17_rollup" -> rollupCounts _,
    "q18_topk_per_group" -> topkPerGroup _,
    "q19_pivot" -> pivotCounts _,
    "q20_group_stats" -> groupStats _,
    "q21_setops" -> setOps _,
    "q22_sql_entry" -> sqlEntry _,
    "q23_scalar_subquery" -> scalarSubquery _,
    "q24_range_window" -> rangeWindow _,
    "q25_date_functions" -> dateFunctions _,
    "q26_cond_aggs" -> condAggs _,
    "q27_regex" -> regexFuncs _,
    "q28_shipping_priority" -> shippingPriority _,
    "q29_local_supplier_volume" -> localSupplierVolume _,
    "q30_cube" -> cubeCounts _,
    "q31_exists_correlated" -> existsCorrelated _,
    "q32_window_family" -> windowFamily _,
    "q33_full_outer" -> fullOuterDates _,
    "q34_cross_join" -> crossJoinSmall _,
    "q35_map_ops" -> mapOps _,
    "q36_in_subquery" -> inSubqueryHaving _,
    "q37_skew_salted_agg" -> skewSaltedAgg _,
    "q38_string_gallery" -> stringGallery _,
    "q39_null_gallery" -> nullGallery _,
    "q40_timestamp_gallery" -> timestampGallery _,
    "q41_correlated_scalar" -> correlatedScalar _,
    "q42_lateral_topk" -> lateralTopOrders _,
    "q43_stat_moments" -> statMoments _,
    "q44_window_ignore_nulls" -> windowIgnoreNulls _,
    "q45_grouping_sets" -> groupingSets _,
    "q46_setops_all" -> setOpsAll _,
    "q47_date_spine_fill" -> dateSpineFill _,
    "q48_unpivot" -> unpivotMeasures _)

  val oracles: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | SUM(l_quantity) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS disc_revenue,
        | CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_agg_status_month" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
        | o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS total_orders
        |FROM orders GROUP BY 1, 2 ORDER BY month, status""".stripMargin,
    "q03_agg_avg_ticket" ->
      """SELECT l_orderkey,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_ticket,
        | CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q04_topk_revenue" ->
      """SELECT c.c_custkey AS custkey, c.c_name AS name,
        | CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1, 2 ORDER BY revenue DESC, custkey LIMIT 10""".stripMargin,
    "q05_rolling_window" ->
      """SELECT o.o_custkey AS custkey,
        | CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderdate >= (SELECT MAX(o_orderdate) FROM orders) - INTERVAL 90 DAY
        |GROUP BY 1 ORDER BY custkey""".stripMargin,
    "q06_dedup_latest" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM (
        | SELECT *, row_number() OVER (
        |   PARTITION BY o_custkey
        |   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        | FROM orders) WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
    "q07_join_left_probe" ->
      """SELECT o.o_orderkey AS orderkey,
        | CASE WHEN c.c_custkey IS NULL THEN -1 ELSE o.o_custkey END AS cust_fk
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY orderkey""".stripMargin,
    "q08_join_inner" ->
      """SELECT o.o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY status""".stripMargin,
    "q09_join_anti" ->
      """SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM part p
        |  WHERE p.p_partkey = l.l_partkey AND p.p_size <= 10)
        |ORDER BY l_orderkey, l_partkey, l_linenumber""".stripMargin,
    "q10_join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q11_union_distinct" ->
      """SELECT DISTINCT d FROM (
        | SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d FROM orders
        | UNION ALL
        | SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS d FROM lineitem)
        |ORDER BY d""".stripMargin,
    "q12_unknown_member" ->
      """SELECT * FROM (
        | SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS segment
        | FROM customer
        | UNION ALL SELECT -1, 'UNKNOWN', 'UNKNOWN')
        |ORDER BY custkey""".stripMargin,
    "q13_date_dim" ->
      """SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_id,
        | CAST(d AS VARCHAR) AS date,
        | CAST(year(d) AS INT) AS year, CAST(month(d) AS INT) AS month,
        | monthname(d) AS month_name, CAST(day(d) AS INT) AS day,
        | strftime(d, '%a') AS day_of_week,
        | dayofweek(d) IN (0, 6) AS is_weekend
        |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
        |ORDER BY d""".stripMargin,
    "q14_dq_rates" ->
      """SELECT
        | CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS DOUBLE)
        |   / (SELECT COUNT(*) FROM orders) AS null_rate_custkey,
        | CAST((SELECT COUNT(*) FROM orders)
        |   - (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS DOUBLE)
        |   / (SELECT COUNT(*) FROM orders) AS dup_rate_orderkey,
        | CAST((SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |     (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS DOUBLE)
        |   / (SELECT COUNT(*) FROM lineitem) AS orphan_rate_lineitem""".stripMargin,
    "q15_scalar_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_uc,
        | substr(p_name, 1, 10) AS name_prefix,
        | CAST(length(p_name) AS BIGINT) AS name_len,
        | concat_ws('-', p_brand, p_type) AS brand_type,
        | CASE WHEN p_size IN (1, 5, 10) THEN 'small' ELSE 'big' END AS size_class,
        | coalesce(p_retailprice, 0.0) AS price,
        | CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS double_price,
        | -p_size AS neg_size
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q16_window_analytics" ->
      """SELECT o_custkey AS custkey, o_orderkey AS orderkey,
        | CAST(rank() OVER w AS BIGINT) AS order_rank,
        | lag(o_totalprice, 1) OVER w AS prev_total,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY custkey, orderkey""".stripMargin,
    "q17_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q18_topk_per_group" ->
      """SELECT p_brand, p_partkey, p_retailprice FROM (
        | SELECT p_brand, p_partkey, p_retailprice, row_number() OVER (
        |   PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        | FROM part) WHERE rn <= 3 ORDER BY p_brand, p_partkey""".stripMargin,
    "q19_pivot" ->
      """SELECT o_orderstatus AS status,
        | CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS "1-URGENT",
        | CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS "2-HIGH",
        | CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS "3-MEDIUM",
        | CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS "4-NOT SPECIFIED",
        | CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS "5-LOW"
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,
    "q20_group_stats" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS median_qty,
        | MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        | CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q21_setops" ->
      """SELECT d, 'both' AS op FROM (
        |  SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d FROM orders
        |  INTERSECT
        |  SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) FROM lineitem)
        |UNION ALL
        |SELECT d, 'orders_only' AS op FROM (
        |  SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d FROM orders
        |  EXCEPT
        |  SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) FROM lineitem)
        |ORDER BY d, op""".stripMargin,
    "q22_sql_entry" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
        | o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS total_orders
        |FROM orders GROUP BY 1, 2 ORDER BY month, status""".stripMargin,
    "q23_scalar_subquery" ->
      """SELECT o_orderkey FROM orders
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |      (SELECT COUNT(*) FROM orders) >
        |      (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q24_range_window" ->
      """SELECT o_custkey AS custkey, o_orderkey AS orderkey,
        | CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS INT)
        |   AS day_num,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_custkey
        |   ORDER BY datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
        |   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   AS rolling_7d_total
        |FROM orders ORDER BY custkey, orderkey""".stripMargin,
    "q25_date_functions" ->
      """SELECT CAST(d AS VARCHAR) AS d,
        | CAST(CAST(d + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus_3m,
        | CAST(last_day(d) AS VARCHAR) AS month_end,
        | CAST(d + 7 AS VARCHAR) AS plus_7d,
        | CAST(weekofyear(d) AS INT) AS week,
        | CAST(quarter(d) AS INT) AS quarter,
        | CAST(CAST(date_trunc('quarter', d) AS DATE) AS VARCHAR) AS quarter_start
        |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
        |ORDER BY d""".stripMargin,
    "q26_cond_aggs" ->
      """SELECT o_orderstatus AS status,
        | CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
        | bool_and(o_totalprice > 0) AS all_positive,
        | bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
        | string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
        |   AS priorities
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,
    "q27_regex" ->
      """SELECT p_partkey,
        | regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        | regexp_extract(p_type, '(\w+)$', 1) AS last_type,
        | regexp_matches(p_name, '\d') AS has_digit,
        | regexp_replace(p_brand, '#', '-', 'g') AS brand_dashed
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q28_shipping_priority" ->
      """SELECT l.l_orderkey,
        | CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS orderdate,
        | o.o_orderpriority AS priority,
        | CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |   (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
        |   AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l.l_shipdate > TIMESTAMP '1996-01-01'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q29_local_supplier_volume" ->
      """SELECT n.n_name,
        | CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |   (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
        |   AS DOUBLE) AS revenue,
        | CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |  AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "q30_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        | CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority, g_status, g_priority""".stripMargin,
    "q31_exists_correlated" ->
      """SELECT o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_quantity >= 45)
        |GROUP BY 1 ORDER BY priority""".stripMargin,
    "q32_window_family" ->
      """SELECT o_orderkey AS orderkey, o_orderstatus AS status,
        | CAST(ntile(4) OVER w AS INT) AS quartile,
        | percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cum_dist,
        | first_value(o_orderkey) OVER wf AS cheapest_key,
        | last_value(o_orderkey) OVER wf AS priciest_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice, o_orderkey),
        | wf AS (PARTITION BY o_orderstatus
        |        ORDER BY o_totalprice, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY orderkey""".stripMargin,
    "q33_full_outer" ->
      """SELECT coalesce(od.d, ld.d) AS d,
        | CAST(coalesce(od.n_orders, 0) AS BIGINT) AS n_orders,
        | CAST(coalesce(ld.n_shipped, 0) AS BIGINT) AS n_shipped
        |FROM (SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d,
        |        COUNT(*) AS n_orders FROM orders GROUP BY 1) od
        |FULL OUTER JOIN
        |     (SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS d,
        |        COUNT(*) AS n_shipped FROM lineitem GROUP BY 1) ld
        |ON od.d = ld.d
        |ORDER BY d""".stripMargin,
    "q34_cross_join" ->
      """SELECT n_name, r_name FROM nation CROSS JOIN region
        |ORDER BY n_name, r_name""".stripMargin,
    "q35_map_ops" ->
      """SELECT o_orderstatus AS status,
        | CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
        |   AS BIGINT) AS n_urgent,
        | CAST(COUNT(DISTINCT o_orderpriority) AS INT) AS n_priorities,
        | string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
        |   AS priorities
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,
    "q36_in_subquery" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT o_custkey FROM orders
        |                    GROUP BY o_custkey HAVING count(*) >= 15)
        |ORDER BY o_orderkey""".stripMargin,
    "q37_skew_salted_agg" ->
      """SELECT l_returnflag, SUM(l_quantity) AS sum_l_quantity,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q38_string_gallery" ->
      """SELECT p_partkey,
        | translate(p_brand, '#', '_') AS brand_t,
        | lpad(p_brand, 12, '*') AS brand_lpad,
        | rpad(p_brand, 12, '*') AS brand_rpad,
        | repeat(p_brand, 2) AS brand_x2,
        | reverse(p_brand) AS brand_rev,
        | CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
        | left(p_name, 5) AS left5,
        | right(p_name, 5) AS right5,
        | CAST(levenshtein(p_brand, p_type) AS BIGINT) AS edit_dist,
        | CAST(ascii(p_brand) AS INT) AS first_code
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q39_null_gallery" ->
      """SELECT o_orderkey,
        | nullif(o_orderpriority, '3-MEDIUM') AS prio_or_null,
        | coalesce(nullif(o_orderpriority, '3-MEDIUM'), 'DEFAULTED')
        |   AS prio_filled,
        | CASE WHEN nullif(o_orderpriority, '3-MEDIUM') IS NULL
        |   THEN 0 ELSE 1 END AS has_prio,
        | nullif(o_orderpriority, '3-MEDIUM') IS NOT DISTINCT FROM '1-URGENT'
        |   AS urgent_nullsafe,
        | greatest(o_totalprice, 0.0) AS price_floor
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q40_timestamp_gallery" ->
      """SELECT o_orderkey,
        | CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |   AS BIGINT) AS epoch_days,
        | CAST(date_part('year', CAST(o_orderdate AS DATE)) AS BIGINT) AS y,
        | CAST(date_part('doy', CAST(o_orderdate AS DATE)) AS BIGINT)
        |   AS day_of_year,
        | CAST(make_date(2024, CAST(month(CAST(o_orderdate AS DATE)) AS INT), 1)
        |   AS VARCHAR) AS anchor_month,
        | CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
        |   AS BIGINT) AS days_to_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q41_correlated_scalar" ->
      """SELECT o1.o_orderkey, o1.o_custkey FROM orders o1
        |WHERE o1.o_totalprice = (SELECT MAX(o2.o_totalprice)
        |                         FROM orders o2
        |                         WHERE o2.o_custkey = o1.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q42_lateral_topk" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        | LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |          WHERE o.o_custkey = c.c_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey
        |          LIMIT 2) t
        |ORDER BY c_custkey, o_orderkey""".stripMargin,
    "q43_stat_moments" ->
      """SELECT l_returnflag,
        | ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
        | ROUND(var_samp(l_quantity), 4) AS var_qty,
        | ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        | ROUND(covar_samp(l_quantity, l_discount), 4) AS covar_qty_disc,
        | ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope_price_qty,
        | ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS icept_price_qty,
        | bool_and(l_quantity > 0) AS all_pos_qty,
        | bool_or(l_discount > 0.09) AS any_big_disc,
        | CAST(count_if(l_tax > 0.05) AS BIGINT) AS n_high_tax
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q44_window_ignore_nulls" ->
      """SELECT o_orderkey AS orderkey, o_orderstatus AS status,
        | lag(CASE WHEN o_totalprice > 150000 THEN o_totalprice END
        |     IGNORE NULLS)
        |   OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey)
        |   AS prev_big,
        | lead(CASE WHEN o_totalprice > 150000 THEN o_totalprice END
        |      IGNORE NULLS)
        |   OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey)
        |   AS next_big,
        | nth_value(CASE WHEN o_totalprice > 150000 THEN o_totalprice END,
        |           2 IGNORE NULLS)
        |   OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |   AS second_big
        |FROM orders ORDER BY orderkey""".stripMargin,
    "q45_grouping_sets" ->
      """SELECT o_orderstatus AS status, o_orderpriority AS priority,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        | CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), ())
        |ORDER BY g_status, g_priority, status, priority""".stripMargin,
    "q46_setops_all" ->
      """WITH l AS (SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS d
        |           FROM lineitem),
        |     o AS (SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d
        |           FROM orders),
        |     ia AS (SELECT d FROM l INTERSECT ALL SELECT d FROM o),
        |     ea AS (SELECT d FROM l EXCEPT ALL SELECT d FROM o)
        |SELECT d, CAST(COUNT(*) AS BIGINT) AS n, 'intersect_all' AS op
        |FROM ia GROUP BY d
        |UNION ALL
        |SELECT d, CAST(COUNT(*) AS BIGINT) AS n, 'except_all' AS op
        |FROM ea GROUP BY d
        |ORDER BY op, d""".stripMargin,
    "q47_date_spine_fill" ->
      """WITH bounds AS (
        |  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
        |         CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
        |  FROM orders),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(lo, hi,
        |                                     INTERVAL '1 month')) AS DATE) AS m
        |  FROM bounds),
        |monthly AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |         CAST(COUNT(*) AS BIGINT) AS n_orders,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT CAST(s.m AS VARCHAR) AS month,
        |       COALESCE(mo.n_orders, 0) AS n_orders,
        |       COALESCE(mo.revenue, 0.0) AS revenue
        |FROM spine s LEFT JOIN monthly mo ON s.m = mo.m
        |ORDER BY month""".stripMargin,
    "q48_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag,
        |         SUM(l_quantity) AS sum_qty,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |           AS sum_price,
        |         CAST(COUNT(DISTINCT l_partkey) AS DOUBLE) AS n_parts
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, measure, value
        |FROM wide UNPIVOT (value FOR measure IN (sum_qty, sum_price, n_parts))
        |ORDER BY l_returnflag, measure""".stripMargin)
}
