package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join without a shuffle exchange") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderstatus")
    Layout.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Layout.writeBucketed(o, "o_bucketed", "o_orderkey", 8)
    // disable broadcast so the exchange-free plan can only come from
    // co-bucketing, not from a broadcast join
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(joined.count() ==
        li.join(o, col("l_orderkey") === col("o_orderkey")).count())
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in bucketed join plan:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("date-partitioned layout prunes partitions on read") {
    val ev = graft.Tables.events(spark, sfDir)
    Layout.writeDatePartitioned(ev, "target/events_parted", "ts")
    val jan2 = Layout.readPartitioned(spark, "target/events_parted")
      .filter(col("event_date") === "2024-01-02")
    val plan = jan2.queryExecution.executedPlan.toString
    // partition filter must reach the file index, not a post-scan Filter
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_date"), s"no partition pruning in:\n$plan")
    val expected = ev.filter(col("ts").cast("date") === "2024-01-02").count()
    assert(jan2.count() == expected)
  }

  test("range-sorted layout produces files with disjoint key ranges") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    Layout.writeRangeSorted(li, "target/li_rangesorted", "l_orderkey", 4)
    val ranges = spark.read.parquet("target/li_rangesorted")
      .groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      .orderBy("lo")
      .as[(String, Long, Long)].collect()
    assert(ranges.length >= 2)
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._2, s"overlapping file ranges: $a vs $b")
    }
    assert(spark.read.parquet("target/li_rangesorted").count() == li.count())
  }

  test("z-value interleaves bits; z-order bounds per-file spans in BOTH dims") {
    // zValue correctness on known interleavings
    val z = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L))
      .toDF("a", "b")
      .select(Layout.zValue($"a", $"b", 8).as("z")).as[Long].collect()
    assert(z.toSeq == Seq(0L, 1L, 2L, 15L, // 3,3 -> 0b1111
      // a=5 (101) even bits -> 1,0,1 at 0,2,4; b=2 (010) odd bits -> 0,1,0
      // at 1,3,5: 0b011001 = 25
      25L))

    // two independent uniform dimensions
    val n = 20000
    val df = spark.range(n.toLong).select(
      (col("id") * 2654435761L % 8192).as("x"),
      (col("id") * 40503L % 8192).as("y"))
    def spans(path: String, c: String): Double = {
      val per = spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c)))
          .cast("double").as("span"))
      per.agg(avg("span")).head().getDouble(0)
    }
    Layout.writeZOrdered(df, "target/layout_z", "x", "y",
      partitions = 16, bits = 13)
    Layout.writeRangeSorted(df, "target/layout_x", "x", partitions = 16)
    // sorting by x: x-spans tiny, y-spans ~ the whole 8192 domain
    assert(spans("target/layout_x", "y") > 7000.0)
    // z-order: BOTH dims' spans far under the domain — every file covers
    // a region, so range predicates on either dim skip most files
    assert(spans("target/layout_z", "x") < 4200.0,
      s"x span ${spans("target/layout_z", "x")}")
    assert(spans("target/layout_z", "y") < 4200.0,
      s"y span ${spans("target/layout_z", "y")}")
    // and the data is unchanged
    assert(spark.read.parquet("target/layout_z").count() == n.toLong)
  }

  test("salted join matches plain join results") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("k"), col("l_extendedprice").as("v"))
    val dim = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("s"))
    val plain = li.join(dim, Seq("k")).count()
    val salted = graft.operators.Skew.saltedJoin(li, dim, "k", saltFactor = 4)
      .count()
    assert(salted == plain)
  }

  test("salted aggregation matches plain aggregation") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag").as("k"), col("l_quantity").as("v"))
    val plain = li.groupBy("k").agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    val salted = graft.operators.Skew.saltedSum(li, "k", "v", saltFactor = 8)
      .as[(String, Double, Long)].collect().toSet
    assert(salted == plain) // integral quantities: double sums exact
  }
}
