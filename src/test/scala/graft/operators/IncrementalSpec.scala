package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {

  private val statePath = "target/incr_state"

  test("two incremental batches equal the one-shot aggregate exactly") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(statePath), true)

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val batch1 = orders.filter(col("o_orderkey") % 2 === 0)
    val batch2 = orders.filter(col("o_orderkey") % 2 =!= 0)

    Incremental.update(spark, statePath, batch1,
      Seq("o_orderstatus"), "o_totalprice", "o_custkey")
    Incremental.update(spark, statePath, batch2,
      Seq("o_orderstatus"), "o_totalprice", "o_custkey")

    val got = Incremental.readState(spark, statePath, "o_totalprice")
      .select("o_orderstatus", "n", "sum_o_totalprice", "n_distinct")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap

    // one-shot reference: same partial/merge pipeline over all data at once
    val oneShot = Incremental.readState(spark, {
      val p = "target/incr_oneshot"
      fs.delete(new org.apache.hadoop.fs.Path(p), true)
      Incremental.update(spark, p, orders,
        Seq("o_orderstatus"), "o_totalprice", "o_custkey")
      p
    }, "o_totalprice")
      .select("o_orderstatus", "n", "sum_o_totalprice", "n_distinct")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap

    assert(got.keySet == oneShot.keySet)
    got.keySet.foreach { k =>
      assert(got(k)._1 == oneShot(k)._1, s"count mismatch for $k")
      // decimal sums merge exactly, in any batch order
      assert(got(k)._2 == oneShot(k)._2, s"sum mismatch for $k")
      // HLL union is order-insensitive: merged estimate == one-shot estimate
      assert(got(k)._3 == oneShot(k)._3, s"distinct mismatch for $k")
    }

    // sanity against exact ground truth: counts exact, HLL within 5%
    val exact = orders.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("nd"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (k, (n, nd)) =>
      assert(got(k)._1 == n)
      assert(math.abs(got(k)._3 - nd).toDouble / nd < 0.05,
        s"HLL estimate ${got(k)._3} vs exact $nd for $k")
    }
  }

  test("state survives a crashed swap (tmp dir left behind is ignored)") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // simulate a crash artifact
    val junk = new org.apache.hadoop.fs.Path(statePath + "__next")
    fs.mkdirs(junk)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet").limit(10)
    val out = Incremental.update(spark, statePath, orders,
      Seq("o_orderstatus"), "o_totalprice", "o_custkey")
    assert(out.count() > 0)
    assert(!fs.exists(junk)) // tmp consumed by the successful swap
  }

  test("a crash BETWEEN the state delete and the rename does not lose " +
      "history: the complete __next is promoted, never overwritten as a " +
      "'first batch'") {
    val p = "target/incr_crashswap"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val state = new org.apache.hadoop.fs.Path(p)
    val tmp = new org.apache.hadoop.fs.Path(p + "__next")
    fs.delete(state, true); fs.delete(tmp, true)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val batch1 = orders.filter(col("o_orderkey") % 2 === 0)
    val batch2 = orders.filter(col("o_orderkey") % 2 =!= 0)
    Incremental.update(spark, p, batch1,
      Seq("o_orderstatus"), "o_totalprice", "o_custkey")
    Incremental.update(spark, p, batch2,
      Seq("o_orderstatus"), "o_totalprice", "o_custkey")
    val want = Incremental.readState(spark, p, "o_totalprice")
      .select("o_orderstatus", "n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // reconstruct the mid-swap crash state: the fully-written merge sits
    // at __next, the live state is deleted. Completeness is the
    // FRAMEWORK-OWNED sentinel, not the committer's _SUCCESS — delete
    // _SUCCESS to model an object-store cluster with success markers
    // disabled (marksuccessfuljobs=false), where keying the promote on
    // _SUCCESS would delete the only surviving copy of the state
    assert(fs.rename(state, tmp) || { fs.delete(tmp, true)
      fs.rename(state, tmp) })
    assert(fs.exists(new org.apache.hadoop.fs.Path(tmp, "_GRAFT_COMPLETE")))
    fs.delete(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"), false)
    // ANY state read via update must first promote, not restart: fold an
    // EMPTY batch and expect the full two-batch history intact (the old
    // code saw "no state", treated the empty batch as the first ever,
    // and overwrote the surviving merge with zero rows)
    val got = Incremental.update(spark, p, orders.limit(0),
      Seq("o_orderstatus"), "o_totalprice", "o_custkey")
      .select("o_orderstatus", "n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"history lost across the swap window: $got")
    // and a PARTIAL __next (no _SUCCESS) next to a live state is junk
    // from a crashed write: discarded, state untouched
    fs.mkdirs(tmp)
    val got2 = Incremental.readState(spark, p, "o_totalprice").count()
    assert(got2 == want.size.toLong)
  }
}
