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
}
