package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[MarketBasket]] — hand-computed support/confidence/lift and the
  * basket-cap guard.
  */
class MarketBasketSpec extends SparkSpec {
  import spark.implicits._

  // 4 transactions: {1,2,3}, {1,2}, {1,3}, {2} (with a duplicate line
  // for (t1, item1) that distinct() must collapse)
  private val txns = Seq(
    (10L, 1L), (10L, 2L), (10L, 3L), (10L, 1L),
    (20L, 1L), (20L, 2L),
    (30L, 1L), (30L, 3L),
    (40L, 2L)
  ).toDF("t", "i")

  test("pair counts are distinct-item co-occurrences per transaction") {
    val got = MarketBasket.pairCounts(txns, "t", "i")
      .orderBy("item_a", "item_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 2L), (1L, 3L, 2L), (2L, 3L, 1L)))
  }

  test("rules carry exact counts and hand-computed measures in both " +
      "directions") {
    val got = MarketBasket.rules(txns, "t", "i", minSupport = 2L)
      .orderBy("antecedent", "consequent").collect()
    // pairs >= 2: (1,2) n=2 and (1,3) n=2; items: n_1=3, n_2=3, n_3=2; N=4
    assert(got.length === 4)
    val r12 = got.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    assert(r12.getLong(2) === 2L) // n_ab
    assert(r12.getLong(3) === 3L) // n_ante
    assert(r12.getLong(4) === 3L) // n_cons
    assert(r12.getLong(5) === 4L) // n_txn
    assert(r12.getDouble(6) === 2.0 / 4.0) // support
    assert(r12.getDouble(7) === 2.0 / 3.0) // confidence
    assert(r12.getDouble(8) === 8.0 / 9.0) // lift = 2*4/(3*3)
    val r31 = got.find(r => r.getLong(0) == 3L && r.getLong(1) == 1L).get
    assert(r31.getDouble(7) === 1.0) // 3 always implies 1
    assert(r31.getDouble(8) === (2.0 * 4.0) / (2.0 * 3.0))
  }

  test("the basket cap drops degenerate transactions structurally: a " +
      "mega-basket contributes no pairs, others are unaffected") {
    val mega = (0 until 50).map(i => (99L, i.toLong)).toDF("t", "i")
    val both = txns.unionByName(mega)
    val got = MarketBasket.pairCounts(both, "t", "i", maxBasketSize = 10)
      .orderBy("item_a", "item_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 2L), (1L, 3L, 2L), (2L, 3L, 1L)))
  }

  test("single-item transactions produce no pairs; minSupport filters") {
    val got = MarketBasket.rules(txns, "t", "i", minSupport = 3L)
    assert(got.count() === 0) // no pair reaches 3 co-occurrences
  }

  test("randomized brute-force equality: pair counts match an exact " +
      "in-memory model over 300 seeded transactions") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).flatMap { t =>
      val basket = (0 until 1 + rnd.nextInt(6))
        .map(_ => rnd.nextInt(20).toLong)
      basket.map(i => (t.toLong, i))
    }
    // exact model: distinct items per txn, all unordered pairs
    val model = rows.groupBy(_._1).values
      .flatMap { b =>
        val s = b.map(_._2).distinct.sorted
        for (i <- s.indices; j <- (i + 1) until s.length) yield (s(i), s(j))
      }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = MarketBasket.pairCounts(rows.toDF("t", "i"), "t", "i")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === model)
  }

  test("lift multiplies in decimal(38,0): wrap-proof past 2^63 and " +
      "value-identical to the long product in range") {
    val df = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (4L, 30L)).toDF("t", "i")
    val r = MarketBasket.rules(df, "t", "i", minSupport = 3L)
      .where(col("antecedent") === 10L).head()
    // n_ab=3, n_txn=4, n_ante=3, n_cons=3 -> lift = 12/9
    assert(r.getAs[Double]("lift") == 12.0 / 9.0)
    // pin the wrap-proof path: the plan multiplies decimals, not longs
    val analyzed = MarketBasket.rules(df, "t", "i")
      .queryExecution.analyzed.toString
    assert(analyzed.contains("decimal(38,0)"), analyzed)
  }
}
