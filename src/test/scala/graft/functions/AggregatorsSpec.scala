package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("minhashUnion matches the document-side signature of the union set") {
    // group elements 10..19; the aggregate over rows must equal the
    // expression over the materialized array (same numHashes + seed)
    val rows = (10L to 19L).map(h => ("g", h)).toDF("g", "h")
    val viaAgg = rows.groupBy("g")
      .agg(Aggregators.minhashUnion($"h", numHashes = 32).as("sig"))
      .select("sig").as[Array[Long]].head()
    val viaExpr = rows.groupBy("g")
      .agg(sort_array(collect_list($"h")).as("hs"))
      .select(Dedup.minhashSignature($"hs", 32).as("sig"))
      .as[Array[Long]].head()
    assert(viaAgg.toSeq == viaExpr.toSeq)
  }

  test("topByScore keeps the k best with smallest-id ties, any partitioning") {
    // group A: scores 0..9 on ids 100..109, plus a tie pair at score 9.0
    val rows = ((0 until 10).map(i => ("A", i.toDouble, 100L + i)) ++
      Seq(("A", 9.0, 50L), ("B", 1.0, 7L), ("B", Double.NaN, 8L)))
      .toDF("g", "s", "id")
    def run(parts: Int): Map[String, Seq[(Double, Long)]] = rows
      .repartition(parts)
      .groupBy("g")
      .agg(Aggregators.topByScore($"s", $"id", 3).as("t"))
      .select($"g", $"t._1", $"t._2")
      .as[(String, Seq[Double], Seq[Long])].collect()
      .map { case (g, ss, ids) => g -> ss.zip(ids) }.toMap
    val one = run(1)
    // best-first: score 9 tie broken toward id 50, then 109, then 8.0/108
    assert(one("A") == Seq((9.0, 50L), (9.0, 109L), (8.0, 108L)))
    // NaN never selected; group smaller than k returns all it has
    assert(one("B") == Seq((1.0, 7L)))
    assert(run(7) == one)
  }

  test("diversitySample: per-cell cap, prototypical-first, covers tail cells") {
    // two well-separated planted clusters in 4-d, sizes 30 and 3
    val vecs =
      (0 until 30).map(i => (i.toLong,
        Array(10f + i * 0.01f, 0f, 0f, 1f))) ++
      (0 until 3).map(i => (1000L + i, Array(0f, -10f - i * 0.01f, 0f, 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val picks = graft.operators.Similarity
      .diversitySample(df, perCluster = 5, nClusters = 2, trainSample = 100)
      .as[(Long, Int, Double)].collect()
    val byCell = picks.groupBy(_._2)
    assert(byCell.size == 2) // both planted clusters represented
    assert(byCell.values.forall(_.length <= 5))
    // the dense cluster is capped at 5; the sparse one keeps all 3
    assert(picks.count(_._1 < 1000L) == 5)
    assert(picks.count(_._1 >= 1000L) == 3)
  }

  test("minhashUnion is repartition-invariant (algebraic merge)") {
    val rows = (1L to 500L).map(h => ((h % 3).toString, h)).toDF("g", "h")
    def run(parts: Int) = rows.repartition(parts)
      .groupBy("g").agg(Aggregators.minhashUnion($"h").as("sig"))
      .select($"g", $"sig").as[(String, Array[Long])]
      .collect().map { case (g, s) => g -> s.toSeq }.toMap
    assert(run(1) == run(7))
  }

  test("denseGrad matches brute-force gradients and is repartition-invariant") {
    // rows: (buckets, g, nf, grad?, stat?) over a 8-bucket table
    val nb = 8
    val data = Seq(
      (Array(0, 1, 1, 3), 0.5, 4, true, true),
      (Array(2, 3), -0.25, 2, true, true),
      (Array(1, 7, 7), 1.0, 3, true, false), // grad-only (sampled row)
      (Array(0, 5), 0.0, 2, false, true) // stat-only (full-frame row)
    )
    // brute force
    val expGrads = new Array[Double](nb + 2)
    val expDf = new Array[Long](nb)
    data.foreach { case (bs, g, nf, isG, isS) =>
      if (isG) {
        bs.foreach(b => expGrads(b) += g / nf)
        expGrads(nb) += g
      }
      if (isS) {
        expGrads(nb + 1) += 1.0
        bs.distinct.foreach(b => expDf(b) += 1L)
      }
    }
    def run(parts: Int) = {
      val out = data.toDF("b", "g", "nf", "gr", "st").repartition(parts)
        .select(Aggregators.denseGrad(nb, withDf = true,
          $"b", $"g", $"nf", $"gr", $"st").as("o"))
        .head().getStruct(0)
      (out.getAs[scala.collection.Seq[Double]](0).toSeq,
        out.getAs[scala.collection.Seq[Long]](1).toSeq)
    }
    val (g1, df1) = run(1)
    assert(g1.zip(expGrads).forall { case (a, e) => math.abs(a - e) < 1e-12 },
      s"got $g1 want ${expGrads.toSeq}")
    assert(df1 == expDf.toSeq)
    assert(run(5) == run(1), "merge must be partition-order invariant")
  }

  test("sigJaccard estimates group overlap") {
    // A = {1..100}, B = {51..150}: true J = 50/150 = 1/3; C disjoint
    val rows = ((1L to 100L).map(("a", _)) ++ (51L to 150L).map(("b", _)) ++
      (1000L to 1050L).map(("c", _))).toDF("g", "h")
    val sigs = rows.groupBy("g")
      .agg(Aggregators.minhashUnion($"h", numHashes = 256).as("sig"))
    val j = sigs.as("x").crossJoin(sigs.as("y"))
      .filter($"x.g" < $"y.g")
      .select($"x.g", $"y.g",
        Aggregators.sigJaccard($"x.sig", $"y.sig").as("j"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(math.abs(j(("a", "b")) - 1.0 / 3) < 0.12) // 256 slots, ~3 sigma
    assert(j(("a", "c")) < 0.05 && j(("b", "c")) < 0.05)
  }

  test("bottomK: bounded, distinct, repartition- and duplicate-invariant") {
    val base = (1L to 30L).map(("g", _)) // 30 distinct
    val withDups = base ++ base ++ base
    def run(rows: Seq[(String, Long)], parts: Int, k: Int) =
      rows.toDF("g", "h").repartition(parts).groupBy("g")
        .agg(Aggregators.bottomK($"h", k).as("s"))
        .select("s").as[Array[Long]].head().toSeq
    val s1 = run(base, 1, 8)
    assert(s1.length == 8 && s1 == s1.sorted && s1.distinct == s1)
    assert(run(withDups, 5, 8) == s1) // dups and partitioning don't matter
    assert(run(base, 3, 64).length == 30) // undersaturated -> all distinct
  }

  test("kmvDistinct estimates distinct counts from the sketch") {
    val k = 64
    val rows = (1L to 5000L).map(h => ("g", h)) ++
      (1L to 10L).map(h => ("small", h))
    val est = rows.toDF("g", "h").groupBy("g")
      .agg(Aggregators.bottomK($"h", k).as("s"))
      .select($"g", Aggregators.kmvDistinct($"s", k).as("d"))
      .as[(String, Double)].collect().toMap
    // RSE ~ 1/sqrt(k-2) ~ 12.7%; allow ~3 sigma
    assert(math.abs(est("g") - 5000.0) / 5000.0 < 0.4, est("g"))
    assert(est("small") == 10.0) // undersaturated is exact
  }

  test("spaceSaving finds heavy hitters above the N/capacity guarantee") {
    // true skew: two items carry most of the mass, 100-item uniform tail.
    // N = 1100; capacity 16 -> guarantee threshold N/16 ~ 69: "hot_a" (500)
    // and "hot_b" (300) MUST survive; tail items (3 each) need not.
    val rng = new scala.util.Random(7)
    val rows = rng.shuffle(
      Seq.fill(500)("hot_a") ++ Seq.fill(300)("hot_b") ++
        (0 until 100).flatMap(i => Seq.fill(3)(s"tail_$i")))
      .map(("g", _))
    val sketch = rows.toDF("g", "item").repartition(5)
      .groupBy("g")
      .agg(Aggregators.heavyHitters($"item", 16).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e._1".as("item"), $"e._2".as("cnt"), $"e._3".as("err"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sketch.length <= 16)
    Seq("hot_a" -> 500L, "hot_b" -> 300L).foreach { case (item, trueCount) =>
      val hit = sketch.find(_._1 == item)
      assert(hit.isDefined, s"$item missing from sketch: ${sketch.toSeq}")
      val (_, c, e) = hit.get
      assert(c >= trueCount && c <= trueCount + e,
        s"$item count $c outside [$trueCount, ${trueCount + e}]")
    }
    // ranking: the two true heavies are the sketch's top two
    assert(sketch.sortBy(-_._2).take(2).map(_._1).toSet == Set("hot_a", "hot_b"))
  }

  test("spaceSaving is exact below capacity") {
    val rows = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val out = rows.map(("g", _)).toDF("g", "item").repartition(3)
      .groupBy("g").agg(Aggregators.heavyHitters($"item", 16).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e._1", $"e._2", $"e._3")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(out == List(("a", 5L, 0L), ("b", 3L, 0L), ("c", 1L, 0L)))
  }

  test("partial aggregation: the plan map-side combines the sketch") {
    val rows = (1L to 100L).map(h => ((h % 5).toString, h)).toDF("g", "h")
    val plan = rows.groupBy("g")
      .agg(Aggregators.minhashUnion($"h").as("sig"))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate runs in partial + final mode around the exchange
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(plan.split("ObjectHashAggregate").length >= 3, plan.take(2000))
  }

  test("bloom bits: zero false negatives ever, low false positives at " +
      "design load, repartition-invariant") {
    import org.apache.spark.sql.functions.xxhash64
    val numBits = 1 << 12
    val k = 5
    val members = (0L until 300L).map(i => ("g", i))
    def buildBits(parts: Int): Array[Long] =
      members.toDF("g", "v").repartition(parts)
        .groupBy("g")
        .agg(Aggregators.bloomBits(xxhash64($"v"), numBits, k).as("b"))
        .head().getSeq[Long](1).toArray
    val bits = buildBits(1)
    assert(bits.sameElements(buildBits(7)), "merge must equal union")
    // driver-side probe hashes must come from the SAME xxhash64
    val hashes = members.toDF("g", "v")
      .select($"v", xxhash64($"v").as("h"))
      .collect().map(r => r.getLong(1))
    hashes.foreach(h =>
      assert(Aggregators.BloomBits.contains(bits, h, k),
        "false negative — bloom contract broken"))
    // non-members: fpp at 300 items in 4096 bits ~ 2%; allow generous 10%
    val nonHashes = ((1000L until 2000L).map(i => Tuple1(i)))
      .toDF("v").select(xxhash64($"v")).collect().map(_.getLong(0))
    val fp = nonHashes.count(h =>
      Aggregators.BloomBits.contains(bits, h, k))
    assert(fp < 100, s"false-positive rate implausibly high: $fp/1000")
  }
}
