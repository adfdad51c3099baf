package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WeightedMinHashSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private val docs = Seq(
    (0L, base),
    (1L, base), // exact dup
    (2L, base.replace("today", "tonight")), // near dup
    (3L, "completely different content about spark query engines and scale"),
    // TF variant: same shingle SET as 0 (doc 0's text twice over), but
    // every shingle weight doubled plus the seam shingles -> weighted
    // Jaccard ~0.5 where set Jaccard stays ~1.0
    (4L, base + " " + base)
  ).toDF("doc_id", "text")

  test("shingleTf counts repeated shingles; distinct docs share none") {
    val r = docs.filter($"doc_id" === 4L)
      .select(Dedup.shingleTf($"text", 3).as("tf"))
      .select(size($"tf.hashes").as("n"),
        array_max($"tf.weights").as("wmax"),
        array_min($"tf.weights").as("wmin"))
      .head()
    // doubled text: interior shingles appear twice (wmax=2), the seam
    // shingles ("today the", ...) once (wmin=1)
    assert(r.getAs[Double]("wmax") == 2.0)
    assert(r.getAs[Double]("wmin") == 1.0)
  }

  test("exact weighted jaccard: identical=1, doubled-TF ~0.5, distinct=0") {
    val tf = docs.select($"doc_id", Dedup.shingleTf($"text", 3).as("tf"))
    val j = tf.as("a").crossJoin(tf.as("b"))
      .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib"),
        Dedup.weightedJaccard($"a.tf.hashes", $"a.tf.weights",
          $"b.tf.hashes", $"b.tf.weights").as("j"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((0L, 1L)) == 1.0)
    assert(j((0L, 3L)) == 0.0)
    // min/max over doubled weights: 12/(2*12+2 seam) = ~0.46
    assert(j((0L, 4L)) > 0.35 && j((0L, 4L)) < 0.6)
  }

  test("ICWS law: signature match rate approximates weighted Jaccard") {
    val numHashes = 512
    val tf = docs.select($"doc_id", Dedup.shingleTf($"text", 3).as("tf"))
      .withColumn("sig", Dedup.icwsSignature($"tf.hashes", $"tf.weights",
        numHashes))
    val rates = tf.as("a").crossJoin(tf.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib"),
        Dedup.weightedJaccard($"a.tf.hashes", $"a.tf.weights",
          $"b.tf.hashes", $"b.tf.weights").as("jw"),
        (aggregate(zip_with($"a.sig", $"b.sig",
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes).as("rate"))
      .collect()
    rates.foreach { r =>
      val jw = r.getDouble(2)
      val rate = r.getDouble(3)
      // binomial std-err at n=512 is <= 0.023; allow 4 sigma
      assert(math.abs(rate - jw) < 0.09,
        s"pair (${r.getLong(0)},${r.getLong(1)}): jw=$jw rate=$rate")
    }
    assert(rates.length == 10)
  }

  test("weighted dedup drops exact dup but keeps the TF-doubled variant") {
    val ids = Dedup.weightedMinhashDedup(docs, "text", "doc_id",
      numHashes = 128, bands = 32, threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(1L)) // exact dup removed
    assert(ids.contains(4L)) // weighted Jaccard ~0.46 < 0.8 -> kept
    assert(ids.contains(0L) && ids.contains(3L))
  }

  test("candidates report exact weighted jaccard values") {
    val pairs = Dedup.weightedMinhashCandidates(docs, "text", "doc_id",
      numHashes = 128, bands = 32, threshold = 0.3)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) == 1.0)
    pairs.get((0L, 4L)).foreach(j => assert(j > 0.35 && j < 0.6))
  }
}
