package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.functions.expr.HashNgramExprs

class HashNgramClassifierSpec extends SparkSpec {
  import spark.implicits._

  // synthetic quality corpus: clean prose vs keyword-stuffed spam, with
  // disjoint-ish vocabularies so a linear model is learnable
  private val good = Seq(
    "the committee reviewed the proposal and published a detailed report",
    "researchers measured the effect across three independent experiments",
    "the library provides a clean interface for reading columnar data",
    "students discussed the novel over coffee after the evening lecture",
    "the engineer documented every step of the deployment procedure")
  private val bad = Seq(
    "buy cheap buy cheap buy cheap click here click here best price",
    "free offer free offer free offer subscribe now subscribe now",
    "win money win money casino bonus casino bonus click click click",
    "cheap pills cheap pills best deal best deal order now order now",
    "click subscribe win free bonus cheap deal price offer now now")
  private val train = (good.map((_, 1.0)) ++ bad.map((_, 0.0)))
    .toDF("text", "label")

  test("buckets: unigrams + bigrams count, deterministic, in range") {
    val r = train.limit(1)
      .select(HashNgramClassifier.buckets($"text", 1 << 10, 2).as("b"))
      .select(size($"b").as("n"), array_min($"b").as("lo"),
        array_max($"b").as("hi"))
      .head()
    // 10 tokens -> 10 unigrams + 9 bigrams
    assert(r.getAs[Int]("n") == 19)
    assert(r.getAs[Int]("lo") >= 0 && r.getAs[Int]("hi") < (1 << 10))
  }

  test("fit separates held-out good from spam") {
    val model = HashNgramClassifier.fit(train, "text", "label",
      numBuckets = 1 << 12, wordNgrams = 2, epochs = 30, lr = 4.0)
    val heldOut = Seq(
      ("the committee measured the report across experiments", 1.0),
      ("click here free offer win money best price now", 0.0)
    ).toDF("text", "label")
    val scores = heldOut
      .select($"label", HashNgramClassifier.score($"text", model).as("s"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(scores(1.0) > 0.6, s"good held-out scored ${scores(1.0)}")
    assert(scores(0.0) < 0.4, s"spam held-out scored ${scores(0.0)}")
    // training rows should be confidently separated
    val trainAcc = train
      .select($"label", HashNgramClassifier.score($"text", model).as("s"))
      .filter(($"s" > 0.5) === ($"label" === 1.0))
      .count()
    assert(trainAcc == 10L)
  }

  test("momentum + pruned fit separates in fewer epochs") {
    // 8 momentum epochs with rare-feature pruning must reach full training
    // separation (plain GD needs ~20+ at this lr)
    val model = HashNgramClassifier.fit(train, "text", "label",
      numBuckets = 1 << 12, wordNgrams = 2, epochs = 8, lr = 2.0,
      momentum = 0.9, minDocFreq = 2)
    val acc = train
      .select($"label", HashNgramClassifier.score($"text", model).as("s"))
      .filter(($"s" > 0.5) === ($"label" === 1.0))
      .count()
    assert(acc == 10L, s"momentum fit separated only $acc/10")
    // pruning froze singleton n-grams at 0: at least some buckets stay 0
    // while the model still works
    assert(model.weights.count(_ != 0f) > 0)
  }

  test("mini-batch fit is reproducible and still learns") {
    def run() = HashNgramClassifier.fit(train, "text", "label",
      numBuckets = 1 << 12, wordNgrams = 2, epochs = 40, lr = 4.0,
      momentum = 0.5, batchFraction = 0.8)
    val m1 = run()
    val m2 = run()
    assert(m1.bias == m2.bias && m1.weights.toSeq == m2.weights.toSeq,
      "seeded mini-batch runs must be identical")
    val acc = train
      .select($"label", HashNgramClassifier.score($"text", m1).as("s"))
      .filter(($"s" > 0.5) === ($"label" === 1.0))
      .count()
    assert(acc >= 9L, s"mini-batch fit separated only $acc/10")
  }

  test("one-vs-all multiclass separates three synthetic languages") {
    val en = Seq("the quick brown fox jumps over the lazy dog and runs home",
      "a detailed report about the weather and the morning news",
      "she walked through the garden and watered every plant")
    val de = Seq("der schnelle braune fuchs springt ueber den faulen hund",
      "ein ausfuehrlicher bericht ueber das wetter und die nachrichten",
      "sie ging durch den garten und goss jede pflanze")
    val es = Seq("el rapido zorro marron salta sobre el perro perezoso",
      "un informe detallado sobre el clima y las noticias de la manana",
      "ella camino por el jardin y rego cada planta")
    val train = (en.map((_, "en")) ++ de.map((_, "de")) ++ es.map((_, "es")))
      .toDF("text", "lang")
    val models = HashNgramClassifier.fitMulticlass(train, "text", "lang",
      numBuckets = 1 << 12, epochs = 25, lr = 4.0, momentum = 0.5)
    assert(models.keySet == Set("en", "de", "es"))
    val preds = train
      .select($"lang",
        HashNgramClassifier.predictMulticlass($"text", models).as("pred"))
      .collect()
    val acc = preds.count(r => r.getString(0) == r.getString(1))
    assert(acc == 9, s"multiclass train accuracy $acc/9")
    // held-out sentences
    val held = Seq(("the dog runs through the morning garden", "en"),
      ("der hund springt durch den garten", "de"),
      ("el perro salta por el jardin", "es")).toDF("text", "want")
    val heldPred = held.select($"want",
      HashNgramClassifier.predictMulticlass($"text", models).as("pred"))
      .collect()
    assert(heldPred.count(r => r.getString(0) == r.getString(1)) >= 2)
  }

  test("token scoring and bucket scoring agree") {
    val model = HashNgramClassifier.Model(
      Array.tabulate(1 << 8)(i => (i % 7 - 3).toFloat / 10f), 0.2, 2)
    val both = train.select(
      HashNgramClassifier.score($"text", model).as("viaTokens"),
      HashNgramExprs.bucketScore(
        HashNgramClassifier.buckets($"text", model.numBuckets,
          model.wordNgrams), model.weights, model.bias).as("viaBuckets"))
      .collect()
    both.foreach(r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("int8-quantized scoring stays within the scale/8 error bound") {
    val model = HashNgramClassifier.fit(train, "text", "label",
      numBuckets = 1 << 12, wordNgrams = 2, epochs = 6, lr = 0.5)
    val qm = HashNgramClassifier.quantize(model)
    assert(qm.qweights.forall(q => q >= -127 && q <= 127))
    // quantization error per bucket <= scale/2; mean pooling preserves the
    // bound; sigmoid is 1/4-Lipschitz => score drift <= scale/8
    val tol = qm.scale / 8.0 + 1e-9
    val drift = train
      .select(abs(
        HashNgramClassifier.score($"text", model) -
          HashNgramClassifier.scoreQuantized($"text", qm)).as("d"))
      .agg(max($"d")).as[Double].head()
    assert(drift <= tol, s"quantized score drift $drift > $tol")
    // the quantized model still separates the classes
    val scored = train.select($"label",
      HashNgramClassifier.scoreQuantized($"text", qm).as("s"))
    val sep = scored.filter($"label" === 1.0).agg(min($"s"))
      .as[Double].head() -
      scored.filter($"label" === 0.0).agg(max($"s")).as[Double].head()
    assert(sep > 0, s"quantized model lost class separation ($sep)")
  }

  test("empty text scores sigmoid(bias)") {
    val model = HashNgramClassifier.Model(Array.fill(16)(1f), 0.0, 1)
    val s = Seq("").toDF("text")
      .select(HashNgramClassifier.score($"text", model).as("s"))
      .head().getDouble(0)
    assert(math.abs(s - 0.5) < 1e-12)
  }

  test("adagrad separates an imbalanced corpus where plain batch GD stalls") {
    // 4:1 imbalance in few epochs: the bias races to the majority logit
    // while per-feature gradients (df/n-scaled) crawl — plain full-batch GD
    // degenerates to majority-vote; AdaGrad's per-coordinate normalization
    // restores feature progress (observed on the synthetic corpus: score
    // separation ~5e-4 without, ~0.14 with)
    val imb = (good.flatMap(t => Seq(t, t + " indeed", t + " again", t))
      .map((_, 1.0)) ++ bad.take(5).map((_, 0.0))).toDF("text", "label")
    def sep(adagrad: Boolean): Double = {
      val m = HashNgramClassifier.fit(imb, "text", "label",
        numBuckets = 1 << 12, wordNgrams = 2, epochs = 6,
        lr = if (adagrad) 1.0 else 4.0,
        momentum = if (adagrad) 0.5 else 0.9, adagrad = adagrad)
      val r = imb.select($"label",
        HashNgramClassifier.score($"text", m).as("s"))
        .agg(avg(when($"label" === 1.0, $"s")).as("a1"),
          avg(when($"label" === 0.0, $"s")).as("a0")).head()
      r.getDouble(0) - r.getDouble(1)
    }
    val withAda = sep(adagrad = true)
    assert(withAda > 0.05, s"adagrad separation $withAda")
    assert(withAda > sep(adagrad = false) * 2,
      "adagrad should separate far better than plain GD at equal epochs")
  }

  test("multiclass refuses null labels loudly; NULL text predicts NULL " +
      "instead of the lexicographically-largest class") {
    val bad = Seq(("a b c", "x"), ("d e f", null), ("g h i", "y"))
      .toDF("text", "lang")
    val err = intercept[IllegalArgumentException] {
      HashNgramClassifier.fitMulticlass(bad, "text", "lang",
        numBuckets = 1 << 8, epochs = 1)
    }
    assert(err.getMessage.contains("NULL"), err.getMessage)
    // a NULL document must not silently classify (every per-class score
    // is null, and the struct sort would fall through to label order)
    val models = Map(
      "aa" -> HashNgramClassifier.Model(new Array[Float](1 << 8), 0.0, 2),
      "zz" -> HashNgramClassifier.Model(new Array[Float](1 << 8), 1.0, 2))
    val got = Seq(Option.empty[String], Some("some text")).toDF("text")
      .select(HashNgramClassifier.predictMulticlass($"text", models)
        .as("pred"))
      .collect()
    assert(got(0).isNullAt(0), s"NULL text predicted ${got(0)}")
    assert(got(1).getString(0) == "zz") // higher bias wins, not null path
  }
}
