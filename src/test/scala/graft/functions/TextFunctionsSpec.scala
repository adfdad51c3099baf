package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("t").select(c.as("v")).head().get(0)

  test("tokenCount handles empties and runs of whitespace") {
    assert(one("", TextFunctions.tokenCount($"t")) == 0)
    assert(one("   ", TextFunctions.tokenCount($"t")) == 0)
    assert(one("a  b\tc\nd", TextFunctions.tokenCount($"t")) == 4)
  }

  test("normalize collapses whitespace and case") {
    assert(one("  Foo   BAR\tbaz ", TextFunctions.normalize($"t")) ==
      "foo bar baz")
  }

  test("fingerprint is whitespace/case-insensitive and distinct by content") {
    val df = Seq("Hello  World", "hello world", "other text").toDF("t")
      .select(TextFunctions.fingerprint64($"t").as("f"))
    val fs = df.as[Long].collect()
    assert(fs(0) == fs(1))
    assert(fs(0) != fs(2))
  }

  test("punct and alpha ratios") {
    assert(one("ab,.", TextFunctions.punctRatio($"t")) == 0.5)
    assert(one("ab12", TextFunctions.alphaRatio($"t")) == 0.5)
    assert(one("", TextFunctions.punctRatio($"t")) == 0.0)
  }

  test("stopwordRatio counts marker words") {
    assert(one("the cat sat on the mat",
      TextFunctions.stopwordRatio($"t", TextFunctions.EnglishStopwords))
      .asInstanceOf[Double] === 3.0 / 6.0)
  }

  test("langId identifies real multilingual sentences") {
    val cases = Seq(
      ("the quick brown fox jumps with the lazy dog for fun", "en"),
      ("der hund ist nicht mit der katze und das ist gut", "de"),
      ("el perro es una mascota como los gatos pero mejor", "es"),
      ("le chien est dans les jardins pour une promenade", "fr"),
      ("o cachorro em um parque do bairro da cidade", "pt"),
      ("xyzzy plugh quux", "und"))
    cases.foreach { case (text, want) =>
      assert(one(text, TextFunctions.langId($"t")) == want, s"text=$text")
    }
  }

  test("trigram langId identifies sentences even without marker words") {
    val cases = Seq(
      // no "the/and/of" markers — morphology only
      ("something wonderful happened yesterday evening", "en"),
      // no der/die/und markers — -ung/sch/cht morphology
      ("geschwindigkeitsbegrenzung gilt innerhalb geschlossener ortschaften",
        "de"),
      ("la organización está preparando una celebración", "es"),
      ("le gouvernement prépare une réponse européenne", "fr"),
      ("a organização está preparando uma celebração", "pt"),
      ("zzz qqq kkk", "und"))
    cases.foreach { case (text, want) =>
      assert(one(text, TextFunctions.langIdTrigram($"t")) == want,
        s"text=$text")
    }
  }

  test("subwordCount splits letter runs, digits, punctuation") {
    // hello | , | world | 42 | ! (whitespace pieces dropped)
    assert(one("hello, world42!", TextFunctions.subwordCount($"t")) == 5)
  }

  test("qualityScore is in [0,1] and rewards prose") {
    val prose = "the quick brown fox jumps over the lazy dog " * 6
    val junk = "@@@@ #### !!!! %%%%"
    val p = one(prose, TextFunctions.qualityScore($"t")).asInstanceOf[Double]
    val j = one(junk, TextFunctions.qualityScore($"t")).asInstanceOf[Double]
    assert(p > j)
    assert(p >= 0.0 && p <= 1.0 && j >= 0.0 && j <= 1.0)
  }

  test("nfc: composed and decomposed forms collide, ascii passes through, " +
      "idempotent, non-BMP safe") {
    def nfcOf(s: String): String =
      Seq(Tuple1(s)).toDF("t").select(TextFunctions.nfc($"t"))
        .head().getString(0)
    val composed = "caf\u00e9"
    val decomposed = "cafe\u0301"
    assert(composed != decomposed)
    assert(nfcOf(decomposed) == composed)
    assert(nfcOf(composed) == composed)
    assert(nfcOf(nfcOf(decomposed)) == nfcOf(decomposed))
    assert(nfcOf("plain ascii stays") == "plain ascii stays")
    val emoji = "a😀b" // U+1F600, surrogate pair
    assert(nfcOf(emoji) == emoji)
    // fingerprints built on normalizeUnicode agree across forms
    val fps = Seq(Tuple1(composed), Tuple1(decomposed)).toDF("t")
      .select(md5(TextFunctions.normalizeUnicode($"t")))
      .collect().map(_.getString(0)).toSeq
    assert(fps.distinct.size == 1)
  }

  test("nfc expression stays inside whole-stage codegen") {
    val df = spark.range(10).selectExpr("cast(id as string) AS t")
      .select(TextFunctions.nfc($"t").as("n"))
    // the "*(1)" stage prefix marks whole-stage-codegen'd operators; a
    // CodegenFallback expression would strip it from the Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [nfc_normalize"), plan.take(1500))
    assert(df.count() == 10)
  }

  test("text statistics are null-in null-out; a NULL document cannot " +
      "score as prose (least() skips nulls — the old composite gave " +
      "a NULL doc 0.79, past the default keep-threshold)") {
    val df = Seq(Option.empty[String], Some("")).toDF("t")
    val stats = df.select(
      TextFunctions.qualityScore($"t").as("q"),
      TextFunctions.avgWordLength($"t").as("awl"),
      TextFunctions.punctRatio($"t").as("pr"),
      TextFunctions.alphaRatio($"t").as("ar"),
      TextFunctions.stopwordRatio($"t",
        TextFunctions.EnglishStopwords).as("sr"),
      TextFunctions.dupWordFraction($"t").as("dw"),
      TextFunctions.topWordFraction($"t").as("tw"),
      TextFunctions.dupBigramFraction($"t").as("db"))
      .collect()
    val nullRow = stats(0)
    assert((0 until nullRow.length).forall(nullRow.isNullAt),
      s"NULL text must yield NULL stats, got $nullRow")
    // the empty STRING is a real, measurable document: zero ratios
    val emptyRow = stats(1)
    assert((1 until emptyRow.length).forall(i =>
      emptyRow.getDouble(i) == 0.0), s"empty text stats: $emptyRow")
    assert(emptyRow.getDouble(0) >= 0.0 && emptyRow.getDouble(0) < 0.5)
  }
}
