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
}
