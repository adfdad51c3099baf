package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Formats]] — lossless round trips through ORC / JSON Lines / CSV
  * on hostile content, and fingerprint sensitivity.
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private val nasty = Seq(
    (1L, "plain ascii", "en"),
    (2L, "unicode: caffè 日本語 🦆 é́", "multi"),
    (3L, "embedded \"quotes\", commas, and\nnewlines\ttabs", "en"),
    (4L, "", "empty"),
    (5L, null, "nulltext")
  ).toDF("id", "text", "lang")

  private def withTmp[A](f: String => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft-fmt")
    try f(root.toString)
    finally org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  for (fmt <- Seq("orc", "json", "csv")) {
    test(s"$fmt round trip preserves every row including unicode, " +
        "newlines, quotes, empty and null strings") {
      withTmp { root =>
        val back = Formats.roundTrip(spark, nasty, s"$root/$fmt", fmt)
        if (fmt == "csv") {
          // CSV's known lossy corner: null vs empty string conflate
          // under the default null/empty markers — assert the non-empty
          // rows round-trip exactly and nothing is lost or duplicated
          val got = back.filter(col("id") <= 3L)
            .orderBy("id").select("text").as[String].collect()
          val want = nasty.filter(col("id") <= 3L)
            .orderBy("id").select("text").as[String].collect()
          assert(got.toSeq === want.toSeq)
        } else {
          assert(Formats.fingerprint(back)
            .compareTo(Formats.fingerprint(nasty)) === 0)
        }
        assert(back.count() === 5)
      }
    }
  }

  test("fingerprint is order-insensitive but value-sensitive") {
    val fp = Formats.fingerprint(nasty)
    assert(Formats.fingerprint(nasty.orderBy(desc("id")))
      .compareTo(fp) === 0)
    val mutated = nasty.withColumn("text",
      when(col("id") === 1L, lit("plain ascii!")).otherwise(col("text")))
    assert(Formats.fingerprint(mutated).compareTo(fp) !== 0)
  }

  test("json read uses the supplied schema (no inference scan) and " +
      "preserves long/string types") {
    withTmp { root =>
      val back = Formats.roundTrip(spark, nasty, s"$root/j", "json")
      assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
        nasty.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    }
  }
}
