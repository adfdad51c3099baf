package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expr.CodepointFoldExpr

/** Pins [[CodepointFoldExpr]]'s BOTH evaluation paths. The codegen path
  * matters specifically because Spark's default `codegen.fallback=true`
  * SWALLOWS generated-code compile errors and silently interprets — a
  * broken `doGenCode` would pass every normal test while losing the
  * kernel's whole-stage claim. This spec turns fallback off, so a
  * codegen bug fails loudly here.
  */
class CodepointFoldSpec extends SparkSpec {
  import spark.implicits._

  private val foldAb = (97L * 31 + 98) % 1000003L
  private val foldAstral = ((0x1D11E.toLong % 1000003L) * 31 + 97) % 1000003L

  test("codegen-only session: projection and aggregate paths compile " +
      "and match the interpreted fold") {
    val child = spark.newSession()
    child.conf.set("spark.sql.codegen.fallback", "false")
    child.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    import child.implicits._
    val df = Seq(Some("ab"), Some("𝄞a"), Some(""), None).toDF("s")
    val proj = df.select(CodepointFoldExpr(col("s")).as("h"))
      .as[Option[Long]].collect().toSeq
    assert(proj == Seq(Some(foldAb), Some(foldAstral), Some(0L), None))
    val agg = graft.operators.Reconcile.columnChecksums(df, Seq("s"))
      .as[(String, Long, Long)].collect().head
    assert(agg == (("s", 3L, foldAb + foldAstral)))
  }

  test("interpreted path agrees (CodegenFallback-free expression, " +
      "evaluated via eval)") {
    val e = graft.functions.expr.CodepointFoldExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("ab")))
    assert(e.eval(null) == foldAb)
  }
}
