package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-trigram-profile language identification (Cavnar & Trenkle 1994
  * n-gram text categorization, reduced to a fixed high-frequency profile per
  * language): score each language by how many of the text's character
  * trigrams appear in that language's profile, pick the argmax.
  *
  * Compared to the marker-word heuristic ([[graft.functions.TextFunctions.langId]])
  * this needs no tokenization, catches morphology ("-ung", "-ção", "-ción")
  * rather than only closed-class words, and stays a single primitive pass
  * over the string — the shape that survives a 100 TB document scan.
  * Deterministic tie order matches the marker variant: und < de < en < es <
  * fr < pt on equal scores.
  */
case class TrigramLangIdExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lang_id_trigram expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    // Locale.ROOT: the default-locale overload is host-dependent (a
    // Turkish-locale executor lowercases "IS" to dotless-i "ıs" and the
    // English profile trigrams never fire) — language ID must classify
    // identically on every JVM and match the oracle's locale-free lower()
    val text = v.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    // pad with spaces so leading/trailing word-edge trigrams fire
    val s = " " + text + " "
    val scores = new Array[Int](TrigramLangIdExpr.Langs.length)
    var i = 0
    val n = s.length - 2
    while (i < n) {
      val tri = s.substring(i, i + 3)
      var l = 0
      while (l < TrigramLangIdExpr.Profiles.length) {
        if (TrigramLangIdExpr.Profiles(l).contains(tri)) scores(l) += 1
        l += 1
      }
      i += 1
    }
    var best = -1
    var bestScore = 0
    var l = 0
    while (l < scores.length) {
      if (scores(l) > bestScore) { bestScore = scores(l); best = l }
      l += 1
    }
    UTF8String.fromString(
      if (best < 0) "und" else TrigramLangIdExpr.Langs(best))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "lang_id_trigram"
}

object TrigramLangIdExpr {
  /** Tie-order is array order (first maximal wins). */
  val Langs: Array[String] = Array("de", "en", "es", "fr", "pt")

  /** High-frequency character trigrams per language (space = word edge,
    * every entry exactly 3 chars). Sources: standard published trigram
    * frequency lists for each language's function words and morphology;
    * deliberately small and discriminative rather than exhaustive.
    */
  val Profiles: Array[java.util.HashSet[String]] = {
    def set(ts: String*): java.util.HashSet[String] = {
      val h = new java.util.HashSet[String]()
      ts.foreach { t =>
        require(t.length == 3, s"profile trigram '$t' must be 3 chars")
        h.add(t)
      }
      h
    }
    Array(
      // de: articles, -ung/-icht/-sch morphology, auf/mit/für
      set("der", "die", "und", " un", "ein", " ei", "ich", "sch", "ung",
        "cht", "ist", "das", " da", "den", "gen", "ben", "ten", "ver",
        " ve", "nde", "che", " ge", "eit", "hen", "auf", " au", "mit",
        "für", " fü", "übe", "äch"),
      // en: the/and/-ing/-ion/-ed, wh- words
      set("the", " th", "ing", "ng ", " an", "and", " of", "of ", " to",
        "ed ", " in", "ion", "ent", " is", "tha", "hat", " be", "for",
        " fo", "ere", "his", "wit", "ith", "ly ", " he", "was", " wa",
        " yo", "you", " wh", "whi", "oug"),
      // es: la/el/-ción/que, -ado, ñ-carrying trigrams
      set(" la", "la ", " el", "el ", "ión", "ció", " qu", "que", "ue ",
        " co", "con", "una", " un", "ara", " pa", "par", "ado", "est",
        " es", "os ", "nte", "cia", "ien", "lo ", " lo", "los", "las",
        " y ", "aña", "eño"),
      // fr: le/les/des/-tion, eur/oux, est/dans
      set(" le", "le ", "les", "des", "ent", " pa", "par", " qu", "que",
        " et", "et ", "une", " un", "ait", "eur", "our", " po", "pou",
        "ais", "ous", " vo", "vou", "dan", "ans", "tio", "té ", "ré ",
        "ère", "ête", "çai", "eau"),
      // pt: -ção/ão, do/da contractions, lh/nh digraph trigrams
      set(" do", "do ", " da", "da ", "ão ", "ção", "çõe", " qu", "que",
        " co", "com", "uma", " um", "par", " pa", "ra ", " se", "os ",
        "ado", "nto", " es", "est", "men", " na", "na ", " no", "no ",
        "lho", "nha", "nho", "açã"))
  }
}
