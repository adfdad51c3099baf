package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface access to the native expressions via SparkSessionExtensions.
  * Needs its own session (extensions bind at session build), created against
  * the shared context and closed after.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // extensions bind only at session CREATION: getOrCreate would silently
    // reuse the suite-shared session, so detach it first (the SparkContext
    // is reused; only the session state is new)
    val shared = graft.SparkSpec.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.setDefaultSession(shared)
    s
  }

  test("cosine_sim is callable from SQL") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c," +
        " cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS o")
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("simhash64 and shingle_hashes are callable from SQL") {
    val r = spark.sql(
      "SELECT simhash64(array('a','b','c')) AS s1," +
        " simhash64(array('a','b','c')) AS s2," +
        " size(shingle_hashes(array('a','b','c','d'), 2)) AS n")
      .head()
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getInt(2) == 3) // ab, bc, cd
  }

  test("shingle_tf and weighted_jaccard are callable from SQL") {
    val r = spark.sql(
      """SELECT weighted_jaccard(a.hashes, a.weights, b.hashes, b.weights) AS j,
        |       size(a.hashes) AS n
        |FROM (SELECT shingle_tf(array('x','y','x','y'), 2) AS a,
        |             shingle_tf(array('x','y','x','y'), 2) AS b)
        |""".stripMargin)
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getInt(1) == 2) // "x y" and "y x"
  }

  test("ewma_scan is callable from SQL (decimal-literal alpha)") {
    val r = spark.sql(
      "SELECT ewma_scan(array(1.0D, 2.0D, 3.0D), 0.5) AS e").head()
    assert(r.getSeq[Double](0) == Seq(1.0, 1.5, 2.25))
  }

  test("long_set_count and term_counts are callable from SQL") {
    val r = spark.sql(
      "SELECT long_set_count(array(1L, 2L, 3L, 2L), array(2L, 9L)) AS c," +
        " term_counts(array('a','b','a'), array('a','z')) AS tc")
      .head()
    assert(r.getLong(0) == 2L) // both occurrences of 2 count
    assert(r.getSeq[Long](1) == Seq(2L, 0L))
  }
}
