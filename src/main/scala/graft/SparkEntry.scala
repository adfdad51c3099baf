package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-checked operator inventory: the core relational
  * surface (SURVEY.md §2, [[QueriesCore]]) plus the LLM-data-pipeline
  * extension tier ([[QueriesExt]]). Every query with exact cross-engine
  * semantics has a DuckDB oracle in `oracleSql`; hash/LSH-based operators are
  * rows-only here and covered by ScalaTest suites instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueriesCore.topkRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.queries ++ QueriesExt.queries ++ QueriesSketch.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (LSH/hash-based operators) get the
    * driver's weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    QueriesCore.oracles ++ QueriesExt.oracles ++ QueriesSketch.oracleSql
}
