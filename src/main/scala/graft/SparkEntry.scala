package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.*; each carries its own DuckDB oracle.
  */
object SparkEntry {

  private def registry: Seq[Q] = Registry.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The minimum end-to-end slice (SURVEY §7.2.1): fact-style inner join
    * + hash aggregate by year.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Parity.q02.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

/** Central query registry (all suites). */
object Registry {
  def all: Seq[Q] =
    graft.queries.Parity.all ++ graft.queries.Events.all ++
      graft.queries.TextQueries.all ++ graft.queries.SimQueries.all ++
      graft.queries.MultimodalQueries.all ++ graft.queries.Extras.all ++
      graft.queries.Extras2.all ++ graft.queries.Extras3.all ++
      graft.queries.Extras4.all ++ graft.queries.Extras5.all ++
      graft.queries.Extras6.all ++ graft.queries.Extras7.all ++
      graft.queries.Extras8.all
}
