package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark formulation plus (when SQL-
  * expressible) an independently-derived DuckDB oracle over the same
  * parquet tables. Column names/order must agree between both.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
