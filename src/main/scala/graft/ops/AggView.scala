package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Algebraic (mergeable) aggregate views — the materialized-view
  * maintenance kernel every lakehouse summary table needs: a summary
  * at (keys) grain carrying only MERGEABLE statistics (count, sum,
  * sum-of-squares, min, max), so a delta's summary folds into the
  * stored view with one group-grain aggregate — O(delta + |view|)
  * work, never a history re-scan. Mean/variance derive from
  * (n, sum, ssq) at read time; statistics that are NOT algebraic
  * (exact distinct counts, exact quantiles) are deliberately
  * excluded — they need sketches (HLL: `ops/Profile`'s mode) or a
  * re-scan, and silently pretending otherwise is how summary tables
  * go wrong.
  *
  * All statistics are BIGINT on a BIGINT value column — merge order
  * cannot change a bit, so incremental ≡ from-scratch exactly (the
  * q186 prefix-continuation argument, aggregate edition).
  */
object AggView {

  /** Summarize a frame to the algebraic view at `keys` grain. */
  def summarize(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      sum(col(valueCol)).cast("long").as("sum_v"),
      sum(col(valueCol) * col(valueCol)).cast("long").as("ssq_v"),
      min(col(valueCol)).cast("long").as("min_v"),
      max(col(valueCol)).cast("long").as("max_v"))

  /** Fold two views of the same grain into one: counts/sums add,
    * min/max combine, groups union (a delta-only group passes
    * through untouched; a history-only group is never rewritten —
    * the view is upserted at group grain, not row grain).
    */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b).groupBy(keys.map(col): _*).agg(
      sum("n_rows").cast("long").as("n_rows"),
      sum("sum_v").cast("long").as("sum_v"),
      sum("ssq_v").cast("long").as("ssq_v"),
      min("min_v").cast("long").as("min_v"),
      max("max_v").cast("long").as("max_v"))
}
