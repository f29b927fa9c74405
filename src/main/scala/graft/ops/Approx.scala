package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate aggregates — the 100 TB companions to the exact
  * operators the oracle queries use. Exact `count(DISTINCT)` and
  * `percentile` shuffle every distinct value / sort every group; these
  * sketch-based forms are single-pass, fixed-memory, mergeable across
  * partitions — the right default at cluster scale, with the exact
  * forms kept for verification at test scale (q02, q26).
  */
object Approx {

  /** HyperLogLog++ distinct count (Spark built-in sketch). */
  def approxDistinct(c: Column, rsd: Double = 0.02): Column =
    approx_count_distinct(c, rsd)

  /** t-digest style quantile (Spark's approx_percentile). */
  def approxQuantile(c: Column, q: Double, accuracy: Int = 10000): Column =
    percentile_approx(c, lit(q), lit(accuracy))

  /** Exact heavy hitters with sketch-bounded memory — the classic
    * two-pass construction:
    *
    *  1. candidate pass: `df.stat.freqItems` (Karp et al. / Misra-Gries
    *     family) — single pass, ≤1/support counters per partition,
    *     GUARANTEED to return a superset of every item with frequency
    *     > support·n (false positives possible, false negatives not);
    *  2. exact pass: group every row into its candidate (or the null
    *     bucket for the tail) — the aggregate key space is ≤1/support+1
    *     regardless of input cardinality, and it yields BOTH the exact
    *     candidate counts and (summed over the ≤1/support+1 groups by
    *     an unpartitioned window — harmless at that size) the total n
    *     for the support threshold, so no separate count pass.
    *
    * Output is EXACTLY `GROUP BY x HAVING count(*) > support·n` — but
    * where the naive form shuffles every distinct value (unbounded key
    * space at 100 TB), both passes here are map-side-bounded. The
    * candidate list on the driver is ≤1/support items by construction —
    * a bounded collect, not a data-sized one.
    */
  def heavyHitters(df: DataFrame, colName: String,
      support: Double): DataFrame = {
    val cand = df.stat.freqItems(Seq(colName), support)
      .head().getSeq[Any](0)
    val counted = df.groupBy(
        when(col(colName).isInCollection(cand), col(colName))
          .as(colName))
      .agg(count(lit(1)).as("cnt"))
    val all = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    counted
      .withColumn("__n", sum("cnt").over(all))
      .filter(col(colName).isNotNull &&
        col("cnt") > col("__n") * support)
      .select(col(colName), col("cnt"))
  }
}
