package graft.ops

import org.apache.spark.sql.Column
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

  /** Frequent items / heavy hitters on a column: approximate top-k via
    * count-min-style `freqItems` is DataFrame-level; expression-level
    * fallback is grouped count + top-k window, kept in queries.
    */
}
