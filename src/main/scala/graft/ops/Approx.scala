package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    *  2. exact pass: count only the ≤1/support candidates (broadcast
    *     isin filter → narrow aggregation over a tiny key space) and
    *     keep those with count > support·n.
    *
    * Output is EXACTLY `GROUP BY x HAVING count(*) > support·n` — but
    * where the naive form shuffles every distinct value (unbounded key
    * space at 100 TB), both passes here are map-side-bounded: the
    * sketch is fixed-memory and the exact aggregation touches at most
    * 1/support keys. The candidate list on the driver is ≤1/support
    * items by construction — a bounded collect, not a data-sized one.
    */
  def heavyHitters(df: DataFrame, colName: String,
      support: Double): DataFrame = {
    val total = df.count()
    val cand = df.stat.freqItems(Seq(colName), support)
      .head().getSeq[Any](0)
    df.filter(col(colName).isInCollection(cand))
      .groupBy(colName).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(total * support))
  }
}
