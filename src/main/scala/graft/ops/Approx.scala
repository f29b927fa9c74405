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
    *     family) — single pass, bounded counters per partition,
    *     GUARANTEED to return a superset of every item with frequency
    *     > support·n (false positives possible, false negatives not).
    *     The sketch is asked for at `1/ceil(1/support)` ≤ support:
    *     freqItems sizes itself as floor(1/s) counters, so a
    *     non-integral 1/support (e.g. 0.03 → 33 counters → only
    *     freq > n/33 guaranteed) would otherwise open a false-negative
    *     window between support·n and n/floor(1/support);
    *  2. exact pass: group every row into its candidate (or the null
    *     bucket for the tail) — the aggregate key space is bounded by
    *     the candidate count + 1 regardless of input cardinality, and
    *     it yields BOTH the exact candidate counts and (summed over
    *     those few groups by an unpartitioned window — harmless at that
    *     size) the total n for the support threshold, so no separate
    *     count pass.
    *
    * Output is EXACTLY `GROUP BY x HAVING count(*) > support·n` for
    * NON-NULL values — a null group that clears the threshold is
    * deliberately excluded (null is the tail bucket; callers that care
    * about null frequency should count it directly). Where the naive
    * form shuffles every distinct value (unbounded key space at
    * 100 TB), both passes here are map-side-bounded.
    *
    * Candidate routing: below `maxInList` candidates they are inlined
    * as an `In` list (driver collect bounded at ceil(1/support) items);
    * above it (tiny supports) the inline list would bloat the plan, so
    * the candidate frame — still ≤ ceil(1/support) rows — is broadcast
    * and left-joined instead, never collected.
    */
  def heavyHitters(df: DataFrame, colName: String,
      support: Double, maxInList: Int = 1024): DataFrame = {
    val margin = 1.0 / math.ceil(1.0 / support)
    val keyed =
      if (math.ceil(1.0 / margin) <= maxInList) {
        val cand = df.stat.freqItems(Seq(colName), margin)
          .head().getSeq[Any](0)
        df.select(
          when(col(colName).isInCollection(cand), col(colName))
            .as(colName))
      } else {
        val candDf = df.stat.freqItems(Seq(colName), margin)
          .select(explode(col(s"${colName}_freqItems")).as(colName))
          .filter(col(colName).isNotNull)
          .withColumn("__cand", lit(1))
        df.join(broadcast(candDf), Seq(colName), "left")
          .select(
            when(col("__cand").isNotNull, col(colName)).as(colName))
      }
    val counted = keyed.groupBy(colName)
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
