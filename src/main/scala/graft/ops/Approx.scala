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

  /** Map-side quantile bucketing — the 100 TB replacement for a
    * partitioned `ntile` window (q70_spend_quartiles): per-group
    * ntile sorts each group's ENTIRE population on a single task
    * (q70's 5 market segments → 5 reducers own all the data), while
    * here the only per-group state is one boundary array. Two corpus
    * passes, no sort anywhere:
    *
    *  1. boundary pass: `percentile_approx` (t-digest-style sketch —
    *     single-pass, fixed memory, mergeable across partitions) per
    *     group → the nBuckets-1 interior boundaries;
    *  2. assignment pass: broadcast the boundary table (ONE row per
    *     group) back and bucket each row by counting boundaries
    *     strictly below its value — pure map work, no shuffle of the
    *     data rows at all beyond what the caller already needs.
    *
    * Buckets are ascending and 1-based: bucket b covers
    * (bound(b-1), bound(b)], so value <= bound(1) → 1 and
    * value > bound(nBuckets-1) → nBuckets. `exact = true` swaps the
    * sketch for Spark's exact interpolated `percentile` — same plan
    * shape, per-group memory grows with distinct values; the oracle
    * gate (q80_quantile_buckets) runs this mode because DuckDB's
    * `quantile_cont` computes the identical interpolation, while the
    * 100 TB default stays `exact = false`.
    *
    * vs ntile: equal-count is approximate where ntile's is exact —
    * ties sit in one bucket here (a value never straddles a
    * boundary), and sketch error can shift rows between adjacent
    * buckets. That is the accepted trade for eliminating the
    * per-group total sort.
    *
    * Null semantics: a NULL `valueCol` yields a NULL bucket (ntile
    * would rank nulls first/last per engine config — an ordering
    * nobody should depend on). `partCols` values must be NON-NULL:
    * the boundary re-join is a plain equi-join, so a null-keyed row
    * would silently drop; callers bucketing a nullable group should
    * coalesce the key first (a null group is a real group — give it
    * a name).
    */
  def quantileBuckets(df: DataFrame, partCols: Seq[String],
      valueCol: String, nBuckets: Int, accuracy: Int = 10000,
      exact: Boolean = false): DataFrame = {
    require(nBuckets >= 2, s"quantileBuckets: nBuckets=$nBuckets < 2")
    val probs = array((1 until nBuckets)
      .map(i => lit(i.toDouble / nBuckets)): _*)
    val v = col(valueCol).cast("double")
    val bound =
      if (exact) percentile(v, probs)
      else percentile_approx(v, probs, lit(accuracy))
    val b = df.groupBy(partCols.map(col): _*).agg(bound.as("__bounds"))
    df.join(broadcast(b), partCols)
      .withColumn("bucket",
        when(v.isNull, lit(null))
          .otherwise(aggregate(col("__bounds"), lit(0),
            (acc, bd) => acc + when(v > bd, 1).otherwise(0)) + 1)
          .cast("long"))
      .drop("__bounds")
  }

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

  /** EXPLICIT HyperLogLog registers (Flajolet et al. 2007) — the
    * md5-deterministic form of [[approxDistinct]]'s sketch, built as
    * a first-class TABLE so it can be STORED and MERGED: 256
    * registers per group, indexed by the hash's first 8 bits,
    * register value = leading-zero rank of the next 60 bits (capped
    * at `maxRho` = 40 — a rank beyond 40 needs a 2^-40 hash event),
    * register = MAX over the group's values. Output: groupCols ++
    * (idx, mx), ≤ 256 rows per group regardless of cardinality.
    *
    * The two properties that matter at 100 TB, both spec-pinned:
    * partial-aggregated MAX means every executor ships 256 rows per
    * group, never raw values; and MAX-merging two sketches built
    * from any split of the data equals the sketch of the union — so
    * yesterday's stored sketch absorbs today's delta at delta cost.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String],
      value: Column): DataFrame = {
    // two-step projection so the md5 is computed ONCE per row (and
    // CollapseProject keeps it that way: 3 references, non-cheap);
    // rho comes from integer ops — `61 − length(bin(w))` is exactly
    // leading-zeros(60-bit w)+1, all codegen'd (the first cut's
    // higher-order-function digit scan ran interpreted and cost 6×)
    val withH = df.select(
      groupCols.map(col) :+ md5(value.cast("string")).as("__h"): _*)
    val w = conv(col("__h").substr(lit(3), lit(15)), 16, 10)
      .cast("long")
    withH.select(groupCols.map(col) ++ Seq(
        conv(col("__h").substr(lit(1), lit(2)), 16, 10).cast("int")
          .as("idx"),
        least(when(w === 0, lit(61))
          .otherwise(lit(61) - length(bin(w))), lit(40)).as("rho")): _*)
      .groupBy((groupCols :+ "idx").map(col): _*)
      .agg(max("rho").as("mx"))
  }

  /** The HLL estimate from a register table ([[hllRegisters]] output,
    * or a MAX-merge of several): harmonic mean over 256 registers
    * with absent registers counting as rank 0, small-range linear
    * counting below 2.5·m when zero registers remain. The harmonic
    * sum is EXACT integer arithmetic (Σ 2^(40−mx) in BIGINT — float
    * summation order can never diverge between engines); only the
    * final α·m²/S division and the ln correction are floats. Output:
    * groupCols ++ (vzero, e).
    */
  def hllEstimate(reg: DataFrame, groupCols: Seq[String]): DataFrame = {
    val st = reg.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("used"),
        sum(expr("shiftleft(1L, cast(40 - mx as int))")).as("s1"))
    val fin = st
      .withColumn("stot",
        col("s1") + (lit(256L) - col("used")) * lit(1L << 40))
      .withColumn("vzero", lit(256L) - col("used"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))
    val eraw = alpha * lit(65536.0) * lit(1099511627776.0) / col("stot")
    fin.select(groupCols.map(col) ++ Seq(col("vzero"),
      when(eraw <= lit(640.0) && col("vzero") > 0,
        lit(256.0) * log(lit(256.0) / col("vzero")))
        .otherwise(eraw).as("e")): _*)
  }
}
