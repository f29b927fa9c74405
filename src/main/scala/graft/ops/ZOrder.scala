package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the two-dimensional data-layout
  * technique behind Delta/Iceberg `ZORDER BY`: interleave the bits of
  * two sort keys so that range-partitioning on ONE derived value gives
  * every output file a narrow min/max span on BOTH keys, and parquet
  * row-group / file pruning then works for predicates on either.
  *
  * The part naive descriptions skip — and the first-cut spec here
  * caught empirically — is DOMAIN NORMALIZATION: interleaving raw
  * values lets the wider key's high bits own every top z-bit (an
  * 8-bit customer key against a 14-bit day key degenerates into a
  * plain date sort; the measured x-span was the full domain). So
  * [[cluster]] min-max scales both keys onto the same `bits`-wide
  * integer range first — the same per-column normalization
  * production ZORDER implementations apply — with exact integer
  * arithmetic (one cheap min/max aggregate broadcast back, the q72
  * boundary device). Everything stays inside whole-stage codegen; the
  * shuffle is the ONE range exchange any clustered write pays.
  */
object ZOrder {

  /** Morton value interleaving the low `bits` bits of two non-negative
    * integer keys: bit k of `a` lands at position 2k, bit k of `b` at
    * 2k+1. Inputs are assumed already scaled to [0, 2^bits) — use
    * [[scaled]] (or [[cluster]], which does it for you) first.
    */
  def zValue(a: Column, b: Column, bits: Int = 10): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, k) =>
      acc
        .bitwiseOR(shiftleft(
          shiftright(a.cast("long"), k).bitwiseAND(lit(1L)), 2 * k))
        .bitwiseOR(shiftleft(
          shiftright(b.cast("long"), k).bitwiseAND(lit(1L)), 2 * k + 1))
    }

  /** Min-max scale an integer key onto [0, 2^bits): exact integer
    * multiply-then-divide, no float anywhere. A constant column
    * (cmax = cmin) maps to 0.
    */
  def scaled(c: Column, cmin: Column, cmax: Column, bits: Int = 10): Column = {
    val span = greatest(cmax.cast("long") - cmin.cast("long"), lit(1L))
    val n = (c.cast("long") - cmin.cast("long")) * lit((1L << bits) - 1)
    // exact integer floor division: subtract the remainder first so the
    // double division is of an exact multiple (no float rounding ever)
    ((n - pmod(n, span)) / span).cast("long")
  }

  /** The matching SQL expression (DuckDB/ANSI bit operators) so an
    * oracle can re-derive the curve independently of the Column tree.
    */
  def zSql(a: String, b: String, bits: Int = 10): String =
    (0 until bits).map { k =>
      s"((($a >> $k) & 1) << ${2 * k}) | ((($b >> $k) & 1) << ${2 * k + 1})"
    }.mkString(" | ")

  /** Cluster `df` for a z-ordered write: normalize both keys onto the
    * same `bits`-wide range (one min/max aggregate, broadcast back),
    * interleave, then one range exchange on the Morton value with rows
    * sorted by it within each partition — each output file spans a
    * compact rectangle of (a, b) space. The `z` column is kept so
    * callers can inspect or partition-prune on it.
    */
  def cluster(df: DataFrame, a: Column, b: Column, bits: Int = 10,
      partitions: Int = 8): DataFrame = {
    val mm = df.agg(min(a).cast("long").as("_amin"),
      max(a).cast("long").as("_amax"),
      min(b).cast("long").as("_bmin"),
      max(b).cast("long").as("_bmax"))
    df.crossJoin(broadcast(mm))
      .withColumn("z", zValue(
        scaled(a, col("_amin"), col("_amax"), bits),
        scaled(b, col("_bmin"), col("_bmax"), bits), bits))
      .drop("_amin", "_amax", "_bmin", "_bmax")
      .repartitionByRange(partitions, col("z"))
      .sortWithinPartitions("z")
  }
}
