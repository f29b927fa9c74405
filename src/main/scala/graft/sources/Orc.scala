package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink — the second columnar format of the warehouse tier
  * (Spark ships the native vectorized ORC reader; no extra deps).
  * Completes the source matrix alongside parquet (Warehouse), CSV,
  * JDBC, and JSONL: a user migrating a Hive-era ORC warehouse reads it
  * here with the same scan properties the parquet tier gets —
  * vectorized batches, column pruning from the file footer, and
  * predicate pushdown to stripe/row-group level via min/max stats
  * (the q191 spec pins both in the plan: `PushedFilters` carries the
  * predicate, `ReadSchema` carries ONLY the projected columns).
  *
  * Unlike JSONL ([[Jsonl]]), ORC is self-describing — schema comes
  * from the file footer, so [[read]] takes no schema and there is no
  * inference pass and no corrupt-row class (a torn ORC file fails the
  * footer read loudly instead of yielding quarantine rows; ingest
  * gates belong on the line-oriented formats).
  *
  * At 100 TB: stripes are the split unit (like parquet row groups),
  * so the scan distributes identically; min/max pushdown prunes
  * stripes the same way parquet prunes row groups. Zero reason to
  * favor one format at read time — which is the point: the engine's
  * operators are format-agnostic above this seam.
  */
object Orc {

  /** Write as ORC (snappy by default), one file per task — the same
    * map-only write discipline as the parquet tier.
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Footer-schema scan — vectorized, pruned, pushdown-capable. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
