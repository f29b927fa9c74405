package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source access for the driver testdata (TESTDATA.md): one parquet file
  * per table under `sfDir`. At cluster scale these would be partitioned
  * directories; the API is the same `spark.read.parquet` either way, and
  * Catalyst pushes filters/projections into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` has shipped as two different parquet encodings across
    * testdata generations: TIMESTAMP(NANOS) (which Spark's reader
    * rejects by default — read as a long via the legacy conf, then
    * truncate to microseconds with integer `div 1000`; a double path
    * would lose precision above 2^53 ns) and plain TIMESTAMP(MICROS)
    * (surfaced as TIMESTAMP_NTZ). Normalize both to session-TZ
    * TimestampType at microsecond grain so every downstream query sees
    * one type; the session TZ is pinned to UTC, so the NTZ cast is a
    * pure re-tag of the same micros value.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }
    raw.withColumn("ts", ts)
  }
}
