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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects by default. Read it as a long (nanos since epoch) via the
    * legacy conf, then surface a proper TimestampType column truncated
    * to microseconds (`ts div 1000` — integer division; a double path
    * would lose precision above 2^53 ns).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
