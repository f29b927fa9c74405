package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source (SURVEY S1): header CSVs read with an EXPLICIT schema —
  * never inference in production paths (§1.2). Spark's reader handles
  * the UTF-8 BOM on Address.csv/Store.csv natively (§1.4.5). Date
  * columns arrive as strings and are parsed downstream with
  * Cleanse.parseDate (dd-MM-yyyy, §1.4.4) — strict under Spark 4's
  * default ANSI mode, matching the reference's strptime: a malformed
  * date fails the job at the parse site rather than the reader.
  */
object Csv {
  def read(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .schema(schema)
      .csv(path)

  /** PERMISSIVE scan with malformed-row quarantine — [[Jsonl.read]]'s
    * contract for the OTHER line format third-party data arrives in:
    * rows that fail to parse (a type mismatch, a torn quote) land
    * verbatim in [[Jsonl.corruptCol]] instead of failing the job or
    * silently nulling. Takes multiple paths because a real intake is
    * a directory set (dumps + stragglers). The same file-source
    * restriction applies: a query may never reference ONLY the
    * corrupt column (see Jsonl.read — same consumer discipline).
    */
  def readQuarantine(spark: SparkSession, paths: Seq[String],
      schema: StructType): DataFrame =
    spark.read
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Jsonl.corruptCol)
      .schema(schema.add(Jsonl.corruptCol,
        org.apache.spark.sql.types.StringType))
      .csv(paths: _*)
}
