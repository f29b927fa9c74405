package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.from_json
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-Lines source/sink — the interchange format of LLM training-data
  * pipelines (one JSON object per line: HF dataset dumps, WebDataset
  * sidecars, API export logs). Spark's native `json` source IS JSONL
  * (objects are line-delimited unless `multiLine` is set), so the scan
  * distributes by line-splittable file ranges exactly like text/CSV —
  * at 100 TB a directory of JSONL shards reads with one map-only scan,
  * no parse bottleneck, and the schema-explicit read below keeps the
  * double-pass schema-inference scan (the default when no schema is
  * given) from ever running.
  *
  * Ingest-gate discipline: real dumps carry corrupt lines (truncated
  * uploads, interleaved writers), and the correct behavior is
  * QUARANTINE, not job failure — [[read]] parses PERMISSIVE with the
  * corrupt line preserved verbatim in [[corruptCol]], so a curation
  * run can count, sample, and re-drive the rejects. [[parseLine]] is
  * the same contract as a pure expression (`from_json`) for plans that
  * already hold lines as a column — the streaming twin
  * (StreamingEtl.jsonlGateStream) uses it because a file STREAM source
  * needs the text reader + expression parse to keep the corrupt line.
  */
object Jsonl {

  /** Column holding the raw line for rows that failed to parse (null
    * on parsed rows) — Spark's `columnNameOfCorruptRecord` contract.
    */
  val corruptCol = "_corrupt"

  /** Write as JSONL. Spark's json sink emits one object per line —
    * all string escaping (quote, backslash, newline→\n) is the
    * writer's, so a round-trip through [[read]] is byte-exact on
    * content. Scales as a map-only write: one shard per task.
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Schema-explicit PERMISSIVE scan with corrupt-line quarantine.
    * The returned frame has `schema`'s columns plus [[corruptCol]]
    * (null ⇔ the line parsed). Schema-explicit means NO inference
    * pre-pass — exactly one scan of the data, which at 100 TB is the
    * difference between one pass and two. NOTE Spark's documented
    * restriction: a query may not reference ONLY the corrupt column
    * (raw-parse pushdown would elide the parse that fills it); every
    * consumer here also references at least one data column.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** FAILFAST scan — the contract for data you OWN (q106's round trip
    * of the engine's own write): a corrupt line is a job error, not a
    * quarantine row, so silent loss is impossible. Use [[read]] for
    * third-party dumps, this for re-reading your own sink.
    */
  def readStrict(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Expression-level JSONL parse of a line column (`from_json`) with
    * the SAME quarantine contract as [[read]]: the returned struct has
    * `schema`'s fields plus [[corruptCol]] (non-null ⇔ the line failed
    * to parse). Two behaviors pinned by StreamingSpec because both are
    * easy to assume wrong: (a) `from_json` PERMISSIVE yields a
    * null-FILLED struct on a corrupt line, not a null struct, so
    * `isNull` on the struct is NOT the corrupt signal — the corrupt
    * field is; (b) a failed line nulls EVERY data field — there is no
    * partial recovery of fields that appeared before the break.
    * Codegen-adjacent, map-only; the corrupt signal for text-source +
    * streaming plans, where the file-source corrupt-column restriction
    * does not apply.
    */
  def parseLine(line: Column, schema: StructType): Column =
    from_json(line, schema.add(corruptCol, StringType),
      Map("mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> corruptCol))
}
