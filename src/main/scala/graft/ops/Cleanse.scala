package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cleansing primitives (reference: ETLScript_withSCDimplementation.py:25-45).
  * All pure Column expressions — codegen'd, no UDFs.
  */
object Cleanse {

  /** Strip non-word characters from a name column.
    * Reference: `re.sub(r'\W+','')` (ETLScript_withSCDimplementation.py:27-28).
    * Note `\W` also removes hyphens (SURVEY §1.4.1) — faithful.
    */
  def cleanName(c: Column): Column = regexp_replace(c, "\\W+", "")

  /** Parse a `dd-MM-yyyy` string to DateType.
    * Reference: strptime "%d-%m-%Y" (ETLScript_withSCDimplementation.py:32);
    * we use this format uniformly (the reference's *intended* semantics —
    * its stored-column cast is accidentally month-first, SURVEY §1.4.4).
    * STRICT like the reference's strptime: under Spark 4's default ANSI
    * mode a malformed date throws (use [[parseDateOrNull]] for
    * null-on-malformed quarantine flows).
    */
  def parseDate(c: Column): Column = to_date(c, "dd-MM-yyyy")

  /** Lenient variant: malformed dates become null (try_to_date), for
    * pipelines that quarantine bad rows instead of failing the job.
    */
  def parseDateOrNull(c: Column): Column = try_to_date(c, "dd-MM-yyyy")

  /** Project to a keep-list THEN drop exact duplicates. Order is
    * load-bearing: duplicates may differ only in dropped columns
    * (reference customer_id 10, SURVEY §1.4.2;
    * ETLScript_withSCDimplementation.py:25-26).
    */
  def projectThenDedup(df: DataFrame, keep: Seq[String]): DataFrame =
    df.select(keep.map(col): _*).dropDuplicates()
}
