package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the LATEST
  * right row with `right.ts <= left.ts` within the same key — the
  * temporal-attribution primitive (event→most-recent-state) that Spark
  * has no native operator for.
  *
  * Per the preference order (compose built-ins before custom plans,
  * SURVEY §2.10): expressed as union + per-key ordered window with
  * `last(_, ignoreNulls)` — ONE shuffle on the key and one sort,
  * which is exactly the distribution a dedicated as-of SparkPlan
  * would choose; no point-in-time self-join explosion. Right rows sort
  * before left rows at equal timestamps, so the match is inclusive
  * (`>=`), matching DuckDB's ASOF JOIN used as the oracle.
  */
object AsOf {

  /** @param left      probe side (kept in full)
    * @param right     build side; its `rightCols` are attached
    * @param keys      equi-key columns present on both sides
    * @param leftTs    event-time column name on `left`
    * @param rightTs   event-time column name on `right`
    * @param rightCols right columns to carry (attached as
    *                  `asof_<name>`, null when no prior right row)
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct((rightTs +: rightCols).map(col): _*)
    val rTagged = right.select(
      keys.map(col) ++
        Seq(col(rightTs).cast("timestamp").as("__ts"), lit(0).as("__tag"),
          payload.as("__r")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      keys.map(col) ++
        Seq(col(leftTs).cast("timestamp").as("__ts"), lit(1).as("__tag"),
          lit(null).cast(rTagged.schema("__r").dataType).as("__r")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rTagged.unionByName(lTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))

    val attached = rightCols.map(c =>
      col(s"__match.$c").as(s"asof_$c")) :+
      col(s"__match.$rightTs").as(s"asof_$rightTs")
    filled.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++ attached: _*)
  }
}
