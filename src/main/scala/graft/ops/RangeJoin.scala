package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range (interval) join: pairs of rows within `maxGapSec`
  * seconds of each other on the same key. Spark plans a raw
  * `|l.ts - r.ts| <= gap` predicate as BroadcastNestedLoop/cartesian —
  * quadratic. The banded formulation buckets time into gap-width bands
  * and replicates the right side into its three candidate bands, so the
  * join is a plain equi-join on (key, band) followed by the exact
  * window filter: shuffle volume O(|L| + 3|R|), never O(|L|×|R|).
  * Each qualifying pair matches in exactly one band (the left row's),
  * so no dedup is needed.
  */
object RangeJoin {

  def withinGap(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, maxGapSec: Long): DataFrame = {
    require(leftTs != rightTs,
      "rename the timestamp columns to distinct names before joining")
    val lBand = floor(col(leftTs).cast("long") / maxGapSec)
    val rBand = floor(col(rightTs).cast("long") / maxGapSec)
    val l = left.withColumn("__band", lBand)
    val r = right.withColumn("__band",
      explode(array(rBand - 1, rBand, rBand + 1)))
    val exact = col(leftTs) >= col(rightTs) - expr(
      s"INTERVAL $maxGapSec SECONDS") &&
      col(leftTs) <= col(rightTs) + expr(s"INTERVAL $maxGapSec SECONDS")
    l.join(r, keys :+ "__band", "inner")
      .filter(exact)
      .drop("__band")
  }
}
