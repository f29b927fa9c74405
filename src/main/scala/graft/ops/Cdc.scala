package graft.ops

import org.apache.spark.sql.DataFrame

/** Batch CDC: incremental fact load (reference: BikesDWSQl.sql:41-72,
  * 75-106 — `LEFT JOIN fact ON key … WHERE fact.key IS NULL` then INSERT).
  * Spark has a first-class anti-join; at 100 TB this is one shuffle on the
  * grain key (or a broadcast of the existing-key set when small, e.g. a
  * recent-partition scan of the fact).
  */
object Cdc {

  /** Rows of `src` whose grain key is absent from `existing`.
    * The reference anti-joins PRE-aggregation on raw rows (DW:60-67) —
    * equivalent here because grain keys are the join keys; preserved.
    * No dedup on the existing side: anti-join semantics are already
    * set-membership, so a distinct would only add an Exchange+Aggregate.
    */
  def newRows(src: DataFrame, existing: DataFrame,
      keys: Seq[String]): DataFrame =
    src.join(existing.select(keys.map(existing(_)): _*), keys, "left_anti")

  /** FULL snapshot diff — the audit operator [[newRows]] is one third
    * of: classify every key across two snapshots as insert / delete /
    * update / unchanged, with a per-attribute changed flag. One
    * full-outer join on the key (ONE shuffle at 100 TB, or AQE's
    * broadcast when a side is small); presence is tracked by explicit
    * flags planted BEFORE the join (an attribute being null is DATA —
    *`<=>` compares it; only a missing ROW means insert/delete).
    * Attribute comparison is null-safe (`<=>`, the P5 discipline from
    * Scd.anyAttrDiffers), so a null→value transition counts as a
    * change, never as a silent equality.
    *
    * Output: the key, `src_<attr>`/`tgt_<attr>` pairs, per-attr
    * `changed_<attr>` flags (false on insert/delete rows — a flag
    * means BOTH sides present and differing), and `change_type`.
    */
  def snapshotDiff(curr: DataFrame, prev: DataFrame, key: String,
      attrs: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    def side(df: DataFrame, tag: String) =
      attrs.foldLeft(df.select((key +: attrs).map(col): _*)) {
        (d, a) => d.withColumnRenamed(a, s"${tag}_$a")
      }.withColumn(s"${tag}_present", lit(true))
    val c = side(curr, "src")
    val p = side(prev, "tgt")
    val joined = c.join(p, Seq(key), "full_outer")
    val cp = coalesce(col("src_present"), lit(false))
    val pp = coalesce(col("tgt_present"), lit(false))
    val anyChanged = attrs
      .map(a => !(col(s"src_$a") <=> col(s"tgt_$a")))
      .reduce(_ || _)
    val flagged = attrs.foldLeft(joined) { (d, a) =>
      d.withColumn(s"changed_$a",
        cp && pp && !(col(s"src_$a") <=> col(s"tgt_$a")))
    }
    flagged.withColumn("change_type",
      when(cp && !pp, "insert")
        .when(!cp && pp, "delete")
        .when(anyChanged, "update")
        .otherwise("unchanged"))
      .drop("src_present", "tgt_present")
  }
}
