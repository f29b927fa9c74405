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
}
