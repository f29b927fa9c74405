package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §7.3 "salting for skew"). AQE's skew-join
  * handles sort-merge skew automatically; explicit salting is the tool
  * when a hot key must spread across reducers in a hash join or
  * aggregation regardless of plan shape.
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a per-row salt in
    * [0, nSalts); the small side is replicated once per salt value, so
    * a hot key's rows land on nSalts reducers instead of one.
    * Result is identical to `big.join(small, keys, joinType)`;
    * supported joinTypes: inner / left / left_semi (right-side
    * replication makes other types incorrect; semi is safe because a
    * big-side row can only match the replica carrying its own salt,
    * and semi-join output never duplicates the probe row anyway).
    *
    * left_semi is here for a measured reason (Round9Spec): AQE's
    * skew-join split only pattern-matches joins whose children are
    * bare shuffles, so the gram-membership semi-joins
    * (q114/q115/q132/q138), whose build side is an AGGREGATE feeding
    * the join through its own partitioning, get NO adaptive skew
    * handling — salting is the defense that works for that shape
    * regardless of what feeds the join.
    *
    * The salt hashes the ENTIRE big-side row (not the join key, which
    * is constant on the hot key — the whole problem), so it is a pure
    * function of row content: the intermediate is deterministic across
    * runs, retries, and partition layouts, unlike a
    * monotonically_increasing_id-derived salt. CONTRACT LIMIT: rows
    * that are full duplicates share a salt — a hot key whose rows are
    * IDENTICAL (fully denormalized repeats) regains the original skew,
    * silently. Hot-key rows normally differ in their payload columns
    * (the spread is asserted in AsOfSkewSpec); a duplicate-heavy
    * caller should pre-aggregate the duplicates (count them into one
    * row) rather than salt them.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left" ||
      joinType == "left_semi",
      s"saltedJoin supports inner/left/left_semi, got $joinType")
    val b = big.withColumn("__salt", contentSalt(big, nSalts))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    b.join(s, (keys :+ "__salt").toSeq, joinType).drop("__salt")
  }

  /** The salt [[saltedJoin]] assigns `df`'s rows — exposed so tests
    * and operators can MEASURE balance on their own inputs instead of
    * trusting the hash.
    */
  def contentSalt(df: DataFrame, nSalts: Int): org.apache.spark.sql.Column =
    pmod(hash(df.columns.map(col).toSeq: _*), lit(nSalts))
}
