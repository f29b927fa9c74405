package graft

import org.apache.spark.sql.functions._

/** Round-20 optimization-round pins.
  *
  *  - The q02/q08 pre-aggregate-below-the-join rewrites (r19) replace
  *    countDistinct over join output with plain counts; that is only
  *    equivalent while the dimension keys are UNIQUE. The r19 advisor
  *    asked for the assumption to be pinned as a test, not just a
  *    comment — a data generator that ever emits a duplicate key
  *    fails HERE with a named invariant instead of as an opaque
  *    oracle hash mismatch.
  *  - Par.packToAdvisory (r20) must preserve rows exactly, only ever
  *    MERGE partitions, and be a no-op for a frame already at or
  *    above the advisory size.
  *  - TextQueries.lshComponents (r20) is the shared component table
  *    four queries now read; it must equal running the Components
  *    operator on q30's pairs directly.
  */
class Round20Spec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("dimension PKs the q02/q08 pre-agg rewrites assume are unique") {
    for ((t, k) <- Seq("orders" -> "o_orderkey", "customer" -> "c_custkey",
        "nation" -> "n_nationkey", "region" -> "r_regionkey")) {
      val dup = graft.sources.Tables(spark, sf, t)
        .groupBy(col(k)).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).count()
      assert(dup == 0L, s"$t.$k is not unique — the q02/q08 " +
        "pre-aggregation rewrites are no longer sound")
    }
  }

  test("packToAdvisory merges a tiny cached frame without changing rows") {
    val df = spark.range(0, 1000, 1, 8).selectExpr("id", "id * 2 AS v")
      .persist()
    try {
      df.count() // materialize so stats are the measured cache size
      val packed = graft.ops.Par.packToAdvisory(df)
      assert(packed.rdd.getNumPartitions == 1,
        "a KB-sized cached frame must pack to one advisory partition")
      assert(packed.collect().toSet == df.collect().toSet)
    } finally { df.unpersist(); () }
  }

  test("packToAdvisory never splits: partition count only shrinks") {
    val df = spark.range(0, 100, 1, 4).toDF("id").persist()
    try {
      df.count()
      val p = graft.ops.Par.packToAdvisory(df).rdd.getNumPartitions
      assert(p <= 4 && p >= 1)
    } finally { df.unpersist(); () }
  }

  test("lshComponents equals Components.connected over q30's pairs") {
    val viaArtifact = rows(graft.queries.TextQueries.lshComponents(spark, sf))
    val direct = rows(graft.ops.Components.connected(
      graft.queries.TextQueries.q30.fn(spark, sf)
        .select("doc_a", "doc_b").distinct()))
    assert(viaArtifact == direct)
  }
}
