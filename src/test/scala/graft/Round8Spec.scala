package graft

import org.apache.spark.sql.functions._

/** Round-8 additions: the SemDeDup-style semantic-dedup pipeline
  * (q128) — decision-table invariants, cross-partitioning
  * determinism, and the broadcast plan shape that makes the
  * composition scale.
  */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q128: every component is a genuine duplicate group and the " +
    "keeper is one of its members") {
    val d = queries.SimQueries.q128.fn(spark, sf).collect()
    assert(d.nonEmpty, "planted cosine structure must yield components")
    val comps = d.map(_.getLong(0))
    assert(comps.distinct.length == comps.length, "component id repeated")
    d.foreach { r =>
      val (comp, n, keepId) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(n >= 2, s"component $comp has $n member(s); pairs imply >= 2")
      // comp is the component's MINIMUM member id and the keeper is a
      // member, so comp <= keep_id always
      assert(comp <= keepId, s"keeper $keepId below component min $comp")
    }
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(d.map(_.getLong(2)).sum <= corpus,
      "components are disjoint doc sets; members cannot exceed corpus")
  }

  test("q128: decision table is invariant under shuffle-partition " +
    "count (rounded-cosine + lowest-id ties leave no partition-order " +
    "dependence)") {
    def run(): Set[Seq[Any]] = rows(queries.SimQueries.q128.fn(spark, sf))
    val base = run()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(run() == base, "result changed with 7 shuffle partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      assert(run() == base, "result changed with 13 shuffle partitions")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("q128: centroid assignment broadcasts the K-row table and the " +
    "bucket cap broadcasts the sized keys — the corpus never shuffles " +
    "for either") {
    val plan = queries.SimQueries.q128.fn(spark, sf)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"centroid table must broadcast for assignment:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"sized (cid, bkt) cap table must broadcast:\n$plan")
  }
}
