package graft

import org.apache.spark.sql.functions._
import graft.functions.{DotLongF, DotProductF}
import graft.sources.{Tables, Warehouse}
import graft.text.SignatureStore

/** Round-4 additions: double/int64 fused dot Expressions, clustered
  * ANN recall (q55), the quantized-ANN consumer (q61), and the
  * persisted bucketed signature store.
  */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  test("DotLongF: exact int64 dot, equals the HOF fold") {
    val df = Seq((Array(1L, 2L, 3L), Array(4L, -5L, 6L))).toDF("a", "b")
    val viaExpr = df.select(DotLongF($"a", $"b")).head().getLong(0)
    assert(viaExpr == 1L * 4 + 2L * -5 + 3L * 6)
    val viaHof = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), _ + _))
      .head().getLong(0)
    assert(viaExpr == viaHof)
  }

  test("DotProductF double-array path equals the HOF double fold") {
    val df = Seq((Array(0.1, -2.5, 3.25), Array(1.5, 0.5, -2.0)))
      .toDF("a", "b")
    val viaExpr = df.select(DotProductF($"a", $"b")).head().getDouble(0)
    val viaHof = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), _ + _))
      .head().getDouble(0)
    assert(viaExpr == viaHof)
  }

  test("q55 clustered recall: IVF recovers the planted clusters") {
    val r = graft.queries.SimQueries.q55.fn(spark, "/root/testdata/sf0.001")
      .agg(avg($"recall3")).head().getDouble(0)
    assert(r >= 0.8, s"clustered IVF recall@3 = $r, expected >= 0.8")
  }

  test("q61 quantized ANN: int8 ranking agrees with the float top-3") {
    val df = graft.queries.SimQueries.q61.fn(spark, "/root/testdata/sf0.001")
    assert(df.count() == 8)
    val r = df.agg(avg($"agree3")).head().getDouble(0)
    assert(r >= 0.6, s"quantized agreement@3 = $r, expected >= 0.6")
    assert(df.filter($"top1_dot_deq".isNull || $"top1_sim_q".isNull)
      .count() == 0)
  }

  test("Components.connected: multi-round path graph, separate " +
    "components, min-id labels") {
    import graft.ops.Components
    // a 6-node path (needs several propagation rounds), a triangle,
    // and an isolated pair
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")
    val labels = Components.connected(pairs)
    val byComp = labels.groupBy("comp")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byComp == Map(1L -> 6L, 10L -> 3L, 20L -> 2L))
    // every node labelled with its component's minimum id
    assert(labels.filter($"comp" > $"node").count() == 0)
  }

  test("Components.connected: round cap fails loudly, not half-merged") {
    import graft.ops.Components
    val chain = (1L to 6L).sliding(2)
      .map(w => (w.head, w.last)).toSeq.toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      Components.connected(chain, maxRounds = 1).collect()
    }
    ()
  }

  test("SignatureStore: stored-band candidates equal the in-session " +
    "q30 pairs; only the final distinct exchanges") {
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("graft-sig").toString
    val wh = Warehouse(root)
    SignatureStore.writeBands(wh, Tables(spark, dir, "documents"),
      "sig_bands", 4)
    try {
      // cloned session (own SQLConf; the persistent table lives in the
      // shared catalog): disabling broadcast for this plan-shape check
      // cannot leak into a concurrently running suite
      val clone = spark.newSession()
      clone.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val stored = SignatureStore.candidatesFromStore(clone,
        "sig_bands", 20)
      val inSession = graft.queries.TextQueries.q30.fn(spark, dir)
      assert(rows(stored) == rows(inSession))
      // AQE prints "== Final Plan ==" then "== Initial Plan ==" —
      // count exchanges only once (the executed section)
      val plan = stored.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges == 1,
        s"expected only the final-distinct exchange, got $exchanges:\n$plan")
    } finally { spark.sql("DROP TABLE IF EXISTS sig_bands"); () }
  }
}
