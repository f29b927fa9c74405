package graft

import org.apache.spark.sql.functions._
import graft.ops.Components

/** Round-7 additions: block-manager hygiene for the iterative
  * component algorithms (the round-6 bench regression), and the bench
  * sweep that makes any future leak visible in the JSON line itself.
  */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  private def ccBlocks: Seq[org.apache.spark.rdd.RDD[_]] =
    spark.sparkContext.getPersistentRDDs.values
      .filter(_.name == Components.rddNamePrefix).toSeq

  test("connected: intermediate rounds are unpersisted as they are " +
    "superseded; release() leaves zero component blocks") {
    assert(ccBlocks.isEmpty, "dirty session: stray component blocks")
    val before = spark.sparkContext.getPersistentRDDs.size
    // a 40-chain + clique graph needs several propagation rounds
    val pairs = ((0 until 40).map(i => (i.toLong, i + 1L)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L))).toDF("doc_a", "doc_b")
    val labels = Components.connected(pairs)
    // live residue is the returned frame's own checkpoint plus the
    // still-referenced edge list at most — NOT one block per round
    assert(ccBlocks.size <= 2,
      s"per-round checkpoints leaked: ${ccBlocks.size} blocks live")
    // consume, then free: nothing of the algorithm's stays cached
    assert(labels.filter($"comp" === 0L).count() == 41)
    Components.release(labels)
    assert(ccBlocks.isEmpty, "release() left component blocks cached")
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "connected() changed the session's persistent-RDD census")
  }

  test("connectedStar: bounded live blocks during the run, zero after " +
    "consume + release") {
    assert(ccBlocks.isEmpty, "dirty session: stray component blocks")
    val before = spark.sparkContext.getPersistentRDDs.size
    // 120-node chain: high diameter, many contraction rounds
    val pairs = (0 until 120).map(i => (i.toLong, i + 1L))
      .toDF("doc_a", "doc_b")
    val labels = Components.connectedStar(pairs)
    // nodes + final edges are the only reachable checkpoints
    assert(ccBlocks.size <= 2,
      s"per-round checkpoints leaked: ${ccBlocks.size} blocks live")
    assert(labels.select("comp").distinct().as[Long].collect()
      .toSeq == Seq(0L))
    Components.release(labels)
    assert(ccBlocks.isEmpty, "release() left component blocks cached")
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "connectedStar() changed the session's persistent-RDD census")
  }

  test("Bench.sweepTransients clears component residue a query left " +
    "behind and reports the count") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val labels = Components.connected(pairs)
    assert(labels.count() == 3) // consume like a bench sink would
    val live = ccBlocks.size
    assert(live > 0, "expected live checkpoint blocks")
    val cleared = Bench.sweepTransients(spark)
    assert(cleared == live)
    assert(ccBlocks.isEmpty, "sweep left tagged blocks cached")
  }

  test("Bench.run hygiene: a component query reports cleared blocks " +
    "and the next query starts clean") {
    val leaky = Q.noOracle("leaky") { (s, _) =>
      import s.implicits._
      Components.connected(
        Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b"))
    }
    val clean = Q.noOracle("clean")((s, _) => {
      import s.implicits._; Seq(1).toDF("x") })
    val res = Bench.run(spark, "/unused", Seq(leaky, clean))
    val byName = res.map(r => r._1 -> r._4).toMap
    assert(byName("leaky").cleared > 0,
      "the component query's checkpoint residue must be swept and counted")
    assert(byName("clean").cleared == 0 && byName("clean").retained == 0)
    assert(ccBlocks.isEmpty)
  }
}
