package graft

import org.apache.spark.sql.functions._
import graft.sources.Warehouse

/** [[Warehouse.casClusterBy]] — the sort-clustered rewrite that
  * restores extent quality after unordered appends: range-disjoint
  * wave extents, point-consult skipping before/after, tombstone
  * folding, NULL-key conservatism, extent-local DML afterwards, the
  * OCC race, and the fully-tombstoned edge.
  */
class CasClusterSpec extends SparkSpec {

  private def tmpWh(): Warehouse = Warehouse(
    java.nio.file.Files.createTempDirectory("r17-clus-").toString)

  private def commitLines(wh: Warehouse, table: String,
      n: Int): Seq[String] = {
    val f = new java.io.File(
      new java.io.File(wh.root, table + "__log"), f"$n%09d.commit")
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(f.toPath)).asScala.toSeq
      .filterNot(_.startsWith("TS "))
  }

  // four interleaved appends: EVERY wave spans the whole [0, 400)
  // key domain, so extents exist but skip nothing
  private def interleaved(wh: Warehouse, t: String): Unit = {
    import spark.implicits._
    (0 until 4).foreach { w =>
      wh.casAppendStats(spark,
        (0L until 400L by 4L).map(_ + w).toDF("k")
          .withColumn("v", col("k") * 10L), t, "k")
    }
  }

  test("clustering turns full-domain-overlap waves into " +
    "range-disjoint sorted waves: a point consult that kept ALL " +
    "waves keeps exactly ONE afterwards, content identical") {
    val wh = tmpWh()
    interleaved(wh, "cl")
    val before = rows(wh.casRead(spark, "cl"))
    val (kept0, total0) = wh.casPrunedCommits("cl", 200L, 200L)
    assert(total0 == 4 && kept0.size == 4,
      s"pre-cluster every wave overlaps the point: $kept0")
    val st = wh.casClusterBy(spark, "cl", "k", 4)
    assert(st.waves == 4 && st.inputCommits == 4 &&
      st.rows == 400L, st.toString)
    val (kept1, total1) = wh.casPrunedCommits("cl", 200L, 200L)
    assert(total1 == 4 && kept1.size == 1,
      s"post-cluster a point lives in ONE wave: $kept1")
    assert(rows(wh.casRead(spark, "cl")) == before,
      "clustering is a layout change, never a content change")
    assert(wh.casRead(spark, "cl").count() == 400L)
  }

  test("clustered wave extents are pairwise DISJOINT (a key lives " +
    "in exactly one wave) and the commit is one REPLACES stop line " +
    "plus ADDS lines") {
    val wh = tmpWh()
    interleaved(wh, "cd")
    val st = wh.casClusterBy(spark, "cd", "k", 4)
    val ls = commitLines(wh, "cd", st.version)
    assert(ls.count(_.startsWith("REPLACES ")) == 1 &&
      ls.count(_.startsWith("ADDS ")) == ls.size - 1, ls.toString)
    val exts = ls.map(_.split(" ", 4)).map(p =>
      (p(1).toLong, p(2).toLong)).sortBy(_._1)
    exts.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping wave extents: $exts")
      case _ =>
    }
    assert(exts.head._1 == 0L && exts.last._2 == 399L, exts.toString)
  }

  test("clustering FOLDS MoR tombstones (it is also a compaction): " +
    "the DEL line does not ride, the key is physically gone, and " +
    "time travel below still shows it") {
    import spark.implicits._
    val wh = tmpWh()
    interleaved(wh, "cm")
    val vDel = wh.casDeleteMoR(spark, "cm", "k", Seq(201L).toDF("k"))
    val st = wh.casClusterBy(spark, "cm", "k", 4)
    assert(!commitLines(wh, "cm", st.version)
      .exists(_.startsWith("DEL ")), "tombstone folded, not riding")
    assert(wh.casRead(spark, "cm").filter(col("k") === 201L)
      .count() == 0L)
    assert(st.rows == 399L, st.toString)
    assert(wh.casReadAt(spark, "cm", vDel - 1)
      .filter(col("k") === 201L).count() == 1L,
      "the delete stays a versioned fact below its commit")
  }

  test("NULL keys sort into the first wave and give it a '-' " +
    "extent — conservative, never lying — and survive the rewrite") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppendStats(spark,
      Seq((Option(5L), 1L), (Option.empty[Long], 2L),
        (Option(300L), 3L)).toDF("k", "v"), "cn", "k")
    val st = wh.casClusterBy(spark, "cn", "k", 2)
    val ls = commitLines(wh, "cn", st.version)
    assert(ls.exists(l => l.startsWith("REPLACES - - ") ||
      l.startsWith("ADDS - - ")), s"the NULL wave is unbounded: $ls")
    val got = rows(wh.casRead(spark, "cn"))
    assert(got.size == 3 && got.exists(_.head == null), got.toString)
    // the '-' wave is kept by every consult
    val (kept, _) = wh.casPrunedCommits("cn", 300L, 300L)
    assert(kept.size == 2, s"'-' wave rides along conservatively: $kept")
  }

  test("post-cluster DML is extent-local: a single-key delete " +
    "rewrites ONE of the four waves") {
    val wh = tmpWh()
    interleaved(wh, "ce")
    wh.casClusterBy(spark, "ce", "k", 4)
    val d = wh.casDeleteWhere(spark, "ce", "k", Seq(250L))
    assert(d.rewrittenCommits == 1 && d.retainedCommits == 3 &&
      d.deletedRows == 1L, d.toString)
  }

  test("a CAS race injected before publish makes the cluster RETRY " +
    "and the racer's rows land in the re-clustered layout") {
    import spark.implicits._
    val wh = tmpWh()
    interleaved(wh, "cr")
    var raced = false
    val st = wh.casClusterBy(spark, "cr", "k", 4,
      beforeCommit = () => {
        if (!raced) {
          raced = true
          wh.casAppendStats(spark,
            Seq((1000L, 1L)).toDF("k", "v"), "cr", "k")
          ()
        }
      })
    assert(raced && st.rows == 401L, st.toString)
    assert(wh.casRead(spark, "cr").filter(col("k") === 1000L)
      .count() == 1L, "the racer's wave was re-read on retry")
  }

  test("a fully-tombstoned snapshot clusters to ONE empty '-' wave " +
    "that stays readable with its schema") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppendStats(spark, Seq((1L, 10L)).toDF("k", "v"), "cz", "k")
    wh.casDeleteMoR(spark, "cz", "k", Seq(1L).toDF("k"))
    val st = wh.casClusterBy(spark, "cz", "k", 3)
    assert(st.waves == 1 && st.rows == 0L, st.toString)
    val got = wh.casRead(spark, "cz")
    assert(got.count() == 0L && got.columns.toSeq == Seq("k", "v"))
  }
}
