package graft

import org.apache.spark.sql.functions._
import graft.sources.Warehouse

/** The MERGE matrix for [[Warehouse.casMergeInto]] — the upsert
  * member of the multi-writer DML surface. Mirrors RowDeleteSpec's
  * delete matrix: classification evidence (rewritten vs retained),
  * commit-verb shape, NULL semantics on both sides of the ON clause,
  * target-row multiplicity, ANSI duplicate-source rejection, the
  * OCC race, and the documented tombstone-wins interplay with MoR
  * deletes.
  */
class CasMergeSpec extends SparkSpec {

  private def tmpWh(): Warehouse = Warehouse(
    java.nio.file.Files.createTempDirectory("r17-merge-").toString)

  private def commitLines(wh: Warehouse, table: String,
      n: Int): Seq[String] = {
    val f = new java.io.File(
      new java.io.File(wh.root, table + "__log"), f"$n%09d.commit")
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(f.toPath)).asScala.toSeq
      .filterNot(_.startsWith("TS "))
  }

  // four disjoint ten-key waves: [0,9] [10,19] [20,29] [30,39]
  private def quadWaves(wh: Warehouse, t: String): Unit = {
    import spark.implicits._
    (0 until 4).foreach { w =>
      wh.casAppendStats(spark,
        (w * 10L until w * 10L + 10L).toDF("k")
          .withColumn("v", col("k") * 100L), t, "k")
    }
  }

  test("pure-insert merge (all source keys beyond every extent) " +
    "lands as ONE delta ADDS commit: nothing rewritten, every wave " +
    "retained, the insert wave's extent tight") {
    import spark.implicits._
    val wh = tmpWh()
    quadWaves(wh, "mi")
    val src = Seq((100L, 1L), (105L, 2L)).toDF("k", "v")
    val st = wh.casMergeInto(spark, "mi", "k", src)
    assert(st.rewrittenCommits == 0 && st.retainedCommits == 4 &&
      st.updatedRows == 0L && st.insertedRows == 2L, st.toString)
    assert(commitLines(wh, "mi", st.version) ==
      commitLines(wh, "mi", st.version).filter(
        _.startsWith("ADDS 100 105 ")),
      commitLines(wh, "mi", st.version).toString)
    assert(rows(wh.casRead(spark, "mi")).size == 42)
  }

  test("pure-update merge rewrites ONLY the extent-hit wave; the " +
    "other three are retained by reference and no insert line is " +
    "published") {
    import spark.implicits._
    val wh = tmpWh()
    quadWaves(wh, "mu")
    val src = Seq((25L, -1L), (27L, -2L)).toDF("k", "v")
    val st = wh.casMergeInto(spark, "mu", "k", src)
    assert(st.rewrittenCommits == 1 && st.retainedCommits == 3 &&
      st.updatedRows == 2L && st.insertedRows == 0L, st.toString)
    val ls = commitLines(wh, "mu", st.version)
    assert(ls.count(_.startsWith("REPLACES ")) == 1 &&
      !ls.exists(_.startsWith("ADDS -")) &&
      ls.count(_.startsWith("ADDS ")) == 3, ls.toString)
    val got = rows(wh.casRead(spark, "mu")).map(r =>
      (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long])).toMap
    assert(got.size == 40 && got(25L) == -1L && got(27L) == -2L &&
      got(26L) == 2600L, got.toString)
  }

  test("mixed merge: matched rows update in the rewrite wave, " +
    "unmatched rows land as a SEPARATE tight-extent insert line in " +
    "the SAME commit") {
    import spark.implicits._
    val wh = tmpWh()
    quadWaves(wh, "mm")
    val src = Seq((15L, -15L), (200L, -200L)).toDF("k", "v")
    val st = wh.casMergeInto(spark, "mm", "k", src)
    assert(st.rewrittenCommits == 1 && st.retainedCommits == 3 &&
      st.updatedRows == 1L && st.insertedRows == 1L, st.toString)
    val ls = commitLines(wh, "mm", st.version)
    assert(ls.count(_.startsWith("REPLACES 10 19 ")) == 1,
      s"rewrite extent recomputed from the staged output: $ls")
    assert(ls.count(_.startsWith("ADDS 200 200 ")) == 1,
      s"insert extent tight, not widening the rewrite's: $ls")
    val got = rows(wh.casRead(spark, "mm")).map(r =>
      (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long])).toMap
    assert(got.size == 41 && got(15L) == -15L && got(200L) == -200L)
    // skipping survives the merge: a later consult on [0, 9] opens
    // only the [0, 9] wave
    val (kept, total) = wh.casPrunedCommits("mm", 0L, 9L)
    assert(total == 5 && kept.size == 1, s"$kept / $total")
  }

  test("duplicate target keys keep their multiplicity — ANSI MERGE " +
    "updates EACH matched row, it does not dedup") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppendStats(spark,
      Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("k", "v"), "md", "k")
    val st = wh.casMergeInto(spark, "md", "k",
      Seq((1L, -1L)).toDF("k", "v"))
    assert(st.updatedRows == 2L && st.insertedRows == 0L, st.toString)
    // collect, not rows(): a Set would hide a lost duplicate
    val got = wh.casRead(spark, "md").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq((1L, -1L), (1L, -1L), (2L, 20L)), got.toString)
  }

  test("NULL keys never match on either side: a NULL-keyed target " +
    "row is retained unchanged, a NULL-keyed source row INSERTS") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppendStats(spark,
      Seq((Option(1L), 10L), (Option.empty[Long], 999L))
        .toDF("k", "v"), "mn", "k")
    val st = wh.casMergeInto(spark, "mn", "k",
      Seq((Option(1L), -1L), (Option.empty[Long], -999L))
        .toDF("k", "v"))
    assert(st.updatedRows == 1L && st.insertedRows == 1L, st.toString)
    val got = rows(wh.casRead(spark, "mn")).map(r =>
      (Option(r.head).map(_.asInstanceOf[Long]),
        r(1).asInstanceOf[Long]))
    assert(got.count(_ == (None, 999L)) == 1,
      s"target NULL row survived unchanged: $got")
    assert(got.count(_ == (None, -999L)) == 1,
      s"source NULL row inserted: $got")
    assert(got.count(_ == (Some(1L), -1L)) == 1, got.toString)
    assert(got.size == 3)
  }

  test("duplicate source keys are rejected up front (the ambiguity " +
    "ANSI MERGE errors on) and an empty source is a no-op without " +
    "a commit") {
    import spark.implicits._
    val wh = tmpWh()
    quadWaves(wh, "mr")
    intercept[IllegalArgumentException] {
      wh.casMergeInto(spark, "mr", "k",
        Seq((1L, 1L), (1L, 2L)).toDF("k", "v"))
    }
    val head = wh.casHead("mr")
    val st = wh.casMergeInto(spark, "mr", "k",
      Seq.empty[(Long, Long)].toDF("k", "v"))
    assert(st.version == head && wh.casHead("mr") == head,
      "no commit published for an empty source")
    intercept[IllegalArgumentException] {
      wh.casMergeInto(spark, "mr", "k", Seq(1L).toDF("k"))
    }
  }

  test("a CAS race injected between classification and publish " +
    "makes the merge RETRY against the new head and still land " +
    "correctly") {
    import spark.implicits._
    val wh = tmpWh()
    quadWaves(wh, "mo")
    var raced = false
    val st = wh.casMergeInto(spark, "mo", "k",
      Seq((5L, -5L), (300L, -300L)).toDF("k", "v"),
      beforeCommit = () => {
        if (!raced) {
          raced = true
          wh.casAppendStats(spark,
            Seq((50L, 5000L)).toDF("k", "v"), "mo", "k")
          ()
        }
      })
    assert(raced, "the race actually fired")
    val got = rows(wh.casRead(spark, "mo")).map(r =>
      (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long])).toMap
    assert(got.size == 42 && got(5L) == -5L && got(300L) == -300L &&
      got(50L) == 5000L,
      s"the merge landed AND the racer's wave survived: ${got.size}")
    // the winning merge saw the racer's commit: 4 original + racer
    assert(st.rewrittenCommits + st.retainedCommits == 5, st.toString)
  }

  test("active MoR tombstones keep winning BY KEY across a merge " +
    "(documented: compact first when resurrection is intended), and " +
    "compaction preserves that outcome") {
    import spark.implicits._
    val wh = tmpWh()
    quadWaves(wh, "mt")
    wh.casDeleteMoR(spark, "mt", "k", Seq(12L).toDF("k"))
    val st = wh.casMergeInto(spark, "mt", "k",
      Seq((12L, -12L), (400L, -400L)).toDF("k", "v"))
    assert(st.updatedRows == 1L && st.insertedRows == 1L,
      s"physical rows merged even under the tombstone: $st")
    def ks(): Seq[Long] = wh.casRead(spark, "mt").collect()
      .map(_.getLong(0)).toSeq.sorted
    assert(!ks().contains(12L) && ks().contains(400L),
      "the tombstone still anti-joins the merged key out")
    wh.casCompactDeletes(spark, "mt")
    assert(!ks().contains(12L) && ks().contains(400L) &&
      ks().size == 40, "compaction folds the tombstone, same view")
  }

  test("scd1Delta + casMergeInto is row-identical to the full " +
    "scd1Merge, the delta is exactly changed∪new (null-safe: a " +
    "NULL<=>NULL attribute is UNCHANGED, never re-updated forever)") {
    import spark.implicits._
    import graft.ops.Scd
    val tgt = Seq(
      (1L, Option(10L), "a"), // unchanged
      (2L, Option(20L), "b"), // attr changes
      (3L, Option.empty[Long], "c"), // NULL attr, src also NULL
      (4L, Option(40L), "d") // absent from src: passes through
    ).toDF("k", "x", "s")
    val src = Seq(
      (1L, Option(10L), "a"),
      (2L, Option(21L), "b"),
      (3L, Option.empty[Long], "c"),
      (5L, Option(50L), "e") // new key
    ).toDF("k", "x", "s")
    val delta = Scd.scd1Delta(src, tgt, Seq("k"), Seq("x", "s"))
    assert(rows(delta) == Set(Seq(2L, 21L, "b"), Seq(5L, 50L, "e")),
      s"changed + new ONLY — the pandas NaN!=NaN bug would drag " +
        s"key 3 in forever: ${rows(delta)}")
    val wh = tmpWh()
    wh.casAppendStats(spark, tgt, "sd", "k")
    wh.casMergeInto(spark, "sd", "k", delta)
    assert(rows(wh.casRead(spark, "sd")) ==
      rows(Scd.scd1Merge(src, tgt, Seq("k"), Seq("x", "s"))),
      "delta-merge must be row-identical to the full SCD1 merge")
  }

  test("mergeSink crash AFTER the merge commit, REAL restart from " +
    "the streaming checkpoint: the replayed batch DEDUPS on its TXN " +
    "marker instead of rolling a concurrent writer's rows back to " +
    "the batch's stale values") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wh = tmpWh()
    quadWaves(wh, "sm")
    val ckpt = java.nio.file.Files
      .createTempDirectory("mrg-ckpt-").toString
    val input = MemoryStream[(Long, Long)]
    input.addData((25L, -25L), (100L, -100L))
    val crashed = graft.streaming.StreamingEtl.mergeSink(
      input.toDF().toDF("k", "v"), wh, "sm", "k", "s1", ckpt,
      afterMerge = () => sys.error("injected crash after commit"))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      crashed.awaitTermination()
    }
    assert(wh.casHead("sm") == 5, "crash shape: the merge landed")
    def vOf(k: Long): Long = wh.casRead(spark, "sm")
      .filter(col("k") === k).select("v").collect().head.getLong(0)
    assert(vOf(25L) == -25L && vOf(100L) == -100L)
    // a CONCURRENT writer touches one of the batch's keys before
    // the restart — the exact window a naive replay would corrupt
    wh.casMergeInto(spark, "sm", "k", Seq((25L, 777L)).toDF("k", "v"))
    assert(wh.casHead("sm") == 6 && vOf(25L) == 777L)
    // restart re-delivers batch 0: it must DEDUP, not re-merge
    graft.streaming.StreamingEtl.mergeSink(
      input.toDF().toDF("k", "v"), wh, "sm", "k", "s1", ckpt)
      .awaitTermination()
    assert(wh.casHead("sm") == 6,
      "the replayed batch published nothing")
    assert(vOf(25L) == 777L,
      "the concurrent writer's value SURVIVES the replay — the " +
        "stale-rollback the TXN marker exists to prevent")
    // a NEW batch through the same checkpoint still merges
    input.addData((26L, -26L))
    graft.streaming.StreamingEtl.mergeSink(
      input.toDF().toDF("k", "v"), wh, "sm", "k", "s1", ckpt)
      .awaitTermination()
    assert(vOf(26L) == -26L && vOf(25L) == 777L &&
      wh.casRead(spark, "sm").count() == 41L)
  }

  test("the merge TXN marker rides checkpoints: a replay arriving " +
    "after casCheckpoint folded the log still dedups (the TXN " +
    "summary covers it), and casBatchVersion resolves the batch") {
    import spark.implicits._
    val wh = tmpWh()
    quadWaves(wh, "tc")
    val st = wh.casMergeBatch(spark, "tc", "k",
      Seq((5L, -5L)).toDF("k", "v"), "s2", 0L)
    assert(st.isDefined && st.get.updatedRows == 1L)
    wh.casCheckpoint("tc")
    assert(wh.casMergeBatch(spark, "tc", "k",
      Seq((5L, -999L)).toDF("k", "v"), "s2", 0L).isEmpty,
      "dedup through the checkpoint's TXN summary")
    assert(wh.casBatchVersion("tc", "s2", 0L).isDefined)
    // the next batch id is NOT covered by the summary claim
    assert(wh.casMergeBatch(spark, "tc", "k",
      Seq((6L, -6L)).toDF("k", "v"), "s2", 1L).isDefined)
  }

  test("merge on an evolved table publishes REPLACEE/ADDES so the " +
    "snapshot keeps footer-merging, and the evolved column survives") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppendStats(spark,
      (0L until 10L).toDF("k").withColumn("v", col("k")), "me", "k")
    wh.casAppendEvolved(
      (20L until 30L).toDF("k").withColumn("v", col("k"))
        .withColumn("extra", lit(7L)), "me")
    // source carries the FULL merged schema; key 25 hits the evolved
    // (stat-less, conservatively affected) wave; 500 inserts
    val src = Seq((25L, -25L, Option(8L)), (500L, -500L, Option(9L)))
      .toDF("k", "v", "extra")
    val st = wh.casMergeInto(spark, "me", "k", src)
    assert(st.updatedRows == 1L && st.insertedRows == 1L, st.toString)
    val ls = commitLines(wh, "me", st.version)
    assert(ls.exists(_.startsWith("REPLACEE ")) &&
      ls.exists(_.startsWith("ADDES 500 500 ")), ls.toString)
    val got = wh.casRead(spark, "me")
    assert(got.columns.toSet == Set("k", "v", "extra"))
    val m = rows(got.select("k", "v", "extra")).map(r =>
      r.head.asInstanceOf[Long] ->
        (r(1).asInstanceOf[Long], Option(r(2)))).toMap
    assert(m(25L)._1 == -25L && m(500L)._1 == -500L &&
      m(500L)._2 == Some(9L), m.toString)
  }
}
