package graft

import org.apache.spark.sql.functions._
import graft.sources.Warehouse

/** [[Warehouse.casChangesSince]] — the O(delta) tail-read: exact
  * append windows, checkpoint neutrality vs restore, every
  * rewrite/tombstone forcing the full-refresh signal, retention
  * loudness, evolved appends, and the running-aggregate consumption
  * pattern the device exists for.
  */
class CasChangesSpec extends SparkSpec {

  private def tmpWh(): Warehouse = Warehouse(
    java.nio.file.Files.createTempDirectory("r17-chg-").toString)

  test("an append-only window returns EXACTLY the appended rows; an " +
    "empty window returns an empty frame with the table schema; the " +
    "returned head is the next cursor") {
    import spark.implicits._
    val wh = tmpWh()
    (0 until 3).foreach { w =>
      wh.casAppendStats(spark,
        (w * 10L until w * 10L + 10L).toDF("k"), "a", "k")
    }
    val (df1, h1) = wh.casChangesSince(spark, "a", 1)
    assert(h1 == 3)
    assert(rows(df1.get) == (10L until 30L).map(Seq(_)).toSet)
    val (df2, h2) = wh.casChangesSince(spark, "a", 3)
    assert(h2 == 3 && df2.get.count() == 0L &&
      df2.get.columns.toSeq == Seq("k"))
    val (df0, _) = wh.casChangesSince(spark, "a", 0)
    assert(df0.get.count() == 30L, "from zero = everything")
  }

  test("a CHECKPOINT inside the window is content-neutral and " +
    "skipped (no double count); a RESTORE is a CKPT commit too but " +
    "changes content and forces the refresh signal") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppendStats(spark, (0L until 10L).toDF("k"), "c", "k")
    wh.casCheckpoint("c") // v2
    wh.casAppendStats(spark, (10L until 20L).toDF("k"), "c", "k") // v3
    val (df, h) = wh.casChangesSince(spark, "c", 1)
    assert(h == 3 && rows(df.get) == (10L until 20L).map(Seq(_)).toSet,
      "the checkpoint's restated lines must not re-emit old rows")
    wh.casRestore(spark, "c", 1) // v4: CKPT verb, content CHANGE
    val (df2, h2) = wh.casChangesSince(spark, "c", 3)
    assert(h2 == 4 && df2.isEmpty,
      "a restore inside the window forces the refresh signal")
  }

  test("every rewrite class and the MoR tombstone force the " +
    "refresh signal: CoW delete, merge, optimize, cluster, DEL") {
    import spark.implicits._
    def base(): Warehouse = {
      val wh = tmpWh()
      (0 until 5).foreach { w =>
        wh.casAppendStats(spark,
          (w * 10L until w * 10L + 10L).toDF("k")
            .withColumn("v", col("k")), "r", "k")
      }
      wh
    }
    val a = base(); a.casDeleteWhere(spark, "r", "k", Seq(5L))
    assert(a.casChangesSince(spark, "r", 5)._1.isEmpty)
    val b = base(); b.casMergeInto(spark, "r", "k",
      Seq((5L, -5L)).toDF("k", "v"))
    assert(b.casChangesSince(spark, "r", 5)._1.isEmpty)
    val c = base(); c.casOptimize(spark, "r", maxWaves = 2)
    assert(c.casChangesSince(spark, "r", 5)._1.isEmpty)
    val d = base(); d.casClusterBy(spark, "r", "k", 2)
    assert(d.casChangesSince(spark, "r", 5)._1.isEmpty)
    val e = base(); e.casDeleteMoR(spark, "r", "k", Seq(5L).toDF("k"))
    assert(e.casChangesSince(spark, "r", 5)._1.isEmpty)
    // but appends AFTER the cursor that follow a pre-cursor rewrite
    // are still incremental — only the WINDOW matters
    val f = base(); f.casDeleteWhere(spark, "r", "k", Seq(5L)) // v6
    f.casAppendStats(spark, (100L until 110L).toDF("k")
      .withColumn("v", col("k")), "r", "k") // v7
    val (df, h) = f.casChangesSince(spark, "r", 6)
    assert(h == 7 && df.get.count() == 10L)
  }

  test("an append of a key tombstoned BEFORE the cursor is invisible " +
    "at head and the tail-read agrees (pre-cursor DELs apply to the " +
    "window's appends)") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppendStats(spark, (0L until 10L).toDF("k"), "tb", "k") // v1
    wh.casDeleteMoR(spark, "tb", "k", Seq(500L).toDF("k")) // v2
    // the window: a pure append re-using the tombstoned key
    wh.casAppendStats(spark, Seq(500L, 600L).toDF("k"), "tb", "k") // v3
    val (df, h) = wh.casChangesSince(spark, "tb", 2)
    assert(h == 3 && rows(df.get) == Set(Seq(600L)),
      "the tombstoned key must not reach the consumer — the table " +
        "read hides it too")
    assert(wh.casRead(spark, "tb").filter(col("k") === 500L)
      .count() == 0L)
  }

  test("a TXN-only commit (deduped pure-delete CDC batch over " +
    "disjoint extents) is metadata, not content — skipped") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppendStats(spark, (0L until 10L).toDF("k")
      .withColumn("v", col("k")), "t", "k")
    wh.casApplyCdcBatch(spark, "t", "k",
      Seq((500L, 0L, "D")).toDF("k", "v", "op"), "op", "s", 0L) // v2
    wh.casAppendStats(spark, (10L until 20L).toDF("k")
      .withColumn("v", col("k")), "t", "k") // v3
    val (df, h) = wh.casChangesSince(spark, "t", 1)
    assert(h == 3 && df.get.count() == 10L)
  }

  test("a window truncated by retention fails LOUDLY, and an " +
    "evolved append in the window comes back with the merged schema") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppendStats(spark, (0L until 10L).toDF("k"), "e", "k")
    wh.casAppendEvolved((10L until 20L).toDF("k")
      .withColumn("extra", lit(7L)), "e")
    val (df, _) = wh.casChangesSince(spark, "e", 1)
    assert(df.get.columns.toSet == Set("k", "extra") &&
      df.get.count() == 10L)
    wh.casReplace(spark, "e")(cur => cur) // v3
    wh.casTruncate("e")
    intercept[RuntimeException] {
      wh.casChangesSince(spark, "e", 1)
    }
  }

  test("CasIvm.maintainSumCount: bootstrap, additive incremental " +
    "merge of touched groups, noop on empty windows, a CoW delete " +
    "in the window absorbed INCREMENTALLY (the signed feed — no " +
    "refresh), MoR tombstones absorbed incrementally too, and the " +
    "refresh degradation only for a RESTORE — rollup equal to the " +
    "full GROUP BY after every run") {
    import spark.implicits._
    import graft.ops.CasIvm
    val wh = tmpWh()
    def fullAgg(): Set[Seq[Any]] = rows(wh.casRead(spark, "src")
      .groupBy(col("g")).agg(sum("v").cast("long").as("sum_v"),
        count(lit(1)).as("n_rows")))
    def roll(): Set[Seq[Any]] = rows(wh.casRead(spark, "roll"))
    def maintain(): String = CasIvm.maintainSumCount(
      spark, wh, "src", "roll", "g", "v")

    wh.casAppendStats(spark, (0L until 30L).map(k => (k, k % 3, k))
      .toDF("k", "g", "v"), "src", "k")
    assert(maintain() == "bootstrap")
    assert(roll() == fullAgg())
    wh.casAppendStats(spark, (30L until 50L).map(k => (k, k % 3, k))
      .toDF("k", "g", "v"), "src", "k")
    assert(maintain() == "incremental")
    assert(roll() == fullAgg())
    assert(maintain() == "noop", "cursor advanced, nothing new")
    assert(roll() == fullAgg())
    // a CoW delete in the window: retractions SUBTRACT — the
    // maintenance stays incremental and exact
    wh.casDeleteWhere(spark, "src", "k", Seq(7L, 41L))
    assert(maintain() == "incremental",
      "a CoW rewrite is row-level diffable — no refresh")
    assert(roll() == fullAgg())
    // a CoW UPDATE too (-old +new through the same feed)
    wh.casUpdateWhere(spark, "src", "k", Seq(8L),
      Map("v" -> lit(800L)))
    assert(maintain() == "incremental")
    assert(roll() == fullAgg())
    // a MoR tombstone diffs too (r18): the feed retracts exactly the
    // rows it hides, at forget-set grain — still incremental
    wh.casDeleteMoR(spark, "src", "k", Seq(9L).toDF("k"))
    assert(maintain() == "incremental")
    assert(roll() == fullAgg())
    // and the cursor keeps absorbing appends
    wh.casAppendStats(spark, (50L until 60L).map(k => (k, k % 3, k))
      .toDF("k", "g", "v"), "src", "k")
    assert(maintain() == "incremental")
    assert(roll() == fullAgg())
    // a group emptied by a CoW delete VANISHES from the rollup
    // (GROUP BY semantics), not a zero-count tombstone row
    val g2 = wh.casRead(spark, "src").filter(col("g") === 2L)
      .select("k").as[Long].collect().toSeq
    wh.casDeleteWhere(spark, "src", "k", g2)
    assert(maintain() == "incremental")
    assert(roll() == fullAgg())
    assert(!roll().exists(_.head == 2L), "emptied group deleted")
    // the one remaining degradation: a RESTORE rewinds history no
    // diff accounts for — honest refresh, recomputed consistently
    wh.casRestore(spark, "src", wh.casHead("src") - 2)
    assert(maintain() == "refresh")
    assert(roll() == fullAgg())
  }

  test("maintenance crash anywhere after the landing: the cursor " +
    "RODE the landing commit (there is no sidecar to lose), so the " +
    "re-run reads it back from the log and no-ops — never " +
    "double-counts; a GROWN window on the replay (a direct append " +
    "landed between crash and restart) absorbs exactly the new rows") {
    import spark.implicits._
    import graft.ops.CasIvm
    val wh = tmpWh()
    def fullAgg(): Set[Seq[Any]] = rows(wh.casRead(spark, "xsrc")
      .groupBy(col("g")).agg(sum("v").cast("long").as("sum_v"),
        count(lit(1)).as("n_rows")))
    wh.casAppendStats(spark, (0L until 30L).map(k => (k, k % 3, k))
      .toDF("k", "g", "v"), "xsrc", "k")
    CasIvm.maintainSumCount(spark, wh, "xsrc", "xroll", "g", "v")
    wh.casAppendStats(spark, (30L until 50L).map(k => (k, k % 3, k))
      .toDF("k", "g", "v"), "xsrc", "k")
    intercept[RuntimeException] {
      CasIvm.maintainSumCount(spark, wh, "xsrc", "xroll", "g", "v",
        afterLand = () => sys.error("crash right after the landing"))
    }
    // crash shape: the landing committed, and the cursor WITH it
    assert(rows(wh.casRead(spark, "xroll")) == fullAgg(),
      "the delta landed before the crash")
    assert(wh.casStreamCursor("xroll", "ivm:xsrc") ==
      wh.casHead("xsrc").toLong,
      "the cursor is IN the landing commit — atomic with the totals")
    // restart: nothing to re-consume — the r17 double-count hazard
    // (same-window replay) and its grown-window sibling (the
    // ADVICE.md medium finding) are both structurally gone
    assert(CasIvm.maintainSumCount(
      spark, wh, "xsrc", "xroll", "g", "v") == "noop")
    assert(rows(wh.casRead(spark, "xroll")) == fullAgg())
    // the grown-window crash shape: a DIRECT append lands between
    // the crash and the restart — the replay's window starts at the
    // landed cursor, so it absorbs exactly the new rows, once
    wh.casAppendStats(spark, (50L until 60L).map(k => (k, k % 3, k))
      .toDF("k", "g", "v"), "xsrc", "k")
    assert(CasIvm.maintainSumCount(
      spark, wh, "xsrc", "xroll", "g", "v") == "incremental")
    assert(rows(wh.casRead(spark, "xroll")) == fullAgg())
  }

  test("two maintainers racing the same window SERIALIZE on the " +
    "fence: exactly one lands, the loser re-reads the advanced " +
    "cursor and no-ops — never a double count (8 rounds, 2 real " +
    "threads)") {
    import spark.implicits._
    import graft.ops.CasIvm
    val wh = tmpWh()
    def fullAgg(): Set[Seq[Any]] = rows(wh.casRead(spark, "rsrc")
      .groupBy(col("g")).agg(sum("v").cast("long").as("sum_v"),
        count(lit(1)).as("n_rows")))
    (0 until 8).foreach { r =>
      wh.casAppendStats(spark,
        (r * 10L until r * 10L + 10L).map(k => (k, k % 3, k))
          .toDF("k", "g", "v"), "rsrc", "k")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val fs = (0 until 2).map(_ => pool.submit(
          new java.util.concurrent.Callable[String] {
            def call(): String = CasIvm.maintainSumCount(
              spark, wh, "rsrc", "rroll", "g", "v")
          }))
        val modes = fs.map(_.get()).sorted
        assert(modes.forall(m => m == "noop" ||
          m == "incremental" || m == "bootstrap"), modes.toString)
      } finally pool.shutdown()
      assert(rows(wh.casRead(spark, "rroll")) == fullAgg(),
        s"round $r: exactly-once absorption under the race")
    }
    assert(wh.casStreamCursor("rroll", "ivm:rsrc") ==
      wh.casHead("rsrc").toLong)
  }

  test("maintainJoin: affected-key recompute covers ΔA-only, " +
    "ΔB-only, and both-delta windows exactly once; crash replay " +
    "no-ops; CoW deletes AND MoR tombstones on either side stay " +
    "INCREMENTAL (the signed feed); only a RESTORE refreshes — MV " +
    "equal to the full join after every run") {
    import spark.implicits._
    import graft.ops.CasIvm
    val wh = tmpWh()
    def fullJoin(): Set[Seq[Any]] = rows(wh.casRead(spark, "ja")
      .join(wh.casRead(spark, "jb"), Seq("k")))
    def mv(): Set[Seq[Any]] = rows(wh.casRead(spark, "jmv"))
    def maintain(after: () => Unit = () => ()): String =
      CasIvm.maintainJoin(spark, wh, "ja", "jb", "jmv", "k", after)
    def landA(ks: Range): Unit = { wh.casAppendStats(spark,
      ks.map(k => (k.toLong, k * 10L)).toDF("k", "va"), "ja", "k"); () }
    def landB(ks: Range): Unit = { wh.casAppendStats(spark,
      ks.map(k => (k.toLong, k * 100L)).toDF("k", "vb"), "jb", "k"); () }

    landA(0 until 20); landB(10 until 30)
    assert(maintain() == "bootstrap")
    assert(mv() == fullJoin() && mv().size == 10)
    // ΔA joins B_new
    landA(20 until 25)
    assert(maintain() == "incremental")
    assert(mv() == fullJoin() && mv().size == 15)
    // A_old joins ΔB
    landB(0 until 5)
    assert(maintain() == "incremental")
    assert(mv() == fullJoin() && mv().size == 20)
    // both deltas in one window, including pairs born from BOTH
    landA(40 until 45); landB(40 until 43)
    assert(maintain() == "incremental")
    assert(mv() == fullJoin() && mv().size == 23)
    // crash after the landing: the packed cursor pair RODE the
    // landing commit, so the replay reads it back and no-ops
    landA(50 until 52); landB(50 until 52)
    intercept[RuntimeException] {
      maintain(() => sys.error("crash right after the landing"))
    }
    assert(mv() == fullJoin() && mv().size == 25, "the delta landed")
    assert(maintain() == "noop")
    assert(mv() == fullJoin() && mv().size == 25, "not duplicated")
    // a CoW delete on side B: the retraction names the affected key,
    // its pair leaves the MV — INCREMENTAL, no rebuild
    wh.casDeleteWhere(spark, "jb", "k", Seq(12L))
    assert(maintain() == "incremental",
      "a CoW rewrite is row-level diffable — no refresh")
    assert(mv() == fullJoin() && mv().size == 24)
    // a CoW UPDATE on side A rides the same path (-old +new)
    wh.casUpdateWhere(spark, "ja", "k", Seq(14L),
      Map("va" -> lit(1400L)))
    assert(maintain() == "incremental")
    assert(mv() == fullJoin() && mv().size == 24)
    // a MoR tombstone on B diffs too: the retraction names the
    // affected key, its pair leaves the MV — still incremental
    wh.casDeleteMoR(spark, "jb", "k", Seq(13L).toDF("k"))
    assert(maintain() == "incremental")
    assert(mv() == fullJoin() && mv().size == 23)
    // only a RESTORE refreshes (rewinds history no diff accounts
    // for) — recomputed at the consulted heads
    wh.casRestore(spark, "jb", wh.casHead("jb") - 1)
    assert(maintain() == "refresh")
    assert(mv() == fullJoin())
    assert(maintain() == "noop")
  }

  test("maintainSumCountCat: the catalog pins (source@cursor, " +
    "rollup@version) as ONE transaction — a catalog reader's pair " +
    "stays consistent even while direct appends run ahead of the " +
    "last maintenance") {
    import spark.implicits._
    import graft.ops.CasIvm
    val wh = tmpWh()
    def pinnedSrcAgg(): Set[Seq[Any]] = rows(
      wh.catRead(spark, "csrc").groupBy(col("g"))
        .agg(sum("v").cast("long").as("sum_v"),
          count(lit(1)).as("n_rows")))
    wh.casAppendStats(spark, (0L until 30L).map(k => (k, k % 3, k))
      .toDF("k", "g", "v"), "csrc", "k")
    assert(CasIvm.maintainSumCountCat(
      spark, wh, "csrc", "croll", "g", "v") == "bootstrap")
    assert(rows(wh.catRead(spark, "croll")) == pinnedSrcAgg())
    // direct appends land PAST the cursor: the catalog pair must
    // stay mutually consistent (rollup == pinned source view), while
    // the direct read sees the new rows already
    wh.casAppendStats(spark, (30L until 40L).map(k => (k, k % 3, k))
      .toDF("k", "g", "v"), "csrc", "k")
    assert(rows(wh.catRead(spark, "croll")) == pinnedSrcAgg(),
      "reader can never join the rollup against unabsorbed rows")
    assert(wh.casRead(spark, "csrc").count() == 40L &&
      wh.catRead(spark, "csrc").count() == 30L,
      "the documented catalog-vs-direct visibility split")
    // the next maintenance absorbs the wave and advances BOTH pins
    assert(CasIvm.maintainSumCountCat(
      spark, wh, "csrc", "croll", "g", "v") == "incremental")
    assert(wh.catRead(spark, "csrc").count() == 40L)
    assert(rows(wh.catRead(spark, "croll")) == pinnedSrcAgg())
  }

  test("ivmSink: per-batch exactly-once landing + maintenance + " +
    "catalog pin; a crash AFTER the whole batch (before the " +
    "checkpoint) replays with a deduped append and a noop " +
    "maintenance — the rollup never double-counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wh = tmpWh()
    val ckpt = java.nio.file.Files
      .createTempDirectory("ivm-ckpt-").toString
    val input = MemoryStream[(Long, Long, Long)]
    val modes = scala.collection.mutable.ArrayBuffer.empty[String]
    def run(after: () => Unit = () => ()): Unit =
      graft.streaming.StreamingEtl.ivmSink(
        input.toDF().toDF("k", "g", "v"), wh, "isrc", "iroll",
        "g", "v", "s1", ckpt, m => { modes += m; () }, after)
        .awaitTermination()
    def fullAgg(): Set[Seq[Any]] = rows(wh.catRead(spark, "isrc")
      .groupBy(col("g")).agg(sum("v").cast("long").as("sum_v"),
        count(lit(1)).as("n_rows")))
    input.addData((0L until 30L).map(k => (k, k % 3, k)): _*)
    run()
    assert(modes.toSeq == Seq("bootstrap") &&
      rows(wh.catRead(spark, "iroll")) == fullAgg())
    // crash after the batch fully landed, BEFORE the checkpoint
    input.addData((30L until 50L).map(k => (k, k % 3, k)): _*)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(() => sys.error("crash before the checkpoint"))
    }
    assert(modes.toSeq == Seq("bootstrap", "incremental"))
    // restart replays the batch: append dedups, maintenance no-ops
    run()
    assert(modes.toSeq ==
      Seq("bootstrap", "incremental", "noop"), modes.toString)
    assert(rows(wh.catRead(spark, "iroll")) == fullAgg(),
      "no double count across the replay")
    assert(wh.catRead(spark, "isrc").count() == 50L)
    // and the stream keeps absorbing
    input.addData((50L until 60L).map(k => (k, k % 3, k)): _*)
    run()
    assert(modes.last == "incremental" &&
      rows(wh.catRead(spark, "iroll")) == fullAgg())
  }

  test("the consumption pattern: a running aggregate maintained " +
    "from successive change windows equals the snapshot aggregate") {
    import spark.implicits._
    val wh = tmpWh()
    var cursor = 0
    var running = 0L
    def consume(): Unit = {
      val (df, h) = wh.casChangesSince(spark, "s", cursor)
      running += df.get.agg(coalesce(sum("k"), lit(0L)))
        .as[Long].head()
      cursor = h
    }
    wh.casAppendStats(spark, (0L until 10L).toDF("k"), "s", "k")
    consume()
    wh.casAppendStats(spark, (10L until 30L).toDF("k"), "s", "k")
    wh.casCheckpoint("s")
    wh.casAppendStats(spark, (30L until 40L).toDF("k"), "s", "k")
    consume()
    assert(running == (0L until 40L).sum)
    assert(running == wh.casRead(spark, "s").agg(sum("k"))
      .as[Long].head())
  }
}
