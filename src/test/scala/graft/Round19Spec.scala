package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.CasIvm
import graft.sources.{CasCdfResult, Warehouse}

/** Round-19 pins: the typed CDF consult ([[Warehouse.casCdfFeed]] —
  * one walk, no plan/frame disagreement, no schema borrow on empty
  * windows), retention-aware maintainer recovery (a truncate-retired
  * window degrades to refresh instead of dying), the subscriber
  * handshake (registered maintainers clamp retention by default;
  * stranding is a deliberate override), and the net-zero-first-window
  * boot fix (a cursor-only TXN table must not wedge the maintainer).
  */
class Round19Spec extends SparkSpec {

  private def tmpWh(): Warehouse = Warehouse(
    java.nio.file.Files.createTempDirectory("r19-").toString)

  private def src(lo: Long, hi: Long): DataFrame = {
    import spark.implicits._
    (lo until hi).map(k => (k, k % 3, k)).toDF("k", "g", "v")
  }

  private def fullSumCount(wh: Warehouse, t: String): Set[Seq[Any]] =
    rows(wh.casRead(spark, t).groupBy(col("g"))
      .agg(sum("v").cast("long").as("sum_v"),
        count(lit(1)).as("n_rows")))

  // ---- the boot wedge (ADVICE r18, medium) -------------------------

  test("a NET-ZERO first maintenance window (appends fully CoW-" +
    "deleted before the first run) must not wedge the maintainer: " +
    "the cursor-only advance leaves a TXN-only rollup, and the next " +
    "data window still bootstraps and reads back") {
    val wh = tmpWh()
    wh.casAppendStats(spark, src(0, 10), "bw", "k")
    wh.casDeleteWhere(spark, "bw", "k", (0L until 10L))
    // first run: the window diffs to zero rows -> cursor-only commit
    assert(CasIvm.maintainSumCount(spark, wh, "bw", "bwroll",
      "g", "v") == "noop")
    assert(wh.casHead("bwroll") == 1 && !wh.casHasData("bwroll"),
      "the advance must be a TXN-only commit (no data line)")
    // the wedge: with casHead-based boot detection this threw
    // 'empty snapshot' forever; data-commit-based detection seeds
    wh.casAppendStats(spark, src(10, 30), "bw", "k")
    assert(CasIvm.maintainSumCount(spark, wh, "bw", "bwroll",
      "g", "v") == "bootstrap")
    assert(rows(wh.casRead(spark, "bwroll")) == fullSumCount(wh, "bw"))
  }

  test("the zero-row-first-window boot fix holds for maintainMinMax " +
    "and maintainJoin too (empty first waves -> cursor-only advance " +
    "-> later data window still bootstraps)") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppendStats(spark, src(0, 0), "bm", "k") // empty wave
    assert(CasIvm.maintainMinMax(spark, wh, "bm", "bmroll",
      "g", "v") == "noop")
    assert(!wh.casHasData("bmroll"),
      "the advance must be a TXN-only commit (no data line)")
    wh.casAppendStats(spark, src(10, 30), "bm", "k")
    assert(CasIvm.maintainMinMax(spark, wh, "bm", "bmroll",
      "g", "v") == "bootstrap")
    assert(rows(wh.casRead(spark, "bmroll")) ==
      rows(wh.casRead(spark, "bm").groupBy(col("g"))
        .agg(min(col("v").cast("long")).as("min_v"),
          max(col("v").cast("long")).as("max_v"),
          count(lit(1)).as("n_rows"))))
    // join MV: both sides' first windows are zero rows
    wh.casAppendStats(spark, src(0, 0).select("k", "v"), "ja", "k")
    wh.casAppendStats(spark,
      Seq.empty[(Long, Long)].toDF("k", "w"), "jb", "k")
    assert(CasIvm.maintainJoin(spark, wh, "ja", "jb", "jmv",
      "k") == "noop")
    assert(!wh.casHasData("jmv"))
    wh.casAppendStats(spark, src(8, 20).select("k", "v"), "ja", "k")
    wh.casAppendStats(spark,
      (8L until 20L).map(k => (k, k % 5)).toDF("k", "w"), "jb", "k")
    assert(CasIvm.maintainJoin(spark, wh, "ja", "jb", "jmv",
      "k") == "bootstrap")
    assert(rows(wh.casRead(spark, "jmv")) ==
      rows(wh.casRead(spark, "ja")
        .join(wh.casRead(spark, "jb"), Seq("k"))))
  }

  // ---- the typed consult (ADVICE r18, low ×2) ----------------------

  test("casCdfFeed is ONE walk with typed verdicts: Empty for a " +
    "meta-only window (zero data-path listings — survives a " +
    "physically missing non-hit wave), Delta with the plan, " +
    "NonDiffable for a restore, Retired for a truncated window") {
    val wh = tmpWh()
    val v1 = wh.casAppendStats(spark, src(0, 10), "f", "k")
    wh.casAppendStats(spark, src(10, 20), "f", "k")
    val (d, h2) = wh.casCdfFeed(spark, "f", v1)
    d match {
      case CasCdfResult.Delta(frame, plan) =>
        assert(frame.count() == 10L && plan.size == 1)
      case other => fail(s"expected Delta, got $other")
    }
    // meta-only window: a subscriber registration commit
    wh.casSubscribe("f", "ivm:f", "froll")
    val (e, h3) = wh.casCdfFeed(spark, "f", h2)
    assert(h3 == h2 + 1 && e == CasCdfResult.Empty)
    // the Empty verdict must not resolve ANY wave: nuke wave 1 from
    // disk (cold-storage offload of a non-hit wave) and re-consult
    val c1 = scala.io.Source.fromFile(
      new java.io.File(wh.root, "f__log/000000001.commit"))
    val w1path = try c1.getLines().find(_.startsWith("ADDS "))
      .get.split(" ", 4)(3) finally c1.close()
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array()).foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(w1path))
    assert(wh.casCdfFeed(spark, "f", h2)._1 == CasCdfResult.Empty,
      "an empty window must not borrow a schema from the snapshot")
    // restore -> NonDiffable (well-formed, but not row-diffable)
    val wh2 = tmpWh()
    wh2.casAppendStats(spark, src(0, 5), "r", "k")
    wh2.casAppendStats(spark, src(5, 9), "r", "k")
    wh2.casRestore(spark, "r", 1)
    assert(wh2.casCdfFeed(spark, "r", 1)._1 == CasCdfResult.NonDiffable)
    // truncation -> Retired (typed), while the legacy plan consult
    // still fails loudly for ad-hoc readers
    val wh3 = tmpWh()
    wh3.casAppendStats(spark, src(0, 5), "t", "k")
    wh3.casReplace(spark, "t")(cur => cur)
    wh3.casTruncate("t")
    wh3.casCdfFeed(spark, "t", 1)._1 match {
      case CasCdfResult.Retired(reason) =>
        assert(reason.contains("retired"))
      case other => fail(s"expected Retired, got $other")
    }
    intercept[RuntimeException] { wh3.casCdfPlan("t", 1) }
    intercept[RuntimeException] { wh3.casChangesSinceCdf(spark, "t", 1) }
  }

  // ---- retention-aware recovery (r18 advice #1) --------------------

  test("a lagging maintainer whose window retention retired DEGRADES " +
    "to refresh (exact rollup, no error) for all three maintainers") {
    import spark.implicits._
    val wh = tmpWh()
    // sum/count
    wh.casAppendStats(spark, src(0, 20), "ra", "k")
    assert(CasIvm.maintainSumCount(spark, wh, "ra", "raroll",
      "g", "v") == "bootstrap")
    wh.casAppendStats(spark, src(20, 40), "ra", "k")
    wh.casDeleteWhere(spark, "ra", "k", Seq(3L, 21L))
    wh.casTruncate("ra", strandSubscribers = true)
    assert(CasIvm.maintainSumCount(spark, wh, "ra", "raroll",
      "g", "v") == "refresh")
    assert(rows(wh.casRead(spark, "raroll")) == fullSumCount(wh, "ra"))
    // and the stream recovers: the NEXT window is incremental again
    wh.casAppendStats(spark, src(40, 50), "ra", "k")
    assert(CasIvm.maintainSumCount(spark, wh, "ra", "raroll",
      "g", "v") == "incremental")
    assert(rows(wh.casRead(spark, "raroll")) == fullSumCount(wh, "ra"))
    // min/max
    wh.casAppendStats(spark, src(0, 20), "rb", "k")
    assert(CasIvm.maintainMinMax(spark, wh, "rb", "rbroll",
      "g", "v") == "bootstrap")
    wh.casAppendStats(spark, src(20, 40), "rb", "k")
    wh.casTruncate("rb", strandSubscribers = true)
    assert(CasIvm.maintainMinMax(spark, wh, "rb", "rbroll",
      "g", "v") == "refresh")
    assert(rows(wh.casRead(spark, "rbroll")) ==
      rows(wh.casRead(spark, "rb").groupBy(col("g"))
        .agg(min(col("v").cast("long")).as("min_v"),
          max(col("v").cast("long")).as("max_v"),
          count(lit(1)).as("n_rows"))))
    // join MV: retire ONE side's window only
    wh.casAppendStats(spark, src(0, 12).select("k", "v"), "rc", "k")
    wh.casAppendStats(spark,
      (0L until 12L).map(k => (k, k % 4)).toDF("k", "w"), "rd", "k")
    assert(CasIvm.maintainJoin(spark, wh, "rc", "rd", "rmv",
      "k") == "bootstrap")
    wh.casAppendStats(spark, src(12, 24).select("k", "v"), "rc", "k")
    wh.casTruncate("rc", strandSubscribers = true)
    assert(CasIvm.maintainJoin(spark, wh, "rc", "rd", "rmv",
      "k") == "refresh")
    assert(rows(wh.casRead(spark, "rmv")) ==
      rows(wh.casRead(spark, "rc")
        .join(wh.casRead(spark, "rd"), Seq("k"))))
  }

  // ---- wave-bounded min/max rescan (r18 advice #3) -----------------

  test("a GROUP-CLUSTERED layout makes the min/max rescan " +
    "wave-bounded, not just row-bounded: extents on a composite " +
    "group-prefixed key, a CoW delete of 3 groups' min-holders, and " +
    "the rescan OPENS fewer waves than are active — exact rollup") {
    import spark.implicits._
    val wh = tmpWh()
    val G = 1L << 40
    // composite key gk = g·2^40 + k: each group's rows are a
    // contiguous key range, so per-group waves carry group-tight
    // extents and every gk-keyed DML preserves the discipline
    val d = (0L until 7000L).map(k => (k % 7 * G + k, k % 7, k))
      .toDF("gk", "g", "v")
    (0L until 7L).foreach { gi =>
      wh.casAppendStats(spark, d.filter(col("g") === gi), "cg", "gk")
      ()
    }
    val rescans = scala.collection.mutable.Set.empty[Any]
    var io = Option.empty[(Int, Int)]
    def m(): String = CasIvm.maintainMinMax(spark, wh, "cg",
      "cgroll", "g", "v",
      onRescan = ks => { rescans ++= ks; () },
      clusteredBy = Some(("gk", (gv: Any) => {
        val gl = gv.asInstanceOf[Long]
        (gl * G, (gl + 1) * G - 1)
      })),
      onRescanIo = (kept, total) => io = Some((kept, total)))
    assert(m() == "bootstrap")
    assert(io.isEmpty, "bootstrap must not rescan")
    // delete EXACTLY the min-holding rows of groups 1, 2, 5 —
    // keyed on gk, so classification rewrites only those groups'
    // waves and their extents stay gk-tight
    val minKeys = d.groupBy("g").agg(min("v").as("mv"))
      .filter(col("g").isin(1L, 2L, 5L))
      .select((col("g") * G + col("mv")).as("gk"))
    wh.casDeleteWhereKeys(spark, "cg", "gk", minKeys)
    assert(m() == "incremental")
    assert(rescans == Set(1L, 2L, 5L),
      s"rescans must be exactly the min-touched groups, got $rescans")
    val (kept, total) = io.getOrElse(fail("rescan did not report IO"))
    assert(kept < total && kept >= 1,
      s"the rescan must OPEN fewer waves than active ($kept/$total)")
    assert(rows(wh.casRead(spark, "cgroll")) ==
      rows(wh.casRead(spark, "cg").groupBy(col("g"))
        .agg(min(col("v").cast("long")).as("min_v"),
          max(col("v").cast("long")).as("max_v"),
          count(lit(1)).as("n_rows"))))
  }

  // ---- streaming CDF maintainer (r18 advice #4) --------------------

  test("a CoW GDPR delete landing BETWEEN micro-batches is absorbed " +
    "MID-STREAM by ivmSink: the next trigger's maintenance stays " +
    "incremental (the CDF window covers the foreign commit), " +
    "exactly-once holds across a crash replay, rollup exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wh = tmpWh()
    val ckpt = java.nio.file.Files
      .createTempDirectory("cdf-ivm-ckpt-").toString
    val input = MemoryStream[(Long, Long, Long)]
    val modes = scala.collection.mutable.ArrayBuffer.empty[String]
    def drain(after: () => Unit = () => ()): Unit =
      graft.streaming.StreamingEtl.ivmSink(
        input.toDF().toDF("k", "g", "v"), wh, "dsrc", "droll",
        "g", "v", "sd", ckpt, m => { modes += m; () }, after)
        .awaitTermination()
    def fullAgg(): Set[Seq[Any]] = rows(wh.catRead(spark, "dsrc")
      .groupBy(col("g")).agg(sum("v").cast("long").as("sum_v"),
        count(lit(1)).as("n_rows")))
    input.addData((0L until 30L).map(k => (k, k % 3, k)): _*)
    drain()
    assert(modes.toSeq == Seq("bootstrap"))
    // the foreign commit: a CoW delete lands OUTSIDE the stream,
    // between triggers — a batch-tier GDPR job crossing a live MV
    wh.casDeleteWhereKeys(spark, "dsrc", "k",
      Seq(0L, 7L, 14L, 21L, 28L).toDF("k"))
    input.addData((30L until 50L).map(k => (k, k % 3, k)): _*)
    drain()
    assert(modes.toSeq == Seq("bootstrap", "incremental"),
      s"the delete window must absorb incrementally, got $modes")
    assert(rows(wh.catRead(spark, "droll")) == fullAgg())
    assert(wh.catRead(spark, "dsrc").count() == 45L)
    // crash after the batch fully landed, BEFORE the checkpoint:
    // replay dedups the append and no-ops the maintenance
    input.addData((50L until 60L).map(k => (k, k % 3, k)): _*)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(() => sys.error("crash before the checkpoint"))
    }
    drain()
    assert(modes.toSeq ==
      Seq("bootstrap", "incremental", "incremental", "noop"),
      modes.toString)
    assert(rows(wh.catRead(spark, "droll")) == fullAgg(),
      "no double count across the replay")
  }

  // ---- filtered MV: SCD2 current-rows rollup (r18 advice #5) -------

  test("a FILTERED sum/count MV (where current_flag=1) tracks an " +
    "SCD2 dimension's current rows across day-rolls at O(changed): " +
    "expire rewrites retract the old current version, expired twins " +
    "are filtered out, fresh versions increment — all incremental") {
    import spark.implicits._
    val wh = tmpWh()
    def dim(day: Long, rows: Seq[(Long, Long)]) = rows
      .toDF("cust_id", "nat")
      .withColumn("current_flag", lit(1L))
      .withColumn("eff_dt", lit(day))
      .withColumn("exp_dt", lit(null).cast("long"))
      .withColumn("pid",
        graft.ops.Scd.mintPidLong(col("cust_id"), lit(day)))
    def m(): String = CasIvm.maintainSumCount(spark, wh,
      "sdim", "sroll2", "nat", "cust_id",
      where = Some(col("current_flag") === 1L))
    val day1 = (0L until 40L).map(k => (k, k % 4))
    wh.casAppendStats(spark, dim(1L, day1), "sdim", "pid")
    assert(m() == "bootstrap")
    def expect(): Set[Seq[Any]] = rows(
      wh.casRead(spark, "sdim").filter(col("current_flag") === 1L)
        .groupBy(col("nat"))
        .agg(sum("cust_id").cast("long").as("sum_v"),
          count(lit(1)).as("n_rows")))
    assert(rows(wh.casRead(spark, "sroll2")) == expect())
    // day 2: keys divisible by 5 move to nat+10 — ONE casMergeInto
    // of exactly the SCD2 writes (expire + fresh), the q319 shape
    val day2 = (0L until 40L).map(k =>
      (k, if (k % 5 == 0) k % 4 + 10 else k % 4))
    val changes = graft.ops.Scd.scd2CatChanges(
      day2.toDF("cust_id", "nat"), wh.casRead(spark, "sdim"),
      Seq("cust_id"), Seq("nat"), lit(2L),
      ks => graft.ops.Scd.mintPidLong(ks.head, lit(2L)))
    wh.casMergeInto(spark, "sdim", "pid", changes)
    assert(m() == "incremental",
      "the day-roll must absorb incrementally, never refresh")
    assert(rows(wh.casRead(spark, "sroll2")) == expect())
    // day 3: a second roll (some keys move back) stays incremental
    val day3 = (0L until 40L).map(k =>
      (k, if (k % 10 == 0) k % 4 else
        if (k % 5 == 0) k % 4 + 10 else k % 4))
    val ch3 = graft.ops.Scd.scd2CatChanges(
      day3.toDF("cust_id", "nat"), wh.casRead(spark, "sdim"),
      Seq("cust_id"), Seq("nat"), lit(3L),
      ks => graft.ops.Scd.mintPidLong(ks.head, lit(3L)))
    wh.casMergeInto(spark, "sdim", "pid", ch3)
    assert(m() == "incremental")
    assert(rows(wh.casRead(spark, "sroll2")) == expect())
    // the filter did real work: history rows outnumber current rows
    assert(wh.casRead(spark, "sdim").count() >
      wh.casRead(spark, "sdim")
        .filter(col("current_flag") === 1L).count())
  }

  // ---- moments rollup (sum, sum_sq, count) -------------------------

  test("maintainMoments keeps (sum, sum_sq, count) exact through " +
    "appends, a CoW delete, and a group emptied by retraction — " +
    "variance/stddev derivable with zero extra maintenance") {
    import spark.implicits._
    val wh = tmpWh()
    def m(): String = CasIvm.maintainMoments(spark, wh,
      "mo", "moroll", "g", "v")
    def expect(): Set[Seq[Any]] = rows(
      wh.casRead(spark, "mo").groupBy(col("g"))
        .agg(sum(col("v").cast("long")).cast("long").as("sum_v"),
          sum(col("v").cast("long") * col("v").cast("long"))
            .cast("long").as("sum_sq"),
          count(lit(1)).as("n_rows")))
    wh.casAppendStats(spark, src(0, 40), "mo", "k")
    assert(m() == "bootstrap")
    assert(rows(wh.casRead(spark, "moroll")) == expect())
    wh.casAppendStats(spark, src(40, 60), "mo", "k")
    assert(m() == "incremental")
    assert(rows(wh.casRead(spark, "moroll")) == expect())
    // CoW delete: both moments subtract; group 2 emptied entirely
    wh.casDeleteWhereKeys(spark, "mo", "k",
      (0L until 60L).filter(k => k % 3 == 2 || k % 7 == 0)
        .toDF("k"))
    assert(m() == "incremental")
    assert(rows(wh.casRead(spark, "moroll")) == expect())
    assert(!rows(wh.casRead(spark, "moroll")).exists(_.head == 2L),
      "the emptied group must vanish from the rollup")
  }

  // ---- the subscriber handshake ------------------------------------

  test("a REGISTERED maintainer clamps retention by default: its " +
    "incremental window survives casTruncate, the lagging set is " +
    "reported, and the next maintenance stays incremental; " +
    "strandSubscribers overrides; registration survives truncation") {
    val wh = tmpWh()
    wh.casAppendStats(spark, src(0, 20), "s", "k")
    assert(CasIvm.maintainSumCount(spark, wh, "s", "sroll",
      "g", "v") == "bootstrap")
    wh.casSubscribe("s", "ivm:s", "sroll")
    assert(wh.casSubscribers("s") ==
      Map("ivm:s" -> (("all", "sroll"))))
    // the maintainer lags: three more windows land unabsorbed
    wh.casAppendStats(spark, src(20, 30), "s", "k")
    wh.casAppendStats(spark, src(30, 40), "s", "k")
    wh.casReplace(spark, "s")(cur => cur) // a rewrite to fold
    var lagging = Seq.empty[(String, Int)]
    wh.casTruncate("s", onLagging = l => lagging = l)
    assert(lagging.map(_._1) == Seq("ivm:s"),
      "the warn seam must name the lagging stream")
    // the clamp held the window: still incremental, exact
    assert(CasIvm.maintainSumCount(spark, wh, "s", "sroll",
      "g", "v") == "incremental")
    assert(rows(wh.casRead(spark, "sroll")) == fullSumCount(wh, "s"))
    // registration survived the truncation checkpoint
    assert(wh.casSubscribers("s") ==
      Map("ivm:s" -> (("all", "sroll"))))
    // now lag again and STRAND deliberately: window retired, refresh
    wh.casAppendStats(spark, src(40, 50), "s", "k")
    wh.casReplace(spark, "s")(cur => cur)
    lagging = Nil
    val n = wh.casTruncate("s", strandSubscribers = true,
      onLagging = l => lagging = l)
    assert(n > 0 && lagging.map(_._1) == Seq("ivm:s"),
      "stranding must actually retire commits AND warn")
    assert(CasIvm.maintainSumCount(spark, wh, "s", "sroll",
      "g", "v") == "refresh")
    assert(rows(wh.casRead(spark, "sroll")) == fullSumCount(wh, "s"))
  }

  // ---- N:M join-MV maintenance (r18 advice #2) ---------------------

  test("maintainJoin carries N:M multiplicity: duplicate keys on " +
    "BOTH sides stay exact through appends on each side, a CoW " +
    "delete shrinking one side's multiplicity, and a delete " +
    "emptying a key — all incremental, never refresh") {
    import spark.implicits._
    val wh = tmpWh()
    def fullJoin(): Set[Seq[Any]] =
      rows(wh.casRead(spark, "na").join(wh.casRead(spark, "nb"),
        Seq("k")))
    def mvRows(): Set[Seq[Any]] = rows(wh.casRead(spark, "nmv"))
    // side A: each key k in 0..9 appears (k % 3 + 1) times
    val a1 = (0L until 10L).flatMap(k =>
      (0L to k % 3).map(i => (k, k * 10 + i))).toDF("k", "va")
    // side B: each key appears (k % 2 + 1) times
    val b1 = (0L until 10L).flatMap(k =>
      (0L to k % 2).map(j => (k, k * 100 + j))).toDF("k", "vb")
    wh.casAppendStats(spark, a1, "na", "k")
    wh.casAppendStats(spark, b1, "nb", "k")
    def m(): String =
      CasIvm.maintainJoin(spark, wh, "na", "nb", "nmv", "k")
    assert(m() == "bootstrap")
    assert(mvRows() == fullJoin())
    // a key's multiplicity GROWS on one side: pair count multiplies
    wh.casAppendStats(spark,
      Seq((4L, 999L), (4L, 998L)).toDF("k", "va"), "na", "k")
    assert(m() == "incremental")
    assert(mvRows() == fullJoin())
    // CoW delete shrinks side B's multiplicity for dup-keyed rows
    // (delete one of key 5's two B rows by its value column — the
    // delete is keyed on k, so delete-then-reinsert the survivor)
    wh.casAppendStats(spark,
      Seq((5L, 12345L)).toDF("k", "vb"), "nb", "k")
    assert(m() == "incremental")
    assert(mvRows() == fullJoin())
    // empty key 7 on side A entirely: ALL its pairs leave the MV
    wh.casDeleteWhere(spark, "na", "k", Seq(7L))
    assert(m() == "incremental")
    assert(mvRows() == fullJoin())
    assert(!mvRows().exists(_.head == 7L))
    // and nothing ever degraded: one more append stays incremental
    wh.casAppendStats(spark,
      Seq((7L, 7000L)).toDF("k", "va"), "na", "k")
    assert(m() == "incremental")
    assert(mvRows() == fullJoin())
    // COMPOSITION: the N:M MV's casReplaceKeys landings are ordinary
    // CAS rewrites, hence diffable — it is a valid CDF source for a
    // downstream rollup with zero composition code (the q321
    // argument, now at N:M multiplicity)
    def roll(): String = CasIvm.maintainSumCount(spark, wh,
      "nmv", "nmroll", "k", "vb")
    assert(roll() == "bootstrap")
    def expectRoll(): Set[Seq[Any]] = rows(
      wh.casRead(spark, "nmv").groupBy(col("k"))
        .agg(sum("vb").cast("long").as("sum_v"),
          count(lit(1)).as("n_rows")))
    assert(rows(wh.casRead(spark, "nmroll")) == expectRoll())
    // one more multiplicity change propagates the depth incrementally
    wh.casDeleteWhere(spark, "nb", "k", Seq(8L))
    assert(m() == "incremental" && roll() == "incremental")
    assert(mvRows() == fullJoin())
    assert(rows(wh.casRead(spark, "nmroll")) == expectRoll())
  }

  test("a join-MV maintainer registers BOTH sides with hi/lo cursor " +
    "decode, and each side's clamp is independent") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppendStats(spark, src(0, 10).select("k", "v"), "ha", "k")
    wh.casAppendStats(spark,
      (0L until 10L).map(k => (k, k % 4)).toDF("k", "w"), "hb", "k")
    assert(CasIvm.maintainJoin(spark, wh, "ha", "hb", "hmv",
      "k") == "bootstrap")
    wh.casSubscribe("ha", "ivmj:ha:hb", "hmv", part = "hi")
    wh.casSubscribe("hb", "ivmj:ha:hb", "hmv", part = "lo")
    // both sides lag behind a rewrite
    wh.casAppendStats(spark, src(10, 20).select("k", "v"), "ha", "k")
    wh.casReplace(spark, "ha")(cur => cur)
    wh.casReplace(spark, "hb")(cur => cur)
    wh.casTruncate("ha")
    wh.casTruncate("hb")
    // the clamp held both windows: still incremental, exact
    assert(CasIvm.maintainJoin(spark, wh, "ha", "hb", "hmv",
      "k") == "incremental")
    assert(rows(wh.casRead(spark, "hmv")) ==
      rows(wh.casRead(spark, "ha")
        .join(wh.casRead(spark, "hb"), Seq("k"))))
  }
}
