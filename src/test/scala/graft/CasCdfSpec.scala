package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Warehouse

/** [[Warehouse.casChangesSinceCdf]] — the retraction-carrying change
  * feed — and the maintainers built on it: the signed feed is exact
  * across every copy-on-write rewrite (delete/update/merge), a pure
  * layout change (OPTIMIZE/cluster) diffs to ZERO rows, the read
  * plan names ONLY the waves that entered/left the active set (the
  * wave-grain cost evidence), the non-diffable cases (new MoR
  * tombstone, restore, evolution meeting a rewrite) signal refresh,
  * and the universal property holds: snapshot(cursor) ⊎ feed =
  * snapshot(head) as multisets, for every cursor.
  */
class CasCdfSpec extends SparkSpec {

  private def tmpWh(): Warehouse = Warehouse(
    java.nio.file.Files.createTempDirectory("r18-cdf-").toString)

  // multiset view: every distinct row with its multiplicity
  private def bag(df: DataFrame): Set[Seq[Any]] =
    rows(df.groupBy(df.columns.map(col): _*)
      .agg(count(lit(1)).as("__n")))

  // snapshot(fromV) + inserts − retractions, as a multiset
  private def applied(wh: Warehouse, table: String,
      fromV: Int): Set[Seq[Any]] = {
    val (chg, head) = wh.casChangesSinceCdf(spark, table, fromV)
    assert(head == wh.casHead(table))
    val feed = chg.get
    val base =
      if (fromV == 0) feed.drop("_sign").limit(0)
      else wh.casReadAt(spark, table, fromV)
    rows(base.withColumn("_sign", lit(1)).unionByName(feed)
      .groupBy(base.columns.map(col): _*)
      .agg(sum("_sign").cast("long").as("__n"))
      .filter(col("__n") =!= 0L))
  }

  test("the signed feed is EXACT across CoW delete, update, and " +
    "merge: snapshot(cursor) + feed = snapshot(head) as multisets, " +
    "from every cursor") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppendStats(spark, (0L until 40L).map(k => (k, k))
      .toDF("k", "v"), "t", "k") // v1
    wh.casAppendStats(spark, (40L until 80L).map(k => (k, k))
      .toDF("k", "v"), "t", "k") // v2
    wh.casDeleteWhere(spark, "t", "k", Seq(3L, 45L)) // v3 CoW delete
    wh.casUpdateWhere(spark, "t", "k", Seq(7L),
      Map("v" -> lit(700L))) // v4 CoW update
    wh.casMergeInto(spark, "t", "k",
      Seq((8L, 800L), (100L, 100L)).toDF("k", "v")) // v5 merge
    val full = bag(wh.casRead(spark, "t"))
    (0 to 4).foreach { c =>
      assert(applied(wh, "t", c) == full, s"cursor $c")
    }
    // and the feed is empty from head
    val (atHead, _) = wh.casChangesSinceCdf(spark, "t", 5)
    assert(atHead.get.count() == 0L)
  }

  test("a DELETE window carries exactly the deleted rows as -1; an " +
    "UPDATE window carries -old +new; a pure layout change " +
    "(OPTIMIZE) diffs to ZERO rows — invisible to the feed") {
    import spark.implicits._
    val wh = tmpWh()
    (0 until 4).foreach { w =>
      wh.casAppendStats(spark, (w * 10L until w * 10L + 10L)
        .map(k => (k, k)).toDF("k", "v"), "d", "k")
    }
    val h0 = wh.casHead("d") // 4
    wh.casDeleteWhere(spark, "d", "k", Seq(15L, 17L))
    val (del, h1) = wh.casChangesSinceCdf(spark, "d", h0)
    assert(rows(del.get) == Set(Seq(15L, 15L, -1), Seq(17L, 17L, -1)))
    wh.casUpdateWhere(spark, "d", "k", Seq(22L),
      Map("v" -> lit(2200L)))
    val (upd, h2) = wh.casChangesSinceCdf(spark, "d", h1)
    assert(rows(upd.get) ==
      Set(Seq(22L, 22L, -1), Seq(22L, 2200L, 1)))
    wh.casOptimize(spark, "d", maxWaves = 1)
    val (opt, _) = wh.casChangesSinceCdf(spark, "d", h2)
    assert(opt.get.count() == 0L,
      "compaction is a layout change — zero CDF rows, downstream " +
        "rollups ride through OPTIMIZE untouched")
  }

  test("the read PLAN names only the waves that entered or left the " +
    "active set: a CoW delete hitting 1 of 4 extents plans 1 " +
    "removed wave + its rewritten remainder — retained waves appear " +
    "in NEITHER side (the wave-grain cost pin)") {
    import spark.implicits._
    val wh = tmpWh()
    (0 until 4).foreach { w =>
      wh.casAppendStats(spark, (w * 100L until w * 100L + 100L)
        .map(k => (k, k)).toDF("k", "v"), "p", "k")
    }
    // the wave the delete will hit (keys 100..199 = wave 2)
    val hitPath = wh.casPrunedCommits("p", 150L, 150L)._1
    assert(hitPath.size == 1)
    wh.casDeleteWhere(spark, "p", "k", Seq(150L, 160L))
    val (plan, head) = wh.casCdfPlan("p", 4)
    val steps = plan.get
    assert(head == 5 && steps.size == 1)
    val st = steps.head
    assert(st.removed.map(_.split(" ").last) == hitPath,
      "exactly the extent-hit wave leaves the active set")
    assert(st.added.size == 1, "its rewritten remainder enters")
    // appends plan with empty removed
    wh.casAppendStats(spark, Seq((900L, 900L)).toDF("k", "v"),
      "p", "k")
    val (plan2, _) = wh.casCdfPlan("p", 5)
    assert(plan2.get.size == 1 && plan2.get.head.removed.isEmpty &&
      plan2.get.head.added.size == 1)
  }

  test("a NEW MoR tombstone RETRACTS exactly the rows it hides " +
    "(forget-set-grain read of the pre-commit snapshot); truly " +
    "non-diffable windows — RESTORE, evolution meeting a rewrite — " +
    "signal refresh (None); pre-window tombstones ride fine") {
    import spark.implicits._
    val a = tmpWh()
    a.casAppendStats(spark, (0L until 10L).map(k => (k, k))
      .toDF("k", "v"), "m", "k")
    a.casDeleteMoR(spark, "m", "k", Seq(5L).toDF("k"))
    val (morFeed, _) = a.casChangesSinceCdf(spark, "m", 1)
    assert(rows(morFeed.get) == Set(Seq(5L, 5L, -1)),
      "the tombstone's hidden rows come back as -1 retractions")
    // and the universal property holds across the tombstone window
    assert(applied(a, "m", 1) == bag(a.casRead(spark, "m")))
    // but a tombstone BEFORE the window applies to its appends
    a.casAppendStats(spark, Seq((5L, 5L), (20L, 20L)).toDF("k", "v"),
      "m", "k")
    val (post, _) = a.casChangesSinceCdf(spark, "m", 2)
    assert(rows(post.get) == Set(Seq(20L, 20L, 1)),
      "the re-used tombstoned key is invisible at head and the feed " +
        "agrees")
    val b = tmpWh()
    b.casAppendStats(spark, (0L until 10L).map(k => (k, k))
      .toDF("k", "v"), "r", "k")
    b.casAppendStats(spark, (10L until 20L).map(k => (k, k))
      .toDF("k", "v"), "r", "k")
    b.casRestore(spark, "r", 1)
    assert(b.casChangesSinceCdf(spark, "r", 2)._1.isEmpty,
      "a restore resurrects history no wave diff accounts for")
    val c = tmpWh()
    c.casAppendStats(spark, (0L until 10L).map(k => (k, k))
      .toDF("k", "v"), "e", "k")
    c.casAppendEvolved((10L until 20L).map(k => (k, k))
      .toDF("k", "v").withColumn("extra", lit(7L)), "e")
    c.casDeleteWhere(spark, "e", "k", Seq(3L))
    assert(c.casChangesSinceCdf(spark, "e", 1)._1.isEmpty,
      "evolution meeting a rewrite would misalign the diff sides")
  }

  test("maintainMinMax: algebraic under appends and inner " +
    "retractions (NO rescan), group-targeted rescan ONLY when a " +
    "retraction touches the extremum, emptied groups deleted, MoR " +
    "refresh — rollup equal to the full GROUP BY after every run") {
    import spark.implicits._
    import graft.ops.CasIvm
    val wh = tmpWh()
    def fullAgg(): Set[Seq[Any]] = rows(wh.casRead(spark, "s")
      .groupBy(col("g")).agg(min(col("v").cast("long")).as("min_v"),
        max(col("v").cast("long")).as("max_v"),
        count(lit(1)).as("n_rows")))
    def roll(): Set[Seq[Any]] = rows(wh.casRead(spark, "sx"))
    var scans = Seq.empty[Seq[Any]]
    def maintain(): String = CasIvm.maintainMinMax(spark, wh,
      "s", "sx", "g", "v", onRescan = ks => { scans :+= ks; () })

    wh.casAppendStats(spark, (0L until 30L).map(k => (k, k % 3, k))
      .toDF("k", "g", "v"), "s", "k")
    assert(maintain() == "bootstrap")
    assert(roll() == fullAgg() && scans == Seq(Seq()))
    // appends only extend extrema — algebraic
    scans = Nil
    wh.casAppendStats(spark, (30L until 50L).map(k => (k, k % 3, k))
      .toDF("k", "g", "v"), "s", "k")
    assert(maintain() == "incremental")
    assert(roll() == fullAgg() && scans == Seq(Seq()),
      "append windows never rescan")
    // a retraction strictly INSIDE (min, max): algebraic too
    scans = Nil
    wh.casDeleteWhere(spark, "s", "k", Seq(31L)) // g=1, v=31 inner
    assert(maintain() == "incremental")
    assert(roll() == fullAgg() && scans == Seq(Seq()),
      "inner retractions never move an extremum")
    // a retraction AT a group's minimum: rescan exactly that group
    scans = Nil
    wh.casDeleteWhere(spark, "s", "k", Seq(0L)) // g=0's min (v=0)
    assert(maintain() == "incremental")
    assert(roll() == fullAgg() && scans == Seq(Seq(0L)),
      "extremum-touched groups rescan — and ONLY they do")
    // empty a whole group: it vanishes from the rollup
    scans = Nil
    val g2 = wh.casRead(spark, "s").filter(col("g") === 2L)
      .select("k").as[Long].collect().toSeq
    wh.casDeleteWhere(spark, "s", "k", g2)
    assert(maintain() == "incremental")
    assert(roll() == fullAgg() && !roll().exists(_.head == 2L))
    assert(scans == Seq(Seq(2L)))
    // a MoR tombstone rides the same signed path — and its inner
    // retraction (v=4 sits strictly inside group 1's extrema) does
    // not rescan either
    scans = Nil
    wh.casDeleteMoR(spark, "s", "k", Seq(4L).toDF("k"))
    assert(maintain() == "incremental")
    assert(roll() == fullAgg() && scans == Seq(Seq()))
    assert(maintain() == "noop")
    // the one remaining degradation: RESTORE
    wh.casRestore(spark, "s", wh.casHead("s") - 1)
    assert(maintain() == "refresh")
    assert(roll() == fullAgg())
  }

  test("maintainJoin reads the big side EXTENT-PRUNED at the " +
    "delta's key range: with a non-hit wave physically gone from " +
    "disk, the maintenance still succeeds (an unpruned read would " +
    "fail loudly) and the consult keeps 1 of 4 waves") {
    import spark.implicits._
    import graft.ops.CasIvm
    val wh = tmpWh()
    // A: one starter wave; B: four range-disjoint waves
    wh.casAppendStats(spark, (0L until 10L).map(k => (k, k * 10L))
      .toDF("k", "va"), "pa", "k")
    (0 until 4).foreach { w =>
      wh.casAppendStats(spark, (w * 100L until w * 100L + 100L)
        .map(k => (k, k * 100L)).toDF("k", "vb"), "pb", "k")
    }
    assert(CasIvm.maintainJoin(
      spark, wh, "pa", "pb", "pmv", "k") == "bootstrap")
    val expected = rows(wh.casRead(spark, "pmv"))
    assert(expected.size == 10)
    // poison wave 4 of B (keys 300..399): delete its directory
    val w4 = wh.casPrunedCommitsAt("pb", 350L, 350L,
      wh.casHead("pb"))._1
    assert(w4.size == 1)
    def rm(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    rm(java.nio.file.Paths.get(w4.head))
    // ΔA lands entirely inside B's FIRST extent: the pruned big-side
    // read opens 1 of 4 waves and never lists the poisoned one
    assert(wh.casPrunedCommitsAt("pb", 20L, 29L,
      wh.casHead("pb"))._1.size == 1)
    wh.casAppendStats(spark, (20L until 30L).map(k => (k, k * 10L))
      .toDF("k", "va"), "pa", "k")
    assert(CasIvm.maintainJoin(
      spark, wh, "pa", "pb", "pmv", "k") == "incremental")
    assert(rows(wh.casRead(spark, "pmv")) == expected ++
      (20L until 30L).map(k => Seq(k, k * 10L, k * 100L)).toSet,
      "the delta-join absorbed exactly the new pairs without " +
        "touching the non-hit waves")
  }

  test("a CHECKPOINT inside a CDF window is content-neutral and " +
    "skipped; a truncated window fails LOUDLY; and OPTIMIZE between " +
    "maintenances yields a NOOP maintenance (not a refresh) — " +
    "rollups ride through layout maintenance untouched") {
    import spark.implicits._
    import graft.ops.CasIvm
    val wh = tmpWh()
    wh.casAppendStats(spark, (0L until 10L).map(k => (k, k % 3, k))
      .toDF("k", "g", "v"), "o", "k") // v1
    wh.casCheckpoint("o") // v2 — restates, must not re-emit
    wh.casAppendStats(spark, (10L until 20L).map(k => (k, k % 3, k))
      .toDF("k", "g", "v"), "o", "k") // v3
    val (chg, h) = wh.casChangesSinceCdf(spark, "o", 1)
    assert(h == 3 && chg.get.count() == 10L,
      "the checkpoint's restated lines must not double-count")
    def fullAgg(): Set[Seq[Any]] = rows(wh.casRead(spark, "o")
      .groupBy(col("g")).agg(sum("v").cast("long").as("sum_v"),
        count(lit(1)).as("n_rows")))
    def maintain(): String = CasIvm.maintainSumCount(
      spark, wh, "o", "oroll", "g", "v")
    assert(maintain() == "bootstrap")
    wh.casOptimize(spark, "o", maxWaves = 1)
    assert(maintain() == "noop",
      "a pure layout change diffs to zero rows — the cursor " +
        "advances with a metadata commit, no recompute, no refresh")
    assert(rows(wh.casRead(spark, "oroll")) == fullAgg())
    wh.casAppendStats(spark, (20L until 30L).map(k => (k, k % 3, k))
      .toDF("k", "g", "v"), "o", "k")
    assert(maintain() == "incremental")
    assert(rows(wh.casRead(spark, "oroll")) == fullAgg())
    // retention retires the window: the feed fails loudly, never
    // serves a silent subset
    wh.casReplace(spark, "o")(cur => cur)
    wh.casTruncate("o")
    intercept[RuntimeException] { wh.casCdfPlan("o", 1) }
  }

  test("the IVM DAG composes with no special code: a rollup " +
    "maintained OVER a join MV consumes the MV's own feed — base " +
    "UPDATEs and CoW DELETEs propagate the full depth " +
    "incrementally, and even an upstream REFRESH reaches the " +
    "downstream as an ordinary (diffable) rewrite") {
    import spark.implicits._
    import graft.ops.CasIvm
    val wh = tmpWh()
    def joinM(): String =
      CasIvm.maintainJoin(spark, wh, "da", "db", "dmv", "k")
    def rollM(): String =
      CasIvm.maintainSumCount(spark, wh, "dmv", "droll", "lb", "va")
    def expected(): Set[Seq[Any]] = rows(
      wh.casRead(spark, "da").join(wh.casRead(spark, "db"), Seq("k"))
        .groupBy(col("lb")).agg(sum("va").cast("long").as("sum_v"),
          count(lit(1)).as("n_rows")))
    def roll(): Set[Seq[Any]] = rows(wh.casRead(spark, "droll"))

    wh.casAppendStats(spark, (0L until 30L).map(k => (k, k * 10L))
      .toDF("k", "va"), "da", "k")
    wh.casAppendStats(spark, (0L until 30L by 2)
      .map(k => (k, k % 3)).toDF("k", "lb"), "db", "k")
    assert(joinM() == "bootstrap" && rollM() == "bootstrap")
    assert(roll() == expected())
    // a base UPDATE rides -old +new through BOTH stages
    wh.casUpdateWhere(spark, "da", "k", Seq(4L),
      Map("va" -> lit(4000L)))
    assert(joinM() == "incremental" && rollM() == "incremental")
    assert(roll() == expected())
    // a base CoW delete: op-D out of the MV, subtraction in the roll
    wh.casDeleteWhere(spark, "da", "k", Seq(6L, 8L))
    assert(joinM() == "incremental" && rollM() == "incremental")
    assert(roll() == expected())
    // a MoR tombstone propagates incrementally too (r18)
    wh.casDeleteMoR(spark, "da", "k", Seq(10L).toDF("k"))
    assert(joinM() == "incremental" && rollM() == "incremental")
    assert(roll() == expected())
    // a RESTORE refreshes the JOIN stage — but the refresh is an
    // ordinary REPLACE commit on the MV, so the DOWNSTREAM stage
    // diffs it and stays incremental: refresh does not cascade
    wh.casRestore(spark, "da", wh.casHead("da") - 1)
    assert(joinM() == "refresh")
    assert(rollM() == "incremental",
      "an upstream refresh reaches the consumer as a diffable " +
        "rewrite — the degradation never cascades down the DAG")
    assert(roll() == expected())
  }

  test("two-maintainer race on maintainJoin serializes on the " +
    "fence — exactly-once pair absorption, MV exact after each " +
    "round") {
    import spark.implicits._
    import graft.ops.CasIvm
    val wh = tmpWh()
    def fullJoin(): Set[Seq[Any]] = rows(wh.casRead(spark, "ra")
      .join(wh.casRead(spark, "rb"), Seq("k")))
    (0 until 4).foreach { r =>
      wh.casAppendStats(spark, (r * 10L until r * 10L + 10L)
        .map(k => (k, k * 10L)).toDF("k", "va"), "ra", "k")
      wh.casAppendStats(spark, (r * 10L until r * 10L + 10L)
        .filter(_ % 2 == 0).map(k => (k, k * 100L)).toDF("k", "vb"),
        "rb", "k")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val fs = (0 until 2).map(_ => pool.submit(
          new java.util.concurrent.Callable[String] {
            def call(): String = CasIvm.maintainJoin(
              spark, wh, "ra", "rb", "rmv", "k")
          }))
        fs.foreach(_.get())
      } finally pool.shutdown()
      assert(rows(wh.casRead(spark, "rmv")) == fullJoin(), s"round $r")
    }
  }

  test("LIVE traffic: a direct writer (appends and CoW deletes) " +
    "races two maintainers for 12 rounds — nothing is lost, " +
    "double-counted, or absorbed into the wrong window; the rollup " +
    "equals the GROUP BY at every quiescent point") {
    import spark.implicits._
    import graft.ops.CasIvm
    val wh = tmpWh()
    def fullAgg(): Set[Seq[Any]] = rows(wh.casRead(spark, "ls")
      .groupBy(col("g")).agg(sum("v").cast("long").as("sum_v"),
        count(lit(1)).as("n_rows")))
    wh.casAppendStats(spark, (0L until 20L).map(k => (k, k % 3, k))
      .toDF("k", "g", "v"), "ls", "k")
    CasIvm.maintainSumCount(spark, wh, "ls", "lroll", "g", "v")
    (1 to 12).foreach { r =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      try {
        val writer = pool.submit(new Runnable { def run(): Unit = {
          if (r % 3 == 0)
            // the CoW delete mid-maintenance: the CDF window a
            // racing maintainer consults may or may not contain it —
            // the fence forces the loser to re-derive either way
            wh.casDeleteWhere(spark, "ls", "k",
              Seq(r * 20L - 5L, r * 20L - 7L))
          else {
            wh.casAppendStats(spark,
              (r * 20L until r * 20L + 20L).map(k => (k, k % 3, k))
                .toDF("k", "g", "v"), "ls", "k")
            ()
          }
        }})
        val ms = (0 until 2).map(_ => pool.submit(
          new java.util.concurrent.Callable[String] {
            def call(): String = CasIvm.maintainSumCount(
              spark, wh, "ls", "lroll", "g", "v")
          }))
        writer.get(); ms.foreach(_.get())
      } finally pool.shutdown()
      // quiescence: one more maintenance absorbs whatever landed
      // after the racers' windows, then the rollup must be EXACT
      CasIvm.maintainSumCount(spark, wh, "ls", "lroll", "g", "v")
      assert(rows(wh.casRead(spark, "lroll")) == fullAgg(),
        s"round $r: drift under live traffic")
    }
    assert(wh.casStreamCursor("lroll", "ivm:ls") ==
      wh.casHead("ls").toLong)
  }

  test("two-maintainer race on maintainMinMax serializes on the " +
    "fence — exactly-once absorption, rollup exact after each round") {
    import spark.implicits._
    import graft.ops.CasIvm
    val wh = tmpWh()
    def fullAgg(): Set[Seq[Any]] = rows(wh.casRead(spark, "cs")
      .groupBy(col("g")).agg(min(col("v").cast("long")).as("min_v"),
        max(col("v").cast("long")).as("max_v"),
        count(lit(1)).as("n_rows")))
    (0 until 4).foreach { r =>
      wh.casAppendStats(spark,
        (r * 10L until r * 10L + 10L).map(k => (k, k % 3, k))
          .toDF("k", "g", "v"), "cs", "k")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val fs = (0 until 2).map(_ => pool.submit(
          new java.util.concurrent.Callable[String] {
            def call(): String = CasIvm.maintainMinMax(
              spark, wh, "cs", "csx", "g", "v")
          }))
        fs.foreach(_.get())
      } finally pool.shutdown()
      assert(rows(wh.casRead(spark, "csx")) == fullAgg(), s"round $r")
    }
  }
}
