package graft

import org.apache.spark.sql.functions._
import graft.sources.Warehouse

/** Row-level deletes on the CAS table format (round 16): the
  * copy-on-write `casDeleteWhere` (commit-grain file skipping — the
  * GDPR physical-removal pass), the merge-on-read `casDeleteMoR`
  * (equality-delete tombstones), `casCompactDeletes` (fold tombstones
  * into a plain REPLACE → the erasure point with truncate+vacuum),
  * and `casAppendEvolved` (add-column schema evolution with
  * footer-merging reads). Every pin drives the REAL log files — the
  * assertions read commit lines and staging directories straight off
  * the filesystem, not through the API being tested.
  */
class RowDeleteSpec extends SparkSpec {

  private def tmpWh(): Warehouse = Warehouse(
    java.nio.file.Files.createTempDirectory("rd-wh-").toString)

  private def commitLines(wh: Warehouse, table: String,
      n: Int): Seq[String] = {
    val f = new java.io.File(
      new java.io.File(wh.root, table + "__log"), f"$n%09d.commit")
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(f.toPath)).asScala.toSeq
      .filterNot(_.startsWith("TS ")) // payload view: drop the clock line
  }

  private def dataDirs(wh: Warehouse, table: String): Set[String] =
    Option(new java.io.File(wh.root, table + "__data").listFiles())
      .getOrElse(Array()).filter(_.isDirectory).map(_.getName).toSet

  // four stats-carrying waves with disjoint key ranges
  private def fourWaves(wh: Warehouse, table: String): Unit = {
    import spark.implicits._
    (0 to 3).foreach { w =>
      val lo = w * 25L
      wh.casAppendStats(spark,
        (lo until lo + 25L).toDF("k").withColumn("v", col("k") * 10L),
        table, "k")
    }
  }

  // ---- casDeleteWhere: copy-on-write with commit-grain skipping ----

  test("casDeleteWhere rewrites ONLY the commits whose extent can " +
    "hold a forget key — the others are retained by reference " +
    "(same directory, stats intact) and keep pruning range reads") {
    import spark.implicits._
    val wh = tmpWh()
    fourWaves(wh, "gd")
    val before = dataDirs(wh, "gd")
    val st = wh.casDeleteWhere(spark, "gd", "k", Seq(30L, 60L))
    assert(st.rewrittenCommits == 2 && st.retainedCommits == 2,
      s"waves 1 and 2 hold the keys, 0 and 3 are disjoint: $st")
    assert(st.deletedRows == 2L && st.version == 5)
    // exactly one new staging dir (the rewrite) — retained dirs were
    // never copied
    val after = dataDirs(wh, "gd")
    assert((after -- before).size == 1 && (before -- after).isEmpty,
      s"one rewrite dir, nothing else touched: $before -> $after")
    // the delete commit: one stats-carrying REPLACES + the two
    // retained ADDS lines VERBATIM (stats ride so pruning survives)
    val lines = commitLines(wh, "gd", 5)
    assert(lines.count(_.startsWith("REPLACES ")) == 1)
    val retained = lines.filter(_.startsWith("ADDS "))
    assert(retained.size == 2 &&
      retained.exists(_.startsWith("ADDS 0 24 ")) &&
      retained.exists(_.startsWith("ADDS 75 99 ")), lines.toString)
    // contents: everything but the two forget keys
    assert(wh.casRead(spark, "gd").agg(count(lit(1)), sum("k")).as[(Long,
      Long)].head() == (98L, (0L until 100L).sum - 90L))
    // range read into a retained wave still skips: only the retained
    // commit (and nothing conservative) serves [80, 90]
    val (kept, total) = wh.casPrunedCommits("gd", 80L, 90L)
    assert(total == 3, s"3 data lines active after the delete: $total")
    assert(kept.size == 1, s"only wave 3's retained line overlaps: $kept")
    assert(wh.casReadPruned(spark, "gd", "k", 80L, 90L)
      .agg(count(lit(1))).as[Long].head() == 11L)
  }

  test("casDeleteWhere is a NO-OP (no commit published) when every " +
    "active extent is provably disjoint from the forget-set") {
    val wh = tmpWh()
    fourWaves(wh, "gn")
    val st = wh.casDeleteWhere(spark, "gn", "k", Seq(1000L, -5L))
    assert(st == graft.sources.CasDeleteStats(4, 0, 4, 0L), st.toString)
    assert(wh.casHead("gn") == 4, "nothing committed")
  }

  test("casDeleteWhere on stat-less commits degrades honestly to a " +
    "full rewrite — no stats, no skipping, correct result") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppend((0L until 50L).toDF("k"), "gp")
    wh.casAppend((50L until 100L).toDF("k"), "gp")
    val st = wh.casDeleteWhere(spark, "gp", "k", Seq(7L, 77L))
    assert(st.rewrittenCommits == 2 && st.retainedCommits == 0)
    assert(st.deletedRows == 2L)
    assert(wh.casRead(spark, "gp").agg(sum("k")).as[Long].head() ==
      (0L until 100L).sum - 84L)
  }

  test("casDeleteWhere OCC: a concurrent append landing in the CAS " +
    "seam forces a recompute against the new head — the late wave's " +
    "matching rows are deleted too, no lost update either way") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppendStats(spark, (0L until 10L).toDF("k"), "go", "k")
    var fired = false
    val st = wh.casDeleteWhere(spark, "go", "k", Seq(5L, 15L),
      beforeCommit = () => if (!fired) {
        fired = true
        wh.casAppendStats(spark, (10L until 20L).toDF("k"), "go", "k")
        ()
      })
    // retry saw both waves; both hold a forget key
    assert(st.rewrittenCommits == 2 && st.deletedRows == 2L, st.toString)
    assert(wh.casRead(spark, "go").as[Long].collect().toSet ==
      (0L until 20L).toSet -- Set(5L, 15L))
  }

  test("casDeleteWhere handles an all-rows-deleted rewrite: the " +
    "staged remainder is empty, the snapshot is exactly the " +
    "retained waves") {
    import spark.implicits._
    val wh = tmpWh()
    fourWaves(wh, "ge")
    // forget wave 2 wholesale
    val st = wh.casDeleteWhere(spark, "ge", "k", (50L until 75L).toSeq)
    assert(st.rewrittenCommits == 1 && st.retainedCommits == 3 &&
      st.deletedRows == 25L, st.toString)
    assert(wh.casRead(spark, "ge").agg(count(lit(1)), sum("k"))
      .as[(Long, Long)].head() ==
      (75L, (0L until 100L).sum - (50L until 75L).sum))
  }

  test("casDeleteWhereKeys (DataFrame forget-set) classifies and " +
    "deletes identically to the Seq form — the bulk-erasure path " +
    "with no isin literal, keys distributed end to end") {
    import spark.implicits._
    val wh = tmpWh()
    fourWaves(wh, "gk")
    val st = wh.casDeleteWhereKeys(spark, "gk", "k",
      Seq(30L, 60L).toDF("k"))
    assert(st.rewrittenCommits == 2 && st.retainedCommits == 2 &&
      st.deletedRows == 2L && st.version == 5, st.toString)
    assert(wh.casRead(spark, "gk").agg(count(lit(1)), sum("k"))
      .as[(Long, Long)].head() == (98L, (0L until 100L).sum - 90L))
    // retained stats lines ride verbatim, as in the Seq form
    val lines = commitLines(wh, "gk", 5)
    assert(lines.exists(_.startsWith("ADDS 0 24 ")) &&
      lines.exists(_.startsWith("ADDS 75 99 ")), lines.toString)
    // a 100k-key forget-set (far past isin plan limits) still
    // classifies at extent grain and deletes exactly its hits
    val wide = spark.range(10000L, 110000L).toDF("k")
    val st2 = wh.casDeleteWhereKeys(spark, "gk", "k", wide)
    assert(st2 == graft.sources.CasDeleteStats(5, 0, 3, 0L),
      s"disjoint bulk set is a no-op: $st2")
    val st3 = wh.casDeleteWhereKeys(spark, "gk", "k",
      spark.range(80L, 110000L).toDF("k"))
    assert(st3.rewrittenCommits == 1 && st3.deletedRows == 20L,
      st3.toString)
    assert(wh.casRead(spark, "gk").agg(count(lit(1)))
      .as[Long].head() == 78L)
  }

  // ---- casDeleteRange: time-based retention ------------------------

  test("casDeleteRange drops fully-inside waves WITHOUT reading them " +
    "(no new directory), rewrites only the boundary straddler, and " +
    "retains the rest — the partition-drop retention fast path") {
    import spark.implicits._
    val wh = tmpWh()
    fourWaves(wh, "rr") // extents [0,24] [25,49] [50,74] [75,99]
    val before = dataDirs(wh, "rr")
    // retention cut at 37: wave 0 drops whole, wave 1 straddles,
    // waves 2-3 survive untouched
    val st = wh.casDeleteRange(spark, "rr", "k", 0L, 37L)
    assert(st == graft.sources.CasRangeDeleteStats(5, 1, 1, 2, 38L),
      st.toString)
    // exactly one new dir: the boundary rewrite — the dropped wave
    // was never read, never copied
    assert((dataDirs(wh, "rr") -- before).size == 1)
    val lines = commitLines(wh, "rr", 5)
    assert(lines.count(_.startsWith("REPLACES 38 49 ")) == 1,
      lines.toString)
    assert(lines.exists(_.startsWith("ADDS 50 74 ")) &&
      lines.exists(_.startsWith("ADDS 75 99 ")), lines.toString)
    assert(wh.casRead(spark, "rr").agg(count(lit(1)), sum("k"))
      .as[(Long, Long)].head() == (62L, (38L until 100L).sum))
    // no-op when the range misses every extent
    assert(wh.casDeleteRange(spark, "rr", "k", 200L, 300L) ==
      graft.sources.CasRangeDeleteStats(5, 0, 0, 3, 0L))
  }

  test("casDeleteRange with nothing to rewrite (every affected wave " +
    "dropped whole) publishes a CKPT-marker stop commit — no rewrite " +
    "directory is fabricated, retained lines ride verbatim") {
    import spark.implicits._
    val wh = tmpWh()
    fourWaves(wh, "rw")
    val before = dataDirs(wh, "rw")
    val st = wh.casDeleteRange(spark, "rw", "k", 0L, 49L)
    assert(st == graft.sources.CasRangeDeleteStats(5, 2, 0, 2, 50L),
      st.toString)
    assert(dataDirs(wh, "rw") == before, "no new directory")
    val lines = commitLines(wh, "rw", 5)
    assert(lines.head == "CKPT" && lines.count(_.startsWith("ADDS ")) == 2,
      lines.toString)
    assert(wh.casRead(spark, "rw").agg(count(lit(1)), sum("k"))
      .as[(Long, Long)].head() == (50L, (50L until 100L).sum))
    // truncate + vacuum reclaim the two dropped wave dirs
    wh.casTruncate("rw")
    assert(wh.casVacuum("rw", minAgeMs = 0L).size == 2)
    assert(wh.casRead(spark, "rw").agg(count(lit(1)))
      .as[Long].head() == 50L)
  }

  test("casDeleteRange keeps MoR tombstones riding and stat-less " +
    "waves rewrite conservatively") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppend((0L until 50L).toDF("k"), "rs") // stat-less
    wh.casAppendStats(spark, (50L until 100L).toDF("k"), "rs", "k")
    wh.casDeleteMoR(spark, "rs", "k", Seq(70L).toDF("k"))
    val st = wh.casDeleteRange(spark, "rs", "k", 0L, 9L)
    // stat-less wave is a boundary rewrite; the stats wave is
    // disjoint and retained
    assert(st == graft.sources.CasRangeDeleteStats(4, 0, 1, 1, 10L),
      st.toString)
    assert(commitLines(wh, "rs", 4).exists(_.startsWith("DEL k ")))
    assert(wh.casRead(spark, "rs").agg(count(lit(1)), sum("k"))
      .as[(Long, Long)].head() ==
      (89L, (10L until 100L).sum - 70L))
  }

  // ---- casDeleteMoR: merge-on-read tombstones ----------------------

  test("casDeleteMoR hides rows from every reader from its version " +
    "on — snapshot read, pruned range read, catalog read — while " +
    "time travel BELOW the delete still shows them") {
    import spark.implicits._
    val wh = tmpWh()
    fourWaves(wh, "mo")
    wh.catCommit(Seq("mo" -> 4))
    val v = wh.casDeleteMoR(spark, "mo", "k", Seq(30L, 60L).toDF("k"))
    assert(v == 5)
    assert(wh.casRead(spark, "mo").agg(count(lit(1)), sum("k"))
      .as[(Long, Long)].head() == (98L, (0L until 100L).sum - 90L))
    // pruned range read must not resurrect a tombstoned row
    assert(wh.casReadPruned(spark, "mo", "k", 25L, 49L)
      .as[(Long, Long)].collect().map(_._1).toSet ==
      (25L until 50L).toSet - 30L)
    // the delete is a versioned fact: v4 still has the rows...
    assert(wh.casReadAt(spark, "mo", 4).agg(count(lit(1)))
      .as[Long].head() == 100L)
    // ...and so does the catalog pin taken before it
    assert(wh.catRead(spark, "mo").agg(count(lit(1)))
      .as[Long].head() == 100L)
    wh.catCommit(Seq("mo" -> 5))
    assert(wh.catRead(spark, "mo").agg(count(lit(1)))
      .as[Long].head() == 98L)
  }

  test("casVacuum keeps an active tombstone alive (it is referenced " +
    "by its DEL line); casCompactDeletes + casTruncate + casVacuum " +
    "is the physical-erasure point where it is reclaimed") {
    import spark.implicits._
    val wh = tmpWh()
    fourWaves(wh, "mv")
    val before = dataDirs(wh, "mv")
    wh.casDeleteMoR(spark, "mv", "k", Seq(30L).toDF("k"))
    val tombDir = (dataDirs(wh, "mv") -- before).head
    // pre-compaction: a zero-grace vacuum reclaims NOTHING — waves
    // and tombstone are all referenced
    assert(wh.casVacuum("mv", minAgeMs = 0L).isEmpty)
    assert(dataDirs(wh, "mv").contains(tombDir))
    // compaction folds the tombstone into a plain REPLACE
    val cv = wh.casCompactDeletes(spark, "mv")
    assert(cv == 6 &&
      commitLines(wh, "mv", 6).forall(_.startsWith("REPLACE ")))
    assert(wh.casRead(spark, "mv").agg(count(lit(1)))
      .as[Long].head() == 99L)
    // retention + GC: old waves AND the tombstone become collectable
    wh.casTruncate("mv")
    val swept = wh.casVacuum("mv", minAgeMs = 0L)
    assert(swept.exists(_.endsWith(tombDir)),
      s"tombstone must be physically erased: $swept")
    assert(dataDirs(wh, "mv").size == 1, "only the compacted state")
    assert(wh.casRead(spark, "mv").agg(count(lit(1)))
      .as[Long].head() == 99L)
  }

  test("casCompactDeletes is a no-op (no commit) when no tombstone " +
    "is active") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppend(Seq(1L, 2L).toDF("k"), "mn")
    assert(wh.casCompactDeletes(spark, "mn") == 1)
    assert(wh.casHead("mn") == 1)
  }

  test("an active tombstone keeps applying through a later " +
    "casDeleteWhere: the DEL line rides the delete commit verbatim") {
    import spark.implicits._
    val wh = tmpWh()
    fourWaves(wh, "mx")
    wh.casDeleteMoR(spark, "mx", "k", Seq(10L).toDF("k"))
    val st = wh.casDeleteWhere(spark, "mx", "k", Seq(60L))
    assert(st.rewrittenCommits == 1, st.toString)
    assert(commitLines(wh, "mx", st.version).exists(_.startsWith("DEL k ")))
    assert(wh.casRead(spark, "mx").agg(count(lit(1)), sum("k"))
      .as[(Long, Long)].head() == (98L, (0L until 100L).sum - 70L))
  }

  // ---- optOutSink: streaming opt-out propagation --------------------

  test("optOutSink crash AFTER the tombstone commit, REAL restart " +
    "from the streaming checkpoint: the replayed batch publishes a " +
    "second (redundant) DEL commit and the snapshot is unchanged — " +
    "delete idempotence needs no ADDB-style dedup ledger") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wh = tmpWh()
    fourWaves(wh, "so")
    val ckpt = java.nio.file.Files
      .createTempDirectory("rd-ckpt-").toString
    val input = MemoryStream[Long]
    input.addData(30L, 60L)
    val crashed = graft.streaming.StreamingEtl.optOutSink(
      input.toDF().toDF("k"), wh, "so", "k", ckpt,
      afterDelete = () => sys.error("injected crash after commit"))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      crashed.awaitTermination()
    }
    assert(wh.casHead("so") == 5, "crash shape: the tombstone landed")
    // restart re-delivers the uncommitted batch; a second DEL commit
    // is fine — duplicate keys are idempotent under the anti-join
    graft.streaming.StreamingEtl.optOutSink(
      input.toDF().toDF("k"), wh, "so", "k", ckpt).awaitTermination()
    assert(wh.casHead("so") == 6, "replayed batch commits redundantly")
    assert((5 to 6).forall(n =>
      commitLines(wh, "so", n).forall(_.startsWith("DEL k "))))
    assert(wh.casRead(spark, "so").agg(count(lit(1)), sum("k"))
      .as[(Long, Long)].head() == (98L, (0L until 100L).sum - 90L))
    // a later batch through the same checkpoint applies new keys
    input.addData(10L)
    graft.streaming.StreamingEtl.optOutSink(
      input.toDF().toDF("k"), wh, "so", "k", ckpt).awaitTermination()
    assert(wh.casRead(spark, "so").agg(count(lit(1)), sum("k"))
      .as[(Long, Long)].head() == (97L, (0L until 100L).sum - 100L))
    // compaction still folds everything
    wh.casCompactDeletes(spark, "so")
    assert(wh.casRead(spark, "so").agg(count(lit(1)))
      .as[Long].head() == 97L)
  }

  // ---- mixed churn under real threads --------------------------------

  test("8 REAL threads of mixed churn — appends, MoR deletes, " +
    "copy-on-write deletes, an optimize — serialize through the CAS " +
    "with no lost update: the final snapshot is exactly (all appended " +
    "keys) minus (all deleted keys), the log is contiguous, and a " +
    "zero-grace vacuum after truncation reclaims only unreferenced " +
    "waves") {
    import spark.implicits._
    val wh = tmpWh()
    // base: keys 0..799 in eight stats waves
    (0 to 7).foreach(w => wh.casAppendStats(spark,
      (w * 100L until w * 100L + 100L).toDF("k"), "mc", "k"))
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val threads = (0 to 7).map { i =>
      new Thread(() => {
        try {
          i % 4 match {
            case 0 => // appender: a fresh 10-key wave above the base
              wh.casAppendStats(spark,
                (1000L + i * 10L until 1000L + i * 10L + 10L).toDF("k"),
                "mc", "k", retries = 64)
              ()
            case 1 => // MoR delete: two keys from its own slice
              wh.casDeleteMoR(spark, "mc", "k",
                Seq(i * 100L + 1L, i * 100L + 2L).toDF("k"),
                retries = 64)
              ()
            case 2 => // copy-on-write delete: one key
              wh.casDeleteWhere(spark, "mc", "k", Seq(i * 100L + 3L),
                retries = 64)
              ()
            case 3 => // optimize under churn
              wh.casOptimize(spark, "mc", maxWaves = 4, retries = 64)
              ()
          }
        } catch { case t: Throwable => err.compareAndSet(null, t); () }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(err.get() == null, s"a writer died: ${err.get()}")
    // base 8 + the churn commits: the two optimize threads may
    // each legitimately no-op (a rival optimize already brought the
    // table within budget), so head is 14..16 — and the log must be
    // CONTIGUOUS (every version below head exists) whatever happened
    val head = wh.casHead("mc")
    assert(head >= 14 && head <= 16, s"head $head")
    val commitFiles = Option(new java.io.File(wh.root, "mc__log")
      .listFiles()).getOrElse(Array())
      .count(_.getName.endsWith(".commit"))
    assert(commitFiles == head, s"contiguous log: $commitFiles vs $head")
    val appended = (0L until 800L) ++
      Seq(0, 4).flatMap(i => 1000L + i * 10L until 1000L + i * 10L + 10L)
    val deleted = Seq(1, 5).flatMap(i =>
      Seq(i * 100L + 1L, i * 100L + 2L)) ++
      Seq(2, 6).map(i => i * 100L + 3L)
    assert(wh.casRead(spark, "mc").as[Long].collect().toSet ==
      appended.toSet -- deleted.toSet,
      "final snapshot = appends minus deletes, whatever the schedule")
    // retention + GC stay healthy after the churn
    wh.casTruncate("mc")
    wh.casVacuum("mc", minAgeMs = 0L)
    assert(wh.casRead(spark, "mc").as[Long].collect().toSet ==
      appended.toSet -- deleted.toSet)
  }

  // ---- casAppendEvolved: add-column schema evolution ---------------

  test("casAppendEvolved: the evolved wave's new column surfaces as " +
    "NULL on the old rows for every snapshot reader, and the " +
    "footer-merge flag drains when a REPLACE materializes a " +
    "uniform schema") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppend((0L until 10L).toDF("k"), "ev")
    wh.casAppendEvolved((10L until 20L).toDF("k")
      .withColumn("quality", col("k") * 2L), "ev")
    val snap = wh.casRead(spark, "ev")
    assert(snap.columns.toSet == Set("k", "quality"))
    val r = snap.agg(count(lit(1)), count(col("quality")),
      sum("quality")).as[(Long, Long, Long)].head()
    assert(r == (20L, 10L, (10L until 20L).map(_ * 2L).sum))
    // time travel below the evolution sees the old schema
    assert(wh.casReadAt(spark, "ev", 1).columns.toSet == Set("k"))
    // a materializing replace collapses the evolution: the head
    // commit is schema-uniform and reads stay correct
    wh.casReplace(spark, "ev")(cur => cur)
    assert(commitLines(wh, "ev", 3).forall(_.startsWith("REPLACE ")))
    assert(wh.casRead(spark, "ev").agg(count(lit(1)),
      count(col("quality"))).as[(Long, Long)].head() == (20L, 10L))
  }

  test("casDeleteWhere on an evolved snapshot publishes REPLACEE — " +
    "the footer-merge flag survives the rewrite and the evolved " +
    "column stays visible") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppendStats(spark, (0L until 10L).toDF("k")
      .withColumn("v", lit(1L)), "ew", "k")
    wh.casAppendEvolved((10L until 20L).toDF("k")
      .withColumn("v", lit(1L)).withColumn("quality", col("k")), "ew")
    // the ADDE wave is stat-less → affected; wave 1 is disjoint from
    // the forget key and retained with its old schema
    val st = wh.casDeleteWhere(spark, "ew", "k", Seq(15L))
    assert(st.rewrittenCommits == 1 && st.retainedCommits == 1)
    assert(commitLines(wh, "ew", st.version)
      .exists(_.startsWith("REPLACEE ")))
    val snap = wh.casRead(spark, "ew")
    assert(snap.columns.toSet == Set("k", "v", "quality"))
    assert(snap.agg(count(lit(1)), count(col("quality")))
      .as[(Long, Long)].head() == (19L, 9L))
  }
}
