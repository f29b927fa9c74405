package graft

import org.apache.spark.sql.functions._
import graft.sources.Warehouse
import graft.ops.BloomJoin

/** Round-15 pins: regression tests for every round-14 ADVICE closure
  * (CAS batch-dedup TOCTOU, BloomJoin key-type normalization,
  * two-level-manifest schema fallback, checkpoint TXN summaries,
  * lost-replace staging cleanup) plus the new tier — catalog-level
  * cross-table CAS commits, CAS time travel, and log truncation.
  */
class Round15Spec extends SparkSpec {

  private def tmpWh(): Warehouse = Warehouse(
    java.nio.file.Files.createTempDirectory("r15-wh-").toString)

  private def writeCommit(wh: Warehouse, table: String, n: Int,
      lines: Seq[String]): Unit = {
    val f = new java.io.File(
      new java.io.File(wh.root, table + "__log"), f"$n%09d.commit")
    java.nio.file.Files.write(f.toPath,
      lines.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  private def commitLines(wh: Warehouse, table: String,
      n: Int): Seq[String] = {
    val f = new java.io.File(
      new java.io.File(wh.root, table + "__log"), f"$n%09d.commit")
    val src = scala.io.Source.fromFile(f)
    try src.getLines().toList.filterNot(_.startsWith("TS "))
    finally src.close() // payload view: drop the clock line
  }

  private def dataDirs(wh: Warehouse, table: String): Set[String] =
    Option(new java.io.File(wh.root, table + "__data").listFiles())
      .getOrElse(Array()).filter(_.isDirectory).map(_.getName).toSet

  // ---- (a) casAppendBatch TOCTOU -----------------------------------

  test("casAppendBatch TOCTOU: a competitor committing the SAME " +
    "(stream, batchId) inside the check-to-CAS window is caught on " +
    "the retry — exactly one copy lands") {
    import spark.implicits._
    val wh = tmpWh()
    var innerV: Option[Int] = None
    var fired = false
    val outer = wh.casAppendBatch(Seq(1L).toDF("k"), "t", "s", 7L,
      beforeCommit = () => if (!fired) {
        fired = true
        // the concurrent instance of the same stream lands batch 7
        // AFTER the outer writer's dedup check passed
        innerV = wh.casAppendBatch(Seq(1L).toDF("k"), "t", "s", 7L)
      })
    assert(innerV.contains(1), "the injected competitor must win v1")
    assert(outer.isEmpty,
      "the outer writer must detect the competitor's ADDB on retry " +
        "and deduplicate, not land a second copy")
    assert(wh.casRead(spark, "t").count() == 1L, "exactly-once")
    // the loser's staged dir was deleted, not leaked
    assert(dataDirs(wh, "t").size == 1, "no orphan staging dirs")
  }

  // ---- (b) BloomJoin key-type normalization ------------------------

  test("BloomJoin: int-typed build keys probe correctly from a " +
    "long-typed probe side (no false negatives), and string keys " +
    "hash as-is") {
    import spark.implicits._
    val build = (1 to 50).toDF("k") // IntegerType
    val probe = (1L to 200L).toDF("k") // LongType
    val m = 64 * 16; val k = 3
    val bits = BloomJoin.buildBits(build, "k", m, k)
    val kept = BloomJoin.prefilter(probe, "k", bits, m, k)
      .as[Long].collect().toSet
    assert((1L to 50L).forall(kept),
      s"every matching key must survive the prefilter; missing " +
        s"${(1L to 50L).filterNot(kept)}")
    val sb = Seq("alpha", "beta", "gamma").toDF("k")
    val sp = Seq("alpha", "beta", "gamma", "delta", "omega").toDF("k")
    val sbits = BloomJoin.buildBits(sb, "k", m, k)
    val skept = BloomJoin.prefilter(sp, "k", sbits, m, k)
      .as[String].collect().toSet
    assert(Set("alpha", "beta", "gamma").subsetOf(skept),
      "string keys must pass through un-cast (a blanket long cast " +
        "would NULL them and drop every match)")
  }

  // ---- (c)+(d) checkpoint TXN summaries / legacy checkpoints -------

  test("legacy checkpoint (no TXN lines): batch dedup scans PAST it " +
    "— an ADDB a REPLACE compacted away before the checkpoint still " +
    "deduplicates a replayed batch") {
    import spark.implicits._
    val wh = tmpWh()
    assert(wh.casAppendBatch(Seq(1L).toDF("k"), "t", "s", 5L).isDefined)
    // compaction drops the ADDB line from the active set
    wh.casReplace(spark, "t")(cur => cur)
    // a LEGACY checkpoint: marker + active lines, NO TXN summary —
    // the format the previous code version wrote
    val active = commitLines(wh, "t", 2)
    writeCommit(wh, "t", 3, "CKPT" +: active)
    assert(wh.casHead("t") == 3)
    // replay of batch 5: stopping at the legacy checkpoint would
    // miss v1's ADDB and land a duplicate
    assert(wh.casAppendBatch(Seq(1L).toDF("k"), "t", "s", 5L).isEmpty,
      "replayed batch must dedup through a TXN-less checkpoint")
    assert(wh.casRead(spark, "t").count() == 1L)
  }

  test("new-format checkpoint TXN summary answers for batches whose " +
    "commits were TRUNCATED away — exactly-once survives retention") {
    import spark.implicits._
    val wh = tmpWh()
    (0L to 2L).foreach(b =>
      assert(wh.casAppendBatch(Seq(b).toDF("k"), "t", "s", b).isDefined))
    wh.casReplace(spark, "t")(cur => cur.filter(col("k") >= 1L))
    val removed = wh.casTruncate("t")
    assert(removed == 4,
      s"commits below the fresh checkpoint must be retired, got $removed")
    // the checkpoint's TXN line is now the ONLY record of batches 0-2
    val ck = commitLines(wh, "t", wh.casHead("t"))
    assert(ck.exists(_.startsWith("TXN s 2")), s"TXN summary in $ck")
    (0L to 2L).foreach(b =>
      assert(wh.casAppendBatch(Seq(b).toDF("k"), "t", "s", b).isEmpty,
        s"batch $b must dedup via the TXN summary after truncation"))
    assert(wh.casRead(spark, "t").as[Long].collect().toSet ==
      Set(1L, 2L))
  }

  // ---- (e) lost-replace staging cleanup ----------------------------

  test("casReplace loser: each lost attempt's staged dir is deleted " +
    "immediately; after the retry wins, vacuum finds nothing to " +
    "reclaim and committed data is untouched") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppend(Seq(1L, 2L).toDF("k"), "t")
    var fired = false
    wh.casReplace(spark, "t", beforeCommit = () => if (!fired) {
      fired = true
      wh.casAppend(Seq(3L).toDF("k"), "t") // steals head+1
    })(cur => cur.filter(col("k") =!= 2L))
    // dirs: wave1, competitor wave, winning replace output = 3; the
    // lost attempt's staged dir must already be gone
    assert(dataDirs(wh, "t").size == 3,
      s"lost-attempt staging must not leak: ${dataDirs(wh, "t")}")
    assert(wh.casVacuum("t", minAgeMs = 0L).isEmpty,
      "no orphans left for vacuum")
    // the retry recomputed against the post-append snapshot
    assert(wh.casRead(spark, "t").as[Long].collect().toSet ==
      Set(1L, 3L))
  }

  // ---- manifest tier: schema fallback + malformed spec -------------

  test("foreign __manifest2 without has_null_extent/n_files: consult " +
    "falls back to the flat manifest instead of throwing") {
    import spark.implicits._
    val wh = tmpWh()
    val df = (0L until 100L).map(v => (v, v)).toDF("bucket", "payload")
      .repartition(4)
    wh.append(df, "t")
    wh.writeManifest(spark, "t", Seq("bucket"))
    // a foreign/older-layout group summary: extent columns only
    Seq((0, 0L, 99L)).toDF("gid", "min_bucket", "max_bucket")
      .write.mode("overwrite").parquet(wh.root + "/t__manifest2")
    val (kept, total) = wh.prunedFiles(spark, "t", "bucket", 0L, 99L)
    assert(total == 4 && kept.size == 4,
      "flat fallback must serve the consult")
    assert(wh.readPruned(spark, "t", "bucket", 10L, 20L).count() == 11L)
  }

  test("malformed __manifest2.spec: appendWithManifest and " +
    "writeManifest RETIRE the tier (no throw); the flat consult " +
    "stays correct") {
    import spark.implicits._
    val wh = tmpWh()
    def wave(a: Long, b: Long) =
      (a until b).map(v => (v, v)).toDF("bucket", "payload")
        .repartitionByRange(2, col("bucket"))
    wh.appendWithManifest(spark, wave(0L, 100L), "t",
      Seq("bucket"), groupSize = 2)
    val spec = new java.io.File(wh.root, "t__manifest2.spec")
    assert(spec.exists(), "tier created on the first wave")
    // truncate the spec to a single line (crash mid-write shape)
    java.nio.file.Files.write(spec.toPath, "bucket\n".getBytes())
    wh.appendWithManifest(spark, wave(100L, 200L), "t",
      Seq("bucket"), groupSize = 2)
    assert(!spec.exists() &&
      !new java.io.File(wh.root, "t__manifest2").exists(),
      "unreadable spec must retire the tier, not throw")
    val (kept, total) = wh.prunedFiles(spark, "t", "bucket", 150L, 199L)
    assert(total == 4 && kept.size <= 2 && kept.nonEmpty,
      s"flat consult must keep pruning: kept ${kept.size}/$total")
    // a garbage numeric field retires on the REWRITE path too
    wh.writeTwoLevelManifest(spark, "t", "bucket", 2)
    java.nio.file.Files.write(spec.toPath, "bucket\nxyz\n".getBytes())
    wh.writeManifest(spark, "t", Seq("bucket"))
    assert(!spec.exists() &&
      !new java.io.File(wh.root, "t__manifest2").exists(),
      "corrupt group size must retire the tier on rewrite")
  }

  test("appendWithManifest: a wave whose stats cols omit the tier's " +
    "clustering column retires the tier instead of throwing " +
    "AnalysisException") {
    import spark.implicits._
    val wh = tmpWh()
    val w1 = (0L until 50L).map(v => (v, v)).toDF("bucket", "other")
      .repartition(2)
    wh.appendWithManifest(spark, w1, "t", Seq("bucket"), groupSize = 2)
    assert(new java.io.File(wh.root, "t__manifest2").exists())
    val w2 = (50L until 100L).map(v => (v, v)).toDF("bucket", "other")
      .repartition(2)
    wh.appendWithManifest(spark, w2, "t", Seq("other"), groupSize = 2)
    assert(!new java.io.File(wh.root, "t__manifest2").exists() &&
      !new java.io.File(wh.root, "t__manifest2.spec").exists(),
      "stats-column-less wave must retire the tier")
    assert(wh.read(spark, "t").count() == 100L, "the data landed")
  }

  // ---- O(delta) tiered appends: prune + rebuild --------------------

  test("appendWithManifest tiers: overlapping delta waves prune " +
    "correctly at group level, equal the exact filter, and a flat " +
    "rewrite rebuilds the tier globally sorted") {
    import spark.implicits._
    val wh = tmpWh()
    def wave(a: Long, b: Long) =
      (a until b by 10L).map(v => (v, v)).toDF("bucket", "payload")
        .repartitionByRange(4, col("bucket"))
    // three overlapping key ranges — arrival order, not sorted order
    wh.appendWithManifest(spark, wave(0L, 1000L), "t",
      Seq("bucket"), groupSize = 2)
    wh.appendWithManifest(spark, wave(500L, 1500L), "t",
      Seq("bucket"), groupSize = 2)
    wh.appendWithManifest(spark, wave(200L, 800L), "t",
      Seq("bucket"), groupSize = 2)
    val (kept, gTotal, gKept, fPulled) =
      wh.prunedFilesTwoLevel(spark, "t", "bucket", 600L, 700L)
    assert(gTotal == 6, s"3 waves x 4 files / groupSize 2 = 6, $gTotal")
    assert(gKept < gTotal,
      s"the [600,700] probe must skip some groups ($gKept/$gTotal)")
    assert(fPulled < 12, "file rows outside surviving groups not read")
    // kept must be a superset of the files that truly contain hits,
    // and the pruned read must equal the exact filter
    val got = wh.readPruned(spark, "t", "bucket", 600L, 700L)
      .as[(Long, Long)].collect().toSet
    val want = wh.read(spark, "t")
      .filter(col("bucket").between(600L, 700L))
      .as[(Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
    assert(kept.nonEmpty && kept.size <= 12)
    // full rebuild: globally range-sorted groups prune at least as well
    wh.writeManifest(spark, "t", Seq("bucket"))
    val (kept2, gTotal2, gKept2, _) =
      wh.prunedFilesTwoLevel(spark, "t", "bucket", 600L, 700L)
    assert(gTotal2 == 6 && gKept2 <= gKept, "rebuild keeps/improves")
    val got2 = wh.readPruned(spark, "t", "bucket", 600L, 700L)
      .as[(Long, Long)].collect().toSet
    assert(got2 == want)
    assert(kept2.toSet.nonEmpty)
  }

  // ---- catalog: cross-table atomic commits -------------------------

  test("catAppendAll: cross-table commit is both-or-neither for " +
    "catalog readers; a concurrent per-table append neither blocks " +
    "nor leaks into the pinned snapshot") {
    import spark.implicits._
    val wh = tmpWh()
    var bVer = 0
    var neitherHeld = false
    val (catV, pins) = wh.catAppendAll(
      Seq("x" -> Seq(1L, 2L).toDF("k"), "y" -> Seq(10L).toDF("k")),
      beforeCommit = () => {
        // B appends to x in A's stage-to-catalog-CAS window
        bVer = wh.casAppend(Seq(99L).toDF("k"), "x")
        // NEITHER: the catalog has no pins yet
        neitherHeld = wh.catSnapshot().isEmpty
      })
    assert(neitherHeld, "before the catalog CAS, neither table is " +
      "visible through the catalog")
    assert(pins == Map("x" -> 1, "y" -> 1) && bVer == 2 && catV == 1)
    // BOTH: the one commit file published both pins atomically
    assert(wh.catRead(spark, "x").as[Long].collect().toSet ==
      Set(1L, 2L), "catalog x = A's wave only (pin excludes B's " +
        "later version — snapshot consistency)")
    assert(wh.catRead(spark, "y").as[Long].collect().toSet == Set(10L))
    // direct per-table readers see B's append immediately
    assert(wh.casRead(spark, "x").as[Long].collect().toSet ==
      Set(1L, 2L, 99L))
    // a later transaction publishes x's head; the OLD catalog
    // snapshot still resolves the original pin (catalog time travel)
    val catV2 = wh.catCommit(Seq("x" -> wh.casHead("x")))
    assert(catV2 == 2)
    assert(wh.catRead(spark, "x").as[Long].collect().toSet ==
      Set(1L, 2L, 99L))
    assert(wh.catRead(spark, "x", asOf = catV).as[Long].collect()
      .toSet == Set(1L, 2L))
    assert(wh.catRead(spark, "y").as[Long].collect().toSet ==
      Set(10L), "y's pin carries across catalog commits")
  }

  test("catCommit: CAS conflict retries with the SAME pins; invalid " +
    "pins are rejected before publishing") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppend(Seq(1L).toDF("k"), "x")
    wh.casAppend(Seq(2L).toDF("k"), "y")
    intercept[IllegalArgumentException] {
      wh.catCommit(Seq("x" -> 2)) // not a committed version
    }
    intercept[IllegalArgumentException] {
      wh.catCommit(Seq("x" -> 1, "x" -> 1)) // duplicate table
    }
    var fired = false
    val v = wh.catCommit(Seq("x" -> 1), beforeCommit = () =>
      if (!fired) { fired = true; wh.catCommit(Seq("y" -> 1)); () })
    assert(v == 2, "loser retries at the new head")
    assert(wh.catSnapshot() == Map("x" -> 1, "y" -> 1))
  }

  // ---- CAS time travel + retention ---------------------------------

  test("casReadAt: version-bounded replay serves historical " +
    "snapshots; casTruncate retires pre-checkpoint commits, time " +
    "travel below fails LOUDLY, and vacuum then reclaims replaced " +
    "waves") {
    import spark.implicits._
    val wh = tmpWh()
    (0L to 2L).foreach(i =>
      wh.casAppend(Seq(i * 10L, i * 10L + 1L).toDF("k"), "t"))
    assert(wh.casReadAt(spark, "t", 2).as[Long].collect().toSet ==
      Set(0L, 1L, 10L, 11L))
    wh.casReplace(spark, "t")(cur => cur.filter(col("k") % 10L === 0L))
    assert(wh.casReadAt(spark, "t", 3).as[Long].collect().toSet ==
      Set(0L, 1L, 10L, 11L, 20L, 21L), "pre-replace snapshot intact")
    assert(dataDirs(wh, "t").size == 4)
    // retention: fresh checkpoint at v5, commits 1-4 retired
    val removed = wh.casTruncate("t")
    assert(removed == 4 && wh.casHead("t") == 5)
    assert(wh.casRead(spark, "t").as[Long].collect().toSet ==
      Set(0L, 10L, 20L), "current snapshot unchanged by truncation")
    val e = intercept[RuntimeException](wh.casReadAt(spark, "t", 3))
    assert(e.getMessage.contains("truncated"),
      s"truncated time travel must fail loudly: ${e.getMessage}")
    // the three replaced waves are now unreferenced -> reclaimed
    val swept = wh.casVacuum("t", minAgeMs = 0L)
    assert(swept.size == 3,
      s"replaced waves become collectable after truncation: $swept")
    assert(wh.casRead(spark, "t").as[Long].collect().toSet ==
      Set(0L, 10L, 20L), "live data untouched by vacuum")
  }

  test("casTruncate clamps to catalog pins: a pinned snapshot's " +
    "replay window survives retention and catReferencedPaths names " +
    "exactly its data") {
    import spark.implicits._
    val wh = tmpWh()
    val v1 = wh.casAppend(Seq(1L).toDF("k"), "t")
    wh.catCommit(Seq("t" -> v1))
    wh.casReplace(spark, "t")(cur => cur.filter(col("k") < 0L))
    // checkpoint lands, but nothing below the pin's window may go
    val removed = wh.casTruncate("t")
    assert(removed == 0,
      s"pin t@1 holds the whole log (window start 1): removed $removed")
    assert(wh.catRead(spark, "t").as[Long].collect().toSet == Set(1L))
    val refs = wh.catReferencedPaths("t")
    assert(refs.size == 1 && refs.forall(_.contains("t__data")),
      s"pinned wave's directory is catalog-referenced: $refs")
    assert(wh.casVacuum("t", minAgeMs = 0L).isEmpty)
    assert(wh.catRead(spark, "t").as[Long].collect().toSet == Set(1L))
  }

  test("catTxnSink: exactly-once two-table landing with catalog-" +
    "consistent pins — a replayed batch after a simulated crash " +
    "between the two appends lands only its missing half, and the " +
    "catalog never exposes detail without its rollup") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wh = tmpWh()
    val ckpt = java.nio.file.Files
      .createTempDirectory("r15-ckpt-").toString
    val input = MemoryStream[(String, String)]
    input.addData(("web", "en"), ("web", "de"), ("books", "en"))
    graft.streaming.StreamingEtl.catTxnSink(
      input.toDF().toDF("source", "lang"), wh, "d", "r", "feed", ckpt)
      .awaitTermination()
    input.addData(("web", "en"))
    graft.streaming.StreamingEtl.catTxnSink(
      input.toDF().toDF("source", "lang"), wh, "d", "r", "feed", ckpt)
      .awaitTermination()
    def dAgg = wh.catRead(spark, "d").groupBy("source", "lang")
      .agg(sum("n")).as[(String, String, Long)].collect().toSet
    def rAgg = wh.catRead(spark, "r").groupBy("source")
      .agg(sum("src_n")).as[(String, Long)].collect().toSet
    val base = Set(("web", "en", 2L), ("web", "de", 1L),
      ("books", "en", 1L))
    assert(dAgg == base && rAgg == Set(("web", 3L), ("books", 1L)))
    // crash window: batch 99's DETAIL landed, rollup + pin did not
    val wave = Seq(("news", "fr")).toDF("source", "lang")
    wh.casAppendBatch(
      wave.groupBy("source", "lang").agg(count(lit(1)).as("n")),
      "d", "feed", 99L)
    assert(dAgg == base,
      "the catalog pin must not expose the half-landed batch")
    assert(rAgg == Set(("web", 3L), ("books", 1L)))
    // recovery replay of batch 99: detail dedups, rollup lands, pin
    // advances — both tables now carry the batch, exactly once
    graft.streaming.StreamingEtl.catTxnBatch(
      wh, wave, 99L, "d", "r", "feed")
    assert(dAgg == base + (("news", "fr", 1L)),
      "exactly one landed copy of the replayed batch's detail")
    assert(rAgg == Set(("web", 3L), ("books", 1L), ("news", 1L)))
  }

  test("catCheckpoint: resolution stops at the checkpoint (older " +
    "catalog commits are no longer read), the folded map equals the " +
    "pre-checkpoint snapshot, and post-checkpoint pins compose") {
    import spark.implicits._
    val wh = tmpWh()
    val vx = wh.casAppend(Seq(1L).toDF("k"), "x")
    val vy = wh.casAppend(Seq(2L).toDF("k"), "y")
    wh.catCommit(Seq("x" -> vx))
    wh.catCommit(Seq("y" -> vy))
    val before = wh.catSnapshot()
    val ck = wh.catCheckpoint()
    assert(ck == 3 && wh.catSnapshot() == before)
    // the pin map rides the checkpoint commit itself: resolution
    // must not need anything below it — prove by deleting an older
    // catalog commit outright
    val old = new java.io.File(
      new java.io.File(wh.root, "__catalog__log"), f"${1}%09d.commit")
    assert(old.delete(), "setup: old catalog commit removed")
    assert(wh.catSnapshot() == before,
      "resolution must stop at the checkpoint, not read below it")
    assert(wh.catRead(spark, "x").as[Long].collect().toSet == Set(1L))
    // pins after the checkpoint still win over its folded map
    val vx2 = wh.casAppend(Seq(9L).toDF("k"), "x")
    wh.catCommit(Seq("x" -> vx2))
    assert(wh.catSnapshot() == before + ("x" -> vx2))
    assert(wh.catRead(spark, "x").as[Long].collect().toSet ==
      Set(1L, 9L))
  }

  test("catTruncate: catalog history below the checkpoint retires — " +
    "head resolution unchanged, dead snapshots fail loudly, and data " +
    "only dead catalog history pinned becomes reclaimable") {
    import spark.implicits._
    val wh = tmpWh()
    val v1 = wh.casAppend(Seq(1L).toDF("k"), "t")
    wh.catCommit(Seq("t" -> v1))
    val v2 = wh.casReplace(spark, "t")(c => c.filter(col("k") < 0L))
    wh.catCommit(Seq("t" -> v2))
    // per-table truncation is clamped by the live pin t@1
    assert(wh.casTruncate("t") == 0)
    val removed = wh.catTruncate()
    assert(removed == 2 && wh.catHead == 3)
    assert(wh.catRead(spark, "t").count() == 0L,
      "head resolves through the checkpoint's folded map")
    val e = intercept[RuntimeException](wh.catSnapshot(asOf = 1))
    assert(e.getMessage.contains("truncated"),
      s"dead catalog snapshots must fail loudly: ${e.getMessage}")
    // the t@1 pin died with the catalog history: per-table
    // truncation now retires v1's window and vacuum reclaims the
    // wave only that pin kept alive
    assert(wh.casTruncate("t") == 1)
    assert(wh.casVacuum("t", minAgeMs = 0L).size == 1,
      "the dead pin's wave is reclaimable")
    assert(wh.catRead(spark, "t").count() == 0L)
  }

  test("catCommit rejects a pin whose replay window truncation " +
    "already retired — the poison pin fails at COMMIT time, not in " +
    "every later vacuum") {
    import spark.implicits._
    val wh = tmpWh()
    (0L to 2L).foreach(i => wh.casAppend(Seq(i).toDF("k"), "t"))
    wh.casReplace(spark, "t")(cur => cur.filter(col("k") > 0L))
    assert(wh.casTruncate("t") == 4)
    // v2's window is gone; pinning it must error NOW
    intercept[RuntimeException](wh.catCommit(Seq("t" -> 2)))
    assert(wh.catHead == 0, "the rejected pin must not publish")
    // the current (checkpointed) head pins fine, and vacuum stays
    // healthy afterwards
    wh.catCommit(Seq("t" -> wh.casHead("t")))
    assert(wh.catRead(spark, "t").as[Long].collect().toSet ==
      Set(1L, 2L))
    wh.casVacuum("t", minAgeMs = 0L)
    assert(wh.catRead(spark, "t").as[Long].collect().toSet ==
      Set(1L, 2L))
  }

  test("catOverwriteAll: the atomic cross-table full refresh — " +
    "catalog readers flip old-pair -> new-pair with nothing in " +
    "between; casOverwrite replaces, never unions; a lost race " +
    "leaves no staged orphan") {
    import spark.implicits._
    val wh = tmpWh()
    wh.catOverwriteAll(Seq("d" -> Seq(1L).toDF("k"),
      "f" -> Seq(10L, 11L).toDF("k")))
    var midD: Set[Long] = null
    var midF: Set[Long] = null
    wh.catOverwriteAll(Seq("d" -> Seq(2L).toDF("k"),
      "f" -> Seq(20L).toDF("k")), beforeCommit = () => {
        // both REPLACE commits are already in the per-table logs,
        // but the catalog still serves the OLD consistent pair
        midD = wh.catRead(spark, "d").as[Long].collect().toSet
        midF = wh.catRead(spark, "f").as[Long].collect().toSet
      })
    assert(midD == Set(1L) && midF == Set(10L, 11L),
      "in the replace-to-pin window the catalog must serve the old pair")
    assert(wh.catRead(spark, "d").as[Long].collect().toSet == Set(2L))
    assert(wh.catRead(spark, "f").as[Long].collect().toSet == Set(20L),
      "full refresh REPLACES the fact — old rows must be gone")
    // historical catalog snapshot still serves load 1
    assert(wh.catRead(spark, "f", asOf = 1).as[Long].collect()
      .toSet == Set(10L, 11L))
    // lost-race cleanup: a casOverwrite that exhausts retries deletes
    // its staged dir (retries=0 loses immediately)
    intercept[graft.sources.Warehouse#CommitConflict](
      wh.casOverwrite(Seq(99L).toDF("k"), "f", retries = 0))
    assert(wh.casVacuum("f", minAgeMs = 0L).isEmpty,
      "no staged orphan after an exhausted overwrite")
  }

  test("casAppend under REAL thread concurrency: 8 writers x 4 " +
    "appends race freely — every wave lands exactly once, versions " +
    "are contiguous, nothing is lost") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppend(Seq(-1L).toDF("k"), "t")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = (0 until 8).map { th =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = (0 until 4).foreach { i =>
            wh.casAppend(Seq((th * 100 + i).toLong).toDF("k"), "t",
              retries = 64)
            ()
          }
        })
      }
      futs.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    // 33 append commits; the winner of version 32 triggers one
    // best-effort auto-optimize (casMaybeOptimize), which adds one
    // REWRITE commit unless it exhausted its races under the barrage
    val head = wh.casHead("t")
    assert(head == 33 || head == 34,
      s"32 concurrent appends + seed (+ at most one auto-optimize): $head")
    val got = wh.casRead(spark, "t").as[Long].collect().toList
    val want = (for (th <- 0 until 8; i <- 0 until 4)
      yield (th * 100 + i).toLong).toList :+ -1L
    assert(got.sorted == want.sorted,
      "every concurrent append lands exactly once — no loss, no dup")
    (1 to head).foreach(n => assert(
      new java.io.File(new java.io.File(wh.root, "t__log"),
        f"$n%09d.commit").exists(), s"version $n missing — gap"))
  }

  test("plan hygiene: q288's catalog join broadcasts the dim side " +
    "(no shuffle on the join)") {
    val plan = graft.queries.Extras4.q288
      .fn(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the dim side must broadcast")
  }

  // ---- GIF / LZW --------------------------------------------------

  test("GIF LZW: encode/decode roundtrips cross every code-width " +
    "boundary and the 4096-entry dictionary reset; run-heavy input " +
    "exercises KwKwK; truncation fails, never fabricates") {
    import graft.multimodal.Gif
    for (mcs <- Seq(2, 4, 8)) {
      val n = 30000
      val syms = 1 << mcs
      val xs = Array.tabulate(n)(i => (i * 31 + (i * i) % 97) % syms)
      val enc = Gif.lzwEncode(xs, mcs)
      val dec = Gif.lzwDecode(enc, mcs, n)
      assert(dec.exists(_.sameElements(xs)), s"mcs $mcs roundtrip")
      // near-random high-entropy input only bounds the expansion
      // (12-bit codes over 8-bit symbols); LOW-entropy input below
      // must genuinely compress
      assert(enc.length < 2 * n,
        s"mcs $mcs expansion bound: $n syms -> ${enc.length} B")
    }
    // run-heavy stream: cccc... emits a code right after defining it
    // (the KwKwK case the decoder must infer) — and must compress
    val runs = Array.tabulate(5000)(i => (i / 7) % 4)
    val runsEnc = Gif.lzwEncode(runs, 2)
    assert(Gif.lzwDecode(runsEnc, 2, runs.length)
      .exists(_.sameElements(runs)))
    assert(runsEnc.length < runs.length / 2,
      s"low-entropy runs must compress: ${runsEnc.length} B")
    val one = Array(3)
    assert(Gif.lzwDecode(Gif.lzwEncode(one, 2), 2, 1)
      .exists(_.sameElements(one)))
    val enc = Gif.lzwEncode(Array.tabulate(100)(_ % 4), 2)
    assert(Gif.lzwDecode(enc.dropRight(1), 2, 100).isEmpty,
      "a truncated code stream must report failure")
  }

  test("gifPixels ≡ the JDK ImageIO GIF writer (independent " +
    "encoder): every pixel's palette-mapped RGB matches, across " +
    "geometries wider than the interlace strides") {
    import graft.multimodal.Gif
    import java.awt.image.{BufferedImage, IndexColorModel}
    for (seed <- 1L to 12L) {
      val w = (seed % 11 + 2).toInt; val h = (seed % 7 + 2).toInt
      val n = 16
      val r = Array.tabulate(n)(c => ((seed * 3 + c * 7) % 256).toByte)
      val g = Array.tabulate(n)(c =>
        ((seed * 3 + c * 7 + 11) % 256).toByte)
      val b = Array.tabulate(n)(c =>
        ((seed * 3 + c * 7 + 22) % 256).toByte)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED,
        new IndexColorModel(4, n, r, g, b))
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, ((seed * 7 + y * w + x) % n).toInt)
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "gif", baos))
      val got = Gif.gifPixels(baos.toByteArray)
      assert(got.isDefined, s"seed $seed: JDK gif must decode")
      val (dw, dh, _, ix, pal) = got.get
      assert(dw == w && dh == h, s"seed $seed geometry")
      for (y <- 0 until h; x <- 0 until w)
        assert((pal(ix(y * w + x)) | 0xff000000) == img.getRGB(x, y),
          s"seed $seed pixel ($x,$y)")
    }
  }

  test("GIF container: interlaced storage decodes to the same " +
    "visual rows as sequential; extension blocks are skipped " +
    "structurally; hostile bytes degrade, never throw") {
    import graft.multimodal.Gif
    val w = 7; val h = 9
    val pal = Array.tabulate(8)(c => c * 0x010203 + 5)
    val idx = Array.tabulate(w * h)(k => (k * 5 + 3) % 8)
    val seqG = Gif.buildGif(idx, w, h, pal)
    val intG = Gif.buildGif(idx, w, h, pal, interlaced = true,
      withExtensions = true)
    assert(!seqG.sameElements(intG),
      "interlace must permute the stored stream")
    Seq(seqG, intG).foreach { bytes =>
      val got = Gif.gifPixels(bytes)
      assert(got.isDefined)
      val (dw, dh, nc, ix, dp) = got.get
      assert(dw == w && dh == h && nc == 8)
      assert(ix.sameElements(idx), "visual row order restored")
      assert(dp.sameElements(pal))
    }
    // frame-LOCAL color table (no GCT): same pixels, same palette,
    // different container layout — the decoder must take the
    // per-frame override
    val lct = Gif.buildGif(idx, w, h, pal, localPalette = true)
    assert(!lct.sameElements(seqG))
    val gotL = Gif.gifPixels(lct)
    assert(gotL.isDefined)
    assert(gotL.get._4.sameElements(idx) && gotL.get._5.sameElements(pal))
    // animation: every frame decodes with its own LZW stream and
    // declared delay; the NETSCAPE loop block is skipped; the
    // first-frame view (gifPixels) agrees with the frame walk
    val f0 = Array.tabulate(w * h)(k => (k * 3 + 1) % 8)
    val f1 = Array.tabulate(w * h)(k => (k * 5 + 2) % 8)
    val f2 = Array.tabulate(w * h)(k => (7 - k % 8))
    val anim = Gif.buildGifAnim(Seq(f0, f1, f2), w, h, pal,
      delaysCs = Seq(10, 25, 40))
    val fsOpt = Gif.gifFrames(anim)
    assert(fsOpt.isDefined)
    val fs = fsOpt.get
    assert(fs.length == 3)
    assert(fs.map(_.delayCs) == Seq(10, 25, 40))
    assert(fs(0).idx.sameElements(f0) && fs(1).idx.sameElements(f1) &&
      fs(2).idx.sameElements(f2),
      "no LZW state may bleed across frames")
    fs.foreach(f => assert(f.w == w && f.h == h &&
      f.palette.sameElements(pal)))
    assert(Gif.gifPixels(anim).exists(_._4.sameElements(f0)))
    assert(Gif.gifPixels("not a gif at all".getBytes).isEmpty)
    assert(Gif.gifPixels(seqG.take(20)).isEmpty,
      "header-only prefix must fail cleanly")
    // corrupt the code stream: any outcome but an exception
    val bad = seqG.clone()
    bad(bad.length - 5) = (bad(bad.length - 5) ^ 0x55).toByte
    Gif.gifPixels(bad)
    ()
  }
}
