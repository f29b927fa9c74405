package graft

import org.apache.spark.sql.functions._
import graft.sources.Warehouse

/** Round-16 pins for the two table-maintenance additions: casOptimize
  * (small-wave compaction — fold the smallest excess waves into one,
  * retain the big ones by reference, union extents computed from the
  * log alone) and catalog tags (named dataset releases that clamp
  * retention: a tagged snapshot stays readable through catTruncate +
  * casTruncate + casVacuum). Assertions read the real commit files
  * and staging directories, not the API under test.
  */
class OptimizeTagSpec extends SparkSpec {

  private def tmpWh(): Warehouse = Warehouse(
    java.nio.file.Files.createTempDirectory("ot-wh-").toString)

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

  // ---- casOptimize --------------------------------------------------

  test("casOptimize folds the SMALLEST excess waves into one rewrite " +
    "and retains the big waves by reference — union extent computed " +
    "from the log, data intact, steady state idempotent") {
    import spark.implicits._
    val wh = tmpWh()
    // four tiny waves (5 rows) + two big ones (500 rows)
    (0 to 3).foreach(w => wh.casAppendStats(spark,
      (w * 5L until w * 5L + 5L).toDF("k"), "op", "k"))
    wh.casAppendStats(spark, (1000L until 1500L).toDF("k"), "op", "k")
    wh.casAppendStats(spark, (2000L until 2500L).toDF("k"), "op", "k")
    val before = dataDirs(wh, "op")
    val st = wh.casOptimize(spark, "op", maxWaves = 3)
    assert(st.compacted == 4 && st.retained == 2 && st.version == 7,
      st.toString)
    // one new dir; the six originals untouched on disk
    assert((dataDirs(wh, "op") -- before).size == 1)
    // the commit: REPLACES with the union extent of the four tiny
    // waves [0, 19], plus the two big waves' ADDS lines verbatim
    val lines = commitLines(wh, "op", 7)
    assert(lines.count(_.startsWith("REPLACES 0 19 ")) == 1,
      lines.toString)
    assert(lines.count(_.startsWith("ADDS 1000 1499 ")) == 1 &&
      lines.count(_.startsWith("ADDS 2000 2499 ")) == 1, lines.toString)
    // data intact
    assert(wh.casRead(spark, "op").agg(count(lit(1)), sum("k"))
      .as[(Long, Long)].head() ==
      (1020L, (0L until 20L).sum + (1000L until 1500L).sum +
        (2000L until 2500L).sum))
    // already within budget: second optimize publishes nothing
    assert(wh.casOptimize(spark, "op", maxWaves = 3) ==
      graft.sources.CasOptimizeStats(7, 0, 3))
    assert(wh.casHead("op") == 7)
  }

  test("casOptimize keeps active tombstones riding (DEL lines are " +
    "not waves, not merged, still applied) and a stat-less merged " +
    "input degrades the union extent to '-'") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppend((0L until 5L).toDF("k"), "oq") // stat-less tiny
    wh.casAppendStats(spark, (5L until 10L).toDF("k"), "oq", "k")
    wh.casAppendStats(spark, (100L until 600L).toDF("k"), "oq", "k")
    wh.casDeleteMoR(spark, "oq", "k", Seq(3L, 200L).toDF("k"))
    val st = wh.casOptimize(spark, "oq", maxWaves = 2)
    assert(st.compacted == 2 && st.retained == 1, st.toString)
    val lines = commitLines(wh, "oq", st.version)
    assert(lines.count(_.startsWith("REPLACES - - ")) == 1,
      lines.toString)
    assert(lines.count(_.startsWith("DEL k ")) == 1, lines.toString)
    assert(wh.casRead(spark, "oq").as[Long].collect().toSet ==
      ((0L until 10L).toSet ++ (100L until 600L).toSet) --
        Set(3L, 200L))
  }

  test("casOptimize OCC: a concurrent append in the CAS seam forces " +
    "a recompute over the head that now includes it") {
    import spark.implicits._
    val wh = tmpWh()
    (0 to 4).foreach(w => wh.casAppendStats(spark,
      (w * 10L until w * 10L + 10L).toDF("k"), "or", "k"))
    var fired = false
    val st = wh.casOptimize(spark, "or", maxWaves = 2,
      beforeCommit = () => if (!fired) {
        fired = true
        wh.casAppendStats(spark, (500L until 510L).toDF("k"), "or", "k")
        ()
      })
    // retry saw 6 waves: 5 merged, 1 retained
    assert(st.compacted == 5 && st.retained == 1, st.toString)
    assert(wh.casRead(spark, "or").agg(count(lit(1)))
      .as[Long].head() == 60L)
  }

  // ---- casRestore ----------------------------------------------------

  test("casRestore rolls the head back to an old snapshot as ONE " +
    "metadata commit — stats, evolved flags and tombstones ride with " +
    "the restored lines, history in between stays time-travelable, " +
    "and the restored waves survive later retention") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppendStats(spark, (0L until 50L).toDF("k"), "rb", "k")
    wh.casAppendStats(spark, (50L until 100L).toDF("k"), "rb", "k")
    wh.casDeleteMoR(spark, "rb", "k", Seq(7L).toDF("k"))  // v3
    // the bad load: a replace that drops most of the table
    wh.casReplace(spark, "rb")(cur => cur.filter(col("k") < 5L)) // v4
    assert(wh.casRead(spark, "rb").agg(count(lit(1)))
      .as[Long].head() == 5L)
    val rv = wh.casRestore(spark, "rb", 3)
    assert(rv == 5)
    // restored head: both waves minus the tombstoned row
    assert(wh.casRead(spark, "rb").agg(count(lit(1)), sum("k"))
      .as[(Long, Long)].head() == (99L, (0L until 100L).sum - 7L))
    // the restored commit carries v3's lines verbatim behind CKPT
    val lines = commitLines(wh, "rb", 5)
    assert(lines.head == "CKPT" &&
      lines.count(_.startsWith("ADDS ")) == 2 &&
      lines.count(_.startsWith("DEL k ")) == 1, lines.toString)
    // stats still prune through the restore
    val (kept, total) = wh.casPrunedCommits("rb", 80L, 90L)
    assert(total == 2 && kept.size == 1, s"$kept/$total")
    // the bad version stays readable between v3 and the restore
    assert(wh.casReadAt(spark, "rb", 4).agg(count(lit(1)))
      .as[Long].head() == 5L)
    // retention keeps the restored waves (they are the head snapshot)
    wh.casTruncate("rb")
    wh.casVacuum("rb", minAgeMs = 0L)
    assert(wh.casRead(spark, "rb").agg(count(lit(1)))
      .as[Long].head() == 99L)
    // restoring into a retired window fails loudly
    assert(intercept[RuntimeException](
      wh.casRestore(spark, "rb", 2)).getMessage.contains("missing"))
  }

  test("casHistory classifies every commit by its verbs, newest " +
    "first, and retired versions are simply absent") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppendStats(spark, (0L until 10L).toDF("k"), "hs", "k") // 1
    wh.casAppendBatch(Seq(10L).toDF("k"), "hs", "s", 1L)          // 2
    wh.casAppendEvolved(Seq(11L).toDF("k")
      .withColumn("extra", lit(1L)), "hs")                        // 3
    wh.casDeleteMoR(spark, "hs", "k", Seq(3L).toDF("k"))          // 4
    wh.casDeleteWhere(spark, "hs", "k", Seq(5L))                  // 5
    wh.casReplace(spark, "hs")(cur => cur)                        // 6
    wh.casRestore(spark, "hs", 5)                                 // 7
    val h = wh.casHistory("hs")
    assert(h.map(i => (i.version, i.operation)) == Seq(
      7 -> "CHECKPOINT", 6 -> "REPLACE", 5 -> "REWRITE",
      4 -> "DELETE_MOR", 3 -> "APPEND_EVOLVED", 2 -> "APPEND_BATCH",
      1 -> "APPEND"), h.toString)
    assert(h.find(_.version == 5).exists(i =>
      i.delLines == 1 && i.dataLines >= 1), "the rewrite carries " +
      "the riding tombstone and its data lines")
    wh.casTruncate("hs") // 8: fresh checkpoint, below retired
    val h2 = wh.casHistory("hs")
    assert(h2.map(_.version) == Seq(8) &&
      h2.head.operation == "CHECKPOINT", h2.toString)
  }

  // ---- catalog tags --------------------------------------------------

  test("catTag names a catalog snapshot; catReadTag resolves it; " +
    "re-tagging fails loudly (tags are immutable); unknown tags and " +
    "already-truncated versions fail loudly") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppend(Seq(1L).toDF("k"), "tg")
    wh.catCommit(Seq("tg" -> 1))
    wh.casAppend(Seq(2L).toDF("k"), "tg")
    wh.catCommit(Seq("tg" -> 2))
    assert(wh.catTag("rel-1", 1) == 1)
    assert(wh.catTags() == Map("rel-1" -> 1))
    assert(wh.catReadTag(spark, "tg", "rel-1").as[Long]
      .collect().toSet == Set(1L))
    assert(wh.catRead(spark, "tg").as[Long].collect().toSet ==
      Set(1L, 2L))
    val e = intercept[RuntimeException](wh.catTag("rel-1", 2))
    assert(e.getMessage.contains("immutable"))
    assert(intercept[RuntimeException](
      wh.catReadTag(spark, "tg", "nope")).getMessage
      .contains("no such tag"))
    assert(wh.catDeleteTag("rel-1") && wh.catTags().isEmpty)
  }

  test("a tagged release survives FULL retention: catTruncate clamps " +
    "its floor above the tag's window, the truncation checkpoint's " +
    "HSUM carries the surviving commits' pins, and a following " +
    "casTruncate + zero-grace casVacuum reclaims nothing the tagged " +
    "snapshot resolves") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppend(Seq(1L).toDF("k"), "ta")          // ta@1
    wh.catCommit(Seq("ta" -> 1))                   // cat 1
    wh.catCheckpoint()                             // cat 2 (CCKPT)
    wh.casAppend(Seq(2L).toDF("k"), "ta")          // ta@2
    wh.catCommit(Seq("ta" -> 2))                   // cat 3
    wh.catTag("train-run", 3)
    wh.casAppend(Seq(3L).toDF("k"), "ta")          // ta@3
    wh.catCommit(Seq("ta" -> 3))                   // cat 4
    // truncation: checkpoint at 5; floor = tag window start = 2
    // (the CCKPT) — only commit 1 dies
    val removed = wh.catTruncate()
    assert(removed == 1, s"only the pre-window commit retires: $removed")
    assert(!new java.io.File(new java.io.File(wh.root,
      "__catalog__log"), f"${1}%09d.commit").exists())
    assert(wh.catReadTag(spark, "ta", "train-run").as[Long]
      .collect().toSet == Set(1L, 2L))
    // per-table retention + GC must keep every wave the tagged
    // snapshot resolves (ta@2 = waves 1+2)
    wh.casTruncate("ta")
    wh.casVacuum("ta", minAgeMs = 0L)
    assert(wh.catReadTag(spark, "ta", "train-run").as[Long]
      .collect().toSet == Set(1L, 2L),
      "tagged release must survive table truncate + vacuum")
    assert(wh.catRead(spark, "ta").as[Long].collect().toSet ==
      Set(1L, 2L, 3L))
    // drop the tag: the next truncation retires the old window and
    // GC reclaims what only the tag kept alive
    wh.catDeleteTag("train-run")
    wh.catTruncate()
    wh.casTruncate("ta")
    wh.casVacuum("ta", minAgeMs = 0L)
    assert(wh.catRead(spark, "ta").as[Long].collect().toSet ==
      Set(1L, 2L, 3L))
    assert(intercept[RuntimeException](
      wh.catReadTag(spark, "ta", "train-run")).getMessage
      .contains("no such tag"))
  }

  test("a DEAD tag (window torn outside the API) is excluded from " +
    "retention consults — truncation proceeds instead of wedging, " +
    "and resolving the dead tag fails loudly") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppend(Seq(1L).toDF("k"), "td")
    wh.catCommit(Seq("td" -> 1))                   // cat 1
    wh.catTag("poison", 1)
    wh.catCheckpoint()                             // cat 2 (CCKPT)
    wh.casAppend(Seq(2L).toDF("k"), "td")
    wh.catCommit(Seq("td" -> 2))                   // cat 3
    // simulate external damage: the tagged window's commit vanishes
    // (the head's window [2..3] stays readable — only the tag dies)
    java.nio.file.Files.delete(new java.io.File(new java.io.File(
      wh.root, "__catalog__log"), f"${1}%09d.commit").toPath)
    // truncation must NOT wedge on the dead tag
    val removed = wh.catTruncate()
    assert(removed >= 1, s"dead tag must not clamp: $removed")
    assert(intercept[RuntimeException](
      wh.catReadTag(spark, "td", "poison")).getMessage
      .contains("missing"))
    assert(wh.catRead(spark, "td").as[Long].collect().toSet ==
      Set(1L, 2L))
  }

  test("catRestoreTag rolls the warehouse to the tagged release: " +
    "every table the release pinned flips back, tables pinned only " +
    "AFTER the tag keep their current state, the bad interval stays " +
    "time-travelable, and restoring onto retired data fails loudly") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppend(Seq(1L).toDF("k"), "ra")
    wh.casAppend(Seq(10L).toDF("k"), "rz")
    wh.catCommit(Seq("ra" -> 1, "rz" -> 1))        // cat 1
    wh.catTag("good-release")
    // the bad load touches ra; a NEW table rx appears after the tag
    wh.casAppend(Seq(2L, 3L).toDF("k"), "ra")
    wh.casAppend(Seq(99L).toDF("k"), "rx")
    wh.catCommit(Seq("ra" -> 2, "rx" -> 1))        // cat 2
    assert(wh.catRead(spark, "ra").as[Long].collect().toSet ==
      Set(1L, 2L, 3L))
    val rv = wh.catRestoreTag("good-release")
    assert(rv == 3)
    assert(wh.catRead(spark, "ra").as[Long].collect().toSet == Set(1L),
      "the release's pin is the head again")
    assert(wh.catRead(spark, "rz").as[Long].collect().toSet == Set(10L))
    assert(wh.catRead(spark, "rx").as[Long].collect().toSet ==
      Set(99L), "a table the release never pinned keeps its state")
    // the bad interval is still history
    assert(wh.catRead(spark, "ra", asOf = 2).as[Long]
      .collect().toSet == Set(1L, 2L, 3L))
    // rollback onto retired data fails at the committer: retire ra's
    // old window (drop the tag so retention can move past it)
    wh.catDeleteTag("good-release")
    wh.catTruncate()
    wh.casTruncate("ra")
    intercept[RuntimeException](wh.catRestore(2))
  }

  test("catTag pre-validation: tagging a version whose window a " +
    "truncation already retired fails loudly and creates nothing") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppend(Seq(1L).toDF("k"), "tp")
    wh.catCommit(Seq("tp" -> 1))                   // cat 1
    wh.casAppend(Seq(2L).toDF("k"), "tp")
    wh.catCommit(Seq("tp" -> 2))                   // cat 2
    wh.catTruncate()                               // cat 3; 1-2 retired
    val e = intercept[IllegalArgumentException](wh.catTag("late", 1))
    assert(e.getMessage.contains("truncated"))
    assert(wh.catTags().isEmpty)
  }
}
