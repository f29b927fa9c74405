package graft

import org.apache.spark.sql.functions._
import graft.sources.Warehouse

/** [[Warehouse.casApplyCdc]] — MERGE with the delete clause: one CDC
  * batch (upserts + deletes) lands atomically in one commit. The
  * matrix mirrors CasMergeSpec plus the delete-clause corners:
  * absent-key deletes, pure-delete batches (hit and disjoint),
  * NULL-key discipline, ambiguity rejection, extent locality, and
  * the crash-replay dedup a re-inserted key depends on.
  */
class CasCdcSpec extends SparkSpec {

  private def tmpWh(): Warehouse = Warehouse(
    java.nio.file.Files.createTempDirectory("r17-cdc-").toString)

  private def commitLines(wh: Warehouse, table: String,
      n: Int): Seq[String] = {
    val f = new java.io.File(
      new java.io.File(wh.root, table + "__log"), f"$n%09d.commit")
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(f.toPath)).asScala.toSeq
      .filterNot(_.startsWith("TS "))
  }

  private def quadWaves(wh: Warehouse, t: String): Unit = {
    import spark.implicits._
    (0 until 4).foreach { w =>
      wh.casAppendStats(spark,
        (w * 10L until w * 10L + 10L).toDF("k")
          .withColumn("v", col("k") * 100L), t, "k")
    }
  }

  test("a mixed CDC batch (delete + update + insert) lands in ONE " +
    "commit — a reader can never see the insert without the delete — " +
    "with per-clause row counts and extent-local classification") {
    import spark.implicits._
    val wh = tmpWh()
    quadWaves(wh, "cx")
    val changes = Seq(
      (25L, 0L, "D"), // delete (quartile 3)
      (27L, -27L, "U"), // update (same wave)
      (200L, -200L, "I") // insert (beyond every extent)
    ).toDF("k", "v", "op")
    val st = wh.casApplyCdc(spark, "cx", "k", changes)
    assert(st.rewrittenCommits == 1 && st.retainedCommits == 3 &&
      st.updatedRows == 1L && st.insertedRows == 1L &&
      st.deletedRows == 1L, st.toString)
    val ls = commitLines(wh, "cx", st.version)
    assert(ls.count(_.startsWith("REPLACES ")) == 1 &&
      ls.count(_.startsWith("ADDS 200 200 ")) == 1, ls.toString)
    val got = wh.casRead(spark, "cx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 40 && !got.contains(25L) &&
      got(27L) == -27L && got(200L) == -200L, got.toString)
  }

  test("a delete for an ABSENT key is a no-op, not an error; a " +
    "pure-delete batch disjoint from every extent publishes NO data " +
    "commit at all") {
    import spark.implicits._
    val wh = tmpWh()
    quadWaves(wh, "ca")
    val head = wh.casHead("ca")
    val st = wh.casApplyCdc(spark, "ca", "k",
      Seq((500L, 0L, "D"), (600L, 0L, "D")).toDF("k", "v", "op"))
    assert(st.version == head && st.deletedRows == 0L &&
      wh.casHead("ca") == head,
      s"nothing to do, nothing published: $st")
    assert(wh.casRead(spark, "ca").count() == 40L)
  }

  test("a pure-delete batch HITTING a wave rewrites it (no insert " +
    "line) and removes exactly the matched rows") {
    import spark.implicits._
    val wh = tmpWh()
    quadWaves(wh, "cp")
    val st = wh.casApplyCdc(spark, "cp", "k",
      Seq((10L, 0L, "D"), (11L, 0L, "D")).toDF("k", "v", "op"))
    assert(st.rewrittenCommits == 1 && st.retainedCommits == 3 &&
      st.deletedRows == 2L && st.insertedRows == 0L &&
      st.updatedRows == 0L, st.toString)
    val ls = commitLines(wh, "cp", st.version)
    assert(ls.count(_.startsWith("REPLACES 12 19 ")) == 1 &&
      !ls.exists(_.startsWith("ADDS 1")), ls.toString)
    assert(wh.casRead(spark, "cp").count() == 38L)
  }

  test("NULL change keys never match: a NULL-keyed delete is a " +
    "no-op, a NULL-keyed upsert INSERTS, and NULL-keyed target rows " +
    "survive every clause") {
    import spark.implicits._
    val wh = tmpWh()
    wh.casAppendStats(spark,
      Seq((Option(1L), 10L), (Option.empty[Long], 999L))
        .toDF("k", "v"), "cn", "k")
    val st = wh.casApplyCdc(spark, "cn", "k",
      Seq((Option.empty[Long], 0L, "D"), (Option(1L), -1L, "U"),
        (Option.empty[Long], -999L, "I")).toDF("k", "v", "op"))
    // two NULL keys in one batch: countDistinct ignores NULLs, so
    // uniqueness holds; both are unmatched — the D no-ops, the I
    // inserts
    assert(st.deletedRows == 0L && st.updatedRows == 1L &&
      st.insertedRows == 1L, st.toString)
    val got = wh.casRead(spark, "cn").collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        r.getLong(1))).toSeq
    assert(got.count(_ == (None, 999L)) == 1 &&
      got.count(_ == (None, -999L)) == 1 &&
      got.count(_ == (Some(1L), -1L)) == 1 && got.size == 3,
      got.toString)
  }

  test("ambiguous batches are rejected loudly: duplicate change " +
    "keys, a missing op column, and wrong data columns") {
    import spark.implicits._
    val wh = tmpWh()
    quadWaves(wh, "cr")
    intercept[IllegalArgumentException] {
      wh.casApplyCdc(spark, "cr", "k",
        Seq((1L, 1L, "U"), (1L, 0L, "D")).toDF("k", "v", "op"))
    }
    intercept[IllegalArgumentException] {
      wh.casApplyCdc(spark, "cr", "k",
        Seq((1L, 1L)).toDF("k", "v"))
    }
    intercept[IllegalArgumentException] {
      wh.casApplyCdc(spark, "cr", "k",
        Seq((1L, "U")).toDF("k", "op"))
    }
  }

  test("cdcSink crash AFTER the apply commit, REAL restart: the " +
    "replayed batch dedups — it does NOT re-delete a key a " +
    "concurrent writer re-inserted in the window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wh = tmpWh()
    quadWaves(wh, "cs")
    val ckpt = java.nio.file.Files
      .createTempDirectory("cdc-ckpt-").toString
    val input = MemoryStream[(Long, Long, String)]
    input.addData((25L, 0L, "D"), (300L, -300L, "U"))
    val crashed = graft.streaming.StreamingEtl.cdcSink(
      input.toDF().toDF("k", "v", "op"), wh, "cs", "k", "op", "c1",
      ckpt, afterApply = () => sys.error("injected crash"))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      crashed.awaitTermination()
    }
    assert(wh.casRead(spark, "cs").filter(col("k") === 25L)
      .count() == 0L, "crash shape: the delete landed")
    // the window: a concurrent writer re-inserts the deleted key
    wh.casMergeInto(spark, "cs", "k", Seq((25L, 2525L)).toDF("k", "v"))
    // restart: batch 0 re-delivers and MUST dedup
    graft.streaming.StreamingEtl.cdcSink(
      input.toDF().toDF("k", "v", "op"), wh, "cs", "k", "op", "c1",
      ckpt).awaitTermination()
    val got = wh.casRead(spark, "cs").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(25L) == 2525L,
      "the re-inserted key SURVIVES the replay — the re-delete the " +
        "TXN marker exists to prevent")
    assert(got(300L) == -300L && got.size == 41)
    // a new batch through the same checkpoint still applies
    input.addData((26L, 0L, "D"))
    graft.streaming.StreamingEtl.cdcSink(
      input.toDF().toDF("k", "v", "op"), wh, "cs", "k", "op", "c1",
      ckpt).awaitTermination()
    assert(wh.casRead(spark, "cs").filter(col("k") === 26L)
      .count() == 0L)
  }

  test("8 REAL threads of round-17 churn — merges, CDC applies, " +
    "CoW updates, cluster rewrites — serialize through the CAS with " +
    "no lost update: the final snapshot is the commutative fold of " +
    "every thread's slice-local operations, the log is contiguous, " +
    "and retention + GC stay healthy") {
    import spark.implicits._
    val wh = tmpWh()
    (0 to 7).foreach(w => wh.casAppendStats(spark,
      (w * 100L until w * 100L + 100L).toDF("k")
        .withColumn("v", col("k") * 100L), "r17", "k"))
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val threads = (0 to 7).map { i =>
      new Thread(() => {
        try {
          i % 4 match {
            case 0 => // merge: one slice-local update + one insert
              wh.casMergeInto(spark, "r17", "k",
                Seq((i * 100L + 1L, -1L), (2000L + i, i.toLong))
                  .toDF("k", "v"), retries = 64)
              ()
            case 1 => // CDC: delete + update + insert, one commit
              wh.casApplyCdc(spark, "r17", "k",
                Seq((i * 100L + 2L, 0L, "D"),
                  (i * 100L + 3L, -3L, "U"),
                  (3000L + i, i.toLong, "I")).toDF("k", "v", "op"),
                retries = 64)
              ()
            case 2 => // copy-on-write update
              wh.casUpdateWhere(spark, "r17", "k", Seq(i * 100L + 4L),
                Map("v" -> (col("v") + 1000000L)), retries = 64)
              ()
            case 3 => // cluster rewrite under churn (content-neutral)
              wh.casClusterBy(spark, "r17", "k", 4, retries = 64)
              ()
          }
        } catch { case t: Throwable => err.compareAndSet(null, t); () }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(180000))
    assert(err.get() == null, s"a writer died: ${err.get()}")
    // 8 base + 2 merges + 2 CDC + 2 updates + 2 clusters, contiguous
    val head = wh.casHead("r17")
    assert(head == 16, s"head $head")
    val commitFiles = Option(new java.io.File(wh.root, "r17__log")
      .listFiles()).getOrElse(Array())
      .count(_.getName.endsWith(".commit"))
    assert(commitFiles == head, s"contiguous log: $commitFiles")
    val expected = scala.collection.mutable.Map[Long, Long]()
    (0L until 800L).foreach(k => expected(k) = k * 100L)
    Seq(0, 4).foreach { i =>
      expected(i * 100L + 1L) = -1L
      expected(2000L + i) = i.toLong
    }
    Seq(1, 5).foreach { i =>
      expected.remove(i * 100L + 2L)
      expected(i * 100L + 3L) = -3L
      expected(3000L + i) = i.toLong
    }
    Seq(2, 6).foreach { i =>
      expected(i * 100L + 4L) = (i * 100L + 4L) * 100L + 1000000L
    }
    val got = wh.casRead(spark, "r17").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected.toMap,
      s"commutative fold whatever the schedule: ${got.size} vs " +
        s"${expected.size}")
    wh.casTruncate("r17")
    wh.casVacuum("r17", minAgeMs = 0L)
    assert(wh.casRead(spark, "r17").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == expected.toMap)
  }

  test("a pure-delete DISJOINT batch in the exactly-once form still " +
    "records its TXN marker (the batch must not re-apply on replay " +
    "after the keys later appear)") {
    import spark.implicits._
    val wh = tmpWh()
    quadWaves(wh, "ct")
    val st = wh.casApplyCdcBatch(spark, "ct", "k",
      Seq((500L, 0L, "D")).toDF("k", "v", "op"), "op", "s1", 0L)
    assert(st.isDefined && st.get.deletedRows == 0L)
    // the key arrives AFTER the delete batch; a replay of batch 0
    // must not delete it
    wh.casMergeInto(spark, "ct", "k", Seq((500L, 1L)).toDF("k", "v"))
    assert(wh.casApplyCdcBatch(spark, "ct", "k",
      Seq((500L, 0L, "D")).toDF("k", "v", "op"), "op", "s1", 0L)
      .isEmpty, "replay dedups on the marker")
    assert(wh.casRead(spark, "ct").filter(col("k") === 500L)
      .count() == 1L, "the late-arriving row survives the replay")
  }
}
