package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{CasIvm, Scd}
import graft.sources.Warehouse

/** Round-18 pins: the catalog-tier SCD2 (scd2CatChanges +
  * casMergeInto) carries the full SCD2 invariant suite and is
  * row-identical to the single-writer scd2Merge over multi-day
  * sequences; the CDF-driven rollup maintenance reads ONLY the
  * rewritten waves + appends (poisoned-wave behavioral proof); the
  * long PID mint is collision-free and extent-tight.
  */
class Round18Spec extends SparkSpec {

  private def tmpWh(): Warehouse = Warehouse(
    java.nio.file.Files.createTempDirectory("r18-").toString)

  private def sample(seed: Long, n: Int = 60): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => (rnd.nextInt(40).toLong,
      rnd.nextInt(5).toLong, rnd.nextInt(3).toString))
      .distinctBy(_._1) // one src row per business key (precondition)
      .toDF("k", "a", "b")
  }

  private def hist0(d: DataFrame): DataFrame = d
    .withColumn("current_flag", lit(1L))
    .withColumn("eff_dt", lit(1L))
    .withColumn("exp_dt", lit(null).cast("long"))
    .withColumn("pid", Scd.mintPidLong(col("k"), lit(1L)))

  test("catalog SCD2 invariants over random multi-day sequences: " +
    "one current row per live key, exp >= eff, PID unique across " +
    "history, fixed-point (same-day re-derive is EMPTY), and " +
    "row-identity with scd2Merge after every day") {
    (1L to 4L).foreach { seed =>
      val wh = tmpWh()
      val t = s"dim$seed"
      val day1 = sample(seed)
      wh.casAppendStats(spark, hist0(day1), t, "pid")
      var full = hist0(day1)
      (2L to 4L).foreach { day =>
        val src = sample(seed * 100 + day)
        val cur = wh.casRead(spark, t)
        val changes = Scd.scd2CatChanges(src, cur, Seq("k"),
          Seq("a", "b"), lit(day),
          ks => Scd.mintPidLong(ks.head, lit(day)))
        wh.casMergeInto(spark, t, "pid", changes)
        full = Scd.scd2Merge(src, full, Seq("k"), Seq("a", "b"),
          lit(day), pidCol = Some("pid"),
          mint = (ks, eff) => Scd.mintPidLong(ks.head, eff))
        val now = wh.casRead(spark, t).persist()
        try {
          assert(now.exceptAll(full).count() == 0 &&
            full.exceptAll(now).count() == 0,
            s"seed=$seed day=$day: catalog form diverged from " +
              "scd2Merge")
          val maxCur = now.filter(col("current_flag") === 1)
            .groupBy("k").count().agg(max("count")).head().getLong(0)
          assert(maxCur == 1L, s"seed=$seed day=$day: multiple " +
            "current rows")
          assert(now.filter(col("exp_dt").isNotNull &&
            col("exp_dt") < col("eff_dt")).count() == 0,
            s"seed=$seed day=$day: exp < eff")
          assert(now.groupBy("pid").count()
            .filter(col("count") > 1).count() == 0,
            s"seed=$seed day=$day: PID collision")
          // fixed-point: the SAME extract re-derived against the
          // landed state changes nothing
          val again = Scd.scd2CatChanges(src, now, Seq("k"),
            Seq("a", "b"), lit(day),
            ks => Scd.mintPidLong(ks.head, lit(day)))
          assert(again.count() == 0,
            s"seed=$seed day=$day: not a fixed-point")
        } finally { now.unpersist(); () }
      }
    }
  }

  test("catalog SCD2 write cost is O(changed): an unchanged " +
    "re-extract lands ZERO rows and ZERO commits; a one-key change " +
    "rewrites only the extent-hit wave") {
    import spark.implicits._
    val wh = tmpWh()
    val day1 = (0L until 80L).map(k => (k, k % 5, "x")).toDF("k", "a", "b")
    // four range-disjoint PID waves
    (0 until 4).foreach { w =>
      wh.casAppendStats(spark, hist0(day1.filter(
        col("k") >= w * 20L && col("k") < w * 20L + 20L)),
        "dim", "pid")
    }
    val cur = wh.casRead(spark, "dim")
    assert(Scd.scd2CatChanges(day1, cur, Seq("k"), Seq("a", "b"),
      lit(2L), ks => Scd.mintPidLong(ks.head, lit(2L)))
      .count() == 0, "unchanged extract → empty change set")
    // one changed key in the third PID wave
    val day2 = day1.withColumn("a",
      when(col("k") === 45L, lit(99L)).otherwise(col("a")))
    val st = wh.casMergeInto(spark, "dim", "pid",
      Scd.scd2CatChanges(day2, cur, Seq("k"), Seq("a", "b"),
        lit(2L), ks => Scd.mintPidLong(ks.head, lit(2L))))
    assert(st.rewrittenCommits == 1 && st.retainedCommits == 3,
      "the expire touched ONLY the wave the old version lives in")
    assert(st.updatedRows == 1L && st.insertedRows == 1L)
  }

  test("the CDF-driven maintenance reads ONLY the rewritten waves " +
    "and appends: with a NON-HIT source wave physically gone from " +
    "disk, the post-delete maintenance still lands incrementally " +
    "and exactly (an O(table) refresh would fail loudly)") {
    import spark.implicits._
    val wh = tmpWh()
    // four range-disjoint waves on k; g = k % 3
    (0 until 4).foreach { w =>
      wh.casAppendStats(spark, (w * 100L until w * 100L + 100L)
        .map(k => (k, k % 3, k)).toDF("k", "g", "v"), "src", "k")
    }
    assert(CasIvm.maintainSumCount(
      spark, wh, "src", "roll", "g", "v") == "bootstrap")
    // CoW delete confined to wave 2's extent: rewrites 1 of 4
    wh.casDeleteWhere(spark, "src", "k", Seq(150L, 160L, 170L))
    // expected rollup, computed while every wave is still readable
    val expected = rows(wh.casRead(spark, "src").groupBy(col("g"))
      .agg(sum("v").cast("long").as("sum_v"),
        count(lit(1)).as("n_rows")))
    // poison wave 3 (keys 200..299) — NOT hit by the delete
    val w3 = wh.casPrunedCommits("src", 250L, 250L)._1
    assert(w3.size == 1)
    def rm(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    rm(java.nio.file.Paths.get(w3.head))
    assert(CasIvm.maintainSumCount(
      spark, wh, "src", "roll", "g", "v") == "incremental",
      "the signed feed absorbed the delete without touching the " +
        "non-hit waves")
    assert(rows(wh.casRead(spark, "roll")) == expected)
  }

  test("mintPidLong: collision-free across (key, day) and " +
    "extent-tight — every day-d PID sits strictly above every " +
    "day-(d-1) PID") {
    import spark.implicits._
    val pids = (1L to 3L).flatMap(d => (0L until 1000L).map(k =>
      (d, k))).toDF("d", "k")
      .select(col("d"), col("k"),
        Scd.mintPidLong(col("k"), col("d")).as("pid"))
    assert(pids.groupBy("pid").count().filter(col("count") > 1)
      .count() == 0, "collision")
    val perDay = pids.groupBy("d").agg(min("pid").as("lo"),
      max("pid").as("hi")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(perDay(2L)._1 > perDay(1L)._2 &&
      perDay(3L)._1 > perDay(2L)._2,
      "a day's versions must land ABOVE all history — the " +
        "tight-extent insert-wave property")
  }
}
