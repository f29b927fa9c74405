package graft

import org.apache.spark.sql.functions._
import graft.ops.{Cdc, Scd}

/** SCD merge semantics + the SURVEY §5.4 property-style invariants:
  * SCD1 idempotence, SCD2 single-current-version, CDC re-run appends
  * zero rows, null-safe change detection.
  */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def tgt = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
    (5L, null.asInstanceOf[String], 50.0)).toDF("k", "s", "v")
  private def src = Seq(
    (1L, "a2", 10.0),                       // changed attr
    (2L, "b", 20.0),                        // unchanged
    (4L, "d", 40.0),                        // new key
    (5L, null.asInstanceOf[String], 50.0))  // null attr, unchanged
    .toDF("k", "s", "v")

  test("scd1Merge: src wins on present keys, tgt-only passes through") {
    val out = Scd.scd1Merge(src, tgt, Seq("k"), Seq("s", "v"))
    assert(rows(out) == Set(
      Seq(1L, "a2", 10.0), Seq(2L, "b", 20.0), Seq(3L, "c", 30.0),
      Seq(4L, "d", 40.0), Seq(5L, null, 50.0)))
  }

  test("scd1Merge is idempotent: merge(src, merge(src, tgt)) == " +
    "merge(src, tgt)") {
    val once = Scd.scd1Merge(src, tgt, Seq("k"), Seq("s", "v"))
    val twice = Scd.scd1Merge(src, once, Seq("k"), Seq("s", "v"))
    assert(rows(once) == rows(twice))
  }

  private val asOf = java.sql.Date.valueOf("2024-01-01")
  private val eff0 = java.sql.Date.valueOf("2020-01-01")

  private def hist = Seq(
    (1L, "a", 1L, eff0, null.asInstanceOf[java.sql.Date]),
    (2L, "b", 1L, eff0, null.asInstanceOf[java.sql.Date]),
    (2L, "old", 0L, java.sql.Date.valueOf("2019-01-01"), eff0),
    (5L, null.asInstanceOf[String], 1L, eff0,
      null.asInstanceOf[java.sql.Date]))
    .toDF("k", "s", "current_flag", "eff_dt", "exp_dt")

  private def src2 = Seq((1L, "a2"), (2L, "b"), (4L, "d"),
    (5L, null.asInstanceOf[String])).toDF("k", "s")

  test("scd2Merge: changed key expires old + appends fresh; unchanged " +
    "and null-attr keys untouched; new key appended current") {
    val out = Scd.scd2Merge(src2, hist, Seq("k"), Seq("s"), lit(asOf))
      .persist()
    // exactly one current version per live key
    val curCounts = out.filter($"current_flag" === 1)
      .groupBy("k").count().as[(Long, Long)].collect().toMap
    assert(curCounts == Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 5L -> 1L))
    // key 1: old row expired at asOf, fresh row effective asOf
    val k1 = out.filter($"k" === 1).orderBy("current_flag")
      .select("s", "current_flag", "eff_dt", "exp_dt").collect()
    assert(k1(0).getString(0) == "a" && k1(0).getLong(1) == 0L &&
      k1(0).getDate(3) == asOf)
    assert(k1(1).getString(0) == "a2" && k1(1).getLong(1) == 1L &&
      k1(1).getDate(2) == asOf && k1(1).isNullAt(3))
    // unchanged key 2 keeps its two historical rows untouched
    assert(out.filter($"k" === 2).count() == 2)
    assert(out.filter($"k" === 2 && $"current_flag" === 1)
      .head().getDate(3) == eff0)
    // null attr compared null-safely → no spurious new version for 5
    assert(out.filter($"k" === 5).count() == 1)
    // expire >= effective everywhere
    assert(out.filter($"exp_dt".isNotNull && $"exp_dt" < $"eff_dt")
      .count() == 0)
    // re-running the same merge changes nothing (idempotence)
    val again = Scd.scd2Merge(src2, out, Seq("k"), Seq("s"), lit(asOf))
    assert(rows(again) == rows(out))
  }

  test("scd2Merge with pidCol: PID unique across history, one current " +
    "PID per key, expired rows keep theirs, idempotent") {
    val histP = hist.withColumn("pid", Scd.mintPid(Seq($"k"), $"eff_dt"))
    val out = Scd.scd2Merge(src2, histP, Seq("k"), Seq("s"), lit(asOf),
      pidCol = Some("pid")).persist()
    // PID unique across the whole history
    assert(out.select("pid").distinct().count() == out.count())
    // exactly one current PID per live business key
    assert(out.filter($"current_flag" === 1).groupBy("k")
      .count().filter($"count" =!= 1).count() == 0)
    // pre-existing versions keep their original surrogate key
    val kept = out.join(histP.select($"k", $"eff_dt",
      $"pid".as("pid0")), Seq("k", "eff_dt"))
    assert(kept.filter($"pid" =!= $"pid0").count() == 0)
    // appended version for changed key 1 carries the (k, asOf) pid
    assert(out.filter($"k" === 1 && $"current_flag" === 1)
      .head().getAs[String]("pid") ==
      out.sparkSession.range(1).select(
        Scd.mintPid(Seq(lit(1L)), lit(asOf))).head().getString(0))
    // re-running the same merge changes nothing (PID stability)
    val again = Scd.scd2Merge(src2, out, Seq("k"), Seq("s"), lit(asOf),
      pidCol = Some("pid"))
    assert(rows(again) == rows(out))
    out.unpersist()
  }

  test("Cdc.newRows: re-running an incremental load appends zero rows") {
    val fact = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val srcAll = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
    val delta = Cdc.newRows(srcAll, fact, Seq("id"))
    assert(rows(delta) == Set(Seq(3L, "z")))
    val afterAppend = fact.unionByName(delta)
    assert(Cdc.newRows(srcAll, afterAppend, Seq("id")).count() == 0)
  }
}
