package graft

import org.apache.spark.sql.functions._
import graft.ops.{AsOf, Skew}

class AsOfSkewSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("AsOf.join: latest right row at-or-before, per key; null when " +
    "no prior; inclusive on equal timestamps") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // after r2
      (2L, 10L, ts("2024-01-01 08:59:59")),  // before everything
      (3L, 10L, ts("2024-01-01 09:30:00")),  // equal to r1 ts → inclusive
      (4L, 20L, ts("2024-01-01 12:00:00")))  // other key, no right rows
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, 10L, ts("2024-01-01 09:30:00")), // r1
      (102L, 10L, ts("2024-01-01 09:45:00"))) // r2
      .toDF("event_id", "user_id", "ts")
    val out = AsOf.join(left, right, Seq("user_id"), "ts", "ts",
      Seq("event_id"))
      .select($"event_id", $"asof_event_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(1L).contains(102L))
    assert(out(2L).isEmpty)
    assert(out(3L).contains(101L)) // inclusive match
    assert(out(4L).isEmpty)
  }

  test("RangeJoin.withinGap: inclusive ±gap bounds, cross-band " +
    "matches, no duplicate pairs") {
    import graft.ops.RangeJoin
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:10:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 10:10:00")))
      .toDF("p_id", "user_id", "ts_p")
    val right = Seq(
      (101L, 10L, ts("2024-01-01 10:00:00")), // exactly -600s of p1
      (102L, 10L, ts("2024-01-01 10:20:00")), // exactly +600s of p1
      (103L, 10L, ts("2024-01-01 10:20:01")), // 601s → out
      (104L, 10L, ts("2024-01-01 11:55:00")), // near p2, crosses band
      (105L, 30L, ts("2024-01-01 10:10:00"))) // other key
      .toDF("c_id", "user_id", "ts_c")
    val out = RangeJoin.withinGap(left, right, Seq("user_id"),
      "ts_p", "ts_c", 600L)
      .select($"p_id", $"c_id").as[(Long, Long)].collect().toSeq
    assert(out.size == out.distinct.size) // no dupes from banding
    assert(out.toSet == Set((1L, 101L), (1L, 102L), (2L, 104L)))
  }

  // one key owning 90% of both sides — the adversarial distribution
  // for the native temporal joins, whose parallelism is bounded by key
  // cardinality (ClusteredDistribution on the join key): the hot key's
  // merge runs in ONE task, by design. These pin that correctness
  // survives that shape; the bound itself is documented in the
  // operators' scaladoc.
  private def hotKey(i: Int): Long =
    if (i % 10 != 0) 1L else ((i / 10) % 50 + 2).toLong

  private def skewedSides() = {
    val base = ts("2024-01-01 00:00:00").getTime
    def t(sec: Long) = new java.sql.Timestamp(base + sec * 1000)
    // multiplicative offsets mod a prime: distinct per-side timestamps
    // (no (key, ts) right-side ties), deterministic across runs
    val left = (1 to 2000).map(i =>
      (i.toLong, hotKey(i), t((i * 37) % 4999))).toDF("event_id", "user_id", "ts")
    val right = (1 to 600).map(j =>
      (10000L + j, hotKey(j), t((j * 91) % 4999))).toDF("event_id", "user_id", "ts")
    (left, right)
  }

  test("native as-of join: a 90%-hot key produces exactly the composed " +
    "form's rows (the hot key serializes into one task, correctly)") {
    val (left, right) = skewedSides()
    val nat = plans.AsOfJoin.join(left, right, Seq("user_id"), "ts", "ts",
      Seq("event_id"))
      .select($"event_id", $"user_id", $"ts", $"asof_ts", $"asof_event_id")
    val comp = AsOf.join(left, right, Seq("user_id"), "ts", "ts",
      Seq("event_id"))
      .select($"event_id", $"user_id", $"ts", $"asof_ts", $"asof_event_id")
    assert(nat.count() === 2000L)
    assert(rows(nat) == rows(comp))
  }

  test("native interval join: a 90%-hot key produces exactly the " +
    "composed banded form's pairs") {
    val (left, right) = skewedSides()
    val nat = plans.IntervalJoin.join(left, right, Seq("user_id"),
      "ts", "ts", 120L, Seq("event_id"))
      .select($"event_id", $"band_event_id")
    val r2 = right.withColumnRenamed("event_id", "r_event_id")
      .withColumnRenamed("ts", "r_ts")
    val comp = graft.ops.RangeJoin.withinGap(left, r2, Seq("user_id"),
      "ts", "r_ts", 120L)
      .select($"event_id", $"r_event_id".as("band_event_id"))
    assert(rows(nat) == rows(comp))
    assert(nat.count() > 0, "hot key must actually produce pairs")
  }

  test("Skew.saltedJoin equals the plain join on a skewed key " +
    "distribution (inner, left, left_semi)") {
    val big = (1 to 500).map(i => (if (i <= 450) 1L else i.toLong,
      i.toDouble)).toDF("k", "v") // heavy skew on k=1
    val small = Seq((1L, "hot"), (7L, "x"), (999L, "unmatched"))
      .toDF("k", "name")
    for (jt <- Seq("inner", "left", "left_semi")) {
      val plain = big.join(small, Seq("k"), jt)
      val salted = Skew.saltedJoin(big, small, Seq("k"), 8, jt)
      assert(salted.count() == plain.count(), jt)
      val ps = plain.agg(round(sum("v"), 6)).head().getDouble(0)
      val ss = salted.agg(round(sum("v"), 6)).head().getDouble(0)
      assert(ps == ss, jt)
      assert(rows(salted) == rows(plain), jt)
    }
  }

  test("Skew.saltedJoin: the content salt actually spreads a hot key " +
    "— no salt bucket owns more than 2/nSalts of its rows") {
    // 10k hot-key rows with payload-bearing (distinct) columns — the
    // input class the op is FOR; full-duplicate rows are the
    // documented degenerate case and are excluded by construction
    val nSalts = 16
    val big = (1 to 10000).map(i => (1L, i.toDouble)).toDF("k", "v")
    val shares = big
      .withColumn("__salt", Skew.contentSalt(big, nSalts))
      .groupBy("__salt").count()
    assert(shares.count() == nSalts, "every salt value must be hit")
    val maxShare = shares.agg(max("count")).head().getLong(0)
    assert(maxShare <= 2L * 10000 / nSalts,
      s"hot key concentrated: max salt bucket $maxShare of 10000")
  }
}
