package graft

import org.apache.spark.sql.functions._
import graft.ops.Components

/** Round-7 additions: block-manager hygiene for the iterative
  * component algorithms (the round-6 bench regression), and the bench
  * sweep that makes any future leak visible in the JSON line itself.
  */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  private def ccBlocks: Seq[org.apache.spark.rdd.RDD[_]] =
    spark.sparkContext.getPersistentRDDs.values
      .filter(_.name == Components.rddNamePrefix).toSeq

  test("connected: intermediate rounds are unpersisted as they are " +
    "superseded; release() leaves zero component blocks") {
    assert(ccBlocks.isEmpty, "dirty session: stray component blocks")
    val before = spark.sparkContext.getPersistentRDDs.size
    // a 40-chain + clique graph needs several propagation rounds
    val pairs = ((0 until 40).map(i => (i.toLong, i + 1L)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L))).toDF("doc_a", "doc_b")
    val labels = Components.connected(pairs)
    // live residue is the returned frame's own checkpoint plus the
    // still-referenced edge list at most — NOT one block per round
    assert(ccBlocks.size <= 2,
      s"per-round checkpoints leaked: ${ccBlocks.size} blocks live")
    // consume, then free: nothing of the algorithm's stays cached
    assert(labels.filter($"comp" === 0L).count() == 41)
    Components.release(labels)
    assert(ccBlocks.isEmpty, "release() left component blocks cached")
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "connected() changed the session's persistent-RDD census")
  }

  test("connectedStar: bounded live blocks during the run, zero after " +
    "consume + release") {
    assert(ccBlocks.isEmpty, "dirty session: stray component blocks")
    val before = spark.sparkContext.getPersistentRDDs.size
    // 120-node chain: high diameter, many contraction rounds
    val pairs = (0 until 120).map(i => (i.toLong, i + 1L))
      .toDF("doc_a", "doc_b")
    val labels = Components.connectedStar(pairs)
    // nodes + final edges are the only reachable checkpoints
    assert(ccBlocks.size <= 2,
      s"per-round checkpoints leaked: ${ccBlocks.size} blocks live")
    assert(labels.select("comp").distinct().as[Long].collect()
      .toSeq == Seq(0L))
    Components.release(labels)
    assert(ccBlocks.isEmpty, "release() left component blocks cached")
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "connectedStar() changed the session's persistent-RDD census")
  }

  test("Bench.sweepTransients clears component residue a query left " +
    "behind and reports the count") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val labels = Components.connected(pairs)
    assert(labels.count() == 3) // consume like a bench sink would
    val live = ccBlocks.size
    assert(live > 0, "expected live checkpoint blocks")
    val cleared = Bench.sweepTransients(spark)
    assert(cleared == live)
    assert(ccBlocks.isEmpty, "sweep left tagged blocks cached")
  }

  test("Bench.run hygiene: a component query reports cleared blocks " +
    "and the next query starts clean") {
    val leaky = Q.noOracle("leaky") { (s, _) =>
      import s.implicits._
      Components.connected(
        Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b"))
    }
    val clean = Q.noOracle("clean")((s, _) => {
      import s.implicits._; Seq(1).toDF("x") })
    val res = Bench.run(spark, "/unused", Seq(leaky, clean))
    val byName = res.map(r => r.name -> r.hygiene).toMap
    assert(byName("leaky").cleared > 0,
      "the component query's checkpoint residue must be swept and counted")
    assert(byName("clean").cleared == 0 && byName("clean").retained == 0)
    assert(ccBlocks.isEmpty)
  }

  // ---- round-7 queries ----

  private val sf = "/root/testdata/sf0.001"

  test("q95: grouping-sets grains are consistent (grand total = sum " +
    "of per-segment rows) and expand in ONE aggregation pass") {
    val df = queries.Extras.q95.fn(spark, sf)
    val out = df.collect()
    val total = out.filter(r => r.getLong(2) == 1 && r.getLong(3) == 1)
    val perSeg = out.filter(r => r.getLong(2) == 0 && r.getLong(3) == 1)
    assert(total.length == 1 && perSeg.nonEmpty)
    assert(total.head.getLong(4) == perSeg.map(_.getLong(4)).sum)
    // final AQE plan only (the toString repeats the initial plan)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("Expand"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1,
      "grouping sets must not multiply shuffles:\n" + plan)
  }

  test("q96: unpivot is map-only before the aggregation (no Exchange " +
    "in the reshape) and melts 2 rows per part") {
    val melted = sources.Tables(spark, sf, "part").unpivot(
      Array(col("p_brand")),
      Array(col("p_retailprice").cast("double").as("retailprice"),
        col("p_size").cast("double").as("size")),
      "metric", "v")
    assert(!melted.queryExecution.executedPlan.toString
      .contains("Exchange"))
    val parts = sources.Tables(spark, sf, "part").count()
    assert(melted.count() == 2 * parts)
    assert(queries.Extras.q96.fn(spark, sf)
      .select("metric").distinct().as[String].collect().toSet ==
      Set("retailprice", "size"))
  }

  test("q97: levenshtein pairs stay inside (brand, type) blocks — " +
    "the plan joins on the block key, never a cartesian") {
    val df = queries.Extras.q97.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("cartesian"), plan)
    // every emitted pair is a genuine near-duplicate under the cap
    assert(df.filter($"dist" > 3).count() == 0)
  }

  test("q99: islands math on a constructed streak") {
    // user 1: days 1-3 then 5 (streaks 3+1); user 2: one day
    val events = Seq(
      (1L, "2024-03-01"), (1L, "2024-03-02"), (1L, "2024-03-03"),
      (1L, "2024-03-05"), (2L, "2024-03-09"))
      .toDF("user_id", "d")
      .select($"user_id", to_date($"d").as("day"))
    val rn = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
    val isl = events.distinct()
      .withColumn("anchor",
        date_sub($"day", row_number().over(rn)))
      .groupBy("user_id", "anchor").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(sum("len").as("active"), count(lit(1)).as("streaks"),
        max("len").as("longest"))
    assert(rows(isl) == Set(Seq(1L, 4L, 2L, 3L), Seq(2L, 1L, 1L, 1L)))
  }

  test("q100: MAD flags the planted extreme point and only it") {
    // spread base population (MAD = 5.5, nondegenerate) + one extreme
    val xs = ((91 to 111).map(_.toDouble) ++ Seq(1000.0))
      .zipWithIndex.map { case (v, i) => ("S", i.toLong, v) }
      .toDF("c_mktsegment", "o_custkey", "x")
    val med = xs.groupBy("c_mktsegment")
      .agg(percentile($"x", lit(0.5)).as("med"))
    val dev = xs.join(med, Seq("c_mktsegment"))
      .withColumn("adev", abs($"x" - $"med"))
    val mad = dev.groupBy("c_mktsegment")
      .agg(percentile($"adev", lit(0.5)).as("mad"))
    val flagged = dev.join(mad, Seq("c_mktsegment"))
      .filter(round($"adev" - lit(3) * lit(1.4826) * $"mad", 6) > 0)
    assert(flagged.select("x").as[Double].collect().toSeq == Seq(1000.0))
    // the registered query computes the same thing in ONE pass: the
    // only join is the customer enrich — both medians are window
    // aggregates over one segment partitioning, never join-backs
    val plan = queries.Extras.q100.fn(spark, sf)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Join".r.findAllIn(plan).size <= 1,
      "q100 must not re-join its spend subtree:\n" + plan)
  }

  test("q102: pivot columns reconcile with the unpivoted aggregate " +
    "and the plan has no driver-side value discovery") {
    val df = queries.Extras.q102.fn(spark, sf)
    val byPrio = sources.Tables(spark, sf, "orders")
      .join(sources.Tables(spark, sf, "customer"),
        $"o_custkey" === $"c_custkey")
      .filter($"o_orderpriority" === "1-URGENT")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    val pivotN = df.select($"c_mktsegment", $"n_urgent")
    assert(rows(pivotN) == rows(byPrio))
  }

  test("q103: spine is dense (|nations| × months rows), fills are " +
    "zero-revenue, observed rows are untouched") {
    val df = queries.Extras.q103.fn(spark, sf)
    val nations = sources.Tables(spark, sf, "nation").count()
    val months = df.select("month").distinct().count()
    assert(df.count() == nations * months)
    // month spine has no holes: consecutive first-of-month dates
    val ms = df.select("month").distinct().orderBy("month")
      .as[java.sql.Date].collect()
    ms.sliding(2).foreach { case Array(a, b) =>
      assert(b.toLocalDate == a.toLocalDate.plusMonths(1))
    case _ => () }
    assert(df.filter($"filled" === 1 && ($"n" =!= 0 || $"rev" =!= 0.0))
      .count() == 0)
    val obsSum = df.filter($"filled" === 0).agg(sum("n")).head().getLong(0)
    assert(obsSum == sources.Tables(spark, sf, "orders").count())
  }

  test("winnowing guarantee: docs sharing a >= 6-token run share a " +
    "fingerprint; unrelated docs share none") {
    import queries.Extras
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // shares the 6-token run "gamma delta epsilon zeta eta theta"
      (2L, "one two gamma delta epsilon zeta eta theta three four"),
      (3L, "cold warm hot mild damp dry dusty foggy clear windy"))
      .toDF("doc_id", "text")
    val fps = docs
      .withColumn("t", split($"text", " "))
      .withColumn("hs", Extras.testWinnowGramHashes($"t"))
      .select($"doc_id", explode(Extras.testWinnowFps($"hs")).as("fp"))
    val shared = fps.as("a").join(fps.as("b"), "fp")
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shared == Set((1L, 2L)),
      s"expected only the overlapping pair, got $shared")
  }

  test("q101: percent_rank top decile — pr within [0.9, 1], cume_dist " +
    "≥ pr, and ties share a rank") {
    val df = queries.Extras.q101.fn(spark, sf)
    val bad = df.filter($"pr" < 0.9 || $"pr" > 1.0 || $"cd" < $"pr")
    assert(bad.count() == 0)
    // a duplicated cents value must yield one shared pr
    val ties = Seq(("S", 1L, 100L), ("S", 2L, 100L), ("S", 3L, 200L))
      .toDF("c_mktsegment", "o_custkey", "cents")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_mktsegment").orderBy("cents")
    val pr = ties.withColumn("pr", percent_rank().over(w))
      .filter($"cents" === 100L).select("pr").distinct()
    assert(pr.count() == 1)
  }

  test("q107: the bloom probe is the engine's codegen'd expression " +
    "(no UDF) and the result equals q57 exactly") {
    val df = queries.Extras.q107.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "bloom probe missing from plan:\n" + plan)
    assert(!plan.contains("ScalaUDF"), "UDF leaked into the probe path")
    assert(rows(df) == rows(queries.TextQueries.q57.fn(spark, sf)),
      "bloom pruning changed the answer")
  }

  test("q108: the stored-IVF probe scan prunes buckets (reads only " +
    "the probed cells' buckets) and matches q48 exactly") {
    val df = queries.SimQueries.q108.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(sel.isDefined, "no bucket pruning in the store scan:\n" + plan)
    assert(sel.get.group(1).toInt < sel.get.group(2).toInt,
      s"probe read every bucket: ${sel.get.matched}")
    assert(rows(df) == rows(queries.SimQueries.q48.fn(spark, sf)),
      "stored index changed the answer")
  }

  test("winnowing grams are total under ANSI: sub-3-token docs yield " +
    "an empty gram set instead of an out-of-bounds throw") {
    val df = Seq("", "one", "one two", "one two three")
      .toDF("text").withColumn("t", split(col("text"), " "))
      .withColumn("g", queries.Extras.testWinnowGramHashes(col("t")))
      .select(col("text"), size(col("g")).as("n"))
    assert(df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap ==
      Map("" -> 0, "one" -> 0, "one two" -> 0, "one two three" -> 1))
  }

  test("jsonl ingest: FAILFAST surfaces a corrupt line as an error; " +
    "PERMISSIVE quarantines it in _corrupt_record") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-jsonl-spec").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "part.jsonl")
    val w = new java.io.PrintWriter(f)
    w.println("""{"doc_id": 1, "text": "ok"}""")
    w.println("""{"doc_id": 2, "text": "also ok"}""")
    w.println("""{"doc_id": 3 "text": "missing comma"""")
    w.close()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    val strict = spark.read
      .schema(StructType(schema.fields.dropRight(1)))
      .option("mode", "FAILFAST").json(f.getPath)
    intercept[org.apache.spark.SparkException] { strict.collect() }
    // Spark disallows querying ONLY _corrupt_record from a raw file
    // scan (the column is filled during parsing) — materialize first,
    // per the engine's own guidance
    val loose = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").json(f.getPath)
      .collect()
    assert(loose.count(r => !r.isNullAt(2)) == 1)
    assert(loose.count(_.isNullAt(2)) == 2)
  }

  test("q114/q115: boilerplate detection and coverage reconcile — " +
    "every detected gram spans >= 3 docs, and the per-doc hits sum " +
    "to the detector's occurrence total") {
    val det = queries.Extras.q114.fn(spark, sf).collect()
    assert(det.nonEmpty, "threshold too high: no boilerplate detected")
    assert(det.forall(_.getLong(1) >= 3))
    assert(det.forall(r => r.getLong(2) >= r.getLong(1)),
      "a gram occurs at least once per doc that contains it")
    val cov = queries.Extras.q115.fn(spark, sf)
    // every boilerplate-gram occurrence is exactly one covered
    // position in exactly one doc
    assert(cov.agg(sum($"n_boiler")).head.getLong(0) ==
      det.map(_.getLong(2)).sum)
    assert(cov.filter($"boiler_frac" < 0 || $"boiler_frac" > 1 ||
      $"n_boiler" > $"n_grams").count() == 0)
  }

  test("q116: surprisal bookkeeping is exact — integer micro-bit sums " +
    "divide back to the rounded mean, doc tokens sum to the corpus " +
    "total (the join dropped nothing)") {
    val out = queries.Extras.q116.fn(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, s, a) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 0 && s > 0)
      assert(a == s / n,
        s"avg_ubits $a drifted from its own integer sum $s/$n")
    }
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .select(size(split($"text", " ")).cast("long")).as[Long]
      .collect().sum
    assert(out.map(_.getLong(1)).sum == expected)
  }

  test("Profile: approx variant matches exact within HLL tolerance " +
    "and plans WITHOUT the Expand replication the exact profile pays") {
    val orders = sources.Tables(spark, sf, "orders")
    val cols = Seq("o_orderkey" -> col("o_orderkey"),
      "o_orderstatus" -> col("o_orderstatus"))
    val ex = ops.Profile.profile(orders, cols)
    val ap = ops.Profile.profile(orders, cols, exact = false)
    // two exact countDistincts force Expand (2x input replication);
    // the HLL path is a plain partial-aggregable single pass
    assert(ex.queryExecution.executedPlan.toString.contains("Expand"))
    assert(!ap.queryExecution.executedPlan.toString.contains("Expand"))
    val e = ex.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val a = ap.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // the default rsd is a 5% STANDARD DEVIATION, not a bound — gate
    // at 2 sigma
    e.foreach { case (c, v) =>
      assert(math.abs(a(c) - v) <= math.max(2L, (0.10 * v).toLong),
        s"$c: approx ${a(c)} vs exact $v")
    }
  }

  test("native as-of join: merge semantics on constructed edges — " +
    "inclusive tie, null key/ts never match, unmatched stays null") {
    val l = Seq(
      (Option(1L), Option("2024-01-01 00:10:00"), "p1"),
      (Option(1L), Option("2024-01-01 00:05:00"), "p2"),
      (Option(1L), Option("2024-01-01 00:01:00"), "p3"),
      (Option(2L), Option("2024-01-01 09:00:00"), "p4"),
      (Option.empty[Long], Option("2024-01-01 00:10:00"), "p5"),
      (Option(1L), Option.empty[String], "p6"))
      .toDF("user_id", "ts_s", "pid")
      .select($"user_id", $"ts_s".cast("timestamp").as("ts"), $"pid")
    val r = Seq(
      (Option(1L), Option("2024-01-01 00:05:00"), "c1"),
      (Option(1L), Option("2024-01-01 00:09:00"), "c2"),
      (Option.empty[Long], Option("2024-01-01 00:00:00"), "c3"),
      (Option(2L), Option.empty[String], "c4"))
      .toDF("user_id", "ts_s", "cid")
      .select($"user_id", $"ts_s".cast("timestamp").as("ts"), $"cid")
    val out = plans.AsOfJoin
      .join(l, r, Seq("user_id"), "ts", "ts", Seq("cid"))
      .select($"pid", $"asof_cid")
      .as[(String, Option[String])].collect().toMap
    assert(out == Map(
      "p1" -> Some("c2"),  // latest at-or-before 00:10 is c2@00:09
      "p2" -> Some("c1"),  // inclusive: equal timestamps match
      "p3" -> None,        // before any right row of its key
      "p4" -> None,        // its only right row has a null ts
      "p5" -> None,        // null key never matches (c3 is null-keyed)
      "p6" -> None))       // null left ts never matches
  }

  test("native as-of join: an empty right side yields all-null " +
    "payloads (and the zipped partition counts stay aligned under " +
    "AQE)") {
    val l = Seq((1L, "2024-01-01 00:10:00", "p1"),
      (2L, "2024-01-01 00:20:00", "p2"))
      .toDF("user_id", "ts_s", "pid")
      .select($"user_id", $"ts_s".cast("timestamp").as("ts"), $"pid")
    val r = l.filter(lit(false))
      .select($"user_id", $"ts", $"pid".as("cid"))
    val out = plans.AsOfJoin
      .join(l, r, Seq("user_id"), "ts", "ts", Seq("cid"))
    assert(out.count() == 2)
    assert(out.filter($"asof_cid".isNotNull).count() == 0)
  }

  test("native interval join: inclusive band edges, null key/ts " +
    "dropped, window evicts across keys") {
    def ts(s: String) = s"2024-01-01 $s"
    val l = Seq(
      (Option(1L), Option(ts("00:10:00")), "p1"),
      (Option(2L), Option(ts("00:30:00")), "p2"),
      (Option.empty[Long], Option(ts("00:10:00")), "p3"),
      (Option(1L), Option.empty[String], "p4"))
      .toDF("user_id", "ts_s", "pid")
      .select($"user_id", $"ts_s".cast("timestamp").as("ts"), $"pid")
    val r = Seq(
      (Option(1L), Option(ts("00:09:00")), "c_in"),
      (Option(1L), Option(ts("00:11:00")), "c_edge"),   // exactly +60s
      (Option(1L), Option(ts("00:09:00")), "c_dup"),
      (Option(1L), Option(ts("00:08:59")), "c_out"),    // 61s before
      (Option(1L), Option(ts("00:11:01")), "c_out2"),   // 61s after
      (Option(2L), Option(ts("00:10:00")), "c_prevkey"), // key 2, stale
      (Option(2L), Option(ts("00:30:30")), "c_in2"),
      (Option(2L), Option.empty[String], "c_nullts"),
      (Option.empty[Long], Option(ts("00:10:00")), "c_nullkey"))
      .toDF("user_id", "ts_s", "cid")
      .select($"user_id", $"ts_s".cast("timestamp").as("ts"), $"cid")
    val out = plans.IntervalJoin
      .join(l, r, Seq("user_id"), "ts", "ts", 60L, Seq("cid"))
      .select($"pid", $"band_cid").as[(String, String)]
      .collect().toSeq.sorted
    assert(out == Seq("p1" -> "c_dup", "p1" -> "c_edge",
      "p1" -> "c_in", "p2" -> "c_in2").sorted)
  }

  test("property: native interval join ≡ composed banded range join " +
    "over random non-null keyed tables (multiset)") {
    val gen: org.scalacheck.Gen[(Long, Int)] = for {
      k <- org.scalacheck.Gen.choose(0L, 3L)
      t <- org.scalacheck.Gen.choose(0, 40)
    } yield (k, t)
    def frame(n: Int, seed: Long, tsName: String, idName: String) = {
      val params = org.scalacheck.Gen.Parameters.default
      org.scalacheck.Gen.listOfN(n, gen)
        .pureApply(params, org.scalacheck.rng.Seed(seed))
        .map { case (k, t) => (k, t, k * 1000L + t) }
        .toDF("user_id", "t", idName)
        .select($"user_id",
          timestamp_seconds($"t" * 30).as(tsName), col(idName))
    }
    for (seed <- 1L to 4L) {
      val l = frame(25, seed, "lts", "l_id")
      val r = frame(25, seed + 900, "rts", "r_id")
      def multiset(df: org.apache.spark.sql.DataFrame,
          cols: Seq[String]) =
        df.select(cols.map(col): _*).collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      val native = plans.IntervalJoin
        .join(l, r, Seq("user_id"), "lts", "rts", 90L, Seq("r_id"))
        .withColumnRenamed("band_r_id", "r_id")
        .withColumnRenamed("band_rts", "rts")
      val composed = ops.RangeJoin
        .withinGap(l, r, Seq("user_id"), "lts", "rts", 90L)
      val cols = Seq("user_id", "lts", "l_id", "rts", "r_id")
      assert(multiset(native, cols) == multiset(composed, cols),
        s"mismatch seed=$seed")
    }
  }

  test("q122: the transition matrix is row-stochastic — conditional " +
    "probabilities per prev sum to ~1 and counts cover every " +
    "adjacent pair") {
    val m = queries.Events.q122.fn(spark, sf).collect()
    m.groupBy(_.getString(0)).foreach { case (prev, rs) =>
      val p = rs.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) <= 1e-4, s"p($prev) sums to $p")
    }
    // pair count = total events minus one first-event per user
    val ev = sources.Tables(spark, sf, "events")
    val expected = ev.count() - ev.select($"user_id").distinct().count()
    assert(m.map(_.getLong(2)).sum == expected)
  }

  test("q119: the native plan is AsOfJoinExec with the SMJ contract — " +
    "one exchange per side, no Window, output identical to composed " +
    "q42") {
    val n = queries.Events.q119.fn(spark, sf)
    val plan = n.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("AsOfJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    assert(!plan.contains("Window"), plan)
    assert(rows(n) == rows(queries.Events.q42.fn(spark, sf)))
  }

  test("q120: the keep-list is a partition decision — each doc kept " +
    "at most once, and members across kept rows cover the corpus " +
    "exactly") {
    val keep = queries.TextQueries.q120.fn(spark, sf)
    val ids = keep.select($"doc_id").as[Long].collect()
    assert(ids.distinct.length == ids.length, "a doc kept twice")
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    // components partition the corpus: kept rows' member counts must
    // sum to every document exactly once
    assert(keep.agg(sum($"n_members")).head.getLong(0) == nDocs)
    assert(keep.filter($"n_members" > 1).count() > 0,
      "corpus has planted near-dups; some cluster must be non-trivial")
  }

  test("q121: the global top-20 plans TakeOrderedAndProject (per-" +
    "partition heap), never a single-partition Window") {
    val df = queries.TextQueries.q121.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Window"), plan)
    assert(df.count() <= 20)
  }

  test("q124/q125: entropy bounded by log2(distinct) and dup stats " +
    "reconcile to the corpus") {
    queries.Extras.q124.fn(spark, sf).collect().foreach { r =>
      val (nd, h, dr) = (r.getLong(1), r.getDouble(3), r.getDouble(4))
      // each of the nd terms carries up to 0.5 micro-bit of rounding
      assert(h >= 0 && h <= math.log(nd.toDouble) / math.log(2)
          + nd * 1e-6,
        s"entropy $h outside [0, log2($nd)]")
      assert(dr > 0 && dr <= 1)
    }
    val dup = queries.Extras.q125.fn(spark, sf).collect()
    dup.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        "n_docs = n_distinct + n_dups")
    }
    assert(dup.map(_.getLong(1)).sum ==
      spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("q118: per-prefix top-3 is a WindowGroupLimit plan, " +
    "probabilities are a distribution prefix (sum <= 1, rank-ordered)") {
    val df = queries.Extras.q118.fn(spark, sf)
    assert(df.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"), "top-k must push a group limit")
    val byPrefix = df.collect().groupBy(_.getString(0))
    byPrefix.foreach { case (w1, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getDouble(4)).sum <= 1.0 + 1e-6, s"p sum for $w1")
      // rank order must agree with count order
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(2)).sliding(2).forall(
        p => p.length < 2 || p(0) >= p(1)), s"rank/count disagree: $w1")
    }
  }
}
