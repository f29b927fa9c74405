package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Q, SessionScratch}
import graft.sources.{Tables, Warehouse}

/** Round-19 additions: retention-aware maintainer recovery over the
  * typed change-feed consult (q322). Same determinism policy as
  * Extras6/7: injected clocks, modulo-derived change sets,
  * SessionScratch.once so Verify and Bench re-runs read one build.
  */
object Extras8 {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** RETENTION × LAGGING MAINTAINER — the crossing that WILL happen
    * at 100 TB, exercised both ways. A SUM/COUNT rollup registers
    * with its source ([[graft.sources.Warehouse.casSubscribe]] — the
    * cursor already lives as a TXN line on the rollup's own log; the
    * registration is the pointer retention needs to find it). Then
    * the maintainer lags behind an append + compaction and
    * [[graft.sources.Warehouse.casTruncate]] runs TWICE:
    *
    *  1. DEFAULT: the registered cursor CLAMPS the retention floor —
    *     the lagging window survives, the truncate reports the
    *     lagging stream (the warn seam), and the next maintenance is
    *     still `incremental` (m2).
    *  2. `strandSubscribers = true` (the deliberate override:
    *     retention pressure beats a wedged maintainer): the window IS
    *     retired, and the next maintenance sees the typed
    *     [[graft.sources.CasCdfResult.Retired]] verdict and DEGRADES
    *     to `refresh` from the consulted head (m3) — exact rollup, no
    *     error, instead of the r18 loud death.
    *
    * A further CoW delete then proves the stream RECOVERED: m4 is
    * `incremental` again. The oracle restates the surviving corpus's
    * GROUP BY; the four modes, both truncations' lagging-stream
    * reports, and the strand actually retiring commits ride as
    * structural evidence.
    *
    * 100 TB shape: a slow maintainer no longer turns a scheduled
    * retention job into a pipeline outage — by default retention
    * waits (and SAYS which stream held it back, the operational
    * signal to fix or strand), and a deliberate strand costs the
    * maintainer one snapshot recompute, after which it is O(delta)
    * again.
    */
  val q322 = Q("q322_ivm_retention_recovery",
    """SELECT CAST(doc_id % 7 AS BIGINT) AS g,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_v,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  'bootstrap' AS m1, 'incremental' AS m2, 'refresh' AS m3,
      |  'incremental' AS m4,
      |  CAST(1 AS BIGINT) AS lag1, CAST(1 AS BIGINT) AS lag2,
      |  CAST(1 AS BIGINT) AS strand_retired
      |FROM documents
      |WHERE doc_id % 101 <> 0 AND doc_id % 89 <> 0
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"rtn_${SessionScratch.keyOf(dir)}"))
    val key = s"ivm_rtn_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 7).as("g"),
          col("n_chars").as("v"))
      val maxId = d.agg(max("doc_id")).as[Long].head()
      val half = (maxId + 1L) / 2L
      def maintain(): String = graft.ops.CasIvm.maintainSumCount(
        s, wh, "rtn_src", "rtn_roll", "g", "v")
      wh.casAppendStats(s, d.filter(col("doc_id") < half),
        "rtn_src", "doc_id")
      val m1 = maintain()
      // the retention handshake: the registration is the pointer
      // from source to the rollup-log cursor
      wh.casSubscribe("rtn_src", "ivm:rtn_src", "rtn_roll")
      // the maintainer lags behind an append + a compaction fold
      wh.casAppendStats(s, d.filter(col("doc_id") >= half),
        "rtn_src", "doc_id")
      wh.casReplace(s, "rtn_src")(cur => cur)
      var lag1 = Seq.empty[(String, Int)]
      wh.casTruncate("rtn_src", onLagging = l => lag1 = l)
      val m2 = maintain() // the clamp held the window
      // lag again behind a GDPR delete + fold, then STRAND
      wh.casDeleteWhereKeys(s, "rtn_src", "doc_id",
        d.filter(col("doc_id") % 101 === 0).select("doc_id"))
      wh.casReplace(s, "rtn_src")(cur => cur)
      var lag2 = Seq.empty[(String, Int)]
      val retired = wh.casTruncate("rtn_src",
        strandSubscribers = true, onLagging = l => lag2 = l)
      val m3 = maintain() // typed Retired verdict -> refresh, exact
      // and the stream RECOVERS: the next CoW delete is O(delta)
      wh.casDeleteWhereKeys(s, "rtn_src", "doc_id",
        d.filter(col("doc_id") % 89 === 0).select("doc_id"))
      val m4 = maintain()
      wh.overwrite(Seq((m1, m2, m3, m4, lag1.size.toLong,
        lag2.size.toLong, if (retired > 0) 1L else 0L))
        .toDF("m1", "m2", "m3", "m4", "lag1", "lag2",
          "strand_retired"), "rtn_evidence")
    }
    wh.casRead(s, "rtn_roll")
      .select(col("g"), col("sum_v"), col("n_rows"))
      .crossJoin(wh.read(s, "rtn_evidence"))
  }

  /** N:M JOIN-MV MAINTENANCE — the fact⋈fact shape a metric layer
    * actually hits, with DUPLICATE KEYS ON BOTH SIDES: side A is
    * lineitem's first-three line numbers per order (≤3 rows per
    * key), side B its second-and-later lines (≤6 rows per key), the
    * MV their key-grain pair set. [[graft.ops.CasIvm.maintainJoin]]
    * needs no unique-key contract: affected-key recompute is
    * multiplicity-blind (the only keys whose PAIR SET can change are
    * those in ΔA ∪ ΔB), and the landing is
    * [[graft.sources.Warehouse.casReplaceKeys]] — each affected
    * key's pairs swapped WHOLESALE in one fenced commit, so growing
    * a key's multiplicity (the line-3 append, j2) and a CoW delete
    * shrinking hundreds of keys' pair sets to zero (j3) both stay
    * `incremental`. The oracle restates the surviving A⋈B
    * arithmetically and COMPUTES the duplicate-key evidence (max
    * per-key multiplicity on each side) from the same corpus — the
    * N:M-ness is pinned by data, not asserted.
    *
    * 100 TB shape: the maintenance cost is O(affected keys'
    * extent-hit waves on both sides + their pair sets) — a metric
    * MV over two fact streams absorbs a day's appends and GDPR
    * deletes without the unique-key escape hatch r18 needed.
    */
  val q323 = Q("q323_ivm_join_nm",
    """WITH a AS (
      |  SELECT l_orderkey AS k, CAST(l_linenumber AS BIGINT) AS va
      |  FROM lineitem
      |  WHERE l_linenumber <= 3 AND l_orderkey % 53 <> 0),
      |b AS (
      |  SELECT l_orderkey AS k, CAST(l_partkey % 1000 AS BIGINT) AS vb
      |  FROM lineitem WHERE l_linenumber >= 2),
      |da AS (SELECT CAST(max(c) AS BIGINT) AS dupa
      |  FROM (SELECT count(*) AS c FROM a GROUP BY k)),
      |db AS (SELECT CAST(max(c) AS BIGINT) AS dupb
      |  FROM (SELECT count(*) AS c FROM b GROUP BY k))
      |SELECT CAST(a.k % 10 AS BIGINT) AS gk,
      |  CAST(sum(va) AS BIGINT) AS sum_va,
      |  CAST(sum(vb) AS BIGINT) AS sum_vb,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  'bootstrap' AS j1, 'incremental' AS j2, 'incremental' AS j3,
      |  (SELECT dupa FROM da) AS dupa, (SELECT dupb FROM db) AS dupb
      |FROM a JOIN b ON a.k = b.k
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"jnm_${SessionScratch.keyOf(dir)}"))
    val key = s"ivm_jnm_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"),
          col("l_linenumber").cast("long").as("ln"),
          (col("l_partkey") % 1000).cast("long").as("pk"))
      def m(): String = graft.ops.CasIvm.maintainJoin(
        s, wh, "jnm_a", "jnm_b", "jnm_mv", "k")
      wh.casAppendStats(s, li.filter(col("ln") <= 2)
        .select(col("k"), col("ln").as("va")), "jnm_a", "k")
      wh.casAppendStats(s, li.filter(col("ln") >= 2)
        .select(col("k"), col("pk").as("vb")), "jnm_b", "k")
      val j1 = m()
      // a key's multiplicity GROWS: the third line lands on side A
      wh.casAppendStats(s, li.filter(col("ln") === 3)
        .select(col("k"), col("ln").as("va")), "jnm_a", "k")
      val j2 = m()
      // the CoW delete: whole keys leave side A -> all their pairs
      // leave the MV, still incremental
      wh.casDeleteWhereKeys(s, "jnm_a", "k",
        li.filter(col("k") % 53 === 0).select("k").distinct())
      val j3 = m()
      val dupa = wh.casRead(s, "jnm_a").groupBy("k")
        .agg(count(lit(1)).as("c")).agg(max("c")).as[Long].head()
      val dupb = wh.casRead(s, "jnm_b").groupBy("k")
        .agg(count(lit(1)).as("c")).agg(max("c")).as[Long].head()
      wh.overwrite(Seq((j1, j2, j3, dupa, dupb))
        .toDF("j1", "j2", "j3", "dupa", "dupb"), "jnm_evidence")
    }
    wh.casRead(s, "jnm_mv")
      .groupBy((col("k") % 10).as("gk"))
      .agg(sum("va").cast("long").as("sum_va"),
        sum("vb").cast("long").as("sum_vb"),
        count(lit(1)).as("n_pairs"))
      .crossJoin(wh.read(s, "jnm_evidence"))
  }

  /** STREAMING × BATCH DML CROSSING — a CoW GDPR delete lands
    * BETWEEN micro-batches of a live streaming MV
    * ([[graft.streaming.StreamingEtl.ivmSink]]): because the sink's
    * maintenance consumes the source's retraction-carrying CDF
    * window — every commit since its cursor, not just its own
    * appends — the foreign delete is absorbed MID-STREAM as part of
    * the next trigger's `incremental` run (m2), never a refresh,
    * never a stale rollup. Documents stream in three waves; after
    * wave 1 a batch-tier delete removes the doc_id%101 rows landed
    * so far (so the oracle's surviving set is "%101 hit AND in wave
    * 1" removed — later waves re-land their %101 rows). The catalog
    * pin stays pair-consistent throughout (q317's contract), and
    * CasChangesSpec + Round19Spec pin the crash-replay matrix.
    *
    * 100 TB shape: GDPR jobs are batch, metric layers are streaming
    * — they WILL interleave; the CDF-windowed maintenance makes the
    * crossing O(delta) instead of a stream restart + backfill.
    */
  val q324 = Q("q324_streaming_cdf_delete",
    """SELECT CAST(doc_id % 7 AS BIGINT) AS g,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_v,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  'bootstrap' AS m1, 'incremental' AS m2, 'incremental' AS m3
      |FROM documents
      |WHERE NOT (doc_id % 101 = 0 AND doc_id % 3 = 0)
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"scd_${SessionScratch.keyOf(dir)}"))
    val key = s"stream_cdf_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = s.sqlContext
      val d = t(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 7).as("g"),
          col("n_chars").as("v"))
      val ckpt = java.nio.file.Files
        .createTempDirectory("scdf-ckpt-").toString
      val feed = MemoryStream[(Long, Long, Long)]
      val modes = scala.collection.mutable.ArrayBuffer.empty[String]
      def drain(): Unit =
        graft.streaming.StreamingEtl.ivmSink(
          feed.toDF().toDF("doc_id", "g", "v"), wh, "scdf_src",
          "scdf_roll", "g", "v", "docs", ckpt,
          m => { modes += m; () }).awaitTermination()
      feed.addData(d.filter(col("doc_id") % 3 === 0)
        .as[(Long, Long, Long)].collect().toSeq: _*)
      drain()
      // the batch-tier GDPR delete, between triggers: removes the
      // %101 rows landed so far (wave 1 = doc_id%3==0)
      wh.casDeleteWhereKeys(s, "scdf_src", "doc_id",
        d.filter(col("doc_id") % 101 === 0).select("doc_id"))
      (1 until 3).foreach { w =>
        feed.addData(d.filter(col("doc_id") % 3 === w)
          .as[(Long, Long, Long)].collect().toSeq: _*)
        drain()
      }
      wh.overwrite(Seq((modes(0), modes(1), modes(2)))
        .toDF("m1", "m2", "m3"), "scdf_evidence")
    }
    wh.catRead(s, "scdf_roll")
      .select(col("g"), col("sum_v"), col("n_rows"))
      .crossJoin(wh.read(s, "scdf_evidence"))
  }

  /** SCD2 × IVM COMPOSITION — a FILTERED sum/count MV over the SCD2
    * dimension's CURRENT rows (`where current_flag = 1`,
    * [[graft.ops.CasIvm.maintainSumCount]]'s filtered form), grouped
    * by the tracked attribute itself, maintained incrementally
    * across TWO q319-style day-rolls. Each roll is ONE
    * [[graft.sources.Warehouse.casMergeInto]] of exactly the SCD2
    * writes ([[graft.ops.Scd.scd2CatChanges]]): the expire rewrite
    * RETRACTS a changed key's old current version (its group
    * decrements), the expired flag-0 twin is filtered out of the
    * feed, and the fresh flag-1 version INCREMENTS its (possibly
    * new) attribute group — so rows MOVE BETWEEN GROUPS at O(changed
    * keys), with no history rescan and no refresh (the mode
    * evidence). The oracle restates the final current rows
    * arithmetically: day 2 moves %97-keys of quartile 3 to nat+100,
    * day 3 moves %13-keys of quartile 2 to nat+100, day 2 also
    * births brand-new %211 keys.
    *
    * 100 TB shape: the "current state of the dimension" metric every
    * BI layer serves costs O(changed keys + touched groups) per
    * day-roll — versioned history and live rollup maintained from
    * the same commits, never recomputed.
    */
  val q325 = Q("q325_scd2_ivm_rollup",
    """WITH q AS (
      |  SELECT CAST(floor((max(c_custkey) + 1) / 4) AS BIGINT) AS qs
      |  FROM customer),
      |cur AS (
      |  SELECT c_custkey AS k,
      |    CAST(c_nationkey AS BIGINT)
      |      + CASE WHEN c_custkey % 97 = 0
      |          AND c_custkey >= 2 * qs AND c_custkey < 3 * qs
      |        THEN 100 ELSE 0 END
      |      + CASE WHEN c_custkey % 13 = 0
      |          AND c_custkey >= qs AND c_custkey < 2 * qs
      |        THEN 100 ELSE 0 END AS nat
      |  FROM customer, q
      |  UNION ALL
      |  SELECT c_custkey + 10000000, CAST(c_nationkey AS BIGINT)
      |  FROM customer WHERE c_custkey % 211 = 0)
      |SELECT nat, CAST(sum(k) AS BIGINT) AS sum_v,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  'bootstrap' AS m1, 'incremental' AS m2, 'incremental' AS m3
      |FROM cur GROUP BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"s2iv_${SessionScratch.keyOf(dir)}"))
    val key = s"scd2_ivm_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val c = t(s, dir, "customer")
      val day1 = c.select(col("c_custkey").as("cust_id"),
        col("c_nationkey").cast("long").as("nat"))
      val maxId = day1.agg(max("cust_id")).as[Long].head()
      val qs = (maxId + 1L) / 4L
      def hist0(d: org.apache.spark.sql.DataFrame) = d
        .withColumn("current_flag", lit(1L))
        .withColumn("eff_dt", lit(1L))
        .withColumn("exp_dt", lit(null).cast("long"))
        .withColumn("pid",
          graft.ops.Scd.mintPidLong(col("cust_id"), lit(1L)))
      def m(): String = graft.ops.CasIvm.maintainSumCount(
        s, wh, "s2iv_dim", "s2iv_roll", "nat", "cust_id",
        where = Some(col("current_flag") === 1L))
      Seq((0L, qs), (qs, 2 * qs), (2 * qs, 3 * qs), (3 * qs, maxId + 1))
        .foreach { case (lo, hi) =>
          wh.casAppendStats(s, hist0(day1.filter(
            col("cust_id") >= lo && col("cust_id") < hi)),
            "s2iv_dim", "pid")
          ()
        }
      val m1 = m()
      // day 2: %97-keys of quartile 3 move to nat+100; %211 keys
      // are born — ONE casMergeInto of exactly the SCD2 writes
      val day2 = day1.withColumn("nat",
          when(col("cust_id") % 97 === 0 &&
            col("cust_id") >= 2 * qs && col("cust_id") < 3 * qs,
            col("nat") + 100L).otherwise(col("nat")))
        .unionByName(day1.filter(col("cust_id") % 211 === 0)
          .select((col("cust_id") + 10000000L).as("cust_id"),
            col("nat")))
      wh.casMergeInto(s, "s2iv_dim", "pid",
        graft.ops.Scd.scd2CatChanges(day2, wh.casRead(s, "s2iv_dim"),
          Seq("cust_id"), Seq("nat"), lit(2L),
          ks => graft.ops.Scd.mintPidLong(ks.head, lit(2L))))
      val m2 = m()
      // day 3: %89-keys of quartile 2 move too (new keys keep nat)
      val day3 = day2.withColumn("nat",
        when(col("cust_id") % 13 === 0 &&
          col("cust_id") >= qs && col("cust_id") < 2 * qs,
          col("nat") + 100L).otherwise(col("nat")))
      wh.casMergeInto(s, "s2iv_dim", "pid",
        graft.ops.Scd.scd2CatChanges(day3, wh.casRead(s, "s2iv_dim"),
          Seq("cust_id"), Seq("nat"), lit(3L),
          ks => graft.ops.Scd.mintPidLong(ks.head, lit(3L))))
      val m3 = m()
      wh.overwrite(Seq((m1, m2, m3)).toDF("m1", "m2", "m3"),
        "s2iv_evidence")
    }
    wh.casRead(s, "s2iv_roll")
      .select(col("nat"), col("sum_v"), col("n_rows"))
      .crossJoin(wh.read(s, "s2iv_evidence"))
  }

  /** WAVE-BOUNDED MIN/MAX RESCAN — the byte-cost half of q320's
    * story: documents land GROUP-CLUSTERED under a composite key
    * (gk = g·2⁴⁰ + doc_id — each group's rows a contiguous key
    * range, one wave per group, extents on gk), so when a CoW
    * delete (keyed on gk — the same extent column, preserving the
    * discipline) removes the min-holders of groups 1, 2 and 5, the
    * extremum rescan [[graft.ops.CasIvm.maintainMinMax]] runs with
    * `clusteredBy` and OPENS ONLY THOSE GROUPS' WAVES
    * ([[graft.sources.Warehouse.casReadPrunedRangesAt]]): the
    * `opened`/`active` evidence pins opened < active — q320's
    * group-grain claim turned from rows-true to bytes-true. The
    * oracle restates the survivors' GROUP BY min/max/count.
    *
    * 100 TB shape: a GDPR delete touching 3 of 10,000 tenants'
    * minima costs the min/max rollup 3 wave reads, not a table
    * scan — IF the layout is group-clustered, which is exactly the
    * layout such tables already keep for query pruning.
    */
  val q326 = Q("q326_minmax_clustered_rescan",
    """WITH d AS (
      |  SELECT CAST(doc_id % 7 AS BIGINT) AS g, n_chars,
      |    min(n_chars) OVER (PARTITION BY doc_id % 7) AS gmin
      |  FROM documents),
      |surv AS (
      |  SELECT g, n_chars FROM d
      |  WHERE NOT (g IN (1, 2, 5) AND n_chars = gmin))
      |SELECT g, CAST(min(n_chars) AS BIGINT) AS min_v,
      |  CAST(max(n_chars) AS BIGINT) AS max_v,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  'bootstrap' AS m1, 'incremental' AS m2,
      |  CAST(3 AS BIGINT) AS rescanned,
      |  CAST(1 AS BIGINT) AS wave_bounded
      |FROM surv GROUP BY g""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"mmc_${SessionScratch.keyOf(dir)}"))
    val key = s"mm_clustered_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val G = 1L << 40
      val d = t(s, dir, "documents")
        .select((col("doc_id") % 7 * G + col("doc_id")).as("gk"),
          (col("doc_id") % 7).as("g"), col("n_chars").as("v"))
      // one wave per group: extents on gk are group-tight by layout
      (0L until 7L).foreach { gi =>
        wh.casAppendStats(s, d.filter(col("g") === gi),
          "mmc_src", "gk")
        ()
      }
      val rescans = scala.collection.mutable.Set.empty[Any]
      var io = Option.empty[(Int, Int)]
      def maintain(): String = graft.ops.CasIvm.maintainMinMax(
        s, wh, "mmc_src", "mmc_roll", "g", "v",
        onRescan = ks => { rescans ++= ks; () },
        clusteredBy = Some(("gk", (gv: Any) => {
          val gl = gv.asInstanceOf[Long]
          (gl * G, (gl + 1) * G - 1)
        })),
        onRescanIo = (kept, total) => io = Some((kept, total)))
      val m1 = maintain()
      // delete EXACTLY the min-holding rows of groups 1, 2, 5 —
      // keyed on gk, so the rewrite stays on those groups' waves
      // and records gk extents (the discipline survives the DML)
      val gmin = d.groupBy("g").agg(min("v").as("gmin"))
      val delKeys = d.join(gmin, Seq("g"))
        .filter(col("g").isin(1L, 2L, 5L) && col("v") === col("gmin"))
        .select("gk")
      wh.casDeleteWhereKeys(s, "mmc_src", "gk", delKeys)
      val m2 = maintain()
      val (kept, total) = io.getOrElse((-1, -1))
      wh.overwrite(Seq((m1, m2, rescans.size.toLong,
        if (kept >= 1 && kept < total) 1L else 0L))
        .toDF("m1", "m2", "rescanned", "wave_bounded"),
        "mmc_evidence")
    }
    wh.casRead(s, "mmc_roll")
      .select(col("g"), col("min_v"), col("max_v"), col("n_rows"))
      .crossJoin(wh.read(s, "mmc_evidence"))
  }

  /** MOMENTS MV — AVG/VARIANCE/STDDEV maintained incrementally
    * ([[graft.ops.CasIvm.maintainMoments]]): the second moment is as
    * invertible as the first, so one (sum, sum_sq, count) rollup
    * serves every dispersion statistic a metric layer reports, and a
    * CoW GDPR delete SUBTRACTS from both sums at O(rewritten waves'
    * diff + touched groups) — where a naive stddev materialization
    * would rescan the corpus. The oracle restates the survivors'
    * moments (and the derived avg/variance as the IDENTICAL double
    * expression, so IEEE evaluation matches bit-for-bit); the
    * maintenance modes pin no-refresh.
    *
    * 100 TB shape: dashboard dispersion metrics (p50 proxies,
    * z-scores, SLO spreads) stay O(delta) under churn — the
    * invertible-family argument extends beyond SUM/COUNT for free.
    */
  val q327 = Q("q327_ivm_moments",
    """WITH surv AS (
      |  SELECT CAST(doc_id % 7 AS BIGINT) AS g,
      |    CAST(n_chars AS BIGINT) AS v
      |  FROM documents WHERE doc_id % 101 <> 0)
      |SELECT g, CAST(sum(v) AS BIGINT) AS sum_v,
      |  CAST(sum(v * v) AS BIGINT) AS sum_sq,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(v) AS DOUBLE) / count(*) AS avg_v,
      |  CAST(sum(v * v) AS DOUBLE) / count(*)
      |    - (CAST(sum(v) AS DOUBLE) / count(*))
      |      * (CAST(sum(v) AS DOUBLE) / count(*)) AS var_pop,
      |  'bootstrap' AS m1, 'incremental' AS m2, 'incremental' AS m3
      |FROM surv GROUP BY g""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"mom_${SessionScratch.keyOf(dir)}"))
    val key = s"ivm_mom_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 7).as("g"),
          col("n_chars").cast("long").as("v"))
      val maxId = d.agg(max("doc_id")).as[Long].head()
      val half = (maxId + 1L) / 2L
      def m(): String = graft.ops.CasIvm.maintainMoments(
        s, wh, "mom_src", "mom_roll", "g", "v")
      wh.casAppendStats(s, d.filter(col("doc_id") < half),
        "mom_src", "doc_id")
      val m1 = m()
      wh.casAppendStats(s, d.filter(col("doc_id") >= half),
        "mom_src", "doc_id")
      val m2 = m()
      wh.casDeleteWhereKeys(s, "mom_src", "doc_id",
        d.filter(col("doc_id") % 101 === 0).select("doc_id"))
      val m3 = m()
      wh.overwrite(Seq((m1, m2, m3)).toDF("m1", "m2", "m3"),
        "mom_evidence")
    }
    wh.casRead(s, "mom_roll")
      .select(col("g"), col("sum_v"), col("sum_sq"), col("n_rows"),
        (col("sum_v").cast("double") / col("n_rows")).as("avg_v"),
        (col("sum_sq").cast("double") / col("n_rows")
          - (col("sum_v").cast("double") / col("n_rows"))
            * (col("sum_v").cast("double") / col("n_rows")))
          .as("var_pop"))
      .crossJoin(wh.read(s, "mom_evidence"))
  }

  val all: Seq[Q] = Seq(q322, q323, q324, q325, q326, q327)
}
