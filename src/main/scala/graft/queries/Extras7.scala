package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Q, SessionScratch}
import graft.sources.{Tables, Warehouse}

/** Round-18 additions: the retraction-carrying change feed driving
  * O(delta) rollup maintenance THROUGH copy-on-write rewrites (q318),
  * the catalog-tier SCD2 at O(changed) write cost (q319), and the
  * non-invertible MIN/MAX rollup with extremum-targeted group rescans
  * (q320). Same determinism policy as Extras6: injected clocks,
  * modulo-derived change sets, SessionScratch.once so Verify and
  * Bench re-runs read one build.
  */
object Extras7 {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** O(DELTA) IVM UNDER GDPR DELETES — the r17 verdict's #1 gap
    * closed: a SUM/COUNT rollup maintained across a copy-on-write
    * delete WITHOUT a refresh. Four range-quartile waves land and
    * are absorbed additively; a forget-set delete clustered in
    * quartile 2 rewrites 1 of 4 waves, and the next maintenance
    * consumes [[graft.sources.Warehouse.casChangesSinceCdf]]'s
    * row-level (+insert, −retraction) diff of exactly that wave —
    * SUBTRACTING the deleted rows from the touched groups
    * (SUM/COUNT are self-inverse) at O(rewritten wave), never
    * rescanning the source. A second delete then empties group 3
    * entirely: the maintenance DELETES the group from the rollup
    * (GROUP BY semantics — an emptied group vanishes, no zombie
    * zero row). The oracle is the plain GROUP BY (with AVG — free
    * as sum/count) over the surviving corpus; the four maintenance
    * modes (no 'refresh' anywhere) and the first delete's CDF read
    * plan (1 wave out, 1 remainder in, of 4 active) ride as
    * structural evidence.
    *
    * 100 TB shape: a routine daily GDPR delete no longer forces
    * every dependent rollup to rescan its source — maintenance cost
    * stays O(delta + rewritten waves' diff + touched groups), and
    * the refresh path survives only for the genuinely non-diffable
    * (restores,
    * evolution meeting a rewrite — MoR tombstones diff too, r18).
    */
  val q318 = Q("q318_ivm_cdf_delete",
    """WITH q AS (
      |  SELECT CAST(floor((max(doc_id) + 1) / 4) AS BIGINT) AS qs
      |  FROM documents),
      |surv AS (
      |  SELECT CAST(doc_id % 7 AS BIGINT) AS g, n_chars
      |  FROM documents, q
      |  WHERE NOT (doc_id % 101 = 0
      |             AND doc_id >= qs AND doc_id < 2 * qs)
      |    AND doc_id % 7 <> 3)
      |SELECT g, CAST(sum(n_chars) AS BIGINT) AS sum_v,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_v,
      |  'bootstrap' AS m1, 'incremental' AS m2,
      |  'incremental' AS m3, 'incremental' AS m4,
      |  CAST(1 AS BIGINT) AS cdf_removed,
      |  CAST(1 AS BIGINT) AS cdf_added,
      |  CAST(4 AS BIGINT) AS active_waves
      |FROM surv GROUP BY g""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"cdfi_${SessionScratch.keyOf(dir)}"))
    val key = s"ivm_cdf_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 7).as("g"),
          col("n_chars").as("v"))
      val maxId = d.agg(max("doc_id")).as[Long].head()
      val qs = (maxId + 1L) / 4L
      def maintain(): String = graft.ops.CasIvm.maintainSumCount(
        s, wh, "cdf_src", "cdf_roll", "g", "v")
      def landQ(w: Long): Unit = {
        wh.casAppendStats(s, d.filter(col("doc_id") >= w * qs &&
          (col("doc_id") < (w + 1) * qs || lit(w == 3L))),
          "cdf_src", "doc_id")
        ()
      }
      landQ(0); landQ(1)
      val m1 = maintain()
      landQ(2); landQ(3)
      val m2 = maintain()
      val h0 = wh.casHead("cdf_src")
      // the forget-set delete, clustered in quartile 2: rewrites 1
      // of 4 waves (keys stay distributed — the DataFrame form)
      wh.casDeleteWhereKeys(s, "cdf_src", "doc_id",
        d.filter(col("doc_id") % 101 === 0 && col("doc_id") >= qs &&
          col("doc_id") < 2 * qs).select("doc_id"))
      // the feed's read plan: exactly the hit wave out, its
      // remainder in — wave-grain evidence the oracle pins
      val (plan, _) = wh.casCdfPlan("cdf_src", h0)
      val st = plan.get.head
      val active = wh.casPrunedCommits("cdf_src",
        Long.MinValue, Long.MaxValue)._2
      val m3 = maintain()
      // empty group 3 entirely: the rollup row must VANISH
      wh.casDeleteWhereKeys(s, "cdf_src", "doc_id",
        d.filter(col("g") === 3L).select("doc_id"))
      val m4 = maintain()
      wh.overwrite(Seq((m1, m2, m3, m4, st.removed.size.toLong,
        st.added.size.toLong, active.toLong))
        .toDF("m1", "m2", "m3", "m4", "cdf_removed", "cdf_added",
          "active_waves"), "cdf_evidence")
    }
    wh.casRead(s, "cdf_roll")
      .select(col("g"), col("sum_v"), col("n_rows"),
        (col("sum_v").cast("double") / col("n_rows")).as("avg_v"))
      .crossJoin(wh.read(s, "cdf_evidence"))
  }

  /** CATALOG-TIER SCD2 AT O(CHANGED) — the q309 pattern completed
    * for versioned history (r17 verdict gap #3): a customer
    * dimension lands as four PID-quartile stats waves; day 2's full
    * re-extract mutates one attribute for keys divisible by 97 in
    * the THIRD quartile and adds brand-new keys (divisible by 211).
    * [[graft.ops.Scd.scd2CatChanges]] reduces the extract to exactly
    * the SCD2 writes — expire-updates of the changed keys' current
    * rows (same PID, flag→0, exp→day 2) plus fresh flag-1 versions
    * and new keys minted at [[graft.ops.Scd.mintPidLong]](day 2) —
    * and ONE [[graft.sources.Warehouse.casMergeInto]] commit lands
    * them: the expire rewrites ONLY the quartile wave the old
    * versions live in (1 of 4, retained ×3), the fresh versions'
    * day-2 PIDs sit ABOVE every extent and land as the tight-extent
    * insert wave. The oracle restates the full two-day history
    * arithmetically; structural columns pin the O(changed) write
    * (updated = changed keys, inserted = changed + new) and the
    * extent locality (rewritten = 1 of 4) — and `parity` = 1 pins
    * row-identity with the single-writer [[graft.ops.Scd.scd2Merge]]
    * over the same two days, computed in-query.
    *
    * 100 TB shape: the daily SCD2 roll writes O(changed keys' waves
    * + day's versions), never the history — the win [[q309]] proved
    * for SCD1, now with the expire/append compound landing as one
    * atomic commit.
    */
  val q319 = Q("q319_catalog_scd2_delta",
    """WITH q AS (
      |  SELECT CAST(floor((max(c_custkey) + 1) / 4) AS BIGINT) AS qs
      |  FROM customer),
      |ch AS (
      |  SELECT c_custkey AS k FROM customer, q
      |  WHERE c_custkey % 97 = 0
      |    AND c_custkey >= 2 * qs AND c_custkey < 3 * qs),
      |hist AS (
      |  SELECT c_custkey AS cust_id, CAST(c_nationkey AS BIGINT) AS nat,
      |    CAST(1 AS BIGINT) AS flag, CAST(1 AS BIGINT) AS eff,
      |    CAST(NULL AS BIGINT) AS exp,
      |    1099511627776 + c_custkey AS pid
      |  FROM customer WHERE c_custkey NOT IN (SELECT k FROM ch)
      |  UNION ALL
      |  SELECT c_custkey, CAST(c_nationkey AS BIGINT),
      |    0, 1, 2, 1099511627776 + c_custkey
      |  FROM customer WHERE c_custkey IN (SELECT k FROM ch)
      |  UNION ALL
      |  SELECT c_custkey, CAST(c_nationkey AS BIGINT) + 100,
      |    1, 2, NULL, 2 * 1099511627776 + c_custkey
      |  FROM customer WHERE c_custkey IN (SELECT k FROM ch)
      |  UNION ALL
      |  SELECT c_custkey + 10000000, CAST(c_nationkey AS BIGINT),
      |    1, 2, NULL, 2 * 1099511627776 + c_custkey + 10000000
      |  FROM customer WHERE c_custkey % 211 = 0)
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(flag) AS BIGINT) AS flag1_n,
      |  CAST(sum(nat) AS BIGINT) AS nat_sum,
      |  CAST(sum(eff) AS BIGINT) AS eff_sum,
      |  CAST(coalesce(sum(exp), 0) AS BIGINT) AS exp_sum,
      |  CAST(sum(pid) AS BIGINT) AS pid_sum,
      |  CAST(1 AS BIGINT) AS rewritten, CAST(3 AS BIGINT) AS retained,
      |  (SELECT CAST(count(*) AS BIGINT) FROM ch) AS updated,
      |  (SELECT CAST(count(*) AS BIGINT) FROM ch) +
      |    (SELECT CAST(count(*) AS BIGINT) FROM customer
      |     WHERE c_custkey % 211 = 0) AS inserted,
      |  CAST(1 AS BIGINT) AS parity
      |FROM hist""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"scd2c_${SessionScratch.keyOf(dir)}"))
    val key = s"scd2_cat_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val c = t(s, dir, "customer")
      val day1 = c.select(col("c_custkey").as("cust_id"),
        col("c_nationkey").cast("long").as("nat"),
        col("c_name").as("nm"))
      val maxId = day1.agg(max("cust_id")).as[Long].head()
      val qs = (maxId + 1L) / 4L
      def hist0(d: org.apache.spark.sql.DataFrame) = d
        .withColumn("current_flag", lit(1L))
        .withColumn("eff_dt", lit(1L))
        .withColumn("exp_dt", lit(null).cast("long"))
        .withColumn("pid",
          graft.ops.Scd.mintPidLong(col("cust_id"), lit(1L)))
      var v = 0
      Seq((0L, qs), (qs, 2 * qs), (2 * qs, 3 * qs), (3 * qs, maxId + 1))
        .foreach { case (lo, hi) =>
          v = wh.casAppendStats(s, hist0(day1.filter(
            col("cust_id") >= lo && col("cust_id") < hi)),
            "scd2_dim", "pid")
        }
      wh.catCommit(Seq("scd2_dim" -> v))
      val day2 = day1.withColumn("nat",
          when(col("cust_id") % 97 === 0 &&
            col("cust_id") >= 2 * qs && col("cust_id") < 3 * qs,
            col("nat") + 100L).otherwise(col("nat")))
        .unionByName(day1.filter(col("cust_id") % 211 === 0)
          .select((col("cust_id") + 10000000L).as("cust_id"),
            col("nat"), col("nm")))
      val prior = wh.catRead(s, "scd2_dim")
      val changes = graft.ops.Scd.scd2CatChanges(day2, prior,
        Seq("cust_id"), Seq("nat", "nm"), lit(2L),
        ks => graft.ops.Scd.mintPidLong(ks.head, lit(2L)))
      val st = wh.casMergeInto(s, "scd2_dim", "pid", changes)
      val catVer = wh.catCommitMax(Seq("scd2_dim" -> st.version))
      // row-identity with the single-writer full merge, same mint
      val full = graft.ops.Scd.scd2Merge(day2, hist0(day1),
        Seq("cust_id"), Seq("nat", "nm"), lit(2L),
        pidCol = Some("pid"),
        mint = (ks, eff) => graft.ops.Scd.mintPidLong(ks.head, eff))
      val now = wh.catRead(s, "scd2_dim")
      val parity = full.exceptAll(now).count() == 0L &&
        now.exceptAll(full).count() == 0L
      wh.overwrite(Seq((st.rewrittenCommits.toLong,
        st.retainedCommits.toLong, st.updatedRows,
        st.insertedRows, if (parity) 1L else 0L, catVer.toLong))
        .toDF("rewritten", "retained", "updated", "inserted",
          "parity", "cat_ver"), "scd2c_evidence")
    }
    wh.catRead(s, "scd2_dim")
      .agg(count(lit(1)).as("n"),
        sum("current_flag").as("flag1_n"),
        sum("nat").cast("long").as("nat_sum"),
        sum("eff_dt").cast("long").as("eff_sum"),
        coalesce(sum("exp_dt"), lit(0L)).cast("long").as("exp_sum"),
        sum("pid").cast("long").as("pid_sum"))
      .crossJoin(wh.read(s, "scd2c_evidence")
        .select("rewritten", "retained", "updated", "inserted",
          "parity"))
  }

  /** NON-INVERTIBLE ROLLUP MAINTENANCE — MIN/MAX (+count) kept
    * current by [[graft.ops.CasIvm.maintainMinMax]]: appends fold
    * algebraically (least/greatest — an insert can only extend an
    * extremum), and the one case no algebra recovers — a retraction
    * AT a group's current extremum — triggers a rescan of EXACTLY
    * the touched groups, never the table. A CoW delete removes the
    * min-holding rows of groups 1 and 2 and ALL of group 5: the next
    * maintenance stays `incremental`, rescans exactly those 3 groups
    * (the `rescanned` evidence — groups 0/3/4/6 ride algebraically),
    * and group 5 VANISHES from the rollup. The oracle restates the
    * survivors' GROUP BY min/max/count (the deleted min-holders
    * derived by the same window-min rule).
    *
    * 100 TB shape: the q242-style rescan-on-delete cost collapses
    * from O(source) to O(extremum-touched groups' rows) — a GDPR
    * delete that never touches a group minimum costs the min/max
    * rollup NOTHING beyond the delta.
    */
  val q320 = Q("q320_ivm_minmax_rescan",
    """WITH d AS (
      |  SELECT CAST(doc_id % 7 AS BIGINT) AS g, n_chars,
      |    min(n_chars) OVER (PARTITION BY doc_id % 7) AS gmin
      |  FROM documents),
      |surv AS (
      |  SELECT g, n_chars FROM d
      |  WHERE NOT (g IN (1, 2) AND n_chars = gmin) AND g <> 5)
      |SELECT g, CAST(min(n_chars) AS BIGINT) AS min_v,
      |  CAST(max(n_chars) AS BIGINT) AS max_v,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  'bootstrap' AS m1, 'incremental' AS m2, 'incremental' AS m3,
      |  CAST(3 AS BIGINT) AS rescanned
      |FROM surv GROUP BY g""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"mmx_${SessionScratch.keyOf(dir)}"))
    val key = s"ivm_minmax_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 7).as("g"),
          col("n_chars").as("v"))
      val rescans = scala.collection.mutable.Set.empty[Any]
      def maintain(): String = graft.ops.CasIvm.maintainMinMax(
        s, wh, "mmx_src", "mmx_roll", "g", "v",
        onRescan = ks => { rescans ++= ks; () })
      val maxId = d.agg(max("doc_id")).as[Long].head()
      val half = (maxId + 1L) / 2L
      wh.casAppendStats(s, d.filter(col("doc_id") < half),
        "mmx_src", "doc_id")
      val m1 = maintain()
      wh.casAppendStats(s, d.filter(col("doc_id") >= half),
        "mmx_src", "doc_id")
      val m2 = maintain()
      rescans.clear() // append windows must not have rescanned
      // delete the min-holders of groups 1 and 2 plus ALL of group 5
      val gmin = d.groupBy("g").agg(min("v").as("gmin"))
      val delKeys = d.join(gmin, Seq("g"))
        .filter((col("g").isin(1L, 2L) && col("v") === col("gmin")) ||
          col("g") === 5L)
        .select("doc_id")
      wh.casDeleteWhereKeys(s, "mmx_src", "doc_id", delKeys)
      val m3 = maintain()
      wh.overwrite(Seq((m1, m2, m3, rescans.size.toLong))
        .toDF("m1", "m2", "m3", "rescanned"), "mmx_evidence")
    }
    wh.casRead(s, "mmx_roll")
      .select(col("g"), col("min_v"), col("max_v"), col("n_rows"))
      .crossJoin(wh.read(s, "mmx_evidence"))
  }

  /** THE IVM DAG — incremental views COMPOSE: documents (side A) ⋈
    * attribute table (side B) maintained as an MV
    * ([[graft.ops.CasIvm.maintainJoin]]), and a per-label SUM/COUNT
    * rollup maintained OVER THE MV
    * ([[graft.ops.CasIvm.maintainSumCount]] with the MV as its
    * source) — zero special composition code, because the MV's own
    * maintenance commits are ordinary CAS rewrites and therefore
    * row-level diffable: the downstream rollup consumes the MV's
    * retraction-carrying feed exactly as it would a base table's. A
    * copy-on-write GDPR delete at the BASE then propagates the whole
    * depth incrementally — the join maintenance lands op-D rows for
    * the affected keys, the rollup subtracts their retractions — six
    * maintenance runs, no 'refresh' anywhere (the mode evidence).
    * The oracle is the plain GROUP BY over the surviving joined
    * corpus.
    *
    * 100 TB shape: a metric DAG (bronze → silver join → gold rollup)
    * costs O(delta) at EVERY level per day, GDPR deletes included —
    * the property that makes a lakehouse metric layer operable at
    * all.
    */
  val q321 = Q("q321_ivm_dag",
    """SELECT CAST(doc_id % 7 AS BIGINT) AS lb,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_v,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  'bootstrap' AS j1, 'incremental' AS j2, 'incremental' AS j3,
      |  'bootstrap' AS r1, 'incremental' AS r2, 'incremental' AS r3
      |FROM documents
      |WHERE doc_id % 2 = 0 AND doc_id % 101 <> 0
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"dag_${SessionScratch.keyOf(dir)}"))
    val key = s"ivm_dag_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val d = t(s, dir, "documents").select("doc_id", "n_chars")
      val bAll = d.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), (col("doc_id") % 7).as("lb"))
      def joinM(): String = graft.ops.CasIvm.maintainJoin(
        s, wh, "dag_a", "dag_b", "dag_mv", "doc_id")
      def rollM(): String = graft.ops.CasIvm.maintainSumCount(
        s, wh, "dag_mv", "dag_roll", "lb", "n_chars")
      wh.casAppendStats(s, d.filter(col("doc_id") % 3 === 0),
        "dag_a", "doc_id")
      wh.casAppendStats(s, bAll, "dag_b", "doc_id")
      val j1 = joinM(); val r1 = rollM()
      wh.casAppendStats(s, d.filter(col("doc_id") % 3 =!= 0),
        "dag_a", "doc_id")
      val j2 = joinM(); val r2 = rollM()
      // the base-table GDPR delete: propagates the full DAG depth
      // incrementally (op-D pairs out of the MV, retractions
      // subtracted from the rollup)
      wh.casDeleteWhereKeys(s, "dag_a", "doc_id",
        d.filter(col("doc_id") % 101 === 0).select("doc_id"))
      val j3 = joinM(); val r3 = rollM()
      wh.overwrite(Seq((j1, j2, j3, r1, r2, r3))
        .toDF("j1", "j2", "j3", "r1", "r2", "r3"), "dag_evidence")
    }
    wh.casRead(s, "dag_roll")
      .select(col("lb"), col("sum_v"), col("n_rows"))
      .crossJoin(wh.read(s, "dag_evidence"))
  }

  val all: Seq[Q] = Seq(q318, q319, q320, q321)
}
