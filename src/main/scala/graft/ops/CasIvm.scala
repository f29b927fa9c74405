package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{CasCdfResult, Warehouse}

/** Incrementally-maintained rollups over CAS tables — the table
  * format's devices composed into what a 100 TB pipeline actually
  * runs: [[Warehouse.casChangesSinceCdf]] supplies the O(delta)
  * row-level (+insert, -retraction) feed ACROSS copy-on-write
  * rewrites, and every landing is ONE fenced commit that carries
  * both the new totals and the absorbed cursor.
  *
  * THE CURSOR IS THE LOG, NOT A SIDECAR: each maintenance commit
  * rides a `TXN <stream> <source-head>` line, and the cursor is read
  * back with [[Warehouse.casStreamCursor]] — so "what the rollup
  * holds" and "what it absorbed" are one atomic fact. There is no
  * land-to-cursor crash window (a crash anywhere replays as a noop:
  * the re-read cursor already names the landed head), no plain-file
  * cursor write to tear, and no single-maintainer contract:
  * concurrent maintainers SERIALIZE on the fence ([[Warehouse
  * .casApplyCdcBatch]]'s `fence` — commit only if the stream cursor
  * is still the one this window was derived from), the loser
  * re-reads the advanced cursor and re-derives. `afterLand` is a
  * test seam kept from the sidecar era; it fires after the landing
  * (which is now also the cursor write).
  *
  * Maintenance modes: "bootstrap" (first landing), "incremental"
  * (window absorbed additively — including windows holding CoW
  * deletes/updates/merges/compactions, via the signed feed),
  * "refresh" (non-diffable window: restore, schema evolution meeting
  * a rewrite, or a RETENTION-RETIRED window — a lagging cursor a
  * [[Warehouse.casTruncate]] crossed; MoR tombstones diff since the
  * feed retracts their hidden rows at forget-set grain; recompute
  * happens FROM THE CONSULTED VERSION, so the rollup and cursor
  * still describe one snapshot), "noop" (nothing to absorb). The
  * window consult is the TYPED [[Warehouse.casCdfFeed]] — one log
  * walk yields verdict and frame, so the maintainer can never see a
  * plan/frame disagreement, and every degradation above is a typed
  * case, not an error to catch.
  */
object CasIvm {

  // retry budget for the cursor-race loop: every fenced None PROVES
  // the cursor advanced (monotone), so this bound is never hit by
  // livelock — it turns a logic bug into a loud error instead of a
  // spin
  private val MaxRounds = 64

  private def spent(ctx: String): Nothing =
    sys.error(s"$ctx: cursor advanced $MaxRounds times without this " +
      "maintainer landing — starved or mis-fenced")

  /** One maintenance run of `rollup` = SELECT g, sum(v), count(*)
    * FROM src GROUP BY g. O(delta rows + touched groups) per run:
    * the signed feed is aggregated per group, prior totals of ONLY
    * the touched groups are semi-joined in (the rollup is group-
    * cardinality small; the source is never rescanned), retractions
    * subtract (SUM/COUNT are self-inverse), and groups whose count
    * reaches zero are DELETED from the rollup (GROUP BY semantics —
    * an emptied group vanishes). The landing is one fenced
    * [[Warehouse.casApplyCdcBatch]] upsert/delete commit carrying
    * the cursor.
    *
    * `where` makes it a FILTERED MV — `SELECT g, sum(v), count(*)
    * FROM src WHERE <where> GROUP BY g`: filtering is linear, so it
    * commutes with the signed feed (a retraction of a passing row
    * subtracts, a non-passing row never contributes on either sign)
    * and with the refresh recompute. The shape an SCD2 dimension's
    * CURRENT-rows rollup is (`where = current_flag === 1`): a
    * day-roll's expire rewrite retracts the old current version
    * (decrement), inserts its expired twin (filtered out) and the
    * fresh current version (increment) — O(changed keys), never a
    * history rescan.
    */
  def maintainSumCount(spark: SparkSession, wh: Warehouse,
      src: String, rollup: String, g: String, v: String,
      afterLand: () => Unit = () => (),
      where: Option[Column] = None): String = {
    val stream = "ivm:" + src
    def aggOf(df: DataFrame): DataFrame =
      where.fold(df)(df.filter)
        .groupBy(col(g)).agg(sum(col(v)).cast("long").as("sum_v"),
        count(lit(1)).as("n_rows"))
    var out = Option.empty[String]
    var round = 0
    while (out.isEmpty) {
      if (round >= MaxRounds) spent(s"maintainSumCount($rollup)")
      round += 1
      val cursor = wh.casStreamCursor(rollup, stream)
      val (feed, head) = wh.casCdfFeed(spark, src, cursor.toInt)
      if (head == cursor) out = Some("noop")
      else feed match {
        case CasCdfResult.NonDiffable | CasCdfResult.Retired(_) =>
          // non-diffable window (restore, evolution meeting a
          // rewrite) OR a retention-retired one (the lagging-
          // maintainer × casTruncate crossing): recompute from the
          // CONSULTED version — an append racing past `head` stays
          // in the NEXT window instead of being absorbed twice
          if (wh.casOverwriteTxn(aggOf(wh.casReadAt(spark, src,
            head)), rollup, stream, head.toLong, cursor).isDefined)
            out = Some("refresh")
        case CasCdfResult.Empty =>
          // meta-only window: advance the cursor with a metadata-
          // only fenced commit so later consults stop re-walking it
          if (wh.casTxnAdvance(rollup, stream, head.toLong,
            cursor).isDefined)
            out = Some("noop")
        case CasCdfResult.Delta(delta0, _) =>
          // the filter commutes with the signed multiset: apply it
          // to the delta exactly as to the snapshot
          val delta = where.fold(delta0)(delta0.filter)
          val d = delta.groupBy(col(g)).agg(
            sum(col(v).cast("long") * col("_sign")).as("sum_v"),
            sum(col("_sign").cast("long")).as("n_rows"))
            .filter(col("n_rows") =!= 0L ||
              coalesce(col("sum_v"), lit(0L)) =!= 0L)
          if (d.isEmpty) {
            // rows cancelled (a pure layout change): cursor-only
            // fenced advance, same as the Empty window
            if (wh.casTxnAdvance(rollup, stream, head.toLong,
              cursor).isDefined)
              out = Some("noop")
          } else {
            // boot = no DATA commit yet — casHead alone would
            // misread a rollup whose first windows were cursor-only
            // advances (net-zero windows) and skip the seed forever
            val boot = !wh.casHasData(rollup)
            if (boot)
              // seed an empty rollup so the first landing goes
              // through the same fenced cursor-carrying commit as
              // every later one
              wh.casAppendStats(spark, d.limit(0), rollup, g)
            // touched groups only: prior totals semi-joined against
            // the delta's group keys — the SOURCE is never rescanned
            val prior = wh.casRead(spark, rollup)
              .join(d.select(col(g)), Seq(g), "left_semi")
            val merged = prior.select(col(g),
                col("sum_v").as("p_sum"), col("n_rows").as("p_n"))
              .join(d, Seq(g), "full_outer")
              .select(col(g),
                (coalesce(col("p_sum"), lit(0L)) +
                  coalesce(col("sum_v"), lit(0L))).as("sum_v"),
                (coalesce(col("p_n"), lit(0L)) +
                  coalesce(col("n_rows"), lit(0L))).as("n_rows"))
            val changes = merged.withColumn("op",
              when(col("n_rows") === 0L, lit("D")).otherwise(lit("U")))
            if (wh.casApplyCdcBatch(spark, rollup, g, changes, "op",
              stream, head.toLong, fence = Some(cursor)).isDefined)
              out = Some(if (boot) "bootstrap" else "incremental")
          }
      }
    }
    afterLand()
    out.get
  }

  /** MOMENTS rollup maintenance — `SELECT g, sum(v), sum(v*v),
    * count(*) FROM src [WHERE w] GROUP BY g`, the invertible family
    * one tier up from [[maintainSumCount]]: the second moment rides
    * the same signed fold (retractions subtract both sums), so AVG,
    * population/sample VARIANCE and STDDEV are all derivable from
    * the rollup with zero extra maintenance cost — the statistics a
    * metric layer actually serves. Identical contract to
    * [[maintainSumCount]] (typed window consult, fenced
    * cursor-carrying landing, filtered form, boot via
    * [[Warehouse.casHasData]], emptied groups deleted); O(delta rows
    * + touched groups) per run including CoW-delete windows.
    * `sum_sq` is exact in Long for |v| ≤ ~3·10⁹ per row and ~2⁶³
    * per group — the overflow bound the caller owns, same as any
    * integer SUM.
    */
  def maintainMoments(spark: SparkSession, wh: Warehouse,
      src: String, rollup: String, g: String, v: String,
      afterLand: () => Unit = () => (),
      where: Option[Column] = None): String = {
    val stream = "ivmm:" + src
    val vl = col(v).cast("long")
    def aggOf(df: DataFrame): DataFrame =
      where.fold(df)(df.filter)
        .groupBy(col(g)).agg(sum(vl).cast("long").as("sum_v"),
          sum(vl * vl).cast("long").as("sum_sq"),
          count(lit(1)).as("n_rows"))
    var out = Option.empty[String]
    var round = 0
    while (out.isEmpty) {
      if (round >= MaxRounds) spent(s"maintainMoments($rollup)")
      round += 1
      val cursor = wh.casStreamCursor(rollup, stream)
      val (feed, head) = wh.casCdfFeed(spark, src, cursor.toInt)
      if (head == cursor) out = Some("noop")
      else feed match {
        case CasCdfResult.NonDiffable | CasCdfResult.Retired(_) =>
          if (wh.casOverwriteTxn(aggOf(wh.casReadAt(spark, src,
            head)), rollup, stream, head.toLong, cursor).isDefined)
            out = Some("refresh")
        case CasCdfResult.Empty =>
          if (wh.casTxnAdvance(rollup, stream, head.toLong,
            cursor).isDefined)
            out = Some("noop")
        case CasCdfResult.Delta(delta0, _) =>
          val delta = where.fold(delta0)(delta0.filter)
          val d = delta.groupBy(col(g)).agg(
            sum(vl * col("_sign")).as("sum_v"),
            sum(vl * vl * col("_sign")).as("sum_sq"),
            sum(col("_sign").cast("long")).as("n_rows"))
            .filter(col("n_rows") =!= 0L ||
              coalesce(col("sum_v"), lit(0L)) =!= 0L ||
              coalesce(col("sum_sq"), lit(0L)) =!= 0L)
          if (d.isEmpty) {
            if (wh.casTxnAdvance(rollup, stream, head.toLong,
              cursor).isDefined)
              out = Some("noop")
          } else {
            val boot = !wh.casHasData(rollup)
            if (boot)
              wh.casAppendStats(spark, d.limit(0), rollup, g)
            val prior = wh.casRead(spark, rollup)
              .join(d.select(col(g)), Seq(g), "left_semi")
            val merged = prior.select(col(g),
                col("sum_v").as("p_sum"), col("sum_sq").as("p_sq"),
                col("n_rows").as("p_n"))
              .join(d, Seq(g), "full_outer")
              .select(col(g),
                (coalesce(col("p_sum"), lit(0L)) +
                  coalesce(col("sum_v"), lit(0L))).as("sum_v"),
                (coalesce(col("p_sq"), lit(0L)) +
                  coalesce(col("sum_sq"), lit(0L))).as("sum_sq"),
                (coalesce(col("p_n"), lit(0L)) +
                  coalesce(col("n_rows"), lit(0L))).as("n_rows"))
            val changes = merged.withColumn("op",
              when(col("n_rows") === 0L, lit("D")).otherwise(lit("U")))
            if (wh.casApplyCdcBatch(spark, rollup, g, changes, "op",
              stream, head.toLong, fence = Some(cursor)).isDefined)
              out = Some(if (boot) "bootstrap" else "incremental")
          }
      }
    }
    afterLand()
    out.get
  }

  /** MIN/MAX (+count) rollup maintenance — the NON-invertible
    * aggregates: inserts can only extend a group's extrema (fold with
    * least/greatest), but a retraction AT the current extremum can
    * move it in a direction no algebra recovers. Per run: groups with
    * no retraction, or retractions strictly inside (min, max), update
    * algebraically from the delta alone; ONLY groups whose
    * retractions touch their prior extremum (or whose whole window is
    * self-contained churn) are RESCANNED. Groups emptied by
    * retraction are deleted. `onRescan` is the evidence seam: it
    * receives the rescanned group keys (bounded by retraction-touched
    * groups — group-cardinality grain, the same class as the rollup
    * itself).
    *
    * RESCAN COST, honestly: the default rescan is ROW-bounded (a
    * group-keyed filter over the source at the consulted version) but
    * BYTE-wise opens every wave — group values are not correlated
    * with the table's extent column, so no wave prunes. `clusteredBy
    * = Some((keyCol, groupRange))` is the wave-bounded path for a
    * GROUP-CLUSTERED layout: when the table's extent column is a
    * composite group-prefixed key (each group's rows contiguous in
    * `keyCol` — the partition-by-group shape every format uses at
    * scale), `groupRange` maps a group value to its key range and the
    * rescan opens ONLY the extent-hit waves
    * ([[Warehouse.casReadPrunedRangesAt]]); `onRescanIo` receives
    * (opened, active) wave counts as the skip evidence. The caller
    * owns the layout contract: every stats-carrying commit must
    * record its extent ON `keyCol` (the same single-extent-column
    * discipline all extent-keyed DML already requires — appends,
    * deletes, and merges keyed on `keyCol` preserve it; stat-less
    * lines stay conservatively kept). Passing `clusteredBy` for a
    * table whose extents describe a DIFFERENT column would prune
    * wrongly — exactly as a delete keyed off the extent column
    * would misclassify.
    */
  def maintainMinMax(spark: SparkSession, wh: Warehouse,
      src: String, rollup: String, g: String, v: String,
      onRescan: Seq[Any] => Unit = _ => (),
      afterLand: () => Unit = () => (),
      clusteredBy: Option[(String, Any => (Long, Long))] = None,
      onRescanIo: (Int, Int) => Unit = (_, _) => ()): String = {
    val stream = "ivmx:" + src
    val vl = col(v).cast("long")
    def aggOf(df: DataFrame): DataFrame =
      df.groupBy(col(g)).agg(min(vl).as("min_v"), max(vl).as("max_v"),
        count(lit(1)).as("n_rows"))
    var out = Option.empty[String]
    var round = 0
    while (out.isEmpty) {
      if (round >= MaxRounds) spent(s"maintainMinMax($rollup)")
      round += 1
      val cursor = wh.casStreamCursor(rollup, stream)
      val (feed, head) = wh.casCdfFeed(spark, src, cursor.toInt)
      if (head == cursor) out = Some("noop")
      else feed match {
        case CasCdfResult.NonDiffable | CasCdfResult.Retired(_) =>
          if (wh.casOverwriteTxn(aggOf(wh.casReadAt(spark, src,
            head)), rollup, stream, head.toLong, cursor).isDefined)
            out = Some("refresh")
        case CasCdfResult.Empty =>
          if (wh.casTxnAdvance(rollup, stream, head.toLong,
            cursor).isDefined)
            out = Some("noop")
        case CasCdfResult.Delta(delta, _) =>
          val dIns = delta.filter(col("_sign") === 1).groupBy(col(g))
            .agg(min(vl).as("i_min"), max(vl).as("i_max"),
              count(lit(1)).as("i_n"))
          val dRet = delta.filter(col("_sign") === -1).groupBy(col(g))
            .agg(min(vl).as("r_min"), max(vl).as("r_max"),
              count(lit(1)).as("r_n"))
          val touched = dIns.select(col(g))
            .union(dRet.select(col(g))).distinct()
          if (touched.isEmpty) {
            if (wh.casTxnAdvance(rollup, stream, head.toLong,
              cursor).isDefined)
              out = Some("noop")
          } else {
            val boot = !wh.casHasData(rollup)
            if (boot)
              wh.casAppendStats(spark, aggOf(delta.limit(0)),
                rollup, g)
            val prior = (if (boot) aggOf(delta.limit(0))
              else wh.casRead(spark, rollup))
              .join(touched, Seq(g), "left_semi")
              .select(col(g), col("min_v").as("p_min"),
                col("max_v").as("p_max"), col("n_rows").as("p_n"))
            val j = touched.join(prior, Seq(g), "left")
              .join(dIns, Seq(g), "left").join(dRet, Seq(g), "left")
              .persist()
            try {
              // a retraction at (or tied with) the prior extremum, or
              // retraction churn inside a group born in this window,
              // needs the exact answer only a group rescan gives
              val needRescan: Column = col("r_n").isNotNull &&
                (col("p_n").isNull ||
                  col("r_min") <= col("p_min") ||
                  col("r_max") >= col("p_max"))
              // bounded collect: retraction-touched group KEYS —
              // group-cardinality grain, never row grain
              val rescanKeys = j.filter(needRescan).select(col(g))
                .collect().map(_.get(0)).toSeq
              onRescan(rescanKeys)
              val algebraic = j.filter(!needRescan).select(col(g),
                least(col("p_min"), col("i_min")).as("min_v"),
                greatest(col("p_max"), col("i_max")).as("max_v"),
                (coalesce(col("p_n"), lit(0L)) +
                  coalesce(col("i_n"), lit(0L)) -
                  coalesce(col("r_n"), lit(0L))).as("n_rows"))
                .withColumn("op", lit("U"))
              val changes =
                if (rescanKeys.isEmpty) algebraic
                else {
                  // the rescan read: wave-bounded under the
                  // group-clustered contract, row-bounded otherwise
                  val reBase = clusteredBy match {
                    case Some((kc, rng)) =>
                      val (df, kept, total) = wh.casReadPrunedRangesAt(
                        spark, src, kc, rescanKeys.map(rng), head)
                      onRescanIo(kept, total)
                      df
                    case None => wh.casReadAt(spark, src, head)
                  }
                  val re = aggOf(reBase
                    .filter(col(g).isin(rescanKeys: _*)))
                  // rescanned groups with no surviving rows vanish
                  val gone = j.filter(needRescan).select(col(g))
                    .join(re, Seq(g), "left_anti")
                    .select(col(g), lit(null).cast("long").as("min_v"),
                      lit(null).cast("long").as("max_v"),
                      lit(0L).as("n_rows"))
                  algebraic.unionByName(re.withColumn("op", lit("U")))
                    .unionByName(gone.withColumn("op", lit("D")))
                }
              if (wh.casApplyCdcBatch(spark, rollup, g, changes, "op",
                stream, head.toLong, fence = Some(cursor)).isDefined)
                out = Some(if (boot) "bootstrap" else "incremental")
            } finally {
              j.unpersist()
              ()
            }
          }
      }
    }
    afterLand()
    out.get
  }

  /** JOIN-MV maintenance — `mv = SELECT k, <a-cols>, <b-cols> FROM a
    * JOIN b USING (k)` kept current from BOTH sides' signed feeds,
    * with GENERAL N:M multiplicity: duplicate keys on either side
    * (the fact⋈fact shape a metric layer actually hits) are carried
    * by the MV's physical rows — no unique-key contract. The
    * bilinear delta-join collapses to AFFECTED-KEY RECOMPUTE, which
    * is multiplicity-blind: the only keys whose PAIR SET can change
    * in a window are those appearing in ΔA ∪ ΔB (inserts OR
    * retractions — the retraction-carrying feed supplies both across
    * CoW deletes/updates/merges), so the maintenance reads each
    * side's NEW state at the window head, EXTENT-PRUNED to the
    * affected keys' range and semi-joined to exactly them, joins the
    * two slivers (now multi-row per key), and lands the result as
    * ONE key-grain group replace ([[Warehouse.casReplaceKeys]]):
    * every affected key's pair set is swapped wholesale, so an
    * affected key with no surviving pair simply leaves the MV — one
    * fenced atomic commit carrying the packed (headA·2³², headB)
    * cursor pair. Rewrites on either side therefore stay
    * `incremental`; only the non-diffable (restore, evolution
    * meeting a rewrite) or retention-retired window degrades to a
    * refresh RECOMPUTED AT THE CONSULTED HEADS — drift detected,
    * never assumed away, and appends racing past the consult stay in
    * the next window.
    *
    * 100 TB shape: per maintenance O(affected keys' extent-hit waves
    * on both sides + MV hit waves) — a delta touching 1 of 10,000
    * waves of B opens 1 ([[Warehouse.casReadPrunedAt]]; the
    * poisoned-wave spec), and a GDPR delete on either source costs
    * the MV its own affected keys, never a rebuild.
    */
  def maintainJoin(spark: SparkSession, wh: Warehouse,
      a: String, b: String, mv: String, k: String,
      afterLand: () => Unit = () => ()): String = {
    val stream = s"ivmj:$a:$b"
    def pack(x: Int, y: Int): Long =
      (x.toLong << 32) | (y.toLong & 0xffffffffL)
    // a side's state at the WINDOW's head, restricted to the
    // affected keys: extent-pruned by their range when every key
    // casts to long (the stats discipline), full time-travel read
    // otherwise — never the live HEAD (appends past the consult
    // belong to the next window)
    def sliverAt(table: String, ver: Int, keys: DataFrame): DataFrame = {
      val r = keys.agg(min(col(k).cast("long")),
        max(col(k).cast("long")), count(lit(1)),
        count(col(k).cast("long"))).head()
      val base =
        if (r.isNullAt(0) || r.getLong(2) != r.getLong(3))
          wh.casReadAt(spark, table, ver)
        else wh.casReadPrunedAt(spark, table, k, r.getLong(0),
          r.getLong(1), ver)
      base.join(keys, Seq(k), "left_semi")
    }
    // the typed window consult: ONE log walk yields verdict + frame
    // ([[Warehouse.casCdfFeed]]), so plan and frame can never
    // disagree across a racing commit; an empty or meta-only window
    // costs ZERO data-path listings, and a retention-retired window
    // degrades to the refresh path like any non-diffable one. None =
    // refresh; Some(None) = nothing to read; Some(Some(df)) = delta.
    def win(table: String,
        from: Int): (Option[Option[DataFrame]], Int) =
      wh.casCdfFeed(spark, table, from) match {
        case (CasCdfResult.NonDiffable | CasCdfResult.Retired(_),
          head) => (None, head)
        case (CasCdfResult.Empty, head) => (Some(None), head)
        case (CasCdfResult.Delta(d, _), head) => (Some(Some(d)), head)
      }
    var out = Option.empty[String]
    var round = 0
    while (out.isEmpty) {
      if (round >= MaxRounds) spent(s"maintainJoin($mv)")
      round += 1
      val cur = wh.casStreamCursor(mv, stream)
      val (curA, curB) = ((cur >>> 32).toInt, cur.toInt)
      val (winA, headA) = win(a, curA)
      val (winB, headB) = win(b, curB)
      val toB = pack(headA, headB)
      if (headA == curA && headB == curB) out = Some("noop")
      else if (winA.isEmpty || winB.isEmpty) {
        if (wh.casOverwriteTxn(
          wh.casReadAt(spark, a, headA)
            .join(wh.casReadAt(spark, b, headB), Seq(k)),
          mv, stream, toB, cur).isDefined)
          out = Some("refresh")
      } else {
        val deltas = Seq(winA, winB).flatMap(_.flatten)
        val kd =
          if (deltas.isEmpty) None
          else {
            val keys = deltas.map(_.select(col(k)))
              .reduce(_ union _).distinct().persist()
            if (keys.isEmpty) { keys.unpersist(); None }
            else Some(keys)
          }
        kd match {
          case None => // meta-only window or fully-cancelled diff
            if (wh.casTxnAdvance(mv, stream, toB, cur).isDefined)
              out = Some("noop")
          case Some(keys) =>
            try {
              val boot = !wh.casHasData(mv)
              val pairs = sliverAt(a, headA, keys)
                .join(sliverAt(b, headB, keys), Seq(k))
              if (boot)
                wh.casAppendStats(spark, pairs.limit(0), mv, k)
              // ONE key-grain group replace: each affected key's
              // pair SET is swapped wholesale (N:M multiplicities
              // ride as physical rows), and an affected key with no
              // surviving pair — a deleted source row, or a key
              // still waiting for its other side — leaves the MV
              if (wh.casReplaceKeys(spark, mv, k, keys, pairs,
                stream, toB, fence = Some(cur)).isDefined)
                out = Some(if (boot) "bootstrap" else "incremental")
            } finally { keys.unpersist(); () }
        }
      }
    }
    afterLand()
    out.get
  }

  /** [[maintainSumCount]] with the CATALOG-CONSISTENT publish: one
    * [[Warehouse.catCommitMax]] pins the source AT THE CURSOR the
    * rollup reflects together with the rollup's version — so a
    * catalog reader can NEVER join a rollup against source rows it
    * has not absorbed (or vice versa), even while direct appends
    * keep landing past the cursor (they stay visible to direct
    * `casRead`ers, the documented catalog-vs-direct split, and enter
    * the pinned view at the next maintenance). Both pins derive from
    * ONE rollup-log consult ([[Warehouse.casStreamCursorAt]] at the
    * observed head), so concurrent maintainers can never publish a
    * skewed pair; the monotone pin merge means they never regress
    * each other either.
    */
  def maintainSumCountCat(spark: SparkSession, wh: Warehouse,
      src: String, rollup: String, g: String, v: String): String = {
    val mode = maintainSumCount(spark, wh, src, rollup, g, v)
    val rollHead = wh.casHead(rollup)
    val cursor = wh.casStreamCursorAt(rollup, "ivm:" + src, rollHead)
    wh.catCommitMax(Seq(src -> cursor.toInt, rollup -> rollHead))
    mode
  }
}
