package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Warehouse

/** Incrementally-maintained rollup over a CAS table — the round's
  * devices composed into the thing a 100 TB pipeline actually runs:
  * [[Warehouse.casChangesSince]] supplies the O(delta) input,
  * [[Warehouse.casMergeBatch]] lands the touched groups' new totals
  * as an extent-local upsert, and the full-refresh signal (any
  * rewrite in the window) degrades to a REPLACE recompute instead
  * of silently drifting. SUM/COUNT are self-additive, so the merge
  * source is (prior totals of touched groups) + (delta totals) —
  * one semi-join read of the small rollup, never a source rescan.
  *
  * CRASH SAFETY: the cursor sidecar is written AFTER the landing
  * commit, so a crash between them re-consumes the same window on
  * restart — which would DOUBLE-COUNT an additive delta. The merge
  * therefore lands through [[Warehouse.casMergeBatch]] with the
  * source head as the batch id: the re-run recomputes the identical
  * merge and DEDUPS on the marker (the recomputed totals are equal
  * because the window is, by definition, the same). The refresh
  * path is a recompute and idempotent by construction; the
  * bootstrap seeds an empty rollup first so its landing rides the
  * same marker. `afterLand` is the crash seam the spec injects into.
  */
object CasIvm {

  /** One maintenance run of `rollup` = SELECT g, sum(v), count(*)
    * FROM src GROUP BY g. Returns the maintenance mode actually
    * taken: "bootstrap" (first run), "incremental" (append-only
    * window merged — or its crash-replay, deduped on the marker),
    * "refresh" (rewrite detected, full recompute), or "noop" (empty
    * window). The cursor persists in a one-row sidecar table under
    * the same warehouse root; single-maintainer contract (the
    * marker closes the crash-replay window, not concurrent
    * maintainers).
    */
  def maintainSumCount(spark: SparkSession, wh: Warehouse,
      src: String, rollup: String, g: String, v: String,
      afterLand: () => Unit = () => ()): String = {
    val cursorT = rollup + "__cursor"
    val stream = "ivm:" + src
    val cursor =
      if (wh.exists(cursorT))
        wh.read(spark, cursorT).head().getLong(0).toInt
      else 0
    def aggOf(df: DataFrame): DataFrame =
      df.groupBy(col(g)).agg(sum(col(v)).cast("long").as("sum_v"),
        count(lit(1)).as("n_rows"))
    val (chg, head) = wh.casChangesSince(spark, src, cursor)
    val mode = chg match {
      case None =>
        // a rewrite (delete/update/merge/compaction) invalidated the
        // additive path: recompute from the snapshot — correct under
        // ANY history (and under re-runs), and the detection is the
        // point
        wh.casOverwrite(aggOf(wh.casRead(spark, src)), rollup)
        "refresh"
      case Some(delta) =>
        val d = aggOf(delta)
        if (d.isEmpty) "noop"
        else {
          val boot = cursor == 0
          if (boot)
            // seed an empty rollup so the first landing goes through
            // the same marker-carrying merge as every later one
            wh.casAppendStats(spark, d.limit(0), rollup, g)
          // touched groups only: prior totals semi-joined against the
          // delta's group keys (the rollup is group-cardinality
          // small; the SOURCE is never rescanned)
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
          // batchId = the source head this window reaches: a crash
          // between this commit and the cursor write re-runs the
          // SAME window and dedups here instead of double-counting
          wh.casMergeBatch(spark, rollup, g, merged, stream,
            head.toLong)
          if (boot) "bootstrap" else "incremental"
        }
    }
    afterLand() // test seam: the land-to-cursor crash window
    wh.overwrite(spark.range(1).select(lit(head.toLong).as("cursor")),
      cursorT)
    mode
  }

  /** JOIN-MV maintenance — `mv = SELECT k, <a-cols>, <b-cols> FROM a
    * JOIN b USING (k)` kept current from BOTH sides' tail-reads with
    * the textbook delta-join: the new pairs of a window are exactly
    * `(ΔA ⋈ B_new) ∪ (A_old ⋈ ΔB)` — ΔA joins the OTHER side's new
    * state, ΔB joins the other side's OLD state (time travel at the
    * cursor), so a pair born from both deltas lands exactly once.
    * Sources are append-only with unique keys per table (the
    * event/entity-id shape); any rewrite on either side fires q313's
    * refresh signal and the MV recomputes — drift detected, never
    * assumed away. The landing rides [[Warehouse.casMergeBatch]]
    * with `headA+headB` as the (monotone) batch id: an exact-window
    * crash replay dedups on the marker, and a grown-window replay is
    * ALSO safe because the merge updates the already-landed pairs in
    * place with identical values instead of duplicating them.
    *
    * 100 TB shape: per maintenance O(ΔA ⋈ B + A ⋈ ΔB) join work and
    * an extent-local MV upsert — the full sides are scanned as JOIN
    * inputs (prunable by the deltas' key extents), never rewritten.
    */
  def maintainJoin(spark: SparkSession, wh: Warehouse,
      a: String, b: String, mv: String, k: String,
      afterLand: () => Unit = () => ()): String = {
    val cursorT = mv + "__jcursor"
    val stream = s"ivmj:$a:$b"
    val (curA, curB) =
      if (wh.exists(cursorT)) {
        val r = wh.read(spark, cursorT).head()
        (r.getLong(0).toInt, r.getLong(1).toInt)
      } else (0, 0)
    val (chgA, headA) = wh.casChangesSince(spark, a, curA)
    val (chgB, headB) = wh.casChangesSince(spark, b, curB)
    val mode = (chgA, chgB) match {
      case (None, _) | (_, None) =>
        wh.casOverwrite(wh.casRead(spark, a)
          .join(wh.casRead(spark, b), Seq(k)), mv)
        "refresh"
      case (Some(da), Some(db)) =>
        if (da.isEmpty && db.isEmpty) "noop"
        else {
          val boot = curA == 0 && curB == 0
          val aOld =
            if (curA == 0) da.limit(0)
            else wh.casReadAt(spark, a, curA)
          // B at the WINDOW's head, not a fresh read: appends landing
          // after the consult belong to the next window
          val bNew = wh.casReadAt(spark, b, headB)
          val delta = da.join(bNew, Seq(k))
            .unionByName(aOld.join(db, Seq(k)))
          if (boot) wh.casAppendStats(spark, delta.limit(0), mv, k)
          wh.casMergeBatch(spark, mv, k, delta, stream,
            headA.toLong + headB.toLong)
          if (boot) "bootstrap" else "incremental"
        }
    }
    afterLand() // test seam: the land-to-cursor crash window
    wh.overwrite(spark.range(1).select(
      lit(headA.toLong).as("cur_a"), lit(headB.toLong).as("cur_b")),
      cursorT)
    mode
  }

  /** [[maintainSumCount]] with the CATALOG-CONSISTENT publish: one
    * [[Warehouse.catCommitMax]] pins the source AT THE CURSOR the
    * rollup now reflects together with the rollup's new version —
    * so a catalog reader can NEVER join a rollup against source
    * rows it has not absorbed (or vice versa), even while direct
    * appends keep landing past the cursor (they stay visible to
    * direct `casRead`ers, the documented catalog-vs-direct split,
    * and enter the pinned view at the next maintenance). The
    * monotone pin merge means concurrent maintainers/refreshers of
    * the same pair can never regress each other.
    */
  def maintainSumCountCat(spark: SparkSession, wh: Warehouse,
      src: String, rollup: String, g: String, v: String): String = {
    val mode = maintainSumCount(spark, wh, src, rollup, g, v)
    val cursor = wh.read(spark, rollup + "__cursor").head()
      .getLong(0).toInt
    wh.catCommitMax(Seq(src -> cursor, rollup -> wh.casHead(rollup)))
    mode
  }
}
