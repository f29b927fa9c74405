package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Beyond-reference analytics the engine exposes as first-class operators:
  * JSON extraction, event-time windows, sessionization, rolling frames,
  * rollup, percentiles, set ops (SURVEY §7.2 step 8; testdata `events`).
  */
object Events {

  /** JSON scalar extraction (`events.props` is a JSON string). */
  val q21 = Q("q21_json_extract",
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
      |       AS BIGINT) AS sum_k,
      |  count(*) AS n,
      |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
      |    AS avg_k
      |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
    val kv = get_json_object(col("props"), "$.k").cast("long")
    Tables(s, dir, "events")
      .groupBy("event_type")
      .agg(sum(kv).cast("long").as("sum_k"), count(lit(1)).as("n"),
        round(avg(kv), 4).as("avg_k"))
  }

  /** Tumbling event-time window (batch `window()`; the Structured
    * Streaming form reuses the same expression — see graft.streaming).
    * Window start formatted as a string for a type-stable oracle compare.
    */
  val q22 = Q("q22_tumbling_window",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
      |    AS win_start,
      |  event_type, count(*) AS n, round(sum(value), 2) AS sum_val
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_val"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
        .as("win_start"), col("event_type"), col("n"), col("sum_val"))
  }

  /** Gap-based sessionization (30-min inactivity): lag + cumulative
    * new-session sum, then two-level aggregation. All window work is
    * partitioned by user — scales out on user_id.
    */
  val q23 = Q("q23_sessionize",
    """WITH g AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR date_diff('second', lag(ts) OVER w, ts) > 1800
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, event_id,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM g),
      |per_sess AS (
      |  SELECT user_id, session_id, count(*) AS n_events
      |  FROM sess GROUP BY 1, 2)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
      |  CAST(max(n_events) AS BIGINT) AS max_sess_events,
      |  CAST(sum(n_events) AS BIGINT) AS n_events
      |FROM per_sess GROUP BY user_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val newSess = when(lag(col("ts"), 1).over(w).isNull ||
      (col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
        > 1800, 1).otherwise(0)
    val cum = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "events")
      .withColumn("new_sess", newSess)
      .withColumn("session_id", sum(col("new_sess")).over(cum))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max("n_events").as("max_sess_events"),
        sum("n_events").cast("long").as("n_events"))
  }

  /** Rolling frame aggregate (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW). */
  val q24 = Q("q24_rolling_window",
    """SELECT event_id, user_id,
      |  round(sum(value) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2) AS roll_sum
      |FROM events""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        round(sum("value").over(w), 2).as("roll_sum"))
  }

  /** ROLLUP (grouping sets) over year × status. */
  val q25 = Q("q25_rollup",
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, o_orderstatus,
      |  count(*) AS n,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
      |    AS DOUBLE) AS amt
      |FROM orders
      |GROUP BY ROLLUP (1, 2)""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .rollup(year(col("o_orderdate")).cast("long").as("o_year"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
          .cast("double").as("amt"))
  }

  /** Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`). At 100 TB the scale path is
    * `approx_percentile` — exposed in the library; exact kept for the
    * oracle.
    */
  val q26 = Q("q26_percentile",
    """SELECT c_mktsegment,
      |  round(quantile_cont(c_acctbal, 0.5), 4) AS median_bal,
      |  round(quantile_cont(c_acctbal, 0.9), 4) AS p90_bal,
      |  count(*) AS n
      |FROM customer GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
    Tables(s, dir, "customer")
      .groupBy("c_mktsegment")
      .agg(round(expr("percentile(c_acctbal, 0.5)"), 4).as("median_bal"),
        round(expr("percentile(c_acctbal, 0.9)"), 4).as("p90_bal"),
        count(lit(1)).as("n"))
  }

  /** Set operation: EXCEPT (distinct) — BUILDING customers with no
    * urgent order.
    */
  val q27 = Q("q27_set_except",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |EXCEPT
      |SELECT o_custkey FROM orders
      |WHERE o_orderpriority = '1-URGENT'""".stripMargin) { (s, dir) =>
    val b = Tables(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val u = Tables(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    b.except(u)
  }

  /** As-of join (temporal attribution): each purchase matched to the
    * user's most recent click at-or-before it. Spark has no native
    * as-of operator; graft.ops.AsOf composes it as union + keyed
    * ordered window (one shuffle). Oracle: DuckDB's native ASOF JOIN.
    */
  val q42 = Q("q42_asof_join",
    """SELECT p.event_id, p.user_id, c.event_id AS click_id,
      |  date_diff('second', c.ts, p.ts) AS gap_s
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin) {
    (s, dir) =>
      val e = Tables(s, dir, "events")
      val p = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val c = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      graft.ops.AsOf.join(p, c, Seq("user_id"), "ts", "ts",
        Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").as("click_id"),
          (col("ts").cast("long") - col("asof_ts").cast("long"))
            .as("gap_s"))
  }

  /** Banded range join: purchase×click pairs of the same user within
    * ±10 minutes — equi-join on (user, time-band) + exact filter
    * instead of the quadratic inequality join Spark would plan.
    * Oracle: DuckDB plans the raw inequality natively (IEJoin).
    */
  val q43 = Q("q43_range_join",
    """SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id,
      |  date_diff('second', c.ts, p.ts) AS gap_s
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND p.ts >= c.ts - INTERVAL 600 SECONDS
      | AND p.ts <= c.ts + INTERVAL 600 SECONDS""".stripMargin) {
    (s, dir) =>
      val e = Tables(s, dir, "events")
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("ts_p"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id"),
          col("ts").as("ts_c"))
      graft.ops.RangeJoin.withinGap(p, c, Seq("user_id"),
        "ts_p", "ts_c", 600L)
        .select(col("p_id"), col("c_id"), col("user_id"),
          (col("ts_p").cast("long") - col("ts_c").cast("long"))
            .as("gap_s"))
  }

  /** CUBE grouping sets (all four combinations of year × status). */
  val q44 = Q("q44_cube",
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, o_orderstatus,
      |  count(*) AS n,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
      |    AS DOUBLE) AS amt
      |FROM orders
      |GROUP BY CUBE (1, 2)""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .cube(year(col("o_orderdate")).cast("long").as("o_year"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
          .cast("double").as("amt"))
  }

  /** RANGE interval frame: per-user rolling 1-hour sum ordered by
    * event time (value-range frame, not row-count — SURVEY §2.5 noted
    * the reference never uses frame specs; the engine supports both).
    */
  val q45 = Q("q45_range_frame",
    """SELECT event_id, user_id,
      |  round(sum(value) OVER (
      |    PARTITION BY user_id
      |    ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS roll_1h
      |FROM events""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").cast("long"))
      .rangeBetween(-3600L, Window.currentRow)
    Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        round(sum("value").over(w), 2).as("roll_1h"))
  }

  /** Ordered conversion funnel: per user, first 'view', first 'click'
    * strictly AFTER that view, first 'purchase' strictly after that
    * click — the sequential-step semantics (a purchase before the
    * click does NOT count), then one row per funnel step with the
    * surviving user count. Shape: three keyed min-aggregations (one
    * shuffle each on user_id, conditional min avoids re-scanning
    * events per step) over a small per-user frame — no window over the
    * whole event stream, no self-join explosion.
    */
  val q58 = Q("q58_funnel",
    """WITH v AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ts END) AS t1
      |  FROM events GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t2
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t1
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t3
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t2
      |  GROUP BY e.user_id)
      |SELECT * FROM (
      |  SELECT 1 AS step, 'view' AS name,
      |    CAST(count(t1) AS BIGINT) AS n_users FROM v
      |  UNION ALL
      |  SELECT 2, 'view>click', CAST(count(*) AS BIGINT) FROM c
      |  UNION ALL
      |  SELECT 3, 'view>click>purchase', CAST(count(*) AS BIGINT) FROM p)
      |""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir, "events")
    val v = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("ts"))).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    v.agg(count(col("t1")).as("n_users"))
      .select(lit(1).as("step"), lit("view").as("name"), col("n_users"))
      .unionByName(c.agg(count(lit(1)).as("n_users"))
        .select(lit(2).as("step"), lit("view>click").as("name"),
          col("n_users")))
      .unionByName(p.agg(count(lit(1)).as("n_users"))
        .select(lit(3).as("step"),
          lit("view>click>purchase").as("name"), col("n_users")))
  }

  /** Cohort retention: users grouped by the Monday-start week of their
    * FIRST event (date_trunc('week') agrees across engines), counted
    * in every week they were active, with the week offset. Two
    * aggregations + one join on user_id — the cohort frame is one row
    * per (user, active week), never the raw event stream.
    */
  val q59 = Q("q59_retention_cohorts",
    """WITH e AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS DATE) AS wk
      |  FROM events),
      |c AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id)
      |SELECT c.cohort_wk, e.wk AS active_wk,
      |  CAST((e.wk - c.cohort_wk) // 7 AS BIGINT) AS week_no,
      |  count(*) AS n_users
      |FROM e JOIN c ON c.user_id = e.user_id
      |GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir, "events")
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val c = e.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    e.join(c, Seq("user_id"))
      .select(col("cohort_wk"), col("wk").as("active_wk"),
        (datediff(col("wk"), col("cohort_wk")) / 7).cast("long")
          .as("week_no"))
      .groupBy("cohort_wk", "active_wk", "week_no")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Sequence mining — top user JOURNEYS: each user's first three
    * event types concatenated in event-time order, counted across
    * users, thresholded at ≥2 (path-space grows |types|^k, so k and
    * the support floor trade off against corpus size). The path string is assembled by
    * conditional-max PIVOT over the row number (max(when(rn=i)))
    * rather than collect_list, whose intra-group order Spark does not
    * guarantee — the pivot is deterministic on any executor layout.
    * Window is partitioned by user (scales out); concat_ws skips the
    * NULL slots of short histories identically in both engines.
    */
  val q68 = Q("q68_event_paths",
    """WITH e AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events),
      |j AS (
      |  SELECT user_id, concat_ws('>',
      |    max(CASE WHEN rn = 1 THEN event_type END),
      |    max(CASE WHEN rn = 2 THEN event_type END),
      |    max(CASE WHEN rn = 3 THEN event_type END)) AS path
      |  FROM e WHERE rn <= 3 GROUP BY user_id)
      |SELECT path, count(*) AS n_users
      |FROM j GROUP BY path HAVING count(*) >= 2""".stripMargin) {
    (s, dir) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val slots = (1 to 3).map(i =>
        max(when(col("rn") === i, col("event_type"))))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .groupBy("user_id")
        .agg(concat_ws(">", slots: _*).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_users"))
        .filter(col("n_users") >= 2)
  }

  /** EXACT z-score outlier counts via integer moments. `value` is
    * 2dp-generated (stored as double), so X = round(100·value) is an
    * exact integer in both engines; S=ΣX and Q=ΣX² accumulate in
    * DECIMAL(38,0) (sums overflow BIGINT long before 100 TB). The
    * per-row test |x−μ| > 2σ_sample is cleared of ALL floating-point
    * by multiplying through:
    *   (X·n − S)² · (n−1) > 4·n·(n·Q − S²)
    * — pure integer arithmetic, so the outlier COUNT is bit-exact at
    * any summation order (a double mean/stddev compare can flip rows
    * sitting near the threshold). PRECISION BOUND, not unlimited
    * scale: the products live in DECIMAL(38,0), and the dominant term
    * (X·n − S)²·(n−1) is ≈ (max|X−μ|·n)²·n — with |X| ≤ 5·10⁴ (this
    * data's 2dp values ≤ 500) the 38-digit cap holds to n ≈ 10⁹ rows
    * per group; beyond that non-ANSI Spark NULLs the product (the
    * outlier silently counts 0) while an oracle in wider integers
    * errors or keeps going — the engines diverge SILENTLY. At that
    * scale divide the test through by n (one double division,
    * threshold rows then need a guarded exact recheck) or widen to
    * per-group two-pass central moments. Group moments (one row per
    * event_type) broadcast back onto the stream: two narrow passes,
    * no window over the raw events.
    */
  val q71 = Q("q71_outlier_zscore",
    """WITH x AS (
      |  SELECT event_type,
      |    CAST(round(value * 100) AS HUGEINT) AS xv
      |  FROM events),
      |m AS (
      |  SELECT event_type, count(*) AS n, sum(xv) AS s,
      |    sum(xv * xv) AS q
      |  FROM x GROUP BY event_type)
      |SELECT x.event_type, CAST(m.n AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN (x.xv * m.n - m.s) * (x.xv * m.n - m.s)
      |                     * (m.n - 1) > 4 * m.n * (m.n * m.q - m.s * m.s)
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  CAST(round(CAST(m.s AS DOUBLE) / (100 * m.n), 6) AS DOUBLE)
      |    AS mean_val
      |FROM x JOIN m ON x.event_type = m.event_type
      |GROUP BY x.event_type, m.n, m.s, m.q""".stripMargin) { (s, dir) =>
    val xv = round(col("value") * 100).cast("decimal(18,0)")
    val x = Tables(s, dir, "events")
      .select(col("event_type"), xv.as("xv"))
    val m = x.groupBy("event_type")
      .agg(count(lit(1)).cast("decimal(18,0)").as("n"),
        sum(col("xv")).cast("decimal(38,0)").as("s"),
        sum((col("xv") * col("xv")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("q"))
    val dev = col("xv") * col("n") - col("s")
    val isOut = (dev * dev * (col("n") - lit(1).cast("decimal(18,0)"))) >
      (lit(4).cast("decimal(18,0)") * col("n") *
        (col("n") * col("q") - col("s") * col("s")))
    x.join(broadcast(m), Seq("event_type"))
      .groupBy(col("event_type"), col("n"), col("s"))
      .agg(sum(when(isOut, 1).otherwise(0)).cast("long").as("n_outliers"))
      .select(col("event_type"), col("n").cast("long").as("n"),
        col("n_outliers"),
        round(col("s").cast("double") /
          (lit(100) * col("n").cast("double")), 6).as("mean_val"))
  }

  /** Set operation: INTERSECT (distinct) — the complement of q27's
    * EXCEPT: customers who placed BOTH an urgent and a low-priority
    * order. Both engines apply distinct-set semantics.
    */
  val q78 = Q("q78_set_intersect",
    """SELECT CAST(o_custkey AS BIGINT) AS cust
      |FROM orders WHERE o_orderpriority = '1-URGENT'
      |INTERSECT
      |SELECT CAST(o_custkey AS BIGINT)
      |FROM orders WHERE o_orderpriority = '5-LOW'""".stripMargin) {
    (s, dir) =>
      val o = Tables(s, dir, "orders")
      o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").cast("long").as("cust"))
        .intersect(o.filter(col("o_orderpriority") === "5-LOW")
          .select(col("o_custkey").cast("long").as("cust")))
  }

  /** Fixed-width histogram (width_bucket semantics, hand-rolled so
    * both engines share the exact bin arithmetic): 25-unit bins over
    * `value`, clamped to a top bin — bin assignment is a pure map
    * expression, the aggregate key space is the BIN COUNT (20) no
    * matter the row count, so the shuffle carries a constant number
    * of groups at any scale. Per-bin count + 2dp value sum (q22's
    * double-sum rounding policy).
    */
  val q84 = Q("q84_value_histogram",
    """SELECT CAST(least(CAST(floor(value / 25) AS BIGINT), 19)
      |    AS BIGINT) AS bin,
      |  count(*) AS n,
      |  round(sum(value), 2) AS sum_val
      |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(least(floor(col("value") / 25).cast("long"), lit(19L))
        .as("bin"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_val"))
  }

  /** Native `session_window` in BATCH mode, gate-checked against the
    * classic lag/cumsum formulation (q23's machinery) — certifying
    * that the declarative operator and the hand-built one agree on
    * REAL data pins three subtle semantics: a new session starts when
    * the gap is >= the threshold (session windows are [start, end),
    * so an event landing exactly on the previous end opens a new
    * one); the gap is EXACT microsecond duration, not
    * `date_diff('second')` — which counts second-BOUNDARY crossings
    * and calls a 1799.3 s gap "1800" when it straddles the right
    * sub-second phase (one real session split at sf0.1 hangs on
    * this); and the window's end is the LAST event + gap (not max ts).
    * This is also the exact expression the streaming
    * [[graft.streaming.StreamingEtl.sessionizeStream]] runs — batch
    * and stream share one definition. Work is user-partitioned: the
    * session assignment scales out on user_id.
    */
  val q92 = Q("q92_session_window",
    """WITH g AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
      |              >= 1800 * 1000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g)
      |SELECT user_id,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
      |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
      |    AS sess_end,
      |  count(*) AS n_events, round(sum(value), 2) AS sum_val
      |FROM sess GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_val"))
      .select(col("user_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss")
          .as("sess_start"),
        date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("sess_end"),
        col("n_events"), col("sum_val"))
  }

  /** [[q42]]'s as-of attribution planned through the NATIVE operator
    * ([[graft.plans.AsOfJoin]]: custom logical node + planner strategy
    * + physical merge) instead of the composed union-window. Identical
    * oracle, identical output — what changes is the plan: each side
    * shuffles and sorts ONLY ITSELF on the key (the SortMergeJoin
    * distribution contract), and the merge holds one buffered right
    * row per partition instead of running window machinery over a
    * null-padded union. Registered side by side with q42 so the gate
    * continuously proves composed ≡ native.
    */
  val q119 = Q("q119_asof_native",
    """SELECT p.event_id, p.user_id, c.event_id AS click_id,
      |  date_diff('second', c.ts, p.ts) AS gap_s
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin) {
    (s, dir) =>
      val e = Tables(s, dir, "events")
      val p = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val c = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      graft.plans.AsOfJoin.join(p, c, Seq("user_id"), "ts", "ts",
        Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").as("click_id"),
          (col("ts").cast("long") - col("asof_ts").cast("long"))
            .as("gap_s"))
  }

  /** Markov TRANSITION MATRIX over per-user event sequences: counts
    * and conditional probabilities p(next | prev) for every adjacent
    * event-type pair — the behavioral-sequence summary (and the
    * training target of a first-order sequence model), complementing
    * q68's head-path histogram. Shape: one lag() window keyed on the
    * user (a single shuffle on the natural parallel grain), then a
    * hash agg down to the |types|² transition grain — tiny at any
    * corpus size; prefix totals reuse that table. Ordering ties
    * break on event_id, so `prev` is engine-deterministic.
    */
  val q122 = Q("q122_event_transitions",
    """WITH e AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |                          ORDER BY ts, event_id) AS prev
      |  FROM events),
      |c AS (
      |  SELECT prev, event_type AS next, count(*) AS n
      |  FROM e WHERE prev IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT prev, sum(n) AS tot FROM c GROUP BY prev)
      |SELECT c.prev, c.next, CAST(c.n AS BIGINT) AS n,
      |  round(CAST(c.n AS DOUBLE) / t.tot, 6) AS p
      |FROM c JOIN t USING (prev)""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val c = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
    val t = c.groupBy("prev").agg(sum(col("n")).as("tot"))
    c.join(broadcast(t), Seq("prev"))
      .select(col("prev"), col("next"), col("n").cast("long").as("n"),
        round(col("n").cast("double") / col("tot"), 6).as("p"))
  }

  /** [[q43]]'s banded range join planned through the NATIVE interval
    * operator ([[graft.plans.IntervalJoin]]): same DuckDB IEJoin
    * oracle, same output pairs — but instead of duplicating every
    * right row into three time bands and filtering the residual, each
    * side shuffles once on the key and a forward merge slides a
    * 2·gap window of right rows past the left. Registered beside q43
    * so the gate continuously proves banded ≡ native ≡ DuckDB.
    */
  val q123 = Q("q123_interval_native",
    """SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id,
      |  date_diff('second', c.ts, p.ts) AS gap_s
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND p.ts >= c.ts - INTERVAL 600 SECONDS
      | AND p.ts <= c.ts + INTERVAL 600 SECONDS""".stripMargin) {
    (s, dir) =>
      val e = Tables(s, dir, "events")
      val p = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val c = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      graft.plans.IntervalJoin.join(p, c, Seq("user_id"), "ts", "ts",
        600L, Seq("event_id"))
        .select(col("event_id").as("p_id"),
          col("band_event_id").as("c_id"), col("user_id"),
          (col("ts").cast("long") - col("band_ts").cast("long"))
            .as("gap_s"))
  }

  /** ITERATIVE LINEAR ALGEBRA AT BOUNDED GRAIN — the stationary
    * distribution of q122's event-transition Markov chain by three
    * power-iteration steps, every quantity an exact integer: the
    * transition matrix is quantized to micro-units with half-up
    * INTEGER division ((2·n·10⁶ + tot) div (2·tot) — no float ever),
    * the mass vector starts uniform, and each step is one
    * matrix-vector multiply at |types|² grain followed by the same
    * integer renormalizing division. Both engines therefore iterate
    * the identical integer map — no accumulation-order or rounding
    * divergence is possible at any depth.
    *
    * Scale shape: the corpus pays ONE per-user lag window + one
    * (prev,next) count agg (q122's cost); the matrix and vector then
    * live at |types|² / |types| grain, so iteration depth is free at
    * 100 TB — each step is a broadcast join of bounded tables
    * (Spark's ReuseExchange dedups the repeated matrix subplan; a
    * production loop would persist the matrix once, the q133
    * driver-loop pattern). Types with no outgoing edges absorb mass
    * out of the system (the matrix is row-substochastic there) —
    * deterministic, and absent in this corpus where every type
    * transitions.
    */
  val q145 = Q("q145_markov_stationary",
    """WITH e AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |                          ORDER BY ts, event_id) AS prev
      |  FROM events),
      |c AS (
      |  SELECT prev, event_type AS next, count(*) AS n
      |  FROM e WHERE prev IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT prev, sum(n) AS tot FROM c GROUP BY prev),
      |q AS (SELECT prev, next,
      |        (2 * n * 1000000 + tot) // (2 * tot) AS q
      |      FROM c JOIN t USING (prev)),
      |ty AS (SELECT DISTINCT event_type AS ty FROM events),
      |v0 AS (SELECT ty, 1000000 // (SELECT count(*) FROM ty) AS m
      |       FROM ty),
      |v1 AS (SELECT q.next AS ty,
      |         (2 * sum(v0.m * q.q) + 1000000) // 2000000 AS m
      |       FROM v0 JOIN q ON q.prev = v0.ty GROUP BY q.next),
      |v2 AS (SELECT q.next AS ty,
      |         (2 * sum(v1.m * q.q) + 1000000) // 2000000 AS m
      |       FROM v1 JOIN q ON q.prev = v1.ty GROUP BY q.next),
      |v3 AS (SELECT q.next AS ty,
      |         (2 * sum(v2.m * q.q) + 1000000) // 2000000 AS m
      |       FROM v2 JOIN q ON q.prev = v2.ty GROUP BY q.next)
      |SELECT ty, CAST(m AS BIGINT) AS mass_micro,
      |  CAST(m AS DOUBLE) / 1000000 AS p
      |FROM v3""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val ev = Tables(s, dir, "events")
    val c = ev
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
    val t = c.groupBy("prev").agg(sum(col("n")).as("tot"))
    val qm = c.join(broadcast(t), Seq("prev"))
      .select(col("prev"), col("next"),
        expr("div(2 * n * 1000000 + tot, 2 * tot)").as("q"))
    val ty = ev.select(col("event_type").as("ty")).distinct()
    val v0 = ty.crossJoin(broadcast(ty.agg(count(lit(1)).as("cnt"))))
      .select(col("ty"), expr("div(1000000, cnt)").as("m"))
    def step(v: org.apache.spark.sql.DataFrame) =
      v.join(broadcast(qm), v("ty") === qm("prev"))
        .groupBy(col("next"))
        .agg(expr("div(2 * sum(m * q) + 1000000, 2000000)").as("m"))
        .select(col("next").as("ty"), col("m"))
    val v3 = step(step(step(v0)))
    v3.select(col("ty"), col("m").cast("long").as("mass_micro"),
      (col("m").cast("double") / 1000000).as("p"))
  }

  private val BtTypes =
    Seq("click", "error", "purchase", "signup", "view")
  private val BtIters = 8

  /** The [[q183]] oracle, generated mechanically. The event-type enum
    * is the generator contract (the q171 hardcoded-slice precedent),
    * which buys the one thing a float fixed-point iteration needs
    * across engines: an EXPLICIT `t1 + t2 + ...` chain in ascending
    * type order — left-associated addition with every operand a
    * division of exact integers, so both engines execute the
    * identical IEEE op sequence (no list/aggregate summation-order
    * trust). Iteration frames are MATERIALIZED (w_t feeds both
    * w_{t+1} and its 1-row pivot).
    */
  private def btSql(iters: Int): String = {
    val gCols = BtTypes.map(t => s"g_$t")
    val pivotG = BtTypes.map(t =>
      s"    CAST(sum(CASE WHEN m.j = '$t' THEN m.n + m2.n ELSE 0 END) " +
        s"AS BIGINT) AS g_$t").mkString(",\n")
    val pivotW = BtTypes.map(t =>
      s"    max(CASE WHEN i = '$t' THEN w END) AS w_$t").mkString(",\n")
    val denomChain = BtTypes.map(t =>
      s"(CASE WHEN w.g_$t = 0 THEN 0 " +
        s"ELSE w.g_$t / CAST(w.w + p.w_$t AS DOUBLE) END)")
      .mkString("\n        + ")
    val carryG = gCols.map(g => s"w.$g").mkString(", ")
    val vals = BtTypes.map(t => s"('$t')").mkString(", ")
    val head =
      s"""ct AS (
         |  SELECT u.user_id, t.et, coalesce(c.c, 0) AS c
         |  FROM (SELECT DISTINCT user_id FROM events) u
         |  CROSS JOIN (VALUES $vals) t(et)
         |  LEFT JOIN (SELECT user_id, event_type, count(*) AS c
         |             FROM events GROUP BY 1, 2) c
         |    ON c.user_id = u.user_id AND c.event_type = t.et),
         |m AS MATERIALIZED (
         |  SELECT a.et AS i, b.et AS j,
         |    CAST(sum(CASE WHEN a.c > b.c THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n
         |  FROM ct a JOIN ct b ON a.user_id = b.user_id AND a.et <> b.et
         |  GROUP BY 1, 2),
         |w0 AS MATERIALIZED (
         |  SELECT m.i, CAST(sum(m.n) AS BIGINT) AS wins,
         |    CAST(sum(m.n + m2.n) AS BIGINT) AS games,
         |$pivotG,
         |    CAST(1000000 AS BIGINT) AS w
         |  FROM m JOIN m m2 ON m2.i = m.j AND m2.j = m.i
         |  GROUP BY m.i)""".stripMargin
    val stages = (1 to iters).map { t =>
      s"""wp${t - 1} AS (
         |  SELECT
         |$pivotW
         |  FROM w${t - 1}),
         |w$t AS MATERIALIZED (
         |  SELECT w.i, w.wins, w.games, $carryG,
         |    CASE WHEN w.games = 0 THEN w.w
         |      ELSE CAST(round(w.wins / (
         |        $denomChain)) AS BIGINT)
         |    END AS w
         |  FROM w${t - 1} w CROSS JOIN wp${t - 1} p)""".stripMargin
    }
    (head +: stages).mkString(",\n")
  }

  /** BRADLEY-TERRY PREFERENCE-STRENGTH FITTING — the
    * preference-data-curation operator behind reward-model training:
    * derive pairwise preferences from behavior (item i beats item j
    * for a user when the user did i more often — a pure INTEGER count
    * comparison over a dense user × item grid, missing counts 0),
    * then fit BT strengths by Zermelo's MM iteration (Zermelo 1929;
    * Hunter 2004): w_i ← W_i / Σ_j g_ij/(w_i+w_j), synchronous
    * updates, `BtIters` rounds, no-games items carry their weight.
    *
    * Determinism across engines: the corpus-grain stage is all
    * integers; the driver loop quantizes weights to integer MICRO
    * units after every update, and each iteration's float work is a
    * fixed left-to-right chain of integer-ratio divisions (IEEE
    * exactly-rounded, so identical op sequence → identical bits; the
    * oracle writes the chain out explicitly per type rather than
    * trusting any aggregate's summation order). The one documented
    * boundary is `round` at an exact .5 micro — a measure-zero
    * landing for a quotient of corpus-derived integers, the q162
    * ulp-note stance, NOT q178's systematic decimal-grid case.
    *
    * Scale: the grid is |users| × K rows (linear, K items); the
    * pairwise stage emits K² rows per user map-side and
    * partial-aggregates to a K²-row matrix — the ONLY exchange is
    * (i, j)-grain; the K²-row driver pull and the O(K²·iters) loop
    * are the bounded-artifact pattern (the strength table IS what a
    * ranking deploy persists). 100 TB of events changes the count
    * aggregate's input, nothing else.
    */
  val q183 = Q("q183_bt_strength",
    s"""WITH ${btSql(BtIters)}
       |SELECT i AS etype, wins, games, w AS w_micro,
       |  CAST(row_number() OVER (ORDER BY w DESC, i) AS BIGINT) AS rank
       |FROM w$BtIters""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir, "events")
    val cnt = ev.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("c"))
    val tdf = s.createDataFrame(BtTypes.map(Tuple1(_)))
      .toDF("event_type")
    val grid = ev.select("user_id").distinct()
      .crossJoin(broadcast(tdf))
      .join(cnt, Seq("user_id", "event_type"), "left")
      .select(col("user_id"), col("event_type"),
        coalesce(col("c"), lit(0L)).as("c"))
    val a = grid.select(col("user_id"), col("event_type").as("i"),
      col("c").as("ci"))
    val b = grid.select(col("user_id"), col("event_type").as("j"),
      col("c").as("cj"))
    val m = a.join(b, Seq("user_id")).filter(col("i") =!= col("j"))
      .groupBy("i", "j")
      .agg(sum(when(col("ci") > col("cj"), 1L).otherwise(0L)).as("n"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    def n(i: String, j: String): Long = m.getOrElse((i, j), 0L)
    val wins = BtTypes.map(i =>
      i -> BtTypes.filter(_ != i).map(n(i, _)).sum).toMap
    val games = BtTypes.map(i =>
      i -> BtTypes.filter(_ != i).map(j => n(i, j) + n(j, i)).sum).toMap
    var w = BtTypes.map(_ -> 1000000L).toMap
    for (_ <- 1 to BtIters) {
      w = BtTypes.map { i =>
        i -> (if (games(i) == 0L) w(i)
        else {
          // the fold mirrors the oracle's explicit + chain: ascending
          // type order, self term 0.0 (adding 0.0 is an IEEE no-op)
          val denom = BtTypes.foldLeft(0.0) { (acc, j) =>
            val g = if (j == i) 0L else n(i, j) + n(j, i)
            acc + (if (g == 0L) 0.0
                   else g.toDouble / (w(i) + w(j)).toDouble)
          }
          math.round(wins(i).toDouble / denom)
        })
      }.toMap
    }
    val rank = BtTypes.sortBy(i => (-w(i), i)).zipWithIndex
      .map { case (i, r) => i -> (r + 1).toLong }.toMap
    s.createDataFrame(BtTypes.map(i =>
        (i, wins(i), games(i), w(i), rank(i))))
      .toDF("etype", "wins", "games", "w_micro", "rank")
  }

  /** GROUP-RELATIVE ADVANTAGE NORMALIZATION — the RLHF reward-shaping
    * step GRPO-style training runs per sampling group (normalize each
    * reward against its group's mean and spread; Shao et al. 2024,
    * public DeepSeekMath recipe): group = `user_id`, reward =
    * `value`. The determinism construction keeps EVERYTHING integer
    * until one final division: rewards are exact centi-units (the
    * corpus is 2-decimal, so ×100 never lands near a rounding
    * boundary), group moments (n, Σx, Σx²) are exact int64 sums, and
    * the z-score is algebraically rescaled to integer operands —
    * z = (x·n − S) / √(n·Q − S²) — so both engines divide and √ the
    * SAME exact integers (IEEE sqrt and division are
    * correctly-rounded: bit-identical). Zero-variance groups (and
    * singletons) get advantage 0 by the integer test n·Q − S² ≤ 0 —
    * exact, no epsilon. Headroom: centi-rewards ≤ 5e4 keep n·Q − S²
    * inside int64 for groups up to ~60k rows; larger groups need the
    * next quantization down, documented here rather than discovered
    * at 2^63.
    *
    * Scale shape: one group-grain aggregate (map-side partial — the
    * moments exchange carries one row per GROUP), one join back on
    * the group key (AQE picks broadcast while the group table is
    * small, shuffle-hash beyond), and a map-only projection. No
    * window, no sort, no driver state.
    */
  val q184 = Q("q184_group_advantage",
    """WITH e AS (
      |  SELECT event_id, user_id,
      |    CAST(round(value * 100) AS BIGINT) AS xc
      |  FROM events),
      |g AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(xc) AS BIGINT) AS sx,
      |    CAST(sum(xc * xc) AS BIGINT) AS qx
      |  FROM e GROUP BY 1)
      |SELECT e.event_id, e.user_id, e.xc AS x_centi,
      |  CASE WHEN g.n * g.qx - g.sx * g.sx <= 0 THEN 0
      |    ELSE CAST(round(CAST(e.xc * g.n - g.sx AS DOUBLE) * 1000000.0
      |      / sqrt(CAST(g.n * g.qx - g.sx * g.sx AS DOUBLE)))
      |      AS BIGINT)
      |  END AS adv_micro
      |FROM e JOIN g USING (user_id)""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        round(col("value") * 100).cast("long").as("xc"))
    val g = e.groupBy("user_id").agg(
      count(lit(1)).as("n"), sum("xc").as("sx"),
      sum(col("xc") * col("xc")).as("qx"))
    val varn = col("n") * col("qx") - col("sx") * col("sx")
    e.join(g, Seq("user_id"))
      .select(col("event_id"), col("user_id"),
        col("xc").as("x_centi"),
        when(varn <= 0L, lit(0L)).otherwise(
          round((col("xc") * col("n") - col("sx")).cast("double")
            * 1000000.0 / sqrt(varn.cast("double"))).cast("long"))
          .as("adv_micro"))
  }

  /** POINT-IN-TIME-CORRECT FEATURE JOIN — the feature-store leakage
    * guard for training-set assembly: every event must see the
    * feature version that was VALID AT ITS TIMESTAMP, never the
    * current one (joining training rows to `current_flag = 1` is the
    * classic leakage bug — it feeds the model information from the
    * row's future). The dimension is an SCD2-shaped, synthesized
    * 3-version history per user (validity thirds of the event range;
    * tier = (user_id + version) % 5, so the correct answer is pure
    * arithmetic); the engine runs BOTH joins — the PIT validity-range
    * lookup AND the buggy current-flag lookup — and reports, per
    * (event_type, tier), the event count, value sum, and `n_leak`:
    * how many rows the buggy join would have mis-featured. The
    * oracle NEVER joins: it derives the correct tier and the leak
    * count arithmetically from (user_id, ts) — a PASS proves the
    * interval lookup picked the right version for EVERY event.
    *
    * Shape: the dim is users × 3 versions (map-only synthesis off a
    * distinct-user collapse) and BROADCASTS — the realistic PIT plan
    * at any scale (facts never shuffle for a dim lookup); the range
    * predicate rides inside the broadcast-hash join on user_id. One
    * fact scan, one (event_type, tier)-grain aggregate.
    */
  val q201 = Q("q201_pit_features",
    """SELECT event_type,
      |  CAST((user_id + CASE WHEN ts < TIMESTAMP '2024-01-11'
      |      THEN 0 WHEN ts < TIMESTAMP '2024-01-21' THEN 1
      |      ELSE 2 END) % 5 AS BIGINT) AS tier,
      |  count(*) AS n_events,
      |  round(sum(value), 2) AS sum_val,
      |  count(*) FILTER (WHERE ts < TIMESTAMP '2024-01-21')
      |    AS n_leak
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir, "events")
      .select("event_id", "event_type", "user_id", "ts", "value")
    val users = e.select(col("user_id")).distinct()
    val dim = Seq((0, "2024-01-01", "2024-01-11"),
      (1, "2024-01-11", "2024-01-21"),
      (2, "2024-01-21", "2100-01-01"))
      .map { case (v, f, t) =>
        users.select(col("user_id").as("d_user"),
          to_timestamp(lit(f)).as("eff_ts"),
          to_timestamp(lit(t)).as("exp_ts"),
          ((col("user_id") + v) % 5).cast("long").as("tier"),
          lit(if (v == 2) 1 else 0).as("current_flag"))
      }.reduce(_ unionByName _)
    val pit = e.join(broadcast(dim),
      col("user_id") === col("d_user") &&
        col("ts") >= col("eff_ts") && col("ts") < col("exp_ts"))
      .select(col("event_type"), col("user_id"), col("value"),
        col("tier"))
    val cur = dim.filter(col("current_flag") === 1)
      .select(col("d_user").as("c_user"), col("tier").as("cur_tier"))
    pit.join(broadcast(cur), col("user_id") === col("c_user"))
      .groupBy("event_type", "tier")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_val"),
        sum(when(col("tier") =!= col("cur_tier"), 1L).otherwise(0L))
          .cast("long").as("n_leak"))
  }

  /** EVENT-TIME DISORDER AUDIT — the measurement that sizes a
    * streaming watermark before anyone picks one: per arriving event
    * (arrival order = event_id), lateness = how far the running
    * event-time HIGH-WATER MARK is ahead of this event's timestamp,
    * histogrammed at minute grain (the p99 of this histogram IS the
    * watermark delay a pipeline should configure; q22's windows drop
    * whatever lies beyond it). The raw feed is perfectly ordered, so
    * disorder is PLANTED deterministically (the q199 damage
    * convention): observed time = true time + (F(event_id) mod 601 −
    * 300) seconds via the shared q204 Feistel — both engines derive
    * the identical late feed.
    *
    * The operator's scale story is the running prefix-MAX itself:
    * the naive form is one corpus-wide ordered window (single
    * partition — dies at scale); the engine computes it as the q182
    * two-level block decomposition applied to MAX (block maxima →
    * exclusive max window over the BLOCK TABLE only → broadcast back
    * → within-block exclusive running max, partitioned by block) —
    * max is associative, so the decomposition is exact, and the
    * oracle IS the naive global window: an independent derivation
    * the block plan must match bit-for-bit.
    */
  val q216 = Q("q216_disorder_audit",
    s"""WITH ev AS (
       |  SELECT event_id, epoch_us(ts) // 1000000 AS t FROM events),
       |${Extras2.feistelSqlChain("ev", "event_id", "event_id, t",
          13L, "jt")},
       |obs AS (
       |  SELECT event_id, t + (y % 601 - 300) AS ot FROM jt),
       |o AS (
       |  SELECT event_id, ot,
       |    max(ot) OVER (ORDER BY event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
       |  FROM obs),
       |l AS (
       |  SELECT CASE WHEN pm IS NULL OR pm <= ot THEN 0
       |         ELSE pm - ot END AS late FROM o)
       |SELECT CAST(late // 60 AS BIGINT) AS bucket,
       |  count(*) AS n_events,
       |  CAST(max(late) AS BIGINT) AS max_late_s
       |FROM l GROUP BY 1""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir, "events").select(col("event_id"),
      expr("unix_micros(ts) div 1000000").as("t"))
    val obs = ev.select(col("event_id"),
      (col("t") + Extras2.feistel32(col("event_id"), lit(13L)) % 601
        - 300).as("ot"),
      expr("event_id div 500").as("blk"))
    val wB = Window.orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    // block maxima + exclusive prefix over the BLOCK table only
    val bpre = obs.groupBy("blk").agg(max("ot").as("bm"))
      .withColumn("bpm", max("bm").over(wB))
      .select("blk", "bpm")
    val wIn = Window.partitionBy("blk").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    obs.join(broadcast(bpre), Seq("blk"))
      .withColumn("wpm", max("ot").over(wIn))
      .withColumn("pm", greatest(col("bpm"), col("wpm")))
      .withColumn("late",
        when(col("pm").isNull || col("pm") <= col("ot"), 0L)
          .otherwise(col("pm") - col("ot")))
      .groupBy(expr("late div 60").as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        max("late").cast("long").as("max_late_s"))
  }

  val all: Seq[Q] =
    Seq(q21, q22, q23, q24, q25, q26, q27, q42, q43, q44, q45, q58, q59,
      q68, q71, q78, q84, q92, q119, q122, q123, q145, q183, q184, q201,
      q216)
}
