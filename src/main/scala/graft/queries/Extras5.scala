package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.etl.Pipeline
import graft.sources.{Tables, Warehouse}
import graft.SessionScratch

/** Round-16 batch: the reference's E2E daily refresh as ONE catalog
  * transaction (q291 — the single-`commit` DW build of
  * BikesDWSQl.sql:202 finally holding under the multi-writer model),
  * monotone concurrent pin advance (q292), and the checkpointed
  * O(since-checkpoint) retention/vacuum consult (q293). Same
  * determinism policy as [[Extras4]]: integer aggregates only,
  * mid-transaction evidence persisted at setup so re-invocations
  * read stable state.
  */
object Extras5 {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** The full Bikes daily-refresh input set derived from the TPC-H
    * corpus — every operational table the reference's nine SourceData
    * CSVs carry, restated so the DuckDB oracle can state both
    * refreshes' warehouse contents from the same raw tables:
    * orders/lineitem become SalesOrder/SalesOrderItems (run 1 ships
    * the EVEN order keys, run 2 the full set — the CDC delta),
    * customer becomes Customer, nation becomes Address (and the
    * Store/Partner spines), and the product trio is a 200-value
    * dimension spine (`P0..P199`, the q16 range-spine idiom) keyed by
    * `l_partkey % 200` — run 2 raises every third product's price,
    * the SCD2 change.
    */
  private[queries] def bikesInputs(s: SparkSession, dir: String,
      run2: Boolean): Pipeline.Inputs = {
    val o0 = t(s, dir, "orders")
    val li0 = t(s, dir, "lineitem")
    val o = if (run2) o0 else o0.filter(col("o_orderkey") % 2 === 0)
    val li = if (run2) li0 else li0.filter(col("l_orderkey") % 2 === 0)
    val pid = col("id")
    val products = s.range(0, 200).select(
      concat(lit("P"), pid).as("PRODUCTID"),
      concat(lit("C"), pid % 7).as("PRODCATEGORYID"),
      (pid % 11 + 1).as("PARTNERID"),
      ((pid * 13) % 500 + 10 +
        (if (run2) when(pid % 3 === 0, 10L).otherwise(0L)
        else lit(0L))).as("PRICE"))
    val nat = t(s, dir, "nation")
    Pipeline.Inputs(
      customer = t(s, dir, "customer").select(
        col("c_custkey").as("customer_id"),
        col("c_name").as("first_name"),
        concat(lit("Ln-"), col("c_custkey") % 100).as("last_name"),
        when(col("c_custkey") % 2 === 0, "F").otherwise("M")
          .as("gender"),
        lit("15-06-1980").as("DOB")),
      address = nat.select(
        col("n_nationkey").cast("long").as("ADDRESSID"),
        col("n_name").as("CITY"), col("n_name").as("COUNTRY"),
        col("n_regionkey").cast("string").as("REGION"),
        (col("n_nationkey").cast("long") * 100).as("POSTALCODE")),
      businessPartner = nat
        .filter(col("n_nationkey").between(1, 11)).select(
          col("n_nationkey").cast("long").as("PARTNERID"),
          lit("p@x").as("EMAILADDRESS"),
          col("n_nationkey").cast("long").as("ADDRESSID"),
          concat(lit("Co"), col("n_nationkey")).as("COMPANYNAME")),
      productCategory = s.range(0, 7).select(
        concat(lit("C"), col("id")).as("PRODCATEGORYID"),
        concat(lit("Cat"), col("id")).as("PRODCATEGORYNAME")),
      product = products,
      productDetail = s.range(0, 200).select(
        concat(lit("P"), col("id")).as("PRODUCTID"),
        concat(lit("Prod"), col("id")).as("PRODUCT_NAME")),
      store = nat.filter(col("n_nationkey").between(1, 20)).select(
        col("n_nationkey").cast("long").as("StoreID"),
        concat(lit("M"), col("n_nationkey")).as("manager"),
        col("n_nationkey").cast("long").as("AddressID"),
        lit("555").as("phone")),
      salesOrder = o.select(
        col("o_orderkey").as("SalesOrderID"),
        lit("AMER").as("SALESORG"),
        (col("o_orderkey") % 97).as("GROSSAMOUNT"),
        when(col("o_orderkey") % 2 === 0, "Online")
          .otherwise("Offline").as("Ordertype"),
        (col("o_custkey") % 20 + 1).as("StoreID"),
        date_format(col("o_orderdate"), "dd-MM-yyyy").as("Date"),
        (col("o_orderkey") % 5 + 1).as("RATING"),
        col("o_custkey").as("customer_id")),
      // (order, product) grain with a derived surrogate key: the
      // synthetic lineitem repeats (l_orderkey, l_linenumber), so the
      // raw rows cannot carry the reference's unique item id — the
      // pre-aggregation keeps every downstream sum identical (the
      // oracle aggregates raw lineitem directly)
      salesOrderItems = li
        .groupBy(col("l_orderkey"), (col("l_partkey") % 200).as("pid"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
        .select(
          (col("l_orderkey") * 200 + col("pid")).as("SalesOrderItemsID"),
          concat(lit("P"), col("pid")).as("PRODUCTID"),
          col("l_orderkey").as("SalesOrderID"),
          (col("q") * 10).as("GROSSAMOUNT"),
          col("q").as("QUANTITY")))
  }

  /** (table, checksum column) for the seven DW builds — the snapshot
    * evidence grain q291 reports at both catalog versions.
    */
  private val dwChecksums: Seq[(String, String)] = Seq(
    "dw_prdct_sm_fct" -> "Sale_Amt",
    "dw_ordr_sm_fct" -> "Ordr_Amt",
    "dw_ordr_dtl_fct" -> "Sale_Amt",
    "dw_cust_dim" -> "Cust_ID",
    "dw_str_dim" -> "Str_ID",
    "dw_prdct_dim" -> "Prc_Amt",
    "dw_act_perd_dim" -> "day_of_month")

  /** E2E DAILY REFRESH AS ONE CATALOG TRANSACTION — the reference's
    * actual transaction story closed end to end:
    * [[graft.etl.Pipeline.runDailyCat]] runs the COMPLETE daily
    * refresh (nine SCD merges + seven DW builds over the corpus-
    * derived Bikes inputs) twice — run 1 on the even order keys, run
    * 2 on the full set with every third product's price raised — and
    * each run publishes all 16 tables through ONE catalog commit
    * (BikesDWSQl.sql:202's single T-SQL `commit`, DW:22-200, under
    * the multi-writer model). The MID evidence is captured by a
    * reader injected into run 2's stage-to-catalog-CAS seam, with
    * every run-2 REPLACE already landed per-table: the catalog must
    * still serve run 1's COMPLETE warehouse — old facts WITH old
    * dims, the mixed state the reference's transaction forbids.
    * The oracle states both warehouses (14 rows: 7 DW tables × both
    * snapshots) directly from the raw corpus: a stale pin, leaked
    * half-refresh, missed CDC delta, or un-versioned SCD2 price
    * changes a count or checksum and hash-fails.
    *
    * 100 TB shape: each table's refresh is one distributed write +
    * a one-line REPLACE commit; the atomic 16-table flip is a
    * driver-side metadata CAS; prior state resolves through one
    * catalog snapshot (consistent reads while concurrent
    * transactions land); DW builds re-read the just-committed ODS
    * parquet, never the staging lineage.
    */
  val q291 = Q("q291_e2e_catalog_refresh",
    """SELECT * FROM (
      |  SELECT 'mid' AS snap, 'dw_prdct_sm_fct' AS tbl,
      |    CAST(count(*) AS BIGINT) AS n, CAST(sum(samt) AS BIGINT) AS isum
      |  FROM (SELECT l.l_partkey % 200 AS pid,
      |      CAST(o.o_orderdate AS DATE) AS d,
      |      sum(CAST(l.l_quantity AS BIGINT) * 10) AS samt
      |    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |    WHERE l.l_orderkey % 2 = 0 GROUP BY 1, 2) g1
      |  UNION ALL
      |  SELECT 'head', 'dw_prdct_sm_fct', count(*),
      |    CAST(sum(samt) AS BIGINT)
      |  FROM (SELECT l.l_partkey % 200 AS pid,
      |      CAST(o.o_orderdate AS DATE) AS d,
      |      sum(CAST(l.l_quantity AS BIGINT) * 10) AS samt
      |    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |    GROUP BY 1, 2) g2
      |  UNION ALL
      |  SELECT 'mid', 'dw_ordr_sm_fct',
      |    CAST(count(DISTINCT l_orderkey) AS BIGINT),
      |    CAST(sum(CAST(l_quantity AS BIGINT) * 10) AS BIGINT)
      |  FROM lineitem WHERE l_orderkey % 2 = 0
      |  UNION ALL
      |  SELECT 'head', 'dw_ordr_sm_fct',
      |    CAST(count(DISTINCT l_orderkey) AS BIGINT),
      |    CAST(sum(CAST(l_quantity AS BIGINT) * 10) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'mid', 'dw_ordr_dtl_fct',
      |    CAST(count(*) AS BIGINT), CAST(sum(samt) AS BIGINT)
      |  FROM (SELECT l_orderkey, l_partkey % 200 AS pid,
      |      sum(CAST(l_quantity AS BIGINT) * 10) AS samt
      |    FROM lineitem WHERE l_orderkey % 2 = 0 GROUP BY 1, 2) g3
      |  UNION ALL
      |  SELECT 'head', 'dw_ordr_dtl_fct',
      |    CAST(count(*) AS BIGINT), CAST(sum(samt) AS BIGINT)
      |  FROM (SELECT l_orderkey, l_partkey % 200 AS pid,
      |      sum(CAST(l_quantity AS BIGINT) * 10) AS samt
      |    FROM lineitem GROUP BY 1, 2) g4
      |  UNION ALL
      |  SELECT s.snap, 'dw_cust_dim', CAST(c.n AS BIGINT),
      |    CAST(c.isum AS BIGINT)
      |  FROM (SELECT count(*) AS n, sum(c_custkey) AS isum
      |        FROM customer) c
      |  CROSS JOIN (SELECT 'mid' AS snap UNION ALL SELECT 'head') s
      |  UNION ALL
      |  SELECT s.snap, 'dw_str_dim', CAST(20 AS BIGINT),
      |    CAST(210 AS BIGINT)
      |  FROM (SELECT 'mid' AS snap UNION ALL SELECT 'head') s
      |  UNION ALL
      |  SELECT 'mid', 'dw_prdct_dim', CAST(200 AS BIGINT),
      |    CAST(sum((i * 13) % 500 + 10) AS BIGINT)
      |  FROM range(0, 200) r1(i)
      |  UNION ALL
      |  SELECT 'head', 'dw_prdct_dim', CAST(200 AS BIGINT),
      |    CAST(sum((i * 13) % 500 + 10
      |      + CASE WHEN i % 3 = 0 THEN 10 ELSE 0 END) AS BIGINT)
      |  FROM range(0, 200) r2(i)
      |  UNION ALL
      |  SELECT s.snap, 'dw_act_perd_dim', CAST(c.n AS BIGINT),
      |    CAST(c.isum AS BIGINT)
      |  FROM (SELECT count(*) AS n,
      |      sum(day(DATE '2018-01-01' + CAST(i AS INT))) AS isum
      |    FROM range(0, 1096) r3(i)) c
      |  CROSS JOIN (SELECT 'mid' AS snap UNION ALL SELECT 'head') s
      |) t""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"e2ecat_${SessionScratch.keyOf(dir)}"))
    val key = s"e2e_cat_${SessionScratch.keyOf(dir)}"
    def snapRows(snap: String): Seq[(String, String, Long, Long)] =
      dwChecksums.map { case (tbl, c) =>
        val r = wh.catRead(s, tbl)
          .agg(count(lit(1)), coalesce(sum(col(c)), lit(0L))
            .cast("long")).head()
        (snap, tbl, r.getLong(0), r.getLong(1))
      }
    SessionScratch.once(s, key) {
      Pipeline.runDailyCat(s, wh, bikesInputs(s, dir, run2 = false),
        "2019-07-01")
      var mid: Seq[(String, String, Long, Long)] = Seq.empty
      Pipeline.runDailyCat(s, wh, bikesInputs(s, dir, run2 = true),
        "2019-07-02",
        beforeCommit = () => {
          // every run-2 REPLACE has landed in its table's own log;
          // the catalog pin has not — a reader here MUST see run 1's
          // complete warehouse (the reference's mid-transaction
          // invariant), and that is what the oracle's 'mid' rows
          // state
          mid = snapRows("mid")
        })
      wh.overwrite(mid.toDF("snap", "tbl", "n", "isum"), "e2e_mid")
    }
    wh.read(s, "e2e_mid")
      .unionByName(snapRows("head").toDF("snap", "tbl", "n", "isum"))
  }

  /** CONCURRENT CATALOG WRITERS, MONOTONE PIN ADVANCE — the
    * interleave [[graft.sources.Warehouse.catCommitMax]] exists for:
    * writer A lands detail+rollup waves (urgent orders) and, INSIDE
    * its catalog-CAS seam, writer B runs a COMPLETE transaction on
    * the same table pair (low-priority orders) — B's pins publish
    * first, then A's attempt retries against the new snapshot and
    * merges max(own, pinned) per table, so neither writer can
    * regress the other's pins whatever the interleave (raw catCommit
    * would re-expose B's detail without B's rollup or vice versa).
    * Both reads go through the winning catalog head; the oracle
    * states the pair from the raw corpus — a regressed pin drops a
    * writer's wave from one table and hash-fails the pair's
    * consistency equation (rollup = detail re-aggregated).
    *
    * 100 TB shape: the merge is snapshot-read + max inside the CAS
    * loop — driver-side metadata only; the waves land once, no
    * retry ever rewrites data.
    */
  val q292 = Q("q292_catalog_pin_advance",
    """SELECT * FROM (
      |  SELECT 'detail' AS side, o_orderpriority AS grp,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(o_orderkey) AS BIGINT) AS key_sum
      |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      |  GROUP BY o_orderpriority
      |  UNION ALL
      |  SELECT 'rollup', o_orderpriority, count(*),
      |    CAST(sum(o_orderkey) AS BIGINT)
      |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      |  GROUP BY o_orderpriority) t""".stripMargin) { (s, dir) =>
    val wh = Warehouse(
      SessionScratch.dir(s, s"pinadv_${SessionScratch.keyOf(dir)}"))
    val key = s"pin_adv_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val o = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      def txn(prio: String, seam: () => Unit): Unit = {
        val wave = o.filter(col("o_orderpriority") === prio)
        val dv = wh.casAppend(wave, "adv_d")
        val rv = wh.casAppend(
          wave.groupBy("o_orderpriority")
            .agg(count(lit(1)).as("n"),
              sum("o_orderkey").cast("long").as("key_sum")), "adv_r")
        var fired = false
        wh.catCommitMax(Seq("adv_d" -> dv, "adv_r" -> rv),
          beforeCommit = () => if (!fired) { fired = true; seam() })
        ()
      }
      // writer B's whole transaction runs inside A's catalog-CAS
      // seam: B pins first, A's merge must carry B's pins forward
      txn("1-URGENT", () => txn("5-LOW", () => ()))
      ()
    }
    val detail = wh.catRead(s, "adv_d")
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(count(lit(1)).as("n"),
        sum("o_orderkey").cast("long").as("key_sum"))
      .select(lit("detail").as("side"), col("grp"), col("n"),
        col("key_sum"))
    val rollup = wh.catRead(s, "adv_r")
      .select(lit("rollup").as("side"),
        col("o_orderpriority").as("grp"), col("n"), col("key_sum"))
    detail.unionByName(rollup)
  }

  /** CHECKPOINT-BOUNDED RETENTION CONSULT — the catalog-tier twin of
    * q285's per-table lifecycle, gating the HSUM/HPIN summary
    * machinery end to end: four catalog transactions pin successive
    * appends of one table; a [[graft.sources.Warehouse
    * .catCheckpoint]] folds resolution AND the historical pin
    * summary; every pre-checkpoint catalog commit file is then
    * DELETED OUTRIGHT (simulating retired history the bounded scan
    * must never need); and the evidence captures that (a) the pin
    * consult still protects every live pin — a zero-grace
    * [[casVacuum]] sweeps NOTHING and per-table truncation retires
    * NOTHING below the oldest pinned window — and (b) all four
    * historical catalog snapshots... are gone with their commits,
    * so the consult's answer came from the checkpoint's HPIN lines
    * alone. The surviving read serves the newest pin; the oracle
    * states it and the lifecycle counters from the raw corpus.
    *
    * 100 TB shape: the consult is O(catalog commits since the last
    * checkpoint) driver file reads — the auto-vacuum that fires
    * every 16th table commit stops paying O(catalog age).
    */
  val q293 = Q("q293_catalog_consult_checkpoint",
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(0 AS BIGINT) AS swept_dirs,
      |  CAST(0 AS BIGINT) AS removed_commits,
      |  CAST(4 AS BIGINT) AS live_pins
      |FROM orders""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"ccons_${SessionScratch.keyOf(dir)}"))
    val key = s"c_consult_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val o = t(s, dir, "orders").select("o_orderkey")
      (0L to 3L).foreach { i =>
        val v = wh.casAppend(o.filter(col("o_orderkey") % 4 === i),
          "ck_t")
        wh.catCommit(Seq("ck_t" -> v))
      }
      wh.catCheckpoint()
      // retire ALL pre-checkpoint catalog history the hard way: the
      // consult below must answer from the checkpoint's HPIN lines,
      // not from commits that no longer exist
      (1 to 4).foreach { n =>
        val f = new java.io.File(
          new java.io.File(wh.root, "__catalog__log"),
          f"$n%09d.commit")
        require(f.delete(), s"setup: catalog commit $n not deleted")
      }
      val livePins = wh.catPinnedVersions("ck_t").size
      // every pinned window is still protected: nothing sweeps,
      // nothing truncates below the oldest pin's window
      val swept = wh.casVacuum("ck_t", minAgeMs = 0L).size
      val removed = wh.casTruncate("ck_t")
      wh.overwrite(Seq((swept.toLong, removed.toLong, livePins.toLong))
        .toDF("swept_dirs", "removed_commits", "live_pins"),
        "ck_evidence")
    }
    wh.catRead(s, "ck_t")
      .agg(count(lit(1)).as("n"),
        sum("o_orderkey").cast("long").as("key_sum"))
      .crossJoin(wh.read(s, "ck_evidence"))
  }

  /** CROSS-VERSION CDC THROUGH CATALOG PINS — "what changed between
    * yesterday's published warehouse and today's": two catalog
    * transactions publish successive full states of a customer
    * table (day 2 = day 1 with every 4th segment re-labelled, +100
    * balance on even keys, every 9th customer erased, a new key for
    * every 25th), and the change feed is
    * [[graft.ops.Cdc.snapshotDiff]] over `catRead(asOf=2)` vs
    * `catRead(asOf=1)` — the log-shipping producer (q226/q260's
    * operator) re-based onto catalog TIME TRAVEL, so the diff is
    * between two PUBLISHED consistent snapshots, never a half-landed
    * state (the pin is what makes "yesterday" well-defined under
    * concurrent writers). Reported at change_type grain with key
    * sums; the oracle derives the same feed arithmetically from the
    * raw corpus — a mis-pinned version, phantom delete, or missed
    * update moves a count or key sum and hash-fails.
    *
    * 100 TB shape: both sides resolve to pinned version replays
    * (driver metadata), the diff is ONE full-outer join on the key —
    * the O(|A|+|B|) shuffle any snapshot diff pays — and the output
    * is change-grain; nothing is re-copied.
    */
  val q294 = Q("q294_catalog_snapshot_cdc",
    """WITH v1 AS (
      |  SELECT c_custkey AS k, c_mktsegment AS seg,
      |    round(c_acctbal, 2) AS bal FROM customer),
      |v2 AS (
      |  SELECT k,
      |    CASE WHEN k % 4 = 0 THEN 'CHANGED' ELSE seg END AS seg,
      |    round(bal + CASE WHEN k % 2 = 0 THEN 100 ELSE 0 END, 2) AS bal
      |  FROM v1 WHERE k % 9 <> 0
      |  UNION ALL
      |  SELECT k + 1000000, 'NEWSEG', 1.0 FROM v1 WHERE k % 25 = 0),
      |diff AS (
      |  SELECT coalesce(a.k, b.k) AS k,
      |    CASE WHEN b.k IS NULL THEN 'insert'
      |         WHEN a.k IS NULL THEN 'delete'
      |         WHEN a.seg IS DISTINCT FROM b.seg
      |           OR a.bal IS DISTINCT FROM b.bal THEN 'update'
      |         ELSE 'unchanged' END AS change_type
      |  FROM v2 a FULL OUTER JOIN v1 b ON a.k = b.k)
      |SELECT change_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(k) AS BIGINT) AS key_sum
      |FROM diff GROUP BY change_type""".stripMargin) { (s, dir) =>
    val wh = Warehouse(
      SessionScratch.dir(s, s"catcdc_${SessionScratch.keyOf(dir)}"))
    val key = s"cat_cdc_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val v1 = t(s, dir, "customer").select(
        col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
        round(col("c_acctbal"), 2).as("bal"))
      val v2 = v1.filter(col("k") % 9 =!= 0).select(
        col("k"),
        when(col("k") % 4 === 0, "CHANGED").otherwise(col("seg"))
          .as("seg"),
        round(col("bal") +
          when(col("k") % 2 === 0, 100.0).otherwise(0.0), 2).as("bal"))
        .unionByName(v1.filter(col("k") % 25 === 0).select(
          (col("k") + 1000000L).as("k"), lit("NEWSEG").as("seg"),
          lit(1.0).as("bal")))
      wh.catOverwriteAll(Seq("cdc_t" -> v1))
      wh.catOverwriteAll(Seq("cdc_t" -> v2))
      ()
    }
    graft.ops.Cdc.snapshotDiff(
      wh.catRead(s, "cdc_t", asOf = 2),
      wh.catRead(s, "cdc_t", asOf = 1), "k", Seq("seg", "bal"))
      .groupBy("change_type")
      .agg(count(lit(1)).as("n"),
        sum("k").cast("long").as("key_sum"))
  }

  /** GDPR COPY-ON-WRITE DELETE with commit-grain file skipping — the
    * right-to-be-forgotten pass a training-data warehouse runs on an
    * opt-out list ([[graft.sources.Warehouse.casDeleteWhere]]):
    * documents land as four stats-carrying waves (doc_id quartile
    * ranges, commit extents recorded at append time), the forget-set
    * is every doc_id divisible by 37 inside the SECOND quartile, and
    * the delete rewrites EXACTLY ONE commit — the other three are
    * retained by reference (directories never opened, stats riding
    * into the delete commit so later range reads keep skipping;
    * RowDeleteSpec pins the path-identity evidence). The oracle
    * re-derives the surviving corpus and the forget count
    * arithmetically; the rewritten/retained counts are structural
    * constants of the quartile construction.
    *
    * 100 TB shape: cost is O(one wave's data) + one tiny commit file
    * — the forget-set that touches 3 of 10,000 waves rewrites 3;
    * physical removal (not a view-level filter), which is what the
    * compliance deadline needs. (q269 is this pass at single-writer
    * whole-table grain — rebuild both tables minus the erased set;
    * this one is the multi-writer form that does NOT rewrite the
    * untouched 9,997 waves.)
    */
  val q295 = Q("q295_gdpr_delete",
    """WITH q AS (
      |  SELECT CAST(floor((max(doc_id) + 1) / 4) AS BIGINT) AS qs
      |  FROM documents),
      |f AS (
      |  SELECT doc_id FROM documents, q
      |  WHERE doc_id % 37 = 0 AND doc_id >= qs AND doc_id < 2 * qs)
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |  CAST(sum(n_chars) AS BIGINT) AS chars_sum,
      |  CAST(1 AS BIGINT) AS rewritten,
      |  CAST(3 AS BIGINT) AS retained,
      |  (SELECT CAST(count(*) AS BIGINT) FROM f) AS deleted
      |FROM documents
      |WHERE doc_id NOT IN (SELECT doc_id FROM f)""".stripMargin) {
    (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"gdprstore_${SessionScratch.keyOf(dir)}"))
    val key = s"gdpr_del_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val d = t(s, dir, "documents").select("doc_id", "n_chars")
      val maxId = d.agg(max("doc_id")).as[Long].head()
      val qs = (maxId + 1L) / 4L
      // four waves at doc_id quartile grain; the last takes the tail
      Seq((0L, qs), (qs, 2 * qs), (2 * qs, 3 * qs), (3 * qs, maxId + 1))
        .foreach { case (lo, hi) =>
          wh.casAppendStats(s,
            d.filter(col("doc_id") >= lo && col("doc_id") < hi),
            "gdpr_docs", "doc_id")
        }
      val forget = d.filter(col("doc_id") % 37 === 0 &&
        col("doc_id") >= qs && col("doc_id") < 2 * qs)
        .select("doc_id").as[Long].collect().toSeq
      val st = wh.casDeleteWhere(s, "gdpr_docs", "doc_id", forget)
      wh.overwrite(Seq((st.rewrittenCommits.toLong,
        st.retainedCommits.toLong, st.deletedRows))
        .toDF("rewritten", "retained", "deleted"), "gdpr_evidence")
    }
    wh.casRead(s, "gdpr_docs")
      .agg(count(lit(1)).as("n"),
        sum("doc_id").cast("long").as("id_sum"),
        sum("n_chars").cast("long").as("chars_sum"))
      .crossJoin(wh.read(s, "gdpr_evidence"))
  }

  /** MERGE-ON-READ DELETE LIFECYCLE — Iceberg equality-deletes /
    * Delta deletion vectors on this log
    * ([[graft.sources.Warehouse.casDeleteMoR]]): the opt-out list
    * lands as ONE tombstone commit (no data file touched — the
    * write-cheap half), every reader from that version anti-joins it
    * out while time travel below still shows the rows (pre/mor
    * evidence), then [[graft.sources.Warehouse.casCompactDeletes]]
    * materializes a plain REPLACE and truncate+vacuum physically
    * erase the waves AND the tombstone — the compliance point. The
    * retention counters are structural constants of the 7-commit
    * construction (4 appends + DEL + REPLACE + checkpoint).
    *
    * 100 TB shape: the delete itself is O(forget-set) regardless of
    * table size; readers pay one broadcast anti-join until compaction
    * folds it in — the deferred-rewrite trade every MoR format makes.
    * (q223's deleteKeys/readMor is this shape on the single-writer
    * journal; this one is the multi-writer commit-log form with the
    * full lifecycle — versioned visibility, compaction, and the
    * truncate+vacuum erasure point.)
    */
  val q296 = Q("q296_mor_delete_lifecycle",
    """WITH f AS (SELECT doc_id FROM documents WHERE doc_id % 41 = 0),
      |kept AS (
      |  SELECT * FROM documents
      |  WHERE doc_id NOT IN (SELECT doc_id FROM f))
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS pre_n,
      |  (SELECT CAST(count(*) AS BIGINT) FROM kept) AS mor_n,
      |  CAST(6 AS BIGINT) AS removed_commits,
      |  CAST(5 AS BIGINT) AS swept_dirs,
      |  CAST(1 AS BIGINT) AS log_files
      |FROM kept""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"morstore_${SessionScratch.keyOf(dir)}"))
    val key = s"mor_del_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val d = t(s, dir, "documents").select("doc_id", "n_chars")
      (0 to 3).foreach(w =>
        wh.casAppend(d.filter(col("doc_id") % 4 === w), "mor_docs"))
      val preN = wh.casRead(s, "mor_docs").count()
      wh.casDeleteMoR(s, "mor_docs", "doc_id",
        d.filter(col("doc_id") % 41 === 0).select("doc_id"))
      val morN = wh.casRead(s, "mor_docs").count()
      wh.casCompactDeletes(s, "mor_docs")
      val removed = wh.casTruncate("mor_docs")
      val swept = wh.casVacuum("mor_docs", minAgeMs = 0L).size
      val logFiles = Option(new java.io.File(wh.root, "mor_docs__log")
        .listFiles()).getOrElse(Array())
        .count(_.getName.endsWith(".commit"))
      wh.overwrite(Seq((preN, morN, removed.toLong, swept.toLong,
        logFiles.toLong)).toDF("pre_n", "mor_n", "removed_commits",
        "swept_dirs", "log_files"), "mor_evidence")
    }
    wh.casRead(s, "mor_docs")
      .agg(count(lit(1)).as("n"),
        sum("doc_id").cast("long").as("id_sum"))
      .crossJoin(wh.read(s, "mor_evidence"))
  }

  /** SCHEMA EVOLUTION on the CAS log — Delta's `mergeSchema` write as
    * a commit-log fact ([[graft.sources.Warehouse.casAppendEvolved]]):
    * wave 1 lands (doc_id, n_chars), wave 2 ADDS a `quality` column
    * (ADDE commit), and the snapshot read surfaces the union schema —
    * old rows NULL on the new column, aggregates counting exactly the
    * evolved wave — while time travel below the evolution still
    * serves the narrow schema (v1_n evidence). The oracle restates
    * the union arithmetically with CASE over wave membership.
    *
    * 100 TB shape: evolution is one commit-line flag — no backfill
    * rewrite of the old petabytes (the entire point of add-column
    * evolution); the footer-merge read tax drains at the next
    * materializing REPLACE.
    */
  val q297 = Q("q297_schema_evolution",
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(n_chars) AS BIGINT) AS chars_sum,
      |  CAST(count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS BIGINT)
      |    AS q_n,
      |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars % 7 END)
      |    AS BIGINT) AS q_sum,
      |  (SELECT CAST(count(*) AS BIGINT) FROM documents
      |   WHERE doc_id % 2 = 0) AS v1_n
      |FROM documents""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"evostore_${SessionScratch.keyOf(dir)}"))
    val key = s"cas_evo_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val d = t(s, dir, "documents").select("doc_id", "n_chars")
      wh.casAppend(d.filter(col("doc_id") % 2 === 0), "evo_docs")
      wh.casAppendEvolved(d.filter(col("doc_id") % 2 === 1)
        .withColumn("quality", col("n_chars") % 7), "evo_docs")
      val v1n = wh.casReadAt(s, "evo_docs", 1).count()
      wh.overwrite(Seq(Tuple1(v1n)).toDF("v1_n"), "evo_evidence")
    }
    wh.casRead(s, "evo_docs")
      .agg(count(lit(1)).as("n"),
        sum("n_chars").cast("long").as("chars_sum"),
        count(col("quality")).as("q_n"),
        sum("quality").cast("long").as("q_sum"))
      .crossJoin(wh.read(s, "evo_evidence"))
  }

  /** SMALL-WAVE COMPACTION (`OPTIMIZE`) — the maintenance pass a
    * streaming-fed table runs nightly
    * ([[graft.sources.Warehouse.casOptimize]]): twelve micro-waves
    * accrete (one commit each — the shape a per-minute
    * micro-batch feed leaves behind), then one optimize folds the
    * NINE smallest into a single rewrite and retains the three
    * biggest by reference (directories never opened — the
    * [[graft.sources.Warehouse.casDeleteWhere]] commit shape with a
    * union extent computed from the log alone). The corpus aggregate
    * is invariant — compaction moves bytes, never rows — and the
    * wave counters are structural constants of the 12→4 fold.
    *
    * 100 TB shape: cost is O(merged waves' bytes), by construction
    * the smallest; steady state is bounded at maxWaves directories
    * per table regardless of append rate, which is what keeps
    * snapshot-read unions and file listings flat as the feed runs
    * for years.
    */
  val q298 = Q("q298_cas_optimize",
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |  CAST(sum(n_chars) AS BIGINT) AS chars_sum,
      |  CAST(12 AS BIGINT) AS waves_before,
      |  CAST(9 AS BIGINT) AS compacted,
      |  CAST(3 AS BIGINT) AS retained,
      |  CAST(13 AS BIGINT) AS head_version
      |FROM documents""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"optstore_${SessionScratch.keyOf(dir)}"))
    val key = s"cas_opt_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val d = t(s, dir, "documents").select("doc_id", "n_chars")
      (0 to 11).foreach(w => wh.casAppendStats(s,
        d.filter(col("doc_id") % 12 === w), "opt_docs", "doc_id"))
      val before = wh.casHead("opt_docs").toLong
      val st = wh.casOptimize(s, "opt_docs", maxWaves = 4)
      wh.overwrite(Seq((before, st.compacted.toLong,
        st.retained.toLong, st.version.toLong))
        .toDF("waves_before", "compacted", "retained", "head_version"),
        "opt_evidence")
    }
    wh.casRead(s, "opt_docs")
      .agg(count(lit(1)).as("n"),
        sum("doc_id").cast("long").as("id_sum"),
        sum("n_chars").cast("long").as("chars_sum"))
      .crossJoin(wh.read(s, "opt_evidence"))
  }

  /** CATALOG TAGS — named dataset releases
    * ([[graft.sources.Warehouse.catTag]], Iceberg tags): the
    * "training run X read exactly THIS warehouse" pointer a data
    * lineage audit needs. Three waves land behind three catalog
    * pins; the tag names the two-wave snapshot; then the FULL
    * retention stack runs — catTruncate (clamped: only the one
    * commit below the tag's window retires), casTruncate, zero-grace
    * casVacuum — and the tagged release still resolves byte-exact
    * while head readers see all three waves. The oracle states both
    * snapshots arithmetically; removed_cat_commits = 1 is the clamp
    * evidence (an untagged catalog would have retired every commit
    * below the truncation checkpoint — q285's shape).
    *
    * 100 TB shape: a tag is one tiny immutable file; the retention
    * clamp is driver-side metadata, and the cost of keeping a
    * release alive is exactly the data it pins — nothing else
    * escapes GC (the spec pins reclamation after catDeleteTag).
    */
  val q299 = Q("q299_catalog_tag_retention",
    """SELECT
      |  (SELECT CAST(count(*) AS BIGINT) FROM documents
      |   WHERE doc_id % 3 IN (0, 1)) AS tag_n,
      |  (SELECT CAST(sum(doc_id) AS BIGINT) FROM documents
      |   WHERE doc_id % 3 IN (0, 1)) AS tag_id_sum,
      |  CAST(count(*) AS BIGINT) AS head_n,
      |  CAST(sum(doc_id) AS BIGINT) AS head_id_sum,
      |  CAST(1 AS BIGINT) AS removed_cat_commits
      |FROM documents""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"tagstore_${SessionScratch.keyOf(dir)}"))
    val key = s"cat_tag_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val d = t(s, dir, "documents").select("doc_id")
      wh.casAppend(d.filter(col("doc_id") % 3 === 0), "tag_docs")
      wh.catCommit(Seq("tag_docs" -> 1))          // cat 1
      wh.catCheckpoint()                          // cat 2 (CCKPT)
      wh.casAppend(d.filter(col("doc_id") % 3 === 1), "tag_docs")
      wh.catCommit(Seq("tag_docs" -> 2))          // cat 3
      wh.catTag("train_data_v1", 3)
      wh.casAppend(d.filter(col("doc_id") % 3 === 2), "tag_docs")
      wh.catCommit(Seq("tag_docs" -> 3))          // cat 4
      val removed = wh.catTruncate()              // clamped to floor 2
      wh.casTruncate("tag_docs")
      wh.casVacuum("tag_docs", minAgeMs = 0L)
      wh.overwrite(Seq(Tuple1(removed.toLong))
        .toDF("removed_cat_commits"), "tag_evidence")
    }
    val tagged = wh.catReadTag(s, "tag_docs", "train_data_v1")
      .agg(count(lit(1)).as("tag_n"),
        sum("doc_id").cast("long").as("tag_id_sum"))
    val head = wh.catRead(s, "tag_docs")
      .agg(count(lit(1)).as("head_n"),
        sum("doc_id").cast("long").as("head_id_sum"))
    tagged.crossJoin(head).crossJoin(wh.read(s, "tag_evidence"))
  }

  /** TIME-BASED RETENTION — the scheduled "delete events older than
    * the cutoff" pass ([[graft.sources.Warehouse.casDeleteRange]]):
    * events land as four time-quartile waves (commit extents on epoch
    * seconds), the cutoff falls mid-quartile-2, and the delete
    * decides THREE of the four waves from the log alone — quartile 1
    * drops WHOLE (no read, no rewrite — the partition-drop fast
    * path; its rows are counted at parquet-footer grain), quartiles
    * 3-4 retain by reference, and only the straddling quartile 2
    * rewrites. The oracle restates the surviving corpus and the
    * removed count from the raw events; the wave counters are
    * structural constants of the quartile construction.
    *
    * 100 TB shape: a daily retention job over time-bucketed waves is
    * one boundary rewrite per run regardless of table size — the
    * whole point of putting time extents in the commit log.
    */
  val q300 = Q("q300_time_retention",
    """WITH t AS (
      |  SELECT event_id, epoch_us(ts) // 1000000 AS ts_s FROM events),
      |b AS (
      |  SELECT min(ts_s) AS mn,
      |    (max(ts_s) - min(ts_s) + 1) // 4 AS q FROM t),
      |cut AS (SELECT mn + q + q // 2 AS c FROM b)
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(event_id) AS BIGINT) AS id_sum,
      |  CAST(1 AS BIGINT) AS dropped,
      |  CAST(1 AS BIGINT) AS rewritten,
      |  CAST(2 AS BIGINT) AS retained,
      |  (SELECT CAST(count(*) AS BIGINT) FROM t, cut
      |   WHERE ts_s < c) AS deleted
      |FROM t, cut WHERE ts_s >= c""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"retnstore_${SessionScratch.keyOf(dir)}"))
    val key = s"time_retn_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val e = t(s, dir, "events").select(col("event_id"),
        col("ts").cast("long").as("ts_s"))
      val r = e.agg(min("ts_s"), max("ts_s")).head()
      val (mn, mx) = (r.getLong(0), r.getLong(1))
      val q = (mx - mn + 1L) / 4L
      Seq((mn, mn + q), (mn + q, mn + 2 * q), (mn + 2 * q, mn + 3 * q),
        (mn + 3 * q, mx + 1)).foreach { case (lo, hi) =>
        wh.casAppendStats(s,
          e.filter(col("ts_s") >= lo && col("ts_s") < hi),
          "retn_events", "ts_s")
      }
      val cut = mn + q + q / 2 // delete [mn, cut-1]
      val st = wh.casDeleteRange(s, "retn_events", "ts_s", mn, cut - 1)
      wh.overwrite(Seq((st.droppedCommits.toLong,
        st.rewrittenCommits.toLong, st.retainedCommits.toLong,
        st.deletedRows)).toDF("dropped", "rewritten", "retained",
        "deleted"), "retn_evidence")
    }
    wh.casRead(s, "retn_events")
      .agg(count(lit(1)).as("n"),
        sum("event_id").cast("long").as("id_sum"))
      .crossJoin(wh.read(s, "retn_evidence"))
  }

  /** STREAMING OPT-OUT PROPAGATION — the user-deletion queue drained
    * by the REAL Structured Streaming engine
    * ([[graft.streaming.StreamingEtl.optOutSink]]): two micro-batched
    * waves of forget keys (every 13th doc, then every 17th) land as
    * one merge-on-read tombstone commit each against the CAS table,
    * through a MemoryStream + AvailableNow run per wave over the same
    * checkpoint. The visible snapshot is documents minus both
    * forget-sets; the commit counter pins that exactly TWO tombstone
    * commits exist (one per non-empty batch — empty batches commit
    * nothing). Replay idempotence (crash after commit, restart,
    * redundant second tombstone, unchanged snapshot) is
    * RowDeleteSpec's engine-restart pin.
    *
    * 100 TB shape: each batch is O(its forget-set) — one tiny
    * tombstone parquet + one commit file, no data touched; readers
    * pay one broadcast anti-join until compaction folds it in.
    */
  val q301 = Q("q301_streaming_optout",
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |  CAST(2 AS BIGINT) AS tombstone_commits
      |FROM documents
      |WHERE doc_id % 13 <> 0 AND doc_id % 17 <> 5""".stripMargin) {
    (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"soptstore_${SessionScratch.keyOf(dir)}"))
    val key = s"stream_opt_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = s.sqlContext
      val d = t(s, dir, "documents").select("doc_id")
      wh.casAppend(d, "sopt_docs")
      val head0 = wh.casHead("sopt_docs")
      val ckpt = java.nio.file.Files
        .createTempDirectory("sopt-ckpt-").toString
      val feed = MemoryStream[Long]
      def drain(): Unit =
        graft.streaming.StreamingEtl.optOutSink(
          feed.toDF().toDF("doc_id"), wh, "sopt_docs", "doc_id", ckpt)
          .awaitTermination()
      feed.addData(d.filter(col("doc_id") % 13 === 0)
        .as[Long].collect().toSeq: _*)
      drain()
      feed.addData(d.filter(col("doc_id") % 17 === 5)
        .as[Long].collect().toSeq: _*)
      drain()
      wh.overwrite(Seq(Tuple1((wh.casHead("sopt_docs") - head0).toLong))
        .toDF("tombstone_commits"), "sopt_evidence")
    }
    wh.casRead(s, "sopt_docs")
      .agg(count(lit(1)).as("n"),
        sum("doc_id").cast("long").as("id_sum"))
      .crossJoin(wh.read(s, "sopt_evidence"))
  }

  /** BULK TENANT ERASURE — q295's copy-on-write delete with a
    * DISTRIBUTED forget-set
    * ([[graft.sources.Warehouse.casDeleteWhereKeys]]): the departing
    * tenant owns the entire top doc_id quartile, so the forget-set is
    * a DataFrame (a quarter of the corpus — far past any `isin`
    * literal), classification is one broadcast-extents pass whose
    * result collects at COMMIT grain, and the delete rewrites exactly
    * the tenant's wave — to an EMPTY remainder (every row matched) —
    * while the three other quartiles retain by reference. The oracle
    * restates the survivors and the erased count arithmetically.
    *
    * 100 TB shape: the forget-set never lands on the driver (the
    * Seq form's 10^5-key plan ceiling is the point of this twin);
    * extent classification is O(keys) map-side against a
    * commit-count broadcast, and the rewrite cost is the tenant's
    * own wave, nothing else.
    */
  val q302 = Q("q302_tenant_erasure",
    """WITH q AS (
      |  SELECT CAST(floor((max(doc_id) + 1) / 4) AS BIGINT) AS qs
      |  FROM documents)
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |  CAST(1 AS BIGINT) AS rewritten,
      |  CAST(3 AS BIGINT) AS retained,
      |  (SELECT CAST(count(*) AS BIGINT) FROM documents, q
      |   WHERE doc_id >= 3 * qs) AS deleted
      |FROM documents, q WHERE doc_id < 3 * qs""".stripMargin) {
    (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"tenstore_${SessionScratch.keyOf(dir)}"))
    val key = s"tenant_del_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val d = t(s, dir, "documents").select("doc_id", "n_chars")
      val maxId = d.agg(max("doc_id")).as[Long].head()
      val qs = (maxId + 1L) / 4L
      Seq((0L, qs), (qs, 2 * qs), (2 * qs, 3 * qs), (3 * qs, maxId + 1))
        .foreach { case (lo, hi) =>
          wh.casAppendStats(s,
            d.filter(col("doc_id") >= lo && col("doc_id") < hi),
            "ten_docs", "doc_id")
        }
      val st = wh.casDeleteWhereKeys(s, "ten_docs", "doc_id",
        d.filter(col("doc_id") >= 3 * qs).select("doc_id"))
      wh.overwrite(Seq((st.rewrittenCommits.toLong,
        st.retainedCommits.toLong, st.deletedRows))
        .toDF("rewritten", "retained", "deleted"), "ten_evidence")
    }
    wh.casRead(s, "ten_docs")
      .agg(count(lit(1)).as("n"),
        sum("doc_id").cast("long").as("id_sum"))
      .crossJoin(wh.read(s, "ten_evidence"))
  }

  /** TABLE ROLLBACK — Delta `RESTORE TABLE` on the CAS log
    * ([[graft.sources.Warehouse.casRestore]]): four stats waves + a
    * merge-on-read tombstone are the good state; a bad REPLACE
    * (someone ships a filter bug that drops most of the corpus)
    * becomes the head; ONE metadata commit restores the good
    * snapshot — stats, tombstone and all ride with the restored
    * lines, and the bad version stays time-travelable in between
    * (its row count is captured as evidence before the restore;
    * the bad REPLACE materialized THROUGH the tombstone —
    * casReplace reads the resolved snapshot — so the tombstoned id
    * below the filter cut is already absent from it).
    * The oracle restates the restored corpus and the bad snapshot's
    * size arithmetically; the version counter pins the 7-commit
    * shape (4 appends + DEL + bad REPLACE + restore).
    *
    * 100 TB shape: rollback of any size table is one tiny commit
    * file — snapshot-by-reference is the whole point.
    */
  val q303 = Q("q303_table_rollback",
    """WITH f AS (SELECT doc_id FROM documents WHERE doc_id % 43 = 0)
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |  (SELECT CAST(count(*) AS BIGINT) FROM documents
      |   WHERE doc_id < 10 AND doc_id % 43 <> 0) AS bad_n,
      |  CAST(7 AS BIGINT) AS head_version
      |FROM documents
      |WHERE doc_id NOT IN (SELECT doc_id FROM f)""".stripMargin) {
    (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"rbstore_${SessionScratch.keyOf(dir)}"))
    val key = s"tbl_rollback_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val d = t(s, dir, "documents").select("doc_id")
      val maxId = d.agg(max("doc_id")).as[Long].head()
      val qs = (maxId + 1L) / 4L
      Seq((0L, qs), (qs, 2 * qs), (2 * qs, 3 * qs), (3 * qs, maxId + 1))
        .foreach { case (lo, hi) =>
          wh.casAppendStats(s,
            d.filter(col("doc_id") >= lo && col("doc_id") < hi),
            "rb_docs", "doc_id")
        }
      wh.casDeleteMoR(s, "rb_docs", "doc_id",
        d.filter(col("doc_id") % 43 === 0))             // v5: good state
      wh.casReplace(s, "rb_docs")(cur =>
        cur.filter(col("doc_id") < 10))                 // v6: the bad load
      val badN = wh.casRead(s, "rb_docs").count()
      val rv = wh.casRestore(s, "rb_docs", 5)           // v7
      wh.overwrite(Seq((badN, rv.toLong))
        .toDF("bad_n", "head_version"), "rb_evidence")
    }
    wh.casRead(s, "rb_docs")
      .agg(count(lit(1)).as("n"),
        sum("doc_id").cast("long").as("id_sum"))
      .crossJoin(wh.read(s, "rb_evidence"))
  }

  /** WAREHOUSE ROLLBACK to a tagged release
    * ([[graft.sources.Warehouse.catRestoreTag]]): the good release
    * (even doc_ids) is tagged; a bad load lands the odd half and
    * advances the catalog; one catalog transaction re-publishes the
    * tag's pins and head readers flip back to exactly the release —
    * while the bad interval stays time-travelable (its size captured
    * at catalog asOf=2 as evidence). Oracle restates both snapshots;
    * restored_cat_version pins the 3-commit catalog shape.
    *
    * 100 TB shape: the rollback is one catalog commit naming pins —
    * no table data read or moved at any warehouse size.
    */
  val q304 = Q("q304_release_rollback",
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS bad_n,
      |  CAST(3 AS BIGINT) AS restored_cat_version
      |FROM documents WHERE doc_id % 2 = 0""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wh = Warehouse(
      SessionScratch.dir(s, s"rrstore_${SessionScratch.keyOf(dir)}"))
    val key = s"rel_rollback_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(s, key) {
      val d = t(s, dir, "documents").select("doc_id")
      wh.casAppend(d.filter(col("doc_id") % 2 === 0), "rr_docs")
      wh.catCommit(Seq("rr_docs" -> 1))               // cat 1
      wh.catTag("release_v1", 1)
      wh.casAppend(d.filter(col("doc_id") % 2 === 1), "rr_docs")
      wh.catCommit(Seq("rr_docs" -> 2))               // cat 2: bad load
      val badN = wh.catRead(s, "rr_docs").count()
      val rv = wh.catRestoreTag("release_v1")         // cat 3
      wh.overwrite(Seq((badN, rv.toLong))
        .toDF("bad_n", "restored_cat_version"), "rr_evidence")
    }
    wh.catRead(s, "rr_docs")
      .agg(count(lit(1)).as("n"),
        sum("doc_id").cast("long").as("id_sum"))
      .crossJoin(wh.read(s, "rr_evidence"))
  }

  val all: Seq[Q] = Seq(q291, q292, q293, q294, q295, q296, q297,
    q298, q299, q300, q301, q302, q303, q304)
}
