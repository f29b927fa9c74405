package graft

import org.apache.spark.sql.functions._
import graft.ops.{Approx, Components}

/** Round-6 additions: star-contraction connected components, map-side
  * quantile bucketing, the persisted-store candidate gate, and the new
  * stats/sampling queries.
  */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("connectedStar: agrees with connected() on a mixed graph") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L),
      (30L, 30L)).toDF("doc_a", "doc_b")
    assert(rows(Components.connectedStar(pairs)) ==
      rows(Components.connected(pairs)))
  }

  test("connectedStar: 300-node chain (deep diameter) collapses to " +
    "min-id labels") {
    // ids shuffled through a multiplicative permutation so the chain's
    // neighbor order carries no accidental monotone structure
    val perm = (0 until 300).map(i => (i * 137 + 11) % 300 + 1000L)
    val pairs = perm.sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("doc_a", "doc_b")
    val labels = Components.connectedStar(pairs)
    val comps = labels.select("comp").distinct().collect()
    assert(comps.length == 1 && comps.head.getLong(0) == 1000L)
    assert(labels.count() == 300)
    assert(labels.filter($"comp" > $"node").count() == 0)
  }

  test("connectedStar: random multi-component graph matches " +
    "connected() exactly") {
    // deterministic pseudo-random edges over 120 nodes
    val edges = (0 until 200).map { i =>
      val a = (i * 7919 + 13) % 120
      val b = (i * 104729 + 41) % 120
      (a.toLong, b.toLong)
    }.toDF("doc_a", "doc_b")
    assert(rows(Components.connectedStar(edges)) ==
      rows(Components.connected(edges)))
  }

  test("quantileBuckets: approx mode reproduces exact-mode buckets " +
    "on spend data and the plan has no per-group data sort") {
    val spend = sources.Tables(spark, sf, "orders")
      .join(sources.Tables(spark, sf, "customer"),
        $"o_custkey" === $"c_custkey")
      .groupBy("c_mktsegment", "o_custkey")
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).as("s"))
    val exact = Approx.quantileBuckets(spend, Seq("c_mktsegment"), "s",
      4, exact = true)
    val approx = Approx.quantileBuckets(spend, Seq("c_mktsegment"), "s", 4)
    // sketch boundaries are actual data values (no interpolation), so
    // a handful of boundary rows may shift ONE bucket — the documented
    // contract: adjacent-only drift, on a small fraction of rows
    val joined = exact.select($"c_mktsegment", $"o_custkey",
        $"bucket".as("eb"))
      .join(approx.select($"c_mktsegment", $"o_custkey",
        $"bucket".as("ab")), Seq("c_mktsegment", "o_custkey"))
    assert(joined.filter(abs($"eb" - $"ab") > 1).count() == 0,
      "approx bucket differs from exact by more than one")
    val n = joined.count()
    val drifted = joined.filter($"eb" =!= $"ab").count()
    // 5%: at this sf each bucket holds only ~8 customers, so each
    // boundary row is ~0.7% of the population by itself
    assert(drifted <= n / 20,
      s"$drifted of $n rows drifted buckets (> 5%)")
    // every quartile bucket is populated
    exact.groupBy("c_mktsegment", "bucket").count().collect().foreach {
      r => assert(r.getLong(2) > 0, s"empty bucket: $r")
    }
    // plan shape: no window/sort over the data rows — the only sort
    // Spark may add is inside the percentile aggregate itself
    val plan = exact.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("WindowExec"), "unexpected window in plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      "boundary table is not broadcast")
    assert(n > 0)
  }

  test("q80: buckets partition the customer-spend population") {
    val r = queries.Parity.q80.fn(spark, sf)
    val spendCustomers = sources.Tables(spark, sf, "orders")
      .join(sources.Tables(spark, sf, "customer"),
        $"o_custkey" === $"c_custkey")
      .select("c_mktsegment", "o_custkey").distinct().count()
    assert(r.agg(sum($"n_cust")).head().getLong(0) == spendCustomers)
    // 4 buckets per segment, each non-empty at this sf
    r.groupBy("c_mktsegment").agg(count(lit(1)).as("nb")).collect()
      .foreach(row => assert(row.getLong(1) == 4, s"segment $row"))
  }

  test("q81: chain components have size 50 and block-base labels") {
    val comps = queries.TextQueries.q81.fn(spark, sf).collect()
    val nDocs = sources.Tables(spark, sf, "documents").count()
    assert(comps.length == math.ceil(nDocs / 50.0).toInt)
    comps.foreach { row =>
      val comp = row.getLong(0)
      assert(comp % 50 == 0, s"component label not a block base: $row")
      assert(row.getLong(1) <= 50 && row.getLong(1) >= 2)
      assert(row.getLong(2) == comp, s"min_node != comp: $row")
    }
  }

  test("q84: histogram bins partition all events") {
    val total = sources.Tables(spark, sf, "events").count()
    val r = queries.Events.q84.fn(spark, sf)
    assert(r.agg(sum($"n")).head().getLong(0) == total)
    assert(r.filter($"bin" < 0 || $"bin" > 19).count() == 0)
  }

  test("q85: exactly one opening month with null delta, growth " +
    "defined elsewhere") {
    val r = queries.Parity.q85.fn(spark, sf)
    assert(r.filter($"delta".isNull).count() == 1)
    assert(r.filter($"delta".isNull && $"growth".isNotNull).count() == 0)
    assert(r.filter($"delta".isNotNull && $"growth".isNull).count() == 0)
  }

  test("q86: weighted sample keeps every long document and is a " +
    "deterministic subset") {
    val r = queries.TextQueries.q86.fn(spark, sf).collect()
    r.foreach { row =>
      assert(row.getLong(2) <= row.getLong(1),
        s"kept more than total: $row")
    }
    // determinism: re-running yields identical rows
    assert(rows(queries.TextQueries.q86.fn(spark, sf)) ==
      rows(queries.TextQueries.q86.fn(spark, sf)))
  }

  test("q87: chunk counts follow ceil(n/stride) and overlap math") {
    val t = sources.Tables(spark, sf, "documents")
      .select(size(split($"text", " ")).as("n")).filter($"n" >= 1)
    val expChunks = t
      .select(ceil($"n".cast("double") / 30).cast("long").as("c"))
      .agg(sum($"c")).head().getLong(0)
    val r = queries.TextQueries.q87.fn(spark, sf)
    assert(r.agg(sum($"n_chunks")).head().getLong(0) == expChunks)
    // distinct chunks never exceed chunk count
    r.collect().foreach { row =>
      assert(row.getAs[Long]("n_distinct_chunks") <=
        row.getAs[Long]("n_chunks"))
    }
  }

  test("q88: split sizes cover the corpus and contamination counts " +
    "the bench members themselves") {
    val r = queries.TextQueries.q88.fn(spark, sf)
    val total = sources.Tables(spark, sf, "documents").count()
    assert(r.agg(sum($"n_docs")).head().getLong(0) == total)
    // every doc_id % 10 == 0 doc matches its own bench fingerprint, so
    // total contamination is at least the bench-set size
    val benchDocs = sources.Tables(spark, sf, "documents")
      .filter($"doc_id" % 10 === 0).count()
    assert(r.agg(sum($"n_contaminated")).head().getLong(0) >= benchDocs)
  }

  test("q89: exactly 3 docs per language, rank from the md5 order, " +
    "and the plan carries a WindowGroupLimit") {
    val df = queries.TextQueries.q89.fn(spark, sf)
    df.groupBy("lang").count().collect()
      .foreach(r => assert(r.getLong(1) == 3, s"$r"))
    assert(df.queryExecution.optimizedPlan.toString
      .contains("WindowGroupLimit"),
      "rank filter did not push down to WindowGroupLimit")
  }

  test("q90: partitioned read prunes to the filtered year's " +
    "directories") {
    val df = queries.Parity.q90.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("PartitionFilters: [") &&
      "PartitionFilters: \\[[^\\]]+\\]".r.findFirstIn(plan).isDefined &&
      !plan.contains("PartitionFilters: []"),
      s"scan did not prune partitions:\n${plan.take(800)}")
    // result parity with the raw-table formulation
    val raw = sources.Tables(spark, sf, "orders")
      .filter(year($"o_orderdate") === 1997)
      .groupBy(month($"o_orderdate").cast("long").as("m"))
      .agg(count(lit(1)).as("n"))
    assert(rows(df.select($"m", $"n")) == rows(raw))
  }

  test("q91: containment bounds Jaccard and detects full embedding") {
    val cont = queries.TextQueries.q91.fn(spark, sf)
    val jac = queries.TextQueries.q31.fn(spark, sf)
    // containment >= jaccard on every pair (|A∩B|/|A| >= |A∩B|/|A∪B|),
    // up to the 6dp rounding both sides carry
    val bad = cont.join(jac, Seq("doc_a", "doc_b"))
      .filter($"cont_a" < $"jaccard" - 1e-6 ||
        $"cont_b" < $"jaccard" - 1e-6)
      .count()
    assert(bad == 0)
    cont.collect().foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0)
    }
  }

  test("Approx.approxDistinct: within 10% of the exact count") {
    val li = sources.Tables(spark, sf, "lineitem")
    val exact = li.select(countDistinct($"l_partkey")).head().getLong(0)
    val est = li.select(Approx.approxDistinct($"l_partkey"))
      .head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.1,
      s"HLL estimate $est vs exact $exact")
  }

  test("q82: corr matches Spark's built-in corr to 1e-6") {
    val built = sources.Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(corr($"l_quantity", $"l_extendedprice").as("c"))
    val ours = queries.Parity.q82.fn(spark, sf)
      .select($"l_returnflag", $"corr_qp")
    val joined = built.join(ours, Seq("l_returnflag"))
      .select(abs($"c" - $"corr_qp").as("d")).collect()
    joined.foreach(r => assert(r.getDouble(0) < 1e-6,
      s"corr diverges: ${r.getDouble(0)}"))
  }
}
