package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions: salted-join plan shape, exact integer-moment
  * outliers, journey pivot determinism, curation-pipeline invariants,
  * ntile balance, trim partition, PMI bigram construction.
  */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q65: salted join result equals the plain unsalted join") {
    val dim = sources.Tables(spark, sf, "supplier")
      .select($"s_suppkey".as("l_suppkey"), $"s_nationkey")
    val plain = sources.Tables(spark, sf, "lineitem")
      .join(dim, Seq("l_suppkey"))
      .groupBy($"s_nationkey".cast("long").as("natn_id"))
      .agg(count(lit(1)).as("n_items"))
    val salted = queries.Parity.q65.fn(spark, sf)
      .select($"natn_id", $"n_items")
    assert(rows(salted) == rows(plain))
  }

  test("q65: the salted join is a ShuffledHashJoin, not a broadcast") {
    val plan = queries.Parity.q65.fn(spark, sf)
      .queryExecution.executedPlan.toString
    val prefix = plan.split("== Initial Plan ==")(0)
    assert(prefix.contains("ShuffledHashJoin"),
      s"expected ShuffledHashJoin in:\n$prefix")
    assert(!prefix.contains("BroadcastHashJoin"),
      s"unexpected BroadcastHashJoin in:\n$prefix")
  }

  test("q71: integer-moment outlier test equals the double z-score " +
    "on well-separated data") {
    // 2dp values, one extreme outlier per group; double z-score is
    // unambiguous here, so both formulations must agree exactly.
    val xs = Seq.tabulate(50)(i => ("a", 10.00 + (i % 7) * 0.25)) :+
      (("a", 500.00))
    val df = xs.toDF("event_type", "value")
    val n = xs.size.toDouble
    val vals = xs.map(_._2)
    val mean = vals.sum / n
    val sd = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / (n - 1))
    val expected = vals.count(v => math.abs(v - mean) > 2 * sd)

    val xv = round($"value" * 100).cast("decimal(18,0)")
    val x = df.select($"event_type", xv.as("xv"))
    val m = x.groupBy("event_type")
      .agg(count(lit(1)).cast("decimal(18,0)").as("n"),
        sum($"xv").cast("decimal(38,0)").as("s"),
        sum(($"xv" * $"xv").cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("q"))
    val dev = $"xv" * $"n" - $"s"
    val isOut = (dev * dev * ($"n" - lit(1).cast("decimal(18,0)"))) >
      (lit(4).cast("decimal(18,0)") * $"n" *
        ($"n" * $"q" - $"s" * $"s"))
    val got = x.join(m, Seq("event_type"))
      .agg(sum(when(isOut, 1).otherwise(0))).head().getLong(0)
    assert(got == expected, s"integer-moment flags $got != $expected")
  }

  test("q68: conditional-max pivot equals sorted-collect path") {
    val e = sources.Tables(spark, sf, "events")
    val w = Window.partitionBy("user_id").orderBy($"ts", $"event_id")
    val ranked = e.select($"user_id", $"event_type",
        row_number().over(w).as("rn"))
      .filter($"rn" <= 3)
    val pivoted = ranked.groupBy("user_id")
      .agg(concat_ws(">", (1 to 3).map(i =>
        max(when($"rn" === i, $"event_type"))): _*).as("path"))
    val sorted = ranked.groupBy("user_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct($"rn", $"event_type"))),
        s => s.getField("event_type")), ">").as("path"))
    assert(rows(pivoted) == rows(sorted))
  }

  test("q66: curated corpus is a subset of the q54 keep list and " +
    "contains no benchmark fingerprint") {
    val curated = queries.TextQueries.curatedDocs(spark, sf)
    val curatedDocs = curated.count()
    val keepList = queries.TextQueries.q54.fn(spark, sf).count()
    assert(curatedDocs <= keepList,
      s"curated $curatedDocs > keep-list $keepList")
    assert(curatedDocs > 0)
    // decontamination invariant, row-by-row: no curated doc shares a
    // head fingerprint with the bench set (inner join must be empty)
    val contaminated = curated
      .join(queries.TextQueries.benchFps(spark, sf), Seq("head_fp"))
      .count()
    assert(contaminated == 0,
      s"$contaminated curated doc(s) carry a bench fingerprint")
    // and the stats query aggregates exactly this doc set
    val statsTotal = queries.TextQueries.q66.fn(spark, sf)
      .agg(sum($"n_docs")).head().getLong(0)
    assert(statsTotal == curatedDocs)
  }

  test("q70: ntile quartiles are balanced within each segment") {
    val r = queries.Parity.q70.fn(spark, sf)
      .groupBy("c_mktsegment")
      .agg((max($"n_cust") - min($"n_cust")).as("spread"),
        count(lit(1)).as("n_q"))
      .collect()
    r.foreach { row =>
      assert(row.getAs[Long]("spread") <= 1,
        s"quartile sizes differ by >1: $row")
      assert(row.getAs[Long]("n_q") == 4)
    }
  }

  test("q72: trim buckets partition the corpus") {
    val total = sources.Tables(spark, sf, "documents").count()
    val got = queries.TextQueries.q72.fn(spark, sf)
      .agg(sum($"n_docs")).head().getLong(0)
    assert(got == total)
  }

  test("q74: pivot cell counts sum to the orders row count") {
    val total = sources.Tables(spark, sf, "orders").count()
    val r = queries.Parity.q74.fn(spark, sf)
      .select((col("urgent_n") + col("high_n") + col("medium_n")
        + col("notspec_n") + col("low_n")).as("s"))
      .agg(sum($"s")).head().getLong(0)
    assert(r == total)
  }

  test("q75: grouping-set levels are consistent (combo rows sum to " +
    "the grand total)") {
    val r = queries.Parity.q75.fn(spark, sf).cache()
    try {
      val grand = r.filter($"o_orderstatus".isNull &&
        $"o_orderpriority".isNull).select($"n").head().getLong(0)
      val comboSum = r.filter($"o_orderstatus".isNotNull &&
        $"o_orderpriority".isNotNull).agg(sum($"n")).head().getLong(0)
      val prioSum = r.filter($"o_orderstatus".isNull &&
        $"o_orderpriority".isNotNull).agg(sum($"n")).head().getLong(0)
      assert(grand == comboSum && grand == prioSum)
    } finally r.unpersist()
  }

  test("q77: centroid cosines are within [-1, 1] and every label " +
    "pair appears once") {
    val df = queries.SimQueries.q77.fn(spark, sf).cache()
    try {
      val n = df.count()
      assert(n == 45, s"expected C(10,2)=45 pairs, got $n")
      val bad = df.filter($"cos_sim" < -1.0 || $"cos_sim" > 1.0).count()
      assert(bad == 0)
    } finally df.unpersist()
  }

  test("q73 bigram construction: per-row zip yields adjacent pairs") {
    val df = Seq("a b c d", "x y", "solo").toDF("text")
    val ts = split($"text", " ")
    val n = size(ts)
    val bg = df.withColumn("n", n).filter($"n" >= 2)
      .select(explode(zip_with(
        slice(ts, lit(1), $"n" - 1), slice(ts, lit(2), $"n" - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
    assert(rows(bg) == Set(Seq("a b"), Seq("b c"), Seq("c d"), Seq("x y")))
  }
}
