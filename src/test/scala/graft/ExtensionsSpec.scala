package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.functions.{DotProductF, TextHashF}
import graft.plans.ApproxDistinctRewrite

/** End-to-end coverage of `GraftExtensions` — the
  * `spark.sql.extensions` entry point a cluster configures once to get
  * the graft_* SQL functions and the opt-in optimizer rules. The suite
  * builds a REAL second session through the extension path (same
  * SparkContext, fresh session state), the exact wiring
  * `spark-submit --conf spark.sql.extensions=graft.functions.
  * GraftExtensions` produces.
  */
class ExtensionsSpec extends SparkSpec with BeforeAndAfterAll {

  private var ext: SparkSession = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    val base = SparkSpec.session // anchor the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions rather than config("spark.sql.extensions", ...):
    // the conf spelling is read from the SparkCONTEXT's conf at
    // getOrCreate, and this JVM's context already exists (shared with
    // every other suite) — builder-level conf would be silently
    // ignored. Both spellings drive the same GraftExtensions.apply.
    ext = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    assert(ext ne base, "extension session must be a fresh session")
  }

  override def afterAll(): Unit = {
    // hand the shared session back to the suites that run after us
    SparkSession.setDefaultSession(SparkSpec.session)
    SparkSession.setActiveSession(SparkSpec.session)
    super.afterAll()
  }

  test("graft_* SQL functions resolve through the extension and match " +
    "their Column-API forms") {
    val df = ext.createDataFrame(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")))
      .toDF("id", "text")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = ext.sql(
      "SELECT id, graft_simhash(text, 32) AS sh FROM ext_docs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = df.select(col("id"),
      TextHashF.simhash(col("text"), 32).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)

    val vec = ext.createDataFrame(Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))))
      .toDF("a", "b")
    vec.createOrReplaceTempView("ext_vecs")
    val dotSql = ext.sql("SELECT graft_dot(a, b) AS d FROM ext_vecs")
      .head().getDouble(0)
    val dotCol = vec.select(DotProductF(col("a"), col("b")).as("d"))
      .head().getDouble(0)
    assert(dotSql == dotCol && math.abs(dotSql - 32.0) < 1e-9)
  }

  test("wrong arity / non-literal shape args fail with a named error, " +
    "not an index error") {
    val e = intercept[Exception] {
      ext.sql("SELECT graft_simhash('x')").collect()
    }
    assert(e.getMessage.contains("graft_simhash"))
  }

  test("ApproxDistinctRewrite is OFF by default: plan keeps the exact " +
    "distinct count") {
    ext.conf.unset(ApproxDistinctRewrite.EnabledKey)
    val df = ext.range(1000).select((col("id") % 100).as("v"),
      (col("id") % 4).as("g"))
    val q = df.groupBy("g").agg(countDistinct(col("v")).as("d"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("count(distinct") || plan.contains("count(v"),
      s"expected exact distinct count in:\n$plan")
    assert(!plan.contains("approx_count_distinct"))
    // v = id%100 within g = id%4 and 4 | 100: v ≡ g (mod 4), so each
    // group holds exactly 100/4 = 25 distinct values
    assert(q.collect().map(_.getLong(1)).toSet == Set(25L))
  }

  test("ApproxDistinctRewrite ON: single-arg COUNT(DISTINCT) becomes " +
    "HLL++, estimate lands within rsd bounds, other aggregates are " +
    "untouched") {
    ext.conf.set(ApproxDistinctRewrite.EnabledKey, "true")
    try {
      val df = ext.range(10000).select((col("id") % 1000).as("v"),
        (col("id") % 2).as("g"))
      val q = df.groupBy("g")
        .agg(countDistinct(col("v")).as("d"), sum(col("v")).as("s"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"),
        s"expected HLL++ rewrite in:\n$plan")
      assert(!plan.contains("count(distinct"))
      val rows = q.collect()
      // v = id%1000 within g = id%2 and 2 | 1000: 500 distinct per
      // group; rsd 0.02 default, so allow generous 10% slack
      assert(rows.forall(r => math.abs(r.getLong(1) - 500L) <= 50),
        rows.mkString(","))
      // the non-distinct SUM in the same aggregate stays exact
      val exactSum = df.groupBy("g").agg(sum(col("v"))).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows.map(r => r.getLong(0) -> r.getLong(2)).toMap == exactSum)
      // multi-arg distinct counts are deliberately NOT rewritten
      val multi = df.groupBy("g").agg(countDistinct(col("v"), col("g")))
      assert(!multi.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
    } finally ext.conf.unset(ApproxDistinctRewrite.EnabledKey)
  }

  test("the rewrite is session-scoped: the base session never sees it " +
    "even while the extension session has it enabled") {
    ext.conf.set(ApproxDistinctRewrite.EnabledKey, "true")
    try {
      val base = SparkSpec.session
      val q = base.range(100).select((col("id") % 10).as("v"))
        .agg(countDistinct(col("v")).as("d"))
      assert(!q.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
      assert(q.head().getLong(0) == 10L)
    } finally ext.conf.unset(ApproxDistinctRewrite.EnabledKey)
  }

  test("the native-join planner strategies inject through the " +
    "extension path (no runtime extraStrategies registration needed)") {
    val strategies =
      org.apache.spark.sql.GraftTestBridge.plannerStrategies(ext)
    assert(strategies.contains(graft.plans.AsOfJoin.AsOfJoinStrategy))
    assert(strategies.contains(
      graft.plans.IntervalJoin.IntervalJoinStrategy))
    // the base (non-extension) session resolves them only via the
    // runtime extraStrategies path the APIs register on first use
    val base = org.apache.spark.sql.GraftTestBridge
      .plannerStrategies(SparkSpec.session)
    assert(base.length <= strategies.length)
  }

  test("graft_topk resolves as a SQL aggregate through the extension " +
    "(analysis wraps the bare TypedImperativeAggregate) and matches " +
    "a driver-side top-k with the documented tie order") {
    val sf = "/root/testdata/sf0.001"
    val got = ext.sql(
      s"""SELECT inline(graft_topk(n_chars, doc_id, 2))
         |FROM parquet.`$sf/documents.parquet`""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val docs = ext.read.parquet(s"$sf/documents.parquet")
      .select("n_chars", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exp = docs.sortBy { case (o, p) => (-o, p) }.take(2).toSeq
    assert(got == exp)
  }
}
