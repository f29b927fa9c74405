package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-scale smoke: times the named queries against a synthesized
  * factor-N corpus, the closest local[*] proxy for the 100×-scale
  * claim the plan docs otherwise argue only structurally.
  *
  * The factor-N corpus is N key-shifted copies of each FACT table
  * (orders, lineitem, events, documents, embeddings) unioned together;
  * dimension tables are copied unchanged, exactly how a warehouse
  * grows — facts accrete, dims stay put. Key shifts are strides
  * computed from the source maxima, so copies never collide and
  * referential integrity holds (lineitem.l_orderkey shifts by the
  * SAME stride as orders.o_orderkey; dim foreign keys are left alone).
  * Everything is deterministic — no randomness, no clock.
  *
  * Factor 1 runs through the same synthesize-then-read path, so the
  * baseline and the scaled run see identical file layout and
  * partitioning; the reported ratio isolates data growth. A query
  * scaling near-linearly (ratio ≈ factor, minus fixed per-job
  * overhead amortized at the small end) is certified; super-linear
  * growth names a plan that would not survive 100 TB.
  *
  * Usage: runMain graft.ScaleSmoke <srcSfDir> <workDir> <factor> [q ...]
  * Prints one JSON line: {"factor":N,"synth_sec":...,"queries":{...}}.
  */
object ScaleSmoke {

  private val dims = Seq("region", "nation", "customer", "supplier", "part")

  /** Union `factor` copies of `df` with each key column shifted by
    * i·stride(col) — a pure, deterministic blow-up.
    */
  def shiftedUnion(df: DataFrame, strides: Map[String, Long],
      factor: Int): DataFrame =
    (0 until factor).map { i =>
      strides.foldLeft(df) { case (d, (c, s)) =>
        d.withColumn(c, col(c) + lit(i * s))
      }
    }.reduce(_ union _)

  private def maxKey(df: DataFrame, c: String): Long =
    df.agg(max(col(c).cast("long"))).head.getLong(0) + 1L

  /** Build the factor-N corpus under `workDir` (idempotent overwrite). */
  def synthesize(spark: SparkSession, srcDir: String, workDir: String,
      factor: Int): Unit = {
    dims.foreach { t =>
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$workDir/$t.parquet")
    }
    val orders = spark.read.parquet(s"$srcDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$srcDir/lineitem.parquet")
    // one stride for the shared order-key domain keeps the join aligned
    val ordStride = maxKey(orders, "o_orderkey")
    shiftedUnion(orders, Map("o_orderkey" -> ordStride), factor)
      .write.mode("overwrite").parquet(s"$workDir/orders.parquet")
    shiftedUnion(lineitem, Map("l_orderkey" -> ordStride), factor)
      .write.mode("overwrite").parquet(s"$workDir/lineitem.parquet")
    // events.ts is TIMESTAMP(NANOS) in older testdata (read raw as
    // long — set nanosAsLong HERE, not via a prior Tables.events call,
    // so this read doesn't depend on call-order side effects) or
    // TIMESTAMP_NTZ(MICROS) in newer testdata (reads as NTZ and the
    // shifted copy round-trips unchanged; the Tables loader normalizes
    // either encoding on read). Shift the entity keys — new users per
    // copy, so sessionization scales by population, not density.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$srcDir/events.parquet")
    shiftedUnion(events,
      Map("event_id" -> maxKey(events, "event_id"),
        "user_id" -> maxKey(events, "user_id")), factor)
      .write.mode("overwrite").parquet(s"$workDir/events.parquet")
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    shiftedUnion(docs, Map("doc_id" -> maxKey(docs, "doc_id")), factor)
      .write.mode("overwrite").parquet(s"$workDir/documents.parquet")
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    shiftedUnion(emb, Map("vec_id" -> maxKey(emb, "vec_id")), factor)
      .write.mode("overwrite").parquet(s"$workDir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val (srcDir, workDir, factor) = (args(0), args(1), args(2).toInt)
    val only = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SessionTuning.withAqe(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // same invariant as Bench: Tables.events' NTZ re-tag needs a
      // UTC session to be a pure micros re-tag
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s0 = System.nanoTime()
    synthesize(spark, srcDir, workDir, factor)
    val synthSec = (System.nanoTime() - s0) / 1e9
    // same measurement contract as Bench: unbilled session + artifact
    // warm-up, then declaration-order noop-sink timing
    spark.range(1000).selectExpr("sum(id)").collect()
    (dims ++ Seq("orders", "lineitem", "events", "documents",
      "embeddings")).foreach(t =>
      graft.sources.Tables(spark, workDir, t).count())
    graft.queries.TextQueries.prewarm(spark, workDir)
    graft.queries.Extras.prewarm(spark, workDir)
    val picked =
      if (only.isEmpty) Registry.all else Registry.all.filter(q => only(q.name))
    // min across two full passes (Bench's billing): a single-shot
    // sample at one factor is session-JIT-sensitive enough to fake
    // super-linearity (q266's f=8 spread was 66-86 s across identical
    // runs before this); the pass-2 warm sample is comparable ACROSS
    // factors, which is all a ratio needs
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val results = Bench.run(spark, workDir, picked, passes)
      .map(t => (t.name, t.sec, t.err, t.hygiene))
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e), _) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scale_smoke","factor":$factor,"synth_sec":$synthSec,"queries":$qs,"errors":$errs,"src":"$srcDir"}""")
    Materialized.clear(spark)
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
