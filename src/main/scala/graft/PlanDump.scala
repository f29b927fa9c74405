package graft

import org.apache.spark.sql.SparkSession

/** Plan-evidence dumper (guide §7.2): writes, for each named query,
  * the `.explain("formatted")` initial plan AND the post-execution
  * final adaptive plan (the one carrying `AQEShuffleRead` /
  * runtime join rewrites) to `<outDir>/<query>_<tag>.txt`. The final
  * plan is taken from the SAME QueryExecution the action ran, so the
  * file shows what actually executed, not the pre-AQE estimate.
  *
  * Measurement tool only — never on a query path. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.PlanDump plans/r20 before q258_kcore_peel ..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query...>")
    val (outDir, tag, names) = (args(0), args(1), args.drop(2).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionTuning.withAqe(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      val qe = df.queryExecution
      val initial = qe.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // execute THIS QueryExecution so the adaptive plan finalizes;
      // toLocalIterator-style full traversal via count on the
      // executed plan would prune, so drain collect() (bounded: the
      // registry's outputs are aggregate-grain)
      df.collect()
      val fin = qe.executedPlan.toString
      val txt = s"== explain(formatted), initial ==\n$initial\n" +
        s"== executedPlan after execution (final adaptive plan) ==\n$fin\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"dumped $outDir/${name}_$tag.txt")
    }
    Materialized.clear(spark)
    spark.stop()
  }
}
