package graft

import org.apache.spark.sql.SparkSession

/** Plan hygiene audit: prints, for each registered query, whether the
  * physical plan shows parquet filter pushdown, pruned read schemas,
  * broadcast joins, and whole-stage codegen — the properties that decide
  * whether a plan survives a 100× scale-up. Run:
  *   runMain graft.PlanAudit [queryName ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SessionTuning.withAqe(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val only = args.toSet
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        try {
          val df = fn(spark, dir)
          val plan = df.queryExecution.executedPlan.toString
          def count(s: String) = plan.sliding(s.length).count(_ == s)
          val pushed = "PushedFilters: \\[[^\\]]+\\]".r
            .findAllIn(plan).filterNot(_.contains("[]")).size
          println(f"$name%-28s bhj=${count("BroadcastHashJoin")}" +
            f" smj=${count("SortMergeJoin")}" +
            f" exch=${count("Exchange")}" +
            f" wsc=${count("WholeStageCodegen")}" +
            f" pushedFilters=$pushed" +
            f" scans=${count("FileScan parquet")}")
        } catch {
          case e: Throwable => println(s"$name AUDIT-ERROR ${e.getMessage}")
        }
      }
    }
    // detailed formatted plan for explicitly named queries
    if (only.nonEmpty) only.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        println(s"\n===== $n =====")
        println(fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
