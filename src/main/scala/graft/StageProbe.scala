package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage attribution for a single query's bench seconds (guide
  * §1: measure first, empirically). Runs each named query through the
  * noop sink TWICE (pass 2 = warm JVM, the bench's billed shape) with
  * a stage listener attached, then prints pass-2's stages sorted by
  * wall time: stage id, duration, task count, input/shuffle bytes and
  * the first line of the stage's call site. This answers "where do
  * this query's seconds go" without the Spark UI (headless sandbox).
  *
  * Measurement tool only — never on a query path. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.StageProbe q131_lsh_scurve"
  */
object StageProbe {
  final case class St(id: Int, ms: Long, tasks: Int, input: Long,
      srBytes: Long, swBytes: Long, site: String)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageProbe <queryName> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionTuning.withAqe(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val ms = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(-1L)
        val m = i.taskMetrics
        stages.synchronized {
          stages += St(i.stageId, ms, i.numTasks,
            m.inputMetrics.bytesRead,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            i.details.linesIterator.nextOption().getOrElse(""))
        }
      }
    }
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      // pass 1: warm (JIT, artifacts) — unrecorded
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val warmSec = (System.nanoTime() - t0) / 1e9
      stages.clear()
      spark.sparkContext.addSparkListener(listener)
      val t1 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t1) / 1e9
      // listener bus is async; give queued stage-completed events a
      // moment to drain before snapshotting (private API avoided)
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      val snap = stages.synchronized(stages.toVector)
      // r19 advisor note: the fixed drain sleep can drop late
      // stage-completed events on loaded runs — make the gap visible
      // by comparing the stage-ms sum against pass-2 wall time (a sum
      // far below wall means either driver-bound time OR dropped
      // events; a sum above wall just means parallel stages)
      val sumMs = snap.map(_.ms).sum
      val warn =
        if (sumMs < (sec * 1000 * 0.5).toLong)
          "  [stage-ms << wall: driver-bound or listener drop]"
        else ""
      println(f"\n===== $name pass2=$sec%.3f s (pass1 $warmSec%.3f s), " +
        f"${snap.size} stages, stage-ms sum=$sumMs =====$warn")
      snap.sortBy(-_.ms).take(25).foreach { s =>
        println(f"  stage ${s.id}%4d ${s.ms}%6d ms tasks=${s.tasks}%3d " +
          f"in=${s.input}%10d sr=${s.srBytes}%9d sw=${s.swBytes}%9d ${s.site.take(90)}")
      }
    }
    Materialized.clear(spark)
    spark.stop()
  }
}
