package graft

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialized-artifact cache.
  *
  * Reused intermediates (MinHash signatures, band keys, gram sets) are
  * worth exactly ONE materialization per session — they are the tables
  * a production pipeline would write to storage. Calling `.persist()`
  * at every query call site stacks duplicate cache entries when a
  * registry consumer (Verify/Bench/PlanAudit) invokes the same query
  * family repeatedly ("WARN CacheManager: Asked to cache already cached
  * data") and nothing ever unpersists them. This helper memoizes the
  * persisted frame per (application, artifact-key), so N registry runs
  * share one cached copy, and [[clear]] releases everything at once.
  *
  * ONLY for frames derived from immutable inputs (testdata parquet):
  * Spark's CacheManager matches canonicalized plans, so caching over a
  * path that is later overwritten would serve stale data (see the note
  * in Scd.scd2Merge). Warehouse-backed frames must not go through here.
  */
object Materialized {

  private val cache = new ConcurrentHashMap[(String, String), DataFrame]()

  /** The persisted frame for `key`, building (and persisting) it on
    * first use in this Spark application. `key` must include every
    * input the build depends on (e.g. the sf dir).
    */
  def apply(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent((spark.sparkContext.applicationId, key),
      _ => build.persist())

  /** Unpersist and forget every artifact of this application (test
    * teardown / end-of-session hygiene).
    */
  def clear(spark: SparkSession): Unit = {
    val appId = spark.sparkContext.applicationId
    cache.forEach { (k, df) =>
      if (k._1 == appId) {
        df.unpersist()
        cache.remove(k)
      }
    }
  }
}
