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
  // identity-keyed (SparkSession doesn't override equals): a test can
  // pin a nonce to one cloned session so that clone's artifacts key —
  // and rebuild — separately from the application-shared ones
  private val nonces = new ConcurrentHashMap[SparkSession, String]()

  /** Cache scope for a session: the application id, plus the test
    * nonce if one is pinned to this exact session object. Production
    * sessions (no nonce) share one scope per application — N registry
    * consumers, one materialization — while a nonce-pinned clone
    * rebuilds its full lineage under its own conf (the
    * partition-invariance tests need the rebuild; sharing the base
    * session's artifacts would let only the stages DOWNSTREAM of the
    * cached frame run at the altered partition count).
    */
  private def scope(spark: SparkSession): String =
    spark.sparkContext.applicationId +
      Option(nonces.get(spark)).map(":" + _).getOrElse("")

  /** Pin `nonce` to this session object; its artifacts now live (and
    * are cleared) under their own scope. Test-only.
    *
    * SCOPE LIMIT: the nonce isolates this cache (and
    * [[SessionScratch]]'s dirs/once-guards) — NOT shared-catalog
    * TABLE NAMES. Stored-table queries (q79/q108/q135 family) derive
    * their table names from the sf dir alone and `saveAsTable` into
    * the catalog every cloned session shares, so a nonce-pinned clone
    * running one would repoint the live catalog entry at its own
    * scratch dir, yanking the artifact from concurrent suites.
    * Nonce-pinned clones must stick to queries with no stored-table
    * path (the current invariance tests — q128, q160 — qualify).
    */
  private[graft] def setNonceForTests(spark: SparkSession,
      nonce: String): Unit = { nonces.put(spark, nonce); () }

  private[graft] def clearNonceForTests(spark: SparkSession): Unit = {
    nonces.remove(spark); ()
  }

  /** The persisted frame for `key`, building (and persisting) it on
    * first use in this Spark application. `key` must include every
    * input the build depends on (e.g. the sf dir).
    */
  def apply(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent((scope(spark), key), _ => build.persist())

  /** Unpersist and forget every artifact of this scope — the whole
    * application for a production session, just the clone's artifacts
    * for a nonce-pinned test session (so a mid-suite clear of THIS
    * CACHE can never yank a cached frame out from under a
    * concurrently running suite; see [[setNonceForTests]] for the
    * catalog-table carve-out the nonce does not cover).
    */
  def clear(spark: SparkSession): Unit = {
    val s = scope(spark)
    cache.forEach { (k, df) =>
      if (k._1 == s) {
        df.unpersist()
        cache.remove(k)
      }
    }
  }
}
