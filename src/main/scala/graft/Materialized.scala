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
  * RETENTION is byte-capped LRU (round 12): retained artifacts were
  * healthy at 229 queries (23 MB at bench end) but unbounded in query
  * count. When the block manager's observed storage exceeds
  * [[capBytes]] at admission time, least-recently-USED artifacts are
  * unpersisted (blocking) and forgotten until under cap or the cache
  * is empty. Eviction is CORRECTNESS-NEUTRAL by the same contract
  * that makes this cache sound at all: artifacts derive from
  * immutable inputs, so a later request simply rebuilds — overflow
  * costs time, never answers (spec-pinned in Round12Spec). The cap
  * check reads the block manager (all persistent RDDs, not only this
  * cache's) — conservative: foreign cached data squeezes artifacts
  * out rather than pushing the JVM toward eviction-by-OOM.
  *
  * ONLY for frames derived from immutable inputs (testdata parquet):
  * Spark's CacheManager matches canonicalized plans, so caching over a
  * path that is later overwritten would serve stale data (see the note
  * in Scd.scd2Merge). Warehouse-backed frames must not go through here.
  */
object Materialized {

  /** Retention cap on OBSERVED block-manager storage (memory + disk)
    * before a new artifact is admitted. Default 4 GiB — two orders
    * above the full 232-query suite's measured footprint, so the cap
    * is a backstop against unbounded growth, not a working limit.
    * Settable (tests shrink it to force eviction).
    */
  @volatile private[graft] var capBytes: Long =
    sys.env.get("SPARK_GRAFT_MATERIALIZED_CAP_BYTES").map(_.toLong)
      .getOrElse(4L << 30)

  // access-ordered: iteration visits least-recently-used first. All
  // access is under `lock` — the map itself is not thread-safe, and
  // admission must be atomic with eviction. Holding the lock across
  // `build.persist()` is safe: persist only MARKS the plan (no job).
  private val lock = new Object
  private val cache =
    new java.util.LinkedHashMap[(String, String), DataFrame](16, 0.75f, true)
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

  private def storedBytes(spark: SparkSession): Long =
    spark.sparkContext.getRDDStorageInfo
      .map(i => i.memSize + i.diskSize).sum

  /** Evict least-recently-used artifacts (any scope — storage is
    * application-global) until observed storage fits the cap or the
    * cache is empty. Unpersists BLOCKING so the re-read of storage
    * reflects each eviction. Callers hold `lock`.
    */
  private def evictUntilUnderCap(spark: SparkSession): Unit = {
    if (storedBytes(spark) <= capBytes) return
    val it = cache.entrySet().iterator()
    while (storedBytes(spark) > capBytes && it.hasNext) {
      it.next().getValue.unpersist(blocking = true)
      it.remove()
    }
  }

  /** The persisted frame for `key`, building (and persisting) it on
    * first use in this Spark application — or REbuilding it if the
    * LRU cap evicted it since. `key` must include every input the
    * build depends on (e.g. the sf dir).
    */
  def apply(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    lock.synchronized {
      val k = (scope(spark), key)
      val hit = cache.get(k) // refreshes LRU position
      if (hit != null) hit
      else {
        evictUntilUnderCap(spark)
        val df = build.persist()
        cache.put(k, df)
        df
      }
    }

  /** DISK-BACKED sibling of [[apply]] for TRANSIENT chain
    * checkpoints (EM forward/backward frames, BPE per-merge symbol
    * tables, Viterbi DP cuts): the frame is written ONCE per
    * (session scope, key) to [[SessionScratch]] parquet and every
    * consumer reads the files back. Lineage is severed exactly as a
    * persist would sever it — the reader's plan is a flat scan — but
    * NOTHING stays in the block manager after the run, so the bench
    * hygiene ledger shows retained:0 for these queries. Use this for
    * intermediates whose only job is bounding plan depth in an
    * iterative build; keep [[apply]] for artifacts whose re-read is
    * hot enough to want memory (ANN stores probed per query). Same
    * immutable-inputs contract as [[apply]].
    */
  def scratch(spark: SparkSession, key: String)(
      build: => DataFrame): DataFrame = {
    val safe = key.replaceAll("[^A-Za-z0-9._-]", "_").take(64) +
      "_" + SessionScratch.keyOf(key)
    val dir = SessionScratch.dir(spark, "mat") + "/" + safe
    SessionScratch.once(spark, "mat:" + key) {
      build.write.mode("overwrite").parquet(dir)
    }
    spark.read.parquet(dir)
  }

  /** Unpersist and forget every artifact of this scope — the whole
    * application for a production session, just the clone's artifacts
    * for a nonce-pinned test session (so a mid-suite clear of THIS
    * CACHE can never yank a cached frame out from under a
    * concurrently running suite; see [[setNonceForTests]] for the
    * catalog-table carve-out the nonce does not cover).
    */
  def clear(spark: SparkSession): Unit = lock.synchronized {
    val s = scope(spark)
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == s) {
        e.getValue.unpersist()
        it.remove()
      }
    }
  }
}
