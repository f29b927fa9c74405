package graft

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession

/** Session-scoped scratch storage for queries that write an artifact
  * mid-query (q79's signature store, q90's partitioned fact copy).
  * Fixes two defects of a bare `Files.createTempDirectory` per
  * invocation:
  *
  *  - LITTER: every Verify/Bench/spec invocation used to leave a full
  *    store on disk. Here each (application, tag) gets ONE directory,
  *    created on first use and deleted recursively when the JVM exits.
  *  - STALENESS: re-running a query fn used to repoint its fixed
  *    catalog table at a fresh empty dir, breaking any previously
  *    returned DataFrame. Here [[once]] makes the write happen exactly
  *    once per (application, key); later invocations reuse the same
  *    on-disk artifact, so every returned plan reads identical data.
  *
  * Keys must include every input the artifact depends on (the sf dir),
  * same contract as [[Materialized]] — its on-disk sibling.
  */
object SessionScratch {

  private val dirs = new ConcurrentHashMap[(String, String), Path]()
  private val written = new ConcurrentHashMap[(String, String), Boolean]()
  // identity-keyed test nonces, same device as [[Materialized]]: a
  // nonce-pinned clone gets its own scratch scope so invariance tests
  // rebuild on-disk artifacts under the clone's conf instead of
  // silently reusing the base session's
  private val nonces = new ConcurrentHashMap[SparkSession, String]()

  private def scope(spark: SparkSession): String =
    spark.sparkContext.applicationId +
      Option(nonces.get(spark)).map(":" + _).getOrElse("")

  private[graft] def setNonceForTests(spark: SparkSession,
      nonce: String): Unit = { nonces.put(spark, nonce); () }

  private[graft] def clearNonceForTests(spark: SparkSession): Unit = {
    nonces.remove(spark); ()
  }

  /** The scratch directory for (this scope, tag) — one per pair,
    * deleted on JVM shutdown.
    */
  def dir(spark: SparkSession, tag: String): String =
    dirs.computeIfAbsent((scope(spark), tag), _ => {
      val p = Files.createTempDirectory(s"graft-scratch-$tag-")
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(p)))
      p
    }).toString

  /** Run `write` exactly once per (scope, key); concurrent and
    * repeated callers wait for / reuse the first invocation's artifact.
    * A failed write is not recorded, so the next caller retries.
    */
  def once(spark: SparkSession, key: String)(write: => Unit): Unit =
    written.computeIfAbsent((scope(spark), key), _ => { write; true })

  /** A short filesystem/catalog-safe token for an input path — used to
    * key table names per sf dir so different corpora never share an
    * artifact within one session.
    */
  def keyOf(input: String): String =
    java.lang.Integer.toHexString(input.hashCode & 0x7fffffff)

  private def deleteTree(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(c => deleteTree(c)) finally s.close()
    }
    Files.deleteIfExists(p)
    ()
  }

  private[graft] def clearForTests(): Unit = { dirs.clear(); written.clear() }
}
