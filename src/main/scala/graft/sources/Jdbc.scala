package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC database source/sink — the [[Warehouse]]-shaped path for a
  * deployment whose warehouse is a real database, which is the
  * reference's actual I/O (SQL Server over SQLAlchemy:
  * ETLScript_withSCDimplementation.py:49 reads `SELECT * FROM <src>`,
  * :97 appends via `to_sql(if_exists='append')`). The parquet
  * [[Warehouse]] stays the default in this sandbox (SURVEY §2.1);
  * this adapter completes S2/S4/S5 for a user pointing the engine at
  * SQL Server/Postgres/etc.
  *
  * Scale shape: a naive JDBC read is ONE partition — a single
  * executor pulls the whole table through one connection, the classic
  * accidental bottleneck. [[readPartitioned]] is the production form:
  * Spark issues `numPartitions` range-predicated queries in parallel
  * (`partitionColumn BETWEEN ...`), so the scan parallelizes like a
  * file scan. Filters and column pruning still push down — Catalyst
  * compiles them into the generated SQL (`PushedFilters` in the scan
  * node, asserted in SourcesSpec).
  *
  * Writes mirror [[Warehouse]]: [[append]] = insert-only load (S4),
  * [[overwrite]] = full refresh (S6, with `truncate` to keep the
  * table's DDL/grants instead of DROP+CREATE). Row-wise UPDATE (S5)
  * deliberately has no JDBC fast path here: the engine's SCD merges
  * compute the merged table and full-refresh it — per-row UPDATE
  * round trips are exactly what [[graft.ops.Scd]] replaced.
  */
object Jdbc {

  private def props(user: Option[String], password: Option[String],
      driver: Option[String]): Properties = {
    val p = new Properties()
    user.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    driver.foreach(p.setProperty("driver", _))
    p
  }

  /** Whole-table (or pushdown-filtered) read — single connection;
    * fine for dimension-sized tables, wrong for facts (use
    * [[readPartitioned]]).
    */
  def read(spark: SparkSession, url: String, table: String,
      user: Option[String] = None, password: Option[String] = None,
      driver: Option[String] = None): DataFrame =
    spark.read.jdbc(url, table, props(user, password, driver))

  /** Range-partitioned parallel read: `numPartitions` concurrent
    * range queries over `partitionColumn` ∈ [lower, upper]. Rows
    * OUTSIDE the bounds are still read (Spark widens the first/last
    * stride) — bounds tune parallelism, never correctness.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long,
      numPartitions: Int, user: Option[String] = None,
      password: Option[String] = None,
      driver: Option[String] = None): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lower, upper,
      numPartitions, props(user, password, driver))

  /** Insert-only load (S4/S7). `batchSize` rows per JDBC batch —
    * the lever that decides whether a 10⁹-row load is one round trip
    * per row or per 10⁴ rows.
    */
  def append(df: DataFrame, url: String, table: String,
      user: Option[String] = None, password: Option[String] = None,
      driver: Option[String] = None, batchSize: Int = 10000): Unit =
    df.write.mode("append")
      .option("batchsize", batchSize)
      .jdbc(url, table, props(user, password, driver))

  /** Full refresh (S6). `truncate=true` issues TRUNCATE + INSERT
    * instead of DROP + CREATE, preserving indexes/constraints/grants
    * on the target — the DELETE-all + INSERT-SELECT the reference's
    * full-refresh dims perform.
    *
    * SELF-REFERENCE HAZARD: `df` must NOT read `table` — Spark clears
    * the target BEFORE evaluating the plan, so a merge that reads its
    * own target would see it empty (the same read-before-write race
    * [[Warehouse.mergeOverwrite]] solves for files). Use
    * [[mergeOverwrite]] for those.
    */
  def overwrite(df: DataFrame, url: String, table: String,
      user: Option[String] = None, password: Option[String] = None,
      driver: Option[String] = None, truncate: Boolean = true): Unit =
    df.write.mode("overwrite")
      .option("truncate", truncate)
      .jdbc(url, table, props(user, password, driver))

  /** Overwrite for plans that READ their own target (SCD merges):
    * materialize `df` into `<table>_stage` first, then refresh the
    * target from the staged copy — the JDBC analog of
    * [[Warehouse.mergeOverwrite]]'s sibling-dir swap, with the same
    * crash story (a failure mid-stage leaves the live table intact;
    * a failure mid-refresh leaves the complete stage to re-run from).
    */
  def mergeOverwrite(df: DataFrame, url: String, table: String,
      user: Option[String] = None, password: Option[String] = None,
      driver: Option[String] = None, truncate: Boolean = true): Unit = {
    val spark = df.sparkSession
    overwrite(df, url, s"${table}_stage", user, password, driver,
      truncate = false)
    overwrite(read(spark, url, s"${table}_stage", user, password, driver),
      url, table, user, password, driver, truncate)
    // the stage's crash-recovery value ends the moment the target
    // refresh commits — after that it is a full duplicate copy per
    // merged table, so drop it rather than letting every merge
    // permanently double the table's footprint
    dropTable(url, s"${table}_stage", user, password, driver)
  }

  /** Best-effort DROP TABLE over a plain JDBC connection (Spark has no
    * DataFrame-level drop). Failures are swallowed: a stage that
    * cannot be dropped is litter, not an incorrect merge.
    */
  private def dropTable(url: String, table: String, user: Option[String],
      password: Option[String], driver: Option[String]): Unit = {
    driver.foreach(Class.forName)
    val p = props(user, password, driver)
    try {
      val conn = java.sql.DriverManager.getConnection(url, p)
      try {
        // a plain (possibly schema-qualified) identifier passes through
        // unquoted — it was CREATED unquoted by Spark's JDBC writer, so
        // quoting here would miss the case-normalized stored name.
        // Anything else (a name needing quoting, or a hostile one
        // reaching mergeOverwrite) is wrapped in the dialect's own
        // identifier quote so it stays ONE identifier, never SQL
        val plain = "[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)*"
        val quoted =
          if (table.matches(plain)) table
          else {
            val q = Option(conn.getMetaData.getIdentifierQuoteString)
              .map(_.trim).filter(_.nonEmpty).getOrElse("\"")
            table.split('.')
              .map(part => q + part.replace(q, q + q) + q)
              .mkString(".")
          }
        val st = conn.createStatement()
        try st.executeUpdate(s"DROP TABLE $quoted")
        finally st.close()
      } finally conn.close()
    } catch { case scala.util.control.NonFatal(_) => () }
  }
}
