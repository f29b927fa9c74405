package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan parallelism (guide §2.5: "input skew — one
  * huge unsplittable file ... repartition immediately after the
  * read").
  *
  * The driver testdata ships every table as ONE single-row-group
  * parquet file, so every scan stage runs as ONE task and all
  * map-side work upstream of the first exchange (shingle/MinHash
  * hashing, n-gram explodes, per-row media decode, Expand-based
  * multi-distinct aggregation) serializes onto one of the session's
  * cores. [[spread]] round-robins such a frame to the session's
  * default parallelism — but ONLY when the frame's existing
  * partitioning cannot fill the cores: a production table at cluster
  * scale arrives as many splits (>= cores) and the condition never
  * fires, so no exchange is added there. The knob derives from input
  * shape + session width (`defaultParallelism` follows the master's
  * core count, i.e. SPARK_GRAFT_CPUS in the bench contract), never a
  * constant tuned for one deployment.
  *
  * Apply ONLY above partitioning-independent math: integer / decimal
  * / string aggregation (the module-wide cross-engine determinism
  * policy makes most query pipelines exactly that), NEVER above raw
  * double accumulations whose reassociation could move a bit — those
  * keep the scan's native partitioning. Every applied site is gated
  * by the DuckDB oracle's exact-value compare at two SFs.
  */
object Par {

  /** `df` repartitioned to the session's cores when its current
    * partitioning underfills them; `df` unchanged otherwise.
    *
    * SCAN-ONLY CONTRACT (r19 advisor note): the decision probes
    * `df.rdd.getNumPartitions`, which physically plans the frame once
    * at the call site and reports the PRE-AQE partition count — above
    * a shuffle or cached frame that count can misstate the executed
    * layout and the added exchange can be redundant. Every call site
    * must sit directly above a raw file scan (all current ones do);
    * apply it anywhere else only with a fresh A/B measurement.
    */
  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }

  /** Coalesce a CACHED artifact down to the session's AQE advisory
    * partition size — the sizing rule AQE applies to shuffle output
    * (guide §2.2 "fewer, larger partitions"), applied to the one
    * plan shape AQE cannot touch: a persisted frame keeps the
    * pre-AQE partition count of the plan that built it
    * (`spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`
    * defaults to false, and enabling it globally measured net
    * NEGATIVE on this suite — q81 1.64x, q170 1.43x, q91 1.53x — see
    * OPTIMIZATION_r20.md). An iterative consumer that re-scans such
    * an artifact every round otherwise schedules
    * `cached-partition-count` near-empty tasks per round.
    *
    * Scale-adaptive by construction: partitions = ceil(stats bytes /
    * advisory bytes), and `coalesce` only ever MERGES partitions —
    * at cluster scale a many-GB artifact meets the advisory size
    * already and the call is a no-op; locally a KB-sized artifact
    * collapses to one right-sized task. Narrow op, no shuffle, no
    * row movement across a partitioning contract. Callers should
    * pass a frame whose cache is MATERIALIZED (e.g. after a count)
    * so the stats are the measured cache size, not an estimate —
    * with cold-cache estimates the computed count is merely larger
    * and the coalesce degrades to a no-op.
    */
  def packToAdvisory(df: DataFrame): DataFrame = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val adv = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      df.sparkSession.conf.get(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m"))
    val p = ((bytes + adv - 1) / adv).max(1)
    if (p.isValidInt) df.coalesce(p.toInt) else df
  }
}
