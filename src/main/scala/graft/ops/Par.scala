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
    */
  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }
}
