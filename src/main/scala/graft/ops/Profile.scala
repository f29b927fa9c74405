package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality summary a pipeline runs before
  * it trusts a new corpus drop: per column, the row count, null count,
  * distinct count, and min/max rendered as strings. The reference
  * validates loads by eyeballing counts after each ETL step
  * (`ETLScript_withSCDimplementation.py` prints shapes between
  * stages); this is that check as a first-class, single-pass operator.
  *
  * Shape: ONE aggregate produces every statistic for every profiled
  * column (4 aggs per column + one shared row count), then the 1-row
  * result is unpivoted back to column grain with `stack` — a generator
  * over one row, free. min/max aggregate on the NATIVE type and cast
  * to string AFTER (string min of numbers would order "10" < "9").
  *
  * Scale: the only non-map-combinable piece is the exact
  * `countDistinct` — Spark plans N distinct aggregates via Expand
  * (one input-row replica per profiled column before the exchange).
  * At 100 TB, either profile fewer columns per pass or flip
  * `exact = false`: `approx_count_distinct` (HLL, 2% default error)
  * partial-aggregates map-side like every other stat, collapsing the
  * plan to a single no-Expand pass — the same trade the opt-in
  * [[graft.plans.ApproxDistinctRewrite]] rule applies to ad-hoc SQL.
  */
object Profile {

  /** One row per entry of `cols`: (col_name, n_rows, n_nulls,
    * n_distinct, min_s, max_s). `cols` maps the reported name to the
    * expression to profile (pass a cast when the raw column's string
    * rendering is engine-ambiguous, e.g. double prices → DECIMAL).
    */
  def profile(df: DataFrame, cols: Seq[(String, Column)],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // reported names flow into SQL identifiers and a string literal —
    // quote both, so raw-CSV names ("unit price", "a.b") profile fine
    def ident(n: String) = "`" + n.replace("`", "``") + "`"
    def strLit(n: String) = "'" + n.replace("\\", "\\\\")
      .replace("'", "\\'") + "'"
    val nd: Column => Column =
      if (exact) countDistinct(_) else approx_count_distinct(_)
    val aggs = cols.flatMap { case (n, c) => Seq(
      // count(1) - count(c): 0 (not null) on an empty input — a
      // validation op must not itself report nulls on the empty-load
      // case it exists to catch
      (count(lit(1)) - count(c)).cast("long").as(s"${n}__nulls"),
      nd(c).cast("long").as(s"${n}__nd"),
      min(c).cast("string").as(s"${n}__min"),
      max(c).cast("string").as(s"${n}__max"))
    } :+ count(lit(1)).as("__rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { case (n, _) =>
      s"${strLit(n)}, ${ident(s"${n}__nulls")}, ${ident(s"${n}__nd")}, " +
        s"${ident(s"${n}__min")}, ${ident(s"${n}__max")}"
    }.mkString(", ")
    one.selectExpr("__rows AS n_rows",
        s"stack(${cols.size}, $stackArgs) " +
          "AS (col_name, n_nulls, n_distinct, min_s, max_s)")
      .select("col_name", "n_rows", "n_nulls", "n_distinct",
        "min_s", "max_s")
  }
}
