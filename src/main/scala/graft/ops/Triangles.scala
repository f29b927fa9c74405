package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-ordered triangle counting (the MapReduce-era standard:
  * Suri & Vassilvitskii 2011's "node iterator++" / Cohen 2009) —
  * companion to [[Components]] in the graph tier. Each undirected
  * edge is directed from its (degree, id)-smaller endpoint; wedges
  * form only between a node's OUT-neighbors and close against the
  * oriented edge set. Every triangle then has exactly ONE node whose
  * two out-edges span it (its (degree, id)-minimum), so no triangle
  * is double-counted and — the scale property — out-degrees under
  * this orientation are O(√m) on ANY graph, bounding the wedge join
  * by Σ out-deg² ≤ m^1.5 where the naive neighbor join is unbounded
  * on a power-law hub (a 10^7-degree node contributes 10^14 naive
  * wedges, ~10^7 oriented ones).
  */
object Triangles {

  /** Per-node triangle participation counts over an undirected edge
    * list (`a`, `b`; callers normalize a<b and dedup). Output:
    * (node, n_triangles), one row per node in ≥ 1 triangle. Three
    * self-joins — degree attach, wedge form, wedge close — all on
    * key columns, no driver state.
    */
  def perNode(ed: DataFrame): DataFrame = {
    val deg = ed.select(col("a").as("v"))
      .unionAll(ed.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("dg"))
    val withDeg = ed
      .join(deg.select(col("v").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("dg").as("db")), Seq("b"))
    // orient from the (degree, id)-smaller endpoint
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val ori = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("db")).otherwise(col("da")).as("dv"))
    val e1 = ori.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val e2 = ori.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val wedges = e1.join(e2, Seq("u"))
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    val closing = ori.select(col("u").as("x"), col("v").as("y"))
    val tri = wedges.join(closing, Seq("x", "y"))
    tri.select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
