package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the
  * duplicate-CLUSTER resolution step that closes the dedup pipeline:
  * candidate pairs (MinHash-LSH q30 / SimHash q49 / embedding q39)
  * → components → one keeper per component.
  *
  * Algorithm: distributed min-label propagation. Every node starts
  * labelled with itself; each round joins labels across edges and
  * keeps the per-node minimum; convergence when no label changed.
  * The driver reads ONE scalar per round (the changed-label count),
  * never data rows; lineage is cut each round with localCheckpoint so
  * the plan doesn't grow with the iteration count.
  *
  * Scale note: plain propagation needs O(graph diameter) rounds —
  * fine for dedup graphs (near-duplicate clusters are small and
  * dense, diameter is tiny). A corpus with pathological chain-shaped
  * components would want the alternating small-star/large-star
  * contraction (Kiveris et al., "Connected Components in MapReduce"),
  * which is the same DataFrame join/agg ops in O(log n) rounds — the
  * round cap below fails loudly rather than returning a half-merged
  * labelling if that day comes.
  */
object Components {

  /** (node, comp) for every node appearing in `pairs`(a, b); `comp`
    * is the component's minimum node id — deterministic in any engine.
    */
  def connected(pairs: DataFrame, a: String = "doc_a",
      b: String = "doc_b", maxRounds: Int = 50): DataFrame = {
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .unionByName(pairs.select(col(b).as("src"), col(a).as("dst")))
      .distinct()
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("comp"))
      .localCheckpoint()
    var changed = 1L
    var round = 0
    while (changed > 0) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"Components.connected: no convergence after $maxRounds " +
            "rounds — component diameter exceeds the propagation " +
            "budget; use a star-contraction variant for this graph")
      val prop = edges.join(labels, col("src") === col("node"))
        .select(col("dst").as("node"), col("comp"))
      val next = labels.unionByName(prop)
        .groupBy("node").agg(min("comp").as("comp"))
        .localCheckpoint()
      changed = next
        .join(labels.select(col("node"), col("comp").as("prev")),
          Seq("node"))
        .filter(col("comp") < col("prev"))
        .count()
      labels = next
      round += 1
    }
    labels
  }
}
