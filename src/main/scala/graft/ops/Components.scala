package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the
  * duplicate-CLUSTER resolution step that closes the dedup pipeline:
  * candidate pairs (MinHash-LSH q30 / SimHash q49 / embedding q39)
  * → components → one keeper per component.
  *
  * Algorithm: distributed min-label propagation WITH pointer jumping.
  * Every node starts labelled with itself; each round takes the
  * per-node minimum over (its own label, its neighbours' labels, its
  * label's label). The edge-propagation term alone converges in
  * O(diameter) rounds; the pointer-jumping term (follow the label
  * chain one hop: node → comp → comp's comp) compresses chains
  * geometrically, giving O(log diameter) rounds — the same idea as
  * the star-contraction CC algorithms (Kiveris et al., "Connected
  * Components in MapReduce and Beyond"). Convergence when no label
  * changed; the driver reads ONE scalar per round (the changed-label
  * count), never data rows; lineage is cut each round with
  * localCheckpoint so the plan doesn't grow with the round count.
  * The round cap fails loudly rather than returning a half-merged
  * labelling.
  */
object Components {

  /** (node, comp) for every node appearing in `pairs`(a, b); `comp`
    * is the component's minimum node id — deterministic in any engine.
    */
  def connected(pairs: DataFrame, a: String = "doc_a",
      b: String = "doc_b", maxRounds: Int = 50): DataFrame = {
    // materialize the edge list ONCE — every round joins against it,
    // and without this each round would re-execute the pair-generation
    // lineage (the whole LSH candidate pipeline when fed from q30)
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .unionByName(pairs.select(col(b).as("src"), col(a).as("dst")))
      .distinct()
      .localCheckpoint()
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
      // pointer jumping: node -> comp -> comp's current label
      val jump = labels
        .join(labels.select(col("node").as("comp"),
          col("comp").as("comp2")), Seq("comp"))
        .select(col("node"), col("comp2").as("comp"))
      val next = labels.unionByName(prop).unionByName(jump)
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
