package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
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
  * changed; the driver reads ONE fingerprint per round (a set-equality
  * check — see [[fingerprint]]), never data rows; lineage is cut each
  * round with localCheckpoint so the plan doesn't grow with the round
  * count.
  * The round cap fails loudly rather than returning a half-merged
  * labelling.
  *
  * Block-manager hygiene: every round's localCheckpoint persists
  * blocks, and a superseded round's blocks are dead weight — left
  * cached they accumulate for the rest of the session and evict
  * useful storage (the round-6 bench regression). Both algorithms
  * therefore unpersist each superseded frame as soon as its
  * successor is materialized AND the convergence count that reads it
  * has run. What survives a call is exactly the checkpointed
  * frame(s) the RETURNED plan still reads (the final labels / final
  * edges + nodes) — lineage is truncated, so those must stay until
  * the caller has consumed the result, then [[release]] frees them.
  * All checkpoint RDDs carry the [[rddNamePrefix]] name so session
  * harnesses (Bench's hygiene pass) can sweep stragglers by name
  * without touching unrelated cached data.
  */
object Components {

  /** Block-manager name given to every checkpoint RDD this object
    * creates — the sweep key for [[release]]/Bench hygiene.
    */
  val rddNamePrefix = "graft-cc"

  // localCheckpoint + tag the RDD so it is identifiable in
  // sc.getPersistentRDDs. Always LAZY: the per-round convergence
  // aggregate is the frame's first action, so one job both
  // materializes the checkpoint blocks and reads the scalar —
  // an eager checkpoint would schedule a second, redundant pass over
  // the round's plan just to persist it. (persist() registers the
  // RDD in the block manager at call time, so hygiene accounting sees
  // lazy and eager checkpoints identically.)
  private def cp(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(false)
    out.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.setName(rddNamePrefix)
      case _ => ()
    }
    out
  }

  /** Order-independent set fingerprint: (row count, XOR of per-row
    * 64-bit hashes). Equal sets always produce equal fingerprints, so
    * an UNEQUAL fingerprint is definitive proof the round changed
    * something — the common case, decided by a global aggregate whose
    * shuffle carries one partial row per partition instead of the
    * full edge/label set the exact symmetric difference re-shuffles.
    * Equal fingerprints are only ever trusted after the caller
    * re-checks exactly (a 2^-64 collision must not end the loop
    * early), so convergence detection stays EXACT: the expensive diff
    * runs once at the fixed point, not every round.
    */
  private def fingerprint(df: DataFrame, c1: String, c2: String): (Long, Long) = {
    val r = df.select(xxhash64(col(c1), col(c2)).as("h"))
      .agg(count(lit(1)).as("c"), expr("bit_xor(h)").as("x"))
      .head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Free the checkpoint blocks a frame returned by [[connected]] /
    * [[connectedStar]] still holds. Call AFTER the result has been
    * consumed — the checkpointed lineage is truncated, so the frame
    * cannot be recomputed afterwards.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD if lr.rdd.name == rddNamePrefix =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** (node, comp) for every node appearing in `pairs`(a, b); `comp`
    * is the component's minimum node id — deterministic in any engine.
    *
    * INPUT CONTRACT (r19 advisor note): both endpoint columns must
    * already share one type — the explode-based symmetrization below
    * builds `array(struct(a, b), struct(b, a))`, which requires a
    * common struct type and fails ANALYSIS on mixed-typed endpoints
    * (the pre-r19 unionByName would have widened each column
    * independently). Every current caller passes same-typed ids;
    * a mixed-typed caller should cast explicitly at the call site,
    * where the intended width is known.
    */
  def connected(pairs: DataFrame, a: String = "doc_a",
      b: String = "doc_b", maxRounds: Int = 50): DataFrame = {
    // materialize the edge list ONCE — every round joins against it,
    // and without this each round would re-execute the pair-generation
    // lineage (the whole LSH candidate pipeline when fed from q30).
    // Symmetrize with ONE explode instead of a self-union: a union of
    // two projections of `pairs` evaluates the pair-generation subtree
    // TWICE (Spark only dedups Exchange nodes, not arbitrary
    // subtrees), and the feeding pipeline is the expensive part —
    // candidate generation over the whole corpus (guide §2.4: remove
    // duplicated work before removing shuffles)
    val edges = cp(pairs
      .select(explode(array(
        struct(col(a).as("src"), col(b).as("dst")),
        struct(col(b).as("src"), col(a).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct())
    var labels = cp(edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("comp")))
    var fp = fingerprint(labels, "node", "comp")
    var changed = 1L
    var round = 0
    while (changed > 0) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"Components.connected: no convergence after $maxRounds " +
            "rounds — component diameter exceeds the propagation " +
            "budget; use connectedStar for this graph")
      val prop = edges.join(labels, col("src") === col("node"))
        .select(col("dst").as("node"), col("comp"))
      // pointer jumping: node -> comp -> comp's current label
      val jump = labels
        .join(labels.select(col("node").as("comp"),
          col("comp").as("comp2")), Seq("comp"))
        .select(col("node"), col("comp2").as("comp"))
      val next = cp(labels.unionByName(prop).unionByName(jump)
        .groupBy("node").agg(min("comp").as("comp")))
      // labels only ever shrink their comp, so the label SET is
      // unchanged iff no label changed: an unequal fingerprint is
      // proof of progress (and the job that computes it is also what
      // materializes the lazy checkpoint); an equal one is confirmed
      // with the exact per-node comparison before ending the loop
      val nfp = fingerprint(next, "node", "comp")
      changed =
        if (nfp != fp) 1L
        else next
          .join(labels.select(col("node"), col("comp").as("prev")),
            Seq("node"))
          .filter(col("comp") < col("prev"))
          .count()
      // `next` is materialized and the convergence check has read
      // `labels` — the superseded round's blocks are dead from here
      release(labels)
      labels = next
      fp = nfp
      round += 1
    }
    // the returned plan is the final checkpoint alone — the edge
    // list's blocks are no longer reachable from it
    release(edges)
    labels
  }

  /** Star-contraction connected components — the high-diameter
    * fallback [[connected]]'s round cap points at: alternating
    * large-star / small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond"). Where label propagation
    * touches every EDGE every round for O(log d) rounds, contraction
    * rewires the edge list itself toward each neighborhood's minimum,
    * so long chains (crawl snapshots of one evolving page — exactly
    * the near-dup input that produces a deep component) collapse
    * geometrically and the edge list SHRINKS as it converges.
    *
    * One round =
    *  - large-star: for every center u over the symmetric edge list,
    *    connect each neighbor v > u to m = min(N(u) ∪ u);
    *  - small-star: orient edges toward the smaller endpoint; for
    *    every center u connect u and its (all smaller) neighbors to
    *    their minimum.
    * Both steps preserve connectivity and never move an edge's
    * endpoints out of its component; the fixed point is a forest of
    * stars whose centers are the component minima. Convergence is the
    * edge set reaching that fixed point — checked per round by set
    * fingerprint (exact symmetric difference only to confirm the
    * fixed point, see [[fingerprint]]); lineage is cut per round with
    * localCheckpoint, same as [[connected]].
    *
    * Output contract matches [[connected]]: (node, comp) for every
    * node appearing in `pairs`, comp = the component's minimum id.
    */
  def connectedStar(pairs: DataFrame, a: String = "doc_a",
      b: String = "doc_b", maxRounds: Int = 100): DataFrame = {
    // ONE evaluation of the (possibly expensive) pair-generation
    // subtree: explode each pair into its two endpoints (same
    // guide-§2.4 rationale as [[connected]]'s edge build)
    val nodes = cp(pairs
      .select(explode(array(col(a), col(b))).as("node")).distinct())
    // canonical (larger, smaller) orientation; self-loops carry no
    // connectivity (their nodes are preserved via `nodes`)
    var edges = cp(pairs
      .select(greatest(col(a), col(b)).as("u"), least(col(a), col(b)).as("v"))
      .filter(col("u") =!= col("v")).distinct())
    var fp = fingerprint(edges, "u", "v")
    var changed = 1L
    var round = 0
    while (changed > 0) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"Components.connectedStar: no convergence after $maxRounds " +
            "rounds")
      // large-star: m(u) = min over the closed neighborhood of u;
      // every neighbor v > u re-attaches to m(u). Emitted edges keep
      // the canonical orientation (v > u >= m(u)).
      val sym = edges.unionByName(
        edges.select(col("v").as("u"), col("u").as("v")))
      // no distinct here: duplicate (v, m) edges across centers are
      // harmless to the min-aggregation below and get deduplicated by
      // next's distinct — skipping the mid-round dedup saves a full
      // shuffle per round
      val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val ls = sym.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // small-star: neighbors of u are now all < u; u and each
      // non-minimum neighbor re-attach to the minimum neighbor.
      val mins2 = ls.groupBy("u").agg(min(col("v")).as("m"))
      val next = cp(ls.join(mins2, Seq("u"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(mins2.select(col("u"), col("m").as("v")))
        .distinct())
      // converged when the edge set is a fixed point (a star forest).
      // The fingerprint job doubles as the lazy checkpoint's
      // materialization; the full symmetric-difference shuffle runs
      // only to confirm an equal fingerprint (normally: once, at the
      // fixed point) instead of every round
      val nfp = fingerprint(next, "u", "v")
      changed =
        if (nfp != fp) 1L
        else next.unionByName(edges)
          .groupBy("u", "v").agg(count(lit(1)).as("c"))
          .filter(col("c") === 1).count()
      // the convergence check has read the old edge set; free it
      release(edges)
      edges = next
      fp = nfp
      round += 1
    }
    // stars: u → component minimum; centers and isolated nodes are
    // their own component
    nodes
      .join(edges.select(col("u").as("node"), col("v").as("comp")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("comp"), col("node")).as("comp"))
  }
}
