package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector-similarity primitives over `array<float>` embedding columns.
  * All higher-order Catalyst expressions (zip_with/transform/aggregate)
  * — no UDFs, no serialization wall. Arithmetic is promoted to double
  * element-wise and folded left-to-right, which is deterministic and
  * engine-reproducible (the DuckDB oracles fold the same way).
  *
  * Scale path: brute-force top-k is a broadcast of the (small) query
  * set against a full scan of the corpus — linear, embarrassingly
  * parallel, no shuffle until the per-query top-k window. The LSH
  * variant buckets the corpus by random-hyperplane signature first, so
  * each query only scans its bucket (corpus/2^planes expected).
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision, left-to-right — fused custom
    * Expression (codegen'd; the HOF zip_with+aggregate equivalent is
    * CodegenFallback and pays per-element closure dispatch on the ANN
    * hot loop).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProductF(a, b)

  /** ‖a‖₂ in double precision. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (double). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane component for (seed, dim):
    * first md5 hex digit of "seed:dim", centered: value − 7.5 ∈
    * [−7.5, 7.5]. Public-knowledge construction (hash-based projection,
    * Charikar-style SimHash for vectors).
    */
  def planeComponent(seed: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$seed:$dim".getBytes("UTF-8"))
    val hex = "%02x".format(h(0)).charAt(0)
    Integer.parseInt(hex.toString, 16) - 7.5
  }

  /** Literal array column of one hyperplane (dims 1..dim) as
    * array<float> (the components are k+0.5 values — exact in float),
    * matching DotProductF's input type.
    */
  def plane(seed: Int, dim: Int): Column =
    array((1 to dim).map(i => lit(planeComponent(seed, i).toFloat)): _*)

  /** Random-hyperplane LSH bucket id: bit s = (emb · plane_s) > 0,
    * bucket = Σ bitₛ·2ˢ — 2^nPlanes buckets.
    */
  def lshBucket(emb: Column, nPlanes: Int, dim: Int): Column =
    (0 until nPlanes).map { s =>
      when(dot(emb, plane(s, dim)) > 0,
        lit(1L << s)).otherwise(lit(0L))
    }.reduce(_ + _).cast("long")

  /** Plane count sized to the corpus: enough hyperplanes that the
    * EXPECTED bucket holds ~`targetBucket` vectors (buckets ≈
    * n / 2^planes). At 100 TB this is the knob that keeps the pair
    * join linear: planesFor(1e10, 64) = 28 planes → 2.7e8 buckets.
    */
  def planesFor(corpusSize: Long, targetBucket: Int): Int =
    math.max(1, math.ceil(math.log(corpusSize.toDouble / targetBucket)
      / math.log(2.0)).toInt)

  /** IVF cell count sized to the corpus — the [[planesFor]] analog for
    * a coarse quantizer: K = ceil(n / targetCell) keeps the EXPECTED
    * cell at ~targetCell vectors, so an nProbe-cell probe scans
    * ~nProbe·targetCell candidates regardless of corpus size
    * (cellsFor(500, 64) = 8 for the test corpus; cellsFor(1e10, 4096)
    * ≈ 2.5M cells at 100 TB — a bounded candidate set, not a fraction
    * of the corpus).
    */
  def cellsFor(corpusSize: Long, targetCell: Int): Int =
    math.max(1, math.ceil(corpusSize.toDouble / targetCell).toInt)

  /** The K-row coarse-quantizer centroid table (`cid` 1..k, `ce`
    * array<float>) — the BROADCAST side of IVF assignment. Components
    * are md5-derived half-integers ([[planeComponent]], seed
    * `seedBase + cid - 1`): exact as float AND as SQL decimal text, so
    * both engines hold bit-identical centroids. A trained index would
    * load real k-means centroids into this same shape; everything
    * downstream is unchanged. As a TABLE (not K literal array columns)
    * the plan stays constant-size however large K grows.
    */
  def centroidTable(s: SparkSession, k: Int, dim: Int,
      seedBase: Int = 100): DataFrame = {
    val rows: Seq[(Long, Seq[Float])] = (0 until k).map(j =>
      ((j + 1).toLong,
        (1 to dim).map(i => planeComponent(seedBase + j, i).toFloat)))
    s.createDataFrame(rows).toDF("cid", "ce")
  }

  /** Max-inner-product cell assignment: cross the tiny centroid table
    * (broadcast — BroadcastNestedLoopJoin, no shuffle of the corpus),
    * then argmax per vector. `e` must carry (`vec_id`, `embedding`,
    * `nrm`); output replaces nothing and adds `cid`.
    *
    * Scale shape: the groupBy's PARTIAL aggregation collapses the K×
    * expansion map-side (all K copies of a vector sit in its input
    * partition), so the exchange carries exactly one row per corpus
    * vector — the one-time index-build shuffle, amortized over every
    * probe that follows. Dots are rounded to 6dp before the argmax and
    * ties take the LOWEST cid — both choices make the assignment
    * reproducible across engines (struct max = (d, -cid) lexicographic).
    */
  def ivfAssign(e: DataFrame, cent: DataFrame): DataFrame =
    // Plan note (audited round 8): this aggregation is a
    // SortAggregate, and that is the deliberate trade. The cause is
    // not max(struct) — any formulation that carries the embedding
    // payload through the aggregation buffer (first(array), max_by,
    // a packed-long argmax) is ineligible for HashAggregate, because
    // Tungsten's hash buffer holds only mutable fixed-width types.
    // The payload-free alternative (hash-aggregate (vec_id, pk)
    // longs, then join the winner back to `e`) does plan
    // HashAggregate but pays TWO extra n-row exchanges plus the SMJ
    // sorts of the join — strictly more shuffle, the scarce resource
    // at 100 TB. One exchange of exactly n payload rows with a local
    // linear-run sort on each side beats three exchanges.
    e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("cid"), round(dot(col("embedding"), col("ce")), 6).as("d"))
      .groupBy("vec_id")
      .agg(max(struct(col("d"), (-col("cid")).as("nc"))).as("m"),
        first(col("embedding")).as("embedding"),
        first(col("nrm")).as("nrm"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        (-col("m.nc")).as("cid"))

  /** Top-`nProbe` probe cells per query vector (rank by rounded dot
    * desc, cid asc — same tie policy as [[ivfAssign]]). The query set
    * is small by contract, so the per-query window is cheap; `nProbe`
    * is the recall/cost knob: candidates scanned ≈ nProbe·targetCell.
    */
  def ivfProbes(q: DataFrame, cent: DataFrame, nProbe: Int): DataFrame = {
    val w = Window.partitionBy("vec_id")
      .orderBy(col("d").desc, col("cid").asc)
    q.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("cid"), round(dot(col("embedding"), col("ce")), 6).as("d"))
      .withColumn("__p", row_number().over(w))
      .filter(col("__p") <= nProbe)
      .select("vec_id", "embedding", "nrm", "cid")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540) as a reusable operator: cluster with the coarse
    * quantizer `cent` (a (cid, ce) table — [[centroidTable]] or real
    * k-means output), find rounded-cosine pairs above `minSim` WITHIN
    * a (cell, LSH sub-bucket) key only, connect them into duplicate
    * groups, and per group keep the member with the LOWEST cosine to
    * its cell centroid (the paper's rule: prefer the outlier, drop
    * the redundant core). Returns the per-component decision table
    * (comp, cid, n_members, keep_id, keep_ccos) — the join key a
    * curation pass uses to drop `n_members − 1` rows per group.
    *
    * `e` must carry (`vec_id`, `embedding`). Production sizing: K =
    * [[cellsFor]](n, targetCell) cells and `nPlanes` =
    * [[planesFor]](targetCell, targetBucket) sub-planes keep the
    * expected (cid, bkt) population constant as the corpus grows, so
    * the 2..`maxBucket` cap (the q30/q39 skew guard — worst case
    * C(maxBucket, 2) pairs per key) stays a guard, not a recall
    * ceiling. The assignment+centroid-cosine frame is referenced
    * three times (cap sizing, both pair sides, member info), so it is
    * cached ONCE under `cacheKey` via [[graft.Materialized]] — the
    * key must include every input it depends on (corpus dir, cent
    * parameters).
    */
  /** [[semanticDedup]] with CORPUS-DERIVED quantizer sizing — the
    * production entry point. Counts the corpus and derives
    * K = [[cellsFor]](n, targetCell) cells and nPlanes =
    * [[planesFor]](targetCell, targetBucket) sub-planes, so the
    * expected (cid, bkt) population stays at ~targetBucket however
    * large n grows — the 2..maxBucket cap remains a skew GUARD, never
    * a recall ceiling that silently binds harder as the corpus
    * outgrows a statically pinned K. The derived sizes are folded
    * into the cache key: two corpora of different sizes must never
    * share a materialized assignment frame.
    *
    * Cost note (round-9 review): `e.count()` is one aggregate JOB
    * over the input lineage — for a derived frame that is a real
    * pass over the input, not a metadata lookup. A caller that
    * already knows its corpus size (every production pipeline tracks
    * it) should derive (K, planes) via [[sizedQuantizer]] and call
    * [[semanticDedup]] directly, paying no counting pass; this
    * convenience entry point is for when n is genuinely unknown.
    */
  def semanticDedupSized(e: DataFrame, targetCell: Int,
      targetBucket: Int, dim: Int, maxBucket: Int, minSim: Double,
      cacheKey: String): DataFrame = {
    val (k, nPlanes) = sizedQuantizer(e.count(), targetCell,
      targetBucket)
    semanticDedup(e, centroidTable(e.sparkSession, k, dim), nPlanes,
      dim, maxBucket, minSim, s"$cacheKey:k$k:p$nPlanes")
  }

  /** The (K, nPlanes) pair [[semanticDedupSized]] derives for a
    * corpus of `n` vectors — a pure function so specs can pin the
    * derivation at arbitrary corpus sizes without running the dedup.
    */
  def sizedQuantizer(n: Long, targetCell: Int, targetBucket: Int)
      : (Int, Int) =
    (cellsFor(n, targetCell), planesFor(targetCell.toLong, targetBucket))

  def semanticDedup(e: DataFrame, cent: DataFrame, nPlanes: Int,
      dim: Int, maxBucket: Int, minSim: Double, cacheKey: String)
      : DataFrame = {
    val s = e.sparkSession
    val cd0 = graft.Materialized(s, cacheKey) {
      ivfAssign(e.select(col("vec_id"), col("embedding"),
          norm(col("embedding")).as("nrm")), cent)
        .withColumn("bkt", lshBucket(col("embedding"), nPlanes, dim))
        .join(broadcast(cent), Seq("cid"))
        .withColumn("ccos", round(dot(col("embedding"), col("ce"))
          / (col("nrm") * norm(col("ce"))), 6))
        .drop("ce")
    }
    // materialize, then coalesce the cached layout to the AQE
    // advisory size: cd's build ends in ivfAssign's vec_id exchange,
    // so the cache keeps the session's full shuffle-partition count,
    // and the FOUR cd references below (cap sizing, both pair sides,
    // member info) each scheduled that many near-empty tasks per run
    // (guide §2.2; measured r20 — StageProbe showed three 32-task
    // ~1 s stages re-reading the 0.6 MB cache; no-op at cluster
    // scale where the artifact meets the advisory size)
    cd0.count()
    val cd = graft.ops.Par.packToAdvisory(cd0)
    val sized = cd.groupBy("cid", "bkt").agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, maxBucket)).select("cid", "bkt")
    val inb = cd.join(broadcast(sized), Seq("cid", "bkt"))
    val a = inb.select(col("cid"), col("bkt"), col("vec_id").as("id_a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = inb.select(col("cid"), col("bkt"), col("vec_id").as("id_b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val pairs = a.join(b, Seq("cid", "bkt"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(dot(col("ea"), col("eb"))
        / (col("na") * col("nb")), 6) > minSim)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val cc = graft.ops.Components.connected(pairs)
    val ranked = cc.join(cd, cc("node") === cd("vec_id"))
      .withColumn("rk", row_number().over(Window.partitionBy("comp")
        .orderBy(col("ccos").asc, col("vec_id").asc)))
    ranked.groupBy("comp")
      .agg(min("cid").as("cid"),
        count(lit(1)).as("n_members"),
        min(when(col("rk") === 1, col("vec_id"))).as("keep_id"),
        min(when(col("rk") === 1, col("ccos"))).as("keep_ccos"))
  }

  /** Semantic-decontamination scoring ROUTED through shared IVF cells
    * — the beyond-broadcast path the q129 scaladoc promises, as code.
    *
    * q129's production contract is a FIXED eval suite that broadcasts;
    * when the benchmark set outgrows broadcast, this route partitions
    * the bench set by its [[ivfAssign]] cell and meets it with the
    * corpus through a CELL-KEYED SHUFFLE-HASH JOIN, so an executor
    * ever holds only ONE CELL's bench slice (~targetCell vectors, by
    * [[cellsFor]] sizing) instead of the whole set. The corpus side
    * emits its top-`nProbe` probe cells per vector with the
    * [[ivfAssign]] device (broadcast centroids, ONE corpus-grain
    * exchange whose partial collect collapses the K× expansion
    * map-side, then an in-row sort+slice — no per-vector window over
    * the corpus), and every (corpus, probed-cell bench) pair is
    * scored exactly once.
    *
    * `nProbe` is the recall/cost knob: nProbe = K scores every
    * (corpus, bench) pair exactly once — per-vector maxima IDENTICAL
    * to the broadcast cross-join, which is what the q158 gate pins —
    * while production sets nProbe ≪ K and accepts probe-miss recall
    * for a corpus-side expansion of nProbe× instead of K×.
    *
    * Inputs: `corp` carries (vec_id, label, embedding, nrm); `bench`
    * carries (bid, be, bn). Output is per-vector (vec_id, label,
    * maxsim) with maxsim NULL for vectors none of whose probed cells
    * held a bench vector (impossible at nProbe = K with a nonempty
    * bench set).
    */
  def semanticDecontamRouted(corp: DataFrame, bench: DataFrame,
      cent: DataFrame, nProbe: Int): DataFrame = {
    val ba = ivfAssign(bench.select(col("bid").as("vec_id"),
        col("be").as("embedding"), col("bn").as("nrm")), cent)
      .select(col("embedding").as("be"), col("nrm").as("bn"),
        col("cid").as("pcid"))
    val probes = corp.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("label"), col("embedding"),
        col("nrm"), col("cid"),
        round(dot(col("embedding"), col("ce")), 6).as("d"))
      .groupBy("vec_id")
      .agg(first(col("label")).as("label"),
        first(col("embedding")).as("embedding"),
        first(col("nrm")).as("nrm"),
        slice(sort_array(collect_list(struct(col("d"),
          (-col("cid")).as("nc"))), asc = false), 1, nProbe).as("top"))
      .select(col("vec_id"), col("label"), col("embedding"),
        col("nrm"), explode(col("top")).as("t"))
      .select(col("vec_id"), col("label"), col("embedding"),
        col("nrm"), (-col("t.nc")).as("pcid"))
    val mx = probes.join(ba.hint("shuffle_hash"), Seq("pcid"))
      .select(col("vec_id"), col("label"),
        round(dot(col("embedding"), col("be"))
          / (col("nrm") * col("bn")), 6).as("sim"))
      .groupBy("vec_id", "label")
      .agg(max("sim").as("maxsim"))
    corp.select("vec_id", "label")
      .join(mx, Seq("vec_id", "label"), "left")
  }

  /** FULL LLOYD TRAINING LOOP over integer-micro embeddings — the
    * iterate-to-convergence form of the single [[ivfAssign]]-shaped
    * step q133 exposes (Lloyd 1982; the FAISS coarse-quantizer train
    * recipe). `em` must carry (`vec_id`, `em` array<bigint>), each
    * component the ×10⁶ integer quantization of the float embedding
    * (exact — float32 has ≤24 significand bits, so x·10⁶ is exact in
    * double and `round` sees no engine-variant last bit). From there
    * EVERY operation in the loop is int64 arithmetic, bit-identical in
    * any engine:
    *
    *  - init: Forgy on the k lowest `vec_id`s (deterministic — no RNG);
    *  - assign: argmin ‖x−c‖² via the fused integer dot
    *    ([[graft.functions.DotLongF]]): cost = ‖c‖² − 2·x·c (the ‖x‖²
    *    term is constant per vector and drops out of the argmin); ties
    *    take the LOWEST cid;
    *  - re-center: mean per (cid, dim) rounded HALF-AWAY-FROM-ZERO in
    *    pure integer arithmetic — (2s ± n) div 2n with a truncating
    *    division, which Spark's `div` and DuckDB's `//` both are;
    *  - empty cells carry their centroid forward (n_vecs = 0), the
    *    FAISS re-seed signal surfaced rather than papered over.
    *
    * Per iteration the cluster pays ONE corpus-grain exchange (the
    * argmin aggregation — same SortAggregate trade as [[ivfAssign]],
    * documented there) and one (cid, dim)-grain exchange whose
    * posexplode fan-out partial-aggregates map-side, so k·D rows per
    * partition cross the wire, never n·D. The k·D per-iteration stats
    * pull to the driver is BOUNDED (512 longs here): the centroid
    * table IS the artifact an index build persists — materializing it
    * on the driver each round is the production contract, exactly the
    * [[graft.queries.Extras.bpeTrain]] argument. At 100 TB the FAISS
    * recipe trains on a fixed-size SAMPLE (`em.limit`/hash-sample
    * upstream of this loop), so iteration cost is bounded by the
    * sample, not the corpus; the loop itself is unchanged.
    *
    * Returns the (cid, dim)-grain artifact: final centroid components
    * (`cmicro`), final-assignment cell sizes (`n_vecs`), and the last
    * update's movement (`delta_micro` = final − previous) — the
    * convergence signal a training loop thresholds on.
    */
  def kmeansTrainMicro(s: SparkSession, em: DataFrame, k: Int,
      dim: Int, iters: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    require(iters >= 1, s"iters must be positive: $iters")
    def roundDiv(sum: Long, n: Long): Long =
      (2 * sum + (if (sum < 0) -n else n)) / (2 * n)
    val init = em.filter(col("vec_id") < k)
      .select(col("vec_id"), col("em")).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Long](1).toArray)
    require(init.length == k, s"Forgy init needs vec_id 0..${k - 1}")
    var cent: Array[Array[Long]] = init
    var prev: Array[Array[Long]] = init
    var nVecs: Array[Long] = Array.fill(k)(0L)
    for (_ <- 1 to iters) {
      val centRows = cent.toIndexedSeq.zipWithIndex.map { case (cm, j) =>
        ((j + 1).toLong, cm.toSeq, cm.map(x => x * x).sum)
      }
      val cdf = s.createDataFrame(centRows).toDF("cid", "cm", "cy2")
      val cost = col("cy2") - lit(2L) *
        graft.functions.DotLongF(col("em"), col("cm"))
      val win = em.crossJoin(broadcast(cdf))
        .select(col("vec_id"), col("em"), col("cid"), cost.as("cost"))
        .groupBy("vec_id")
        .agg(min(struct(col("cost"), col("cid"), col("em"))).as("m"))
        .select(col("m.cid").as("cid"), col("m.em").as("em"))
      val stats = win.select(col("cid"), posexplode(col("em")))
        .groupBy(col("cid"), (col("pos") + 1).cast("long").as("dim"))
        .agg(count(lit(1)).as("n"), sum("col").as("s"))
        .collect()
      prev = cent.map(_.clone())
      val next = cent.map(_.clone())
      val counts = Array.fill(k)(0L)
      stats.foreach { r =>
        val (cid, d) = (r.getLong(0).toInt, r.getLong(1).toInt)
        val (n, sm) = (r.getLong(2), r.getLong(3))
        next(cid - 1)(d - 1) = roundDiv(sm, n)
        counts(cid - 1) = n
      }
      cent = next
      nVecs = counts
    }
    val out = for {
      j <- 0 until k
      d <- 0 until dim
    } yield ((j + 1).toLong, (d + 1).toLong, nVecs(j), cent(j)(d),
      cent(j)(d) - prev(j)(d))
    s.createDataFrame(out)
      .toDF("cid", "dim", "n_vecs", "cmicro", "delta_micro")
  }

  /** Embedding-cosine near-duplicate pairs, bucketed AND capped.
    *
    * `e` must carry (`vec_id`, `embedding`). Pairs are generated only
    * within an LSH bucket, and only for buckets of size 2..`maxBucket`
    * — the same semantic skew-guard as the MinHash-LSH band cap
    * (TextQueries q30): a hot bucket can never produce more than
    * C(maxBucket, 2) pairs, so worst-case output is
    * (n/2^planes-capped) × C(maxBucket,2) — linear in the corpus, never
    * quadratic, and the shuffle key space is 2^nPlanes (size the planes
    * with [[planesFor]]). The bucket-size table is ≤ 2^nPlanes rows and
    * is broadcast, so the cap costs no extra shuffle of the corpus.
    */
  def nearDupPairs(e: DataFrame, nPlanes: Int, dim: Int,
      maxBucket: Int, minSim: Double): DataFrame = {
    val scored = e.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"),
      lshBucket(col("embedding"), nPlanes, dim).as("bkt"))
    val sized = scored.groupBy("bkt").agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, maxBucket)).select("bkt")
    val inCap = scored.join(broadcast(sized), Seq("bkt"))
    val a = inCap.select(col("bkt"), col("vec_id").as("id_a"),
      col("embedding").as("qe"), col("nrm").as("qn"))
    val b = inCap.select(col("bkt"), col("vec_id").as("id_b"),
      col("embedding").as("ne"), col("nrm").as("cn"))
    a.join(b, Seq("bkt"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("bkt"),
        round(dot(col("qe"), col("ne"))
          / (col("qn") * col("cn")), 6).as("sim"))
      .filter(col("sim") > minSim)
  }
}
