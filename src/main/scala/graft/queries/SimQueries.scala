package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.sim.Similarity
import graft.sources.Tables

/** Similarity search over `embeddings` (array<float>, 64-dim):
  * brute-force cosine top-k as the exact baseline, random-hyperplane
  * LSH bucketing as the scale path (each query scans only its bucket).
  */
object SimQueries {

  private val D = 64
  private val dotSql =
    "list_sum(list_transform(range(1,65), i -> " +
      "q.embedding[CAST(i AS INT)]::DOUBLE * " +
      "c.embedding[CAST(i AS INT)]::DOUBLE))"
  private val normSql =
    "sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))"

  private def bucketSql(nPlanes: Int): String =
    "CAST(" + (0 until nPlanes).map { s =>
      s"(CASE WHEN list_sum(list_transform(range(1,65), i -> " +
        s"embedding[CAST(i AS INT)]::DOUBLE * " +
        s"(strpos('0123456789abcdef', substr(md5('$s:'||i),1,1)) - 1 - 7.5)" +
        s")) > 0 THEN ${1L << s} ELSE 0 END)"
    }.mkString(" + ") + " AS BIGINT)"

  /** Brute-force cosine top-5 per query vector (vec_id < 8 are the
    * queries; the rest the corpus). Exact ANN baseline: broadcast the
    * query set, linear scan, per-query top-k window.
    */
  val q37 = Q("q37_cosine_topk",
    s"""WITH e AS (
       |  SELECT vec_id, embedding, $normSql AS nrm FROM embeddings),
       |q AS (SELECT * FROM e WHERE vec_id < 8),
       |c AS (SELECT * FROM e WHERE vec_id >= 8),
       |sims AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid,
       |    round($dotSql / (q.nrm * c.nrm), 6) AS sim
       |  FROM q, c)
       |SELECT qid, nid, sim, CAST(rn AS BIGINT) AS rn FROM (
       |  SELECT qid, nid, sim,
       |    row_number() OVER (PARTITION BY qid
       |                       ORDER BY sim DESC, nid) AS rn
       |  FROM sims)
       |WHERE rn <= 5""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val c = e.filter(col("vec_id") >= 8)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"),
        col("nrm").as("cn"))
    val sims = broadcast(q).crossJoin(c)
      .select(col("qid"), col("nid"),
        round(Similarity.dot(col("qe"), col("ne"))
          / (col("qn") * col("cn")), 6).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc,
      col("nid").asc)
    sims.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
  }

  /** LSH-bucketed ANN: `AnnPlanes` random hyperplanes → 2^planes
    * buckets; each query joins only its bucket, then exact cosine
    * re-rank (top-3). The 100 TB shape: bucket assignment is a
    * map-only pass; the join key is the bucket id; the plane count is
    * sized to the corpus with Similarity.planesFor so expected bucket
    * size stays ~constant as the corpus grows.
    */
  private val AnnPlanes = Similarity.planesFor(500L, 32)

  val q38 = Q("q38_ann_lsh",
    s"""WITH e AS (
       |  SELECT vec_id, embedding, $normSql AS nrm,
       |    ${bucketSql(AnnPlanes)} AS bkt
       |  FROM embeddings),
       |q AS (SELECT * FROM e WHERE vec_id < 8),
       |c AS (SELECT * FROM e WHERE vec_id >= 8),
       |sims AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid, q.bkt,
       |    round($dotSql / (q.nrm * c.nrm), 6) AS sim
       |  FROM q JOIN c ON c.bkt = q.bkt)
       |SELECT qid, nid, bkt, sim, CAST(rn AS BIGINT) AS rn FROM (
       |  SELECT qid, nid, bkt, sim,
       |    row_number() OVER (PARTITION BY qid
       |                       ORDER BY sim DESC, nid) AS rn
       |  FROM sims)
       |WHERE rn <= 3""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"),
        Similarity.lshBucket(col("embedding"), AnnPlanes, D).as("bkt"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("bkt"))
    val c = e.filter(col("vec_id") >= 8)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"),
        col("nrm").as("cn"), col("bkt"))
    val sims = broadcast(q).join(c, Seq("bkt"))
      .select(col("qid"), col("nid"), col("bkt"),
        round(Similarity.dot(col("qe"), col("ne"))
          / (col("qn") * col("cn")), 6).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc,
      col("nid").asc)
    sims.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
  }

  /** Embedding-cosine near-duplicate pairs among the corpus itself:
    * same-bucket pairs with rounded cosine above threshold — the
    * embedding-space analog of MinHash dedup. Buckets are CAPPED at
    * `NearDupMaxBucket` before the pair join (mirror of q30's band
    * cap), so a hot bucket can never go quadratic; `NearDupPlanes` is
    * the corpus-sized plane count (Similarity.planesFor(500, 32) = 4
    * for the test corpus; at 1e10 vectors the same formula gives 28).
    */
  private val NearDupPlanes = Similarity.planesFor(500L, 32)
  private val NearDupMaxBucket = 40

  val q39 = Q("q39_embedding_neardup",
    s"""WITH e AS (
       |  SELECT vec_id, embedding, $normSql AS nrm,
       |    ${bucketSql(NearDupPlanes)} AS bkt
       |  FROM embeddings),
       |ok AS (
       |  SELECT bkt FROM e GROUP BY bkt
       |  HAVING count(*) BETWEEN 2 AND $NearDupMaxBucket),
       |sims AS (
       |  SELECT q.vec_id AS id_a, c.vec_id AS id_b, q.bkt,
       |    round($dotSql / (q.nrm * c.nrm), 6) AS sim
       |  FROM e q
       |  JOIN ok ON ok.bkt = q.bkt
       |  JOIN e c ON c.bkt = q.bkt AND q.vec_id < c.vec_id)
       |SELECT id_a, id_b, bkt, sim FROM sims
       |WHERE sim > 0.2""".stripMargin) { (s, dir) =>
    Similarity.nearDupPairs(
      Tables(s, dir, "embeddings").select("vec_id", "embedding"),
      NearDupPlanes, D, NearDupMaxBucket, 0.2)
  }

  /** IVF-style ANN — the coarse-quantizer alternative to q38's LSH.
    * The index is sized to the corpus: K = Similarity.cellsFor(n,
    * IvfTargetCell) cells (the planesFor analog — expected cell stays
    * ~IvfTargetCell vectors as n grows, so an NProbe-cell probe scans
    * a BOUNDED candidate set, not a fraction of the corpus; the test
    * corpus of 500 lands on K=8). Centroids live in a K-row BROADCAST
    * table (Similarity.centroidTable) joined for the argmax assignment
    * — the plan stays constant-size however large K grows, unlike K
    * literal array columns. Assignment shuffles exactly one row per
    * corpus vector (partial agg collapses the K× expansion map-side);
    * each query probes its top-NProbe cells and exact-reranks only
    * those cells' members. Dots rounded to 6dp + lowest-cid ties keep
    * the argmax cross-engine stable (same policy as q37's sims).
    */
  private val IvfTargetCell = 64
  private val K = Similarity.cellsFor(500L, IvfTargetCell)
  private val NProbe = 2
  private def centroidSql(k: Int): String =
    (1 to D).map(i => f"${Similarity.planeComponent(100 + k, i)}%.1f")
      .mkString("[", ", ", "]")
  private def centroidValuesSql: String =
    (0 until K).map(k => s"(${k + 1}, ${centroidSql(k)})")
      .mkString(", ")

  val q48 = Q("q48_ann_ivf",
    s"""WITH cent AS (
       |  SELECT CAST(cid AS BIGINT) AS cid, ce
       |  FROM (VALUES $centroidValuesSql) t(cid, ce)),
       |e AS (
       |  SELECT vec_id, embedding, $normSql AS nrm FROM embeddings),
       |sc AS (
       |  SELECT e.vec_id, e.embedding, e.nrm, c.cid,
       |    round(list_sum(list_transform(range(1,65), i ->
       |      e.embedding[CAST(i AS INT)]::DOUBLE *
       |      c.ce[CAST(i AS INT)]::DOUBLE)), 6) AS d,
       |    row_number() OVER (PARTITION BY e.vec_id
       |                       ORDER BY round(list_sum(list_transform(
       |                         range(1,65), i ->
       |                         e.embedding[CAST(i AS INT)]::DOUBLE *
       |                         c.ce[CAST(i AS INT)]::DOUBLE)), 6) DESC,
       |                       c.cid) AS rnp
       |  FROM e CROSS JOIN cent c),
       |c AS (
       |  SELECT vec_id, embedding, nrm, cid
       |  FROM sc WHERE rnp = 1 AND vec_id >= 8),
       |qq AS (
       |  SELECT vec_id, embedding, nrm, cid
       |  FROM sc WHERE rnp <= $NProbe AND vec_id < 8),
       |sims AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid, q.cid,
       |    round($dotSql / (q.nrm * c.nrm), 6) AS sim
       |  FROM qq q JOIN c ON c.cid = q.cid)
       |SELECT qid, nid, cid, sim, CAST(rn AS BIGINT) AS rn FROM (
       |  SELECT qid, nid, cid, sim,
       |    row_number() OVER (PARTITION BY qid
       |                       ORDER BY sim DESC, nid) AS rn
       |  FROM sims)
       |WHERE rn <= 3""".stripMargin) { (s, dir) =>
    val cent = Similarity.centroidTable(s, K, D)
    val e = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
    val corp = Similarity.ivfAssign(e.filter(col("vec_id") >= 8), cent)
      .select(col("cid"), col("vec_id").as("nid"),
        col("embedding").as("ne"), col("nrm").as("cn"))
    val probes = Similarity.ivfProbes(e.filter(col("vec_id") < 8),
        cent, NProbe)
      .select(col("cid"), col("vec_id").as("qid"),
        col("embedding").as("qe"), col("nrm").as("qn"))
    val sims = broadcast(probes).join(corp, Seq("cid"))
      .select(col("qid"), col("nid"), col("cid"),
        round(Similarity.dot(col("qe"), col("ne"))
          / (col("qn") * col("cn")), 6).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc,
      col("nid").asc)
    sims.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
  }

  /** ANN recall@3 — the evaluation harness an ANN index ships with:
    * for each query, what fraction of the EXACT top-3 (q37's
    * brute-force ranking) does the LSH index (q38's bucketed ranking)
    * recover? Both rankings reuse the shared rounding + tie policy, so
    * the measurement is reproducible in both engines. Recall drives
    * the planes/nProbe tuning loop: the knob is cheap to turn because
    * this query is cheap to run (exact side is one broadcast scan at
    * any corpus size, per-query). NOTE the test corpus is RANDOM
    * embeddings — near-orthogonal vectors with no cluster structure,
    * the worst case for any sublinear index — so measured recall is
    * intentionally low (~0.1-0.3 here); on real embedding manifolds
    * the same harness is what justifies raising planes or switching
    * to the IVF path (q48).
    */
  val q55 = Q("q55_ann_recall",
    s"""WITH e AS (
       |  SELECT vec_id, embedding, $normSql AS nrm,
       |    ${bucketSql(AnnPlanes)} AS bkt
       |  FROM embeddings),
       |q AS (SELECT * FROM e WHERE vec_id < 8),
       |c AS (SELECT * FROM e WHERE vec_id >= 8),
       |ex AS (
       |  SELECT qid, nid FROM (
       |    SELECT q.vec_id AS qid, c.vec_id AS nid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY round($dotSql / (q.nrm * c.nrm), 6) DESC,
       |                 c.vec_id) AS rn
       |    FROM q, c)
       |  WHERE rn <= 3),
       |ls AS (
       |  SELECT qid, nid FROM (
       |    SELECT q.vec_id AS qid, c.vec_id AS nid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY round($dotSql / (q.nrm * c.nrm), 6) DESC,
       |                 c.vec_id) AS rn
       |    FROM q JOIN c ON c.bkt = q.bkt)
       |  WHERE rn <= 3)
       |SELECT ex.qid,
       |  round(CAST(count(ls.nid) AS DOUBLE) / 3.0, 6) AS recall3
       |FROM ex LEFT JOIN ls ON ls.qid = ex.qid AND ls.nid = ex.nid
       |GROUP BY ex.qid""".stripMargin) { (s, dir) =>
    val exact3 = q37.fn(s, dir).filter(col("rn") <= 3)
      .select(col("qid"), col("nid"))
    val lsh3 = q38.fn(s, dir)
      .select(col("qid"), col("nid"), lit(1L).as("__hit"))
    exact3.join(lsh3, Seq("qid", "nid"), "left")
      .groupBy("qid")
      .agg(round(sum(coalesce(col("__hit"), lit(0L))) / 3.0, 6)
        .as("recall3"))
  }

  /** int8 scalar quantization — the storage op a 100 TB embedding
    * store runs before anything else (4× smaller than float32, and the
    * ANN probes above re-rank against dequantized codes): per-vector
    * max-abs scale, code = floor(x/scale·127 + 0.5) — floor-based
    * round-half-up is the formulation BOTH engines compute identically
    * (a bare round() on a double that lands exactly on .5 — which
    * x = scale/2 produces — is where engines may split ties
    * differently). Output proves the contract: codes within [-127,127]
    * (code_min/max), an exact integer checksum (code_sum), and the
    * max reconstruction error (≤ scale/254 + float noise). Map-only
    * at any corpus size; `scale` is guarded at 1e-6 so an all-zero
    * vector quantizes to zeros instead of NaN codes.
    */
  val q60 = Q("q60_quantize_int8",
    """WITH m AS (
      |  SELECT vec_id, embedding,
      |    greatest(list_max(list_transform(embedding,
      |      x -> abs(x::DOUBLE))), 0.000001) AS mx
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id, embedding, mx,
      |    list_transform(embedding, x ->
      |      CAST(floor(x::DOUBLE / mx * 127.0 + 0.5) AS BIGINT)) AS codes
      |  FROM m)
      |SELECT vec_id, round(mx, 6) AS scale,
      |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
      |  CAST(list_min(codes) AS BIGINT) AS code_min,
      |  CAST(list_max(codes) AS BIGINT) AS code_max,
      |  round(list_max(list_transform(range(1, 65), i ->
      |    abs(codes[CAST(i AS INT)] * mx / 127.0
      |        - embedding[CAST(i AS INT)]::DOUBLE))), 6) AS max_err
      |FROM q""".stripMargin) { (s, dir) =>
    val mx = greatest(
      array_max(transform(col("embedding"), x => abs(x.cast("double")))),
      lit(0.000001))
    val codes = transform(col("embedding"),
      x => floor(x.cast("double") / col("mx") * 127.0 + 0.5).cast("long"))
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), mx.as("mx"))
      .select(col("vec_id"), col("embedding"), col("mx"),
        codes.as("codes"))
      .select(col("vec_id"), round(col("mx"), 6).as("scale"),
        aggregate(col("codes"), lit(0L), (a, c) => a + c).as("code_sum"),
        array_min(col("codes")).as("code_min"),
        array_max(col("codes")).as("code_max"),
        round(array_max(zip_with(col("codes"), col("embedding"),
          (c, x) => abs(c * col("mx") / lit(127.0)
            - x.cast("double")))), 6).as("max_err"))
  }

  val all: Seq[Q] = Seq(q37, q38, q39, q48, q55, q60)
}
