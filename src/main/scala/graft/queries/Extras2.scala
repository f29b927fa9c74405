package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Round-10 continuation: training-order and link-graph surface
  * extensions — the deterministic epoch shuffle every multi-epoch
  * training run needs (a bijective keyed permutation, not a
  * `rand()` sort) and link-based corpus quality weighting (the
  * PageRank-family centrality crawl pipelines rank hosts by).
  * Same determinism policy as [[Extras]]: integer arithmetic
  * wherever a float could diverge between engines.
  */
object Extras2 {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** One keyed Feistel permutation pass over the 32-bit doc-id
    * domain: 4 rounds on 16-bit halves, round function
    * `f(r) = (r·40503 + k_i) mod 2^16` with per-epoch subkeys
    * `k_i = (2654435761·epoch + 40503·i) mod 2^16` (Knuth/Fibonacci
    * multipliers — nothing up the sleeve). Bijective for ANY round
    * function by the Feistel construction, so distinctness of doc
    * ids is preserved without a single exchange — the property a
    * `rand()`-keyed shuffle cannot give you (collisions, and a
    * different order on every retry of a failed stage). All
    * operands stay far below 2^63; every op is +, ·, mod, xor —
    * identical in both engines.
    */
  private[graft] def feistel32(x: Column, epoch: Column): Column = {
    // split into 16-bit halves; shiftright ≡ div 65536 on the
    // documented non-negative <2^32 domain, mirrored by the oracle's
    // integer `//`
    var l: Column = shiftright(x.cast("long"), 16)
    var r: Column = x.cast("long") % 65536
    for (i <- 0 to 3) {
      val k = (lit(2654435761L) * epoch + lit(40503L) * i) % 65536
      val f = (r * 40503L + k) % 65536
      val nl = r
      val nr = l.bitwiseXOR(f)
      l = nl
      r = nr
    }
    l * 65536L + r
  }

  /** DETERMINISTIC EPOCH SHUFFLE — the multi-epoch training-order
    * primitive: each epoch's order/sharding is a KEYED BIJECTIVE
    * permutation of the doc-id domain ([[feistel32]]), so (a) no two
    * docs ever collide on a sort/shard key (a `rand()` key cannot
    * promise that), (b) the order is reproducible from (seed, epoch)
    * alone — a preempted job resumes with the identical schedule,
    * and (c) no state is stored: the permutation IS the function.
    * Output: per (epoch, shard = perm mod 8) the doc count, the sum
    * of permuted keys (pins every permuted value — a single wrong
    * bit anywhere breaks the hash), and the sum of doc lengths (the
    * per-shard token balance the shuffle exists to even out).
    *
    * Shape: map-only permutation arithmetic (codegen'd integer ops)
    * + a 3× epoch explode + one 24-group aggregate with map-side
    * partials — embarrassingly parallel, zero joins, zero windows,
    * no driver state at any scale. The 32-bit domain covers this
    * corpus at any sf; a >2^32-doc corpus widens the halves (the
    * construction is width-generic), it never changes the plan.
    */
  val q204 = Q("q204_epoch_shuffle",
    """WITH e AS (
      |  SELECT doc_id, n_chars, ep
      |  FROM documents, (SELECT unnest([1, 2, 3]) AS ep)),
      |r0 AS (
      |  SELECT doc_id, n_chars, ep,
      |    doc_id // 65536 AS l, doc_id % 65536 AS r FROM e),
      |r1 AS (
      |  SELECT doc_id, n_chars, ep, r AS l,
      |    xor(l, (r * 40503 + (2654435761 * ep + 40503 * 0) % 65536)
      |      % 65536) AS r FROM r0),
      |r2 AS (
      |  SELECT doc_id, n_chars, ep, r AS l,
      |    xor(l, (r * 40503 + (2654435761 * ep + 40503 * 1) % 65536)
      |      % 65536) AS r FROM r1),
      |r3 AS (
      |  SELECT doc_id, n_chars, ep, r AS l,
      |    xor(l, (r * 40503 + (2654435761 * ep + 40503 * 2) % 65536)
      |      % 65536) AS r FROM r2),
      |r4 AS (
      |  SELECT doc_id, n_chars, ep, r AS l,
      |    xor(l, (r * 40503 + (2654435761 * ep + 40503 * 3) % 65536)
      |      % 65536) AS r FROM r3),
      |y AS (SELECT doc_id, n_chars, ep, l * 65536 + r AS y FROM r4)
      |SELECT CAST(ep AS BIGINT) AS epoch,
      |  CAST(y % 8 AS BIGINT) AS shard,
      |  count(*) AS n_docs,
      |  CAST(sum(y) AS BIGINT) AS sum_key,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM y GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val withEpoch = docs.select(col("doc_id"), col("n_chars"),
      explode(array(lit(1L), lit(2L), lit(3L))).as("epoch"))
    val y = feistel32(col("doc_id"), col("epoch"))
    withEpoch
      .withColumn("y", y)
      .groupBy(col("epoch"), (col("y") % 8).as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("y")).as("sum_key"),
        sum(col("n_chars")).as("sum_chars"))
  }

  /** LINK-GRAPH CENTRALITY (PageRank, 4 synchronous rounds) — the
    * link-based quality weight crawl curation assigns to hosts
    * before content filters run (Common Crawl ranks its frontier
    * this way). The corpus carries no hyperlinks, so the graph is
    * synthesized by ARITHMETIC both engines share: every doc u links
    * to `(u+1) mod n` and `(2u+1) mod n` (a ring guaranteeing every
    * node an in-edge, plus a doubling chord making the in-degree
    * non-uniform, 1..3 — so ranks genuinely spread). Out-degree is
    * exactly 2 by construction, making the per-edge contribution an
    * EXACT integer `pr div 2`; one round is
    * `pr'(v) = 150000 + (850 · Σ_{u→v} (pr_u div 2)) div 1000` in
    * micro-units (the unnormalized per-node-teleport PageRank form;
    * damping 0.85), floor division in both engines — zero float
    * anywhere, so 4 rounds stay bit-identical.
    *
    * Shape per round: one edge-grain shuffle-hash join on the node
    * id + one node-grain aggregate with map-side partials — O(rounds)
    * exchanges, each linear in |E|; the rank frame never leaves the
    * cluster and nothing is broadcast (|V| = corpus size). In-degree
    * here is bounded (≤3) by construction; a real web graph's hub
    * skew would take the q29-family salting/AQE-skew defenses on the
    * join key. The gate aggregates to per-source rank mass, pinning
    * every node's 4-round rank through the sum.
    */
  val q205 = Q("q205_link_pagerank",
    """WITH n AS (SELECT count(*) AS c FROM documents),
      |e AS MATERIALIZED (
      |  SELECT doc_id AS u, (doc_id + 1) % (SELECT c FROM n) AS v
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, (2 * doc_id + 1) % (SELECT c FROM n)
      |  FROM documents),
      |p0 AS (SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS pr
      |       FROM documents),
      |p1 AS MATERIALIZED (
      |  SELECT v AS node,
      |    150000 + (850 * sum(pr // 2)) // 1000 AS pr
      |  FROM e JOIN p0 ON p0.node = e.u GROUP BY v),
      |p2 AS MATERIALIZED (
      |  SELECT v AS node,
      |    150000 + (850 * sum(pr // 2)) // 1000 AS pr
      |  FROM e JOIN p1 ON p1.node = e.u GROUP BY v),
      |p3 AS MATERIALIZED (
      |  SELECT v AS node,
      |    150000 + (850 * sum(pr // 2)) // 1000 AS pr
      |  FROM e JOIN p2 ON p2.node = e.u GROUP BY v),
      |p4 AS MATERIALIZED (
      |  SELECT v AS node,
      |    150000 + (850 * sum(pr // 2)) // 1000 AS pr
      |  FROM e JOIN p3 ON p3.node = e.u GROUP BY v)
      |SELECT d.source, count(*) AS n_docs,
      |  CAST(sum(p4.pr) AS BIGINT) AS sum_pr
      |FROM p4 JOIN documents d ON p4.node = d.doc_id
      |GROUP BY d.source""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val nRow = docs.agg(count(lit(1)).as("c"))
    // 1-row broadcast total — the documented small-side crossJoin
    val withN = docs.select(col("doc_id")).crossJoin(broadcast(nRow))
    // Materialized: the edge table appears once per unrolled round —
    // without this every round re-derives it from the scan (PlanAudit
    // showed 18 textual scans); a production run persists the edge
    // list once, and this is exactly that artifact
    val edges = graft.Materialized(s, s"pagerank_edges:$dir") {
      withN.select(col("doc_id").as("u"),
          ((col("doc_id") + 1) % col("c")).as("v"))
        .unionAll(withN.select(col("doc_id").as("u"),
          ((col("doc_id") * 2 + 1) % col("c")).as("v")))
    }
    var pr: DataFrame =
      docs.select(col("doc_id").as("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to 4) {
      // name-based join refs: after the first round `pr`'s lineage
      // contains `edges`, and DataFrame-indexed refs would go
      // ambiguous under relation dedup; u/v vs node/pr never collide
      pr = edges.join(pr, col("u") === col("node"))
        .groupBy(col("v").as("node"))
        .agg((lit(150000L) +
          expr("850 * sum(pr div 2) div 1000")).as("pr"))
        .select(col("node"), col("pr"))
    }
    pr.join(docs.select(col("doc_id"), col("source")),
        pr("node") === col("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("pr").as("sum_pr"))
  }

  /** POSITIONAL PHRASE PROBE — the retrieval step BM25 (q121) cannot
    * express: exact phrase match via a positional inverted index
    * (term → (doc, pos) postings; match = same doc, adjacent
    * positions — the Lucene/ES phrase-query plan). The query phrase
    * is corpus-derived for determinism: the globally most frequent
    * bigram (ties broken lexicographically), found by an in-row
    * bigram fold + one bigram-grain aggregate + TakeOrdered(1). The
    * probe then joins the 1-row phrase against the postings TWICE
    * (both broadcast hash joins — each is effectively a predicate on
    * the token scan) and verifies adjacency with one (doc, pos)
    * equi-join over the two filtered posting sets — never a
    * corpus-sized self-join: the join inputs are only the phrase
    * terms' postings. The oracle derives the same winner and counts
    * matches by an INDEPENDENT in-row position scan (list_filter
    * over each doc's own token list) — two different match plans,
    * one answer.
    *
    * At index scale the postings persist term-bucketed (the
    * SignatureStore argument applied to retrieval): a phrase probe
    * then reads exactly |phrase| buckets, and the adjacency join
    * stays proportional to the probed postings, not the corpus.
    */
  val q206 = Q("q206_phrase_probe",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts,
      |    len(string_split(text, ' ')) AS n FROM documents),
      |bgx AS (
      |  SELECT unnest(list_transform(range(1, n),
      |    i -> ts[i] || ' ' || ts[i + 1])) AS bg
      |  FROM toks WHERE n >= 2),
      |win AS (
      |  SELECT bg, count(*) AS c FROM bgx GROUP BY bg
      |  ORDER BY c DESC, bg LIMIT 1),
      |m AS (
      |  SELECT doc_id, w.bg AS bg,
      |    len(list_filter(range(1, n),
      |      i -> ts[i] || ' ' || ts[i + 1] = w.bg)) AS nm
      |  FROM toks, win w WHERE n >= 2)
      |SELECT bg AS bigram, doc_id,
      |  CAST(nm AS BIGINT) AS n_matches
      |FROM m WHERE nm > 0""".stripMargin) { (s, dir) =>
    import graft.text.TextOps
    val docs = t(s, dir, "documents")
    val toks = docs.select(col("doc_id"),
      TextOps.tokens(col("text")).as("ts"))
    // positional postings — the index layout
    val post = toks.select(col("doc_id"),
      posexplode(col("ts")).as(Seq("pos", "term")))
    // winner bigram: in-row fold, one aggregate, TakeOrdered(1)
    val win = toks.filter(size(col("ts")) >= 2)
      .select(explode(expr("transform(sequence(0, size(ts) - 2), " +
        "i -> struct(ts[i] AS t1, ts[i + 1] AS t2))")).as("bg"))
      .select(col("bg.t1").as("t1"), col("bg.t2").as("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc,
        concat_ws(" ", col("t1"), col("t2")).asc)
      .limit(1)
    val w = broadcast(win.select("t1", "t2"))
    val p1 = post.join(w, col("term") === col("t1"))
      .select(col("doc_id").as("d1"), col("pos").as("pos1"),
        col("t1"), col("t2"))
    val p2 = post.join(w, col("term") === col("t2"))
      .select(col("doc_id").as("d2"), col("pos").as("pos2"))
    p1.join(p2,
        col("d1") === col("d2") && col("pos2") === col("pos1") + 1)
      .groupBy(col("d1"), col("t1"), col("t2"))
      .agg(count(lit(1)).as("n_matches"))
      .select(concat_ws(" ", col("t1"), col("t2")).as("bigram"),
        col("d1").as("doc_id"), col("n_matches"))
  }

  /** RECIPROCAL RANK FUSION — hybrid lexical+dense retrieval, the
    * serving pattern RAG stacks run when neither BM25 nor embedding
    * search alone is trusted (Cormack/Clarke/Büttcher 2009; the
    * default hybrid mode in ES/OpenSearch/Vespa): run both arms,
    * convert each arm's top-k to RANKS, score each doc
    * `Σ 1/(k₀+rank)` over the arms that retrieved it, re-rank. The
    * lexical arm is q121's integer-micro BM25 chain verbatim (terms
    * {spark, hash, merge}); the dense arm is the q37 device with the
    * corpus doc 0's embedding as the query (doc_id ≡ vec_id on this
    * corpus — the alignment the embeddings table is generated with).
    * RRF's practical virtue is exactly what makes it oracle-exact:
    * it consumes only INTEGER ranks, so the fusion is pure BIGINT
    * (`1000000 div (60+rank)` per arm, k₀=60 the canonical
    * constant) — no score normalization to diverge on.
    *
    * Shape: the lexical arm's two token-grain aggregates +
    * TakeOrdered(20); the dense arm's broadcast-probe scan +
    * TakeOrdered(20); then all windows/joins run on ≤20-row result
    * frames (the single-partition window is the RESULT SET, never
    * the corpus). Fusion cost is independent of corpus size.
    */
  val q207 = Q("q207_rrf_fusion",
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
       |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
       |tf AS (
       |  SELECT doc_id, w, count(*) AS tf FROM toks
       |  WHERE w IN ('spark', 'hash', 'merge') GROUP BY 1, 2),
       |df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
       |sc AS (
       |  SELECT tf.doc_id,
       |    CAST(sum(CAST(floor(
       |      ln((n - df + 0.5) / (df + 0.5) + 1) * tf * 2.2
       |        / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
       |        * 1000000) AS BIGINT)) AS BIGINT) AS sm
       |  FROM tf JOIN df USING (w) JOIN dl USING (doc_id)
       |  CROSS JOIN stats GROUP BY 1),
       |lex AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY sm DESC, doc_id) AS lex_rank
       |  FROM (SELECT doc_id, sm FROM sc
       |        ORDER BY sm DESC, doc_id LIMIT 20)),
       |e AS (SELECT vec_id, embedding, ${SimQueries.normSql} AS nrm
       |      FROM embeddings),
       |q AS (SELECT embedding, nrm FROM e WHERE vec_id = 0),
       |c AS (SELECT * FROM e WHERE vec_id >= 1),
       |sims AS (
       |  SELECT c.vec_id,
       |    round(${SimQueries.dotSql} / (q.nrm * c.nrm), 6) AS sim
       |  FROM c, q),
       |den AS (
       |  SELECT vec_id,
       |    row_number() OVER (ORDER BY sim DESC, vec_id) AS vec_rank
       |  FROM (SELECT vec_id, sim FROM sims
       |        ORDER BY sim DESC, vec_id LIMIT 20)),
       |fused AS (
       |  SELECT COALESCE(lex.doc_id, den.vec_id) AS doc_id,
       |    COALESCE(lex_rank, 0) AS lex_rank,
       |    COALESCE(vec_rank, 0) AS vec_rank
       |  FROM lex FULL OUTER JOIN den ON lex.doc_id = den.vec_id)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(lex_rank AS BIGINT) AS lex_rank,
       |  CAST(vec_rank AS BIGINT) AS vec_rank,
       |  CAST((CASE WHEN lex_rank > 0
       |          THEN 1000000 // (60 + lex_rank) ELSE 0 END)
       |     + (CASE WHEN vec_rank > 0
       |          THEN 1000000 // (60 + vec_rank) ELSE 0 END)
       |    AS BIGINT) AS rrf_ppm
       |FROM fused ORDER BY rrf_ppm DESC, doc_id
       |LIMIT 10""".stripMargin) { (s, dir) =>
    import graft.text.TextOps
    import graft.sim.Similarity
    import org.apache.spark.sql.expressions.Window
    val dox = t(s, dir, "documents")
    // lexical arm — q121's integer-micro BM25, then ranks
    val qterms = Seq("spark", "hash", "merge")
    val toks = dox.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("w"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
    val tf = toks.filter(col("w").isin(qterms: _*))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val lexTop = tf.join(broadcast(dfq), Seq("w"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        floor((log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1)
          * col("tf") * 2.2
          / (col("tf") + lit(1.2) *
            (lit(1.0) - 0.75 + lit(0.75) * col("dl") / col("avgdl"))))
          * 1000000).cast("long").as("cm"))
      .groupBy("doc_id").agg(sum("cm").cast("long").as("sm"))
      .orderBy(col("sm").desc, col("doc_id")).limit(20)
    // single-partition window is BOUNDED: it ranks the limit(20)
    // frame above, never the corpus (r20 window audit)
    val lex = lexTop.withColumn("lex_rank",
        row_number().over(
          Window.orderBy(col("sm").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    // dense arm — the q37 device, probe = doc 0's embedding
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
    val probe = broadcast(e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("nrm").as("qn")))
    val denTop = e.filter(col("vec_id") >= 1).crossJoin(probe)
      .select(col("vec_id"),
        round(Similarity.dot(col("embedding"), col("qe"))
          / (col("nrm") * col("qn")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(20)
    // bounded like the lexical arm: ranks the limit(20) frame only
    val den = denTop.withColumn("vec_rank",
        row_number().over(
          Window.orderBy(col("sim").desc, col("vec_id"))).cast("long"))
      .select(col("vec_id").as("doc_id"), col("vec_rank"))
    rrfFuse(lex, den).orderBy(col("rrf_ppm").desc, col("doc_id"))
      .limit(10)
  }

  /** The RRF fusion step alone: full-outer merge of two ranked lists
    * (doc_id, lex_rank) / (doc_id, vec_rank), absent arm = rank 0 =
    * no contribution, score `Σ 1000000 div (60+rank)` in pure
    * BIGINT. Factored out of [[q207]] because the corpus's two arms
    * never overlap (random embeddings are uncorrelated with token
    * text) — the both-arms additive path is spec-driven with
    * constructed lists, the q176-style oracle-unreachable-branch
    * convention.
    */
  private[graft] def rrfFuse(lex: DataFrame, den: DataFrame): DataFrame =
    lex.join(den, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0L)).as("vec_rank"))
      .withColumn("rrf_ppm",
        (when(col("lex_rank") > 0,
          expr("1000000 div (60 + lex_rank)")).otherwise(lit(0L)) +
          when(col("vec_rank") > 0,
            expr("1000000 div (60 + vec_rank)")).otherwise(lit(0L)))
          .cast("long"))

  /** INCREMENTAL MATERIALIZED-VIEW MAINTENANCE — the aggregate face
    * of the store-maintenance pattern (q137 band store, q140 IVF-PQ
    * codes, q167/q179 ingest gates, q186 shard manifest): a
    * per-(source, lang) summary view of ALGEBRAIC statistics
    * ([[graft.ops.AggView]]: n/sum/ssq/min/max over n_chars) is
    * persisted once for the history half (doc_id < 300); the delta
    * past the watermark is summarized ALONE — the only corpus scan
    * this query pays reads `doc_id >= 300`, filter pushed to parquet
    * — and folded into the stored view with one view-grain merge.
    * Mergeability makes incremental ≡ from-scratch EXACT (BIGINT
    * adds and min/max are order-free), which is why the oracle is
    * the from-scratch recompute over all of `documents`: a hash
    * match proves the maintenance path, not just the statistics.
    * Derived means/variances come from (n, sum, ssq) at read time;
    * non-algebraic stats (exact distincts/quantiles) are excluded by
    * design — see AggView's scaladoc.
    *
    * Shape: one pushed-filter delta scan + one delta-grain aggregate
    * + one merge aggregate over |view| + |delta groups| rows. At 100
    * TB the view is millions of rows against billions scanned —
    * maintenance cost is the delta's, never history's.
    */
  val q208 = Q("q208_mv_maintain",
    """SELECT source, lang, count(*) AS n_rows,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_v,
      |  CAST(sum(n_chars * n_chars) AS BIGINT) AS ssq_v,
      |  CAST(min(n_chars) AS BIGINT) AS min_v,
      |  CAST(max(n_chars) AS BIGINT) AS max_v
      |FROM documents GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    import graft.ops.AggView
    val W = 300L
    val docs = t(s, dir, "documents")
    val keys = Seq("source", "lang")
    val wh = graft.sources.Warehouse(
      graft.SessionScratch.dir(s, s"mvstore_${graft.SessionScratch.keyOf(dir)}"))
    val viewTable = s"mv_hist_${graft.SessionScratch.keyOf(dir)}"
    graft.SessionScratch.once(s, viewTable) {
      wh.overwrite(
        AggView.summarize(docs.filter(col("doc_id") < W), keys,
          "n_chars"), viewTable)
    }
    val delta = AggView.summarize(docs.filter(col("doc_id") >= W),
      keys, "n_chars")
    AggView.merge(wh.read(s, viewTable), delta, keys)
  }

  /** IN-DOMAIN BIGRAM-LM PERPLEXITY — the CCNet filter's DOMAIN
    * form, completing the LM-scoring family: q116 is unigram
    * self-surprisal, q143 is a bigram LM trained on a random modulo
    * slice with a FIXED pseudo-vocabulary (4096) — this one trains on
    * a REFERENCE DOMAIN (the `lang='en'` slice, as CCNet trains on
    * Wikipedia) with true add-one smoothing (V = the data-derived
    * reference vocabulary), and its gate includes the property the
    * other two cannot state: the trained filter DISCRIMINATES —
    * in-distribution docs average strictly below off-distribution
    * docs (spec-asserted). Scores are per-doc bigram count plus
    * total/mean integer micro-nats against the reference
    * distribution, not the doc's own. Per-bigram cost is
    * `round(1e6·ln((c1(a)+V)/(c2(a,b)+1)))` (add-one smoothing in
    * -log form; OOV history ⇒ c1=c2=0 ⇒ ln(V), the uniform floor) —
    * always ≥ 0 since c2 ≤ c1, so the integer mean's floor division
    * is sign-safe. q116's determinism stance: one ln per distinct
    * bigram, 6-dp micro rounding before any aggregation.
    *
    * Shape: one train-slice bigram aggregate (vocab² grain, counts),
    * one history aggregate (vocab grain), one corpus bigram pass
    * left-joined against both count tables (vocab-sized right sides
    * — broadcastable under a bounded tokenizer vocab, shuffle-join
    * with AQE skew handling when open-vocab), one doc-grain
    * aggregate. V is a 1-row broadcast.
    */
  /** The q209 scoring chain as a reusable oracle-CTE prefix ending
    * in `scored` (doc_id, n_bigrams, nat_micro_sum, nat_micro_avg) —
    * shared verbatim by q209 and the q211 budget selection so the
    * two oracles cannot drift (the curationSqlCte device).
    */
  private val lmSqlCtes =
    """toks AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS ts,
      |    len(string_split(text, ' ')) AS n FROM documents),
      |b2 AS (
      |  SELECT doc_id, lang, g.a AS a, g.b AS b FROM (
      |    SELECT doc_id, lang,
      |      unnest(list_transform(range(1, n),
      |        i -> {'a': ts[i], 'b': ts[i + 1]})) AS g
      |    FROM toks WHERE n >= 2)),
      |c2 AS (SELECT a, b, count(*) AS c2 FROM b2
      |       WHERE lang = 'en' GROUP BY 1, 2),
      |c1 AS (SELECT a, count(*) AS c1 FROM b2
      |       WHERE lang = 'en' GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS v FROM
      |        (SELECT unnest(ts) AS w FROM toks WHERE lang = 'en')),
      |sc AS (
      |  SELECT b2.doc_id,
      |    CAST(round(ln(CAST(COALESCE(c1.c1, 0) + v.v AS DOUBLE)
      |      / (COALESCE(c2.c2, 0) + 1)) * 1000000) AS BIGINT) AS m
      |  FROM b2 LEFT JOIN c2 USING (a, b) LEFT JOIN c1 USING (a)
      |  CROSS JOIN v),
      |scored AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |    CAST(sum(m) AS BIGINT) AS nat_micro_sum,
      |    CAST(sum(m) // count(*) AS BIGINT) AS nat_micro_avg
      |  FROM sc GROUP BY doc_id)""".stripMargin

  /** The q209 scorer as a reusable frame — ONE definition consumed
    * by q209 (gated directly) and q211 (as the quality signal), so
    * the engine sides cannot drift either.
    */
  private def lmScored(s: SparkSession, dir: String): DataFrame =
    // the whole scorer output is itself a shared artifact: FOUR
    // registry queries consume it (q209 directly, q211's budget
    // selection, q219's rho selection, q222's dedup eval) and each
    // otherwise re-runs the scoring join + doc aggregate over the
    // cached bigram frame (StageProbe r20: ~320 ms single-task
    // scoring stages per consumer). Same session-scratch policy as
    // the bigram frame below.
    graft.Materialized.scratch(s, s"lm_scored:$dir") {
      lmScoredBuild(s, dir)
    }

  private def lmScoredBuild(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val docs = t(s, dir, "documents")
    val toks = docs.select(col("doc_id"), col("lang"),
      TextOps.tokens(col("text")).as("ts"))
    // Materialized: the bigram frame feeds the two training
    // aggregates AND the scoring join, and three registry queries
    // (q209/q211/q219) consume this scorer — without the cache each
    // consumer re-explodes the token stream up to three times
    val bg = graft.Materialized.scratch(s, s"lm_bg:$dir") {
      toks.filter(size(col("ts")) >= 2)
        .select(col("doc_id"), col("lang"),
          explode(expr("transform(sequence(0, size(ts) - 2), " +
            "i -> struct(ts[i] AS a, ts[i + 1] AS b))")).as("g"))
        .select(col("doc_id"), col("lang"),
          col("g.a").as("a"), col("g.b").as("b"))
    }
    val train = bg.filter(col("lang") === "en")
    val c2 = train.groupBy("a", "b").agg(count(lit(1)).as("c2"))
    val c1 = train.groupBy("a").agg(count(lit(1)).as("c1"))
    val vRow = toks.filter(col("lang") === "en")
      .select(explode(col("ts")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    bg.join(c2, Seq("a", "b"), "left")
      .join(c1, Seq("a"), "left")
      .crossJoin(broadcast(vRow))
      .select(col("doc_id"),
        round(log((coalesce(col("c1"), lit(0L)) + col("v"))
          .cast("double") / (coalesce(col("c2"), lit(0L)) + 1))
          * 1000000).cast("long").as("m"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("m").cast("long").as("nat_micro_sum"))
      .withColumn("nat_micro_avg",
        expr("nat_micro_sum div n_bigrams"))
  }

  val q209 = Q("q209_lm_perplexity",
    s"""WITH $lmSqlCtes
       |SELECT doc_id, n_bigrams, nat_micro_sum, nat_micro_avg
       |FROM scored""".stripMargin) { (s, dir) => lmScored(s, dir) }

  /** MATRYOSHKA-TRUNCATION RECALL — the serving-cost knob
    * dimension-truncated embeddings buy (MRL practice: index/search
    * the first d′ ≪ D dims, verify how much exact top-k survives):
    * run the q37 exact top-5 TWICE — full 64 dims and the first-16
    * PREFIX — and report per query how many of the true top-5 the
    * truncated search keeps. The measurement motivates (or vetoes)
    * a 4× smaller serving index BEFORE anyone builds it; on these
    * isotropic random embeddings prefix dims carry no privileged
    * mass, so recall is expected LOW — the honest baseline an MRL
    * retrain would then lift (stated; the spec pins overlap ≤ 5 and
    * the full arm's self-consistency instead of a recall floor).
    *
    * Shape: two broadcast-query scans (the second reads a 4× thinner
    * slice — at serving scale that is the point), two per-query
    * top-5 windows over |Q| partitions, one |Q|·5-row join. Nothing
    * beyond q37's audited cost, twice.
    */
  val q210 = Q("q210_mrl_recall",
    s"""WITH e AS (
       |  SELECT vec_id, embedding, ${SimQueries.normSql} AS nrm,
       |    sqrt(list_sum(list_transform(range(1, 17),
       |      i -> embedding[CAST(i AS INT)]::DOUBLE
       |        * embedding[CAST(i AS INT)]::DOUBLE))) AS nrm16
       |  FROM embeddings),
       |q AS (SELECT * FROM e WHERE vec_id < 8),
       |c AS (SELECT * FROM e WHERE vec_id >= 8),
       |full_sims AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid,
       |    round(${SimQueries.dotSql} / (q.nrm * c.nrm), 6) AS sim
       |  FROM q, c),
       |tr_sims AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid,
       |    round(list_sum(list_transform(range(1, 17), i ->
       |      q.embedding[CAST(i AS INT)]::DOUBLE
       |        * c.embedding[CAST(i AS INT)]::DOUBLE))
       |      / (q.nrm16 * c.nrm16), 6) AS sim
       |  FROM q, c),
       |full_top AS (
       |  SELECT qid, nid FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, nid) AS rn FROM full_sims)
       |  WHERE rn <= 5),
       |tr_top AS (
       |  SELECT qid, nid FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, nid) AS rn FROM tr_sims)
       |  WHERE rn <= 5)
       |SELECT f.qid, CAST(count(t.nid) AS BIGINT) AS n_kept
       |FROM full_top f LEFT JOIN tr_top t
       |  ON f.qid = t.qid AND f.nid = t.nid
       |GROUP BY f.qid""".stripMargin) { (s, dir) =>
    import graft.sim.Similarity
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"),
        Similarity.norm(slice(col("embedding"), 1, 16)).as("nrm16"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("nrm16").as("qn16"))
    val c = e.filter(col("vec_id") >= 8)
    val joined = broadcast(q).crossJoin(c)
    def top5(sim: Column): DataFrame = {
      val w = Window.partitionBy("qid")
        .orderBy(col("sim").desc, col("nid").asc)
      joined.select(col("qid"), col("vec_id").as("nid"), sim.as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5).select("qid", "nid")
    }
    val fullTop = top5(round(
      Similarity.dot(col("qe"), col("embedding"))
        / (col("qn") * col("nrm")), 6))
    val trTop = top5(round(
      Similarity.dot(slice(col("qe"), 1, 16),
        slice(col("embedding"), 1, 16))
        / (col("qn16") * col("nrm16")), 6))
    // fully renamed right side: both tops share the `joined` lineage,
    // so DataFrame-indexed refs would go ambiguous under dedup
    val tr2 = trTop.select(col("qid").as("tqid"), col("nid").as("tnid"))
    fullTop.join(tr2,
        col("qid") === col("tqid") && col("nid") === col("tnid"),
        "left")
      .groupBy("qid")
      .agg(count(col("tnid")).as("n_kept"))
  }

  /** BUDGETED QUALITY SELECTION WITHOUT A GLOBAL SORT — "take the
    * best docs until the token budget is spent" (the data-selection
    * step behind quality-pruned pretraining mixes), where the naive
    * plan is a corpus-wide ORDER BY quality — a single-partition
    * sort that dies at scale. The engine decomposes the selection
    * the way distributed exact quantiles do: quality (q209's
    * [[lmScored]] micro-nats, lower = better) buckets at deci-nat
    * grain; bucket totals take ONE bucket-grain exchange and a
    * single-partition window over the BUCKET TABLE ONLY (hundreds of
    * rows — the q182 block device); full buckets below the crossing
    * admit outright (map-only filter against broadcast cumulative
    * offsets); only the ONE boundary bucket runs a doc-grain ordered
    * window, bounded by the bucket width knob. Admission rule:
    * inclusive running chars ≤ budget in (quality, doc_id) order —
    * and bucketing by `q div 100000` preserves exactly that order,
    * so the decomposition is equivalence, not approximation. The
    * oracle IS the naive global-order window — an independent
    * derivation the bucket plan must match bit-for-bit. Budget =
    * 40% of total corpus chars, derived in-query (1-row broadcast).
    */
  val q211 = Q("q211_budget_select",
    s"""WITH $lmSqlCtes,
       |d AS (
       |  SELECT sc.doc_id, dd.source, dd.n_chars,
       |    sc.nat_micro_avg AS q
       |  FROM scored sc JOIN documents dd USING (doc_id)),
       |b AS (SELECT (SELECT sum(n_chars) FROM documents) * 2 // 5
       |        AS budget),
       |o AS (
       |  SELECT source, n_chars,
       |    sum(n_chars) OVER (ORDER BY q, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM d)
       |SELECT source, count(*) AS n_admitted,
       |  CAST(sum(n_chars) AS BIGINT) AS chars_admitted
       |FROM o, b WHERE cum <= budget GROUP BY source""".stripMargin) {
    (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val scored = lmScored(s, dir)
        .select(col("doc_id"), col("nat_micro_avg").as("q"))
      val budgetRow = docs.agg(
        expr("sum(n_chars) * 2 div 5").as("budget"))
      val d = scored
        .join(docs.select("doc_id", "source", "n_chars"), Seq("doc_id"))
        .crossJoin(broadcast(budgetRow))
        .withColumn("bkt", expr("q div 100000"))
      // bucket totals + exclusive cumulative — the single-partition
      // window touches ONLY the bucket table (q182's block device)
      val wB = Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val bcum = d.groupBy("bkt").agg(sum("n_chars").as("bc"))
        .withColumn("cumex", coalesce(sum("bc").over(wB), lit(0L)))
      val withCum = d.join(broadcast(bcum), Seq("bkt"))
      val fullB = withCum
        .filter(col("cumex") + col("bc") <= col("budget"))
      // the unique crossing bucket: cumex <= B < cumex + bc
      val wIn = Window.partitionBy("bkt")
        .orderBy(col("q"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bndAdm = withCum
        .filter(col("cumex") <= col("budget") &&
          col("cumex") + col("bc") > col("budget"))
        .withColumn("cum", col("cumex") + sum("n_chars").over(wIn))
        .filter(col("cum") <= col("budget"))
      fullB.select("source", "n_chars")
        .unionByName(bndAdm.select("source", "n_chars"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_admitted"),
          sum("n_chars").cast("long").as("chars_admitted"))
  }

  /** The q204/q213 Feistel as a DuckDB CTE-chain factory: unrolled
    * rounds over an input CTE `src(id, tag...)`, producing `outName
    * (tag..., y)`. Seed plays q204's epoch role. Shared so the q213
    * oracle's three instances (8-ring, 10-ring, doc keys) cannot
    * drift from q204's arithmetic.
    */
  private[queries] def feistelSqlChain(src: String, idCol: String, tag: String,
      seed: Long, outName: String): String = {
    val rounds = (0 to 3).map { i =>
      s"""${outName}_r${i + 1} AS (
         |  SELECT $tag, r AS l,
         |    xor(l, (r * 40503 + (2654435761 * $seed + 40503 * $i)
         |      % 65536) % 65536) AS r
         |  FROM ${outName}_r$i)""".stripMargin
    }.mkString(",\n")
    s"""${outName}_r0 AS (
       |  SELECT $tag, $idCol // 65536 AS l, $idCol % 65536 AS r
       |  FROM $src),
       |$rounds,
       |$outName AS (
       |  SELECT $tag, l * 65536 + r AS y FROM ${outName}_r4)""".stripMargin
  }

  /** CONSISTENT-RING RESHARDING AUDIT — what happens to a sharded
    * corpus when capacity grows 8 → 10 shards, measured for BOTH
    * placement disciplines at once: naive modulo (`key mod S` —
    * moves ~1−1/S of everything) and a consistent hash ring (64
    * virtual nodes per shard; a doc belongs to the first vnode
    * position ≥ its key, wrapping — adding shards only STEALS ARCS,
    * so movement ≈ the new shards' share and, crucially, every moved
    * doc moves TO a new shard, never between old ones — the property
    * that makes live resharding cheap, spec-pinned). Every position
    * and key comes from the SAME keyed Feistel as q204 (injective ⇒
    * no position ties ⇒ deterministic ownership; pure integer in
    * both engines — no engine-specific hash() anywhere). Output per
    * ring-10 owner: doc count, ring-stolen count, and how many of
    * the same docs the modulo discipline would have moved.
    *
    * Shape: the two rings build from a 640-row range → ONE-row
    * sorted-array aggregates, broadcast into the corpus scan; owner
    * lookup is an in-row HOF over the 640-entry array (binary-search
    * semantics via filter-first on the sorted array) — map-only per
    * doc, one final owner-grain aggregate. No per-doc join blowup at
    * any scale.
    */
  /** Ring-ownership lookup over a sorted (pos, shard) array column:
    * first vnode position ≥ `key`, wrapping to the global minimum.
    * `try_element_at`, NOT `element_at`: when `key` exceeds every
    * position the filtered array is EMPTY, and under ANSI mode
    * element_at(…, 1) on an empty array THROWS instead of returning
    * the NULL the coalesce needs — the wrap-around path only fires
    * when some doc key lands above the top vnode, which no gate-sf
    * corpus happened to contain (ScaleSmoke's f=4 key-shifted corpus
    * found it; the spec now pins the wrap case directly).
    */
  private[graft] def ringOwner(arr: String): Column =
    expr(s"coalesce(try_element_at(filter($arr, x -> x.pos >= key)," +
      s" 1).shard, element_at($arr, 1).shard)")

  val q213 = Q("q213_ring_reshard",
    s"""WITH vn AS (SELECT unnest(range(0, 640)) AS i),
       |${feistelSqlChain("vn", "i", "i", 9L, "vpos")},
       |vs AS (SELECT i // 64 AS shard, y FROM vpos),
       |p10 AS (SELECT list(struct_pack(pos := y, shard := shard)
       |          ORDER BY y) AS ps FROM vs),
       |p8 AS (SELECT list(struct_pack(pos := y, shard := shard)
       |         ORDER BY y) AS ps FROM vs WHERE shard < 8),
       |dk AS (SELECT doc_id FROM documents),
       |${feistelSqlChain("dk", "doc_id", "doc_id", 7L, "keys")},
       |a AS (
       |  SELECT doc_id, y AS key,
       |    COALESCE(list_filter(p8.ps, x -> x['pos'] >= y)[1]['shard'],
       |      p8.ps[1]['shard']) AS o8,
       |    COALESCE(list_filter(p10.ps, x -> x['pos'] >= y)[1]['shard'],
       |      p10.ps[1]['shard']) AS o10
       |  FROM keys, p8, p10)
       |SELECT CAST(o10 AS BIGINT) AS shard,
       |  count(*) AS n_docs,
       |  CAST(count(*) FILTER (WHERE o8 != o10) AS BIGINT)
       |    AS n_stolen,
       |  CAST(count(*) FILTER (WHERE key % 8 != key % 10) AS BIGINT)
       |    AS n_moved_mod
       |FROM a GROUP BY o10""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val vs = s.range(640).select(
      (col("id") / 64).cast("long").as("shard"),
      feistel32(col("id"), lit(9L)).as("pos"))
    val p10 = vs.agg(sort_array(collect_list(struct(col("pos"),
      col("shard")))).as("ps10"))
    val p8 = vs.filter(col("shard") < 8)
      .agg(sort_array(collect_list(struct(col("pos"),
        col("shard")))).as("ps8"))
    docs.select(col("doc_id"),
        feistel32(col("doc_id"), lit(7L)).as("key"))
      .crossJoin(broadcast(p8)).crossJoin(broadcast(p10))
      .select(col("key"), ringOwner("ps8").as("o8"),
        ringOwner("ps10").as("o10"))
      .groupBy(col("o10").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("o8") =!= col("o10"), 1L).otherwise(0L))
          .cast("long").as("n_stolen"),
        sum(when(col("key") % 8 =!= col("key") % 10, 1L)
          .otherwise(0L)).cast("long").as("n_moved_mod"))
  }

  /** DETERMINISTIC POISSON BOOTSTRAP — replicate weights for error
    * bars on corpus statistics at scale (the online-bootstrap
    * standard: per (doc, replicate) an independent-ish Poisson(1)
    * weight, so 32 resamples ride ONE corpus pass as a weighted
    * aggregate — no data copies, no sampling shuffle, and a rerun
    * reproduces the exact same replicates). The weight comes from
    * the shared Feistel: u = F((doc_id·64 + rep) mod 2^32, seed 11)
    * — the mod keeps the input inside feistel32's documented
    * non-negative < 2^32 domain at ANY scale factor (unmasked,
    * doc_id ≥ 2^26 would leave it and the uniformity/bijectivity
    * argument below would no longer hold); within one 2^32 block the
    * map stays bijective, across blocks distinct (doc, rep) pairs can
    * collide on the same weight, which a bootstrap tolerates (weights
    * need to be i.i.d.-ish, not distinct). u is uniform
    * on the 32-bit domain, cut against the Poisson(1) CDF
    * PRE-QUANTIZED to integer thresholds (floor(CDF·2^32), hardcoded
    * identically in both engines — zero runtime float anywhere, so
    * the "random" weights are bit-identical by construction; tail
    * capped at 6, P ≈ 5.9e-5, a stated truncation). Output per
    * replicate: effective row count and weighted char total — the
    * replicate spread IS the uncertainty estimate a data card quotes.
    *
    * Shape: one corpus scan × an in-row 32-way explode → one 32-group
    * aggregate with map-side partials. Embarrassingly parallel;
    * replicate count is a literal, never a data copy.
    */
  val q214 = Q("q214_poisson_bootstrap",
    s"""WITH base AS (
       |  SELECT doc_id, n_chars, rep,
       |    (doc_id * 64 + rep) % 4294967296 AS x
       |  FROM documents, (SELECT unnest(range(0, 32)) AS rep)),
       |${feistelSqlChain("base", "x", "n_chars, rep", 11L, "u")},
       |w AS (
       |  SELECT rep, n_chars,
       |    CASE WHEN y < 1580030168 THEN 0
       |         WHEN y < 3160060337 THEN 1
       |         WHEN y < 3950075421 THEN 2
       |         WHEN y < 4213413783 THEN 3
       |         WHEN y < 4279248373 THEN 4
       |         WHEN y < 4292415291 THEN 5
       |         ELSE 6 END AS wt
       |  FROM u)
       |SELECT CAST(rep AS BIGINT) AS rep,
       |  CAST(sum(wt) AS BIGINT) AS n_eff,
       |  CAST(sum(wt * n_chars) AS BIGINT) AS sum_chars
       |FROM w GROUP BY rep""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val u = feistel32((col("doc_id") * 64 + col("rep")) % lit(4294967296L),
      lit(11L))
    val wt = when(u < 1580030168L, 0L)
      .when(u < 3160060337L, 1L)
      .when(u < 3950075421L, 2L)
      .when(u < 4213413783L, 3L)
      .when(u < 4279248373L, 4L)
      .when(u < 4292415291L, 5L)
      .otherwise(6L)
    docs.select(col("doc_id"), col("n_chars"),
        explode(sequence(lit(0L), lit(31L))).as("rep"))
      .select(col("rep"), col("n_chars"), wt.as("wt"))
      .groupBy("rep")
      .agg(sum("wt").cast("long").as("n_eff"),
        sum(col("wt") * col("n_chars")).cast("long").as("sum_chars"))
  }

  /** FEATURE-DRIFT MONITORING (PSI) — the ML-ops check that belongs
    * next to q208's summary view: per feature, bucket the reference
    * slice (doc_id < 300) and the current slice against the SAME
    * bucket grid and report each bucket's Population Stability Index
    * term `(p−q)·ln(p/q)` (add-one smoothed over the observed bucket
    * set, so empty buckets neither divide by zero nor dominate).
    * Two features ride one scan (n_chars at centi-grain, token count
    * at deci-grain) via an in-row feature explode. Terms are ≥ 0 by
    * construction (both factors share a sign); each quantizes ONCE
    * to integer micro (the q162 ulp stance — p, q are rationals, the
    * product's 6-dp rounding has measure-zero boundary risk,
    * documented not hidden). Consumers sum a feature's terms into
    * its PSI and alarm on the usual 0.1/0.25 thresholds.
    *
    * Shape: one scan → in-row 2-way feature explode → one
    * (feature, bucket)-grain aggregate with conditional ref/cur
    * counts → 1-row totals broadcast → map-only term math. The
    * bucket table is the only exchanged grain; nothing corpus-sized
    * moves after the first aggregate.
    */
  /** The PSI oracle SQL — shared verbatim by q215 (in-query
    * reference) and q221 (stored reference): the two engine paths
    * must produce the identical drift report, so they share one
    * oracle (the q158≡q129 same-oracle device).
    */
  private val psiSql: String =
    """WITH f AS (
      |  SELECT doc_id < 300 AS is_ref, feature, bucket FROM (
      |    SELECT doc_id,
      |      unnest([
      |        {'feature': 'n_chars', 'bucket': n_chars // 100},
      |        {'feature': 'n_tokens',
      |         'bucket': len(string_split(text, ' ')) // 10}]) AS fb
      |    FROM documents)
      |  , LATERAL (SELECT fb['feature'] AS feature,
      |             fb['bucket'] AS bucket)),
      |cnt AS (
      |  SELECT feature, bucket,
      |    count(*) FILTER (WHERE is_ref) AS c_ref,
      |    count(*) FILTER (WHERE NOT is_ref) AS c_cur
      |  FROM f GROUP BY 1, 2),
      |tot AS (
      |  SELECT feature, sum(c_ref) AS n_ref, sum(c_cur) AS n_cur,
      |    count(*) AS b
      |  FROM cnt GROUP BY feature)
      |SELECT c.feature, CAST(c.bucket AS BIGINT) AS bucket,
      |  CAST(c_ref AS BIGINT) AS c_ref,
      |  CAST(c_cur AS BIGINT) AS c_cur,
      |  CAST(round(1000000 *
      |    ((c_ref + 1.0) / (n_ref + b) - (c_cur + 1.0) / (n_cur + b))
      |    * ln(((c_ref + 1.0) / (n_ref + b))
      |        / ((c_cur + 1.0) / (n_cur + b)))) AS BIGINT)
      |    AS psi_micro
      |FROM cnt c JOIN tot t ON c.feature = t.feature""".stripMargin

  /** The in-row feature/bucket projection — ONE definition for both
    * PSI paths and the stored-reference build.
    */
  private def featBuckets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(array(
        struct(lit("n_chars").as("feature"),
          expr("n_chars div 100").as("bucket")),
        struct(lit("n_tokens").as("feature"),
          expr("size(split(text, ' ')) div 10").cast("long")
            .as("bucket")))).as("fb"))
      .select(col("doc_id"), col("fb.feature").as("feature"),
        col("fb.bucket").as("bucket"))

  /** PSI term math over a (feature, bucket, c_ref, c_cur) frame —
    * shared by q215/q221.
    */
  private[graft] def psiOf(cnt: DataFrame): DataFrame = {
    val tot = cnt.groupBy("feature")
      .agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur"),
        count(lit(1)).as("b"))
    val p = (col("c_ref") + 1.0) / (col("n_ref") + col("b"))
    val q = (col("c_cur") + 1.0) / (col("n_cur") + col("b"))
    cnt.join(broadcast(tot), Seq("feature"))
      .select(col("feature"), col("bucket"),
        col("c_ref").cast("long").as("c_ref"),
        col("c_cur").cast("long").as("c_cur"),
        round((p - q) * log(p / q) * 1000000).cast("long")
          .as("psi_micro"))
  }

  val q215 = Q("q215_psi_drift", psiSql) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val f = featBuckets(docs)
      .withColumn("is_ref", col("doc_id") < 300)
    val cnt = f.groupBy("feature", "bucket")
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("c_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("c_cur"))
    psiOf(cnt)
  }

  /** STORED-REFERENCE PSI — the deployment form of q215: the
    * reference distribution is a PERSISTED artifact (bucket counts
    * written once, the q208/q167 store convention), and a drift
    * check scans ONLY the current slice (pushed watermark filter),
    * full-outer-joins the stored buckets (zero-filling either side —
    * a bucket seen only in one slice must still contribute its PSI
    * term), and reuses q215's term math verbatim. Same oracle as
    * q215: the stored path must reproduce the in-query path
    * bit-for-bit, which is the whole claim — a drift monitor that
    * disagrees with its own offline definition is worse than none.
    * Per-run cost: the current slice's scan + a bucket-grain join;
    * the reference corpus is never re-read.
    */
  val q221 = Q("q221_psi_stored", psiSql) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val wh = graft.sources.Warehouse(
      graft.SessionScratch.dir(s,
        s"psiref_${graft.SessionScratch.keyOf(dir)}"))
    val refTable = s"psi_ref_${graft.SessionScratch.keyOf(dir)}"
    graft.SessionScratch.once(s, refTable) {
      wh.overwrite(
        featBuckets(docs.filter(col("doc_id") < 300))
          .groupBy("feature", "bucket")
          .agg(count(lit(1)).as("c_ref")), refTable)
    }
    val cur = featBuckets(docs.filter(col("doc_id") >= 300))
      .groupBy("feature", "bucket")
      .agg(count(lit(1)).as("c_cur"))
    val cnt = wh.read(s, refTable)
      .join(cur, Seq("feature", "bucket"), "full_outer")
      .select(col("feature"), col("bucket"),
        coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"))
    psiOf(cnt)
  }

  /** NATIVE BOUNDED TOP-K PER GROUP — the
    * [[graft.functions.TopKPairsF]] aggregate driving a real query:
    * per source, the 3 longest docs (ties to the lower doc id). The
    * window formulation the ORACLE runs (`row_number() OVER
    * (PARTITION BY source ORDER BY ...)` then `rn <= 3`) shuffles
    * and sorts EVERY row before filtering; the native aggregate
    * trims to k inside each map task, so the exchange carries ≤ k
    * pairs per (source, input partition) and nothing ever sorts the
    * corpus — the spec pins the ObjectHashAggregate partial→final
    * pair around the exchange. Same answer, two structurally
    * different plans: the hash gate proves the bounded-heap
    * semantics (including tie order) equal the window's.
    */
  val q217 = Q("q217_topk_native",
    """SELECT source, CAST(rn AS BIGINT) AS rank, n_chars, doc_id
      |FROM (
      |  SELECT source, n_chars, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 3""".stripMargin) { (s, dir) =>
    import graft.functions.TopKPairsF
    t(s, dir, "documents")
      .groupBy("source")
      .agg(TopKPairsF(col("n_chars"), col("doc_id"), 3).as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rank"),
        col("col.ord").as("n_chars"), col("col.payload").as("doc_id"))
  }

  /** K-ANONYMITY AUDIT — the privacy-review pass a dataset release
    * runs before publishing anything row-grained: every
    * quasi-identifier combination (source, lang, length bucket —
    * the attributes a joiner could link on) must cover at least k=5
    * rows, or those rows are re-identification risks that need
    * suppression/generalization. Output per source: group count,
    * risky-group count, risky-row count, and the integer per-mille
    * suppression rate a compliant release would pay. The audit is
    * pure counting — two aggregates, no privacy math to diverge on —
    * which is exactly why it belongs in-engine rather than in a
    * notebook: it re-runs on every snapshot as cheaply as a word
    * count.
    *
    * Shape: one QI-grain aggregate (the only corpus exchange,
    * map-side partials; QI cardinality is bounded by the attribute
    * domains, not the corpus) + one source-grain rollup. Source is
    * part of the QI, so each QI group rolls into exactly one source
    * row — no double counting by construction.
    */
  val q218 = Q("q218_kanon_audit",
    """WITH qi AS (
      |  SELECT source, lang, n_chars // 100 AS lb, count(*) AS c
      |  FROM documents GROUP BY 1, 2, 3)
      |SELECT source,
      |  count(*) AS n_groups,
      |  CAST(count(*) FILTER (WHERE c < 5) AS BIGINT)
      |    AS n_risky_groups,
      |  CAST(COALESCE(sum(c) FILTER (WHERE c < 5), 0) AS BIGINT)
      |    AS n_risky_docs,
      |  CAST(1000 * COALESCE(sum(c) FILTER (WHERE c < 5), 0)
      |    // sum(c) AS BIGINT) AS risky_pm
      |FROM qi GROUP BY source""".stripMargin) { (s, dir) =>
    val qi = t(s, dir, "documents")
      .groupBy(col("source"), col("lang"),
        expr("n_chars div 100").as("lb"))
      .agg(count(lit(1)).as("c"))
    qi.groupBy("source")
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("c") < 5, 1L).otherwise(0L)).cast("long")
          .as("n_risky_groups"),
        sum(when(col("c") < 5, col("c")).otherwise(0L)).cast("long")
          .as("n_risky_docs"),
        expr("1000 * sum(CASE WHEN c < 5 THEN c ELSE 0 END) " +
          "div sum(c)").cast("long").as("risky_pm"))
  }

  /** LOSS-DIFFERENCE DATA SELECTION (RHO-loss shape) — the modern
    * data-selection move: score each candidate under TWO models and
    * keep the docs where a GENERIC model is surprised but the
    * IN-DOMAIN reference is not (high generic loss = informative;
    * low reference loss = learnable/on-distribution — the difference
    * filters out both the boring and the noise). The generic arm is
    * q143's modulo-slice LM ([[Extras.lmGenericScored]] — one shared
    * definition) restricted to its held-out docs; the reference arm
    * is q209's en-trained LM ([[lmScored]]). Both averages are
    * nonneg micro-nats per bigram; the generic total is NEGATED
    * BEFORE its integer division (a negative dividend floor-divides
    * differently in the two engines — DuckDB floors toward −∞,
    * Spark's div truncates toward 0 — so the division must only ever
    * see non-negative operands; q143 never divided, q219 does).
    * Output: top-100 candidates by (excess desc, doc_id), with both
    * arms' averages riding along. The oracle composes BOTH shared
    * CTE prefixes — neither arm's formula exists twice anywhere.
    *
    * Shape: the two scoring chains (each audited at its own query)
    * + one doc-grain join + TakeOrdered(100). Selection cost is the
    * scorers'.
    */
  val q219 = Q("q219_rho_select",
    s"""WITH ${Extras.lmGenSqlCtes},
       |$lmSqlCtes
       |SELECT g.doc_id,
       |  CAST((-g.score_ubits) // g.n_bigrams AS BIGINT) AS gen_avg,
       |  s2.nat_micro_avg AS ref_avg,
       |  CAST((-g.score_ubits) // g.n_bigrams - s2.nat_micro_avg
       |    AS BIGINT) AS excess_micro
       |FROM gscored g JOIN scored s2 USING (doc_id)
       |ORDER BY excess_micro DESC, g.doc_id
       |LIMIT 100""".stripMargin) { (s, dir) =>
    val gen = Extras.lmGenericScored(s, dir)
      .select(col("doc_id"),
        expr("(-score_ubits) div n_bigrams").as("gen_avg"))
    val ref = lmScored(s, dir)
      .select(col("doc_id"), col("nat_micro_avg").as("ref_avg"))
    gen.join(ref, Seq("doc_id"))
      .withColumn("excess_micro", col("gen_avg") - col("ref_avg"))
      .orderBy(col("excess_micro").desc, col("doc_id"))
      .limit(100)
  }

  /** PII REDACTION TRANSFORM — q52 counts PII, this one REMOVES it
    * and proves the removal byte-exact: plant deterministic PII
    * spans (email on id%7, IPv4 on id%11, phone on id%13 — overlaps
    * occur, id=0 carries all three), run the REAL
    * regexp_replace chain (email → [EMAIL] first, then IPv4 → [IP],
    * then phone → [PHONE]; RE2-portable patterns, no backreferences
    * — the q172 convention), and gate (doc_id, n_redactions,
    * md5(redacted)). The oracle NEVER runs a regex: the corpus
    * carries no '@', digits, or dots (measured — documented
    * precondition), so it reconstructs the redacted text
    * ARITHMETICALLY from the same planted layout — a hash match
    * proves the chain redacted exactly the planted spans and
    * touched nothing else. Map-only at any scale.
    */
  /** The redaction chain alone — emails first, then IPv4, then
    * phone runs; position-independent (the spec drives mid-string
    * and multi-instance cases a suffix-only corpus cannot).
    */
  private[graft] def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c,
          "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z][a-z]+", "[EMAIL]"),
        "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+", "[IP]"),
      "[0-9]{3}-[0-9]{4}", "[PHONE]")

  val q220 = Q("q220_pii_redact",
    """WITH p AS (
      |  SELECT doc_id, text,
      |    CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS m7,
      |    CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END AS m11,
      |    CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END AS m13
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, m7 + m11 + m13 AS n_redactions,
      |    text
      |    || CASE WHEN m7 = 1 THEN ' contact [EMAIL]' ELSE '' END
      |    || CASE WHEN m11 = 1 THEN ' from [IP]' ELSE '' END
      |    || CASE WHEN m13 = 1 THEN ' call [PHONE]' ELSE '' END
      |      AS red
      |  FROM p)
      |SELECT doc_id, CAST(n_redactions AS BIGINT) AS n_redactions,
      |  md5(red) AS red_md5
      |FROM r""".stripMargin) { (s, dir) =>
    val id = col("doc_id")
    val planted = concat(col("text"),
      when(id % 7 === 0, concat(lit(" contact bob"),
        (id % 100).cast("string"), lit("@mail"),
        (id % 10).cast("string"), lit(".com"))).otherwise(lit("")),
      when(id % 11 === 0, concat(lit(" from 10."),
        (id % 256).cast("string"), lit(".0."),
        (id % 200 + 1).cast("string"))).otherwise(lit("")),
      when(id % 13 === 0, concat(lit(" call 555-"),
        lpad((id % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")))
    val redacted = redactPii(planted)
    t(s, dir, "documents").select(id,
      (when(id % 7 === 0, 1L).otherwise(0L) +
        when(id % 11 === 0, 1L).otherwise(0L) +
        when(id % 13 === 0, 1L).otherwise(0L)).as("n_redactions"),
      md5(encode(redacted, "UTF-8")).as("red_md5"))
  }

  /** Pair-set evaluation metrics — |truth|, |pred|, |hit| and
    * integer per-mille precision/recall over (doc_a, doc_b) /
    * (da, db) pair frames. Factored so the spec can drive partial
    * overlap and empty-side cases the corpus (which measures
    * perfect agreement) cannot.
    */
  private[graft] def dedupEval(pred: DataFrame,
      truth: DataFrame): DataFrame = {
    val p = pred.select(col("doc_a"), col("doc_b")).distinct()
    val tr = truth.select(col("da"), col("db")).distinct()
    val hit = p.join(tr,
      col("doc_a") === col("da") && col("doc_b") === col("db"))
    p.agg(count(lit(1)).as("n_pred"))
      .crossJoin(tr.agg(count(lit(1)).as("n_truth")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_truth"), col("n_pred"), col("n_hit"),
        expr("CASE WHEN n_pred > 0 THEN 1000 * n_hit div n_pred " +
          "ELSE 0 END").cast("long").as("precision_pm"),
        expr("CASE WHEN n_truth > 0 THEN 1000 * n_hit div n_truth " +
          "ELSE 0 END").cast("long").as("recall_pm"))
  }

  /** DEDUP-DETECTOR EVALUATION — the quality check a pipeline runs
    * before trusting a cheap near-dup detector: score the MinHash/LSH
    * candidate generator (q30, consumed AS A LIBRARY FRAME — the
    * registry's queries compose) against the corpus's labeled
    * near-dup structure (pairs sharing the 10-token head
    * fingerprint, q167's key — the planted duplication the corpus
    * carries by construction). Output: one row of |truth|, |pred|,
    * |hit|, integer per-mille precision and recall. At sf0.01 the
    * detector is measured PERFECT (25 = 25 = 25 — the banding
    * catches every head-sharer and nothing else), which is itself
    * the corpus property the spec asserts; partial-overlap and
    * empty-side arithmetic is spec-driven through [[dedupEval]] on
    * constructed frames. The oracle embeds q30's own oracle as a CTE
    * — the evaluated detector and its oracle cannot drift.
    *
    * Shape: q30's audited candidate cost + one fp-grain self-join
    * for the truth pairs + pair-grain join and three 1-row
    * aggregates. Nothing beyond the detector's own cost model.
    */
  val q222 = Q("q222_dedup_eval",
    s"""WITH pred AS (${TextQueries.q30.oracle.get}),
       |pd AS (SELECT DISTINCT doc_a, doc_b FROM pred),
       |fp AS (SELECT doc_id,
       |  md5(array_to_string(string_split(text, ' ')[1:10], ' '))
       |    AS f FROM documents),
       |hp AS (SELECT a.doc_id AS da, b.doc_id AS db
       |  FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id),
       |h AS (SELECT count(*) AS c FROM pd
       |  JOIN hp ON doc_a = da AND doc_b = db),
       |np AS (SELECT count(*) AS c FROM pd),
       |nt AS (SELECT count(*) AS c FROM hp)
       |SELECT CAST(nt.c AS BIGINT) AS n_truth,
       |  CAST(np.c AS BIGINT) AS n_pred,
       |  CAST(h.c AS BIGINT) AS n_hit,
       |  CAST(CASE WHEN np.c > 0 THEN 1000 * h.c // np.c
       |    ELSE 0 END AS BIGINT) AS precision_pm,
       |  CAST(CASE WHEN nt.c > 0 THEN 1000 * h.c // nt.c
       |    ELSE 0 END AS BIGINT) AS recall_pm
       |FROM np, nt, h""".stripMargin) { (s, dir) =>
    val pred = TextQueries.q30.fn(s, dir)
    val fp = t(s, dir, "documents").select(col("doc_id"),
      md5(array_join(slice(split(col("text"), " "), 1, 10), " "))
        .as("f"))
    val truth = fp.select(col("doc_id").as("da"), col("f"))
      .join(fp.select(col("doc_id").as("db"), col("f")), Seq("f"))
      .filter(col("da") < col("db"))
      .select("da", "db")
    dedupEval(pred, truth)
  }

  /** MERGE-ON-READ DELETES — the lakehouse delete path
    * ([[graft.sources.Warehouse.deleteKeys]]/`readMor`): the base
    * table persists once; two delete waves append ONLY their keys to
    * the sidecar vector (base files untouched — O(deletes) writes,
    * the whole point of deletion vectors); the read subtracts the
    * vector with one anti-join. The oracle recomputes the surviving
    * set arithmetically from the delete predicates — a hash match
    * proves the vector path deletes exactly the requested keys and
    * nothing else, THROUGH the store. Duplicate/overlapping deletes
    * (the two waves intersect at doc_id ≡ 45 mod 63) are exercised
    * on the corpus, not just in spec. Compaction equivalence and
    * vector idempotence are spec-driven on a scratch store.
    */
  val q223 = Q("q223_mor_deletes",
    """SELECT source, count(*) AS n_live,
      |  CAST(sum(n_chars) AS BIGINT) AS chars_live
      |FROM documents
      |WHERE NOT (doc_id % 9 = 0 OR doc_id % 7 = 3)
      |GROUP BY source""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val wh = graft.sources.Warehouse(
      graft.SessionScratch.dir(s,
        s"morstore_${graft.SessionScratch.keyOf(dir)}"))
    val tbl = s"mor_docs_${graft.SessionScratch.keyOf(dir)}"
    graft.SessionScratch.once(s, tbl) {
      wh.overwrite(docs, tbl)
      wh.deleteKeys(
        docs.filter(col("doc_id") % 9 === 0).select("doc_id"), tbl)
      wh.deleteKeys(
        docs.filter(col("doc_id") % 7 === 3).select("doc_id"), tbl)
    }
    wh.readMor(s, tbl, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_live"),
        sum("n_chars").cast("long").as("chars_live"))
  }

  /** MERGE-ON-READ UPSERTS — the other half of the q223 delete path
    * ([[graft.sources.Warehouse.upsertRows]]/`readMorUpsert`, the
    * Hudi-MOR shape): the base persists at version 0; two upsert
    * waves append ONLY their changed rows (ver 1: doc_id % 6 == 0
    * re-stamped with n_chars+1000; ver 2: doc_id % 15 == 0 with
    * n_chars+2000 — the waves OVERLAP at doc_id ≡ 0 mod 30, where
    * latest-wins must pick ver 2); the read resolves latest-per-key
    * with one max-struct aggregate — no window, no sort. The oracle
    * recomputes the effective values from the wave predicates
    * (ver-2 wins CASE first): a hash match proves latest-wins
    * resolution THROUGH the store, overlap included.
    */
  val q224 = Q("q224_mor_upserts",
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars + CASE WHEN doc_id % 15 = 0 THEN 2000
      |    WHEN doc_id % 6 = 0 THEN 1000 ELSE 0 END) AS BIGINT)
      |    AS chars_eff,
      |  CAST(sum(CASE WHEN doc_id % 15 = 0 THEN 2
      |    WHEN doc_id % 6 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS ver_total
      |FROM documents GROUP BY source""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val wh = graft.sources.Warehouse(
      graft.SessionScratch.dir(s,
        s"upstore_${graft.SessionScratch.keyOf(dir)}"))
    val tbl = s"up_docs_${graft.SessionScratch.keyOf(dir)}"
    val withVer = docs.select(col("doc_id"), col("source"),
      col("n_chars"), lit(0L).as("ver"))
    graft.SessionScratch.once(s, tbl) {
      wh.overwrite(withVer, tbl)
      wh.upsertRows(withVer.filter(col("doc_id") % 6 === 0)
        .withColumn("n_chars", col("n_chars") + 1000)
        .withColumn("ver", lit(1L)), tbl)
      wh.upsertRows(withVer.filter(col("doc_id") % 15 === 0)
        .withColumn("n_chars", col("n_chars") + 2000)
        .withColumn("ver", lit(2L)), tbl)
    }
    wh.readMorUpsert(s, tbl, "doc_id", "ver")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("chars_eff"),
        sum("ver").cast("long").as("ver_total"))
  }

  /** TIME TRAVEL — versioned immutable snapshots
    * ([[graft.sources.Warehouse.writeVersion]]/`readVersion`): v1 is
    * the full corpus, v2 applies deletes (doc_id % 9 == 0) and
    * updates (+100 chars on doc_id % 4 == 0). The query reads BOTH
    * versions AFTER v2 exists and reports each version's stats —
    * the gate proves v1 remains bit-exact after v2 lands (the
    * immutability that makes reproducible-experiment pins and
    * incident rollback possible), and that v2 is what its
    * predicates say. The oracle derives both versions from the one
    * parquet corpus arithmetically.
    */
  val q225 = Q("q225_time_travel",
    """SELECT 1 AS version, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |UNION ALL
      |SELECT 2, count(*),
      |  CAST(sum(n_chars + CASE WHEN doc_id % 4 = 0 THEN 100
      |    ELSE 0 END) AS BIGINT)
      |FROM documents WHERE doc_id % 9 <> 0""".stripMargin) {
    (s, dir) =>
      val docs = t(s, dir, "documents")
      val wh = graft.sources.Warehouse(
        graft.SessionScratch.dir(s,
          s"ttstore_${graft.SessionScratch.keyOf(dir)}"))
      val tbl = s"tt_docs_${graft.SessionScratch.keyOf(dir)}"
      graft.SessionScratch.once(s, tbl) {
        wh.writeVersion(docs.select("doc_id", "source", "n_chars"), tbl)
        wh.writeVersion(docs.filter(col("doc_id") % 9 =!= 0)
          .select(col("doc_id"), col("source"),
            (col("n_chars") + when(col("doc_id") % 4 === 0, 100L)
              .otherwise(0L)).as("n_chars")), tbl)
        ()
      }
      def statsOf(v: Int): DataFrame =
        wh.readVersion(s, tbl, v)
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").cast("long").as("sum_chars"))
          .select(lit(v).cast("int").as("version"), col("n_docs"),
            col("sum_chars"))
      statsOf(1).unionByName(statsOf(2))
  }

  /** CHANGE DATA FEED — what changed between two snapshot VERSIONS
    * (Delta CDF / Iceberg changelog semantics), composed from the
    * tiers this round built: q225's time travel supplies the two
    * immutable versions, q199's [[graft.ops.Cdc.snapshotDiff]]
    * classifies every key (the full-outer diff with null-safe
    * per-attribute flags), and the feed is the per-class summary a
    * downstream consumer subscribes to. Gating the COMPOSITION is
    * the point (the q185/q193 stage-boundary argument): the oracle
    * re-derives insert/delete/update/unchanged counts purely from
    * the v2 predicates, so a pass proves the store, the versioning,
    * and the diff agree end-to-end. v1→v2 carries deletes
    * (doc_id % 9 == 0) and updates (+100 on doc_id % 4 == 0, minus
    * the overlap that was deleted); inserts are structurally absent
    * (v2 adds no rows) and the oracle pins that zero.
    */
  val q226 = Q("q226_change_feed",
    """SELECT 'delete' AS change_type,
      |  count(*) FILTER (WHERE doc_id % 9 = 0) AS n
      |FROM documents
      |UNION ALL
      |SELECT 'update',
      |  count(*) FILTER (WHERE doc_id % 9 <> 0 AND doc_id % 4 = 0)
      |FROM documents
      |UNION ALL
      |SELECT 'unchanged',
      |  count(*) FILTER (WHERE doc_id % 9 <> 0 AND doc_id % 4 <> 0)
      |FROM documents
      |UNION ALL
      |SELECT 'insert', CAST(0 AS BIGINT)""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val wh = graft.sources.Warehouse(
      graft.SessionScratch.dir(s,
        s"ttstore_${graft.SessionScratch.keyOf(dir)}"))
    val tbl = s"tt_docs_${graft.SessionScratch.keyOf(dir)}"
    // the same store q225 builds — one shared once-key, so whichever
    // query runs first pays the build (the q167 convention)
    graft.SessionScratch.once(s, tbl) {
      wh.writeVersion(docs.select("doc_id", "source", "n_chars"), tbl)
      wh.writeVersion(docs.filter(col("doc_id") % 9 =!= 0)
        .select(col("doc_id"), col("source"),
          (col("n_chars") + when(col("doc_id") % 4 === 0, 100L)
            .otherwise(0L)).as("n_chars")), tbl)
      ()
    }
    val diff = graft.ops.Cdc.snapshotDiff(
      curr = wh.readVersion(s, tbl, 2),
      prev = wh.readVersion(s, tbl, 1),
      key = "doc_id", attrs = Seq("source", "n_chars"))
    val counts = diff.groupBy("change_type")
      .agg(count(lit(1)).as("n"))
    // pin the structurally-absent class as an explicit zero row
    val classes = s.createDataFrame(
      Seq("insert", "delete", "update", "unchanged").map(Tuple1(_)))
      .toDF("change_type")
    classes.join(counts, Seq("change_type"), "left")
      .select(col("change_type"),
        coalesce(col("n"), lit(0L)).cast("long").as("n"))
  }

  /** INCREMENTAL VIEW MAINTENANCE UNDER DELETES — q208 maintains a
    * summary view from an APPEND-ONLY delta; real tables also delete
    * and update, and this query maintains the view from the q226
    * CHANGE FEED instead: the stored v1 view (persisted once) plus
    * per-change contributions — delete ⇒ (−1, −x, −x²) against the
    * old row's group, update ⇒ subtract old + add new, insert ⇒ add
    * — folded with one group-grain sum. Only INVERTIBLE aggregates
    * can ride this path (count/sum/ssq form a group under addition;
    * MIN/MAX are deliberately absent — a deleted extremum forces a
    * rescan, the classic IVM limitation, stated not papered over;
    * q208's merge-only view keeps them because append-only never
    * subtracts). Groups whose count reaches zero drop from the view
    * (spec-driven with a constructed full-group deletion). The
    * oracle recomputes the view from v2 arithmetically — a hash
    * match proves store + versioning + diff + delta algebra agree
    * end-to-end, O(changes) work after the one-time base.
    */
  val q227 = Q("q227_ivm_deltas",
    """SELECT source, count(*) AS n_rows,
      |  CAST(sum(n_chars + CASE WHEN doc_id % 4 = 0 THEN 100
      |    ELSE 0 END) AS BIGINT) AS sum_v,
      |  CAST(sum((n_chars + CASE WHEN doc_id % 4 = 0 THEN 100
      |      ELSE 0 END)
      |    * (n_chars + CASE WHEN doc_id % 4 = 0 THEN 100
      |      ELSE 0 END)) AS BIGINT) AS ssq_v
      |FROM documents WHERE doc_id % 9 <> 0
      |GROUP BY source""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val wh = graft.sources.Warehouse(
      graft.SessionScratch.dir(s,
        s"ttstore_${graft.SessionScratch.keyOf(dir)}"))
    val tbl = s"tt_docs_${graft.SessionScratch.keyOf(dir)}"
    graft.SessionScratch.once(s, tbl) {
      wh.writeVersion(docs.select("doc_id", "source", "n_chars"), tbl)
      wh.writeVersion(docs.filter(col("doc_id") % 9 =!= 0)
        .select(col("doc_id"), col("source"),
          (col("n_chars") + when(col("doc_id") % 4 === 0, 100L)
            .otherwise(0L)).as("n_chars")), tbl)
      ()
    }
    val viewTbl = s"ivm_view_${graft.SessionScratch.keyOf(dir)}"
    graft.SessionScratch.once(s, viewTbl) {
      wh.overwrite(
        wh.readVersion(s, tbl, 1).groupBy("source")
          .agg(count(lit(1)).as("n_rows"),
            sum("n_chars").cast("long").as("sum_v"),
            sum(col("n_chars") * col("n_chars")).cast("long")
              .as("ssq_v")), viewTbl)
    }
    val diff = graft.ops.Cdc.snapshotDiff(
      curr = wh.readVersion(s, tbl, 2),
      prev = wh.readVersion(s, tbl, 1),
      key = "doc_id", attrs = Seq("source", "n_chars"))
    ivmApply(wh.read(s, viewTbl), diff)
  }

  /** The delta algebra alone — stored view + snapshotDiff rows →
    * maintained view. Factored so the spec can drive a constructed
    * FULL-GROUP deletion (the n_rows → 0 drop) the corpus never
    * produces.
    */
  private[graft] def ivmApply(view: DataFrame,
      diff: DataFrame): DataFrame = {
    val neg = diff.filter(col("change_type").isin("delete", "update"))
      .select(col("tgt_source").as("source"),
        lit(-1L).as("n_rows"),
        (-col("tgt_n_chars")).as("sum_v"),
        (-col("tgt_n_chars") * col("tgt_n_chars")).as("ssq_v"))
    val pos = diff.filter(col("change_type").isin("insert", "update"))
      .select(col("src_source").as("source"),
        lit(1L).as("n_rows"),
        col("src_n_chars").as("sum_v"),
        (col("src_n_chars") * col("src_n_chars")).as("ssq_v"))
    view.unionByName(neg).unionByName(pos)
      .groupBy("source")
      .agg(sum("n_rows").cast("long").as("n_rows"),
        sum("sum_v").cast("long").as("sum_v"),
        sum("ssq_v").cast("long").as("ssq_v"))
      .filter(col("n_rows") > 0)
  }

  /** DATA-QUALITY EXPECTATIONS SUITE — the declarative release gate
    * (Great-Expectations practice) next to
    * [[graft.sources.Warehouse.checkConstraints]]'s blocking
    * pre-write check: a rule TABLE evaluated in ONE corpus pass (one
    * aggregate carrying every rule's violation count — a
    * rule-per-scan suite reads the table seven times at 100 TB; this
    * reads it once), unpivoted to the (rule, n_violations, ok)
    * report a release pipeline records. Six rules: key not-null, key
    * uniqueness (count − distinct, the one non-row-predicate rule,
    * riding the same aggregate), length sanity, known-language
    * domain, non-empty text, source-format contract — plus one
    * deliberately tight SLA rule (`n_chars ≤ 500`) the corpus
    * genuinely violates, so the report exercises BOTH verdicts (an
    * all-green suite proves only the happy path; the spec pins both
    * outcomes present).
    */
  val q229 = Q("q229_dq_expectations",
    """WITH a AS (
      |  SELECT count(*) AS n,
      |    count(*) FILTER (WHERE doc_id IS NULL) AS v_null,
      |    count(*) - count(DISTINCT doc_id) AS v_dup,
      |    count(*) FILTER (WHERE n_chars < 1 OR n_chars > 100000)
      |      AS v_len,
      |    count(*) FILTER (WHERE lang NOT IN
      |      ('de', 'en', 'es', 'fr', 'zh')) AS v_lang,
      |    count(*) FILTER (WHERE text IS NULL OR len(text) = 0)
      |      AS v_text,
      |    count(*) FILTER (WHERE NOT regexp_matches(source,
      |      '^src[0-9]+$')) AS v_src,
      |    count(*) FILTER (WHERE n_chars > 500) AS v_sla
      |  FROM documents)
      |SELECT rule, CAST(v AS BIGINT) AS n_violations,
      |  CAST(CASE WHEN v = 0 THEN 1 ELSE 0 END AS BIGINT) AS ok
      |FROM (
      |  SELECT unnest(['key_not_null', 'key_unique', 'len_sane',
      |    'lang_known', 'text_nonempty', 'source_format',
      |    'sla_len_500']) AS rule,
      |    unnest([v_null, v_dup, v_len, v_lang, v_text, v_src,
      |      v_sla]) AS v
      |  FROM a)""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val a = docs.agg(
      count(when(col("doc_id").isNull, 1)).as("v_null"),
      (count(lit(1)) - countDistinct(col("doc_id"))).as("v_dup"),
      count(when(col("n_chars") < 1 || col("n_chars") > 100000, 1))
        .as("v_len"),
      count(when(!col("lang").isin("de", "en", "es", "fr", "zh"), 1))
        .as("v_lang"),
      count(when(col("text").isNull || length(col("text")) === 0, 1))
        .as("v_text"),
      count(when(!col("source").rlike("^src[0-9]+$"), 1)).as("v_src"),
      count(when(col("n_chars") > 500, 1)).as("v_sla"))
    a.select(expr("stack(7, " +
        "'key_not_null', v_null, 'key_unique', v_dup, " +
        "'len_sane', v_len, 'lang_known', v_lang, " +
        "'text_nonempty', v_text, 'source_format', v_src, " +
        "'sla_len_500', v_sla) AS (rule, n_violations)"))
      .select(col("rule"), col("n_violations").cast("long"),
        when(col("n_violations") === 0, 1L).otherwise(0L).as("ok"))
  }

  /** FILE-SKIPPING STATISTICS MANIFEST — the data-skipping layer the
    * lakehouse formats keep (Delta per-file stats, Iceberg manifests)
    * over [[graft.sources.Warehouse.writeManifest]]/`readPruned`:
    * the store is written range-clustered on `o_orderkey` (8 range
    * partitions — each file gets a narrow key span, the layout
    * [[graft.ops.ZOrder.cluster]] generalizes to two keys), a
    * per-file (min, max) manifest is persisted at write time, and
    * the range read consults the MANIFEST to decide which files to
    * open at all — parquet row-group stats then prune within the
    * opened files (the standard two-level stack; the manifest level
    * is what keeps a 100 TB table's range read from touching every
    * file's footer). The oracle computes the same aggregate over the
    * raw corpus with the same predicate — a manifest that drops a
    * file it must keep (boundary rows, off-by-one on the overlap
    * test) loses rows and hash-fails; Round12Spec additionally pins
    * that the consult actually SKIPS files on this layout and that
    * the pruned plan reads fewer files than the full table.
    *
    * Shape: store build + manifest are once-per-corpus writes (one
    * scan each); the gated read is manifest consult (file-grain
    * driver pull, the planner-side read every format performs) +
    * a scan of only the overlapping files + one partial aggregate.
    */
  val q231 = Q("q231_manifest_skipping",
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(min(o_orderkey) AS BIGINT) AS key_min,
      |  CAST(max(o_orderkey) AS BIGINT) AS key_max
      |FROM orders
      |WHERE o_orderkey BETWEEN 1000 AND 5000
      |GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
    val wh = graft.sources.Warehouse(
      graft.SessionScratch.dir(s,
        s"mfstore_${graft.SessionScratch.keyOf(dir)}"))
    val tbl = s"mf_orders_${graft.SessionScratch.keyOf(dir)}"
    graft.SessionScratch.once(s, tbl) {
      wh.overwrite(
        t(s, dir, "orders").repartitionByRange(8, col("o_orderkey")),
        tbl)
      wh.writeManifest(s, tbl, Seq("o_orderkey"))
    }
    wh.readPruned(s, tbl, "o_orderkey", 1000L, 5000L)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum("o_orderkey").cast("long").as("key_sum"),
        min("o_orderkey").cast("long").as("key_min"),
        max("o_orderkey").cast("long").as("key_max"))
  }

  /** POWER-LAW PAGERANK CONTRIBUTION — the skew-hardened form q205's
    * scaladoc promised ("a real web graph's hub skew would take the
    * q29-family salting defenses on the join key"), now BUILT: the
    * synthesized graph gives every doc 4 out-edges whose SOURCE is
    * rerouted to hub node 0 whenever `feistel(4·d+j) mod 4 = 0` —
    * so ~25% of ALL edges share one join key, and the hot key's row
    * count grows LINEARLY with the corpus (the structural killer: a
    * plain hash join on `u` sends every hub edge to ONE reducer
    * task whose work scales with corpus size while every other task
    * stays flat). Destinations are Feistel-uniform; in/out of the
    * 32-bit Feistel domain is masked (the q214 lesson — ScaleSmoke's
    * key-shifted ids exceed small domains). One contribution round
    * `pr'(v) = 150000 + 850·Σ(pr_u div deg_u) div 1000` in exact
    * integers (q205's arithmetic with per-node out-degree), with the
    * edge ⋈ node-rank join run through [[graft.ops.Skew.saltedJoin]]
    * (8 salts): the node-grain side replicates ×8 (cheap — node
    * grain), the hub's edge rows spread across 8 reducers, and the
    * per-task maximum drops ×8 BY CONSTRUCTION. Round12Spec pins the
    * mechanism deterministically (hash-partition row distribution:
    * naive max share ≈ hub share, salted ≈ hub/8) and result
    * equality naive ≡ salted; SCALE.md carries the f=1/4/8 rows.
    * The aggregate on `v` needs no defense — partial aggregation
    * (map-side combine) absorbs destination skew, which is exactly
    * why the JOIN is the member that needs the salt.
    */
  private[graft] def pagerankSkewPlan(s: SparkSession, dir: String,
      salted: Boolean): DataFrame = {
    val docs = t(s, dir, "documents")
    val nRow = docs.agg(count(lit(1)).as("c"))
    val withJ = docs.select(col("doc_id")).crossJoin(broadcast(nRow))
      .select(col("doc_id"), col("c"),
        explode(array(lit(0L), lit(1L), lit(2L), lit(3L))).as("j"))
    val eid = (col("doc_id") * 4 + col("j")) % lit(4294967296L)
    val edges = graft.Materialized(s, s"pgskew_edges:$dir:$salted") {
      withJ.select(
        when(feistel32(eid, lit(21L)) % 4 === 0, lit(0L))
          .otherwise(col("doc_id")).as("u"),
        (feistel32(eid, lit(22L)) % col("c")).as("v"))
    }
    val deg = edges.groupBy("u").agg(count(lit(1)).as("deg"))
    val prU = deg.withColumn("pru",
      lit(1000000L) + (col("u") % 7) * 1000)
    val contrib =
      if (salted) graft.ops.Skew.saltedJoin(edges, prU, Seq("u"), 8)
      else edges.join(prU, Seq("u"))
    val agg = contrib.select(col("v"), expr("pru div deg").as("ct"))
      .groupBy("v").agg(sum("ct").as("sc"))
    docs.select(col("doc_id"), col("source"))
      .join(agg, col("doc_id") === col("v"), "left")
      .select(col("source"),
        (lit(150000L) + expr("850 * coalesce(sc, 0L) div 1000"))
          .as("pr"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("pr").cast("long").as("sum_pr"))
  }

  val q232 = Q("q232_pagerank_skew",
    s"""WITH n AS (SELECT count(*) AS c FROM documents),
       |src AS (
       |  SELECT doc_id, CAST(unnest(range(0, 4)) AS BIGINT) AS j
       |  FROM documents),
       |s2 AS (
       |  SELECT doc_id, j, (doc_id * 4 + j) % 4294967296 AS eid
       |  FROM src),
       |${feistelSqlChain("s2", "eid", "doc_id, j", 21L, "rt")},
       |${feistelSqlChain("s2", "eid", "doc_id, j", 22L, "dst")},
       |e AS MATERIALIZED (
       |  SELECT CASE WHEN rt.y % 4 = 0 THEN 0 ELSE rt.doc_id END AS u,
       |    dst.y % (SELECT c FROM n) AS v
       |  FROM rt JOIN dst ON dst.doc_id = rt.doc_id AND dst.j = rt.j),
       |deg AS (SELECT u, count(*) AS deg FROM e GROUP BY u),
       |pru AS (
       |  SELECT u, deg, 1000000 + (u % 7) * 1000 AS pru FROM deg),
       |ct AS (
       |  SELECT e.v, sum(p.pru // p.deg) AS sc
       |  FROM e JOIN pru p ON p.u = e.u GROUP BY e.v)
       |SELECT d.source, count(*) AS n_docs,
       |  CAST(sum(150000 + (850 * coalesce(ct.sc, 0)) // 1000)
       |    AS BIGINT) AS sum_pr
       |FROM documents d LEFT JOIN ct ON ct.v = d.doc_id
       |GROUP BY d.source""".stripMargin) { (s, dir) =>
    pagerankSkewPlan(s, dir, salted = true)
  }

  /** Z-ORDER × MANIFEST BOX READ — the composition the two pieces
    * exist for (Delta/Iceberg `ZORDER BY` + per-file stats, end to
    * end): orders is written through [[graft.ops.ZOrder.cluster]] on
    * (o_custkey, o_orderkey) — every file then spans a COMPACT
    * RECTANGLE of the key plane — a manifest records both columns'
    * per-file extents, and a 2-D box predicate consults it
    * conjunctively ([[graft.sources.Warehouse.readPrunedBox]]),
    * skipping files on EITHER dimension. The property that makes the
    * curve worth its one range exchange at write time: a single-key
    * sort leaves the second key's per-file extents spanning the full
    * domain (its dimension never skips) — Round12Spec builds exactly
    * that rival layout and pins strictly more files kept for the
    * same predicate. The oracle computes the box aggregate over the
    * raw corpus — a manifest consult that over-prunes loses rows and
    * hash-fails.
    *
    * Shape: store + manifest build once (once-key); per-run cost is
    * the file-grain consult + a scan of the overlapping files + one
    * partial aggregate. At 100 TB the box read touches the files
    * whose rectangles intersect the box — O(result locality), not
    * O(table).
    */
  val q235 = Q("q235_zorder_box_read",
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(sum(o_custkey) AS BIGINT) AS cust_sum
      |FROM orders
      |WHERE o_custkey BETWEEN 10 AND 60
      |  AND o_orderkey BETWEEN 1 AND 30000
      |GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
    val wh = graft.sources.Warehouse(
      graft.SessionScratch.dir(s,
        s"zmstore_${graft.SessionScratch.keyOf(dir)}"))
    val tbl = s"zm_orders_${graft.SessionScratch.keyOf(dir)}"
    graft.SessionScratch.once(s, tbl) {
      wh.overwrite(
        graft.ops.ZOrder.cluster(t(s, dir, "orders"),
          col("o_custkey"), col("o_orderkey"), bits = 10,
          partitions = 8).drop("z"),
        tbl)
      wh.writeManifest(s, tbl, Seq("o_custkey", "o_orderkey"))
    }
    wh.readPrunedBox(s, tbl,
        Seq(("o_custkey", 10L, 60L), ("o_orderkey", 1L, 30000L)))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum("o_orderkey").cast("long").as("key_sum"),
        sum("o_custkey").cast("long").as("cust_sum"))
  }

  /** INCREMENTAL MANIFEST MAINTENANCE — the commit-time stats shape
    * that makes q231's skip layer affordable under append traffic:
    * wave 0 builds the store + manifest, wave 1 lands through
    * [[graft.sources.Warehouse.appendWithManifest]] — the data
    * append is O(delta) and the stats pass reads back ONLY the files
    * the append created (listing diff), never rescanning the table
    * (every real format writes per-file stats into the commit for
    * exactly this reason). The waves interleave on the key
    * (`o_orderkey mod 3`), so both span the queried range and a
    * pruned read that misses delta manifest rows loses ~⅓ of every
    * group — the oracle's plain filtered aggregate hash-fails on
    * any stale-manifest bug. Round12Spec additionally pins the
    * incremental manifest BYTE-EQUAL (row-set) to a from-scratch
    * recompute, and that the append left existing manifest rows
    * untouched (fragment files accrete).
    */
  /** The two-wave manifested orders store q236 and q239 share (one
    * once-key — whichever runs first pays the build, the q167/q225
    * convention): wave 0 overwrite + manifest, wave 1 through the
    * O(delta) [[graft.sources.Warehouse.appendWithManifest]]; waves
    * interleave on `o_orderkey mod 3` so both span every key range.
    */
  private def imStore(s: SparkSession,
      dir: String): (graft.sources.Warehouse, String) = {
    val wh = graft.sources.Warehouse(
      graft.SessionScratch.dir(s,
        s"imstore_${graft.SessionScratch.keyOf(dir)}"))
    val tbl = s"im_orders_${graft.SessionScratch.keyOf(dir)}"
    graft.SessionScratch.once(s, tbl) {
      val o = t(s, dir, "orders")
      wh.overwrite(o.filter(col("o_orderkey") % 3 =!= 0)
        .repartitionByRange(4, col("o_orderkey")), tbl)
      wh.writeManifest(s, tbl, Seq("o_orderkey"))
      wh.appendWithManifest(s,
        o.filter(col("o_orderkey") % 3 === 0)
          .repartitionByRange(4, col("o_orderkey")),
        tbl, Seq("o_orderkey"))
    }
    (wh, tbl)
  }

  val q236 = Q("q236_manifest_incremental",
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS cust_cnt
      |FROM orders
      |WHERE o_orderkey BETWEEN 500 AND 4500
      |GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
    val (wh, tbl) = imStore(s, dir)
    wh.readPruned(s, tbl, "o_orderkey", 500L, 4500L)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum("o_orderkey").cast("long").as("key_sum"),
        countDistinct("o_custkey").cast("long").as("cust_cnt"))
  }

  /** PER-FILE BLOOM POINT LOOKUP — the equality complement to
    * q231/q235's range extents: the store is range-clustered on
    * o_orderkey, so every file's [min, max] on o_custkey spans
    * nearly the whole domain and the RANGE consult keeps everything
    * (Round12Spec pins that contrast) — but the Bloom sidecar
    * ([[graft.sources.Warehouse.writeBloomManifest]]) records each
    * file's k=4 hash positions per key over a 4096-bit space, and a
    * point probe opens only files whose filter admits the key.
    * Absence of any position is a PROOF of absence (no false
    * negatives), so the oracle's plain `o_custkey = 42` rows gate
    * the whole path: an over-pruning filter loses rows and
    * hash-fails; a false positive only opens a file for nothing.
    * Build and consult share ONE hash derivation (Spark's xxhash64
    * fold mirrored through the same catalyst XXH64 kernel) — the
    * two sides cannot drift.
    *
    * Shape: sidecar builds once (one scan, k-position explode,
    * file-grain aggregate); the probe is a file-grain driver consult
    * + a scan of admitted files only — at 100 TB a key lookup
    * touches the handful of files that contain it, not the table.
    */
  val q237 = Q("q237_bloom_point_lookup",
    """SELECT o_orderkey, o_orderstatus FROM orders
      |WHERE o_custkey = 42""".stripMargin) { (s, dir) =>
    val wh = graft.sources.Warehouse(
      graft.SessionScratch.dir(s,
        s"blstore_${graft.SessionScratch.keyOf(dir)}"))
    val tbl = s"bl_orders_${graft.SessionScratch.keyOf(dir)}"
    graft.SessionScratch.once(s, tbl) {
      wh.overwrite(t(s, dir, "orders")
        .repartitionByRange(8, col("o_orderkey")), tbl)
      wh.writeManifest(s, tbl, Seq("o_custkey"))
      wh.writeBloomManifest(s, tbl, "o_custkey")
    }
    wh.readPointLookup(s, tbl, "o_custkey", 42L)
      .select("o_orderkey", "o_orderstatus")
  }

  /** METADATA-ONLY COUNT with boundary refinement — the plan every
    * lakehouse engine runs for `SELECT count(*) WHERE key BETWEEN …`
    * over stats-manifested files ([[graft.sources.Warehouse
    * .countPruned]]): files whose extents sit FULLY inside the range
    * contribute their manifest `n_rows` without being opened; only
    * the files straddling an endpoint are scanned with the exact
    * predicate. Three ranges gate the tiers together — the
    * whole-domain range (every file interior: a PURE metadata
    * answer, zero files opened — spec-pinned boundary = 0), a wide
    * mid range (interior + 2-ish boundary files), and a narrow range
    * (boundary-only). The oracle counts the raw corpus; any
    * interior/boundary misclassification double- or under-counts
    * and hash-fails. On a range-clustered 100 TB table the boundary
    * is O(2 files) REGARDLESS of range width — count cost is
    * metadata + two file scans where a plain plan scans the range.
    */
  val q239 = Q("q239_metadata_count",
    """SELECT * FROM (
      |  SELECT CAST(1 AS BIGINT) AS range_id,
      |    CAST(count(*) AS BIGINT) AS n FROM orders
      |  WHERE o_orderkey BETWEEN 0 AND 999999999
      |  UNION ALL
      |  SELECT 2, count(*) FROM orders
      |  WHERE o_orderkey BETWEEN 500 AND 4500
      |  UNION ALL
      |  SELECT 3, count(*) FROM orders
      |  WHERE o_orderkey BETWEEN 700 AND 760) t""".stripMargin) {
    (s, dir) =>
    import s.implicits._
    val (wh, tbl) = imStore(s, dir)
    val ranges = Seq((1L, 0L, 999999999L), (2L, 500L, 4500L),
      (3L, 700L, 760L))
    ranges.map { case (rid, lo, hi) =>
      (rid, wh.countPruned(s, tbl, "o_orderkey", lo, hi)._1)
    }.toDF("range_id", "n")
  }

  /** INCREMENTAL RE-CLUSTERING — the `OPTIMIZE ZORDER` maintenance
    * pass over an appended store ([[graft.sources.Warehouse
    * .reclusterDelta]]): wave 0 is written z-clustered (marker
    * records its files), wave 1 appends UNclustered (manifest kept
    * fresh by the O(delta) append path), and the recluster rewrites
    * ONLY the delta files through the curve — closed files are never
    * read again, the property that keeps nightly maintenance
    * affordable at 100 TB. The commit is roll-forward journaled
    * (stage outside the table → journal moves+deletes → mutate;
    * Round12Spec pins crash recovery mid-commit, untouched-closed-
    * file mtimes, and content preservation). The gated box read then
    * consults the maintained manifest over the FULLY-clustered
    * layout; waves interleave on the key so a recluster that drops
    * or duplicates delta rows hash-fails against the oracle's plain
    * box aggregate.
    */
  val q240 = Q("q240_recluster_incremental",
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(sum(o_custkey) AS BIGINT) AS cust_sum
      |FROM orders
      |WHERE o_custkey BETWEEN 20 AND 80
      |  AND o_orderkey BETWEEN 100 AND 1200
      |GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
    val wh = graft.sources.Warehouse(
      graft.SessionScratch.dir(s,
        s"rcstore_${graft.SessionScratch.keyOf(dir)}"))
    val tbl = s"rc_orders_${graft.SessionScratch.keyOf(dir)}"
    val mcols = Seq("o_custkey", "o_orderkey")
    graft.SessionScratch.once(s, tbl) {
      val o = t(s, dir, "orders")
      wh.overwrite(
        graft.ops.ZOrder.cluster(o.filter(col("o_orderkey") % 2 === 0),
          col("o_custkey"), col("o_orderkey"), bits = 10,
          partitions = 4).drop("z"),
        tbl)
      wh.markClustered(tbl)
      wh.writeManifest(s, tbl, mcols)
      wh.appendWithManifest(s,
        o.filter(col("o_orderkey") % 2 === 1), tbl, mcols)
      wh.reclusterDelta(s, tbl, "o_custkey", "o_orderkey", mcols,
        partitions = 4)
    }
    wh.readPrunedBox(s, tbl,
        Seq(("o_custkey", 20L, 80L), ("o_orderkey", 100L, 1200L)))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum("o_orderkey").cast("long").as("key_sum"),
        sum("o_custkey").cast("long").as("cust_sum"))
  }

  /** IVM FOR NON-INVERTIBLE AGGREGATES — the rescan path q227
    * deliberately excluded ("MIN/MAX excluded with the rescan
    * caveat"), now BUILT: a per-source MIN/MAX view maintained under
    * deletes by rescanning ONLY the AFFECTED groups — those where a
    * deleted row actually ATTAINED the stored extreme (a delete that
    * never touched the min or max cannot move either, so its group
    * carries forward untouched — the classic textbook refinement of
    * "MIN/MAX always rescans"). The output carries the `rescanned`
    * flag per group, making the maintenance structure itself part of
    * the gate; crucially the oracle computes the TRUE post-delete
    * extremes directly from the surviving rows (algorithm-free) and
    * derives the flag independently — so a carried group whose
    * extreme should have moved (an under-rescan bug) hash-fails on
    * the VALUE, not just the flag. Spec pins both flag classes
    * non-vacuous on this corpus.
    *
    * Shape at 100 TB: the affected-group set is O(groups touched by
    * deletes at their extremes) — the rescan reads only those
    * groups' partitions (partition-pruned on the group key in a
    * production layout); everything else is delta-grain.
    */
  val q242 = Q("q242_ivm_minmax_rescan",
    """WITH v1 AS (
      |  SELECT source, min(n_chars) AS min1, max(n_chars) AS max1
      |  FROM documents GROUP BY source),
      |aff AS (
      |  SELECT DISTINCT d.source FROM documents d
      |  JOIN v1 ON v1.source = d.source
      |  WHERE d.doc_id % 9 = 0
      |    AND (d.n_chars = v1.min1 OR d.n_chars = v1.max1)),
      |v2 AS (SELECT * FROM documents WHERE doc_id % 9 <> 0)
      |SELECT v2.source,
      |  CAST(min(v2.n_chars) AS BIGINT) AS min_chars,
      |  CAST(max(v2.n_chars) AS BIGINT) AS max_chars,
      |  CAST(CASE WHEN a.source IS NULL THEN 0 ELSE 1 END AS BIGINT)
      |    AS rescanned
      |FROM v2 LEFT JOIN aff a ON a.source = v2.source
      |GROUP BY v2.source, a.source""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val v1 = docs.groupBy("source")
      .agg(min("n_chars").as("min1"), max("n_chars").as("max1"))
    val affected = docs.filter(col("doc_id") % 9 === 0)
      .join(v1, "source")
      .filter(col("n_chars") === col("min1") ||
        col("n_chars") === col("max1"))
      .select("source").distinct()
    val v2 = docs.filter(col("doc_id") % 9 =!= 0)
    val rescanned = v2.join(broadcast(affected), Seq("source"))
      .groupBy("source")
      .agg(min("n_chars").cast("long").as("min_chars"),
        max("n_chars").cast("long").as("max_chars"))
      .withColumn("rescanned", lit(1L))
    val carried = v1.join(broadcast(affected), Seq("source"),
        "left_anti")
      .select(col("source"), col("min1").cast("long").as("min_chars"),
        col("max1").cast("long").as("max_chars"),
        lit(0L).as("rescanned"))
    rescanned.unionByName(carried)
  }

  val all: Seq[Q] = Seq(q204, q205, q206, q207, q208, q209, q210,
    q211, q213, q214, q215, q217, q218, q219, q220, q221, q222, q223,
    q224, q225, q226, q227, q229, q231, q232, q235, q236, q237, q239,
    q240, q242)
}
