package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.ops.Components
import graft.sources.{Tables, Warehouse}
import graft.text.{SignatureStore, TextOps}

/** Training-data text pipeline over `documents`: exact + near dedup
  * (MinHash/LSH, SimHash, n-gram Jaccard), language ID, quality scoring,
  * token stats, fingerprints. Every hash is md5-based so the DuckDB
  * oracle reproduces results exactly (see TextOps scaladoc).
  *
  * Scale notes: shingling/minhashing is a narrow explode + one groupBy
  * per doc (shuffle on doc_id only); LSH candidate generation joins on
  * band keys with bucket-size capping (2..20) so no quadratic blowup on
  * hot buckets — at 100 TB the cap is what keeps skewed buckets from
  * dominating (same idea as AQE skew-split, but semantic).
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")

  /** Head fingerprint (md5 of the first 64 normalized chars) — shared
    * by q36's fingerprint set, q51's dedup keep, q57's decontamination.
    */
  private def headFp: Column =
    md5(TextOps.normalize(col("text")).substr(lit(1), lit(64)))

  private val headFpSql =
    """md5(substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |               1, 64))""".stripMargin

  /** 6-component MinHash signature per doc — per-row scalar
    * expressions (TextOps.minhashExpr): a map-only projection, no
    * explode/shuffle. Materialized once per session because every LSH
    * consumer references it several times and the md5 work is worth
    * one materialization — at 100 TB this is the signature table a
    * pipeline writes to storage (Materialized is the in-session
    * stand-in, shared across registry runs, unpersisted via clear()).
    */
  private def signatures(s: SparkSession, dir: String): DataFrame = {
    // native codegen'd builder (graft.functions.MinhashSigF) — the HOF
    // spec it reproduces bit-for-bit is:
    //   transform(sequence(0, 5), seed =>
    //     array_min(transform(shinglePositions(text, 8, 4),
    //       i => md5(concat(seed, ":", substr(text, i, 8))))))
    // (equivalence property-tested in Round3Spec); cached as an array —
    // the element_at unpacking sits above the cache so projection
    // collapse can't inline the build 6×
    graft.Materialized(s, s"minhash_signatures:$dir") {
      // NOT Par.spread: measured 2025-08 (OPTIMIZATION_r19.md) — a
      // 32/64-partition signature cache makes every downstream
      // candidate-pair stage schedule dozens of tiny tasks and the
      // LSH consumers regress (q120 2.0x, q127 1.6x) for no win; the
      // few-row artifact reads faster at the scan's native layout
      docs(s, dir).select(col("doc_id"),
        graft.functions.TextHashF.minhashSig(col("text"), 8, 4, 6)
          .as("mh"))
    }.select(col("doc_id") +:
      (0 to 5).map(i => element_at(col("mh"), i + 1).as(s"mh$i")): _*)
  }

  /** The LSH band-key table (doc_id, band, key) derived from the
    * signatures — the second shared artifact (q30 joins it to itself).
    */
  private def bands(s: SparkSession, dir: String): DataFrame = {
    val sig = signatures(s, dir)
    graft.Materialized(s, s"minhash_bands:$dir") {
      sig.select(col("doc_id"), lit(0L).as("band"),
        concat(col("mh0"), col("mh1"), col("mh2")).as("key"))
        .unionByName(sig.select(col("doc_id"), lit(1L).as("band"),
          concat(col("mh3"), col("mh4"), col("mh5")).as("key")))
    }
  }

  /** Per-document character-4-gram sets (q31's join input) — native
    * builder, spec = TextOps.shingleSet (Round3Spec equivalence).
    */
  private def gramSets(s: SparkSession, dir: String): DataFrame =
    graft.Materialized(s, s"gram_sets:$dir") {
      // immutable testdata; referenced by both join sides.
      // NOT Par.spread: same measured join-consumer regression as
      // signatures() (q91 0.39s -> 0.99s with a 32-partition cache)
      docs(s, dir).select(col("doc_id"),
        graft.functions.TextHashF.shingleSet(col("text"), 4, 1).as("gs"))
    }

  /** Build every shared [[graft.Materialized]] artifact of this module
    * up front (Bench's unbilled warm-up): in production these are
    * tables on storage, so no single query should be billed their
    * construction.
    */
  def prewarm(s: SparkSession, dir: String): Unit = {
    signatures(s, dir).count()
    bands(s, dir).count()
    gramSets(s, dir).count()
    simhashes(s, dir).count()
    ()
  }

  /** The MinHash signature CTE over an arbitrary source relation —
    * q127 computes signatures over its GATED population (a per-doc
    * map-only function, so gating before or after signing is
    * equivalent; the CAPS below are what must see the gated set).
    */
  private def shingleSqlCteFrom(src: String): String =
    s"""sh AS (
       |  SELECT doc_id,
       |    substr(text,
       |      CAST(unnest(range(1, greatest(len(text)-7,1)+1, 4)) AS INT),
       |      8) AS sh
       |  FROM $src),
       |sig AS (
       |  SELECT doc_id,
       |    min(md5('0:' || sh)) AS mh0, min(md5('1:' || sh)) AS mh1,
       |    min(md5('2:' || sh)) AS mh2, min(md5('3:' || sh)) AS mh3,
       |    min(md5('4:' || sh)) AS mh4, min(md5('5:' || sh)) AS mh5
       |  FROM sh GROUP BY doc_id)""".stripMargin

  private val shingleSqlCte = shingleSqlCteFrom("documents")

  /** Exact dedup: count distinct normalized-text hashes per source. */
  val q28 = Q("q28_dedup_exact",
    """SELECT source, count(*) AS n_docs,
      |  count(DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9 ]', '',
      |                                    'g'))) AS n_distinct
      |FROM documents GROUP BY source""".stripMargin) { (s, dir) =>
    docs(s, dir).groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(TextOps.normalize(col("text"))))
          .as("n_distinct"))
  }

  /** MinHash signatures (the reusable near-dup index). */
  val q29 = Q("q29_minhash_signature",
    s"""WITH $shingleSqlCte
       |SELECT doc_id, mh0, mh1, mh2, mh3, mh4, mh5 FROM sig""".stripMargin) {
    (s, dir) => signatures(s, dir)
  }

  /** LSH candidate pairs: 2 bands × 3 minhash components; buckets capped
    * at 2..20 docs before the pair join (bounded output, skew-proof).
    */
  val q30 = Q("q30_lsh_candidates",
    s"""WITH $shingleSqlCte,
       |b AS (
       |  SELECT doc_id, 0 AS band, mh0 || mh1 || mh2 AS key FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, mh3 || mh4 || mh5 AS key FROM sig),
       |sized AS (
       |  SELECT band, key FROM b GROUP BY band, key
       |  HAVING count(*) BETWEEN 2 AND 20)
       |SELECT DISTINCT CAST(a.band AS BIGINT) AS band,
       |  a.doc_id AS doc_a, c.doc_id AS doc_b
       |FROM sized x
       |JOIN b a ON a.band = x.band AND a.key = x.key
       |JOIN b c ON c.band = x.band AND c.key = x.key
       |  AND a.doc_id < c.doc_id""".stripMargin) { (s, dir) =>
    val bnd = bands(s, dir)
    val sized = bnd.groupBy("band", "key").agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, 20)).select("band", "key")
    val a = bnd.join(sized, Seq("band", "key"))
    val b = a.select(col("band"), col("key"), col("doc_id").as("doc_b"))
    a.select(col("band"), col("key"), col("doc_id").as("doc_a"))
      .join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("band", "doc_a", "doc_b").distinct()
  }

  /** Character 4-gram Jaccard between consecutive doc ids — exact
    * near-dup verification (integer set arithmetic, one division).
    */
  val q31 = Q("q31_ngram_jaccard",
    """WITH s AS (
      |  SELECT DISTINCT doc_id,
      |    substr(text,
      |      CAST(unnest(range(1, greatest(len(text)-3,1)+1)) AS INT),
      |      4) AS g
      |  FROM documents),
      |c AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
      |i AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
      |  FROM s a JOIN s b ON b.g = a.g AND b.doc_id = a.doc_id + 1
      |  GROUP BY 1, 2)
      |SELECT i.doc_a, i.doc_b,
      |  round(CAST(i.ni AS DOUBLE) / (ca.n + cb.n - i.ni), 6) AS jaccard
      |FROM i
      |JOIN c ca ON ca.doc_id = i.doc_a
      |JOIN c cb ON cb.doc_id = i.doc_b""".stripMargin) { (s, dir) =>
    // Per-row gram SETS (no explode/shuffle), then a tiny doc→doc+1
    // equi-join and array_intersect — the whole query is one narrow
    // join on doc ids instead of a |docs|×|grams| shuffle + self-join.
    val sets = gramSets(s, dir)
    val b = sets.select((col("doc_id") - 1).as("doc_id"),
      col("gs").as("gs_b"))
    sets.join(b, Seq("doc_id"))
      .select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b"),
        size(array_intersect(col("gs"), col("gs_b"))).as("ni"),
        size(col("gs")).as("na"), size(col("gs_b")).as("nb"))
      .filter(col("ni") > 0) // oracle's inner join keeps overlapping pairs
      .select(col("doc_a"), col("doc_b"),
        round(col("ni").cast("double") /
          (col("na") + col("nb") - col("ni")), 6).as("jaccard"))
  }

  /** The oracle-side SimHash CTE chain at `nBits`, ending in a CTE
    * `out`(doc_id, simhash) — mirrors TextOps.simhash bit-for-bit.
    */
  private def simhashSqlCte(nBits: Int, out: String): String =
    s"""tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |hx AS (SELECT doc_id, md5(w) AS h FROM tok),
       |bits AS (
       |  SELECT doc_id, CAST(unnest(range(0, $nBits)) AS INT) AS b, h
       |  FROM hx),
       |bv AS (
       |  SELECT doc_id, b,
       |    CAST(floor((strpos('0123456789abcdef',
       |                       substr(h, b // 4 + 1, 1)) - 1)
       |               / power(2, b % 4)) AS INT) % 2 AS bit
       |  FROM bits),
       |wg AS (SELECT doc_id, b, sum(2 * bit - 1) AS wgt
       |       FROM bv GROUP BY doc_id, b),
       |$out AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN wgt > 0 THEN CAST(power(2, b) AS BIGINT)
       |                 ELSE 0 END) AS BIGINT) AS simhash
       |  FROM wg GROUP BY doc_id)""".stripMargin

  /** 16-bit SimHash over whitespace tokens (duplicate-weighted).
    * Engine side reads the shared 60-bit signature artifact and masks
    * its low 16 bits — bit b < 16 of the 60-bit signature IS the
    * 16-bit signature's bit b (same per-token md5 digits, same weight
    * fold), so one stored signature table serves every width ≤ 60.
    * The underlying TextOps.simhash is a per-row aggregate/zip_with
    * fold, map-only at any scale (the oracle's explode-per-bit chain
    * is the spec, not the plan).
    */
  val q32 = Q("q32_simhash",
    s"""WITH ${simhashSqlCte(16, "sg")}
       |SELECT doc_id, simhash FROM sg""".stripMargin) { (s, dir) =>
    simhashes(s, dir).select(col("doc_id"),
      col("sh").bitwiseAND(lit((1L << 16) - 1)).as("simhash"))
  }

  /** q49 constants: a 60-bit production-width signature (widest that
    * stays a non-negative BIGINT — a production store would hold 64+
    * bits as binary), banded Manku-style into 4 blocks; each band keys
    * on the low `Simhash49BandBits` bits of its 15-bit block, sized
    * with the planesFor formula so the expected bucket stays
    * ~constant. Fingerprint width is the scale ceiling: 4×15-bit
    * blocks cap the usable band key space at 2^15, enough for ~32k×
    * targetBucket docs — beyond that, widen the fingerprint (md5 has
    * 128 bits available), not the cap.
    */
  private val Simhash49Bits = 60
  private val Simhash49Bands = 4
  private val Simhash49BandBits =
    math.min(15, graft.sim.Similarity.planesFor(5000L, 20))
  private val Simhash49MaxBucket = 20
  private val Simhash49MaxHamming = 8

  /** The shared 60-bit signature artifact (q49's index; in production
    * a stored table, like the MinHash signatures).
    */
  private def simhashes(s: SparkSession, dir: String): DataFrame =
    graft.Materialized(s, s"simhash60:$dir") {
      // native builder, spec = TextOps.simhash (Round3Spec equivalence).
      // NOT Par.spread — same measured consumer regression as
      // signatures(); see that build's note
      docs(s, dir).select(col("doc_id"),
        graft.functions.TextHashF.simhash(col("text"), Simhash49Bits)
          .as("sh"))
    }

  /** SimHash→candidates: the consumer the q32 signature exists for.
    * Band the 60-bit signature (bit sampling per 15-bit block), cap
    * buckets at 2..Simhash49MaxBucket before the pair join (the q30/
    * q39 skew guard — a hot bucket can never go quadratic), then keep
    * pairs within Hamming ≤ Simhash49MaxHamming via xor + bit_count
    * on the FULL signature. Map-only signature, one bounded pair join
    * — the Manku-et-al near-dup shape on Spark.
    */
  val q49 = Q("q49_simhash_neardup",
    s"""WITH ${simhashSqlCte(Simhash49Bits, "sg")},
       |b AS (
       |  SELECT doc_id, simhash AS sh,
       |    CAST(unnest(range(0, $Simhash49Bands)) AS INT) AS band
       |  FROM sg),
       |bk AS (
       |  SELECT doc_id, sh, band,
       |    (sh >> (${Simhash49Bits / Simhash49Bands} * band))
       |      & ${(1 << Simhash49BandBits) - 1} AS key
       |  FROM b),
       |sized AS (
       |  SELECT band, key FROM bk GROUP BY band, key
       |  HAVING count(*) BETWEEN 2 AND $Simhash49MaxBucket),
       |p AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
       |    CAST(bit_count(xor(a.sh, c.sh)) AS BIGINT) AS hamming
       |  FROM sized x
       |  JOIN bk a ON a.band = x.band AND a.key = x.key
       |  JOIN bk c ON c.band = x.band AND c.key = x.key
       |    AND a.doc_id < c.doc_id)
       |SELECT doc_a, doc_b, hamming FROM p
       |WHERE hamming <= $Simhash49MaxHamming""".stripMargin) { (s, dir) =>
    graft.text.NearDup.simhashCandidates(simhashes(s, dir),
      Simhash49Bands, Simhash49Bits / Simhash49Bands, Simhash49BandBits,
      Simhash49MaxBucket, Simhash49MaxHamming)
  }

  /** BPE-ish pre-tokenizer on SYNTHESIZED mixed text: the corpus is
    * letters+spaces (where bpeChunks degenerates to the word count),
    * so each doc's text is extended in-query with digit runs,
    * punctuation runs, an apostrophe suffix, and a doc_id-derived
    * mixed alnum token — both engines build the identical string, so
    * every branch of the chunk pattern is exercised under the oracle.
    */
  val q50 = Q("q50_bpe_chunks",
    """WITH m AS (
      |  SELECT doc_id,
      |    text || ' a1b2, don''t stop-me 42!! x'
      |         || CAST(doc_id % 97 AS VARCHAR) AS mt
      |  FROM documents),
      |ch AS (
      |  SELECT doc_id,
      |    regexp_extract_all(mt,
      |      '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+',
      |      0) AS chunks
      |  FROM m)
      |SELECT doc_id,
      |  CAST(len(chunks) AS BIGINT) AS n_chunks,
      |  CAST(len(list_filter(chunks,
      |    c -> regexp_full_match(c, ' ?[0-9]+'))) AS BIGINT) AS n_digit
      |FROM ch""".stripMargin) { (s, dir) =>
    val mt = concat(col("text"), lit(" a1b2, don't stop-me 42!! x"),
      (col("doc_id") % 97).cast("string"))
    docs(s, dir).select(col("doc_id"),
        TextOps.bpeChunks(mt).as("chunks"))
      .select(col("doc_id"),
        size(col("chunks")).cast("long").as("n_chunks"),
        size(filter(col("chunks"), c => c.rlike("^ ?[0-9]+$")))
          .cast("long").as("n_digit"))
  }

  /** The dedup MATERIALIZATION — the operator a training-data pipeline
    * runs last: per q36 HEAD fingerprint (md5 of the first 64
    * normalized chars — the prefix policy that also collapses docs
    * differing only in their tails) keep the lowest doc_id (min) and
    * its source (min_by), count the collapsed duplicates. One shuffle
    * on the fingerprint with map-side partial aggregation; at 100 TB
    * this is the job that writes the deduplicated corpus.
    */
  val q51 = Q("q51_dedup_keep",
    s"""WITH f AS (
       |  SELECT doc_id, source,
       |    $headFpSql AS fp
       |  FROM documents)
       |SELECT fp, min(doc_id) AS keep_id, min_by(source, doc_id) AS source,
       |  count(*) AS n_dups
       |FROM f GROUP BY fp""".stripMargin) { (s, dir) =>
    docs(s, dir)
      .select(col("doc_id"), col("source"), headFp.as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_id"),
        min_by(col("source"), col("doc_id")).as("source"),
        count(lit(1)).as("n_dups"))
  }

  /** PII scan + redaction — the compliance pass a curation pipeline
    * runs before training. The corpus is letters+spaces, so PII is
    * synthesized in-query from doc_id (only on some docs — % 3/5/7 —
    * so counts genuinely vary): both engines build the identical
    * string, count emails / IPv4s / phone-like runs, and fingerprint
    * the REDACTED text (each match class replaced by a tag). Patterns
    * avoid lookarounds/backreferences so Java regex and RE2 agree.
    * Map-only at any scale.
    */
  val q52 = Q("q52_pii_scan",
    """WITH m AS (
      |  SELECT doc_id,
      |    text
      |      || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
      |           || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
      |      || CASE WHEN doc_id % 5 = 0 THEN ' ip 10.0.'
      |           || CAST(doc_id % 256 AS VARCHAR) || '.7' ELSE '' END
      |      || CASE WHEN doc_id % 7 = 0 THEN ' tel 555-0'
      |           || CAST(doc_id % 100 AS VARCHAR) ELSE '' END AS mt
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(mt,
      |    '[a-z0-9._]+@[a-z0-9.-]+\.[a-z][a-z]+', 0)) AS BIGINT) AS n_email,
      |  CAST(len(regexp_extract_all(mt,
      |    '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+', 0)) AS BIGINT) AS n_ip,
      |  CAST(len(regexp_extract_all(mt,
      |    '[0-9][0-9][0-9]-[0-9]+', 0)) AS BIGINT) AS n_phone,
      |  md5(regexp_replace(regexp_replace(regexp_replace(mt,
      |    '[a-z0-9._]+@[a-z0-9.-]+\.[a-z][a-z]+', '<EMAIL>', 'g'),
      |    '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+', '<IP>', 'g'),
      |    '[0-9][0-9][0-9]-[0-9]+', '<PHONE>', 'g')) AS red_fp
      |FROM m""".stripMargin) { (s, dir) =>
    val emailPat = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z][a-z]+"
    val ipPat = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
    val phonePat = "[0-9][0-9][0-9]-[0-9]+"
    val mt = concat(col("text"),
      when(col("doc_id") % 3 === 0, concat(lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com"))).otherwise(""),
      when(col("doc_id") % 5 === 0, concat(lit(" ip 10.0."),
        (col("doc_id") % 256).cast("string"), lit(".7"))).otherwise(""),
      when(col("doc_id") % 7 === 0, concat(lit(" tel 555-0"),
        (col("doc_id") % 100).cast("string"))).otherwise(""))
    def count(pat: String) =
      size(regexp_extract_all(col("mt"), lit(pat), lit(0))).cast("long")
    docs(s, dir).select(col("doc_id"), mt.as("mt"))
      .select(col("doc_id"),
        count(emailPat).as("n_email"),
        count(ipPat).as("n_ip"),
        count(phonePat).as("n_phone"),
        md5(regexp_replace(regexp_replace(regexp_replace(col("mt"),
          emailPat, "<EMAIL>"), ipPat, "<IP>"), phonePat, "<PHONE>"))
          .as("red_fp"))
  }

  /** Repetition metrics (the Gopher-family quality filters): total vs
    * distinct token / 2-gram / 3-gram counts per document — high
    * duplicate fractions flag boilerplate/spam for removal. Counts,
    * not ratios, cross the engine boundary (exact integers — a ratio
    * like m/640 can land exactly ON a 6dp round-half boundary, which
    * engines break differently); the consumer derives 1 − u/n. Pure
    * per-row array arithmetic (no explode, no shuffle): n-grams are
    * built by indexing the token array in place.
    */
  val q53 = Q("q53_repetition",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, n, toks,
      |    CASE WHEN n >= 2 THEN list_transform(range(1, n),
      |      i -> toks[i] || ' ' || toks[i + 1])
      |      ELSE [] END AS g2,
      |    CASE WHEN n >= 3 THEN list_transform(range(1, n - 1),
      |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
      |      ELSE [] END AS g3
      |  FROM t)
      |SELECT doc_id,
      |  CAST(n AS BIGINT) AS n_tok,
      |  CAST(len(list_distinct(toks)) AS BIGINT) AS u_tok,
      |  CAST(len(g2) AS BIGINT) AS n_2g,
      |  CAST(len(list_distinct(g2)) AS BIGINT) AS u_2g,
      |  CAST(len(g3) AS BIGINT) AS n_3g,
      |  CAST(len(list_distinct(g3)) AS BIGINT) AS u_3g
      |FROM g""".stripMargin) { (s, dir) =>
    val toks = TextOps.tokens(col("text"))
    val n = size(toks)
    // k-grams as k shifted slices of the token array zipped together —
    // zip_with walks the arrays directly; the index-generating
    // (sequence + element_at per position) formulation paid a boxed
    // array lookup per (position, offset) and was ~8× the cost of the
    // rest of the suite's map-only queries
    def grams(k: Int): Column =
      (0 until k).map(j => slice(toks, lit(j + 1), n - (k - 1)))
        .reduceRight((a, b) => zip_with(a, b,
          (x, y) => concat(x, lit(" "), y)))
    def uniq(g: Column): Column = size(array_distinct(g)).cast("long")
    docs(s, dir).select(col("doc_id"),
      n.cast("long").as("n_tok"),
      uniq(toks).as("u_tok"),
      when(n >= 2, (n - 1).cast("long")).otherwise(0L).as("n_2g"),
      when(n >= 2, uniq(grams(2))).otherwise(0L).as("u_2g"),
      when(n >= 3, (n - 2).cast("long")).otherwise(0L).as("n_3g"),
      when(n >= 3, uniq(grams(3))).otherwise(0L).as("u_3g"))
  }

  /** Benchmark DECONTAMINATION — remove training documents that
    * collide with a held-out evaluation set (here: every 10th doc
    * stands in for the benchmark; a real pipeline loads the benchmark
    * fingerprints from storage). The scale shape is the point: the
    * benchmark fingerprint set is tiny relative to the corpus, so it
    * BROADCASTS and the contamination check is one map-only semi-join
    * pass over 100 TB — no corpus shuffle. Fingerprint = q36's head
    * fingerprint (64 normalized chars), which also catches docs that
    * share a benchmark prefix.
    */
  val q57 = Q("q57_decontaminate",
    s"""WITH f AS (
       |  SELECT doc_id,
       |    $headFpSql AS fp
       |  FROM documents),
       |bench AS (SELECT DISTINCT fp FROM f WHERE doc_id % 10 = 0)
       |SELECT f.doc_id, f.fp FROM f JOIN bench USING (fp)
       |WHERE f.doc_id % 10 <> 0""".stripMargin) { (s, dir) =>
    val f = docs(s, dir).select(col("doc_id"), headFp.as("fp"))
    val bench = f.filter(col("doc_id") % 10 === 0).select("fp").distinct()
    f.filter(col("doc_id") % 10 =!= 0)
      .join(broadcast(bench), Seq("fp"), "left_semi")
      .select(col("doc_id"), col("fp"))
  }

  private val langMarkers = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "los", "las", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ein", "ist"),
    "fr" -> Seq("le", "les", "des", "et", "une", "est"))

  private def inList(xs: Seq[String]) =
    xs.map(x => s"'$x'").mkString("(", ", ", ")")

  /** Marker-hit columns + `pred_lang` appended to a documents frame
    * (shared by q33's confusion matrix and q54's filter).
    */
  private def withPredLang(df: DataFrame): DataFrame = {
    val hits = langMarkers.foldLeft(df) { case (d, (l, ms)) =>
      d.withColumn(s"${l}_hits", TextOps.markerHits(col("text"), ms))
    }
    val pred = when(col("en_hits") >= col("es_hits") &&
        col("en_hits") >= col("de_hits") &&
        col("en_hits") >= col("fr_hits") && col("en_hits") > 0, "en")
      .when(col("es_hits") >= col("de_hits") &&
        col("es_hits") >= col("fr_hits") && col("es_hits") > 0, "es")
      .when(col("de_hits") >= col("fr_hits") && col("de_hits") > 0, "de")
      .when(col("fr_hits") > 0, "fr")
      .otherwise("unknown")
    hits.withColumn("pred_lang", pred)
  }

  /** The oracle-side marker-hit column list (mirrors withPredLang). */
  private def langHitsSqlCols: String =
    langMarkers.map { case (l, ms) =>
      s"    len(list_filter(string_split(text, ' '), w -> w IN " +
        s"${inList(ms)})) AS ${l}_hits"
    }.mkString(",\n")

  private val predLangSqlCase =
    """CASE
      |      WHEN en_hits >= es_hits AND en_hits >= de_hits
      |       AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
      |      WHEN es_hits >= de_hits AND es_hits >= fr_hits
      |       AND es_hits > 0 THEN 'es'
      |      WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
      |      WHEN fr_hits > 0 THEN 'fr'
      |      ELSE 'unknown' END""".stripMargin

  /** Marker-token language ID (n-gram heuristic); output is the
    * confusion matrix vs the labeled `lang` column.
    */
  val q33 = Q("q33_lang_id",
    s"""WITH sc AS (
       |  SELECT doc_id, lang,
       |$langHitsSqlCols
       |  FROM documents),
       |p AS (
       |  SELECT lang,
       |    $predLangSqlCase AS pred_lang
       |  FROM sc)
       |SELECT lang, pred_lang, count(*) AS n
       |FROM p GROUP BY lang, pred_lang""".stripMargin) { (s, dir) =>
    withPredLang(docs(s, dir))
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
  }

  /** The quality-filter KEEP LIST — the decision a curation pipeline
    * materializes: keep documents whose predicted language agrees with
    * the label AND that clear the minimum-length bar, carrying the
    * quality tier for downstream sampling. Combines the q33 predictor
    * with the q34 features in one map-only pass + filter.
    */
  val q54 = Q("q54_filter_keep",
    s"""WITH sc AS (
       |  SELECT doc_id, lang,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    len(list_filter(string_split(text, ' '),
       |        w -> w IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS hits,
       |$langHitsSqlCols
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, lang, n_tokens, hits,
       |    $predLangSqlCase AS pred_lang
       |  FROM sc)
       |SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CASE WHEN n_tokens >= 20
       |        AND CAST(hits AS DOUBLE) / n_tokens > 0.05 THEN 'good'
       |       ELSE 'ok' END AS quality
       |FROM p
       |WHERE pred_lang = lang AND n_tokens >= 5""".stripMargin) { (s, dir) =>
    val nTokens = size(TextOps.tokens(col("text"))).cast("long")
    val stopHits = TextOps.markerHits(col("text"),
      Seq("the", "a", "of", "and", "to", "in")).cast("long")
    withPredLang(docs(s, dir))
      .select(col("doc_id"), col("lang"), col("pred_lang"),
        nTokens.as("n_tokens"), stopHits.as("hits"))
      .filter(col("pred_lang") === col("lang") && col("n_tokens") >= 5)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        when(col("n_tokens") >= 20 &&
          col("hits").cast("double") / col("n_tokens") > 0.05, "good")
          .otherwise("ok").as("quality"))
  }

  /** Per-document quality features + bucket (length, token stats,
    * punctuation + stopword ratios).
    */
  val q34 = Q("q34_text_quality",
    """WITH f AS (
      |  SELECT doc_id,
      |    len(text) AS n_chars_m,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    len(list_filter(string_split(text, ' '),
      |        w -> w IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS hits,
      |    len(text)
      |      - len(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
      |      AS n_punct
      |  FROM documents)
      |SELECT doc_id, CAST(n_chars_m AS BIGINT) AS n_chars_m,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  round(CAST(n_chars_m - n_tokens + 1 AS DOUBLE) / n_tokens, 4)
      |    AS avg_tok_len,
      |  round(CAST(n_punct AS DOUBLE) / n_chars_m, 6) AS punct_ratio,
      |  round(CAST(hits AS DOUBLE) / n_tokens, 6) AS stop_ratio,
      |  CASE WHEN n_tokens >= 20
      |        AND CAST(hits AS DOUBLE) / n_tokens > 0.05 THEN 'good'
      |       WHEN n_tokens >= 5 THEN 'ok'
      |       ELSE 'poor' END AS quality
      |FROM f""".stripMargin) { (s, dir) =>
    // shared with the streaming path — see TextOps.qualityProfile
    TextOps.qualityProfile(docs(s, dir))
  }

  /** Corpus token statistics per source (whitespace + regex-word
    * counts).
    */
  val q35 = Q("q35_token_stats",
    """SELECT source,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |  CAST(sum(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT)
      |    AS n_words,
      |  round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
      |  count(*) AS n_docs
      |FROM documents GROUP BY source""".stripMargin) { (s, dir) =>
    val nTok = size(TextOps.tokens(col("text")))
    val nWords = expr("size(regexp_extract_all(text, '[a-z]+', 0))")
    docs(s, dir).groupBy("source")
      .agg(sum(nTok).cast("long").as("n_tokens"),
        sum(nWords).cast("long").as("n_words"),
        round(avg(nTok), 4).as("avg_tokens"),
        count(lit(1)).as("n_docs"))
  }

  /** Document fingerprints: full + head md5 of normalized text, short
    * prefix for bucketing.
    */
  val q36 = Q("q36_fingerprint",
    s"""SELECT doc_id,
       |  md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fp,
       |  substr(md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')),
       |         1, 8) AS fp8,
       |  $headFpSql AS head_fp
       |FROM documents""".stripMargin) { (s, dir) =>
    val norm = TextOps.normalize(col("text"))
    docs(s, dir).select(col("doc_id"), md5(norm).as("fp"),
      md5(norm).substr(1, 8).as("fp8"),
      headFp.as("head_fp"))
  }

  /** Heavy-hitter tokens (> 1% of the corpus token stream) via the
    * two-pass sketch+exact construction (Approx.heavyHitters) — same
    * rows as the oracle's full GROUP BY/HAVING, but the engine never
    * shuffles the unbounded token key space.
    */
  val q47 = Q("q47_heavy_hitters",
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |SELECT w, count(*) AS cnt FROM tok
      |GROUP BY w
      |HAVING count(*) > 0.01 * (SELECT count(*) FROM tok)""".stripMargin) {
    (s, dir) =>
      val tok = docs(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("w"))
      graft.ops.Approx.heavyHitters(tok, "w", 0.01)
  }

  /** Deterministic hash SPLIT (train/val/test ≈ 90/5/5) — the first
    * op any training run applies to a corpus. Bucket = the first two
    * md5 hex digits of the doc id (0..255); split by fixed thresholds
    * (230/243). Membership depends only on the key: stable across
    * runs, engines, cluster sizes, and corpus growth — a doc never
    * migrates between splits when new data arrives (the property
    * random sampling can't give). Map-only at any scale; the output
    * aggregates to one row per split with an id checksum.
    */
  val q62 = Q("q62_hash_split",
    """WITH b AS (
      |  SELECT doc_id,
      |    (strpos('0123456789abcdef',
      |       substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16
      |    + strpos('0123456789abcdef',
      |        substr(md5(doc_id::VARCHAR), 2, 1)) - 1 AS bkt
      |  FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    CASE WHEN bkt < 230 THEN 'train'
      |         WHEN bkt < 243 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM b)
      |SELECT split, count(*) AS n_docs,
      |  CAST(min(doc_id) AS BIGINT) AS min_doc,
      |  CAST(max(doc_id) AS BIGINT) AS max_doc,
      |  CAST(sum(doc_id) AS BIGINT) AS sum_doc
      |FROM s GROUP BY split""".stripMargin) { (s, dir) =>
    val bkt = conv(substring(md5(col("doc_id").cast("string")), 1, 2),
      16, 10).cast("int")
    docs(s, dir)
      .select(col("doc_id"),
        when(bkt < 230, "train").when(bkt < 243, "val")
          .otherwise("test").as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc"),
        sum("doc_id").cast("long").as("sum_doc"))
  }

  /** SOFT decontamination scoring — q57 removes exact/prefix
    * collisions; this measures PARTIAL overlap: how many of a
    * training doc's distinct word 3-grams also appear anywhere in the
    * held-out benchmark set (doc_id % 10 = 0, q57's stand-in). The
    * benchmark gram vocabulary is tiny relative to the corpus, so it
    * BROADCASTS; the corpus side is explode → broadcast-semi-join →
    * one bounded agg on doc_id — no corpus-sized shuffle key space.
    * COUNTS cross the engine boundary, not ratios (q53's 6dp-boundary
    * lesson); the consumer thresholds n_hit/u_3g itself.
    */
  val q63 = Q("q63_contamination_3g",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN n >= 3 THEN list_distinct(list_transform(
      |      range(1, n - 1),
      |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
      |      ELSE [] END AS g3
      |  FROM t),
      |bench AS (
      |  SELECT DISTINCT unnest(g3) AS ng FROM g WHERE doc_id % 10 = 0),
      |h AS (
      |  SELECT doc_id, len(g3) AS u3, unnest(g3) AS ng
      |  FROM g WHERE doc_id % 10 <> 0)
      |SELECT h.doc_id, CAST(h.u3 AS BIGINT) AS u_3g,
      |  count(*) AS n_hit
      |FROM h JOIN bench USING (ng)
      |GROUP BY h.doc_id, h.u3""".stripMargin) { (s, dir) =>
    val toks = TextOps.tokens(col("text"))
    val n = size(toks)
    def grams(k: Int): Column =
      (0 until k).map(j => slice(toks, lit(j + 1), n - (k - 1)))
        .reduceRight((a, b) => zip_with(a, b,
          (x, y) => concat(x, lit(" "), y)))
    // spread the single-split scan below the 3-gram build, AFTER the
    // corpus/bench doc_id filter: the zip_with gram chain + explode
    // otherwise serializes on ONE task (StageProbe r20: a 1.18 s
    // single-task stage was 70% of the query). Spreading ABOVE the
    // filter doesn't work — the filter is pushed below the exchange
    // and splits it into two non-reusable exchanges, so both branches
    // still rebuild the grams serially. Counts are exact integers ->
    // partitioning-independent. The (tiny) bench side stays at the
    // scan's native layout.
    def g3(d: DataFrame) = d.select(col("doc_id"),
      when(n >= 3, array_distinct(grams(3)))
        .otherwise(array().cast("array<string>")).as("g3"))
    val bench = g3(docs(s, dir).filter(col("doc_id") % 10 === 0))
      .select(explode(col("g3")).as("ng")).distinct()
    g3(graft.ops.Par.spread(docs(s, dir).filter(col("doc_id") % 10 =!= 0)))
      .select(col("doc_id"), size(col("g3")).cast("long").as("u_3g"),
        explode(col("g3")).as("ng"))
      .join(broadcast(bench), Seq("ng"), "left_semi")
      .groupBy("doc_id", "u_3g")
      .agg(count(lit(1)).as("n_hit"))
  }

  /** Duplicate-CLUSTER resolution — the step after candidate
    * generation that the dedup tier was missing: connected components
    * over the LSH candidate pairs ([[graft.ops.Components]], min-label
    * propagation, one scalar per round to the driver), reported one
    * row per component with its keeper (= the component id = the
    * minimum doc id, the same keep-lowest policy as q51) and size.
    * Oracle: DuckDB recursive CTE computing min-reachable-id per node
    * over the same pair list — an independent formulation of the same
    * fixpoint.
    */
  /** The LSH duplicate-component table over [[q30]]'s candidate pairs
    * — ONE fixpoint per session, shared by its four consumers (q64's
    * cluster report, q120's keep-list, q168's precedence keep, q175's
    * leakage split), the way a production dedup pipeline persists the
    * cluster-assignment table next to the signature table instead of
    * re-running connected components per consumer. Same storage
    * policy as the other transient chain artifacts
    * ([[graft.Materialized.scratch]]: disk, flat re-read, retained:0
    * in bench hygiene); the first consumer pays the build. Measured
    * r20: the fixpoint (pairs + ~4 label-propagation rounds) billed
    * ~1-1.5 s to EACH of the four consumers.
    */
  private[graft] def lshComponents(s: SparkSession, dir: String): DataFrame =
    graft.Materialized.scratch(s, s"lsh_cc:$dir") {
      graft.ops.Components.connected(
        q30.fn(s, dir).select("doc_a", "doc_b").distinct())
    }

  val q64 = Q("q64_dup_components",
    s"""WITH RECURSIVE $shingleSqlCte,
       |b AS (
       |  SELECT doc_id, 0 AS band, mh0 || mh1 || mh2 AS key FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, mh3 || mh4 || mh5 AS key FROM sig),
       |sized AS (
       |  SELECT band, key FROM b GROUP BY band, key
       |  HAVING count(*) BETWEEN 2 AND 20),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
       |  FROM sized x
       |  JOIN b a ON a.band = x.band AND a.key = x.key
       |  JOIN b c ON c.band = x.band AND c.key = x.key
       |    AND a.doc_id < c.doc_id),
       |nodes AS (
       |  SELECT doc_a AS n FROM pairs
       |  UNION SELECT doc_b FROM pairs),
       |edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |r(n, m) AS (
       |  SELECT n, n FROM nodes
       |  UNION
       |  SELECT e.d, r.m FROM r JOIN edges e ON e.s = r.n),
       |cc AS (SELECT n, min(m) AS comp FROM r GROUP BY n)
       |SELECT comp, count(*) AS n_docs,
       |  CAST(max(n) AS BIGINT) AS max_doc
       |FROM cc GROUP BY comp""".stripMargin) { (s, dir) =>
    lshComponents(s, dir)
      .groupBy("comp")
      .agg(count(lit(1)).as("n_docs"), max("node").as("max_doc"))
  }

  /** NEAR-DUP DEDUP MATERIALIZATION — the decision q64 stops short
    * of: one row per KEPT document. Cluster members (q30's LSH
    * candidates → connected components) keep only their best
    * representative — longest text, ties to the lowest doc id (the
    * richest copy wins; exact-dup clusters tie on length, so the
    * stable-id rule applies) — and every unclustered doc keeps
    * itself. This closes the dedup loop end to end: detect (q30) →
    * cluster (q64) → materialize the keep-list (here), each stage
    * gate-checked. Scale: the component table is |clustered docs|
    * (<< corpus), the representative pick is one row_number window at
    * component grain, and the singleton complement is a left-anti
    * join on the same small node set — the corpus is scanned once.
    */
  val q120 = Q("q120_neardup_keep",
    s"""WITH RECURSIVE $shingleSqlCte,
       |b AS (
       |  SELECT doc_id, 0 AS band, mh0 || mh1 || mh2 AS key FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, mh3 || mh4 || mh5 AS key FROM sig),
       |sized AS (
       |  SELECT band, key FROM b GROUP BY band, key
       |  HAVING count(*) BETWEEN 2 AND 20),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
       |  FROM sized x
       |  JOIN b a ON a.band = x.band AND a.key = x.key
       |  JOIN b c ON c.band = x.band AND c.key = x.key
       |    AND a.doc_id < c.doc_id),
       |nodes AS (
       |  SELECT doc_a AS n FROM pairs
       |  UNION SELECT doc_b FROM pairs),
       |edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |r(n, m) AS (
       |  SELECT n, n FROM nodes
       |  UNION
       |  SELECT e.d, r.m FROM r JOIN edges e ON e.s = r.n),
       |cc AS (SELECT n, min(m) AS comp FROM r GROUP BY n),
       |ranked AS (
       |  SELECT d.doc_id, cc.comp,
       |    row_number() OVER (PARTITION BY cc.comp
       |      ORDER BY d.n_chars DESC, d.doc_id) AS rk,
       |    count(*) OVER (PARTITION BY cc.comp) AS sz
       |  FROM cc JOIN documents d ON d.doc_id = cc.n)
       |SELECT doc_id, comp, CAST(sz AS BIGINT) AS n_members
       |FROM ranked WHERE rk = 1
       |UNION ALL
       |SELECT doc_id, doc_id AS comp, CAST(1 AS BIGINT) AS n_members
       |FROM documents
       |WHERE doc_id NOT IN (SELECT n FROM nodes)""".stripMargin) {
    (s, dir) =>
      val cc = lshComponents(s, dir)
      val d = docs(s, dir).select(col("doc_id"), col("n_chars"))
      val members = cc.join(d, cc("node") === d("doc_id"))
        .select(col("doc_id"), col("comp"), col("n_chars"))
      val w = Window.partitionBy("comp")
        .orderBy(col("n_chars").desc, col("doc_id"))
      val best = members
        .withColumn("rk", row_number().over(w))
        .withColumn("sz",
          count(lit(1)).over(Window.partitionBy("comp")))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("comp"),
          col("sz").cast("long").as("n_members"))
      val singletons = d
        .join(cc.select(col("node")), d("doc_id") === col("node"),
          "left_anti")
        .select(col("doc_id"), col("doc_id").as("comp"),
          lit(1L).as("n_members"))
      best.unionByName(singletons)
  }

  /** END-TO-END NEAR-DUP curation pipeline — [[q66]]'s composition
    * with MinHash near-dup dedup in place of exact dedup, as ONE
    * plan: language gate (predicted == labeled) → minimum-length
    * gate → LSH candidate detection on the GATED population (q30's
    * capped buckets over the shared signature artifact — signatures
    * are per-doc map-only, so gating before or after signing is
    * equivalent, while the 2..20 bucket caps correctly see only the
    * gated set) → duplicate-cluster components (q64's operator) →
    * keep the longest doc per cluster + singletons (q120's policy) →
    * benchmark decontamination (q57's broadcast anti-join on the head
    * fingerprint) → per-(lang, quality) corpus stats, q66's exact
    * output shape so the exact-vs-near dedup pipelines are directly
    * comparable.
    *
    * Scale shape, stage by stage: gates are map-only; the signature
    * table is the per-session [[graft.Materialized]] artifact
    * semi-joined down (at 100 TB: the stored signature table, scanned
    * once); candidate pairs are cap-bounded per bucket; components is
    * the O(log d)-round operator with one scalar per round to the
    * driver; keep is one window at component grain; decontamination
    * broadcasts only fingerprints; the final stats are one narrow
    * two-key shuffle. The oracle mirrors every stage in SQL, the
    * components via the recursive CTE q120 proved.
    */
  val q127 = Q("q127_neardup_pipeline",
    s"""WITH RECURSIVE sc AS (
       |  SELECT doc_id, lang, text, n_chars,
       |    len(string_split(text, ' ')) AS n_tokens,
       |$langHitsSqlCols
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, lang, text, n_chars, n_tokens,
       |    $predLangSqlCase AS pred_lang
       |  FROM sc),
       |k AS (
       |  SELECT doc_id, lang, text, n_chars, n_tokens,
       |    CASE WHEN n_tokens >= 20 THEN 'good' ELSE 'ok' END AS quality,
       |    $headFpSql AS head_fp
       |  FROM p WHERE pred_lang = lang AND n_tokens >= 5),
       |${shingleSqlCteFrom("k")},
       |b AS (
       |  SELECT doc_id, 0 AS band, mh0 || mh1 || mh2 AS key FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, mh3 || mh4 || mh5 AS key FROM sig),
       |sized AS (
       |  SELECT band, key FROM b GROUP BY band, key
       |  HAVING count(*) BETWEEN 2 AND 20),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
       |  FROM sized x
       |  JOIN b a ON a.band = x.band AND a.key = x.key
       |  JOIN b c ON c.band = x.band AND c.key = x.key
       |    AND a.doc_id < c.doc_id),
       |nodes AS (
       |  SELECT doc_a AS n FROM pairs
       |  UNION SELECT doc_b FROM pairs),
       |edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |r(n, m) AS (
       |  SELECT n, n FROM nodes
       |  UNION
       |  SELECT e.d, r.m FROM r JOIN edges e ON e.s = r.n),
       |cc AS (SELECT n, min(m) AS comp FROM r GROUP BY n),
       |ranked AS (
       |  SELECT k.doc_id, k.lang, k.quality, k.n_tokens, k.head_fp,
       |    row_number() OVER (PARTITION BY cc.comp
       |      ORDER BY k.n_chars DESC, k.doc_id) AS rk
       |  FROM cc JOIN k ON k.doc_id = cc.n),
       |kept AS (
       |  SELECT doc_id, lang, quality, n_tokens, head_fp
       |  FROM ranked WHERE rk = 1
       |  UNION ALL
       |  SELECT doc_id, lang, quality, n_tokens, head_fp
       |  FROM k WHERE doc_id NOT IN (SELECT n FROM nodes)),
       |bench AS (
       |  SELECT DISTINCT $headFpSql AS head_fp
       |  FROM documents WHERE doc_id % 10 = 0)
       |SELECT lang, quality, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(sum(doc_id) AS BIGINT) AS id_sum
       |FROM kept
       |WHERE doc_id % 10 <> 0
       |  AND NOT EXISTS (SELECT 1 FROM bench b WHERE b.head_fp = kept.head_fp)
       |GROUP BY lang, quality""".stripMargin) { (s, dir) =>
    val nTokens = size(TextOps.tokens(col("text"))).cast("long")
    // `k` (the gated population) is referenced THREE times — band
    // semi-join, member join, singleton anti-join — and per-consumer
    // column pruning splits any shared exchange into three distinct
    // ones, so the langid + headFp + token-count map chain was
    // evaluated three times as single-task stages (StageProbe r20:
    // 550/507/280 ms). Checkpoint it ONCE per session to scratch
    // parquet (the r17 transient-checkpoint policy: disk, flat
    // re-read, retained:0 in bench hygiene), spreading the
    // single-split scan inside the build so the one evaluation runs
    // on the session's cores. Gates/counts are per-row exact ->
    // partitioning-independent.
    val k = graft.Materialized.scratch(s, s"q127_k:$dir") {
      withPredLang(graft.ops.Par.spread(docs(s, dir)))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          nTokens.as("n_tokens"),
          when(nTokens >= 20, "good").otherwise("ok").as("quality"),
          headFp.as("head_fp"), col("pred_lang"))
        .filter(col("pred_lang") === col("lang") && col("n_tokens") >= 5)
        .drop("pred_lang")
    }
    val bnd = bands(s, dir)
      .join(k.select("doc_id"), Seq("doc_id"), "left_semi")
    val sized = bnd.groupBy("band", "key").agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, 20)).select("band", "key")
    val inb = bnd.join(sized, Seq("band", "key"))
    val pairs = inb
      .select(col("band"), col("key"), col("doc_id").as("doc_a"))
      .join(inb.select(col("band"), col("key"), col("doc_id").as("doc_b")),
        Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val cc = graft.ops.Components.connected(pairs)
    val members = cc.join(k, cc("node") === k("doc_id"))
    val w = Window.partitionBy("comp")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val keptCols = Seq("doc_id", "lang", "quality", "n_tokens", "head_fp")
    val best = members.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(keptCols.map(col): _*)
    val singles = k.join(cc.select("node"), k("doc_id") === col("node"),
      "left_anti").select(keptCols.map(col): _*)
    best.unionByName(singles)
      .filter(col("doc_id") % 10 =!= 0)
      .join(broadcast(benchFps(s, dir)), Seq("head_fp"), "left_anti")
      .groupBy("lang", "quality")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("n_tokens"),
        sum("doc_id").cast("long").as("id_sum"))
  }

  /** RETRIEVAL SCORING — BM25 top-20 docs for a fixed query-term set
    * (Robertson/Lucene idf form, k1=1.2, b=0.75): the lexical-search
    * primitive a curation pipeline uses to pull benchmark-adjacent or
    * topic-targeted documents out of a corpus. Scale shape: the tf
    * table only holds docs CONTAINING query terms (the isin filter
    * cuts the explode before any shuffle); df and the (N, avgdl)
    * scalars broadcast; the top-20 is orderBy+limit — Spark plans
    * TakeOrderedAndProject (per-partition heap, no global sort, no
    * single-partition window). Determinism is the q116 device: each
    * per-term contribution is floored to integer MICRO-UNITS before
    * the per-doc sum, so both engines add exact integers in any
    * order — a float sum's partial-aggregation order could flip the
    * 4dp rounding on a knife-edge value and move the LIMIT boundary —
    * and the top-20 orders on the integer sum itself (ties on
    * doc_id), which no rounding can disturb.
    */
  val q121 = Q("q121_bm25_topk",
    """WITH toks AS (
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
      |  CROSS JOIN stats GROUP BY 1)
      |SELECT doc_id, round(CAST(sm AS DOUBLE) / 1000000, 4) AS bm25
      |FROM sc ORDER BY sm DESC, doc_id LIMIT 20""".stripMargin) {
    (s, dir) =>
      val qterms = Seq("spark", "hash", "merge")
      val toks = docs(s, dir).select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("w"))
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
      val tf = toks.filter(col("w").isin(qterms: _*))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val dfq = tf.groupBy("w").agg(count(lit(1)).as("df"))
      tf.join(broadcast(dfq), Seq("w"))
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
        .select(col("doc_id"),
          round(col("sm").cast("double") / 1000000, 4).as("bm25"))
  }

  /** END-TO-END curation pipeline — the composition a training run
    * actually executes, as ONE query: language filter (predicted ==
    * labeled, q33's predictor) → minimum-length gate → exact dedup
    * keeping the lowest doc per full-text fingerprint (q51's policy,
    * here a single min_by shuffle carrying the whole row) →
    * benchmark decontamination (q57's broadcast anti-join on the head
    * fingerprint) → per-language corpus stats. Scale: two narrow
    * shuffles total (fingerprint, lang) — every other step is map-only
    * against a broadcast bench set. The oracle formulates dedup
    * independently as group-min + join-back.
    */
  /** The q66 curation pipeline as a reusable oracle-CTE prefix ending
    * in `cur` (the curated doc-grain set) — shared verbatim by q66 and
    * the q185 training-run assembly so the two oracles cannot drift.
    */
  private def curationSqlCte: String =
    s"""sc AS (
       |  SELECT doc_id, lang, text,
       |    len(string_split(text, ' ')) AS n_tokens,
       |$langHitsSqlCols
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, lang, text, n_tokens,
       |    $predLangSqlCase AS pred_lang
       |  FROM sc),
       |k AS (
       |  SELECT doc_id, lang, n_tokens,
       |    CASE WHEN n_tokens >= 20 THEN 'good' ELSE 'ok' END AS quality,
       |    md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fp,
       |    $headFpSql AS head_fp
       |  FROM p WHERE pred_lang = lang AND n_tokens >= 5),
       |keep AS (SELECT fp, min(doc_id) AS doc_id FROM k GROUP BY fp),
       |kept AS (
       |  SELECT k.* FROM k
       |  JOIN keep ON k.fp = keep.fp AND k.doc_id = keep.doc_id),
       |bench AS (
       |  SELECT DISTINCT $headFpSql AS head_fp
       |  FROM documents WHERE doc_id % 10 = 0),
       |cur AS (
       |  SELECT kept.* FROM kept
       |  WHERE doc_id % 10 <> 0
       |    AND NOT EXISTS (SELECT 1 FROM bench b
       |                    WHERE b.head_fp = kept.head_fp))""".stripMargin

  val q66 = Q("q66_curation_pipeline",
    s"""WITH $curationSqlCte
       |SELECT lang, quality, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(sum(doc_id) AS BIGINT) AS id_sum
       |FROM cur
       |GROUP BY lang, quality""".stripMargin) { (s, dir) =>
    curatedDocs(s, dir)
      .groupBy("lang", "quality")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("n_tokens"),
        sum("doc_id").cast("long").as("id_sum"))
  }

  /** q66's pipeline at DOC grain (everything before the final stats
    * aggregation) — exposed so specs can assert the decontamination
    * invariant row-by-row (no curated head_fp intersects the bench
    * set), which the aggregated query output cannot show.
    */
  private[graft] def curatedDocs(s: SparkSession, dir: String): DataFrame = {
    val nTokens = size(TextOps.tokens(col("text"))).cast("long")
    // same spread-below-the-gate-chain as q127 (scan-only site;
    // exact-integer outputs) — consumers q66/q185 pay the langid +
    // fp map chain in parallel instead of on one task
    val k = withPredLang(graft.ops.Par.spread(docs(s, dir)))
      .select(col("doc_id"), col("lang"), col("pred_lang"),
        nTokens.as("n_tokens"),
        when(nTokens >= 20, "good").otherwise("ok").as("quality"),
        md5(TextOps.normalize(col("text"))).as("fp"), headFp.as("head_fp"))
      .filter(col("pred_lang") === col("lang") && col("n_tokens") >= 5)
    val kept = k
      .groupBy("fp")
      .agg(min_by(struct("doc_id", "lang", "n_tokens", "quality",
        "head_fp"), col("doc_id")).as("r"))
      .select(col("r.*"))
    kept.filter(col("doc_id") % 10 =!= 0)
      .join(broadcast(benchFps(s, dir)), Seq("head_fp"), "left_anti")
  }

  /** The benchmark head-fingerprint set q66 decontaminates against
    * (every 10th doc stands in for the benchmark corpus).
    */
  private[graft] def benchFps(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).filter(col("doc_id") % 10 === 0)
      .select(headFp.as("head_fp")).distinct()

  /** TF-IDF characteristic terms per source: corpus-wide term
    * explode → (doc, term) tf → document frequency → per-source
    * score Σtf · ln(N/df), top-5 per source by a PARTITIONED window.
    * Scale: the explode shuffles token-grain rows ONCE into the
    * (doc, source, term) tf aggregate; everything after runs at
    * (source, term) grain or smaller — df(term) = Σ_sources docs
    * (each doc has exactly one source, so no second corpus pass) and
    * the N scalar are vocab-sized → broadcast back. Spark has no
    * cross-reference CSE, so deriving df from the small grain instead
    * of re-referencing tf halves the heavy work. Ranking orders by
    * the 6dp-ROUNDED score (bit-identical across engines) with the
    * term as total tie-break.
    */
  val q67 = Q("q67_tfidf_terms",
    """WITH nn AS (SELECT count(*) AS n FROM documents),
      |tf AS (
      |  SELECT doc_id, source, w, count(*) AS tf
      |  FROM (SELECT doc_id, source,
      |          unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY 1, 2, 3),
      |df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
      |st AS (SELECT source, w, sum(tf) AS stf FROM tf GROUP BY 1, 2),
      |-- (duckdb reuses the tf CTE; the engine derives df from the
      |--  (source, term) grain instead — same values)
      |sc AS (
      |  SELECT st.source, st.w,
      |    round(st.stf * ln(CAST(nn.n AS DOUBLE) / df.df), 6) AS score
      |  FROM st JOIN df USING (w) CROSS JOIN nn),
      |r AS (
      |  SELECT source, w, score,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY score DESC, w) AS rk
      |  FROM sc)
      |SELECT source, w AS term, CAST(rk AS BIGINT) AS rk, score
      |FROM r WHERE rk <= 5""".stripMargin) { (s, dir) =>
    val d = docs(s, dir)
    val tf = d.select(col("doc_id"), col("source"),
        explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "source", "w").agg(count(lit(1)).as("tf"))
    // one pass to (source, term) grain; df folds out of it because a
    // document belongs to exactly one source — as a window sum over
    // the small grain, so the plan is ONE chain (a groupBy+join-back
    // would re-run the corpus aggregation: no cross-reference CSE)
    val st = tf.groupBy("source", "w")
      .agg(sum("tf").as("stf"), count(lit(1)).as("n_docs_sw"))
    val withDf = st.withColumn("df",
      sum("n_docs_sw").over(Window.partitionBy("w")))
    val nn = d.select(count(lit(1)).as("n"))
    val w = Window.partitionBy("source")
      .orderBy(col("score").desc, col("w"))
    withDf.crossJoin(broadcast(nn))
      .select(col("source"), col("w"),
        round(col("stf") * log(col("n").cast("double") / col("df")), 6)
          .as("score"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("source"), col("w").as("term"), col("rk"), col("score"))
  }

  /** STRATIFIED deterministic sampling — rebalance a skewed corpus by
    * keeping a per-language fraction, decided by the same stable
    * md5-bucket as q62's split (bucket < 256·rate). Membership is a
    * pure function of (doc_id, lang): reproducible on any engine or
    * cluster size, stable as the corpus grows, and map-only — the
    * reweighting step every multilingual training mix applies.
    */
  val q69 = Q("q69_stratified_sample",
    """WITH b AS (
      |  SELECT doc_id, lang,
      |    (strpos('0123456789abcdef',
      |       substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16
      |    + strpos('0123456789abcdef',
      |        substr(md5(doc_id::VARCHAR), 2, 1)) - 1 AS bkt,
      |    CASE lang WHEN 'en' THEN 64 WHEN 'es' THEN 128
      |              WHEN 'de' THEN 192 ELSE 256 END AS thr
      |  FROM documents)
      |SELECT lang, count(*) AS n_total,
      |  CAST(sum(CASE WHEN bkt < thr THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  CAST(sum(CASE WHEN bkt < thr THEN doc_id ELSE 0 END) AS BIGINT)
      |    AS kept_id_sum
      |FROM b GROUP BY lang""".stripMargin) { (s, dir) =>
    val bkt = conv(substring(md5(col("doc_id").cast("string")), 1, 2),
      16, 10).cast("int")
    val thr = when(col("lang") === "en", 64)
      .when(col("lang") === "es", 128)
      .when(col("lang") === "de", 192).otherwise(256)
    docs(s, dir)
      .select(col("doc_id"), col("lang"), bkt.as("bkt"), thr.as("thr"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("bkt") < col("thr"), 1).otherwise(0)).cast("long")
          .as("n_kept"),
        sum(when(col("bkt") < col("thr"), col("doc_id")).otherwise(0))
          .cast("long").as("kept_id_sum"))
  }

  /** Quantile-based length trimming — drop the pathological tails
    * (too short = boilerplate/fragments, too long = concatenation
    * artifacts). Boundaries are the exact interpolated p5/p95 of the
    * token count (one-row aggregate, broadcast back); the pass itself
    * is map-only. At 100 TB the exact percentile becomes
    * approx_percentile with the same downstream shape.
    */
  val q72 = Q("q72_length_trim",
    """WITH t AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n
      |  FROM documents),
      |b AS (SELECT quantile_cont(n, 0.05) AS lo,
      |             quantile_cont(n, 0.95) AS hi FROM t)
      |SELECT CASE WHEN n < lo THEN 'short' WHEN n > hi THEN 'long'
      |            ELSE 'keep' END AS bucket,
      |  count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS sum_tokens,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM t CROSS JOIN b GROUP BY 1""".stripMargin) { (s, dir) =>
    val t = docs(s, dir)
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).as("n"))
    val b = t.agg(expr("percentile(n, 0.05)").as("lo"),
      expr("percentile(n, 0.95)").as("hi"))
    t.crossJoin(broadcast(b))
      .select(col("doc_id"), col("n"),
        when(col("n") < col("lo"), "short")
          .when(col("n") > col("hi"), "long").otherwise("keep")
          .as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n").cast("long").as("sum_tokens"),
        sum("doc_id").cast("long").as("id_sum"))
  }

  /** Collocation mining — PMI of adjacent token bigrams (count ≥ 20):
    * ln(p(ab) / (p(a)·p(b))) with every double operation written in
    * the SAME order on both engines (counts are exact integers; the
    * ratios/log are the only float steps). Bigrams come from a
    * per-row zip of the token array with its tail (map-only explode).
    * Spark has no cross-reference CSE, so the plan touches the corpus
    * exactly three times — bigram explode, unigram explode, one
    * column scan for both totals — and the unigram table is joined
    * ONCE by melting each bigram into its two sides (the naive
    * two-sided join would compute the unigram aggregation twice).
    * The count floor bounds everything downstream by the bigram
    * vocabulary, not the corpus.
    */
  val q73 = Q("q73_bigram_pmi",
    """WITH toks AS (
      |  SELECT string_split(text, ' ') AS ts,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents),
      |bgx AS (
      |  SELECT unnest(list_transform(range(1, n),
      |    i -> ts[i] || ' ' || ts[i + 1])) AS bg
      |  FROM toks WHERE n >= 2),
      |bc AS (SELECT bg, count(*) AS c2 FROM bgx GROUP BY bg
      |       HAVING count(*) >= 20),
      |ug AS (SELECT unnest(ts) AS w FROM toks),
      |uc AS (SELECT w, count(*) AS c1 FROM ug GROUP BY w),
      |tot AS (SELECT count(*) AS t1 FROM ug),
      |t2 AS (SELECT sum(n - 1) AS t2 FROM toks WHERE n >= 2)
      |SELECT bc.bg AS bigram, CAST(bc.c2 AS BIGINT) AS n_pair,
      |  round(ln((CAST(bc.c2 AS DOUBLE) / t2.t2) /
      |    ((CAST(a.c1 AS DOUBLE) / tot.t1)
      |     * (CAST(b.c1 AS DOUBLE) / tot.t1))), 6) AS pmi
      |FROM bc
      |JOIN uc a ON a.w = split_part(bc.bg, ' ', 1)
      |JOIN uc b ON b.w = split_part(bc.bg, ' ', 2)
      |CROSS JOIN tot CROSS JOIN t2""".stripMargin) { (s, dir) =>
    val toks = docs(s, dir)
      .select(TextOps.tokens(col("text")).as("ts"))
      .withColumn("n", size(col("ts")))
    val bgx = toks.filter(col("n") >= 2)
      .select(explode(zip_with(
        slice(col("ts"), lit(1), col("n") - 1),
        slice(col("ts"), lit(2), col("n") - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
    val bc = bgx.groupBy("bg").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= 20)
    val uc = toks.select(explode(col("ts")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val tots = toks.agg(sum(col("n")).as("t1"),
      sum(when(col("n") >= 2, col("n") - 1).otherwise(0)).as("t2"))
    // melt bigram → (side, word), join the unigram table once, pivot
    // the two sides back with conditional max. The BROADCAST side is
    // the melted bigram list — bounded by the c2 >= 20 support floor
    // (2 rows per surviving bigram), tiny relative to the corpus — NOT
    // the unigram table, which is the full corpus vocabulary
    // (10^8-10^9 rows at web scale, far past any broadcast limit).
    broadcast(
      bc.select(col("bg"), col("c2"), explode(array(
            struct(lit(1).as("side"),
              split_part(col("bg"), lit(" "), lit(1)).as("w")),
            struct(lit(2).as("side"),
              split_part(col("bg"), lit(" "), lit(2)).as("w")))).as("sw"))
        .select(col("bg"), col("c2"),
          col("sw.side").as("side"), col("sw.w").as("w")))
      .join(uc, Seq("w"))
      .groupBy("bg", "c2")
      .agg(max(when(col("side") === 1, col("c1"))).as("ca"),
        max(when(col("side") === 2, col("c1"))).as("cb"))
      .crossJoin(broadcast(tots))
      .select(col("bg").as("bigram"), col("c2").cast("long").as("n_pair"),
        round(log((col("c2").cast("double") / col("t2")) /
          ((col("ca").cast("double") / col("t1"))
            * (col("cb").cast("double") / col("t1")))), 6).as("pmi"))
  }

  /** The PERSISTED-index candidate path (SURVEY S8 × LSH): write the
    * band table through [[graft.text.SignatureStore]] as a bucketed
    * CTAS on (band, key), then generate candidates by READING the
    * store — the production "signatures are a stored table" plan the
    * in-session q30 stands in for. The bucketed read means the bucket-
    * size aggregation and both self-join sides inherit the write-time
    * hash distribution: zero exchanges until the final pair distinct
    * (pinned in Round4Spec/Round6Spec). Same oracle as q30 — the
    * stored path must be RESULT-IDENTICAL to the in-session one.
    */
  val q79 = Q("q79_store_candidates",
    s"""WITH $shingleSqlCte,
       |b AS (
       |  SELECT doc_id, 0 AS band, mh0 || mh1 || mh2 AS key FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, mh3 || mh4 || mh5 AS key FROM sig),
       |sized AS (
       |  SELECT band, key FROM b GROUP BY band, key
       |  HAVING count(*) BETWEEN 2 AND 20)
       |SELECT DISTINCT CAST(a.band AS BIGINT) AS band,
       |  a.doc_id AS doc_a, c.doc_id AS doc_b
       |FROM sized x
       |JOIN b a ON a.band = x.band AND a.key = x.key
       |JOIN b c ON c.band = x.band AND c.key = x.key
       |  AND a.doc_id < c.doc_id""".stripMargin) { (s, dir) =>
    // one store per (session, corpus): the CTAS cost is still billed
    // in-query (to the first invocation), but repeat invocations reuse
    // the artifact instead of littering a fresh temp warehouse and
    // repointing the catalog name under earlier plans (round-6 ADVICE)
    val table = s"sig_bands_q79_${graft.SessionScratch.keyOf(dir)}"
    graft.SessionScratch.once(s, table) {
      val root = graft.SessionScratch.dir(s, "sigstore")
      SignatureStore.writeBands(Warehouse(root), docs(s, dir), table, 8)
    }
    SignatureStore.candidatesFromStore(s, table, 20)
  }

  /** Star-contraction connected components on a HIGH-DIAMETER dup
    * graph — the input class [[graft.ops.Components.connected]]'s
    * round cap names (a long chain of crawl snapshots, each near-dup
    * of its neighbor): doc k links to doc k+1 within 50-doc chains.
    * [[graft.ops.Components.connectedStar]] collapses each chain
    * geometrically; the oracle is the closed form (doc_ids are
    * contiguous, so a chain's component is its 50-block base).
    * Reported at component grain: size and span.
    */
  val q81 = Q("q81_chain_components",
    """WITH e AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |  WHERE a.doc_id % 50 <> 49),
      |n AS (SELECT doc_a AS node FROM e
      |      UNION SELECT doc_b FROM e),
      |lbl AS (SELECT node, node - node % 50 AS comp FROM n)
      |SELECT comp, count(*) AS n_nodes,
      |  CAST(min(node) AS BIGINT) AS min_node,
      |  CAST(max(node) AS BIGINT) AS max_node
      |FROM lbl GROUP BY comp""".stripMargin) { (s, dir) =>
    val d = docs(s, dir).select("doc_id")
    val e = d.select(col("doc_id").as("doc_a"))
      .filter(col("doc_a") % 50 =!= 49)
      .join(d.select(col("doc_id").as("doc_b")),
        col("doc_b") === col("doc_a") + 1)
    Components.connectedStar(e)
      .groupBy("comp")
      .agg(count(lit(1)).as("n_nodes"),
        min("node").cast("long").as("min_node"),
        max("node").cast("long").as("max_node"))
  }

  /** Weighted deterministic sampling — keep probability proportional
    * to document length (the "sample long documents more" curation
    * knob), with md5-hash membership (q69's idiom) so the sample is a
    * pure function of doc_id: reproducible across runs, engines, and
    * partitionings, no RNG state. u01 = first 4 md5 hex digits / 16⁴;
    * keep iff u01 · 800 < token count (cap at 1 — docs ≥ 800 tokens
    * always kept). Map-only: no shuffle beyond the final stats
    * aggregation.
    */
  val q86 = Q("q86_weighted_sample",
    """WITH t AS (
      |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n,
      |    CAST(strpos('0123456789abcdef',
      |           substr(md5(doc_id::VARCHAR), 1, 1)) - 1 AS BIGINT)
      |      * 4096
      |    + (strpos('0123456789abcdef',
      |         substr(md5(doc_id::VARCHAR), 2, 1)) - 1) * 256
      |    + (strpos('0123456789abcdef',
      |         substr(md5(doc_id::VARCHAR), 3, 1)) - 1) * 16
      |    + strpos('0123456789abcdef',
      |        substr(md5(doc_id::VARCHAR), 4, 1)) - 1 AS h
      |  FROM documents)
      |SELECT lang, count(*) AS n_total,
      |  CAST(sum(CASE WHEN h * 800 < n * 65536 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN h * 800 < n * 65536 THEN doc_id ELSE 0 END)
      |    AS BIGINT) AS kept_id_sum,
      |  CAST(sum(CASE WHEN h * 800 < n * 65536 THEN n ELSE 0 END)
      |    AS BIGINT) AS kept_tokens
      |FROM t GROUP BY lang""".stripMargin) { (s, dir) =>
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 4),
      16, 10).cast("long")
    val keep = col("h") * 800 < col("n") * 65536
    docs(s, dir)
      .select(col("doc_id"), col("lang"),
        size(TextOps.tokens(col("text"))).cast("long").as("n"), h.as("h"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"),
        sum(when(keep, 1).otherwise(0)).cast("long").as("n_kept"),
        sum(when(keep, col("doc_id")).otherwise(0)).cast("long")
          .as("kept_id_sum"),
        sum(when(keep, col("n")).otherwise(0)).cast("long")
          .as("kept_tokens"))
  }

  /** Sliding-window token chunking (stride 30, window 40, overlap 10)
    * — the pretraining/RAG chunker: every document explodes into its
    * chunk starts (`sequence(1, n, 30)`), each chunk fingerprinted on
    * its EXACT token slice so chunk-grain dedup (n_distinct_chunks vs
    * n_chunks) falls out of the same pass. Narrow explode, one
    * source-grain aggregation; chunk count per doc is ⌈n/stride⌉ so
    * output volume is linear in corpus tokens — no joins, no windows.
    */
  val q87 = Q("q87_token_chunks",
    """WITH t AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS ts,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source, ts, n,
      |    unnest(range(1, n + 1, 30)) AS st
      |  FROM t WHERE n >= 1),
      |x AS (
      |  SELECT doc_id, source,
      |    least(40, n - st + 1) AS chunk_len,
      |    md5(array_to_string(ts[st:st + least(40, n - st + 1) - 1],
      |        ' ')) AS chunk_fp
      |  FROM c)
      |SELECT source, count(*) AS n_chunks,
      |  count(DISTINCT doc_id) AS n_docs,
      |  CAST(sum(chunk_len) AS BIGINT) AS sum_chunk_tokens,
      |  count(DISTINCT chunk_fp) AS n_distinct_chunks
      |FROM x GROUP BY source""".stripMargin) { (s, dir) =>
    val t = docs(s, dir)
      .select(col("doc_id"), col("source"),
        TextOps.tokens(col("text")).as("ts"))
      .withColumn("n", size(col("ts")))
      .filter(col("n") >= 1)
    val len = least(lit(40), col("n") - col("st") + 1)
    t.select(col("doc_id"), col("source"), col("ts"), col("n"),
        explode(sequence(lit(1L), col("n").cast("long"), lit(30L)))
          .as("st"))
      .select(col("doc_id"), col("source"), len.as("chunk_len"),
        md5(concat_ws(" ", slice(col("ts"), col("st").cast("int"),
          len.cast("int")))).as("chunk_fp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum("chunk_len").cast("long").as("sum_chunk_tokens"),
        countDistinct(col("chunk_fp")).as("n_distinct_chunks"))
  }

  /** Split-level contamination report — q62's deterministic md5 split
    * × q57/q66's bench fingerprint set, composed: how many documents
    * of each train/val/test split share a head fingerprint with the
    * benchmark. The bench set broadcasts (bounded), membership is a
    * left join + non-null count — map-only over the corpus, one
    * 3-group aggregation. The report a curation run publishes before
    * anyone trains on the split.
    */
  val q88 = Q("q88_split_contamination",
    s"""WITH s AS (
       |  SELECT doc_id,
       |    CASE WHEN (strpos('0123456789abcdef',
       |           substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16
       |         + strpos('0123456789abcdef',
       |             substr(md5(doc_id::VARCHAR), 2, 1)) - 1 < 230
       |         THEN 'train'
       |         WHEN (strpos('0123456789abcdef',
       |           substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16
       |         + strpos('0123456789abcdef',
       |             substr(md5(doc_id::VARCHAR), 2, 1)) - 1 < 243
       |         THEN 'val' ELSE 'test' END AS split,
       |    $headFpSql AS head_fp
       |  FROM documents),
       |bench AS (
       |  SELECT DISTINCT $headFpSql AS head_fp
       |  FROM documents WHERE doc_id % 10 = 0)
       |SELECT split, count(*) AS n_docs,
       |  count(b.head_fp) AS n_contaminated
       |FROM s LEFT JOIN bench b ON s.head_fp = b.head_fp
       |GROUP BY split""".stripMargin) { (s, dir) =>
    val bkt = conv(substring(md5(col("doc_id").cast("string")), 1, 2),
      16, 10).cast("int")
    docs(s, dir)
      .select(col("doc_id"),
        when(bkt < 230, "train").when(bkt < 243, "val")
          .otherwise("test").as("split"),
        headFp.as("head_fp"))
      .join(broadcast(benchFps(s, dir).withColumn("hit", lit(1))),
        Seq("head_fp"), "left")
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        count(col("hit")).as("n_contaminated"))
  }

  /** Deterministic per-group k-sample — k documents per language,
    * chosen by md5 order (a reproducible uniform draw, not top-by-
    * value like q13): rank over (lang, md5(doc_id)) with rk <= 3.
    * Catalyst rewrites the rank filter to WindowGroupLimit, so each
    * partition keeps only its local top-k before the shuffle — the
    * scale-safe "reservoir" stand-in (state per task = k rows per
    * group, never the group's population).
    */
  val q89 = Q("q89_group_sample",
    """WITH r AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
      |  FROM documents)
      |SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
      |FROM r WHERE rk <= 3""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs(s, dir)
      .select(col("lang"), col("doc_id"),
        row_number().over(w).cast("long").as("rk"))
      .filter(col("rk") <= 3)
  }

  /** Asymmetric n-gram CONTAINMENT — the near-dup measure Jaccard
    * (q31) misses: a short document fully embedded in a longer one has
    * low Jaccard (the union is large) but containment(A) = 1. Used by
    * curation pipelines to drop quotes/excerpts of kept documents.
    * Same narrow doc→doc+1 join shape as q31 (per-row gram sets,
    * array_intersect, no gram-grain shuffle); both directions
    * reported.
    */
  val q91 = Q("q91_containment",
    """WITH s AS (
      |  SELECT DISTINCT doc_id,
      |    substr(text,
      |      CAST(unnest(range(1, greatest(len(text)-3,1)+1)) AS INT),
      |      4) AS g
      |  FROM documents),
      |c AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
      |i AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
      |  FROM s a JOIN s b ON b.g = a.g AND b.doc_id = a.doc_id + 1
      |  GROUP BY 1, 2)
      |SELECT i.doc_a, i.doc_b,
      |  round(CAST(i.ni AS DOUBLE) / ca.n, 6) AS cont_a,
      |  round(CAST(i.ni AS DOUBLE) / cb.n, 6) AS cont_b
      |FROM i
      |JOIN c ca ON ca.doc_id = i.doc_a
      |JOIN c cb ON cb.doc_id = i.doc_b""".stripMargin) { (s, dir) =>
    val sets = gramSets(s, dir)
    val b = sets.select((col("doc_id") - 1).as("doc_id"),
      col("gs").as("gs_b"))
    sets.join(b, Seq("doc_id"))
      .select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b"),
        size(array_intersect(col("gs"), col("gs_b"))).as("ni"),
        size(col("gs")).as("na"), size(col("gs_b")).as("nb"))
      .filter(col("ni") > 0)
      .select(col("doc_a"), col("doc_b"),
        round(col("ni").cast("double") / col("na"), 6).as("cont_a"),
        round(col("ni").cast("double") / col("nb"), 6).as("cont_b"))
  }

  /** LSH CALIBRATION — the empirical s-curve of the q30 candidate
    * generator: for a deterministic FIXED-SIZE block sample
    * (doc_id % S < 2 with stride S = max(20, 2·⌈n/500⌉) derived
    * from the corpus count — blocks of two consecutive ids, so the
    * sample contains the id-adjacent pairs where this corpus's
    * near-dups live), compute EXACT Jaccard over the INDEX'S OWN
    * shingle space (8-char stride-4 shingles — the set the minhash
    * signature actually sketches; 4-gram Jaccard would be a
    * different measure and the banding theory would not apply to
    * it), bucket by Jaccard decile, and report per decile how many
    * pairs the production generator (2 bands × 3 minhash rows,
    * buckets capped 2..20 on the FULL corpus — the caps are part of
    * what is measured) actually surfaced, next to the banding
    * expectation P(candidate) = 1 − (1 − j³)² (Broder/MMDS
    * analysis). This is the dedup-side analog of q55's ANN recall
    * harness: the number that certifies the index, not just runs it.
    *
    * Determinism: jaccard and hit_rate are divisions of exact
    * integers (identical doubles in both engines — the unrounded-
    * division convention); the decile is floor(jac·10) clamped to
    * 9; expected_rate uses multiplication only (m·m·m, x·x — no
    * pow()); the stride is integer arithmetic on the exact corpus
    * count — so every output bit matches across engines. Base
    * population: sample pairs sharing ≥ 1 shingle (a pair sharing
    * none has j = 0 and a cryptographically negligible candidate
    * probability).
    *
    * Scale shape: the exact side is all-pairs ON THE SAMPLE, and the
    * count-derived stride pins the sample at ~500 docs however
    * large the corpus grows — C(500, 2) array_intersects is a
    * CONSTANT absolute cost (measured flat in SCALE.md; the fixed
    * 10% rate it replaces was quadratic-in-corpus, 4.8→59 s at 8×),
    * which is how a calibration harness must behave: statistical
    * confidence needs a fixed pair budget, not a fixed fraction.
    * The candidate side reuses the shared bands artifact and its
    * full-corpus caps, filtered to sample docs before the pair
    * join; the generator under test still runs against the whole
    * corpus. The stride computation is one count(*) — on parquet a
    * metadata read, not a scan.
    */
  val q131 = Q("q131_lsh_scurve",
    s"""WITH $shingleSqlCte,
       |ns AS (
       |  SELECT greatest(20, 2 * ((count(*) + 499) // 500)) AS s
       |  FROM documents),
       |b AS (
       |  SELECT doc_id, 0 AS band, mh0 || mh1 || mh2 AS key FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, mh3 || mh4 || mh5 AS key FROM sig),
       |sized AS (
       |  SELECT band, key FROM b GROUP BY band, key
       |  HAVING count(*) BETWEEN 2 AND 20),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
       |  FROM sized x
       |  JOIN b a ON a.band = x.band AND a.key = x.key
       |    AND a.doc_id % (SELECT s FROM ns) < 2
       |  JOIN b c ON c.band = x.band AND c.key = x.key
       |    AND c.doc_id % (SELECT s FROM ns) < 2
       |    AND a.doc_id < c.doc_id),
       |sp AS (
       |  SELECT DISTINCT doc_id, sh AS g FROM sh
       |  WHERE doc_id % (SELECT s FROM ns) < 2),
       |c AS (SELECT doc_id, count(*) AS n FROM sp GROUP BY doc_id),
       |i AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
       |  FROM sp a JOIN sp b ON b.g = a.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |j AS (
       |  SELECT i.doc_a, i.doc_b,
       |    CAST(i.ni AS DOUBLE) / (ca.n + cb.n - i.ni) AS jac
       |  FROM i
       |  JOIN c ca ON ca.doc_id = i.doc_a
       |  JOIN c cb ON cb.doc_id = i.doc_b),
       |h AS (
       |  SELECT least(CAST(floor(j.jac * 10) AS BIGINT), 9) AS bucket,
       |    CASE WHEN cand.doc_a IS NULL THEN 0 ELSE 1 END AS hit
       |  FROM j LEFT JOIN cand
       |    ON cand.doc_a = j.doc_a AND cand.doc_b = j.doc_b)
       |SELECT bucket, count(*) AS n_pairs,
       |  CAST(sum(hit) AS BIGINT) AS n_hits,
       |  CAST(sum(hit) AS DOUBLE) / count(*) AS hit_rate,
       |  1 - (1 - ((bucket + 0.5) / 10) * ((bucket + 0.5) / 10)
       |         * ((bucket + 0.5) / 10))
       |    * (1 - ((bucket + 0.5) / 10) * ((bucket + 0.5) / 10)
       |         * ((bucket + 0.5) / 10)) AS expected_rate
       |FROM h GROUP BY bucket""".stripMargin) { (s, dir) =>
    // count-derived stride pins the sample at ~500 docs (2 per
    // block of S consecutive ids); parquet count() is a metadata read
    val n = docs(s, dir).count()
    val stride = math.max(20L, 2L * ((n + 499L) / 500L))
    val bnd = bands(s, dir)
    val sized = bnd.groupBy("band", "key").agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, 20)).select("band", "key")
    val inCap = bnd.join(sized, Seq("band", "key"))
      .filter(col("doc_id") % stride < 2)
    val cand = inCap.select(col("band"), col("key"),
        col("doc_id").as("doc_a"))
      .join(inCap.select(col("band"), col("key"),
        col("doc_id").as("doc_b")), Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .withColumn("hit0", lit(1))
    // the index's own shingle space: 8-char shingles at stride 4.
    // Par.spread AFTER the sample gate: the ~500-doc calibration
    // sample is constant-size by construction, and the exact
    // all-pairs verify below it (C(500,2) array_intersects) is the
    // query's dominant cost — spread it across the cores instead of
    // one NLJ task (integer set intersections: partition-independent)
    val sets = graft.ops.Par.spread(
        docs(s, dir).filter(col("doc_id") % stride < 2))
      .select(col("doc_id"),
        graft.functions.TextHashF.shingleSet(col("text"), 8, 4).as("gs"))
    val a = sets.select(col("doc_id").as("doc_a"), col("gs").as("ga"))
    val b = sets.select(col("doc_id").as("doc_b"), col("gs").as("gb"))
    val jac = broadcast(a).join(b, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ga"), col("gb"))).as("ni"),
        size(col("ga")).as("na"), size(col("gb")).as("nb"))
      .filter(col("ni") > 0)
      .select(col("doc_a"), col("doc_b"), (col("ni").cast("double")
        / (col("na") + col("nb") - col("ni"))).as("jac"))
    val mid = (col("bucket") + lit(0.5)) / 10
    val j3 = mid * mid * mid
    jac.join(cand, Seq("doc_a", "doc_b"), "left")
      .select(least(floor(col("jac") * 10).cast("long"), lit(9L))
          .as("bucket"),
        coalesce(col("hit0"), lit(0)).as("hit"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"),
        sum("hit").cast("long").as("n_hits"),
        (sum("hit").cast("double") / count(lit(1))).as("hit_rate"))
      .withColumn("expected_rate", lit(1) - (lit(1) - j3) * (lit(1) - j3))
  }

  /** Index MAINTENANCE — the q79 store built INCREMENTALLY: the
    * corpus arrives in two batches (doc_id % 5 ≠ 0 first, the
    * remaining 20% as the delta), the second batch is hashed ALONE
    * and appended under the store's existing (band, key) bucket spec
    * ([[SignatureStore.appendBands]] → [[Warehouse.appendBucketed]]),
    * and candidate generation runs over the merged store. The oracle
    * is EXACTLY q79's batch-rebuild SQL over the full corpus — the
    * gate is incremental ≡ batch, row for row.
    *
    * Why it matters at 100 TB: a production dedup index absorbs a
    * daily crawl delta. Rebuilding re-hashes and re-shuffles the
    * whole corpus (O(N) per day); this path hashes the DELTA
    * (O(ΔN)), writes new per-bucket files without touching old ones,
    * and every consumer still gets the exchange-free bucketed reads
    * (the delta was bucket-hashed at write time). The plan spec pins
    * that: candidate generation over the two-batch store shows no
    * pre-distinct exchange, same as the one-shot store.
    */
  val q137 = Q("q137_store_upsert", q79.oracle.get) { (s, dir) =>
    val table = s"sig_bands_q137_${graft.SessionScratch.keyOf(dir)}"
    graft.SessionScratch.once(s, table) {
      val root = graft.SessionScratch.dir(s, "sigstore_inc")
      val wh = Warehouse(root)
      SignatureStore.writeBands(wh,
        docs(s, dir).filter(col("doc_id") % 5 =!= 0), table, 8)
      SignatureStore.appendBands(wh,
        docs(s, dir).filter(col("doc_id") % 5 === 0), table, 8)
    }
    SignatureStore.candidatesFromStore(s, table, 20)
  }

  /** Quality filter — the GOPHER REPETITION RULES (Rae et al. 2021,
    * arXiv:2112.11446 Table A1; the filter set most published
    * pipelines run verbatim): per doc, the fraction of characters
    * inside the most frequent 2-/3-/4-gram and inside duplicated
    * 5-grams. Complements q53 (distinct-ratio signals — how varied
    * the vocabulary is) with the CONCENTRATION signals (how much of
    * the doc one template phrase owns). Definition pin: the
    * duplicated-gram fraction counts cnt·len(gram) per duplicated
    * gram (overlaps double-counted, so it can exceed 1 on
    * pathological docs) — the common open reimplementation of the
    * rule, stated here because Gopher's prose is ambiguous; the
    * overlap-deduplicated variant of the signal is exactly q132's
    * span machinery at within-doc scope.
    *
    * Shape: ONE tagged gram explode (n ∈ 2..5 ≈ 4× the token
    * stream), (doc, n, gram) counts partial-aggregate map-side, the
    * top-1 is a (doc, n)-grain window (WindowGroupLimit bounds it),
    * the dup sum is doc-grain, and the final join is doc-grain —
    * nothing exceeds gram-stream volume, everything map-combines.
    * Determinism: covers are integer char counts; top-1 ties break
    * (cnt DESC, gram ASC) — binary collation matches across engines
    * on this ASCII corpus; the fractions are exact-integer divisions
    * (identical doubles, the unrounded-division convention).
    */
  val q139 = Q("q139_gopher_repetition",
    """WITH d AS (
      |  SELECT doc_id, length(text) AS n_chars,
      |    string_split(text, ' ') AS t
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, 2 AS n,
      |    t[CAST(i AS INT)] || ' ' || t[CAST(i+1 AS INT)] AS gram
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
      |        FROM d WHERE len(t) >= 2) x2
      |  UNION ALL
      |  SELECT doc_id, 3 AS n,
      |    t[CAST(i AS INT)] || ' ' || t[CAST(i+1 AS INT)] || ' ' ||
      |      t[CAST(i+2 AS INT)] AS gram
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
      |        FROM d WHERE len(t) >= 3) x3
      |  UNION ALL
      |  SELECT doc_id, 4 AS n,
      |    t[CAST(i AS INT)] || ' ' || t[CAST(i+1 AS INT)] || ' ' ||
      |      t[CAST(i+2 AS INT)] || ' ' || t[CAST(i+3 AS INT)] AS gram
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 2)) AS i
      |        FROM d WHERE len(t) >= 4) x4
      |  UNION ALL
      |  SELECT doc_id, 5 AS n,
      |    t[CAST(i AS INT)] || ' ' || t[CAST(i+1 AS INT)] || ' ' ||
      |      t[CAST(i+2 AS INT)] || ' ' || t[CAST(i+3 AS INT)] || ' ' ||
      |      t[CAST(i+4 AS INT)] AS gram
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS i
      |        FROM d WHERE len(t) >= 5) x5),
      |c AS (
      |  SELECT doc_id, n, gram, count(*) AS cnt
      |  FROM g GROUP BY doc_id, n, gram),
      |top AS (
      |  SELECT doc_id, n, cnt * length(gram) AS cov FROM (
      |    SELECT doc_id, n, gram, cnt,
      |      row_number() OVER (PARTITION BY doc_id, n
      |                         ORDER BY cnt DESC, gram) AS rn
      |    FROM c WHERE n <= 4) r WHERE rn = 1),
      |dup AS (
      |  SELECT doc_id, 5 AS n, sum(cnt * length(gram)) AS cov
      |  FROM c WHERE n = 5 AND cnt >= 2 GROUP BY doc_id),
      |u AS (SELECT * FROM top UNION ALL SELECT * FROM dup),
      |cv AS (
      |  SELECT doc_id,
      |    max(CASE WHEN n = 2 THEN cov END) AS c2,
      |    max(CASE WHEN n = 3 THEN cov END) AS c3,
      |    max(CASE WHEN n = 4 THEN cov END) AS c4,
      |    max(CASE WHEN n = 5 THEN cov END) AS c5
      |  FROM u GROUP BY doc_id)
      |SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars,
      |  CAST(coalesce(cv.c2, 0) AS DOUBLE) / d.n_chars AS top2_frac,
      |  CAST(coalesce(cv.c3, 0) AS DOUBLE) / d.n_chars AS top3_frac,
      |  CAST(coalesce(cv.c4, 0) AS DOUBLE) / d.n_chars AS top4_frac,
      |  CAST(coalesce(cv.c5, 0) AS DOUBLE) / d.n_chars AS dup5_frac
      |FROM d LEFT JOIN cv USING (doc_id)""".stripMargin) { (s, dir) =>
    val toks = TextOps.tokens(col("text"))
    val nt = size(toks)
    def grams(k: Int): Column =
      (0 until k).map(j => slice(toks, lit(j + 1), nt - (k - 1)))
        .reduceRight((a, b) => zip_with(a, b,
          (x, y) => concat(x, lit(" "), y)))
    // Measured r20, NOT changed: two rewrites of this shape were
    // A/B'd and both lost or tied — (a) Par.spread above the union
    // (the per-branch nt>=k filters push below the exchange and split
    // it into four non-reusable exchanges, so the scan still runs 4x:
    // full-bench 1.01x), (b) one-pass tagged gram build
    // (flatten(array_k(transform(grams(k), struct(k, gram)))) +
    // single explode, removing the 4x re-tokenization: full-bench
    // 2.39 -> 2.66 s, 1.11x WORSE — the four union branches already
    // overlap as independent stages, and the fused projection builds
    // all four gram arrays per row in one task's memory). Keeping the
    // original union-of-explodes.
    val base = docs(s, dir).select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars"), col("text"))
    val g = (2 to 5).map { k =>
      base.filter(nt >= k).select(col("doc_id"), lit(k.toLong).as("n"),
        explode(grams(k)).as("gram"))
    }.reduce(_ unionByName _)
    val counts = g.groupBy("doc_id", "n", "gram")
      .agg(count(lit(1)).as("cnt"))
    val wtop = Window.partitionBy("doc_id", "n")
      .orderBy(col("cnt").desc, col("gram").asc)
    val top = counts.filter(col("n") <= 4)
      .withColumn("rn", row_number().over(wtop))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("n"),
        (col("cnt") * length(col("gram"))).cast("long").as("cov"))
    val dup = counts.filter(col("n") === 5 && col("cnt") >= 2)
      .groupBy("doc_id")
      .agg(sum(col("cnt") * length(col("gram"))).cast("long").as("cov"))
      .select(col("doc_id"), lit(5L).as("n"), col("cov"))
    val covs = top.unionByName(dup).groupBy("doc_id")
      .agg(max(when(col("n") === 2, col("cov"))).as("c2"),
        max(when(col("n") === 3, col("cov"))).as("c3"),
        max(when(col("n") === 4, col("cov"))).as("c4"),
        max(when(col("n") === 5, col("cov"))).as("c5"))
    base.select("doc_id", "n_chars")
      .join(covs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        (coalesce(col("c2"), lit(0L)).cast("double") / col("n_chars"))
          .as("top2_frac"),
        (coalesce(col("c3"), lit(0L)).cast("double") / col("n_chars"))
          .as("top3_frac"),
        (coalesce(col("c4"), lit(0L)).cast("double") / col("n_chars"))
          .as("top4_frac"),
        (coalesce(col("c5"), lit(0L)).cast("double") / col("n_chars"))
          .as("dup5_frac"))
  }

  /** DATA SELECTION — DSIR-style importance resampling (Xie et al.
    * 2023, "Data Selection for Language Models via Importance
    * Resampling"): score every raw document by how much its hashed
    * unigram features look like a target distribution, then keep the
    * top-k. Target = the bench-like slice (doc_id % 10 = 0, the same
    * convention q57/q120 decontaminate against); raw = the rest.
    * Features are hashed into 256 buckets (md5 first byte — q62's
    * split device), so the learned weight table is FIXED-SIZE no
    * matter the vocabulary: per bucket, weight = ln(p_target/p_raw)
    * with add-1 smoothing. Determinism is the q116 device — each
    * bucket weight is rounded to integer MICRO-NATS at the 256-row
    * bucket grain, so the per-doc score is an exact integer sum both
    * engines order identically.
    *
    * Scale shape: the bucket-count agg partial-aggregates the token
    * stream map-side into ≤256 groups; the weight table (256 rows)
    * broadcasts; scoring is one more partial-aggregated pass over the
    * token stream; the top-50 is orderBy+limit → TakeOrderedAndProject
    * (per-partition heap). Nothing in the plan grows with vocabulary
    * or corpus except the two linear scans.
    */
  val q141 = Q("q141_dsir_selection",
    """WITH tb AS (
      |  SELECT doc_id,
      |    (strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16
      |    + strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1 AS b
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |        FROM documents) t),
      |c AS (
      |  SELECT b,
      |    sum(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS ct,
      |    sum(CASE WHEN doc_id % 10 <> 0 THEN 1 ELSE 0 END) AS cr
      |  FROM tb GROUP BY b),
      |t AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM c),
      |w AS (
      |  SELECT b, CAST(round((ln((ct + 1.0) / (tt + 256))
      |    - ln((cr + 1.0) / (tr + 256))) * 1000000) AS BIGINT) AS ubits
      |  FROM c, t)
      |SELECT doc_id, count(*) AS n_tokens,
      |  CAST(sum(ubits) AS BIGINT) AS score_ubits
      |FROM tb JOIN w USING (b)
      |WHERE doc_id % 10 <> 0
      |GROUP BY doc_id
      |ORDER BY score_ubits DESC, doc_id
      |LIMIT 50""".stripMargin) { (s, dir) =>
    val tb = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"),
        conv(substring(md5(col("w")), 1, 2), 16, 10).cast("int").as("b"))
    val isT = col("doc_id") % 10 === 0
    val c = tb.groupBy("b").agg(
      sum(when(isT, 1L).otherwise(0L)).as("ct"),
      sum(when(!isT, 1L).otherwise(0L)).as("cr"))
    val tots = c.agg(sum("ct").as("tt"), sum("cr").as("tr"))
    val w = c.crossJoin(broadcast(tots))
      .select(col("b"),
        round((log((col("ct") + lit(1.0)) / (col("tt") + 256))
          - log((col("cr") + lit(1.0)) / (col("tr") + 256))) * 1000000)
          .cast("long").as("ubits"))
    tb.filter(col("doc_id") % 10 =!= 0)
      .join(broadcast(w), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("ubits").cast("long").as("score_ubits"))
      .orderBy(col("score_ubits").desc, col("doc_id"))
      .limit(50)
  }

  /** TOKENIZER EVALUATION — fertility (subword chunks per whitespace
    * word) per language: the standard measure of how well a
    * tokenizer fits a language's text (Rust et al. 2021 use exactly
    * this ratio to compare monolingual vs multilingual vocabularies).
    * Chunks come from the q50 GPT-2-style pre-tokenizer
    * ([[TextOps.bpeChunks]]); words from the whitespace split. Both
    * counts are map-only per-row scalars folded into one lang-grain
    * aggregate — a 100 TB corpus pays one linear scan and a 5-row
    * shuffle. The ratio is a single IEEE division of two exact
    * integer sums (the repo's unrounded-division determinism rule).
    */
  val q144 = Q("q144_tokenizer_fertility",
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
      |  CAST(sum(len(regexp_extract_all(text,
      |    '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+',
      |    0))) AS BIGINT) AS n_chunks,
      |  CAST(sum(len(regexp_extract_all(text,
      |    '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+',
      |    0))) AS DOUBLE)
      |    / sum(len(string_split(text, ' '))) AS fertility
      |FROM documents GROUP BY lang""".stripMargin) { (s, dir) =>
    docs(s, dir)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("w"),
        size(TextOps.bpeChunks(col("text"))).cast("long").as("c"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("w").cast("long").as("n_words"),
        sum("c").cast("long").as("n_chunks"),
        (sum("c").cast("double") / sum("w")).as("fertility"))
  }

  /** PER-SOURCE QUOTA CAP — the CCNet/RefinedWeb-style curation rule
    * "keep at most cap(s) documents per domain, best first" (Penedo
    * et al. 2023 cap per-domain contributions exactly this way to stop
    * a few crawl-heavy hosts from dominating the training mix). Rank
    * is deterministic quality order (n_chars DESC, doc_id). The cap is
    * ADAPTIVE — 20% of the source's own volume, clamped to [5, 40] —
    * so it cannot be a window literal. The scale-correct composition
    * is two-stage: (1) `row_number <= 40` against the GLOBAL literal
    * clamp, which Catalyst rewrites to WindowGroupLimit (spec-pinned)
    * — every map task keeps a 40-row heap per source, so the window
    * shuffle carries <= 40·partitions rows per source, not the corpus;
    * (2) the adaptive cap, a source-grain broadcast (one row per
    * source), filters the survivors exactly. At 100 TB stage 1 is the
    * only corpus-grain work and it is heap-bounded map-side; the
    * full-sort-per-source a naive window would pay never happens.
    */
  val q148 = Q("q148_source_quota_cap",
    """WITH r AS (
      |  SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY n_chars DESC, doc_id) AS rnk
      |  FROM documents),
      |c AS (
      |  SELECT source, count(*) AS n_docs,
      |    least(40, greatest(5,
      |      CAST(ceil(count(*) * 0.2) AS INTEGER))) AS cap
      |  FROM documents GROUP BY source)
      |SELECT source, n_docs, cap, count(*) AS n_kept,
      |  CAST(sum(n_chars) AS BIGINT) AS kept_chars
      |FROM r JOIN c USING (source)
      |WHERE rnk <= cap
      |GROUP BY source, n_docs, cap
      |ORDER BY source""".stripMargin) { (s, dir) =>
    val d = docs(s, dir)
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val ranked = d.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 40) // literal clamp -> WindowGroupLimit
    val caps = d.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("cap",
        least(lit(40), greatest(lit(5),
          ceil(col("n_docs") * 0.2).cast("int"))))
    ranked.join(broadcast(caps), "source")
      .filter(col("rnk") <= col("cap"))
      .groupBy("source", "n_docs", "cap")
      .agg(count(lit(1)).as("n_kept"),
        sum("n_chars").cast("long").as("kept_chars"))
      .orderBy("source")
  }

  /** EXACT STRATIFIED SAMPLE — keep exactly ceil(10% of N_lang) docs
    * per language, chosen by deterministic pseudo-random order
    * (md5 of doc_id). The naive form is one window per stratum — but
    * `lang` has a handful of values, so at 100 TB a per-stratum
    * row_number serializes each stratum into ONE task. This is the
    * distributed-selection rewrite (one round of distributed
    * quickselect, the same trick RangePartitioner uses to pick sort
    * boundaries): bucket every doc by its first hash byte, count at
    * (lang, bucket) grain — a few·256-row table — and classify each
    * bucket against the stratum quota: buckets wholly below the
    * cutoff are kept with NO sort, buckets wholly above are dropped,
    * and only the ONE straddling bucket per stratum pays a
    * row_number, over ~1/256 of that stratum. Corpus-grain work is
    * one map-side-combined count and one broadcast-join filter; the
    * only window runs on the straddle slice. Ordering equivalence
    * with the oracle's plain global rank holds because the bucket id
    * is the hash's leading 2 hex chars, so bucket order IS hash-prefix
    * order (hex digits are ASCII-ascending).
    */
  val q149 = Q("q149_stratified_sample",
    """WITH r AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM documents)
      |SELECT doc_id, lang FROM r
      |WHERE rnk <= CAST(ceil(n * 0.1) AS BIGINT)""".stripMargin) {
    (s, dir) =>
    val d = docs(s, dir)
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("b", conv(substring(col("h"), 1, 2), 16, 10).cast("int"))
    val counts = d.groupBy("lang", "b").agg(count(lit(1)).as("cnt"))
    val wLang = Window.partitionBy("lang")
    val cum = counts
      .withColumn("n", sum("cnt").over(wLang))
      .withColumn("cum",
        coalesce(sum("cnt").over(wLang.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("q", ceil(col("n") * 0.1).cast("long"))
      .select("lang", "b", "cnt", "cum", "q")
    val tagged = d.join(broadcast(cum), Seq("lang", "b"))
    val whole = tagged
      .filter(col("cum") + col("cnt") <= col("q"))
      .select("doc_id", "lang")
    val straddleW = Window.partitionBy("lang", "b")
      .orderBy(col("h"), col("doc_id"))
    val partial = tagged
      .filter(col("cum") < col("q") && col("cum") + col("cnt") > col("q"))
      .withColumn("rnk", row_number().over(straddleW))
      .filter(col("rnk") <= col("q") - col("cum"))
      .select("doc_id", "lang")
    whole.union(partial)
  }

  /** RAG CHUNKING — split every document into sliding token windows
    * (32 tokens, stride 24, so consecutive chunks overlap by 8) — the
    * retrieval-corpus preparation step every RAG index build runs
    * before embedding. The plan is MAP-ONLY: per row, `sequence`
    * enumerates the chunk starts and `slice` materializes each
    * window from the one split array — no shuffle, no join, no
    * window; at 100 TB this is embarrassingly parallel and the output
    * is ~|tokens|/stride rows. Chunk identity is the md5 of the
    * joined window (what a downstream dedup/embedding store would
    * key on). The last chunk is the first one whose window reaches
    * the end of the doc; short docs yield exactly one (possibly
    * short) chunk.
    */
  val q150 = Q("q150_rag_chunks",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws,
      |    len(string_split(text, ' ')) AS nw
      |  FROM documents),
      |i AS (
      |  SELECT doc_id, ws,
      |    unnest(generate_series(0,
      |      CAST(greatest(0, ceil((nw - 32) / 24.0)) AS BIGINT))) AS chunk_idx
      |  FROM t)
      |SELECT doc_id, chunk_idx,
      |  CAST(len(list_slice(ws, chunk_idx * 24 + 1,
      |                          chunk_idx * 24 + 32)) AS BIGINT) AS n_tokens,
      |  md5(array_to_string(list_slice(ws, chunk_idx * 24 + 1,
      |                                     chunk_idx * 24 + 32),
      |      ' ')) AS chunk_md5
      |FROM i""".stripMargin) { (s, dir) =>
    val c = 32
    val st = 24
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("nw", size(col("ws")))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0L),
          greatest(lit(0.0), ceil((col("nw") - c) / st.toDouble))
            .cast("long"))).as("chunk_idx"))
      .withColumn("chunk",
        slice(col("ws"), (col("chunk_idx") * st + 1).cast("int"), lit(c)))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(array_join(col("chunk"), " ")).as("chunk_md5"))
  }

  /** SOURCE DRIFT — KL(source unigram LM || corpus unigram LM) per
    * source: the standard domain-shift measure a mixture designer
    * reads before weighting sources (DoReMi/DSIR both reason in
    * exactly these per-domain log-ratio terms). All counting is
    * integer and map-side-combinable; the only joins run at
    * (source x vocab) / vocab grain — never the token stream — and
    * the source totals + corpus total are broadcast. Determinism is
    * the q116 device: each term's log-ratio is quantized to integer
    * micro-nats BEFORE the per-source sum (log of a ratio of exact
    * integers is bit-identical in any IEEE engine), so the sum is
    * exact integer arithmetic and the final per-source division is
    * one IEEE op. Term bound: |ubits| <= ln(N)*1e6 ~ 2e7 and
    * csw <= N, so csw*ubits stays far inside int64 for any corpus
    * whose token count fits in ~5e10 per source-word — at true
    * 100 TB scale the same sum runs in DECIMAL(38,0) accumulation;
    * documented, not needed at bench scale.
    */
  val q151 = Q("q151_source_kl",
    """WITH tok AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |sw AS (SELECT source, w, count(*) AS csw FROM tok GROUP BY 1, 2),
      |wt AS (SELECT w, sum(csw) AS cw FROM sw GROUP BY 1),
      |st AS (SELECT source, sum(csw) AS ns FROM sw GROUP BY 1),
      |tot AS (SELECT sum(csw) AS n FROM sw)
      |SELECT source, CAST(ns AS BIGINT) AS n_tokens,
      |  CAST(sum(csw * CAST(round(ln(
      |    (csw * n) / CAST(cw * ns AS DOUBLE)) * 1000000) AS BIGINT))
      |    AS BIGINT) AS kl_unats,
      |  CAST(sum(csw * CAST(round(ln(
      |    (csw * n) / CAST(cw * ns AS DOUBLE)) * 1000000) AS BIGINT))
      |    AS DOUBLE) / 1000000.0 / ns AS kl_nats
      |FROM sw JOIN wt USING (w) JOIN st USING (source) CROSS JOIN tot
      |GROUP BY source, ns
      |ORDER BY source""".stripMargin) { (s, dir) =>
    val tok = docs(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val sw = tok.groupBy("source", "w").agg(count(lit(1)).as("csw"))
    val wt = sw.groupBy("w").agg(sum("csw").as("cw"))
    val st = sw.groupBy("source").agg(sum("csw").as("ns"))
    val tot = sw.agg(sum("csw").as("n"))
    val ubits = round(log(
      (col("csw") * col("n")) / (col("cw") * col("ns")).cast("double"))
      * 1000000).cast("long")
    sw.join(wt, "w")
      .join(broadcast(st), "source")
      .crossJoin(broadcast(tot))
      .groupBy(col("source"), col("ns").as("n_tokens"))
      .agg(sum(col("csw") * ubits).cast("long").as("kl_unats"))
      .withColumn("kl_nats",
        col("kl_unats").cast("double") / 1000000.0 / col("n_tokens"))
      .orderBy("source")
  }

  /** Cross-source exact dedup with SOURCE PRECEDENCE — the published
    * multi-dataset composition rule (Dolma and RedPajama both dedupe
    * across their source mix keeping the copy from the
    * higher-priority source; The Pile's "weights" imply the same
    * ordering): when the same text appears in several sources, the
    * copy from the most-preferred source survives and every other
    * copy is dropped. Priority contract: the numeric source suffix,
    * lower = more curated (src0 is the q162 curated slice) — a
    * production run substitutes its real priority table; ties inside
    * one source fall to the lowest doc_id, so the decision is total
    * and engine-deterministic. The dedup key is the 10-token HEAD
    * fingerprint — this corpus's planted duplicate structure is
    * prefix-level (full texts are globally distinct), and head/URL
    * keys are exactly what the published cross-source passes use; a
    * production run swaps in its canonical id.
    *
    * Shape: one md5 fingerprint per doc (the q28 exact-dup key), ONE
    * fingerprint-grain min(struct(prio, doc_id)) exchange
    * (partial-aggregated argmin — no window over the corpus), a
    * fingerprint-keyed join back on the same key, then a source-grain
    * aggregate. Output per source: docs, kept, dropped, and how many
    * of the drops were yielded to a DIFFERENT source (vs in-source
    * duplicates) — the audit split a mixture owner reads.
    */
  val q166 = Q("q166_source_precedence_dedup",
    """WITH d AS (
      |  SELECT doc_id, source,
      |    coalesce(TRY_CAST(substr(source, 4) AS INT), 2147483647)
      |      AS prio,
      |    md5(array_to_string((string_split(text, ' '))[1:10], ' '))
      |      AS fp
      |  FROM documents),
      |k AS (
      |  SELECT fp, min(prio * 4294967296 + doc_id) AS pk
      |  FROM d GROUP BY fp),
      |j AS (
      |  SELECT d.doc_id, d.source, d.prio,
      |    CASE WHEN d.prio * 4294967296 + d.doc_id = k.pk
      |      THEN 1 ELSE 0 END AS keep,
      |    CAST(k.pk // 4294967296 AS BIGINT) AS keep_prio
      |  FROM d JOIN k USING (fp))
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(keep) AS BIGINT) AS n_kept,
      |  CAST(sum(1 - keep) AS BIGINT) AS n_dropped,
      |  CAST(sum(CASE WHEN keep = 0 AND keep_prio <> prio
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_yielded
      |FROM j GROUP BY source""".stripMargin) { (s, dir) =>
    // priority is TOTAL: an unparseable source suffix coalesces to
    // least-curated (Int.MaxValue) on BOTH sides instead of a null
    // that would win the nulls-first struct-min and leave its
    // fingerprint group with zero keepers (round-9 follow-up review)
    // FULL suffix, like the oracle's bare substr(source, 4): a
    // truncated-prefix parse (substr(_, 4, 10)) would cast an
    // 11+-digit suffix to a REAL priority from its first 10 digits
    // while the oracle's whole-string TRY_CAST overflows to NULL —
    // divergent ranks. Whole-suffix cast overflows to NULL in both
    // engines, and the coalesce makes both land on least-curated.
    val d = docs(s, dir).select(col("doc_id"), col("source"),
      coalesce(col("source").substr(lit(4), length(col("source")))
        .cast("int"), lit(Int.MaxValue)).as("prio"),
      md5(array_join(slice(split(col("text"), " "), 1, 10), " "))
        .as("fp"))
    // struct-min argmin, ONE exchange at fingerprint grain — NOT the
    // packed-BIGINT device: prio*2^32 + doc_id silently collides once
    // doc_id reaches 2^32, exactly the scale this operator claims
    // (the round-9 review's catch). The SortAggregate this costs is
    // the documented ivfAssign trade; the ORACLE keeps the packed
    // form, which is exact at oracle scale, so a PASS also pins the
    // two formulations equal. The keeper's source stays recoverable
    // from its priority (source <-> prio is bijective), so no join
    // back to the kept set is ever needed.
    val k = d.groupBy("fp")
      .agg(min(struct(col("prio").cast("long").as("kp"),
        col("doc_id").as("kd"))).as("k"))
      .select(col("fp"), col("k.kp").as("keep_prio"),
        col("k.kd").as("keep_doc"))
    d.join(k, Seq("fp"))
      .withColumn("keep",
        when(col("prio").cast("long") === col("keep_prio") &&
          col("doc_id") === col("keep_doc"), 1L).otherwise(0L))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("keep").cast("long").as("n_kept"),
        sum(lit(1L) - col("keep")).cast("long").as("n_dropped"),
        sum(when(col("keep") === 0 &&
          col("keep_prio") =!= col("prio").cast("long"), 1L)
          .otherwise(0L)).cast("long").as("n_yielded"))
  }

  /** Near-dup keep with SOURCE PRECEDENCE — [[q120]]'s component
    * machinery under the published quality-aware keep rule: within a
    * near-duplicate cluster, survive the copy from the most-curated
    * SOURCE first ([[q166]]'s priority contract — numeric source
    * suffix, lower = more curated), then longest, then lowest id.
    * This is how the multi-source mixes actually resolve near-dup
    * clusters (RefinedWeb/Dolma keep by source precedence or quality
    * rank, not by arbitrary id); q120 remains the source-agnostic
    * form. Output adds the kept source and the cluster's distinct
    * source count — n_sources > 1 rows are exactly the cross-source
    * near-dups a mixture owner audits.
    *
    * Plan: identical shape to q120 (capped LSH candidates → O(log d)
    * components → ONE window at component grain); the precedence key
    * only changes the window's ORDER BY, so the scale argument is
    * unchanged.
    */
  val q168 = Q("q168_neardup_precedence_keep",
    s"""WITH RECURSIVE $shingleSqlCte,
       |b AS (
       |  SELECT doc_id, 0 AS band, mh0 || mh1 || mh2 AS key FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, mh3 || mh4 || mh5 AS key FROM sig),
       |sized AS (
       |  SELECT band, key FROM b GROUP BY band, key
       |  HAVING count(*) BETWEEN 2 AND 20),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
       |  FROM sized x
       |  JOIN b a ON a.band = x.band AND a.key = x.key
       |  JOIN b c ON c.band = x.band AND c.key = x.key
       |    AND a.doc_id < c.doc_id),
       |nodes AS (
       |  SELECT doc_a AS n FROM pairs
       |  UNION SELECT doc_b FROM pairs),
       |edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |r(n, m) AS (
       |  SELECT n, n FROM nodes
       |  UNION
       |  SELECT e.d, r.m FROM r JOIN edges e ON e.s = r.n),
       |cc AS (SELECT n, min(m) AS comp FROM r GROUP BY n),
       |ranked AS (
       |  SELECT d.doc_id, d.source, cc.comp,
       |    row_number() OVER (PARTITION BY cc.comp
       |      ORDER BY coalesce(TRY_CAST(substr(d.source, 4) AS INT),
       |          2147483647),
       |        d.n_chars DESC, d.doc_id) AS rk,
       |    count(*) OVER (PARTITION BY cc.comp) AS sz,
       |    count(DISTINCT d.source) OVER (PARTITION BY cc.comp)
       |      AS nsrc
       |  FROM cc JOIN documents d ON d.doc_id = cc.n)
       |SELECT doc_id, comp, CAST(sz AS BIGINT) AS n_members,
       |  source AS kept_source, CAST(nsrc AS BIGINT) AS n_sources
       |FROM ranked WHERE rk = 1
       |UNION ALL
       |SELECT doc_id, doc_id AS comp, CAST(1 AS BIGINT) AS n_members,
       |  source AS kept_source, CAST(1 AS BIGINT) AS n_sources
       |FROM documents
       |WHERE doc_id NOT IN (SELECT n FROM nodes)""".stripMargin) {
    (s, dir) =>
      val cc = lshComponents(s, dir)
      // q166's totality hardening applies here too: an unparseable
      // source suffix ranks least-curated (Int.MaxValue) instead of a
      // NULL that Spark's ascending window sorts FIRST (most-curated)
      // while the oracle's bare CAST would error — TRY_CAST+coalesce
      // keeps both engines total and agreeing. Full suffix, not a
      // 10-char prefix — see q166's parse note.
      val d = docs(s, dir).select(col("doc_id"), col("source"),
        coalesce(col("source").substr(lit(4), length(col("source")))
          .cast("int"), lit(Int.MaxValue)).as("prio"),
        col("n_chars"))
      val members = cc.join(d, cc("node") === d("doc_id"))
        .select(col("doc_id"), col("source"), col("prio"),
          col("comp"), col("n_chars"))
      val w = Window.partitionBy("comp")
        .orderBy(col("prio").asc, col("n_chars").desc,
          col("doc_id").asc)
      val wc = Window.partitionBy("comp")
      val best = members
        .withColumn("rk", row_number().over(w))
        .withColumn("sz", count(lit(1)).over(wc))
        .withColumn("nsrc",
          size(collect_set(col("source")).over(wc)))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("comp"),
          col("sz").cast("long").as("n_members"),
          col("source").as("kept_source"),
          col("nsrc").cast("long").as("n_sources"))
      val singletons = d
        .join(cc.select(col("node")), d("doc_id") === col("node"),
          "left_anti")
        .select(col("doc_id"), col("doc_id").as("comp"),
          lit(1L).as("n_members"), col("source").as("kept_source"),
          lit(1L).as("n_sources"))
      best.unionByName(singletons)
  }

  /** Exact-dup INGEST GATE against a persisted fingerprint store —
    * q137's incremental-maintenance contract for the exact-dedup
    * family: the historical corpus's head fingerprints live in an
    * fp-bucketed store (built once, here from the doc_id % 5 != 0
    * slice — the 80/20 device), and an arriving delta is admitted
    * only if (a) its fingerprint misses the store (anti-join whose
    * STORE side reads exchange-free from the bucketed layout) and
    * (b) it is the first holder of its fingerprint within the delta
    * itself (packed argmin at the delta's fingerprint grain — the
    * q166 device). This is the nightly-ingest shape: per run, the
    * store pays a bucketed read, the delta pays O(Δ), and admitted
    * fingerprints append under the same bucket spec
    * ([[graft.sources.Warehouse.appendBucketed]]) so the next run is
    * identical. The oracle recomputes the decision with no store at
    * all — a PASS proves store-routed ≡ from-scratch.
    */
  val q167 = Q("q167_fp_store_gate",
    """WITH d AS (
      |  SELECT doc_id, source,
      |    md5(array_to_string((string_split(text, ' '))[1:10], ' '))
      |      AS fp
      |  FROM documents),
      |hist AS (SELECT DISTINCT fp FROM d WHERE doc_id % 5 <> 0),
      |delta AS (SELECT * FROM d WHERE doc_id % 5 = 0),
      |miss AS (
      |  SELECT * FROM delta
      |  WHERE fp NOT IN (SELECT fp FROM hist)),
      |first AS (SELECT fp, min(doc_id) AS keep_doc FROM miss GROUP BY fp)
      |SELECT m.doc_id, m.source, m.fp
      |FROM miss m JOIN first f
      |  ON f.fp = m.fp AND f.keep_doc = m.doc_id""".stripMargin) {
    (s, dir) =>
    val d = docs(s, dir).select(col("doc_id"), col("source"),
      md5(array_join(slice(split(col("text"), " "), 1, 10), " "))
        .as("fp"))
    val table = s"fp_store_${graft.SessionScratch.keyOf(dir)}"
    graft.SessionScratch.once(s, table) {
      val wh = graft.sources.Warehouse(
        graft.SessionScratch.dir(s, "fpstore"))
      wh.saveBucketed(
        d.filter(col("doc_id") % 5 =!= 0).select("fp").distinct(),
        table, 8, Seq("fp"))
    }
    val delta = d.filter(col("doc_id") % 5 === 0)
    val miss = delta.join(s.table(table), Seq("fp"), "left_anti")
    val first = miss.select(col("fp").as("kfp"), col("doc_id"))
      .groupBy("kfp").agg(min(col("doc_id")).as("keep_doc"))
    miss.join(first,
        col("fp") === col("kfp") && col("doc_id") === col("keep_doc"))
      .select("doc_id", "source", "fp")
  }

  /** TRAINED char-trigram LANGUAGE CLASSIFIER — the fastText/CLD-style
    * upgrade over [[q33]]'s fixed marker list: a multi-class Naive
    * Bayes over character 3-grams, trained on the corpus's labeled
    * `lang` column with [[Extras.q162]]'s integer micro-nat machinery
    * (every log INDEPENDENTLY quantized to round(ln·10⁶) before any
    * sum, so both engines add identical integers; same documented ulp
    * caveat). Argmax ties break alphabetically (de,en,es,fr,zh) via
    * the ordered >= CASE chain, mirrored exactly in the oracle, so
    * the decision is total and engine-deterministic. Output: the
    * confusion matrix (lang, pred_lang, n) — q33's output shape, so
    * the two classifiers compare row-for-row.
    *
    * EVALUATION HONESTY: this corpus's lang labels are synthetic
    * noise — a measured 80/20 split shows the trained model does NOT
    * generalize (28% held-out vs the heuristic's 32%; the round-10
    * spec documents the measurement), so the oracle gates the
    * in-sample train+score contract (NB 288/500 vs heuristic
    * 160/500 at sf0.01), i.e. the MACHINERY — vocab-grain counts,
    * quantization, argmax totality — not linguistic generalization,
    * which needs real multilingual text.
    *
    * Shape: one corpus gram pass collapsing to GRAM grain (char
    * trigram vocab is alphabet-bounded — constant as the corpus
    * grows); class totals, vocab size, doc priors are SIX driver
    * longs (bounded pull); the weight table broadcasts (V rows);
    * scoring is one more gram pass + a doc-grain aggregate; the
    * confusion collapses to (lang, pred) grain. No corpus-grain
    * shuffle beyond the doc-grain aggregate — the q162 family shape,
    * multi-class.
    */
  val q171 = Q("q171_trained_langid",
    """WITH tok AS (
      |  SELECT doc_id, lang,
      |    unnest(list_transform(range(1, greatest(len(text) - 1, 1)),
      |      i -> substr(text, CAST(i AS INT), 3))) AS g
      |  FROM documents),
      |cnt AS (
      |  SELECT g,
      |    count(*) FILTER (WHERE lang = 'de') AS c_de,
      |    count(*) FILTER (WHERE lang = 'en') AS c_en,
      |    count(*) FILTER (WHERE lang = 'es') AS c_es,
      |    count(*) FILTER (WHERE lang = 'fr') AS c_fr,
      |    count(*) FILTER (WHERE lang = 'zh') AS c_zh
      |  FROM tok GROUP BY g),
      |tots AS (
      |  SELECT sum(c_de) AS t_de, sum(c_en) AS t_en, sum(c_es) AS t_es,
      |    sum(c_fr) AS t_fr, sum(c_zh) AS t_zh, count(*) AS v
      |  FROM cnt),
      |nd AS (
      |  SELECT count(*) FILTER (WHERE lang = 'de') AS n_de,
      |    count(*) FILTER (WHERE lang = 'en') AS n_en,
      |    count(*) FILTER (WHERE lang = 'es') AS n_es,
      |    count(*) FILTER (WHERE lang = 'fr') AS n_fr,
      |    count(*) FILTER (WHERE lang = 'zh') AS n_zh,
      |    count(*) AS n
      |  FROM documents),
      |wt AS (
      |  SELECT g,
      |    CAST(round(ln((c_de + 1.0) / (t.t_de + t.v)) * 1000000)
      |      AS BIGINT) AS u_de,
      |    CAST(round(ln((c_en + 1.0) / (t.t_en + t.v)) * 1000000)
      |      AS BIGINT) AS u_en,
      |    CAST(round(ln((c_es + 1.0) / (t.t_es + t.v)) * 1000000)
      |      AS BIGINT) AS u_es,
      |    CAST(round(ln((c_fr + 1.0) / (t.t_fr + t.v)) * 1000000)
      |      AS BIGINT) AS u_fr,
      |    CAST(round(ln((c_zh + 1.0) / (t.t_zh + t.v)) * 1000000)
      |      AS BIGINT) AS u_zh
      |  FROM cnt CROSS JOIN tots t),
      |pr AS (
      |  SELECT
      |    CAST(round(ln(CAST(n_de AS DOUBLE) / n) * 1000000) AS BIGINT)
      |      AS p_de,
      |    CAST(round(ln(CAST(n_en AS DOUBLE) / n) * 1000000) AS BIGINT)
      |      AS p_en,
      |    CAST(round(ln(CAST(n_es AS DOUBLE) / n) * 1000000) AS BIGINT)
      |      AS p_es,
      |    CAST(round(ln(CAST(n_fr AS DOUBLE) / n) * 1000000) AS BIGINT)
      |      AS p_fr,
      |    CAST(round(ln(CAST(n_zh AS DOUBLE) / n) * 1000000) AS BIGINT)
      |      AS p_zh
      |  FROM nd),
      |sc AS (
      |  SELECT tok.doc_id, tok.lang,
      |    sum(wt.u_de) + min(pr.p_de) AS s_de,
      |    sum(wt.u_en) + min(pr.p_en) AS s_en,
      |    sum(wt.u_es) + min(pr.p_es) AS s_es,
      |    sum(wt.u_fr) + min(pr.p_fr) AS s_fr,
      |    sum(wt.u_zh) + min(pr.p_zh) AS s_zh
      |  FROM tok JOIN wt USING (g) CROSS JOIN pr
      |  GROUP BY tok.doc_id, tok.lang),
      |p AS (
      |  SELECT lang, CASE
      |    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr
      |     AND s_de >= s_zh THEN 'de'
      |    WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
      |    WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
      |    WHEN s_fr >= s_zh THEN 'fr'
      |    ELSE 'zh' END AS pred_lang
      |  FROM sc)
      |SELECT lang, pred_lang, count(*) AS n
      |FROM p GROUP BY lang, pred_lang""".stripMargin) { (s, dir) =>
    val (langs, tok, cnt, tot, v, nd, n) = langidCounts(s, dir)
    val prior = langs.map(l => l -> microQ(nd(l).toDouble / n)).toMap
    val wt = cnt.select(col("g") +: langs.map(l =>
      round(log((col(s"c_$l") + lit(1.0)) / lit((tot(l) + v).toDouble))
        * 1000000).cast("long").as(s"u_$l")): _*)
    val sc = tok.join(broadcast(wt), Seq("g"))
      .groupBy("doc_id", "lang")
      .agg(sum(s"u_${langs.head}").as(s"s_${langs.head}"),
        langs.tail.map(l => sum(s"u_$l").as(s"s_$l")): _*)
      .select(col("doc_id") +: col("lang") +: langs.map(l =>
        (col(s"s_$l") + lit(prior(l))).as(s"s_$l")): _*)
    val pred = when(col("s_de") >= col("s_en") &&
        col("s_de") >= col("s_es") && col("s_de") >= col("s_fr") &&
        col("s_de") >= col("s_zh"), "de")
      .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr") &&
        col("s_en") >= col("s_zh"), "en")
      .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_zh"), "es")
      .when(col("s_fr") >= col("s_zh"), "fr")
      .otherwise("zh")
    sc.withColumn("pred_lang", pred)
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
  }

  /** Char trigrams via sequence+transform HOFs (in-row, codegen'd).
    * The length guard matters: sequence(1, L-2) with L < 3 would
    * COUNT DOWN (negative default step), minting phantom grams.
    * Shared by [[q171]], [[langidModel]], and the streaming scorer —
    * one definition, so the three can never drift.
    */
  private[graft] def charTrigrams(text: Column): Column =
    when(length(text) >= 3,
      transform(sequence(lit(1), length(text) - 2),
        i => text.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))

  /** round(ln(x)·10⁶) with HALF_UP — the micro-nat quantizer of the
    * q162/q171 family, driver side.
    */
  private def microQ(x: Double): Long = BigDecimal(math.log(x) * 1e6)
    .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** The langid family's shared TRAINING frames and constants: ONE
    * gram-grain counting pass (per-gram counts for all five classes in
    * the same aggregate — the q162 joint-vocab device, multi-class;
    * Materialized per corpus) plus the twelve driver longs (5 class
    * totals, vocab size, 5 doc counts, corpus size — the audited
    * bounded-pull pattern, so neither the weight table nor scoring
    * ever crossJoins). Single source of truth for [[q171]] and
    * [[langidModel]] — a smoothing or quantization change lands in
    * both (and through the model, in the stream scorer) or neither.
    */
  private def langidCounts(s: SparkSession, dir: String): (Seq[String],
      DataFrame, DataFrame, Map[String, Long], Long,
      Map[String, Long], Long) = {
    val langs = Seq("de", "en", "es", "fr", "zh")
    // Par.spread: the trigram explode + weight join + per-doc sums
    // below are the module's heaviest map-side chain and all its
    // aggregation is exact-integer (micro-nat longs, counts) —
    // partitioning-independent by the determinism policy
    val d = graft.ops.Par.spread(
      docs(s, dir).select(col("doc_id"), col("lang"), col("text")))
    val tok = d.select(col("doc_id"), col("lang"),
      explode(charTrigrams(col("text"))).as("g"))
    val cnt = graft.Materialized(s, s"langid_cnt:$dir") {
      tok.groupBy("g").agg(
        count(when(col("lang") === langs.head, 1)).as(s"c_${langs.head}"),
        langs.tail.map(l =>
          count(when(col("lang") === l, 1)).as(s"c_$l")): _*)
    }
    val t0 = cnt.agg(
      sum(s"c_${langs.head}"),
      langs.tail.map(l => sum(s"c_$l").as(s"t_$l")) :+ count(lit(1)): _*)
      .head()
    val tot = langs.zipWithIndex.map { case (l, i) => l -> t0.getLong(i) }.toMap
    val v = t0.getLong(langs.size)
    val d0 = d.agg(
      count(when(col("lang") === langs.head, 1)),
      langs.tail.map(l => count(when(col("lang") === l, 1))) :+
        count(lit(1)): _*)
      .head()
    val nd = langs.zipWithIndex.map { case (l, i) => l -> d0.getLong(i) }.toMap
    val n = d0.getLong(langs.size)
    (langs, tok, cnt, tot, v, nd, n)
  }

  /** [[q171]]'s trained model EXPORTED to the driver: (langs, gram →
    * per-lang micro-nat weights, per-lang OOV floors, per-lang
    * priors) — the artifact a deployment ships to the streaming
    * scorer ([[graft.streaming.StreamingEtl.langidScoreStream]]).
    * The pull is bounded by the char-trigram vocabulary (alphabet³
    * ceiling, V=377 at this corpus) — a trained classifier IS a
    * driver-sized artifact by construction; formulas are q171's
    * verbatim (same Materialized count frame, same micro
    * quantization), and the round-10 streaming spec pins the exported
    * model's confusion equal to q171's oracle-gated output.
    */
  private[graft] def langidModel(s: SparkSession, dir: String)
      : (Seq[String], Map[String, Seq[Long]], Seq[Long], Seq[Long]) = {
    val (langs, _, cnt, tot, v, nd, n) = langidCounts(s, dir)
    // driver-side microQ over collected counts lands on the identical
    // longs as q171's in-plan round(log(...)): Spark's log codegen IS
    // Math.log and round() is the same HALF_UP
    val weights = cnt.collect().map { r =>
      r.getString(0) -> langs.zipWithIndex.map { case (l, i) =>
        microQ((r.getLong(i + 1) + 1.0) / (tot(l) + v))
      }
    }.toMap
    val floors = langs.map(l => microQ(1.0 / (tot(l) + v)))
    val priors = langs.map(l => microQ(nd(l).toDouble / n))
    (langs, weights, floors, priors)
  }

  /** HTML STRIP round-trip — [[graft.text.TextOps.htmlToText]] gated
    * end-to-end: the corpus carries no markup, so each doc is wrapped
    * IN-QUERY into a full HTML page (the [[q50]] synthesis device,
    * identical string in both engines): DOCTYPE, head with title +
    * style + a script whose body contains ENTITIES that must not leak
    * (`1 &lt; 2`, `"&amp;"`), a comment containing fake markup, body
    * attributes, and the doc's text with every space entity-encoded
    * as `&nbsp;` — so tag removal, block-content removal, comment
    * handling, entity decoding, and whitespace collapse are ALL on
    * the path from html back to the original text. Output pins
    * `stripped == text` (ok), the stripped md5 (bit-identical
    * extraction across engines), and the before/after lengths.
    * Map-only — one projection chain, no shuffle at any scale.
    */
  val q172 = Q("q172_html_strip",
    """WITH h AS (
      |  SELECT doc_id, text,
      |    '<!DOCTYPE html><html><head><title>d' || doc_id ||
      |    '</title><style>p { margin: 0; }</style>' ||
      |    '<script>if (1 &lt; 2) { x = "&amp;"; }</script></head>' ||
      |    '<body id="b' || doc_id || '"><!-- <p>not text</p> -->' ||
      |    '<p class="t">' || replace(text, ' ', '&nbsp;') ||
      |    '</p><br/></body></html>' AS html
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, text, html,
      |    trim(regexp_replace(
      |      replace(replace(replace(replace(replace(replace(
      |        regexp_replace(
      |          regexp_replace(
      |            regexp_replace(
      |              regexp_replace(
      |                regexp_replace(html, '(?s)<!--.*?-->', ' ', 'g'),
      |                '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      |              '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      |            '(?is)<title[^>]*>.*?</title>', ' ', 'g'),
      |          '<[^>]+>', ' ', 'g'),
      |        '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
      |        '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
      |      '\s+', ' ', 'g')) AS stripped
      |  FROM h)
      |SELECT doc_id,
      |  CAST(CASE WHEN stripped = text THEN 1 ELSE 0 END AS BIGINT)
      |    AS ok,
      |  md5(stripped) AS text_md5,
      |  CAST(len(html) AS BIGINT) AS n_html_chars,
      |  CAST(len(stripped) AS BIGINT) AS n_text_chars
      |FROM s""".stripMargin) { (s, dir) =>
    val html = concat(
      lit("<!DOCTYPE html><html><head><title>d"),
      col("doc_id").cast("string"),
      lit("</title><style>p { margin: 0; }</style>" +
        "<script>if (1 &lt; 2) { x = \"&amp;\"; }</script></head>" +
        "<body id=\"b"),
      col("doc_id").cast("string"),
      lit("\"><!-- <p>not text</p> --><p class=\"t\">"),
      replace(col("text"), lit(" "), lit("&nbsp;")),
      lit("</p><br/></body></html>"))
    docs(s, dir)
      .select(col("doc_id"), col("text"), html.as("html"))
      .withColumn("stripped", TextOps.htmlToText(col("html")))
      .select(col("doc_id"),
        when(col("stripped") === col("text"), 1L).otherwise(0L).as("ok"),
        md5(col("stripped")).as("text_md5"),
        length(col("html")).cast("long").as("n_html_chars"),
        length(col("stripped")).cast("long").as("n_text_chars"))
  }

  /** LEAKAGE-CONTROLLED SPLIT — group-aware train/val/test
    * assignment: a random doc-level split leaks near-duplicates
    * across the boundary (the train set then contains a paraphrase
    * of every eval doc — the contamination Lee et al. 2022 measure),
    * so the unit of assignment must be the DUPLICATE COMPONENT, not
    * the document. Pipeline: q30's LSH candidate pairs →
    * [[graft.ops.Components.connected]] (min-label propagation) →
    * every doc's group is its component id (its own id if
    * unclustered) → the group id alone, hashed (md5, salted
    * `fold:`), picks the split 80/10/10. Membership is a pure
    * function of the group, so NO component can span splits — the
    * invariant the spec asserts, and the reason the hash input must
    * not mention doc_id.
    *
    * Shape: the component table is |clustered docs| (≪ corpus) and
    * the corpus-grain work is ONE left join against it (broadcast at
    * any realistic cluster-table size) plus a map-only hash — no
    * window, no global sort; at 100 TB the split is embarrassingly
    * parallel after the (already-bounded) components fixpoint.
    */
  val q175 = Q("q175_leakage_split",
    s"""WITH RECURSIVE $shingleSqlCte,
       |b AS (
       |  SELECT doc_id, 0 AS band, mh0 || mh1 || mh2 AS key FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, mh3 || mh4 || mh5 AS key FROM sig),
       |sized AS (
       |  SELECT band, key FROM b GROUP BY band, key
       |  HAVING count(*) BETWEEN 2 AND 20),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
       |  FROM sized x
       |  JOIN b a ON a.band = x.band AND a.key = x.key
       |  JOIN b c ON c.band = x.band AND c.key = x.key
       |    AND a.doc_id < c.doc_id),
       |nodes AS (
       |  SELECT doc_a AS n FROM pairs
       |  UNION SELECT doc_b FROM pairs),
       |edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |r(n, m) AS (
       |  SELECT n, n FROM nodes
       |  UNION
       |  SELECT e.d, r.m FROM r JOIN edges e ON e.s = r.n),
       |cc AS (SELECT n, min(m) AS comp FROM r GROUP BY n),
       |g AS (
       |  SELECT d.doc_id, coalesce(cc.comp, d.doc_id) AS grp
       |  FROM documents d LEFT JOIN cc ON cc.n = d.doc_id),
       |f AS (
       |  SELECT doc_id, grp,
       |    CAST(('0x' || substr(md5('fold:' || grp), 1, 4)) AS BIGINT)
       |      % 10 AS bucket
       |  FROM g)
       |SELECT doc_id, grp,
       |  CASE WHEN bucket < 8 THEN 'train'
       |       WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split
       |FROM f""".stripMargin) { (s, dir) =>
    val cc = lshComponents(s, dir)
      .withColumnRenamed("node", "doc_id")
    val bucket = conv(
      substring(md5(concat(lit("fold:"), col("grp").cast("string"))),
        1, 4), 16, 10).cast("long") % 10
    docs(s, dir).select(col("doc_id"))
      .join(broadcast(cc), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("grp"))
      .select(col("doc_id"), col("grp"),
        when(bucket < 8, "train").when(bucket === 8, "val")
          .otherwise("test").as("split"))
  }

  /** CURRICULUM SCHEDULE MATERIALIZATION — the step between mixture
    * PLANNING (q130/q148/q159 decide how much of each source) and the
    * training run: produce the actual interleaved ORDER the loader
    * reads, easy-first within each source (curriculum learning,
    * Bengio et al. 2009 — shortest documents lead) and sources
    * interleaved in proportion to their weights via WEIGHTED FAIR
    * QUEUEING virtual finish times (Demers et al. 1989): a doc's
    * schedule key is `rank_within_source × (L/w)` with L = lcm of the
    * weights, so a weight-3 source lands 3 docs in the time a
    * weight-1 source lands one — the deterministic, integer-only form
    * of "sample sources proportionally", with none of an RNG's
    * cross-engine hazards. Weights derive from the q166 source-suffix
    * parse ((prio mod 3) + 1, unparseable → least-curated path), so
    * the contract survives a broken 'srcN' name the same hardened way.
    *
    * Scale shape: the per-source rank is a window partitioned by
    * source (range-partitioned sort per source — the skew unit is one
    * source's docs); the global interleave is a TOP-N on the finish
    * key (TakeOrdered — never a full global sort materialization),
    * bounded at `CurriculumTake` rows, then a single-partition
    * row_number over exactly those rows. A full-schedule write-out at
    * 100 TB would swap the TOP-N for a range-partitioned sort on
    * (fkey, source, doc_id) — same keys, streaming write, no driver
    * involvement.
    */
  val q181 = Q("q181_curriculum_interleave",
    """WITH d AS (
      |  SELECT doc_id, source, n_chars,
      |    coalesce(TRY_CAST(substr(source, 4) AS INT), 2147483647)
      |      AS prio
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, source, n_chars, (prio % 3) + 1 AS w FROM d),
      |r AS (
      |  SELECT doc_id, source, w,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY n_chars, doc_id) AS r
      |  FROM w),
      |f AS (
      |  SELECT doc_id, source, CAST(w AS BIGINT) AS w,
      |    CAST(r AS BIGINT) AS r, CAST(r * (6 // w) AS BIGINT) AS fkey
      |  FROM r)
      |SELECT * FROM (
      |  SELECT CAST(row_number() OVER (ORDER BY fkey, source, doc_id)
      |      AS BIGINT) AS pos,
      |    doc_id, source, w, r, fkey
      |  FROM f) WHERE pos <= 200""".stripMargin) { (s, dir) =>
    val d = docs(s, dir).select(col("doc_id"), col("source"),
      col("n_chars"),
      coalesce(col("source").substr(lit(4), length(col("source")))
        .cast("int"), lit(Int.MaxValue)).as("prio"))
      .withColumn("w", (col("prio") % 3 + 1).cast("long"))
    val perSrc = Window.partitionBy("source")
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    val f = d.withColumn("r", row_number().over(perSrc).cast("long"))
      .withColumn("fkey", (col("r") * expr("6 div w")).cast("long"))
      .select("doc_id", "source", "w", "r", "fkey")
    val top = f.orderBy(col("fkey").asc, col("source").asc,
      col("doc_id").asc).limit(CurriculumTake)
    // single-partition window is BOUNDED: it numbers the
    // limit(CurriculumTake) frame above, never the corpus
    // (r20 window audit)
    val sched = Window.orderBy(col("fkey").asc, col("source").asc,
      col("doc_id").asc)
    top.withColumn("pos", row_number().over(sched).cast("long"))
      .select("pos", "doc_id", "source", "w", "r", "fkey")
  }

  private val CurriculumTake = 200

  /** TRAINING-RUN ASSEMBLY — the end-to-end composition the registry
    * builds toward: raw corpus → q66's full curation pipeline
    * (language-consistency + length gates, exact dedup keep-list,
    * benchmark decontamination: [[curatedDocs]], ONE definition shared
    * with q66) → lang-weighted easy-first CURRICULUM (the q181 WFQ
    * device: per-lang rank by ascending length, integer virtual
    * finish keys r·(L/w)) → next-fit SHARD PACKING over the SCHEDULE
    * order (the q182 two-level prefix sum, blocks keyed on the
    * virtual-time axis `fkey div 50` — block boundaries align to
    * schedule time, so blocks are contiguous runs of the global
    * (fkey, lang, doc_id) order and nothing corpus-sized ever
    * single-partitions). Output is the shard manifest a training run
    * reads: early shards carry the easiest documents of every
    * language in weight proportion — visible in the per-shard fkey
    * ranges.
    *
    * The point of gating the COMPOSITION (beyond each stage's own
    * gate): stage boundaries are where grain bugs live — the oracle
    * re-derives the entire chain from `documents` in one SQL
    * statement, so a drifted join key or a filter applied at the
    * wrong stage breaks the hash even when every stage passes alone.
    * Plan cost is the sum of its stages': the curation aggregates,
    * one per-lang rank window, the block-grain offset window, one
    * blk-partitioned window, one shard-grain aggregate.
    */
  val q185 = Q("q185_training_run_pipeline",
    s"""WITH $curationSqlCte,
       |wgt AS (
       |  SELECT doc_id, lang, n_tokens,
       |    CASE lang WHEN 'en' THEN 3 WHEN 'zh' THEN 2 ELSE 1 END AS w
       |  FROM cur),
       |r AS (
       |  SELECT doc_id, lang, n_tokens, w,
       |    row_number() OVER (PARTITION BY lang
       |                       ORDER BY n_tokens, doc_id) AS r
       |  FROM wgt),
       |f AS (
       |  SELECT doc_id, lang, n_tokens,
       |    CAST(r * (6 // w) AS BIGINT) AS fkey
       |  FROM r),
       |c AS (
       |  SELECT doc_id, lang, n_tokens, fkey,
       |    coalesce(sum(n_tokens) OVER (ORDER BY fkey, lang, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS cumex
       |  FROM f)
       |SELECT CAST(cumex // 1024 AS BIGINT) AS shard,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS tok_total,
       |  min(fkey) AS first_fkey, max(fkey) AS last_fkey
       |FROM c GROUP BY 1""".stripMargin) { (s, dir) =>
    val cur = curatedDocs(s, dir)
      .withColumn("w", when(col("lang") === "en", 3L)
        .when(col("lang") === "zh", 2L).otherwise(1L))
    val perLang = Window.partitionBy("lang")
      .orderBy(col("n_tokens").asc, col("doc_id").asc)
    val f = cur
      .withColumn("r", row_number().over(perLang).cast("long"))
      .withColumn("fkey", (col("r") * expr("6 div w")).cast("long"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("fkey"),
        expr("fkey div 50").as("blk"))
    val wBlk = Window.orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = f.groupBy("blk").agg(sum("n_tokens").as("btot"))
      .withColumn("off", coalesce(sum("btot").over(wBlk), lit(0L)))
      .select("blk", "off")
    val wIn = Window.partitionBy("blk")
      .orderBy(col("fkey").asc, col("lang").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    f.join(broadcast(offs), Seq("blk"))
      .withColumn("cumex",
        col("off") + coalesce(sum("n_tokens").over(wIn), lit(0L)))
      .withColumn("shard", expr("cumex div 1024"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("tok_total"),
        min("fkey").as("first_fkey"), max("fkey").as("last_fkey"))
  }

  /** NORMALIZATION-KEY DEDUP — CCNet's cross-variant exact dedup: hash
    * [[TextOps.foldKey]] (lowercase + accent fold + digit→0 + symbol
    * collapse) instead of the raw text, so case/accent/revision-stamp
    * variants of one document land on one key. The corpus has no such
    * variants, so the query PLANTS them (the q50/q172 synthesis
    * convention): every doc contributes its base form suffixed
    * " 1999"; every doc_id % 4 == 0 doc additionally contributes an
    * uppercased, accent-damaged twin suffixed " 2024". Raw md5 keys
    * keep all twins distinct; fold keys collapse each twin onto its
    * base (upper/accent damage inverts under lower+translate on this
    * ASCII corpus; both digit stamps fold to " 0000"). Output per
    * source: row count, raw-distinct, fold-distinct, and the
    * collapsed delta — the measurement a curation run reports when
    * deciding whether normalization-grain dedup is worth a pass.
    *
    * Shape: map-only synthesis + key projection (codegen'd
    * lower/translate/regexp chain), ONE corpus exchange at the
    * (source, raw_fp) grain (fold_fp is functionally dependent — it
    * rides along, keeping the later COUNT(DISTINCT) off the corpus
    * grain), then a source-grain aggregate whose single distinct runs
    * over the already-collapsed fingerprint table. No Expand over the
    * corpus, no second scan — the q166-family fingerprint-grain
    * discipline.
    */
  val q188 = Q("q188_foldkey_dedup",
    """WITH u AS (
      |  SELECT doc_id, source, text || ' 1999' AS t FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, source,
      |    upper(translate(text, 'aeiou', 'áéíóú')) || ' 2024' AS t
      |  FROM documents WHERE doc_id % 4 = 0),
      |k AS (
      |  SELECT source, md5(t) AS raw_fp,
      |    md5(trim(regexp_replace(regexp_replace(
      |      translate(lower(t), 'áéíóú', 'aeiou'),
      |      '[0-9]', '0', 'g'), '[^a-z0-9]+', ' ', 'g'))) AS fold_fp
      |  FROM u),
      |g AS (
      |  SELECT source, raw_fp, fold_fp, count(*) AS cnt
      |  FROM k GROUP BY 1, 2, 3)
      |SELECT source, CAST(sum(cnt) AS BIGINT) AS n_rows,
      |  count(*) AS n_raw, count(DISTINCT fold_fp) AS n_fold,
      |  count(*) - count(DISTINCT fold_fp) AS n_collapsed
      |FROM g GROUP BY source""".stripMargin) { (s, dir) =>
    val d = docs(s, dir)
    val base = d.select(col("doc_id"), col("source"),
      concat(col("text"), lit(" 1999")).as("t"))
    val variant = d.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
        concat(upper(translate(col("text"), "aeiou", "áéíóú")),
          lit(" 2024")).as("t"))
    val keyed = base.unionByName(variant)
      .select(col("source"), md5(col("t")).as("raw_fp"),
        md5(TextOps.foldKey(col("t"))).as("fold_fp"))
    keyed.groupBy("source", "raw_fp", "fold_fp")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("source")
      .agg(sum("cnt").cast("long").as("n_rows"),
        count(lit(1)).as("n_raw"),
        countDistinct("fold_fp").as("n_fold"))
      .withColumn("n_collapsed",
        (col("n_raw") - col("n_fold")).cast("long"))
  }

  /** JSONL CORRUPT-LINE QUARANTINE — the ingest-GATE face of the
    * JSONL tier ([[graft.sources.Jsonl]]). [[Extras.q106]] already
    * proves the clean round trip (FAILFAST — a corrupt line is a JOB
    * ERROR); this query proves the path real dumps need instead:
    * PERMISSIVE quarantine, where corrupt lines are DATA. The corpus
    * is serialized to JSON-Lines (every doc's text first DAMAGED with a
    * quote + newline + backslash prefix, so the writer's escaping
    * actually has work to do), a deterministic slice (doc_id % 97 == 0)
    * is replaced by TRUNCATED lines (an unterminated JSON string — the
    * interleaved-writer failure every real dump contains), the file is
    * read back through the schema-explicit PERMISSIVE scan, and the
    * output is per-source content fingerprints over the parsed rows
    * plus one quarantine-count row. The oracle NEVER touches JSON: it
    * recomputes every fingerprint arithmetically from parquet, so a
    * PASS proves the write→escape→parse→unescape loop restored every
    * byte (any escaping defect shifts lo_fp/hi_fp/n_fp) and the gate
    * quarantined exactly the planted lines.
    *
    * Shape: map-only synthesis (`to_json` is codegen'd) + one text
    * write (once per session — [[graft.SessionScratch.once]], the
    * q167 store convention), then ONE schema-explicit JSONL scan (NO
    * inference pre-pass, no second pass for the quarantine: corrupt
    * rows re-key into the `__corrupt__` group of the same source-grain
    * aggregate) — the only corpus exchange is that aggregate. At
    * 100 TB the write and scan are both line-splittable map passes;
    * the quarantine is a re-keyed group, not a failure path or a
    * second scan. (Spark's corrupt-column restriction — a query may
    * not reference ONLY `_corrupt` — is structurally satisfied:
    * source and text ride in the same grouping.)
    */
  val q189 = Q("q189_jsonl_quarantine",
    """WITH d AS (
      |  SELECT doc_id, source,
      |    'say "hi"' || chr(10) || '\ ' || text AS t
      |  FROM documents WHERE doc_id % 97 <> 0),
      |p AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(length(t)) AS BIGINT) AS n_chars,
      |    count(DISTINCT md5(t)) AS n_fp,
      |    min(md5(t)) AS lo_fp, max(md5(t)) AS hi_fp
      |  FROM d GROUP BY source),
      |c AS (
      |  SELECT '__corrupt__' AS source, count(*) AS n_docs,
      |    CAST(0 AS BIGINT) AS n_chars, CAST(0 AS BIGINT) AS n_fp,
      |    '' AS lo_fp, '' AS hi_fp
      |  FROM documents WHERE doc_id % 97 = 0)
      |SELECT * FROM p UNION ALL SELECT * FROM c""".stripMargin) {
    (s, dir) =>
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
      .add("lang", StringType).add("source", StringType)
    val d = docs(s, dir)
    val path = graft.SessionScratch.dir(s,
      s"jsonl_${graft.SessionScratch.keyOf(dir)}")
    graft.SessionScratch.once(s, s"jsonl_${graft.SessionScratch.keyOf(dir)}") {
      val good = d.filter(col("doc_id") % 97 =!= 0)
        .select(to_json(struct(col("doc_id"),
          concat(lit("say \"hi\"\n\\ "), col("text")).as("text"),
          col("lang"), col("source"))).as("value"))
      val bad = d.filter(col("doc_id") % 97 === 0)
        .select(concat(lit("{\"doc_id\": "),
          col("doc_id").cast("string"),
          lit(", \"text\": \"broken")).as("value"))
      good.unionByName(bad).write.mode("overwrite").text(path)
    }
    val r = graft.sources.Jsonl.read(s, path, schema)
    // ONE scan for both row classes: corrupt rows re-key to the
    // quarantine group instead of forking a second pass over the dump
    // (at 100 TB the union-of-filters shape reads the file twice).
    // Corrupt rows null EVERY data field (no partial recovery —
    // StreamingSpec pins it), so the null-skipping aggregates produce
    // the quarantine row's zeros/empties with no special-casing; this
    // also sidesteps the corrupt-only required-schema restriction
    // (see Jsonl.read) because source/text ride in the same grouping.
    r.groupBy(
        when(col(graft.sources.Jsonl.corruptCol).isNotNull,
          lit("__corrupt__")).otherwise(col("source")).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(length(col("text"))), lit(0L)).cast("long")
          .as("n_chars"),
        countDistinct(md5(col("text"))).as("n_fp"),
        coalesce(min(md5(col("text"))), lit("")).as("lo_fp"),
        coalesce(max(md5(col("text"))), lit("")).as("hi_fp"))
  }

  /** ENCODING-DAMAGE SCAN — the mojibake gate of web-pipeline quality
    * filtering (RefinedWeb/CCNet drop documents carrying U+FFFD
    * replacement characters or stray C0 control bytes, the footprint
    * of double-decoding and binary spill): the detector measures bad
    * chars as a LENGTH DELTA under a codegen'd regexp sweep
    * (`[\x00-\x08\x0B\x0C\x0E-\x1F�]` — tab/LF/CR stay legal),
    * flags any doc with a nonzero count, and aggregates per source.
    * The corpus is clean `[a-z0-9 ]` (spec-pinned), so the query
    * PLANTS damage deterministically: doc_id % 5 == 0 docs get
    * (doc_id % 3 + 1) replacement chars plus one BEL appended. The
    * oracle recomputes the expected counts ARITHMETICALLY from doc_id
    * — it never runs the regex — so a PASS double-checks the detector
    * through the damage model (the q176 convention).
    *
    * Shape: map-only synthesize + detect (one codegen'd projection,
    * no explode), ONE source-grain aggregate — embarrassingly
    * parallel at any corpus; the scan is the whole cost.
    */
  val q190 = Q("q190_encoding_scan",
    """SELECT source, count(*) AS n_docs,
      |  count(*) FILTER (WHERE doc_id % 5 = 0) AS n_flagged,
      |  CAST(coalesce(sum(CASE WHEN doc_id % 5 = 0
      |    THEN doc_id % 3 + 2 END), 0) AS BIGINT) AS n_bad,
      |  CAST(coalesce(max(CASE WHEN doc_id % 5 = 0
      |    THEN doc_id % 3 + 2 END), 0) AS BIGINT) AS max_bad
      |FROM documents GROUP BY source""".stripMargin) { (s, dir) =>
    val damaged = when(col("doc_id") % 5 === 0,
      concat(col("text"),
        repeat(lit("\uFFFD"), (col("doc_id") % 3 + 1).cast("int")),
        lit("\u0007")))
      .otherwise(col("text"))
    val bad = (length(damaged) -
      length(regexp_replace(damaged,
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\uFFFD]", ""))).cast("long")
    docs(s, dir).select(col("source"), bad.as("bad"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("bad") > 0, 1L).otherwise(0L)).cast("long")
          .as("n_flagged"),
        sum(col("bad")).cast("long").as("n_bad"),
        max(col("bad")).cast("long").as("max_bad"))
  }

  /** ORC PREDICATE PUSHDOWN + COLUMN PRUNING — the scan-hygiene face
    * of the ORC tier ([[graft.sources.Orc]]). [[Extras.q111]] already
    * proves the lossless round trip (full-table read); this query
    * proves the properties that make the format worth using at scale:
    * the corpus is written to ORC once (the q167/q189 scratch
    * convention), read back through the footer-schema vectorized scan,
    * filtered (`lang IN ('en','fr') AND n_chars >= 300` — both
    * predicates selective AND non-vacuous on this corpus), and
    * fingerprinted per lang. The oracle recomputes everything from
    * parquet, so a PASS proves value fidelity through the filtered
    * path; the q191 spec pins the pushdown and pruning in the plan.
    *
    * Shape: one ORC scan with BOTH predicates pushed to stripe level
    * and the read schema pruned to exactly (lang, n_chars, text) — the
    * q191 spec pins `PushedFilters` and `ReadSchema` in the plan text,
    * the engine's standing "filters reach the scan" discipline applied
    * to the second format. One source-grain aggregate after a map-only
    * projection; the one-time write and the scan are both
    * stripe-splittable at any corpus size.
    */
  val q191 = Q("q191_orc_pushdown",
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  count(DISTINCT md5(text)) AS n_fp,
      |  min(md5(text)) AS lo_fp, max(md5(text)) AS hi_fp
      |FROM documents
      |WHERE lang IN ('en', 'fr') AND n_chars >= 300
      |GROUP BY lang""".stripMargin) { (s, dir) =>
    val path = graft.SessionScratch.dir(s,
      s"orcwh_${graft.SessionScratch.keyOf(dir)}")
    graft.SessionScratch.once(s, s"orc_${graft.SessionScratch.keyOf(dir)}") {
      graft.sources.Orc.write(docs(s, dir), path)
    }
    graft.sources.Orc.read(s, path)
      .filter(col("lang").isin("en", "fr") && col("n_chars") >= 300)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        countDistinct(md5(col("text"))).as("n_fp"),
        min(md5(col("text"))).as("lo_fp"),
        max(md5(col("text"))).as("hi_fp"))
  }

  /** INGEST-PIPELINE E2E — the intake counterpart of q185's assembly
    * pipeline, composing this round's gates in the order a real
    * intake runs them: JSONL parse with corrupt-line QUARANTINE
    * ([[graft.sources.Jsonl.read]], q189's contract) → ENCODING gate
    * (q190's U+FFFD/control-char detector — the real regex, not the
    * damage arithmetic) → EXACT-DUP first-holder keep on the head
    * fingerprint (q167's fp, q166's min-doc_id rule). The dump plants
    * all three failure classes decorrelated from each other AND from
    * the source assignment (source = doc_id % 20, so the damage slice
    * uses `(doc_id div 20) % 5` — a mod-5 slice of doc_id itself
    * would wipe exactly the mod-5 sources and degenerate the stage
    * interplay): truncated lines at doc_id % 97, one appended U+FFFD
    * on the damage slice, and the corpus's natural head-fp duplicates
    * for the dedup stage (24 in 500 — nonzero at both gate sfs).
    * Output per source: arrivals, per-stage drops, admitted count +
    * admitted-fingerprint envelope, with quarantined lines re-keyed
    * into one `__corrupt__` row by the q189 single-scan device.
    *
    * The oracle re-derives the WHOLE chain from parquet in one
    * statement — encoding drops by ARITHMETIC (never running the
    * regex: the q176/q190 double-derivation), dedup by the same
    * min() — so a stage-boundary grain bug breaks the hash even when
    * each stage passes alone (the q185 argument, pointed at intake).
    * Dedup runs AFTER the encoding gate (pipeline order), which is
    * also what makes engine and oracle fingerprints comparable: a
    * surviving doc's parsed text is bit-identical to parquet.
    *
    * Shape: one JSONL scan; ONE fp-grain aggregate (first-holder) +
    * one fp-keyed join back; one source-grain aggregate. No corpus
    * pass happens twice; at 100 TB the fp-grain exchange is the
    * dedup's irreducible cost (the q166 discipline).
    */
  val q193 = Q("q193_ingest_pipeline",
    """WITH arr AS (
      |  SELECT doc_id, source,
      |    md5(array_to_string((string_split(text, ' '))[1:10], ' '))
      |      AS fp
      |  FROM documents WHERE doc_id % 97 <> 0),
      |surv AS (SELECT * FROM arr WHERE (doc_id // 20) % 5 <> 0),
      |first AS (SELECT fp, min(doc_id) AS keep FROM surv GROUP BY fp),
      |j AS (
      |  SELECT a.source, a.doc_id, a.fp,
      |    (a.doc_id // 20) % 5 = 0 AS encdrop, f.keep
      |  FROM arr a LEFT JOIN first f ON f.fp = a.fp)
      |SELECT source, count(*) AS n_arrived,
      |  count(*) FILTER (WHERE encdrop) AS n_enc_dropped,
      |  count(*) FILTER (WHERE NOT encdrop AND doc_id <> keep)
      |    AS n_dup_dropped,
      |  count(*) FILTER (WHERE NOT encdrop AND doc_id = keep)
      |    AS n_admitted,
      |  coalesce(min(fp) FILTER (WHERE NOT encdrop AND doc_id = keep),
      |    '') AS lo_fp,
      |  coalesce(max(fp) FILTER (WHERE NOT encdrop AND doc_id = keep),
      |    '') AS hi_fp
      |FROM j GROUP BY source
      |UNION ALL
      |SELECT '__corrupt__', count(*), 0, 0, 0, '', ''
      |FROM documents WHERE doc_id % 97 = 0""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
      .add("lang", StringType).add("source", StringType)
    val d = docs(s, dir)
    val path = graft.SessionScratch.dir(s,
      s"jsonl2_${graft.SessionScratch.keyOf(dir)}")
    graft.SessionScratch.once(s,
      s"jsonl2_${graft.SessionScratch.keyOf(dir)}") {
      val damaged = when(expr("doc_id div 20") % 5 === 0,
        concat(col("text"), lit("\uFFFD"))).otherwise(col("text"))
      val good = d.filter(col("doc_id") % 97 =!= 0)
        .select(to_json(struct(col("doc_id"), damaged.as("text"),
          col("lang"), col("source"))).as("value"))
      val bad = d.filter(col("doc_id") % 97 === 0)
        .select(concat(lit("{\"doc_id\": "),
          col("doc_id").cast("string"),
          lit(", \"text\": \"broken")).as("value"))
      good.unionByName(bad).write.mode("overwrite").text(path)
    }
    val r = graft.sources.Jsonl.read(s, path, schema)
    val corrupt = col(graft.sources.Jsonl.corruptCol).isNotNull
    // the REAL q190 detector decides the encoding drop
    val nBad = length(col("text")) - length(regexp_replace(col("text"),
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\uFFFD]", ""))
    val flagged = r.select(col("doc_id"), col("source"),
      corrupt.as("is_corrupt"),
      (!corrupt && nBad > 0).as("encdrop"),
      md5(array_join(slice(split(col("text"), " "), 1, 10), " "))
        .as("fp"))
    val first = flagged.filter(!col("is_corrupt") && !col("encdrop"))
      .groupBy(col("fp").as("kfp"))
      .agg(min(col("doc_id")).as("keep"))
    val admitted = !col("is_corrupt") && !col("encdrop") &&
      col("doc_id") === col("keep")
    flagged.join(first, col("fp") === col("kfp"), "left")
      .groupBy(when(col("is_corrupt"), lit("__corrupt__"))
        .otherwise(col("source")).as("source"))
      .agg(count(lit(1)).as("n_arrived"),
        sum(when(col("encdrop"), 1L).otherwise(0L)).cast("long")
          .as("n_enc_dropped"),
        sum(when(!col("is_corrupt") && !col("encdrop") &&
            col("doc_id") =!= col("keep"), 1L).otherwise(0L))
          .cast("long").as("n_dup_dropped"),
        sum(when(admitted, 1L).otherwise(0L)).cast("long")
          .as("n_admitted"),
        coalesce(min(when(admitted, col("fp"))), lit("")).as("lo_fp"),
        coalesce(max(when(admitted, col("fp"))), lit("")).as("hi_fp"))
  }

  /** CSV MALFORMED-ROW QUARANTINE — q189's ingest gate for the OTHER
    * line format ([[graft.sources.Csv.readQuarantine]]), closing the
    * gate matrix (JSONL q189, CSV here; ORC has no row-level corrupt
    * class — q191's scaladoc states why). Good rows are written by
    * Spark's CSV WRITER with text first DAMAGED by a comma + quote
    * prefix — the two characters that force real quoting and `""`
    * escape doubling — into one directory; a second directory plants
    * TYPE-MALFORMED rows (the BIGINT column carries `xx`) for the
    * doc_id % 97 slice; the quarantine read spans both (a real intake
    * is a directory set). Per-source fingerprints over parsed rows +
    * one `__corrupt__` row, the q189 single-scan re-key. The oracle
    * recomputes every fingerprint arithmetically from parquet — a
    * PASS proves the CSV quote/escape loop byte-exact and the
    * quarantine exact.
    *
    * Defensive determinism: fingerprints/lengths are computed over
    * `when(corrupt, null).otherwise(text)` so the output NEVER
    * depends on whether the CSV parser recovers partial fields on a
    * malformed row (a version-dependent behavior the JSON twin pinned
    * one way; here it is made irrelevant by construction).
    *
    * Shape: one-time writes, ONE multi-path scan, one source-grain
    * aggregate — the q189 cost model on the second format.
    */
  val q194 = Q("q194_csv_quarantine",
    """WITH d AS (
      |  SELECT doc_id, source, 'a,"b" ' || text AS t
      |  FROM documents WHERE doc_id % 97 <> 0),
      |p AS (
      |  SELECT d.source, count(*) AS n_docs,
      |    CAST(sum(length(t)) AS BIGINT) AS n_chars,
      |    CAST(sum(o.n_chars) AS BIGINT) AS sum_nchars,
      |    count(DISTINCT md5(t)) AS n_fp,
      |    min(md5(t)) AS lo_fp, max(md5(t)) AS hi_fp
      |  FROM d JOIN documents o ON o.doc_id = d.doc_id
      |  GROUP BY d.source),
      |c AS (
      |  SELECT '__corrupt__' AS source, count(*) AS n_docs,
      |    CAST(0 AS BIGINT) AS n_chars, CAST(0 AS BIGINT) AS sum_nchars,
      |    CAST(0 AS BIGINT) AS n_fp,
      |    '' AS lo_fp, '' AS hi_fp
      |  FROM documents WHERE doc_id % 97 = 0)
      |SELECT * FROM p UNION ALL SELECT * FROM c""".stripMargin) {
    (s, dir) =>
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
      .add("lang", StringType).add("source", StringType)
      .add("n_chars", LongType)
    val d = docs(s, dir)
    val goodDir = graft.SessionScratch.dir(s,
      s"csvq_good_${graft.SessionScratch.keyOf(dir)}")
    val badDir = graft.SessionScratch.dir(s,
      s"csvq_bad_${graft.SessionScratch.keyOf(dir)}")
    graft.SessionScratch.once(s,
      s"csvq_${graft.SessionScratch.keyOf(dir)}") {
      d.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"),
          concat(lit("a,\"b\" "), col("text")).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").option("header", "false").csv(goodDir)
      d.filter(col("doc_id") % 97 === 0)
        .select(concat(col("doc_id").cast("string"), lit(",damaged,"),
          col("lang"), lit(","), col("source"), lit(",xx"))
          .as("value"))
        .write.mode("overwrite").text(badDir)
    }
    val r = graft.sources.Csv.readQuarantine(s, Seq(goodDir, badDir),
      schema)
    val corrupt = col(graft.sources.Jsonl.corruptCol).isNotNull
    val t = when(corrupt, lit(null: String)).otherwise(col("text"))
    // sum_nchars references the MALFORMED column: the planted damage
    // lives in n_chars ("xx" in a BIGINT), and a projection that
    // prunes it away never parses it — the row would sail through
    // un-flagged (measured; the q189 pruned-schema lesson). Keeping
    // the broken field in the output both defeats the pruning and
    // gates the numeric round-trip.
    val nc = when(corrupt, lit(null: String).cast("long"))
      .otherwise(col("n_chars"))
    r.groupBy(when(corrupt, lit("__corrupt__"))
        .otherwise(col("source")).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(length(t)), lit(0L)).cast("long").as("n_chars"),
        coalesce(sum(nc), lit(0L)).cast("long").as("sum_nchars"),
        countDistinct(md5(t)).as("n_fp"),
        coalesce(min(md5(t)), lit("")).as("lo_fp"),
        coalesce(max(md5(t)), lit("")).as("hi_fp"))
  }

  /** MULTI-FORMAT FEDERATION — one query over a corpus striped across
    * THREE formats (doc_id % 3: parquet / JSONL / ORC), the lakehouse
    * reality the source tier exists for: history lands in parquet,
    * vendor drops in JSONL, a Hive-era warehouse in ORC, and the
    * operator layer must not care. Each non-parquet stripe is written
    * once (scratch convention), read back through its own source
    * object ([[graft.sources.Jsonl.readStrict]] — own data, FAILFAST;
    * [[graft.sources.Orc.read]]), and the three frames union into ONE
    * aggregate. The oracle derives every stripe from parquet alone —
    * a PASS proves all three read paths agree bit-for-bit on count,
    * numeric, and string content, i.e. the format seam is invisible
    * exactly where [[graft.sources.Orc]]'s scaladoc claims it is.
    *
    * Shape: three parallel scans (each line/stripe-splittable, no
    * scan reads another stripe's bytes) + one source-grain aggregate
    * over the union — Spark plans the union's children independently,
    * so the federation costs exactly the sum of its scans at any
    * corpus size.
    */
  val q195 = Q("q195_format_federation",
    """SELECT CASE doc_id % 3 WHEN 0 THEN 'parquet'
      |  WHEN 1 THEN 'jsonl' ELSE 'orc' END AS fmt,
      |  count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  count(DISTINCT md5(text)) AS n_fp,
      |  min(md5(text)) AS lo_fp, max(md5(text)) AS hi_fp
      |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
      .add("lang", StringType).add("source", StringType)
      .add("n_chars", LongType)
    val d = docs(s, dir)
    val jdir = graft.SessionScratch.dir(s,
      s"fed_jsonl_${graft.SessionScratch.keyOf(dir)}")
    val odir = graft.SessionScratch.dir(s,
      s"fed_orc_${graft.SessionScratch.keyOf(dir)}")
    graft.SessionScratch.once(s,
      s"fed_${graft.SessionScratch.keyOf(dir)}") {
      graft.sources.Jsonl.write(
        d.filter(col("doc_id") % 3 === 1).select(cols.map(col): _*), jdir)
      graft.sources.Orc.write(
        d.filter(col("doc_id") % 3 === 2).select(cols.map(col): _*), odir)
    }
    val pq = d.filter(col("doc_id") % 3 === 0).select(cols.map(col): _*)
      .withColumn("fmt", lit("parquet"))
    val js = graft.sources.Jsonl.readStrict(s, jdir, schema)
      .withColumn("fmt", lit("jsonl"))
    val oc = graft.sources.Orc.read(s, odir)
      .withColumn("fmt", lit("orc"))
    pq.unionByName(js).unionByName(oc)
      .groupBy("fmt")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        countDistinct(md5(col("text"))).as("n_fp"),
        min(md5(col("text"))).as("lo_fp"),
        max(md5(col("text"))).as("hi_fp"))
  }

  /** SCHEMA EVOLUTION under a merged parquet read — the lakehouse
    * drift case the warehouse tier must survive: an old generation of
    * files lacks a column a new generation added (here `quality`,
    * derived as `n_chars % 7` so the oracle can re-derive it
    * arithmetically), both live under one table root as
    * `gen=a`/`gen=b` directories, and ONE read must serve both — old
    * rows with the new column NULL, new rows with their values, and
    * the generation recoverable as a partition column. Spark's
    * `mergeSchema` read does exactly this (the default single-footer
    * read would pick one generation's schema and silently hide the
    * column on half the files — the spec pins that the merged read
    * carries both `quality` and the discovered `gen`).
    *
    * Output per lang: doc count, rows carrying the new column, its
    * sum, and the n_chars sum — count/sum over a nullable evolved
    * column exercises exactly the null-fill semantics. Oracle derives
    * everything from parquet arithmetic (quality exists ⇔ odd
    * doc_id). Shape: one-time two-generation write, one merged scan
    * (footer merge is metadata work, scan stays stripe-splittable),
    * one lang-grain aggregate.
    */
  val q196 = Q("q196_schema_evolution",
    """SELECT lang, count(*) AS n_docs,
      |  count(*) FILTER (WHERE doc_id % 2 = 1) AS n_with_quality,
      |  CAST(coalesce(sum(CASE WHEN doc_id % 2 = 1
      |    THEN n_chars % 7 END), 0) AS BIGINT) AS sum_quality,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY lang""".stripMargin) { (s, dir) =>
    val d = docs(s, dir)
    val path = graft.SessionScratch.dir(s,
      s"evo_${graft.SessionScratch.keyOf(dir)}")
    graft.SessionScratch.once(s,
      s"evo_${graft.SessionScratch.keyOf(dir)}") {
      d.filter(col("doc_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$path/gen=a")
      d.filter(col("doc_id") % 2 === 1)
        .withColumn("quality", (col("n_chars") % 7).cast("long"))
        .write.mode("overwrite").parquet(s"$path/gen=b")
    }
    s.read.option("mergeSchema", "true").parquet(path)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        count(col("quality")).as("n_with_quality"),
        coalesce(sum(col("quality")), lit(0L)).cast("long")
          .as("sum_quality"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
  }

  /** PER-SOURCE DATA CARD — the publishable corpus report a curation
    * run ships with its output (the "Datasheets for Datasets" /
    * data-card practice): one row per source carrying volume (docs,
    * tokens, chars), language spread, length envelope, and the
    * duplication exposure measured against the GLOBAL fingerprint
    * space — a doc counts as duplicated if its q167 head fingerprint
    * appears anywhere in the corpus. Global, not per-source, because
    * cross-source pairs are invisible to per-source distinct counts
    * (at sf0.01 EVERY duplicate pair is cross-source — a per-source
    * card would read 0% dup and hide exactly the contamination the
    * card exists to surface; the spec pins global strictly above
    * per-source). `dup_pm` is integer per-mille (BIGINT floor
    * division in both engines — no float ratio to disagree on).
    *
    * Shape: one scan → fingerprint-grain count (ONE corpus exchange)
    * → fp-keyed join back → source-grain aggregate. The fp-grain
    * exchange is the q166-family dedup cost, already irreducible for
    * any dup metric; everything else is map-side.
    */
  val q200 = Q("q200_source_datacard",
    """WITH f AS (SELECT source, lang, n_chars,
      |    md5(array_to_string((string_split(text,' '))[1:10],' '))
      |      AS fp,
      |    len(string_split(text,' ')) AS ntok FROM documents),
      |g AS (SELECT fp, count(*) AS cnt FROM f GROUP BY fp)
      |SELECT f.source, count(*) AS n_docs,
      |  CAST(sum(f.ntok) AS BIGINT) AS n_tokens,
      |  CAST(sum(f.n_chars) AS BIGINT) AS sum_chars,
      |  count(DISTINCT f.lang) AS n_langs,
      |  count(*) FILTER (WHERE g.cnt > 1) AS n_dup_docs,
      |  (1000 * count(*) FILTER (WHERE g.cnt > 1)) // count(*)
      |    AS dup_pm,
      |  CAST(min(f.n_chars) AS BIGINT) AS len_min,
      |  CAST(max(f.n_chars) AS BIGINT) AS len_max
      |FROM f JOIN g USING (fp) GROUP BY f.source""".stripMargin) {
    (s, dir) =>
    val f = docs(s, dir).select(col("source"), col("lang"),
      col("n_chars"),
      md5(array_join(slice(split(col("text"), " "), 1, 10), " "))
        .as("fp"),
      size(split(col("text"), " ")).cast("long").as("ntok"))
    val g = f.groupBy(col("fp").as("gfp"))
      .agg(count(lit(1)).as("cnt"))
    f.join(g, col("fp") === col("gfp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ntok")).cast("long").as("n_tokens"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).cast("long")
          .as("n_dup_docs"),
        min(col("n_chars")).cast("long").as("len_min"),
        max(col("n_chars")).cast("long").as("len_max"))
      .withColumn("dup_pm",
        expr("(1000 * n_dup_docs) div n_docs"))
      .select("source", "n_docs", "n_tokens", "sum_chars", "n_langs",
        "n_dup_docs", "dup_pm", "len_min", "len_max")
  }

  /** LENGTH-BUCKETED BATCH PACKING — the padding-waste minimizer of
    * length-grouped training loops (HF `group_by_length` /
    * fairseq-style bucketing): docs assign to power-of-two length
    * buckets, each bucket packs fixed-32-slot batches padded to the
    * BUCKET length, and the output prices the scheme per bucket —
    * batch count, token cost (batches × 32 × bucket), useful tokens,
    * and integer per-mille waste. All arithmetic is BIGINT (ceil
    * division as (n+31) div 32, per-mille as 1000·waste div cost), so
    * both engines agree exactly. The round-10 spec computes the
    * UNBUCKETED baseline (doc_id-order batches padded to each batch's
    * max) from scratch and asserts bucketing strictly cuts total
    * padding — the property the scheme exists for — rather than
    * baking a second grain into the gated output.
    *
    * Shape: one token-count projection (map-only) + ONE bucket-grain
    * aggregate (the CASE chain is codegen'd; buckets are a constant
    * set) — embarrassingly parallel; no per-doc window, no sort:
    * slot assignment needs only COUNTS per bucket, never an ordering,
    * which is what makes this form scale where a row_number-based
    * packer would pay a bucket-partitioned window.
    */
  val q202 = Q("q202_length_bucketing",
    """WITH t AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS ntok
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, ntok,
      |    CASE WHEN ntok <= 16 THEN 16 WHEN ntok <= 32 THEN 32
      |         WHEN ntok <= 64 THEN 64 WHEN ntok <= 128 THEN 128
      |         WHEN ntok <= 256 THEN 256 ELSE 512 END AS bucket
      |  FROM t)
      |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
      |  (count(*) + 31) // 32 AS n_batches,
      |  ((count(*) + 31) // 32) * 32 * bucket AS cost_tokens,
      |  CAST(sum(ntok) AS BIGINT) AS useful_tokens,
      |  (1000 * (((count(*) + 31) // 32) * 32 * bucket
      |    - CAST(sum(ntok) AS BIGINT)))
      |    // (((count(*) + 31) // 32) * 32 * bucket) AS waste_pm
      |FROM b GROUP BY bucket""".stripMargin) { (s, dir) =>
    val t = docs(s, dir).select(
      size(split(col("text"), " ")).cast("long").as("ntok"))
    val bucket = when(col("ntok") <= 16, 16L)
      .when(col("ntok") <= 32, 32L).when(col("ntok") <= 64, 64L)
      .when(col("ntok") <= 128, 128L).when(col("ntok") <= 256, 256L)
      .otherwise(512L)
    t.select(col("ntok"), bucket.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ntok")).cast("long").as("useful_tokens"))
      .withColumn("n_batches", expr("(n_docs + 31) div 32"))
      .withColumn("cost_tokens", col("n_batches") * 32 * col("bucket"))
      .withColumn("waste_pm", expr(
        "(1000 * (cost_tokens - useful_tokens)) div cost_tokens"))
      .select("bucket", "n_docs", "n_batches", "cost_tokens",
        "useful_tokens", "waste_pm")
  }

  val all: Seq[Q] =
    Seq(q28, q29, q30, q31, q32, q33, q34, q35, q36, q47, q49, q50, q51,
      q52, q53, q54, q57, q62, q63, q64, q66, q67, q69, q72, q73, q79,
      q81, q86, q87, q88, q89, q91, q120, q121, q127, q131, q137, q139,
      q141, q144, q148, q149, q150, q151, q166, q167, q168, q171, q172,
      q175, q181, q185, q188, q189, q190, q191, q193, q194, q195, q196,
      q200, q202)
}
