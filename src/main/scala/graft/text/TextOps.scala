package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-pipeline primitives for large-scale training-data curation:
  * normalization, shingling, MinHash, SimHash, token/quality stats,
  * fingerprints, language ID. All pure Catalyst expressions (codegen'd,
  * UDF-free), so they whole-stage-compile and scale linearly; the only
  * shuffles are the explicit groupBys/joins of the callers.
  *
  * Cross-engine determinism: every hash is md5-hex (identical bytes in
  * any engine), min/compare on the hex string — so the DuckDB oracles
  * reproduce results bit-for-bit.
  */
object TextOps {

  /** Lowercase, strip everything but [a-z0-9 ] — canonical form for
    * near-dup detection.
    */
  def normalize(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9 ]", "")

  /** Whitespace tokens (single-space corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** CCNet-style NORMALIZATION KEY — the canonical form hashed for
    * cross-variant exact dedup in web-scale pipelines (CCNet §3.1's
    * "lowercase + accent fold + digit→0" recipe): lowercase, fold the
    * common accented vowels to their base letters, map every digit to
    * '0' (so revision stamps like "2024" vs "1999" stop splitting
    * otherwise-identical documents), collapse every run of anything
    * else to a single space, trim. Strictly coarser than
    * [[normalize]] (which drops accented letters instead of folding
    * them and keeps digits distinct). A pure codegen'd
    * lower/translate/regexp_replace chain — map-only at any scale,
    * RE2-portable (no backreferences), reproduced bit-for-bit by the
    * DuckDB oracle.
    *
    * Order is correctness-critical: lower() first (so 'Á' reaches the
    * translate as 'á'), accent fold BEFORE the [^a-z0-9] sweep (else
    * the accented letter is destroyed rather than folded), digit fold
    * before the sweep only by convention (digits survive it either
    * way).
    */
  def foldKey(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        translate(lower(text), "áéíóú", "aeiou"),
        "[0-9]", "0"),
      "[^a-z0-9]+", " "))

  /** [[foldKey]]'s DuckDB formulation (RE2 needs explicit 'g'). */
  val foldKeySql: String =
    """trim(regexp_replace(regexp_replace(
      |      translate(lower(%s), 'áéíóú', 'aeiou'),
      |      '[0-9]', '0', 'g'), '[^a-z0-9]+', ' ', 'g'))""".stripMargin

  /** HTML/markup → text extraction — the step BEFORE boilerplate
    * n-gram removal in CCNet/RefinedWeb-style web pipelines: drop
    * comments and content-bearing metadata blocks (script/style/
    * title) WITH their contents, turn every remaining tag into a
    * space, decode the common entities, collapse whitespace. A
    * regexp_replace/replace chain — pure codegen'd expressions, no
    * UDF, map-only at any scale.
    *
    * Correctness-critical ordering, spec-pinned:
    *  - comments drop FIRST, so markup inside a comment
    *    (`<!-- <p> -->`) never leaks a stray tag or text;
    *  - script/style/title drop with CONTENT before generic tag
    *    removal (their bodies are code/metadata, not text — and may
    *    contain entities that must not decode into the output);
    *  - every removed region — comment, block, tag — becomes a SPACE,
    *    never the empty string: `word1<!-- x -->word2` must extract
    *    as two words, not a glued `word1word2` (the final whitespace
    *    collapse normalizes any run the spaces create);
    *  - `&amp;` decodes LAST: HTML's double-escape `&amp;lt;` must
    *    yield the literal text `&lt;`, not `<` — decoding `&amp;`
    *    first would double-decode it (the classic extractor bug);
    *  - no backreferences in any pattern (`</\1>`-style), keeping
    *    the chain portable to RE2-based engines (the DuckDB oracle).
    */
  def htmlToText(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noBlocks = Seq("script", "style", "title").foldLeft(noComments) {
      (c, t) => regexp_replace(c, s"(?is)<$t[^>]*>.*?</$t>", " ")
    }
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Character k-gram shingle at position column `i` (1-based). */
  def shingleAt(text: Column, i: Column, k: Int): Column =
    text.substr(i, lit(k))

  /** 1-based start positions for k-shingles with the given stride:
    * 1, 1+stride, … ≤ max(len-k+1, 1). Explode this and apply
    * [[shingleAt]].
    */
  def shinglePositions(text: Column, k: Int, stride: Int): Column =
    sequence(lit(1), greatest(length(text) - (k - 1), lit(1)), lit(stride))

  /** MinHash component for one seed: min over the group of
    * md5("<seed>:" ++ shingle). Use as an aggregate expression after
    * grouping by document. Banding = concat of components.
    */
  def minhash(shingle: Column, seed: Int): Column =
    min(md5(concat(lit(s"$seed:"), shingle)))

  /** Per-row k-gram shingle SET (distinct) as an array — the
    * no-shuffle formulation: a pure projection computes each document's
    * gram set in place, instead of explode → distinct → groupBy
    * (which shuffles |doc|×|grams| rows). At 100 TB this is the
    * difference between a map-only pass and a multi-TB shuffle.
    */
  def shingleSet(text: Column, k: Int, stride: Int): Column =
    array_distinct(transform(shinglePositions(text, k, stride),
      i => text.substr(i, lit(k))))

  /** Per-row MinHash component over the document's shingles — same
    * value as [[minhash]] after grouping, computed as a scalar
    * expression (array_min over md5s), no explode/aggregation.
    */
  def minhashExpr(text: Column, k: Int, stride: Int, seed: Int): Column =
    array_min(transform(shinglePositions(text, k, stride),
      i => md5(concat(lit(s"$seed:"), text.substr(i, lit(k))))))

  /** Count of tokens matching a marker set (language ID / stopword
    * ratio) — array filter, no explode needed.
    */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), w => w.isin(markers.map(lit): _*)))

  /** q34's quality scorer over any frame with (doc_id, text) — length,
    * punctuation and stopword ratios plus the good/ok/poor label. A
    * pure map-only Column pipeline, which is the point of having it
    * HERE: the exact same function scores a batch corpus (q34) and a
    * readStream micro-batch (StreamingSpec) — no reimplementation, no
    * semantic drift between the offline gate and the live filter.
    */
  def qualityProfile(df: DataFrame): DataFrame = {
    val nChars = length(col("text")).cast("long")
    val nTokens = size(tokens(col("text"))).cast("long")
    val hits = markerHits(col("text"),
      Seq("the", "a", "of", "and", "to", "in")).cast("long")
    val nPunct = (length(col("text")) -
      length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", "")))
      .cast("long")
    df.select(col("doc_id"), nChars.as("n_chars_m"),
      nTokens.as("n_tokens"), hits.as("hits"), nPunct.as("n_punct"))
      .select(col("doc_id"), col("n_chars_m"), col("n_tokens"),
        round((col("n_chars_m") - col("n_tokens") + 1).cast("double")
          / col("n_tokens"), 4).as("avg_tok_len"),
        round(col("n_punct").cast("double") / col("n_chars_m"), 6)
          .as("punct_ratio"),
        round(col("hits").cast("double") / col("n_tokens"), 6)
          .as("stop_ratio"),
        when(col("n_tokens") >= 20 &&
            col("hits").cast("double") / col("n_tokens") > 0.05, "good")
          .when(col("n_tokens") >= 5, "ok")
          .otherwise("poor").as("quality"))
  }

  /** Hex-digit value (0-15) of character `pos` (1-based) of an md5 hex
    * string. (Oracle-side equivalent: strpos('0123456789abcdef', ch)-1.)
    */
  def hexDigit(h: Column, pos: Column): Column =
    conv(h.substr(pos, lit(1)), 16, 10).cast("int")

  /** `nBits`-bit SimHash over whitespace tokens (duplicate-weighted,
    * Charikar): per-row aggregate/zip_with fold — md5 each token, fold
    * the per-bit ±1 weights into an nBits-slot vector, then fold the
    * positive-weight bits into the signature. A pure projection: zero
    * Exchange at any scale (the explode-per-bit formulation shuffled
    * twice and blew rows up nBits×). Bit b comes from md5 hex digit
    * b/4 (so nBits ≤ 60 keeps the signature a non-negative BIGINT:
    * 2^b is exact in double up to b=59 on both engines).
    */
  def simhash(text: Column, nBits: Int): Column = {
    require(nBits >= 1 && nBits <= 60, s"nBits out of BIGINT-safe range: $nBits")
    val nDigits = (nBits + 3) / 4
    // Parse each token's hex digits ONCE (md5 once per token, one
    // conv/substr per digit) — the per-(token, bit) work in the weight
    // fold is then pure arithmetic over the digit array. The naive
    // hexDigit-per-(token, bit) form string-parses nBits times per
    // token and made the 60-bit signature 4× slower.
    val tokenDigits = transform(transform(tokens(text), w => md5(w)),
      h => transform(sequence(lit(1), lit(nDigits)), i => hexDigit(h, i)))
    def bit(digs: Column, b: Column): Column =
      floor(element_at(digs, (b / 4).cast("int") + 1)
        / pow(lit(2), b % 4)).cast("int") % 2
    val weights = aggregate(
      tokenDigits,
      array_repeat(lit(0), nBits),
      (acc, digs) => zip_with(acc, sequence(lit(0), lit(nBits - 1)),
        (a, b) => a + bit(digs, b) * 2 - 1))
    aggregate(
      zip_with(weights, sequence(lit(0), lit(nBits - 1)),
        (wgt, b) => when(wgt > 0, pow(lit(2), b).cast("long"))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** GPT-2-style pre-tokenizer chunks (the "BPE-ish" token count): an
    * apostrophe-suffix, space-prefixed letter run, space-prefixed digit
    * run, space-prefixed punctuation run, or whitespace run. No
    * lookarounds or backreferences, so the pattern behaves identically
    * under Java regex (Spark) and RE2 (DuckDB). `size(bpeChunks(c))` is
    * the BPE-ish token count; on the letters-and-spaces test corpus it
    * degenerates to the q35 word count, so it's exercised by spec on
    * mixed text rather than by a corpus oracle.
    */
  def bpeChunks(text: Column): Column =
    regexp_extract_all(text,
      lit("'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+"),
      lit(0))
}
