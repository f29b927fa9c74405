package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash-banded near-duplicate candidate generation — the text-side
  * sibling of `graft.sim.Similarity.nearDupPairs` (embeddings), after
  * the Manku-et-al construction: documents whose signatures agree on
  * at least one band key are candidates; the full-signature Hamming
  * distance then confirms.
  */
object NearDup {

  /** Candidate pairs from a signature table `sig`(doc_id, sh).
    *
    * The signature is treated as `bands` blocks of `blockBits` bits;
    * band b keys on the LOW `bandBits` bits of block b (bit sampling —
    * size `bandBits` with the planesFor formula so the expected bucket
    * stays ~constant). Buckets are capped at 2..`maxBucket` BEFORE the
    * pair join (the q30/q39 skew guard: a hot bucket can never produce
    * more than C(maxBucket, 2) pairs, so worst-case output is linear
    * in the corpus); the bucket-size table is ≤ bands·2^bandBits rows
    * and broadcasts, costing no extra shuffle of the signatures.
    * Surviving pairs are filtered to Hamming ≤ `maxHamming` via
    * xor + bit_count on the FULL signature, deduplicated across bands.
    *
    * Scale ceiling is the signature width: bands·blockBits ≤ 60 here
    * (BIGINT-safe); beyond ~2^blockBits·targetBucket documents, widen
    * the fingerprint (md5 has 128 bits — store as binary), not the cap.
    */
  def simhashCandidates(sig: DataFrame, bands: Int, blockBits: Int,
      bandBits: Int, maxBucket: Int, maxHamming: Int): DataFrame = {
    require(bandBits >= 1 && bandBits <= blockBits,
      s"bandBits must be in 1..$blockBits: $bandBits")
    val mask = (1L << bandBits) - 1
    val bnd = sig.select(col("doc_id"), col("sh"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("key", expr(s"shiftright(sh, $blockBits * band) & $mask"))
    val sized = bnd.groupBy("band", "key").agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, maxBucket))
      .select("band", "key")
    val inCap = bnd.join(broadcast(sized), Seq("band", "key"))
    val right = inCap.select(col("band"), col("key"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    inCap.select(col("band"), col("key"),
        col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .join(right, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
