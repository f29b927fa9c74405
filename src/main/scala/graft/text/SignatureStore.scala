package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Warehouse

/** Persisted MinHash signature/band artifacts — the production form of
  * the in-session [[graft.Materialized]] stand-in (TextQueries
  * scaladocs promise exactly this table): signatures are computed ONCE
  * per corpus snapshot and written through the warehouse, then every
  * consumer (LSH candidates, dedup-keep, decontamination) reads the
  * stored table instead of re-hashing the text.
  *
  * The band table is written with bucketed CTAS
  * ([[Warehouse.saveBucketed]], SURVEY S8) on its join key
  * `(band, key)`, so the whole q30-shaped candidate generation —
  * bucket-size aggregation, cap join, self pair-join — runs with ZERO
  * shuffle exchanges (the one-time bucketing shuffle was paid at write
  * time; only the final pair `distinct` repartitions, on the
  * candidate set, which the 2..maxBucket cap keeps linear in the
  * corpus). At 100 TB this is the difference between re-shuffling the
  * full band table on every dedup run and never shuffling it again.
  */
object SignatureStore {

  /** Per-doc signature table (doc_id, mh array) bucketed by doc_id —
    * doc-grain enrichment joins (dedup-keep, doc metadata) co-locate.
    */
  def writeSignatures(wh: Warehouse, docs: DataFrame, table: String,
      nBuckets: Int): Unit =
    wh.saveBucketed(
      docs.select(col("doc_id"),
        graft.functions.TextHashF.minhashSig(col("text"), 8, 4, 6)
          .as("mh")),
      table, nBuckets, Seq("doc_id"))

  /** LSH band-key table (doc_id, band, key) bucketed by (band, key) —
    * the join/aggregation key of every candidate-generation consumer.
    * Same 2-band × 3-component layout as TextQueries.bands.
    */
  def writeBands(wh: Warehouse, docs: DataFrame, table: String,
      nBuckets: Int): Unit =
    wh.saveBucketed(bandsOf(docs), table, nBuckets, Seq("band", "key"))

  /** Incremental maintenance: hash ONLY the arriving docs and append
    * their band rows under the store's existing bucket spec
    * ([[Warehouse.appendBucketed]]). The signature cost tracks the
    * delta, the stored corpus is never re-hashed or re-shuffled, and
    * every consumer ([[candidatesFromStore]], dedup-keep, decontam)
    * sees old + new rows through the same exchange-free bucketed
    * reads. q137 gates the contract: incremental build ≡ batch
    * rebuild, row for row.
    */
  def appendBands(wh: Warehouse, docs: DataFrame, table: String,
      nBuckets: Int): Unit =
    wh.appendBucketed(bandsOf(docs), table, nBuckets, Seq("band", "key"))

  private def bandsOf(docs: DataFrame): DataFrame = {
    val sig = docs.select(col("doc_id"),
      graft.functions.TextHashF.minhashSig(col("text"), 8, 4, 6)
        .as("mh"))
    sig.select(col("doc_id"), lit(0L).as("band"),
        concat(element_at(col("mh"), 1), element_at(col("mh"), 2),
          element_at(col("mh"), 3)).as("key"))
      .unionByName(sig.select(col("doc_id"), lit(1L).as("band"),
        concat(element_at(col("mh"), 4), element_at(col("mh"), 5),
          element_at(col("mh"), 6)).as("key")))
  }

  /** q30-shaped candidate pairs from the STORED band table: bucket cap
    * 2..maxBucket, then the within-bucket pair join. Reading the
    * bucketed table means the size aggregation and both joins inherit
    * the write-time hash distribution on (band, key) — no exchange
    * until the final pair distinct.
    */
  def candidatesFromStore(spark: SparkSession, table: String,
      maxBucket: Int): DataFrame = {
    val bnd = spark.table(table)
    val sized = bnd.groupBy("band", "key").agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, maxBucket)).select("band", "key")
    val a = bnd.join(sized, Seq("band", "key"))
    val b = a.select(col("band"), col("key"), col("doc_id").as("doc_b"))
    a.select(col("band"), col("key"), col("doc_id").as("doc_a"))
      .join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("band", "doc_a", "doc_b").distinct()
  }
}
