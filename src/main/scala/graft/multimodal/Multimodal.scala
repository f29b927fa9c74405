package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, with decode/feature-extraction as per-partition batch
  * operations. The decode step is a STUB (no image/audio libs in this
  * container): `fakeDecode` produces a deterministic feature vector
  * from the payload bytes. The Spark-side shape — binary column, typed
  * metadata struct, partition-batched extraction, explicit output
  * schema — is real and is what a production decoder (JNI/codec lib)
  * would plug into.
  *
  * Scale notes: payloads stay distributed (no collect); extraction is
  * mapPartitions so a real decoder amortizes per-partition init (codec
  * contexts, model weights); metadata-only queries never touch the
  * payload column thanks to parquet column pruning.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("n_bytes", LongType))), nullable = false)))

  /** Wrap a text corpus as a media table: payload = UTF-8 bytes (a
    * stand-in for image/audio bytes), modality derived from the source.
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      concat(lit("fake/"), col("source")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("source").as("source"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = false)))

  /** Frame count: ceil(bytes/256), minimum 1 (an empty payload is one
    * empty frame, never zero — every media row decodes to something).
    * floor+1 would mint a PHANTOM empty frame for every exact-multiple
    * payload, which frame-level fingerprint consumers would then
    * cluster on md5("").
    */
  def frameCount(nBytes: Int): Int = math.max(1, (nBytes + 255) / 256)

  /** Deterministic stand-in for a real decoder: 4 "features" derived
    * from byte-range sums over the payload, one "frame" per 256 bytes.
    * A real implementation replaces ONLY the body of this function
    * (e.g. JNI decode + resize + embed); the partition-batched driver
    * below is unchanged.
    */
  def fakeDecode(payload: Array[Byte]): (Long, Array[Double]) = {
    val nFrames = frameCount(payload.length)
    val feat = new Array[Double](4)
    var i = 0
    while (i < payload.length) {
      feat(i % 4) += (payload(i) & 0xff).toDouble / 255.0
      i += 1
    }
    (nFrames.toLong, feat)
  }

  /** Partition-batched feature extraction over the media table —
    * typed `Dataset.mapPartitions` (stays inside Tungsten encoding; no
    * RDD round-trip in the plan), producing [[featureSchema]].
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init would go here (codec context, model, …)
        rows.map { case (id, payload) =>
          val (nFrames, feat) = fakeDecode(payload)
          (id, payload.length.toLong, nFrames, feat)
        }
      }
      .toDF("media_id", "n_bytes", "n_frames", "feature")
  }

  /** Frame sampling — the video-pipeline primitive: every `stride`-th
    * 256-byte "frame" of the payload becomes one output row with its
    * md5 fingerprint (a real decoder emits decoded frames / embeddings
    * here; the fan-out shape, frame indexing, and per-partition batch
    * are what this exercises). One input row yields
    * ceil(nFrames/stride) rows via the iterator's flatMap — lazily, so
    * a giant payload never materializes all its frames at once beyond
    * the partition batch.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be positive: $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, payload) =>
          val nFrames = frameCount(payload.length)
          (0 until nFrames).iterator
            .filter(_ % stride == 0)
            .map { k =>
              val from = k * 256
              val until = math.min(from + 256, payload.length)
              val slice = java.util.Arrays.copyOfRange(payload, from, until)
              val fp = md.digest(slice).map("%02x".format(_)).mkString
              md.reset()
              (id, k.toLong, fp)
            }
        }
      }
      .toDF("media_id", "frame_idx", "frame_fp")
  }
}
