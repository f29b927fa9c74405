package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal-column pipeline exercised end-to-end: binary payload +
  * typed metadata + partition-batched (stub) decode. The oracle
  * recomputes the deterministic stub features from the text bytes.
  *
  * Oracle equivalence note: the Spark path works on UTF-8 payload
  * BYTES (encode + payload.length) while the DuckDB oracle works on
  * CHARACTERS (ord(substr(text,i,1)), len(text)) — identical only
  * because the generated corpus is ASCII (verified: every doc matches
  * `^[ -~]*$`). A non-ASCII corpus would need the oracle rewritten
  * over octet_length/encode; the engine side is byte-correct as is.
  */
object MultimodalQueries {

  val q40 = Q("q40_multimodal_features",
    """WITH b AS (
      |  SELECT doc_id, text,
      |    CAST(unnest(range(1, len(text) + 1)) AS INT) AS i
      |  FROM documents)
      |SELECT doc_id AS media_id,
      |  CAST(any_value(len(text)) AS BIGINT) AS n_bytes,
      |  CAST(greatest((any_value(len(text)) + 255) // 256, 1)
      |    AS BIGINT) AS n_frames,
      |  round(sum(CASE WHEN (i - 1) % 4 = 0
      |    THEN ord(substr(text, i, 1))::DOUBLE / 255.0 ELSE 0 END), 6)
      |    AS f0,
      |  round(sum(CASE WHEN (i - 1) % 4 = 1
      |    THEN ord(substr(text, i, 1))::DOUBLE / 255.0 ELSE 0 END), 6)
      |    AS f1,
      |  round(sum(CASE WHEN (i - 1) % 4 = 2
      |    THEN ord(substr(text, i, 1))::DOUBLE / 255.0 ELSE 0 END), 6)
      |    AS f2,
      |  round(sum(CASE WHEN (i - 1) % 4 = 3
      |    THEN ord(substr(text, i, 1))::DOUBLE / 255.0 ELSE 0 END), 6)
      |    AS f3
      |FROM b GROUP BY doc_id""".stripMargin) { (s, dir) =>
    val media = Multimodal.asMediaTable(Tables(s, dir, "documents"))
    Multimodal.extractFeatures(media)
      .select(col("media_id"), col("n_bytes"), col("n_frames"),
        round(element_at(col("feature"), 1), 6).as("f0"),
        round(element_at(col("feature"), 2), 6).as("f1"),
        round(element_at(col("feature"), 3), 6).as("f2"),
        round(element_at(col("feature"), 4), 6).as("f3"))
  }

  /** Frame sampling: every 3rd 256-byte frame of each payload, with
    * its md5 fingerprint — the fan-out half of the multimodal plumbing
    * (q40 is the reduce half). Same ASCII caveat as q40: the oracle
    * slices CHARACTERS where the engine slices payload BYTES.
    */
  val q56 = Q("q56_frame_sample",
    """WITH f AS (
      |  SELECT doc_id, text,
      |    CAST(unnest(range(0, greatest((len(text) + 255) // 256, 1)))
      |      AS INT) AS k
      |  FROM documents)
      |SELECT doc_id AS media_id, CAST(k AS BIGINT) AS frame_idx,
      |  md5(substr(text, k * 256 + 1, 256)) AS frame_fp
      |FROM f WHERE k % 3 = 0""".stripMargin) { (s, dir) =>
    val media = Multimodal.asMediaTable(Tables(s, dir, "documents"))
    Multimodal.sampleFrames(media, 3)
  }

  val all: Seq[Q] = Seq(q40, q56)
}
