package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal-column pipeline exercised end-to-end: binary payload +
  * typed metadata + partition-batched decode through
  * [[Multimodal.decode]]'s REAL format dispatch (magic-number sniff;
  * PNG/JPEG/WAV/MP4 header parse; BMP PIXEL-ARRAY read — q40/q230's
  * content features come from actual sample values; unrecognized
  * payloads report format `unknown`, never fake features; q169 is
  * the image header branch's gate, q230 the pixel branch's).
  *
  * Oracle equivalence note: where a query hashes payload content the
  * Spark path works on UTF-8 payload BYTES (encode + payload.length)
  * while the DuckDB oracle works on CHARACTERS (ord(substr(text,i,1)),
  * len(text)) — identical only because the generated corpus is ASCII
  * (verified: every doc matches `^[ -~]*$`). A non-ASCII corpus would
  * need those oracles rewritten over octet_length/encode; the engine
  * side is byte-correct as is.
  */
object MultimodalQueries {

  /** MULTIMODAL FEATURE EXTRACTION through [[Multimodal.decode]]'s
    * full dispatch over the BMP pixel table — since round 12 the
    * feature vector for image rows comes from ACTUAL PIXEL VALUES
    * ([[Multimodal.bmpMeta]] reads the pixel array: f2 is the
    * padding-excluded pixel-byte sum, n_frames the row count), and
    * unrecognized payloads report [0, 0, n_bytes, 0] instead of the
    * retired byte-sum stand-in. The oracle recomputes the pixel sum
    * from the generator's closed form `(id·7 + j) mod 251` over the
    * true stride geometry — a decoder that reads padding bytes as
    * pixels, drops a row, or mis-handles the top-down orientation
    * hash-fails. All features are exact integers in doubles — no
    * rounding step at all.
    */
  val q40 = Q("q40_multimodal_features",
    """WITH g AS (
      |  SELECT doc_id, text, doc_id % 3 AS m,
      |    (doc_id % 6) + 1 AS w, (doc_id % 4) + 1 AS h
      |  FROM documents),
      |geo AS (
      |  SELECT doc_id, text, m, w, h,
      |    ((3 * w + 3) // 4) * 4 AS stride
      |  FROM g),
      |px AS (
      |  SELECT doc_id,
      |    sum((doc_id * 7 + (i // (3 * w)) * stride + i % (3 * w)) % 251)
      |      AS pix_sum
      |  FROM (
      |    SELECT doc_id, w, stride,
      |      CAST(unnest(range(0, h * 3 * w)) AS BIGINT) AS i
      |    FROM geo WHERE m < 2) t
      |  GROUP BY doc_id)
      |SELECT g.doc_id AS media_id,
      |  CAST(CASE WHEN m < 2 THEN 54 + stride * h
      |    ELSE len(text) END AS BIGINT) AS n_bytes,
      |  CAST(CASE WHEN m < 2 THEN h
      |    ELSE greatest((len(text) + 255) // 256, 1) END AS BIGINT)
      |    AS n_frames,
      |  CAST(CASE WHEN m < 2 THEN w ELSE 0 END AS DOUBLE) AS f0,
      |  CAST(CASE WHEN m < 2 THEN h ELSE 0 END AS DOUBLE) AS f1,
      |  CAST(CASE WHEN m < 2 THEN px.pix_sum
      |    ELSE len(text) END AS DOUBLE) AS f2,
      |  CAST(CASE WHEN m < 2 THEN 4 ELSE 0 END AS DOUBLE) AS f3
      |FROM geo g LEFT JOIN px ON px.doc_id = g.doc_id""".stripMargin) {
    (s, dir) =>
    val media = Multimodal.asBmpTable(Tables(s, dir, "documents"))
    Multimodal.extractFeatures(media)
      .select(col("media_id"), col("n_bytes"), col("n_frames"),
        element_at(col("feature"), 1).as("f0"),
        element_at(col("feature"), 2).as("f1"),
        element_at(col("feature"), 3).as("f2"),
        element_at(col("feature"), 4).as("f3"))
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

  /** KEYFRAME SELECTION — collapse each media's consecutive runs of
    * identical frames to one representative (the shot-boundary /
    * static-scene dedup every video ingest pipeline runs before
    * embedding: a held camera produces thousands of near-identical
    * frames; only the first of each run is worth decoding further).
    * Runs are detected on the frame FINGERPRINT stream from
    * [[Multimodal.sampleFrames]] (stride 1 = every frame): lag marks
    * run starts, a cumulative sum numbers runs, one aggregate per
    * (media, run) keeps the first frame and the run length. The
    * window is partitioned per media and ordered by frame index —
    * state is one row, and the partition grain is the media id, so a
    * 100 TB corpus parallelizes across media while each payload's
    * frame stream stays local (it was produced by that payload's own
    * partition-batched flatMap). ASCII caveat as q40/q56.
    */
  val q156 = Q("q156_keyframes",
    """WITH f AS (
      |  SELECT doc_id, text,
      |    CAST(unnest(range(0, greatest((len(text) + 255) // 256, 1)))
      |      AS INT) AS k
      |  FROM documents),
      |fp AS (
      |  SELECT doc_id AS media_id, CAST(k AS BIGINT) AS frame_idx,
      |    md5(substr(text, k * 256 + 1, 256)) AS frame_fp
      |  FROM f),
      |marks AS (
      |  SELECT media_id, frame_idx, frame_fp,
      |    CASE WHEN frame_fp = lag(frame_fp) OVER
      |      (PARTITION BY media_id ORDER BY frame_idx)
      |    THEN 0 ELSE 1 END AS is_new
      |  FROM fp),
      |runs AS (
      |  SELECT media_id, frame_idx, frame_fp,
      |    sum(is_new) OVER (PARTITION BY media_id ORDER BY frame_idx
      |                      ROWS UNBOUNDED PRECEDING) AS run_id
      |  FROM marks)
      |SELECT media_id, CAST(min(frame_idx) AS BIGINT) AS frame_idx,
      |  CAST(count(*) AS BIGINT) AS run_len,
      |  any_value(frame_fp) AS frame_fp
      |FROM runs GROUP BY media_id, run_id""".stripMargin) { (s, dir) =>
    val media = Multimodal.asMediaTable(Tables(s, dir, "documents"))
    val fp = Multimodal.sampleFrames(media, 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    val wc = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    fp.withColumn("is_new",
        when(col("frame_fp") === lag("frame_fp", 1).over(w), 0L)
          .otherwise(1L))
      .withColumn("run_id", sum("is_new").over(wc))
      .groupBy("media_id", "run_id")
      .agg(min("frame_idx").as("frame_idx"),
        count(lit(1)).as("run_len"),
        first("frame_fp").as("frame_fp"))
      .drop("run_id")
  }

  /** PAIR CURATION — the LAION-style caption/embedding pair filter
    * (Schuhmann et al. 2022 curate image-text pairs by caption
    * length and embedding-quality gates before training): join each
    * caption to its vector ON ID, keep pairs whose caption has
    * 25..80 tokens AND whose embedding is not "peaky" (max absolute
    * component <= 0.35 — a collapsed/degenerate vector concentrates
    * its unit mass in few dimensions). The peakiness gate is integer:
    * components quantize to milli-units (exact for float32, the q113
    * device) and the max-abs reduces inside the row via
    * `functions.aggregate` — map-only, no explode. The join is
    * id-to-id at corpus grain (co-partitionable/bucketable at 100 TB);
    * everything else is a per-row scalar.
    */
  val q157 = Q("q157_pair_curation",
    """WITH p AS (
      |  SELECT d.doc_id AS pair_id, d.lang, e.label,
      |    len(string_split(d.text, ' ')) AS n_tokens,
      |    list_max(list_transform(e.embedding,
      |      x -> abs(CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))))
      |      AS peak_milli
      |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id)
      |SELECT pair_id, lang, label,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(peak_milli AS BIGINT) AS peak_milli
      |FROM p
      |WHERE n_tokens BETWEEN 25 AND 80 AND peak_milli <= 350""".stripMargin) {
    (s, dir) =>
    val caps = Tables(s, dir, "documents")
      .select(col("doc_id").as("pair_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val vecs = Tables(s, dir, "embeddings")
      .select(col("vec_id").as("pair_id"), col("label"),
        aggregate(
          transform(col("embedding"),
            x => abs(round(x.cast("double") * 1000).cast("long"))),
          lit(0L), (acc, v) => greatest(acc, v)).as("peak_milli"))
    caps.join(vecs, "pair_id")
      .filter(col("n_tokens").between(25, 80) && col("peak_milli") <= 350)
      .select("pair_id", "lang", "label", "n_tokens", "peak_milli")
  }

  /** REAL IMAGE HEADER DECODE — the first thing a VLM-data pipeline
    * does with a binary column: sniff each payload's actual format by
    * magic number and extract dimensions from the container structure
    * (PNG IHDR fixed layout; JPEG via a genuine marker-segment scan —
    * the synthesized corpus varies each file's COM-segment length and
    * plants legal FF fill bytes, so fixed-offset reads CANNOT pass;
    * see [[Multimodal.asImageTable]]/[[Multimodal.jpegDims]]). The
    * engine parses BYTES ([[Multimodal.decodeImageMeta]], the
    * documented partition-batched codec path); the oracle builds the
    * identical hex layout and extracts the same fields by offset
    * ARITHMETIC over the layout it just built (it knows each file's
    * segment lengths, so it needs no scan) — a decoder that misreads
    * any offset, misses a fill byte, or mis-measures a segment
    * hash-fails. Unknown payloads (raw text bytes) report
    * ('unknown', 0, 0) — garbage is data at crawl scale, never an
    * exception.
    */
  val q169 = Q("q169_image_header_decode",
    """WITH img AS (
      |  SELECT doc_id, text, doc_id % 3 AS m,
      |    (doc_id % 1000) + 1 AS pw, (doc_id % 777) + 1 AS ph,
      |    (doc_id % 500) + 1 AS jw, (doc_id % 333) + 1 AS jh,
      |    (doc_id % 7) + 1 AS k,
      |    CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS fill
      |  FROM documents),
      |h AS (
      |  SELECT doc_id, text, m, k, fill,
      |    CASE
      |      WHEN m = 0 THEN
      |        '89504E470D0A1A0A' || '0000000D' || '49484452'
      |        || lpad(to_hex(pw), 8, '0') || lpad(to_hex(ph), 8, '0')
      |        || '0802000000' || '00000000'
      |      WHEN m = 1 THEN
      |        'FFD8' || 'FFE00010' || '4A46494600' || '0101' || '00'
      |        || '0001' || '0001' || '0000'
      |        || 'FFFE' || lpad(to_hex(k + 2), 4, '0') || repeat('78', k)
      |        || repeat('FF', fill)
      |        || 'FFC0' || '0011' || '08'
      |        || lpad(to_hex(jh), 4, '0') || lpad(to_hex(jw), 4, '0')
      |        || '03' || '012200' || '021101' || '031101' || 'FFD9'
      |      ELSE NULL END AS hx
      |  FROM img)
      |SELECT doc_id AS media_id,
      |  CASE m WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
      |    ELSE 'unknown' END AS format,
      |  CAST(CASE m
      |    WHEN 0 THEN CAST(('0x' || substr(hx, 33, 8)) AS BIGINT)
      |    WHEN 1 THEN
      |      CAST(('0x' || substr(hx, 2 * (24 + k + fill + 7) + 1, 4))
      |        AS BIGINT)
      |    ELSE 0 END AS BIGINT) AS width,
      |  CAST(CASE m
      |    WHEN 0 THEN CAST(('0x' || substr(hx, 41, 8)) AS BIGINT)
      |    WHEN 1 THEN
      |      CAST(('0x' || substr(hx, 2 * (24 + k + fill + 5) + 1, 4))
      |        AS BIGINT)
      |    ELSE 0 END AS BIGINT) AS height,
      |  CAST(CASE WHEN m = 2 THEN len(text)
      |    ELSE len(hx) // 2 END AS BIGINT) AS n_bytes
      |FROM h""".stripMargin) { (s, dir) =>
    Multimodal.decodeImageMeta(
      Multimodal.asImageTable(Tables(s, dir, "documents")))
  }

  /** REAL WAV/RIFF HEADER DECODE — [[q169]]'s audio twin, and a
    * genuinely different parse: all fields are LITTLE-endian and the
    * RIFF chunk walk must apply the even-padding rule (the
    * synthesized corpus plants odd-sized junk LIST chunks before
    * `fmt ` and odd data sizes, so a walker that skips the pad byte
    * lands off-byte and fails — see
    * [[Multimodal.asAudioTable]]/[[Multimodal.wavMeta]]). The engine
    * walks BYTES; the oracle builds the identical layout and reads
    * the fields by little-endian hex-swap arithmetic at the offsets
    * it chose. Output per payload: format, channels, sample rate,
    * bits per sample, data byte count, and the audio-format code
    * (header-only decode IDENTIFIES non-PCM, it never decodes
    * samples). Raw-text payloads report ('unknown', 0...).
    */
  val q173 = Q("q173_wav_header_decode",
    """WITH img AS (
      |  SELECT doc_id, doc_id % 3 AS m,
      |    (doc_id % 2) + 1 AS ch,
      |    8000 + (doc_id % 5) * 4000 AS sr,
      |    CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS bits,
      |    (doc_id % 100) + 1 AS nd,
      |    CASE WHEN doc_id % 4 = 0 THEN (doc_id % 6) + 1 ELSE 0 END AS lj
      |  FROM documents),
      |le AS (
      |  SELECT doc_id, m, ch, sr, bits, nd, lj,
      |    ch * bits // 8 AS ba,
      |    CASE WHEN lj > 0 THEN 8 + lj + (lj % 2) ELSE 0 END AS junk
      |  FROM img),
      |hx AS (
      |  SELECT doc_id, m, junk, nd,
      |    '52494646' ||
      |    (SELECT substr(s,7,2)||substr(s,5,2)||substr(s,3,2)||substr(s,1,2)
      |     FROM (SELECT lpad(to_hex(4 + junk + 24 + 8 + nd + (nd % 2)),
      |       8, '0') AS s)) ||
      |    '57415645' ||
      |    CASE WHEN lj > 0 THEN
      |      '4C495354' ||
      |      (SELECT substr(s,7,2)||substr(s,5,2)||substr(s,3,2)||substr(s,1,2)
      |       FROM (SELECT lpad(to_hex(lj), 8, '0') AS s)) ||
      |      repeat('4A', lj + (lj % 2))
      |    ELSE '' END ||
      |    '666D7420' || '10000000' || '0100' ||
      |    (SELECT substr(s,3,2)||substr(s,1,2)
      |     FROM (SELECT lpad(to_hex(ch), 4, '0') AS s)) ||
      |    (SELECT substr(s,7,2)||substr(s,5,2)||substr(s,3,2)||substr(s,1,2)
      |     FROM (SELECT lpad(to_hex(sr), 8, '0') AS s)) ||
      |    (SELECT substr(s,7,2)||substr(s,5,2)||substr(s,3,2)||substr(s,1,2)
      |     FROM (SELECT lpad(to_hex(sr * ba), 8, '0') AS s)) ||
      |    (SELECT substr(s,3,2)||substr(s,1,2)
      |     FROM (SELECT lpad(to_hex(ba), 4, '0') AS s)) ||
      |    (SELECT substr(s,3,2)||substr(s,1,2)
      |     FROM (SELECT lpad(to_hex(bits), 4, '0') AS s)) ||
      |    '64617461' ||
      |    (SELECT substr(s,7,2)||substr(s,5,2)||substr(s,3,2)||substr(s,1,2)
      |     FROM (SELECT lpad(to_hex(nd), 8, '0') AS s)) ||
      |    repeat('00', nd + (nd % 2)) AS h
      |  FROM le),
      |f AS (SELECT doc_id, m, h, 12 + junk AS f0 FROM hx)
      |SELECT doc_id AS media_id,
      |  CASE WHEN m = 2 THEN 'unknown' ELSE 'wav' END AS format,
      |  CAST(CASE WHEN m = 2 THEN 0 ELSE
      |    CAST(('0x' || substr(h, 2*(f0+11)+1, 2)
      |      || substr(h, 2*(f0+10)+1, 2)) AS BIGINT) END AS BIGINT)
      |    AS channels,
      |  CAST(CASE WHEN m = 2 THEN 0 ELSE
      |    CAST(('0x' || substr(h, 2*(f0+15)+1, 2)
      |      || substr(h, 2*(f0+14)+1, 2) || substr(h, 2*(f0+13)+1, 2)
      |      || substr(h, 2*(f0+12)+1, 2)) AS BIGINT) END AS BIGINT)
      |    AS sample_rate,
      |  CAST(CASE WHEN m = 2 THEN 0 ELSE
      |    CAST(('0x' || substr(h, 2*(f0+23)+1, 2)
      |      || substr(h, 2*(f0+22)+1, 2)) AS BIGINT) END AS BIGINT)
      |    AS bits_per_sample,
      |  CAST(CASE WHEN m = 2 THEN 0 ELSE
      |    CAST(('0x' || substr(h, 2*(f0+31)+1, 2)
      |      || substr(h, 2*(f0+30)+1, 2) || substr(h, 2*(f0+29)+1, 2)
      |      || substr(h, 2*(f0+28)+1, 2)) AS BIGINT) END AS BIGINT)
      |    AS n_data_bytes,
      |  CAST(CASE WHEN m = 2 THEN 0 ELSE
      |    CAST(('0x' || substr(h, 2*(f0+9)+1, 2)
      |      || substr(h, 2*(f0+8)+1, 2)) AS BIGINT) END AS BIGINT)
      |    AS audio_format
      |FROM f""".stripMargin) { (s, dir) =>
    Multimodal.decodeAudioMeta(
      Multimodal.asAudioTable(Tables(s, dir, "documents")))
  }

  /** PERCEPTUAL-HASH NEAR-DUP — image dedup the way LAION-scale
    * pipelines run it (compute a small perceptual code per image,
    * bucket by code bands, verify candidates by Hamming distance):
    * [[Multimodal.columnHash60]] (dHash comparison structure over a
    * 60-column byte fold; the resize step is what a pixel decoder
    * would replace) feeds the GENERIC Hamming-band candidate
    * generator [[graft.text.NearDup.simhashCandidates]] — the same
    * operator the SimHash text tier uses, consumed exactly as a user
    * would: any 60-bit code column plugs in. The corpus plants
    * ground truth via [[Multimodal.asTwinMediaTable]] (every doc has
    * a 2-byte-perturbed twin at Hamming ≤ 4); bands are 4×15 bits
    * with the 2..32 bucket cap, verification at Hamming ≤ 6. The
    * oracle recomputes the column sums character-wise (ASCII corpus
    * — the documented byte≡char device), zero-fills columns beyond
    * short payloads, rebuilds the code by bit shifts, and mirrors
    * banding, cap, pair join, and Hamming cut.
    *
    * Shape: one payload pass per media (map-only), a 4× band explode
    * of the 16-byte signature rows, one (band,key)-grain exchange for
    * the bucket-size cap (broadcast back), the capped self-join, and
    * the xor/bit_count verify — identical cost model to the q31
    * SimHash tier; no all-pairs anywhere, worst case linear in the
    * corpus by the cap argument.
    */
  val q174 = Q("q174_phash_neardup",
    """WITH m AS (
      |  SELECT doc_id * 2 AS media_id, text AS t FROM documents
      |  UNION ALL
      |  SELECT doc_id * 2 + 1,
      |    substr(text, 1, CAST(doc_id % 23 AS INT)) || '~' ||
      |    substr(text, CAST(doc_id % 23 + 2 AS INT),
      |           CAST(doc_id % 19 AS INT)) || '~' ||
      |    substr(text, CAST(doc_id % 23 + doc_id % 19 + 3 AS INT))
      |  FROM documents),
      |b AS (
      |  SELECT media_id, t,
      |    CAST(unnest(range(1, len(t) + 1)) AS INT) AS i
      |  FROM m),
      |cs AS (
      |  SELECT media_id, (i - 1) % 60 AS k,
      |    sum(ord(substr(t, i, 1))) AS s
      |  FROM b GROUP BY media_id, (i - 1) % 60),
      |ks AS (
      |  SELECT mm.media_id, r.k, coalesce(cs.s, 0) AS s
      |  FROM (SELECT DISTINCT media_id FROM m) mm
      |  CROSS JOIN (SELECT unnest(range(0, 60)) AS k) r
      |  LEFT JOIN cs ON cs.media_id = mm.media_id AND cs.k = r.k),
      |bits AS (
      |  SELECT a.media_id, a.k,
      |    CASE WHEN a.s > b2.s THEN 1 ELSE 0 END AS bit
      |  FROM ks a JOIN ks b2 ON b2.media_id = a.media_id
      |    AND b2.k = (a.k + 1) % 60),
      |code AS (
      |  SELECT media_id,
      |    sum(CASE WHEN bit = 1 THEN 1::BIGINT << CAST(k AS INT)
      |        ELSE 0 END) AS sh
      |  FROM bits GROUP BY media_id),
      |bd AS (
      |  SELECT media_id, sh, band,
      |    (sh >> CAST(15 * band AS INT)) & 32767 AS key
      |  FROM code
      |  CROSS JOIN (SELECT CAST(unnest(range(0, 4)) AS INT) AS band) r),
      |sized AS (
      |  SELECT band, key FROM bd GROUP BY band, key
      |  HAVING count(*) BETWEEN 2 AND 32),
      |pairs AS (
      |  SELECT DISTINCT a.media_id AS media_a, c.media_id AS media_b,
      |    a.sh AS sha, c.sh AS shb
      |  FROM sized x
      |  JOIN bd a ON a.band = x.band AND a.key = x.key
      |  JOIN bd c ON c.band = x.band AND c.key = x.key
      |    AND a.media_id < c.media_id)
      |SELECT media_a, media_b,
      |  CAST(bit_count(xor(sha, shb)) AS BIGINT) AS hamming
      |FROM pairs WHERE bit_count(xor(sha, shb)) <= 6""".stripMargin) {
    (s, dir) =>
    val media = Multimodal.asTwinMediaTable(Tables(s, dir, "documents"))
    val codes = Multimodal.perceptualHash(media)
      .withColumnRenamed("media_id", "doc_id")
    graft.text.NearDup.simhashCandidates(codes, bands = 4,
        blockBits = 15, bandBits = 15, maxBucket = 32, maxHamming = 6)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))
  }

  /** MEDIA CURATION GATE over BOTH decoded modalities —
    * [[Multimodal.mediaGate]] end-to-end: the image table's real
    * PNG/JPEG parse and the audio table's real RIFF walk feed the
    * precedence-ordered keep/drop rules (undecodable → too_small →
    * bad_aspect for images; undecodable → unsupported_codec →
    * low_rate → too_short for audio). The oracle never parses a
    * byte: it recomputes each payload's metadata from the generator
    * arithmetic (the q169/q173 device) and applies the same rules —
    * so the gate is double-checked THROUGH the byte parsers: a
    * decoder regression surfaces here as a reason flip. Every
    * oracle-reachable reason fires on the corpus (vacuity pinned in
    * the spec); `unsupported_codec` cannot (all synthesized WAVs are
    * PCM) and is spec-driven with constructed frames instead.
    */
  val q176 = Q("q176_media_gate",
    """WITH img AS (
      |  SELECT doc_id, doc_id % 3 AS m,
      |    CASE WHEN doc_id % 3 = 0 THEN (doc_id % 1000) + 1
      |         WHEN doc_id % 3 = 1 THEN (doc_id % 500) + 1
      |         ELSE 0 END AS w,
      |    CASE WHEN doc_id % 3 = 0 THEN (doc_id % 777) + 1
      |         WHEN doc_id % 3 = 1 THEN (doc_id % 333) + 1
      |         ELSE 0 END AS h
      |  FROM documents),
      |gi AS (
      |  SELECT 'image' AS modality, doc_id AS media_id,
      |    CASE WHEN m = 2 THEN 'undecodable'
      |         WHEN w < 32 OR h < 32 THEN 'too_small'
      |         WHEN w > 3 * h OR h > 3 * w THEN 'bad_aspect'
      |         ELSE 'keep' END AS reason
      |  FROM img),
      |aud AS (
      |  SELECT doc_id, doc_id % 3 AS m, 1 AS af,
      |    (doc_id % 2) + 1 AS ch,
      |    8000 + (doc_id % 5) * 4000 AS sr,
      |    CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS bits,
      |    (doc_id % 100) + 1 AS nd
      |  FROM documents),
      |ga AS (
      |  SELECT 'audio' AS modality, doc_id AS media_id,
      |    CASE WHEN m = 2 THEN 'undecodable'
      |         WHEN af <> 1 THEN 'unsupported_codec'
      |         WHEN sr < 16000 THEN 'low_rate'
      |         WHEN nd * 8000000 // (sr * ch * bits) < 2000
      |           THEN 'too_short'
      |         ELSE 'keep' END AS reason
      |  FROM aud)
      |SELECT * FROM gi UNION ALL SELECT * FROM ga""".stripMargin) {
    (s, dir) =>
    val docs = Tables(s, dir, "documents")
    Multimodal.mediaGate(
      Multimodal.decodeImageMeta(Multimodal.asImageTable(docs)),
      Multimodal.decodeAudioMeta(Multimodal.asAudioTable(docs)))
  }

  /** The q174 column-sum code construction as a reusable CTE chain
    * over a source CTE `src(media_id, t)` — emits prefixed CTEs
    * ending in `$pfx_code(media_id, sh)`. Kept textually identical
    * to q174's inline chain (same sums, zero-fill, bit assembly).
    */
  private def phashCodeCtes(src: String, pfx: String): String =
    s"""${pfx}_b AS (
       |  SELECT media_id, t,
       |    CAST(unnest(range(1, len(t) + 1)) AS INT) AS i
       |  FROM $src),
       |${pfx}_cs AS (
       |  SELECT media_id, (i - 1) % 60 AS k,
       |    sum(ord(substr(t, i, 1))) AS s
       |  FROM ${pfx}_b GROUP BY media_id, (i - 1) % 60),
       |${pfx}_ks AS (
       |  SELECT mm.media_id, r.k, coalesce(cs.s, 0) AS s
       |  FROM (SELECT DISTINCT media_id FROM $src) mm
       |  CROSS JOIN (SELECT unnest(range(0, 60)) AS k) r
       |  LEFT JOIN ${pfx}_cs cs ON cs.media_id = mm.media_id
       |    AND cs.k = r.k),
       |${pfx}_bits AS (
       |  SELECT a.media_id, a.k,
       |    CASE WHEN a.s > b2.s THEN 1 ELSE 0 END AS bit
       |  FROM ${pfx}_ks a JOIN ${pfx}_ks b2
       |    ON b2.media_id = a.media_id AND b2.k = (a.k + 1) % 60),
       |${pfx}_code AS (
       |  SELECT media_id,
       |    sum(CASE WHEN bit = 1 THEN 1::BIGINT << CAST(k AS INT)
       |        ELSE 0 END) AS sh
       |  FROM ${pfx}_bits GROUP BY media_id)""".stripMargin

  /** PERCEPTUAL-CODE STORE INGEST GATE — the image twin of the q167
    * fingerprint-store gate, and the piece that makes q174's dedup
    * INCREMENTAL: the historical corpus's codes live in a PERSISTED
    * band store (bucketed CTAS on the probe key (band, key) — the
    * SignatureStore argument, Hamming edition: the probe join
    * inherits the write-time distribution, zero store-side
    * exchange), and an arriving delta is admitted or rejected by
    * probing its 4 band keys and VERIFYING candidates at Hamming
    * ≤ 6 against the stored full codes. The synthesized delta mixes
    * both outcomes: even-doc arrivals are the q174 2-byte-perturbed
    * twins of stored media (near-dups — rejected), odd-doc arrivals
    * are the doc's REVERSED text (column sums permute, codes
    * decorrelate — mostly admitted); the spec pins both verdicts
    * non-vacuous and the exchange-free probe. Intra-delta duplicates
    * are deliberately out of scope (q174 is the corpus-dedup pass;
    * this is the per-arrival gate — the q167 contract). Output one
    * row per arrival: verdict + verified store-match count.
    */
  val q179 = Q("q179_phash_store_gate",
    s"""WITH hist AS (
       |  SELECT doc_id AS media_id, text AS t FROM documents),
       |delta AS (
       |  SELECT doc_id + 10000 AS media_id,
       |    CASE WHEN doc_id % 2 = 0 THEN
       |      substr(text, 1, CAST(doc_id % 23 AS INT)) || '~' ||
       |      substr(text, CAST(doc_id % 23 + 2 AS INT),
       |             CAST(doc_id % 19 AS INT)) || '~' ||
       |      substr(text, CAST(doc_id % 23 + doc_id % 19 + 3 AS INT))
       |    ELSE reverse(text) END AS t
       |  FROM documents),
       |${phashCodeCtes("hist", "h")},
       |${phashCodeCtes("delta", "d")},
       |hb AS (
       |  SELECT media_id, sh, band,
       |    (sh >> CAST(15 * band AS INT)) & 32767 AS key
       |  FROM h_code
       |  CROSS JOIN (SELECT CAST(unnest(range(0, 4)) AS INT) AS band) r),
       |db AS (
       |  SELECT media_id, sh, band,
       |    (sh >> CAST(15 * band AS INT)) & 32767 AS key
       |  FROM d_code
       |  CROSS JOIN (SELECT CAST(unnest(range(0, 4)) AS INT) AS band) r),
       |hits AS (
       |  SELECT DISTINCT d.media_id, h.media_id AS store_id
       |  FROM db d JOIN hb h ON h.band = d.band AND h.key = d.key
       |  WHERE bit_count(xor(d.sh, h.sh)) <= 6),
       |nm AS (SELECT media_id, count(*) AS n FROM hits GROUP BY media_id)
       |SELECT dc.media_id,
       |  CASE WHEN nm.n IS NULL THEN 'new' ELSE 'dup' END AS verdict,
       |  CAST(coalesce(nm.n, 0) AS BIGINT) AS n_matches
       |FROM d_code dc LEFT JOIN nm ON nm.media_id = dc.media_id"""
      .stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val histMedia = docs.select(col("doc_id").as("media_id"),
      lit("image/raw").as("modality"),
      encode(col("text"), "UTF-8").as("payload"))
    val p0 = (col("doc_id") % 23 + 1).cast("int")
    val p1 = (p0 + col("doc_id") % 19 + 1).cast("int")
    val t = col("text")
    val twin = concat(
      t.substr(lit(1), p0 - 1), lit("~"),
      t.substr(p0 + 1, p1 - p0 - 1), lit("~"),
      t.substr(p1 + 1, length(t)))
    val deltaMedia = docs.select(
      (col("doc_id") + 10000).as("media_id"),
      lit("image/raw").as("modality"),
      encode(when(col("doc_id") % 2 === 0, twin)
        .otherwise(reverse(col("text"))), "UTF-8").as("payload"))
    val table = s"phash_store_${graft.SessionScratch.keyOf(dir)}"
    graft.SessionScratch.once(s, table) {
      val wh = graft.sources.Warehouse(
        graft.SessionScratch.dir(s, "phashstore"))
      wh.saveBucketed(
        Multimodal.phashBands(Multimodal.perceptualHash(histMedia)),
        table, 8, Seq("band", "key"))
    }
    val deltaCodes = Multimodal.perceptualHash(deltaMedia)
    val probe = Multimodal.phashBands(deltaCodes)
    val store = s.table(table)
      .select(col("media_id").as("store_id"), col("sh").as("ssh"),
        col("band"), col("key"))
    val hits = probe.join(store, Seq("band", "key"))
      .filter(bit_count(col("sh").bitwiseXOR(col("ssh"))) <= 6)
      .select(col("media_id"), col("store_id")).distinct()
    val nm = hits.groupBy("media_id").agg(count(lit(1)).as("n"))
    deltaCodes.select("media_id")
      .join(nm, Seq("media_id"), "left")
      .select(col("media_id"),
        when(col("n").isNull, "new").otherwise("dup").as("verdict"),
        coalesce(col("n"), lit(0L)).cast("long").as("n_matches"))
  }

  /** REAL MP4/ISO-BMFF HEADER DECODE — the video member completing
    * the header-decode triad (PNG/JPEG q169, WAV q173), and a third
    * genuinely different parse: NESTED big-endian boxes with the two
    * size escapes (`size==1` → 64-bit largesize header, `size==0` →
    * box-to-EOF) and an mvhd whose field widths change with its
    * version byte. The synthesized corpus
    * ([[Multimodal.asVideoTable]]) plants junk `free` boxes of
    * varying size whose payload SPELLS "trak" (substring scanners
    * miscount; the box walk does not), largesize headers on
    * `id%8==0`, and both mvhd versions, so neither fixed offsets nor
    * a single field stride can pass. The oracle builds the identical
    * byte layout in hex and extracts timescale/duration by offset
    * arithmetic over the lengths it just chose (the q169/q173 double
    * derivation); trak count and version are its own structural
    * choices. Raw-text payloads report ('unknown', 0...).
    *
    * Shape: one map-only synthesis projection + the documented
    * partition-batched decode — zero exchange at any scale.
    */
  val q203 = Q("q203_mp4_header_decode",
    """WITH v AS (
      |  SELECT doc_id, doc_id % 3 AS m, doc_id % 2 AS ver,
      |    600 + (doc_id % 10) * 100 AS ts,
      |    (doc_id % 1000) + 1 AS dur,
      |    (doc_id % 3) + 1 AS ntrak,
      |    doc_id % 3 AS tp,
      |    (doc_id % 5) + 1 AS fp,
      |    CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS hasfree,
      |    CASE WHEN doc_id % 8 = 0 THEN 1 ELSE 0 END AS islarge
      |  FROM documents),
      |b AS (
      |  SELECT *,
      |    CASE WHEN hasfree = 1 THEN
      |      fp + (CASE WHEN islarge = 1 THEN 16 ELSE 8 END)
      |      ELSE 0 END AS flen,
      |    CASE WHEN ver = 0 THEN 108 ELSE 120 END AS mvhdsz
      |  FROM v),
      |hx AS (
      |  SELECT doc_id, m, ver, ntrak, flen,
      |    '00000018' || '66747970' || '69736F6D' || '00000200'
      |    || '69736F6D' || '6D703431' ||
      |    CASE WHEN hasfree = 0 THEN ''
      |      WHEN islarge = 1 THEN '00000001' || '66726565'
      |        || lpad(to_hex(fp + 16), 16, '0')
      |        || substr('7472616BAB', 1, fp * 2)
      |      ELSE lpad(to_hex(fp + 8), 8, '0') || '66726565'
      |        || substr('7472616BAB', 1, fp * 2) END ||
      |    lpad(to_hex(8 + mvhdsz + ntrak * (tp + 8)), 8, '0')
      |    || '6D6F6F76' ||
      |    CASE WHEN ver = 0 THEN
      |      '0000006C' || '6D766864' || '00000000' || '000003E8'
      |      || '000007D0' || lpad(to_hex(ts), 8, '0')
      |      || lpad(to_hex(dur), 8, '0')
      |    ELSE
      |      '00000078' || '6D766864' || '01000000'
      |      || '00000000000003E8' || '00000000000007D0'
      |      || lpad(to_hex(ts), 8, '0')
      |      || lpad(to_hex(dur), 16, '0') END ||
      |    '00010000' || '0100' || '0000' || repeat('00', 8) ||
      |    '00010000' || '00000000' || '00000000' || '00000000'
      |    || '00010000' || '00000000' || '00000000' || '00000000'
      |    || '40000000' || repeat('00', 24) ||
      |    lpad(to_hex(ntrak + 1), 8, '0') ||
      |    repeat(lpad(to_hex(tp + 8), 8, '0') || '7472616B'
      |      || substr('CDCD', 1, tp * 2), ntrak) AS h
      |  FROM b),
      |f AS (SELECT doc_id, m, ver, ntrak, 40 + flen AS c, h FROM hx)
      |SELECT doc_id AS media_id,
      |  CASE WHEN m = 2 THEN 'unknown' ELSE 'mp4' END AS format,
      |  CAST(CASE WHEN m = 2 THEN 0 ELSE
      |    CAST(('0x' || substr(h,
      |      2 * (c + CASE WHEN ver = 0 THEN 12 ELSE 20 END) + 1, 8))
      |      AS BIGINT) END AS BIGINT) AS timescale,
      |  CAST(CASE WHEN m = 2 THEN 0
      |    WHEN ver = 0 THEN
      |      CAST(('0x' || substr(h, 2 * (c + 16) + 1, 8)) AS BIGINT)
      |    ELSE
      |      CAST(('0x' || substr(h, 2 * (c + 24) + 1, 16)) AS BIGINT)
      |    END AS BIGINT) AS duration,
      |  CAST(CASE WHEN m = 2 THEN 0 ELSE ntrak END AS BIGINT)
      |    AS n_traks,
      |  CAST(CASE WHEN m = 2 THEN 0 ELSE ver END AS BIGINT)
      |    AS mvhd_version
      |FROM f""".stripMargin) { (s, dir) =>
    Multimodal.decodeVideoMeta(
      Multimodal.asVideoTable(Tables(s, dir, "documents")))
  }

  /** VIDEO CURATION GATE — q176's rule layer extended to the third
    * modality over [[Multimodal.decodeVideoMeta]] (q203's decoder):
    * `undecodable` for unparseable payloads, then the duration floor
    * in integer milliseconds (`duration·1000 div timescale`, the
    * division guarded against the zero denominators undecodable rows
    * carry — ANSI makes an unguarded zero divide an error). The two
    * structural rules (`zero_timescale`, `no_tracks`) cannot fire on
    * the generated corpus (every container writes ts ≥ 600 and ≥ 1
    * trak) and are spec-driven with constructed frames — the q176
    * oracle-unreachable-branch convention. The oracle recomputes
    * reason AND dur_ms arithmetically from the generator parameters
    * (never touching bytes), so the gate is double-checked THROUGH
    * the box walker; dur_ms rides in the output to pin the integer
    * division itself. The shared [[Multimodal.videoReason]] chain
    * also routes in [[graft.streaming.StreamingEtl.mediaGateStream]]
    * — batch and stream cannot drift. Map-only, zero exchange.
    */
  val q212 = Q("q212_video_gate",
    """WITH v AS (
      |  SELECT doc_id, doc_id % 3 AS m,
      |    600 + (doc_id % 10) * 100 AS ts,
      |    (doc_id % 1000) + 1 AS dur
      |  FROM documents)
      |SELECT doc_id AS media_id,
      |  CASE WHEN m = 2 THEN 'undecodable'
      |       WHEN (dur * 1000) // ts < 500 THEN 'too_short'
      |       ELSE 'keep' END AS reason,
      |  CAST(CASE WHEN m = 2 THEN 0 ELSE (dur * 1000) // ts END
      |    AS BIGINT) AS dur_ms
      |FROM v""".stripMargin) { (s, dir) =>
    val vid = Multimodal.decodeVideoMeta(
      Multimodal.asVideoTable(Tables(s, dir, "documents")))
    vid.select(col("media_id"),
      Multimodal.videoReason.as("reason"),
      when(col("timescale") > 0,
        expr("duration * 1000 div timescale")).otherwise(lit(0L))
        .as("dur_ms"))
  }

  /** REAL PIXEL-LEVEL DECODE — the tier q169/q173/q203 could not
    * reach: [[Multimodal.bmpMeta]] parses uncompressed 24-bpp BMPs
    * (public BITMAPINFOHEADER layout, pure byte arithmetic) and reads
    * the PIXEL ARRAY itself. Two stats only pixels can produce:
    * `pix_sum` (every pixel byte, EXCLUDING each row's 4-byte
    * alignment padding — the corpus walks padding through 0..3 bytes,
    * so padding-as-pixels misreads most files) and `top_row_sum` (the
    * VISUALLY top row — stored last in bottom-up files, first in the
    * corpus's top-down `id%3==1` files, so orientation-blind readers
    * fail half the BMPs). The oracle recomputes both from the
    * generator's closed form `(id·7 + j) mod 251` over the true
    * stride geometry — it never parses a byte, the engine never sees
    * the closed form (the q169/q173/q203 double-derivation device,
    * now at pixel granularity). Raw-text rows report
    * ('unknown', 0, ...): garbage is data at crawl scale.
    *
    * Shape: map-only synthesis projection + partition-batched decode —
    * zero exchange at any scale; a real codec would amortize init per
    * partition in the same mapPartitions seam.
    */
  val q230 = Q("q230_bmp_pixel_decode",
    """WITH g AS (
      |  SELECT doc_id, text, doc_id % 3 AS m,
      |    (doc_id % 6) + 1 AS w, (doc_id % 4) + 1 AS h
      |  FROM documents),
      |geo AS (
      |  SELECT doc_id, text, m, w, h,
      |    ((3 * w + 3) // 4) * 4 AS stride
      |  FROM g),
      |px AS (
      |  SELECT doc_id, sum(v) AS pix_sum,
      |    sum(CASE WHEN r = tr THEN v ELSE 0 END) AS top_row_sum
      |  FROM (
      |    SELECT doc_id, i // (3 * w) AS r,
      |      CASE WHEN m = 1 THEN 0 ELSE h - 1 END AS tr,
      |      (doc_id * 7 + (i // (3 * w)) * stride + i % (3 * w)) % 251
      |        AS v
      |    FROM (
      |      SELECT doc_id, m, w, h, stride,
      |        CAST(unnest(range(0, h * 3 * w)) AS BIGINT) AS i
      |      FROM geo WHERE m < 2) t1) t2
      |  GROUP BY doc_id)
      |SELECT g.doc_id AS media_id,
      |  CASE WHEN m < 2 THEN 'bmp' ELSE 'unknown' END AS format,
      |  CAST(CASE WHEN m < 2 THEN w ELSE 0 END AS BIGINT) AS width,
      |  CAST(CASE WHEN m < 2 THEN h ELSE 0 END AS BIGINT) AS height,
      |  CAST(coalesce(px.pix_sum, 0) AS BIGINT) AS pix_sum,
      |  CAST(coalesce(px.top_row_sum, 0) AS BIGINT) AS top_row_sum,
      |  CAST(CASE WHEN m < 2 THEN 54 + stride * h
      |    ELSE len(text) END AS BIGINT) AS n_bytes
      |FROM geo g LEFT JOIN px ON px.doc_id = g.doc_id""".stripMargin) {
    (s, dir) =>
    Multimodal.decodeBmpMeta(
      Multimodal.asBmpTable(Tables(s, dir, "documents")))
  }

  /** PIXEL-DOMAIN PERCEPTUAL NEAR-DUP — q174's retrieval pipeline
    * (band-LSH over a 60-bit locality hash, capped buckets, Hamming
    * verify) with the hash moved from FILE BYTES to DECODED PIXELS:
    * [[Multimodal.pixelHash60]] walks each BMP's padding-stripped
    * pixel array in orientation-NORMALIZED visual order (the
    * property a file-byte hash cannot have — the same image stored
    * bottom-up and top-down hashes identically, spec-pinned), folds
    * into 60 column sums, one bit per adjacent comparison. The
    * corpus ([[Multimodal.asBmpTwinTable]]) plants a one-pixel
    * perturbed twin per doc: one changed pixel moves one column sum,
    * flips ≤ 2 bits, and the 4×15 banding then guarantees ≥ 2
    * identical bands per twin pair (pigeonhole) — recall is
    * structural, not statistical. The oracle rebuilds the pixel
    * stream from the generator's closed form (visual-order offset
    * arithmetic it never shares with the engine, which parses real
    * bytes), then mirrors the sums, bit assembly, banding, cap, and
    * Hamming cut — q174's double-derivation device at the pixel
    * tier.
    *
    * Shape: map-only synthesis + partition-batched pixel hash, one
    * band-grain exchange for the bucket cap, the capped self-join,
    * and the xor/bit_count verify — the q31/q174 cost model; nothing
    * all-pairs at any scale.
    */
  val q233 = Q("q233_pixel_phash_neardup",
    """WITH g AS (
      |  SELECT doc_id, (doc_id % 6) + 1 AS w, (doc_id % 4) + 1 AS h
      |  FROM documents),
      |geo AS (
      |  SELECT doc_id, w, h, ((3 * w + 3) // 4) * 4 AS stride FROM g),
      |med AS (
      |  SELECT doc_id, w, h, stride, doc_id * 2 AS media_id, 0 AS tw
      |  FROM geo
      |  UNION ALL
      |  SELECT doc_id, w, h, stride, doc_id * 2 + 1, 1 FROM geo),
      |px AS (
      |  SELECT media_id, i % 60 AS k,
      |    CASE WHEN tw = 1 AND
      |        (h - 1 - i // (3 * w)) * stride + i % (3 * w)
      |          = doc_id % (3 * w)
      |      THEN ((doc_id * 7 + (h - 1 - i // (3 * w)) * stride
      |        + i % (3 * w)) % 251 + 101) % 251
      |      ELSE (doc_id * 7 + (h - 1 - i // (3 * w)) * stride
      |        + i % (3 * w)) % 251 END AS v
      |  FROM (SELECT *, CAST(unnest(range(0, 3 * w * h)) AS BIGINT)
      |          AS i FROM med) t),
      |cs AS (SELECT media_id, k, sum(v) AS s FROM px
      |       GROUP BY media_id, k),
      |ks AS (
      |  SELECT mm.media_id, r.k, coalesce(cs.s, 0) AS s
      |  FROM (SELECT DISTINCT media_id FROM med) mm
      |  CROSS JOIN (SELECT unnest(range(0, 60)) AS k) r
      |  LEFT JOIN cs ON cs.media_id = mm.media_id AND cs.k = r.k),
      |bits AS (
      |  SELECT a.media_id, a.k,
      |    CASE WHEN a.s > b2.s THEN 1 ELSE 0 END AS bit
      |  FROM ks a JOIN ks b2 ON b2.media_id = a.media_id
      |    AND b2.k = (a.k + 1) % 60),
      |code AS (
      |  SELECT media_id,
      |    sum(CASE WHEN bit = 1 THEN 1::BIGINT << CAST(k AS INT)
      |        ELSE 0 END) AS sh
      |  FROM bits GROUP BY media_id),
      |bd AS (
      |  SELECT media_id, sh, band,
      |    (sh >> CAST(15 * band AS INT)) & 32767 AS key
      |  FROM code
      |  CROSS JOIN (SELECT CAST(unnest(range(0, 4)) AS INT) AS band) r),
      |sized AS (
      |  SELECT band, key FROM bd GROUP BY band, key
      |  HAVING count(*) BETWEEN 2 AND 32),
      |pairs AS (
      |  SELECT DISTINCT a.media_id AS media_a, c.media_id AS media_b,
      |    a.sh AS sha, c.sh AS shb
      |  FROM sized x
      |  JOIN bd a ON a.band = x.band AND a.key = x.key
      |  JOIN bd c ON c.band = x.band AND c.key = x.key
      |    AND a.media_id < c.media_id)
      |SELECT media_a, media_b,
      |  CAST(bit_count(xor(sha, shb)) AS BIGINT) AS hamming
      |FROM pairs WHERE bit_count(xor(sha, shb)) <= 6""".stripMargin) {
    (s, dir) =>
    val media = Multimodal.asBmpTwinTable(Tables(s, dir, "documents"))
    val codes = Multimodal.pixelPerceptualHash(media)
      .withColumnRenamed("media_id", "doc_id")
    graft.text.NearDup.simhashCandidates(codes, bands = 4,
        blockBits = 15, bandBits = 15, maxBucket = 32, maxHamming = 6)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))
  }

  /** SAMPLE-LEVEL PCM DECODE — the audio member of the content tier
    * (q230 is the image member; q173 stopped at the header):
    * [[Multimodal.wavPcm]] walks the RIFF chunks to the data payload
    * and decodes ACTUAL SAMPLES, with the two widths demanding
    * genuinely different arithmetic — 16-bit signed two's-complement
    * little-endian vs 8-bit unsigned offset-128 (0x80 = silence) —
    * so a decoder that byte-sums instead of sample-decoding fails
    * every 16-bit file with a negative sample and every 8-bit file
    * outright. Gated stats: per-file sample sum and PEAK |v| (the
    * clipping detector an audio-ingest gate runs). The oracle
    * recomputes both from the generator's closed form
    * `(id·31+k) mod 2^bits` reinterpreted per width — it never
    * touches a byte, the engine never sees the closed form (the
    * q230 double derivation, audio edition). Odd 8-bit data sizes
    * put the RIFF pad rule on the CONTENT chunk; `id%5==4` rows are
    * raw-text garbage reporting ('unknown', 0, ...).
    *
    * Shape: map-only synthesis + partition-batched decode — zero
    * exchange at any scale.
    */
  val q234 = Q("q234_pcm_sample_decode",
    """WITH p AS (
      |  SELECT doc_id, doc_id % 5 AS m,
      |    CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 16 END AS bits,
      |    CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS ch,
      |    (doc_id % 50) + 10 AS fr
      |  FROM documents),
      |smp AS (
      |  SELECT doc_id,
      |    CASE WHEN bits = 16 THEN
      |      CASE WHEN (doc_id * 31 + k) % 65536 >= 32768
      |        THEN (doc_id * 31 + k) % 65536 - 65536
      |        ELSE (doc_id * 31 + k) % 65536 END
      |    ELSE (doc_id * 31 + k) % 256 - 128 END AS v
      |  FROM (
      |    SELECT doc_id, bits,
      |      CAST(unnest(range(0, fr * ch)) AS BIGINT) AS k
      |    FROM p WHERE m <> 4) t),
      |ag AS (
      |  SELECT doc_id, sum(v) AS sample_sum, max(abs(v)) AS peak
      |  FROM smp GROUP BY doc_id)
      |SELECT p.doc_id AS media_id,
      |  CASE WHEN m = 4 THEN 'unknown'
      |    WHEN bits = 8 THEN 'pcm8' ELSE 'pcm16' END AS format,
      |  CAST(CASE WHEN m = 4 THEN 0 ELSE ch END AS BIGINT)
      |    AS channels,
      |  CAST(CASE WHEN m = 4 THEN 0 ELSE fr END AS BIGINT)
      |    AS n_frames,
      |  CAST(coalesce(ag.sample_sum, 0) AS BIGINT) AS sample_sum,
      |  CAST(coalesce(ag.peak, 0) AS BIGINT) AS peak
      |FROM p LEFT JOIN ag ON ag.doc_id = p.doc_id""".stripMargin) {
    (s, dir) =>
    Multimodal.decodePcmMeta(
      Multimodal.asPcmTable(Tables(s, dir, "documents")))
  }

  /** PNG tEXt METADATA EXTRACTION — the EXIF-role pass beyond
    * dimensions ([[Multimodal.pngTextChunks]], ISO 15948 §11.3.3): a
    * real chunk walk collects every `keyword NUL value` pair from
    * ancillary tEXt chunks, skipping CRCs by stride (validation
    * optional per spec for ancillary chunks — stated) and stopping
    * at IEND. The corpus plants one- and two-chunk files, chunk-free
    * PNGs (the walk must return EMPTY, not invent rows), and raw
    * text garbage (no rows); keyword lengths VARY (Author/Title/
    * Comment), so a fixed-stride reader cannot pass. The oracle
    * regenerates (keyword, value) from the generator arithmetic —
    * the engine parses bytes it never saw derived (uppercase hex
    * values: the one case-sensitivity trap between engines,
    * `upper(to_hex(...))` on the DuckDB side).
    *
    * Shape: map-only synthesis + partition-batched walk + flatMap —
    * zero exchange at any scale.
    */
  val q243 = Q("q243_png_text_chunks",
    """WITH g AS (
      |  SELECT doc_id, doc_id % 3 AS m, doc_id % 2 + 1 AS k
      |  FROM documents),
      |ch AS (
      |  SELECT doc_id, CAST(unnest(range(0, k)) AS BIGINT) AS j
      |  FROM g WHERE m = 0)
      |SELECT doc_id AS media_id, j AS idx,
      |  CASE CAST((doc_id + j) % 3 AS INT)
      |    WHEN 0 THEN 'Author' WHEN 1 THEN 'Title'
      |    ELSE 'Comment' END AS keyword,
      |  upper(lpad(to_hex((doc_id * 13 + j) % 16777216), 6, '0'))
      |    AS txt
      |FROM ch""".stripMargin) { (s, dir) =>
    Multimodal.decodePngText(
      Multimodal.asPngTextTable(Tables(s, dir, "documents")))
  }

  /** PNG PIXEL DECODE — q230's real-pixel gate extended to the format
    * web corpora actually carry: [[Multimodal.asPngPixelTable]] emits
    * 8-bit RGB PNGs whose single stored-deflate IDAT carries
    * scanlines FILTERED at write time with ft = (id + r) mod 5 — all
    * five PNG filters appear, each encoded as the spec's difference
    * against reconstructed neighbors. The engine parses real bytes
    * ([[Multimodal.pngPixels]]: chunk walk → inflate → defilter); the
    * oracle recomputes pix_sum/top_row_sum from the generator's
    * closed form v(k) = (id·7 + k) mod 251 over VISUAL position (no
    * padding — PNG rows are unpadded, the layout difference from
    * q230's BMP) — the double-derivation device: a decoder that
    * skips defiltering, or botches Sub/Up/Average/Paeth
    * reconstruction, fails on those rows. `id%3==2` rows are raw
    * text exercising the 'unknown' path.
    *
    * Shape: map-only synthesis + partition-batched decode (no
    * exchange at all before the sink) — at 100 TB this is the
    * embarrassingly-parallel scan every media pipeline starts with.
    */
  val q276 = Q("q276_png_pixel_decode",
    """WITH g AS (
      |  SELECT doc_id, text, doc_id % 3 AS m,
      |    (doc_id % 6) + 1 AS w, (doc_id % 4) + 1 AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, sum(v) AS pix_sum,
      |    sum(CASE WHEN i < 3 * w THEN v ELSE 0 END) AS top_row_sum
      |  FROM (
      |    SELECT doc_id, w, i, (doc_id * 7 + i) % 251 AS v
      |    FROM (
      |      SELECT doc_id, w, h,
      |        CAST(unnest(range(0, h * 3 * w)) AS BIGINT) AS i
      |      FROM g WHERE m < 2) t1) t2
      |  GROUP BY doc_id)
      |SELECT g.doc_id AS media_id,
      |  CASE WHEN m < 2 THEN 'png' ELSE 'unknown' END AS format,
      |  CAST(CASE WHEN m < 2 THEN w ELSE 0 END AS BIGINT) AS width,
      |  CAST(CASE WHEN m < 2 THEN h ELSE 0 END AS BIGINT) AS height,
      |  CAST(coalesce(px.pix_sum, 0) AS BIGINT) AS pix_sum,
      |  CAST(coalesce(px.top_row_sum, 0) AS BIGINT) AS top_row_sum,
      |  CAST(CASE WHEN m < 2 THEN 68 + h * (1 + 3 * w)
      |    ELSE len(text) END AS BIGINT) AS n_bytes
      |FROM g LEFT JOIN px ON px.doc_id = g.doc_id""".stripMargin) {
    (s, dir) =>
    Multimodal.decodePngMeta(
      Multimodal.asPngPixelTable(Tables(s, dir, "documents")))
  }

  /** CROSS-FORMAT PIXEL-HASH INVARIANCE — the property that makes
    * q233's perceptual hash a CONTENT key rather than a file key:
    * [[Multimodal.asPixelPairTable]] encodes each doc's pixel content
    * (closed form over visual position) BOTH as a bottom-up padded
    * BMP and as a filtered stored-deflate PNG — two containers
    * sharing not one byte of layout — and
    * [[Multimodal.crossFormatHash]] decodes each through its real
    * parser and folds both into the 60-bit code. The oracle computes
    * the hash ONCE from the closed form (q233's sum/bit assembly)
    * and emits it for BOTH columns: any decode divergence between
    * the two format paths, or any orientation/padding slip, breaks
    * the equality. This is the dedup story for re-encoded duplicates
    * (same image, different container) every crawl corpus contains.
    *
    * Shape: map-only synthesis + one partition-batched double decode;
    * no exchange — the hash feeds q233's band-LSH downstream.
    */
  val q277 = Q("q277_pixel_phash_crossformat",
    """WITH g AS (
      |  SELECT doc_id, (doc_id % 6) + 1 AS w, (doc_id % 4) + 1 AS h
      |  FROM documents),
      |cs AS (
      |  SELECT doc_id, i % 60 AS k, sum((doc_id * 7 + i) % 251) AS s
      |  FROM (
      |    SELECT doc_id,
      |      CAST(unnest(range(0, h * 3 * w)) AS BIGINT) AS i
      |    FROM g) t
      |  GROUP BY doc_id, i % 60),
      |ks AS (
      |  SELECT g.doc_id, r.k, coalesce(cs.s, 0) AS s
      |  FROM g
      |  CROSS JOIN (SELECT unnest(range(0, 60)) AS k) r
      |  LEFT JOIN cs ON cs.doc_id = g.doc_id AND cs.k = r.k),
      |code AS (
      |  SELECT a.doc_id,
      |    sum(CASE WHEN a.s > b2.s THEN 1::BIGINT << CAST(a.k AS INT)
      |        ELSE 0 END) AS sh
      |  FROM ks a JOIN ks b2 ON b2.doc_id = a.doc_id
      |    AND b2.k = (a.k + 1) % 60
      |  GROUP BY a.doc_id)
      |SELECT doc_id AS media_id, CAST(sh AS BIGINT) AS phash_bmp,
      |  CAST(sh AS BIGINT) AS phash_png
      |FROM code""".stripMargin) { (s, dir) =>
    // spread the single-split scan below the per-row dual decode:
    // the whole query is one map-only stage (synthesize PNG+BMP,
    // decode both, pHash both) that otherwise runs as ONE task
    // (StageProbe r20: a single 1.18 s no-shuffle stage was the
    // query). Per-row outputs -> partitioning-independent.
    Multimodal.crossFormatHash(
      Multimodal.asPixelPairTable(
        graft.ops.Par.spread(Tables(s, dir, "documents"))))
  }

  /** REAL-ENCODER PNG DECODE — q276's gate on the dynamic-Huffman
    * path: [[Multimodal.asPngDeflateTable]] compresses the filtered
    * scanlines with the JDK zlib encoder (levels 1/5/9 cycling, so
    * stored/fixed/dynamic block shapes all occur across the corpus)
    * and [[Multimodal.pngPixels]] decodes them with the from-scratch
    * [[Multimodal.inflate]] — encoder and decoder share no code, and
    * the oracle mirrors only the closed-form CONTENT (compressed
    * bytes are encoder-dependent, so n_bytes is deliberately not in
    * the output). This is the compatibility claim: the decoder
    * handles what production encoders actually emit, not just its
    * own generator's framing.
    *
    * Shape: map-only synthesis + partition-batched decode; no
    * exchange — q276's cost model.
    */
  val q279 = Q("q279_png_deflate_decode",
    """WITH g AS (
      |  SELECT doc_id, (doc_id % 6) + 1 AS w, (doc_id % 4) + 1 AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, sum(v) AS pix_sum,
      |    sum(CASE WHEN i < 3 * w THEN v ELSE 0 END) AS top_row_sum
      |  FROM (
      |    SELECT doc_id, w, i, (doc_id * 7 + i) % 251 AS v
      |    FROM (
      |      SELECT doc_id, w, h,
      |        CAST(unnest(range(0, h * 3 * w)) AS BIGINT) AS i
      |      FROM g) t1) t2
      |  GROUP BY doc_id)
      |SELECT g.doc_id AS media_id, 'png' AS format,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(px.pix_sum AS BIGINT) AS pix_sum,
      |  CAST(px.top_row_sum AS BIGINT) AS top_row_sum
      |FROM g JOIN px ON px.doc_id = g.doc_id""".stripMargin) {
    (s, dir) =>
    Multimodal.decodePngMeta(
      Multimodal.asPngDeflateTable(Tables(s, dir, "documents")))
      .drop("n_bytes")
  }

  /** COLOR-TYPE MATRIX — q279's real-encoder decode across PNG's
    * common 8-bit color types: grayscale (ct 0, 1 byte/pixel), RGB
    * (ct 2) and RGBA (ct 6). The decode is bpp-parametric in exactly
    * one place — the filters' "left neighbor is the same channel one
    * PIXEL back" offset — and a decoder hard-coding bpp=3 corrupts
    * every Sub/Average/Paeth row of the other two types, which is
    * the failure the oracle's per-type closed-form sums would catch.
    * Map-only, q276's cost model.
    */
  val q281 = Q("q281_png_color_types",
    """WITH g AS (
      |  SELECT doc_id, (doc_id % 6) + 1 AS w, (doc_id % 4) + 1 AS h,
      |    CASE CAST(doc_id % 3 AS INT)
      |      WHEN 0 THEN 0 WHEN 1 THEN 2 ELSE 6 END AS ct,
      |    CASE CAST(doc_id % 3 AS INT)
      |      WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS bpp
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, sum(v) AS pix_sum,
      |    sum(CASE WHEN i < bpp * w THEN v ELSE 0 END) AS top_row_sum
      |  FROM (
      |    SELECT doc_id, bpp, w, i, (doc_id * 7 + i) % 251 AS v
      |    FROM (
      |      SELECT doc_id, w, h, bpp,
      |        CAST(unnest(range(0, h * bpp * w)) AS BIGINT) AS i
      |      FROM g) t1) t2
      |  GROUP BY doc_id)
      |SELECT g.doc_id AS media_id, CAST(ct AS BIGINT) AS color_type,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(px.pix_sum AS BIGINT) AS pix_sum,
      |  CAST(px.top_row_sum AS BIGINT) AS top_row_sum
      |FROM g JOIN px ON px.doc_id = g.doc_id""".stripMargin) {
    (s, dir) =>
    Multimodal.decodePngCtMeta(
      Multimodal.asPngColorTable(Tables(s, dir, "documents")))
  }

  /** ADAM7 INTERLACED DECODE — the progressive storage layout every
    * real PNG decoder must handle: seven passes, each a sub-image
    * with its OWN scanlines and PASS-LOCAL filter neighbors, empty
    * passes contributing no bytes at all (small images — most of
    * this corpus — hit that edge constantly). Interlacing permutes
    * STORAGE order only, so the oracle is the same closed-form
    * content sum as the sequential q279 — a decoder that defilters
    * against final-image neighbors, miscomputes a pass geometry, or
    * mis-scatters a pass fails it. Geometry runs to 13×9 so all
    * seven passes are non-empty on the larger ids.
    *
    * Shape: map-only synthesis + partition-batched decode, q276's
    * cost model.
    */
  val q282 = Q("q282_png_interlaced_decode",
    """WITH g AS (
      |  SELECT doc_id, (doc_id % 13) + 1 AS w, (doc_id % 9) + 1 AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, sum(v) AS pix_sum,
      |    sum(CASE WHEN i < 3 * w THEN v ELSE 0 END) AS top_row_sum
      |  FROM (
      |    SELECT doc_id, w, i, (doc_id * 7 + i) % 251 AS v
      |    FROM (
      |      SELECT doc_id, w, h,
      |        CAST(unnest(range(0, h * 3 * w)) AS BIGINT) AS i
      |      FROM g) t1) t2
      |  GROUP BY doc_id)
      |SELECT g.doc_id AS media_id, 'png' AS format,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(px.pix_sum AS BIGINT) AS pix_sum,
      |  CAST(px.top_row_sum AS BIGINT) AS top_row_sum
      |FROM g JOIN px ON px.doc_id = g.doc_id""".stripMargin) {
    (s, dir) =>
    Multimodal.decodePngMeta(
      Multimodal.asPngInterlacedTable(Tables(s, dir, "documents")))
      .drop("n_bytes")
  }

  /** COMPRESSED TEXT METADATA (zTXt) — q243's ancillary-chunk walk
    * composed with the from-scratch inflate at the metadata tier:
    * every other chunk's value is zlib-DEFLATED per RFC 2083 §4.4
    * (keyword NUL method-byte compressed-value), and the walk
    * decompresses it through the same decoder the IDAT path uses.
    * The oracle mirrors the closed-form keyword/value content for
    * BOTH kinds — compressed bytes are encoder-dependent and never
    * compared. Map-only.
    */
  val q283 = Q("q283_png_ztxt_metadata",
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 3 + 1 AS BIGINT) AS n
      |  FROM documents),
      |ch AS (
      |  SELECT doc_id, CAST(unnest(range(0, n)) AS BIGINT) AS j
      |  FROM g)
      |SELECT doc_id AS media_id,
      |  CASE CAST((doc_id + j) % 3 AS INT)
      |    WHEN 0 THEN 'Author' WHEN 1 THEN 'Title'
      |    ELSE 'Comment' END AS keyword,
      |  CASE WHEN (doc_id + j) % 2 = 0 THEN 'tEXt'
      |    ELSE 'zTXt' END AS kind,
      |  upper(lpad(to_hex((doc_id * 13 + j) % 16777216), 6, '0'))
      |    AS txt
      |FROM ch""".stripMargin) { (s, dir) =>
    Multimodal.decodePngAllText(
      Multimodal.asPngZTextTable(Tables(s, dir, "documents")))
  }

  /** GIF PIXEL DECODE — the last web-corpus raster format after BMP
    * (q230) and PNG (q276-q283), and the first LOSSLESS-COMPRESSED
    * palette container: [[graft.multimodal.Gif.asGifTable]] emits
    * real GIF89a bytes (global color table 4/8/16 by id%3, pixels
    * LZW-compressed with the from-scratch variable-width encoder,
    * every even id stored INTERLACED, id%5==0 prefixed with
    * graphic-control + comment extension blocks the parser must skip
    * structurally, id%9==0 raw text → 'unknown'); the engine decodes
    * through [[graft.multimodal.Gif.gifPixels]] — sub-block
    * reassembly → variable-width LZW (dictionary growth, width
    * bumps, KwKwK) → 4-pass deinterlace → palette map. The oracle
    * recomputes every sum from the generator's closed forms: idx_sum
    * proves the code stream, rgb_sum the palette mapping, and
    * top_row_sum the ROW ORDER (an interlace slip reorders rows and
    * breaks it). Round15Spec pins the decoder against the JDK's
    * independent ImageIO GIF writer and roundtrips across the
    * 4096-entry dictionary reset.
    *
    * Shape: map-only synthesis + partition-batched decode, q276's
    * cost model — the embarrassingly-parallel media scan.
    */
  val q287 = Q("q287_gif_lzw_decode",
    """WITH g AS (
      |  SELECT doc_id, doc_id % 9 AS m, (doc_id % 6) + 1 AS w,
      |    (doc_id % 4) + 1 AS h,
      |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 4 WHEN 1 THEN 8
      |      ELSE 16 END AS nc
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, sum(idx) AS idx_sum,
      |    sum(CASE WHEN k < w THEN idx ELSE 0 END) AS top_row_sum,
      |    sum((doc_id * 3 + idx * 7) % 256
      |      + (doc_id * 3 + idx * 7 + 11) % 256
      |      + (doc_id * 3 + idx * 7 + 22) % 256) AS rgb_sum
      |  FROM (
      |    SELECT doc_id, w, k, (doc_id * 7 + k) % nc AS idx
      |    FROM (
      |      SELECT doc_id, w, nc,
      |        CAST(unnest(range(0, w * h)) AS BIGINT) AS k
      |      FROM g WHERE m <> 0) t1) t2
      |  GROUP BY doc_id)
      |SELECT g.doc_id AS media_id,
      |  CASE WHEN m <> 0 THEN 'gif' ELSE 'unknown' END AS format,
      |  CAST(CASE WHEN m <> 0 THEN w ELSE 0 END AS BIGINT) AS width,
      |  CAST(CASE WHEN m <> 0 THEN h ELSE 0 END AS BIGINT) AS height,
      |  CAST(CASE WHEN m <> 0 THEN nc ELSE 0 END AS BIGINT) AS n_colors,
      |  CAST(coalesce(px.idx_sum, 0) AS BIGINT) AS idx_sum,
      |  CAST(coalesce(px.rgb_sum, 0) AS BIGINT) AS rgb_sum,
      |  CAST(coalesce(px.top_row_sum, 0) AS BIGINT) AS top_row_sum
      |FROM g LEFT JOIN px ON px.doc_id = g.doc_id""".stripMargin) {
    (s, dir) =>
    graft.multimodal.Gif.decodeGifMeta(
      graft.multimodal.Gif.asGifTable(Tables(s, dir, "documents")))
  }

  /** ANIMATED GIF FRAME DECODE — q287's container walked to EVERY
    * frame: [[graft.multimodal.Gif.asGifAnimTable]] emits real
    * multi-frame GIF89a (shared global color table, NETSCAPE2.0 loop
    * block skipped structurally, per-frame graphic-control DELAYS,
    * each frame its own LZW stream), and
    * [[graft.multimodal.Gif.decodeGifFrames]] returns ONE ROW PER
    * FRAME with the delay and content sum — the frame-sampling shape
    * (q56's stride sampler) on a real animation container. The
    * oracle enumerates (doc, frame) pairs and recomputes each
    * frame's sum and delay from the closed forms; a decoder that
    * misses a frame, mis-attributes a delay, or bleeds LZW state
    * across frames hash-fails. id%9==0 raw text degrades to a
    * single (-1, 0, 0) verdict row.
    *
    * Shape: map-only synthesis + partition-batched per-frame decode
    * (flatMap), no exchange — q276's cost model at frame grain.
    */
  val q289 = Q("q289_gif_anim_frames",
    """WITH g AS (
      |  SELECT doc_id, doc_id % 9 AS m, (doc_id % 3) + 1 AS nf,
      |    (doc_id % 5) + 2 AS w, (doc_id % 4) + 1 AS h
      |  FROM documents),
      |fr AS (
      |  SELECT doc_id, CAST(unnest(range(0, nf)) AS BIGINT) AS f,
      |    w, h FROM g WHERE m <> 0),
      |px AS (
      |  SELECT doc_id, f,
      |    sum((doc_id * 7 + f * 13 + k) % 8) AS idx_sum
      |  FROM (
      |    SELECT doc_id, f,
      |      CAST(unnest(range(0, w * h)) AS BIGINT) AS k
      |    FROM fr) t
      |  GROUP BY doc_id, f)
      |SELECT * FROM (
      |  SELECT fr.doc_id AS media_id, fr.f AS frame_idx,
      |    CAST((fr.doc_id + fr.f * 3) % 50 + 1 AS BIGINT) AS delay_cs,
      |    CAST(px.idx_sum AS BIGINT) AS idx_sum
      |  FROM fr JOIN px ON px.doc_id = fr.doc_id AND px.f = fr.f
      |  UNION ALL
      |  SELECT doc_id, CAST(-1 AS BIGINT), 0, 0
      |  FROM g WHERE m = 0) t""".stripMargin) { (s, dir) =>
    graft.multimodal.Gif.decodeGifFrames(
      graft.multimodal.Gif.asGifAnimTable(Tables(s, dir, "documents")))
  }

  val all: Seq[Q] = Seq(q40, q56, q156, q157, q169, q173, q174, q176,
    q179, q203, q212, q230, q233, q234, q243, q276, q277, q279, q281,
    q282, q283, q287, q289)
}
