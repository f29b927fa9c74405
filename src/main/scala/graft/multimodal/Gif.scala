package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GIF container + LZW codec, FROM SCRATCH (no imageio on the data
  * path) — the last of the web-corpus raster formats after BMP
  * ([[Multimodal]] q230) and PNG (q276-q283): GIF87a/89a header,
  * logical screen descriptor, global/local color tables, extension
  * blocks (skipped structurally — graphic control, comment,
  * application), the 4-pass row interlace, and the variable-width
  * LZW of the sub-block byte stream (GIF's compression, reference
  * container semantics: the format every early-web crawl still
  * carries). The ENCODER exists so the media tables are
  * deterministic closed forms the DuckDB oracle can mirror; the
  * DECODER is the engine surface, pinned in Round15Spec against the
  * JDK's independent ImageIO GIF writer (the same
  * independent-implementation pin [[Multimodal.inflate]] has against
  * JDK Deflater) and against encode-decode roundtrips crossing every
  * code-width boundary and the 4096-entry dictionary reset.
  *
  * 100 TB shape: per-row binary decode inside `mapPartitions` — the
  * embarrassingly-parallel scan every media pipeline starts with; no
  * exchange, no driver hops, undecodable bytes degrade to a row
  * verdict instead of failing the job.
  */
object Gif {

  // ---- LZW (GIF variant: LSB-first bit packing, CLEAR/EOI codes,
  // ---- width grows 3..12 bits, dictionary caps at 4096) -----------

  /** Compress color indices with GIF-LZW. Width discipline mirrors
    * the decoder exactly (the encoder is one dictionary entry AHEAD
    * of the decoder at each emitted code, so it widens at
    * next == 2^width + 1 where the decoder widens at 2^width); a
    * full dictionary emits CLEAR and resets — both paths are crossed
    * by the roundtrip spec.
    */
  def lzwEncode(idx: Array[Int], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0L; var nbits = 0
    var width = minCodeSize + 1
    def put(code: Int): Unit = {
      cur |= code.toLong << nbits; nbits += width
      while (nbits >= 8) {
        out.write((cur & 0xff).toInt); cur >>>= 8; nbits -= 8
      }
    }
    var dict = Map.empty[(Int, Int), Int]
    var next = eoi + 1
    def reset(): Unit = {
      dict = Map.empty; next = eoi + 1; width = minCodeSize + 1
    }
    put(clear)
    if (idx.nonEmpty) {
      var w = idx(0)
      var i = 1
      while (i < idx.length) {
        val k = idx(i)
        dict.get((w, k)) match {
          case Some(c) => w = c
          case None =>
            put(w)
            dict += ((w, k) -> next); next += 1
            if (next == (1 << width) + 1 && width < 12) width += 1
            if (next == 4096) { put(clear); reset() }
            w = k
        }
        i += 1
      }
      put(w)
    }
    put(eoi)
    if (nbits > 0) out.write((cur & 0xff).toInt)
    out.toByteArray
  }

  /** Decompress a GIF-LZW byte stream into at most `maxPixels`
    * indices. Returns None on any malformed shape (out-of-range
    * code, truncated stream, root overflow) — hardened like
    * [[Multimodal.inflate]], never throws on hostile bytes.
    */
  def lzwDecode(data: Array[Byte], minCodeSize: Int,
      maxPixels: Int): Option[Array[Int]] = {
    if (minCodeSize < 1 || minCodeSize > 11) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    // dictionary as (prefix code, last symbol) arrays — O(1) append,
    // sequences materialized by walking prefixes
    val prefix = new Array[Int](4096)
    val last = new Array[Int](4096)
    val out = new Array[Int](maxPixels)
    var n = 0
    var width = minCodeSize + 1
    var next = eoi + 1
    var prev = -1
    var cur = 0L; var nbits = 0; var pos = 0
    def emit(code: Int): Boolean = { // expand `code`, append to out
      var depth = 0
      var c = code
      // count length first (codes chain strictly downward)
      while (c >= eoi + 1) { c = prefix(c); depth += 1 }
      val total = depth + 1
      if (n + total > maxPixels) return false
      var w = n + total - 1
      c = code
      while (c >= eoi + 1) { out(w) = last(c); c = prefix(c); w -= 1 }
      out(w) = c
      n += total
      true
    }
    def firstSym(code: Int): Int = {
      var c = code
      while (c >= eoi + 1) c = prefix(c)
      c
    }
    while (true) {
      while (nbits < width) {
        if (pos >= data.length) return None // truncated: no EOI seen
        cur |= (data(pos) & 0xffL) << nbits; nbits += 8; pos += 1
      }
      val code = (cur & ((1L << width) - 1)).toInt
      cur >>>= width; nbits -= width
      if (code == eoi) {
        return if (n == maxPixels) Some(out) else None
      } else if (code == clear) {
        next = eoi + 1; width = minCodeSize + 1; prev = -1
      } else if (prev == -1) {
        if (code >= clear) return None // first code must be a root
        if (n >= maxPixels) return None
        out(n) = code; n += 1
        prev = code
      } else {
        if (code > next || (code < clear + 2 && code >= clear))
          return None
        val okEmit =
          if (code < next) emit(code)
          else { // KwKwK: prev's expansion + its own first symbol
            if (next >= 4096) return None
            prefix(next) = prev; last(next) = firstSym(prev)
            // materialize through the just-built entry
            emit(next)
          }
        if (!okEmit) return None
        if (code < next) { // register the inferred entry
          if (next < 4096) {
            prefix(next) = prev; last(next) = firstSym(code)
            next += 1
          }
        } else next += 1 // KwKwK already wrote slot `next`
        if (next == (1 << width) && width < 12) width += 1
        prev = code
      }
    }
    None // unreachable
  }

  // ---- container --------------------------------------------------

  private def le2(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  // GIF interlace storage order: rows 0,8,16.. then 4,12.. then
  // 2,6,10.. then 1,3,5..
  private def interlaceOrder(h: Int): Array[Int] =
    ((0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++
      (1 until h by 2)).toArray

  /** Serialize one frame as a standalone GIF89a: global color table
    * `palette` (RGB ints, length a power of two in [4, 256]),
    * row-major `idx` indices, optional interlace, optional leading
    * extension blocks (graphic control + comment) so decoders must
    * skip structurally.
    */
  def buildGif(idx: Array[Int], w: Int, h: Int, palette: Array[Int],
      interlaced: Boolean = false,
      withExtensions: Boolean = false,
      localPalette: Boolean = false): Array[Byte] = {
    require(idx.length == w * h, "index count != w*h")
    require(palette.length >= 4 && palette.length <= 256 &&
      Integer.bitCount(palette.length) == 1, "palette must be 2^n in [4,256]")
    val ncBits = Integer.numberOfTrailingZeros(palette.length) - 1
    def writePalette(out: java.io.ByteArrayOutputStream): Unit =
      palette.foreach { c =>
        out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff)
        out.write(c & 0xff)
      }
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(le2(w)); out.write(le2(h))
    // either a global color table or (localPalette) none here and a
    // per-frame table on the image descriptor — both real-corpus
    // layouts; the decoder must honor the frame-local override
    out.write((if (localPalette) 0x00 else 0x80) | (7 << 4) |
      (if (localPalette) 0 else ncBits))
    out.write(0); out.write(0) // bg index, aspect
    if (!localPalette) writePalette(out)
    if (withExtensions) {
      // graphic control extension: introducer, label, block size 4,
      // packed/delay/transparent, terminator
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); out.write(le2(3)); out.write(0); out.write(0)
      // comment extension with two sub-blocks
      out.write(0x21); out.write(0xfe)
      val c1 = "graft".getBytes; out.write(c1.length); out.write(c1)
      val c2 = "gif".getBytes; out.write(c2.length); out.write(c2)
      out.write(0)
    }
    out.write(0x2c) // image descriptor
    out.write(le2(0)); out.write(le2(0)); out.write(le2(w)); out.write(le2(h))
    out.write((if (localPalette) 0x80 | ncBits else 0x00) |
      (if (interlaced) 0x40 else 0x00))
    if (localPalette) writePalette(out)
    val stored =
      if (!interlaced) idx
      else interlaceOrder(h).flatMap(r => idx.slice(r * w, r * w + w))
    val mcs = math.max(2, ncBits + 1) // GIF minimum code size >= 2
    out.write(mcs)
    val z = lzwEncode(stored, mcs)
    var off = 0
    while (off < z.length) {
      val len = math.min(255, z.length - off)
      out.write(len); out.write(z, off, len); off += len
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Serialize an ANIMATED GIF89a: shared global color table, one
    * graphic-control extension (delay in centiseconds) + full-screen
    * image block per frame, NETSCAPE2.0 loop extension up front (the
    * block every real animation carries — decoders must skip it
    * structurally). Sequential storage per frame.
    */
  def buildGifAnim(frames: Seq[Array[Int]], w: Int, h: Int,
      palette: Array[Int], delaysCs: Seq[Int]): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == w * h),
      "every frame must be w*h indices")
    require(delaysCs.length == frames.length, "one delay per frame")
    require(palette.length >= 4 && palette.length <= 256 &&
      Integer.bitCount(palette.length) == 1, "palette must be 2^n in [4,256]")
    val ncBits = Integer.numberOfTrailingZeros(palette.length) - 1
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(le2(w)); out.write(le2(h))
    out.write(0x80 | (7 << 4) | ncBits)
    out.write(0); out.write(0)
    palette.foreach { c =>
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff)
      out.write(c & 0xff)
    }
    // NETSCAPE2.0 application extension (infinite loop)
    out.write(0x21); out.write(0xff); out.write(11)
    out.write("NETSCAPE2.0".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII))
    out.write(3); out.write(1); out.write(le2(0)); out.write(0)
    val mcs = math.max(2, ncBits + 1)
    frames.zip(delaysCs).foreach { case (idx, delay) =>
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); out.write(le2(delay)); out.write(0); out.write(0)
      out.write(0x2c)
      out.write(le2(0)); out.write(le2(0)); out.write(le2(w)); out.write(le2(h))
      out.write(0x00)
      out.write(mcs)
      val z = lzwEncode(idx, mcs)
      var off = 0
      while (off < z.length) {
        val len = math.min(255, z.length - off)
        out.write(len); out.write(z, off, len); off += len
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** One decoded GIF frame: its sub-rectangle on the logical screen,
    * the delay the preceding graphic-control extension declared
    * (centiseconds, 0 when none), indices in VISUAL row order, and
    * the palette in effect (frame-local table overriding the global
    * one). Disposal/compositing semantics are deliberately out of
    * scope — a frame-sampling pipeline consumes raw frames, not a
    * composited canvas.
    */
  final case class GifFrame(left: Int, top: Int, w: Int, h: Int,
      delayCs: Int, idx: Array[Int], palette: Array[Int])

  /** Parse EVERY frame of a GIF (animated or single). None on
    * anything malformed — truncated header, bad signature, code
    * stream errors, zero frames before the trailer.
    */
  def gifFrames(p: Array[Byte]): Option[Seq[GifFrame]] = {
    if (p.length < 13) return None
    val sig = new String(p, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u8(i: Int): Int = p(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    var pos = 6
    pos += 4 // screen w/h (frames carry their own)
    val packed = u8(pos); pos += 3 // packed, bg, aspect
    var global = Array.empty[Int]
    def readPalette(sz: Int): Option[Array[Int]] = {
      if (pos + 3 * sz > p.length) None
      else {
        val t = Array.tabulate(sz)(i =>
          (u8(pos + 3 * i) << 16) | (u8(pos + 3 * i + 1) << 8) |
            u8(pos + 3 * i + 2))
        pos += 3 * sz
        Some(t)
      }
    }
    if ((packed & 0x80) != 0) readPalette(1 << ((packed & 7) + 1)) match {
      case Some(t) => global = t
      case None => return None
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[GifFrame]
    var pendingDelay = 0
    while (pos < p.length) {
      u8(pos) match {
        case 0x21 => // extension: label + sub-blocks
          val label = if (pos + 1 < p.length) u8(pos + 1) else -1
          pos += 2
          var first = true
          var ok = true
          while (ok) {
            if (pos >= p.length) return None
            val len = u8(pos)
            // a graphic-control extension's first (only) data block
            // carries the next frame's delay in centiseconds
            if (label == 0xf9 && first && len >= 3 && pos + 3 < p.length)
              pendingDelay = u16(pos + 2)
            first = false
            pos += 1 + len
            if (len == 0) ok = false
          }
        case 0x2c => // image descriptor
          if (pos + 10 > p.length) return None
          val left = u16(pos + 1); val top = u16(pos + 3)
          val iw = u16(pos + 5); val ih = u16(pos + 7)
          val ipk = u8(pos + 9)
          pos += 10
          var palette = global
          if ((ipk & 0x80) != 0) // local color table overrides
            readPalette(1 << ((ipk & 7) + 1)) match {
              case Some(t) => palette = t
              case None => return None
            }
          if (palette.isEmpty || iw <= 0 || ih <= 0) return None
          if (iw.toLong * ih > (1L << 24)) return None // hostile dims
          if (frames.length >= 4096) return None // hostile frame count
          if (pos >= p.length) return None
          val mcs = u8(pos); pos += 1
          val z = new java.io.ByteArrayOutputStream()
          var done = false
          while (!done) {
            if (pos >= p.length) return None
            val len = u8(pos); pos += 1
            if (len == 0) done = true
            else {
              if (pos + len > p.length) return None
              z.write(p, pos, len); pos += len
            }
          }
          val pal = palette
          lzwDecode(z.toByteArray, mcs, iw * ih) match {
            case None => return None
            case Some(st) =>
              if (st.exists(_ >= pal.length)) return None
              val visual =
                if ((ipk & 0x40) == 0) st
                else { // undo 4-pass interlace
                  val rows = interlaceOrder(ih)
                  val v = new Array[Int](iw * ih)
                  var j = 0
                  while (j < ih) {
                    System.arraycopy(st, j * iw, v, rows(j) * iw, iw)
                    j += 1
                  }
                  v
                }
              frames += GifFrame(left, top, iw, ih, pendingDelay,
                visual, pal)
              pendingDelay = 0
          }
        case 0x3b => // trailer
          return if (frames.nonEmpty) Some(frames.toSeq) else None
        case _ => return None
      }
    }
    None // ran off the end without a trailer
  }

  /** Parse the FIRST frame of a GIF: (width, height, color count,
    * row-major indices in VISUAL order, palette RGB ints). None on
    * anything malformed.
    */
  def gifPixels(p: Array[Byte]): Option[(Int, Int, Int, Array[Int],
      Array[Int])] =
    gifFrames(p).map { fs =>
      val f = fs.head
      (f.w, f.h, f.palette.length, f.idx, f.palette)
    }

  // ---- media tables + decode (the q287 surfaces) -------------------

  /** Deterministic GIF media table over documents: w = id%6+1,
    * h = id%4+1, palette size 4/8/16 by id%3 with entry (c, ch) =
    * (id·3 + c·7 + ch·11) mod 256, pixel index at visual k =
    * (id·7 + k) mod nColors; every even id INTERLACED, id%5==0
    * carries graphic-control + comment extensions (structural skip),
    * id%9==0 is raw text (the undecodable path). All closed forms the
    * oracle mirrors; LZW bytes come from [[lzwEncode]] so the
    * container is deterministic end to end.
    */
  def asGifTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        if (id % 9 == 0)
          (id, text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        else {
          val nc = (id % 3) match { case 0 => 4; case 1 => 8; case _ => 16 }
          val w = (id % 6 + 1).toInt; val h = (id % 4 + 1).toInt
          val pal = Array.tabulate(nc)(c =>
            ((((id * 3 + c * 7) % 256) << 16) |
              (((id * 3 + c * 7 + 11) % 256) << 8) |
              ((id * 3 + c * 7 + 22) % 256)).toInt)
          val idx = Array.tabulate(w * h)(k => ((id * 7 + k) % nc).toInt)
          // id%7==3 stores the SAME palette as a frame-LOCAL color
          // table (no GCT) — content-invariant, so the oracle's
          // closed forms are untouched; the decoder must honor the
          // per-frame override
          (id, buildGif(idx, w, h, pal, interlaced = id % 2 == 0,
            withExtensions = id % 5 == 0,
            localPalette = id % 7 == 3))
        }
      })
      .toDF("media_id", "payload")
  }

  /** Deterministic ANIMATED-GIF media table: nf = id%3+1 frames of
    * w = id%5+2 by h = id%4+1, shared 8-color palette (entry c,ch =
    * (id·3 + c·7 + ch·11) mod 256), frame f pixel k =
    * (id·7 + f·13 + k) mod 8, delay (id + f·3) mod 50 + 1 cs, with
    * the NETSCAPE loop block up front. Closed forms the oracle
    * mirrors; id%9==0 is raw text (undecodable path).
    */
  def asGifAnimTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        if (id % 9 == 0)
          (id, text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        else {
          val nf = (id % 3 + 1).toInt
          val w = (id % 5 + 2).toInt; val h = (id % 4 + 1).toInt
          val pal = Array.tabulate(8)(c =>
            ((((id * 3 + c * 7) % 256) << 16) |
              (((id * 3 + c * 7 + 11) % 256) << 8) |
              ((id * 3 + c * 7 + 22) % 256)).toInt)
          val frames = (0 until nf).map(f =>
            Array.tabulate(w * h)(k => ((id * 7 + f * 13 + k) % 8).toInt))
          val delays = (0 until nf).map(f => ((id + f * 3) % 50 + 1).toInt)
          (id, buildGifAnim(frames, w, h, pal, delays))
        }
      })
      .toDF("media_id", "payload")
  }

  /** Frame-grain decode over an animated-GIF media table: ONE ROW PER
    * FRAME (media_id, frame_idx, delay_cs, idx_sum) — the shape a
    * frame-sampling pipeline feeds downstream; undecodable payloads
    * produce a single (-1, 0, 0) verdict row, never silence.
    */
  def decodeGifFrames(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (mid, p) =>
        gifFrames(p) match {
          case Some(fs) => fs.zipWithIndex.map { case (f, i) =>
            var s = 0L
            var k = 0
            while (k < f.idx.length) { s += f.idx(k); k += 1 }
            (mid, i.toLong, f.delayCs.toLong, s)
          }
          case None => Seq((mid, -1L, 0L, 0L))
        }
      })
      .toDF("media_id", "frame_idx", "delay_cs", "idx_sum")
  }

  /** Decode pass over a GIF media table: index sums prove the LZW +
    * interlace path, rgb_sum proves palette mapping, top_row_sum
    * pins row ORDER (an interlace slip reorders rows and breaks it).
    */
  def decodeGifMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (mid, p) =>
        gifPixels(p) match {
          case Some((w, h, nc, ix, pal)) =>
            var is = 0L; var rs = 0L; var ts = 0L
            var i = 0
            while (i < ix.length) {
              val c = pal(ix(i))
              is += ix(i)
              rs += ((c >> 16) & 0xff) + ((c >> 8) & 0xff) + (c & 0xff)
              if (i < w) ts += ix(i)
              i += 1
            }
            (mid, "gif", w.toLong, h.toLong, nc.toLong, is, rs, ts)
          case None => (mid, "unknown", 0L, 0L, 0L, 0L, 0L, 0L)
        }
      })
      .toDF("media_id", "format", "width", "height", "n_colors",
        "idx_sum", "rgb_sum", "top_row_sum")
  }
}
