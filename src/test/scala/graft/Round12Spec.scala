package graft

/** Round-12 pins. First block: the bench measurement contract — the
  * r10/r11 verdicts showed single-shot per-query timings in a 229-plan
  * session swing 3–9× vs fresh-session isolation with zero code change,
  * so [[Bench.run]] now bills the MINIMUM of k back-to-back reps and
  * the session carries start/end canary reruns + GC/JIT checkpoints.
  * These tests pin the billing semantics (min, not first; error
  * short-circuits remaining reps) and the instrumentation's shape.
  */
class Round12Spec extends SparkSpec {

  test("Bench.run with passes=2 bills the minimum pass, not the first") {
    var calls = 0
    val warmsUp = Q.noOracle("warms_up") { (s, _) =>
      import s.implicits._
      calls += 1
      // first invocation pays a deliberate stall; the second doesn't —
      // the shape of a JIT/page-cache transient
      if (calls == 1) Thread.sleep(300)
      Seq(1, 2).toDF("x")
    }
    val res = Bench.run(spark, "/unused", Seq(warmsUp), passes = 2)
    assert(calls == 2)
    val t = res.head
    assert(t.repSecs.size == 2)
    assert(t.repSecs(0) >= 0.3, "first pass must include the stall")
    assert(t.sec == t.repSecs.min, "billed time must be the min pass")
    assert(t.sec < 0.3, "the billed min must exclude the transient")
  }

  test("Bench.run skips remaining passes after an error and still " +
    "records it as -1") {
    var calls = 0
    val boom = Q.noOracle("boom") { (_, _) =>
      calls += 1; throw new RuntimeException("deliberate failure")
    }
    val res = Bench.run(spark, "/unused", Seq(boom), passes = 3)
    assert(calls == 1, "a broken plan must not be paid for again")
    assert(res.head.sec == -1.0)
    assert(res.head.err.exists(_.contains("deliberate failure")))
    assert(res.head.repSecs.isEmpty)
  }

  test("jvmCheckpoint reports live GC/JIT/code-cache numbers") {
    val cp = Bench.jvmCheckpoint()
    // shape: all four fields present, code cache non-trivially used in
    // a JVM that has been running Spark codegen
    for (f <- Seq("gc_ms", "compile_ms", "codecache_bytes", "heap_bytes"))
      assert(cp.contains("\"" + f + "\":"), s"missing $f in $cp")
    val cc = "\"codecache_bytes\":(\\d+)".r
      .findFirstMatchIn(cp).get.group(1).toLong
    assert(cc > 1000000L, "code cache should hold compiled Spark code")
    assert(Bench.gcMillis() >= 0L)
  }

  test("canary set names resolve to registered queries") {
    val names = Registry.all.map(_.name).toSet
    Bench.canaryNames.foreach(c => assert(names(c), s"unknown canary $c"))
  }

  // ---- BMP pixel-level decode (the tier that retires the byte-sum
  // feature stand-in: content stats from actual pixel bytes) ----

  import graft.multimodal.Multimodal

  private def le4h(x: Long): String = {
    val h = f"${x & 0xffffffffL}%08X"
    h.substring(6, 8) + h.substring(4, 6) + h.substring(2, 4) +
      h.substring(0, 2)
  }
  private def le2h(x: Int): String = {
    val h = f"$x%04X"
    h.substring(2, 4) + h.substring(0, 2)
  }
  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  /** A 2×2 24-bpp BMP: 3w=6 pixel bytes per row + 2 padding bytes
    * (stride 8). Row-0 pixel bytes 1..6 (pad 250,251), row-1 pixel
    * bytes 10..60 by tens (pad 252,253).
    */
  private def bmp2x2(hField: Long): Array[Byte] = hexBytes(
    "424D" + le4h(54 + 16) + "00000000" + le4h(54) +
      le4h(40) + le4h(2) + le4h(hField) + le2h(1) + le2h(24) +
      le4h(0) + le4h(16) + le4h(2835) + le4h(2835) + le4h(0) + le4h(0) +
      "010203040506" + "FAFB" + "0A141E28323C" + "FCFD")

  test("bmpMeta: bottom-up 2x2 — pixel sum excludes padding; the " +
    "visually top row is the LAST stored row") {
    val Some((w, h, pixSum, topRowSum)) = Multimodal.bmpMeta(bmp2x2(2L))
    assert(w == 2 && h == 2)
    assert(pixSum == 21 + 210, "padding bytes 250..253 must not count")
    assert(topRowSum == 210, "bottom-up: top row is stored row h-1")
  }

  test("bmpMeta: top-down 2x2 (negative biHeight) — same pixel sum, " +
    "top row is the FIRST stored row") {
    val Some((w, h, pixSum, topRowSum)) =
      Multimodal.bmpMeta(bmp2x2(-2L & 0xffffffffL))
    assert(w == 2 && h == 2 && pixSum == 231)
    assert(topRowSum == 21, "top-down: top row is stored row 0")
  }

  test("bmpMeta: corrupt and unsupported inputs are None, text " +
    "starting with 'BM' never sniffs as bmp") {
    val good = bmp2x2(2L)
    // truncated pixel array (drop the last byte)
    assert(Multimodal.bmpMeta(good.dropRight(1)).isEmpty)
    // 8-bpp (unsupported depth)
    val bpp8 = good.clone(); bpp8(28) = 8; assert(Multimodal.bmpMeta(bpp8).isEmpty)
    // compressed (BI_RLE8)
    val comp = good.clone(); comp(30) = 1; assert(Multimodal.bmpMeta(comp).isEmpty)
    // zero width
    val w0 = good.clone(); w0(18) = 0; assert(Multimodal.bmpMeta(w0).isEmpty)
    // ASCII text opening with BM: info-header size field can't be 40
    val txt = ("BM plain text that is comfortably longer than " +
      "fifty-four bytes of header requirement").getBytes
    assert(Multimodal.sniffFormat(txt) == "unknown")
    assert(Multimodal.bmpMeta(txt).isEmpty)
  }

  test("decode dispatch: a bmp payload yields pixel-derived features " +
    "[w, h, pix_sum, 4] with one frame per row") {
    val (nf, feat) = Multimodal.decode(bmp2x2(2L))
    assert(nf == 2L)
    assert(feat.sameElements(Array(2.0, 2.0, 231.0, 4.0)))
  }

  private def wavBytes(af: Int, ch: Int, bits: Int,
      dataHex: String): Array[Byte] = {
    val nd = dataHex.length / 2
    val pad = if (nd % 2 == 1) "00" else ""
    hexBytes("52494646" + le4h(4 + 24 + 8 + nd + pad.length / 2) +
      "57415645" + "666D7420" + "10000000" + le2h(af) + le2h(ch) +
      le4h(16000) + le4h(16000L * ch * bits / 8) +
      le2h(ch * bits / 8) + le2h(bits) +
      "64617461" + le4h(nd) + dataHex + pad)
  }

  test("wavPcm: 16-bit samples decode signed two's-complement LE, " +
    "8-bit decode unsigned offset-128; torn frames and non-PCM are " +
    "None") {
    // samples +1 and -32768 (0x8000): a byte-summer cannot fake this
    val s16 = Multimodal.wavPcm(wavBytes(1, 1, 16, "0100" + "0080"))
    assert(s16.contains((16L, 1L, 2L, -32767L, 32768L)))
    // 8-bit: 0x00 -> -128, 0x80 -> 0 (silence), 0xFF -> 127; odd data
    // size exercises the RIFF pad on the content chunk
    val s8 = Multimodal.wavPcm(wavBytes(1, 1, 8, "0080FF"))
    assert(s8.contains((8L, 1L, 3L, -1L, 128L)))
    // 6 data bytes at 16-bit stereo = 1.5 frames: torn, not data
    assert(Multimodal.wavPcm(wavBytes(1, 2, 16, "0100" * 3)).isEmpty)
    // non-PCM format code: header decode may report it, sample
    // decode must refuse
    assert(Multimodal.wavPcm(wavBytes(2, 1, 16, "0100" + "0080")).isEmpty)
    assert(Multimodal.wavPcm("not audio".getBytes).isEmpty)
  }

  test("pngTextChunks: varying keyword lengths parse, chunk-free " +
    "PNGs return empty, torn streams and missing NULs are None") {
    val ihdr = "89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000020" + "00000010" + "0802000000" + "00000000"
    val iend = "00000000" + "49454E44" + "AE426082"
    // Title\0abc (5+1+3=9 data bytes) then Comment\0zz (7+1+2=10)
    val t1 = "00000009" + "74455874" + "5469746C65" + "00" +
      "616263" + "AB12CD34"
    val t2 = "0000000A" + "74455874" + "436F6D6D656E74" + "00" +
      "7A7A" + "AB12CD34"
    val full = hexBytes(ihdr + t1 + t2 + iend)
    assert(Multimodal.pngTextChunks(full)
      .contains(Seq(("Title", "abc"), ("Comment", "zz"))))
    // chunk-free: empty list, not None, not invented rows
    assert(Multimodal.pngTextChunks(hexBytes(ihdr + iend))
      .contains(Seq.empty))
    // torn: tEXt declares more data than the buffer holds
    assert(Multimodal.pngTextChunks(
      hexBytes(ihdr + "000000FF" + "74455874" + "41")).isEmpty)
    // keyword missing its NUL terminator
    val noNul = "00000005" + "74455874" + "4142434445" + "AB12CD34"
    assert(Multimodal.pngTextChunks(hexBytes(ihdr + noNul + iend)).isEmpty)
    // stream without IEND
    assert(Multimodal.pngTextChunks(hexBytes(ihdr + t1)).isEmpty)
    // not a PNG at all
    assert(Multimodal.pngTextChunks("plain text".getBytes).isEmpty)
  }

  test("pixelHash60: orientation-normalized — the same visual image " +
    "stored bottom-up and top-down hashes identically, where the " +
    "file-byte hash cannot") {
    val bu = bmp2x2(2L)
    // the SAME visual 2×2 image as a top-down file: negative
    // biHeight, stored rows in reversed order (visual top first)
    val td = hexBytes(
      "424D" + le4h(54 + 16) + "00000000" + le4h(54) +
        le4h(40) + le4h(2) + le4h(-2L & 0xffffffffL) + le2h(1) +
        le2h(24) + le4h(0) + le4h(16) + le4h(2835) + le4h(2835) +
        le4h(0) + le4h(0) +
        "0A141E28323C" + "FCFD" + "010203040506" + "FAFB")
    val hb = Multimodal.pixelHash60(bu)
    val ht = Multimodal.pixelHash60(td)
    assert(hb.isDefined && hb == ht,
      "pixel hash must normalize orientation before folding")
    assert(Multimodal.columnHash60(bu) != Multimodal.columnHash60(td),
      "the file-byte hash sees different bytes — these vectors were " +
        "chosen so the codes differ, proving the pixel walk is not " +
        "just re-hashing the file")
    // garbage payload: no pixel hash, never a crash
    assert(Multimodal.pixelHash60("not a bmp at all".getBytes).isEmpty)
  }

  test("q233 recovers planted one-pixel twins: each reported pair at " +
    "hamming <= 2 includes base/twin pairs (media 2i, 2i+1)") {
    val got = graft.queries.MultimodalQueries.q233
      .fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty, "the near-dup gate must fire on this corpus")
    val twins = got.filter { case (a, b, _) => a % 2 == 0 && b == a + 1 }
    assert(twins.nonEmpty, "planted twins must be recovered")
    assert(twins.forall(_._3 <= 2),
      "a one-pixel perturbation flips at most 2 code bits")
  }

  // ---- parameterized MMR greedy depth (q178's former literal-5
  // unroll): the distributed driver-loop chain at k=10 must agree
  // with a shared-nothing in-memory greedy over the same integer
  // candidate/penalty tables ----

  test("mmrPicks(k=10) matches the in-memory shared-nothing greedy " +
    "pick-for-pick, and its k=5 prefix is exactly q178") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.SimQueries.mmrPicks(spark, dir, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet

    // reference: collect the SAME scratch-materialized cand/pairs
    // frames the engine uses (integer micro-sims — the determinism
    // boundary) and run the textbook greedy per query on the driver
    val cand = graft.Materialized.scratch(spark, s"mmr_cand:$dir") {
        fail("cand must already be materialized by mmrPicks") }
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val psim = graft.Materialized.scratch(spark, s"mmr_pairs:$dir") {
        fail("pairs must already be materialized by mmrPicks") }
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
      .toMap
    val expected = cand.groupBy(_._1).flatMap { case (qid, cs) =>
      val pool = cs.map(c => (c._2, c._3)).sortBy(_._1)
      var selected = Vector.empty[Long]
      var picks = Vector.empty[(Long, Long, Long, Long)]
      for (rank <- 1 to 10) {
        val remaining = pool.filterNot(p => selected.contains(p._1))
        val scored = remaining.map { case (nid, msim) =>
          val pen = if (selected.isEmpty) 0L
            else selected.map(s => psim((qid, nid, s))).max
          val score = if (rank == 1) 7L * msim
            else 7L * msim - 3L * pen
          (nid, score)
        }
        val (bestN, bestS) = scored.minBy { case (nid, sc) => (-sc, nid) }
        selected :+= bestN
        picks :+= ((qid, rank.toLong, bestN, bestS))
      }
      picks
    }.toSet
    assert(got == expected, "distributed chain diverges from the " +
      "shared-nothing greedy")
    // prefix property: ranks 1..5 are exactly the registered q178 rows
    val q178rows = graft.queries.SimQueries.q178.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(got.filter(_._2 <= 5) == q178rows)
  }

  // ---- file-skipping manifest: the consult must SKIP files on a
  // range-clustered layout (not just pass everything through) and
  // the pruned plan must open fewer files while returning exactly
  // the full-scan-plus-filter rows ----

  test("manifest skipping: prunedFiles skips most files for a narrow " +
    "range, readPruned opens fewer files and matches the full scan") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    // build the store + manifest through the registered query's
    // shared once-key, then consult the same warehouse directly
    graft.queries.Extras2.q231.fn(spark, dir).collect()
    val wh = graft.sources.Warehouse(
      SessionScratch.dir(spark, s"mfstore_${SessionScratch.keyOf(dir)}"))
    val tbl = s"mf_orders_${SessionScratch.keyOf(dir)}"
    val (kept, total) = wh.prunedFiles(spark, tbl, "o_orderkey", 1L, 100L)
    assert(total >= 8, s"expected the 8-range layout, saw $total files")
    assert(kept.nonEmpty && kept.size < total,
      s"narrow range must skip files (kept ${kept.size} of $total)")
    val pruned = wh.readPruned(spark, tbl, "o_orderkey", 1L, 100L)
    val full = wh.read(spark, tbl)
      .filter(col("o_orderkey").between(1L, 100L))
    assert(pruned.inputFiles.length < full.inputFiles.length,
      "the pruned plan must read fewer files than the full table")
    assert(rows(pruned) == rows(full))
    // no-overlap range: empty result, same schema, zero rows
    val none = wh.readPruned(spark, tbl, "o_orderkey",
      Long.MaxValue - 10, Long.MaxValue)
    assert(none.schema == full.schema && none.count() == 0)
  }

  test("z-order box read (q235): the z-clustered layout skips files " +
    "on the SECOND dimension where a single-key sort cannot, and " +
    "the box read matches the plain filter") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    // build the z store + manifest through the registered query
    graft.queries.Extras2.q235.fn(spark, dir).collect()
    val wh = graft.sources.Warehouse(
      SessionScratch.dir(spark, s"zmstore_${SessionScratch.keyOf(dir)}"))
    val ztbl = s"zm_orders_${SessionScratch.keyOf(dir)}"
    // rival layout: range-sorted on custkey ONLY, same manifest cols
    val stbl = s"zm_orders_1d_${SessionScratch.keyOf(dir)}"
    SessionScratch.once(spark, stbl) {
      wh.overwrite(
        graft.sources.Tables(spark, dir, "orders")
          .repartitionByRange(8, col("o_custkey"))
          .sortWithinPartitions("o_custkey"),
        stbl)
      wh.writeManifest(spark, stbl, Seq("o_custkey", "o_orderkey"))
    }
    // narrow predicate on the SECOND key only (first 5% of orderkeys)
    val pred = Seq(("o_orderkey", 1L, 300L))
    val (zKept, zTotal) = wh.prunedFilesAll(spark, ztbl, pred)
    val (sKept, sTotal) = wh.prunedFilesAll(spark, stbl, pred)
    assert(zTotal >= 8 && sTotal >= 8)
    assert(zKept.size < zTotal,
      s"z layout must skip on the second dimension " +
        s"(kept ${zKept.size} of $zTotal)")
    assert(zKept.size < sKept.size,
      s"the curve must beat the single-key sort (z kept " +
        s"${zKept.size}, 1-D kept ${sKept.size})")
    // correctness: box read == plain filter on the same store
    val box = Seq(("o_custkey", 10L, 60L), ("o_orderkey", 1L, 30000L))
    val pruned = wh.readPrunedBox(spark, ztbl, box)
    val full = wh.read(spark, ztbl)
      .filter(col("o_custkey").between(10L, 60L) &&
        col("o_orderkey").between(1L, 30000L))
    assert(rows(pruned) == rows(full))
  }

  // ---- power-law PageRank hardening (q232): the salted contribution
  // join must spread the hub key's rows across reducers where the
  // naive hash join concentrates them on one — pinned on the actual
  // hash-partition row distribution (deterministic, unlike wall
  // time), plus salted ≡ naive result equality ----

  test("q232: hub key holds ~25% of edges; salting drops the max " +
    "reducer load by ~the salt factor; salted result == naive result") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val salted = graft.queries.Extras2.pagerankSkewPlan(spark, dir,
      salted = true)
    val naive = graft.queries.Extras2.pagerankSkewPlan(spark, dir,
      salted = false)
    assert(rows(salted) == rows(naive),
      "the salt must never change the result")
    val edges = graft.Materialized(spark, s"pgskew_edges:$dir:true") {
      fail("edges must already be materialized") }
    val total = edges.count()
    val hub = edges.filter(col("u") === 0L).count()
    assert(hub.toDouble / total > 0.15 && hub.toDouble / total < 0.35,
      s"hub share ${hub.toDouble / total} outside the planted ~25%")
    // simulate 32 reducers: max rows any one receives under the two
    // partitionings of the contribution join's big side
    def maxLoad(parts: org.apache.spark.sql.Column): Long =
      edges.groupBy(parts.as("p")).count()
        .agg(max("count")).head.getLong(0)
    val naiveMax = maxLoad(pmod(hash(col("u")), lit(32)))
    val saltedMax = maxLoad(pmod(hash(col("u"),
      graft.ops.Skew.contentSalt(edges, 8)), lit(32)))
    assert(naiveMax >= hub,
      "naive hash partitioning sends every hub edge to one reducer")
    assert(saltedMax * 3 < naiveMax,
      s"salting must spread the hub (salted max $saltedMax vs " +
        s"naive max $naiveMax)")
  }

  test("incremental manifest (q236): append extends the manifest " +
    "with only the new files' stats, row-set equal to a full " +
    "recompute; old rows untouched") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    graft.queries.Extras2.q236.fn(spark, dir).collect()
    val wh = graft.sources.Warehouse(
      SessionScratch.dir(spark, s"imstore_${SessionScratch.keyOf(dir)}"))
    val tbl = s"im_orders_${SessionScratch.keyOf(dir)}"
    def manifestRows: Set[Seq[Any]] = rows(
      spark.read.parquet(
        SessionScratch.dir(spark,
          s"imstore_${SessionScratch.keyOf(dir)}") + s"/${tbl}__manifest"))
    val incremental = manifestRows
    // one manifest row per data file, and fragments accrete (the
    // wave-0 overwrite wrote one, the append added another)
    val dataFiles = wh.read(spark, tbl).inputFiles.length
    assert(incremental.size == dataFiles,
      s"manifest ${incremental.size} rows vs $dataFiles files")
    val mDir = new java.io.File(SessionScratch.dir(spark,
      s"imstore_${SessionScratch.keyOf(dir)}") + s"/${tbl}__manifest")
    val fragments = Option(mDir.listFiles()).getOrElse(Array())
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(fragments >= 2,
      "the append must add a manifest fragment, not rewrite")
    // the incremental manifest must equal a from-scratch recompute
    wh.writeManifest(spark, tbl, Seq("o_orderkey"))
    assert(manifestRows == incremental,
      "incremental stats diverge from the full recompute")
    // and the pruned read over the two-wave store equals the filter
    val pruned = wh.readPruned(spark, tbl, "o_orderkey", 500L, 4500L)
    val full = wh.read(spark, tbl)
      .filter(col("o_orderkey").between(500L, 4500L))
    assert(rows(pruned) == rows(full))
  }

  test("bloom point lookup (q237): the range consult keeps every " +
    "file on an off-key clustering, the bloom consult skips; probe " +
    "rows equal the plain filter; misses prove absence") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    graft.queries.Extras2.q237.fn(spark, dir).collect()
    val wh = graft.sources.Warehouse(
      SessionScratch.dir(spark, s"blstore_${SessionScratch.keyOf(dir)}"))
    val tbl = s"bl_orders_${SessionScratch.keyOf(dir)}"
    // contrast: min/max extents on the UNclustered key keep all files
    val (rKept, rTotal) = wh.prunedFiles(spark, tbl, "o_custkey",
      42L, 42L)
    val (bKept, bTotal) = wh.bloomPrunedFiles(spark, tbl, "o_custkey",
      42L)
    assert(rTotal >= 8 && bTotal == rTotal)
    assert(rKept.size == rTotal,
      "range extents on an off-key clustering cannot skip — that is " +
        "the gap the bloom exists for")
    assert(bKept.size < bTotal,
      s"bloom must skip files (kept ${bKept.size} of $bTotal)")
    // correctness: probe rows equal the plain filter, nonempty here
    val probe = wh.readPointLookup(spark, tbl, "o_custkey", 42L)
    val full = wh.read(spark, tbl).filter(col("o_custkey") === 42L)
    assert(rows(probe) == rows(full) && probe.count() > 0)
    // a key that is absent from the corpus: bloom may keep a false-
    // positive file, but the probe returns zero rows (no false
    // negatives is vacuous to test; no false POSITIVES in the final
    // result is what the exact filter guarantees)
    assert(wh.readPointLookup(spark, tbl, "o_custkey",
      999999999L).count() == 0)
  }

  test("metadata count (q239): the whole-domain range answers from " +
    "metadata alone (zero boundary files); mid ranges scan only the " +
    "straddling files; every tier's count equals the plain filter") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    graft.queries.Extras2.q239.fn(spark, dir).collect()
    val wh = graft.sources.Warehouse(
      SessionScratch.dir(spark, s"imstore_${SessionScratch.keyOf(dir)}"))
    val tbl = s"im_orders_${SessionScratch.keyOf(dir)}"
    def exact(lo: Long, hi: Long): Long =
      wh.read(spark, tbl)
        .filter(col("o_orderkey").between(lo, hi)).count()
    val (nAll, iAll, bAll) = wh.countPruned(spark, tbl, "o_orderkey",
      0L, 999999999L)
    assert(bAll == 0, "whole domain must be a pure metadata answer")
    assert(iAll > 0 && nAll == exact(0L, 999999999L))
    val (nMid, iMid, bMid) = wh.countPruned(spark, tbl, "o_orderkey",
      500L, 4500L)
    assert(iMid > 0 && bMid > 0,
      s"mid range should mix tiers (interior $iMid boundary $bMid)")
    assert(nMid == exact(500L, 4500L))
    val (nNarrow, _, bNarrow) = wh.countPruned(spark, tbl,
      "o_orderkey", 700L, 760L)
    assert(bNarrow > 0 && nNarrow == exact(700L, 760L))
  }

  test("incremental recluster (q240): closed files untouched, delta " +
    "rewritten through the curve, content preserved, manifest " +
    "maintained; the journal rolls a torn commit forward") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val tag = s"rcspec_${SessionScratch.keyOf(dir)}"
    val wh = graft.sources.Warehouse(SessionScratch.dir(spark, tag))
    val tbl = "rcspec_orders"
    val mcols = Seq("o_custkey", "o_orderkey")
    val o = graft.sources.Tables(spark, dir, "orders")
    wh.overwrite(
      graft.ops.ZOrder.cluster(o.filter(col("o_orderkey") % 2 === 0),
        col("o_custkey"), col("o_orderkey"), bits = 10,
        partitions = 4).drop("z"), tbl)
    wh.markClustered(tbl)
    wh.writeManifest(spark, tbl, mcols)
    wh.appendWithManifest(spark,
      o.filter(col("o_orderkey") % 2 === 1), tbl, mcols)
    val rowsBefore = wh.read(spark, tbl).count()
    // identify clustered files + their mtimes before the recluster
    val root = new java.io.File(
      SessionScratch.dir(spark, tag) + s"/$tbl")
    def mtimes: Map[String, Long] =
      root.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    val pre = mtimes
    val marked = {
      val src = scala.io.Source.fromFile(new java.io.File(
        SessionScratch.dir(spark, tag) + s"/${tbl}__clustered/files.txt"))
      try src.getLines().toSet finally src.close()
    }
    assert(marked.nonEmpty && marked.subsetOf(pre.keySet))
    val deltaCount = pre.keySet.size - marked.size
    assert(deltaCount > 0, "append must have created unclustered files")
    val n = wh.reclusterDelta(spark, tbl, "o_custkey", "o_orderkey",
      mcols, partitions = 4)
    assert(n == deltaCount, s"recluster must touch only the $deltaCount " +
      s"delta files (touched $n)")
    val post = mtimes
    marked.foreach { f =>
      assert(post.contains(f) && post(f) == pre(f),
        s"closed file $f was rewritten")
    }
    assert(pre.keySet.diff(marked).forall(p => !post.contains(p)),
      "former delta files must be gone")
    assert(wh.read(spark, tbl).count() == rowsBefore,
      "recluster changed the row count")
    // manifest maintained: one row per current file, box read correct
    val mrows = spark.read.parquet(
      SessionScratch.dir(spark, tag) + s"/${tbl}__manifest").count()
    assert(mrows == post.size, s"manifest $mrows rows vs ${post.size}")
    val box = Seq(("o_custkey", 20L, 80L), ("o_orderkey", 100L, 1200L))
    assert(rows(wh.readPrunedBox(spark, tbl, box)) ==
      rows(wh.read(spark, tbl)
        .filter(col("o_custkey").between(20L, 80L) &&
          col("o_orderkey").between(100L, 1200L))))
    // torn-commit recovery: stage a copy of a live file, journal the
    // move plus the original's removal (the crash point is right
    // after the journal write, before any mutation), roll forward
    val victim = post.keySet.head
    val staged = new java.io.File(
      SessionScratch.dir(spark, tag) + "/staged-copy.parquet")
    java.nio.file.Files.copy(java.nio.file.Paths.get(victim),
      staged.toPath)
    val replacement = new java.io.File(root, "zc-recovered.parquet")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(SessionScratch.dir(spark, tag) +
        s"/${tbl}__clustered/journal.txt"),
      (s"MV ${staged.getAbsolutePath} ${replacement.getAbsolutePath}\n" +
        s"RM $victim\n").getBytes)
    wh.recoverRecluster(tbl)
    assert(replacement.exists() && !new java.io.File(victim).exists(),
      "recovery must complete the journaled commit")
    assert(wh.read(spark, tbl).count() == rowsBefore,
      "roll-forward changed the row count")
    assert(!new java.io.File(SessionScratch.dir(spark, tag) +
      s"/${tbl}__clustered/journal.txt").exists(),
      "journal must clear after recovery")
  }

  test("q242 IVM min/max rescan: both maintenance classes fire on " +
    "this corpus — some groups rescan (a deleted row attained the " +
    "extreme), some carry v1 values forward") {
    val got = graft.queries.Extras2.q242
      .fn(spark, "/root/testdata/sf0.001").collect()
    val byFlag = got.groupBy(_.getLong(3)).view.mapValues(_.length)
    assert(byFlag.getOrElse(1L, 0) > 0,
      "no group rescanned — the rescan path is untested (vacuous)")
    assert(byFlag.getOrElse(0L, 0) > 0,
      "every group rescanned — the carry path is untested (vacuous)")
  }

  // ---- Materialized LRU byte cap: overflow evicts the
  // least-recently-used artifact; an evicted artifact is REBUILT on
  // the next request — never served stale, never an error ----

  test("Materialized cap: overflow evicts LRU artifacts and a " +
    "rebuilt artifact returns the same rows") {
    import spark.implicits._
    val before = Materialized.capBytes
    try {
      val a = Materialized(spark, "captest:a") { Seq(1, 2, 3).toDF("x") }
      assert(a.count() == 3) // materialize under the normal cap
      // cache hit: same frame back, no rebuild
      assert(Materialized(spark, "captest:a") {
        fail("hit must not rebuild") } eq a)
      Materialized.capBytes = 1L // every admission now evicts
      val b = Materialized(spark, "captest:b") { Seq(4).toDF("x") }
      assert(b.count() == 1)
      // admitting b drained the over-cap cache (a included): a fresh
      // request rebuilds a NEW frame with identical content
      val a2 = Materialized(spark, "captest:a") { Seq(1, 2, 3).toDF("x") }
      assert(!(a2 eq a), "evicted artifact must be rebuilt")
      assert(rows(a2) == Set(Seq(1), Seq(2), Seq(3)))
    } finally {
      Materialized.capBytes = before
    }
  }
}
