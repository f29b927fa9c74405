package graft

import org.apache.spark.sql.functions._
import graft.sources.Warehouse
import graft.multimodal.Multimodal

/** Round-12 second-half pins: the generalized MERGE clause semantics,
  * WAP's audit/publish guarantees, HLL sketch mergeability, the
  * degree-ordered triangle counter, and the EXIF / VAD byte walkers —
  * each against hand-constructed vectors the production generators
  * never emit.
  */
class Round12bSpec extends SparkSpec {

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private def tmpWh(): Warehouse = Warehouse(
    java.nio.file.Files.createTempDirectory("r12b-wh-").toString)

  // ---- q244 mergeInto ------------------------------------------------

  test("mergeInto: matched-delete, matched-update, not-matched-insert " +
    "land per clause; unmatched target rows carry unchanged") {
    import spark.implicits._
    val wh = tmpWh()
    wh.overwrite(Seq((1L, "A", 10L), (2L, "B", 20L), (3L, "C", 30L))
      .toDF("k", "st", "v"), "t")
    // source: k=1 matched+delete; k=2 matched+update; k=9 insert
    val src = Seq((1L, "x", 11L), (2L, "x", 22L), (9L, "N", 99L))
      .toDF("k", "st", "v")
    wh.mergeInto(spark, "t", src, Seq("k"),
      Map("st" -> lit("U"), "v" -> (col("v") + 100L)),
      col("k") === 1L)
    val out = wh.read(spark, "t").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (2L, "U", 122L), // updated: set takes SOURCE-side v (22+100)
      (3L, "C", 30L), // untouched target row
      (9L, "N", 99L))) // inserted as-is
  }

  test("mergeInto: the delete clause scopes to MATCHED rows only — an " +
    "unmatched source row satisfying it is still inserted") {
    import spark.implicits._
    val wh = tmpWh()
    wh.overwrite(Seq((1L, "A")).toDF("k", "st"), "t")
    val src = Seq((7L, "G")).toDF("k", "st") // satisfies deleteCond
    wh.mergeInto(spark, "t", src, Seq("k"), Map.empty,
      col("k") === 7L)
    val ks = wh.read(spark, "t").select("k").as[Long].collect().sorted
    assert(ks.toSeq == Seq(1L, 7L),
      "unmatched k=7 must INSERT despite matching the delete predicate")
  }

  // ---- q245 WAP ------------------------------------------------------

  test("wap: a staged wave is invisible until publish; publish makes " +
    "it visible and empties the branch") {
    import spark.implicits._
    val wh = tmpWh()
    wh.overwrite(Seq((1L, "a")).toDF("k", "s"), "t")
    wh.wapStage(Seq((2L, "b")).toDF("k", "s"), "t", "br")
    assert(wh.read(spark, "t").count() == 1,
      "staged rows must not be readable from the table")
    wh.wapAudit(spark, "t", "br", Seq("k"))
    assert(wh.wapPublish("t", "br") >= 1)
    assert(wh.read(spark, "t").select("k").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L))
    assert(wh.wapPublish("t", "br") == 0, "branch must be drained")
  }

  test("wap: the audit checks uniqueness against base ∪ staged — a " +
    "wave duplicating an already-published key is rejected") {
    import spark.implicits._
    val wh = tmpWh()
    wh.overwrite(Seq((1L, "a")).toDF("k", "s"), "t")
    wh.wapStage(Seq((1L, "dup")).toDF("k", "s"), "t", "br")
    val e = intercept[IllegalStateException] {
      wh.wapAudit(spark, "t", "br", Seq("k"))
    }
    assert(e.getMessage.contains("duplicate"))
    assert(wh.read(spark, "t").count() == 1, "branch stays invisible")
  }

  test("wap: a torn publish (journal written, moves incomplete) rolls " +
    "FORWARD on the next publish — every staged row lands exactly once") {
    import spark.implicits._
    val wh = tmpWh()
    wh.overwrite(Seq((1L, "a")).toDF("k", "s"), "t")
    wh.wapStage(Seq((2L, "b"), (3L, "c")).toDF("k", "s")
      .repartition(2), "t", "br")
    val stage = new java.io.File(s"${wh.root}/t__wap_br")
    val staged = stage.listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(staged.length >= 2, "need ≥2 files to tear the commit")
    val moves = staged.map(f => f.getAbsolutePath ->
      new java.io.File(s"${wh.root}/t", s"wap-br-${f.getName}")
        .getAbsolutePath)
    // journal as wapPublish would, then complete only the FIRST move
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"${wh.root}/t__wapj_br.txt"),
      moves.map { case (a, b) => s"MV $a $b" }
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    assert(new java.io.File(moves.head._1)
      .renameTo(new java.io.File(moves.head._2)))
    // crash here; next publish must recover then finish the branch
    wh.wapPublish("t", "br")
    assert(wh.read(spark, "t").select("k").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 3L), "no row lost, none doubled")
  }

  // ---- q247 HLL ------------------------------------------------------

  test("hll: MAX-merging sketches of any split equals the sketch of " +
    "the union, and the estimate lands within the m=256 error bound") {
    import spark.implicits._
    val vals = (0L until 3000L).map(v => (v % 3, v / 3)) // 1000/group
    val df = vals.toDF("g", "v")
    val whole = ops.Approx.hllRegisters(df, Seq("g"), col("v"))
    val parts = ops.Approx.hllRegisters(
      df.withColumn("w", col("v") % 2), Seq("g", "w"), col("v"))
      .groupBy("g", "idx").agg(max("mx").as("mx"))
    assert(whole.exceptAll(parts).count() == 0 &&
      parts.exceptAll(whole).count() == 0,
      "split+merge must equal the direct sketch register-for-register")
    val est = ops.Approx.hllEstimate(whole, Seq("g"))
      .select("g", "e").as[(Long, Double)].collect()
    est.foreach { case (g, e) =>
      assert(math.abs(e - 1000.0) < 200.0,
        s"group $g estimate $e implausible for 1000 distinct " +
          "(3σ ≈ 20% at m=256)")
    }
    // register ranges: idx ∈ [0,256), mx ∈ [1,40]
    val regs = whole.select("idx", "mx").as[(Int, Int)].collect()
    assert(regs.forall { case (i, m) =>
      i >= 0 && i < 256 && m >= 1 && m <= 40 })
  }

  // ---- q248 triangles ------------------------------------------------

  test("triangles: K4 puts every node in 3 triangles; a path has " +
    "none; a pendant vertex never appears") {
    import spark.implicits._
    val k4 = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L)).toDF("a", "b")
    val got = ops.Triangles.perNode(k4).as[(Long, Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L)))
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("a", "b")
    assert(ops.Triangles.perNode(path).count() == 0)
    // K3 plus pendant 9: triangle nodes only
    val g = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 9L)).toDF("a", "b")
    val nodes = ops.Triangles.perNode(g).select("node").as[Long]
      .collect().sorted
    assert(nodes.toSeq == Seq(0L, 1L, 2L))
  }

  // ---- q249 EXIF -----------------------------------------------------

  private val exifII = hexBytes(
    "FFD8" + "FFE1" + "003A" + "457869660000" +
      "4949" + "2A00" + "08000000" + "0300" +
      "0001" + "0400" + "01000000" + "80020000" + // width 640
      "0101" + "0400" + "01000000" + "E0010000" + // height 480
      "1201" + "0300" + "01000000" + "06000000" + // orientation 6
      "00000000" + "FFD9")

  private val exifMM = hexBytes(
    "FFD8" + "FFE1" + "003A" + "457869660000" +
      "4D4D" + "002A" + "00000008" + "0003" +
      "0100" + "0004" + "00000001" + "00000280" +
      "0101" + "0004" + "00000001" + "000001E0" +
      "0112" + "0003" + "00000001" + "00060000" + // SHORT left-justified
      "00000000" + "FFD9")

  test("jpegExif: the per-file byte order is honored — the same " +
    "logical content parses identically from II and MM encodings") {
    assert(Multimodal.jpegExif(exifII) ==
      Some(("II", 3L, 640L, 480L, 6L)))
    assert(Multimodal.jpegExif(exifMM) ==
      Some(("MM", 3L, 640L, 480L, 6L)))
  }

  test("jpegExif: a TIFF whose declared IFD overruns its APP1 " +
    "segment is refused, not read from sibling bytes") {
    // same as exifII but IFD claims 10 entries in a 3-entry segment
    val torn = exifII.clone()
    torn(20) = 0x0a // LE entry count low byte (offset of '0300')
    assert(Multimodal.jpegExif(torn).isEmpty)
  }

  test("jpegExif: a JPEG with no Exif APP1 and raw text both decode " +
    "to None ('none' rows downstream)") {
    // SOI + bare SOF0 + EOI: valid JPEG, no APP1
    val noExif = hexBytes("FFD8" + "FFC0" + "0011" + "08" + "01E0" +
      "0280" + "03" + "011100" + "021101" + "031101" + "FFD9")
    assert(Multimodal.jpegExif(noExif).isEmpty)
    assert(Multimodal.jpegExif("plain text".getBytes("UTF-8")).isEmpty)
  }

  // ---- q250 VAD ------------------------------------------------------

  /** pcm8 mono WAV with the given unsigned sample bytes. */
  private def wav8(samples: Seq[Int]): Array[Byte] = {
    def le4(v: Int) = f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X" +
      f"${(v >> 16) & 0xff}%02X${(v >> 24) & 0xff}%02X"
    def le2(v: Int) = f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X"
    val n = samples.size
    val pad = if (n % 2 == 1) "00" else ""
    hexBytes("52494646" + le4(36 + n) + "57415645" +
      "666D7420" + le4(16) + le2(1) + le2(1) + le4(16000) + le4(16000) +
      le2(1) + le2(8) + "64617461" + le4(n) +
      samples.map(s => f"$s%02X").mkString + pad)
  }

  test("wavVad: threshold is inclusive at exactly quarter scale, the " +
    "trailing partial frame is dropped, and runs count consecutively") {
    // frame0: |v|=63 ×10 → 630 < 640 inactive; frame1: |v|=64 → 640
    // ACTIVE (inclusive ≥); 5-sample tail dropped
    val s = Seq.fill(10)(191) ++ Seq.fill(10)(192) ++ Seq.fill(5)(255)
    assert(Multimodal.wavVad(wav8(s)) == Some((8L, 2L, 1L, 1L)))
    // active-inactive-active-active → max_run 2, n_active 3
    val s2 = Seq.fill(10)(255) ++ Seq.fill(10)(128) ++
      Seq.fill(10)(0) ++ Seq.fill(10)(255)
    assert(Multimodal.wavVad(wav8(s2)) == Some((8L, 4L, 3L, 2L)))
    // silence (offset 128 = |v| 0) everywhere → no active frames
    assert(Multimodal.wavVad(wav8(Seq.fill(20)(128))) ==
      Some((8L, 2L, 0L, 0L)))
  }

  // ---- q251 KMV sketch ----------------------------------------------

  test("kmv: re-cutting the union of two k-sketches equals the " +
    "k-sketch of the union — the mergeability theta sketches promise") {
    // k smallest of (k smallest of A ∪ k smallest of B) = k smallest
    // of A ∪ B, because any of the union's k smallest is within the
    // k smallest of its own side
    val k = 16
    val a = (0 until 200).map(i => (i * 7919L) % 100003L)
    val b = (0 until 200).map(i => (i * 104729L) % 100003L)
    def sketch(xs: Seq[Long]) = xs.distinct.sorted.take(k)
    assert(sketch(sketch(a) ++ sketch(b)) == sketch(a ++ b))
  }

  // ---- q252 DP release ----------------------------------------------

  test("q252: groups below the k=10 threshold are suppressed " +
    "entirely, released counts are noised but group-grain bounded") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val out = queries.Extras3.q252.fn(spark, sf)
      .as[(String, String, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall(_._3 >= 10), "no small group may be released")
    val all = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("source", "lang").count().as[(String, String, Long)]
      .collect()
    assert(all.exists(_._3 < 10), "corpus must exercise suppression")
    assert(out.length == all.count(_._3 >= 10),
      "every surviving group is released exactly once")
    // Laplace(b=2): |noise| > 10 has probability e^-5 ≈ 0.7% — on
    // this group count, all noised values stay near truth
    assert(out.forall { case (_, _, n, ub) =>
      math.abs(ub / 1e6 - n) < 15.0 })
  }

  // ---- q253 two-level manifest --------------------------------------

  test("two-level manifest: a narrow range consults a fraction of " +
    "the file rows and keeps the same files as the flat consult") {
    import spark.implicits._
    val wh = tmpWh()
    val df = (0L until 4000L).map(i => (i, i % 97)).toDF("k", "v")
    wh.overwrite(df.repartitionByRange(16, col("k"))
      .sortWithinPartitions("k"), "t")
    wh.writeManifest(spark, "t", Seq("k"))
    wh.writeTwoLevelManifest(spark, "t", "k", groupSize = 4)
    val (files, gTot, gKept, consulted) =
      wh.prunedFilesTwoLevel(spark, "t", "k", 100L, 350L)
    assert(gTot == 4 && gKept < gTot,
      s"narrow range must prune groups ($gKept/$gTot)")
    assert(consulted < 16,
      s"file rows consulted ($consulted) must be bounded by " +
        "surviving groups, not total files")
    val (flat, total) = wh.prunedFiles(spark, "t", "k", 100L, 350L)
    assert(total == 16 && files.sorted == flat.sorted,
      "two-level pruning must keep exactly the flat consult's files")
    // the read itself returns the exact range
    val n = wh.readPrunedTwoLevel(spark, "t", "k", 100L, 350L).count()
    assert(n == 251)
  }

  // ---- q254 histogram quantiles ---------------------------------------

  test("q254: the histogram sketch merges by vector addition, and " +
    "every estimate lands within one bin width of the exact quantile") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val b = o.select(col("o_orderpriority").as("pri"),
      least(floor(col("o_totalprice") / lit(2048.0)).cast("int"),
        lit(255)).as("bin"))
    val whole = b.groupBy("pri", "bin").count()
    val waves = b.withColumn("w", monotonically_increasing_id() % 2)
      .groupBy("pri", "bin", "w").count()
      .groupBy("pri", "bin").agg(sum("count").as("count"))
    assert(whole.exceptAll(waves).count() == 0 &&
      waves.exceptAll(whole).count() == 0,
      "wave-split histograms must vector-add to the direct one")
    val est = graft.queries.Extras3.q254.fn(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    val exact = o.groupBy(col("o_orderpriority").as("pri"))
      .agg(expr("percentile(o_totalprice, 0.25)").as("p25"),
        expr("percentile(o_totalprice, 0.50)").as("p50"),
        expr("percentile(o_totalprice, 0.90)").as("p90"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> Map(25L -> r._2, 50L -> r._3, 90L -> r._4))
      .toMap
    est.foreach { case (pri, pct, _, ub) =>
      val e = ub / 1e6
      val x = exact(pri)(pct)
      assert(math.abs(e - x) <= 2048.0,
        s"$pri p$pct: sketch $e vs exact $x beyond one bin width")
    }
  }

  // ---- q255 count-min -------------------------------------------------

  test("q255: the count-min estimate NEVER undercounts — one-sided " +
    "error over the whole vocabulary, and sketches merge by addition") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val tc = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val hs = tc.crossJoin(Seq(0, 1, 2, 3).toDF("i"))
      .withColumn("b",
        conv(md5(concat(col("i").cast("string"), lit(":"), col("w")))
          .substr(lit(1), lit(2)), 16, 10).cast("long"))
    val sk = hs.groupBy("i", "b").agg(sum("c").as("sc"))
    val viol = hs.join(sk, Seq("i", "b"))
      .groupBy("w", "c").agg(min("sc").as("est"))
      .filter(col("est") < col("c")).count()
    assert(viol == 0, "count-min must never undercount any token")
    // merge = vector add: split the corpus by doc parity
    val tc2 = spark.read.parquet(s"$sf/documents.parquet")
      .select((col("doc_id") % 2).as("wv"),
        explode(split(col("text"), " ")).as("w"))
      .groupBy("wv", "w").agg(count(lit(1)).as("c"))
    val hs2 = tc2.crossJoin(Seq(0, 1, 2, 3).toDF("i"))
      .withColumn("b",
        conv(md5(concat(col("i").cast("string"), lit(":"), col("w")))
          .substr(lit(1), lit(2)), 16, 10).cast("long"))
    val merged = hs2.groupBy("i", "b").agg(sum("c").as("sc"))
    assert(sk.exceptAll(merged).count() == 0 &&
      merged.exceptAll(sk).count() == 0,
      "per-wave sketches must vector-add to the direct sketch")
  }

  // ---- q256 bloom join ------------------------------------------------

  test("q256: the bloom prefilter has NO false negatives (every " +
    "matching probe row passes) and prunes most non-matching rows") {
    import spark.implicits._
    val build = (0L until 50L).map(i => i * 17L).toDF("k")
    val probe = (0L until 5000L).toDF("k")
    val bits = ops.BloomJoin.buildBits(build, "k", m = 4096, k = 3)
    val kept = ops.BloomJoin.prefilter(probe, "k", bits, m = 4096,
      k = 3).as[Long].collect().toSet
    val truth = build.as[Long].collect().toSet
      .filter(_ < 5000L)
    assert(truth.subsetOf(kept),
      "a Bloom filter must never drop a true match")
    assert(kept.size < 500,
      s"prefilter must prune the bulk of 5000 probes (kept " +
        s"${kept.size})")
  }

  // ---- q257 unigram EM E-step ----------------------------------------

  test("q257: hand-computed forward-backward on a 3-word corpus — " +
    "α/γ/Z and all E-step numerators land exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("estep-spec-")
      .toString
    // vocabulary {ab, abx, abc}: bigram 'ab' has support 3 (in the
    // inventory), every other piece is support-1 (out). For n=3
    // words: Z = 6³ + 3·6 = 234 ([a,b,c] and [ab,c] weighted);
    // for 'ab': Z = 36 + 3 = 39
    Seq((1L, "ab abx abc", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = queries.Extras3.unigramEStep(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      // wlen, n_words, z, num1, num2, num3, covered, nz
      (2L, 1L, 39L, 72L, 3L, 0L, 78L, 78L),
      (3L, 2L, 468L, 1332L, 36L, 0L, 1404L, 1404L)))
  }

  test("q257: on the real corpus the coverage identity holds per " +
    "length class and the bigram class is exercised") {
    import spark.implicits._
    val rows = queries.Extras3.unigramEStep(spark,
        "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._7 == r._8,
        s"wlen ${r._1}: covered ${r._7} != n·Z ${r._8} — the " +
          "forward-backward expected-coverage invariant is broken")
    }
    assert(rows.map(_._5).sum > 0, "no bigram mass — inventory vacuous")
  }

  // ---- q258 k-core ----------------------------------------------------

  test("q258: six peel rounds reach the fixpoint (≡ five rounds) and " +
    "the peel is non-vacuous on the mixed-degree graph") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val r6 = queries.Extras3.kcoreAlive(spark, sf, rounds = 6)
      .as[(Long, Long)].collect().toSet
    val r5 = queries.Extras3.kcoreAlive(spark, sf, rounds = 5)
      .as[(Long, Long)].collect().toSet
    assert(r6 == r5, "round 6 must not change the core — fixpoint")
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(r6.nonEmpty && r6.size < total,
      s"peel vacuous: core ${r6.size} of $total nodes")
    assert(r6.forall(_._2 >= 3), "a core member below k=3 survived")
    assert(r6.map(_._1) == (0L until 64L).toSet,
      s"fixpoint must be exactly the dense 64-node core: ${r6.map(_._1)}")
  }

  // ---- q259 partition evolution ---------------------------------------

  test("q259: evolving the layout never rewrites closed generations, " +
    "and a status filter partition-prunes the evolved generation") {
    import spark.implicits._
    val wh = tmpWh()
    wh.writeGeneration(Seq((1L, "F", 10L), (2L, "O", 20L))
      .toDF("k", "st", "v"), "t", gen = 0)
    val g0 = new java.io.File(s"${wh.root}/t@g0")
    val before = g0.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    wh.writeGeneration(Seq((3L, "F", 30L), (4L, "P", 40L))
      .toDF("k", "st", "v"), "t", gen = 1, partitionCols = Seq("st"))
    val after = g0.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    assert(before == after, "gen-0 files must be untouched")
    val all = wh.readGenerations(spark, "t")
    assert(all.count() == 4)
    val filtered = all.filter(col("st") === "F")
    assert(filtered.select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(st"),
      s"gen-1 scan must partition-prune on st:\n$plan")
  }

  // ---- q260 CDC replication -------------------------------------------

  test("q260: applying the change feed by MERGE reproduces the v2 " +
    "snapshot row-for-row, with both delete and update clauses firing") {
    import spark.implicits._
    val wh = tmpWh()
    val v1 = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (9L, "z", 90L)).toDF("k", "s", "v")
    // v2: k=9 deleted, k=2 updated, k=5 inserted
    val v2 = Seq((1L, "a", 10L), (2L, "b", 25L), (3L, "c", 30L),
      (5L, "e", 50L)).toDF("k", "s", "v")
    wh.overwrite(v1, "rep")
    val feed = ops.Cdc.snapshotDiff(v2, v1, "k", Seq("s", "v"))
      .filter(col("change_type") =!= "unchanged")
    val types = feed.select("change_type").as[String].collect().toSet
    assert(types == Set("delete", "update", "insert"),
      s"feed must exercise all three clauses: $types")
    val src = feed.select(col("k"),
      coalesce(col("src_s"), col("tgt_s")).as("s"),
      coalesce(col("src_v"), col("tgt_v")).as("v"),
      col("change_type"))
    wh.mergeInto(spark, "rep", src, Seq("k"),
      Map("s" -> col("s"), "v" -> col("v")),
      col("change_type") === "delete")
    val got = wh.read(spark, "rep").as[(Long, String, Long)]
      .collect().toSet
    val want = v2.as[(Long, String, Long)].collect().toSet
    assert(got == want, s"replica $got != v2 $want")
  }

  // ---- q261 bounded-radius BFS ------------------------------------------

  test("q261: hop-1 ball is exactly the source's neighbor set, hops " +
    "are bounded by the unroll, and the frontier grows monotonically") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val r6 = queries.Extras3.bfsHops(spark, sf, rounds = 6)
      .as[(Long, Long)].collect().toMap
    assert(r6(0L) == 0L, "source must sit at hop 0")
    assert(r6.values.forall(h => h >= 0 && h <= 6))
    // neighbors of node 0 in the core-and-periphery graph (n=500):
    // core ±1/±3/±9 mod 64, ring wrap (499,0), chords (0,2) and
    // (498,0) (i≡0 mod 3), spoke 320 (320%64=0)
    val hop1 = r6.filter(_._2 == 1L).keySet
    assert(hop1 == Set(1L, 2L, 3L, 9L, 55L, 61L, 63L, 320L, 498L, 499L),
      s"hop-1 ball wrong: $hop1")
    val r3 = queries.Extras3.bfsHops(spark, sf, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(r3.keySet.subsetOf(r6.keySet), "frontier must grow")
    assert(r3.forall { case (n, h) => r6(n) == h },
      "settled hops must never change in later rounds")
  }

  // ---- q262 rolling distinct ----------------------------------------------

  test("q262: the explode-to-window-ends plan equals a per-day direct " +
    "range recount, and every day of the corpus is present") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val got = queries.Extras3.q262.fn(spark, sf)
      .as[(java.sql.Date, Long)].collect().toMap
    val ev = sources.Tables(spark, sf, "events")
      .select(to_date(col("ts")).as("d"), col("user_id"))
    val days = ev.select("d").distinct()
      .as[java.sql.Date].collect()
    assert(got.keySet == days.toSet, "every observed day must appear")
    days.foreach { day =>
      val direct = ev.filter(col("d") >= date_sub(lit(day), 6) &&
          col("d") <= lit(day))
        .agg(countDistinct("user_id")).as[Long].head()
      assert(got(day) == direct, s"day $day: ${got(day)} != $direct")
    }
  }

  // ---- q263 co-occurrence lift ----------------------------------------------

  test("q263: pair supports never exceed either marginal, lift matches " +
    "exact integer math, and the basket cap holds corpus-wide") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val rows = queries.Extras3.q263.fn(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty, "no qualifying pair — support floor vacuous")
    val ev = sources.Tables(spark, sf, "events")
    val bi = ev.select(col("user_id"), to_date(col("ts")).as("d"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .distinct()
    val maxBasket = bi.groupBy("user_id", "d")
      .agg(count(lit(1)).as("c")).agg(max("c")).as[Long].head()
    assert(maxBasket <= 32, s"basket cap breached: $maxBasket")
    val nb = bi.select("user_id", "d").distinct().count()
    val marg = bi.groupBy("item").agg(count(lit(1)).as("na"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (a, b, nab, lift) =>
      assert(a < b, "pairs must be canonical (a < b)")
      assert(nab >= 3 && nab <= math.min(marg(a), marg(b)),
        s"support $nab outside [3, min(${marg(a)}, ${marg(b)})]")
      assert(lift == nb * nab * 1000000L / (marg(a) * marg(b)),
        s"lift mismatch for ($a,$b)")
    }
  }

  // ---- q264 Welch t-test ------------------------------------------------

  test("q264: every pair's t and df match a driver-side recomputation " +
    "from exact integer sums, and df sits in the Welch bounds") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val got = queries.Extras3.q264.fn(spark, sf)
      .as[(String, String, Long, Long, Double, Double)].collect()
    assert(got.length == 190, s"C(20,2)=190 pairs, got ${got.length}")
    val stats = sources.Tables(spark, sf, "documents")
      .groupBy("source").agg(count(lit(1)).as("n"),
        sum("n_chars").as("s"),
        sum(col("n_chars") * col("n_chars")).as("q"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (src, n, s, q) =>
        val m = s.toDouble / n.toDouble
        val v = (q.toDouble - s.toDouble * s.toDouble / n.toDouble) /
          (n - 1).toDouble
        src -> ((n, m, v))
      }.toMap
    def r(x: Double, dp: Int): Double = {
      val f = math.pow(10, dp.toDouble)
      math.round(x * f) / f
    }
    got.foreach { case (a, b, na, nb, tS, df) =>
      assert(a < b, "pairs must be canonical")
      val ((n1, m1, v1), (n2, m2, v2)) = (stats(a), stats(b))
      assert(na == n1 && nb == n2)
      val se1 = v1 / n1; val se2 = v2 / n2
      val t = (m1 - m2) / math.sqrt(se1 + se2)
      val d = (se1 + se2) * (se1 + se2) /
        (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))
      assert(math.abs(tS - r(t, 6)) < 2e-6, s"($a,$b): $tS vs $t")
      assert(math.abs(df - r(d, 4)) < 2e-4, s"($a,$b): $df vs $d")
      assert(d > math.min(n1, n2) - 1 - 1e-9 && d <= n1 + n2 - 2 + 1e-9,
        s"df $d outside Welch bounds for ($a,$b)")
    }
  }

  // ---- q265 chi-square ------------------------------------------------

  test("q265: marginals are consistent (expected sums to row totals) " +
    "and contributions match a driver-side recomputation") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val got = queries.Extras3.q265.fn(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.nonEmpty && got.forall(_._5 >= 0.0))
    val o = got.map(g => (g._1, g._2) -> g._3).toMap
    val rowT = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val colT = got.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val n = got.map(_._3).sum
    assert(rowT.values.forall(_ == 25L),
      "each sf0.001 source holds exactly 25 docs")
    got.foreach { case (src, band, obs, e, contrib) =>
      val eC = rowT(src).toDouble * colT(band).toDouble / n.toDouble
      assert(math.abs(e - eC) < 2e-6, s"($src,$band): $e vs $eC")
      val c = (obs.toDouble - eC) * (obs.toDouble - eC) / eC
      assert(math.abs(contrib - c) < 2e-6, s"($src,$band): $contrib vs $c")
    }
    // expected-count marginal identity: sum over OBSERVED cells per
    // row stays below the row total only by the weight of absent cells
    rowT.keys.foreach { src =>
      val eSum = got.filter(_._1 == src).map(_._4).sum
      assert(eSum <= rowT(src) + 1e-6)
    }
    assert(o.values.sum == 500L, "cells must partition the corpus")
  }

  // ---- q266 unigram EM round ------------------------------------------

  test("q266: the coverage identity survives re-parameterization, the " +
    "learned weights move off the prior, and Z mass actually shifts") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val e2 = queries.Extras3.q266.fn(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(e2.nonEmpty)
    e2.foreach { r =>
      assert(r._7 == r._8,
        s"coverage identity broken at wlen ${r._1}: ${r._7} != ${r._8}")
    }
    val (w1, w2, w3) = (e2.head._9, e2.head._10, e2.head._11)
    assert(w1 >= 1 && w2 >= 1 && w3 >= 1 && w1 + w2 + w3 <= 13,
      s"quantized weights outside the BIGINT budget: ($w1,$w2,$w3)")
    assert((w1, w2, w3) != ((6L, 3L, 2L)),
      "M-step must move the weights off the prior on this corpus")
    val e1 = queries.Extras3.unigramEStep(spark, sf)
      .select("wlen", "z_sum").as[(Long, Long)].collect().toMap
    assert(e2.exists(r => e1(r._1) != r._3),
      "re-parameterization must shift Z for at least one length class")
  }

  // ---- q267 AMS F2 sketch ------------------------------------------------

  test("q267: the sketch is LINEAR — split sketches add to the whole, " +
    "deletion subtracts cleanly — and mean(z²) sits in the 3σ bound") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val ev = sources.Tables(spark, sf, "events").select("user_id")
    def sketch(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      queries.Extras3.amsSketch(spark, df)
        .as[(Long, Long)].collect().toMap
    val whole = sketch(ev)
    val partA = sketch(ev.filter(col("user_id") % 2 === 0))
    val partB = sketch(ev.filter(col("user_id") % 2 =!= 0))
    (0L until 64L).foreach { j =>
      assert(whole(j) == partA.getOrElse(j, 0L) + partB.getOrElse(j, 0L),
        s"linearity broken at estimator $j")
      // deletion: removing B's rows is subtracting B's sketch
      assert(whole(j) - partB.getOrElse(j, 0L) == partA.getOrElse(j, 0L))
    }
    val rows = queries.Extras3.q267.fn(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 64)
    val f2 = rows.head._4
    val mean = rows.map(_._3).sum.toDouble / rows.length
    assert(math.abs(mean - f2) <= 3.0 * math.sqrt(2.0 / 64) * f2,
      s"mean z² $mean outside the AMS 3σ band around $f2")
    rows.foreach { r => assert(r._3 == r._2 * r._2) }
  }

  // ---- q268 multi-table transaction --------------------------------------

  test("transact: both tables swap together; a crash BEFORE the " +
    "journal leaves both untouched") {
    import spark.implicits._
    val wh = tmpWh()
    wh.transact(Seq(
      "a" -> Seq((1L, 10L)).toDF("k", "v"),
      "b" -> Seq((1L, 100L)).toDF("k", "v")))
    assert(wh.read(spark, "a").count() == 1)
    assert(wh.read(spark, "b").count() == 1)
    // simulate the crash-before-journal point: staged dirs exist,
    // journal absent — tables must still read v1
    Seq((2L, 20L)).toDF("k", "v").write.mode("overwrite")
      .parquet(s"${wh.root}/a__txn_staged")
    Seq((2L, 200L)).toDF("k", "v").write.mode("overwrite")
      .parquet(s"${wh.root}/b__txn_staged")
    assert(wh.read(spark, "a").as[(Long, Long)].head() == ((1L, 10L)))
    assert(wh.read(spark, "b").as[(Long, Long)].head() == ((1L, 100L)))
  }

  test("transact: a TORN commit (journal written, only the first " +
    "table's swap executed) rolls FORWARD — never a mixed snapshot") {
    import spark.implicits._
    val wh = tmpWh()
    wh.transact(Seq(
      "a" -> Seq((1L, 10L)).toDF("k", "v"),
      "b" -> Seq((1L, 100L)).toDF("k", "v")))
    // stage v2 for both, write the journal by hand, then complete
    // ONLY table a's swap — the crash point mid-execution
    Seq((2L, 20L)).toDF("k", "v").write.mode("overwrite")
      .parquet(s"${wh.root}/a__txn_staged")
    Seq((2L, 200L)).toDF("k", "v").write.mode("overwrite")
      .parquet(s"${wh.root}/b__txn_staged")
    def f(p: String) = new java.io.File(s"${wh.root}/$p")
    java.nio.file.Files.write(f("__txn_journal.txt").toPath,
      Seq("SWAP " + f("a__txn_staged") + " " + f("a") + " " +
          f("a__txn_trash"),
        "SWAP " + f("b__txn_staged") + " " + f("b") + " " +
          f("b__txn_trash"))
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    assert(f("a").renameTo(f("a__txn_trash")))
    assert(f("a__txn_staged").renameTo(f("a")))
    // crash here; recovery (run by the next writer) must land b too
    wh.recoverTransact()
    assert(wh.read(spark, "a").as[(Long, Long)].head() == ((2L, 20L)))
    assert(wh.read(spark, "b").as[(Long, Long)].head() == ((2L, 200L)))
    assert(!f("a__txn_trash").exists() && !f("b__txn_trash").exists())
    assert(!f("__txn_journal.txt").exists())
  }

  // ---- q269 GDPR erasure ---------------------------------------------

  test("q269: erased users are absent from BOTH tables, everyone " +
    "else is intact") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    queries.Extras3.q269.fn(spark, sf).collect() // builds the store
    val wh = Warehouse(SessionScratch.dir(spark,
      s"gdprstore_${SessionScratch.keyOf(sf)}"))
    val key = SessionScratch.keyOf(sf)
    Seq(s"gdpr_act_$key", s"gdpr_val_$key").foreach { tbl =>
      val users = wh.read(spark, tbl).select("user_id")
        .distinct().as[Long].collect()
      assert(users.forall(_ % 37 != 0), s"$tbl still knows erased users")
    }
    val expected = sources.Tables(spark, sf, "events")
      .filter(col("user_id") % 37 =!= 0)
      .select("user_id").distinct().count()
    assert(wh.read(spark, s"gdpr_act_$key").select("user_id")
      .distinct().count() == expected, "a kept user was lost")
  }

  // ---- q270 Mann-Whitney --------------------------------------------

  test("q270: U statistics match a driver-side midrank recomputation " +
    "and satisfy U_A + U_B = nA*nB") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val (na, nb, u2a, u2b) = queries.Extras3.q270.fn(spark, sf)
      .as[(Long, Long, Long, Long)].head()
    assert(u2a + u2b == 2 * na * nb, "rank-sum identity broken")
    val rows = sources.Tables(spark, sf, "documents")
      .select(col("n_chars"),
        (substring(col("source"), 4, 2).cast("long") < 10).as("a"))
      .as[(Long, Boolean)].collect()
    val sorted = rows.map(_._1).sorted
    def rank2(v: Long): Long = {
      val lo = sorted.count(_ < v); val eq = sorted.count(_ == v)
      2L * lo + eq + 1
    }
    val naC = rows.count(_._2).toLong
    val r2aC = rows.filter(_._2).map(r => rank2(r._1)).sum
    assert(na == naC && nb == rows.length - naC)
    assert(u2a == r2aC - naC * (naC + 1),
      s"u2_a $u2a != recomputed ${r2aC - naC * (naC + 1)}")
  }

  // ---- q271 Benford -------------------------------------------------

  test("q271: digits partition the orders, expected masses sum to one " +
    "million ppm (±rounding), and digits match a driver recount") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val got = queries.Extras3.q271.fn(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val total = sources.Tables(spark, sf, "orders").count()
    assert(got.map(_._2).sum == total, "digits must partition the table")
    val expSum = (1 to 9)
      .map(d => math.round(1e6 * math.log10(1.0 + 1.0 / d))).sum
    assert(math.abs(expSum - 1000000L) <= 5, s"ppm masses sum $expSum")
    val recount = sources.Tables(spark, sf, "orders")
      .select(round(col("o_totalprice") * 100).cast("long").as("c"))
      .as[Long].collect()
      .groupBy(c => c.toString.head.asDigit.toLong)
      .view.mapValues(_.length.toLong).toMap
    got.foreach { case (d, obs, _, _) =>
      assert(recount(d) == obs, s"digit $d: $obs vs ${recount(d)}")
    }
  }

  // ---- q272 skyline ---------------------------------------------------

  test("q272: the frontier is sound (nothing dominates a member) and " +
    "complete (every non-member is dominated by a member)") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val front = queries.Extras3.q272.fn(spark, sf)
      .as[(Long, Long)].collect().toSet
    val pts = sources.Tables(spark, sf, "documents")
      .select(col("n_chars").as("x"), (col("doc_id") % 97).as("y"))
      .groupBy("x").agg(max("y").as("y"))
      .as[(Long, Long)].collect().toSet
    def dominates(a: (Long, Long), b: (Long, Long)) =
      a._1 >= b._1 && a._2 >= b._2 && (a._1 > b._1 || a._2 > b._2)
    front.foreach { f =>
      assert(!pts.exists(p => dominates(p, f)),
        s"frontier member $f is dominated")
    }
    (pts -- front).foreach { p =>
      assert(front.exists(f => dominates(f, p)),
        s"non-member $p dominated by no frontier member")
    }
    assert(front.nonEmpty && front.size < pts.size)
  }

  // ---- q273 Wasserstein ------------------------------------------------

  test("q273: W1 matches a driver-side sorted-merge recomputation " +
    "exactly, and differing length mixes yield a positive distance") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val (na, nb, w1) = queries.Extras3.q273.fn(spark, sf)
      .as[(Long, Long, Long)].head()
    val rows = sources.Tables(spark, sf, "documents")
      .select(col("n_chars"),
        (substring(col("source"), 4, 2).cast("long") < 10).as("a"))
      .as[(Long, Boolean)].collect()
    val xs = rows.map(_._1).distinct.sorted
    var (cumA, cumB, acc) = (0L, 0L, 0L)
    xs.sliding(2).foreach { case Array(x, nx) =>
      cumA += rows.count(r => r._1 == x && r._2)
      cumB += rows.count(r => r._1 == x && !r._2)
      acc += (nx - x) * math.abs(cumA * nb - cumB * na)
    }
    assert(na == rows.count(_._2) && nb == rows.count(!_._2))
    assert(w1 == acc, s"W1 numerator $w1 != recomputed $acc")
    assert(w1 > 0, "cohorts with different length mixes must differ")
  }

  // ---- q274 rolling distinct via HLL -----------------------------------

  test("q274: window-merged registers equal registers built directly " +
    "over the window's raw rows, and every estimate sits in the error band") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val ev = sources.Tables(spark, sf, "events")
      .select(to_date(col("ts")).as("d"), col("user_id"))
    // pick the median observed day; its trailing window is full
    val days = ev.select("d").distinct().as[java.sql.Date]
      .collect().sorted
    val day = days(days.length / 2)
    val direct = ops.Approx.hllRegisters(
      ev.filter(col("d") >= date_sub(lit(day), 6) &&
        col("d") <= lit(day)).withColumn("g", lit(1)),
      Seq("g"), col("user_id"))
      .select("idx", "mx").as[(Int, Int)].collect().toMap
    val merged = ops.Approx.hllRegisters(ev, Seq("d"), col("user_id"))
      .filter(col("d") >= date_sub(lit(day), 6) && col("d") <= lit(day))
      .groupBy("idx").agg(max("mx").as("mx"))
      .as[(Int, Int)].collect().toMap
    assert(merged == direct,
      "max-merging per-day registers must equal the direct window sketch")
    val got = queries.Extras3.q274.fn(spark, sf)
      .as[(java.sql.Date, Long, Long, Long)].collect()
    assert(got.length == days.length)
    got.foreach { case (d, exact, _, estU) =>
      val est = estU / 1e6
      assert(math.abs(est - exact) <= 0.2 * exact,
        s"day $d: estimate $est implausible for $exact (3σ ≈ 20% at m=256)")
    }
  }

  // ---- q275 Wilson conversion --------------------------------------------

  test("q275: the Wilson bound matches a driver recomputation, always " +
    "sits in (0, rate], and beats the naive interval at small n") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val got = queries.Extras3.q275.fn(spark, sf)
      .as[(java.sql.Date, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (day, n, k, ppm, lo) =>
      assert(k <= n && ppm == k * 1000000L / n)
      val p = k.toDouble / n
      val z2 = 3.8416
      val w = (p + z2 / (2.0 * n) - 1.96 * math.sqrt(
        p * (1.0 - p) / n + z2 / (4.0 * n * n))) / (1.0 + z2 / n)
      assert(math.abs(lo - math.round(w * 1e6) / 1e6) < 2e-6,
        s"$day: wilson $lo vs recomputed $w")
      assert(lo >= 0.0 && lo <= p + 1e-9,
        s"$day: bound $lo outside [0, p=$p]")
      // the naive interval can go NEGATIVE at these n; Wilson cannot
      val naive = p - 1.96 * math.sqrt(p * (1.0 - p) / n)
      assert(lo >= naive - 1e-9)
    }
  }

  // ---- q246 Kneser-Ney ----------------------------------------------

  test("q246: hand-computed interpolated KN on a 3-doc corpus — seen " +
    "pair, λ·P_cont backoff, and OOV floor all land exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kn-spec-")
      .toString
    Seq(
      (0L, "a b a b a c", "en", "s", 11L), // train (id%10==0)
      (1L, "a b c", "en", "s", 5L),
      (2L, "x a", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = queries.Extras3.q246.fn(spark, dir)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // train: cb(ab)=2 cb(ba)=2 cb(ac)=1; cu(a)=3 n1f(a)=2; cu(b)=2
    // n1f(b)=1; n1b(a)=1 n1b(b)=1 n1b(c)=1; |types|=3
    def u(x: Double) = math.round(math.log(x) * 1e6)
    val ab = u((2.0 - 0.75) / 3 + 0.75 * 2.0 / 3 * 1.0 / 3)
    val lamB = u(0.75 * 1.0 / 2)
    val contC = u(1.0 / 3)
    val contA = u(1.0 / 3)
    assert(got.toSeq == Seq(
      (1L, 2L, ab + (lamB + contC)), // "a b"=seen, "b c"=λ(b)·Pc(c)
      (2L, 1L, contA))) // "x a": OOV w1 → Pc(a) alone
  }
}
