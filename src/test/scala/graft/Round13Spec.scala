package graft

import org.apache.spark.sql.functions._
import graft.sources.Warehouse
import graft.multimodal.Multimodal

/** Round-13 hardening pins — one test per closed ADVICE item, each
  * against the exact hostile input the advisory described:
  * three-valued-logic MERGE deletes, non-numeric Bloom keys, hostile
  * EXIF IFD offsets, NULL extents hidden inside two-level manifest
  * groups, and torn/malformed transaction journals.
  */
class Round13Spec extends SparkSpec {

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private def tmpWh(): Warehouse = Warehouse(
    java.nio.file.Files.createTempDirectory("r13-wh-").toString)

  // ---- mergeInto: NULL delete predicate ------------------------------

  test("mergeInto: a NULL WHEN-MATCHED-AND-delete predicate reads as " +
    "NOT satisfied — the matched row is updated, never silently dropped") {
    import spark.implicits._
    val wh = tmpWh()
    wh.overwrite(Seq((1L, "A", 10L), (2L, "B", 20L)).toDF("k", "st", "v"), "t")
    val src = Seq((1L, "x", 11L), (2L, "x", 22L)).toDF("k", "st", "v")
    // when(k === 1, true) is NULL for k=2 (no otherwise): under
    // three-valued logic an unguarded !(matched && NULL) filter drops
    // the k=2 row; Delta/Spark MERGE keeps and updates it
    wh.mergeInto(spark, "t", src, Seq("k"),
      Map("st" -> lit("U")), when(col("k") === 1L, lit(true)))
    val out = wh.read(spark, "t").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq((2L, "U", 20L)),
      "k=1 deleted (predicate true); k=2 updated (predicate NULL = false)")
  }

  // ---- BloomJoin: non-numeric keys ------------------------------------

  test("BloomJoin: STRING keys hash per-value — no false negatives and " +
    "real pruning (a cast-to-long bug would collapse all strings onto " +
    "one NULL position set and pass everything)") {
    import spark.implicits._
    val build = (0 until 50).map(i => s"key-${i * 17}").toDF("k")
    val probe = (0 until 5000).map(i => s"key-$i").toDF("k")
    val bits = ops.BloomJoin.buildBits(build, "k", m = 4096, k = 3)
    val kept = ops.BloomJoin.prefilter(probe, "k", bits, m = 4096, k = 3)
      .as[String].collect().toSet
    val truth = build.as[String].collect().toSet
      .filter(_.drop(4).toInt < 5000)
    assert(truth.subsetOf(kept),
      "a Bloom filter must never drop a true match")
    assert(kept.size < 500,
      s"string-keyed prefilter must prune the bulk of 5000 probes " +
        s"(kept ${kept.size})")
  }

  // ---- jpegExif: hostile IFD offsets ----------------------------------

  // exifII from Round12bSpec, reproduced: valid II Exif with the
  // 32-bit IFD offset at bytes 14..17 (t0 = 10)
  private val exifII = hexBytes(
    "FFD8" + "FFE1" + "003A" + "457869660000" +
      "4949" + "2A00" + "08000000" + "0300" +
      "0001" + "0400" + "01000000" + "80020000" +
      "0101" + "0400" + "01000000" + "E0010000" +
      "1201" + "0300" + "01000000" + "06000000" +
      "00000000" + "FFD9")

  test("jpegExif: an IFD offset >= 2^31 (negative after toInt) is " +
    "refused as None, not an executor ArrayIndexOutOfBounds") {
    val hostile = exifII.clone()
    // LE 0x80000000 at the offset field
    hostile(14) = 0x00; hostile(15) = 0x00
    hostile(16) = 0x00; hostile(17) = 0x80.toByte
    assert(Multimodal.jpegExif(hostile).isEmpty)
  }

  test("jpegExif: an IFD offset pointing BEFORE the TIFF header " +
    "(< 8) is refused as None") {
    val hostile = exifII.clone()
    hostile(14) = 0x00 // offset 0: inside the TIFF byte-order mark
    assert(Multimodal.jpegExif(hostile).isEmpty)
  }

  // ---- two-level manifest: NULL extents inside a group ----------------

  test("prunedFilesTwoLevel: a NULL-extent file grouped with non-NULL " +
    "files survives a range that misses the group's non-NULL extent") {
    import spark.implicits._
    val wh = tmpWh()
    // three single-partition appends = three data files with known
    // per-file extents: A all-NULL c, B c in [0,9], C c in [100,109]
    wh.append(Seq.fill(5)(Option.empty[Long]).toDF("c")
      .repartition(1), "t")
    wh.append((0L to 9L).map(Option(_)).toDF("c").repartition(1), "t")
    wh.append((100L to 109L).map(Option(_)).toDF("c").repartition(1), "t")
    wh.writeManifest(spark, "t", Seq("c"))
    // groupSize 2: NULLS FIRST ordering puts A+B in group 0 (non-NULL
    // extent [0,9]), C alone in group 1
    wh.writeTwoLevelManifest(spark, "t", "c", groupSize = 2)
    val (kept, gTotal, gKept, consulted) =
      wh.prunedFilesTwoLevel(spark, "t", "c", 100L, 109L)
    assert(gTotal == 2)
    // group 0's [0,9] extent misses [100,109] but it hides file A
    // (NULL extents) — the has_null_extent flag must keep the group,
    // then file-grain pruning keeps A and drops B
    assert(gKept == 2, "the NULL-hiding group must be kept")
    assert(kept.size == 2, s"expected A (NULL extents) + C, got $kept")
    // flat consult agrees: same conservative NULL handling
    val (flat, _) = wh.prunedFiles(spark, "t", "c", 100L, 109L)
    assert(kept.toSet == flat.toSet,
      "two-level and flat consults must keep the same files")
  }

  // ---- group-level-first consults (r13 tasks 5/6) ----------------------

  test("prunedFilesAll consults group-level first when the two-level " +
    "manifest exists, keeping exactly the flat manifest's files") {
    import spark.implicits._
    val wh = tmpWh()
    val df = (0L until 4000L).map(i => (i, i % 97)).toDF("k", "v")
    wh.overwrite(df.repartitionByRange(16, col("k"))
      .sortWithinPartitions("k"), "t")
    wh.writeManifest(spark, "t", Seq("k"))
    wh.writeTwoLevelManifest(spark, "t", "k", groupSize = 4)
    val (kept, total) = wh.prunedFiles(spark, "t", "k", 100L, 350L)
    assert(total == 16)
    // flat expectation computed directly from the file manifest
    val expected = spark.read.parquet(wh.root + "/t__manifest")
      .filter(col("min_k") <= 350L && col("max_k") >= 100L)
      .select("file").as[String].collect().toSet
    assert(kept.toSet == expected,
      "group-level-first consult must keep the flat consult's files")
    // and the consult's driver pull is bounded by surviving groups
    val (_, gTot, gKept, pulled) =
      wh.prunedFilesTwoLevel(spark, "t", "k", 100L, 350L)
    assert(gKept < gTot && pulled <= gKept * 4,
      s"file rows pulled ($pulled) must be <= surviving groups x size")
    assert(wh.readPruned(spark, "t", "k", 100L, 350L).count() == 251L)
  }

  test("two-level Bloom sidecar: group-level consult keeps the same " +
    "files as the flat consult, pulls only surviving groups' rows, " +
    "and readPointLookup matches the plain filter") {
    import spark.implicits._
    val wh = tmpWh()
    // 16 files clustered by v (NOT k): range extents on k are useless,
    // the Bloom sidecar is the only skip structure for k-equality
    val df = (0L until 4000L).map(i => (i, i % 16)).toDF("k", "v")
    wh.overwrite(df.repartition(16, col("v")), "t")
    wh.writeBloomManifest(spark, "t", "k")
    wh.writeTwoLevelBloomManifest(spark, "t", "k", groupSize = 4)
    val key = 1234L
    val (flat, nFiles) = wh.bloomPrunedFiles(spark, "t", "k", key)
    val (kept, gTot, gKept, pulled) =
      wh.bloomPrunedFilesTwoLevel(spark, "t", "k", key)
    // hash-partitioning by v leaves some of the 16 partitions empty
    // or zero-row (collisions), so don't pin 16: the sidecar has one
    // row per file that holds rows
    assert(nFiles >= 8 && gTot == (nFiles + 3) / 4)
    assert(kept.toSet == flat.toSet,
      "two levels must admit exactly the flat consult's files")
    assert(pulled <= gKept * 4,
      s"file rows pulled ($pulled) must be bounded by surviving groups")
    val got = wh.readPointLookup(spark, "t", "k", key)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1234L, 1234L % 16)))
    // absent key: proof of absence at whichever level prunes first
    assert(wh.readPointLookup(spark, "t", "k", 999999L).count() == 0L)
  }

  // ---- transaction journal: torn/malformed lines ----------------------

  test("recoverTransact: malformed journal lines are skipped, " +
    "well-formed swaps still roll forward, and the journal clears") {
    import spark.implicits._
    val wh = tmpWh()
    val root = wh.root
    // a staged table waiting to land, as transact would leave it
    Seq((1L, "a")).toDF("k", "v").write.mode("overwrite")
      .parquet(s"$root/t__txn_staged")
    val journal = new java.io.File(s"$root/__txn_journal.txt")
    // torn trailing line (missing fields) + junk + one valid SWAP:
    // recovery must not MatchError; the valid swap must complete
    java.nio.file.Files.write(journal.toPath,
      (s"SWAP $root/t__txn_staged $root/t $root/t__txn_trash\n" +
        "SWAP /only/two\n" + "GARBAGE\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    wh.recoverTransact()
    assert(!journal.exists(), "journal must clear after recovery")
    assert(wh.read(spark, "t").count() == 1L, "the valid swap landed")
    assert(!new java.io.File(s"$root/t__txn_staged").exists())
  }

  test("transact: journal writes land atomically — no .tmp residue, " +
    "and both tables carry the new snapshot") {
    import spark.implicits._
    val wh = tmpWh()
    wh.overwrite(Seq((1L, 1L)).toDF("k", "v"), "a")
    wh.overwrite(Seq((1L, 1L)).toDF("k", "v"), "b")
    wh.transact(Seq(
      "a" -> Seq((1L, 2L)).toDF("k", "v"),
      "b" -> Seq((1L, 2L)).toDF("k", "v")))
    assert(wh.read(spark, "a").select("v").head().getLong(0) == 2L)
    assert(wh.read(spark, "b").select("v").head().getLong(0) == 2L)
    val leftovers = Option(new java.io.File(wh.root).listFiles())
      .getOrElse(Array()).filter(_.getName.endsWith(".tmp"))
    assert(leftovers.isEmpty,
      s"atomic journal write must not leave temp files: ${leftovers.toSeq}")
  }
}
