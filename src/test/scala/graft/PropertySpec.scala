package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Approx, Cdc, Scd}

/** Property-based invariants (SURVEY §5.4) over ScalaCheck-generated
  * frames: SCD1 idempotence, SCD2 structural invariants, CDC
  * fixed-point. Sampled explicitly (seeded) to keep Spark-job count
  * bounded and runs reproducible.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowGen: Gen[(Long, Option[String], Option[Double])] = for {
    k <- Gen.choose(0L, 9L)
    s <- Gen.option(Gen.oneOf("a", "b", "c"))
    v <- Gen.option(Gen.choose(0, 99).map(_.toDouble))
  } yield (k, s, v)

  private val tableGen = Gen.listOfN(12, rowGen)

  private def sample(seed: Long) = {
    val params = Gen.Parameters.default
    val t = tableGen.pureApply(params, Seed(seed))
      .distinctBy(_._1) // unique business keys
    t.map { case (k, s, v) => (k, s.orNull, v.map(Double.box).orNull) }
      .toDF("k", "s", "v")
  }

  test("property: scd1Merge idempotent and key-complete over random " +
    "frames with nulls") {
    (1L to 8L).foreach { seed =>
      val src = sample(seed)
      val tgt = sample(seed + 100)
      val once = Scd.scd1Merge(src, tgt, Seq("k"), Seq("s", "v")).persist()
      val twice = Scd.scd1Merge(src, once, Seq("k"), Seq("s", "v"))
      assert(rows(once) == rows(twice), s"idempotence failed seed=$seed")
      val expectKeys = (src.select("k").as[Long].collect().toSet
        ++ tgt.select("k").as[Long].collect().toSet)
      assert(once.select("k").as[Long].collect().toSet == expectKeys,
        s"key completeness failed seed=$seed")
      once.unpersist(); ()
    }
  }

  test("property: scd2Merge keeps exactly one current row per live " +
    "key, exp>=eff, and is a fixed-point on re-run") {
    val asOf = lit(java.sql.Date.valueOf("2024-01-01"))
    (1L to 6L).foreach { seed =>
      val src = sample(seed)
      val hist = sample(seed + 50)
        .withColumn("current_flag", lit(1L))
        .withColumn("eff_dt", lit(java.sql.Date.valueOf("2020-01-01")))
        .withColumn("exp_dt", lit(null).cast("date"))
      val out = Scd.scd2Merge(src, hist, Seq("k"), Seq("s", "v"), asOf)
        .persist()
      val maxCur = out.filter($"current_flag" === 1)
        .groupBy("k").count().agg(max("count")).head().getLong(0)
      assert(maxCur == 1L, s"multiple current rows seed=$seed")
      assert(out.filter($"exp_dt".isNotNull && $"exp_dt" < $"eff_dt")
        .count() == 0, s"exp<eff seed=$seed")
      val again = Scd.scd2Merge(src, out, Seq("k"), Seq("s", "v"), asOf)
      assert(rows(again) == rows(out), s"not a fixed-point seed=$seed")
      out.unpersist(); ()
    }
  }

  test("property: CDC delta of (existing ∪ delta) is empty") {
    (1L to 8L).foreach { seed =>
      val src = sample(seed)
      val existing = sample(seed + 7)
      val delta = Cdc.newRows(src, existing, Seq("k"))
      val after = existing.select("k").unionByName(delta.select("k"))
      assert(Cdc.newRows(src, after, Seq("k")).count() == 0,
        s"re-run appended rows seed=$seed")
    }
  }

  test("property: heavyHitters equals the naive GROUP BY/HAVING for " +
    "random corpora and supports (non-null groups)") {
    // skewed vocabulary: a few hot words, a long tail
    val wordGen: Gen[String] = Gen.frequency(
      6 -> Gen.oneOf("hot1", "hot2", "hot3"),
      4 -> Gen.choose(0, 399).map(i => s"tail$i"))
    val corpusGen = Gen.listOfN(600, wordGen)
    val supportGen = Gen.oneOf(0.01, 0.03, 0.07, 0.1, 0.2)
    (1L to 6L).foreach { seed =>
      val params = Gen.Parameters.default
      val words = corpusGen.pureApply(params, Seed(seed))
      val support = supportGen.pureApply(params, Seed(seed + 1000))
      val df = words.toDF("w")
      val hh = Approx.heavyHitters(df, "w", support)
      val exact = df.groupBy("w").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" > words.size * support)
      assert(rows(hh) == rows(exact),
        s"mismatch seed=$seed support=$support")
    }
  }

  test("property: native as-of join ≡ composed as-of join over random " +
    "non-null keyed event tables") {
    // non-null domain: the two forms deliberately differ on null keys
    // (native follows SQL equality — never matches; the composed
    // window groups nulls together), so the shared contract is the
    // non-null one. Duplicate (key, ts) rows ARE generated — with the
    // payload a pure function of (key, ts), so the tie-winner is
    // value-identical whichever physical row either form picks.
    val evGen: Gen[(Long, Int)] = for {
      k <- Gen.choose(0L, 4L)
      t <- Gen.choose(0, 50)
    } yield (k, t)
    def frame(n: Int, seed: Long) = {
      val params = Gen.Parameters.default
      Gen.listOfN(n, evGen).pureApply(params, Seed(seed))
        .map { case (k, t) => (k, t, k * 100000L + t) }
        .toDF("user_id", "t", "event_id")
        .select($"user_id",
          timestamp_seconds($"t" * 60).as("ts"), $"event_id")
    }
    for (seed <- 1L to 5L) {
      val l = frame(30, seed)
      val r = frame(25, seed + 500)
      // the two forms attach (asof_ts, asof_event_id) in opposite
      // order — align columns before the value compare
      val cols = Seq("user_id", "ts", "event_id", "asof_event_id",
        "asof_ts")
      // sorted MULTISET compare (not rows()'s Set): duplicate left
      // rows emit duplicate outputs, so a dropped or double-emitted
      // row in the custom merge iterator must fail this
      def multiset(df: org.apache.spark.sql.DataFrame) =
        df.select(cols.map(col): _*).collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      val native = plans.AsOfJoin
        .join(l, r, Seq("user_id"), "ts", "ts", Seq("event_id"))
      val composed = ops.AsOf
        .join(l, r, Seq("user_id"), "ts", "ts", Seq("event_id"))
      assert(multiset(native) == multiset(composed),
        s"mismatch seed=$seed")
    }
  }


  // ---- inflate round-trip (r13): property over generated byte arrays

  private val bytesGen: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 8192)
    mode <- Gen.choose(0, 2)
    seed <- Gen.choose(0, 1 << 20)
  } yield mode match {
    case 0 => Array.tabulate(n)(i => ((i * 131 + seed) % 256).toByte)
    case 1 => // runs: long LZ77 matches
      Array.tabulate(n)(i => (((i / 97) * 7 + seed) % 256).toByte)
    case _ => // tiny alphabet: skewed Huffman tables
      Array.tabulate(n)(i => ((i * i + seed) % 4 + 65).toByte)
  }

  test("property: inflate(jdkDeflate(data)) == data for generated " +
    "inputs across modes and levels — the from-scratch decoder " +
    "agrees with the reference encoder on arbitrary content") {
    val params = Gen.Parameters.default
    for (seed <- 1L to 30L; level <- Seq(1, 6, 9)) {
      val data = bytesGen.pureApply(params, Seed(seed * 31 + level))
      val d = new java.util.zip.Deflater(level, false)
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      val got = graft.multimodal.Multimodal.inflate(
        out.toByteArray, data.length.max(1))
      assert(got.isDefined && java.util.Arrays.equals(got.get, data),
        s"seed $seed level $level n=${data.length}")
    }
  }
}
