package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.StreamingEtl

/** Streaming surface: file-arrival SCD1 merge via foreachBatch, and the
  * watermarked window aggregation, driven synchronously with
  * AvailableNow + awaitTermination.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("scd1Sink merges arriving files into the parquet target") {
    val base = Files.createTempDirectory("graft-stream").toFile
    val srcDir = new java.io.File(base, "src"); srcDir.mkdirs()
    val tgtDir = new java.io.File(base, "tgt").getPath
    val ckDir = new java.io.File(base, "ck").getPath

    // batch 1: initial load
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
      .write.mode("append").parquet(srcDir.getPath)
    val schema = spark.read.parquet(srcDir.getPath).schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .parquet(srcDir.getPath)
      val q = StreamingEtl.scd1Sink(stream, tgtDir, Seq("k"),
        Seq("s", "v"), ckDir)
      q.awaitTermination()
    }
    run()
    assert(rows(spark.read.parquet(tgtDir)) ==
      Set(Seq(1L, "a", 10.0), Seq(2L, "b", 20.0)))

    // batch 2: an update + an insert arrive as a new file
    Seq((1L, "a2", 10.0), (3L, "c", 30.0)).toDF("k", "s", "v")
      .write.mode("append").parquet(srcDir.getPath)
    run()
    assert(rows(spark.read.parquet(tgtDir)) ==
      Set(Seq(1L, "a2", 10.0), Seq(2L, "b", 20.0), Seq(3L, "c", 30.0)))
  }

  test("jsonl directory ingest: arriving .jsonl files are discovered " +
    "incrementally under an explicit schema and deduped across " +
    "micro-batches") {
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft-stream-jsonl").toFile
    val srcDir = new java.io.File(base, "in"); srcDir.mkdirs()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))
    def drop(name: String, lines: String*): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(srcDir, name))
      lines.foreach(w.println); w.close()
    }
    // the corpus-format ingest path: line-delimited JSON, schema
    // declared (no inference pass), md5 fingerprint dedup with a
    // watermark bounding state — StreamingEtl.dedupStream unchanged,
    // only the source differs from the MemoryStream tests
    drop("a.jsonl",
      """{"doc_id": 1, "text": "alpha", "ts": "2024-01-01T10:00:00"}""",
      """{"doc_id": 2, "text": "beta",  "ts": "2024-01-01T10:01:00"}""")
    val stream = spark.readStream.schema(schema).json(srcDir.getPath)
      .withColumn("fp", md5(col("text")))
    val q = StreamingEtl.dedupStream(stream, "fp", "ts", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("jsonl_docs").start()
    q.processAllAvailable()
    assert(spark.table("jsonl_docs").select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L))
    // second file: one duplicate text (same fp), one new doc —
    // discovered without restarting the query
    drop("b.jsonl",
      """{"doc_id": 3, "text": "alpha", "ts": "2024-01-01T10:02:00"}""",
      """{"doc_id": 4, "text": "gamma", "ts": "2024-01-01T10:03:00"}""")
    q.processAllAvailable()
    q.stop()
    assert(spark.table("jsonl_docs").select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L, 4L),
      "duplicate fingerprint from the second file must be dropped")
  }

  test("runningUserTotals: mapGroupsWithState accumulates across " +
    "micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingEtl.{Ev, UserTotal}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingEtl.runningUserTotals(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("totals").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(Ev(1L, ts("2024-01-01 10:00:00"), 1.0),
      Ev(1L, ts("2024-01-01 10:01:00"), 2.0),
      Ev(2L, ts("2024-01-01 10:02:00"), 5.0))
    q.processAllAvailable()
    input.addData(Ev(1L, ts("2024-01-01 10:03:00"), 4.0))
    q.processAllAvailable()
    // latest state per user: u1 has 3 events summing 7, u2 one event
    val latest = spark.table("totals").as[UserTotal].collect()
      .groupBy(_.user_id).map { case (u, ts) => u -> ts.maxBy(_.n_events) }
    assert(latest(1L) == UserTotal(1L, 3L, 7.0))
    assert(latest(2L) == UserTotal(2L, 1L, 5.0))
    q.stop()
  }

  test("runningUserTotalsTws: transformWithState ValueState accumulates " +
    "across micro-batches (RocksDB store)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingEtl.{Ev, UserTotal}
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Ev]
      val q = StreamingEtl.runningUserTotalsTws(input.toDS())
        .writeStream.outputMode("update")
        .format("memory").queryName("totals_tws").start()
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(Ev(1L, ts("2024-01-01 10:00:00"), 1.0),
        Ev(1L, ts("2024-01-01 10:01:00"), 2.0),
        Ev(2L, ts("2024-01-01 10:02:00"), 5.0))
      q.processAllAvailable()
      input.addData(Ev(1L, ts("2024-01-01 10:03:00"), 4.0))
      q.processAllAvailable()
      val latest = spark.table("totals_tws").as[UserTotal].collect()
        .groupBy(_.user_id)
        .map { case (u, ts) => u -> ts.maxBy(_.n_events) }
      assert(latest(1L) == UserTotal(1L, 3L, 7.0))
      assert(latest(2L) == UserTotal(2L, 1L, 5.0))
      q.stop()
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streamingHeavyHitters: MapState Misra-Gries keeps hot tokens, " +
    "bounded counters, across micro-batches (RocksDB store)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingEtl.{TokCount, TokEvent}
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[TokEvent]
      val q = StreamingEtl.streamingHeavyHitters(input.toDS(), 3)
        .writeStream.outputMode("update")
        .format("memory").queryName("hh_stream").start()
      // batch 1 fills the 3 counters: hot=5, a=1, b=1
      input.addData(Seq.fill(5)(TokEvent(0L, "hot")) ++
        Seq(TokEvent(0L, "a"), TokEvent(0L, "b")): _*)
      q.processAllAvailable()
      // batch 2: 'c' hits a full sketch → decrement-all evicts a and b;
      // three more 'hot' leave it at 7 regardless of in-batch order
      input.addData(TokEvent(0L, "c"), TokEvent(0L, "hot"),
        TokEvent(0L, "hot"), TokEvent(0L, "hot"))
      q.processAllAvailable()
      val byTok = spark.table("hh_stream").as[TokCount].collect()
        .groupBy(_.w).map { case (w, cs) => w -> cs.map(_.cnt).max }
      assert(byTok("hot") == 7L) // true count 8, undercount ≤ n/capacity
      assert(byTok.get("c").isEmpty) // absorbed, never inserted
      // batch-1 emissions for a/b remain in the sink but their final
      // counts were evicted: nothing beyond batch-1's value of 1
      assert(byTok.getOrElse("a", 1L) == 1L &&
        byTok.getOrElse("b", 1L) == 1L)
      q.stop()
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("sessionizeStream: events within the gap merge into one " +
    "session; a quiet user closes after the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = StreamingEtl.sessionizeStream(
      input.toDF().toDF("user_id", "ts", "value"), "30 minutes",
      "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    // user 1: three events 10 min apart = ONE session; user 2: one event
    input.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:10:00"), 2.0),
      (1L, ts("2024-01-01 10:20:00"), 3.0),
      (2L, ts("2024-01-01 10:05:00"), 5.0))
    q.processAllAvailable()
    // advance the watermark far past both sessions' ends so they emit
    input.addData((9L, ts("2024-01-01 13:00:00"), 0.0))
    q.processAllAvailable()
    val out = spark.table("sessions")
      .select("user_id", "n_events", "sum_val")
      .as[(Long, Long, Double)].collect().toSet
    assert(out.contains((1L, 3L, 6.0)),
      s"user 1's merged session missing from $out")
    assert(out.contains((2L, 1L, 5.0)))
    // one session per user — the three close events never split
    assert(spark.table("sessions").filter($"user_id" === 1L).count() == 1)
    q.stop()
  }

  test("dedupStream drops repeated fingerprints across micro-batches " +
    "within the watermark horizon") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val q = StreamingEtl.dedupStream(
      input.toDF().toDF("fp", "ts"), "fp", "ts", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup").start()
    input.addData(("a", ts("2024-01-01 10:00:00")),
      ("b", ts("2024-01-01 10:01:00")),
      ("a", ts("2024-01-01 10:02:00"))) // in-batch duplicate
    q.processAllAvailable()
    input.addData(("a", ts("2024-01-01 10:10:00")), // cross-batch dup
      ("c", ts("2024-01-01 10:11:00")))
    q.processAllAvailable()
    val kept = spark.table("dedup").select("fp").as[String]
      .collect().sorted.toSeq
    assert(kept == Seq("a", "b", "c"))
    q.stop()
  }

  test("intervalJoin: stream-stream attribution joins only in-window " +
    "impressions for the same key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val imps = MemoryStream[(Long, java.sql.Timestamp, String)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp, String)]
    val joined = StreamingEtl.intervalJoin(
      clicks.toDF().toDF("c_user", "c_ts", "c_id"),
      imps.toDF().toDF("i_user", "i_ts", "i_id"),
      "c_user", "i_user", "c_ts", "i_ts", "10 minutes", 300L)
    val q = joined.select("c_id", "i_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("attrib").start()
    imps.addData((1L, ts("2024-01-01 10:00:00"), "i1"),
      (1L, ts("2024-01-01 10:03:00"), "i2"),
      (1L, ts("2024-01-01 09:50:00"), "i0"), // outside the 300s window
      (2L, ts("2024-01-01 10:03:30"), "i3")) // other user
    clicks.addData((1L, ts("2024-01-01 10:04:00"), "c1"))
    q.processAllAvailable()
    val got = spark.table("attrib").as[(String, String)].collect().toSet
    assert(got == Set(("c1", "i1"), ("c1", "i2")))
    q.stop()
  }

  test("windowedCounts aggregates per hour × type under a watermark") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:55:00"), "click", 2.0),
      (ts("2024-01-01 11:05:00"), "click", 4.0),
      (ts("2024-01-01 10:30:00"), "view", 8.0))
      .toDF("ts", "event_type", "value")
    // batch execution of the same streaming expression
    val out = StreamingEtl.windowedCounts(events)
      .select(col("window.start").cast("string").as("w"),
        col("event_type"), col("n"), col("sum_val"))
    assert(rows(out) == Set(
      Seq("2024-01-01 10:00:00", "click", 2L, 3.0),
      Seq("2024-01-01 11:00:00", "click", 1L, 4.0),
      Seq("2024-01-01 10:00:00", "view", 1L, 8.0)))
  }

  test("batch ≡ stream: TextOps.qualityProfile (q34's scorer) runs " +
    "UNCHANGED on a readStream and scores micro-batches identically " +
    "to the batch plan") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val q = graft.text.TextOps
      .qualityProfile(input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("quality_stream").start()
    val (b1, b2) = corpus.splitAt(corpus.length / 2)
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val batch = graft.text.TextOps.qualityProfile(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    assert(rows(spark.table("quality_stream")) == rows(batch))
  }

  test("semanticDecontamStream: the stateless literal-fold scorer on " +
    "the stream is row-identical to q129's broadcast-join batch scorer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sim.Similarity
    implicit val sqlCtx = spark.sqlContext
    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val bench = all.filter($"vec_id" % 10 === 0).collect()
      .map(_.getSeq[Float](1).toSeq).toSeq
    val corpusRows = all.filter($"vec_id" % 10 =!= 0).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamingEtl.semanticDecontamStream(
        input.toDF().toDF("vec_id", "embedding"), bench, 0.3)
      .select($"vec_id", $"maxsim", $"contaminated")
      .writeStream.outputMode("append").format("memory")
      .queryName("decontam_stream").start()
    val (b1, b2) = corpusRows.splitAt(corpusRows.length / 2)
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    // batch reference: the q129 shape (broadcast bench, map-side max)
    val be = all.filter($"vec_id" % 10 === 0).select(
      $"embedding".as("bemb"), Similarity.norm($"embedding").as("bn"))
    val batch = all.filter($"vec_id" % 10 =!= 0)
      .select($"vec_id", $"embedding",
        Similarity.norm($"embedding").as("nrm"))
      .crossJoin(broadcast(be))
      .select($"vec_id", round(Similarity.dot($"embedding", $"bemb")
        / ($"nrm" * $"bn"), 6).as("sim"))
      .groupBy("vec_id").agg(max($"sim").as("maxsim"))
      .withColumn("contaminated", $"maxsim" > 0.3)
    assert(rows(spark.table("decontam_stream")) == rows(batch))
  }

  test("dsirScoreStream: the stateless literal-array scorer on the " +
    "stream reproduces the batch q141 trainer's per-doc integer " +
    "scores exactly, across micro-batch boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(w: String): Int =
      Integer.parseInt(md5hex(w).substring(0, 2), 16)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // offline training: q141's bucket-grain weight formula
    val toks = docs.flatMap { case (id, t) =>
      t.split(" ", -1).map(w => (id, bucket(w)))
    }
    val (tgt, raw) = toks.partition(_._1 % 10 == 0)
    val ct = tgt.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cr = raw.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val ubits = (0 until 256).map { b =>
      val x = (math.log((ct.getOrElse(b, 0L) + 1.0) / (tgt.length + 256))
        - math.log((cr.getOrElse(b, 0L) + 1.0) / (raw.length + 256))) * 1e6
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    }
    val rawDocs = docs.filter(_._1 % 10 != 0).toSeq
    val input = MemoryStream[(Long, String)]
    val q = StreamingEtl.dsirScoreStream(
        input.toDF().toDF("doc_id", "text"), ubits)
      .select($"doc_id", $"n_tokens", $"score_ubits")
      .writeStream.outputMode("append").format("memory")
      .queryName("dsir_stream").start()
    val (b1, b2) = rawDocs.splitAt(rawDocs.length / 2)
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val expected = rawDocs.map { case (id, t) =>
      val ws = t.split(" ", -1)
      Seq[Any](id, ws.length.toLong, ws.map(w => ubits(bucket(w))).sum)
    }.toSet
    assert(rows(spark.table("dsir_stream")) == expected,
      "stream scores diverge from the offline trainer")
  }

  test("langidScoreStream: the stateless literal-map scorer on the " +
    "stream reproduces a from-scratch driver scorer per doc across " +
    "micro-batch boundaries, and its confusion equals the " +
    "oracle-gated batch q171 output") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val (langs, weights, floors, priors) =
      queries.TextQueries.langidModel(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[(Long, String, String)]
    val q = StreamingEtl.langidScoreStream(
        input.toDF().toDF("doc_id", "lang", "text"),
        langs, weights, floors, priors)
      .select($"doc_id", $"lang", $"pred_lang")
      .writeStream.outputMode("append").format("memory")
      .queryName("langid_stream").start()
    val (b1, b2) = docs.toSeq.splitAt(docs.length / 2)
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    // from-scratch driver scorer: plain Scala over the exported model
    def scoreOf(t: String): Map[String, Long] = {
      val grams =
        if (t.length < 3) Seq.empty
        else (0 to t.length - 3).map(i => t.substring(i, i + 3))
      langs.zipWithIndex.map { case (l, i) =>
        l -> grams.foldLeft(priors(i)) { (acc, g) =>
          acc + weights.get(g).map(_(i)).getOrElse(floors(i))
        }
      }.toMap
    }
    def predOf(t: String): String = {
      val s = scoreOf(t)
      langs.zipWithIndex.collectFirst {
        case (l, i) if langs.drop(i + 1).forall(o => s(l) >= s(o)) => l
      }.getOrElse(langs.last)
    }
    val expected = docs.map { case (id, lang, t) =>
      Seq[Any](id, lang, predOf(t))
    }.toSet
    assert(rows(spark.table("langid_stream")) == expected,
      "stream predictions diverge from the from-scratch scorer")
    // and the confusion matrix implied by the stream's predictions
    // equals the oracle-gated batch q171 output — batch ≡ stream at
    // the gated grain (q171 only covers gram-bearing docs, i.e.
    // length >= 3; the stream also scores shorter docs by prior
    // alone, so restrict to the shared domain)
    val streamConf = docs.filter(_._3.length >= 3)
      .map { case (_, lang, t) => (lang, predOf(t)) }
      .groupBy(identity).map { case ((l, p), xs) =>
        Seq[Any](l, p, xs.length.toLong)
      }.toSet
    assert(streamConf == rows(queries.TextQueries.q171.fn(spark, sf)),
      "stream confusion diverges from the batch q171 gate")
  }

  test("quotaGateStream: at most cap docs admitted per source, " +
    "first-come across micro-batches, doc_id-ordered within a batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingEtl.{DocArrival, KeptDoc}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocArrival]
    val q = StreamingEtl.quotaGateStream(input.toDS(), cap = 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("quota_gate").start()
    // batch 1: srcA sends 2 (out of order), srcB sends 1
    input.addData(DocArrival("a", 20L, 100L), DocArrival("a", 10L, 50L),
      DocArrival("b", 1L, 10L))
    q.processAllAvailable()
    // batch 2: srcA sends 3 more — only ONE seat left; the lowest
    // doc_id of the batch takes it. srcB takes its second seat.
    input.addData(DocArrival("a", 33L, 1L), DocArrival("a", 31L, 1L),
      DocArrival("a", 32L, 1L), DocArrival("b", 2L, 20L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("quota_gate").as[KeptDoc].collect().toSet
    val expected = Set(
      KeptDoc("a", 10L, 1L), KeptDoc("a", 20L, 2L), // batch 1, id order
      KeptDoc("b", 1L, 1L),
      KeptDoc("a", 31L, 3L), // lowest id of batch 2 takes the last seat
      KeptDoc("b", 2L, 2L))
    assert(got == expected, s"gate admitted $got")
  }

  test("quotaGateStream under operational events: checkpoint restart " +
    "restores the per-source counters, and a changed cap applies to " +
    "new arrivals only — admitted history stands") {
    import graft.streaming.StreamingEtl.{DocArrival, KeptDoc}
    val base = Files.createTempDirectory("graft-quota").toFile
    val srcDir = new java.io.File(base, "src"); srcDir.mkdirs()
    val outDir = new java.io.File(base, "out").getPath
    val ckDir = new java.io.File(base, "ck").getPath
    def arrive(docs: (String, Long)*): Unit =
      docs.map { case (s, id) => DocArrival(s, id, 10L) }.toDS()
        .write.mode("append").parquet(srcDir.getPath)
    val schema = implicitly[org.apache.spark.sql.Encoder[DocArrival]]
      .schema
    // each run() is a fresh query instance on the SAME checkpoint —
    // the restart story; `cap` can differ per run, the state cannot
    def run(cap: Long): Unit = {
      val in = spark.readStream.schema(schema).parquet(srcDir.getPath)
        .as[DocArrival]
      val q = StreamingEtl.quotaGateStream(in, cap)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", outDir).start()
      q.awaitTermination()
    }
    def kept(): Set[KeptDoc] =
      spark.read.parquet(outDir).as[KeptDoc].collect().toSet
    // run 1, cap=3: source a sends 2 — both admitted
    arrive("a" -> 10L, "a" -> 20L)
    run(cap = 3)
    assert(kept() == Set(KeptDoc("a", 10L, 1L), KeptDoc("a", 20L, 2L)))
    // RESTART, same cap: 2 more arrive; a restored counter admits
    // exactly ONE more (seq 3). A lost counter would admit both,
    // restarting seq at 1.
    arrive("a" -> 30L, "a" -> 40L)
    run(cap = 3)
    assert(kept() == Set(KeptDoc("a", 10L, 1L), KeptDoc("a", 20L, 2L),
      KeptDoc("a", 30L, 3L)),
      "checkpoint restart must restore the per-source counter")
    // RESTART with a RAISED cap (3 -> 5): the new cap applies to new
    // arrivals — the counter continues from 3, it does not reset
    arrive("a" -> 50L, "a" -> 60L, "a" -> 70L)
    run(cap = 5)
    assert(kept() == Set(KeptDoc("a", 10L, 1L), KeptDoc("a", 20L, 2L),
      KeptDoc("a", 30L, 3L), KeptDoc("a", 50L, 4L),
      KeptDoc("a", 60L, 5L)),
      "a raised cap must open seats for NEW arrivals from the " +
        "restored counter, not replay old decisions")
    // RESTART with a LOWERED cap (5 -> 1): already-admitted history
    // stands (append sink, monotone counter — nothing is retracted);
    // the full source admits nothing new; a fresh source gets the
    // new cap
    arrive("a" -> 80L, "c" -> 1L, "c" -> 2L)
    run(cap = 1)
    assert(kept() == Set(KeptDoc("a", 10L, 1L), KeptDoc("a", 20L, 2L),
      KeptDoc("a", 30L, 3L), KeptDoc("a", 50L, 4L),
      KeptDoc("a", 60L, 5L), KeptDoc("c", 1L, 1L)),
      "a lowered cap must gate new arrivals only — no retroactive " +
        "eviction, no extra admissions past the new cap")
  }

  test("fpStoreGateStream ≡ the batch q167 gate when arrivals come " +
    "in doc_id order, across micro-batch boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sf = "/root/testdata/sf0.001"
    // the same fingerprinting as q167, precomputed batch-side
    val d = graft.sources.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        md5(array_join(slice(split(col("text"), " "), 1, 10), " "))
          .as("fp"))
    val store = d.filter(col("doc_id") % 5 =!= 0)
      .select("fp").distinct()
    val delta = d.filter(col("doc_id") % 5 === 0)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, String)]
    val gated = StreamingEtl.fpStoreGateStream(
      input.toDF().toDF("doc_id", "source", "fp"), store)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("fp_gate").start()
    val (b1, b2) = delta.splitAt(delta.length / 2)
    input.addData(b1.toIndexedSeq); q.processAllAvailable()
    input.addData(b2.toIndexedSeq); q.processAllAvailable()
    q.stop()
    val got = spark.table("fp_gate").collect()
      .map(r => Seq[Any](r.getAs[Long]("doc_id"),
        r.getAs[String]("source"), r.getAs[String]("fp")))
      .toSet
    val batch = rows(graft.queries.TextQueries.q167.fn(spark, sf))
    assert(got == batch,
      "stream gate diverges from the batch decision on ordered arrivals")
  }
  test("mediaGateStream: per-payload verdicts across micro-batch " +
    "boundaries equal the batch q176 gate through the shared rule " +
    "chains, with the one stated gap — an unsniffable payload " +
    "reports modality 'unknown' (no provenance on a mixed feed), " +
    "same undecodable reason") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.multimodal.Multimodal
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables(spark, sf, "documents")
    // one mixed feed: image payloads on even synthetic ids, audio on
    // odd — provenance deliberately destroyed by the union
    val img = Multimodal.asImageTable(docs)
      .select(($"media_id" * 2).as("media_id"), $"payload")
    val aud = Multimodal.asAudioTable(docs)
      .select(($"media_id" * 2 + 1).as("media_id"), $"payload")
    val feed = img.unionByName(aud).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingEtl.mediaGateStream(
        input.toDF().toDF("media_id", "payload"))
      .writeStream.outputMode("append").format("memory")
      .queryName("media_gate_stream").start()
    val (b1, b2) = feed.toSeq.splitAt(feed.length / 2)
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    // expected = the batch gate's verdicts (ids remapped onto the
    // feed's), with modality rewritten to 'unknown' exactly where the
    // payload does not sniff (the stream has no table provenance)
    val sniff = feed.map { case (id, p) =>
      id -> Multimodal.sniffFormat(p)
    }.toMap
    val batch = Multimodal.mediaGate(
        Multimodal.decodeImageMeta(img), Multimodal.decodeAudioMeta(aud))
      .collect().map { r =>
        val id = r.getLong(1)
        val mod = if (sniff(id) == "unknown") "unknown" else r.getString(0)
        Seq[Any](mod, id, r.getString(2))
      }.toSet
    assert(rows(spark.table("media_gate_stream")) == batch,
      "stream gate diverges from the batch q176 rules")
    // vacuity: the stream saw both modalities and at least one
    // non-keep reason of each family
    val byMod = spark.table("media_gate_stream").collect()
      .groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(byMod.keySet == Set("image", "audio", "unknown"), s"$byMod")
  }

  test("phashDupAlertStream: verified (arrival, stored) hits across " +
    "micro-batch boundaries aggregate to exactly the batch q179 " +
    "gate's verdicts — same store, same bands, same Hamming verify") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.multimodal.Multimodal
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables(spark, sf, "documents")
    val hist = docs.select($"doc_id".as("media_id"),
      encode($"text", "UTF-8").as("payload"))
    val storeBands = Multimodal.phashBands(
      Multimodal.perceptualHash(hist))
    // the q179 delta construction, byte-for-byte
    val p0 = ($"doc_id" % 23 + 1).cast("int")
    val p1 = (p0 + $"doc_id" % 19 + 1).cast("int")
    val twin = concat($"text".substr(lit(1), p0 - 1), lit("~"),
      $"text".substr(p0 + 1, p1 - p0 - 1), lit("~"),
      $"text".substr(p1 + 1, length($"text")))
    val delta = docs.select(($"doc_id" + 10000).as("media_id"),
        encode(when($"doc_id" % 2 === 0, twin)
          .otherwise(reverse($"text")), "UTF-8").as("payload"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingEtl.phashDupAlertStream(
        input.toDF().toDF("media_id", "payload"), storeBands)
      .writeStream.outputMode("append").format("memory")
      .queryName("phash_alerts").start()
    val (b1, b2) = delta.toSeq.splitAt(delta.length / 2)
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val alerts = spark.table("phash_alerts").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // fold the alert stream to per-arrival verdicts and compare to
    // the oracle-gated batch gate
    val perArrival = delta.map(_._1).map { id =>
      val n = alerts.count(_._1 == id).toLong
      (id, if (n > 0) "dup" else "new", n)
    }.toSet
    val batch = graft.queries.MultimodalQueries.q179.fn(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(perArrival == batch,
      "alert stream folds to a different verdict set than batch q179")
    assert(alerts.nonEmpty && perArrival.exists(_._2 == "new"),
      "one-sided outcome — the gate had nothing to decide")
  }

  test("shardAssignStream: doc_id-ordered arrivals reproduce the " +
    "batch q182 next-fit assignment across micro-batch boundaries, " +
    "and a different batch partitioning yields the identical " +
    "assignment") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingEtl.{ShardArrival, ShardAssign}
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => ShardArrival("w0", r.getLong(0),
        r.getString(1).split(" ").length.toLong))
      .sortBy(_.doc_id)
    var cum = 0L
    val expected = docs.map { d =>
      val shard = cum / 2048L
      cum += d.tok
      ShardAssign("w0", d.doc_id, shard)
    }.toSet
    def run(name: String, batches: Seq[Seq[ShardArrival]])
        : Set[ShardAssign] = {
      val input = MemoryStream[ShardArrival]
      val q = StreamingEtl.shardAssignStream(input.toDS(), cap = 2048L)
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      batches.foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
      q.stop()
      spark.table(name).as[ShardAssign].collect().toSet
    }
    val even = run("shard_even", docs.grouped(100).map(_.toSeq).toSeq)
    val ragged = run("shard_ragged",
      Seq(docs.take(37).toSeq, docs.slice(37, 41).toSeq,
        docs.drop(41).toSeq))
    assert(even == expected,
      "stream assignment diverges from the batch next-fit rule")
    assert(ragged == expected,
      "assignment depends on micro-batch boundaries")
    assert(expected.map(_.shard).size >= 2,
      "single shard — the boundary case never exercised")
  }

  test("jsonlGateStream ≡ the batch Jsonl.read quarantine on the q189 " +
    "line feed across micro-batch boundaries: same corrupt verdicts, " +
    "same parsed field values, every data field null on corrupt " +
    "lines (no partial recovery)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
      .add("lang", StringType).add("source", StringType)
    // the q189 synthesis, batch-side: good JSONL lines + truncated ones
    val d = graft.sources.Tables(spark, sf, "documents")
    val good = d.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), to_json(struct(col("doc_id"),
        concat(lit("say \"hi\"\n\\ "), col("text")).as("text"),
        col("lang"), col("source"))).as("value"))
    val bad = d.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id"), concat(lit("{\"doc_id\": "),
        col("doc_id").cast("string"),
        lit(", \"text\": \"broken")).as("value"))
    val lines = good.unionByName(bad).orderBy("doc_id").collect()
      .map(_.getString(1))
    val input = MemoryStream[String]
    val gated = StreamingEtl.jsonlGateStream(input.toDF(), schema)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("jsonl_gate").start()
    val (b1, b2) = lines.splitAt(lines.length / 3)
    input.addData(b1.toIndexedSeq); q.processAllAvailable()
    input.addData(b2.toIndexedSeq); q.processAllAvailable()
    q.stop()
    val got = spark.table("jsonl_gate").collect().map(r =>
      Seq[Any](r.getAs[Boolean]("is_corrupt"), r.getAs[Long]("doc_id"),
        r.getAs[String]("text"), r.getAs[String]("lang"),
        r.getAs[String]("source"))).toSet
    // batch twin: the file-source read over the same lines
    val dir = java.nio.file.Files
      .createTempDirectory("jsonl-stream-spec-").toString
    spark.createDataset(lines.toIndexedSeq).toDF("value")
      .write.mode("overwrite").text(dir)
    val batch = graft.sources.Jsonl.read(spark, dir, schema)
      .select(col(graft.sources.Jsonl.corruptCol).isNotNull
          .as("is_corrupt"),
        col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().map(r => Seq[Any](r.getAs[Boolean]("is_corrupt"),
        r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("lang"), r.getAs[String]("source"))).toSet
    assert(got == batch,
      "stream gate diverges from the batch json-source quarantine")
    val corrupt = got.filter(_.head == true)
    assert(corrupt.nonEmpty, "no corrupt lines — quarantine vacuous")
    // a failed line nulls EVERY data field — no partial recovery under
    // a full-schema parse (pinned here; q189's quarantine-count device
    // relies on text being null on every corrupt row)
    assert(corrupt.forall(r => r(1) == null && r(2) == null &&
      r(3) == null && r(4) == null),
      s"corrupt-row field contract broken: $corrupt")
    // count as a multiset (the corrupt tuples are identical, so the
    // Set above collapses them) — the memory sink has no corrupt-only
    // schema restriction
    assert(spark.table("jsonl_gate").filter(col("is_corrupt")).count()
      == d.filter(col("doc_id") % 97 === 0).count(),
      "quarantine count differs from the planted truncated lines")
  }

  test("snapshotDiffStream ≡ the batch Cdc.snapshotDiff restricted to " +
    "arrived keys, across micro-batch boundaries (deletes are the " +
    "stated out-of-scope class — a stream cannot observe absence)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val d = graft.sources.Tables(spark, sf, "documents")
    val attrs = Seq("text", "lang", "source", "n_chars")
    // q199's synthesized previous snapshot, verbatim
    val prev = d.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), col("text"),
        when(col("doc_id") % 5 === 0, lit("xx")).otherwise(col("lang"))
          .as("lang"),
        col("source"),
        (col("n_chars") +
          when(col("doc_id") % 7 === 0, 1L).otherwise(0L))
          .as("n_chars"))
      .unionByName(d.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
    val arrivals = d.orderBy("doc_id").collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars")))
    val input = MemoryStream[(Long, String, String, String, Long)]
    val gated = StreamingEtl.snapshotDiffStream(
      input.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"),
      prev, "doc_id", attrs)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("diff_stream").start()
    val (b1, b2) = arrivals.splitAt(arrivals.length / 2)
    input.addData(b1.toIndexedSeq); q.processAllAvailable()
    input.addData(b2.toIndexedSeq); q.processAllAvailable()
    q.stop()
    val got = spark.table("diff_stream")
      .select("doc_id", "change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = graft.ops.Cdc.snapshotDiff(d, prev, "doc_id", attrs)
      .filter(col("change_type") =!= "delete")
      .select("doc_id", "change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == batch,
      "stream verdicts diverge from the batch diff on arrived keys")
    assert(got.values.toSet == Set("insert", "update", "unchanged"),
      s"class coverage vacuous: ${got.values.toSet}")
  }

  test("pitFeatureStream ≡ the q201 batch validity join row-for-row " +
    "across micro-batch boundaries: every arriving event picks its " +
    "historically correct version, and at least one event's PIT tier " +
    "differs from the current version (skew non-vacuous)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val e = graft.sources.Tables(spark, sf, "events")
      .select("event_id", "user_id", "ts")
    val users = e.select(col("user_id")).distinct()
    val dim = Seq((0, "2024-01-01", "2024-01-11"),
      (1, "2024-01-11", "2024-01-21"),
      (2, "2024-01-21", "2100-01-01"))
      .map { case (v, f, t) =>
        users.select(col("user_id").as("d_user"),
          to_timestamp(lit(f)).as("eff_ts"),
          to_timestamp(lit(t)).as("exp_ts"),
          ((col("user_id") + v) % 5).cast("long").as("tier"),
          lit(if (v == 2) 1 else 0).as("current_flag"))
      }.reduce(_ unionByName _)
    val arrivals = e.orderBy("event_id").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts")))
    val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val gated = StreamingEtl.pitFeatureStream(
      input.toDF().toDF("event_id", "user_id", "ts"), dim)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("pit_stream").start()
    val (b1, b2) = arrivals.splitAt(arrivals.length / 2)
    input.addData(b1.toIndexedSeq); q.processAllAvailable()
    input.addData(b2.toIndexedSeq); q.processAllAvailable()
    q.stop()
    val got = spark.table("pit_stream").select("event_id", "tier")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = e.join(dim,
        col("user_id") === col("d_user") &&
          col("ts") >= col("eff_ts") && col("ts") < col("exp_ts"))
      .select("event_id", "tier").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == batch,
      "stream PIT lookup diverges from the batch validity join")
    assert(got.size == arrivals.length,
      "coverage broke — some event matched zero or two versions")
    val curTier = dim.filter(col("current_flag") === 1)
      .select(col("d_user"), col("tier").as("ct")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val eByUser = e.select("event_id", "user_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.exists { case (id, t) => curTier(eByUser(id)) != t },
      "every PIT tier equals the current tier — skew contrast vacuous")
  }

  test("metaExtractStream: EXIF/VAD extraction across micro-batch " +
    "boundaries equals the batch q249/q250 decode tables on a mixed " +
    "jpeg+wav+garbage feed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.multimodal.Multimodal
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables(spark, sf, "documents")
    val jpg = Multimodal.asExifTable(docs)
    val pcm = Multimodal.asPcmTable(docs)
    val feed = jpg.select(($"media_id" * 2).as("media_id"), $"payload")
      .unionByName(
        pcm.select(($"media_id" * 2 + 1).as("media_id"), $"payload"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingEtl.metaExtractStream(
        input.toDF().toDF("media_id", "payload"))
      .writeStream.outputMode("append").format("memory")
      .queryName("meta_extract_stream").start()
    val (b1, b2) = feed.toSeq.splitAt(feed.length / 2)
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    // expected from the BATCH decode tables, ids remapped to the feed;
    // the jpeg leg's garbage rows ('none') fall through to the VAD
    // walk in the stream and still land 'unknown'
    val expJpg = Multimodal.decodeExifMeta(jpg).collect().map { r =>
      if (r.getString(1) == "none")
        Seq[Any](r.getLong(0) * 2, "unknown", "none", 0L, 0L, 0L)
      else Seq[Any](r.getLong(0) * 2, "exif", r.getString(1),
        r.getLong(3), r.getLong(4), r.getLong(5))
    }
    val expPcm = Multimodal.decodeVadMeta(pcm).collect().map { r =>
      if (r.getString(1) == "unknown")
        Seq[Any](r.getLong(0) * 2 + 1, "unknown", "none", 0L, 0L, 0L)
      else Seq[Any](r.getLong(0) * 2 + 1, "vad", r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
    }
    assert(rows(spark.table("meta_extract_stream")) ==
      (expJpg ++ expPcm).toSet,
      "stream metadata extraction diverges from the batch tables")
    val kinds = spark.table("meta_extract_stream").collect()
      .map(_.getString(1)).toSet
    assert(kinds == Set("exif", "vad", "unknown"), s"$kinds")
  }

  test("contentDecodeStream: pixel/sample decode across micro-batch " +
    "boundaries equals the batch q230/q234 decode tables on a mixed " +
    "bmp+pcm+garbage feed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.multimodal.Multimodal
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables(spark, sf, "documents")
    val bmp = Multimodal.asBmpTable(docs)
    val pcm = Multimodal.asPcmTable(docs)
    val png = Multimodal.asPngPixelTable(docs)
    val feed = bmp.select(($"media_id" * 3).as("media_id"), $"payload")
      .unionByName(
        pcm.select(($"media_id" * 3 + 1).as("media_id"), $"payload"))
      .unionByName(
        png.select(($"media_id" * 3 + 2).as("media_id"), $"payload"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingEtl.contentDecodeStream(
        input.toDF().toDF("media_id", "payload"))
      .writeStream.outputMode("append").format("memory")
      .queryName("content_decode_stream").start()
    val (b1, b2) = feed.toSeq.splitAt(feed.length / 2)
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    // expected from the BATCH decode tables, ids remapped to the feed
    val expBmp = Multimodal.decodeBmpMeta(bmp).collect().map { r =>
      Seq[Any](r.getLong(0) * 3, r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)) // width, height, pix_sum
    }
    val expPcm = Multimodal.decodePcmMeta(pcm).collect().map { r =>
      Seq[Any](r.getLong(0) * 3 + 1, r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)) // channels, n_frames, sample_sum
    }
    val expPng = Multimodal.decodePngMeta(png).collect().map { r =>
      Seq[Any](r.getLong(0) * 3 + 2, r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)) // width, height, pix_sum
    }
    assert(rows(spark.table("content_decode_stream")) ==
      (expBmp ++ expPcm ++ expPng).toSet,
      "stream decode diverges from the batch decode tables")
    // vacuity: all five formats present on the feed
    val fmts = spark.table("content_decode_stream").collect()
      .map(_.getString(1)).toSet
    assert(fmts == Set("bmp", "png", "pcm8", "pcm16", "unknown"), s"$fmts")
  }

  test("batch ≡ stream: rollingDistinctStream's per-window user-set " +
    "counter converges to q262's batch metric on the real corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingEtl.{DayUser, DayUsers}
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val sf = "/root/testdata/sf0.001"
      val ev = sources.Tables(spark, sf, "events")
      // the stateless map stage, run as a batch frame to split feeds
      val hits = StreamingEtl.toWindowEnds(ev)
        .as[DayUser].collect().toSeq
      val input = MemoryStream[DayUser]
      val q = StreamingEtl.rollingDistinctStream(input.toDS())
        .writeStream.outputMode("update")
        .format("memory").queryName("rolling_distinct").start()
      val (b1, b2) = hits.splitAt(hits.length / 2)
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      q.stop()
      // counts only grow: the LATEST emission per window is the max
      val got = spark.table("rolling_distinct").as[DayUsers].collect()
        .groupBy(_.day).view.mapValues(_.map(_.users_7d).max).toMap
      val batch = queries.Extras3.q262.fn(spark, sf)
        .select(datediff(col("day"), lit("1970-01-01")).cast("long"),
          col("users_7d"))
        .as[(Long, Long)].collect().toMap
      // the stream also credits ends past the last observed day (it
      // cannot know the horizon); compare on the batch's observed days
      batch.foreach { case (day, n) =>
        assert(got(day) == n, s"day $day: stream ${got(day)} != batch $n")
      }
      assert(batch.nonEmpty && got.keySet.size >= batch.size)
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("twoTableTxnSink: every micro-batch lands detail AND rollup in " +
    "one commit; the end state equals the batch aggregation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val wh = graft.sources.Warehouse(
      java.nio.file.Files.createTempDirectory("txnsink-").toString)
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"source", $"lang").as[(String, String)].collect().toSeq
    val input = MemoryStream[(String, String)]
    val (b1, b2) = corpus.splitAt(corpus.length / 2)
    val q = StreamingEtl.twoTableTxnSink(
      input.toDF().toDF("source", "lang"), wh, "d", "r")
    input.addData(b1: _*)
    q.processAllAvailable()
    // cross-table invariant after the first wave
    val roll1 = wh.read(spark, "d").groupBy("source")
      .agg(sum("n").as("src_n"))
      .as[(String, Long)].collect().toMap
    val got1 = wh.read(spark, "r").as[(String, Long)].collect().toMap
    assert(got1 == roll1, "rollup diverged from detail after wave 1")
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val detail = wh.read(spark, "d")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val expect = corpus.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    assert(detail == expect, "end state must equal the batch aggregation")
    val roll2 = wh.read(spark, "r").as[(String, Long)].collect().toMap
    val expectRoll = corpus.groupBy(_._1).view
      .mapValues(_.length.toLong).toMap
    assert(roll2 == expectRoll)
  }
}
