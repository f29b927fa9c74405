package graft

import org.apache.spark.sql.functions._

/** Round-8 additions: semantic dedup/decontam (q128/q129),
  * temperature resampling (q130), the LSH calibration harness
  * (q131), dup-span profile + cut (q132/q138), the k-means step
  * (q133), the PQ tier (q134 ADC, q135 IVF-PQ, q136 recall), both
  * incremental index-maintenance paths (q137 bands, q140 codes), and
  * the Gopher repetition rules (q139). Each test pins either a full
  * independent in-memory recomputation or the oracle-unreachable
  * contract (plan shapes: broadcasts, bucket pruning, hash-agg
  * argmin, rank-limited top-k, partition-count invariance).
  */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q128: every component is a genuine duplicate group and the " +
    "keeper is one of its members") {
    val d = queries.SimQueries.q128.fn(spark, sf).collect()
    assert(d.nonEmpty, "planted cosine structure must yield components")
    val comps = d.map(_.getLong(0))
    assert(comps.distinct.length == comps.length, "component id repeated")
    d.foreach { r =>
      val (comp, n, keepId) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(n >= 2, s"component $comp has $n member(s); pairs imply >= 2")
      // comp is the component's MINIMUM member id and the keeper is a
      // member, so comp <= keep_id always
      assert(comp <= keepId, s"keeper $keepId below component min $comp")
    }
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(d.map(_.getLong(2)).sum <= corpus,
      "components are disjoint doc sets; members cannot exceed corpus")
  }

  test("q128: decision table is invariant under shuffle-partition " +
    "count (rounded-cosine + lowest-id ties leave no partition-order " +
    "dependence)") {
    // cloned session: its own SQLConf, so the 7/13-partition setting
    // can never leak into a concurrently running suite (all suites
    // share one lazy session). A fresh Materialized/SessionScratch
    // nonce per partition setting forces the clone to rebuild its FULL
    // lineage under that conf — without it the clone would reuse
    // artifacts the base session persisted (both key by applicationId,
    // which clones share) and only downstream stages would actually
    // run at the altered partition count.
    val base = rows(queries.SimQueries.q128.fn(spark, sf))
    val clone = spark.newSession()
    def run(): Set[Seq[Any]] = rows(queries.SimQueries.q128.fn(clone, sf))
    def atPartitions(n: Int): Set[Seq[Any]] = {
      clone.conf.set("spark.sql.shuffle.partitions", n.toString)
      Materialized.setNonceForTests(clone, s"q128inv$n")
      SessionScratch.setNonceForTests(clone, s"q128inv$n")
      try run()
      finally {
        Materialized.clear(clone) // clears ONLY the nonce scope
        Materialized.clearNonceForTests(clone)
        SessionScratch.clearNonceForTests(clone)
      }
    }
    assert(atPartitions(7) == base, "result changed with 7 shuffle partitions")
    assert(atPartitions(13) == base, "result changed with 13 shuffle partitions")
  }

  test("semanticDedup operator: corpus-sized quantizer (cellsFor/" +
    "planesFor production sizing) upholds the same decision-table " +
    "invariants as the pinned registry instance") {
    import graft.sim.Similarity
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val n = e.count()
    val k = Similarity.cellsFor(n, 32) // finer quantizer than q128's
    val cent = Similarity.centroidTable(spark, k, 64)
    val planes = Similarity.planesFor(32, 8)
    val d = Similarity.semanticDedup(e, cent, planes, 64,
      maxBucket = 40, minSim = 0.2,
      cacheKey = s"semdedup_spec:$sf:$k:$planes").collect()
    assert(d.nonEmpty, "finer quantizer still finds duplicate groups")
    d.foreach { r =>
      assert(r.getLong(2) >= 2, "component below pair size")
      assert(r.getLong(0) <= r.getLong(3), "keeper below component min")
      assert(r.getLong(1) >= 1 && r.getLong(1) <= k,
        s"cell id ${r.getLong(1)} outside 1..$k")
    }
    assert(d.map(_.getLong(2)).sum <= n,
      "components are disjoint; members cannot exceed corpus")
  }

  test("q129: benchmark set broadcasts and the per-vector max " +
    "collapses map-side — two exchanges total (vector grain, label " +
    "grain), and flags reconcile to the corpus") {
    val df = queries.SimQueries.q129.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"bench side must broadcast:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      s"corpus must not shuffle before the vector grain:\n$plan")
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        "n_docs = n_flagged + n_kept")
      assert(r.getDouble(4) <= 1.0 + 1e-9, "cosine above 1")
    }
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" % 10 =!= 0).count()
    assert(rows.map(_.getLong(1)).sum == corpus,
      "every non-benchmark vector is classified exactly once")
  }

  test("q130: temperature resampling downweights the dominant " +
    "language toward its sqrt share, clamps the rest at 1, and the " +
    "reported rate matches an independent integer recomputation") {
    val rows130 = queries.Extras.q130.fn(spark, sf).collect()
    val counts = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent threshold math: s_s = floor(sqrt(n)*2^20) exact,
    // r_s = floor(65536*s_s*N / (s_tot*n)) in BigInt
    val sS = counts.map { case (l, n) =>
      l -> BigInt(math.floor(math.sqrt(n.toDouble) * (1L << 20)).toLong)
    }
    val sTot = sS.values.sum
    val nTot = BigInt(counts.values.sum)
    rows130.foreach { r =>
      val (lang, before, kept, rate) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(4))
      val rS = (BigInt(65536) * sS(lang) * nTot) /
        (sTot * BigInt(counts(lang)))
      val expRate = math.min(1.0,
        (rS.toDouble / 65536 * 1e6).round / 1e6)
      assert(rate == expRate, s"$lang rate $rate != recomputed $expRate")
      assert(kept <= before)
      if (rate == 1.0) assert(kept == before,
        s"$lang clamped at 1 must keep everything")
      else assert(kept < before, s"$lang rate $rate must drop docs")
    }
    // the dominant language is genuinely downsampled on this corpus
    val en = rows130.find(_.getString(0) == "en").get
    assert(en.getDouble(4) < 1.0 && en.getLong(2) < en.getLong(1),
      "en is ~44% of the corpus; T=2 must shrink it")
  }

  test("q131: the empirical s-curve matches the banding theory at " +
    "both ends — the planted near-dup (bucket 9, expected 0.98) is " +
    "caught, background pairs (expected 2.5e-4) are not") {
    val rows131 = queries.TextQueries.q131.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    rows131.foreach { case (b, n, hits, rate, exp) =>
      assert(hits <= n && rate >= 0 && rate <= 1)
      assert(exp > 0 && exp < 1, s"bucket $b expected rate $exp")
    }
    val top = rows131.find(_._1 == 9)
      .getOrElse(fail("sf0.001 plants a >0.9-Jaccard pair in the " +
        "block sample; bucket 9 must be populated"))
    assert(top._3 == top._2,
      "a 0.97-Jaccard pair collides in both bands with p≈0.98; the " +
        "capped generator must surface it")
    val bottom = rows131.find(_._1 == 0).get
    assert(bottom._4 <= 0.01,
      s"near-orthogonal pairs must almost never be candidates, got " +
        s"hit_rate ${bottom._4}")
  }

  test("q132: duplicated spans are disjoint, within doc bounds, and " +
    "the whole profile matches an independent in-memory recomputation") {
    val d = queries.Extras.q132.fn(spark, sf).collect()
    assert(d.nonEmpty, "sf0.001 has shared 5-grams; spans must exist")
    d.foreach { r =>
      val (nt, nSpans, maxSpan, dupTok, frac) = (r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(nSpans >= 1)
      // a span covers at least one full 5-gram window
      assert(maxSpan >= 5 && maxSpan <= dupTok,
        s"max span $maxSpan outside [5, $dupTok]")
      // spans merge while gaps <= 5, so surviving spans are disjoint
      // position ranges — coverage cannot exceed the doc
      assert(dupTok <= nt, s"covered $dupTok tokens of a $nt-token doc")
      assert(frac == dupTok.toDouble / nt, "frac must be the exact ratio")
    }
    // full independent oracle: recompute every doc's profile in plain
    // Scala (sf0.001 is 500 docs / 28k tokens). split(text, " ", -1)
    // matches Spark's split semantics on consecutive/trailing spaces.
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
      .filter(_._2.length >= 5)
    val grams = toks.flatMap { case (id, ts) =>
      ts.sliding(5).zipWithIndex.map { case (g, i) =>
        (id, i + 1L, g.mkString(" ")) }
    }
    val dupGrams = grams.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.length >= 2).keySet
    val expected = toks.flatMap { case (id, ts) =>
      val pos = grams.filter(g => g._1 == id && dupGrams(g._3))
        .map(_._2).sorted
      if (pos.isEmpty) None else {
        val spans = pos.tail.foldLeft(List((pos.head, pos.head))) {
          case ((lo, hi) :: rest, p) =>
            if (p - hi <= 5) (lo, p) :: rest else (p, p) :: (lo, hi) :: rest
          case (Nil, p) => List((p, p))
        }.map { case (lo, hi) => hi + 4 - lo + 1 }
        val nt = ts.length.toLong
        Some(Seq[Any](id, nt, spans.length.toLong, spans.max.toLong,
          spans.sum.toLong, spans.sum.toDouble / nt))
      }
    }.toSet
    assert(d.map(_.toSeq).toSet == expected,
      "query profile diverges from the independent recomputation")
  }

  test("q138: the substring cut removes exactly the >= 20-token " +
    "duplicated spans — full profile matches an independent " +
    "in-memory recomputation, token accounting reconciles") {
    val d = queries.Extras.q138.fn(spark, sf).collect()
    assert(d.nonEmpty, "sf0.001 has >= 20-token duplicated spans")
    d.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        "n_tokens = cut + kept")
      assert(r.getLong(2) >= 20, "a cut doc lost at least one span")
      val retokenized =
        if (r.getString(4).isEmpty) 0 else r.getString(4).split(" ", -1).length
      assert(retokenized == r.getLong(3),
        "kept_tokens must equal the reassembled text's token count")
    }
    // independent recompute (same machinery as the q132 spec, plus
    // the cut): spans >= 20 tokens removed, text rebuilt
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
      .filter(_._2.length >= 5)
    val grams = toks.flatMap { case (id, ts) =>
      ts.sliding(5).zipWithIndex.map { case (g, i) =>
        (id, i + 1L, g.mkString(" ")) }
    }
    val dupGrams = grams.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.length >= 2).keySet
    val expected = toks.flatMap { case (id, ts) =>
      val pos = grams.filter(g => g._1 == id && dupGrams(g._3))
        .map(_._2).sorted
      if (pos.isEmpty) None else {
        val spans = pos.tail.foldLeft(List((pos.head, pos.head))) {
          case ((lo, hi) :: rest, p) =>
            if (p - hi <= 5) (lo, p) :: rest else (p, p) :: (lo, hi) :: rest
          case (Nil, p) => List((p, p))
        }.map { case (lo, hi) => (lo, hi + 4) }
          .filter { case (lo, hi4) => hi4 - lo + 1 >= 20 }
        if (spans.isEmpty) None else {
          val kept = ts.zipWithIndex.collect {
            case (w, i) if !spans.exists { case (lo, hi4) =>
              i + 1 >= lo && i + 1 <= hi4 } => w
          }
          Some(Seq[Any](id, ts.length.toLong,
            (ts.length - kept.length).toLong, kept.length.toLong,
            kept.mkString(" ")))
        }
      }
    }.toSet
    assert(d.map(_.toSeq).toSet == expected,
      "cut output diverges from the independent recomputation")
  }

  test("q139: the Gopher repetition signals match an independent " +
    "in-memory recomputation on every doc") {
    val d = queries.TextQueries.q139.fn(spark, sf).collect()
    val docs0 = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(d.length == docs0.length, "one row per doc")
    val expected = docs0.map { case (id, text) =>
      val ts = text.split(" ", -1)
      def cov(k: Int, dupOnly: Boolean): Long =
        if (ts.length < k) 0L
        else {
          val counts = ts.sliding(k).map(_.mkString(" ")).toSeq
            .groupBy(identity).map { case (g, o) => g -> o.length }
          if (dupOnly)
            counts.collect { case (g, c) if c >= 2 => c.toLong * g.length }
              .sum
          else {
            // top-1 by (count desc, gram asc) — the query's tie policy
            val (g, c) = counts.toSeq.minBy { case (g2, c2) => (-c2, g2) }
            c.toLong * g.length
          }
        }
      val nc = text.length.toLong
      Seq[Any](id, nc, cov(2, false).toDouble / nc,
        cov(3, false).toDouble / nc, cov(4, false).toDouble / nc,
        cov(5, true).toDouble / nc)
    }.toSet
    assert(d.map(_.toSeq).toSet == expected,
      "repetition signals diverge from the independent recomputation")
  }

  test("q133: one Lloyd step re-centers every populated cell — (cid, " +
    "dim) grain is complete, memberships reconcile to the corpus, and " +
    "mean/delta recompute from the integer sums") {
    import graft.sim.Similarity
    val d = queries.SimQueries.q133.fn(spark, sf).collect()
    val cells = d.map(_.getLong(0)).distinct
    // every populated cell reports all 64 dims with one shared n_vecs
    cells.foreach { c =>
      val rs = d.filter(_.getLong(0) == c)
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 64L),
        s"cell $c missing dims")
      assert(rs.map(_.getLong(2)).distinct.length == 1,
        s"cell $c reports inconsistent member counts")
    }
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(d.filter(_.getLong(1) == 1L).map(_.getLong(2)).sum == corpus,
      "each vector is assigned to exactly one cell")
    // centroid components depend only on cid (seedBase + cid - 1),
    // so regenerating the table up to the max observed cell matches
    // the query's own K-row table on every populated cid
    val cent = Similarity.centroidTable(spark, cells.max.toInt, 64).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    d.foreach { r =>
      val (cid, dim, n, s) = (r.getLong(0), r.getLong(1).toInt,
        r.getLong(2), r.getLong(3))
      val mean = s.toDouble / n
      assert(r.getDouble(4) == mean, "mean_micro must be sum/n exactly")
      assert(r.getDouble(5) == mean - cent(cid)(dim - 1).toDouble * 1e6,
        s"delta_micro must be mean minus the current centroid component")
    }
  }

  test("q134: PQ codes and ADC top-10 match an independent " +
    "recomputation, and the plan keeps the encode hash-aggregated, " +
    "the LUT broadcast, and the top-k rank-limited") {
    import graft.sim.Similarity
    val df = queries.SimQueries.q134.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // packed-integer argmin keeps the encode out of SortAggregate
    assert(!plan.contains("SortAggregate"),
      s"packed argmin must hash-aggregate:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"codebook/LUT sides must broadcast:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-query top-10 must rank-limit before the exchange:\n$plan")
    // independent recompute: 512 vectors x 32 sub-spaces x 16 codes
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    // the PQ32x4 grid: sub-space m covers dims (2m-1, 2m); code k is
    // the (⌈k/4⌉, ((k-1) mod 4)+1) cell of the {±1/16, ±3/16} grid
    val levels = Seq(-0.1875, -0.0625, 0.0625, 0.1875)
    def d2m(emb: Seq[Float], m: Int, k: Int): Long = {
      var s = 0.0
      (1 to 2).foreach { j =>
        val c = if (j == 1) levels((k - 1) / 4) else levels((k - 1) % 4)
        val d = emb((m - 1) * 2 + j - 1).toDouble - c
        s += d * d
      }
      // Spark's Round on DoubleType: BigDecimal.valueOf + HALF_UP
      java.math.BigDecimal.valueOf(s * 1000000)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }
    val corpus = all.filter(_._1 >= 8)
    val codes = corpus.map { case (id, emb) =>
      (id, (1 to 32).map { m =>
        (1 to 16).map(k => d2m(emb, m, k) * 32 + k - 1).min % 32 + 1
      })
    }
    val expected = all.filter(_._1 < 8).flatMap { case (qid, qemb) =>
      corpus.indices.map { i =>
        val (nid, cs) = codes(i)
        (qid, nid,
          (1 to 32).map(m => d2m(qemb, m, cs(m - 1).toInt)).sum)
      }.sortBy { case (_, nid, adc) => (adc, nid) }.take(10)
        .zipWithIndex.map { case ((q, n, a), i) => (q, n, a, i + 1L) }
    }.toSet
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected,
      "ADC ranking diverges from the independent recomputation")
  }

  test("q135: IVF-PQ candidates respect the probed cells, agree with " +
    "the full ADC scan on common pairs, and the store read is " +
    "bucket-pruned") {
    import graft.sim.Similarity
    val df = queries.SimQueries.q135.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("SelectedBucketsCount"),
      s"probe must prune the cid-bucketed store:\n$plan")
    val rows135 = df.collect()
    assert(rows135.nonEmpty)
    // membership: every returned neighbor lives in a probed cell of
    // its query — recomputed from the library's own assignment ops
    val cent = Similarity.centroidTable(spark,
      Similarity.cellsFor(500L, 64), 64)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding",
        graft.sim.Similarity.norm($"embedding").as("nrm"))
    val cellOf = Similarity.ivfAssign(e.filter($"vec_id" >= 8), cent)
      .select($"vec_id", $"cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probed = Similarity.ivfProbes(e.filter($"vec_id" < 8), cent, 2)
      .select($"vec_id", $"cid").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet }
    rows135.foreach { r =>
      val (qid, nid) = (r.getLong(0), r.getLong(1))
      assert(probed(qid).contains(cellOf(nid)),
        s"neighbor $nid of query $qid is outside its probed cells")
    }
    // ADC agreement: where the pruned and full rankings share a pair,
    // the distance is the same number
    val full = queries.SimQueries.q134.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows135.foreach { r =>
      full.get((r.getLong(0), r.getLong(1))).foreach { adc =>
        assert(adc == r.getLong(2),
          "pruned and full ADC disagree on a shared pair")
      }
    }
  }

  test("q140: the incrementally-built IVF-PQ store answers exactly " +
    "like the one-shot store, and its probe stays bucket-pruned") {
    val inc = queries.SimQueries.q140.fn(spark, sf)
    assert(rows(inc) == rows(queries.SimQueries.q135.fn(spark, sf)),
      "incremental store diverges from the one-shot build")
    val plan = inc.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("SelectedBucketsCount"),
      s"probe must prune the merged cid-bucketed store:\n$plan")
  }

  test("q136: the PQ index genuinely ranks — recall@10 vs exact L2 " +
    "is well above chance on every query and the harness row shape " +
    "holds") {
    val rows136 = queries.SimQueries.q136.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows136.length == 8, "one row per query vector")
    rows136.foreach { case (_, n, rec) =>
      assert(n >= 0 && n <= 10)
      assert(rec == n.toDouble / 10, "recall must be the exact ratio")
    }
    // chance recall is 10/~500 = 0.02; the grid codebook measures
    // ~0.6 — a floor of 0.3 mean catches any regression to noise
    val mean = rows136.map(_._3).sum / rows136.length
    assert(mean >= 0.3, s"mean recall@10 $mean — index degenerated")
  }

  test("q137: the incrementally-appended band store yields exactly " +
    "the batch store's candidates, and the merged-store read stays " +
    "exchange-free before the pair distinct") {
    val inc = queries.TextQueries.q137.fn(spark, sf)
    val incRows = rows(inc)
    assert(incRows == rows(queries.TextQueries.q79.fn(spark, sf)),
      "incremental build diverges from the batch rebuild")
    assert(incRows.nonEmpty)
    // the delta files were bucket-hashed at write time: the size agg
    // and both pair-join sides inherit the (band, key) distribution,
    // so only the final candidate distinct repartitions
    val plan = inc.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1,
      s"merged bucketed store must not re-shuffle before the " +
        s"distinct:\n$plan")
  }

  test("q128: centroid assignment broadcasts the K-row table and the " +
    "bucket cap broadcasts the sized keys — the corpus never shuffles " +
    "for either") {
    val plan = queries.SimQueries.q128.fn(spark, sf)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"centroid table must broadcast for assignment:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"sized (cid, bkt) cap table must broadcast:\n$plan")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q141: DSIR scores match a from-scratch recomputation " +
    "(hashed buckets, add-1 smoothing, HALF_UP micro-nats), the " +
    "weight table broadcasts, and the top-50 is a per-partition heap") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val toks = docs.flatMap { case (id, t) =>
      t.split(" ", -1).map(w => (id, Integer.parseInt(
        md5hex(w).substring(0, 2), 16)))
    }
    val (tgt, raw) = toks.partition(_._1 % 10 == 0)
    val ct = tgt.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cr = raw.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val (tt, tr) = (tgt.length.toLong, raw.length.toLong)
    val ubits: Map[Int, Long] = (ct.keySet ++ cr.keySet).map { b =>
      val x = (math.log((ct.getOrElse(b, 0L) + 1.0) / (tt + 256)) -
        math.log((cr.getOrElse(b, 0L) + 1.0) / (tr + 256))) * 1e6
      b -> java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    }.toMap
    val expected = raw.groupBy(_._1).map { case (id, ts) =>
      (id, ts.length.toLong, ts.map(t => ubits(t._2)).sum)
    }.toSeq.sortBy(r => (-r._3, r._1)).take(50).toSet
    val df = queries.TextQueries.q141.fn(spark, sf)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, "DSIR top-50 diverges from recomputation")
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"256-row weight table must broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-50 must be a per-partition heap, not a global sort:\n$plan")
  }

  test("q142: BPE pair statistics match a from-scratch recomputation " +
    "and the top-20 is a per-partition heap over the vocab grain") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select($"text").collect().map(_.getString(0))
    val wf = texts.flatMap(_.split(" ", -1)).filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairAgg = wf.toSeq.flatMap { case (w, f) =>
      (0 until w.length - 1).map(i => (w.substring(i, i + 2), w, f))
    }.groupBy(_._1).map { case (p, occ) =>
      // n_words counts distinct words containing the pair; total
      // counts every occurrence (a pair twice in one word counts
      // twice) weighted by word frequency
      (p, occ.map(_._2).distinct.size.toLong, occ.map(_._3).sum)
    }.toSeq.sortBy(r => (-r._3, r._1)).take(20).toSet
    val df = queries.Extras.q142.fn(spark, sf)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == pairAgg, "BPE pair top-20 diverges from recomputation")
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must be a per-partition heap, not a global sort:\n$plan")
  }

  test("q143: bigram-LM scores match a from-scratch recomputation " +
    "covering all three weight forms (seen bigram, context backoff, " +
    "unseen-context floor)") {
    def ubits(x: Double): Long =
      java.math.BigDecimal.valueOf(x * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    def bigrams(ts: Array[String]) = ts.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))).toSeq
    val tgt = docs.filter(_._1 % 10 == 0).flatMap(d => bigrams(d._2))
    val cb = tgt.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cu = tgt.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val floor = ubits(math.log(1.0 / 4096))
    val expected = docs.filter(_._1 % 10 != 0)
      .filter(_._2.length >= 2).map { case (id, ts) =>
        val bs = bigrams(ts)
        val score = bs.map { b =>
          cb.get(b) match {
            case Some(c) => ubits(math.log((c + 1.0) / (cu(b._1) + 4096)))
            case None => cu.get(b._1)
              .map(u => ubits(math.log(1.0 / (u + 4096))))
              .getOrElse(floor)
          }
        }.sum
        (id, bs.length.toLong, score)
      }.toSet
    // the synthetic corpus must actually exercise every branch
    val rawBgs = docs.filter(_._1 % 10 != 0).flatMap(d => bigrams(d._2))
    assert(rawBgs.exists(cb.contains), "no seen bigram in raw docs")
    assert(rawBgs.exists(b => !cb.contains(b) && cu.contains(b._1)),
      "no context-backoff case in raw docs")
    val got = queries.Extras.q143.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, "LM scores diverge from recomputation")
  }

  test("q144: fertility matches a from-scratch recomputation and is " +
    "an exact IEEE division of the two integer sums") {
    val pat = ("'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+" +
      "| ?[^a-zA-Z0-9\\s]+|\\s+").r
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"lang", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      val w = ds.map(_._2.split(" ", -1).length.toLong).sum
      val c = ds.map(d => pat.findAllIn(d._2).size.toLong).sum
      (lang, ds.length.toLong, w, c, c.toDouble / w)
    }.toSet
    val got = queries.TextQueries.q144.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == expected, "fertility diverges from recomputation")
  }

  test("q145: three integer power-iteration steps match an exact " +
    "from-scratch recomputation and keep total mass within per-entry " +
    "rounding of one") {
    val ev = sources.Tables(spark, sf, "events")
      .select($"user_id", $"event_type", $"ts", $"event_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime * 1000000L +
          r.getTimestamp(2).getNanos % 1000000, r.getLong(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val seq = rows.sortBy(r => (r._3, r._4)).map(_._2)
      seq.sliding(2).filter(_.length == 2).map(p => (p(0), p(1)))
    }
    val n = trans.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tot = trans.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    // exact half-up integer division, no float anywhere
    val q = n.map { case ((a, b), c) =>
      (a, b) -> (2L * c * 1000000L + tot(a)) / (2L * tot(a))
    }
    val types = ev.map(_._2).distinct.sorted
    var v: Map[String, Long] =
      types.map(_ -> 1000000L / types.length).toMap
    // mirror the JOIN semantics exactly: a next type appears iff some
    // matrix row reaches it from the current vector's keys, even when
    // the renormalized mass rounds to zero
    for (_ <- 1 to 3)
      v = q.keys.filter(k => v.contains(k._1)).toSeq.groupBy(_._2)
        .map { case (next, ks) =>
          val s = ks.map(k => v(k._1) * q(k)).sum
          next -> (2L * s + 1000000L) / 2000000L
        }
    val got = queries.Events.q145.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(r => r._1 -> r._2).toMap == v,
      "stationary masses diverge from integer recomputation")
    got.foreach(r => assert(r._3 == r._2.toDouble / 1000000,
      "p must be the single-division image of the integer mass"))
    val mass = got.map(_._2).sum
    assert(math.abs(mass - 1000000L) <= types.length,
      s"mass $mass drifted beyond per-entry rounding")
  }

  test("q146: the JL projection matches an exact integer " +
    "recomputation for every (vector, component) and the plan is " +
    "map-only — no Exchange anywhere") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val signs = Array.tabulate(8, 64) { (j, i) =>
      if (Integer.parseInt(md5hex(s"$i:$j").substring(0, 1), 16) < 8) 1L
      else -1L
    }
    val expected = vecs.flatMap { case (id, e) =>
      val xi = e.map(x => math.floor(x.toDouble * 1048576).toLong)
      (0 until 8).map(j =>
        (id, j.toLong, xi.zip(signs(j)).map { case (x, s) => x * s }.sum))
    }.toSet
    val df = queries.SimQueries.q146.fn(spark, sf)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, "projection diverges from recomputation")
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Exchange"),
      s"JL projection must be map-only:\n$plan")
  }

  test("q147/ZOrder: the Morton value matches a scale-then-interleave " +
    "recomputation, and clustering on it gives per-partition locality " +
    "on BOTH keys where a single-key sort has none on the second") {
    import graft.ops.ZOrder
    def morton(a: Long, b: Long): Long =
      (0 until 10).foldLeft(0L) { (acc, k) =>
        acc | (((a >> k) & 1L) << (2 * k)) | (((b >> k) & 1L) << (2 * k + 1))
      }
    val rows147 = queries.Extras.q147.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows147.nonEmpty)
    val (xmin, xmax) = (rows147.map(_._2).min, rows147.map(_._2).max)
    val (ymin, ymax) = (rows147.map(_._3).min, rows147.map(_._3).max)
    def sc(v: Long, lo: Long, hi: Long): Long =
      (v - lo) * 1023 / math.max(hi - lo, 1L)
    rows147.foreach { case (_, x, y, z) =>
      val e = morton(sc(x, xmin, xmax), sc(y, ymin, ymax))
      assert(z == e, s"z($x,$y)=$z != $e")
    }
    // layout quality: average per-partition span of each key under the
    // z-cluster vs a range partition on x alone (same partition count)
    val orders = sources.Tables(spark, sf, "orders")
      .select($"o_custkey".as("x"),
        datediff(to_date($"o_orderdate"), lit("1970-01-01"))
          .cast("long").as("y"))
    def spans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val s = df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
        .agg(avg($"sx"), avg($"sy")).head()
      (s.getDouble(0), s.getDouble(1))
    }
    val (gx, gy) = {
      val r = orders.agg(max($"x") - min($"x"), max($"y") - min($"y")).head()
      (r.getLong(0).toDouble, r.getLong(1).toDouble)
    }
    val (zx, zy) = spans(ZOrder.cluster(orders, $"x", $"y", 10, 8))
    val (_, xy) = spans(orders.repartitionByRange(8, $"x").sortWithinPartitions("x"))
    assert(zx < 0.7 * gx, s"z-cluster x-span $zx not localized vs $gx")
    assert(zy < 0.7 * gy, s"z-cluster y-span $zy not localized vs $gy")
    assert(xy > 0.9 * gy,
      s"x-only sort should leave y unlocalized (got $xy vs $gy)")
    assert(zy < 0.8 * xy,
      s"z-cluster must beat the single-key sort on the second key")
  }

  test("q148: the literal clamp pushes a WindowGroupLimit and the " +
    "kept set matches a from-scratch per-source recomputation") {
    val df = queries.TextQueries.q148.fn(spark, sf)
    assert(df.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"),
      "stage-1 literal clamp must push a group limit")
    val got = df.collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"source", $"n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val exp = docs.groupBy(_._2).map { case (src, rs) =>
      val cap = math.min(40, math.max(5, math.ceil(rs.length * 0.2).toInt))
      val kept = rs.sortBy { case (id, _, nc) => (-nc, id) }.take(cap)
      src -> ((rs.length.toLong, cap, kept.length.toLong,
        kept.map(_._3).sum))
    }
    assert(got == exp, s"per-source quota mismatch:\n$got\nvs\n$exp")
  }

  test("q149: bucket selection equals the naive global per-stratum " +
    "rank, quotas are exact, and only the straddle bucket is sorted") {
    val df = queries.TextQueries.q149.fn(spark, sf)
    val got = rows(df)
    // naive single-window form (the semantics, not the scale shape)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    val naive = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang")
      .withColumn("rnk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")))
      .filter($"rnk" <= ceil($"n" * 0.1).cast("long"))
      .select("doc_id", "lang")
    assert(got == rows(naive), "bucket selection diverged from naive rank")
    // exact quotas per stratum
    val quota = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> math.ceil(r.getLong(1) * 0.1).toLong)
      .toMap
    val kept = df.collect().groupBy(_.getString(1)).map {
      case (l, rs) => l -> rs.length.toLong
    }
    assert(kept == quota, s"quota mismatch: $kept vs $quota")
  }

  private def bigramCounts(): Map[(String, String), Long] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select($"text").collect()
      .flatMap(_.getString(0).split(" ").sliding(2).collect {
        case Array(a, b) => (a, b)
      })
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("q152: three integer TextRank steps match an exact from-scratch " +
    "recomputation of the damped iteration") {
    val bc = bigramCounts()
    val e = (bc.toSeq ++ bc.toSeq.map { case ((a, b), c) => ((b, a), c) })
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val wu = e.toSeq.groupBy(_._1._1)
      .map { case (u, es) => u -> es.map(_._2).sum }
    val q = e.map { case ((u, v), w) =>
      (u, v) -> ((2 * BigInt(w) * 1000000 + wu(u)) / (2 * BigInt(wu(u))))
    }
    var m: Map[String, BigInt] = wu.map { case (u, _) => u -> BigInt(1000000) }
    for (_ <- 1 to 3) {
      val s = scala.collection.mutable.Map[String, BigInt]()
      q.foreach { case ((u, v), qq) =>
        s(v) = s.getOrElse(v, BigInt(0)) + m(u) * qq
      }
      m = s.toMap.map { case (v, sum) =>
        v -> (150000 + (34 * sum + 20000000) / 40000000)
      }
    }
    val exp = m.toSeq.sortBy { case (w, mm) => (-mm, w) }.take(30)
      .map { case (w, mm) => (w, mm.toLong) }
    val got = queries.Extras.q152.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exp, s"textrank mismatch:\n$got\nvs\n$exp")
  }

  test("q153: nucleus membership matches the smallest prefix covering " +
    "90% and the integer boundary test admits no off-by-one") {
    val bc = bigramCounts()
    val byPrefix = bc.toSeq.map { case ((a, b), c) => (a, b, c) }
      .groupBy(_._1)
    val exp = byPrefix.flatMap { case (w1, rs) =>
      val tot = rs.map(_._3).sum
      if (tot < 50) None
      else {
        val sorted = rs.sortBy { case (_, w2, c) => (-c, w2) }
        val cums = sorted.scanLeft(0L)(_ + _._3).tail
        val nucleus = sorted.zip(cums).filter {
          case ((_, _, c), cum) => 10 * (cum - c) < 9 * tot
        }
        Some(w1 -> ((rs.length.toLong, tot, nucleus.length.toLong,
          nucleus.map(_._1._3).sum)))
      }
    }
    val got = queries.Extras.q153.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == exp, s"nucleus mismatch:\n$got\nvs\n$exp")
    // the nucleus is the SMALLEST covering prefix: its mass reaches
    // 90% but dropping its last member falls below
    got.foreach { case (w1, (_, tot, size, mass)) =>
      assert(10 * mass >= 9 * tot, s"$w1 nucleus mass below p")
      val sorted = byPrefix(w1).sortBy { case (_, w2, c) => (-c, w2) }
      val withoutLast = sorted.take(size.toInt - 1).map(_._3).sum
      assert(10 * withoutLast < 9 * tot, s"$w1 nucleus not minimal")
    }
  }

  test("q154: exact per-dimension quartiles match an in-memory " +
    "linear-interpolation recomputation on the micro-quantized values") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    def quantile(xs: Array[Long], p: Double): Double = {
      val s = xs.sorted
      val pos = p * (s.length - 1)
      val lo = pos.toInt
      val f = pos - lo
      if (lo + 1 < s.length) (1 - f) * s(lo) + f * s(lo + 1)
      else s(lo).toDouble
    }
    val byDim = vecs.head.indices.map { d =>
      d -> vecs.map(v => math.round(v(d).toDouble * 1000000))
    }.toMap
    val got = queries.SimQueries.q154.fn(spark, sf).collect()
    assert(got.length == vecs.head.length)
    got.foreach { r =>
      val d = r.getInt(0)
      val xs = byDim(d)
      assert(r.getLong(1) == xs.length)
      assert(r.getDouble(2) == quantile(xs, 0.25), s"p25 dim $d")
      assert(r.getDouble(3) == quantile(xs, 0.5), s"p50 dim $d")
      assert(r.getDouble(4) == quantile(xs, 0.75), s"p75 dim $d")
      assert(r.getDouble(5) == r.getDouble(4) - r.getDouble(2))
    }
  }

  test("q155: per-language buckets are terciles with non-overlapping " +
    "cost ranges and cover every scored document") {
    val rs = queries.Extras.q155.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val byLang = rs.groupBy(_._1)
    val scored = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" % 10 =!= 0)
      .filter(size(split($"text", " ")) >= 2)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, bs) =>
      val m = bs.map(b => b._2 -> b).toMap
      assert(m.keySet == Set("head", "middle", "tail"), s"$lang buckets")
      val n = scored(lang)
      assert(bs.map(_._3).sum == n, s"$lang coverage")
      // the 3*rk <= n rule gives |head| = floor(n/3), |head|+|middle|
      // = floor(2n/3)
      assert(m("head")._3 == n / 3, s"$lang head size")
      assert(m("head")._3 + m("middle")._3 == 2 * n / 3,
        s"$lang middle size")
      // rank order is (cost, doc_id), so bucket cost ranges can touch
      // but never cross
      assert(m("head")._5 <= m("middle")._4, s"$lang head/middle")
      assert(m("middle")._5 <= m("tail")._4, s"$lang middle/tail")
    }
  }

  test("q156/keyframes: a static-scene payload collapses to one " +
    "keyframe per run and run lengths tile the frame stream") {
    import graft.multimodal.Multimodal
    // payload = AAAA… (3 frames) + BBBB… (2 frames) + AAAA… (1 frame):
    // three runs, lengths 3/2/1, the A-run and the trailing A frame
    // NOT merged (runs are consecutive, not global dedup)
    val a256 = "A" * 256
    val b256 = "B" * 256
    val text = a256 * 3 + b256 * 2 + a256
    val docs = spark.createDataFrame(Seq((1L, text, "en", "src", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.asMediaTable(docs)
    val frames = Multimodal.sampleFrames(media, 1)
    assert(frames.count() == 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    val wc = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val runs = frames
      .withColumn("is_new",
        when($"frame_fp" === lag("frame_fp", 1).over(w), 0L).otherwise(1L))
      .withColumn("run_id", sum("is_new").over(wc))
      .groupBy("media_id", "run_id")
      .agg(min("frame_idx").as("frame_idx"), count(lit(1)).as("run_len"))
      .collect().map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(runs.toSeq == Seq((0L, 3L), (3L, 2L), (5L, 1L)),
      s"runs were ${runs.toSeq}")
    // registry form on real data: run lengths tile every frame exactly
    val df = queries.MultimodalQueries.q156.fn(spark, sf)
    val totalRuns = df.agg(sum("run_len")).head().getLong(0)
    val totalFrames = Multimodal.sampleFrames(
      Multimodal.asMediaTable(
        spark.read.parquet(s"$sf/documents.parquet")), 1).count()
    assert(totalRuns == totalFrames, "run lengths must tile the stream")
  }

  test("q157/pair curation: kept set matches an independent " +
    "recomputation of both gates") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.abs(
          math.round(x.toDouble * 1000))).max)
      .toMap
    val exp = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").collect()
      .flatMap { r =>
        val id = r.getLong(0)
        val nt = r.getString(1).split(" ", -1).length
        vecs.get(id).collect {
          case peak if nt >= 25 && nt <= 80 && peak <= 350 => id
        }
      }.toSet
    val got = queries.MultimodalQueries.q157.fn(spark, sf)
      .select("pair_id").collect().map(_.getLong(0)).toSet
    assert(got == exp, s"pair curation kept ${got.size} vs ${exp.size}")
  }

  test("q159: capped waterfilling matches an exact from-scratch BigInt " +
    "recomputation and upholds the UniMax invariants") {
    // exact integer recomputation, mirroring the Spark split semantics
    // (split(text, ' ') keeps trailing empties -> split(" ", -1))
    val sz = spark.read.parquet(s"$sf/documents.parquet")
      .select($"lang", $"text").collect()
      .groupBy(_.getString(0)).view.mapValues(
        _.map(_.getString(1).split(" ", -1).length.toLong).sum).toMap
    val tot = sz.values.sum
    val b = 7 * tot / 4
    val ordered = sz.toSeq.map { case (l, s) => (l, s, 2 * s) }
      .sortBy { case (l, _, cap) => (cap, l) }
    val n = ordered.length
    // capped set = longest prefix (ascending cap) where every row's
    // "give everyone from here on my cap" bound stays within budget
    var p = 0L
    var broken = false
    val capped = ordered.zipWithIndex.map { case ((_, _, cap), i) =>
      val ok = cap * (n - i) + p <= b // n - i == n - (i+1) + 1
      p += cap
      broken ||= !ok
      !broken
    }
    val k = capped.count(identity)
    val pk = ordered.zip(capped).collect { case ((_, _, c), true) => c }.sum
    val share = if (n > k) (b - pk) / (n - k) else 0L
    val exp = ordered.zip(capped).map { case ((l, s, cap), isCap) =>
      val alloc = if (isCap) cap else share
      Vector[Any](l, s, cap, if (isCap) 1L else 0L, alloc,
        alloc * 1000000L / s)
    }.toSet
    val got = rows(queries.Extras.q159.fn(spark, sf))
    assert(got == exp, s"waterfilling diverged: $got vs $exp")
    // UniMax invariants: capped strata sit exactly at 2 epochs, the
    // uncapped share is strictly below every uncapped cap (else the
    // prefix would have grown), and the unallocated slack is < n - k
    exp.foreach { r =>
      val (cap, isCap, alloc) =
        (r(2).asInstanceOf[Long], r(3).asInstanceOf[Long],
          r(4).asInstanceOf[Long])
      if (isCap == 1L) assert(r(5) == 2000000L, s"capped stratum off-cap: $r")
      else {
        assert(alloc < cap, s"uncapped stratum at/over cap: $r")
        assert(alloc == share)
      }
    }
    val allocated = exp.toSeq.map(_(4).asInstanceOf[Long]).sum
    assert(allocated <= b, "allocation exceeds budget")
    if (n > k)
      assert(b - allocated < (n - k).toLong,
        s"slack ${b - allocated} exceeds the documented floor bound n-k-1")
  }

  test("q160: the bucketed PPS decomposition equals the naive global " +
    "prefix sum, hits total exactly n=100, and per-doc hits track " +
    "weight within one threshold") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang", $"source", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), md5hex(r.getLong(0).toString)))
      .sortBy(r => (r._5, r._1))
    val tw = docs.map(_._4).sum
    var cum = 0L
    val exp = docs.flatMap { case (id, lang, src, w, _) =>
      val mlo = (cum * 100 + tw - 1) / tw
      val mhi = ((cum + w) * 100 + tw - 1) / tw
      cum += w
      if (mhi > mlo) Some(Vector[Any](id, lang, src, w, mhi - mlo))
      else None
    }.toSet
    val got = rows(queries.Extras.q160.fn(spark, sf))
    assert(got == exp, "bucketed form diverged from naive global PPS")
    val hits = got.toSeq.map(_(4).asInstanceOf[Long])
    assert(hits.sum == 100L, s"systematic PPS must place exactly n: ${hits.sum}")
    got.foreach { r =>
      val (w, h) = (r(3).asInstanceOf[Long], r(4).asInstanceOf[Long])
      val ideal = w.toDouble * 100 / tw
      assert(math.abs(h - ideal) <= 1.0,
        s"hits $h off proportionality $ideal for weight $w")
    }
  }

  test("q160: selection is invariant under shuffle-partition count " +
    "(hash order is global, bucket decomposition leaves no " +
    "partition-order dependence)") {
    // cloned session (own SQLConf) + per-setting cache nonce so the
    // full lineage rebuilds under each conf — see the q128 invariance
    // test for why the nonce matters
    val base = rows(queries.Extras.q160.fn(spark, sf))
    val clone = spark.newSession()
    def run(): Set[Seq[Any]] = rows(queries.Extras.q160.fn(clone, sf))
    def atPartitions(n: Int): Set[Seq[Any]] = {
      clone.conf.set("spark.sql.shuffle.partitions", n.toString)
      Materialized.setNonceForTests(clone, s"q160inv$n")
      SessionScratch.setNonceForTests(clone, s"q160inv$n")
      try run()
      finally {
        Materialized.clear(clone)
        Materialized.clearNonceForTests(clone)
        SessionScratch.clearNonceForTests(clone)
      }
    }
    assert(atPartitions(7) == base, "result changed with 7 shuffle partitions")
    assert(atPartitions(13) == base, "result changed with 13 shuffle partitions")
  }
}
