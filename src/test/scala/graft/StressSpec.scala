package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph, TextAnalysis}
import graft.pipelines.CurationPipeline

/** Adversarial scale/skew stress tests for the heavy tier, over the
  * [[StressData]] generators: Zipf-skewed keys, a hub graph, a
  * boilerplate near-clique corpus. CI runs shape-and-correctness
  * assertions at reduced volume (the adversarial STRUCTURE is identical
  * at every scale — only row counts change); the measured near-linear
  * scaling runs live in the [[Stress]] main (see BASELINE.md's scaling
  * table) plus an env-gated test here (`SPARK_GRAFT_STRESS=1`).
  */
class StressSpec extends SparkSpec {

  test("corpus generator: blocks share templates, dup pairs exact, short docs junk") {
    val docs = StressData.corpus(spark, 200).cache()
    try {
      assert(docs.count() == 200)
      val byId = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // block 0 members share the 90-token template prefix verbatim
      val t0 = byId(0L).split(" ").take(90).toSeq
      assert(byId(2L).split(" ").take(90).toSeq == t0)
      assert(byId(37L).split(" ").take(90).toSeq == t0)
      // block 1 has a different template
      assert(byId(40L).split(" ").take(90).toSeq != t0)
      // id ≡ 1 (mod 50): exact duplicate of predecessor
      assert(byId(51L) == byId(50L))
      assert(byId(101L) == byId(100L))
      assert(byId(1L) == byId(0L))
      // id ≡ 9 (mod 10): 12 junk tokens, no stopwords → quality reject
      val short = byId(9L).split(" ")
      assert(short.length == 12 && short.forall(_.startsWith("w")))
      // long docs pass the quality gate, short docs fail it
      val q = TextAnalysis.qualityFeatures(docs, col("text"))
        .select(col("doc_id"), col("quality_score")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(q(0L) >= 0.5, q(0L))
      assert(q(9L) < 0.5, q(9L))
    } finally docs.unpersist()
  }

  test("connectedComponents: Zipf star components + a 200-chain converge exactly") {
    val n = 20000L
    val pairs = StressData.componentPairs(spark, n, nComp = 50, chainLen = 200)
      .cache()
    try {
      val comps = Dedup.connectedComponents(pairs, maxIter = 12).cache()
      // every endpoint is labeled
      val endpoints = pairs.select(col("doc_a").as("d"))
        .union(pairs.select(col("doc_b").as("d"))).distinct().count()
      assert(comps.count() == endpoints)
      // one component per populated star center, plus the chain
      val centers = pairs.filter(col("doc_b") < n + 50)
        .select("doc_b").distinct().count()
      assert(comps.select("component").distinct().count() == centers + 1)
      // the chain collapsed to ONE label despite diameter 200 — only the
      // pointer-jumping rounds can do that inside 12 iterations
      val chainBase = n + 50 + 10
      val chainComps = comps.filter(col("doc") >= chainBase)
        .select("component").distinct().count()
      assert(chainComps == 1L)
      // the hub component (Zipf rank 0) holds ~ln2/ln50 ≈ 17.7% of members
      val hubSize = comps.groupBy("component").count()
        .agg(max("count")).head().getLong(0)
      assert(hubSize > n / 10, s"hub component only $hubSize members")
      comps.unpersist()
    } finally pairs.unpersist()
  }

  test("pageRank: broadcast gate closed → shuffle-join plan; hub rank is max") {
    val edges = StressData.hubGraph(spark, nNodes = 5000,
      nRandomEdges = 30000, hubDegree = 2000)
    val ranks = Graph.pageRank(edges, "src", "dst", iters = 3,
      broadcastMaxNodes = 0L).cache()
    try {
      val plan = ranks.queryExecution.executedPlan.toString
      // the at-scale plan: NO |V|-sized broadcast anywhere
      assert(!plan.contains("BroadcastHashJoin"), plan.take(1500))
      val top = ranks.orderBy(col("rank_unit").desc).head()
      assert(top.getLong(0) == 0L,
        s"hub (2000 in-spokes) must out-rank everything, got node ${top.getLong(0)}")
      assert(ranks.filter(col("rank_unit") <= 0).count() == 0)
    } finally ranks.unpersist()
  }

  test("labelPropagation: broadcast gate closed; hub community absorbs the spokes") {
    val edges = StressData.hubGraph(spark, nNodes = 5000,
      nRandomEdges = 30000, hubDegree = 2000)
    val lp = Graph.labelPropagation(edges, "src", "dst", iters = 3,
      broadcastMaxNodes = 0L).cache()
    try {
      val plan = lp.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan.take(1500))
      // all pure spokes see identical neighborhoods each synchronous
      // round, so the modal community must cover at least half the hub's
      // spoke count whatever the (deterministic) oscillation lands on
      val modal = lp.groupBy("community").count().agg(max("count"))
        .head().getLong(0)
      assert(modal >= 1000L, s"modal community only $modal nodes")
    } finally lp.unpersist()
  }

  test("triangleCounts: 2000-spoke hub + planted K8 counted exactly") {
    // star into the hub contributes NO triangles; the K8 clique's nodes
    // each close 21 internal triangles + 7 through the hub (every clique
    // node is also a spoke), and the hub closes the 28 clique pairs
    val star = spark.range(2000).select((col("id") + 1).as("src"),
      lit(0L).as("dst"))
    val k8 = spark.range(64).select(
      (expr("id div 8") + 100).as("src"), (col("id") % 8 + 100).as("dst"))
      .filter(col("src") < col("dst"))
    val tri = Graph.triangleCounts(star.union(k8), "src", "dst",
      broadcastMaxEdges = 0L).cache()
    try {
      val byNode = tri.collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(byNode(0L) == 28L, s"hub: ${byNode(0L)}")
      assert(byNode(103L) == 28L, s"clique node: ${byNode(103L)}")
      assert(byNode(55L) == 0L, s"pure spoke: ${byNode(55L)}")
    } finally tri.unpersist()
  }

  test("kCore: star spokes peel in round 1; survivors had degree >= k; paths agree") {
    import spark.implicits._
    // 20k nodes, 20k Zipf edges + a 500-spoke star into node 0: sparse
    // enough that degree-1 nodes exist (deterministic hash data)
    val edges = StressData.hubGraph(spark, 20000, 20000, 500).cache()
    try {
      val out = Graph.kCore(edges, "src", "dst", k = 3, rounds = 5,
        broadcastMaxNodes = 0L)
        .as[(Long, Long)].collect().toMap
      // initial symmetric degree per node
      val sym = edges.select(col("src").as("u"), col("dst").as("v"))
        .union(edges.select(col("dst").as("u"), col("src").as("v")))
        .filter(col("u") =!= col("v")).distinct()
      val deg = sym.groupBy("u").agg(count(lit(1)).as("d"))
        .as[(Long, Long)].collect().toMap
      // a peel can only remove nodes: every survivor had degree >= k
      // BEFORE any peel (necessary condition; the cascade may remove
      // more), and every degree-1 pure spoke is gone
      assert(out.keys.forall(n => deg(n) >= 3L), "survivor with degree < 3")
      val spokes = deg.filter(_._2 == 1L).keys
      assert(spokes.nonEmpty && spokes.forall(!out.contains(_)))
      assert(out.nonEmpty, "Zipf core must survive")
      // the size-gated broadcast path is bit-identical on the same graph
      val viaBroadcast = Graph.kCore(edges, "src", "dst", k = 3, rounds = 5)
        .as[(Long, Long)].collect().toMap
      assert(viaBroadcast == out)
    } finally edges.unpersist()
  }

  test("duplicateSpans: per-block template surfaces as one exact span per doc") {
    val docs = StressData.corpus(spark, 400)
    val spans = Dedup.duplicateSpans(docs, "doc_id", col("text"), k = 8)
      .cache()
    try {
      // doc 2: plain doc (not short, not an exact-dup pair) — its template
      // windows (positions 0..82 of the 90-token template, k=8) repeat
      // across the block's 36 long docs; the unique tail contributes none
      val d2 = spans.filter(col("doc") === 2L).collect()
      assert(d2.length == 1, d2.mkString(";"))
      assert(d2.head.getLong(2) == 0L && d2.head.getLong(3) == 89L,
        d2.head.toString)
      assert(d2.head.getLong(4) == 83L, d2.head.toString)
      // docs 50/51 are exact duplicates: the WHOLE doc is one span
      val d51 = spans.filter(col("doc") === 51L).collect()
      assert(d51.length == 1 && d51.head.getLong(3) == 119L,
        d51.mkString(";"))
      // short junk docs (5 windows each, unique) produce no spans
      assert(spans.filter(col("doc") === 9L).count() == 0)
    } finally spans.unpersist()
  }

  test("sparseCosinePairs: near-clique blocks stay inside the df band") {
    val docs = StressData.corpus(spark, 400)
    val pairs = TextAnalysis.sparseCosinePairs(docs, "doc_id", col("text"),
      ngram = 3, maxDf = 64, topK = 50).cache()
    try {
      val plan = pairs.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
      val rows = pairs.collect()
      assert(rows.length == 50)
      // high-similarity pairs must be within-block (shared template);
      // block templates have df=36 ≤ maxDf so the band KEEPS them
      def blk(id: Long) = id / 40
      rows.filter(_.getDouble(3) >= 0.3).foreach { r =>
        assert(blk(r.getLong(0)) == blk(r.getLong(1)), r.toString)
      }
      assert(rows.count(_.getDouble(3) >= 0.3) >= 40, rows.take(5).mkString(";"))
    } finally pairs.unpersist()
  }

  test("curation funnel: every adversarial doc dispositioned exactly once") {
    val docs = StressData.corpus(spark, 800)
    val eval = StressData.evalDocs(docs)
    // 32 perms / 8 bands: see the Stress harness note — at within-block
    // Jaccard ≈ 0.6 the default 16/4 signature legitimately recalls only
    // ~half the pairs (measured: 466 near-dups of the ~684 reachable);
    // the wider signature connects the blocks so the assertions below
    // can pin the funnel's structure tightly
    val disp = CurationPipeline.dispositions(docs, eval,
      CurationPipeline.Config(minhashPerms = 32, minhashBands = 8)).cache()
    try {
      assert(disp.count() == 800)
      assert(disp.select("doc_id").distinct().count() == 800)
      val stages = disp.groupBy("stage").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // 10% junk docs die at the quality gate — nowhere else
      assert(stages("quality") == 80L, stages.toString)
      // id ≡ 1 (mod 50): 16 exact-dup followers (d1..d751)
      assert(stages("exact_dup") == 16L, stages.toString)
      // each 40-block keeps one canonical; the rest are near-dups (the
      // 16 exact-dups were already taken by the earlier stage)
      // deterministic at 800 docs: 638 near-dups (the ~46 docs whose
      // band mins all fall on tail shingles stay isolated — expected LSH
      // recall behavior), 18 contaminated, 48 kept; bounds allow drift if
      // hash or parameter plumbing changes legitimately
      assert(stages.getOrElse("near_dup", 0L) >= 600L &&
        stages.getOrElse("near_dup", 0L) <= 690L, stages.toString)
      // eval docs are blocks 0-4's templates → those blocks' survivors
      // fall to decontamination
      assert(stages.getOrElse("contaminated", 0L) >= 1L &&
        stages.getOrElse("contaminated", 0L) <= 30L, stages.toString)
      assert(stages.getOrElse("kept", 0L) >= 10L &&
        stages.getOrElse("kept", 0L) <= 80L, stages.toString)
      // kept docs carry redacted text; dropped docs carry none
      assert(disp.filter(col("stage") === "kept" &&
        col("clean_text").isNull).count() == 0)
      assert(disp.filter(col("stage") =!= "kept" &&
        col("clean_text").isNotNull).count() == 0)
    } finally disp.unpersist()
  }

  test("passageClusters: footer boilerplate capped, blocks never split") {
    val docs = StressData.corpus(spark, 400)
      .withColumn("text", StressData.footerSpike(col("text"), col("doc_id")))
    // cap 100 < the 134 footer-spiked docs: footer fingerprints are
    // boilerplate and must not edge
    val capped = Dedup.passageClusters(docs, "doc_id", col("text"),
      maxPostings = 100).cache()
    try {
      // every long doc clusters via its block template (400 - 40 junk);
      // footer-only (junk+footer) docs contribute nothing
      assert(capped.count() == 360L)
      // a block is never SPLIT: each 40-block's long docs share exactly
      // one component...
      val perBlock = capped.groupBy(expr("doc div 40").as("blk"))
        .agg(countDistinct(col("component")).as("nc"))
      assert(perBlock.filter(col("nc") =!= 1).count() == 0)
      // ...and stopword-4-gram coincidence merges blocks only modestly
      // (deterministic at this volume: 6 components — 4 singleton blocks
      // + a 2-merge + a 4-merge; bounds allow legitimate hash drift)
      val comps = capped.select("component").distinct().count()
      assert(comps >= 4 && comps <= 10, s"comps=$comps")
      // the cap is what prevents the footer glue: un-capped, the footer
      // fingerprints join EVERY spiked block into one giant component
      val loose = Dedup.passageClusters(docs, "doc_id", col("text"),
        maxPostings = 100000)
      assert(loose.select("component").distinct().count() == 1L)
      assert(loose.count() > 360L) // junk+footer docs now edge in too
    } finally capped.unpersist()
  }

  test("prefixFilterJoin: clone family capped, block pairs untouched") {
    import spark.implicits._
    // 560 docs -> exactly 80 clones (id ≡ 4 mod 7); block template dfs
    // stay ≤ 40, clone shingle dfs = 80 — cap 50 separates the two
    val docs = StressData.corpus(spark, 560)
      .withColumn("text", StressData.cloneSpike(col("text"), col("doc_id")))
    def run(cap: Long) =
      Dedup.prefixFilterJoin(docs, "doc_id", col("text"),
        tauPct = 60, maxPostings = cap)
        .as[(Long, Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val capped = run(50L)
    val loose = run(100000L)
    val isClone = (id: Long) => id % 7 == 4
    // capped: the clone family's over-posted prefix tokens are dropped,
    // so NO clone participates in any pair (its only shingles are
    // family-wide) — the documented recall trade
    assert(capped.keys.forall { case (a, b) => !isClone(a) && !isClone(b) })
    assert(capped.nonEmpty, "block/dup pairs must still be found")
    // loose: exactly the same non-clone pairs PLUS all C(80,2) = 3160
    // clone pairs at Jaccard 1.0 — the quadratic blowup the cap stops
    val loosePairs = loose.keys.filter { case (a, b) => isClone(a) || isClone(b) }
    assert(loosePairs.size == 3160, s"got ${loosePairs.size}")
    assert(loosePairs.forall { case k => loose(k)._2 == 1.0 })
    assert(loose.filter { case (k, _) => !isClone(k._1) && !isClone(k._2) }
      == capped, "non-clone pairs must be cap-invariant")
  }

  test("fuzzySelfJoin: hot one-bucket cell capped, twin recall exact") {
    import spark.implicits._
    // 900 rows: 300 hot (one brand, ONE length bucket — the cell the
    // length band cannot split), 300 background twin pairs at exact
    // distance 1. Cap 120 excludes the 300-row hot cell; background
    // cells (25 brands × ~6 length buckets) stay far under it.
    val parts = StressData.partNames(spark, 900).cache()
    try {
      def run(cap: Int) =
        graft.operators.Relational.fuzzySelfJoin(parts, "key", "name",
            Seq("brand"), maxDist = 2, maxCell = cap)
          .as[(Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
      val capped = run(120)
      val isHot = (id: Long) => id % 3 == 0
      // capped: NO hot row participates in any pair — the documented
      // recall trade of the degenerate-cell guard
      assert(capped.keys.forall { case (a, b) => !isHot(a) && !isHot(b) })
      // every background twin (3k+1, 3k+2) is found, at distance 1,
      // and nothing else: cross-family hashed tokens sit past maxDist
      val twins = (0L until 300L).map(k => (3 * k + 1, 3 * k + 2)).toSet
      assert(capped.keys.toSet == twins,
        s"${(capped.keys.toSet -- twins).take(5)} extra / " +
          s"${(twins -- capped.keys.toSet).take(5)} missing")
      assert(capped.values.forall(_ == 1L))
      // loose cap: the hot cell joins in and mints quadratic pair mass
      // (near-identical digit strings within distance 2) — the blowup
      // the cap stops; background pairs are cap-invariant
      val loose = run(1000000)
      val hotPairs = loose.keys.filter { case (a, b) => isHot(a) || isHot(b) }
      assert(hotPairs.nonEmpty, "hot cell must mint pairs when un-capped")
      assert(loose.filter { case (k, _) => !isHot(k._1) && !isHot(k._2) }
        == capped, "background pairs must be cap-invariant")
    } finally parts.unpersist()
  }

  test("imageNearDup: placeholder bucket capped, twin recall exact") {
    import spark.implicits._
    // 900 real PNGs: 300 identical flat placeholders (dHash 0 — ONE
    // bucket in every band), 300 twin pairs at Hamming <= 3. Cap 120
    // excludes the 300-image placeholder bucket; per-family twins ride
    // in ~2-member buckets far under it.
    val imgs = StressData.imageCorpus(spark, 900).cache()
    try {
      def run(cap: Int) =
        graft.operators.Multimodal.imageNearDup(spark, imgs, "doc_id",
            maxBucket = cap)
          .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val capped = run(120)
      val isFlat = (id: Long) => id % 3 == 0
      // capped: no placeholder participates — the documented recall
      // trade of the degenerate-bucket guard
      assert(capped.forall { case (a, b) => !isFlat(a) && !isFlat(b) })
      // every planted twin (3k+1, 3k+2) found, nothing else:
      // cross-family grids sit ~32 bits apart
      val twins = (0L until 300L).map(k => (3 * k + 1, 3 * k + 2)).toSet
      assert(capped == twins,
        s"${(capped -- twins).take(5)} extra / " +
          s"${(twins -- capped).take(5)} missing")
      // loose cap: the placeholder family mints quadratic
      // zero-distance pair mass; background twins are cap-invariant
      val loose = run(1000000)
      val flatPairs = loose.filter { case (a, b) => isFlat(a) || isFlat(b) }
      assert(flatPairs.nonEmpty, "placeholder bucket must mint pairs un-capped")
      assert(loose.filter { case (a, b) => !isFlat(a) && !isFlat(b) }
        == capped, "background pairs must be cap-invariant")
    } finally imgs.unpersist()
  }

  test("audioNearDup: silent-clip bucket capped, twin recall exact") {
    import spark.implicits._
    // 900 real WAVs: 300 identical SILENT clips (envelope hash 0 — ONE
    // bucket in every band), 300 twin pairs at Hamming <= 3. Cap 120
    // excludes the silent bucket; per-family twins ride far under it.
    val wavs = StressData.audioCorpus(spark, 900).cache()
    try {
      def run(cap: Int) =
        graft.operators.Multimodal.audioNearDup(spark, wavs, "doc_id",
            maxBucket = cap)
          .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val capped = run(120)
      val isSilent = (id: Long) => id % 3 == 0
      assert(capped.forall { case (a, b) => !isSilent(a) && !isSilent(b) })
      val twins = (0L until 300L).map(k => (3 * k + 1, 3 * k + 2)).toSet
      assert(capped == twins,
        s"${(capped -- twins).take(5)} extra / " +
          s"${(twins -- capped).take(5)} missing")
      val loose = run(1000000)
      val silentPairs = loose.filter { case (a, b) => isSilent(a) || isSilent(b) }
      assert(silentPairs.nonEmpty, "silent bucket must mint pairs un-capped")
      assert(loose.filter { case (a, b) => !isSilent(a) && !isSilent(b) }
        == capped, "background pairs must be cap-invariant")
    } finally wavs.unpersist()
  }

  test("videoNearDup: decoy-flat-reel bucket capped, twin recall exact") {
    import spark.implicits._
    // 900 real AVIs: 300 open on the decoy-flat frame (dHash 0 — ONE
    // bucket in every band), 300 twin pairs at Hamming <= 3.
    val avis = StressData.videoCorpus(spark, 900).cache()
    try {
      def run(cap: Int) =
        graft.operators.Multimodal.videoNearDup(spark, avis, "doc_id",
            maxBucket = cap)
          .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val capped = run(120)
      val isFlat = (id: Long) => id % 3 == 0
      assert(capped.forall { case (a, b) => !isFlat(a) && !isFlat(b) })
      val twins = (0L until 300L).map(k => (3 * k + 1, 3 * k + 2)).toSet
      assert(capped == twins,
        s"${(capped -- twins).take(5)} extra / " +
          s"${(twins -- capped).take(5)} missing")
      val loose = run(1000000)
      val flatPairs = loose.filter { case (a, b) => isFlat(a) || isFlat(b) }
      assert(flatPairs.nonEmpty, "flat-reel bucket must mint pairs un-capped")
      assert(loose.filter { case (a, b) => !isFlat(a) && !isFlat(b) }
        == capped, "background pairs must be cap-invariant")
    } finally avis.unpersist()
  }

  test("media decode throughput survives 32-thread parallelism (per-call global-lock guard)") {
    // The q203 class: AudioSystem.getAudioInputStream held a global
    // provider-registry lock on EVERY call — 0.3 ms/payload alone,
    // 5.6 ms/payload at 32 threads (~19x). Single-threaded
    // microbenchmarks CANNOT see this; this guard decodes the same
    // payload set on 1 thread and on min(32, cores) threads and bounds
    // the per-payload slowdown at 10x (a per-call global lock
    // serializes all threads => ~threads x; CPU contention from
    // parallel CI suites stays well under the bound).
    val threads = math.min(32, Runtime.getRuntime.availableProcessors)
    assume(threads >= 8, s"need >=8 cores for a meaningful guard, have $threads")
    val wavs = (0 until 32).map(i => graft.operators.Multimodal.wavFixture(i))
    val avis = (0 until 32).map(i => graft.operators.Multimodal.aviFixture(i))
    val mp4s = (0 until 32).map(i => graft.operators.Multimodal.mjpegFixture(i))
    def decodeAudio(b: Array[Byte]): Unit =
      assert(graft.operators.Multimodal.decodeWavSamples(b).nonEmpty)
    def decodeVideo(b: Array[Byte]): Unit =
      assert(graft.operators.Multimodal.videoKeyFrame(b).nonEmpty)
    def perPayloadNanos(ps: Seq[Array[Byte]], decode: Array[Byte] => Unit,
        nThreads: Int, reps: Int): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
      try {
        val t0 = System.nanoTime()
        val futs = (0 until nThreads).map { _ =>
          pool.submit(new Runnable {
            def run(): Unit = {
              var r = 0
              while (r < reps) { ps.foreach(decode); r += 1 }
            }
          })
        }
        futs.foreach(_.get())
        // all threads run concurrently: lock-free decode keeps the
        // wall near the single-thread wall; a global lock multiplies
        // it by ~nThreads
        (System.nanoTime() - t0).toDouble / (reps.toLong * ps.size)
      } finally pool.shutdown()
    }
    for ((name, ps, dec) <- Seq(
        ("audio", wavs, decodeAudio _),
        ("video-avi", avis, decodeVideo _),
        ("video-mp4", mp4s, decodeVideo _))) {
      ps.foreach(dec) // warm: codecs, JIT
      val t1 = perPayloadNanos(ps, dec, 1, 4)
      val tN = perPayloadNanos(ps, dec, threads, 4)
      assert(tN <= 10.0 * t1,
        f"$name: ${tN / 1e6}%.2f ms/payload at $threads threads vs " +
          f"${t1 / 1e6}%.2f single-threaded (${tN / t1}%.1fx > 10x) — " +
          "a per-call global lock in the decode path")
    }
  }

  test("bitextMarginMine: anchor-cluster bucket capped, twin recall exact") {
    val emb = StressData.bitext(spark, 2000).cache()
    try {
      // both sides populated evenly
      assert(emb.groupBy("label").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap == Map(0 -> 1000L, 5 -> 1000L))
      def mine(cap: Int, minMargin: Long) =
        graft.operators.Similarity.bitextMarginMine(emb, col("label") < 5,
          k = 4, minMarginMicro = minMargin, nTables = 4, nBits = 8,
          dim = 64, maxBucket = cap)
      val out = mine(400, 1050000L).cache()
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
      // ALL 100 planted twins mined with the correct partner, near-unit
      // cosine and a margin far above the threshold
      val twins = out.filter(col("src_id") % 20 === 6).cache()
      assert(twins.count() == 100L)
      assert(twins.filter(col("tgt_id") =!= col("src_id") + 1).count() == 0)
      val mins = twins.agg(min("cos_micro"), min("margin_micro")).head()
      assert(mins.getLong(0) > 990000L, mins.toString)
      assert(mins.getLong(1) > 1500000L, mins.toString)
      twins.unpersist()
      // the 600-member anchor cluster exceeds the 400 cap in every
      // table: its buckets contribute no candidates — only the few
      // members whose 1% noise leaks them into a NEIGHBORING bucket can
      // appear at all (deterministic here: 10 src + 10 tgt rows)
      val clusterRows = out.filter(col("src_id") % 10 < 3 ||
        col("tgt_id") % 10 < 3).count()
      assert(clusterRows <= 40L, s"clusterRows=$clusterRows")
      // non-vacuity: with the cap loose (and the margin gate open, since
      // intra-cluster margins hover at ~1), the cluster's srcs DO mine —
      // the cap, not geometry, is what suppresses them above
      val looseCluster = mine(100000, 0L)
        .filter(col("src_id") % 10 < 3).count()
      assert(looseCluster > 200L, s"looseCluster=$looseCluster")
      out.unpersist()
    } finally emb.unpersist()
  }

  test("bpeTrain: merge sequence is corpus-scale invariant; long-tail adversary shapes the vocab") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val corpus = StressData.bpeCorpus(spark, nDocs = 120, vocab = 300)
      .cache()
    // the adversary's contract: Zipf head short+frequent, tail long —
    // the pair-table mass (Σ len−1) must live in the rare tail
    val words = corpus.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(col("w"), col("c"), length(col("w")).as("len"))
      .as[(String, Long, Int)].collect()
    val frequent = words.sortBy(-_._2).take(10)
    val rare = words.sortBy(_._2).take(50)
    assert(frequent.map(_._3).max < rare.map(_._3).max,
      s"head ${frequent.map(_._3).toSeq} vs tail max ${rare.map(_._3).max}")
    assert(rare.map(_._3).max >= 30, "long-tail words not long")
    // merge DECISIONS are a property of the word distribution, not the
    // corpus size: doubling every document must reproduce the exact
    // merge sequence with exactly doubled counts — the invariant that
    // makes the 10x stress ratio measure data volume, not drift
    val m1 = TextAnalysis.bpeTrain(corpus, col("text"), nMerges = 6)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    val m2 = TextAnalysis.bpeTrain(corpus.union(corpus), col("text"),
        nMerges = 6)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(m1.length == 6 && m2.length == 6)
    assert(m1.map(m => (m._1, m._2, m._3)).toSeq ==
      m2.map(m => (m._1, m._2, m._3)).toSeq,
      s"merge sequence drifted:\n${m1.toSeq}\n${m2.toSeq}")
    assert(m1.zip(m2).forall { case (a, b) => b._4 == 2 * a._4 },
      "counts did not double")
    corpus.unpersist()
  }

  test("heavyHitters: MG counter cap binds on the hub tail, exact recovery vs brute force") {
    import spark.implicits._
    val corpus = StressData.corpus(spark, 600L)
    val toks = corpus.select(
      when(col("doc_id") % 3 === 0, lit("hub"))
        .otherwise(concat(lit("g"), (col("doc_id") % 16).cast("string")))
        .as("grp"),
      explode(TextAnalysis.tokens(col("text"))).as("tok")).cache()
    try {
      val phi = 5000L
      val k = (1000000L / phi).toInt + 1 // 201
      // cap non-vacuity: the hub group's distinct-token tail exceeds
      // the counter budget, so MG genuinely shrinks mid-stream
      val hubDistinct = toks.filter(col("grp") === "hub")
        .select("tok").distinct().count()
      assert(hubDistinct > k, s"tail $hubDistinct <= k=$k — adversary toothless")
      // the state discipline: the candidate array itself is <= k
      val nCands = toks.filter(col("grp") === "hub")
        .groupBy()
        .agg(graft.functions.Native.misraGriesCandidates(col("tok"), k)
          .as("c"))
        .select(size(col("c"))).as[Int].head()
      assert(nCands <= k && nCands > 0, s"candidates $nCands vs k=$k")
      // exact recovery: the declared output equals brute force
      val out = graft.operators.Sketches.heavyHitters(
          toks, Seq("grp"), col("tok"), phi)
        .select("grp", "item", "freq").as[(String, String, Long)]
        .collect().toSet
      val brute = toks.groupBy("grp", "tok").agg(count(lit(1)).as("freq"))
        .join(toks.groupBy("grp").agg(count(lit(1)).as("n")), "grp")
        .filter(col("freq") >=
          greatest(lit(1L), expr("(n * 5000 + 999999) div 1000000")))
        .select(col("grp"), col("tok"), col("freq"))
        .as[(String, String, Long)].collect().toSet
      assert(out == brute, s"${out.size} vs brute ${brute.size}")
      assert(out.nonEmpty && out.exists(_._1 == "hub"))
    } finally toks.unpersist()
  }

  test("measured near-linear scaling (env-gated: SPARK_GRAFT_STRESS=1)") {
    assume(sys.env.get("SPARK_GRAFT_STRESS").contains("1"),
      "manual: set SPARK_GRAFT_STRESS=1 (full run: sbt 'runMain graft.Stress')")
    val ms = Stress.runAll(spark, Seq(1, 3))
    val graded = Stress.grade(ms)
    graded.foreach { case (op, ratio, bound, ok) =>
      info(f"$op: t(3x)/t(1x) = $ratio%.2f (bound $bound%.2f)")
      assert(ok, f"$op scaled super-linearly: $ratio%.2f > $bound%.2f")
    }
  }
}
