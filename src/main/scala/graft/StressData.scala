package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic adversarial-scale input generators for the stress
  * harness ([[Stress]], StressSpec). Every sf0.1 bench stage is
  * sub-second, so the 100×-scale claims about the heavy tier (graph
  * iteration, banded dedup, df-bounded cosine, the curation funnel)
  * otherwise rest on plan reading alone — these generators produce the
  * failure shapes plan reading can miss, at ~10× bench volume:
  *
  *   - Zipf-skewed keys everywhere (token frequencies, edge sources,
  *     component sizes follow pmf ∝ 1/rank): a uniform generator never
  *     exercises the skew handling.
  *   - one ~10⁵-degree hub (the star component / star edges): a single
  *     reduce-side key that would OOM a naive per-key buffer.
  *   - a boilerplate-heavy near-clique corpus (blocks of `cliqueSize`
  *     docs sharing a long template): the quadratic-candidate trap for
  *     MinHash banding, inverted-index cosine, and duplicate-window
  *     frequency tables.
  *
  * Determinism: all randomness derives from `xxhash64` over (id, salt)
  * — pure Column expressions, distributed generation, bit-identical
  * across runs/partitionings, no driver-side RNG (`Math.random` is
  * banned repo-wide for exactly this reason).
  */
object StressData {

  /** Stopword head of the vocabulary: the top Zipf ranks map to real
    * function words so [[graft.operators.TextAnalysis.qualityFeatures]]
    * sees realistic stopword ratios (the funnel's quality gate must
    * PASS the long docs — an all-junk corpus would short-circuit the
    * whole funnel at stage 1 and stress nothing). */
  private val stopWords = Seq("the", "of", "and", "to", "in", "is", "a", "that")
  private val stopArr = array(stopWords.map(lit): _*)

  /** Uniform [0,1) from a 64-bit avalanche of the given columns. */
  private def u01(cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(1000003L)).cast("double") / 1000003.0

  /** Zipf(s≈1) rank in [0, k): `floor(k^u) - 1` has
    * P(rank = r) = ln((r+2)/(r+1))/ln(k) ≈ 1/((r+1)·ln k) — the
    * classic inverse-CDF trick, exact enough for skew stress and far
    * cheaper than a harmonic-number search. */
  def zipfRank(k: Long, cols: Column*): Column =
    (floor(pow(lit(k.toDouble), u01(cols: _*))) - 1).cast("long")

  private def word(rank: Column): Column =
    when(rank < stopWords.size, element_at(stopArr, (rank + 1).cast("int")))
      .otherwise(concat(lit("w"), rank))

  private def tokenArray(seed: Column, len: Int, vocab: Int, salt: Int): Column =
    transform(sequence(lit(0), lit(len - 1)),
      i => word(zipfRank(vocab, seed, i, lit(salt))))

  /** Junk tokens that can never be stopwords — short docs built from
    * these score `0.5·(len/64)` on the quality gate and are DROPPED
    * below 64 tokens, giving the funnel a real quality-reject stream. */
  private def junkArray(seed: Column, len: Int, vocab: Int, salt: Int): Column =
    transform(sequence(lit(0), lit(len - 1)),
      i => concat(lit("w"), zipfRank(vocab, seed, i, lit(salt)) + stopWords.size))

  /** Boilerplate-heavy corpus of `nDocs` docs (doc_id, text):
    *
    *   - docs arrive in blocks of `cliqueSize`; every doc in a block
    *     shares the block's `tmplLen`-token template verbatim and adds a
    *     `tailLen`-token unique tail → each block is a NEAR-CLIQUE for
    *     any similarity operator (pairwise Jaccard ≈ tmpl/(tmpl+2·tail))
    *     and a duplicated-window factory for [[graft.operators.Dedup.duplicateSpans]]
    *     (every in-template window repeats ~cliqueSize times);
    *   - docs with id ≡ 1 (mod 50) copy their predecessor's tail →
    *     EXACT duplicate pairs (~2%);
    *   - docs with id ≡ 9 (mod 10) are 12-token junk → quality rejects
    *     (~10%);
    *   - token ranks are Zipf over `vocab` with real stopwords at the
    *     head, so quality/langid features behave as on real text.
    */
  def corpus(spark: SparkSession, nDocs: Long, cliqueSize: Int = 40,
      tmplLen: Int = 90, tailLen: Int = 30, vocab: Int = 2000): DataFrame = {
    require(nDocs > 0 && cliqueSize >= 2 && tmplLen >= 1 && tailLen >= 1)
    spark.range(nDocs)
      .select(col("id"),
        expr(s"id div $cliqueSize").as("__blk"),
        (col("id") % 10 === 9).as("__short"),
        when(col("id") % 50 === 1, col("id") - 1).otherwise(col("id"))
          .as("__tail"))
      .select(
        col("id").as("doc_id"),
        when(col("__short"),
          concat_ws(" ", junkArray(col("__tail"), 12, vocab, 5)))
          .otherwise(concat_ws(" ",
            concat(tokenArray(col("__blk"), tmplLen, vocab, 7),
              tokenArray(col("__tail"), tailLen, vocab, 5)))).as("text"))
  }

  /** Benchmark-contamination probe set: the first five blocks'
    * canonical docs — their templates shingle-overlap every doc in
    * those blocks, so decontamination genuinely fires. */
  def evalDocs(corpus: DataFrame, cliqueSize: Int = 40): DataFrame =
    corpus.filter(col("doc_id").isin(
      (0 until 5).map(b => b.toLong * cliqueSize): _*))
      .select(col("text"))

  /** Corpus-wide boilerplate spike for [[graft.operators.Dedup.passageClusters]]
    * stress: every `every`-th doc gains the SAME 12-token footer — far
    * past the winnowing guarantee run (w+k-1 = 7), so all spiked docs
    * share footer fingerprints whose posting lists hold n/every docs.
    * Un-capped, those lists alone would mint O((n/every)²) candidate
    * pairs and glue a third of the corpus into one component; the
    * operator's `maxPostings` cap must classify them as boilerplate and
    * drop them, leaving only the within-block template edges. */
  def footerSpike(text: Column, idCol: Column, every: Int = 3): Column =
    concat(text, when(idCol % every === 0,
      lit(" corpus common footer nav alpha beta gamma delta epsilon " +
        "zeta eta theta")).otherwise(lit("")))

  /** Corpus-wide CLONE family for [[graft.operators.Dedup.prefixFilterJoin]]
    * stress: every `every`-th doc's text is REPLACED by one fixed
    * clone body. Unlike [[footerSpike]] (whose common shingles are the
    * most FREQUENT in each spiked doc and therefore never reach a
    * df-ascending prefix), a full-body clone leaves each clone doc
    * NOTHING BUT family-wide shingles — every prefix token's posting
    * list holds the whole family (n/every docs), and the un-capped
    * candidate join would mint O((n/every)²) pairs from each of ~13
    * prefix tokens. The operator's `maxPostings` cap must drop those
    * postings (trading away the clone-family recall, the documented
    * LSH-maxBucket-style trade) while the within-block template pairs
    * — whose prefix dfs stay at clique size — are untouched. */
  def cloneSpike(text: Column, idCol: Column, every: Int = 7): Column =
    when(idCol % every === 4,
      lit("clonebody alpha quartz nebula crimson ledger apex marrow " +
        "tundra sable onyx garnet cobalt umber verdigris"))
      .otherwise(text)

  /** BPE-trainer adversary (doc_id, text): Zipf word ranks with LONG
    * long-tail words. The trainer's per-round pair table is bounded by
    * the VOCABULARY's total symbol mass — Σ over distinct words of
    * (word length − 1) — so the stress must grow exactly that: rank-r
    * words spell `w<r>` plus a rank-keyed letter repeated 6 + r mod 32
    * times, putting the LENGTH in the rare tail (the Zipf head stays
    * short and frequent and drives the merge decisions, as in real
    * text where frequent words are short — Zipf's law of abbreviation).
    * Callers scale `vocab` WITH the corpus so the vocab-bounded round
    * tables genuinely grow at 10×; the corpus-sized work (one
    * word-frequency aggregate) grows with `nDocs` independently. */
  def bpeCorpus(spark: SparkSession, nDocs: Long, docLen: Int = 30,
      vocab: Int = 2000): DataFrame = {
    require(nDocs > 0 && docLen >= 1 && vocab >= 1)
    val letters = lit("abcdefghijklmnopqrstuvwxyz")
    spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(docLen - 1)), i => {
        val r = zipfRank(vocab, col("id"), i, lit(11))
        concat(lit("w"), r, array_join(
          transform(sequence(lit(1L), lit(6L) + pmod(r, lit(32L))),
            _ => element_at(split(letters, ""),
              (pmod(r, lit(26L)) + 1L).cast("int"))), ""))
      })).as("text"))
  }

  /** Bitext-mining embedding table (vec_id, embedding float[dim],
    * label) — label < 5 is the "source language" (even ids), >= 5 the
    * target (odd ids). Three deterministic populations:
    *
    *   - ~10% TRUE TWINS: id ≡ 6 (mod 20) is a source vector whose
    *     target twin id+1 is the same vector + 1% noise — cosine ≈ 1,
    *     co-bucketed in (nearly) every LSH table, margin far above any
    *     random pair: the mining ground truth;
    *   - 30% DEGENERATE CLUSTER (id ≡ 0,1,2 mod 10): one anchor vector
    *     + 1% noise, split evenly across both sides — every member
    *     shares every table's bucket, so membership is 0.3·n in each of
    *     the nTables buckets and the un-capped candidate join would be
    *     O(n²): the maxBucket adversary (the SimilaritySpec hub trick,
    *     at scale);
    *   - the rest: independent uniform vectors — background buckets
    *     whose population stays ~n/2^nBits.
    */
  def bitext(spark: SparkSession, n: Long, dim: Int = 64): DataFrame = {
    require(n >= 20 && dim >= 2)
    def noise(salt: Int, j: Column): Column =
      (u01(col("id"), j, lit(salt)) * 2 - 1) * 0.01
    def base(idc: Column, j: Column): Column =
      u01(idc, j, lit(17)) * 2 - 1
    def anchor(j: Column): Column = u01(j, lit(23)) * 2 - 1
    spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        (when(col("id") % 10 < 3, anchor(j) + noise(29, j))
          .when(col("id") % 20 === 7, base(col("id") - 1, j) + noise(31, j))
          .otherwise(base(col("id"), j))).cast("float")).as("embedding"),
      (col("id") % 2 * 5).cast("int").as("label"))
  }

  /** Directed graph with Zipf-skewed out-degrees (src drawn Zipf over
    * the node space — node 0 sources ~10% of all random edges) plus a
    * `hubDegree`-spoke star INTO node 0 (spoke i → hub), so one
    * reduce-side key receives ~hubDegree PageRank contributions and
    * ~hubDegree label votes per iteration — the aggregation-skew shape
    * a per-key buffer would die on and a map-side-partial sum absorbs. */
  def hubGraph(spark: SparkSession, nNodes: Long, nRandomEdges: Long,
      hubDegree: Long): DataFrame = {
    require(hubDegree < nNodes && nNodes >= 2)
    val rnd = spark.range(nRandomEdges).select(
      zipfRank(nNodes, col("id"), lit(1)).as("src"),
      pmod(xxhash64(col("id"), lit(2)), lit(nNodes)).as("dst"))
    val star = spark.range(hubDegree).select(
      (col("id") + 1).as("src"), lit(0L).as("dst"))
    rnd.union(star).filter(col("src") =!= col("dst"))
  }

  /** Candidate-pair table for [[graft.operators.Dedup.connectedComponents]]
    * stress: each of `n` member docs attaches to one of `nComp` star
    * centers drawn Zipf — component SIZES are Zipf-distributed, and the
    * top component holds ~n·ln2/ln(nComp) members (≈10⁵ at the full
    * stress scale): one label receives a 10⁵-row neighborhood-min every
    * round. A fixed `chainLen`-node path is appended as the DIAMETER
    * adversary — it converges only through the pointer-jumping rounds
    * (plain min-propagation would need chainLen iterations). */
  def componentPairs(spark: SparkSession, n: Long, nComp: Int = 1000,
      chainLen: Int = 200): DataFrame = {
    require(n > 0 && nComp >= 1 && chainLen >= 2)
    val stars = spark.range(n).select(col("id").as("doc_a"),
      (lit(n) + zipfRank(nComp, col("id"), lit(11))).as("doc_b"))
    val base = n + nComp + 10
    val chain = spark.range(chainLen - 1).select(
      (col("id") + base).as("doc_a"), (col("id") + base + 1).as("doc_b"))
    stars.union(chain)
  }

  /** Part-name catalog for the blocked-fuzzy-join / entity-resolution
    * stress ([[graft.operators.Relational.fuzzySelfJoin]]):
    *
    *   - ids ≡ 0 (mod 3) — n/3 rows — belong to ONE hot brand and share
    *     ONE exact name length (only the embedded zero-padded id
    *     varies), so the whole hot brand is a single (block,
    *     length-bucket) CELL the length band cannot split: the
    *     O(cell²) adversary the `maxCell` guard exists for. Un-capped,
    *     that cell alone is ~(n/3)²/2 thresholded-DP probes (and the
    *     near-identical digit strings pass the cheap guards, so most
    *     probes PAY the DP);
    *   - ids 3k+1 / 3k+2 are a background TYPO TWIN: same brand (drawn
    *     from a brand space that scales with n, holding background
    *     cells at ~bounded size), same base name with a length spread
    *     of k mod 18 pad chars (≈6 length buckets per brand), the odd
    *     twin's last char mutated → every twin pair is a guaranteed
    *     distance-1 match in one cell, and cross-family names in the
    *     same cell embed hashed 9-digit family tokens that differ in
    *     ~8 digit positions — far past maxDist — so the DP load is
    *     real but the match set is exactly the twins.
    */
  def partNames(spark: SparkSession, n: Long): DataFrame = {
    require(n >= 30)
    val nBrands = math.max(25L, n / 900L)
    val fam = expr("id div 3")
    spark.range(n).select(
      col("id").as("key"),
      when(col("id") % 3 === 0, lit("BrandHot"))
        .otherwise(concat(lit("Brand#"), pmod(fam, lit(nBrands))))
        .as("brand"),
      when(col("id") % 3 === 0,
        concat(lit("hotunit "), lpad(col("id").cast("string"), 12, "0"),
          lit(" rev0")))
        .otherwise(concat(
          lit("component c"),
          lpad(pmod(xxhash64(fam, lit(53)), lit(1000000000L))
            .cast("string"), 9, "0"),
          lit(" unit"),
          repeat(lit("x"), pmod(fam, lit(18)).cast("int")),
          when(col("id") % 3 === 2, lit("q")).otherwise(lit("z"))))
        .as("name"))
  }

  /** Image-payload corpus for the perceptual-hash near-dup stress
    * ([[graft.operators.Multimodal.imageNearDup]]) — real PNGs, muxed
    * and later decoded through the same `javax.imageio` path the
    * operator uses:
    *
    *   - ids ≡ 0 (mod 3) — n/3 docs — are the PLACEHOLDER family: the
    *     IDENTICAL flat image (every dHash bit 0), the single most
    *     common real-world image-dedup adversary (default avatars,
    *     tracking pixels, gray thumbnails). All n/3 land in ONE band
    *     bucket in EVERY band, so un-capped the bucket mints
    *     O((n/3)²) zero-distance pairs; `maxBucket` must bind.
    *   - ids 3k+1 / 3k+2 are background TWINS: a per-family random
    *     8×9-block grid (md5-derived, ~32 bits apart across families)
    *     with the odd twin's top-left three blocks re-drawn — Hamming
    *     ≤ 3, the guaranteed-recall radius — so exactly one planted
    *     pair per family must survive the cap.
    *
    * JVM-side mux (not Column expressions like the siblings): the
    * payload IS the adversary here and must be real bytes; determinism
    * comes from [[graft.functions.Hashing.hexLongJvm]] over (family,
    * cell), no RNG. */
  def imageCorpus(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    require(n >= 3)
    spark.range(n).select(col("id")).as[Long]
      .mapPartitions(_.map { id =>
        val bytes =
          if (id % 3 == 0) flatPng
          else {
            val fam = id / 3
            val twist = id % 3 == 2
            pngOf { (r, c) =>
              if (twist && r == 0 && c <= 2)
                (graft.functions.Hashing.hexLongJvm(
                  s"simg:$fam:twist:$c") % 256).toInt
              else
                (graft.functions.Hashing.hexLongJvm(
                  s"simg:$fam:$r:$c") % 256).toInt
            }
          }
        (id, bytes)
      }).toDF("doc_id", "payload")
  }

  /** Audio adversary — the [[imageCorpus]] shape for WAVs: every third
    * payload an identical SILENT clip (all-zero amplitude → envelope
    * hash 0 — the hold-music/dead-air mass of a crawled audio corpus,
    * ONE bucket in EVERY band at any scale), the rest per-family twin
    * pairs (ids 3k+1/3k+2 share family k's segment amplitudes except
    * segments 0–2 → Hamming ≤ 3). Real 16-bit PCM WAV bytes; the
    * stress decode path is the production
    * `decodeWavSamples` chunk walk, so the measurement carries decode
    * throughput as well as the banding join. */
  def audioCorpus(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    require(n >= 3)
    spark.range(n).select(col("id")).as[Long]
      .mapPartitions(_.map { id =>
        val bytes =
          if (id % 3 == 0) graft.operators.Multimodal.wavOf(_ => 0)
          else {
            val fam = id / 3
            val twist = id % 3 == 2
            graft.operators.Multimodal.wavOf { s =>
              (graft.functions.Hashing.hexLongJvm(
                if (twist && s <= 2) s"saud:$fam:twist:$s"
                else s"saud:$fam:$s") % 32768).toInt
            }
          }
        (id, bytes)
      }).toDF("doc_id", "payload")
  }

  /** Video adversary — every third payload an AVI whose frame 0 is the
    * same flat grid as the DECOY frame (dHash 0, identical across
    * docs: the test-pattern/placeholder-reel mass, ONE bucket in EVERY
    * band), the rest per-family twin reels (frame-0 grids under
    * "svid", ids 3k+1/3k+2 twisted in the top row's first three
    * blocks → Hamming ≤ 3). Real RIFF demux + PNG frame decode per
    * payload. */
  def videoCorpus(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    require(n >= 3)
    spark.range(n).select(col("id")).as[Long]
      .mapPartitions(_.map { id =>
        val frame0 =
          if (id % 3 == 0) graft.operators.Multimodal.pngGridOf((_, _) => 96)
          else {
            val fam = id / 3
            val twist = id % 3 == 2
            graft.operators.Multimodal.pngGridOf { (r, c) =>
              (graft.functions.Hashing.hexLongJvm(
                if (twist && r == 0 && c <= 2) s"svid:$fam:twist:$c"
                else s"svid:$fam:$r:$c") % 256).toInt
            }
          }
        (id, graft.operators.Multimodal.aviContainer(frame0))
      }).toDF("doc_id", "payload")
  }

  /** 72×64 RGB PNG of 8×8 constant gray blocks valued by `v(r, c)`. */
  private def pngOf(v: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(72, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 9) {
        val g = v(r, c) & 0xff
        val rgb = (g << 16) | (g << 8) | g
        var y = r * 8
        while (y < r * 8 + 8) {
          var x = c * 8
          while (x < c * 8 + 8) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        c += 1
      }
      r += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The one shared placeholder image (mid-gray everywhere → dHash 0). */
  private lazy val flatPng: Array[Byte] = pngOf((_, _) => 128)
}
