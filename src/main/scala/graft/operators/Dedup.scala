/** Deduplication operators for large-scale corpus curation.
  *
  * The reference's only dedup is keep-last-per-key
  * (/root/reference/lime_survey_orders_shipped.py:69-70 → Relational.keepLast);
  * this module adds the near-dup family a 100 TB training-data pipeline
  * needs: exact (hash groupBy), MinHash+LSH, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup.
  *
  * Scale notes (the design constraint throughout):
  *  - Nothing here is ever O(n²) over the corpus. Candidate generation is
  *    always an equi-join on a bucket key (band hash / simhash band / LSH
  *    bucket), i.e. one hash-partitioned shuffle; pair verification runs
  *    only within buckets.
  *  - Signatures are computed with built-in codegen'd expressions (md5/
  *    conv/aggregate/transform) — map-side, no UDF, no Python.
  *  - groupBy aggregations do map-side partial aggregation, so the shuffle
  *    carries one signature row per (doc, band), not one per shingle.
  */
package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.Hashing

object Dedup {

  /** Exact dedup: keep the smallest `idCol` per identical content hash.
    * One shuffle on the 128-bit fingerprint. */
  def exact(df: DataFrame, idCol: String, text: Column): DataFrame =
    df.withColumn("fp", Hashing.fingerprint(text))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash signature: `numPerm` independent 56-bit hash families over
    * word `k`-shingles; signature column `mh` = array of per-family
    * minima. Computed per row via `transform` over the shingle array —
    * no explode, no shuffle. */
  def minHashSignature(text: Column, k: Int, numPerm: Int): Column = {
    val sh = TextAnalysis.shingles(text, k)
    array((0 until numPerm).map { p =>
      aggregate(sh, lit(Long.MaxValue),
        (acc, s) => least(acc, Hashing.hexLongSeeded(s, p)))
    }: _*)
  }

  /** MinHash + LSH banding: docs sharing any band (of `bands` bands with
    * `numPerm/bands` rows each) become candidate pairs. Returns distinct
    * (a, b) with a < b.
    *
    * Plan shape: scan → map (signature+bands) → explode bands →
    * shuffle on (band_idx, band_hash) → within-bucket self-join →
    * distinct. The self-join is an equi-join, so at 1000 executors it is
    * a single co-partitioned shuffle; bucket sizes are bounded by band
    * selectivity (tune bands/rows for the target Jaccard threshold).
    */
  def minHashCandidates(df: DataFrame, idCol: String, text: Column,
      k: Int = 5, numPerm: Int = 16, bands: Int = 4): DataFrame = {
    val rows = numPerm / bands
    val sig = df.select(col(idCol).as("doc"),
      minHashSignature(text, k, numPerm).as("mh"))
    val banded = sig.select(col("doc"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band_idx"),
          md5(concat_ws(",", (0 until rows).map(r =>
            col("mh").getItem(b * rows + r)): _*)).as("band_hash"))
      }: _*)).as("band"))
      .select(col("doc"), col("band.band_idx"), col("band.band_hash"))
    val l = banded.as("l"); val r = banded.as("r")
    l.join(r, col("l.band_idx") === col("r.band_idx") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.doc") < col("r.doc"))
      .select(col("l.doc").as("doc_a"), col("r.doc").as("doc_b"))
      .distinct()
  }

  /** SimHash signatures: 56-bit locality-sensitive signature per doc —
    * bit i is the majority vote of bit i over the distinct-token hashes.
    * Near-dups differ in few bits.
    *
    * Shape: explode distinct tokens → hash once per token → groupBy doc
    * with 56 conditional-sum bit votes (map-side partial agg, so the
    * shuffle carries one 56-counter row per doc per partition, not one
    * row per token). A per-row expression tree would avoid the shuffle
    * but recompute the token md5 once per bit — 56× the hash work. */
  def simHashSignatures(df: DataFrame, idCol: String, text: Column,
      bits: Int = 56): DataFrame = {
    val hashed = df.select(col(idCol).as("doc"),
      explode(array_distinct(TextAnalysis.tokens(text))).as("tok"))
      .select(col("doc"), Hashing.hexLong(col("tok")).as("h"))
    val votes = (0 until bits).map { i =>
      sum(shiftright(col("h"), i).bitwiseAND(1) * 2 - 1).as(s"s$i")
    }
    val sig = (0 until bits).map { i =>
      when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    hashed.groupBy(col("doc")).agg(votes.head, votes.tail: _*)
      .select(col("doc"), sig.cast(org.apache.spark.sql.types.LongType).as("simhash"))
  }

  /** SimHash near-dup candidates: block on 4 × 14-bit sub-bands (docs
    * within Hamming distance 3 of each other share at least one band by
    * pigeonhole). Same equi-join shuffle shape as MinHash LSH. */
  def simHashCandidates(df: DataFrame, idCol: String, text: Column): DataFrame = {
    val sig = simHashSignatures(df, idCol, text)
      .withColumnRenamed("simhash", "sh")
    val banded = sig.select(col("doc"), col("sh"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band_idx"),
          shiftright(col("sh"), b * 14).bitwiseAND(0x3FFF).as("band_val"))
      }: _*)).as("band"))
      .select(col("doc"), col("sh"), col("band.band_idx"), col("band.band_val"))
    val l = banded.as("l"); val r = banded.as("r")
    l.join(r, col("l.band_idx") === col("r.band_idx") &&
        col("l.band_val") === col("r.band_val") &&
        col("l.doc") < col("r.doc"))
      .select(col("l.doc").as("doc_a"), col("r.doc").as("doc_b"),
        bit_count(col("l.sh").bitwiseXOR(col("r.sh"))).as("hamming"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for a candidate pair set (the
    * verify step after LSH banding): explode shingles, count
    * intersections via an equi-join on the shingle, divide by union. */
  def ngramJaccard(docs: DataFrame, idCol: String, text: Column,
      pairs: DataFrame, k: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("doc"),
      explode(TextAnalysis.shingles(text, k)).as("shingle"))
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val inter = pairs
      .join(sh.as("sa"), col("doc_a") === col("sa.doc"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc") &&
        col("sa.shingle") === col("sb.shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(sizes.as("za"), col("doc_a") === col("za.doc"))
      .join(sizes.as("zb"), col("doc_b") === col("zb.doc"))
      .select(col("doc_a"), col("doc_b"),
        round(col("n_inter").cast(DoubleType) /
          (col("za.n_sh") + col("zb.n_sh") - col("n_inter")), 6).as("jaccard"))
  }
}
