package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.{BloomKeyMightContain, Native}

/** Bloom-filter semi-join reduction: probe the big (fact) side of a join
  * against a compact sketch of the small (dim) side's keys BEFORE the
  * shuffle, so rows that cannot match never enter the exchange.
  *
  * This is the static, guaranteed form of what AQE's runtime row-level
  * filtering does heuristically: at 100 TB a fact⋈dim join where the dim
  * filter keeps 1% of keys shuffles ~99% dead rows without a prefilter.
  * An exact broadcast semi-join achieves the same reduction but ships the
  * full key SET to every executor; the Bloom sketch is ~1.2 MB per
  * million keys at 1% fpp — two orders of magnitude smaller, with the
  * false-positive rows (bounded by fpp) re-checked exactly by the join
  * that follows, so the RESULT is bit-identical to the plain join.
  *
  * Building the sketch ([[keyBloom]]) is an eager aggregate job over the
  * dim side — a query-construction artifact like a model fit, run once
  * and reusable across queries; at scale you persist it next to the dim
  * table's snapshot version.
  */
object Bloom {

  /** Build the key sketch: one aggregate over `dim` (eager — see object
    * doc). `expectedKeys` sizes the bit array; overshooting wastes
    * memory linearly, undershooting inflates fpp — at scale pass the
    * dim table's key-count statistic. */
  def keyBloom(dim: DataFrame, keyCol: String, expectedKeys: Long,
      fpp: Double = 0.01): BloomFilter =
    dim.stat.bloomFilter(keyCol, expectedKeys, fpp)

  /** Codegen'd sketch probe on an integral key column. */
  def mightContain(bloom: BloomFilter, key: Column): Column =
    Native.column(BloomKeyMightContain(Native.expr(key.cast("long")), bloom))

  /** The fused form: build the sketch from `dim`, prefilter `fact`, then
    * the exact equi-join. Result == `fact.join(dim, fact(factKey) ===
    * dim(dimKey))` for any fpp; only the shuffle volume changes. */
  def prefilterJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bf = keyBloom(dim, dimKey, expectedKeys, fpp)
    // qualify both sides through dataset aliases: with a bare
    // col(factKey) === col(dimKey) an identically-named key (the common
    // case for a natural join key) is an ambiguous-reference
    // AnalysisException; the aliases disambiguate while leaving the
    // output schema exactly that of the plain join
    val f = fact.alias("__bloom_fact")
    val d = dim.alias("__bloom_dim")
    f.filter(mightContain(bf, col(s"__bloom_fact.$factKey")))
      .join(d, col(s"__bloom_fact.$factKey") === col(s"__bloom_dim.$dimKey"))
  }
}
