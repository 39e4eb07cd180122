package graft

import org.apache.spark.sql.functions._
import graft.operators.Bloom

class BloomSpec extends SparkSpec {
  import spark.implicits._

  val fact = (1 to 1000).map(i => (i.toLong, i * 10)).toDF("fk", "fv")
  val dim = Seq(3L, 7L, 500L, 999L).map(k => (k, s"d$k")).toDF("dk", "dv")

  test("prefilterJoin == plain join (false positives re-checked exactly)") {
    val plain = fact.join(dim, col("fk") === col("dk"))
      .as[(Long, Int, Long, String)].collect().toSet
    // tiny sketch + high fpp: false positives guaranteed plausible, and
    // the result must STILL equal the plain join
    val pre = Bloom.prefilterJoin(fact, dim, "fk", "dk",
      expectedKeys = 4, fpp = 0.5).as[(Long, Int, Long, String)].collect().toSet
    assert(pre == plain && plain.size == 4)
  }

  test("sketch probe has no false negatives and prunes most non-keys") {
    val bf = Bloom.keyBloom(dim, "dk", expectedKeys = 4, fpp = 0.01)
    val kept = fact.filter(Bloom.mightContain(bf, col("fk")))
      .as[(Long, Int)].collect().map(_._1).toSet
    assert(Set(3L, 7L, 500L, 999L).subsetOf(kept), "a true key must never be pruned")
    assert(kept.size < 100, s"1% fpp over 1000 probes should prune ~99%, kept ${kept.size}")
  }

  test("null fact keys are dropped by the probe, matching inner-join semantics") {
    val withNull = fact.select(
      when(col("fk") === 1L, lit(null).cast("long")).otherwise(col("fk")).as("fk"),
      col("fv"))
    val bf = Bloom.keyBloom(dim, "dk", expectedKeys = 4, fpp = 0.01)
    val kept = withNull.filter(Bloom.mightContain(bf, col("fk"))).collect()
    assert(!kept.exists(_.isNullAt(0)))
  }

  test("prefilterJoin works when fact and dim share the key column name") {
    // the natural-join-key case: both sides call the key "k" — the
    // internal dataset aliases must disambiguate the join condition
    val f2 = fact.withColumnRenamed("fk", "k")
    val d2 = dim.withColumnRenamed("dk", "k")
    val pre = Bloom.prefilterJoin(f2, d2, "k", "k", expectedKeys = 4)
    assert(pre.count() == 4)
    assert(pre.columns.toSeq == Seq("k", "fv", "k", "dv"))
  }

  test("probe survives both codegen and interpreted evaluation") {
    val bf = Bloom.keyBloom(dim, "dk", expectedKeys = 4, fpp = 0.01)
    val e = graft.functions.BloomKeyMightContain(
      graft.functions.Native.expr(lit(500L)), bf)
    assert(e.eval(null) == true) // interpreted path
    val viaPlan = spark.range(499, 502)
      .filter(Bloom.mightContain(bf, col("id"))) // codegen path
      .as[Long].collect().toSet
    assert(viaPlan.contains(500L))
  }
}
