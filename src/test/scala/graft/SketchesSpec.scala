package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int, grp: String = "g") =
    (1 to n).map(i => (grp, s"user_$i")).toDF("g", "k")

  test("linearCountDistinct: accurate, duplicate-invariant, saturates to NULL") {
    val df = keys(500)
    val out = Sketches.linearCountDistinct(df, Seq("g"), col("k"))
      .select("registers_hit", "est_distinct").as[(Long, Double)].head()
    // 500 keys into 4096 registers: estimate within a few percent
    assert(math.abs(out._2 - 500) < 25, s"est ${out._2}")
    // the sketch property: duplicates change nothing
    val dup = Sketches.linearCountDistinct(df.union(df).union(df), Seq("g"),
      col("k")).select("est_distinct").as[Double].head()
    assert(dup == out._2)
    // m registers all hit -> NULL estimate, not a bogus number
    val sat = Sketches.linearCountDistinct(df, Seq("g"), col("k"), m = 16)
      .select("registers_hit", "est_distinct")
      .as[(Long, Option[Double])].head()
    assert(sat == ((16L, None)))
    // NULL keys carry no cardinality (COUNT(DISTINCT) semantics)
    val withNulls = df.union(Seq(("g", null.asInstanceOf[String]),
      ("g", null.asInstanceOf[String])).toDF("g", "k"))
    assert(Sketches.linearCountDistinct(withNulls, Seq("g"), col("k"))
      .select("registers_hit").as[Long].head() == out._1)
    assert(Sketches.hllDistinct(withNulls, Seq("g"), col("k"))
      .select("est_distinct").as[Double].head() ==
      Sketches.hllDistinct(df, Seq("g"), col("k"))
        .select("est_distinct").as[Double].head())
  }

  test("hllDistinct: 64 registers bound state, estimate within HLL error") {
    val df = keys(1000).union(keys(30, "small"))
    val out = Sketches.hllDistinct(df, Seq("g"), col("k"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("g")._1 <= 64)
    // m=64 -> ~13% std error; 3 sigma on a fixed hash is deterministic
    assert(math.abs(out("g")._2 - 1000) < 400, s"est ${out("g")._2}")
    // 30 keys leave empty registers -> small-range linear-counting path
    assert(out("small")._1 < 64 && math.abs(out("small")._2 - 30) < 10,
      s"small ${out("small")}")
    val dup = Sketches.hllDistinct(df.union(df), Seq("g"), col("k"))
      .filter($"g" === "g").select("est_distinct").as[Double].head()
    assert(dup == out("g")._2)
  }

  test("countMinEstimates: one-sided, exact without collisions, linear in counts") {
    val toks = (1 to 2000).map(i => s"tok_${i % 97}").toDF("t")
    val est = Sketches.countMinEstimates(toks, "t", d = 4, w = 64)
      .as[(String, Long, Long)].collect()
    assert(est.length == 97)
    // CMS never underestimates
    assert(est.forall { case (_, truth, cms) => cms >= truth })
    // 97 tokens into a wide-enough matrix: every estimate exact
    val wideE = Sketches.countMinEstimates(toks, "t", d = 4, w = 4096)
      .as[(String, Long, Long)].collect()
    assert(wideE.forall { case (_, truth, cms) => cms == truth })
    // doubling the stream exactly doubles every counter
    val twice = Sketches.countMinEstimates(toks.union(toks), "t", d = 4, w = 64)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(est.forall { case (t, _, cms) => twice(t) == 2 * cms })
  }

  test("hllOverlap: identical=1, subset union identity, merge equals one-shot sketch") {
    val rows =
      (1 to 300).map(i => ("a", s"u$i")) ++
      (301 to 600).map(i => ("b", s"u$i")) ++ // disjoint from a
      (1 to 300).map(i => ("c", s"u$i")) ++   // identical to a
      (1 to 150).map(i => ("d", s"u$i"))      // strict subset of a
    val df = rows.toDF("g", "k")
    val out = Sketches.hllOverlap(df, "g", col("k"))
      .as[(String, String, Double, Double, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(out.size == 6)
    // identical slices: union = both, intersection = either, jaccard 1
    val ac = out(("a", "c"))
    assert(ac._5 == ac._3 && ac._6 == ac._3 && ac._7 == 1.0, ac.toString)
    // subset: merging a strict subset leaves the registers unchanged
    val ad = out(("a", "d"))
    assert(ad._5 == ad._3, ad.toString)
    // disjoint slices: union well above either side, overlap small
    val ab = out(("a", "b"))
    assert(ab._5 > ab._3 && ab._5 > ab._4, ab.toString)
    assert(ab._7 < 0.4, s"disjoint jaccard too high: $ab")
    // mergeability is EXACT: the pair's union estimate equals the
    // one-shot sketch over the concatenated keys, bit for bit
    val oneShot = Sketches.hllDistinct(
        df.filter(col("g").isin("a", "b")).withColumn("g", lit("all")),
        Seq("g"), col("k"))
      .select("est_distinct").as[Double].head()
    assert(ab._5 == oneShot, s"${ab._5} vs $oneShot")
  }

  test("ddsketchKS: identical=0, disjoint=1, hand-checked partial gap, one-period group excluded") {
    def run(rows: Seq[(String, Boolean, Long)]) =
      Sketches.ddsketchKS(rows.toDF("g", "isref", "v"), "g",
          col("isref"), col("v"), subBits = 8)
        .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // small values (< 2^8) sit in singleton buckets: the grid is exact
    val ident = (1L to 50L).flatMap(v =>
      Seq(("a", true, v), ("a", false, v)))
    val disjoint = (1L to 50L).map(v => ("b", true, v)) ++
      (101L to 150L).map(v => ("b", false, v))
    // half the current mass shifted fully right of the reference:
    // worst CDF gap = |1.0 - 0.5| at the reference max
    val half = (1L to 50L).map(v => ("c", true, v)) ++
      (1L to 25L).map(v => ("c", false, v)) ++
      (101L to 125L).map(v => ("c", false, v))
    val lone = Seq(("d", true, 5L))
    val out = run(ident ++ disjoint ++ half ++ lone)
    assert(out("a") == (("a", 50L, 50L, 0L)), out.toString)
    assert(out("b") == (("b", 50L, 50L, 1000000L)), out.toString)
    assert(out("c") == (("c", 50L, 50L, 500000L)), out.toString)
    assert(!out.contains("d"), out.toString)
  }

  test("ddsketchQuantiles: hand-checked buckets, rank clamp, junk rows excluded") {
    // values 1,2,3,100 at subBits=1: small values land in singleton
    // buckets ([1,1],[2,2],[3,3]); 100 (7 bits) coarsens to [96,127]
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 100L),
      ("a", 0L), ("a", -5L)) // non-positive: no quantile evidence
      .toDF("g", "v")
      .union(Seq(("a", null.asInstanceOf[java.lang.Long]))
        .toDF("g", "v").select(col("g"), col("v").cast("long")))
    val out = Sketches.ddsketchQuantiles(df, Seq("g"), col("v"),
        subBits = 1, qMicros = Seq(1L, 500000L, 990000L))
      .select("q_micro", "n", "n_buckets", "bucket_lo", "bucket_hi", "est")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 4L, 4L, 1L, 1L, 1L),         // rank clamps to 1 -> min value's bucket
      (500000L, 4L, 4L, 2L, 2L, 2L),    // rank 2 -> exact singleton
      (990000L, 4L, 4L, 96L, 127L, 111L)), out.toString) // true 100 inside
    // the sketch property: the true quantile always lies inside the
    // reported bucket, and bucket width respects the relative bound
    val vals = (1 to 1000).map(i => ("b", (i.toLong * i) % 7919 + 1))
    val o2 = Sketches.ddsketchQuantiles(vals.toDF("g", "v"), Seq("g"),
        col("v"), subBits = 4, qMicros = Seq(500000L, 900000L))
      .select("q_micro", "bucket_lo", "bucket_hi")
      .as[(Long, Long, Long)].collect()
    val sorted = vals.map(_._2).sorted
    o2.foreach { case (q, lo, hi) =>
      val truth = sorted(math.max(1,
        math.ceil(1000 * q / 1e6).toInt) - 1)
      assert(truth >= lo && truth <= hi, s"q=$q truth=$truth [$lo,$hi]")
      assert(hi - lo <= math.max(1L, lo >> 4), s"width at q=$q [$lo,$hi]")
    }
  }

  test("hllAccuracyAudit: exact truth, err consistent with estimate, duplicate-invariant, 3sigma honest") {
    val rows = (1 to 2000).map(i => ("big", i.toLong)) ++
      (1 to 5).map(i => ("small", i.toLong)) ++
      (1 to 40).flatMap(i => Seq.fill(3)(("dup3", i.toLong))) ++
      (1 to 40).map(i => ("dup1", i.toLong))
    val out = Sketches.hllAccuracyAudit(rows.toDF("g", "k"),
        Seq("g"), col("k"))
      .as[(String, Long, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    // truth side is exact count-distinct
    assert(out("big")._2 == 2000L && out("small")._2 == 5L &&
      out("dup3")._2 == 40L && out("dup1")._2 == 40L)
    // err is derived from the SAME rounded estimate the sketch reports
    out.values.foreach { case (g, t, _, est, err, w3) =>
      val expect = math.rint((est - t) / t * 1e6) / 1e6
      assert(math.abs(err - expect) < 1e-9, s"$g: err=$err vs $expect")
      assert(w3 == (if (math.abs(err) <= 0.39) 1L else 0L), g)
    }
    // cardinality estimation is duplicate-invariant: same key SET at
    // multiplicity 3 and 1 yields the identical estimate
    assert(out("dup3")._4 == out("dup1")._4, s"${out("dup3")} ${out("dup1")}")
    // the audit measures honestly: the big group's error is nonzero
    // (HLL is an estimate) yet inside 3 sigma for this fixed hash
    assert(out("big")._5 != 0.0 && out("big")._6 == 1L, out("big").toString)
  }

  test("heavyHitters: exact thresholded output, boundary hit, partitioning-invariant, nulls excluded") {
    // group g1: n = 300 tokens, φ = 10% → threshold = 30. "hot" (40)
    // and "edge" (exactly 30) qualify; "below" (29) must NOT; a
    // 67-item ×3 tail swamps the k = 11 MG counters so candidates
    // genuinely shrink mid-stream. group g2 is uniform → empty.
    val g1 = Seq.fill(40)("hot") ++ Seq.fill(30)("edge") ++
      Seq.fill(29)("below") ++ (0 until 67).flatMap(i => Seq.fill(3)(s"t$i"))
    assert(g1.size == 300)
    val g2 = (0 until 50).map(i => s"u$i")
    val rows = g1.map(("g1", _)) ++ g2.map(("g2", _)) ++
      Seq(("g1", null.asInstanceOf[String])) // null: excluded, not in n
    val expected = Set(("g1", "hot", 40L, 300L, 30L),
      ("g1", "edge", 30L, 300L, 30L))
    // the final output is a pure function of the data: identical under
    // every partitioning (the MG summary itself is not — the exact
    // rescore is what makes the operator declarable)
    Seq(1, 5, 32).foreach { p =>
      val df = rows.toDF("g", "item").repartition(p)
      val out = Sketches.heavyHitters(df, Seq("g"), col("item"),
          phiMicro = 100000L)
        .as[(String, String, Long, Long, Long)].collect().toSet
      assert(out == expected, s"partitions=$p: $out")
    }
  }

  test("ddsketchAccuracyAudit: exact regime zero error, coarse regime bounded, containment always") {
    // subBits=6: values <= 127 (7 bits) keep shift 0 — every bucket a
    // singleton, so est == exact and rel_err 0 at every quantile
    val fine = (1 to 100).map(i => ("a", i.toLong)).toDF("g", "v")
    val outF = Sketches.ddsketchAccuracyAudit(fine, Seq("g"), col("v"),
        subBits = 6, qMicros = Seq(500000L, 900000L, 990000L))
      .select("q_micro", "n", "est", "exact", "rel_err_micro",
        "within_bucket")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(outF.toSeq == Seq(
      (500000L, 100L, 50L, 50L, 0L, 1L),
      (900000L, 100L, 90L, 90L, 0L, 1L),
      (990000L, 100L, 99L, 99L, 0L, 1L)), outF.mkString(","))
    // coarse regime (subBits=2 on big values): est can drift from
    // exact but containment MUST hold and rel err respects 2^-subBits
    val coarse = (1 to 1000).map(i => ("b", (i.toLong * i) % 7919 + 1))
      .toDF("g", "v")
    val outC = Sketches.ddsketchAccuracyAudit(coarse, Seq("g"), col("v"),
        subBits = 2, qMicros = Seq(500000L, 900000L))
      .select("q_micro", "est", "exact", "rel_err_micro", "within_bucket")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(outC.nonEmpty)
    outC.foreach { case (q, est, exact, rel, wb) =>
      assert(wb == 1L, s"containment broke at q=$q: est=$est exact=$exact")
      // midpoint of a bucket containing exact: rel err <= 2^-2 plus
      // integer-midpoint slop
      assert(rel <= 260000L, s"q=$q rel=$rel")
    }
    // the two regimes are a non-vacuous contrast: the coarse audit
    // actually measured nonzero error somewhere
    assert(outC.exists(_._4 > 0L), outC.mkString(","))
  }
}
