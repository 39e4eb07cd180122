/** Exact interpolated quantiles without per-group value buffers.
  *
  * Spark's built-in `percentile()` is an interpreted
  * TypedImperativeAggregate that serializes EVERY group value into one
  * aggregation buffer — at 100 TB that is an executor-memory bomb, and
  * even at sf0.1 it was the second-slowest bench query (21× DuckDB).
  * This formulation is the classic sort-based exact quantile: rank each
  * value inside its group (window row_number + count over the same
  * exchange, both codegen-planned), keep only the two rows bracketing
  * each requested fraction, and fold them with the standard linear
  * interpolation `(1-frac)·v_lo + frac·v_hi` — the same arithmetic
  * DuckDB's `quantile_cont` and Spark's `percentile` use, so oracle
  * parity holds.
  *
  * Scale shape: one hash exchange on the group key, a per-group external
  * sort (spills), and two WindowExec passes sharing that exchange — the
  * count-over-partition pass buffers each partition in a spillable
  * ExternalAppendOnlyUnsafeRowArray, so memory is bounded the same way
  * the sort's is (unlike `percentile()`, whose buffer must FIT in one
  * aggregation buffer). Measured fastest of three formulations at sf0.1
  * (vs a broadcast-count join, and vs unpivoting metrics into one
  * taller window): WindowExec costs ~1.3 µs/row, so the winner is
  * whatever minimizes rows-through-windows and extra scans.
  */
package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

object Quantiles {

  /** Exact continuous quantiles via histogram selection — the truly
    * scalable formulation: instead of ranking every row through a
    * WindowExec (~1.3 µs/row), bucket values with one codegen hash
    * aggregate, locate each target rank's bucket on the TINY cumulative
    * histogram, and rank only the rows of the few target buckets
    * (≈ rows/buckets per fraction). Two passes over the data, both
    * whole-stage codegen; the giant per-group sort disappears entirely.
    *
    * Bucketing is internal (any consistent `floor(v/width)` works — the
    * selected order statistics are exact regardless of width), `width`
    * only tunes the candidate-set size. NULLs are ignored
    * (quantile_cont semantics). Interpolation is the standard
    * `(1-frac)·v_lo + frac·v_hi`, bit-identical to [[quantileCont]].
    *
    * `metrics` is the multi-metric form: each entry
    * `(tag, valueColumn, width, Seq((alias, fraction)))` shares the two
    * passes via an unpivot, so n metrics cost one histogram aggregate
    * and one candidate scan, not 2n scans. */
  def quantileContBucketed(df: DataFrame, grp: Seq[String],
      metrics: Seq[(String, Column, Double, Seq[(String, Double)])]): DataFrame = {
    metrics.foreach { case (m, _, width, _) =>
      require(width > 0 && !width.isInfinite && !width.isNaN,
        s"metric '$m': bucket width must be a positive finite double, got $width")
    }
    val gcols = grp.map(col)
    val keys = grp :+ "__m"
    // unpivot to (group, metric, value, bucket). NaN values are ignored
    // alongside NULLs — NaN would bucket to 0 (floor(NaN)→0L) while
    // sorting LAST, corrupting every cumulative rank; [[quantileCont]]
    // instead inherits Spark's NaN-sorts-last behavior, so feed NaN-free
    // data when the two forms must agree.
    val stacked = df
      .select(gcols :+ explode(array(metrics.map { case (m, v, width, _) =>
        struct(lit(m).as("m"), v.cast(DoubleType).as("v"),
          floor(v.cast(DoubleType) / width).as("b"))
      }: _*)).as("__mv"): _*)
      .select(gcols :+ col("__mv.m").as("__m") :+ col("__mv.v").as("__v") :+
        col("__mv.b").as("__b"): _*)
      .filter(col("__v").isNotNull && !isnan(col("__v")))
    // pass 1: per-bucket histogram (codegen hash agg, tiny output)
    val hist = stacked.groupBy((keys :+ "__b").map(col): _*)
      .agg(count(lit(1)).as("__c"))
    // cumulative counts over the tiny histogram
    val wcum = Window.partitionBy(keys.map(col): _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wall = Window.partitionBy(keys.map(col): _*)
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(wcum))
      .withColumn("__n", sum(col("__c")).over(wall))
    // target ranks per (metric, fraction): k = floor/ceil of (n-1)·p.
    // a bucket is a target iff it contains one of the bracket ranks;
    // carry the bucket's start rank so local ranks can be globalized
    val fracs = metrics.flatMap { case (m, _, _, ps) =>
      ps.map { case (_, p) => struct(lit(m).as("m"), lit(p).as("p")) }
    }
    val targets = cum
      .select((keys :+ "__b" :+ "__c" :+ "__cum" :+ "__n").map(col) :+
        explode(array(fracs: _*)).as("__f"): _*)
      .filter(col("__f.m") === col("__m"))
      .withColumn("__h", (col("__n") - 1) * col("__f.p"))
      .filter(
        (floor(col("__h")) >= col("__cum") - col("__c") && floor(col("__h")) < col("__cum")) ||
          (ceil(col("__h")) >= col("__cum") - col("__c") && ceil(col("__h")) < col("__cum")))
      .select(keys.map(col) :+ col("__b") :+
        (col("__cum") - col("__c")).as("__start") :+ col("__n"): _*)
      .distinct() // __start and __n are functions of (keys, __b) — still one row per bucket
    // pass 2: rank only the candidate-bucket rows; globalize local ranks
    // (__n rides along on the broadcast targets — no extra aggregate)
    val cand = stacked.join(broadcast(targets), keys :+ "__b")
    val wloc = Window.partitionBy((keys :+ "__b").map(col): _*).orderBy(col("__v"))
    val ranked = cand
      .withColumn("__rn", col("__start") + row_number().over(wloc) - 1) // 0-based global
    val aggs = metrics.flatMap { case (m, _, _, ps) =>
      ps.map { case (name, p) =>
        val h = (col("__n") - 1) * lit(p)
        val lo = floor(h)
        val hi = ceil(h)
        val frac = h - lo
        val contrib =
          when(col("__m") === m && col("__rn") === lo,
            col("__v") * (lit(1.0) - frac)).otherwise(lit(0.0)) +
            when(col("__m") === m && col("__rn") === hi && hi =!= lo,
              col("__v") * frac).otherwise(lit(0.0))
        // a metric with no rows in this group (all NULL/NaN) must yield
        // NULL, not a 0.0 sum of never-firing branches
        when(count(when(col("__m") === m, lit(1))) > 0, sum(contrib))
          .otherwise(lit(null)).as(name)
      }
    }
    ranked.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group exact continuous quantiles of `valCol` at each requested
    * fraction, returned as one row per group with one column per
    * `(alias, fraction)` pair. NULL values are ignored, matching
    * `percentile` / `quantile_cont` (they must not occupy ranks or count
    * toward n); a group whose values are all null disappears, like an
    * inner aggregate over its non-null rows would. */
  def quantileCont(df: DataFrame, grp: Seq[String], valCol: Column,
      ps: Seq[(String, Double)]): DataFrame = {
    val gcols = grp.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(col("__v"))
    val wp = Window.partitionBy(gcols: _*)
    val ranked = df.select(gcols :+ valCol.cast(DoubleType).as("__v"): _*)
      .filter(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(w) - 1) // 0-based rank
      .withColumn("__n", count(lit(1)).over(wp))
    val aggs = ps.map { case (name, p) =>
      // 0-based fractional position h = (n-1)·p; the quantile is the
      // interpolation between ranks floor(h) and ceil(h)
      val h = (col("__n") - 1) * lit(p)
      val lo = floor(h)
      val hi = ceil(h)
      val frac = h - lo
      val contrib =
        when(col("__rn") === lo, col("__v") * (lit(1.0) - frac)).otherwise(lit(0.0)) +
          when(col("__rn") === hi && hi =!= lo, col("__v") * frac).otherwise(lit(0.0))
      sum(contrib).as(name)
    }
    ranked.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Robust outlier profile per group: median, MAD (median absolute
    * deviation), and the count of rows beyond `k` robust standard
    * deviations (`|v − med| > k · 1.4826 · mad` — 1.4826 is the
    * consistency constant that makes MAD estimate σ under normality).
    * The robust alternative to mean±kσ profiling: a contaminated tail
    * can drag a mean/stddev fence arbitrarily, but not the median pair.
    *
    * Engine parity is exact, not approximate: [[quantileCont]]'s
    * `(1−f)·lo + f·hi` interpolation is bit-identical to DuckDB's
    * `quantile_cont` (probed at the ulp level), the deviations and the
    * `k·1.4826·mad` fence are computed from those identical bits with
    * identical operations, so even the > comparisons classify
    * identically — no rounding tolerance needed anywhere.
    *
    * Shape: medians intrinsically need two ordered passes (deviations
    * depend on the first median); both run the [[quantileCont]]
    * machinery (per-group sort windows, no value buffers), and the
    * two tiny per-group stats frames broadcast back onto the corpus. */
  def madOutliers(df: DataFrame, grp: Seq[String], valCol: Column,
      k: Double = 3.0): DataFrame = {
    val gcols = grp.map(col)
    val vals = df.select(gcols :+ valCol.cast(DoubleType).as("__v"): _*)
      .filter(col("__v").isNotNull)
    val med = quantileCont(vals, grp, col("__v"), Seq(("med", 0.5)))
    val dev = vals.join(broadcast(med), grp)
      .withColumn("__d", abs(col("__v") - col("med")))
    val mad = quantileCont(dev, grp, col("__d"), Seq(("mad", 0.5)))
    val scale = k * 1.4826
    dev.join(broadcast(mad), grp)
      .groupBy(gcols: _*)
      .agg(first(col("med")).as("med"), first(col("mad")).as("mad"),
        count(lit(1)).as("n_rows"),
        sum(when(col("__d") > col("mad") * lit(scale), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Chi-square contingency profile of two categorical columns — the
    * association/feature-selection primitive (is `lang` independent of
    * `source`?). One row per observed (a, b) cell with its count, the
    * independence expectation row·col/N, and the cell's χ² contribution
    * (n−e)²/e; Σ chi2_cell over cells is the classic statistic.
    *
    * Shape: the corpus crosses ONE hash aggregation into the cell
    * table; both margins and the grand total are re-aggregations of
    * those cells (cardinality |A|·|B|, not corpus-sized) broadcast
    * back onto them — no second corpus pass, no corpus-wide window.
    * The expectation runs in doubles from the exact long counts with
    * the same operation order in both engines (the long·long margin
    * product could overflow at corpus scale, so each margin casts to
    * double FIRST). Rows with a NULL in either category are dropped
    * BEFORE the cell aggregate — otherwise they would inflate the
    * grand total and the opposite margin while their cells vanish in
    * the equi-joins, leaving a statistic that belongs to no consistent
    * contingency table. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("n"))
    val ma = cells.groupBy(col(aCol)).agg(sum(col("n")).as("__na"))
    val mb = cells.groupBy(col(bCol)).agg(sum(col("n")).as("__nb"))
    val tot = cells.agg(sum(col("n")).as("__nt"))
    val e = col("__na").cast(DoubleType) * col("__nb").cast(DoubleType) /
      col("__nt").cast(DoubleType)
    cells.join(broadcast(ma), aCol).join(broadcast(mb), bCol)
      .crossJoin(broadcast(tot))
      .withColumn("expected", e)
      .select(col(aCol), col(bCol), col("n"), col("expected"),
        ((col("n").cast(DoubleType) - col("expected")) *
          (col("n").cast(DoubleType) - col("expected")) / col("expected"))
          .as("chi2_cell"))
  }

  /** The `k·1.4826` fence multiplier as the engine-crossing literal —
    * rendered with Double.toString into the oracle SQL so both engines
    * parse the identical double. */
  def madScale(k: Double): String = (k * 1.4826).toString

  /** Fixed-width value histogram — the distribution-profiling op a
    * curation pipeline runs before choosing quality/length cutoffs.
    * `nBuckets` equal buckets over [lo, hi); underflow collapses to
    * bucket -1, overflow to bucket `nBuckets`, so the output is always
    * ≤ nBuckets+2 rows. Fixed edges (not data-derived min/max) keep the
    * plan a single narrow codegen'd map + one tiny hash aggregate — a
    * data-derived range would need an eager min/max job first, and at
    * 100 TB the caller knows the domain anyway. Edge arithmetic is
    * plain double floor-division, bit-identical across engines; the
    * in-range bucket is clamped to nBuckets-1 because an inexact width
    * can make `floor((v-lo)/width)` round UP to nBuckets for a value
    * strictly below `hi` (e.g. hi=1, n=3, v=0.9999999999999999) —
    * without the clamp such a value would masquerade as overflow with a
    * mislabeled edge. NULL values are dropped (aggregate semantics),
    * not a null-edged bucket row. */
  def fixedWidthHistogram(df: DataFrame, value: Column,
      lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && hi > lo, "need nBuckets >= 1 and hi > lo")
    val width = (hi - lo) / nBuckets
    val v = value.cast(DoubleType)
    val bucket = when(v < lo, lit(-1L))
      .when(v >= hi, lit(nBuckets.toLong))
      .otherwise(least(floor((v - lo) / width).cast(LongType),
        lit(nBuckets.toLong - 1)))
    df.filter(v.isNotNull)
      .select(bucket.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (lit(lo) + col("bucket") * width).as("bucket_lo"),
        (lit(lo) + (col("bucket") + 1) * width).as("bucket_hi"),
        col("n"))
  }

  /** Percentile winsorization (outlier clipping before normalization /
    * feature scaling): clamp `value` into its group's
    * [pLo, pHi] quantile fences. Fences come from the histogram-selection
    * quantile pass ([[quantileContBucketed]] — no per-group value
    * buffers, no corpus window) and broadcast back onto the corpus, so
    * the data crosses once plus the candidate scan: the [[madOutliers]]
    * shape, whose spec established that the interpolated fences are
    * bit-identical to `quantile_cont` in DuckDB — clipping needs no
    * rounding tolerance. NULL values pass through unclipped (clipped
    * value NULL, is_clipped false); groups whose fences don't exist
    * (all-NULL values) drop with the inner fence join in both engines.
    *
    * Output: the group columns + `value`, `value_clipped`, `is_clipped`
    * plus `id` (the caller's row identity column). */
  def winsorize(df: DataFrame, grp: Seq[String], value: Column,
      idCol: String, pLo: Double, pHi: Double, width: Double): DataFrame = {
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0, "need 0 <= pLo < pHi <= 1")
    val base = df.select(
      (col(idCol).as("id") +: grp.map(col)) :+ value.cast(DoubleType).as("value"): _*)
    val fences = quantileContBucketed(base, grp,
      Seq(("w", col("value"), width, Seq(("__lo", pLo), ("__hi", pHi)))))
    // least/greatest IGNORE nulls (both engines), which would clamp a
    // NULL value to the low fence — guard so NULL rides through as NULL
    val clipped = when(col("value").isNull, lit(null).cast(DoubleType))
      .otherwise(least(greatest(col("value"), col("__lo")), col("__hi")))
    base.join(broadcast(fences), grp)
      .select((col("id") +: grp.map(col)) ++ Seq(
        col("value"),
        clipped.as("value_clipped"),
        coalesce(col("value") < col("__lo") || col("value") > col("__hi"),
          lit(false)).as("is_clipped")): _*)
  }

  /** Percent-rank (quantile) normalization: map each row's value to
    * `|{rows with smaller value}| / (n - 1)` ∈ [0, 1] — the
    * distribution-free feature rescaling (rank transform) a training
    * pipeline applies before mixing heterogeneous quality signals.
    * SQL `percent_rank()` semantics, WITHOUT its plan: a global
    * unpartitioned window sorts the entire corpus through ONE task —
    * the documented scale-killer. Here ranks come from the DISTINCT
    * VALUE table (bounded by the value domain, e.g. 4-decimal quality
    * scores, not the corpus): per-value counts, one cumulative window
    * over that small table, and a broadcast join back. NULL values are
    * excluded from ranking and from `n` (SQL window semantics would
    * rank them; a feature scaler must not invent a rank for a missing
    * feature). Quantized via floor(x·1e6 + 0.5); a single-row corpus
    * pins to 0 (the n=1 division guard). */
  def percentRank(df: DataFrame, value: Column,
      out: String = "pct_rank"): DataFrame = {
    val base = df.withColumn("__v", value).filter(col("__v").isNotNull)
    val dv = base.groupBy("__v").agg(count(lit(1)).as("__c"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = dv.select(col("__v"),
      (sum(col("__c")).over(w) - col("__c")).as("__less"))
    val n = base.agg(count(lit(1)).as("__n"))
    base.join(broadcast(cum), "__v")
      .crossJoin(broadcast(n))
      .withColumn(out,
        when(col("__n") > 1,
          floor(col("__less").cast(DoubleType) / (col("__n") - 1)
            * 1000000.0 + 0.5).cast(DoubleType) / 1000000.0)
          .otherwise(lit(0.0)))
      .drop("__v", "__less", "__n")
  }
}
