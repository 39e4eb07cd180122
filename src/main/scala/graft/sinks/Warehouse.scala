package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Bucketed warehouse layout — the storage-side half of shuffle
  * elimination. Writing both sides of a recurring join bucketed (and
  * sorted) by the join key means every subsequent join/aggregation on
  * that key is planned WITHOUT an Exchange: at 100 TB the one-time
  * bucketed write amortizes across every downstream query, which is the
  * single biggest shuffle saving available to a pipeline that joins the
  * same fact tables daily.
  *
  * Bucket count guidance: target file sizes of 128MB–1GB per bucket per
  * partition; too few buckets bounds parallelism, too many makes small
  * files. Must match on both sides for the exchange-free join (Spark
  * also accepts one side being a multiple of the other).
  */
object Warehouse {

  /** Save as a bucketed+sorted managed table (native Spark bucketing,
    * works on the in-memory session catalog — no Hive required). */
  def saveBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Morton (Z-order) curve value of two numeric columns — each
    * min/max-normalized to `bits` bits, then bit-interleaved. Rows close
    * on the curve are close in BOTH dimensions, which is what makes the
    * clustered layout below skippable on either predicate. */
  def zValue(c1: Column, c2: Column,
      min1: Double, max1: Double, min2: Double, max2: Double,
      bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    def scaled(c: Column, lo: Double, hi: Double): Column = {
      val span = if (hi > lo) hi - lo else 1.0
      least(greatest(
        floor((c.cast("double") - lit(lo)) / lit(span) * lit((1L << bits) - 1)),
        lit(0L)), lit((1L << bits) - 1L)).cast("long")
    }
    // interleave via the canonical primitive (also registered in SQL as
    // zorder_cell and exercised hash-checked by q160)
    graft.operators.Similarity.zorderCell(
      scaled(c1, min1, max1), scaled(c2, min2, max2), bits)
  }

  /** Z-order clustered parquet write: range-partition + sort the data by
    * its Morton value so each output file covers a small rectangle of
    * the (c1, c2) space — parquet min/max footer stats then prune files
    * for predicates on EITHER column, where a single-column sort layout
    * only prunes its leading column. This is the multi-dimensional
    * data-skipping layout a 100 TB table wants under point/range lookups
    * on two independent keys (the same trick behind Delta/Iceberg
    * OPTIMIZE ZORDER, here as a plain parquet write).
    *
    * The min/max bounds for normalization come from one tiny agg job
    * (eager, like every write); `files` controls layout granularity —
    * at scale, size it to ~128 MB-1 GB per file. The z column is
    * dropped before writing: it orders the layout, it is not data. */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
      bits: Int = 16, files: Int = 16): Unit = {
    val b = df.agg(min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).head()
    // empty input (or an all-NULL key column) has no bounds to normalize
    // against — getDouble on the NULL min would NPE opaquely. There is
    // nothing to cluster: write the frame as-is.
    if (b.isNullAt(0) || b.isNullAt(2)) {
      df.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    val z = zValue(col(c1), col(c2),
      b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3), bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Min/max file-skipping audit — the WHAT-IF diagnostic behind every
    * clustered-layout decision ([[writeZOrdered]], [[saveBucketed]],
    * Delta/Iceberg data skipping, parquet row-group pruning): for each
    * candidate LAYOUT (an ordering expression) and each probe range
    * over the query key, how many files could a min/max-statistics
    * scan skip? The number a table owner reads before paying for a
    * re-cluster — "ingest order skips 12% of files on date probes,
    * date-clustered order skips 94%".
    *
    * Files are modeled as equal-WIDTH ranges of the layout's order
    * column: `file = (o − min)·nFiles div (max − min + 1)` — pure
    * integer arithmetic from one broadcast min/max row, fully
    * distributed (a row_number/ntile formulation would globally sort
    * the corpus; value-range boundaries need only the bounds). A file
    * is skippable for probe [lo, hi] when its key max < lo or key
    * min > hi — the exact statistics test engines run. All-positive
    * integer arithmetic throughout (`div` == `//`); rows with a NULL
    * order or key value carry no statistics and are excluded.
    *
    * Output: one row per (layout, probe): n_files (non-empty files),
    * n_skip, skip_micro. Statistics-sized everywhere after the one
    * narrow scan per layout. */
  def pruningAudit(df: DataFrame, layouts: Seq[(String, Column)],
      key: Column, nFiles: Int,
      probes: Seq[(String, Long, Long)]): DataFrame = {
    require(layouts.nonEmpty && probes.nonEmpty && nFiles >= 1)
    val probeArr = array(probes.map { case (p, lo, hi) =>
      struct(lit(p).as("probe"), lit(lo).as("lo"), lit(hi).as("hi"))
    }: _*)
    layouts.map { case (name, order) =>
      val base = df.select(order.cast("long").as("__o"),
          key.cast("long").as("__k"))
        .filter(col("__o").isNotNull && col("__k").isNotNull)
      val bounds = broadcast(
        base.agg(min(col("__o")).as("__mn"), max(col("__o")).as("__mx")))
      val fileStats = base.crossJoin(bounds)
        .select(expr(s"(__o - __mn) * $nFiles div (__mx - __mn + 1)")
          .as("__f"), col("__k"))
        .groupBy("__f")
        .agg(min(col("__k")).as("__kmin"), max(col("__k")).as("__kmax"))
      fileStats
        .select(col("__kmin"), col("__kmax"),
          explode(probeArr).as("__p"))
        .groupBy(col("__p.probe").as("probe"))
        .agg(count(lit(1)).as("n_files"),
          sum(when(col("__kmax") < col("__p.lo") ||
            col("__kmin") > col("__p.hi"), 1L).otherwise(0L))
            .as("n_skip"))
        .select(lit(name).as("layout"), col("probe"), col("n_files"),
          col("n_skip"),
          expr("n_skip * 1000000 div n_files").as("skip_micro"))
    }.reduce(_ union _)
  }

  /** Deterministic training-shard layout — the composition a
    * training-data pipeline actually ships: the corpus tokenized and
    * concat-packed into `contextTokens` windows
    * ([[graft.operators.TextAnalysis.packOffsets]] — the two-level
    * cumsum, never a global one-task window), then every document
    * assigned to the shard where its token stream STARTS
    * (`shard_id = start_offset div shardTokens` — a pure function of
    * corpus content and order, so two independent runs land every doc
    * in the same shard with no coordination). Output: the packOffsets
    * row plus `shard_id` and the document's canonical content
    * fingerprint (md5 of the text), the per-doc record a shard writer
    * partitions by. */
  def trainingShardAssign(df: DataFrame, idCol: String, text: Column,
      contextTokens: Int = 512, shardTokens: Long = 4096L): DataFrame = {
    require(shardTokens >= 1, s"shardTokens ($shardTokens) must be >= 1")
    val offs = graft.operators.TextAnalysis.packOffsets(
      df, idCol, text, contextTokens)
    // id-equi join of hash-sized rows (never the text): the fingerprint
    // attests CONTENT, the offsets attest LAYOUT, the manifest covers
    // both
    val fp = df.select(col(idCol), md5(text).as("content_fp"))
    // `div` (exact long division), not floor(a / b): the double route
    // loses exactness once cumulative offsets exceed 2^53 — real at the
    // 100 TB token scale this targets — and the oracle's `//` is integral
    offs.join(fp, Seq(idCol))
      .withColumn("shard_id", expr(s"start_offset div ${shardTokens}L"))
  }

  /** Per-shard manifest over [[trainingShardAssign]] — the
    * replica-verification artifact that rides next to the shard files:
    * document count, token count, id range, and an order-independent
    * XOR checksum ([[graft.operators.Quality.checksum]]'s q86 digest
    * shape) of the md5-derived hash of each member's canonical row
    * string `doc|n_tokens|start_offset|content_fp`. A consumer
    * re-derives the manifest from the raw corpus and diffs checksums —
    * one flipped byte of text, one missing doc, or one shifted offset
    * anywhere in the shard changes `xor_hash`. The XOR fold is
    * commutative/associative, so map-side partial aggregation is exact
    * under any partitioning; the corpus collapses to |shards| rows in
    * one hash aggregate. */
  def trainingShardManifest(df: DataFrame, idCol: String, text: Column,
      contextTokens: Int = 512, shardTokens: Long = 4096L): DataFrame = {
    import org.apache.spark.sql.functions.call_function
    val rowHash = graft.functions.Hashing.hexLong(concat_ws("|",
      col(idCol), col("n_tokens"), col("start_offset"), col("content_fp")))
    trainingShardAssign(df, idCol, text, contextTokens, shardTokens)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"),
        call_function("bit_xor", rowHash).as("xor_hash"))
  }
}
