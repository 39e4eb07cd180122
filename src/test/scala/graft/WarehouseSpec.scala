package graft

import org.apache.spark.sql.functions._
import graft.sinks.Warehouse

class WarehouseSpec extends SparkSpec {

  test("bucketed tables join without any exchange (co-located join)") {
    val orders = Tables.orders(spark, sf001).select("o_orderkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf001).select("l_orderkey", "l_quantity")
    Warehouse.saveBucketed(orders, "wh_orders", Seq("o_orderkey"), 4, Seq("o_orderkey"))
    Warehouse.saveBucketed(lineitem, "wh_lineitem", Seq("l_orderkey"), 4, Seq("l_orderkey"))
    // force the shuffle-join path: at sf0.001 AQE would broadcast, and a
    // BroadcastExchange would muddy the no-Exchange assertion
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("wh_lineitem")
        .join(spark.table("wh_orders"), col("l_orderkey") === col("o_orderkey"))
      val expected = lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        "bucketed join must not shuffle:\n" + plan.take(1200))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // bucket pruning metadata present on the scan
      assert(plan.contains("Bucketed: true"), plan.take(1200))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS wh_orders")
      spark.sql("DROP TABLE IF EXISTS wh_lineitem")
    }
  }

  test("groupBy on the bucket key aggregates without a shuffle") {
    val lineitem = Tables.lineitem(spark, sf001).select("l_orderkey", "l_quantity")
    Warehouse.saveBucketed(lineitem, "wh_li2", Seq("l_orderkey"), 4)
    try {
      val agg = spark.table("wh_li2").groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        plan.take(1200))
    } finally spark.sql("DROP TABLE IF EXISTS wh_li2")
  }

  test("zValue interleaves bits: curve-adjacent values are close in both dims") {
    import spark.implicits._
    // hand-checked Morton values on a 2-bit grid over [0,3]x[0,3]
    val df = Seq((0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0), (1.0, 2.0))
      .toDF("x", "y")
    val z = df.select(Warehouse.zValue(col("x"), col("y"), 0, 3, 0, 3, 2))
      .as[Long].collect().toSeq
    // (x,y) scaled to ints: (0,0)(3,0)(0,3)(3,3)(1,2); interleave x even
    // bits, y odd bits: 0b0000, 0b0101, 0b1010, 0b1111, 0b1001
    assert(z == Seq(0L, 5L, 10L, 15L, 9L))
  }

  test("writeZOrdered on an empty frame writes an empty table, not an NPE") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wh_z_empty").toString
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    Warehouse.writeZOrdered(empty, dir, "a", "b")
    assert(spark.read.parquet(dir).count() == 0)
    // all-NULL key column: no bounds either — same plain-write fallback
    val nulls = Seq((1L, 2L)).toDF("a", "b")
      .select(lit(null).cast("long").as("a"), col("b"))
    Warehouse.writeZOrdered(nulls, dir, "a", "b")
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("z-ordered layout: every file covers a small rectangle of BOTH dimensions") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val zDir = java.nio.file.Files.createTempDirectory("wh_z").toString
    val linDir = java.nio.file.Files.createTempDirectory("wh_lin").toString
    // 16 files = 4 fixed curve-prefix bits = 2 bits per dimension: each
    // file's rectangle covers ~1/4 of each domain (8 files would fix
    // only ONE x-bit — half-domain x spans by construction)
    Warehouse.writeZOrdered(li, zDir, "l_partkey", "l_suppkey",
      bits = 8, files = 16)
    // the single-column competitor: range-layout by partkey only
    li.repartitionByRange(16, col("l_partkey"))
      .write.mode("overwrite").parquet(linDir)

    // per-file fraction of each key's full domain covered (parquet
    // footer min/max is exactly what a reader prunes on)
    def fileSpans(dir: String, c: String): Double = {
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name()).agg(
          (max(col(c)) - min(col(c))).cast("double").as("w"))
        .select(avg(col("w"))).as[Double].head()
      val dom = spark.read.parquet(dir)
        .select((max(col(c)) - min(col(c))).cast("double")).as[Double].head()
      spans / dom
    }
    // no row lost by the rewrite
    assert(spark.read.parquet(zDir).count() == li.count())
    // partkey-ranged layout: partkey tight but suppkey spans ~full domain
    assert(fileSpans(linDir, "l_suppkey") > 0.8)
    // z-order: BOTH dimensions well under half the domain per file
    assert(fileSpans(zDir, "l_partkey") < 0.5,
      s"partkey span ${fileSpans(zDir, "l_partkey")}")
    assert(fileSpans(zDir, "l_suppkey") < 0.5,
      s"suppkey span ${fileSpans(zDir, "l_suppkey")}")
  }

  test("pruningAudit: hand-checked skip counts per layout, null rows excluded") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // key k == row index; 'sorted' layout orders by k, 'perm' layout by
    // the decorrelating permutation (k*7)%10; 5 equal-width files of 2
    val rows = (0L to 9L).map(o => (Some(o), (o * 7) % 10, o)) :+
      ((None: Option[Long], 0L, 0L)) // null order: no statistics
    val df = rows.toDF("o", "p", "k")
    val out = Warehouse.pruningAudit(df,
        Seq("sorted" -> col("o"), "perm" -> col("p")), col("k"),
        nFiles = 5, probes = Seq(("p34", 3L, 4L)))
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // sorted: files hold k-pairs {0,1}..{8,9}; probe [3,4] needs files
    // 1 ({2,3}) and 2 ({4,5}) -> 3 of 5 skippable
    assert(out("sorted") == (("p34", 5L, 3L, 600000L)), out.toString)
    // perm: file key ranges [0,3],[6,9],[2,5],[1,8],[4,7] -> only the
    // kmin=6 file is skippable
    assert(out("perm") == (("p34", 5L, 1L, 200000L)), out.toString)
  }

  test("training shards: deterministic shard-of-start, written files re-derive the manifest, checksum attests content") {
    import spark.implicits._
    def words(n: Int, w: String) = Seq.fill(n)(w).mkString(" ")
    val docs = Seq(
      (0L, words(10, "a")), // start 0  -> shard 0
      (1L, words(25, "b")), // start 10 -> shard 0 (stream straddles into 1)
      (2L, words(5, "c")),  // start 35 -> shard 1
      (3L, words(8, "d")),  // start 40 -> shard 1
      (4L, words(50, "e")), // start 48 -> shard 1 (straddles 2)
      (5L, words(3, "f")))  // start 98 -> shard 3 (shard 2 holds no START)
      .toDF("doc_id", "text")
    val assign = Warehouse.trainingShardAssign(docs, "doc_id", col("text"),
      contextTokens = 16, shardTokens = 30L)
    val byDoc = assign.select("doc_id", "shard_id").as[(Long, Long)]
      .collect().toMap
    assert(byDoc == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L,
      4L -> 1L, 5L -> 3L), byDoc)

    def manifest(d: org.apache.spark.sql.DataFrame) =
      Warehouse.trainingShardManifest(d, "doc_id", col("text"),
        contextTokens = 16, shardTokens = 30L)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val m = manifest(docs)
    assert(m.keySet == Set(0L, 1L, 3L))
    assert(m(0L)._1 == 2L && m(0L)._2 == 35L && m(0L)._3 == 0L && m(0L)._4 == 1L)
    assert(m(1L)._1 == 3L && m(1L)._2 == 63L && m(1L)._3 == 2L && m(1L)._4 == 4L)
    assert(m(3L)._1 == 1L && m(3L)._2 == 3L)

    // the WRITER composition: shard files on disk, manifest re-derived
    // from what was actually written matches the declared manifest
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Warehouse.trainingShardAssign(docs, "doc_id", col("text"),
        contextTokens = 16, shardTokens = 30L)
      .write.mode("overwrite").partitionBy("shard_id").parquet(dir)
    val written = spark.read.parquet(dir)
    val rowHash = graft.functions.Hashing.hexLong(concat_ws("|",
      col("doc_id"), col("n_tokens"), col("start_offset"),
      col("content_fp")))
    val rederived = written.groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"),
        call_function("bit_xor", rowHash).as("xor_hash"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(rederived == m, s"written-file manifest drifted: $rederived vs $m")

    // one flipped CHARACTER (same token count, same offsets) moves
    // exactly its shard's checksum — the content-attestation contract
    val mutated = docs.withColumn("text",
      when(col("doc_id") === 2L, words(5, "X")).otherwise(col("text")))
    val m2 = manifest(mutated)
    assert(m2(1L)._5 != m(1L)._5, "shard 1 checksum must move")
    assert(m2(0L) == m(0L) && m2(3L) == m(3L), "other shards must not")
  }
}
