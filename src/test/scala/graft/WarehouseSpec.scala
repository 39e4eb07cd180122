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
}
