package graft

import org.apache.spark.sql.functions._
import graft.plans.RangeJoinRewrite

class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  lazy val a = (1 to 300).map(i => (i.toLong, i * 0.37 % 17)).toDF("aid", "av")
  lazy val b = (1 to 300).map(i => (i.toLong, i * 0.53 % 17)).toDF("bid", "bv")

  private def naive = a.join(b, abs(col("av") - col("bv")) <= 0.25)
    .select("aid", "bid").as[(Long, Long)].collect().toSet

  test("rewritten range join returns exactly the nested-loop results") {
    val before = naive // rule not yet enabled in this session
    RangeJoinRewrite.enable(spark)
    val after = naive
    assert(after == before)
    assert(after.nonEmpty, "degenerate: no in-range pairs to compare")
  }

  test("rewrite replaces the nested-loop join with a bucketed equi-join") {
    RangeJoinRewrite.enable(spark)
    val df = a.join(b, abs(col("av") - col("bv")) <= 0.25)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1000))
    assert(!plan.contains("CartesianProduct"), plan.take(1000))
    assert(plan.contains("Join"), plan.take(400)) // hash/merge equi-join
  }

  test("non-matching join shapes are left untouched") {
    RangeJoinRewrite.enable(spark)
    // strict inequality and OR conditions don't match the guarded pattern
    val lt = a.join(b, abs(col("av") - col("bv")) < 0.25)
    assert(lt.queryExecution.optimizedPlan.toString.contains("Join"))
    val or = a.join(b,
      abs(col("av") - col("bv")) <= 0.25 || col("aid") === col("bid"))
    assert(or.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin")) // untouched, still BNLJ
  }

  test("null values drop identically in both forms") {
    RangeJoinRewrite.enable(spark)
    val an = Seq((1L, Some(1.0)), (2L, None)).toDF("aid", "av")
      .select(col("aid"), col("av").cast("double").as("av"))
    val bn = Seq((10L, Some(1.1)), (11L, None)).toDF("bid", "bv")
      .select(col("bid"), col("bv").cast("double").as("bv"))
    val out = an.join(bn, abs(col("av") - col("bv")) <= 0.25)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L))) // null rows never match
  }
}
