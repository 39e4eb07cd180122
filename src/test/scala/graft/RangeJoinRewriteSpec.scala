package graft

import org.apache.spark.sql.functions._
import graft.plans.RangeJoinRewrite

class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  val aRows = (1 to 300).map(i => (i.toLong, i * 0.37 % 17))
  val bRows = (1 to 300).map(i => (i.toLong, i * 0.53 % 17))
  lazy val a = aRows.toDF("aid", "av")
  lazy val b = bRows.toDF("bid", "bv")

  private def viaSpark = a.join(b, abs(col("av") - col("bv")) <= 0.25)
    .select("aid", "bid").as[(Long, Long)].collect().toSet

  test("rewritten range join returns exactly the ground-truth pairs") {
    // ground truth computed locally so the test cannot be fooled by the
    // rule being enabled earlier in the (shared-session) JVM
    val truth = (for {
      (aid, av) <- aRows; (bid, bv) <- bRows
      if math.abs(av - bv) <= 0.25
    } yield (aid, bid)).toSet
    RangeJoinRewrite.enable(spark)
    assert(viaSpark == truth)
    assert(truth.nonEmpty, "degenerate: no in-range pairs to compare")
  }

  test("rewrite tolerates infinite and huge values (ANSI overflow clamp)") {
    RangeJoinRewrite.enable(spark)
    val ax = Seq((1L, 1.0), (2L, Double.PositiveInfinity), (3L, 1e300))
      .toDF("aid", "av")
    val bx = Seq((10L, 1.1), (11L, Double.PositiveInfinity), (12L, -1e300))
      .toDF("bid", "bv")
    val out = ax.join(bx, abs(col("av") - col("bv")) <= 0.25)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L))) // inf/huge rows never match, never crash
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
