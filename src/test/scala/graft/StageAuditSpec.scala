package graft

import org.apache.spark.sql.functions._

/** CI gate for the one-task-stage trap (VERDICT r8 #5): round 8 caught
  * pushdown-below-`Parallelism.ensure` by hand three times
  * (q141/q142/q144); this spec makes the next instance fail the build
  * instead of costing a close. Runs the full declared-query sweep at
  * sf0.01 — plan STRUCTURE is under audit, but the trap's signature is
  * task-time concentration, which needs enough data to register.
  */
class StageAuditSpec extends SparkSpec {
  private val sf01 = "/root/testdata/sf0.01"

  test("no declared query concentrates >50% of its task time in one task (sf0.01 sweep)") {
    assume(new java.io.File(sf01).isDirectory)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val audits = StageAudit.sweep(spark, sf01, only)
    assert(audits.nonEmpty)
    val v = StageAudit.violations(audits)
    assert(v.isEmpty, "single-task-dominated queries (pushdown-below-ensure " +
      "trap or an undocumented serial floor — fix the plan or allowlist " +
      "with a cited analysis):\n" + v.mkString("\n"))
  }

  test("negative control: a planted pushdown-below-ensure trap IS flagged") {
    assume(new java.io.File(sf01).isDirectory)
    // The exact round-8 trap shape: heavy narrow compute above an
    // `ensure` widening, then a filter on the COMPUTED column written
    // WITHOUT Parallelism.unpushable. Predicate pushdown substitutes the
    // full expression into the predicate and drags it below the
    // RoundRobin exchange onto the single scan task.
    def trap = {
      val docs = operators.Parallelism.ensure(
        Tables.documents(spark, sf01).select("doc_id", "text"))
      val heavy = docs.withColumn("h",
        aggregate(transform(sequence(lit(1), lit(600)),
            i => xxhash64(col("text"), i)),
          lit(0L), (acc, x) => acc.bitwiseXOR(x)))
      heavy.filter(col("h") =!= 0L).select("doc_id", "h")
    }
    // sanity: the substitution really happened (the trap is live, not
    // hypothetical) — the filter sits below the exchange in the plan
    val plan = trap.queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toSeq
    val exIdx = lines.indexWhere(_.contains("RoundRobinPartitioning"))
    assert(exIdx >= 0, plan.take(800))
    assert(lines.drop(exIdx + 1).exists(_.contains("xxhash64")),
      "trap did not arm (pushdown rules changed?):\n" + plan.take(1500))
    val audit = StageAudit.auditOne(spark, "planted_trap", trap)
    assert(audit.violates, s"audit missed the planted trap: $audit")
  }

  test("...and the same compute with unpushable() passes the audit") {
    assume(new java.io.File(sf01).isDirectory)
    def fixed = {
      val docs = operators.Parallelism.ensure(
        Tables.documents(spark, sf01).select("doc_id", "text"))
      val heavy = docs.withColumn("h",
        aggregate(transform(sequence(lit(1), lit(600)),
            i => xxhash64(col("text"), i)),
          lit(0L), (acc, x) => acc.bitwiseXOR(x)))
      heavy.filter(operators.Parallelism.unpushable(col("h") =!= 0L))
        .select("doc_id", "h")
    }
    val audit = StageAudit.auditOne(spark, "pinned_trap", fixed)
    assert(!audit.violates, s"pinned version still single-task: $audit")
  }
}
