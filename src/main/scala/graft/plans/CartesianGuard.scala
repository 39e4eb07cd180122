package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Guardrail rule: fail FAST on an accidental cartesian product.
  *
  * Spark 3+ executes a condition-less inner join silently
  * (`spark.sql.crossJoin.enabled` defaults to true) — at 100 TB an
  * `a.join(b)` that was meant to be `a.join(b, key)` is a cluster-melting
  * O(n·m) mistake discovered hours into the run. With the guard enabled
  * (`spark.graft.guard.cartesian=true`), planning such a join THROWS at
  * optimization time instead, with the offending plan in the message.
  * Deliberate products stay available two ways: the explicit
  * `crossJoin()` API (which plans as `Cross`, not `Inner`) or turning
  * the conf back off for a session. A trivially-true literal condition
  * is treated the same as no condition — Catalyst folds `lit(true)`
  * conditions away before this rule runs.
  *
  * Opt-in rather than default because the library itself uses explicit
  * broadcast `crossJoin`s for 1-row stat tables — the pattern the guard
  * deliberately permits. */
object CartesianGuard extends Rule[LogicalPlan] {

  def enable(spark: SparkSession): Unit = {
    spark.conf.set("spark.graft.guard.cartesian", "true")
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.guard.cartesian", "false") == "true")
      plan.foreach {
        case j @ Join(_, _, Inner, None, _) =>
          throw new IllegalStateException(
            "cartesian product blocked by spark.graft.guard.cartesian: " +
              "inner join has no condition. Use crossJoin() if the " +
              s"product is intended.\n${j.simpleString(3)}")
        case _ => ()
      }
    plan
  }
}
