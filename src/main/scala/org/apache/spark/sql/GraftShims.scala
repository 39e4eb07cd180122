package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}
import org.apache.spark.sql.execution.LogicalRDD

/** Access shim for `private[sql]` bridge points (the standard pattern for
  * Spark extension libraries): Spark 4 separates the public Column API
  * from Catalyst expressions behind ColumnNode; these two calls cross
  * that boundary for the classic (non-Connect) backend so graft can use
  * its native expressions from the Column API without requiring
  * `spark.sql.extensions` configuration. */
object GraftShims {
  def columnOf(e: Expression): Column = new Column(ExpressionColumnNode(e))
  def expressionOf(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)

  /** Eager local checkpoint that RETAINS a hash partitioning the planner
    * can trust. `Dataset.localCheckpoint` records
    * `executedPlan.outputPartitioning` — but under AQE any plan holding
    * an exchange is an `AdaptiveSparkPlanExec` leaf, whose partitioning
    * reads as Unknown, so the checkpoint forgets the very layout the
    * caller just shuffled into and every downstream join re-exchanges
    * the materialized table (for an iterative fit: once per iteration).
    * This helper performs the shuffle itself — an explicit-numPartitions
    * hash repartition, which AQE never coalesces — so the physical
    * layout is exactly `HashPartitioning(keys, numParts)` and it can pin
    * that fact onto the `LogicalRDD` it returns. Iterative consumers
    * (PageRank) then co-partition against the checkpoint for free. */
  def checkpointHashPartitioned(df: Dataset[Row], numParts: Int,
      keyCols: String*): Dataset[Row] =
    doCheckpointPinned(df.repartition(numParts, keyCols.map(df.col): _*),
      numParts, keyCols)

  /** Variant that pins WITHOUT shuffling: the caller asserts the input's
    * physical layout already is `HashPartitioning(keys, numParts)` —
    * true when every row-moving op since such a shuffle was layout-
    * preserving (narrow ops, or a join/agg zipping co-partitioned
    * inputs). A FALSE claim silently mis-joins downstream; keep this to
    * call sites whose derivation provably preserves the layout. */
  def checkpointClaimHashPartitioned(df: Dataset[Row], numParts: Int,
      keyCols: String*): Dataset[Row] =
    doCheckpointPinned(df, numParts, keyCols)

  private def doCheckpointPinned(df: Dataset[Row], numParts: Int,
      keyCols: Seq[String]): Dataset[Row] = {
    require(keyCols.nonEmpty && numParts > 0)
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val qe = ds.queryExecution
    val rdd = qe.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count() // materialize now — same eager contract as Dataset.localCheckpoint
    val output = qe.analyzed.output
    val keys = keyCols.map(k => output.find(_.name == k).getOrElse(
      throw new IllegalArgumentException(s"no column $k in ${output.map(_.name)}")))
    val part = HashPartitioning(keys, numParts)
    classic.Dataset.ofRows(ds.sparkSession,
      LogicalRDD(output, rdd, part, Nil, isStreaming = false, None)(
        ds.sparkSession, None, None))
  }
}
