package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph centrality over edge lists — the link-analysis tier (document
  * graphs, co-purchase graphs, citation webs) next to
  * [[Dedup.connectedComponents]]' clustering.
  *
  * Determinism contract: ranks are exact FIXED-POINT longs (units of
  * 1/`unit`), every division is integer floor division, and every
  * per-node reduction is a sum of longs — which is order-independent, so
  * the result is bit-identical across partitionings, engines, and runs.
  * A double formulation would drift in the last bits with shuffle order
  * and could never hash-match an external oracle. The truncation error
  * is ≤ iters·deg/unit per node — with unit=1e12 that is noise far below
  * any ranking decision.
  */
object Graph {

  /** Fixed-iteration PageRank on a directed edge list (duplicate edges
    * collapse). Per iteration:
    * `r'(v) = ((100-d)·base) div 100 + (d·Σ_{(u,v)∈E} (r(u) div deg(u))) div 100`
    * with `base = unit div N` the uniform teleport mass. Nodes are the
    * union of endpoints; a node with no in-edges keeps the teleport term
    * only (left-join + coalesce).
    *
    * Shape per iteration: one hash shuffle joining ranks to the
    * out-edge list (pre-joined with out-degrees, so the join payload is
    * two longs per edge) + one hash aggregate on the destination — the
    * standard distributed PageRank step, O(|E|) per iteration with
    * map-side partial sums, no windows, no driver data. The edge and
    * node tables are materialized ONCE via `localCheckpoint` (the
    * [[Dedup.connectedComponents]] pattern — this operator, like every
    * iterative fit, is eager): without it the lazily-composed plan
    * re-derives the edge list in EVERY iteration — measured 8.2 s → 2 s
    * at sf0.1 on the co-purchase graph, and the waste multiplies with
    * both iteration count and edge-derivation cost. At 100 TB you
    * persist the edge list as a table and pass it in pre-derived. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampingPct: Int = 85,
      unit: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    // a NULL endpoint is not a node: it would survive the dst-side
    // union into the node set (inflating N and every node's teleport
    // share) while the null-rejecting rank join ignores its edges —
    // an asymmetric, meaningless (NULL, rank) row. Drop such edges.
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // deg is |V|-sized; broadcast it onto the |E|-sized edge list (the
    // checkpointed e reports unknown stats, so the planner would
    // otherwise sort 2×|E| rows for a merge join)
    val outEdges = e.join(broadcast(deg), "src").localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    // corpus-size scalar as a broadcast 1-row aggregate (the tfIdf/PMI
    // pattern — no eager count() at plan-construction time)
    val n1 = nodes.agg(count(lit(1)).as("__n"))
    val base = expr(s"$unit div __n")
    var ranks = nodes.crossJoin(broadcast(n1))
      .select(col("node"), base.as("r"), col("__n"))
    // ranks and contributions are |V|-sized — broadcast them explicitly
    // into the |E|-sized joins: a checkpointed edge table reports
    // unknown (default-huge) stats, so without the hints every
    // iteration would plan a sort-merge join over the edge list
    (1 to iters).foreach { _ =>
      val contrib = outEdges.join(broadcast(ranks), col("src") === col("node"))
        .select(col("dst").as("node"), expr("r div deg").as("__c"),
          col("__n"))
        .groupBy("node", "__n").agg(sum(col("__c")).as("__s"))
      ranks = nodes.crossJoin(broadcast(n1))
        .join(broadcast(contrib.withColumnRenamed("__n", "__n2")),
          Seq("node"), "left")
        .select(col("node"),
          (expr(s"((${100 - dampingPct} * ($unit div __n)) div 100)") +
            coalesce(expr(s"($dampingPct * __s) div 100"), lit(0L))).as("r"),
          col("__n"))
    }
    ranks.select(col("node"), col("r").as("rank_unit"))
  }
}
