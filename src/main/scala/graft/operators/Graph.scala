package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
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
    * Scale shape — the plan, not a hint: the edge list is hash-
    * partitioned on `src` ONCE and `localCheckpoint`ed (the checkpoint's
    * `LogicalRDD` carries the physical HashPartitioning forward), and the
    * rank table leaves every step hash-partitioned on `node` (the
    * aggregate's own exchange; projects/aliases preserve it). So each
    * iteration is one co-partitioned rank⋈edge join with NO exchange on
    * the |E| side, one |E|→|V| destination aggregate (map-side partial
    * sums — the iteration's single shuffle), and one co-partitioned
    * left join back onto the node set. No |V|-sized broadcast anywhere:
    * at 10⁸–10⁹ nodes a per-iteration rank broadcast is multi-GB —
    * past the broadcast ceiling and a driver OOM.
    *
    * Broadcasting the rank/contribution tables IS still profitable when
    * the graph is genuinely small (it deletes the per-iteration sorts),
    * so it survives as a size-gated optimization: iff the measured node
    * count ≤ `broadcastMaxNodes` (default 2M ≈ tens of MB — inside a
    * sane driver/executor broadcast budget; set 0 to force the
    * shuffle-join plan regardless). The gate reads an eager `count()` —
    * a scalar, and this operator (like every iterative fit) is already
    * eager through its checkpoints.
    *
    * The edge and node tables are materialized ONCE via
    * `localCheckpoint` (the [[Dedup.connectedComponents]] pattern):
    * without it the lazily-composed plan re-derives the edge list in
    * EVERY iteration — measured 8.2 s → 2 s at sf0.1 on the co-purchase
    * graph, and the waste multiplies with both iteration count and
    * edge-derivation cost. At 100 TB you persist the edge list as a
    * table and pass it in pre-derived. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampingPct: Int = 85,
      unit: Long = 1000000000000L,
      broadcastMaxNodes: Long = 2000000L): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    require(broadcastMaxNodes >= 0L)
    // both base tables are checkpointed WITH their hash layout pinned
    // (GraftShims.checkpointHashPartitioned): under AQE a plain
    // localCheckpoint forgets its partitioning, and every iteration
    // would re-exchange the |E| edge table it was just shuffled into
    val p = edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // a NULL endpoint is not a node: it would survive the dst-side
    // union into the node set (inflating N and every node's teleport
    // share) while the null-rejecting rank join ignores its edges —
    // an asymmetric, meaningless (NULL, rank) row. Drop such edges.
    val e = GraftShims.checkpointHashPartitioned(
      edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .distinct(),
      p, "src")
    // deg (|V|-sized) comes from grouping the pinned e on src, so it is
    // born co-partitioned with e — the degree-attach join plans with NO
    // exchange on either side and, crucially, no |V| broadcast. Its
    // output is a partition-zip of two src-partitioned inputs, i.e.
    // still physically HashPartitioning(src, p), so the checkpoint pins
    // that claim without paying a second |E| shuffle.
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val outEdges = GraftShims.checkpointClaimHashPartitioned(
      e.join(deg, "src"), p, "src")
    val nodes = GraftShims.checkpointHashPartitioned(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct(),
      p, "node")
    val n = nodes.count()
    if (n == 0L)
      return nodes.select(col("node"), lit(0L).as("rank_unit"))
    // all-positive integer arithmetic: Scala / == SQL div here, so the
    // driver-side fold of these constants is bit-identical to an
    // engine-side expression tree
    val base = unit / n
    val tele = ((100L - dampingPct) * base) / 100L
    val gate: DataFrame => DataFrame =
      if (n <= broadcastMaxNodes) broadcast else identity
    var ranks = nodes.select(col("node"), lit(base).as("r"))
    (1 to iters).foreach { _ =>
      val contrib = outEdges.join(gate(ranks), col("src") === col("node"))
        .select(col("dst"), expr("r div deg").as("__c"))
        .groupBy("dst").agg(sum(col("__c")).as("__s"))
        .withColumnRenamed("dst", "node")
      ranks = nodes.join(gate(contrib), Seq("node"), "left")
        .select(col("node"),
          (lit(tele) +
            coalesce(expr(s"($dampingPct * __s) div 100"), lit(0L))).as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_unit"))
  }
}
