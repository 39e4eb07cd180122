package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val U = 1000000000000L

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("s", "d"), "s", "d", iters)
      .as[(Long, Long)].collect().toMap

  test("pageRank 2-cycle is stationary at the uniform fixed point") {
    // A<->B: base = U/2, each node re-receives exactly its own mass:
    // r' = (15*(U/2))//100 + (85*(U/2))//100 = U/2 at every iteration
    val r = ranks(Seq((1L, 2L), (2L, 1L)), 5)
    assert(r == Map(1L -> U / 2, 2L -> U / 2))
  }

  test("pageRank node with no in-edges keeps only the teleport term") {
    // A->B: r_k(A) = (15*(U/2))//100 = 75e9 for every k>=1;
    // r_2(B) = 75e9 + (85*75e9)//100 (hand-unrolled fixed-point)
    val r = ranks(Seq((1L, 2L)), 2)
    assert(r(1L) == 75000000000L)
    assert(r(2L) == 75000000000L + (85L * 75000000000L) / 100L)
  }

  test("pageRank hub of a star out-ranks the spokes, which tie exactly") {
    val star = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L), (1L, 3L), (1L, 4L))
    val r = ranks(star, 3)
    assert(r(1L) > r(2L))
    assert(r(2L) == r(3L) && r(3L) == r(4L), "symmetric spokes must tie bit-exactly")
  }

  test("pageRank duplicate edges collapse; total mass stays ~1 (truncation only)") {
    val r = ranks(Seq((1L, 2L), (1L, 2L), (2L, 3L), (3L, 1L)), 4)
    val rDedup = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)), 4)
    assert(r == rDedup)
    // a 3-cycle conserves mass up to integer-division dust
    assert(math.abs(r.values.sum - U) < 100L, r.toString)
  }

  test("pageRank shuffle-join path (gate=0) is bit-identical to the broadcast path") {
    // the size gate must be a pure optimization: forcing the
    // co-partitioned shuffle plan may never change a single rank bit
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val viaBroadcast = Graph.pageRank(edges.toDF("s", "d"), "s", "d", 4)
      .as[(Long, Long)].collect().toMap
    val viaShuffle = Graph.pageRank(edges.toDF("s", "d"), "s", "d", 4,
        broadcastMaxNodes = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaShuffle == viaBroadcast)
    assert(viaBroadcast(1L) > viaBroadcast(4L))
  }
}
