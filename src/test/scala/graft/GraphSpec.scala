package graft

import graft.operators.{Dedup, Graph}

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

  // round-14 cadence twin: the authority gather feeds the hub gather
  // RAW; hubs renormalize once per round, authorities once at output.
  // BigInt rescale == the engine's exact two-stage ×u1×u2 identity.
  private def jvmHits(edges: Seq[(Long, Long)], rounds: Int,
      unit: Long = 1000000L): Map[Long, (Long, Long)] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    def rescale(raw: Map[Long, Long]): Map[Long, Long] = {
      val mx = raw.values.max
      raw.view.mapValues(v => (BigInt(v) * unit / mx).toLong).toMap
    }
    var h = nodes.map(_ -> unit).toMap
    var aRaw = Map.empty[Long, Long]
    (1 to rounds).foreach { _ =>
      aRaw = e.groupBy(_._2).view
        .mapValues(_.map(x => h.getOrElse(x._1, 0L)).sum).toMap
      val hRaw = e.groupBy(_._1).view
        .mapValues(_.map(x => aRaw.getOrElse(x._2, 0L)).sum).toMap
      h = rescale(hRaw)
    }
    val a = rescale(aRaw)
    nodes.map(n =>
      n -> ((a.getOrElse(n, 0L), h.getOrElse(n, 0L)))).toMap
  }

  test("hits: bipartite roles, JVM-twin equality, L-inf normalization, direction") {
    // customers 1,2 -> parts 11,12: c1 buys both, c2 buys 11 only
    val edges = Seq((1L, 11L), (1L, 12L), (2L, 11L))
    val out = Graph.hits(edges.toDF("s", "d"), "s", "d", rounds = 3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == jvmHits(edges, 3), out.toString)
    // sources never gather authority, sinks never gather hub mass
    assert(out(1L)._1 == 0L && out(2L)._1 == 0L)
    assert(out(11L)._2 == 0L && out(12L)._2 == 0L)
    // L-inf: the best authority and best hub sit exactly at unit
    assert(out(11L)._1 == 1000000L && out(1L)._2 == 1000000L)
    // mutual reinforcement: the part bought by BOTH outranks the other,
    // the broader-basket customer outranks the narrower
    assert(out(11L)._1 > out(12L)._1 && out(1L)._2 > out(2L)._2)
    // direction matters: reversing edges swaps the roles
    val rev = Graph.hits(edges.map(e => (e._2, e._1)).toDF("s", "d"),
        "s", "d", rounds = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rev(1L)._2 == 0L && rev(11L)._1 == 0L)
    // null endpoints and duplicate edges drop/collapse
    val dirty = (edges ++ edges).map { case (s0, d0) => (Some(s0), Some(d0)) } :+
      ((Option.empty[Long], Some(11L)))
    val cleaned = Graph.hits(dirty.toDF("s", "d"), "s", "d", rounds = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(cleaned == out)
  }

  test("hits shuffle-join path (gate=0) is bit-identical to the broadcast path") {
    val edges = Seq((1L, 11L), (1L, 12L), (2L, 11L), (3L, 12L), (2L, 13L))
    val b = Graph.hits(edges.toDF("s", "d"), "s", "d", rounds = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val sh = Graph.hits(edges.toDF("s", "d"), "s", "d", rounds = 2,
        broadcastMaxNodes = 0L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(b == sh)
  }

  test("triangleCounts: hand-checked K4 plus pendant; dup/reversed edges collapse") {
    // K4 on {1,2,3,4} = 4 triangles, each node in 3; node 5 pendant off
    // 4 (degree 1, zero triangles). Edges arrive duplicated + reversed.
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a != b
    } yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (4L, 5L), (5L, 4L))).toDF("s", "d")
    val out = Graph.triangleCounts(edges, "s", "d")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out == Map(
      1L -> ((3L, 3L)), 2L -> ((3L, 3L)), 3L -> ((3L, 3L)),
      4L -> ((4L, 3L)), 5L -> ((1L, 0L))))
  }

  test("triangleCounts: triangle-free graph reports zeros; self-loops/nulls dropped") {
    val edges = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (2L, 3L), (3L, 4L),     // path: no triangles
      (2L, 2L),                          // self-loop ignored
      (null, 1L), (3L, null)             // null endpoints ignored
    ).toDF("s", "d")
    val out = Graph.triangleCounts(edges, "s", "d")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out == Map(1L -> ((1L, 0L)), 2L -> ((2L, 0L)),
      3L -> ((2L, 0L)), 4L -> ((1L, 0L))))
  }

  test("triangleCounts: hub graph matches brute-force enumeration") {
    // hub 0 connected to 1..8, plus ring edges among spokes — exercises
    // the degree-ordering (hub has max degree, must not explode wedges)
    val spokes = (1L to 8L).map(i => (0L, i))
    val ring = (1L to 8L).map(i => (i, if (i == 8L) 1L else i + 1L))
    val all = spokes ++ ring
    val out = Graph.triangleCounts(all.toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // brute force over the undirected edge set
    val es = all.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val ns = es.map(_._1).toSeq.sorted
    val tris = for {
      a <- ns; b <- ns if a < b && es((a, b))
      c <- ns if b < c && es((b, c)) && es((a, c))
    } yield (a, b, c)
    val expect = ns.map(n =>
      n -> tris.count(t => t._1 == n || t._2 == n || t._3 == n).toLong).toMap
    assert(out == expect)
  }

  test("triangleCounts shuffle-join path (gate=0) matches the broadcast path") {
    val edges = ((1L to 4L).flatMap(a => (1L to 4L).collect {
      case b if a != b => (a, b)
    }) ++ Seq((4L, 5L), (5L, 6L), (6L, 4L))).toDF("s", "d")
    val viaBroadcast = Graph.triangleCounts(edges, "s", "d")
      .as[(Long, Long, Long)].collect().toSet
    val viaShuffle = Graph.triangleCounts(edges, "s", "d",
        broadcastMaxEdges = 0L)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaShuffle == viaBroadcast)
    assert(viaBroadcast.nonEmpty)
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

  test("labelPropagation: dense neighborhoods outvote the bridge (hand-traced 4 rounds)") {
    // two triangles {1,2,3} and {4,5,6} joined by bridge 3-4: LPA keeps
    // two communities where connected components would merge everything.
    // Hand trace (min-label ties): l4 = {1,2,3}->1, {4,5,6}->3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("s", "d")
    val out = Graph.labelPropagation(edges, "s", "d", iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), out.toString)
    // the components baseline merges the same graph into ONE cluster
    val cc = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
      .select("component").distinct().as[Long].collect().toSeq
    assert(cc == Seq(1L))
    // shuffle path (gate=0) must be bit-identical to the broadcast path
    val viaShuffle = Graph.labelPropagation(edges, "s", "d", iters = 4,
        broadcastMaxNodes = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaShuffle == out)
    // degenerate inputs: empty edge list, self-loops-only
    assert(Graph.labelPropagation(
      Seq.empty[(Long, Long)].toDF("s", "d"), "s", "d", 2).count() == 0)
    assert(Graph.labelPropagation(
      Seq((7L, 7L)).toDF("s", "d"), "s", "d", 2).count() == 0)
  }

  test("kCore: pendant chain cascades off a K4 core (hand-traced peels)") {
    // K4 {1,2,3,4} + chain 4-5-6. k=2: round 1 removes 6 (1 alive
    // neighbor), round 2 removes 5 (4 alive, 6 gone -> 1), round 3 is a
    // no-op. Survivors: the K4, each with 3 in-core neighbors. Edges
    // arrive duplicated and reversed; dups must collapse.
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a != b } yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 4L), (5L, 6L))).toDF("s", "d")
    val out = Graph.kCore(edges, "s", "d", k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), out.toString)
    // shuffle path (gate=0) must be bit-identical to the broadcast path
    val viaShuffle = Graph.kCore(edges, "s", "d", k = 2, rounds = 3,
      broadcastMaxNodes = 0L).as[(Long, Long)].collect().toMap
    assert(viaShuffle == out)
  }

  test("kCore: fixed rounds define a partial peel; degrees < k can survive") {
    // path 1-2-...-8, k=2: each round peels both current endpoints.
    // After exactly 2 rounds {3,4,5,6} survive; the ENDPOINTS of the
    // surviving sub-path (3 and 6) report in-core degree 1 < k — the
    // documented non-converged contract the oracle mirrors.
    val path = (1L to 7L).map(i => (i, i + 1)).toDF("s", "d")
    val out = Graph.kCore(path, "s", "d", k = 2, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(3L -> 1L, 4L -> 2L, 5L -> 2L, 6L -> 1L), out.toString)
    // two more rounds converge to the (empty) true 2-core of a path
    assert(Graph.kCore(path, "s", "d", k = 2, rounds = 5).count() == 0)
    // degenerate inputs: empty list, self-loops-only, k above max degree
    assert(Graph.kCore(Seq.empty[(Long, Long)].toDF("s", "d"),
      "s", "d", 2, 2).count() == 0)
    assert(Graph.kCore(Seq((7L, 7L)).toDF("s", "d"), "s", "d", 1, 2)
      .count() == 0)
    assert(Graph.kCore(Seq((1L, 2L)).toDF("s", "d"), "s", "d", 5, 1)
      .count() == 0)
  }

  test("personalizedPageRank: JVM-twin fixed rounds, distance decay, seed contracts") {
    // undirected path 1-2-3-4, seed {1}
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (3L, 4L), (4L, 3L)).toDF("s", "d")
    val out = Graph.personalizedPageRank(edges, Seq(1L).toDF("n"), "n",
      "s", "d", iters = 4).as[(Long, Long)].collect().toMap
    // reference loop: exact integer arithmetic, same fold order
    val deg = Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L)
    val adj = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L, 3L -> 4L,
      4L -> 3L)
    val tele = Map(1L -> (15L * (1000000000000L / 1L)) / 100L)
      .withDefaultValue(0L)
    var r: Map[Long, Long] = (1L to 4L).map(n => n -> tele(n)).toMap
    (1 to 4).foreach { _ =>
      val in = adj.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / deg(u) }.sum }
      r = (1L to 4L).map(n =>
        n -> (tele(n) + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    assert(out == r, s"spark=$out twin=$r")
    // proximity decays with hop distance from the seed
    assert(out(1L) > out(2L) && out(2L) > out(3L) && out(3L) > out(4L))
    // a seed OUTSIDE the graph holds teleport mass; split halves tele
    val out2 = Graph.personalizedPageRank(edges, Seq(1L, 9L).toDF("n"),
      "n", "s", "d", iters = 1).as[(Long, Long)].collect().toMap
    val t2 = (15L * (1000000000000L / 2L)) / 100L
    // the isolated seed keeps exactly its teleport mass; the in-graph
    // seed's mass has flowed one hop (2 gains, 4 still unreached)
    assert(out2(9L) == t2 && out2(1L) == t2)
    assert(out2(2L) > 0L && out2(4L) == 0L)
    // empty seed set: all-zero ranks, no division by zero
    assert(Graph.personalizedPageRank(edges,
        Seq.empty[Long].toDF("n"), "n", "s", "d", iters = 1)
      .as[(Long, Long)].collect().toMap.values.toSet == Set(0L))
  }

  test("adamicAdar: exact weights, hub cap excludes, top-k total order") {
    // z10 {1,2} deg2; z20 {1,2,3} deg3; z30 {1,4} deg2;
    // z40 {1..5} deg5 -> excluded at maxDeg=4; z50 {9} deg1 -> no pair
    val edges = (Seq((1L, 10L), (2L, 10L), (1L, 20L), (2L, 20L),
      (3L, 20L), (1L, 30L), (4L, 30L), (9L, 50L)) ++
      (1L to 5L).map(u => (u, 40L)) :+ ((2L, 10L))) // dup edge collapses
      .toDF("u", "z")
    val w2 = math.floor(1e6 / math.log(2.0) + 0.5).toLong
    val w3 = math.floor(1e6 / math.log(3.0) + 0.5).toLong
    val out = Graph.adamicAdar(edges, "u", "z", maxDeg = 4, topK = 100)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // (1,2) share z10 AND z20; (1,3)/(2,3) share z20; (1,4) shares z30
    assert(out == Map(
      (1L, 2L) -> ((2L, w2 + w3)), (1L, 3L) -> ((1L, w3)),
      (2L, 3L) -> ((1L, w3)), (1L, 4L) -> ((1L, w2))),
      out.toString)
    // pairs sharing ONLY the over-cap hub z40 (e.g. 4-5) never mint;
    // top-k truncates in (score desc, u_a, u_b) total order
    val top2 = Graph.adamicAdar(edges, "u", "z", maxDeg = 4, topK = 2)
      .as[(Long, Long, Long, Long)].collect().map(r => (r._1, r._2))
    assert(top2.toSeq == Seq((1L, 2L), (1L, 4L)), top2.mkString(","))
    // the generic two-column path (packIds = false) is bit-identical,
    // including the top-k tie order
    val generic = Graph.adamicAdar(edges, "u", "z", maxDeg = 4, topK = 100,
      packIds = false).as[(Long, Long, Long, Long)].collect()
    val packed = Graph.adamicAdar(edges, "u", "z", maxDeg = 4, topK = 100,
      packIds = true).as[(Long, Long, Long, Long)].collect()
    assert(packed.toSeq == generic.toSeq)
  }

  test("adamicAdar packed path: 31-bit boundary ids pack round-trip; " +
      "wider ids fail loudly, never alias") {
    val big = (1L << 31) - 1 // max packable id
    val edges = Seq((0L, 10L), (big, 10L), (0L, 20L), (big, 20L))
      .toDF("u", "z")
    val out = Graph.adamicAdar(edges, "u", "z", maxDeg = 4, topK = 10,
      packIds = true).as[(Long, Long, Long, Long)].collect()
    val w2 = math.floor(1e6 / math.log(2.0) + 0.5).toLong
    assert(out.toSeq == Seq((0L, big, 2L, 2 * w2)), out.mkString(","))
    // one id past the boundary: the packed OPT-IN must THROW (silent
    // wraparound would alias unrelated pairs) and the generic path
    // must still work
    val wide = Seq((0L, 10L), (1L << 31, 10L)).toDF("u", "z")
    val e = intercept[org.apache.spark.SparkException] {
      Graph.adamicAdar(wide, "u", "z", maxDeg = 4, topK = 10,
        packIds = true).collect()
    }
    assert(e.getCause.getMessage.contains("id_pairs_packed"),
      e.getCause.getMessage)
    val ok = Graph.adamicAdar(wide, "u", "z", maxDeg = 4, topK = 10,
      packIds = false).as[(Long, Long, Long, Long)].collect()
    assert(ok.toSeq == Seq((0L, 1L << 31, 1L,
      math.floor(1e6 / math.log(2.0) + 0.5).toLong)))
  }

  test("boundedDistinctSet: dedup across partitions, overflow -> null") {
    import graft.functions.Native
    import org.apache.spark.sql.functions._
    // 8 partitions force the merge path; key 1 has 3 distinct values
    // (each duplicated), key 2 exceeds maxSize=3 with 4 distinct, key 3
    // holds zero/negative ids (no empty-sentinel collision), key 4 is
    // all-null input (empty set, not null result)
    val df = spark.createDataFrame(
      ((1L to 3L).flatMap(v => Seq((1L, Option(v)), (1L, Option(v)))) ++
        (10L to 13L).map(v => (2L, Option(v))) ++
        Seq((3L, Option(0L)), (3L, Option(-5L)), (3L, Option(0L)),
          (4L, Option.empty[Long]))
      ).toList.asInstanceOf[List[(Long, Option[Long])]])
      .toDF("k", "v").repartition(8)
    val out = df.groupBy("k")
      .agg(sort_array(Native.boundedDistinctSet(col("v"), 3)).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1).toList)).toMap
    assert(out(1L) == List(1L, 2L, 3L))
    assert(out(2L) == null) // 4 distinct > maxSize=3: overflow poisons
    assert(out(3L) == List(-5L, 0L))
    assert(out(4L) == List()) // nulls skipped, empty set survives
  }
}
