package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String) = Timestamp.valueOf(s)

  test("cohortRetention: daily cohorts, offsets, exact rates; nulls dropped") {
    val ev = Seq[(java.lang.Long, Timestamp)](
      // cohort day 0 (2024-01-01): users 1,2 — both return day 1,
      // only user 1 returns day 2; duplicate same-day events collapse
      (1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-01 17:00:00")),
      (2L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-02 10:00:00")), (2L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-03 10:00:00")),
      // cohort day 1: user 3 never returns
      (3L, ts("2024-01-02 12:00:00")),
      // unattributable rows
      (null, ts("2024-01-01 00:00:00")), (4L, null)
    ).toDF("user_id", "ts")
    val out = Temporal.cohortRetention(ev, "user_id", "ts", bucketDays = 1)
      .select("cohort_bucket", "bucket_offset", "n_active", "cohort_size",
        "retention")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    val d0 = 19723L // days from 1970-01-01 to 2024-01-01
    assert(out == Map(
      (d0, 0L) -> ((2L, 2L, 1.0)),
      (d0, 1L) -> ((2L, 2L, 1.0)),
      (d0, 2L) -> ((1L, 2L, 0.5)),
      (d0 + 1, 0L) -> ((1L, 1L, 1.0))))
  }

  test("cohortRetention: weekly buckets fold days; offset 0 is always 1.0") {
    // epoch-anchored buckets: day 19719 (2023-12-28) starts bucket 2817,
    // so Jan 1 and Jan 3 share a bucket and Jan 6 opens the next one
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00")),  // bucket 2817
      (1L, ts("2024-01-03 09:00:00")),  // same bucket
      (1L, ts("2024-01-06 09:00:00")),  // bucket 2818
      (2L, ts("2024-01-02 09:00:00"))   // bucket 2817, never returns
    ).toDF("user_id", "ts")
    val out = Temporal.cohortRetention(ev, "user_id", "ts", bucketDays = 7)
      .select("bucket_offset", "n_active", "cohort_size", "retention")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set((0L, 2L, 2L, 1.0), (1L, 1L, 2L, 0.5)))
  }

  test("asofJoin attaches latest right row at-or-before, per key") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", ts("2024-01-01 10:00:10")),
      (3L, "B", ts("2024-01-01 10:00:01")),
      (4L, "C", ts("2024-01-01 10:00:10"))
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:00:05"), 101.0), // equal ts -> inclusive
      ("A", ts("2024-01-01 10:00:09"), 102.0),
      ("B", ts("2024-01-01 10:00:02"), 50.0)   // after B's trade -> no match
    ).toDF("qsym", "qt", "px")
    val out = Temporal.asofJoin(trades, quotes, "sym", "qsym", "t", "qt")
      .select("trade_id", "asof_px").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).contains(101.0)) // equal-timestamp quote wins (<=)
    assert(out(2L).contains(102.0)) // latest preceding
    assert(out(3L).isEmpty)         // only later quotes exist
    assert(out(4L).isEmpty)         // key never quoted
  }

  test("asofJoin plan has one shuffle and no join node") {
    val l = (1 to 100).map(i => (i.toLong, i % 5, i)).toDF("id", "k", "t")
    val r = (1 to 50).map(i => (i % 5, i, i * 10)).toDF("rk", "rt", "v")
    val plan = Temporal.asofJoin(l, r, "k", "rk", "t", "rt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "as-of must not plan a join")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1)
  }

  test("rollingWindow computes trailing-window count/sum per key") {
    val df = Seq(
      // key A: days 1, 5, 9, 20 — 7d window spans [t-7d, t] inclusive
      ("A", ts("2024-01-01 00:00:00"), 10L),
      ("A", ts("2024-01-05 00:00:00"), 20L),
      ("A", ts("2024-01-09 00:00:00"), 30L),
      ("A", ts("2024-01-20 00:00:00"), 40L),
      // key B: single row
      ("B", ts("2024-01-01 00:00:00"), 5L)
    ).toDF("k", "t", "v")
    val out = Temporal.rollingWindow(df, "k", "t", col("v"), 7L * 86400)
      .select("k", "v", "rolling_cnt", "rolling_sum")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("A", 10L, 1L, 10L),          // nothing precedes
      ("A", 20L, 2L, 30L),          // day 1 is 4d back
      ("A", 30L, 2L, 50L),          // day 5 in, day 1 (8d) out
      ("A", 40L, 1L, 40L),          // 11d gap
      ("B", 5L, 1L, 5L)))           // keys never mix
  }

  test("rollingWindow frame is inclusive at exactly -window and on timestamp peers") {
    val df = Seq(
      ("A", ts("2024-01-01 00:00:00"), 1L),
      ("A", ts("2024-01-08 00:00:00"), 2L),  // exactly 7d later -> included
      // two rows at one instant: RANGE peers see each other
      ("C", ts("2024-02-01 12:00:00"), 3L),
      ("C", ts("2024-02-01 12:00:00"), 4L)
    ).toDF("k", "t", "v")
    val out = Temporal.rollingWindow(df, "k", "t", col("v"), 7L * 86400)
      .select("k", "v", "rolling_cnt", "rolling_sum")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out(("A", 2L, 2L, 3L)), "boundary row exactly window-distant is in frame")
    assert(out(("C", 3L, 2L, 7L)) && out(("C", 4L, 2L, 7L)),
      "equal-timestamp rows are mutual frame peers")
  }

  test("funnel enforces step order and nulls out from the first drop-off") {
    val ev = Seq(
      // user 1: full conversion, with a decoy earlier purchase BEFORE
      // the click — step 3 must pick the one after step 2
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "purchase", ts("2024-01-01 10:00:30")),
      (1L, "click", ts("2024-01-01 10:01:00")),
      (1L, "purchase", ts("2024-01-01 10:02:00")),
      // user 2: view only
      (2L, "view", ts("2024-01-01 11:00:00")),
      // user 3: click BEFORE the first view -> step 2 unmatched
      (3L, "click", ts("2024-01-01 09:00:00")),
      (3L, "view", ts("2024-01-01 09:30:00")),
      // user 4: never views -> not in the funnel at all
      (4L, "click", ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "event_type", "t")
    val out = Temporal.funnel(ev, "user_id", "t", "event_type",
      Seq("view", "click", "purchase"))
      .as[(Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def us(s: String) = ts(s).getTime * 1000L
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((us("2024-01-01 10:00:00"),
      Some(us("2024-01-01 10:01:00")), Some(us("2024-01-01 10:02:00")))),
      "the pre-click purchase must not satisfy step 3")
    assert(out(2L) == ((us("2024-01-01 11:00:00"), None, None)))
    assert(out(3L) == ((us("2024-01-01 09:30:00"), None, None)),
      "a click before the first view does not convert")
  }

  test("sessionizeSalted == sessionize on a skewed corpus with boundary sessions") {
    // one hot user (0) with events spanning 6 days — including sessions
    // that STRADDLE the day-bucket boundary (events at 23:59 and 00:10
    // next day, gap 11 min < 30 min: the salt split must merge them
    // back) and multi-day-gap silences; plus normal users and an
    // equal-timestamp tie pair to exercise the orderCol tie-break
    val base = ts("2024-03-01 00:00:00").getTime
    def at(dayOffset: Double, id: Long, user: Long) =
      (id, user, new Timestamp(base + (dayOffset * 86400000L).toLong))
    val events = (
      // hot user: a burst every 2 hours for 6 days (each burst = its own
      // session; 3 events per burst, 5 min apart)
      (for (d <- 0 until 6; h <- 0 until 24 by 2; i <- 0 until 3)
        yield at(d + h / 24.0 + i * 5 / 1440.0,
          (d * 100000 + h * 100 + i).toLong, 0L)) ++
      // boundary straddle: 23:59 day 1 + 00:10 day 2 (same session)
      Seq(at(1.9993, 900001L, 7L), at(2.0069, 900002L, 7L),
        // equal timestamps, distinct event ids (tie-break path)
        at(3.5, 900003L, 8L), at(3.5, 900004L, 8L),
        // multi-day silence: day 0 and day 4 (separate sessions)
        at(0.25, 900005L, 9L), at(4.25, 900006L, 9L))
    ).toDF("event_id", "user_id", "ts")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "session_seq", "n_events",
        "session_start_us", "session_end_us", "duration_secs")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val plain = rows(Temporal.sessionize(events, "user_id", "ts", "event_id", 1800))
    val salted = rows(Temporal.sessionizeSalted(events, "user_id", "ts", "event_id",
      1800, saltDays = 1))
    assert(salted == plain)
    // the straddling pair really did merge into ONE session
    assert(plain.count(r => r._1 == 7L) == 1)
    assert(plain.find(r => r._1 == 7L).get._3 == 2L)
    // and the silence really did split
    assert(plain.count(r => r._1 == 9L) == 2)
  }

  test("sessionizeSalted salts the per-event exchange by (user, bucket)") {
    val events = (0 until 100).map(i =>
      (i.toLong, i % 3L, new Timestamp(1700000000000L + i * 60000L)))
      .toDF("event_id", "user_id", "ts")
    val plan = Temporal.sessionizeSalted(events, "user_id", "ts", "event_id", 1800)
      .queryExecution.executedPlan.toString
    // phase-1 window partitions by (user, salt) — the hot-key defence
    assert(plan.contains("__salt"), plan.take(2000))
    // salt must not leak into the output schema
    val cols = Temporal.sessionizeSalted(events, "user_id", "ts", "event_id", 1800)
      .columns.toSeq
    assert(cols == Seq("user_id", "session_seq", "n_events",
      "session_start_us", "session_end_us", "duration_secs"))
  }

  test("mergeIntervals: overlap and touch merge, gaps split, malformed dropped") {
    val iv = Seq(
      // group a: [1,5] [3,8] overlap; [8,10] touches (s == running max);
      // [12,12] gapped -> island 2; [20,15] malformed -> dropped
      ("a", 1L, 5L), ("a", 3L, 8L), ("a", 8L, 10L), ("a", 12L, 12L),
      ("a", 20L, 15L),
      // group b: duplicate intervals collapse into one island of 2
      ("b", 4L, 6L), ("b", 4L, 6L)
    ).toDF("g", "s", "e")
    val out = Temporal.mergeIntervals(iv, "g", "s", "e")
      .select("g", "island", "window_start", "window_end", "n_intervals")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("a", 1L, 1L, 10L, 3L), ("a", 2L, 12L, 12L, 1L),
      ("b", 1L, 4L, 6L, 2L)))
    // an interval swallowed by a longer earlier one must not split
    // (the running max, not lag(e), is the boundary test)
    val swallow = Seq(("c", 1L, 100L), ("c", 2L, 3L), ("c", 5L, 6L))
      .toDF("g", "s", "e")
    assert(Temporal.mergeIntervals(swallow, "g", "s", "e").count() == 1)
  }

  test("resampleLocf: dense grid, forward fill, last-per-bucket with tie-break") {
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: obs in hour-buckets 0 and 3 (step=3600) -> 1,2 filled
      (1L, 101L, t("2024-01-01 00:10:00"), 10.0),
      (1L, 102L, t("2024-01-01 00:50:00"), 20.0),  // later ts wins bucket 0
      (1L, 103L, t("2024-01-01 03:05:00"), 30.0),
      // user 2: equal timestamps -> higher event_id wins the tie
      (2L, 201L, t("2024-01-01 05:00:00"), 1.0),
      (2L, 202L, t("2024-01-01 05:00:00"), 2.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Temporal.resampleLocf(ev, "user_id", "ts", col("value"),
      "event_id", 3600L)
      .select("user_id", "bucket_s", "value_filled", "n_obs")
      .as[(Long, Long, Double, Long)].collect().toSet
    val h0 = t("2024-01-01 00:00:00").getTime / 1000
    assert(out == Set(
      (1L, h0, 20.0, 2L), (1L, h0 + 3600, 20.0, 0L),
      (1L, h0 + 7200, 20.0, 0L), (1L, h0 + 10800, 30.0, 1L),
      (2L, h0 + 18000, 2.0, 2L)))
  }

  test("rangeJoinByValue finds exactly the in-range pairs, no duplicates") {
    val e = Seq((1L, 1.0), (2L, 1.3), (3L, 1.6), (4L, 5.0))
      .toDF("event_id", "value")
    val out = Temporal.rangeJoinByValue(e, e, "value", "value", 0.5)
      .filter(col("a_event_id") < col("b_event_id"))
      .select("a_event_id", "b_event_id").as[(Long, Long)].collect()
    assert(out.length == out.distinct.length, "bucket expansion duplicated pairs")
    // |1.0-1.3|=.3 ok; |1.3-1.6|=.3 ok; |1.0-1.6|=.6 out; 5.0 isolated
    assert(out.toSet == Set((1L, 2L), (2L, 3L)))
  }
}

class NativeCosineSpec extends SparkSpec {
  import spark.implicits._

  val vecs = (0 until 30).map { i =>
    (i.toLong, Array.tabulate(16)(d => (math.sin(i * 16 + d) * 3).toFloat))
  }.toDF("vec_id", "embedding")

  test("native lsh_bucket is bit-identical to the composable weight-chain form") {
    val both = vecs.select(
      graft.operators.Similarity.lshBucket(col("embedding"), 2, 8, 16).as("native"),
      graft.operators.Similarity.lshBucketComposable(col("embedding"), 2, 8, 16).as("chain"))
      .as[(Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, c) => assert(n == c) }
    // null array and short array both yield null
    val edge = Seq((1L, Some(Array(1.0f, 2.0f))), (2L, None))
      .toDF("id", "embedding")
      .select(graft.operators.Similarity.lshBucket(col("embedding"), 0, 4, 16))
      .collect()
    assert(edge.forall(_.isNullAt(0)))
  }

  test("native cosine_sim is bit-identical to the composable HOF form") {
    val both = vecs.as("a").join(vecs.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        graft.operators.Similarity.cosine(col("a.embedding"), col("b.embedding")).as("native"),
        graft.operators.Similarity.cosineComposable(col("a.embedding"), col("b.embedding")).as("hof"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(h)) // exact, not approximate
    }
  }

  test("native cosine participates in whole-stage codegen") {
    val df = vecs.as("a").join(vecs.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(graft.operators.Similarity.cosine(
        col("a.embedding"), col("b.embedding")).as("c"))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks whole-stage-codegen membership in plan text
    assert("""\*\(\d+\) Project \[cosine_sim""".r.findFirstIn(plan).isDefined,
      plan.take(1500))
  }

  test("null array, length mismatch, and zero-norm vectors yield null") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f, 2.0f))),
      (None, Some(Array(1.0f, 2.0f))),
      (Some(Array(1.0f)), Some(Array(1.0f, 2.0f))),
      (Some(Array(0.0f, 0.0f)), Some(Array(1.0f, 2.0f))) // 0/0: NULL, not NaN
    ).toDF("a", "b")
    val out = df.select(graft.functions.Native.cosineSim(col("a"), col("b")))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out(0).exists(v => math.abs(v - 1.0) < 1e-12))
    assert(out(1).isEmpty && out(2).isEmpty && out(3).isEmpty)
    // the composable twin agrees on the zero-norm contract (and must not
    // throw under ANSI division)
    val comp = df.select(graft.operators.Similarity.cosineComposable(col("a"), col("b")))
      .collect().map(r => r.isNullAt(0))
    assert(comp.toSeq == Seq(false, true, true, true))
    // a NULL ELEMENT null-poisons like the zip_with form (reading the
    // slot raw would silently treat it as 0.0 — a wrong finite number)
    val withNullElem = spark.sql(
      "SELECT array(CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE)) AS a, " +
        "array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)) AS b")
    val ne = withNullElem
      .select(graft.functions.Native.cosineSim(col("a"), col("b")))
      .head()
    assert(ne.isNullAt(0), "null element must yield NULL, not a number")
  }

  test("pair generators skip NULL ids and non-finite embeddings instead of fabricating") {
    // id_pairs: a null slot must not become phantom id 0
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("id_pairs",
      exprs => graft.functions.IdPairs(exprs.head), "built-in")
    val pairs = spark.sql(
      "SELECT id_pairs(array(5L, CAST(NULL AS BIGINT), 3L)) AS (a, b)")
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((3L, 5L)), pairs.toString)
    // cosine_pairs_within: a NaN embedding skips the pair, never throws
    val nan = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(Float.NaN, 1.0f)),
      (3L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
      .groupBy(lit(1).as("g"))
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("members"))
    val out = nan.select(graft.functions.Native.cosinePairsWithin(
      col("members"), 0.5).as(Seq("a", "b", "s")))
      .as[(Long, Long, Double)].collect().toSet
    assert(out.map(t => (t._1, t._2)) == Set((1L, 3L)), out.toString)
    // a NULL embedding, and a NULL *element* inside one, poison that
    // vector only — its pairs skip (a raw read would score the null
    // element as 0.0: a wrong finite cosine), clean pairs still emit
    val nulls = Seq(
      (1L, Array[java.lang.Float](1.0f, 0.0f)),
      (2L, Array[java.lang.Float](null, 1.0f)),
      (3L, null.asInstanceOf[Array[java.lang.Float]]),
      (4L, Array[java.lang.Float](1.0f, 0.0f))).toDF("vec_id", "embedding")
      .groupBy(lit(1).as("g"))
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("members"))
    val out2 = nulls.select(graft.functions.Native.cosinePairsWithin(
      col("members"), 0.5).as(Seq("a", "b", "s")))
      .as[(Long, Long, Double)].collect().toSet
    assert(out2.map(t => (t._1, t._2)) == Set((1L, 4L)), out2.toString)
  }

  test("cosine_sim registers for SQL via GraftExtensions") {
    // the extension object is callable directly against this session's
    // registry (same injection path spark.sql.extensions uses)
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"))) {
      reg.createOrReplaceTempFunction("cosine_sim",
        exprs => graft.functions.CosineSimilarity(exprs.head, exprs(1)), "built-in")
    }
    vecs.createOrReplaceTempView("v_native")
    val n = spark.sql(
      """SELECT cosine_sim(a.embedding, b.embedding) AS c
         FROM v_native a JOIN v_native b ON a.vec_id < b.vec_id""").count()
    assert(n == 30 * 29 / 2)
  }

  test("lsh_bucket registers for SQL via the extension's own builder, matches the Column API") {
    val reg = spark.sessionState.functionRegistry
    // register through the EXACT builder GraftExtensions injects, so a
    // builder bug (argument order, literal handling) fails here
    reg.createOrReplaceTempFunction("lsh_bucket",
      graft.GraftExtensions.lshBucketBuilder, "built-in")
    vecs.createOrReplaceTempView("v_lsh")
    val viaSql = spark.sql(
      "SELECT vec_id, lsh_bucket(embedding, 1, 2 * 3, CAST(16 AS INT)) AS b FROM v_lsh")
      .as[(Long, Long)].collect().toMap // foldable non-literal args accepted
    val viaApi = vecs.select(col("vec_id"),
      graft.operators.Similarity.lshBucket(col("embedding"), 1, 6, 16).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(viaSql == viaApi)
    // non-foldable parameters are rejected at analysis time
    val err = intercept[Exception] {
      spark.sql("SELECT lsh_bucket(embedding, 1, CAST(vec_id AS INT), 16) FROM v_lsh").collect()
    }
    assert(err.getMessage.contains("foldable"), err.getMessage)
  }

  test("top_k_by_score and cosine_pairs_within register via the extension's builders") {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("top_k_by_score",
      graft.GraftExtensions.topKBuilder, "built-in")
    reg.createOrReplaceTempFunction("cosine_pairs_within",
      graft.GraftExtensions.cosinePairsBuilder, "built-in")
    // ties break by id asc; SQL int literal `2` converts to the Int k
    val tk = spark.sql(
      """SELECT g, top_k_by_score(s, i, 2) AS tk FROM VALUES
           ('a', 1.0D, 10L), ('a', 3.0D, 11L), ('a', 3.0D, 9L), ('b', 2.0D, 5L) t(g, s, i)
         GROUP BY g ORDER BY g""")
      .collect().map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => (p.getDouble(0), p.getLong(1))))
    assert(tk.toMap == Map("a" -> Seq((3.0, 9L), (3.0, 11L)), "b" -> Seq((2.0, 5L))))
    // decimal SQL literal threshold accepted; only the near pair survives
    val pairs = spark.sql(
      """SELECT cosine_pairs_within(vs, 0.5) AS (vec_a, vec_b, cos_sim) FROM (
           SELECT collect_list(struct(id, emb)) AS vs
           FROM VALUES (1L, array(1.0F, 0.0F)), (2L, array(0.9F, 0.1F)),
                       (3L, array(0.0F, 1.0F)) t(id, emb))""")
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)))
  }

  test("zorder_cell registers via the extension's builder, matches the Column API") {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("zorder_cell",
      graft.GraftExtensions.zorderBuilder, "built-in")
    val viaSql = spark.sql(
      """SELECT x, y, zorder_cell(x, y, 3) AS z FROM VALUES
           (0L, 0L), (3L, 5L), (1L, 0L), (0L, 1L), (7L, 7L) t(x, y)""")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val viaApi = viaSql.keys.toSeq.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.operators.Similarity.zorderCell(col("x"), col("y"), 3).as("z"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(viaSql == viaApi, s"$viaSql vs $viaApi")
    assert(viaSql((3L, 5L)) == 39L && viaSql((7L, 7L)) == 63L)
    // non-foldable bits rejected at analysis time
    val err = intercept[Exception] {
      spark.sql("SELECT zorder_cell(x, y, CAST(x AS INT)) FROM VALUES (1L, 2L) t(x, y)")
        .collect()
    }
    assert(err.getMessage.contains("foldable"), err.getMessage)
  }

  test("id_pairs and hamming_pairs_within register via the extension's builders") {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("id_pairs",
      exprs => graft.functions.IdPairs(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("hamming_pairs_within",
      graft.GraftExtensions.hammingPairsBuilder, "built-in")
    val ids = spark.sql(
      """SELECT id_pairs(array(3L, 1L, 2L)) AS (doc_a, doc_b)""")
      .as[(Long, Long)].collect().toSeq
    assert(ids == Seq((1L, 2L), (1L, 3L), (2L, 3L))) // sorted, a < b
    val hp = spark.sql(
      """SELECT hamming_pairs_within(
           array(struct(1L, 7L), struct(2L, 5L), struct(3L, 56L)), 1)
           AS (doc_a, doc_b, hamming)""")
      .as[(Long, Long, Int)].collect().toSeq
    // 7 xor 5 = 2 (1 bit) kept; pairs with 56 are 4-5 bits apart, dropped
    assert(hp == Seq((1L, 2L, 1)))
  }

  test("ewmaSmooth: exact binary weights, truncated horizon, total tie order") {
    import graft.operators.Temporal
    def t(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val ev = Seq(
      (1L, 10L, t(1), 1.0),   // n=100*2, d=2 -> 1.0
      (1L, 11L, t(2), 3.0),   // n=300*2+100, d=3 -> 700/3/100 -> 2.333333
      (1L, 12L, t(3), 3.0),   // horizon=2 drops x1: n=300*2+300, d=3 -> 3.0
      (2L, 20L, t(1), 5.0),   // lone observation -> itself
      (2L, 21L, t(1), 7.0))   // same ts: event_id breaks the tie
      .toDF("user_id", "event_id", "ts", "value")
    val out = Temporal.ewmaSmooth(ev, "user_id", "ts", "event_id",
        col("value"), horizon = 2)
      .as[(Long, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(out(10L) == 1.0)
    assert(out(11L) == 2.333333)
    assert(out(12L) == 3.0)
    assert(out(20L) == 5.0)
    assert(out(21L) == 6.333333) // (7·2+5)/3 cents, quantized at 1e-6
    // null key/ts/value rows are dropped, not smoothed over
    val dirty = Seq((null.asInstanceOf[java.lang.Long], 1L, t(1), 1.0))
      .toDF("user_id", "event_id", "ts", "value")
    assert(Temporal.ewmaSmooth(dirty, "user_id", "ts", "event_id",
      col("value"), 4).count() == 0)
  }

  test("theilSenTrend: outlier-robust lower median, dt=0 exclusion, cap, evidence drop") {
    import graft.operators.Temporal
    def t(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val ev = Seq(
      // user 1: clean 0.1/s drift with one wild outlier at the end —
      // 3 of 6 pairwise slopes are contaminated, the median is not
      (1L, 1L, t(0), 0.0), (1L, 2L, t(10), 1.0),
      (1L, 3L, t(20), 2.0), (1L, 4L, t(30), 300.0),
      // user 3: a same-timestamp pair (excluded) and a negative trend
      (3L, 1L, t(0), 0.0), (3L, 2L, t(0), 5.0), (3L, 3L, t(10), 1.0),
      // user 4: single event — no pair, no row
      (4L, 1L, t(0), 9.0))
      .toDF("user_id", "event_id", "ts", "value")
    val out = Temporal.theilSenTrend(ev, "user_id", "ts", "event_id",
        col("value"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // 6 slopes, sorted [1e5,1e5,1e5,1e7,14.95e6,29.8e6]: lower median
    // (idx (6+1) div 2 = 3) rejects the outlier entirely
    assert(out(1L) == ((1L, 4L, 6L, 100000L)), out.toString)
    // dt=0 pair carries no slope; remaining slopes [-400000, 100000],
    // lower median = the NEGATIVE one (idx 1)
    assert(out(3L) == ((3L, 3L, 2L, -400000L)), out.toString)
    assert(!out.contains(4L))
    // the state cap keeps the FIRST maxEvents by time: user 1 capped
    // to 2 events sees only the (0,10s) pair
    val capped = Temporal.theilSenTrend(ev.filter(col("user_id") === 1L),
        "user_id", "ts", "event_id", col("value"), maxEvents = 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(capped.toSeq == Seq((1L, 2L, 1L, 100000L)), capped.toString)
  }

  test("cusumExcursion: level shift peaks at the regime boundary, first-tie, flat=0, cap") {
    import graft.operators.Temporal
    def t(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    def ev(rows: (Long, Long, Int, Long)*) =
      rows.map { case (u, e, s, v) => (u, e, t(s), v) }
        .toDF("user_id", "event_id", "ts", "value")
    // user 1: high->low level shift [10,10,10,0,0,0]: centered walk
    // (n=6, T=30) = 30,60,90,60,30,0 -> peak 90 at pos 3 (the regime
    // boundary), min 0 -> excursion 90 div 6 = 15
    // user 2: alternating [1,-1,1,-1]: walk 4,0,4,0 -> FIRST peak pos 1
    // user 3: flat [5,5]: walk 0,0 -> no excursion, cp_pos 0 (empty
    // prefix is the peak)
    // user 4: low->high shift [0,0,10,10]: walk -20,-40,0,0 stays <= 0
    //   -> cp_pos 0, excursion 40 div 4 = 10 (downward walk measured)
    val df = ev((1L, 1L, 0, 10L), (1L, 2L, 1, 10L), (1L, 3L, 2, 10L),
      (1L, 4L, 3, 0L), (1L, 5L, 4, 0L), (1L, 6L, 5, 0L),
      (2L, 1L, 0, 1L), (2L, 2L, 1, -1L), (2L, 3L, 2, 1L), (2L, 4L, 3, -1L),
      (3L, 1L, 0, 5L), (3L, 2L, 1, 5L),
      (4L, 1L, 0, 0L), (4L, 2L, 1, 0L), (4L, 3L, 2, 10L), (4L, 4L, 3, 10L))
    val out = Temporal.cusumExcursion(df, "user_id", "ts", "event_id",
        col("value"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 6L, 3L, 15L)), out.toString)
    assert(out(2L) == ((2L, 4L, 1L, 1L)), out.toString) // range 4 div n 4
    assert(out(3L) == ((3L, 2L, 0L, 0L)), out.toString)
    assert(out(4L) == ((4L, 4L, 0L, 10L)), out.toString)
    // the cap keeps the FIRST maxEvents by time: user 1 capped to 3
    // sees the flat high regime only -> excursion 0
    val capped = Temporal.cusumExcursion(df.filter(col("user_id") === 1L),
        "user_id", "ts", "event_id", col("value"), maxEvents = 3)
      .as[(Long, Long, Long, Long)].collect()
    assert(capped.toSeq == Seq((1L, 3L, 0L, 0L)), capped.toString)
  }

  test("mannKendall: tie-aware S, sign-split tau, negative trend, single event dropped") {
    import graft.operators.Temporal
    def t(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val ev = Seq(
      (1L, 1L, t(0), 0L), (1L, 2L, t(10), 1L),   // monotone up: tau 1
      (1L, 3L, t(20), 2L), (1L, 4L, t(30), 300L),
      (3L, 1L, t(0), 0L), (3L, 2L, t(0), 5L),    // same-ts id tie-break
      (3L, 3L, t(10), 1L),                        // then a drop
      (5L, 1L, t(0), 5L), (5L, 2L, t(10), 3L),   // down: tau -1 exactly
      (6L, 1L, t(0), 2L), (6L, 2L, t(10), 2L),   // value tie: S 0
      (4L, 1L, t(0), 9L))                         // single event: no row
      .toDF("user_id", "event_id", "ts", "value")
    val out = Temporal.mannKendall(ev, "user_id", "ts", "event_id",
        col("value"))
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 4L, 6L, 6L, 1000000L)), out.toString)
    // (0,5)+1, (0,1)+1, (5,1)-1 -> S 1 of 3 pairs -> tau 333333
    assert(out(3L) == ((3L, 3L, 3L, 1L, 333333L)), out.toString)
    // the sign-split contract: -1000000 exactly, not -1000001 (a
    // floored negative division would give -(1000000) here too, but
    // S=-1 of 3 pairs would floor to -333334 vs truncate -333333)
    assert(out(5L) == ((5L, 2L, 1L, -1L, -1000000L)), out.toString)
    assert(out(6L) == ((6L, 2L, 1L, 0L, 0L)), out.toString)
    assert(!out.contains(4L))
  }

  test("sessionPaths: gap splits journeys, order by time not input, cap truncates, top-k ties") {
    import graft.operators.Temporal
    def t(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    // user 1: a>b then (after the gap) c ; user 2: a>b — input rows
    // deliberately shuffled so only (ts, id) order can build the path
    val ev = Seq(
      (1L, 2L, t(10), "b"), (1L, 1L, t(0), "a"), (1L, 3L, t(5000), "c"),
      (2L, 1L, t(0), "a"), (2L, 2L, t(10), "b"),
      (3L, 1L, t(0), "x"), (3L, 2L, t(1), "x"), (3L, 3L, t(2), "x"),
      (3L, 4L, t(3), "x"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Temporal.sessionPaths(ev, "user_id", "ts", "event_id",
        col("event_type"), gapSeconds = 600L, maxSteps = 3, topK = 10)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("a>b") == (("a>b", 2L, 4L, 0L)), out.toString) // both users
    assert(out("c") == (("c", 1L, 1L, 0L)), out.toString)     // post-gap
    // user 3's 4-event session truncates to 3 steps, n_events keeps 4
    assert(out("x>x>x") == (("x>x>x", 1L, 4L, 1L)), out.toString)
    // top-k ordering: count desc then path asc
    val ordered = Temporal.sessionPaths(ev, "user_id", "ts", "event_id",
        col("event_type"), gapSeconds = 600L, maxSteps = 3, topK = 2)
      .as[(String, Long, Long, Long)].collect().map(_._1).toSeq
    assert(ordered == Seq("a>b", "c"), ordered.toString)
  }

  test("intervalOverlapJoin: exact overlap windows, multi-cell pairs appear once, junk dropped") {
    import graft.operators.Temporal
    def dt(d: Int) = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d))
    val left = Seq(("A", dt(1), dt(10)), ("B", dt(100), dt(110)))
      .toDF("lk", "ls", "le")
    val right = Seq(
      ("R1", dt(5), dt(7)),     // inside A
      ("R2", dt(10), dt(12)),   // touches A's last day only
      ("R3", dt(11), dt(20)),   // adjacent to A, NO overlap
      ("R4", dt(95), dt(200)),  // covers B entirely
      ("R5", dt(1), dt(10)),    // identical to A: shares EVERY cell
      ("R6", dt(30), dt(20)),   // inverted: dropped
      ("R7", null.asInstanceOf[java.sql.Date], dt(5)))
      .toDF("rk", "rs", "re")
    // cellDays=4 makes A and R5 share three cells — the canonical-cell
    // rule must still emit the pair exactly once
    val out = Temporal.intervalOverlapJoin(left, "lk", col("ls"),
        col("le"), right, "rk", col("rs"), col("re"), cellDays = 4)
      .select(col("lk"), col("rk"),
        datediff(col("overlap_start"), lit("1970-01-01")),
        datediff(col("overlap_end"), lit("1970-01-01")),
        col("overlap_days"))
      .as[(String, String, Int, Int, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      ("A", "R1", 5, 7, 3L),
      ("A", "R2", 10, 10, 1L),
      ("A", "R5", 1, 10, 10L),
      ("B", "R4", 100, 110, 11L)), out.mkString(","))
  }

  test("olsTrend: exact line slope, outlier drags OLS but not Theil-Sen, zero-variance excluded") {
    import graft.operators.Temporal
    def t(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val ev = Seq(
      (1L, 1L, t(0), 0L), (1L, 2L, t(60), 3L), (1L, 3L, t(120), 6L),
      (2L, 1L, t(0), 10L), (2L, 2L, t(60), 4L),   // negative drift
      (3L, 1L, t(0), 1L), (3L, 2L, t(10), 9L),    // same minute: no x var
      // user 4: clean +1/min line with one wild final outlier
      (4L, 1L, t(0), 0L), (4L, 2L, t(60), 1L), (4L, 3L, t(120), 2L),
      (4L, 4L, t(180), 300L))
      .toDF("user_id", "event_id", "ts", "value")
    val out = Temporal.olsTrend(ev, "user_id", "ts", "event_id",
        col("value"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 3000000L)), out.toString) // y = 3x exact
    assert(out(2L) == ((2L, 2L, -6000000L)), out.toString)
    assert(!out.contains(3L), out.toString)
    // the robust/classical gap: OLS slope is dragged far above the
    // clean +1/min by the outlier; Theil-Sen's median slope is not
    val ols = out(4L)._3
    val ts4 = Temporal.theilSenTrend(ev.filter(col("user_id") === 4L),
        "user_id", "ts", "event_id", col("value"))
      .select("slope_micro").as[Long].head()
    assert(ols > 40000000L, s"ols=$ols")        // ~ +89/min, dragged
    assert(ts4 < 2000000L, s"theilsen=$ts4")    // per-second scale: tiny
  }

  test("psiDrift: identical periods score 0, JVM-twin drift value, no-reference group excluded") {
    import graft.operators.Temporal
    def psiJvm(ref: Seq[Long], cur: Seq[Long], nBins: Int = 10): Double = {
      val mn = ref.min; val mx = ref.max
      def bin(v: Long) = if (v <= mn) 0 else if (v >= mx) nBins - 1
        else ((v - mn) * nBins / (mx - mn + 1)).toInt
      val cr = Array.fill(nBins)(0L); ref.foreach(v => cr(bin(v)) += 1)
      val cc = Array.fill(nBins)(0L); cur.foreach(v => cc(bin(v)) += 1)
      val acc = (0 until nBins).map { b =>
        val p = (cr(b) + 1) * 1000000L / (ref.size + nBins)
        val q = (cc(b) + 1) * 1000000L / (cur.size + nBins)
        (p - q).toDouble / 1e6 * (math.log(p.toDouble) - math.log(q.toDouble))
      }.sum
      BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val refA = Seq(10L, 20L, 30L, 40L); val curA = Seq(10L, 20L, 30L, 40L)
    val refB = refA
    val curB = Seq.fill(20)(100L) // all mass beyond the ref max
    val rows =
      refA.map(v => ("a", true, v)) ++ curA.map(v => ("a", false, v)) ++
      refB.map(v => ("b", true, v)) ++ curB.map(v => ("b", false, v)) ++
      Seq(("c", false, 5L)) // current-only group: cannot bin, excluded
    val out = Temporal.psiDrift(rows.toDF("g", "isref", "v"), "g",
        col("isref"), col("v"))
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 4L, 4L, 0.0)), out.toString)
    assert(out("b") == (("b", 4L, 20L, psiJvm(refB, curB))), out.toString)
    assert(out("b")._4 > 0.25, "injected drift must clear the action threshold")
    assert(!out.contains("c"), out.toString)
  }

  test("seasonalDecompose: JVM-twin exact trend/seasonal/residual, edge NULLs, sign-split negatives") {
    import spark.implicits._
    // 21 days: drift + a planted weekly pattern + NEGATIVE days (the
    // sign-split branch) — one synthetic daily observation per day
    val n = 21
    val v = (0 until n).map(i => -2000L + 150L * i +
      (if (i % 7 == 0) 900L else 0L) - (if (i % 7 == 3) 1100L else 0L))
    val rows = (0 until n).map(i =>
      (f"2024-03-${i + 1}%02d 12:00:00", v(i)))
    val out = Temporal.seasonalDecompose(
        rows.toDF("tss", "value"), to_timestamp(col("tss")), col("value"), 7)
      .select(col("day"), col("phase"), col("v"), col("trend"),
        col("seasonal"), col("residual"))
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    // JVM mirror with the identical sign-split division
    def sdiv(a: Long, d: Long) = if (a >= 0) a / d else -((-a) / d)
    val trend = (0 until n).map(i =>
      if (i >= 3 && i <= n - 4) Some(sdiv((i - 3 to i + 3).map(v).sum, 7))
      else None)
    val detr = (0 until n).map(i => trend(i).map(t => v(i) - t))
    // lower median: element at 1-based (n+1) div 2 of the sorted run
    val seas = (0 until 7).map { p =>
      val ds = (p until n by 7).flatMap(detr)
      p -> (if (ds.isEmpty) None
            else Some(ds.sorted.apply((ds.length + 1) / 2 - 1)))
    }.toMap
    (0 until n).foreach { i =>
      val (_, phase, vv, t, s, r) = out(i)
      assert(phase == i % 7 && vv == v(i), s"day $i")
      assert(t == trend(i), s"trend day $i: $t vs ${trend(i)}")
      assert(s == seas(i % 7), s"seasonal day $i")
      val expR = for (tt <- trend(i); ss <- seas(i % 7))
        yield v(i) - tt - ss
      assert(r == expR, s"residual day $i")
    }
    // the planted pattern surfaced: phase-0 seasonal clearly above
    // phase-3's, and the sign-split branch genuinely fired
    assert(seas(0).get - seas(3).get > 1500L, seas.toString)
    assert(v.exists(_ < 0) && detr.flatten.exists(_ < 0))
  }

  test("seasonalAnomalies: planted spike flags, rhythm days stay quiet outside its window") {
    import spark.implicits._
    // q219's drift+weekly series, with day 12 spiked +9000 — the
    // rhythm is explained away by the decomposition, so only the
    // spike (and at most its trend-window neighbours 9..15) can flag.
    // 28 days so every phase keeps >= 3 complete-window members: with
    // only 2 the lower median degenerates to the min and biases every
    // residual in the phase (the legitimate small-n limit of any
    // median — the operator targets |days| >= 4·period corpora)
    val n = 28
    val base = (0 until n).map(i => 1000L + 150L * i +
      (if (i % 7 == 0) 900L else 0L) - (if (i % 7 == 3) 1100L else 0L))
    val v = base.updated(12, base(12) + 9000L)
    val rows = (0 until n).map(i =>
      (f"2024-03-${i + 1}%02d 12:00:00", v(i)))
    val out = Temporal.seasonalAnomalies(
        rows.toDF("tss", "value"), to_timestamp(col("tss")),
        col("value"), 7, 3.0)
      .select(col("day"), col("residual"), col("med"), col("mad"),
        col("is_anomaly"))
      .as[(String, Long, Double, Double, Long)].collect().sortBy(_._1)
    assert(out.length == 22) // complete-window days 3..24 only
    val flagged = out.filter(_._5 == 1L).map(_._1).toSet
    assert(flagged.contains("2024-03-13"), // day index 12
      s"planted spike did not flag: $out")
    // days whose trend window the spike never touches must be quiet
    val contaminated = (9 to 15).map(i => f"2024-03-${i + 1}%02d").toSet
    assert(flagged.subsetOf(contaminated), flagged.toString)
    // the spike's PHASE-MATES (same weekday, outside its trend window)
    // must stay quiet: the round-12 lower-median seasonal removes the
    // phase-leak the per-phase mean admitted (round-11 VERDICT #1)
    val phaseMates = Set("2024-03-06", "2024-03-20", "2024-03-27")
    assert(phaseMates.intersect(flagged).isEmpty,
      s"robust seasonal leaked into phase-mates: $flagged")
    // the flag is a pure fence: every flagged |r−med| strictly above
    // every unflagged one
    val d = out.map(r => (math.abs(r._2 - r._3), r._5))
    val minFlag = d.filter(_._2 == 1L).map(_._1).min
    val maxQuiet = d.filter(_._2 == 0L).map(_._1).max
    assert(minFlag > maxQuiet, s"fence inversion: $minFlag <= $maxQuiet")
  }
}
