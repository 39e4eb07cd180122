package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("project keeps order and subset (O9)") {
    val df = Seq((1, "a", true)).toDF("x", "y", "z")
    assert(Relational.project(Seq("z", "x"))(df).columns.toSeq == Seq("z", "x"))
  }

  test("dropNullsAny drops null rows but keeps empty strings (O10, §7.4.2)") {
    val df = Seq(("a", "b"), (null, "c"), ("", "d")).toDF("u", "v")
    val out = Relational.dropNullsAny(df).collect().map(_.getString(0)).toSet
    assert(out == Set("a", ""))
  }

  test("dropNulls on subset ignores nulls elsewhere (O11)") {
    val df = Seq(("a", null: String, "x"), (null, "b", "y"))
      .toDF("email", "nps", "other")
    val out = Relational.dropNulls(Seq("email"))(df).collect()
    assert(out.map(_.getString(2)).toSeq == Seq("x"))
  }

  test("dropNulls pushable=false keeps identical rows and survives optimization") {
    // a real file scan, not a LocalRelation — the optimizer eagerly
    // evaluates filters over local data, which would erase the barrier
    // this test exists to pin
    val dir = java.nio.file.Files.createTempDirectory("graft_pushable").toString
    Seq(("a", null: String, "x"), (null, "b", "y"), ("c", "d", "z"))
      .toDF("email", "nps", "other").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val pushed = Relational.dropNulls(Seq("email", "nps"))(df).collect().toSet
    val pinned = Relational.dropNulls(Seq("email", "nps"), pushable = false)(df)
    assert(pinned.collect().toSet == pushed)
    // the barrier must survive the optimizer (Spark folds rand()-based
    // always-false terms; the partition-id form must not fold away)
    val cond = pinned.queryExecution.optimizedPlan.toString
    assert(cond.contains("SPARK_PARTITION_ID"), cond.take(600))
    // and the scan must NOT receive the null filters as pushed filters
    val scan = pinned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(!scan.contains("IsNotNull"), scan)
  }

  test("renameAll renames en masse (O12)") {
    val df = Seq((1, 2)).toDF("a", "b")
    val out = Relational.renameAll(Map("a" -> "x", "b" -> "y"))(df)
    assert(out.columns.toSeq == Seq("x", "y"))
  }

  test("auditStamp applies one literal to all rows (O13)") {
    val df = Seq(1, 2).toDF("i")
    val out = Relational.auditStamp("updated_ts", lit("2026-01-01 00:00:00"))(df)
    assert(out.select("updated_ts").distinct().count() == 1)
  }

  test("regexStripCast handles fixed prefix and alternation (O14/O15)") {
    val df = Seq("A4", "N10", "A10").toDF("v")
    val fixed = Relational.regexStripCast("v", "A")(df.filter(col("v") =!= "N10"))
    assert(fixed.as[Double].collect().toSet == Set(4.0, 10.0))
    val alt = Relational.regexStripCast("v", "A|N")(df)
    assert(alt.as[Double].collect().toSet == Set(4.0, 10.0))
  }

  test("membership filters before cast (O16)") {
    val df = Seq("A1", "free text", "A5").toDF("grade")
    val out = Relational.membership("grade", Seq("A1", "A2", "A3", "A4", "A5"))(df)
    assert(out.count() == 2)
  }

  test("keepLast keeps max order key per group, ties to ingest pos (O18+O19)") {
    val df = Seq(
      ("o1", "2018-01-01", 0L), ("o1", "2018-01-03", 1L),
      ("o2", "2018-01-02", 2L), ("o2", "2018-01-02", 3L) // tie on date
    ).toDF("order_number", "date_sent", "_ingest_pos")
    val out = Relational.keepLast(Seq("order_number"),
      Seq(col("date_sent").desc, col("_ingest_pos").desc))(df)
      .select("order_number", "_ingest_pos").as[(String, Long)]
      .collect().toMap
    assert(out == Map("o1" -> 1L, "o2" -> 3L)) // pandas keep-last parity
  }

  test("topK returns exactly k under total order (O18+O5)") {
    val df = (1 to 100).toDF("n")
    val out = Relational.topK(3, Seq(col("n").desc))(df).as[Int].collect()
    assert(out.toSeq == Seq(100, 99, 98))
  }

  test("mergeUpsert: update wins by version, insert lands, untouched rows carry") {
    val target = Seq(
      (1L, "old-1", 10.0),
      (2L, "old-2", 20.0),
      (3L, "old-3", 30.0)
    ).toDF("k", "s", "v")
    val source = Seq(
      (2L, "new-2a", 21.0, 1L),  // two versions for key 2 -> v2 wins
      (2L, "new-2b", 22.0, 2L),
      (4L, "ins-4", 40.0, 1L)    // unmatched -> insert
    ).toDF("k", "s", "v", "ver")
    val out = Relational.mergeUpsert(target, source, Seq("k"), col("ver"))
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set(
      (1L, "old-1", 10.0),
      (2L, "new-2b", 22.0),
      (3L, "old-3", 30.0),
      (4L, "ins-4", 40.0)))
  }

  test("mergeUpsert plans one exchange and no join") {
    val target = Seq((1L, "a")).toDF("k", "s")
    val source = Seq((1L, "b", 1L)).toDF("k", "s", "ver")
    val plan = Relational.mergeUpsert(target, source, Seq("k"), col("ver"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "merge must be union+aggregate, not a join")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1)
  }
}
