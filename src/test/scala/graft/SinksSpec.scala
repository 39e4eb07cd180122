package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sinks.Sinks

/** A local-disk FileSystem that answers for the `graftfs:` scheme —
  * registered purely through Hadoop config (`fs.graftfs.impl`), the
  * identical seam an `s3a://` deployment uses (`fs.s3a.impl`). Must be
  * top-level: Hadoop instantiates it reflectively by class name. */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}

object ThrottleProbe {
  val seen = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, String]]()
  def snapshot(): Seq[Map[String, String]] = {
    val b = Seq.newBuilder[Map[String, String]]
    seen.forEach(a => b += a)
    b.result()
  }
}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("csvDatedKey writes header CSV under the dated object key (O21/O22)") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val df = Seq(("1", "a@x.com", ""), ("2", null, "A5"))
      .toDF("id_answer", "email", "grade")
    val path = Sinks.csvDatedKey(df.coalesce(1), dir, "orders_survey", "20260101")
    assert(path.endsWith("/limesurvey/orders_survey_20260101.csv"))
    val lines = Files.list(java.nio.file.Paths.get(path)).toArray
      .map(_.toString).filter(_.endsWith(".csv"))
      .flatMap(p => scala.io.Source.fromFile(p).getLines())
    assert(lines.head == "id_answer,email,grade")
    // nulls and empty strings both serialize as empty (pandas parity)
    assert(lines.toSet.contains("1,a@x.com,"))
    assert(lines.toSet.contains("2,,A5"))
  }

  test("sink URI plumbing is scheme-aware, not file:/-hardcoded " +
      "(the s3a config seam)") {
    // mount a NON-file scheme onto the local filesystem — the same
    // config-only seam an s3a:// deployment uses (fs.s3a.impl=
    // S3AFileSystem): if any sink resolved paths through java.io.File
    // or a hardcoded file:/ FileSystem instead of
    // Path.getFileSystem(conf), this scheme would not resolve
    spark.sparkContext.hadoopConfiguration.set("fs.graftfs.impl",
      classOf[GraftTestFs].getName)
    val local = Files.createTempDirectory("graft_scheme").toString
    val base = s"graftfs:$local"
    val df = Seq(("1", "a@x.com"), ("2", "b@y.org")).toDF("id", "email")
    // csvDatedKey through the foreign scheme
    val path = Sinks.csvDatedKey(df.coalesce(1), base, "t", "20260101")
    assert(path.startsWith("graftfs:"), path)
    val back = spark.read.option("header", true).csv(path)
      .as[(String, String)].collect().toSet
    assert(back == Set(("1", "a@x.com"), ("2", "b@y.org")), back)
    // replaceWhere (staging-swap rename path) through the foreign scheme
    val batch = Seq(("1", "2018-02-01"), ("2", "2018-03-01"))
      .toDF("id", "date_sent")
    Sinks.replaceWhere(batch, base, "t2", "date_sent", "2018-01-01")
    Sinks.replaceWhere(batch, base, "t2", "date_sent", "2018-01-01")
    val rows = spark.read.parquet(s"$base/t2")
      .as[(String, String)].collect().toSet
    assert(rows == Set(("1", "2018-02-01"), ("2", "2018-03-01")), rows)
    // and the bytes really landed under the local mount — the scheme
    // was honored end-to-end, not silently rewritten
    assert(Files.exists(java.nio.file.Paths.get(local, "t2")))
    assert(Files.exists(java.nio.file.Paths.get(local,
      "limesurvey", "t_20260101.csv")))
  }

  test("jdbcReplaceWhere: ranged reload against a REAL SQL engine " +
      "(embedded Derby) is idempotent, DDL-on-write, NULL-date-keeping") {
    val dbDir = Files.createTempDirectory("graft_derby").resolve("wh")
    val url = s"jdbc:derby:$dbDir;create=true"
    val batch = Seq(("1", "2018-02-01"), ("2", "2018-03-01"))
      .toDF("id", "date_sent")
    // first load CREATEs the table (reference DDL: varchar(256) strings)
    Sinks.jdbcReplaceWhere(batch, url, "survey_t", "date_sent",
      "2018-01-01")
    def readBack() = spark.read.jdbc(url, "survey_t",
        new java.util.Properties)
      .as[(String, String)].collect().toSet
    assert(readBack() == Set(("1", "2018-02-01"), ("2", "2018-03-01")))
    // a pre-cutoff row and a NULL-dated row must both survive reloads
    val keeper = Seq(("0", "2017-06-01"), ("9", null))
      .toDF("id", "date_sent").as[(String, String)]
    Sinks.jdbcReplaceWhere(keeper.toDF(), url, "survey_t", "date_sent",
      "2019-01-01") // range matches nothing existing; appends keepers
    // re-running the ORIGINAL ranged load must not duplicate its rows
    Sinks.jdbcReplaceWhere(batch, url, "survey_t", "date_sent",
      "2018-01-01")
    Sinks.jdbcReplaceWhere(batch, url, "survey_t", "date_sent",
      "2018-01-01")
    val rows = spark.read.jdbc(url, "survey_t", new java.util.Properties)
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(rows == Set(
      ("0", Some("2017-06-01")), ("9", None),
      ("1", Some("2018-02-01")), ("2", Some("2018-03-01"))), rows)
  }

  test("replaceWhere reload is idempotent (O23/O24/O25)") {
    val dir = Files.createTempDirectory("graft_wh").toString
    val old = Seq(("2017-06-01", "keep"), ("2018-03-01", "stale"))
      .toDF("date_sent", "v")
    old.write.parquet(s"$dir/t")
    val batch = Seq(("2018-03-01", "fresh"), ("2018-04-01", "fresh2"))
      .toDF("date_sent", "v")
    Sinks.replaceWhere(batch, dir, "t", "date_sent", "2018-01-01")
    val after1 = spark.read.parquet(s"$dir/t")
      .as[(String, String)].collect().toSet
    assert(after1 == Set(("2017-06-01", "keep"), ("2018-03-01", "fresh"),
      ("2018-04-01", "fresh2"))) // stale post-cutoff row replaced
    // re-run the same load: contents unchanged, no duplicates
    Sinks.replaceWhere(batch, dir, "t", "date_sent", "2018-01-01")
    val after2 = spark.read.parquet(s"$dir/t")
      .as[(String, String)].collect().toSet
    assert(after2 == after1)
  }

  test("replaceWhere keeps NULL-dated rows across reloads (DELETE-WHERE parity)") {
    val dir = Files.createTempDirectory("graft_wh_null").toString
    val old = Seq((null.asInstanceOf[String], "undated"), ("2017-06-01", "keep"))
      .toDF("date_sent", "v")
    old.write.parquet(s"$dir/t")
    val batch = Seq(("2018-03-01", "fresh")).toDF("date_sent", "v")
    Sinks.replaceWhere(batch, dir, "t", "date_sent", "2018-01-01")
    val after = spark.read.parquet(s"$dir/t")
      .as[(Option[String], String)].collect().toSet
    // the modeled DELETE WHERE date >= cutoff never deletes a NULL date
    assert(after == Set((None, "undated"), (Some("2017-06-01"), "keep"),
      (Some("2018-03-01"), "fresh")))
  }

  test("replaceWhere creates the table when absent (O24 DDL-on-write)") {
    val dir = Files.createTempDirectory("graft_wh2").toString
    val batch = Seq(("2018-02-01", "x")).toDF("date_sent", "v")
    Sinks.replaceWhere(batch, dir, "fresh_table", "date_sent", "2018-01-01")
    assert(spark.read.parquet(s"$dir/fresh_table").count() == 1)
  }

  test("replaceWhereVersioned pins a concurrent reader to its resolved " +
      "snapshot across a reload (snapshot isolation)") {
    val dir = Files.createTempDirectory("graft_wh_v").toString
    val v1 = Sinks.replaceWhereVersioned(
      Seq(("2017-06-01", "keep"), ("2018-03-01", "stale"))
        .toDF("date_sent", "v"),
      dir, "t", "date_sent", "2017-01-01")
    assert(v1 == 1L)
    // reader resolves NOW — pinned to v1's immutable directory
    val pinned = Sinks.readVersioned(spark, dir, "t")
    val batch = Seq(("2018-03-01", "fresh"), ("2018-04-01", "fresh2"))
      .toDF("date_sent", "v")
    val v2 = Sinks.replaceWhereVersioned(batch, dir, "t", "date_sent",
      "2018-01-01")
    assert(v2 == 2L)
    // mid-reload reader: still sees EXACTLY the v1 contents it resolved,
    // untouched by the reload that committed after it
    assert(pinned.as[(String, String)].collect().toSet ==
      Set(("2017-06-01", "keep"), ("2018-03-01", "stale")))
    // a fresh resolution sees the reloaded table (replaceWhere semantics)
    assert(Sinks.readVersioned(spark, dir, "t")
      .as[(String, String)].collect().toSet ==
      Set(("2017-06-01", "keep"), ("2018-03-01", "fresh"),
        ("2018-04-01", "fresh2")))
    // idempotency: same ranged batch again -> identical contents, new version
    assert(Sinks.replaceWhereVersioned(batch, dir, "t", "date_sent",
      "2018-01-01") == 3L)
    assert(Sinks.readVersioned(spark, dir, "t")
      .as[(String, String)].collect().toSet ==
      Set(("2017-06-01", "keep"), ("2018-03-01", "fresh"),
        ("2018-04-01", "fresh2")))
  }

  test("replaceWhereVersioned skips crashed-writer leftovers; vacuum " +
      "retires history and junk") {
    val dir = Files.createTempDirectory("graft_wh_vc").toString
    Sinks.replaceWhereVersioned(Seq(("2018-02-01", "a")).toDF("date_sent", "v"),
      dir, "t", "date_sent", "2018-01-01")
    // simulate a writer that crashed mid-write: a version directory with
    // data files but NO _SUCCESS marker must be invisible to readers and
    // must not be re-targeted by the next writer
    val junk = new java.io.File(s"$dir/t/_v/v00000002")
    assert(junk.mkdirs())
    java.nio.file.Files.writeString(junk.toPath.resolve("part-junk.parquet"),
      "not parquet")
    assert(Sinks.readVersioned(spark, dir, "t")
      .as[(String, String)].collect().toSet == Set(("2018-02-01", "a")))
    // next reload allocates PAST the stranded v2
    val v3 = Sinks.replaceWhereVersioned(
      Seq(("2018-03-01", "b")).toDF("date_sent", "v"),
      dir, "t", "date_sent", "2018-03-01")
    assert(v3 == 3L)
    assert(Sinks.readVersioned(spark, dir, "t")
      .as[(String, String)].collect().toSet ==
      Set(("2018-02-01", "a"), ("2018-03-01", "b")))
    // vacuum(keep=1): v1 (old committed) and v2 (junk below latest) go,
    // v3 stays readable
    Sinks.vacuumVersions(spark, dir, "t", keep = 1)
    val left = new java.io.File(s"$dir/t/_v").list().sorted.toSeq
    assert(left == Seq("v00000003"), left)
    assert(Sinks.readVersioned(spark, dir, "t").count() == 2)
  }

  test("overwritePartitions rewrites only the partitions in the batch (O23 at scale)") {
    val dir = Files.createTempDirectory("graft_dyn").toString
    val day1 = Seq(("2018-01-01", "a"), ("2018-01-02", "b")).toDF("d", "v")
    Sinks.overwritePartitions(day1, dir, "t", "d")
    // reload ONLY day 2 with new content; day 1 must be untouched
    val day2new = Seq(("2018-01-02", "b2")).toDF("d", "v")
    Sinks.overwritePartitions(day2new, dir, "t", "d")
    val after = spark.read.parquet(s"$dir/t")
      .select("d", "v").as[(String, String)].collect().toSet
    assert(after == Set(("2018-01-01", "a"), ("2018-01-02", "b2")))
    // idempotent: same batch again -> same contents
    Sinks.overwritePartitions(day2new, dir, "t", "d")
    assert(spark.read.parquet(s"$dir/t").count() == 2)
  }

  test("throttledRows paces inserts and blanks id (O26)") {
    val df = Seq(("7", "a"), ("8", "b"), ("9", "c")).toDF("id", "v")
    ThrottleProbe.seen.clear()
    val t0 = System.nanoTime()
    // the callback closure is serialized to executors; ThrottleProbe is
    // resolved statically in the (shared, local-mode) executor JVM
    Sinks.throttledRows(df.coalesce(1), maxRowsPerSecond = 20)(
      m => ThrottleProbe.seen.add(m))
    val elapsed = (System.nanoTime() - t0) / 1e9
    val seen = ThrottleProbe.snapshot()
    assert(seen.size == 3)
    assert(seen.forall(_("id") == "")) // reference blanks id
    assert(seen.map(_("v")).toSet == Set("a", "b", "c"))
    assert(elapsed >= 0.1) // 3 rows at 20 rows/s ≥ ~100ms of pacing
  }
}
