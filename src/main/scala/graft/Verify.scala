package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_AQE=1: the 100 TB-config validation profile — AQE on
    // AND the library's extensions loaded, proving every query (incl.
    // the RangeJoinRewrite rule behind q56) survives adaptive
    // replanning. The default profile leaves both at the driver's
    // contract settings.
    val spark = (if (sys.env.get("SPARK_GRAFT_AQE").contains("1"))
      builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.extensions", "graft.GraftExtensions")
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev-only subset (mirrors Bench): SPARK_GRAFT_ONLY=q105_source_jsd
    // dumps + declares just those queries so tools/compare.py gates a
    // single query without paying for the whole suite. The driver never
    // sets it, so the official gate always covers everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // repartition(1), NOT coalesce(1): the dump stays one part file
      // (the layout the driver has always read), but coalesce is a
      // NARROW collapse — it pulled every post-shuffle stage of the
      // query onto the single writer task, which turned heavy-output
      // queries into one-core marathons at the 10x rehearsal scale
      // (q186 at sf1: ~10 min on one task, found round 13). The
      // repartition exchange keeps the query itself machine-wide and
      // serializes only the write.
      try fn(spark, sfDir).repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Free this query's localCheckpoint blocks before the next query:
      // 224 queries of accumulated pinned blocks (iterative operators
      // checkpoint per round) OOM'd an 8g driver and needed 48g at the
      // sf1 rehearsal (round 13 defect 6). Nothing outlives its query —
      // Tables memoizes unpersisted logical relations only — so a
      // blanket unpersist after the dump lands is safe. Blocking, so a
      // slow async release can't pile up against a heavy next query.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    // One shared escaper (the RPC client's) — two hand-rolled copies
    // would drift on the next escaping fix.
    def q(s: String): String = graft.sources.LimeSurveyClient.jstr(s)
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
