package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only 10×-corpus generator for the scale rehearsal: replicates
  * the driver corpus with disjoint key ranges per replica (ids shift by
  * replica · 10⁹) and per-replica letter-ROTATED document text
  * (`translate` over the lowercase alphabet), so replicas share corpus
  * statistics — token counts, doc lengths, zipf shape — without being
  * near-duplicates of each other (a naive text copy would mint
  * C(replicas, 2)-sized twin families and inflate every dedup tier's
  * pair count ~45×, grading the corpus, not the engine). Dimension
  * tables (region, nation) copy verbatim.
  * Usage: sbt "runMain graft.ScaleUp /root/testdata/sf0.1 target/sf1 10"
  * Not part of any gate; the driver never runs it. */
object ScaleUp {
  // id stride per replica: comfortably above every base-table id at
  // sf0.1 (max ≈ 1.5M orderkeys — 66× headroom) while keeping ALL
  // replica ids under 2^31, so 31-bit fast paths that legitimately
  // hold on the driver corpus (packed pair keys, Graph.adamicAdar
  // packIds) stay exercisable at the 10× rehearsal instead of being
  // knocked out by an artificially astronomical id space (round 13:
  // the old 1e9 stride pushed ids to ~9.2e9)
  private val S = 100000000L // id stride per replica

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def shifted(table: String, idCols: Seq[String],
        textCol: Option[String] = None): DataFrame = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      (0 until reps).map { r =>
        val ids = idCols.foldLeft(base)((df, c) =>
          df.withColumn(c, col(c) + lit(r * S)))
        textCol match {
          case Some(t) if r > 0 =>
            val abc = "abcdefghijklmnopqrstuvwxyz"
            val rot = abc.drop(r % 26) + abc.take(r % 26)
            ids.withColumn(t, translate(col(t), abc, rot))
          case _ => ids
        }
      }.reduce(_ unionByName _)
    }

    def write(df: DataFrame, table: String): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$dst/$table.parquet")
      println(s"[scaleup] $table done")
    }

    write(spark.read.parquet(s"$src/region.parquet"), "region")
    write(spark.read.parquet(s"$src/nation.parquet"), "nation")
    write(shifted("customer", Seq("c_custkey")), "customer")
    write(shifted("supplier", Seq("s_suppkey")), "supplier")
    write(shifted("part", Seq("p_partkey")), "part")
    write(shifted("orders", Seq("o_orderkey", "o_custkey")), "orders")
    write(shifted("lineitem",
      Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    write(shifted("events", Seq("event_id", "user_id")), "events")
    write(shifted("documents", Seq("doc_id"), Some("text")), "documents")
    write(shifted("embeddings", Seq("vec_id")), "embeddings")
    spark.stop()
  }
}
