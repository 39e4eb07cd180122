package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet corpus (TESTDATA.md).
  *
  * Scans are plain `spark.read.parquet` so Catalyst's column pruning and
  * predicate pushdown reach the parquet reader (check `PushedFilters` /
  * `ReadSchema` in `.explain("formatted")`). At 100 TB the same call works
  * against a partitioned table root; nothing here assumes single-file input.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoized base relations. `spark.read.parquet` re-reads the file
    * footer and rebuilds the relation on EVERY call — measured 60–90 ms
    * per query at the suite's scale, over half the sub-second floor
    * (round-12 probe: q05 build 79 ms of a 131 ms execution). The
    * resolved LogicalRelation is immutable, so one per
    * (session, path) is correct to share across queries. The map is
    * keyed by session, but the cached DataFrames strongly reference
    * their session (`Dataset.sparkSession`), so weak keys alone can
    * never collect an entry (ADVICE r12) — eviction is EXPLICIT: the
    * first `load` on a context registers a listener that drops every
    * entry for that context's sessions on application end.
    * At 100 TB the same memo simply holds one relation per table root. */
  private val relCache =
    new java.util.HashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, DataFrame]]()
  private val evictionHooked =
    java.util.Collections.synchronizedSet(
      new java.util.HashSet[org.apache.spark.SparkContext]())

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val perSession = relCache.synchronized {
      var m = relCache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
        relCache.put(spark, m)
      }
      m
    }
    val sc = spark.sparkContext
    if (evictionHooked.add(sc)) {
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          relCache.synchronized {
            val it = relCache.keySet().iterator()
            while (it.hasNext) if (it.next().sparkContext eq sc) it.remove()
            evictionHooked.remove(sc)
          }
      })
    }
    perSession.getOrElseUpdate(s"$sfDir/$table.parquet",
      spark.read.parquet(s"$sfDir/$table.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` has shipped in two parquet shapes across corpus
    * re-materializations, and both normalize to session-UTC TIMESTAMP here
    * so every downstream consumer (epoch arithmetic, `date_format`
    * oracle crossings, streaming `withWatermark`) sees ONE type:
    *
    *   - TIMESTAMP(NANOS): Spark 4 refuses natively; sessions set
    *     `spark.sql.legacy.parquet.nanosAsLong` and this loader floors
    *     nanos to microsecond timestamps — the same truncation DuckDB
    *     applies reading the file.
    *   - timestamp[us] with no zone: Spark reads TIMESTAMP_NTZ, which
    *     `withWatermark` rejects (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).
    *     Sessions run with `spark.sql.session.timeZone=UTC`, so the
    *     NTZ→TIMESTAMP cast reinterprets the same wall-clock instant in
    *     UTC — bit-identical micros, identical formatted strings.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTime(load(s, d, "events"))

  /** Normalize either historical `ts` shape (nanos-as-long, NTZ micros)
    * to TIMESTAMP. Shared by the batch loader and the streaming source so
    * the two paths cannot drift. */
  def normalizeEventTime(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
