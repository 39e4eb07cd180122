package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.Row

/** Structured Streaming over the `events` table shape (TESTDATA.md):
  * the streaming story of SURVEY.md §7.2 T3. The reference is batch-only
  * (SURVEY.md §1.1 — no streams), so this is a generalization: the same
  * tumbling-window aggregation as batch query q23_time_bucket, run
  * incrementally with a watermark, plus a stateful sessionization example
  * for custom per-key state.
  *
  * Scale shape: a windowed streaming agg is a hash shuffle on
  * (window, event_type) with partial aggregation and RocksDB-or-memory
  * state per partition — the same plan at 32 or 1000 executors.
  */
object EventsStream {

  /** File-source stream of events rows (schema fixed from a sample batch
    * read — streaming sources require explicit schemas). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Tumbling-window counts with a watermark: the streaming twin of the
    * q23_time_bucket batch plan (same groupBy, incremental execution,
    * late data beyond `lateness` dropped deterministically). */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
      lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Per-user session state for the custom-state path
    * (`mapGroupsWithState`): running event count + last value per user.
    * Pass `idleTimeout` to evict idle state on a processing-time timer —
    * note that pending timers keep a Trigger.AvailableNow query alive, so
    * timer-based eviction belongs to continuously-running deployments,
    * not run-to-completion batches. */
  case class UserSession(userId: Long, nEvents: Long, totalValue: Double)

  def sessionize(spark: SparkSession, events: DataFrame,
      idleTimeout: Option[String] = None): DataFrame = {
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.select(col("user_id").as[Long], col("value").as[Double])
      .groupByKey(_._1)
      .mapGroupsWithState(timeoutConf) {
        (userId: Long, rows: Iterator[(Long, Double)],
         state: GroupState[UserSession]) =>
          val prev = state.getOption.getOrElse(UserSession(userId, 0L, 0.0))
          var n = prev.nEvents; var tot = prev.totalValue
          rows.foreach { case (_, v) => n += 1; tot += v }
          val next = UserSession(userId, n, tot)
          state.update(next)
          idleTimeout.foreach(state.setTimeoutDuration)
          next
      }
      .toDF()
  }

  /** Convenience writer: append mode to an in-memory or file sink. */
  def toMemorySink(df: DataFrame, queryName: String): DataStreamWriter[Row] =
    df.writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName(queryName)
}
