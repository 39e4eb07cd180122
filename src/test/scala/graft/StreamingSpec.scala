package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

class StreamingSpec extends SparkSpec {

  test("tumbling-window stream over events matches the batch plan (q23 twin)") {
    // the streaming file source needs a directory, not a single file
    val dir = java.nio.file.Files.createTempDirectory("graft_events").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = EventsStream.readEvents(spark, dir)
    assert(stream.isStreaming)
    val agg = EventsStream.tumblingCounts(stream, "1 hour", "2 hours")
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("ev_counts").option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // Append mode emits only windows closed by the watermark; compare
    // those against the same windows computed in batch.
    val streamed = spark.table("ev_counts")
    val batch = graft.Tables.events(spark, sf001)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))
    val s = streamed.select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val b = batch.collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(s.nonEmpty)
    assert(s.subsetOf(b)) // every emitted window agrees with batch
  }
}
