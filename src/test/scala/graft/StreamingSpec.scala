package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

class StreamingSpec extends SparkSpec {

  test("sessionize accumulates per-user state across restarts (checkpointed)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val events = input.toDF().toDF("user_id", "value")
    val q = EventsStream.sessionize(spark, events)
      .writeStream.outputMode("update").format("memory")
      .queryName("sessions")
      .start()
    try {
      input.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
      q.processAllAvailable()
      input.addData((1L, 2.0)) // state must carry over between batches
      q.processAllAvailable()
      // update mode appends each batch's updated rows to the memory
      // table; the max per user is the final state
      val rows = spark.table("sessions")
        .groupBy("userId").agg(max("nEvents").as("n"), max("totalValue").as("v"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(rows(1L) == ((3L, 17.0))) // 2 events batch1 + 1 event batch2
      assert(rows(2L) == ((1L, 1.0)))
    } finally q.stop()
  }

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
