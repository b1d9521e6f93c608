package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sources.Tables

/** Row shape fed through the driver-visible streaming entry. */
case class StreamEvent(
    event_id: Long, ts_us: Long, user_id: Long, event_type: String, value: Double)

/** The DECLARED streaming entry (SURVEY.md §2.2-S): runs the watermarked
  * tumbling-window pipeline of [[StreamingQueries]] as a real Structured
  * Streaming query — MemoryStream source, three micro-batches, memory sink —
  * inside a `SparkEntry.queries` fn, so the S-surface is exercised by the
  * driver itself, not only by tests.
  *
  * MemoryStream is the harness, not the operator: it requires driver-side
  * rows, so the input is a BOUNDED, deterministic slice (first 5000 events
  * by event_id) — the collect is capped at any SF. In production the same
  * `tumblingStream` transform runs unchanged over `readStream` on
  * Kafka/files with unbounded input; state stays O(open windows) via the
  * watermark (complete output mode here only because the sink must hold the
  * full answer for the oracle compare).
  *
  * Event-time correctness is what the oracle checks: the result equals the
  * batch tumbling aggregation over the same slice regardless of micro-batch
  * boundaries — the three-chunk split proves state carries across batches.
  */
object StreamingEntry {

  def streamTumblingEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val slice = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts_us"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id")).limit(5000)
      .as[StreamEvent].collect().toSeq

    val stream = MemoryStream[StreamEvent](spark)
    val streamingDf = stream.toDF().withColumn("ts_utc", timestamp_micros(col("ts_us")))
    val q = StreamingQueries.tumblingStream(streamingDf)
      .writeStream.format("memory").queryName("graft_stream_entry")
      .outputMode("complete").start()
    try {
      slice.grouped(math.max(1, (slice.size + 2) / 3)).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    spark.table("graft_stream_entry")
      .select(col("ws_us"), col("event_type"), col("n"), col("sum_cents"))
      .orderBy(col("ws_us"), col("event_type"))
  }
}
