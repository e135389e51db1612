package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.HllAggregator

/** Streaming distinct-count sketch: per-window unique users per event
  * type, estimated with the HLL UDAF ([[graft.functions.HllAggregator]])
  * inside a watermarked tumbling-window aggregate — the live form of
  * the COUNT(DISTINCT) dashboard that exact streaming state cannot
  * afford: exact distinct keeps every key seen per open window in the
  * state store (O(users × open windows)); the sketch keeps ONE
  * 64-long register array per (window, type) regardless of
  * cardinality.
  *
  * The register max is idempotent and associative, so state survives
  * partial aggregation, micro-batch merge order, and replay without
  * drift — the same merge-law the batch spec pins for q71. Append
  * mode emits each window's final sketch exactly once when the
  * watermark closes it. Batch dual: [[transform]] on a static frame,
  * which is how the spec cross-checks streaming output.
  */
object StreamingSketch {

  /** Shared batch/stream transform: md5-60-bit user hash (the
    * repo-wide engine-independent hash, see q151) → HLL sketch per
    * (tumbling window, event type).
    */
  def transform(events: DataFrame, windowLen: String): DataFrame = {
    import events.sparkSession.implicits._
    events
      .select(window($"ts", windowLen).as("w"), $"event_type",
        conv(substring(md5($"user_id".cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy($"w", $"event_type")
      .agg(HllAggregator.sketch($"h").as("sk"))
      .select(unix_timestamp($"w.start").as("window_s"), $"event_type",
        $"sk.hll_est".as("n_users_est"), $"sk.regs_hit".as("regs_hit"),
        $"sk.sum_rho".as("sum_rho"))
  }

  /** Stream a parquet landing dir of events into per-window sketch
    * rows (same landing contract as [[WindowedCounts.start]]).
    */
  def start(spark: SparkSession, landingDir: String, outDir: String,
            checkpointDir: String, windowLen: String = "10 minutes",
            delay: String = "10 minutes",
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val events = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
        "event_type STRING, value DOUBLE, props STRING")
      .parquet(landingDir)
      .withWatermark("ts", delay)
    transform(events, windowLen)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }
}
