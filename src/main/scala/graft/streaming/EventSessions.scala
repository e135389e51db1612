package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming sessionization over an event stream — the native
  * `session_window` stateful aggregation (gap-merged event-time
  * windows with a watermark bounding state). This is the streaming
  * dual of the batch sessionizer (q37's lag + running-sum window):
  * identical session boundaries, but computed incrementally with
  * per-key state that expires once the watermark passes a session's
  * close, so state size is O(open sessions), not O(history).
  *
  * Scale: state is partitioned by (user_id, session) — the same
  * high-cardinality sharding as every window here; late events
  * within the watermark re-open and merge sessions (handled by the
  * engine's session-merge state store operations); events later than
  * the watermark are dropped, the documented trade of bounded state.
  */
object EventSessions {

  /** Streaming sources must be schema-pinned (never infer on a
    * stream) — harness `events` shape, µs timestamps.
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Gap-based session aggregation: one row per (user, session) with
    * the session bounds, event count and cents sum.
    */
  def sessionize(events: DataFrame, gap: String): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy($"user_id", session_window($"ts", gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(round($"value" * 100).cast("long")).as("sum_cents"))
      .select($"user_id",
        unix_timestamp($"sw.start").as("start_s"),
        unix_timestamp($"sw.end").as("end_s"),
        $"n_events", $"sum_cents")
  }

  /** Drive the sessionizer over a parquet landing dir into an
    * append-mode parquet sink: sessions emit only once the watermark
    * closes them (append mode is what makes the state bounded).
    */
  def start(spark: SparkSession, landingDir: String, outDir: String,
            checkpointDir: String, gap: String = "5 minutes",
            lateness: String = "10 minutes",
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val src = spark.readStream.schema(eventSchema).parquet(landingDir)
      .withWatermark("ts", lateness)
    sessionize(src, gap)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
