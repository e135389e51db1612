package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The canonical streaming aggregate: tumbling event-time windows with
  * a watermark, per event type — counts and exact cents sums, append
  * mode (each window emitted exactly once, when the watermark passes
  * its end; T1/T2 cadence parity with the reference's micro-batch
  * dashboards).
  *
  * Scale: state is one row per (open window × type) — bounded by the
  * watermark delay, not the stream length; the aggregation is
  * partial+final, so each micro-batch ships pre-combined partials.
  * The identical transform runs in batch (Spark's `window()` is the
  * same function there) — the spec pins streaming == batch on closed
  * windows.
  */
object WindowedCounts {

  /** Shared transform — one definition for both engines (the
    * batch/streaming unification Structured Streaming promises).
    */
  def transform(events: DataFrame, windowLen: String): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(window($"ts", windowLen).as("w"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(round($"value" * 100).cast("long")).as("sum_cents"))
      .select(unix_timestamp($"w.start").as("window_s"), $"event_type",
        $"n", $"sum_cents")
  }

  /** Stream a parquet landing dir into per-window parquet outputs.
    * `maxFilesPerTrigger` bounds each micro-batch for rate-limited
    * BACKFILL: pointing the stream at months of history must not
    * build one giant batch — with a cap, the same checkpoint + the
    * same code drain the backlog incrementally and converge to the
    * identical output (spec-pinned).
    */
  def start(spark: SparkSession, landingDir: String, outDir: String,
            checkpointDir: String, windowLen: String = "10 minutes",
            delay: String = "10 minutes",
            maxFilesPerTrigger: Option[Int] = None,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val reader = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
        "event_type STRING, value DOUBLE, props STRING")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val events = reader.parquet(landingDir).withWatermark("ts", delay)
    transform(events, windowLen)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }
}
