package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Stream-stream interval join — correlate two live feeds (here:
  * error events with the purchases that follow them for the same user
  * within a bounded window). This is the one join shape where BOTH
  * sides are unbounded: each side buffers state keyed by the equi-key,
  * and the event-time range predicate plus per-side watermarks are
  * what let the engine garbage-collect that state (without the range
  * bound, stream-stream state grows forever — the documented Spark
  * constraint, and the reason `correlate` takes the window as part of
  * the join condition rather than as a post-filter).
  *
  * `correlate` is plan-generic: the same function drives the batch
  * DataFrames in the spec (batch ≡ streaming is the test oracle) and
  * the watermarked streaming frames in [[start]].
  *
  * Scale: state is hash-partitioned on user_id (high-cardinality),
  * bounded by watermark lateness × arrival rate per side; the join
  * never shuffles more than the in-window slice of either stream.
  */
object StreamJoin {

  /** Purchases within `[err_ts, err_ts + window]` for the same user.
    * Output columns are second-floored epochs + integer cents, the
    * repo's engine-independent emission discipline.
    */
  def correlate(errors: DataFrame, purchases: DataFrame,
                window: String = "10 minutes"): DataFrame = {
    val e = errors.select(col("event_id").as("err_id"),
      col("user_id").as("err_user"), col("ts").as("err_ts"))
    val p = purchases.select(col("event_id").as("p_id"),
      col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
    e.join(p, expr(
        s"err_user = p_user AND p_ts >= err_ts AND p_ts <= err_ts + interval $window"))
      .select(col("err_id"), col("p_id"), col("err_user").as("user_id"),
        unix_timestamp(col("err_ts")).as("err_s"),
        unix_timestamp(col("p_ts")).as("p_s"),
        round(col("value") * 100).cast("long").as("v_cents"))
  }

  /** LEFT OUTER variant of [[correlate]]: every error emits — matched
    * rows as in the inner form, unmatched ones with null purchase
    * columns. In streaming, the null row for an unmatched error can
    * only be emitted once the watermark proves no in-window purchase
    * can still arrive (err_ts + window + lateness) — Spark enforces
    * exactly this: outer stream-stream joins REQUIRE the watermark +
    * time-range bound that the inner form merely uses for state GC.
    * Same plan runs in batch, where nulls emit immediately (the spec's
    * oracle).
    *
    * Operational note (spec-pinned): the global watermark is the MIN
    * across both sides' watermark nodes, and each side's event-time
    * stats see only rows surviving its own filter — so null emission
    * requires BOTH feeds to keep flowing. A quiet purchases feed
    * withholds every unmatched-error row indefinitely; that is the
    * documented Spark contract, not a bug, and the monitoring hook is
    * `lastProgress.eventTime` per side.
    */
  def correlateOuter(errors: DataFrame, purchases: DataFrame,
                     window: String = "10 minutes"): DataFrame = {
    val e = errors.select(col("event_id").as("err_id"),
      col("user_id").as("err_user"), col("ts").as("err_ts"))
    val p = purchases.select(col("event_id").as("p_id"),
      col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
    e.join(p, expr(
        s"err_user = p_user AND p_ts >= err_ts AND p_ts <= err_ts + interval $window"),
        "left_outer")
      .select(col("err_id"), col("p_id"), col("err_user").as("user_id"),
        unix_timestamp(col("err_ts")).as("err_s"),
        unix_timestamp(col("p_ts")).as("p_s"),
        round(col("value") * 100).cast("long").as("v_cents"))
  }

  /** Drive the correlation over a parquet landing dir: one
    * schema-pinned source, split into two watermarked sides (a stream
    * self-join — supported and state-bounded exactly like two
    * distinct sources), append-mode parquet sink.
    */
  def start(spark: SparkSession, landingDir: String, outDir: String,
            checkpointDir: String, lateness: String = "10 minutes",
            window: String = "10 minutes",
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val src = spark.readStream
      .schema(EventSessions.eventSchema).parquet(landingDir)
    val errors = src.filter(col("event_type") === "error")
      .withWatermark("ts", lateness)
    val purchases = src.filter(col("event_type") === "purchase")
      .withWatermark("ts", lateness)
    correlate(errors, purchases, window)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** [[start]] for the left-outer form (see [[correlateOuter]]). */
  def startOuter(spark: SparkSession, landingDir: String, outDir: String,
                 checkpointDir: String, lateness: String = "10 minutes",
                 window: String = "10 minutes",
                 trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val src = spark.readStream
      .schema(EventSessions.eventSchema).parquet(landingDir)
    val errors = src.filter(col("event_type") === "error")
      .withWatermark("ts", lateness)
    val purchases = src.filter(col("event_type") === "purchase")
      .withWatermark("ts", lateness)
    correlateOuter(errors, purchases, window)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
