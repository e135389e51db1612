package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, StreamingQuery,
  TimeMode, TimerValues, TTLConfig, Trigger}

/** One admitted event with its running per-key sequence number. */
case class QuotaAdmit(user_id: Long, event_id: Long, ts_s: Long, seq: Long)

/** Per-key ingestion quota on the MODERN arbitrary-state API —
  * `transformWithState` / `StatefulProcessor` (Spark 4's successor to
  * flatMapGroupsWithState, RocksDB-backed with typed per-key state
  * variables): admit each key's first `quota` events in event order
  * and drop the rest — the "cap documents per source" /
  * "rate-limit a hot feed" gate every ingest pipeline ends up
  * needing. Complements StatefulBursts (the legacy-API operator):
  * together they cover both stateful surfaces.
  *
  * Batch dual: `row_number() OVER (PARTITION BY key ORDER BY ts,
  * event_id) <= quota` — the spec asserts equality on an in-order
  * feed, including runs split across micro-batches and restarts
  * (ValueState persists through the checkpoint).
  *
  * Scale: one ValueState[Long] per key (the admitted count), sharded
  * by the high-cardinality key; saturated keys cost one state read
  * per batch slice. TimeMode.None — no timers, no watermark
  * requirement; quota state lives for the stream's lifetime (pass a
  * TTLConfig for day-scoped quotas).
  */
class QuotaProcessor(quota: Long)
    extends StatefulProcessor[Long, BurstEvent, QuotaAdmit] {

  @transient private var admitted: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    admitted = getHandle.getValueState[Long]("admitted", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[BurstEvent],
                               timerValues: TimerValues): Iterator[QuotaAdmit] = {
    // in-batch slices arrive unsorted; admit in (event time, id) order
    val sorted = rows.toArray.sortBy(e => (e.ts.getTime, e.event_id))
    var n = if (admitted.exists()) admitted.get() else 0L
    val out = Seq.newBuilder[QuotaAdmit]
    for (e <- sorted if n < quota) {
      n += 1
      out += QuotaAdmit(key, e.event_id, e.ts.getTime / 1000L, n)
    }
    admitted.update(n)
    out.result().iterator
  }
}

object QuotaGate {

  /** Wire the gate over a (possibly streaming) events frame. */
  def admit(events: DataFrame, quota: Long): Dataset[QuotaAdmit] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select("event_id", "ts", "user_id", "event_type").as[BurstEvent]
      .groupByKey(_.user_id)
      .transformWithState(new QuotaProcessor(quota),
        TimeMode.None(), OutputMode.Append())
  }

  /** Batch dual — the ranking-window formulation of the same gate. */
  def admitBatch(events: DataFrame, quota: Long): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events
      .withColumn("seq", row_number().over(w).cast("long"))
      .filter($"seq" <= quota)
      .select($"user_id", $"event_id", unix_timestamp($"ts").as("ts_s"), $"seq")
  }

  /** Drive from a parquet landing dir to an append parquet sink.
    * transformWithState requires the RocksDB state store provider —
    * set per-session before the query starts.
    */
  def start(spark: SparkSession, landingDir: String, outDir: String,
            checkpointDir: String, quota: Long,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    admit(spark.readStream.schema(EventSessions.eventSchema).parquet(landingDir), quota)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
