package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Input shape for the detector (a projection of the harness `events`
  * table — TESTDATA.md).
  */
case class BurstEvent(event_id: Long, ts: java.sql.Timestamp,
                      user_id: Long, event_type: String)

/** Per-key custom state: the currently-open error run. State exists
  * ONLY for keys inside an active run (see `detect`), so the state
  * store is O(open runs), not O(users).
  */
case class BurstRun(runLen: Long, startS: Long, lastS: Long)

/** One emitted burst: ≥ `MinRun` consecutive error events for a user,
  * each within `GapS` of the previous event.
  */
case class Burst(user_id: Long, start_s: Long, end_s: Long, n_errors: Long)

/** CEP-style pattern detection with CUSTOM per-key state —
  * `flatMapGroupsWithState` (SURVEY §2.13 L35). The pattern: a burst
  * of ≥ `minRun` consecutive `error` events from one user, runs
  * broken by any intervening non-error event or a gap > `gapS`.
  *
  * This is the operator family the built-in streaming aggregations
  * genuinely cannot express: emission depends on the ORDER of events
  * within the key (a non-error event between two errors resets the
  * run), not on any commutative aggregate of them. `session_window`
  * (EventSessions) merges by time alone; this machine transitions on
  * event content.
  *
  * Correctness contract vs the batch dual (Analytics.q72, same
  * gaps-and-islands semantics): equal on in-order feeds; late events
  * beyond the watermark are the documented divergence (the engine
  * does not auto-drop late input for flatMapGroupsWithState, but a
  * run already closed by timeout cannot be reopened — and any event
  * at/after the watermark is > GapS past the closed run's last error,
  * so it would have started a new run in batch too).
  *
  * Scale: state is sharded by user_id (high-cardinality); each key
  * holds three longs; event-time timeout at lastError + GapS both
  * bounds state and IS the end-of-run flush (no separate session
  * close logic). Batches sort only each key's in-batch slice.
  */
object StatefulBursts {
  /** Defaults for the oracle-verified q72: harness events are hours
    * apart per user, so the "consecutive" bound is a service day.
    */
  val GapS = 86400L
  val MinRun = 3L

  private def closed(user: Long, s: BurstRun, minRun: Long): Option[Burst] =
    if (s.runLen >= minRun) Some(Burst(user, s.startS, s.lastS, s.runLen)) else None

  /** The state-transition function — pure w.r.t. (key, sorted events,
    * prior state), so it is unit-testable without a stream.
    */
  private[streaming] def transition(gapS: Long, minRun: Long)(
      user: Long, events: Iterator[BurstEvent], state: GroupState[BurstRun]): Iterator[Burst] = {
    if (state.hasTimedOut) {
      // Watermark passed lastError + gapS: nothing can extend the run.
      val out = closed(user, state.get, minRun)
      state.remove()
      return out.iterator
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Burst]
    // In-batch slices arrive unsorted; order is (event time, id tie-break),
    // the same total order as the batch dual's window.
    val sorted = events.toArray.sortBy(e => (e.ts.getTime, e.event_id))
    var open: Option[BurstRun] = state.getOption
    for (e <- sorted) {
      val tS = e.ts.getTime / 1000L
      if (e.event_type == "error") {
        open match {
          case Some(s) if tS - s.lastS <= gapS =>
            open = Some(BurstRun(s.runLen + 1, s.startS, tS))
          case prior => // gap too large (or no run): close prior, start fresh
            prior.flatMap(closed(user, _, minRun)).foreach(out += _)
            open = Some(BurstRun(1L, tS, tS))
        }
      } else {
        // any non-error event for this user breaks the run
        open.flatMap(closed(user, _, minRun)).foreach(out += _)
        open = None
      }
    }
    open match {
      case Some(s) =>
        state.update(s)
        // Flush once no event can extend the run. Timeout must exceed
        // the current watermark; if the run is already expired (old
        // data), wm + 1ms fires in the next no-data batch.
        state.setTimeoutTimestamp(
          math.max((s.lastS + gapS) * 1000L + 1L, state.getCurrentWatermarkMs() + 1L))
      case None => state.remove() // no state for users outside a run
    }
    out.iterator
  }

  /** The batch dual — the gaps-and-islands window formulation of the
    * same semantics (one window shuffle on user_id, then partial+
    * final agg on (user, run); no self-join). Exposed here so the
    * DuckDB-oracled q72 and StatefulBurstsSpec's batch-equivalence
    * check run the SAME code.
    */
  def burstsBatch(events: DataFrame, gapS: Long = GapS,
                  minRun: Long = MinRun): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select($"user_id", $"event_id", date_trunc("second", $"ts").as("t"),
        ($"event_type" === "error").as("is_err"))
      .withColumn("prev_err", lag($"is_err", 1).over(w))
      .withColumn("gap_s", unix_timestamp($"t") - unix_timestamp(lag($"t", 1).over(w)))
      .withColumn("new_run",
        when($"is_err" && !(coalesce($"prev_err", lit(false)) && $"gap_s" <= gapS),
          1L).otherwise(0L))
      .withColumn("run_id", sum($"new_run").over(running))
      .filter($"is_err")
      .groupBy($"user_id", $"run_id")
      .agg(min(unix_timestamp($"t")).as("start_s"),
        max(unix_timestamp($"t")).as("end_s"),
        count(lit(1)).as("n_errors"))
      .filter($"n_errors" >= minRun)
      .select($"user_id", $"start_s", $"end_s", $"n_errors")
      .orderBy($"user_id", $"start_s")
  }

  /** Wire the detector over a (possibly streaming) events frame. */
  def detect(events: DataFrame, gapS: Long = GapS, minRun: Long = MinRun,
             lateness: String = "10 minutes"): Dataset[Burst] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select("event_id", "ts", "user_id", "event_type").as[BurstEvent]
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(transition(gapS, minRun))
  }

  /** Drive from a parquet landing dir to an append parquet sink
    * (exactly-once via the file-source checkpoint log, as RtStream/
    * CorpusStream).
    */
  def start(spark: SparkSession, landingDir: String, outDir: String,
            checkpointDir: String, gapS: Long = GapS, minRun: Long = MinRun,
            lateness: String = "10 minutes",
            maxFilesPerTrigger: Option[Int] = None,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val reader = spark.readStream.schema(EventSessions.eventSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    detect(reader.parquet(landingDir), gapS, minRun, lateness)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
