package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming ingest for a training corpus — the LLM-side
  * analog of the GTFS RT bronze path (graft.gtfs.RtStream): document
  * batches land as parquet files, the file-source checkpoint log
  * gives exactly-once file handling, and the cheap quality/dedup
  * gates run inline so garbage never reaches the curated store.
  *
  * Pipeline per micro-batch: schema-pinned scan (never infer on a
  * stream) → quality gate (integer basis-point score, same formula as
  * the batch q21/q39 path) → processing-time exact-dup drop: the
  * watermark column is `current_timestamp()` (arrival time, not an
  * event-time field), so duplicates arriving within `dedupDelay` of
  * each other in wall-clock time collapse, while replays arriving
  * later pass the gate — the periodic batch exact-dedup (q20) is the
  * backstop for those. Bounded state — the streaming form of q20's
  * first-wins keeper; cross-batch near-dup stays a periodic batch
  * job, q23, as LSH state does not bound cleanly.
  *
  * Scale: every stage is map-side except the dedup, which shuffles on
  * the (high-cardinality, uniform) content hash; state size is bounded
  * by the watermark delay × arrival rate, not corpus size.
  */
object CorpusStream {

  /** Streaming sources must be given a schema explicitly; this is the
    * harness `documents` shape (TESTDATA.md).
    */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val ingestTrigger: Trigger = Trigger.ProcessingTime("2 minutes")

  /** Start the curated-corpus ingest stream over a landing directory.
    * Documents failing the q39 quality bar are dropped; exact
    * duplicates arriving within `dedupDelay` of each other collapse to
    * the first occurrence. Appends parquet to `curatedDir`.
    */
  def startIngest(spark: SparkSession, landingDir: String, curatedDir: String,
                  checkpointDir: String, dedupDelay: String = "10 minutes",
                  trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._
    spark.readStream
      .schema(docSchema)
      .parquet(landingDir)
      .withColumn("quality_bp", TextAnalysis.qualityBp($"text"))
      .filter($"quality_bp" >= CorpusPipeline.QualityThresholdBp)
      .withColumn("content_hash", md5($"text"))
      .withColumn("ingest_ts", current_timestamp())
      .withWatermark("ingest_ts", dedupDelay)
      .dropDuplicatesWithinWatermark("content_hash")
      .writeStream
      .format("parquet")
      .option("path", curatedDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }

  /** Streaming differentially-private release: per micro-batch, the
    * per-(source, lang) ingest counts with the q210 discrete-Laplace
    * draw (exact integer arithmetic, ε = ln 2 per release) applied at
    * emit — the continuous-observation form of the batch DP release.
    * Each micro-batch is one release epoch: the noise seed includes
    * the epoch id, so repeated releases draw FRESH noise (a fixed
    * per-key seed would let an observer average the noise away and
    * recover the trend; privacy loss composes across epochs, which
    * the release cadence budgets). True counts never leave the
    * foreachBatch closure — only the clamped noisy counts land.
    * State: none beyond the file-source checkpoint; the aggregate is
    * batch-local, so the operator is exactly-once under replay (same
    * epoch id ⇒ bit-identical noise ⇒ idempotent overwrite-by-epoch).
    */
  def startDpRelease(spark: SparkSession, landingDir: String, releaseDir: String,
                     checkpointDir: String,
                     trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(docSchema)
      .parquet(landingDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       epoch: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        batch.groupBy($"source", $"lang").agg(count(lit(1)).as("n_true"))
          .withColumn("noise", DataPrep.geometricNoise(concat(
            lit("graft_dpstream_"), lit(epoch), lit("_"), $"source", lit("_"), $"lang")))
          .select(lit(epoch).as("epoch"), $"source", $"lang",
            greatest($"n_true" + $"noise", lit(0L)).as("n_noisy"),
            lit(693L).as("epsilon_milli"))
          .write.mode("append").parquet(releaseDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
