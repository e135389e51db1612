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
}
