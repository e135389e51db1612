package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.llm.Dedup

/** Streaming NEAR-duplicate gate against a persisted MinHash signature
  * index — the daily-crawl operational shape that completes the
  * streaming face of the dedup family: [[StreamDedup]] drops exact
  * re-deliveries at the edge; this stage drops documents that are
  * near-duplicates (word-3-gram Jaccard ≥ threshold) of ANYTHING
  * already ingested, then appends the survivors' signatures to the
  * index so the next micro-batch dedups against them too.
  *
  * Per micro-batch (`foreachBatch`):
  *   1. sketch the batch (shingle hashes + 64-slot MinHash, the q23
  *      signature — one narrow mapPartitions pass, no shuffle);
  *   2. banded-LSH band-join the batch sketches against the PERSISTED
  *      index sketches only (q203's `incrementalMinhashPairs` core at
  *      sketch level — the index is NEVER paired with itself, so the
  *      per-batch cost is bounded by the batch's bucket fan-out, not
  *      |index|²; at 100 TB the index is a stored sketch table and
  *      this join is the only work that touches it);
  *   3. exact-Jaccard verify candidates; emit verified pairs;
  *   4. within-batch near-dups among the remaining docs collapse to
  *      the lowest doc_id (the q39 keep-rule), so the index invariant
  *      — no two index entries are near-duplicates the banding can
  *      see — holds across batches;
  *   5. append the survivors' signatures to the index.
  *
  * Exactly-once without a transactional sink: both outputs (emitted
  * pairs, index appends) are parquet partitions keyed by the
  * checkpointed `batchId` and written with DYNAMIC partition
  * overwrite, and the index side of the band-join excludes the
  * current batch's own partition (`ingest_batch < batchId`). A batch
  * replayed after a crash therefore recomputes the identical result
  * from the identical inputs — the partial write is superseded, never
  * self-paired, never double-appended. Batch ids are monotonic across
  * restarts (they come from the checkpoint), so `< batchId` is
  * exactly "every PRIOR ingest".
  *
  * Spec pins (StreamNearDupSpec): batch parity — streaming the odd
  * doc_ids against a preloaded even-id index emits exactly
  * q203_incremental_dedup's pair set; restart idempotence — kill
  * between micro-batches, restart on the same checkpoint, and the
  * final pairs + index equal an uninterrupted run's.
  */
object StreamNearDup {

  /** Persisted index schema: one row per ingested doc — shingle-hash
    * set + MinHash signature, partitioned by the ingesting batch.
    */
  final val IndexSchema =
    "doc_id LONG, sh ARRAY<BIGINT>, sig ARRAY<BIGINT>, ingest_batch LONG"

  final val PairsSchema =
    "batch_doc LONG, index_doc LONG, j_bp LONG, ingest_batch LONG"

  /** Read the signature index, tolerating the not-yet-created state
    * (first batch ever): an empty frame with the index schema.
    */
  def loadIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(indexDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path) && fs.listStatus(path).nonEmpty)
      spark.read.schema(IndexSchema).parquet(indexDir)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(IndexSchema))
  }

  /** Read the emitted near-dup pairs, tolerating absence. */
  def loadPairs(spark: SparkSession, pairsDir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(pairsDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path) && fs.listStatus(path).nonEmpty)
      spark.read.schema(PairsSchema).parquet(pairsDir)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(PairsSchema))
  }

  private def writePartition(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .parquet(dir)

  /** One micro-batch of the gate; deterministic in (batch, batchId,
    * index partitions < batchId), which is what makes the replay
    * idempotent. Public so the spec can also drive it directly.
    */
  def processBatch(batch: DataFrame, batchId: Long,
                   indexDir: String, pairsDir: String,
                   minJBp: Long = 5000L): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val skB = Dedup.sketches(batch.select($"doc_id", $"text"))
    // Every PRIOR ingest only: excluding the current id supersedes a
    // crashed attempt's partial partition instead of self-pairing it.
    val skI = loadIndex(spark, indexDir)
      .filter($"ingest_batch" < batchId)
      .select($"doc_id", $"sh", $"sig")
    val pairs = graft.Caches.tracked(
      Dedup.sketchCrossPairs(skB, skI, minJBp))
    writePartition(pairs.withColumn("ingest_batch", lit(batchId)), pairsDir)

    val survVsIndex = skB.join(
      pairs.select($"batch_doc".as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    // Within-batch collapse (keep the lowest doc_id) preserves the
    // index's near-dup-free invariant; bounded by the batch size.
    val withinLosers = Dedup.sketchSelfPairs(survVsIndex, minJBp)
      .select($"doc_b".as("doc_id")).distinct()
    val survivors = survVsIndex.join(withinLosers, Seq("doc_id"), "left_anti")
    writePartition(survivors.select($"doc_id", $"sh", $"sig")
      .withColumn("ingest_batch", lit(batchId)), indexDir)
    // Release this batch's persisted frames only (never releaseAll:
    // other queries on the shared session may have live tracked frames)
    skB.unpersist()
    pairs.unpersist()
  }

  /** Stream a parquet landing dir of (doc_id, ts, text) rows through
    * the near-dup gate: verified (batch_doc, index_doc, j_bp) pairs
    * land in `pairsDir`, survivor signatures append to `indexDir`.
    */
  def start(spark: SparkSession, landingDir: String, indexDir: String,
            pairsDir: String, checkpointDir: String,
            minJBp: Long = 5000L,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream
      .schema("doc_id LONG, ts TIMESTAMP, text STRING")
    val docs = maxFilesPerTrigger
      .map(n => reader.option("maxFilesPerTrigger", n))
      .getOrElse(reader)
      .parquet(landingDir)
    docs.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, id, indexDir, pairsDir, minJBp)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
