package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.llm.Dedup

/** Pins the streaming near-dup gate's two contracts (the same bar as
  * StreamDedupSpec): (1) batch parity — streaming the odd-doc_id
  * slice against a preloaded even-id signature index emits exactly
  * q203_incremental_dedup's pair set on the same corpus; (2)
  * checkpoint-restart idempotence — replaying a batch whose writes
  * already landed (the crash-before-commit window) leaves the pairs
  * and index byte-identical, and a second AvailableNow run on the
  * same checkpoint picks up only new files.
  */
class StreamNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("streamed odd batch vs preloaded even index matches q203's pairs") {
    import spark.implicits._
    val landing = TestSpark.tempDir("sndup_landing")
    val indexDir = TestSpark.tempDir("sndup_index") + "/idx"
    val pairsDir = TestSpark.tempDir("sndup_pairs") + "/pairs"
    val ckpt = TestSpark.tempDir("sndup_ckpt")

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    // Preload the index with the even slice's signatures, as prior
    // ingests (ingest_batch = -1 < every checkpointed batch id).
    Dedup.sketches(docs.filter($"doc_id" % 2 === 0))
      .withColumn("ingest_batch", lit(-1L))
      .write.partitionBy("ingest_batch").parquet(indexDir)
    // The odd slice arrives as one streamed micro-batch.
    docs.filter($"doc_id" % 2 === 1)
      .select($"doc_id", lit(ts(0)).as("ts"), $"text")
      .write.mode("overwrite").parquet(landing)

    StreamNearDup.start(spark, landing, indexDir, pairsDir, ckpt)
      .awaitTermination()

    val got = StreamNearDup.loadPairs(spark, pairsDir)
      .select($"batch_doc", $"index_doc", $"j_bp")
      .as[(Long, Long, Long)].collect().toSet
    val want = Dedup.q203_incremental_dedup(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(want.nonEmpty, "fixture must plant cross-split near-dups")
    assert(got == want,
      s"stream/batch divergence: extra=${got -- want} missing=${want -- got}")

    // Survivors appended = odd docs with shingles minus near-dup
    // losers minus within-batch collapse losers.
    val idx = StreamNearDup.loadIndex(spark, indexDir)
      .filter($"ingest_batch" >= 0)
    val losers = want.map(_._1)
    assert(idx.as[(Long, Seq[Long], Seq[Long], Long)].collect()
      .map(_._1).toSet.intersect(losers).isEmpty,
      "near-dup batch docs must not enter the index")
  }

  test("replayed batches and a restarted stream are idempotent") {
    import spark.implicits._
    val landing = TestSpark.tempDir("sndup2_landing")
    val indexDir = TestSpark.tempDir("sndup2_index") + "/idx"
    val pairsDir = TestSpark.tempDir("sndup2_pairs") + "/pairs"
    val ckpt = TestSpark.tempDir("sndup2_ckpt")

    val base = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november oscar papa quebec romeo"
    val batchA = Seq(
      (1L, ts(0), base),
      (2L, ts(0), "totally unrelated words compose this other document body"))
    val batchB = Seq(
      (3L, ts(5), base.replaceAll("romeo$", "sierra")), // near-dup of 1
      (4L, ts(5), "fresh content that matches nothing ingested before now"),
      (5L, ts(6), "fresh content that matches nothing ingested before now"), // dup of 4, same batch
      (6L, ts(6), "and one more entirely distinct trailing document"))

    batchA.toDF("doc_id", "ts", "text").write.mode("overwrite").parquet(landing)
    StreamNearDup.start(spark, landing, indexDir, pairsDir, ckpt)
      .awaitTermination()

    def indexState(): Set[(Long, Long)] =
      StreamNearDup.loadIndex(spark, indexDir)
        .select($"doc_id", $"ingest_batch")
        .as[(Long, Long)].collect().toSet
    def pairState(): Set[(Long, Long, Long)] =
      StreamNearDup.loadPairs(spark, pairsDir)
        .select($"batch_doc", $"index_doc", $"ingest_batch")
        .as[(Long, Long, Long)].collect().toSet

    val idx1 = indexState()
    assert(idx1.map(_._1) == Set(1L, 2L), s"batch A survivors: $idx1")
    assert(pairState().isEmpty, "empty index emits no pairs")

    // Crash-replay window: batch 0's writes landed but (say) the
    // commit didn't. Re-running the same batch id must change nothing.
    StreamNearDup.processBatch(
      batchA.toDF("doc_id", "ts", "text"), 0L, indexDir, pairsDir)
    assert(indexState() == idx1 && pairState().isEmpty,
      "replaying a completed batch must be a no-op")

    // Restart on the same checkpoint: only the NEW file is processed.
    batchB.toDF("doc_id", "ts", "text").write.mode("append").parquet(landing)
    StreamNearDup.start(spark, landing, indexDir, pairsDir, ckpt)
      .awaitTermination()

    val idx2 = indexState()
    assert(idx2.map(_._1) == Set(1L, 2L, 4L, 6L),
      s"doc 3 (near-dup of 1) and doc 5 (within-batch dup of 4) must not enter: $idx2")
    val pairs2 = pairState()
    assert(pairs2.map(p => (p._1, p._2)) == Set((3L, 1L)),
      s"exactly the cross-batch near-dup pair is emitted: $pairs2")

    // Replay the second batch too: byte-identical state again.
    StreamNearDup.processBatch(
      batchB.toDF("doc_id", "ts", "text"), 1L, indexDir, pairsDir)
    assert(indexState() == idx2 && pairState() == pairs2,
      "replaying the resumed batch must be a no-op")
  }
}
