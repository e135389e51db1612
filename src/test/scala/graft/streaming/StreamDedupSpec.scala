package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("in-window re-deliveries collapse to one survivor; distinct payloads all pass") {
    import spark.implicits._
    val landing = TestSpark.tempDir("sdedup_landing")
    val out = TestSpark.tempDir("sdedup_out")
    val ckpt = TestSpark.tempDir("sdedup_ckpt")
    // doc 1 re-delivered twice inside the window (ids 10, 11), and a
    // whitespace/case variant (id 12) that normalizes to the same
    // content; docs 2 and 3 distinct
    val rows = Seq(
      (10L, ts(0), "The quick brown fox"),
      (11L, ts(1), "The quick brown fox"),
      (12L, ts(2), "the  quick   brown fox"),
      (20L, ts(1), "another document body"),
      (30L, ts(3), "a third distinct text"))
    rows.toDF("doc_id", "ts", "text").write.mode("overwrite").parquet(landing)

    StreamDedup.start(spark, landing, out, ckpt).awaitTermination()

    val got = spark.read
      .schema("doc_id LONG, ts TIMESTAMP, text STRING, content_hash STRING")
      .parquet(out).collect()
    assert(got.length == 3, s"one survivor per content hash: ${got.mkString(",")}")
    val hashes = got.map(_.getString(3)).toSet
    assert(hashes.size == 3)
    val survivors = got.map(_.getLong(0)).toSet
    assert(survivors.contains(20L) && survivors.contains(30L))
    assert((survivors -- Set(20L, 30L)).subsetOf(Set(10L, 11L, 12L)),
      "exactly one of the re-deliveries survives")
    // batch replay of the same keyed projection agrees on hash count
    val batchHashes = StreamDedup.keyed(rows.toDF("doc_id", "ts", "text"))
      .select("content_hash").distinct().count()
    assert(batchHashes == 3L)
  }
}
