package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The transformWithState quota gate: equals the ranking-window batch
  * dual on an in-order feed, and the admitted count survives both
  * micro-batch boundaries and a full restart through the RocksDB
  * state checkpoint.
  */
class QuotaGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(h: Int, min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$min%02d:00")

  private def eventsDf(rows: Seq[(Long, Timestamp, Long)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def land(rows: Seq[(Long, Timestamp, Long)],
                   landing: String, name: String): Unit = {
    val tmp = TestSpark.tempDir(s"quota_stage_$name")
    eventsDf(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(landing, s"$name.parquet"))
  }

  private val outSchema = "user_id LONG, event_id LONG, ts_s LONG, seq LONG"

  test("quota admits each key's first N events in order, across batches and restarts") {
    val landing = TestSpark.tempDir("quota_landing")
    val out = TestSpark.tempDir("quota_out")
    val ckpt = TestSpark.tempDir("quota_ckpt")

    // run 1: user 1 has 2 events (quota 3 → both admitted),
    //        user 2 has 4 (3 admitted, 1 dropped)
    val f1 = Seq(
      (1L, ts(10, 0), 1L), (2L, ts(10, 1), 1L),
      (3L, ts(10, 0), 2L), (4L, ts(10, 1), 2L),
      (5L, ts(10, 2), 2L), (6L, ts(10, 3), 2L))
    land(f1, landing, "f1")
    QuotaGate.start(spark, landing, out, ckpt, quota = 3L).awaitTermination()

    def got() = spark.read.schema(outSchema).parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted.toSeq
    assert(got() == Seq((1L, 1L, 1L), (1L, 2L, 2L),
      (2L, 3L, 1L), (2L, 4L, 2L), (2L, 5L, 3L)))

    // run 2 (restart through the checkpoint): user 1 sends 2 more —
    // only ONE admitted (state remembers 2 of 3 used); user 2 fully
    // saturated; user 3 fresh
    val f2 = Seq(
      (7L, ts(11, 0), 1L), (8L, ts(11, 1), 1L),
      (9L, ts(11, 0), 2L),
      (10L, ts(11, 0), 3L))
    land(f2, landing, "f2")
    QuotaGate.start(spark, landing, out, ckpt, quota = 3L).awaitTermination()
    assert(got() == Seq((1L, 1L, 1L), (1L, 2L, 2L), (1L, 7L, 3L),
      (2L, 3L, 1L), (2L, 4L, 2L), (2L, 5L, 3L), (3L, 10L, 1L)))

    // batch dual over the same rows agrees
    val batch = QuotaGate.admitBatch(eventsDf(f1 ++ f2), quota = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted.toSeq
    assert(batch == got())
  }
}
