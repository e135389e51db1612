package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The custom-state CEP operator (flatMapGroupsWithState): burst
  * detection must agree with the batch gaps-and-islands dual on an
  * in-order feed, carry runs across micro-batches through state, and
  * flush via event-time timeout — never by seeing a "last" batch.
  */
class StatefulBurstsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(h: Int, min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$min%02d:$sec%02d")

  private def eventsDf(rows: Seq[(Long, Timestamp, Long, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  // user 1: errors 10:00-10:02 (burst of 3), click breaks, errors
  //         10:04-10:05 (run of 2 → below MinRun), burst of 4 at 11:00+
  // user 2: error 10:00, then >10min gap → errors 10:20-10:22 (burst of 3)
  // user 3: run SPLIT ACROSS FILES — errors 10:00,10:01 in file 1,
  //         10:02 in file 2 → one burst of 3 only if state carries
  private val file1 = Seq(
    (1L, ts(10, 0), 1L, "error"), (2L, ts(10, 1), 1L, "error"), (3L, ts(10, 2), 1L, "error"),
    (4L, ts(10, 3), 1L, "click"),
    (5L, ts(10, 4), 1L, "error"), (6L, ts(10, 5), 1L, "error"),
    (7L, ts(11, 0), 1L, "error"), (8L, ts(11, 1), 1L, "error"),
    (9L, ts(11, 2), 1L, "error"), (10L, ts(11, 3), 1L, "error"),
    (11L, ts(10, 0), 2L, "error"),
    (12L, ts(10, 20), 2L, "error"), (13L, ts(10, 21), 2L, "error"), (14L, ts(10, 22), 2L, "error"),
    (15L, ts(10, 0), 3L, "error"), (16L, ts(10, 1), 3L, "error"))
  // sentinel click pushes the watermark to 12:50 so every run times out
  private val file2 = Seq(
    (17L, ts(10, 2), 3L, "error"),
    (99L, ts(13, 0), 9L, "click"))

  private def s(t: Timestamp): Long = t.getTime / 1000L

  /** Land rows as ONE parquet file directly in `landing` (the file
    * stream source does not recurse into per-write subdirectories).
    */
  private def land(rows: Seq[(Long, Timestamp, Long, String)],
                   landing: String, name: String): Unit = {
    val tmp = TestSpark.tempDir(s"burst_stage_$name")
    eventsDf(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(landing, s"$name.parquet"))
  }

  private val outSchema = "user_id LONG, start_s LONG, end_s LONG, n_errors LONG"

  test("streaming bursts equal the batch dual; runs span micro-batches via state") {
    val landing = TestSpark.tempDir("burst_landing")
    val out = TestSpark.tempDir("burst_out")
    val ckpt = TestSpark.tempDir("burst_ckpt")
    land(file1, landing, "f1")
    land(file2, landing, "f2")

    // maxFilesPerTrigger=1 forces the run to split into micro-batches,
    // so user 3's burst only appears if state carries across them.
    StatefulBursts.start(spark, landing, out, ckpt, gapS = 600L,
      maxFilesPerTrigger = Some(1)).awaitTermination()

    val got = spark.read.schema(outSchema).parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq

    val expected = Seq(
      (1L, s(ts(10, 0)), s(ts(10, 2)), 3L),
      (1L, s(ts(11, 0)), s(ts(11, 3)), 4L),
      (2L, s(ts(10, 20)), s(ts(10, 22)), 3L),
      (3L, s(ts(10, 0)), s(ts(10, 2)), 3L))
    assert(got == expected)

    // batch dual over the SAME rows (shared burstsBatch core = q72)
    val batch = StatefulBursts.burstsBatch(eventsDf(file1 ++ file2), gapS = 600L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(batch == expected)
  }

  test("timeout closes an open run exactly-once across restarts") {
    val landing = TestSpark.tempDir("burst2_landing")
    val out = TestSpark.tempDir("burst2_out")
    val ckpt = TestSpark.tempDir("burst2_ckpt")
    // run 1: an open burst (3 errors) but watermark never passes it
    land(Seq(
      (1L, ts(10, 0), 7L, "error"), (2L, ts(10, 1), 7L, "error"),
      (3L, ts(10, 2), 7L, "error")), landing, "f1")
    StatefulBursts.start(spark, landing, out, ckpt, gapS = 600L).awaitTermination()
    assert(spark.read.schema(outSchema).parquet(out).count() == 0,
      "run must stay open until the watermark passes lastError + gap")

    // run 2 through the same checkpoint: sentinel advances the
    // watermark → the stored run flushes by timeout
    land(Seq((9L, ts(13, 0), 9L, "click")), landing, "f2")
    StatefulBursts.start(spark, landing, out, ckpt, gapS = 600L).awaitTermination()
    val rows = spark.read.schema(outSchema).parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == Seq((7L, s(ts(10, 0)), s(ts(10, 2)), 3L)))

    // idempotent: re-running with no new files emits nothing new
    StatefulBursts.start(spark, landing, out, ckpt).awaitTermination()
    assert(spark.read.parquet(out).count() == 1)
  }
}
