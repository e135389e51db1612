package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming == batch on closed windows; open windows are withheld
  * (append mode) and a second run picks them up from the checkpoint
  * once later data closes them.
  */
class WindowedCountsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  private def eventsDf(rows: Seq[(Long, Timestamp, String, Double)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "event_type", "value")
      .withColumn("user_id", lit(1L))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private val outSchema = "window_s LONG, event_type STRING, n LONG, sum_cents LONG"

  test("closed windows match the batch transform; open windows are withheld, then flushed") {
    import spark.implicits._
    val landing = TestSpark.tempDir("wc_landing")
    val out = TestSpark.tempDir("wc_out")
    val ckpt = TestSpark.tempDir("wc_ckpt")

    // windows: [10:00,10:10) closed by watermark (max 10:25 − 10m =
    // 10:15); [10:20,10:30) still open after run 1
    val run1 = Seq(
      (1L, ts(1), "view", 1.0), (2L, ts(5), "view", 2.5),
      (3L, ts(8), "click", 4.0), (4L, ts(25), "view", 8.0))
    eventsDf(run1).write.mode("overwrite").parquet(landing)
    WindowedCounts.start(spark, landing, out, ckpt).awaitTermination()

    def read() = spark.read.schema(outSchema).parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val closed = WindowedCounts.transform(
        eventsDf(run1).filter($"ts" < lit(ts(10))), "10 minutes")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(read() == closed)
    assert(closed.map(_._2) == Set("view", "click"))

    // run 2: new data at 10:45 pushes the watermark past 10:30,
    // flushing the withheld [10:20,10:30) window exactly once
    eventsDf(Seq((5L, ts(45), "view", 16.0))).write.mode("append").parquet(landing)
    WindowedCounts.start(spark, landing, out, ckpt).awaitTermination()
    val all = WindowedCounts.transform(
        eventsDf(run1).filter($"ts" < lit(ts(30))), "10 minutes")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(read() == all)
  }

  test("rate-limited backfill: one file per micro-batch, identical final output") {
    import spark.implicits._
    val landing = TestSpark.tempDir("wc_bf_landing")
    val outA = TestSpark.tempDir("wc_bf_outA")
    val outB = TestSpark.tempDir("wc_bf_outB")
    // 4 landing files spanning 4 closed windows + later data to close them
    (0 until 4).foreach { i =>
      eventsDf(Seq((i.toLong, ts(i * 10 + 1), "view", i + 1.0)))
        .coalesce(1).write.mode("append").parquet(landing)
    }
    eventsDf(Seq((9L, ts(55), "view", 9.0)))
      .coalesce(1).write.mode("append").parquet(landing)

    val qa = WindowedCounts.start(spark, landing, outA,
      TestSpark.tempDir("wc_bf_ckA"), maxFilesPerTrigger = Some(1))
    qa.awaitTermination()
    val batchesA = qa.recentProgress.count(_.numInputRows > 0)
    val qb = WindowedCounts.start(spark, landing, outB,
      TestSpark.tempDir("wc_bf_ckB"))
    qb.awaitTermination()

    def read(dir: String) = spark.read.schema(outSchema).parquet(dir)
      .collect().map(_.toSeq).toSet
    assert(read(outA) == read(outB), "rate-limited backfill must converge to the one-shot answer")
    assert(read(outA).nonEmpty)
    assert(batchesA >= 3, s"expected multiple micro-batches with maxFilesPerTrigger=1, saw $batchesA")
  }
}
