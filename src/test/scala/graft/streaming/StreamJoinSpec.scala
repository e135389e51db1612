package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Stream-stream interval join: the streaming run over a finite
  * landing dir must equal the batch run of the SAME `correlate`
  * function (inner joins emit every match regardless of watermark;
  * the watermark only bounds state).
  */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  // user 1: error at 10:00 → purchases at 10:05 (in window) and
  //         10:20 (outside 10m window); second error at 10:15
  //         catches the 10:20 purchase
  // user 2: purchase at 10:02 with no error — never emitted
  // user 3: error at 10:01 with no purchase — never emitted
  private val rows = Seq(
    (1L, ts(0), 1L, "error", 0.0),
    (2L, ts(5), 1L, "purchase", 10.0),
    (3L, ts(20), 1L, "purchase", 20.0),
    (4L, ts(15), 1L, "error", 0.0),
    (5L, ts(2), 2L, "purchase", 30.0),
    (6L, ts(1), 3L, "error", 0.0))

  private def eventsDf() = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("streaming correlation equals the batch run of the same plan") {
    val landing = TestSpark.tempDir("sj_landing")
    val out = TestSpark.tempDir("sj_out")
    val ckpt = TestSpark.tempDir("sj_ckpt")
    eventsDf().write.mode("overwrite").parquet(landing)

    StreamJoin.start(spark, landing, out, ckpt).awaitTermination()

    val schema = "err_id LONG, p_id LONG, user_id LONG, err_s LONG, p_s LONG, v_cents LONG"
    val got = spark.read.schema(schema).parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    val batch = eventsDf()
    val expected = StreamJoin.correlate(
        batch.filter(col("event_type") === "error"),
        batch.filter(col("event_type") === "purchase"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    assert(got == expected)
    // and the window semantics are the intended ones
    assert(expected == Seq((1L, 2L), (4L, 3L)))
  }
}
