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

  test("left-outer: unmatched errors emit nulls only after the watermark closes their window") {
    val landing = TestSpark.tempDir("sjo_landing")
    val out = TestSpark.tempDir("sjo_out")
    val ckpt = TestSpark.tempDir("sjo_ckpt")
    eventsDf().write.mode("overwrite").parquet(landing)

    StreamJoin.startOuter(spark, landing, out, ckpt).awaitTermination()
    val schema = "err_id LONG, p_id LONG, user_id LONG, err_s LONG, p_s LONG, v_cents LONG"
    def read() = spark.read.schema(schema).parquet(out).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sorted.toSeq

    // run 1: matches emit; the unmatched error 6 (user 3, 10:01)
    // cannot emit yet — max event time 10:20 < 10:01 + 10m window +
    // 10m lateness
    val afterRun1 = read()
    assert(afterRun1.contains((1L, Some(2L))) && afterRun1.contains((4L, Some(3L))))
    assert(!afterRun1.exists(_._1 == 6L),
      "null row must be withheld until the watermark proves no match can arrive")

    // run 2: late closers push the watermark past 10:21. The global
    // watermark is the MIN across both sides' EventTimeWatermark
    // nodes, and each side's stats see only the rows surviving its
    // event-type filter — so the closers must be one ERROR and one
    // PURCHASE (a late 'view' would advance neither side and the
    // null row would be withheld forever). A second run drives the
    // eviction batch.
    import spark.implicits._
    def append(id: Long, m: Int, user: Long, tpe: String): Unit =
      Seq((id, ts(m), user, tpe, 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(landing)
    append(7L, 45, 8L, "error"); append(8L, 45, 9L, "purchase")
    StreamJoin.startOuter(spark, landing, out, ckpt).awaitTermination()
    append(9L, 46, 8L, "error"); append(10L, 46, 9L, "purchase")
    StreamJoin.startOuter(spark, landing, out, ckpt).awaitTermination()
    val afterRun2 = read()
    assert(afterRun2.count(_._1 == 6L) == 1, s"expected one null row for error 6: $afterRun2")
    assert(afterRun2.contains((6L, None)))
    // batch dual on the CLOSED region (the closers' own windows are
    // still open in the stream; batch emits their nulls immediately)
    val batch = eventsDf()
    val expected = StreamJoin.correlateOuter(
        batch.filter(col("event_type") === "error"),
        batch.filter(col("event_type") === "purchase"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sorted.toSeq
    assert(afterRun2.filter(_._1 <= 6L) == expected)
  }
}
