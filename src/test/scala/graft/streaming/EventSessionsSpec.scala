package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class EventSessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  private def eventsDf(rows: Seq[(Long, Timestamp, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "value")
      .withColumn("event_type", lit("click"))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  // user 1: events at 10:00, 10:02, 10:04 (one session, gap 5m),
  //         then 10:30 (second session)
  // user 2: single event at 10:01
  private val batch = Seq(
    (1L, ts(0), 1L, 1.0), (2L, ts(2), 1L, 2.0), (3L, ts(4), 1L, 3.0),
    (4L, ts(30), 1L, 4.0),
    (5L, ts(1), 2L, 5.0))

  test("streaming session windows equal the batch gap-sessionizer") {
    import spark.implicits._
    val landing = TestSpark.tempDir("sess_landing")
    val out = TestSpark.tempDir("sess_out")
    val ckpt = TestSpark.tempDir("sess_ckpt")
    eventsDf(batch).write.mode("overwrite").parquet(landing)

    EventSessions.start(spark, landing, out, ckpt).awaitTermination()

    val got = spark.read.schema(
        "user_id LONG, start_s LONG, end_s LONG, n_events LONG, sum_cents LONG")
      .parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
      .sorted.toSeq

    // batch analog over the same rows: session = gap>5min split.
    // Append mode only emits sessions the final watermark has passed
    // (max ts − 10min lateness), so open sessions are excluded.
    val watermarkMs = batch.map(_._2.getTime).max - 10 * 60 * 1000
    val expected = batch.groupBy(_._3).toSeq.flatMap { case (u, evs) =>
      val sorted = evs.sortBy(_._2.getTime)
      val sessions = sorted.foldLeft(List.empty[List[(Long, Timestamp, Long, Double)]]) {
        case (acc, e) => acc match {
          case cur :: rest if e._2.getTime - cur.head._2.getTime <= 5 * 60 * 1000 =>
            (e :: cur) :: rest
          case _ => List(e) :: acc
        }
      }
      sessions
        .filter(s => s.map(_._2.getTime).max + 5 * 60 * 1000 <= watermarkMs)
        .map { s =>
          (u, s.map(_._2.getTime / 1000).min,
            s.length.toLong, s.map(e => math.round(e._4 * 100)).sum)
        }
    }.sorted
    assert(got == expected)
  }

  test("second batch through the same checkpoint only appends newly closed sessions") {
    import spark.implicits._
    val landing = TestSpark.tempDir("sess2_landing")
    val out = TestSpark.tempDir("sess2_out")
    val ckpt = TestSpark.tempDir("sess2_ckpt")
    eventsDf(batch).write.mode("overwrite").parquet(landing)
    EventSessions.start(spark, landing, out, ckpt).awaitTermination()
    val n1 = spark.read.parquet(out).count()

    // a later event far past the watermark creates one more session
    eventsDf(Seq((9L, Timestamp.valueOf("2024-01-01 12:00:00"), 2L, 7.0)))
      .write.mode("append").parquet(landing)
    EventSessions.start(spark, landing, out, ckpt).awaitTermination()
    val rows2 = spark.read.parquet(out).count()
    assert(rows2 >= n1, "restart must not lose previously emitted sessions")
    // exactly-once on the source: re-running with no new files adds nothing
    EventSessions.start(spark, landing, out, ckpt).awaitTermination()
    assert(spark.read.parquet(out).count() == rows2)
  }
}
