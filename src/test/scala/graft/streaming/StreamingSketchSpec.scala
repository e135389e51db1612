package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The streaming HLL sketch must equal the batch transform on closed
  * windows (the register max is order/batching-independent), withhold
  * open windows, and flush them exactly once from the checkpoint —
  * and the estimate must be exact in the small-cardinality regime
  * (distinct users ≪ 64 registers ⇒ every user hits its own
  * register with high probability; we assert the sketch fields, not
  * luck, by comparing to the batch dual).
  */
class StreamingSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  private def eventsDf(rows: Seq[(Long, Timestamp, String, Long)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "event_type", "user_id")
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private val outSchema =
    "window_s LONG, event_type STRING, n_users_est LONG, regs_hit LONG, sum_rho LONG"

  test("streaming sketch == batch sketch on closed windows; withheld window flushes once") {
    import spark.implicits._
    val landing = TestSpark.tempDir("sk_landing")
    val out = TestSpark.tempDir("sk_out")
    val ckpt = TestSpark.tempDir("sk_ckpt")

    // [10:00,10:10): users 1,2,3 across two types; duplicate user 1
    // (register max is idempotent — dup must not change the sketch).
    // [10:20,10:30): open after run 1 (watermark 10:25 − 10m).
    val run1 = Seq(
      (1L, ts(1), "view", 1L), (2L, ts(2), "view", 2L),
      (3L, ts(5), "view", 1L), (4L, ts(8), "click", 3L),
      (5L, ts(25), "view", 7L))
    eventsDf(run1).write.mode("overwrite").parquet(landing)
    StreamingSketch.start(spark, landing, out, ckpt).awaitTermination()

    def read() = spark.read.schema(outSchema).parquet(out)
      .collect().map(_.toSeq).toSet
    def batch(upToMin: Int) = StreamingSketch.transform(
        eventsDf(run1).filter($"ts" < lit(ts(upToMin))), "10 minutes")
      .collect().map(_.toSeq).toSet
    assert(read() == batch(10), "closed windows must match the batch dual")
    assert(read().nonEmpty)

    // run 2: 10:45 data closes [10:20,10:30); output gains exactly it
    eventsDf(Seq((6L, ts(45), "view", 9L))).write.mode("append").parquet(landing)
    StreamingSketch.start(spark, landing, out, ckpt).awaitTermination()
    assert(read() == batch(30), "withheld window flushed exactly once")
  }

  test("sketch state is registers, not keys: high-cardinality window emits one bounded row") {
    import spark.implicits._
    val landing = TestSpark.tempDir("sk_big_landing")
    val out = TestSpark.tempDir("sk_big_out")
    // 500 distinct users in one window + a closer event
    val rows = (1 to 500).map(i => (i.toLong, ts(1), "view", i.toLong)) :+
      (999L, ts(25), "view", 999L)
    eventsDf(rows).write.mode("overwrite").parquet(landing)
    StreamingSketch.start(spark, landing, out, TestSpark.tempDir("sk_big_ckpt"))
      .awaitTermination()
    val got = spark.read.schema(outSchema).parquet(out).collect()
    assert(got.length == 1)
    val est = got.head.getLong(2)
    // HLL with m=64: σ ≈ 1.04/√64 = 13%; assert a 4σ band around 500
    assert(est > 240 && est < 760, s"estimate $est implausible for 500 users")
    // and the batch dual agrees field-for-field
    val dual = StreamingSketch.transform(
        eventsDf(rows).filter($"ts" < lit(ts(10))), "10 minutes")
      .collect().map(_.toSeq).toSet
    assert(got.map(_.toSeq).toSet == dual)
  }
}
