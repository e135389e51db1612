package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins BOTH `events.ts` read paths in [[Tables.load]]. The harness
  * testdata has shipped the column two ways across regens:
  *
  *  - TIMESTAMP(NANOS) parquet, which Spark 4 reads as LongType under
  *    `spark.sql.legacy.parquet.nanosAsLong` — the loader must floor
  *    nanos to micros and surface a real timestamp;
  *  - native timestamp (current regen), where the loader must pass the
  *    column through untouched.
  *
  * The nanos branch is dead code against the CURRENT testdata; this
  * spec fabricates a LongType-`ts` parquet so the branch stays
  * exercised if the harness regresses to the nanos encoding.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("LongType ts (nanos-as-long encoding) floors to micros and becomes a timestamp") {
    import spark.implicits._
    val dir = TestSpark.tempDir("tables_nanos")
    // 2024-01-15T12:00:00.123456789 — nanos beyond micro precision
    // must truncate (floor), matching what nanosAsLong reads would see
    val nanos = 1705320000L * 1000000000L + 123456789L
    Seq((1L, nanos), (2L, nanos + 210L)) // …789 + 210 = …999 ns: same micro after floor
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"loader must convert LongType ts, got ${df.schema("ts").dataType}")
    val got = df.orderBy($"event_id")
      .select(unix_micros($"ts")).as[Long].collect()
    val wantMicros = 1705320000L * 1000000L + 123456L
    assert(got.toSeq == Seq(wantMicros, wantMicros),
      "nanos must floor to micros (both rows land on the same microsecond)")
  }

  test("native timestamp ts passes through untouched") {
    import spark.implicits._
    val dir = TestSpark.tempDir("tables_native")
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-15 12:00:00.123456")))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select($"ts".cast("string")).as[String].head()
      == "2024-01-15 12:00:00.123456")
  }

  test("the real harness events table loads with a timestamp ts either way") {
    // native regen ships timestamp_ntz; a nanos regen would come
    // through the conversion branch as TimestampType — both are
    // timestamps, never a raw long
    val df = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(Set[DataType](TimestampType, TimestampNTZType).contains(df.schema("ts").dataType),
      s"ts must load as a timestamp, got ${df.schema("ts").dataType}")
    assert(df.limit(1).count() == 1)
  }
}
