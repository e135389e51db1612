package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The foreachBatch upsert sink: per-key latest-wins across batches
  * (by EVENT time, so late arrivals can't regress a key), exactly-once
  * under source replay, idempotent epoch commits, version pruning.
  */
class UpsertSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(h: Int, min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$min%02d:00")

  private def eventsDf(rows: Seq[(Long, Timestamp, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "value")
      .withColumn("event_type", lit("purchase"))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def land(rows: Seq[(Long, Timestamp, Long, Double)],
                   landing: String, name: String): Unit = {
    val tmp = TestSpark.tempDir(s"upsert_stage_$name")
    eventsDf(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(landing, s"$name.parquet"))
  }

  private def snap(table: String): Map[Long, (Long, Long)] =
    UpsertSink.snapshot(spark, table).get
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap

  test("latest-wins upsert across batches; late event-time rows never regress a key") {
    val landing = TestSpark.tempDir("upsert_landing")
    val table = TestSpark.tempDir("upsert_table")
    val ckpt = TestSpark.tempDir("upsert_ckpt")

    // batch 1: user 1 twice (latest 10:30 wins), user 2 once
    land(Seq(
      (1L, ts(10, 0), 1L, 1.0), (2L, ts(10, 30), 1L, 2.0),
      (3L, ts(10, 10), 2L, 3.0)), landing, "f1")
    UpsertSink.start(spark, landing, table, ckpt).awaitTermination()
    assert(snap(table) == Map(1L -> (2L, 200L), 2L -> (3L, 300L)))

    // batch 2: user 2 updated, user 3 inserted, user 1 gets a LATE
    // event (event-time 10:05 < the stored 10:30) — must not regress
    land(Seq(
      (4L, ts(11, 0), 2L, 4.0), (5L, ts(11, 5), 3L, 5.0),
      (6L, ts(10, 5), 1L, 9.0)), landing, "f2")
    UpsertSink.start(spark, landing, table, ckpt).awaitTermination()
    assert(snap(table) == Map(
      1L -> (2L, 200L), // late arrival lost to the newer stored event
      2L -> (4L, 400L), // updated
      3L -> (5L, 500L))) // inserted

    // no new files => no new version, snapshot unchanged (exactly-once)
    val before = snap(table)
    UpsertSink.start(spark, landing, table, ckpt).awaitTermination()
    assert(snap(table) == before)
  }

  test("epoch replay is idempotent and old versions are pruned") {
    import spark.implicits._
    val table = TestSpark.tempDir("upsert_replay")
    val b1 = eventsDf(Seq((1L, ts(10, 0), 1L, 1.0)))
    val b2 = eventsDf(Seq((2L, ts(11, 0), 1L, 2.0), (3L, ts(11, 0), 2L, 3.0)))
    UpsertSink.commitEpoch(spark, table, 0L, b1, retainVersions = 2)
    UpsertSink.commitEpoch(spark, table, 1L, b2, retainVersions = 2)
    val after = snap(table)
    // sink-side replay of epoch 1 (crash before checkpoint commit):
    // same parent (v=0), same result
    UpsertSink.commitEpoch(spark, table, 1L, b2, retainVersions = 2)
    assert(snap(table) == after)
    assert(after == Map(1L -> (2L, 200L), 2L -> (3L, 300L)))

    // a third epoch prunes v=0 (retain 2 newest)
    UpsertSink.commitEpoch(spark, table, 2L,
      eventsDf(Seq((4L, ts(12, 0), 3L, 4.0))), retainVersions = 2)
    val vs = new java.io.File(table).listFiles().map(_.getName).filter(_.startsWith("v=")).sorted
    assert(vs.toSeq == Seq("v=1", "v=2"))
  }

  test("snapshotAsOf time-travels to the newest version <= requested; pruned history is None") {
    val table = TestSpark.tempDir("upsert_asof")
    UpsertSink.commitEpoch(spark, table, 0L,
      eventsDf(Seq((1L, ts(10, 0), 1L, 1.0))), retainVersions = 10)
    UpsertSink.commitEpoch(spark, table, 2L,
      eventsDf(Seq((2L, ts(11, 0), 1L, 2.0))), retainVersions = 10)
    def valAt(v: Long): Option[Long] =
      UpsertSink.snapshotAsOf(spark, table, v)
        .map(_.collect().map(r => r.getLong(3)).max)
    assert(valAt(0L) == Some(100L))            // exact version
    assert(valAt(1L) == Some(100L))            // gap -> newest <= requested
    assert(valAt(5L) == Some(200L))            // future -> latest
    assert(UpsertSink.snapshotAsOf(spark, table, -1L).isEmpty)
    // pruning drops v=0: as-of 0 must be None, not silently v=2
    UpsertSink.commitEpoch(spark, table, 3L,
      eventsDf(Seq((3L, ts(12, 0), 2L, 3.0))), retainVersions = 2)
    assert(UpsertSink.snapshotAsOf(spark, table, 0L).isEmpty)
  }

  test("changes() derives the CDF between versions; no-op keys and stale updates excluded") {
    val table = TestSpark.tempDir("upsert_cdf")
    // v0: users 1, 2
    UpsertSink.commitEpoch(spark, table, 0L,
      eventsDf(Seq((1L, ts(10, 0), 1L, 1.0), (2L, ts(10, 0), 2L, 2.0))),
      retainVersions = 10)
    // v1: user 2 updated, user 3 inserted, user 1 gets only a STALE
    // event (event-time older than stored) — a no-op in the snapshot,
    // so it must NOT surface in the change feed
    UpsertSink.commitEpoch(spark, table, 1L,
      eventsDf(Seq((3L, ts(11, 0), 2L, 4.0), (4L, ts(11, 0), 3L, 5.0),
        (5L, ts(9, 0), 1L, 9.0))), retainVersions = 10)

    val cdf = UpsertSink.changes(spark, table, 0L, 1L).get
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(7)) -1L else r.getLong(7))).toSet
    assert(cdf == Set(
      (2L, "update", 200L, 400L),
      (3L, "insert", -1L, 500L)), cdf)

    // identical endpoints -> empty feed; same-version gap semantics
    // as snapshotAsOf (from=to resolves both sides to one snapshot)
    assert(UpsertSink.changes(spark, table, 1L, 1L).get.isEmpty)
    // latest-wins never deletes: no delete op over any retained pair
    assert(!UpsertSink.changes(spark, table, 0L, 1L).get
      .collect().exists(_.getString(1) == "delete"))
    // pruned endpoint -> None, never a silently-wrong diff
    UpsertSink.commitEpoch(spark, table, 2L,
      eventsDf(Seq((6L, ts(12, 0), 4L, 6.0))), retainVersions = 2)
    assert(UpsertSink.changes(spark, table, 0L, 2L).isEmpty)
  }
}
