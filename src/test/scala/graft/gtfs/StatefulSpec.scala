package graft.gtfs

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** flatMapGroupsWithState vehicle tracking and watermarked windowed
  * aggregation — the custom-state streaming surface.
  */
class StatefulSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("vehicle transitions survive across micro-batches via group state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[VehicleStep]
    val q = RtStateful.trackTransitions(input.toDS())
      .writeStream.format("memory").queryName("transitions")
      .outputMode("append").start()

    // batch 1: veh-1 sits at S1 then reaches S2; veh-2 at S1
    input.addData(
      VehicleStep("veh-1", "S1", 100L), VehicleStep("veh-1", "S2", 200L),
      VehicleStep("veh-2", "S1", 150L))
    q.processAllAvailable()
    // batch 2: veh-1 reaches S3 (state from batch 1 must carry over);
    // veh-2 repeats S1 (no transition) and an out-of-order stale event drops
    input.addData(
      VehicleStep("veh-1", "S3", 300L),
      VehicleStep("veh-2", "S1", 260L), VehicleStep("veh-2", "S0", 50L))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("transitions").as[StopTransition].collect()
      .map(t => (t.vehicle_id, t.from_stop, t.to_stop, t.ts_epoch)).sorted
    assert(out.toSeq == Seq(
      ("veh-1", "S1", "S2", 200L),
      ("veh-1", "S2", "S3", 300L)))
  }

  test("watermarked 15-min windows finalize in append mode") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val obs = input.toDF().toDF("obs_ts", "delay_s")
    val q = RtStateful.delayPerWindow(obs)
      .writeStream.format("memory").queryName("delay_windows")
      .outputMode("append").start()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData((ts("2025-09-03 09:01:00"), 120L), (ts("2025-09-03 09:10:00"), 60L))
    q.processAllAvailable()
    // advance the watermark far past the 09:00 window (+10 min lateness)
    input.addData((ts("2025-09-03 10:00:00"), 30L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("delay_windows").collect()
      .map(r => (r.getTimestamp(0).toString, r.getDouble(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("2025-09-03 09:00:00.0", 90.0, 2L)))
  }
}
