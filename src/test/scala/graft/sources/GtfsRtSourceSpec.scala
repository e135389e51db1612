package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.gtfs.{Fixtures, RtDecode}

/** The gtfsrt DataSourceV2 connector must agree with the established
  * binaryFile+decode path (RtDecode.decodeDir) on the same snapshot
  * files, prune columns INTO the scan, one-partition-per-file, and
  * swallow corrupt snapshots as zero rows.
  */
class GtfsRtSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeSnapshots(): (String, String) = {
    val tu = TestSpark.tempDir("dsv2_tu")
    val vp = TestSpark.tempDir("dsv2_vp")
    Fixtures.writeRtSnapshots(tu, vp)
    (tu, vp)
  }

  test("vehicle positions via the connector equal the decodeDir path") {
    val (_, vp) = writeSnapshots()
    val viaSource = spark.read.format("gtfsrt")
      .option("kind", "vehicle_positions").load(vp)
      .collect().map(_.toSeq).toSet
    val (_, _, viaDecode) = RtDecode.decodeDir(spark, vp)
    assert(viaSource == viaDecode.collect().map(_.toSeq).toSet)
    assert(viaSource.nonEmpty)
  }

  test("trip updates + stop times kinds decode through the connector") {
    val (tu, _) = writeSnapshots()
    val headers = spark.read.format("gtfsrt")
      .option("kind", "trip_updates").load(tu)
    val stus = spark.read.format("gtfsrt")
      .option("kind", "stop_time_updates").load(tu)
    val (expHeaders, expStu, _) = RtDecode.decodeDir(spark, tu)
    assert(headers.collect().map(_.toSeq).toSet ==
      expHeaders.collect().map(_.toSeq).toSet)
    assert(stus.collect().map(_.toSeq).toSet ==
      expStu.collect().map(_.toSeq).toSet)
  }

  test("column pruning reaches the scan (visible in the scan description)") {
    import spark.implicits._
    val (_, vp) = writeSnapshots()
    val q = spark.read.format("gtfsrt")
      .option("kind", "vehicle_positions").load(vp)
      .select($"trip_id", $"latitude")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("pruned=[trip_id,latitude]"), plan.take(800))
    assert(q.collect().forall(_.length == 2))
  }

  test("one input partition per snapshot file; corrupt file yields zero rows") {
    val (_, vp) = writeSnapshots()
    // add a second (corrupt) snapshot
    java.nio.file.Files.write(
      java.nio.file.Paths.get(vp, "vehicle_positions_garbage.pb"),
      Array[Byte](1, 2, 3, 4, 5))
    val df = spark.read.format("gtfsrt")
      .option("kind", "vehicle_positions").load(vp)
    assert(df.rdd.getNumPartitions == 2)
    val (_, _, clean) = RtDecode.decodeDir(spark, vp)
    assert(df.count() == clean.count()) // decodeDir also skips corrupt
  }
}
