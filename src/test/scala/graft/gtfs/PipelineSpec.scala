package graft.gtfs

import java.time.{LocalDate, LocalDateTime, ZoneId}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** End-to-end drive of the reference pipeline (E1+E2+E3 → KPI layer):
  * fixture CSVs + protobuf snapshots → bronze → incremental silver →
  * all 10 KPIs, asserted against hand-computed expecteds (the fixture
  * is 5 observations — every delay is checkable by hand).
  * Also the P5 invariant: one big batch ≡ N incremental batches.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val serviceDate = LocalDate.of(2025, 9, 3)
  private val dayStart = serviceDate.atStartOfDay(ZoneId.of("Europe/Paris")).toEpochSecond
  private val feedTs = dayStart + 34000
  private val ts1 = LocalDateTime.of(2025, 9, 3, 4, 0, 0) // static load stamp
  private val ts2 = LocalDateTime.of(2025, 9, 3, 9, 30, 0) // RT load stamp

  /** Build a fully-loaded warehouse; `refreshBetween` = refresh silver
    * after the static load too (the incremental path).
    */
  private def buildWarehouse(refreshBetween: Boolean): (String, Map[String, Long], Map[String, Long]) = {
    val root = TestSpark.tempDir("gtfs_pipeline")
    val src = s"$root/static_src"
    val tuDir = s"$root/rt/tu"
    val vpDir = s"$root/rt/vp"
    val wh = s"$root/warehouse"
    Fixtures.writeStaticCsvs(src)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tuDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(vpDir))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$tuDir/trip_updates_20250903_0932.pb"),
      Fixtures.tripUpdatesMatchingStatic(dayStart, feedTs))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$vpDir/vehicle_positions_20250903_0930.pb"),
      Fixtures.vehiclePositionsSnapshot(feedTs))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$vpDir/vehicle_positions_20250903_0932.pb"),
      Fixtures.vehiclePositionsSnapshot(feedTs + 120))

    BronzeIngest.loadStatic(spark, src, wh, ts1)
    val firstCounts =
      if (refreshBetween) SilverTransforms.refreshAll(spark, wh) else Map.empty[String, Long]
    BronzeIngest.loadRt(spark, tuDir, vpDir, wh, ts2)
    val secondCounts = SilverTransforms.refreshAll(spark, wh)
    (wh, firstCounts, secondCounts)
  }

  private lazy val (wh, firstCounts, secondCounts) = buildWarehouse(refreshBetween = true)

  private def silver(name: String) = SilverTransforms.readSilver(spark, wh, name)

  private lazy val spine = Kpi.delaySpine(
    silver("trip_stop_times_silver"), silver("stop_times_static_silver"), serviceDate)

  test("incremental refresh appends only fresh rows; re-refresh appends zero") {
    // static pass: 3 routes, 4 trips, 4 stops, 6 stop_times (malformed row dropped)
    assert(firstCounts("routes_static_silver") == 3)
    assert(firstCounts("trips_static_silver") == 4)
    assert(firstCounts("stops_static_silver") == 4)
    assert(firstCounts("stop_times_static_silver") == 6)
    assert(firstCounts("trip_updates_silver") == 0)
    // RT pass: static already at watermark → 0; RT rows only
    assert(secondCounts("routes_static_silver") == 0)
    assert(secondCounts("stop_times_static_silver") == 0)
    assert(secondCounts("trip_updates_silver") == 3)     // first-wins dedup of the 4 headers
    assert(secondCounts("trip_stop_times_silver") == 5)
    assert(secondCounts("vehicle_positions_silver") == 6) // 2 snapshots × 3 vehicles
    // third refresh: nothing new anywhere
    val third = SilverTransforms.refreshAll(spark, wh)
    assert(third.values.forall(_ == 0L), s"expected all-zero third refresh, got $third")
  }

  test("silver values: quoted CSV comma, NULL_IF, first-wins, sentinel") {
    val routes = silver("routes_static_silver").collect().map(r => r.getString(0) -> r).toMap
    assert(routes("R1").getString(2) == "Port, Gare et Centre") // quoted comma survives
    val tu = silver("trip_updates_silver").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(tu(Fixtures.LongTrip) == (("R1", "0")))  // duplicate header lost (R9 was second)
    assert(tu("T3")._2 == "in experimentation")      // absent direction_id → sentinel
    val st = silver("stop_times_static_silver")
      .filter(col("trip_id") === "T2" && col("stop_sequence") === 1).collect().head
    assert(st.getString(1) == "10:05:00")            // COALESCE took departure
  }

  test("delay spine: the 5 hand-computed delays, >24h time anchored correctly") {
    val delays = spine.select("trip_id", "stop_sequence", "delay_s").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(delays == Map(
      (Fixtures.LongTrip, 1L) -> 120L,
      (Fixtures.LongTrip, 2L) -> 180L,
      ("T2", 1L) -> 60L,
      ("T2", 2L) -> -30L,
      ("T3", 1L) -> 300L)) // 25:07:00 = 90420 s past Paris midnight
  }

  test("KPI: punctuality, distribution, top routes, top stops") {
    val p = Kpi.punctualityRate(spine, 300L).collect().head
    assert(p.getDouble(0) == 1.0 && p.getLong(1) == 5L)

    val dist = Kpi.delayDistribution(spine).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == Map(-1L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L))

    val topRoutes = Kpi.topDelayedRoutes(spine,
      silver("trips_static_silver"), silver("routes_static_silver")).collect()
    assert(topRoutes.map(_.getString(0)).toSeq == Seq("R2", "R1"))
    assert(topRoutes.head.getDouble(1) == 300.0)
    assert(topRoutes(1).getDouble(1) == 82.5)
    assert(topRoutes(1).getString(3) == "Port, Gare et Centre")

    val topStops = Kpi.topProblemStops(spine, silver("stops_static_silver")).collect()
    assert(topStops.map(_.getString(0)).toSeq == Seq("S2", "S1", "S3"))
    assert(topStops.head.getDouble(1) == 240.0)
  }

  test("KPI: travel time real vs theoretical per trip") {
    val tt = Kpi.travelTimeRealVsTheoretical(spine).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(tt(Fixtures.LongTrip) == ((720L, 660L, 60L)))
    assert(tt("T2") == ((510L, 600L, -90L)))
    assert(tt("T3") == ((0L, 0L, 0L)))
  }

  test("KPI: latest vehicle positions picks the newest snapshot per vehicle") {
    val latest = Kpi.latestVehiclePositions(silver("vehicle_positions_silver")).collect()
      .map(r => r.getString(2) -> r.getLong(7)).toMap
    assert(latest == Map(
      "veh-1" -> (feedTs + 120), "veh-2" -> (feedTs + 130), "veh-3" -> (feedTs + 140)))
  }

  test("KPI: stops service state — unobserved station reads 'no data'") {
    val states = Kpi.stopsServiceState(spine, silver("stops_static_silver")).collect()
      .map(r => r.getString(0) -> r.getAs[String]("service_state")).toMap
    assert(states == Map(
      "S1" -> "active", "S2" -> "active", "S3" -> "active", "STATION1" -> "no data"))
  }

  test("KPI: time-bucketed aggs cover all 5 observations") {
    assert(Kpi.avgDelayOverTime(spine).agg(sum("n_obs")).collect().head.getLong(0) == 5L)
    assert(Kpi.delayHeatmap(spine).agg(sum("n_obs")).collect().head.getLong(0) == 5L)
    assert(Kpi.delayEvolutionPerStop(spine).agg(sum("n_obs")).collect().head.getLong(0) == 5L)
  }

  test("D1/D2: warehouse registers as SQL-addressable catalog tables with pruning") {
    Warehouse.register(spark, wh)
    assert(spark.sql("SELECT count(*) FROM bronze.routes_static").collect().head.getLong(0) == 3)
    assert(spark.sql("SELECT count(*) FROM silver.trip_updates_silver").collect().head.getLong(0) == 3)
    val pruned = spark.sql(
      "SELECT * FROM bronze.routes_static WHERE insert_day = DATE'2025-09-03'")
    assert(pruned.count() == 3)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(insert_day"),
      "insert_day predicate must prune partitions")
    Warehouse.register(spark, wh) // idempotent re-register
    assert(spark.sql("SELECT count(*) FROM bronze.routes_static").collect().head.getLong(0) == 3)
  }

  test("P5 invariant: incremental (2 refreshes) ≡ one big batch") {
    val (whB, _, _) = buildWarehouse(refreshBetween = false)
    for (name <- SilverTransforms.transforms.keys) {
      val a = silver(name).collect().map(_.toString).sorted
      val b = SilverTransforms.readSilver(spark, whB, name).collect().map(_.toString).sorted
      assert(a.sameElements(b), s"$name: incremental ≠ batch")
    }
  }
}
