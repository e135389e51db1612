package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Spatial join via grid-cell bucketing — the "find pairs within
  * distance R" operator (station proximity, stop clustering,
  * geo-dedup) done the way it scales: bucket every point into an
  * R-sized grid cell, explode ONE side to its 3×3 neighbor cells, and
  * equi-join on the cell id — every pair within R must land in the
  * same bucket (a point's R-ball fits in its neighbor set), so the
  * join output is ~|near pairs| + cell-collision noise, never the
  * |points|² cross product. Exact distance check on candidates only.
  *
  * Coordinates are derived md5-deterministically from user_id (the
  * harness tables carry no geo columns), in INTEGER micro-degrees,
  * and the distance test is the integer planar dx² + dy² ≤ R² — both
  * engines compute the same pairs with zero float boundary risk (the
  * haversine refinement at real scale changes only the verify
  * expression, not the plan).
  */
object Spatial {

  /** 60-bit engine-independent hash (see graft-verify-loop rules). */
  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  final val CellMicroDeg = 8000000L // 8° grid = the search radius

  def q80_spatial_join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pts = load(spark, dir, "events")
      .select($"user_id").distinct()
      .select($"user_id",
        (h60(concat(lit("lat_"), $"user_id")) % 160000000L).as("lat_u"),
        (h60(concat(lit("lon_"), $"user_id")) % 360000000L).as("lon_u"))
      .withColumn("cx", floor($"lon_u" / CellMicroDeg))
      .withColumn("cy", floor($"lat_u" / CellMicroDeg))

    // probe side visits its 3×3 neighborhood; build side stays put —
    // the classic asymmetric fan-out keeping the join an equi-join
    val probe = pts
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select($"user_id".as("ua"), $"lat_u".as("la"), $"lon_u".as("lo_a"),
        ($"cx" + $"dx").as("cx"), ($"cy" + $"dy").as("cy"))
    val build = pts.select($"user_id".as("ub"), $"lat_u".as("lb"),
      $"lon_u".as("lo_b"), $"cx", $"cy")

    val r2 = CellMicroDeg * CellMicroDeg
    probe.join(build, Seq("cx", "cy"))
      .filter($"ua" < $"ub")
      .withColumn("d2",
        ($"la" - $"lb") * ($"la" - $"lb") + ($"lo_a" - $"lo_b") * ($"lo_a" - $"lo_b"))
      .filter($"d2" <= r2)
      // a pair straddling a cell border is found from both neighbor
      // probes — dedup on the pair key
      .select($"ua", $"ub", $"d2").distinct()
      .orderBy($"ua", $"ub")
  }

  /** q114 — spatial kNN (k = 3 within the grid radius): same 3×3
    * grid candidate generation as q80 — the R-ball guarantee means
    * every neighbor within R is a candidate — then a per-point
    * ranking that RankLimitRewrite plans as bounded TopK heaps
    * (k rows of state per point, never a per-point sort). Neighbors
    * beyond R are out of scope by contract: at open scale kNN
    * without a radius bound is a different (multi-ring expansion)
    * operator.
    */
  def q114_spatial_knn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pts = load(spark, dir, "events")
      .select($"user_id").distinct()
      .select($"user_id",
        (h60(concat(lit("lat_"), $"user_id")) % 160000000L).as("lat_u"),
        (h60(concat(lit("lon_"), $"user_id")) % 360000000L).as("lon_u"))
      .withColumn("cx", floor($"lon_u" / CellMicroDeg))
      .withColumn("cy", floor($"lat_u" / CellMicroDeg))
    val probe = pts
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select($"user_id".as("ua"), $"lat_u".as("la"), $"lon_u".as("lo_a"),
        ($"cx" + $"dx").as("cx"), ($"cy" + $"dy").as("cy"))
    val build = pts.select($"user_id".as("ub"), $"lat_u".as("lb"),
      $"lon_u".as("lo_b"), $"cx", $"cy")
    val r2 = CellMicroDeg * CellMicroDeg
    val cands = probe.join(build, Seq("cx", "cy"))
      .filter($"ua" =!= $"ub")
      .withColumn("d2",
        ($"la" - $"lb") * ($"la" - $"lb") + ($"lo_a" - $"lo_b") * ($"lo_a" - $"lo_b"))
      .filter($"d2" <= r2)
      .select($"ua", $"ub", $"d2").distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"ua").orderBy($"d2", $"ub")
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"ua", $"rank", $"ub", $"d2")
      .orderBy($"ua", $"rank")
  }

  /** q142 — great-circle distance rings: users bucketed by haversine
    * distance from a reference point (Nice city centre — the
    * reference network's home), 500 km rings. The point of the
    * operator: real geo distance needs NO custom expression — the
    * haversine composes entirely from built-in codegen'd trig
    * (`radians/sin/cos/asin/sqrt`), one fixed expression tree per
    * row, zero shuffle before the bounded ring aggregate. Both
    * engines evaluate the identical IEEE-double tree; ring boundaries
    * at 500 km make a last-ulp flip a measure-zero risk.
    */
  def q142_geo_rings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pts = load(spark, dir, "events")
      .select($"user_id").distinct()
      .select($"user_id",
        ((h60(concat(lit("lat_"), $"user_id")) % 160000000L) / 1e6 - 80.0).as("lat"),
        ((h60(concat(lit("lon_"), $"user_id")) % 360000000L) / 1e6 - 180.0).as("lon"))
    val (refLat, refLon) = (43.7, 7.27)
    val dLat = radians($"lat" - lit(refLat)) / 2
    val dLon = radians($"lon" - lit(refLon)) / 2
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lit(refLat))) * cos(radians($"lat")) * sin(dLon) * sin(dLon)
    val distM = lit(2 * 6371000.0) * asin(sqrt(a))
    pts.withColumn("ring", floor(distM / 500000.0).cast("long"))
      .groupBy($"ring").agg(count(lit(1)).as("n_users"))
      .orderBy($"ring")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q142_geo_rings" -> q142_geo_rings,
    "q80_spatial_join" -> q80_spatial_join,
    "q114_spatial_knn" -> q114_spatial_knn)

  val oracle: Map[String, String] = Map(
    "q142_geo_rings" ->
      """WITH p AS (SELECT DISTINCT user_id FROM events),
        |pts AS (SELECT user_id,
        |    CAST('0x' || substring(md5('lat_' || user_id), 1, 15) AS BIGINT)
        |      % 160000000 / 1e6 - 80.0 AS lat,
        |    CAST('0x' || substring(md5('lon_' || user_id), 1, 15) AS BIGINT)
        |      % 360000000 / 1e6 - 180.0 AS lon
        |  FROM p),
        |d AS (SELECT user_id,
        |    2 * 6371000.0 * asin(sqrt(
        |      sin(radians(lat - 43.7) / 2) * sin(radians(lat - 43.7) / 2)
        |      + cos(radians(43.7)) * cos(radians(lat))
        |        * sin(radians(lon - 7.27) / 2) * sin(radians(lon - 7.27) / 2)))
        |      AS dist_m
        |  FROM pts)
        |SELECT CAST(FLOOR(dist_m / 500000.0) AS BIGINT) AS ring,
        |  COUNT(*) AS n_users
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q114_spatial_knn" ->
      s"""WITH p AS (SELECT DISTINCT user_id FROM events),
        |pts AS (SELECT user_id,
        |    CAST('0x' || substring(md5('lat_' || user_id), 1, 15) AS BIGINT)
        |      % 160000000 AS lat_u,
        |    CAST('0x' || substring(md5('lon_' || user_id), 1, 15) AS BIGINT)
        |      % 360000000 AS lon_u
        |  FROM p),
        |cand AS (SELECT a.user_id AS ua, b.user_id AS ub,
        |    CAST((a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
        |       + (a.lon_u - b.lon_u) * (a.lon_u - b.lon_u) AS BIGINT) AS d2
        |  FROM pts a JOIN pts b ON a.user_id <> b.user_id
        |  WHERE (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
        |      + (a.lon_u - b.lon_u) * (a.lon_u - b.lon_u)
        |    <= ${CellMicroDeg * CellMicroDeg}),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY ua ORDER BY d2, ub) AS rank
        |      FROM cand)
        |SELECT ua, CAST(rank AS BIGINT) AS rank, ub, d2
        |FROM r WHERE rank <= 3 ORDER BY ua, rank""".stripMargin,
    "q80_spatial_join" ->
      s"""WITH p AS (SELECT DISTINCT user_id FROM events),
        |pts AS (SELECT user_id,
        |    CAST('0x' || substring(md5('lat_' || user_id), 1, 15) AS BIGINT)
        |      % 160000000 AS lat_u,
        |    CAST('0x' || substring(md5('lon_' || user_id), 1, 15) AS BIGINT)
        |      % 360000000 AS lon_u
        |  FROM p)
        |SELECT a.user_id AS ua, b.user_id AS ub,
        |  CAST((a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
        |     + (a.lon_u - b.lon_u) * (a.lon_u - b.lon_u) AS BIGINT) AS d2
        |FROM pts a JOIN pts b ON a.user_id < b.user_id
        |WHERE (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
        |    + (a.lon_u - b.lon_u) * (a.lon_u - b.lon_u)
        |  <= ${CellMicroDeg * CellMicroDeg}
        |ORDER BY ua, ub""".stripMargin)
}
