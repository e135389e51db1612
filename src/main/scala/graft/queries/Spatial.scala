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

  /** q280 — grid-density clustering (DBSCAN-lite): cells with ≥ 3
    * points are core; clusters are EXACT 4-connected components of
    * core cells. The point stream reduces to cell counts in one
    * aggregate — the CC machinery never touches points, only the
    * grid-bounded core-cell set — and component closure reuses
    * [[graft.llm.Dedup.connectedComponents]] (min-label propagation
    * with the driver-side label-sum convergence check: one scalar
    * read per round, rounds = component diameter — cheap here because
    * the input is the BOUNDED cell graph, exactly where a convergent
    * loop is affordable at 100 TB). Isolated core cells are their own
    * clusters. 16° cells so the sparse harness sky still yields core
    * cells; at real density the cell constant shrinks, same plan.
    */
  def q280_grid_density_clusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val DenseCell = 16000000L
    val core = graft.Caches.tracked(load(spark, dir, "events")
      .select($"user_id").distinct()
      .select(
        (h60(concat(lit("lat_"), $"user_id")) % 160000000L).as("lat_u"),
        (h60(concat(lit("lon_"), $"user_id")) % 360000000L).as("lon_u"))
      .groupBy(($"lon_u" / DenseCell).cast("long").as("cx"),
        ($"lat_u" / DenseCell).cast("long").as("cy"))
      .agg(count(lit(1)).as("n"))
      .filter($"n" >= 3)
      .withColumn("lbl", $"cx" * 1000 + $"cy"))
    // east/north adjacency once per unordered pair (a.lbl < b.lbl by
    // construction of the offsets)
    val nb = Seq((1L, 0L), (0L, 1L)).toDF("dx", "dy")
    val pairs = core.select($"cx", $"cy", $"lbl".as("doc_a"))
      .crossJoin(broadcast(nb))
      .join(core.select($"cx".as("bx"), $"cy".as("by"), $"lbl".as("doc_b")),
        $"bx" === $"cx" + $"dx" && $"by" === $"cy" + $"dy")
      .select($"doc_a", $"doc_b")
    val cc = graft.llm.Dedup.connectedComponents(pairs)
      .select($"node".as("lbl"), $"label".as("cluster"))
    val labeled = core.join(cc, Seq("lbl"), "left")
      .select($"n", coalesce($"cluster", $"lbl").as("cluster"))
    val meta = labeled.agg(count(lit(1)).as("n_core_cells"),
      sum($"n").as("n_core_points"))
    val cl = labeled.groupBy($"cluster").agg(count(lit(1)).as("c"))
    meta
      .crossJoin(broadcast(cl.agg(count(lit(1)).as("n_clusters"))))
      .crossJoin(broadcast(cl.agg(max($"c").as("largest_cluster_cells"))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q280_grid_density_clusters" -> q280_grid_density_clusters,
    "q142_geo_rings" -> q142_geo_rings,
    "q80_spatial_join" -> q80_spatial_join,
    "q114_spatial_knn" -> q114_spatial_knn)

  val oracle: Map[String, String] = Map(
    "q280_grid_density_clusters" ->
      """WITH RECURSIVE pts AS (SELECT DISTINCT user_id FROM events),
        |xy AS (SELECT user_id,
        |    CAST('0x' || substring(md5('lat_' || CAST(user_id AS VARCHAR)),
        |      1, 15) AS BIGINT) % 160000000 AS lat_u,
        |    CAST('0x' || substring(md5('lon_' || CAST(user_id AS VARCHAR)),
        |      1, 15) AS BIGINT) % 360000000 AS lon_u FROM pts),
        |cells AS (SELECT lon_u // 16000000 AS cx, lat_u // 16000000 AS cy,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM xy GROUP BY 1, 2),
        |core AS (SELECT cx, cy, n, cx * 1000 + cy AS lbl FROM cells
        |  WHERE n >= 3),
        |nb(dx, dy) AS (SELECT * FROM (VALUES (1, 0), (0, 1)) t(dx, dy)),
        |pairs AS (SELECT a.lbl AS u, b.lbl AS v FROM core a
        |  JOIN nb ON true JOIN core b ON b.cx = a.cx + nb.dx
        |    AND b.cy = a.cy + nb.dy),
        |edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
        |nodes AS (SELECT DISTINCT u FROM edges),
        |reach(node, lab) AS (
        |  SELECT u, u FROM nodes
        |  UNION
        |  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node),
        |cc AS (SELECT node AS lbl, MIN(lab) AS cluster FROM reach
        |  GROUP BY node),
        |labeled AS (SELECT core.n, COALESCE(cc.cluster, core.lbl) AS cluster
        |  FROM core LEFT JOIN cc ON core.lbl = cc.lbl),
        |cl AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS c FROM labeled
        |  GROUP BY 1)
        |SELECT
        |  CAST((SELECT COUNT(*) FROM labeled) AS BIGINT) AS n_core_cells,
        |  CAST((SELECT SUM(n) FROM labeled) AS BIGINT) AS n_core_points,
        |  CAST((SELECT COUNT(*) FROM cl) AS BIGINT) AS n_clusters,
        |  CAST((SELECT MAX(c) FROM cl) AS BIGINT) AS largest_cluster_cells""".stripMargin,
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
