package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q280 independent-replay spec: rebuild the md5 grid driver-side for
  * a fixture id universe, run REAL union-find connected components
  * over the core cells, and require the engine's bounded 4-round
  * propagation to have converged to exactly that clustering.
  */
class GridDensitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("q280: engine clustering converges to the exact union-find components") {
    import spark.implicits._
    val ids = (1L to 500L)
    val rows = ids.map(u => (u * 7, u, "view")) // event_id, user_id, type
    val tmp = TestSpark.tempDir("grid_density")
    rows.toDF("event_id", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    // driver-side replay
    val cells = ids.groupBy { u =>
      val lat = h60(s"lat_$u") % 160000000L
      val lon = h60(s"lon_$u") % 360000000L
      (lon / 16000000L, lat / 16000000L)
    }.view.mapValues(_.size).toMap
    val core = cells.filter(_._2 >= 3).keys.toSeq
    val parent = scala.collection.mutable.Map(core.map(c => c -> c): _*)
    def find(c: (Long, Long)): (Long, Long) =
      if (parent(c) == c) c else { val r = find(parent(c)); parent(c) = r; r }
    for {
      a <- core
      d <- Seq((1L, 0L), (0L, 1L))
      b = (a._1 + d._1, a._2 + d._2) if parent.contains(b)
    } parent(find(a)) = find(b)
    val exact = core.map(find).distinct.size
    val nPts = cells.filter(_._2 >= 3).values.sum

    val r = Spatial.q280_grid_density_clusters(spark, tmp).collect()(0)
    assert(r.getLong(0) == core.size.toLong, s"core cells ${r.getLong(0)}")
    assert(r.getLong(1) == nPts.toLong)
    assert(r.getLong(2) == exact.toLong,
      s"clusters=${r.getLong(2)} union-find=$exact")
  }
}
