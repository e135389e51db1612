package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RollingGridSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q97: bounded fan-out equals the naive per-anchor distinct count") {
    import spark.implicits._
    val got = Analytics.q97_rolling_distinct(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val du = graft.Tables.load(spark, dir, "events")
      .filter($"event_type" === "purchase")
      .select(unix_timestamp(date_trunc("day", $"ts")).as("d"), $"user_id")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = du.map(_._1).distinct.map { anchor =>
      anchor -> du.collect {
        case (d, u) if d >= anchor - 6 * 86400L && d <= anchor => u
      }.distinct.length.toLong
    }.toMap
    assert(got == naive)
  }

  test("q98: grid is dense — exactly |days| x |types| rows, zero-filled") {
    import spark.implicits._
    val rows = Analytics.q98_dense_grid(spark, dir).collect()
    val e = graft.Tables.load(spark, dir, "events")
      .select(unix_timestamp(date_trunc("day", $"ts")).as("d"), $"event_type")
    val nDays = e.select($"d").distinct().count()
    val nTypes = e.select($"event_type").distinct().count()
    assert(rows.length == nDays * nTypes)
    // total over the grid equals the raw event count (zero cells add 0)
    assert(rows.map(_.getLong(2)).sum == e.count())
  }
}
