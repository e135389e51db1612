package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Closed-form fixtures for the robust time-series trio (q256–q258):
  * planted series whose EWMA / ACF / Theil–Sen solutions are exact.
  */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Events fabricated so day i (1-based) of 2024-04 has counts(i)
    * events of one type.
    */
  private def writeSeries(counts: Seq[Int], prefix: String): String = {
    import spark.implicits._
    val rows = for {
      (c, i) <- counts.zipWithIndex
      j <- 0 until c
    } yield (i.toLong * 1000 + j,
      java.sql.Timestamp.valueOf(f"2024-04-${i + 1}%02d 10:00:${j % 60}%02d"),
      "view")
    val tmp = TestSpark.tempDir(prefix)
    rows.toDF("event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("q256: EWMA of a constant series is the constant — zero forecast error") {
    val tmp = writeSeries(Seq.fill(20)(7), "ewma_const")
    val r = Analytics.q256_ewma_forecast(spark, tmp).collect()(0)
    assert(r.getLong(1) == 19L, s"n_days=${r.getLong(1)}")
    assert(r.getLong(2) == 0L, s"mae_milli=${r.getLong(2)}")
    assert(r.getLong(3) == 7000L, s"last_ewma_milli=${r.getLong(3)}")
  }

  test("q257: a period-2 alternating series has acf(l) = (-1)^l * (n-l)/n exactly") {
    val n = 30
    val tmp = writeSeries((1 to n).map(i => if (i % 2 == 1) 2 else 8), "acf_alt")
    val r = Analytics.q257_acf(spark, tmp).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    for (l <- 1 to 7) {
      val expect = math.round(1000.0 * (if (l % 2 == 0) 1 else -1) * (n - l) / n)
      assert(r(l.toLong) == expect, s"acf($l)=${r(l.toLong)} expected $expect")
    }
  }

  test("q258: an exact linear series recovers slope and intercept exactly") {
    // x_t = 3t + 7: every pairwise slope is 3, every residual is 7
    val tmp = writeSeries((1 to 20).map(t => 3 * t + 7), "ts_linear")
    val r = Analytics.q258_theil_sen(spark, tmp).collect()(0)
    assert(r.getLong(0) == 20L && r.getLong(1) == 190L)
    assert(r.getLong(2) == 3000L, s"slope_milli=${r.getLong(2)}")
    assert(r.getLong(3) == 7000L, s"intercept_milli=${r.getLong(3)}")
  }
}
