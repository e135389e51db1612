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

  test("q268 CUSUM: a clean step shift peaks at the series end with the closed-form excursion") {
    // 10 days at 4, 10 at 8: centered n·x−S = ∓40, prefix bottoms at
    // −400 (day 10) and returns to 0, so the excursion P_t − min P
    // peaks at the LAST day with 400 ⇒ 1000·400/20² = 1000 milli.
    val tmp = writeSeries(Seq.fill(10)(4) ++ Seq.fill(10)(8), "cusum_step")
    val r = Analytics.q268_cusum(spark, tmp).collect()(0)
    assert(r.getDate(0).toString == "2024-04-20", s"alarm=${r.getDate(0)}")
    assert(r.getLong(1) == 1000L, s"cusum_milli=${r.getLong(1)}")
  }

  test("q269 Mann-Kendall: strictly increasing series gives S = C(n,2) and the exact z") {
    val n = 20
    val tmp = writeSeries((1 to n).map(_ + 2), "mk_incr")
    val r = Analytics.q269_mann_kendall(spark, tmp).collect()(0)
    val s = n * (n - 1) / 2
    assert(r.getLong(0) == s.toLong && r.getLong(1) == n.toLong)
    val z = math.round(1000.0 * (s - 1)
      / math.sqrt(n.toDouble * (n - 1) * (2 * n + 5) / 18.0))
    assert(r.getLong(2) == z, s"z_milli=${r.getLong(2)} expected $z")
  }

  test("q270 seasonal: a pure weekly pattern recovers exact dow effects") {
    // 2024-04-01 is a Monday; Sundays (dow 7) run at 170, others 100.
    // Any centered 7-day window sums to 770, so 7x−s7 = −70 (dow 1–6)
    // or +420 (dow 7) ⇒ effects −10 and +60 exactly.
    val counts = (0 until 28).map(i => if (i % 7 == 6) 170 else 100)
    val tmp = writeSeries(counts, "seasonal_wk")
    val r = Analytics.q270_seasonal_dow(spark, tmp).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    for (d <- 1L to 6L) assert(r(d) == -10000L, s"dow $d -> ${r(d)}")
    assert(r(7L) == 60000L, s"dow 7 -> ${r(7L)}")
  }

  test("q275 JSON extract: corrupt payloads count as bad, never fail, and stay out of the stats") {
    import spark.implicits._
    val rows = Seq(
      (1L, "click", """{"k": 5}"""),
      (2L, "click", """{"k": 11}"""),
      (3L, "click", """not json at all"""),
      (4L, "click", """{"other": 1}"""))
    val tmp = TestSpark.tempDir("json_ext")
    rows.toDF("event_id", "event_type", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = SqlSurface.q275_json_extract(spark, tmp).collect()(0)
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 5L && r.getLong(4) == 11L && r.getLong(5) == 16L)
  }

  test("q276 cohort LTV: hand-built two-month cohort accumulates exactly") {
    import spark.implicits._
    // cohort 2024-01: customers 1, 2. Month 0 revenue 10+20 = 30,
    // month 1 adds 40 ⇒ LTV 1500 then 3500 cents per customer.
    val rows = Seq(
      (1L, java.sql.Date.valueOf("2024-01-05"), 10.0),
      (2L, java.sql.Date.valueOf("2024-01-20"), 20.0),
      (1L, java.sql.Date.valueOf("2024-02-10"), 40.0))
    val tmp = TestSpark.tempDir("ltv_fix")
    rows.toDF("o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val r = Analytics.q276_cohort_ltv(spark, tmp).collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq((0L, 2L, 1500L), (1L, 2L, 3500L)), r.mkString(", "))
  }

  test("q265 DiD: planted parallel-trends violation recovers the exact effect") {
    import spark.implicits._
    // treated (purchase): 100¢ before → 200¢ after (+100);
    // control (view): 50¢ → 70¢ (+20) ⇒ DiD = 80¢ = 0.8 currency
    // units = 800 milli-units (did_milli is milli-UNITS: cents × 10)
    def mk(et: String, day: Int, cents: Long, n: Int, base: Long) =
      (0 until n).map(i => (base + day * 100 + i,
        java.sql.Timestamp.valueOf(f"2024-01-$day%02d 09:00:00"),
        et, cents / 100.0))
    val rows = mk("purchase", 10, 100, 5, 10000) ++ mk("purchase", 20, 200, 5, 20000) ++
      mk("view", 10, 50, 4, 30000) ++ mk("view", 20, 70, 4, 40000)
    val tmp = TestSpark.tempDir("did_fix")
    rows.toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val row = Analytics.q265_diff_in_diff(spark, tmp).collect()(0)
    assert(row.getLong(0) == 18L)
    assert(row.getLong(1) == 100L && row.getLong(2) == 200L)
    assert(row.getLong(3) == 50L && row.getLong(4) == 70L)
    assert(row.getLong(5) == 800L, s"did_milli=${row.getLong(5)}")
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
