package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Planted fixtures for the calibration/audit operators: IPF margin
  * fitting (q294) on an exactly-scalable table, and the Simpson's-
  * paradox audit (q297) on a constructed stratum-mix reversal.
  */
class CalibrationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ipf: doubled target margins fit to exactly 2x the seed; column margins match") {
    import spark.implicits._
    // seed (even ids): click Mon 10 / Tue 20, view Mon 30 / Tue 40;
    // target (odd ids) doubles every cell -> row factor is exactly 2,
    // column factors exactly 1: IPF is stationary at 2x seed
    val cells = Seq(
      ("click", "2024-01-01", 10), ("click", "2024-01-02", 20),
      ("view", "2024-01-01", 30), ("view", "2024-01-02", 40))
    var id = 0L
    val rows = cells.flatMap { case (t, d, n) =>
      (0 until n).flatMap { _ =>
        val seedRow = (id * 2, java.sql.Timestamp.valueOf(s"$d 10:00:00"), t)
        // two odd-id copies per seed event: the target table is 2x
        val tgt = Seq.tabulate(2)(k =>
          (id * 2 + 1 + k * 1000000L, java.sql.Timestamp.valueOf(s"$d 11:00:00"), t))
        id += 1
        seedRow +: tgt
      }
    }
    val tmp = TestSpark.tempDir("ipf")
    rows.toDF("event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Analytics.q294_ipf_margins(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    cells.foreach { case (t, d, n) =>
      val dow = if (d.endsWith("01")) 1L else 2L
      val (seedN, fitted) = out((t, dow))
      assert(seedN == n.toLong)
      assert(fitted == 2L * n * 1000000L,
        s"cell ($t,$dow): fitted=$fitted expected ${2L * n * 1000000L}")
    }
  }

  test("simpson audit: stratum-mix reversal flips the pooled sign") {
    import spark.implicits._
    // Monday: purchase wins (10.00 vs 9.00) but purchases are rare;
    // Tuesday: purchase wins (2.00 vs 1.00) but clicks are rare;
    // pooled: purchase mean ~2.08 vs click ~8.92 -> sign reverses
    def mk(d: String, t: String, n: Int, v: Double) =
      (0 until n).map(_ => (java.sql.Timestamp.valueOf(s"$d 09:00:00"), t, v))
    val rows = mk("2024-01-01", "purchase", 10, 10.0) ++
      mk("2024-01-01", "click", 1000, 9.0) ++
      mk("2024-01-02", "purchase", 1000, 2.0) ++
      mk("2024-01-02", "click", 10, 1.0)
    val tmp = TestSpark.tempDir("simpson")
    rows.toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Analytics.q297_simpson_paradox(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(5) == 100000L, "Monday diff +100 cents")
    assert(out(2L).getLong(5) == 100000L, "Tuesday diff +100 cents")
    assert(out(0L).getLong(5) < 0L, "pooled contrast reverses")
    assert(out(1L).getBoolean(6) && out(2L).getBoolean(6),
      "both strata disagree with the pooled direction")
    assert(!out(0L).getBoolean(6), "the pooled row never flags itself")
    // pooled means are the exact weighted means in milli-cents
    assert(out(0L).getLong(3) == math.round(1000.0 * 210000 / 1010))
    assert(out(0L).getLong(4) == math.round(1000.0 * 901000 / 1010))
  }
  test("covariate balance: planted click imbalance gives SMD exactly 4, balanced views 0") {
    import spark.implicits._
    // treated users (purchase share > 1/5): clicks {9,11,9,11}, views 5
    // controls: clicks {5,7,5,7}, views 5 -> SMD_clicks = 4/sqrt(1) = 4000
    def mk(uid: Long, clicks: Int, views: Int, purch: Int) =
      Seq.fill(clicks)((uid, "click", 1.0)) ++
        Seq.fill(views)((uid, "view", 1.0)) ++
        Seq.fill(purch)((uid, "purchase", 1.0))
    val rows = mk(1, 9, 5, 4) ++ mk(2, 11, 5, 5) ++ mk(3, 9, 5, 4) ++
      mk(4, 11, 5, 5) ++
      mk(10, 5, 5, 0) ++ mk(11, 7, 5, 0) ++ mk(12, 5, 5, 0) ++ mk(13, 7, 5, 0)
    val tmp = TestSpark.tempDir("covbal")
    rows.toDF("user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Analytics.q309_covariate_balance(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    val ck = out("clicks")
    assert(ck.getLong(1) == 4L && ck.getLong(2) == 4L)
    assert(ck.getLong(3) == 10000L && ck.getLong(4) == 6000L)
    assert(ck.getLong(5) == 4000L, s"SMD clicks: ${ck.getLong(5)}")
    assert(out("views").getLong(5) == 0L, "balanced covariate reports 0")
  }

  test("nn matching: caliper buckets match nearest controls, unmatched counted") {
    import spark.implicits._
    // all event values 10.00 -> y_cents = 1000*cov; bucket = cov div 8
    def mk(uid: Long, clicks: Int, purch: Int) =
      Seq.fill(clicks)((uid, "click", 10.0)) ++
        Seq.fill(purch)((uid, "purchase", 10.0))
    val rows =
      mk(1, 7, 3) ++   // treated A: cov 10 -> matches B (d=1) not C (d=2)
      mk(2, 9, 5) ++   // treated D: cov 14 -> matches C (d=2) not B (d=5)
      mk(3, 15, 5) ++  // treated E: cov 20, bucket 2 -> no control: unmatched
      mk(10, 9, 0) ++  // control B: cov 9
      mk(11, 12, 0)    // control C: cov 12
    val tmp = TestSpark.tempDir("nnmatch")
    rows.toDF("user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Analytics.q310_nn_matching(spark, tmp).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L, s"$r")
    // gaps: A-B = 1000*(10-9), D-C = 1000*(14-12) -> ATT milli = 1500000
    assert(r.getLong(2) == 1500000L, s"att = ${r.getLong(2)}")
  }
}
