package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Conservation properties of the event-attribution queries: q153
  * must credit every purchase exactly once (no channel double-counts,
  * no dropped mass), and q154's island arithmetic must agree with a
  * per-user linear scan.
  */
class AttributionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("first-touch attribution credits every purchase exactly once") {
    import spark.implicits._
    val rows = Analytics.q153_first_touch(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val purchases = graft.Tables.load(spark, dir, "events")
      .filter($"event_type" === "purchase")
      .agg(count(lit(1)).as("n"),
        sum(graft.Tables.cents($"value")).as("c"))
      .collect().head
    assert(rows.map(_._2).sum == purchases.getLong(0),
      "every purchase attributed exactly once")
    assert(rows.map(_._3).sum == purchases.getLong(1),
      "attributed cents conserve total purchase value")
  }

  test("streaks match a per-user linear recompute") {
    import spark.implicits._
    val days = graft.Tables.load(spark, dir, "events")
      .select($"user_id",
        (unix_timestamp(date_trunc("day", $"ts")) / 86400L).cast("long").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = days.groupBy(_._1).map { case (u, ds) =>
      val sorted = ds.map(_._2).sorted
      var best = 1L; var run = 1L
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          run = if (b == a + 1) run + 1 else 1
          best = math.max(best, run)
        case _ =>
      }
      (u, sorted.length.toLong, if (sorted.length == 1) 1L else best)
    }.toSeq.sorted
    val got = Analytics.q154_streaks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got == expected)
  }

  test("linear attribution: credit conserves purchase value within the flooring bound") {
    import spark.implicits._
    val rows = Analytics.q162_linear_attribution(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("click", "direct", "error", "signup", "view"))
    val purchases = graft.Tables.load(spark, dir, "events")
      .filter($"event_type" === "purchase")
      .agg(sum(graft.Tables.cents($"value")).as("c"), count(lit(1)).as("n"))
      .collect().head
    val total = purchases.getLong(0) * 1000000L
    val nP = purchases.getLong(1)
    val credited = rows.map(_._2).sum
    // 4 channel floors per purchase each lose < 1 micro-cent
    assert(credited <= total && total - credited <= 4 * nP,
      s"credited $credited vs total $total (n=$nP)")
  }

  test("decayed engagement: decay never exceeds raw and matches a driver recompute") {
    import spark.implicits._
    val ev = graft.Tables.load(spark, dir, "events")
      .select($"event_type", unix_timestamp($"ts").as("t"),
        graft.Tables.cents($"value").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val tMax = ev.map(_._2).max
    val expected = ev.groupBy(_._1).map { case (et, rows) =>
      val dec = rows.map { case (_, t, v) =>
        v / (1L << math.min((tMax - t) / 604800L, 40L))
      }.sum
      (et, rows.size.toLong, rows.map(_._3).sum, dec)
    }.toSeq.sortBy(_._1)
    val got = Analytics.q163_decayed_engagement(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    got.foreach(r => assert(r._4 <= r._3, s"${r._1}: decayed exceeds raw"))
  }

  test("user paths: top-20 matches a driver-side recompute of first-3 sequences") {
    import spark.implicits._
    val ev = graft.Tables.load(spark, dir, "events")
      .select($"user_id", $"event_type", unix_timestamp($"ts").as("t"), $"event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).map { case (_, rows) =>
      rows.sortBy(r => (r._3, r._4)).take(3).map(_._2).mkString(">")
    }.groupBy(identity).map { case (p, os) => (p, os.size.toLong) }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = Analytics.q158_user_paths(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }
}
