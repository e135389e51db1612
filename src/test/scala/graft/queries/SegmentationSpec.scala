package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Properties of the customer/part segmentation queries beyond the
  * DuckDB value check: the RFM quintiles must balance (NTILE's
  * defining property), and q134's distributed two-phase cumulative
  * sum must agree with the single-partition window it replaces.
  */
class SegmentationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("rfm: every quintile dimension is balanced and the census covers all customers") {
    import spark.implicits._
    val rows = Analytics.q133_rfm_segments(spark, dir).collect()
    val nCustomers = graft.Tables.load(spark, dir, "orders")
      .select($"o_custkey").distinct().count()
    assert(rows.map(_.getLong(3)).sum == nCustomers,
      "segment census must partition the customer base")
    // NTILE(5) balance: each quintile holds n/5 customers ±1,
    // checked per dimension by re-aggregating the census
    for ((idx, name) <- Seq(0 -> "r", 1 -> "f", 2 -> "m")) {
      val per = rows.groupBy(_.getLong(idx)).view
        .mapValues(_.map(_.getLong(3)).sum).toMap
      assert(per.keySet == Set(1L, 2L, 3L, 4L, 5L), s"$name quintiles present")
      assert(per.values.max - per.values.min <= 1,
        s"$name quintiles balanced: $per")
    }
  }

  test("abc: distributed cumulative-share classes equal the single-partition window answer") {
    import spark.implicits._
    val got = Analytics.q134_abc_classification(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

    val rev = graft.Tables.load(spark, dir, "lineitem")
      .groupBy($"l_partkey".cast("long").as("p"))
      .agg(sum(graft.Tables.cents($"l_extendedprice")).as("x"))
    val total = rev.agg(sum($"x")).head().getLong(0)
    val naive = rev
      .withColumn("cum", sum($"x").over(
        Window.orderBy($"x".desc, $"p")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cls",
        when($"cum" * 10 <= total * 7, "A")
          .when($"cum" * 10 <= total * 9, "B").otherwise("C"))
      .groupBy($"cls")
      .agg(count(lit(1)).as("n_parts"), sum($"x").as("revenue_cents"))
      .orderBy($"cls")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == naive, s"two-phase vs window: $got vs $naive")
    assert(got.map(_._2).sum == rev.count(), "classes partition the parts")
  }

  test("top-n-others: OTHER keeps total mass intact and shares sum to ~100% per segment") {
    import spark.implicits._
    val rows = Analytics.q150_top_n_others(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val bySeg = rows.groupBy(_._1)
    bySeg.foreach { case (seg, rs) =>
      // ≤ 5 named brands + at most one OTHER row
      assert(rs.count(_._2 != "OTHER") <= 5, s"$seg has >5 named rows")
      assert(rs.count(_._2 == "OTHER") <= 1)
      // shares sum to 10000 within per-row rounding slack
      val shareSum = rs.map(_._5).sum
      assert(math.abs(shareSum - 10000) <= rs.size, s"$seg shares sum $shareSum")
    }
    // mass conservation: segment revenue equals the direct fact aggregate
    val direct = graft.Tables.load(spark, dir, "lineitem")
      .join(graft.Tables.load(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(graft.Tables.load(spark, dir, "customer"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(sum(graft.Tables.cents($"l_extendedprice")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    bySeg.foreach { case (seg, rs) =>
      assert(rs.map(_._3).sum == direct(seg), s"$seg drops revenue mass")
    }
  }

  test("lift curve: balanced deciles, shares sum to ~100%, cumulative monotone to 10000") {
    val rows = Analytics.q159_lift_curve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val counts = rows.map(_._2)
    assert(counts.max - counts.min <= 1, "NTILE deciles must balance")
    // top decile carries the largest share; shares sum within rounding
    assert(rows.head._4 == rows.map(_._4).max)
    assert(math.abs(rows.map(_._4).sum - 10000) <= rows.length)
    val cum = rows.map(_._5)
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b }, "cumulative must be monotone")
    assert(cum.last == 10000L)
  }
}
