package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.Tables.{cents, load}

/** Invariants behind q88/q90/q91 that the value-oracles can't express:
  * the merge result is split-point-INDEPENDENT, the sample is
  * run-deterministic, and the transition matrix is row-stochastic.
  */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q88: partial-merge answer is independent of the split point") {
    import spark.implicits._
    val full = load(spark, dir, "orders")
      .select($"o_orderpriority", cents($"o_totalprice").as("c"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), sum($"c").as("sum_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val merged = Analytics.q88_incremental_agg(spark, dir)
      .select($"o_orderpriority", $"n_orders", $"sum_cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == full)
  }

  test("q90: the row_number<=k idiom plans as bounded TopK heaps, not a window sort") {
    val plan = Analytics.q90_group_sample(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopK") && plan.contains("FinalTopK"), plan.take(900))
    assert(!plan.contains("Window"), plan.take(900))
  }

  test("q90: sample is identical across two independent executions") {
    val a = Analytics.q90_group_sample(spark, dir).collect().toSeq
    val b = Analytics.q90_group_sample(spark, dir).collect().toSeq
    assert(a == b)
    // k-bound holds per group
    assert(a.groupBy(_.getString(0)).values.forall(_.size <= 5))
  }

  test("q91: transition rows are (approximately) row-stochastic in bp") {
    val rows = Analytics.q91_markov(spark, dir).collect()
    val byFrom = rows.groupBy(_.getString(0))
    byFrom.foreach { case (from, rs) =>
      val total = rs.map(_.getLong(3)).sum
      // each p_bp is independently rounded; the row sum can drift by
      // at most half a bp per cell
      assert(math.abs(total - 10000L) <= rs.length / 2 + 1,
        s"$from sums to $total bp")
    }
  }
}
