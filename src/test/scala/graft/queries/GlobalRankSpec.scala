package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q76's reason to exist is the PLAN: a global row numbering that
  * never funnels the data through one partition. The oracle already
  * checks values; this spec checks the shape and the equivalence
  * with the (small-data-only) single-partition window.
  */
class GlobalRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("global rank equals the single-partition window answer") {
    import spark.implicits._
    val got = Analytics.q76_global_rank(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    val naive = graft.Tables.load(spark, dir, "events")
      .filter($"event_type" === "purchase")
      .select($"event_id", graft.Tables.epochS($"ts").as("ts_s"))
      .withColumn("global_rank",
        row_number().over(Window.orderBy($"ts_s", $"event_id")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == naive.sortBy(_._2))
  }

  test("the ranking pipeline range-partitions; no single-partition exchange") {
    import spark.implicits._
    val sorted = graft.Tables.load(spark, dir, "events")
      .filter($"event_type" === "purchase")
      .select($"event_id", graft.Tables.epochS($"ts").as("ts_s"))
      .repartitionByRange(32, $"ts_s", $"event_id")
      .sortWithinPartitions($"ts_s", $"event_id")
    val plan = sorted.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), plan.take(500))
    assert(!plan.contains("SinglePartition"), plan.take(500))
  }
}
