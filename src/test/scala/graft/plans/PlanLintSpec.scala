package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PlanLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("flags a non-equi join fallback; tolerates crossJoin(broadcast(tiny))") {
    import spark.implicits._
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(4, 5).toDF("y")
    // non-equi predicate → BroadcastNestedLoopJoin WITH a condition
    val fallback = PlanLint.lint(a.join(b, $"x" < $"y"))
    assert(fallback.exists(_.rule == "cartesian-product"), fallback)
    // the idiomatic bounded cross join is accepted
    assert(PlanLint.lint(a.crossJoin(broadcast(b))).isEmpty)
  }

  test("flags the global Window.orderBy single-partition funnel") {
    import spark.implicits._
    val df = graft.Tables.load(spark, dir, "events")
      .withColumn("rk", row_number().over(Window.orderBy($"event_id")))
    val findings = PlanLint.lint(df)
    assert(findings.exists(_.rule == "single-partition-window"), findings)
  }

  test("flags a scan reading every column for a narrow result") {
    import spark.implicits._
    // defeat column pruning by forcing a full-width intermediate
    val li = graft.Tables.load(spark, dir, "lineitem")
    val wide = li.withColumn("all", to_json(struct(li.columns.map(col): _*)))
      .filter(length($"all") > 0)
      .select($"l_orderkey")
    val findings = PlanLint.lint(wide)
    assert(findings.exists(_.rule == "unpruned-wide-scan"), findings)
  }

  test("shipped queries lint clean (representative sample)") {
    val clean = Seq(
      graft.queries.Relational.q03_join_broadcast(spark, dir),
      graft.queries.Analytics.q08_window_latest(spark, dir),
      graft.queries.Analytics.q90_group_sample(spark, dir),
      graft.queries.SqlSurface.q92_skyline(spark, dir),
      graft.queries.Graph.q87_pagerank(spark, dir))
    clean.foreach { df =>
      val findings = PlanLint.lint(df)
      graft.Caches.releaseAll()
      assert(findings.isEmpty, findings)
    }
  }
}
