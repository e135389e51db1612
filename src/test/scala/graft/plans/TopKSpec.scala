package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("native top-k equals the window formulation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 40 groups with wildly different sizes, including singletons and
    // a group smaller than k
    val rows = (0 until 5000).map { i =>
      (rnd.nextInt(40).toLong, i.toLong, rnd.nextInt(1000))
    } :+ (999L, 99999L, 5)
    val df = rows.toDF("g", "id", "v").repartition(7)

    val native = TopKPerGroup.topK(df, Seq("g"), Seq($"v".desc, $"id".asc), k = 5)
      .select($"g", $"rank", $"id", $"v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).sorted

    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id".asc)
    val windowed = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5).select($"g", $"rank", $"id", $"v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).sorted

    assert(native.toSeq == windowed.toSeq)
  }

  test("plan: partial heap before the exchange, final after, no full sort") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1), (1L, 2L, 2), (2L, 3L, 3)).toDF("g", "id", "v")
    val out = TopKPerGroup.topK(df, Seq("g"), Seq($"v".desc, $"id".asc), k = 1)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("FinalTopK") && p.contains("PartialTopK"))
    val exchangeIdx = p.indexOf("Exchange")
    assert(exchangeIdx >= 0, "grouping requires a hash exchange")
    assert(p.indexOf("PartialTopK") > exchangeIdx,
      "partial heap must sit BELOW the exchange (printed after it)")
    assert(!p.contains("SortExec") && !p.contains("WindowExec"),
      "the native operator must not fall back to sort/window")
  }

  test("groups smaller than k emit all their rows, ranked densely from 1") {
    import spark.implicits._
    val df = Seq((1L, 10L, 5), (1L, 11L, 9), (2L, 20L, 1)).toDF("g", "id", "v")
    val out = TopKPerGroup.topK(df, Seq("g"), Seq($"v".desc, $"id".asc), k = 10)
      .select($"g", $"rank", $"id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(out == Seq((1L, 1L, 11L), (1L, 2L, 10L), (2L, 1L, 20L)))
  }

  test("optimizer rule rewrites the window rank-filter pattern to the native plan") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (0 until 2000).map(i => (rnd.nextInt(25).toLong, i.toLong, rnd.nextInt(500)))
      .toDF("g", "id", "v").repartition(5)
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id".asc)
    val q = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 4)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("FinalTopK") && plan.contains("PartialTopK"),
      s"rank-filter should plan as native top-k, got:\n$plan")
    assert(!plan.contains("WindowExec"), "WindowExec must be replaced")
    // downstream references to rn survive the rewrite (same exprId)
    val out = q.select($"g", $"rn", $"id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val expected = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(4).zipWithIndex
          .map { case ((_, id, _), i) => (g, i + 1, id) }
      }.sorted
    assert(out == expected)
  }

  test("optimizer rule leaves rank() and unpartitioned windows alone") {
    import spark.implicits._
    val df = Seq((1L, 1L, 3), (1L, 2L, 3), (2L, 3L, 1)).toDF("g", "id", "v")
    val w = Window.partitionBy($"g").orderBy($"v".desc)
    // rank() admits ties past k — must not be rewritten
    val ranked = df.withColumn("r", rank().over(w)).filter($"r" <= 1)
    assert(!ranked.queryExecution.executedPlan.toString.contains("FinalTopK"))
    assert(ranked.count() == 3) // both g=1 rows tie at rank 1
    // global window (no partition) — leave to Spark
    val wg = Window.orderBy($"v".desc, $"id".asc)
    val global = df.withColumn("rn", row_number().over(wg)).filter($"rn" <= 2)
    assert(!global.queryExecution.executedPlan.toString.contains("FinalTopK"))
    assert(global.count() == 2)
  }

  test("expression grouping keys and null order values are handled") {
    import spark.implicits._
    val df = Seq((1L, 1L, Some(3)), (1L, 2L, None), (4L, 3L, Some(1)))
      .toDF("g", "id", "v")
    // nulls last under desc ordering, same as the window formulation
    val w = Window.partitionBy($"g" % 3).orderBy($"v".desc, $"id".asc)
    val expected = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 2).select(($"g" % 3).as("gk"), $"rank", $"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val native = TopKPerGroup.topK(df.withColumn("gk", $"g" % 3),
        Seq("gk"), Seq($"v".desc, $"id".asc), k = 2)
      .select($"gk", $"rank", $"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(native == expected)
  }
}
