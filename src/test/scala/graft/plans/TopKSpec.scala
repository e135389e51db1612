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
