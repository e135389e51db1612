package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The run-walk edge builder must produce exactly the pairs the
  * groupBy+collect_set formulation produces — the streaming iterator
  * has boundary cases (order spanning the carry, duplicate parts,
  * single-item orders, partition edges) the aggregate version can't
  * get wrong.
  */
class CopurchaseEdgesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def viaCollectSet(dir: String): Set[Long] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey".as("o"), $"l_partkey".cast("long").as("p"))
      .groupBy($"o").agg(collect_set($"p").as("ps"))
      .as[(Long, Array[Long])]
      .flatMap { case (_, ps) =>
        val s = ps.sorted
        for (i <- s.indices.iterator; j <- (i + 1 until s.length).iterator)
          yield (s(i) << 32) | s(j)
      }
      .toDF("pk").distinct().as[Long].collect().toSet
  }

  test("run-walk pairs equal the collect_set pairs at both fixture scales") {
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val fast = Graph.copurchasePackedPairs(spark, dir).as[Long].collect().toSet
      assert(fast == viaCollectSet(dir), s"mismatch at $dir")
      assert(fast.nonEmpty)
    }
  }
}
