package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q261 planted-structure spec: a support-2 K5 clique (degree 4
  * everywhere — survives the k=3 peel) plus a support-2 pendant edge
  * (degree 1 — peeled in round 1). The census must drop to exactly
  * the clique after one round and stay fixed.
  */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q261: pendant edge peels in one round, the K5 core is a fixpoint") {
    import spark.implicits._
    val k5 = for (o <- Seq(1L, 2L); p <- 1L to 5L) yield (o, p)
    val pendant = for (o <- Seq(3L, 4L); p <- Seq(10L, 11L)) yield (o, p)
    val tmp = TestSpark.tempDir("kcore_k5")
    (k5 ++ pendant).toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val census = Graph.q261_kcore_peel(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(census(0) == ((0L, 7L, 11L)), census.mkString(", "))
    for (r <- 1 to 4)
      assert(census(r) == ((r.toLong, 5L, 10L)), census.mkString(", "))
  }

  test("q261: census is monotone non-increasing on real data") {
    val census = Graph.q261_kcore_peel(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(census.sliding(2).filter(_.length == 2)
      .forall(p => p(0)._1 >= p(1)._1 && p(0)._2 >= p(1)._2), census.mkString(", "))
  }
}
