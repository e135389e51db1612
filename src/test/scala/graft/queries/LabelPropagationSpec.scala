package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q251 planted-structure spec: two 3-cliques whose pairs each appear
  * in two orders (support 2), bridged by a single one-off co-purchase
  * (support 1). The support-≥2 backbone must drop the bridge, and
  * synchronous min-tie-break LPA must converge each clique to one
  * community — so the census is exactly one row: two communities of
  * size 3.
  */
class LabelPropagationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q251: two support-2 cliques resolve to two communities; the support-1 bridge is dropped") {
    import spark.implicits._
    val rows = Seq(
      // clique A {1,2,3} in orders 1 and 2
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      // clique B {10,11,12} in orders 3 and 4
      (3L, 10L), (3L, 11L), (3L, 12L),
      (4L, 10L), (4L, 11L), (4L, 12L),
      // one-off bridge 3–10: support 1, must not merge the cliques
      (5L, 3L), (5L, 10L))
    val tmp = TestSpark.tempDir("lpa_cliques")
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val census = Graph.q251_label_propagation(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(census.toSeq == Seq((3L, 2L)),
      s"expected two communities of size 3, got ${census.mkString(", ")}")
  }

  test("q251 plan: no cartesian product, label vector joins broadcast") {
    val plan = Graph.q251_label_propagation(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("cartesian"), plan.take(800))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }
}
