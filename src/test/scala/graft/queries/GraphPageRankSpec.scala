package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q87's plan and math invariants (the oracle checks values at
  * sf0.01): rank mass conservation and the broadcast shape that keeps
  * each iteration to a single shuffle.
  */
class GraphPageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("pagerank mass sums to 1 (±rounding) and all ranks positive") {
    val rows = Graph.q87_pagerank(spark, dir).collect()
    graft.Caches.releaseAll()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) > 0L))
    val mass = rows.map(_.getLong(1)).sum
    // each vertex rounds to 1e-8 — total drift bounded by |V|/2 ulps
    assert(math.abs(mass - 100000000L) <= rows.length,
      s"mass $mass for ${rows.length} vertices")
  }

  test("rank/degree vectors broadcast: no shuffle on the edge side of the joins") {
    val qe = Graph.q87_pagerank(spark, dir).queryExecution
    graft.Caches.releaseAll()
    val plan = qe.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }
}
