package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q131's oracle checks the top-20 values; this spec checks the
  * SEMANTICS against a driver-side brute force on the small fixture:
  * every returned pair must be non-adjacent, its common-neighbor
  * count exact, and its Jaccard the correctly rounded ratio.
  */
class LinkPredictionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("link prediction matches a brute-force neighborhood check") {
    import spark.implicits._
    val edges = graft.Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey".as("o"), $"l_partkey".cast("long").as("p"))
      .distinct().as[(Long, Long)].collect()
      .groupBy(_._1).values
      .flatMap { basket =>
        val s = basket.map(_._2).distinct.sorted
        for (i <- s.indices; j <- i + 1 until s.length) yield (s(i), s(j))
      }.toSet
    val nbrs = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val out = Graph.q131_link_prediction(spark, dir).collect()
    assert(out.length == 20)
    var prev = Long.MaxValue
    for (r <- out) {
      val (a, b, cn, jac) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(!edges.contains((a, b)), s"($a,$b) must not already be an edge")
      val common = nbrs(a).intersect(nbrs(b)).size
      assert(common.toLong == cn, s"cn($a,$b): got $cn, brute force $common")
      val expected =
        math.round(1e6 * common / (nbrs(a).size + nbrs(b).size - common))
      assert(jac == expected, s"jaccard($a,$b)")
      assert(jac <= prev, "output ordered by jaccard desc")
      prev = jac
    }
  }
}
