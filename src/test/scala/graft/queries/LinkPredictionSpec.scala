package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q131's oracle checks the ranked values; this spec checks the
  * SEMANTICS against a driver-side brute force on the small fixture:
  * every returned candidate must be non-adjacent to its anchor, its
  * common-neighbor count exact, its Jaccard the correctly rounded
  * ratio, and the per-anchor ranking consistent.
  */
class LinkPredictionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("anchored link prediction matches a brute-force neighborhood check") {
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
    assert(out.nonEmpty)
    var prev = (0L, Long.MaxValue) // (anchor, last jaccard seen)
    for (r <- out) {
      val (anchor, rank, cand, cn, jac) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(anchor % 200 == 0, "anchors are the hash-strided query set")
      assert(rank >= 1 && rank <= 5)
      val key = (math.min(anchor, cand), math.max(anchor, cand))
      assert(!edges.contains(key), s"($anchor,$cand) must not already be an edge")
      val common = nbrs(anchor).intersect(nbrs(cand)).size
      assert(common.toLong == cn, s"cn($anchor,$cand): got $cn, brute force $common")
      assert(common >= 2, "min-support filter")
      val expected = math.round(
        1e6 * common / (nbrs(anchor).size + nbrs(cand).size - common))
      assert(jac == expected, s"jaccard($anchor,$cand)")
      if (prev._1 == anchor)
        assert(jac <= prev._2, "per-anchor output ordered by jaccard desc")
      prev = (anchor, jac)
    }
    // every anchor's list is its TRUE top-5: no brute-force candidate
    // with higher jaccard was left out
    val byAnchor = out.groupBy(_.getLong(0))
    for ((anchor, rows) <- byAnchor) {
      val worst = rows.map(_.getLong(4)).min
      val bruteBest = nbrs(anchor).toSeq
        .flatMap(w => nbrs(w)).distinct
        .filter(c => c != anchor && !edges.contains(
          (math.min(anchor, c), math.max(anchor, c))))
        .map { c =>
          val common = nbrs(anchor).intersect(nbrs(c)).size
          (c, common,
            math.round(1e6 * common / (nbrs(anchor).size + nbrs(c).size - common)))
        }
        .filter(_._2 >= 2)
      val returned = rows.map(_.getLong(2)).toSet
      val missedBetter = bruteBest
        .filter(t => !returned.contains(t._1) && t._3 > worst)
      assert(missedBetter.isEmpty,
        s"anchor $anchor: better candidates missed: $missedBetter")
    }
  }
}
