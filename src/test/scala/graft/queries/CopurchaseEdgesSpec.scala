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

  test("edge memo: one persisted frame per (session, dir), surviving Caches.releaseAll") {
    // The whole point of the session memo is cross-QUERY reuse; the
    // between-queries cache sweep must not evict it, and repeat calls
    // must return the SAME persisted frame (not a rebuilt lineage).
    val dir = "/root/testdata/sf0.001"
    val a = Graph.copurchasePackedPairs(spark, dir)
    graft.Caches.releaseAll(blocking = true)
    val b = Graph.copurchasePackedPairs(spark, dir)
    assert(a eq b, "memo must return the same DataFrame instance")
    assert(a.storageLevel.useMemory || a.storageLevel.useDisk,
      s"memoized edges must stay persisted, got ${a.storageLevel}")
    val d1 = Graph.copurchaseDirectedEdges(spark, dir)
    graft.Caches.releaseAll(blocking = true)
    val d2 = Graph.copurchaseDirectedEdges(spark, dir)
    assert(d1 eq d2)
    assert(d1.storageLevel.useMemory || d1.storageLevel.useDisk)
    assert(d1.count() == 2 * a.count(), "directed list is both orientations")
  }

  test("releaseEdgeMemo unpersists and evicts this session's entries") {
    val dir = "/root/testdata/sf0.001"
    val a = Graph.copurchasePackedPairs(spark, dir)
    val d = Graph.copurchaseDirectedEdges(spark, dir)
    assert(a.storageLevel.useMemory || a.storageLevel.useDisk)
    Graph.releaseEdgeMemo(spark)
    assert(a.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "release must unpersist the packed-pair memo")
    assert(d.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "release must unpersist the directed-edge memo")
    // and the memo rebuilds cleanly after eviction (fresh instance)
    val a2 = Graph.copurchasePackedPairs(spark, dir)
    assert(!(a2 eq a), "post-release call must rebuild, not return the evicted frame")
    assert(a2.storageLevel.useMemory || a2.storageLevel.useDisk)
    assert(a2.count() == a.count())
  }
}
