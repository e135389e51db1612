package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DataQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q93: every rule's count matches a direct recomputation") {
    import spark.implicits._
    val rows = DataQuality.q93_quality_checks(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size == 5)
    val o = graft.Tables.load(spark, dir, "orders")
    val n = o.count()
    assert(rows.values.forall(_._2 == n))
    assert(rows("custkey_not_null")._1 == o.filter($"o_custkey".isNull).count())
    assert(rows("totalprice_positive")._1 == o.filter(!($"o_totalprice" > 0)).count())
    assert(rows("orderdate_in_range")._1 ==
      o.filter(!($"o_orderdate" >= lit("1992-01-01") &&
        $"o_orderdate" <= lit("1998-12-31"))).count())
    assert(rows("referential_customer")._1 ==
      o.join(graft.Tables.load(spark, dir, "customer"),
        $"o_custkey" === $"c_custkey", "left_anti").count())
  }

  test("null predicate counts as a violation (CASE WHEN p THEN 0 ELSE 1)") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (3L, null))
      .toDF("k", "v")
    val n = df.agg(sum(when($"k".isNotNull, 0L).otherwise(1L)).as("viol"),
        sum(when($"v" === "a", 0L).otherwise(1L)).as("viol2"))
      .head()
    assert(n.getLong(0) == 1L) // null k
    assert(n.getLong(1) == 2L) // "b" fails, null v is a violation too
  }

  test("q94: inverted-index cosine equals the brute-force vector answer") {
    import spark.implicits._
    val got = DataQuality.q94_sparse_cosine(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.Caches.releaseAll()
    val docs = graft.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3).split(" ", -1).filter(_.nonEmpty)
          .groupBy(identity).map { case (t, a) => t -> a.length.toLong }))
    val naive = (for {
      (aId, al, as_, av) <- docs
      (bId, bl, bs, bv) <- docs
      if aId < bId && al == bl && as_ == bs
      dot = av.keySet.intersect(bv.keySet).toSeq.map(t => av(t) * bv(t)).sum
      if dot > 0
      cos = dot / (math.sqrt(av.values.map(x => x * x).sum.toDouble) *
        math.sqrt(bv.values.map(x => x * x).sum.toDouble))
      if cos >= 0.82
    } yield (aId, bId, math.round(cos * 1e6))).toSet
    assert(got == naive)
  }

  test("q102: every column profiles the full table; mode count <= distinct mass") {
    val rows = DataQuality.q102_profile(spark, dir).collect()
    val n = graft.Tables.load(spark, dir, "customer").count()
    graft.Caches.releaseAll()
    assert(rows.length == 5)
    assert(rows.forall(_.getLong(1) == n))
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) <= n + r.getLong(2)) // nulls+distinct sane
      assert(r.getLong(7) >= 1L)                              // mode exists
    }
  }

  test("q103: statuses partition the key universe of both versions") {
    import spark.implicits._
    val got = DataQuality.q103_snapshot_diff(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = graft.Tables.load(spark, dir, "orders").select($"o_orderkey".as("k"))
    val nBase = o.filter($"k" % 10 =!= 0).count()
    val nNext = o.filter($"k" % 7 =!= 0).count()
    val nBoth = o.filter($"k" % 10 =!= 0 && $"k" % 7 =!= 0).count()
    assert(got.getOrElse("removed", 0L) == nBase - nBoth)
    assert(got.getOrElse("added", 0L) == nNext - nBoth)
    assert(got.getOrElse("changed", 0L) + got.getOrElse("unchanged", 0L) == nBoth)
  }
}
