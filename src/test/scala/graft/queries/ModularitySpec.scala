package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q334 brand modularity — closed-form planted partition plus a naive
  * driver-side replay of the backbone + brand counting on sf0.001.
  */
class ModularitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q334 planted: two brand-pure support-2 triangles score Q = exactly 0.5") {
    import spark.implicits._
    // two disjoint K3s, each co-ordered twice (support 2); parts 1-3
    // are brand A, 4-6 brand B. Undirected m = 6, D = 12; per brand
    // intra_dir = 6, d_c = 6 → contrib = (12·6 − 36)/144 = 1/4 each.
    val li = (for (o <- Seq(1L, 2L); p <- 1L to 3L) yield (o, p)) ++
      (for (o <- Seq(3L, 4L); p <- 4L to 6L) yield (o, p))
    val tmp = TestSpark.tempDir("modularity_k3")
    li.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    (1L to 6L).map(p => (p, if (p <= 3) "Brand#A" else "Brand#B"))
      .toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val got = Graph.q334_brand_modularity(spark, tmp).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
    graft.Caches.releaseAll()
    assert(got.length == 2)
    got.foreach { case (b, v) =>
      assert(v == ((3L, 6L, 6L, 250000L, 500000L)), s"$b: $v")
    }
  }

  test("q334: per-brand counts and Q match the naive backbone replay") {
    val dir = "/root/testdata/sf0.001"
    val got = Graph.q334_brand_modularity(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    graft.Caches.releaseAll()
    val li = graft.Tables.load(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "cast(l_partkey as long) p").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val brand = graft.Tables.load(spark, dir, "part")
      .selectExpr("cast(p_partkey as long) p", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val pairs = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq
    val backbone = pairs.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val directed = backbone.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val dd = directed.size.toLong
    val byBrand = directed.groupBy { case (u, _) => brand(u) }
    val naive = byBrand.map { case (b, g) =>
      val degSum = g.size.toLong
      val nNodes = g.map(_._1).distinct.size.toLong
      val intra = g.count { case (u, v) => brand(u) == brand(v) }.toLong
      b -> (nNodes, degSum, intra)
    }
    val qNaive = math.round(1e6 *
      (dd.toDouble * naive.values.map(_._3).sum
        - naive.values.map(v => v._2.toDouble * v._2).sum) / (dd.toDouble * dd))
    assert(got.keySet == naive.keySet)
    naive.foreach { case (b, (nNodes, degSum, intra)) =>
      val (gn, gd, gi, gc, gq) = got(b)
      assert((gn, gd, gi) == ((nNodes, degSum, intra)), s"brand $b counts")
      assert(gc == math.round(1e6 * (dd.toDouble * intra - degSum.toDouble * degSum)
        / (dd.toDouble * dd)), s"brand $b contrib")
      assert(gq == qNaive, s"brand $b Q")
    }
  }
}
