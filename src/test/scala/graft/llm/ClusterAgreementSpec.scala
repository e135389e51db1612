package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q332 adjusted Rand index, q333 simplified silhouette — naive
  * driver-side recomputations on the harness corpus plus closed-form
  * planted fixtures (identical partitions → ARI exactly 1e6; points
  * sitting exactly on their seeds → silhouette exactly 1e6).
  */
class ClusterAgreementSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def loadVecs(d: String): Array[(Long, Array[Double], Long)] =
    graft.Tables.load(spark, d, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) v", "label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2).toLong))
      .sortBy(_._1)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def d2(a: Array[Double], b: Array[Double]): Double =
    dot(a, a) - 2.0 * dot(a, b) + dot(b, b)

  /** Micro-rounded d² to every seed, the assignment convention. */
  private def dmicro(v: Array[Double], seeds: Array[(Int, Array[Double])]) =
    seeds.map { case (cid, c) => (math.round(d2(v, c) * 1e6), cid) }

  test("q332: ARI matches the naive pair-counting replay of the seeded assignment") {
    val got = Evaluation.q332_adjusted_rand(spark, dir).collect()
    graft.Caches.releaseAll()
    Similarity.releaseShared()
    assert(got.length == 1)
    val vecs = loadVecs(dir)
    val k = Similarity.ivfK(vecs.length.toLong)
    val seeds = vecs.filter(_._1 < k).map { case (id, v, _) => id.toInt -> v }
    val ct = vecs.groupBy { case (_, v, lbl) =>
      (dmicro(v, seeds).minBy { case (d, cid) => (d, cid) }._2, lbl)
    }.map { case (key, g) => key -> g.length.toLong }
    def c2(n: Long): BigInt = BigInt(n) * (n - 1) / 2
    val sij = ct.values.map(c2).sum
    val sa = ct.groupBy(_._1._1).values.map(g => c2(g.values.sum)).sum
    val sb = ct.groupBy(_._1._2).values.map(g => c2(g.values.sum)).sum
    val nn = BigInt(vecs.length)
    // the engine's doubled form: 2·S·N(N−1) − 4AB over
    // (A+B)·N(N−1) − 4AB
    val num2 = 2 * sij * nn * (nn - 1) - 4 * sa * sb
    val den2 = (sa + sb) * nn * (nn - 1) - 4 * sa * sb
    val r = got(0)
    assert(r.getLong(0) == vecs.length.toLong)
    assert(r.getLong(3) == sij.toLong && r.getLong(4) == sa.toLong
      && r.getLong(5) == sb.toLong)
    val expected =
      if (den2 == 0) None
      else Some(math.round(1e6 * num2.toDouble / den2.toDouble))
    val gotAri = if (r.isNullAt(6)) None else Some(r.getLong(6))
    assert(gotAri == expected, s"ari naive=$expected got=$gotAri")
  }

  test("q332/q333 planted: identical partitions score ARI = 1e6; on-seed points score silhouette = 1e6") {
    import spark.implicits._
    // 32 vectors in 16 dims: vector i sits EXACTLY on seed (i mod 16)
    // (seeds are vec_id < ivfK(32) = 16), label = i mod 16 — the
    // clustering and the labels are the same partition, and every
    // point has a = 0, b = ||10·e_i − 10·e_j|| = √200.
    val rows = (0 until 32).map { i =>
      val v = Array.fill(16)(0.0f); v(i % 16) = 10.0f
      (i.toLong, v.toSeq, i % 16)
    }
    val tmp = TestSpark.tempDir("agree_planted")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val ari = Evaluation.q332_adjusted_rand(spark, tmp).collect()
    graft.Caches.releaseAll()
    Similarity.releaseShared()
    assert(ari.length == 1 && !ari(0).isNullAt(6) && ari(0).getLong(6) == 1000000L,
      s"identical partitions must score exactly 1e6: ${ari.mkString}")
    assert(ari(0).getLong(1) == 16L && ari(0).getLong(2) == 16L)
    val sil = Evaluation.q333_simplified_silhouette(spark, tmp).collect()
    graft.Caches.releaseAll()
    Similarity.releaseShared()
    assert(sil.length == 16)
    sil.foreach { r =>
      assert(r.getLong(1) == 2L && r.getLong(2) == 1000000L,
        s"on-seed cluster must score exactly 1e6: $r")
    }
  }

  test("q333: per-cluster means match the naive top-2 replay; top-2 head agrees with quantizer_argmin") {
    val got = Evaluation.q333_simplified_silhouette(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    graft.Caches.releaseAll()
    Similarity.releaseShared()
    val vecs = loadVecs(dir)
    val k = Similarity.ivfK(vecs.length.toLong)
    val seeds = vecs.filter(_._1 < k).map { case (id, v, _) => id.toInt -> v }
    def eu(dm: Long): Long =
      math.round(math.sqrt(math.max(dm.toDouble / 1e6, 0.0)) * 1e6)
    val perPoint = vecs.map { case (_, v, _) =>
      val sorted = dmicro(v, seeds).sortBy { case (d, cid) => (d, cid) }
      val (da, cid) = sorted.head
      val db = sorted(1)._1
      val (a, b) = (eu(da), eu(db))
      (cid.toLong, math.round(1e6 * (b - a).toDouble / math.max(math.max(a, b), 1L)))
    }
    val naive = perPoint.groupBy(_._1).map { case (cid, g) =>
      cid -> (g.length.toLong, math.round(g.map(_._2).sum.toDouble / g.length))
    }
    assert(got == naive)
  }
}
