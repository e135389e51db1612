package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q327 Davies–Bouldin cluster validity, q328 quality-EMD — naive
  * driver-side recomputations and closed-form planted fixtures.
  */
class DistValiditySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q327: scatter, separation and DB ratios match the naive replay of the seeded assignment") {
    val got = Evaluation.q327_davies_bouldin(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))))
      .toMap
    graft.Caches.releaseAll()
    Similarity.releaseShared()
    val vecs = graft.Tables.load(spark, dir, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val k = Similarity.ivfK(vecs.length.toLong)
    val seeds = vecs.filter(_._1 < k).map { case (id, v) => id.toInt -> v }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def d2(a: Array[Double], b: Array[Double]): Double =
      dot(a, a) - 2.0 * dot(a, b) + dot(b, b)
    // assignment: argmin of micro-rounded d2, ties to the lowest cid
    val members = vecs.map { case (_, v) =>
      val best = seeds.minBy { case (cid, c) =>
        (math.round(d2(v, c) * 1e6), cid)
      }._1
      (best, math.round(math.sqrt(math.max(d2(v, seeds(best)._2), 0.0)) * 1e6))
    }
    val sc = members.groupBy(_._1).map { case (cid, g) =>
      cid.toLong -> (g.length.toLong,
        math.round(g.map(_._2).sum.toDouble / g.length))
    }
    assert(got.keySet == sc.keySet)
    def sep(i: Long, j: Long): Long = math.round(math.sqrt(math.max(
      d2(seeds(i.toInt)._2, seeds(j.toInt)._2), 0.0)) * 1e6)
    sc.foreach { case (cid, (n, s)) =>
      val others = sc.keys.filter(_ != cid)
      val db = if (others.isEmpty) None
        else Some(others.map(j => math.round(
          1e6 * (s + sc(j)._2).toDouble / math.max(sep(cid, j), 1L).toDouble)).max)
      assert(got(cid) == ((n, s, db)), s"cluster $cid")
    }
  }

  /** q21's quality score, recomputed naively (bp). */
  private def qbp(text: String): Long = {
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    val toks = text.split(" ", -1)
    val hits = toks.count(stop.contains)
    val punct = text.count(c => !((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
      || (c >= '0' && c <= '9') || c == ' '))
    val raw = 5000L + hits * 120L - punct * 40L +
      math.min(toks.length.toLong, 100L) * 10L
    math.max(0L, math.min(10000L, raw))
  }

  test("q328: matches the naive CDF-gap replay on the harness corpus; reference distance is zero") {
    val got = DataPrep.q328_emd_quality(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    graft.Caches.releaseAll()
    val docs = graft.Tables.load(spark, dir, "documents")
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), qbp(r.getString(1)) / 1000L))
    val hist = docs.groupBy(_._1).map { case (s, g) =>
      s -> (0L to 10L).map(b => g.count(_._2 == b).toLong)
    }
    def cdf(h: Seq[Long]): Seq[Long] = h.scanLeft(0L)(_ + _).tail
    val refC = cdf(hist("src0"))
    val nr = refC.last
    hist.foreach { case (s, h) =>
      val c = cdf(h)
      val ns = c.last
      val a = (0 until 10).map(b => math.abs(c(b) * nr - refC(b) * ns)).sum
      val emd = math.round(1000.0 * a / (ns * nr))
      assert(got(s) == ((ns, emd)), s"source $s")
    }
    assert(got("src0")._2 == 0L, "reference source must sit at distance 0")
  }

  test("q328: planted one-bin shift measures exactly 1000 milli-bins; a half shift measures 500") {
    import spark.implicits._
    val binHi = "x"   // quality 5010 -> bin 5
    val binLo = "!!!" // quality 4890 -> bin 4
    assert(qbp(binHi) / 1000L == 5L && qbp(binLo) / 1000L == 4L)
    val docs =
      (0L until 10L).map(i => (i, "src0", binHi)) ++
        (10L until 20L).map(i => (i, "srcX", binLo)) ++
        (20L until 30L).map(i => (i, "srcY", if (i % 2 == 0) binLo else binHi))
    val tmp = TestSpark.tempDir("emd")
    docs.toDF("doc_id", "source", "text")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = DataPrep.q328_emd_quality(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    graft.Caches.releaseAll()
    assert(got == Map("src0" -> 0L, "srcX" -> 1000L, "srcY" -> 500L),
      s"planted shifts must measure exactly, got $got")
  }
}
