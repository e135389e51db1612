package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q338 Good–Turing re-estimation and q339 diagonal Fréchet distance —
  * closed-form planted fixtures plus naive replays on sf0.001.
  */
class SmoothingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q338 planted: an all-hapax corpus reports p0 = exactly 1 and r* = 0") {
    import spark.implicits._
    val tmp = TestSpark.tempDir("gt_hapax")
    Seq((0L, (0 until 10).map(i => s"u$i").mkString(" "), "src0", "en", 30L),
      (1L, (10 until 20).map(i => s"u$i").mkString(" "), "src0", "en", 30L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.q338_good_turing(spark, tmp).collect()
    graft.Caches.releaseAll()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((1L, 20L, 0L, 0L, 1000000L, 20L, 20L)), r.toString)
  }

  test("q338 planted: an all-doubles corpus has zero unseen mass") {
    import spark.implicits._
    val tmp = TestSpark.tempDir("gt_doubles")
    val words = (0 until 8).map(i => s"d$i")
    Seq((0L, (words ++ words).mkString(" "), "src0", "en", 40L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.q338_good_turing(spark, tmp).collect()
    graft.Caches.releaseAll()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 8L && r.getLong(4) == 0L,
      r.toString)
  }

  test("q338: the 10 smallest ranks match the naive count-of-counts replay") {
    val got = TextAnalysis.q338_good_turing(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    graft.Caches.releaseAll()
    val counts = graft.Tables.load(spark, dir, "documents")
      .selectExpr("text").collect().flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).map(_._2.length.toLong)
    val nr = counts.groupBy(identity).map { case (r, g) => r -> g.size.toLong }
    val nTok = counts.sum
    val v = counts.size.toLong
    val n1 = nr.getOrElse(1L, 0L)
    val naive = nr.toSeq.sortBy(_._1).take(10).map { case (r, n) =>
      val nx = nr.getOrElse(r + 1, 0L)
      (r, n, nx, math.round(1e6 * (r + 1) * nx / n),
        math.round(1e6 * n1 / nTok), nTok, v)
    }
    assert(got.toSeq == naive)
  }

  test("q339 planted: a single-label corpus is at Fréchet distance exactly 0 from itself") {
    import spark.implicits._
    val tmp = TestSpark.tempDir("frechet_single")
    val rows = (0 until 40).map { i =>
      (i.toLong, (0 until 64).map(d => ((i * 7 + d * 13) % 29) / 29.0f), 5)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = Similarity.q339_frechet_labels(spark, tmp).collect()
    graft.Caches.releaseAll()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((5L, 40L, 0L, 0L, 0L)), r.toString)
  }

  test("q339: per-label gaps match the naive micro-quantized replay") {
    val got = Similarity.q339_frechet_labels(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    graft.Caches.releaseAll()
    val vecs = graft.Tables.load(spark, dir, "embeddings")
      .selectExpr("cast(label as long) label",
        "cast(embedding as array<double>) v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val dim = vecs.head._2.length
    // engine round() semantics: HALF_UP (ties away from zero) — NOT
    // math.round, which floors negative ties
    def halfUp(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    def mv(xs: Seq[Long]): (Long, Long) = {
      val n = xs.length.toLong
      val sx = xs.sum
      val sxx = xs.map(x => BigInt(x) * x).sum
      (halfUp(sx.toDouble / n),
        halfUp((BigInt(n) * sxx - BigInt(sx) * sx).toDouble / (n.toDouble * n)))
    }
    val q = vecs.map { case (l, v) => (l, v.map(x => halfUp(x * 1e6))) }
    val global = (0 until dim).map(i => mv(q.map(_._2(i)).toSeq))
    val naive = q.groupBy(_._1).map { case (l, g) =>
      val per = (0 until dim).map(i => mv(g.map(_._2(i)).toSeq))
      val dm2 = (0 until dim).map(i =>
        (per(i)._1 - global(i)._1) * (per(i)._1 - global(i)._1)).sum
      val tv = (0 until dim).map { i =>
        per(i)._2 + global(i)._2 -
          halfUp(2.0 * math.sqrt(per(i)._2.toDouble * global(i)._2))
      }.sum
      l -> (g.length.toLong, dm2, tv)
    }
    assert(got.keySet == naive.keySet)
    naive.foreach { case (l, (n, dm2, tv)) =>
      assert(got(l) == ((n, dm2, tv, dm2 + tv)), s"label $l")
    }
  }
}
