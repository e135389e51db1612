package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q337 interpolated Kneser–Ney — planted single-bigram corpus
  * (probability exactly 1e6), naive top-30 replay, and the KN
  * normalization identity Σ_w₂ P(w₂|w₁) = 1 on the naive model.
  */
class KneserNeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def bigramCounts(texts: Seq[String]): Map[(String, String), Long] =
    texts.map(_.split(" ", -1)).filter(_.length >= 2)
      .flatMap(t => t.dropRight(1).zip(t.drop(1)))
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }

  /** The naive interpolated-KN model over a bigram-count table. */
  private def kn(c2: Map[(String, String), Long]) = {
    val cw1 = c2.groupBy(_._1._1).map { case (w, g) => w -> g.values.sum }
    val n1w = c2.groupBy(_._1._1).map { case (w, g) => w -> g.size.toLong }
    val nb = c2.groupBy(_._1._2).map { case (w, g) => w -> g.size.toLong }
    val nt = c2.size.toLong
    def p(w1: String, w2: String): Double =
      math.max(c2.getOrElse((w1, w2), 0L) - 0.75, 0.0) / cw1(w1) +
        (0.75 * n1w(w1) / cw1(w1)) * (nb.getOrElse(w2, 0L).toDouble / nt)
    (cw1, n1w, nb, nt, p _)
  }

  test("q337 planted: a one-bigram corpus concentrates ALL mass - p exactly 1e6") {
    import spark.implicits._
    val tmp = TestSpark.tempDir("kn_planted")
    Seq((0L, "a a a", "src0", "en", 5L), (1L, "a a a", "src0", "en", 5L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.q337_kneser_ney(spark, tmp).collect()
    graft.Caches.releaseAll()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getString(0), r.getString(1)) == (("a", "a")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((4L, 4L, 1L, 1L)))
    assert(r.getLong(6) == 1000000L, s"single-bigram mass must be exactly 1: $r")
  }

  test("q337: top-30 matches the naive replay bigram-for-bigram") {
    val got = TextAnalysis.q337_kneser_ney(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    graft.Caches.releaseAll()
    val texts = graft.Tables.load(spark, dir, "documents")
      .selectExpr("text").collect().map(_.getString(0)).toSeq
    val c2 = bigramCounts(texts)
    val (cw1, n1w, nb, _, p) = kn(c2)
    val naive = c2.toSeq
      .sortBy { case ((w1, w2), c) => (-c, w1, w2) }.take(30)
      .map { case ((w1, w2), c) =>
        (w1, w2, c, cw1(w1), n1w(w1), nb(w2), math.round(1e6 * p(w1, w2)))
      }
    assert(got.toSeq == naive)
  }

  test("q337: the interpolated model normalizes - sum over the vocab is 1 per context") {
    val texts = graft.Tables.load(spark, dir, "documents")
      .selectExpr("text").collect().map(_.getString(0)).toSeq
    val c2 = bigramCounts(texts)
    val (cw1, _, nb, _, p) = kn(c2)
    val vocab = nb.keys.toSeq
    val top = cw1.toSeq.sortBy(-_._2).take(5).map(_._1)
    top.foreach { w1 =>
      val s = vocab.map(w2 => p(w1, w2)).sum
      assert(math.abs(s - 1.0) < 1e-9, s"context '$w1' sums to $s")
    }
  }
}
