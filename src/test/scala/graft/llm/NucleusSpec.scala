package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q340 nucleus (top-p) vocabulary coverage — planted exact-boundary
  * fixtures and the naive replay on sf0.001.
  */
class NucleusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q340 planted: uniform mass crosses p = 0.9 at exactly 9 of 10 words; a head word covers alone") {
    import spark.implicits._
    val tmp = TestSpark.tempDir("nucleus_planted")
    Seq(
      // srcU: 10 words, each once — cum before the 10th word is 0.9
      // exactly, so the nucleus is exactly the first 9
      (0L, (0 until 10).map(i => s"u$i").mkString(" "), "srcU", "en", 30L),
      // srcS: one word with 18/20 of the mass — nucleus of size 1
      (1L, ((0 until 18).map(_ => "a") ++ Seq("b", "c")).mkString(" "),
        "srcS", "en", 40L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.q340_nucleus_coverage(spark, tmp).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    graft.Caches.releaseAll()
    assert(got("srcU") == ((10L, 10L, 9L, 9000L)), s"uniform: ${got("srcU")}")
    assert(got("srcS") == ((3L, 20L, 1L, 3333L)), s"skewed: ${got("srcS")}")
  }

  test("q340: per-source nucleus sizes match the naive frequency-sort replay") {
    val dir = "/root/testdata/sf0.001"
    val got = TextAnalysis.q340_nucleus_coverage(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    graft.Caches.releaseAll()
    val toks = graft.Tables.load(spark, dir, "documents")
      .selectExpr("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map((r.getString(0), _)))
    val naive = toks.groupBy(_._1).map { case (src, g) =>
      val counts = g.groupBy(_._2).map { case (w, h) => (w, h.length.toLong) }
        .toSeq.sortBy { case (w, c) => (-c, w) }
      val tot = counts.map(_._2).sum
      val cums = counts.scanLeft(0L)(_ + _._2).dropRight(1)
      val k = cums.count(_ * 10 < tot * 9).toLong
      src -> (counts.length.toLong, tot, k,
        math.round(10000.0 * k / counts.length))
    }
    assert(got == naive)
  }
}
