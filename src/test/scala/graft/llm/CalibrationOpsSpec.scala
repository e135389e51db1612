package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q324 split-conformal coverage, q326 expected calibration error —
  * naive driver-side recomputations and planted-fixture behavior.
  */
class CalibrationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

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

  private def yhat(text: String): Long =
    5000L + math.min(text.split(" ", -1).length.toLong, 100L) * 10L

  private def gate(nChars: Long, text: String): Long = {
    val toks = text.split(" ", -1)
    val ok = nChars >= 200L && nChars <= 450L &&
      toks.distinct.length.toLong * 100L >= toks.length.toLong * 40L
    if (ok) 1L else 0L
  }

  test("q324: qhat and per-source coverage match the naive order-statistic replay; pooled coverage honors the conformal bound") {
    val got = graft.queries.Analytics.q324_conformal_coverage(spark, dir)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
      .toMap
    val docs = graft.Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val nc = docs.map { case (id, src, t) =>
      (id, src, math.abs(qbp(t) - yhat(t)), id % 10L == 3L)
    }
    val cal = nc.filter(_._4).map(_._3).sorted
    val k = ((cal.length + 1) * 9 + 9) / 10
    assert(cal.length >= k, "fixture must have a usable calibration slice")
    val qhat = cal(k - 1) // k-th smallest, 1-indexed
    val test = nc.filterNot(_._4)
    val bySrc = test.groupBy(_._2)
    assert(got.keySet == bySrc.keySet)
    var coveredAll = 0L
    bySrc.foreach { case (src, g) =>
      val covered = g.count(_._3 <= qhat).toLong
      coveredAll += covered
      val (gNCal, gQhat, gNTest, gCovered, gCovBp) = got(src)
      assert(gNCal == cal.length && gQhat == qhat, s"source $src cal/qhat")
      assert(gNTest == g.length && gCovered == covered, s"source $src counts")
      assert(gCovBp == math.round(10000.0 * covered / g.length), s"source $src bp")
    }
    // finite-sample conformal guarantee (marginal, with slack for the
    // fixed-sample dip): pooled coverage close to 1 - alpha = 0.9
    assert(10000L * coveredAll / test.length >= 8500L,
      s"pooled coverage degenerate: $coveredAll/${test.length}")
  }

  test("q324: a too-small calibration slice emits zero rows, never throws") {
    import spark.implicits._
    // 5 docs, none with doc_id % 10 == 3: calibration slice is empty
    val docs = Seq(0L, 1L, 2L, 4L, 5L).map { i =>
      (i, "src" + (i % 2), "the a of and to in is plain words here", 38L)
    }
    val tmp = TestSpark.tempDir("conf_small")
    docs.toDF("doc_id", "source", "text", "n_chars")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = graft.queries.Analytics.q324_conformal_coverage(spark, tmp).collect()
    graft.Caches.releaseAll()
    assert(rows.isEmpty, "no calibration rows must yield zero output rows")
  }

  test("q326: bins match the naive replay exactly (conf, acc, gap, ece)") {
    val got = Evaluation.q326_calibration_ece(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
    graft.Caches.releaseAll()
    val docs = graft.Tables.load(spark, dir, "documents")
      .selectExpr("n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val scored = docs.map { case (nChars, t) => (qbp(t), gate(nChars, t)) }
    val bins = scored.groupBy { case (p, _) => math.min(p / 1000L, 9L) }
      .map { case (b, g) =>
        val n = g.length.toLong
        val conf = math.round(g.map(_._1).sum.toDouble / n)
        val acc = math.round(10000.0 * g.map(_._2).sum / n)
        (b, (n, conf, acc, math.abs(conf - acc)))
      }
    val nn = bins.values.map(_._1).sum
    val ece = math.round(
      bins.values.map(v => v._1 * v._4).sum.toDouble / nn)
    assert(got.length == bins.size)
    got.foreach { case (b, (n, conf, acc, gap, e)) =>
      val (en, econf, eacc, egap) = bins(b)
      assert(n == en && conf == econf && acc == eacc && gap == egap, s"bin $b")
      assert(e == ece, s"bin $b ece")
    }
  }

  test("q326: an anti-calibrated plant (confident scores, gate always fails) reports acc 0 and ECE = weighted mean confidence") {
    import spark.implicits._
    // stopword-rich text scores high on q21, but n_chars < 200 fails
    // the gate on every doc -> acc_bp = 0 in every bin, gap = conf
    val text = "the a of and to in is the a of and to in is"
    val docs = (0L until 40L).map(i => (i, "src0", text, text.length.toLong))
    val tmp = TestSpark.tempDir("ece_anti")
    docs.toDF("doc_id", "source", "text", "n_chars")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Evaluation.q326_calibration_ece(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    graft.Caches.releaseAll()
    assert(rows.length == 1, s"one bin expected, got ${rows.toSeq}")
    val (_, n, conf, acc, gap, ece) = rows.head
    assert(n == 40L && acc == 0L, "gate must fail on every planted doc")
    assert(gap == conf && ece == conf,
      "single anti-calibrated bin: ECE equals its confidence")
    assert(conf == qbp(text), "confidence must be the planted q21 score")
  }
}
