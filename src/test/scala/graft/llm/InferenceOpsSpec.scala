package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q321 Group-DRO weights, q322 quantile-matched sampling, q323
  * prediction-powered inference — naive driver-side recomputations and
  * structural invariants.
  */
class InferenceOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** The shared quality gate, recomputed naively. */
  private def gate(nChars: Long, toks: Seq[String]): Long = {
    val ok = nChars >= 200L && nChars <= 450L &&
      toks.distinct.length.toLong * 100L >= toks.length.toLong * 40L
    if (ok) 1L else 0L
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

  test("q321: EG recurrence matches the naive replay; worst group carries the top weight; weights sum to ~1e6") {
    import spark.implicits._
    val got = DataPrep.q321_group_dro(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val docs = graft.Tables.load(spark, dir, "documents")
      .selectExpr("source", "n_chars", "split(text, ' ') as toks").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2)))
    val arms = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, g) =>
      (s, g.length.toLong, g.map(d => gate(d._2, d._3)).sum)
    }
    val loss = arms.map { case (s, n, x) => s -> (1000000L - halfUp(1e6 * x / n)) }.toMap
    var w = arms.map(a => a._1 -> 1000000L).toMap
    for (_ <- 1 to DataPrep.DroIters) {
      val raw = arms.map { case (s, _, _) =>
        s -> halfUp(w(s) * math.exp(loss(s) / 1e6)) }.toMap
      val tot = raw.values.sum
      w = arms.map { case (s, _, _) =>
        s -> math.max(1L, halfUp(1e6 * raw(s) / tot)) }.toMap
    }
    assert(got.size == arms.size)
    arms.foreach { case (s, n, _) =>
      assert(got(s)._1 == n && got(s)._2 == loss(s) && got(s)._3 == w(s), s"source $s")
    }
    val sum = got.values.map(_._3).sum
    assert(math.abs(sum - 1000000L) <= arms.size,
      s"weights must normalize to ~1e6, got $sum")
    // tie-robust: dro_rank 1 must belong to the SET of max-loss sources
    // (a partial tie on max loss is broken by source name inside the
    // operator's window; asserting membership avoids replaying that order)
    val maxLoss = loss.values.max
    val rank1 = got.collect { case (s, v) if v._4 == 1L => s }
    assert(rank1.size == 1, s"exactly one dro_rank 1 row expected, got $rank1")
    assert(loss(rank1.head) == maxLoss,
      s"dro_rank 1 (${rank1.head}) must be a max-loss group")
  }

  test("q322: the reference source keeps everything; probabilities are capped and kept<=n") {
    val rows = DataPrep.q322_quantile_match(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (s, b, n, p, kept) =>
      assert(p >= 0L && p <= 1000000L, s"($s,$b) p out of range")
      assert(kept >= 0L && kept <= n, s"($s,$b) kept out of range")
      if (s == "src0") {
        assert(p == 1000000L, s"reference source must keep bin $b fully")
        assert(kept == n, s"reference source kept != n in bin $b")
      }
    }
    // a bin the target lacks must drop to p = 0 IF any exists
    rows.filter(r => r._4 == 0L).foreach { case (_, _, _, _, kept) =>
      assert(kept == 0L)
    }
  }

  test("q323: PPI matches the naive recomputation and rectifies toward the gold rate on the labeled slice") {
    val got = graft.queries.Analytics.q323_ppi_estimate(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3)),
        if (r.isNullAt(4)) null else java.lang.Long.valueOf(r.getLong(4)))))
      .toMap
    val docs = graft.Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "source", "n_chars", "text", "split(text, ' ') as toks")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getSeq[String](4)))
    val bySrc = docs.groupBy(_._2)
    assert(got.size == bySrc.size)
    bySrc.foreach { case (s, g) =>
      val nAll = g.length.toLong
      val fAll = g.map(d => gate(d._3, d._5)).sum
      val lab = g.filter(_._1 % 20L == 0L)
      val (nLab, fLab, yLab) = (lab.length.toLong,
        lab.map(d => gate(d._3, d._5)).sum,
        lab.map(d => if (qbp(d._4) >= 5500L) 1L else 0L).sum)
      val (gn, gl, ppi, cls) = got(s)
      assert(gn == nAll && gl == nLab, s"source $s counts")
      if (nLab > 0) {
        val expPpi = halfUp(1e6 * (fAll.toDouble / nAll - fLab.toDouble / nLab
          + yLab.toDouble / nLab))
        assert(ppi == expPpi, s"source $s ppi: got $ppi want $expPpi")
        assert(cls == halfUp(1e6 * yLab / nLab.toDouble), s"source $s classical")
      } else assert(ppi == null && cls == null)
    }
  }
}
