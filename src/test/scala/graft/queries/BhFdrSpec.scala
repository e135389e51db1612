package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q317 Benjamini–Hochberg FDR: a planted low-quality source must be
  * rejected while homogeneous sources survive, and the step-up rule
  * must match a naive driver-side replay on real data.
  */
class BhFdrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("planted bad source is rejected; homogeneous sources are not") {
    import spark.implicits._
    // 9 healthy sources: ~half their docs pass the quality gate
    // (in-band length, distinct-ratio >= 0.4); 1 planted source whose
    // docs all fail the length band.
    val passText = "alpha beta gamma delta epsilon zeta eta theta " * 4 // 188 ch
    val healthyPass = passText + "iota kappa lambda mu nu xi omicron pi" // in band
    val healthyFail = "tiny"
    val docs = (0 until 10).flatMap { s =>
      (0 until 60).map { i =>
        val text = if (s == 9) healthyFail
          else if (i % 2 == 0) healthyPass else healthyFail
        (s.toLong * 100 + i, text, "en", s"src$s")
      }
    }
    val dir = TestSpark.tempDir("bh_fdr")
    docs.toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source",
        "cast(length(text) as long) as n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Analytics.q317_bh_fdr(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(4), r.getBoolean(7))).toList
    val bySrc = rows.map(r => r._1 -> r._3).toMap
    assert(bySrc("src9"), "the planted all-fail source must be rejected")
    (0 until 9).foreach { s =>
      assert(!bySrc(s"src$s"), s"homogeneous src$s must not be rejected")
    }
  }

  test("step-up rule matches a naive replay on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val rows = Analytics.q317_bh_fdr(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getBoolean(7)))
    assert(rows.nonEmpty)
    // ranks are the ascending (p, source) order, crit = round(1e6*0.05*i/m)
    val m = rows.length.toLong
    val sorted = rows.sortBy(r => (r._2, r._1))
    assert(sorted.map(r => r._3).toSeq == (1L to m))
    sorted.zipWithIndex.foreach { case (r, i) =>
      assert(r._4 == math.round(50000.0 * (i + 1) / m))
    }
    val kstar = sorted.filter(r => r._2 <= r._4).map(_._3)
      .reduceOption(_ max _)
    sorted.foreach { r =>
      assert(r._5 == kstar.exists(r._3 <= _),
        s"BH step-up mismatch at rank ${r._3}")
    }
  }
}
