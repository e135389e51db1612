package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property tests for the mergeable-sketch operators (q58/q59): the
  * merge laws are what make them safe at 1000 executors, so they are
  * what gets tested — not just the endpoint values the DuckDB oracle
  * already pins.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("HLL registers merge by elementwise max (partition-split = union)") {
    import spark.implicits._
    // Build registers from two disjoint halves of the corpus and from
    // the whole corpus; merged halves must equal the whole.
    val docs = graft.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang", $"text")
    def registers(df: org.apache.spark.sql.DataFrame): Map[(String, Int), Int] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      df.select($"lang", $"text").as[(String, String)].collect()
        .flatMap { case (lang, text) =>
          val n = math.max(text.length - TextAnalysis.GramChars + 1, 0)
          (0 until n).map { i =>
            md.reset()
            val d = md.digest(text.substring(i, i + TextAnalysis.GramChars)
              .getBytes("UTF-8"))
            var v = 0L; var j = 0
            while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
            val h = v >>> 4
            val w = h / Sketches.HllRegisters
            val rho = if (w == 0) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
            ((lang, (h % Sketches.HllRegisters).toInt), rho)
          }
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    }
    val a = registers(docs.filter($"doc_id" % 2 === 0))
    val b = registers(docs.filter($"doc_id" % 2 === 1))
    val whole = registers(docs)
    val merged = (a.keySet ++ b.keySet).map { k =>
      k -> math.max(a.getOrElse(k, 0), b.getOrElse(k, 0))
    }.toMap
    assert(merged == whole)
  }

  test("HLL estimate lands within the expected error band of the exact count") {
    import spark.implicits._
    val out = Sketches.q58_hll_distinct(spark, dir)
      .select($"lang", $"hll_est", $"n_exact").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val est = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      // 1.04/sqrt(64) ≈ 13% std error; allow 3 sigma
      assert(math.abs(est - exact) / exact < 0.4,
        s"lang=${r.getString(0)} est=$est exact=$exact")
    }
  }

  test("HLL inclusion–exclusion intersection tracks the exact gram overlap") {
    // The exact-intersection error reference for q120 lives HERE, not
    // in the shipped query: at scale a distinct-gram self-join across
    // language pairs is the all-pairs shuffle the sketch replaces. At
    // spec scale it is cheap, so the spec computes it and pins the
    // sketch estimate against it.
    import spark.implicits._
    val est = Sketches.q120_hll_set_algebra(spark, dir)
      .select($"la", $"lb", $"est_a", $"est_b", $"est_inter").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(est.nonEmpty)
    val grams = Sketches.distinctGramHashes(spark, dir)
    val exact = grams.select($"lang".as("la"), $"h")
      .join(grams.select($"lang".as("lb"), $"h"), "h")
      .filter($"la" < $"lb")
      .groupBy($"la", $"lb").agg(count(lit(1)).as("n")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    est.foreach { case (pair, (ea, eb, ei)) =>
      val ex = exact.getOrElse(pair, 0L)
      // Inclusion–exclusion compounds three ~13%-σ estimates, each
      // scaled by set size, so the band is relative to the SMALLER
      // side (the intersection is bounded by it), 4σ wide.
      val band = 0.55 * math.min(ea, eb) + 1
      assert(math.abs(ei - ex) <= band,
        s"pair=$pair est_inter=$ei exact=$ex band=$band")
    }
  }

  test("count-min never underestimates, and is exact without collisions") {
    import spark.implicits._
    val out = Sketches.q59_cms_heavy_hitters(spark, dir).collect()
    assert(out.length == Sketches.CmsTopK)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"gram=${r.getString(0)}: est ${r.getLong(2)} < true ${r.getLong(1)}")
    }
  }

  test("sketch register build shuffles registers, not raw grams") {
    // The aggregation over (lang, register) must be partial+final —
    // an ObjectHashAggregate/HashAggregate pair around the exchange —
    // so the shuffle carries at most m rows per (lang, map task).
    val plan = Sketches.q58_hll_distinct(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan.take(500))
    assert(!plan.toLowerCase.contains("cartesian"))
  }

  test("KMV sketch: estimate within sampling error; bottom-k sets obey the merge law") {
    import spark.implicits._
    val rows = Sketches.q151_kmv_distinct(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hk, err) = (r.getLong(1), r.getLong(2), r.getLong(4))
      if (hk == 0L) assert(err == 0L, "exact fallback must have zero error")
      // k=64 ⇒ σ ≈ 1/√63 ≈ 12.6%; 4σ guard band in basis points
      else assert(math.abs(err) < 5100, s"err_bp $err outside 4σ for n=$n")
    }
    // merge law: bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B))
    val h = graft.Tables.load(spark, dir, "events")
      .select($"event_id",
        conv(substring(md5(
          concat($"user_id".cast("string"), lit(":"), $"props")), 1, 15), 16, 10)
          .cast("long").as("h"))
    val whole = h.select($"h").distinct()
      .orderBy($"h").limit(Sketches.KmvK).collect().map(_.getLong(0)).toSeq
    def half(p: Int) = h.filter($"event_id" % 2 === p).select($"h").distinct()
      .orderBy($"h").limit(Sketches.KmvK).collect().map(_.getLong(0)).toSeq
    val merged = (half(0) ++ half(1)).distinct.sorted.take(Sketches.KmvK)
    assert(merged == whole, "bottom-k union-merge must equal the whole-set sketch")
  }
}
