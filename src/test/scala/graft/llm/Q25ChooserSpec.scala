package graft.llm

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q25's data-driven candidate-generator choice (round-18 directive):
  * the block self-join and the posting-list inverted index are
  * output-equivalent forms whose costs diverge with the corpus shape,
  * so the choice must come from the measured pair fan-out — p_block =
  * Σ C(|block|,2) vs p_index = Σ C(df,2) — not corpus folklore. This
  * spec pins (1) the length filter's losslessness against the rounded
  * threshold (the round-17 VERDICT gap: the oracle no longer exercises
  * the engine's length arithmetic since it uses the index form), (2)
  * bit-equality of the two forms on the harness corpora AND on both
  * chooser fixtures, (3) the chooser's decision on a fixture on each
  * side of the boundary, plus the harness corpus itself (closed
  * vocabulary → block, matching the round-17 interleaved walls).
  */
class Q25ChooserSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(df: DataFrame): Set[(String, Long, Long, Long)] =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  /** Closed-vocabulary fixture: every bigram is shared by ~all docs
    * of its source, so the posting fan-out Σ C(df,2) dwarfs the block
    * fan-out Σ C(|block|,2) — the sf1.0 harness shape in miniature
    * (measured there: p_index = 187.8M vs p_block = 62.475M).
    */
  private def closedVocabDocs(): DataFrame = {
    import spark.implicits._
    val vocab = Array("alpha", "beta", "gamma", "delta")
    val rows = for {
      s <- 0 until 3
      d <- 0 until 20
    } yield {
      val words = Array.tabulate(10)(j => vocab((d + j * (s + 1)) % vocab.length))
      (s.toLong * 100 + d, s"src$s", words.mkString(" "))
    }
    rows.toDF("doc_id", "source", "text")
  }

  /** Open-vocabulary fixture: one huge block whose docs share bigrams
    * only inside two planted duplicate pairs, so p_index collapses to
    * ≈ the true-dup postings while p_block stays C(40,2) — the shape
    * where the block self-join is the wrong form.
    */
  private def openVocabDocs(): DataFrame = {
    import spark.implicits._
    val rows = (0 until 40).map { d =>
      val base = if (d == 1) 0 else if (d == 3) 2 else d // 0≡1, 2≡3 planted dups
      val words = Array.tabulate(10)(j => s"w${base}_$j")
      (d.toLong, "only", words.mkString(" "))
    }
    rows.toDF("doc_id", "source", "text")
  }

  private def harness(sf: String): DataFrame =
    graft.Tables.load(spark, s"/root/testdata/$sf", "documents")
      .selectExpr("doc_id", "source", "text")

  test("q25 length filter is LOSSLESS: verified pairs identical with the filter on and off") {
    // The 10000·min(na,nb) ≥ 2999·max(na,nb) conjunct sits strictly
    // below the 2999.5 rounding boundary of round(10000·i/u) ≥ 3000:
    // any pruned pair has i/u ≤ min/max < 0.29995, so it could never
    // verify. sf0.001 pins non-vacuously (7 pairs); sf0.01 pins the
    // gate scale the driver hashes.
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = graft.Caches.tracked(Dedup.q25Docs(harness(sf)))
      val on = rows(Dedup.q25BlockPairs(docs, lengthFilter = true))
      val off = rows(Dedup.q25BlockPairs(docs, lengthFilter = false))
      graft.Caches.releaseAll()
      assert(on == off, s"$sf: length filter dropped true pairs: ${(off -- on).take(5)}")
    }
    val docs001 = graft.Caches.tracked(Dedup.q25Docs(harness("sf0.001")))
    assert(rows(Dedup.q25BlockPairs(docs001)).nonEmpty,
      "sf0.001 must produce at least one J >= 0.3 pair")
    graft.Caches.releaseAll()
  }

  test("block and inverted-index forms are output-identical on harness corpora and fixtures") {
    val inputs = Seq(
      "sf0.001" -> harness("sf0.001"),
      "sf0.01" -> harness("sf0.01"),
      "closed" -> closedVocabDocs(),
      "open" -> openVocabDocs())
    for ((tag, input) <- inputs) {
      val docs = graft.Caches.tracked(Dedup.q25Docs(input))
      val block = rows(Dedup.q25BlockPairs(docs))
      val index = rows(Dedup.q25IndexPairs(docs))
      graft.Caches.releaseAll()
      assert(block == index,
        s"$tag: forms diverge; block-only=${(block -- index).take(3)} " +
          s"index-only=${(index -- block).take(3)}")
    }
  }

  test("chooser picks the block join on closed vocabularies and the index on open ones") {
    val closed = graft.Caches.tracked(Dedup.q25Docs(closedVocabDocs()))
    val (pbC, piC) = Dedup.q25PairFanout(closed)
    graft.Caches.releaseAll()
    assert(piC >= pbC, s"closed-vocab fixture must favor the block join ($piC vs $pbC)")

    val open = graft.Caches.tracked(Dedup.q25Docs(openVocabDocs()))
    val (pbO, piO) = Dedup.q25PairFanout(open)
    graft.Caches.releaseAll()
    assert(piO < pbO, s"open-vocab fixture must favor the inverted index ($piO vs $pbO)")

    // The harness corpus (30-word closed vocabulary) sits on the
    // block side at every scale — the side the round-17 interleaved
    // A/B measured as 1.9× faster at sf1.0.
    val h = graft.Caches.tracked(Dedup.q25Docs(harness("sf0.01")))
    val (pbH, piH) = Dedup.q25PairFanout(h)
    graft.Caches.releaseAll()
    assert(piH >= pbH, s"harness sf0.01 must pick block ($piH vs $pbH)")

    // And the dispatching entry point returns the same rows as both
    // forms on the side it picked — the fixture pair sets are known.
    val viaChooser = rows(Dedup.q25Pairs(openVocabDocs()))
    graft.Caches.releaseAll()
    assert(viaChooser.map(t => (t._2, t._3)) == Set((0L, 1L), (2L, 3L)),
      s"open-vocab planted dups must surface via the chooser, got $viaChooser")
  }
}
