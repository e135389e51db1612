package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q313 Fellegi–Sunter linkage and q314 Cohen's kappa against naive
  * driver-side recomputations of their exact definitions.
  */
class RecordLinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q313: banded candidates equal the naive all-pairs answer; weights are the FS log-odds sums") {
    import spark.implicits._
    val got = Dedup.q313_record_linkage(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getLong(5), r.getString(6)))
    graft.Caches.releaseAll()
    val cust = graft.Tables.load(spark, dir, "customer")
      .selectExpr("c_custkey", "cast(c_nationkey as long) as c_nationkey",
        "c_mktsegment", "cast(round(c_acctbal * 100) as long) as bal")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val n = cust.length.toLong
    val delta = math.max(1L, 2L * Dedup.BalDomainCents / n)
    // exact u's, same arithmetic as the operator
    def uCat[T](f: ((Long, Long, String, Long)) => T): Double = {
      val num = cust.groupBy(f).map { case (_, g) =>
        g.length.toLong * (g.length - 1L)
      }.sum
      num.toDouble / (n.toDouble * (n - 1L).toDouble)
    }
    val uNat = uCat(_._2); val uSeg = uCat(_._3)
    val uBal = (delta / 4.0) / Dedup.BalDomainCents.toDouble
    def w(m: Double, u: Double): (Long, Long) = (
      math.round(1000.0 * math.log(m / u) / math.log(2.0)),
      math.round(1000.0 * math.log((1.0 - m) / (1.0 - u)) / math.log(2.0)))
    val (wNatA, wNatD) = w(0.92, uNat)
    val (wSegA, wSegD) = w(0.85, uSeg)
    val (wBalA, wBalD) = w(0.88, uBal)
    // near-pairs: all pairs with strictly increasing balance within
    // delta; exact ties: the id-successor CHAIN inside each tie group
    // (the operator's linear-by-construction tie convention)
    val nearPairs = for {
      a <- cust; b <- cust
      if b._4 - a._4 > 0 && b._4 - a._4 <= delta
    } yield (a, b)
    val tiePairs = cust.groupBy(_._4).values.flatMap { g =>
      val sorted = g.sortBy(_._1)
      sorted.zip(sorted.drop(1))
    }
    val naive = (nearPairs ++ tiePairs).map { case (a, b) =>
      val agreeNat = a._2 == b._2
      val agreeSeg = a._3 == b._3
      val agreeBal = b._4 - a._4 <= delta / 8
      val wt = (if (agreeNat) wNatA else wNatD) +
        (if (agreeSeg) wSegA else wSegD) +
        (if (agreeBal) wBalA else wBalD)
      val verdict = if (wt >= 4000L) "match"
        else if (wt >= 0L) "possible" else "non-match"
      (a._1, b._1, agreeNat, agreeSeg, agreeBal, wt, verdict)
    }.toSet
    assert(got.toSet == naive)
    assert(got.length == naive.size) // each pair emitted exactly once
    assert(naive.nonEmpty)
    // agreement on everything must always out-score agreement on nothing
    assert(wNatA + wSegA + wBalA > wNatD + wSegD + wBalD)
  }

  test("q314: kappa matches the naive confusion-matrix recomputation; marginals are consistent") {
    import spark.implicits._
    val rows = Evaluation.q314_rater_agreement(spark, dir).collect()
    val docs = graft.Tables.load(spark, dir, "documents")
      .selectExpr("n_chars", "split(text, ' ') as toks").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    def ra(nChars: Long): Long =
      if (nChars < 250) 0L else if (nChars < 380) 1L else 2L
    def rb(toks: Seq[String]): Long = {
      val d = toks.distinct.length.toLong * 100L
      val t = toks.length.toLong
      if (d >= t * 52L) 0L else if (d >= t * 40L) 1L else 2L
    }
    val rated = docs.map { case (nc, ts) => (ra(nc), rb(ts)) }
    val n = rated.length.toLong
    val nA = (0L to 2L).map(k => rated.count(_._1 == k).toLong)
    val nB = (0L to 2L).map(k => rated.count(_._2 == k).toLong)
    val nDiag = (0L to 2L).map(k => rated.count(p => p._1 == k && p._2 == k).toLong)
    val sumDiag = nDiag.sum
    val sumRc = (0 to 2).map(k => nA(k) * nB(k)).sum
    val kappaBp =
      math.round(10000.0 * (n * sumDiag - sumRc) / (n * n - sumRc))
    assert(rows.length == 3)
    rows.foreach { r =>
      val k = r.getLong(0).toInt
      assert(r.getLong(1) == nA(k) && r.getLong(2) == nB(k) &&
        r.getLong(3) == nDiag(k))
      assert(r.getLong(4) == math.round(10000.0 * sumDiag / n))
      assert(r.getLong(5) == math.round(10000.0 * sumRc / (n * n)))
      assert(r.getLong(6) == kappaBp)
    }
    assert(nA.sum == n && nB.sum == n)
  }

  test("q313: constant-balance degenerate table stays linear — N-1 chained tie pairs, never C(N,2)") {
    import spark.implicits._
    // the round-13 allowlist scenario: every record shares ONE exact
    // balance. All-tie-pairs would emit C(500,2)=124,750 rows; the
    // chain convention must emit exactly 499.
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD")
    val dir = graft.TestSpark.tempDir("fs_constbal")
    (0L until 500L).map(i => (i, i % 25L, segs((i % 5L).toInt), 1234.56))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .selectExpr("c_custkey", "'x' as c_name", "cast(c_nationkey as int) as c_nationkey",
        "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val rows = Dedup.q313_record_linkage(spark, dir).collect()
    graft.Caches.releaseAll()
    assert(rows.length == 499, s"expected the 499-pair chain, got ${rows.length}")
    // the chain is consecutive ids, each pair emitted once, all exact
    // ties agree on balance
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted ==
      (0L until 499L).map(i => (i, i + 1)))
    assert(rows.forall(_.getBoolean(4)), "exact ties must agree on balance")
  }

  test("q313: planted near-identical records classify as match; unrelated same-band records do not") {
    import spark.implicits._
    // 400 background customers spread across nations/segments/balances,
    // plus two planted pairs: same nation+segment, balances 3 cents
    // apart (full agreement on every comparison field).
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD")
    val bg = (0L until 400L).map { i =>
      (i, i % 25L, segs((i % 5L).toInt), -900.0 + i * 27.13)
    }
    val planted = Seq(
      (1000L, 7L, "BUILDING", 5000.00), (1001L, 7L, "BUILDING", 5000.03),
      (1002L, 3L, "MACHINERY", 8000.00), (1003L, 3L, "MACHINERY", 8000.03))
    val dir = graft.TestSpark.tempDir("fs_linkage")
    (bg ++ planted).toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .selectExpr("c_custkey", "'x' as c_name", "cast(c_nationkey as int) as c_nationkey",
        "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val rows = Dedup.q313_record_linkage(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(6))).toMap
    graft.Caches.releaseAll()
    assert(rows.get((1000L, 1001L)).contains("match"))
    assert(rows.get((1002L, 1003L)).contains("match"))
    // no unrelated pair with zero field agreements may reach "match"
    val naiveFields = (bg ++ planted).map(c => (c._1, (c._2, c._3))).toMap
    val falseMatches = rows.collect { case ((a, b), "match")
      if !Set((1000L, 1001L), (1002L, 1003L)).contains((a, b)) &&
        naiveFields(a)._1 != naiveFields(b)._1 &&
        naiveFields(a)._2 != naiveFields(b)._2 => (a, b) }
    assert(falseMatches.isEmpty,
      s"zero-agreement pairs classified as match: $falseMatches")
  }
}
