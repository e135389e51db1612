package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q318 MMR diversified rerank, q319 IPS/SNIPS off-policy estimation,
  * q320 Bradley–Terry source strengths — planted-fixture behavior and
  * naive driver-side recomputations of the exact definitions.
  */
class PreferenceRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q318: first pick is the relevance argmax; a planted duplicate of it is demoted below a diverse candidate") {
    import spark.implicits._
    // query q (vec 0) along e1; v1 == v2 are near-q duplicates; v3 is
    // less relevant but diverse; vecs 4..12 are low-sim background so
    // the exact top-10 fills. MMR must pick v1 first (relevance), then
    // v3 (v2's pairwise sim to v1 is 1.0 -> its penalty dominates).
    def vec(parts: (Int, Double)*): Array[Float] = {
      val a = new Array[Float](64)
      parts.foreach { case (i, x) => a(i) = x.toFloat }
      a
    }
    val rows = Seq(
      0L -> vec(0 -> 1.0),
      1L -> vec(0 -> 1.0, 1 -> 0.5),
      2L -> vec(0 -> 1.0, 1 -> 0.5),
      3L -> vec(0 -> 1.0, 2 -> 0.8)) ++
      (4L to 12L).map(i => i -> vec(0 -> 0.1, (10 + i).toInt -> 1.0))
    val tmp = TestSpark.tempDir("mmr")
    rows.toDF("vec_id", "embedding").withColumn("label",
      org.apache.spark.sql.functions.lit(0))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = Evaluation.q318_mmr_rerank(spark, tmp).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toMap // mmr_rank -> neighbor
    graft.Caches.releaseAll()
    Similarity.releaseShared()
    assert(got(1L) == 1L, s"round 1 must be the relevance argmax (v1), got $got")
    assert(got(2L) == 3L,
      s"round 2 must pick the diverse v3 over the duplicate v2, got $got")
    assert(got.values.toSeq.distinct.length == Evaluation.MmrK,
      "selected neighbors must be distinct")
  }

  test("q319: estimates match the naive per-source recomputation; clipping fires on rare sources") {
    import spark.implicits._
    val got = DataPrep.q319_ips_offpolicy(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5), r.getLong(6))))
    val docs = graft.Tables.load(spark, dir, "documents")
      .selectExpr("source", "n_chars", "split(text, ' ') as toks").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2)))
    def pass(nChars: Long, toks: Seq[String]): Long = {
      val ok = nChars >= 200L && nChars <= 450L &&
        toks.distinct.length.toLong * 100L >= toks.length.toLong * 40L
      if (ok) 1L else 0L
    }
    val arms = docs.groupBy(_._1).map { case (s, g) =>
      s -> (g.length.toLong, g.map(d => pass(d._2, d._3)).sum)
    }
    val nn = arms.values.map(_._1).sum
    val ns = arms.size.toLong
    val w = arms.map { case (s, (n, x)) =>
      val raw = math.round(1e6 * nn / (ns * n).toDouble)
      s -> (n, x, math.min(raw, DataPrep.IpsClipMicro), raw > DataPrep.IpsClipMicro)
    }
    val sx = w.values.map(t => t._3 * t._2).sum
    val sn = w.values.map(t => t._3 * t._1).sum
    val ips = math.round(sx.toDouble / nn)
    val snips = math.round(1e6 * sx.toDouble / sn)
    assert(got.length == arms.size)
    got.foreach { case (s, (n, x, wm, cl, i, sp)) =>
      val (en, ex, ew, ecl) = w(s)
      assert(n == en && x == ex && wm == ew && cl == ecl, s"source $s row")
      assert(i == ips && sp == snips, s"source $s estimates")
    }
    // the estimators must genuinely differ somewhere on this fixture
    // OR no weight was clipped (then SNIPS == IPS is the identity)
    val anyClip = got.exists(_._2._4)
    if (!anyClip) assert(math.abs(ips - snips) <= 1)
  }

  test("q320: planted strict quality order ranks sources A > B > C with the MM fit") {
    import spark.implicits._
    // quality via q21's formula: stopword-rich long text scores high,
    // punctuation-dense text scores low. Sources cycle A,B,C on
    // adjacent ids, so every adjacent pair is a cross-source duel.
    val hi = ("the a of and to in is " * 12).trim            // stopword-rich
    val mid = "plain words only here without any stopwords " * 6
    val lo = "!!! ??? ;;; ### $$$ %%% &&& ***"               // punct-heavy
    val docs = (0L until 300L).map { i =>
      val (src, text) = (i % 3) match {
        case 0 => ("srcA", hi)
        case 1 => ("srcB", mid)
        case _ => ("srcC", lo)
      }
      (i, src, text, text.length.toLong)
    }
    val tmp = TestSpark.tempDir("bt")
    docs.toDF("doc_id", "source", "text", "n_chars")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Evaluation.q320_bradley_terry(spark, tmp).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.keySet == Set("srcA", "srcB", "srcC"))
    // A beats B and C; B beats C; C wins nothing
    // tuple = (games, wins, pi_micro, bt_rank)
    assert(rows("srcA")._4 == 1L && rows("srcB")._4 == 2L && rows("srcC")._4 == 3L,
      s"bt_rank order must follow the planted strength, got $rows")
    assert(rows("srcA")._2 > rows("srcB")._2 && rows("srcB")._2 > rows("srcC")._2,
      "win counts must follow the planted order")
    assert(rows("srcA")._3 > rows("srcB")._3 && rows("srcB")._3 > rows("srcC")._3,
      "fitted strengths must follow the planted order")
    assert(rows("srcA")._1 == rows("srcA")._2,
      "srcA plays only duels it wins on this fixture")
    assert(rows("srcC")._2 == 0L, "srcC must win nothing")
    assert(rows("srcA")._1 > 0L && rows("srcB")._1 > 0L)
  }

  test("q320: gapped ids drop their duel, never mispair across the gap (dense-id contract)") {
    import spark.implicits._
    val hi = ("the a of and to in is " * 12).trim
    val lo = "!!! ??? ;;; ### $$$ %%% &&& ***"
    // three adjacent (A,B) pairs separated by wide id gaps, plus a
    // lone trailing id with no successor: exactly 3 duels may form —
    // (0,1),(100,101),(200,201) — and ids across a gap (1,100) must
    // NOT pair even though they are consecutive in id order.
    val docs = Seq(0L, 1L, 100L, 101L, 200L, 201L, 300L).map { i =>
      val (src, text) = if (i % 2 == 0) ("srcA", hi) else ("srcB", lo)
      (i, src, text, text.length.toLong)
    }
    val tmp = TestSpark.tempDir("btgap")
    docs.toDF("doc_id", "source", "text", "n_chars")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Evaluation.q320_bradley_terry(spark, tmp).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.keySet == Set("srcA", "srcB"))
    // tuple = (games, wins, pi_micro, bt_rank)
    assert(rows("srcA")._1 == 3L && rows("srcB")._1 == 3L,
      s"exactly the 3 intra-gap duels must form (no cross-gap pairs), got $rows")
    assert(rows("srcA")._2 == 3L && rows("srcB")._2 == 0L,
      s"srcA (stopword-rich) wins every duel, got $rows")
    assert(rows("srcA")._4 == 1L && rows("srcB")._4 == 2L)
  }

  test("q325: reranks ONLY the IVF-probed candidates; rank 1 is their relevance argmax; list sizes and distinctness hold") {
    val stage1 = Similarity.q49_ivf_seeded(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))) // q_id, neighbor, sim
    graft.Caches.releaseAll()
    Similarity.releaseShared()
    val got = Evaluation.q325_twostage_rerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) // q_id, rank, neighbor
    graft.Caches.releaseAll()
    Similarity.releaseShared()
    assert(got.nonEmpty)
    val candSet = stage1.groupBy(_._1).map { case (q, g) =>
      q -> g.map(_._2).toSet }
    got.groupBy(_._1).foreach { case (q, g) =>
      // stage 2 must be a pure rerank of stage 1's bounded candidates
      assert(g.map(_._3).toSet.subsetOf(candSet(q)),
        s"q $q reranked a non-candidate")
      assert(g.length == math.min(Evaluation.MmrK, candSet(q).size),
        s"q $q list size")
      assert(g.map(_._3).distinct.length == g.length, s"q $q duplicates")
      // round 1 is pure relevance: max sim, neighbor-id tie-break
      val best = stage1.filter(_._1 == q).maxBy(c => (c._3, -c._2))
      assert(g.find(_._2 == 1L).get._3 == best._2, s"q $q rank-1 pick")
    }
  }
}
