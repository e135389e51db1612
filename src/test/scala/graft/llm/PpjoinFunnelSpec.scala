package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The q341/q342 funnel audits + the PPJoin positional filter's
  * losslessness. Since round 17 both funnels also carry full DuckDB
  * oracles (the shingle hash and the affine minhash family are
  * replayed in SQL); this spec pins the properties the oracles use as
  * axioms — the positional filter's losslessness and funnel-verified
  * ≡ q73 — plus the banded funnel's internal consistency.
  */
class PpjoinFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("positional filter is LOSSLESS: verified pairs identical with the filter on and off") {
    import spark.implicits._
    val input = graft.Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "text")
    val (docs, prefix) = Dedup.prefixIndex(input)
    def verify(cand: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = cand
      .join(docs.select($"doc_id".as("doc_a"), $"sh".as("sha")), "doc_a")
      .join(docs.select($"doc_id".as("doc_b"), $"sh".as("shb")), "doc_b")
      .select($"doc_a", $"doc_b", $"sha", $"shb")
      .as[(Long, Long, Array[Long], Array[Long])]
      .collect()
      .flatMap { case (a, b, sa, sb) =>
        val i = sa.intersect(sb).length
        if (2L * i >= sa.length + sb.length - i) Some((a, b)) else None
      }.toSet
    val noPos = verify(Dedup.prefixCandidates(prefix, positional = false))
    val withPos = verify(Dedup.prefixCandidates(prefix, positional = true))
    graft.Caches.releaseAll()
    assert(withPos == noPos,
      s"positional filter dropped true pairs: ${(noPos -- withPos).take(5)}")
    assert(noPos.nonEmpty, "fixture must produce at least one J >= 0.5 pair")
  }

  test("q341 funnel: stages are monotone and verified count equals q73's output") {
    val row = Dedup.q341_simjoin_funnel(spark, dir).collect()
    graft.Caches.releaseAll()
    assert(row.length == 1)
    val r = row(0)
    val (nDocs, ix, candPre, candPos, verified) =
      (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(ix > 0 && candPre >= candPos && candPos >= verified,
      r.toString)
    assert(r.getLong(6) == math.round(10000.0 * (candPre - candPos)
      / math.max(candPre, 1L)), "cut bp")
    assert(r.getLong(7) == math.round(10000.0 * verified
      / math.max(candPos, 1L)), "precision bp")
    val q73n = Dedup.q73_prefix_jaccard(spark, dir).count()
    graft.Caches.releaseAll()
    assert(verified == q73n, s"funnel verified=$verified vs q73=$q73n")
    val docs = graft.Tables.load(spark, dir, "documents").count()
    assert(nDocs <= docs && nDocs > 0)
  }

  test("q342 banded funnel: stages consistent, verified ⊆ candidates ∩ truth, truth equals q73") {
    val row = Dedup.q342_lshband_funnel(spark, dir).collect()
    graft.Caches.releaseAll()
    assert(row.length == 1)
    val r = row(0)
    val (nDocs, bandRows, cand, verified, truth) =
      (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(bandRows == nDocs * Dedup.NumBands, "16 band rows per doc")
    assert(verified <= cand, "verified pairs are a subset of candidates")
    assert(verified <= truth, "banded recall can never exceed the exact dual")
    assert(r.getLong(6) == math.round(10000.0 * verified / math.max(cand, 1L)),
      "precision bp")
    assert(r.getLong(7) == math.round(10000.0 * verified / math.max(truth, 1L)),
      "recall bp")
    val q73n = Dedup.q73_prefix_jaccard(spark, dir).count()
    graft.Caches.releaseAll()
    assert(truth == q73n, s"truth=$truth vs q73=$q73n")
  }
}
