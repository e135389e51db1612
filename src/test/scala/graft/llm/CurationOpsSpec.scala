package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Invariants of the round-10 curation operators (q208–q216) beyond
  * the DuckDB oracle's value equality: distribution identities on
  * fabricated fixtures, budget conservation, funnel monotonicity,
  * DP-noise shape, and planted-pair detection for the bitext miner.
  */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("source divergence: TV is zero when every source shares one distribution, bounded by 10000 always") {
    import spark.implicits._
    val tmp = TestSpark.tempDir("tv_zero")
    val txt = "alpha beta gamma alpha"
    (0 until 40).map(i => (i.toLong, txt, "en", s"src${i % 2}", txt.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val zero = TextAnalysis.q208_source_divergence(spark, tmp).collect()
    assert(zero.length == 2)
    assert(zero.forall(_.getLong(3) == 0L),
      "identical per-source distributions must have TV = 0")

    val real = TextAnalysis.q208_source_divergence(spark, dir).collect()
    assert(real.nonEmpty)
    assert(real.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 10000L))
  }

  test("k-anonymity audit: class sizes partition the joined fact and flags match thresholds") {
    val rows = DataPrep.q209_k_anonymity(spark, dir).collect()
    assert(rows.nonEmpty)
    val totalOrders = graft.Tables.load(spark, dir, "orders").count()
    assert(rows.map(_.getLong(2)).sum == totalOrders,
      "equivalence classes must partition the released join")
    assert(rows.forall { r =>
      (r.getInt(4) == 1) == (r.getLong(2) >= 5) &&
        (r.getInt(5) == 1) == (r.getLong(3) >= 3)
    })
  }

  test("DP noisy counts: noise is bounded, deterministic, and roughly a third of draws are zero") {
    val a = DataPrep.q210_dp_noisy_counts(spark, dir).collect()
    val b = DataPrep.q210_dp_noisy_counts(spark, dir).collect()
    assert(a.nonEmpty)
    assert(a.map(_.toSeq) === b.map(_.toSeq), "seeded noise must be replayable")
    assert(a.forall(r => math.abs(r.getLong(3)) <= 40L))
    assert(a.forall(r => r.getLong(4) >= 0L), "released counts are clamped at zero")
    // central mass of the two-sided geometric with alpha=1/2 is 1/3
    val zeroShare = a.count(_.getLong(3) == 0L).toDouble / a.length
    assert(zeroShare > 0.15 && zeroShare < 0.55, s"P(noise=0) ~ 1/3, got $zeroShare")
  }

  test("bitext margin: a planted identical target is its source's best match") {
    import spark.implicits._
    val tmp = TestSpark.tempDir("bitext")
    def basis(i: Int): Seq[Float] =
      (0 until 8).map(d => if (d == i) 1.0f else 0.0f)
    val vecs = Seq(
      (0L, basis(0), 0), (5L, basis(1), 0), (10L, basis(2), 0),
      (15L, basis(0), 1), (20L, basis(3), 1), (25L, basis(4), 1))
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = Similarity.q211_bitext_margin(spark, tmp).collect()
    assert(rows.length == 3, "one best match per source vector")
    val best = rows.find(_.getLong(0) == 0L).get
    assert(best.getLong(1) == 15L, "planted copy must win the margin rerank")
    assert(best.getLong(2) == 1000000L, "identical vectors have cosine 1")
  }

  test("distinct-ngram diversity: ratios are bounded and a degenerate source craters") {
    import spark.implicits._
    val tmp = TestSpark.tempDir("ttr")
    val rep = Array.fill(50)("spam").mkString(" ")
    val varied = (0 until 50).map(i => s"w$i").mkString(" ")
    Seq((0L, rep, "en", "dull", rep.length.toLong),
      (1L, varied, "en", "rich", varied.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = TextAnalysis.q212_distinct_ngrams(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("dull").getLong(3) < 500L, "all-repeat source has near-zero TTR")
    assert(rows("rich").getLong(3) == 10000L, "all-distinct source has TTR 1")
    val real = TextAnalysis.q212_distinct_ngrams(spark, dir).collect()
    assert(real.forall(r => r.getLong(2) <= r.getLong(1) &&
      r.getLong(5) <= r.getLong(4) && r.getLong(3) <= 10000L && r.getLong(6) <= 10000L))
  }

  test("filter funnel: stage survivors are monotonically non-increasing") {
    val rows = DataPrep.q213_filter_funnel(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val (n, p1, p2, p3, p4) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      n >= p1 && p1 >= p2 && p2 >= p3 && p3 >= p4 && p4 >= 0
    })
  }

  test("soft dedup: duplicated content scores more common than unique content; weights bounded") {
    import spark.implicits._
    val tmp = TestSpark.tempDir("softdedup")
    val dup = "one two three four five six"
    val docs = Seq(
      (0L, dup, "en", "a", dup.length.toLong),
      (1L, dup, "en", "a", dup.length.toLong)) ++
      (2 until 6).map { i =>
        val t = s"u${i}a u${i}b u${i}c u${i}d u${i}e"
        (i.toLong, t, "en", "a", t.length.toLong)
      }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Dedup.q214_soft_dedup(spark, tmp).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).getLong(4) == 2000L, "all grams shared twice => commonness 2.0")
    assert(byId(0L).getLong(5) == 5000L, "=> weight 0.5")
    assert(byId(2L).getLong(4) == 1000L, "unique doc => commonness 1.0")
    assert(rows.forall(r => r.getLong(5) <= 10000L),
      "df >= 1 everywhere, so weights never exceed 1.0")
  }

  test("repeat-epochs allocator: grants conserve the budget exactly and respect the 4-epoch cap") {
    val rows = DataPrep.q215_repeat_epochs(spark, dir).collect()
    assert(rows.nonEmpty)
    val corpus = rows.map(_.getLong(1)).sum
    assert(rows.map(_.getLong(3)).sum == 2 * corpus,
      "budget 2x corpus is strictly less than the 4x cap sum, so grants must exhaust it")
    assert(rows.forall(r => r.getLong(3) <= 4 * r.getLong(1)))
    assert(rows.forall(r => r.getLong(4) <= 4000L))
    // greedy order: once one source is partially funded, the rest get zero
    val grants = rows.map(r => (r.getLong(3), r.getLong(1)))
    val firstPartial = grants.indexWhere { case (g, u) => g < 4 * u }
    assert(grants.drop(firstPartial + 1).forall(_._1 == 0L),
      "allocation is a prefix of the quality ranking")
  }

  test("tokenizer fertility: subwords never undercount words and all languages report") {
    val rows = TextAnalysis.q216_tokenizer_fertility(spark, dir).collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r.getLong(4) >= 1000L),
      "the lexer splits every word into at least one subword")
    assert(rows.forall(r => r.getLong(5) > 0L))
  }

  test("memorization rate: a fully-copied doc scores 10000, unique docs score 0") {
    import spark.implicits._
    val tmp = TestSpark.tempDir("memrate")
    val copied = (0 until 12).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (0L, copied, "en", "a", copied.length.toLong),
      (1L, copied, "en", "b", copied.length.toLong)) ++
      (2 until 5).map { i =>
        val t = (0 until 12).map(j => s"u${i}_$j").mkString(" ")
        (i.toLong, t, "en", "a", t.length.toLong)
      }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val byId = Dedup.q217_memorization_rate(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byId(0L) == 10000L && byId(1L) == 10000L,
      "every 8-gram of a verbatim copy is shared")
    assert(byId(2L) == 0L, "unique docs share no 8-grams")
  }

  test("ngram novelty: a copied candidate is 0-novel, a fresh candidate is fully novel") {
    import spark.implicits._
    val tmp = TestSpark.tempDir("novelty")
    val refText = (0 until 10).map(i => s"r$i").mkString(" ")
    val fresh = (0 until 10).map(i => s"f$i").mkString(" ")
    Seq(
      (0L, refText, "en", "src0", refText.length.toLong), // copied from reference
      (1L, fresh, "en", "src0", fresh.length.toLong),     // nothing shared
      (2L, refText, "en", "src1", refText.length.toLong)) // the reference corpus
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val byId = DataPrep.q218_ngram_novelty(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byId(0L) == 0L, "verbatim reference copy has zero novelty")
    assert(byId(1L) == 10000L, "disjoint-vocab candidate is fully novel")
    assert(!byId.contains(2L), "reference docs are not scored")
  }

  test("embedding drift: identical halves drift zero at cosine one; disjoint halves drift") {
    import spark.implicits._
    val tmp = TestSpark.tempDir("embdrift")
    def vec(i: Int): Seq[Float] = (0 until 8).map(d => if (d == i) 1.0f else 0.0f)
    // label 0: even and odd ids identical => zero drift;
    // label 1: halves on different axes => nonzero L2, cosine 0
    val vecs = Seq(
      (0L, vec(0), 0), (1L, vec(0), 0), (2L, vec(0), 0), (3L, vec(0), 0),
      (10L, vec(1), 1), (11L, vec(2), 1), (12L, vec(1), 1), (13L, vec(2), 1))
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = DataPrep.q219_embedding_drift(spark, tmp).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(rows(0).getLong(3) == 0L, "identical halves: zero centroid shift")
    assert(rows(0).getLong(4) == 1000000L, "identical halves: cosine 1")
    assert(rows(1).getLong(3) > 0L, "disjoint halves must show L2 drift")
    assert(rows(1).getLong(4) == 0L, "orthogonal centroids: cosine 0")
  }

  test("source dedup matrix: a planted cross-source duplicate lands in its normalized cell") {
    import spark.implicits._
    val tmp = TestSpark.tempDir("srcmatrix")
    val dup = (0 until 12).map(i => s"d$i").mkString(" ")
    val docs = Seq(
      (0L, dup, "en", "zzz_mirror", dup.length.toLong),
      (1L, dup, "en", "aaa_origin", dup.length.toLong)) ++
      (2 until 6).map { i =>
        val t = (0 until 12).map(j => s"u${i}_$j").mkString(" ")
        (i.toLong, t, "en", "aaa_origin", t.length.toLong)
      }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Dedup.q220_source_dedup_matrix(spark, tmp).collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "aaa_origin" && rows(0).getString(1) == "zzz_mirror",
      "cells normalize to (least, greatest) source order")
    assert(rows(0).getLong(2) == 1L && rows(0).getLong(3) == 10000L)
  }

  test("temperature mixture: alpha < 1 boosts small languages, shares renormalize") {
    val rows = DataPrep.q221_temperature_mixture(spark, dir).collect()
    assert(rows.length == 5)
    val smallest = rows.minBy(_.getLong(1))
    val largest = rows.maxBy(_.getLong(1))
    assert(smallest.getLong(4) >= 1000L, "smallest language must be upsampled")
    assert(largest.getLong(4) <= 1000L, "largest language must be downsampled")
    assert(math.abs(rows.map(_.getLong(3)).sum - 1000000L) <= 5L,
      "temperature shares renormalize to 1")
  }

  test("ann hubness: aggregates are consistent with the exact top-k lists") {
    val topk = Similarity.q26_ann_topk(spark, dir).collect()
      .groupBy(_.getLong(2)).map { case (n, rs) => n -> rs.length }
    val hubs = Similarity.q222_ann_hubness(spark, dir).collect()
    assert(hubs.forall(r => r.getLong(1) >= 2L))
    assert(hubs.forall(r => topk(r.getLong(0)) == r.getLong(1)),
      "hub counts must match the q26 lists exactly")
    assert(topk.count(_._2 >= 2) == hubs.length)
  }

  test("truncation loss: cut mass and cut docs are bounded by their totals") {
    val rows = DataPrep.q223_truncation_loss(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      r.getLong(3) <= r.getLong(2) && r.getLong(4) <= r.getLong(1) &&
        r.getLong(5) <= 10000L
    })
    assert(rows.map(_.getLong(3)).sum > 0L, "the ~55-token mean corpus must overflow a 48-token window")
  }

  test("dp noisy top-k: exactly k per language, replayable, never releases negatives") {
    val a = DataPrep.q224_dp_noisy_topk(spark, dir).collect()
    val b = DataPrep.q224_dp_noisy_topk(spark, dir).collect()
    assert(a.map(_.toSeq) === b.map(_.toSeq))
    assert(a.groupBy(_.getString(0)).forall(_._2.length == 5))
    assert(a.forall(_.getLong(3) >= 0L))
  }

  test("dedup threshold sweep: tighter thresholds never add pairs and all three rows survive") {
    val rows = Dedup.q225_dedup_threshold_sweep(spark, dir).collect()
    assert(rows.length == 3, "zero-count thresholds must stay visible")
    assert(rows.map(_.getLong(0)).toSeq == Seq(5000L, 7000L, 9000L))
    assert(rows(0).getLong(1) >= rows(1).getLong(1) &&
      rows(1).getLong(1) >= rows(2).getLong(1), "pair counts are monotone in the threshold")
    assert(rows(0).getLong(2) >= rows(1).getLong(2) &&
      rows(1).getLong(2) >= rows(2).getLong(2), "doc counts are monotone in the threshold")
  }

  test("winnowing: docs sharing a w+n-1-word run share a fingerprint; disjoint docs share none") {
    import spark.implicits._
    val tmp = TestSpark.tempDir("winnow")
    val shared = (0 until 8).map(i => s"s$i").mkString(" ") // w+n-1 = 4+5-1 = 8
    val a = s"a0 a1 a2 a3 a4 a5 a6 a7 $shared"
    val b = s"$shared b0 b1 b2 b3 b4 b5 b6 b7"
    val c = (0 until 16).map(i => s"c$i").mkString(" ")
    Seq((0L, a, "en", "x", a.length.toLong), (1L, b, "en", "x", b.length.toLong),
      (2L, c, "en", "x", c.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val fps = Dedup.winnowStream(
        graft.Tables.load(spark, tmp, "documents").select($"doc_id", $"text"))
      .select($"doc_id", $"wmin").distinct().collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert((fps(0L) & fps(1L)).nonEmpty,
      "the winnowing guarantee: a shared 8-word run must yield a shared fingerprint")
    assert((fps(0L) & fps(2L)).isEmpty, "no shared 5-grams => no shared fingerprints")
  }

  test("cluster purity: members partition the corpus and purity is consistent") {
    val rows = Similarity.q227_cluster_purity(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = graft.Tables.load(spark, dir, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == total,
      "cluster members must partition the embedding corpus")
    assert(rows.forall { r =>
      r.getLong(4) <= r.getLong(1) && r.getLong(2) >= 1L &&
        r.getLong(5) >= 1L && r.getLong(5) <= 10000L &&
        r.getLong(5) == math.round(10000.0 * r.getLong(4) / r.getLong(1))
    })
  }

  test("winnow candidates: a long shared run surfaces the pair, disjoint docs never pair") {
    import spark.implicits._
    val tmp = TestSpark.tempDir("winnowcand")
    val shared = (0 until 16).map(i => s"s$i").mkString(" ")
    val a = s"a0 a1 a2 a3 $shared"
    val b = s"$shared b0 b1 b2 b3"
    val c = (0 until 24).map(i => s"c$i").mkString(" ")
    Seq((0L, a, "en", "x", a.length.toLong), (1L, b, "en", "x", b.length.toLong),
      (2L, c, "en", "x", c.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Dedup.q228_winnow_candidates(spark, tmp).collect()
    assert(rows.length == 1, "only the shared-run pair is a candidate")
    assert(rows(0).getLong(0) == 0L && rows(0).getLong(1) == 1L)
    assert(rows(0).getLong(2) >= 2L)
  }

  test("dataset card: every card number matches its dedicated operator") {
    val card = CorpusPipeline.q229_dataset_card(spark, dir).collect()(0)
    val docs = graft.Tables.load(spark, dir, "documents")
    assert(card.getLong(0) == docs.count())
    assert(card.getLong(5) ==
      TextAnalysis.q20_exact_dedup(spark, dir).filter("is_dup = 1").count(),
      "exact-dup mass must match q20's keeper rule")
    assert(card.getLong(7) == CorpusPipeline.q39_corpus_curation(spark, dir).count(),
      "survivor count must match the curation chain")
    assert(card.getLong(8) <= 10000L && card.getLong(6) <= 10000L)
  }

  test("epoch schedule: per-source expansion conserves the q215 grants exactly") {
    val grants = DataPrep.q215_repeat_epochs(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val sched = DataPrep.q230_epoch_schedule(spark, dir).collect()
    val bySrc = sched.groupBy(_.getString(0))
    assert(bySrc.forall { case (s, rows) => rows.map(_.getLong(2)).sum == grants(s) },
      "epoch draws must sum to the granted tokens")
    assert(sched.forall(_.getLong(1) <= 4L), "the 4-epoch cap bounds the fan-out")
    assert(grants.filter(_._2 > 0).keySet == bySrc.keySet,
      "every funded source appears; unfunded sources do not")
  }

  test("heaps law: cumulative curves are monotone, vocab never exceeds tokens, beta in [0,1]") {
    val rows = TextAnalysis.q231_heaps_law(spark, dir).collect()
    assert(rows.length == 10, "ten corpus-prefix checkpoints")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) <= b.getLong(1) && a.getLong(2) <= b.getLong(2),
        "token and vocab curves are cumulative")
    }
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
    val beta = rows(0).getLong(3)
    assert(beta >= 0L && beta <= 1000L, s"Heaps beta must land in [0,1], got $beta")
  }

  test("zipf fit: slope of a rank-sorted frequency curve is non-positive, r2 bounded") {
    val row = TextAnalysis.q232_zipf_fit(spark, dir).collect()(0)
    assert(row.getLong(0) >= 10L)
    assert(row.getLong(1) <= 0L, "frequency is non-increasing in rank")
    assert(row.getLong(2) >= 0L && row.getLong(2) <= 1000L)
  }

  test("term burstiness: cf bounds df and the ratio floor is 1.0") {
    val rows = TextAnalysis.q233_term_burstiness(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)), "df <= cf")
    assert(rows.forall(_.getLong(3) >= 1000L), "cf/df >= 1 by construction")
  }

  test("lsh recall curve: detection probability is monotone in J and certain at J=1") {
    val rows = Dedup.q234_lsh_recall_curve(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 1000L))
    val sorted = rows.sortBy(_.getLong(2))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(3), "p_detect must be monotone in j_bp")
    }
    assert(rows.filter(_.getLong(2) == 10000L).forall(_.getLong(3) == 1000L),
      "identical docs are always detected")
  }

  test("dup profile: cluster bins conserve the corpus and count planted duplicates") {
    import spark.implicits._
    val tmp = TestSpark.tempDir("dupprofile")
    val docs = Seq.tabulate(6) { i =>
      val t = if (i < 3) "same text here" else s"unique $i text"
      (i.toLong, t, "en", "a", t.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = TextAnalysis.q235_dup_profile(spark, tmp).collect()
    val bySize = rows.map(r => r.getLong(0) -> r).toMap
    assert(bySize(1L).getLong(1) == 3L && bySize(3L).getLong(1) == 1L)
    assert(rows.map(_.getLong(2)).sum == 6L, "bins must conserve the corpus")
  }

  test("split leakage: a val doc copied from train is fully leaked") {
    import spark.implicits._
    // find one doc id per split under the deterministic rule
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft_split_$id".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val trainId = (0L to 200L).find(bucket(_) < 80).get
    val valId = (0L to 200L).find(b => bucket(b) >= 80 && bucket(b) < 90).get
    val freshId = (0L to 200L).find(b => bucket(b) >= 80 && bucket(b) < 90 && b != valId).get
    val tmp = TestSpark.tempDir("leak")
    val shared = (0 until 10).map(i => s"t$i").mkString(" ")
    val fresh = (0 until 10).map(i => s"f$i").mkString(" ")
    Seq((trainId, shared, "en", "a", shared.length.toLong),
      (valId, shared, "en", "a", shared.length.toLong),
      (freshId, fresh, "en", "a", fresh.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = DataPrep.q236_split_leakage(spark, tmp).collect()
    assert(rows.length == 1, "only the copied doc is flagged")
    assert(rows(0).getLong(1) == valId && rows(0).getLong(4) == 10000L)
  }

  test("knn probe: one prediction per query, consistent with the top-k lists") {
    val probe = Similarity.q237_knn_probe(spark, dir).collect()
    val nQueries = Similarity.q26_ann_topk(spark, dir)
      .select("q_id").distinct().count()
    assert(probe.length == nQueries)
    assert(probe.forall(r => r.getInt(4) == (if (r.getLong(1) == r.getLong(2)) 1 else 0)))
    assert(probe.forall(r => r.getLong(3) >= 1L && r.getLong(3) <= 10L))
  }

  test("excess-loss weights: normalized, floored, and zero-excess for the best source") {
    val rows = TextAnalysis.q238_excess_loss_weights(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(3)).min == 0L, "the best source defines the baseline")
    assert(math.abs(rows.map(_.getLong(4)).sum - 1000000L) <= rows.length,
      "weights renormalize to 1")
    assert(rows.forall(_.getLong(4) > 0L), "the +100 floor keeps every source alive")
    val sorted = rows.sortBy(_.getLong(3))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) <= b.getLong(4), "weights are monotone in excess loss")
    }
  }

  test("shard manifest: xor checksum is partition-invariant and bins conserve the corpus") {
    import spark.implicits._
    val a = DataPrep.q239_shard_manifest(spark, dir).collect()
    assert(a.nonEmpty)
    assert(a.map(_.getLong(2)).sum ==
      graft.Tables.load(spark, dir, "documents").count())
    assert(a.forall(r => r.getLong(4) <= r.getLong(5)), "id ranges are ordered")
    // rewrite the corpus under a different partitioning — every
    // manifest row, including the order-free xor fingerprint, must
    // reproduce exactly
    val tmp = TestSpark.tempDir("manifest_det")
    graft.Tables.load(spark, dir, "documents").repartition(13, $"lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val b = DataPrep.q239_shard_manifest(spark, tmp).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "the manifest is a pure function of the data, not its layout")
  }

  test("rare-token retention: the relative tail is non-empty and types bound tokens") {
    val rows = DataPrep.q240_rare_token_retention(spark, dir).collect()
    assert(rows.nonEmpty, "a relative threshold must find a tail on any profile")
    assert(rows.forall(r => r.getLong(3) <= r.getLong(2)))
  }

  test("perplexity buckets: terciles partition scored docs with ordered ranges") {
    val rows = TextAnalysis.q241_perplexity_buckets(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("head", "middle", "tail"))
    assert(rows("head").getLong(2) <= rows("head").getLong(3))
    assert(rows("head").getLong(3) <= rows("middle").getLong(2) ||
      rows("head").getLong(3) <= rows("middle").getLong(3),
      "head scores sit at or below middle's range")
    assert(rows("middle").getLong(3) <= rows("tail").getLong(3))
    val total = rows.values.map(_.getLong(1)).sum
    assert(total > 0L)
  }

  test("lsh band planner: stricter bands trade recall for precision monotonically") {
    val rows = Dedup.q242_lsh_band_planner(spark, dir).collect().sortBy(_.getInt(0))
    assert(rows.length == 7)
    assert(rows.forall(r => r.getInt(0) * r.getInt(1) == 64), "configs factor the 64 slots")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(3),
        "expected misses grow as rows-per-band grows (stricter match)")
      assert(a.getLong(4) >= b.getLong(4),
        "false-positive area shrinks as rows-per-band grows")
    }
    // the shipped 16x4 scheme must miss (in expectation) under one pair
    // on this corpus's J>=0.5 ground truth... the planner justifies it
    val shipped = rows.find(r => r.getInt(0) == 4 && r.getInt(1) == 16).get
    assert(shipped.getLong(3) <= 1000L, "the shipped 4x16 banding misses <1 expected pair")
  }

  test("quality-dup crosstab: bands partition the corpus and band means are ordered") {
    val rows = TextAnalysis.q243_quality_dup_crosstab(spark, dir).collect()
    val total = graft.Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getLong(2)).sum == total, "cells must partition the corpus")
    val bandMeans = rows.groupBy(_.getString(0)).map { case (b, rs) =>
      b -> rs.map(r => r.getLong(3) * r.getLong(2)).sum / rs.map(_.getLong(2)).sum
    }
    for (pair <- Seq(("q1_low", "q2"), ("q2", "q3"), ("q3", "q4_high")))
      if (bandMeans.contains(pair._1) && bandMeans.contains(pair._2))
        assert(bandMeans(pair._1) <= bandMeans(pair._2),
          s"band means must be ordered: $bandMeans")
  }

  test("new ops lint clean: no cartesian products or corpus-sized single-partition windows") {
    for (df <- Seq(
        TextAnalysis.q208_source_divergence(spark, dir),
        DataPrep.q210_dp_noisy_counts(spark, dir),
        DataPrep.q213_filter_funnel(spark, dir),
        Dedup.q214_soft_dedup(spark, dir),
        Dedup.q217_memorization_rate(spark, dir),
        DataPrep.q218_ngram_novelty(spark, dir),
        DataPrep.q219_embedding_drift(spark, dir),
        Dedup.q220_source_dedup_matrix(spark, dir),
        DataPrep.q223_truncation_loss(spark, dir),
        DataPrep.q224_dp_noisy_topk(spark, dir),
        Dedup.q225_dedup_threshold_sweep(spark, dir),
        Dedup.q226_winnowing_fingerprints(spark, dir),
        Similarity.q227_cluster_purity(spark, dir),
        Dedup.q228_winnow_candidates(spark, dir),
        CorpusPipeline.q229_dataset_card(spark, dir),
        Dedup.q234_lsh_recall_curve(spark, dir),
        TextAnalysis.q235_dup_profile(spark, dir),
        DataPrep.q236_split_leakage(spark, dir)))
      // q237 inherits q26's broadcast-with-self-exclusion-predicate
      // idiom — the documented PlanLint exception for query-batch ANN
      // q215/q230 are excluded by design: their prefix-sum window runs
      // on the |sources|-row aggregate (the documented
      // bounded-by-construction escape, same family as q192/q83)
      assert(graft.plans.PlanLint.lint(df).isEmpty)
  }
}
