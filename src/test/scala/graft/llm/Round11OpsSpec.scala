package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Fixture-driven invariants for the round-11 operators (q281–q286):
  * planted hard negatives, the leakage-free-split structural
  * guarantee, span-exact decontamination on a planted overlap,
  * mirror-cluster counting, hand-computed standardization stats, and
  * the eval-overlap rate on a planted memorized doc.
  */
class Round11OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("hard negatives: planted duplicate vector is the positive, margin orders pairs") {
    import spark.implicits._
    // query 0 (vec_id 0 hits the %50 filter); vec 100 is an exact copy
    // with the SAME label (positive sim 1e6); vec 101 is the same copy
    // with a DIFFERENT label (hard negative sim 1e6 → margin 0); the
    // rest are orthogonal-ish noise
    val rnd = new scala.util.Random(7)
    val base = Array.fill(64)(rnd.nextFloat() - 0.5f)
    val rows = Seq(
      (0L, base, 0), (100L, base, 0), (101L, base, 1)) ++
      (1 until 40).map(i =>
        (i.toLong + 1, Array.fill(64)(rnd.nextFloat() - 0.5f), i % 3))
    val tmp = TestSpark.tempDir("hardneg")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = Similarity.q281_hard_negatives(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    val q0 = out(0L)
    assert(q0.getLong(2) == 100L, "positive must be the same-label exact copy")
    assert(q0.getLong(3) == 1000000L)
    assert(q0.getLong(4) == 101L, "hard negative must be the cross-label exact copy")
    assert(q0.getLong(5) == 1000000L)
    assert(q0.getLong(6) == 0L, "planted pos/neg tie ⇒ zero margin")
  }

  test("cluster split: no near-dup pair straddles a split, counts cover the corpus") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, dir, "documents")
    val member = Dedup.clusterSplits(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toList
    val splitOf = member.map(m => m._1 -> m._3).toMap
    val pairs = Dedup.q23_minhash_dedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus plants near-dups")
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) == splitOf(b),
        s"near-dup pair ($a, $b) must share a split: ${splitOf(a)} vs ${splitOf(b)}")
    }
    // same-cluster docs share a split by construction; totals cover corpus
    member.groupBy(_._2).foreach { case (_, ms) =>
      assert(ms.map(_._3).distinct.size == 1)
    }
    assert(member.size == docs.count())
    // and the aggregate query reports the same totals
    val agg = Dedup.q282_cluster_split(spark, dir).collect()
    assert(agg.map(_.getLong(1)).sum == member.size)
    assert(agg.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("decontam spans: a train doc sharing an 8-gram run with an eval doc is cut, clean docs are not") {
    import spark.implicits._
    val m = DataPrep.EvalModulus // 17: doc 0 is eval, 1..16 are train
    // doc 0 (EVAL) and doc 1 (train) share words 3..12 (10 words → three
    // 8-gram starts at train positions 3,4,5 → one span [3, 12]); doc 2
    // is clean
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (0L, s"e1 e2 $shared e13 e14"),
      (1L, s"t1 t2 $shared t13 t14 t15"),
      (2L, (1 to 20).map(i => s"u$i").mkString(" "))).toDF("doc_id", "text")
    val tmp = TestSpark.tempDir("decontam")
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val spans = Dedup.q283_decontam_spans(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSet == Set((1L, 3L, 12L, 3L)),
      s"exactly the planted train-side span must be flagged, got ${spans.toList}")
  }

  test("mirror clusters: a 3-copy cluster across 2 sources and 2 langs is counted") {
    import spark.implicits._
    val text = (1 to 80).map(i => s"w$i").mkString(" ")
    val noise = (0 until 30).map { i =>
      var h = i.toLong * 2654435761L + 17
      val words = (0 until 60).map { j =>
        h = h * 6364136223846793005L + 1442695040888963407L
        "n" + ((h >>> 40) % 1000)
      }
      (1000L + i, words.mkString(" "), "en", "srcZ")
    }
    val rows = Seq(
      (1L, text, "en", "srcA"), (2L, text, "fr", "srcA"), (3L, text, "en", "srcB")
    ) ++ noise
    val tmp = TestSpark.tempDir("mirror")
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Dedup.q284_mirror_clusters(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == Set((1L, 3L, 2L, 2L)),
      s"one planted mirror cluster expected, got ${out.toList}")
  }

  test("embedding standardization: hand-computed per-dim stats on a 3-vector fixture") {
    import spark.implicits._
    // dim 0 values: 0.1, 0.2, 0.3 → micro 100000/200000/300000:
    // mean 200000, var = (3·Σx²−(Σx)²)/9 in e-12 units
    val v = (x0: Float) => (x0 +: Array.fill(63)(0.0f)).toArray
    val tmp = TestSpark.tempDir("standardize")
    Seq((0L, v(0.1f), 0), (1L, v(0.2f), 0), (2L, v(0.3f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val d0 = Similarity.q285_embedding_standardize(spark, tmp).collect()
      .find(_.getLong(0) == 0L).get
    assert(d0.getLong(1) == 3L)
    assert(d0.getLong(2) == 200000L, "mean of 0.1/0.2/0.3 in micro units")
    val sx = 100000L + 200000L + 300000L
    val sxx = 100000L * 100000L + 200000L * 200000L + 300000L * 300000L
    val expectedVar = math.round((3.0 * sxx - sx.toDouble * sx) / 9.0)
    assert(d0.getLong(3) == expectedVar)
    assert(d0.getLong(4) == 100000L && d0.getLong(5) == 300000L)
  }

  test("IVFPQ recall@10 beats the probe fraction; rerank output is exact cosine") {
    val exact = Similarity.q26_ann_topk(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val rows = Similarity.q287_ivfpq_topk(spark, dir).collect()
    val ivfpq = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(ivfpq.nonEmpty)
    val recalls = exact.map { case (q, ex) =>
      ivfpq.get(q).map(ap => ap.intersect(ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"IVFPQ recall@10 should beat its probe fraction, got $mean")
    // the final ranking is EXACT cosine on the survivors: every
    // reported sim_micro must equal the exact pair cosine q26 computes
    val exactSims = Similarity.q26_ann_topk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    rows.foreach { r =>
      val k = (r.getLong(0), r.getLong(2))
      exactSims.get(k).foreach(s => assert(s == r.getLong(3),
        s"rerank sim for $k must be the exact cosine"))
    }
  }

  test("eval n-gram overlap: fully-copied eval doc scores 10000 bp, novel doc 0 bp") {
    import spark.implicits._
    val m = DataPrep.EvalModulus
    val copied = (1 to 12).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (0L, copied),                                    // eval, fully in train
      (m.toLong, (1 to 12).map(i => s"z$i").mkString(" ")), // eval, novel
      (1L, s"pre $copied post")                        // train superset
    ).toDF("doc_id", "text")
    val tmp = TestSpark.tempDir("evaloverlap")
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Dedup.q286_eval_ngram_overlap(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((5L, 5L, 10000L)), s"copied eval doc: ${out(0L)}")
    assert(out(m.toLong) == ((5L, 0L, 0L)), s"novel eval doc: ${out(m.toLong)}")
  }
  test("cluster chain audit: planted A~B~C chain surfaces the weak A-C pair") {
    import spark.implicits._
    // A differs from B in words 0..7, C from B in words 8..15: the
    // 3-gram-shingle Jaccards are J(A,B)=30/46~0.65, J(B,C)=28/48~0.58
    // (both above the 0.5 pair threshold) but J(A,C)=22/54~0.41 below
    // it: the cluster {A,B,C} exists only by chaining, and the audit
    // must say so
    val words = (1 to 40).map(i => s"w$i").toArray
    val a = words.mkString(" ")
    val b = words.zipWithIndex.map { case (w, i) =>
      if (i < 8) s"b$i" else w }.mkString(" ")
    val c = words.zipWithIndex.map { case (w, i) =>
      if (i < 8) s"b$i" else if (i < 16) s"c$i" else w }.mkString(" ")
    val noise = (100 to 140).map(i =>
      (i.toLong, (1 to 40).map(j => s"n${i}_$j").mkString(" ")))
    val tmp = graft.TestSpark.tempDir("chainaudit")
    ((Seq((0L, a), (1L, b), (2L, c)) ++ noise))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.q23_minhash_dedup(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 2L)),
      "fixture requires LSH to surface both strong edges")
    assert(!pairs.contains((0L, 2L)), "A-C must be below the pair threshold")
    val out = Dedup.q291_cluster_chain_audit(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    val cl = out(0L) // cluster id = min doc_id
    assert(cl.getLong(1) == 3L, "chain cluster has all three docs")
    assert(cl.getLong(2) == 3L, "three intra-cluster pairs")
    assert(cl.getLong(3) == 1L, "exactly the A-C pair is weak")
    // min pair similarity is the exact 3-gram-shingle J(A,C): shared
    // trigrams start only inside words 16..39 -> 22 of union 54
    assert(cl.getLong(4) == math.round(10000.0 * 22 / 54))
  }
  test("pair mutation map: single planted edit localizes to one position") {
    import spark.implicits._
    val words = (1 to 40).map(i => s"w$i").toArray
    val a = words.mkString(" ")
    val b = words.updated(5, "EDIT").mkString(" ")
    val noise = (100 to 130).map(i =>
      (i.toLong, (1 to 40).map(j => s"n${i}_$j").mkString(" ")))
    val tmp = graft.TestSpark.tempDir("mutmap")
    (Seq((0L, a), (1L, b)) ++ noise).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Dedup.q304_pair_mutation_map(spark, tmp).collect()
    assert(out.length == 1, "exactly the planted pair")
    val r = out(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(r.getLong(3) == 40L && r.getLong(4) == 40L)
    assert(r.getLong(5) == 1L, "one differing position")
    assert(r.getLong(6) == 6L && r.getLong(7) == 6L,
      "the edit sits at 1-based position 6")
  }

  test("threshold opt: perfectly separable scores give F1 = 1000 at zero errors") {
    import spark.implicits._
    val stop = "the a of and to in is"
    val pos = (0 until 8).map(i =>
      (i.toLong, s"data $stop $stop $stop $stop $stop"))
    val neg = (100 until 110).map(i =>
      (i.toLong, "!!! ??? ;;; ::: %%% @@@"))
    val tmp = graft.TestSpark.tempDir("thropt")
    (pos ++ neg).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = TextAnalysis.q305_threshold_opt(spark, tmp).collect()(0)
    assert(r.getLong(1) == 8L && r.getLong(2) == 0L && r.getLong(3) == 0L,
      s"perfect separation: $r")
    assert(r.getLong(4) == 1000L)
  }
}
