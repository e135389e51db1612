package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Properties of the data-prep operators beyond what the DuckDB
  * oracle checks: determinism under repartitioning, budget/stratum
  * invariants, and planted-positive detection on fixture frames.
  */
class DataPrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("stratified sample: kept rows clear their stratum rate and the sample is partition-invariant") {
    import spark.implicits._
    val kept = DataPrep.q41_stratified_sample(spark, dir)
    val rows = kept.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(2) < r.getLong(3)), "h_bp must be < rate_bp")
    // The sample is a pure function of the row — shuffling the input
    // into a different partitioning must not change the kept set.
    val ids = rows.map(_.getLong(0)).toSet
    val docs = graft.Tables.load(spark, dir, "documents").repartition(13, $"lang")
    val tmp = TestSpark.tempDir("sample_det")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val ids2 = DataPrep.q41_stratified_sample(spark, tmp)
      .collect().map(_.getLong(0)).toSet
    assert(ids === ids2, "hash sampling must be deterministic under repartitioning")
  }

  test("importance sample: weights invert the inclusion probability; kept set is partition-invariant") {
    import spark.implicits._
    val rows = DataPrep.q74_importance_sample(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(3) == 100000000L / r.getLong(2)),
      "w_x4 must be the exact integer inverse of quality_bp")
    // higher-quality docs must be over-represented: the mean quality
    // of the kept set exceeds the corpus mean (p proportional to quality)
    val keptMean = rows.map(_.getLong(2)).sum.toDouble / rows.length
    val corpusMean = graft.llm.TextAnalysis.q21_quality_score(spark, dir)
      .agg(avg($"quality_bp")).head().getDouble(0)
    assert(keptMean > corpusMean, s"kept mean $keptMean vs corpus mean $corpusMean")

    val ids = rows.map(_.getLong(0)).toSet
    val docs = graft.Tables.load(spark, dir, "documents").repartition(13, $"lang")
    val tmp = TestSpark.tempDir("wsample_det")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val ids2 = DataPrep.q74_importance_sample(spark, tmp)
      .collect().map(_.getLong(0)).toSet
    assert(ids === ids2, "hash acceptance must be deterministic under repartitioning")
  }

  test("mixture rates: the smallest source keeps rate 1e6 and kept token mass is ~equalized") {
    val rows = DataPrep.q42_mixture_rates(spark, dir).collect()
    assert(rows.nonEmpty)
    val minSrc = rows.minBy(_.getLong(2)) // smallest sum_toks
    assert(minSrc.getLong(3) == 1000000L, "smallest source must be kept whole")
    assert(rows.forall(r => r.getLong(3) <= 1000000L), "rates are probabilities")
    assert(rows.forall(r => r.getLong(4) <= r.getLong(1)), "kept docs <= docs")
  }

  test("pii redact: planted emails/phones are counted and scrubbed from the redacted text") {
    import spark.implicits._
    val rows = DataPrep.q43_pii_redact(spark, dir).collect()
    assert(rows.exists(_.getLong(1) > 0), "docs with doc_id%7==0 carry a planted email")
    assert(rows.exists(_.getLong(2) > 0), "docs with doc_id%11==0 carry a planted phone")
    assert(rows.filter(r => r.getLong(0) % 7 == 0).forall(_.getLong(1) >= 1))
    // Redacting the already-redacted text is a fixed point: rebuild the
    // redacted text directly and scan it for residual matches.
    val redacted = graft.Tables.load(spark, dir, "documents")
      .select(regexp_replace(regexp_replace(
        concat($"text",
          when($"doc_id" % 7 === 0,
            concat(lit(" contact user"), $"doc_id".cast("string"),
              lit("@mail.example.com"))).otherwise(lit("")),
          when($"doc_id" % 11 === 0,
            concat(lit(" tel +33 6 12 34 "), ($"doc_id" % 90 + 10).cast("string")))
            .otherwise(lit(""))),
        DataPrep.EmailRe, "<EMAIL>"), DataPrep.PhoneRe, "<PHONE>").as("t"))
      .filter(size(regexp_extract_all($"t", lit(DataPrep.EmailRe), lit(0))) > 0 ||
        size(regexp_extract_all($"t", lit(DataPrep.PhoneRe), lit(0))) > 0)
    assert(redacted.count() == 0, "no PII pattern may survive redaction")
  }

  test("contamination: a corpus doc copying an eval doc's text is flagged") {
    import spark.implicits._
    val docs = Seq(
      (17L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // verbatim copy
      (5L, "one two three four five six seven eight nine ten")          // clean
    ).toDF("doc_id", "text")
    val flagged = DataPrep.contaminationPairs(docs, $"doc_id" % 17 === 0).collect()
    assert(flagged.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((3L, 17L)))
    assert(flagged.head.getLong(2) >= DataPrep.ContamMinShared)
  }

  test("shard pack: shards are contiguous per lang and every shard except possibly the last stays near budget") {
    import spark.implicits._
    val assigned = DataPrep.shardAssignments(
      graft.Tables.load(spark, dir, "documents")).collect()
    assert(assigned.nonEmpty)
    // shard id must be non-decreasing in doc_id order within a lang
    assigned.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      val byId = rs.sortBy(_.getLong(0))
      val shards = byId.map(_.getLong(4))
      assert(shards.zip(shards.drop(1)).forall { case (a, b) => a <= b },
        s"shards must be monotone within lang=$lang")
      // exclusive-prefix packing: a doc starts a new shard only once the
      // budget is crossed, so tokens-before-doc < budget*(shard+1)
      byId.foreach { r =>
        assert(r.getLong(3) < DataPrep.ShardTokenBudget * (r.getLong(4) + 1))
        assert(r.getLong(3) >= DataPrep.ShardTokenBudget * r.getLong(4))
      }
    }
  }

  test("quantization: codes bounded to int8, the max element saturates, round-trip error within half a step") {
    import spark.implicits._
    val rows = DataPrep.q50_embedding_quantize(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(3) >= -127L && r.getLong(4) <= 127L))
    assert(rows.forall(r => r.getLong(3) == -127L || r.getLong(4) == 127L),
      "the max-|x| element must quantize to ±127")
    // round-trip: dequantized values stay within half a quantization step
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    emb.take(20).foreach { case (_, v) =>
      val scale = math.max(v.map(x => math.abs(x.toDouble)).max, 1e-30)
      v.foreach { x =>
        val q = math.round(x * 127 / scale).toDouble
        assert(math.abs(x - q * scale / 127) <= scale / 254 + 1e-9)
      }
    }
  }

  test("embedding outliers: a planted anti-centroid vector is flagged") {
    import spark.implicits._
    val dim = 8
    // 30 clustered vectors near +e1, one planted at -e1 (cos ~ -1 to
    // the centroid) — the planted one must be the outlier.
    val base = (0 until 30).map { i =>
      (i.toLong, "labA", Array.fill(dim)(0.01f * (i % 3)).updated(0, 1.0f))
    }
    val planted = Seq((99L, "labA", Array.fill(dim)(0.0f).updated(0, -1.0f)))
    val emb = (base ++ planted).toDF("vec_id", "label", "embedding")
    val out = DataPrep.centroidOutliers(emb).collect()
    assert(out.map(_.getLong(1)).toSet === Set(99L), s"got ${out.mkString(",")}")
  }

  test("train/val/test split: exact partition of the corpus, stable under repartitioning") {
    import spark.implicits._
    val out = DataPrep.q130_train_val_test(spark, dir).collect()
    val total = graft.Tables.load(spark, dir, "documents").count()
    assert(out.map(_.getLong(2)).sum == total,
      "every document lands in exactly one split")
    val bySplit = out.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") + bySplit("test"),
      s"80/10/10 shape: $bySplit")
    // pure hash assignment ⇒ identical census from any partitioning
    val docs = graft.Tables.load(spark, dir, "documents").repartition(13, $"lang")
    val tmp = TestSpark.tempDir("split_det")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out2 = DataPrep.q130_train_val_test(spark, tmp).collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      == out2.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq)
  }

  test("q205 DSIR selection: target-mimicking raw doc outranks raw-only doc; target docs never selected") {
    import spark.implicits._
    val docs = Seq(
      (1L, "tgt", "alpha beta gamma delta alpha beta"),
      (2L, "tgt", "alpha gamma epsilon beta delta gamma"),
      (10L, "raw", "alpha beta gamma delta epsilon alpha"), // pure target vocabulary
      (11L, "raw", "alpha noise chatter filler padding junk"), // one target word
      (12L, "raw", "noise chatter filler padding junk static") // no target vocabulary
    ).toDF("doc_id", "source", "text")
    val sel = DataPrep.dsirSelect(docs, col("source") === "tgt", k = 5).collect()
    val ids = sel.map(_.getLong(0)).toList
    assert(!ids.contains(1L) && !ids.contains(2L), "target slice is never re-selected")
    val score = sel.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(score(10L) > score(11L) && score(11L) > score(12L),
      s"affinity must be monotone in target-vocabulary share: $score")
    // raw-only vocabulary has zero target occurrences -> affinity 0
    assert(score(12L) === 0L)
  }

  test("q205 DSIR selection is partition-invariant (integer micro-sums, no float order)") {
    import spark.implicits._
    val base = graft.Tables.load(spark, dir, "documents")
    val a = DataPrep.dsirSelect(base, col("source").isin("src0", "src1"), k = 20)
      .collect().map(_.toSeq).toSeq
    val b = DataPrep.dsirSelect(base.repartition(17, col("lang")),
      col("source").isin("src0", "src1"), k = 20).collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("q206 packing: windows are gapless, full except the last, and conserve every token") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, dir, "documents")
    val totalToks = docs.select(sum(size(split(col("text"), " ")))).head.getLong(0)
    val segs = DataPrep.packAssignments(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val W = DataPrep.PackWindowTokens
    assert(segs.map(_._4).sum === totalToks, "every token lands in exactly one window")
    val byWindow = segs.groupBy(_._1)
    val lastWindow = byWindow.keys.max
    byWindow.foreach { case (w, ss) =>
      val sorted = ss.sortBy(_._3)
      // segments tile the window: start at 0, back-to-back, no overlap
      assert(sorted.head._3 === 0L, s"window $w starts at offset 0")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 === b._3, s"window $w segments abut")
        case _ =>
      }
      val filled = sorted.map(_._4).sum
      if (w < lastWindow) assert(filled === W, s"window $w holds exactly $W tokens")
      else assert(filled <= W)
      // concat order: segment offsets within a window follow doc_id order
      assert(sorted.map(_._2).toSeq === sorted.map(_._2).toSeq.sorted)
    }
  }

  test("q206 packing: a doc segment count is exactly its window span") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 300).map(_ => "w").mkString(" ")), // 300 toks: spans 2 windows
      (2L, (1 to 600).map(_ => "w").mkString(" ")), // 600 toks at offset 300: windows 1..3
      (3L, "tiny doc")).toDF("doc_id", "text")
    val segs = DataPrep.packAssignments(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val perDoc = segs.groupBy(_._2).view.mapValues(_.length).toMap
    assert(perDoc(1L) === 2 && perDoc(2L) === 3 && perDoc(3L) === 1)
    assert(segs.filter(_._2 == 2L).map(_._4).sum === 600L)
  }

  test("ks drift: statistic bounded in [0, 10000] and zero for identical distributions") {
    import spark.implicits._
    val r = DataPrep.q135_ks_drift(spark, dir).collect()
    assert(r.length == 1)
    val ks = r(0).getLong(2)
    assert(ks >= 0 && ks <= 10000, s"ks_bp=$ks")
    // src1 relabeled as a copy of src0 ⇒ the two CDFs coincide
    val src0 = graft.Tables.load(spark, dir, "documents")
      .filter($"source" === "src0")
    val same = src0.union(src0.withColumn("source", lit("src1"))
      .select(src0.columns.map(col): _*))
    val tmp = TestSpark.tempDir("ks_self")
    same.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val self = DataPrep.q135_ks_drift(spark, tmp).collect()(0)
    assert(self.getLong(2) == 0L,
      s"identical distributions must give KS 0, got ${self.getLong(2)}")
  }

  test("q250 Mann-Whitney: identical distributions give U1 = n1·n2/2 and z = 0") {
    import spark.implicits._
    // src1 relabeled as a copy of src0 ⇒ every pairwise comparison is a
    // tie between mirror images: R1 lands exactly at its null mean, so
    // u1_x2 (= 2·U1) equals n1·n2 and the z statistic is exactly 0.
    val src0 = graft.Tables.load(spark, dir, "documents")
      .filter($"source" === "src0")
    val same = src0.union(src0.withColumn("source", lit("src1"))
      .select(src0.columns.map(col): _*))
    val tmp = TestSpark.tempDir("mw_self")
    same.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = DataPrep.q250_mann_whitney(spark, tmp).collect()(0)
    val (n1, n2) = (r.getLong(0), r.getLong(1))
    assert(n1 == n2)
    assert(r.getLong(2) == n1 * n2, s"u1_x2=${r.getLong(2)} != n1*n2=${n1 * n2}")
    assert(r.getLong(4) == 0L, s"self-test z_milli must be 0, got ${r.getLong(4)}")
  }

  test("q250 Mann-Whitney: stochastically dominated src0 gives U1 = 0 and z < 0") {
    import spark.implicits._
    // every src1 doc scores strictly higher than every src0 doc
    // (stopword-heavy long text vs punctuation-only), so src0 wins no
    // pairs: U1 = 0 exactly, z strongly negative.
    val low = (1 to 20).map(i => (i.toLong, "src0", "??? !!! ;;; %%% &&&"))
    val high = (1 to 20).map(i =>
      (100L + i, "src1", Seq.fill(30)("the a of and to in is").mkString(" ")))
    val tmp = TestSpark.tempDir("mw_dom")
    (low ++ high).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = DataPrep.q250_mann_whitney(spark, tmp).collect()(0)
    assert(r.getLong(0) == 20L && r.getLong(1) == 20L)
    assert(r.getLong(2) == 0L, s"dominated src0 must have U1=0, got u1_x2=${r.getLong(2)}")
    // two 20-way tie groups (each source's docs share one text):
    // Σ(t³−t) = 2·(20³−20)
    assert(r.getLong(3) == 2L * (20L * 20L * 20L - 20L),
      s"tie_term=${r.getLong(3)}")
    assert(r.getLong(4) < 0L, s"z must be negative, got ${r.getLong(4)}")
  }

  /** Driver-side replay of hash60 (top 60 bits of md5 as a long). */
  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q259 FIM: psm rearrangement matches an independent JVM replay; short docs stay causal") {
    import spark.implicits._
    val text = "abcdefghijklmnopqrstuvwxyz0123456789" // 36 chars
    // find a doc id that the gate sends to psm
    val id = Iterator.iterate(1L)(_ + 1)
      .find(i => hash60(s"graft_fim_g_$i") % 100 < 50).get
    val tmp = TestSpark.tempDir("fim_replay")
    Seq((id, text), (900L, "short")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = DataPrep.q259_fim_transform(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    // JVM replay of the cut arithmetic
    val l = text.length.toLong
    val lo = 1 + l / 10; val hi = l - l / 10; val span = hi - lo + 1
    val pa = lo + hash60(s"graft_fim_a_$id") % span
    val pb = lo + hash60(s"graft_fim_b_$id") % span
    val c1 = math.min(pa, pb).toInt; val c2 = math.max(pa, pb).toInt
    val expect = md5Hex("<PRE>" + text.substring(0, c1 - 1)
      + "<SUF>" + text.substring(c2 - 1) + "<MID>" + text.substring(c1 - 1, c2 - 1))
    val psm = rows(id)
    assert(psm.getString(1) == "psm")
    assert(psm.getLong(2) == c1 - 1 && psm.getLong(3) == c2 - c1
      && psm.getLong(4) == l - c2 + 1)
    assert(psm.getString(5) == expect, s"fim_md5 mismatch")
    val causal = rows(900L)
    assert(causal.getString(1) == "causal" && causal.getLong(2) == 5L
      && causal.getString(5) == md5Hex("short"))
  }

  test("q260 preference pairs: chosen beats rejected, pairs are distinct docs, singletons drop") {
    import spark.implicits._
    val rows = Seq(
      (1L, "s0", "en", "x"), // low quality (5010)
      (2L, "s0", "en", Seq.fill(10)("the").mkString(" ")), // high (6300)
      (3L, "s1", "en", "only one doc in this slice"))
    val tmp = TestSpark.tempDir("pref_pairs")
    rows.toDF("doc_id", "source", "lang", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = DataPrep.q260_preference_pairs(spark, tmp).collect()
    assert(r.length == 1, r.mkString(", "))
    assert(r(0).getLong(2) == 2L && r(0).getLong(3) == 1L)
    assert(r(0).getLong(4) == 6300L - 5010L)
  }

  test("q262 t-closeness: closed forms — balanced classes 1/6, the pure-A class 1/3") {
    import spark.implicits._
    // nations 0/1: 2×A + 2×B each (= the global mix up to nation 2's
    // skew); nation 2: 4×A only. Closed forms: N=12, N_A=8, N_B=4 ⇒
    // tv(pure A class) = (|4·12−8·4|+|0−4·4|)/(2·4·12) = 1/3 → 333;
    // tv(balanced class) = (8+8)/96 = 1/6 → 167.
    val cust = (1L to 12L).map(k => (k, ((k - 1) / 4), s"SEG"))
    val ords = (1L to 12L).map(k => (k, if (k > 8 || k % 2 == 1) "A" else "B"))
    val tmp = TestSpark.tempDir("tclose")
    cust.toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    ords.toDF("o_custkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val r = DataPrep.q262_t_closeness(spark, tmp).collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq((0L, 4L, 167L), (1L, 4L, 167L), (2L, 4L, 333L)),
      r.mkString(", "))
  }

  test("q263 PSI: identical distributions give exactly zero") {
    import spark.implicits._
    val src0 = graft.Tables.load(spark, dir, "documents")
      .filter($"source" === "src0")
    val same = src0.union(src0.withColumn("source", lit("src1"))
      .select(src0.columns.map(col): _*))
    val tmp = TestSpark.tempDir("psi_self")
    same.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = DataPrep.q263_psi_drift(spark, tmp).collect()(0)
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(2) == 0L, s"self-PSI must be 0, got ${r.getLong(2)}")
  }

  test("q273/q274 robust stats: arithmetic-progression scores give symmetric closed forms") {
    import spark.implicits._
    // doc j has j stopwords ⇒ score 5000+130j, j = 1..10: a symmetric
    // progression, so mean = trimmed = winsorized = 5715; lower median
    // = s_5 = 5650, MAD = 260 (sorted deviations 0,130,130,260,260,…),
    // no 3·MAD outliers (max dev 650 ≤ 780).
    val rows = (1 to 10).map(j =>
      (j.toLong, Seq.fill(j)("the").mkString(" "), "src0"))
    val tmp = TestSpark.tempDir("robust_prog")
    rows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val m = DataPrep.q273_robust_mean(spark, tmp).collect()(0)
    assert(m.getLong(1) == 10L && m.getLong(2) == 1L)
    assert(m.getLong(3) == 5715000L && m.getLong(4) == 5715000L
      && m.getLong(5) == 5715000L,
      s"mean=${m.getLong(3)} trimmed=${m.getLong(4)} winsor=${m.getLong(5)}")
    val s = DataPrep.q274_robust_scale(spark, tmp).collect()(0)
    assert(s.getLong(2) == 5650L, s"median=${s.getLong(2)}")
    assert(s.getLong(3) == 260L, s"mad=${s.getLong(3)}")
    assert(s.getLong(4) == 0L, s"outliers=${s.getLong(4)}")
  }

  test("q279 Wasserstein: identical distributions give 0; a pure shift gives exactly the shift") {
    import spark.implicits._
    // src1 = src0 shifted one stopword up: scores {5130, 5260} vs
    // {5260, 5390} — a pure +130 bp translation, and W₁ of a
    // translation IS the translation.
    def doc(k: Int): String = Seq.fill(k)("the").mkString(" ")
    val shifted = Seq(
      (1L, doc(1), "src0"), (2L, doc(2), "src0"),
      (3L, doc(2), "src1"), (4L, doc(3), "src1"))
    val tmp = TestSpark.tempDir("w1_shift")
    shifted.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = DataPrep.q279_wasserstein(spark, tmp).collect()(0)
    assert(r.getLong(2) == 130000L, s"w1_milli=${r.getLong(2)}")
    val self = Seq((1L, doc(1), "src0"), (2L, doc(2), "src0"),
      (3L, doc(1), "src1"), (4L, doc(2), "src1"))
    val tmp2 = TestSpark.tempDir("w1_self")
    self.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$tmp2/documents.parquet")
    assert(DataPrep.q279_wasserstein(spark, tmp2).collect()(0).getLong(2) == 0L)
  }

  test("q135 overflow guard is exact at the Long boundary (integer DIV, not double /)") {
    import spark.implicits._
    // the guard expression as written in q135_ks_drift
    def trips(n0: Long, n1: Long): Boolean = {
      val df = Seq((n0, n1)).toDF("n0", "n1")
        .select(when($"n1" =!= 0L && $"n0" > expr(s"${Long.MaxValue}L DIV n1"),
            raise_error(lit("overflow"))).otherwise($"n0").as("n0"))
      try { df.collect(); false } catch { case _: Throwable => true }
    }
    val okN0 = Long.MaxValue / 3 // (MaxValue DIV 3) * 3 = MaxValue - 1: fits
    assert(!trips(okN0, 3L), "largest non-overflowing n0 must pass")
    // +1 overflows by exactly 2 — a double-division bound (MaxValue/3
    // rounds UP to ~2^61.5 + 512) would wave this through
    assert(trips(okN0 + 1, 3L), "smallest overflowing n0 must raise")
    assert(!trips(okN0, 0L), "n1=0 must not divide")
  }

  test("q201 weighted sample: exactly k per lang, no repeats, partition-invariant") {
    import spark.implicits._
    val res = DataPrep.q201_weighted_sample(spark, dir)
    val rows = res.collect()
    assert(rows.nonEmpty)
    // no doc sampled twice (without-replacement)
    val ids = rows.map(_.getLong(2))
    assert(ids.distinct.length == ids.length)
    // per lang: min(k, group size) rows, ranks densely 1..n
    val docs = graft.Tables.load(spark, dir, "documents")
    val perLang = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val expect = math.min(DataPrep.WrsPerLang.toLong, perLang(lang))
      assert(rs.length.toLong == expect, s"$lang: ${rs.length} vs $expect")
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to expect))
    }
    // determinism under repartitioning
    val tmp = graft.TestSpark.tempDir("wrs_part")
    docs.repartition(13).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val again = DataPrep.q201_weighted_sample(spark, tmp).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("q201 A-ES invariant: raising a doc's weight never worsens its rank") {
    import spark.implicits._
    // same doc_ids (so the same uniforms) with doc 7's token weight
    // boosted 50x in the second corpus: its priority u^(1/w) rises
    // monotonically in w, so its within-lang rank must improve or hold
    def corpus(boost: Int): String = {
      val tmp = graft.TestSpark.tempDir(s"wrs_w$boost")
      (0L until 40L).map { id =>
        val words = if (id == 7L) 4 * boost else 4
        (id, Seq.fill(words)("tok").mkString(" "), "en", "s", words.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      tmp
    }
    def rankOf7(dir: String): Option[Long] =
      DataPrep.q201_weighted_sample(spark, dir).collect()
        .find(_.getLong(2) == 7L).map(_.getLong(1))
    val base = rankOf7(corpus(1))
    val boosted = rankOf7(corpus(50))
    assert(boosted.isDefined, "a 50x-weight doc among 40 must make a k=10 sample")
    assert(base.forall(b => boosted.get <= b),
      s"rank must improve with weight: $base -> $boosted")
  }

  test("q201 plan: rank-filter rewrites to bounded TopK heaps, no window funnel") {
    val p = DataPrep.q201_weighted_sample(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopK"), s"RankLimitRewrite must fire:\n${p.take(800)}")
    assert(!p.contains("Window"), "no WindowExec may survive the rewrite")
  }

  test("q202 curriculum interleave: every prefix carries the declared mixture") {
    import spark.implicits._
    val res = DataPrep.q202_training_order(spark, dir).collect()
    assert(res.length == DataPrep.CurriculumPrefix ||
      res.length == graft.Tables.load(spark, dir, "documents").count().toInt)
    // positions are dense 1..n in key order
    assert(res.map(_.getLong(0)).sameElements(1L to res.length.toLong))
    // stride property: in the FULL emitted prefix, each source's count
    // stays within ~1 slot of its proportional share — the guarantee a
    // global shuffle does not give
    val w = res.map(_.getString(1)).distinct
      .map(s => s -> (s.drop(3).toInt % 3 + 1).toLong).toMap
    val totalW = {
      val docs = graft.Tables.load(spark, dir, "documents")
        .select($"source").distinct().as[String].collect()
      docs.map(s => (s.drop(3).toInt % 3 + 1).toLong).sum
    }
    val n = res.length
    res.map(_.getString(1)).groupBy(identity).foreach { case (s, rs) =>
      val ideal = n.toDouble * w(s) / totalW
      assert(math.abs(rs.length - ideal) <= 2.0,
        s"$s: ${rs.length} vs ideal $ideal in a $n-prefix")
    }
    // determinism under repartitioning
    val tmp = graft.TestSpark.tempDir("curr_part")
    graft.Tables.load(spark, dir, "documents").repartition(11)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val again = DataPrep.q202_training_order(spark, tmp).collect()
    assert(res.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("q202 plan: prefix head is TakeOrdered; no per-source window funnel") {
    val df = DataPrep.q202_training_order(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"bounded head must plan as TakeOrdered:\n${p.take(800)}")
    // the only Window is the position numbering over the bounded head;
    // the per-source rank must NOT appear as a window (it rides the
    // two-phase range scan)
    assert(!p.contains("hashpartitioning(source"),
      "per-source rank must not hash-partition on the low-cardinality source key")
    assert(graft.plans.PlanLint.lintGroupedWindows(df).isEmpty)
  }

  test("q200 RRF: fused score is exactly the sum of the two contributions") {
    import spark.implicits._
    val res = TextAnalysis.q200_rrf_fusion(spark, dir).collect()
    assert(res.nonEmpty && res.length <= TextAnalysis.RrfTopN)
    def contrib(rank: Long): Long =
      if (rank == 0L) 0L else math.round(1e6 / (TextAnalysis.RrfK + rank))
    res.foreach { r =>
      assert(r.getLong(3) == contrib(r.getLong(1)) + contrib(r.getLong(2)),
        s"rrf mismatch for doc ${r.getLong(0)}")
    }
    // ordering is fused-score desc with doc-id tie-break
    val scores = res.map(r => (-r.getLong(3), r.getLong(0)))
    assert(scores.sameElements(scores.sorted))
    // a doc at the top of BOTH lists dominates any single-list doc
    val both = res.filter(r => r.getLong(1) > 0 && r.getLong(2) > 0)
    val single = res.filter(r => r.getLong(1) == 0 || r.getLong(2) == 0)
    for (b <- both.headOption; s <- single.headOption)
      assert(b.getLong(3) > s.getLong(3) - 2 * contrib(1L),
        "sanity: contributions are bounded by the rank-1 value")
  }

  test("q315 UCB1: scores match the naive recomputation; fewer plays at equal mean => higher UCB") {
    import spark.implicits._
    val rows = DataPrep.q315_ucb_source_selection(spark, dir).collect()
    val docs = graft.Tables.load(spark, dir, "documents")
      .selectExpr("source", "n_chars", "split(text, ' ') as toks").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2)))
    def pass(nc: Long, ts: Seq[String]): Long =
      if (nc >= 200L && nc <= 450L &&
        ts.distinct.length.toLong * 100L >= ts.length.toLong * 40L) 1L else 0L
    val byArm = docs.groupBy(_._1).map { case (src, g) =>
      (src, g.length.toLong, g.map(d => pass(d._2, d._3)).sum)
    }
    val nTotal = byArm.map(_._2).sum
    val naive = byArm.map { case (src, plays, rewards) =>
      val mean = math.round(10000.0 * rewards / plays)
      val bonus = math.round(10000.0 *
        math.sqrt(2.0 * math.log(nTotal.toDouble) / plays))
      (src, plays, rewards, mean, bonus, mean + bonus)
    }.toSet
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSet == naive)
    assert(rows.nonEmpty)
    // descending ucb order, source tie-break
    val ucbs = rows.map(r => (-r.getLong(5), r.getString(0))).toSeq
    assert(ucbs == ucbs.sorted)
    // exploration dominance: at equal mean reward, the less-played arm
    // must score strictly higher (UCB1's defining property)
    val b1 = math.round(10000.0 * math.sqrt(2.0 * math.log(100.0) / 10.0))
    val b2 = math.round(10000.0 * math.sqrt(2.0 * math.log(100.0) / 50.0))
    assert(b1 > b2)
  }
}
