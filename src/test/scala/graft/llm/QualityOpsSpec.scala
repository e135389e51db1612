package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Fixture invariants for the quality/eval operators (q244–q246)
  * beyond the DuckDB oracle's value equality: per-rule failure
  * attribution on fabricated documents, MATTR closed forms, and the
  * copied-doc / disjoint-vocab boundary cases of the held-out LM.
  */
class QualityOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** q130's split bucket, replayed driver-side to fabricate doc_ids
    * that land in a chosen split.
    */
  private def splitBucket(docId: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"graft_split_$docId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 100
  }

  private def idIn(lo: Long, hi: Long, from: Long = 0L): Long =
    Iterator.iterate(from)(_ + 1)
      .find(id => { val b = splitBucket(id); b >= lo && b < hi }).get

  private def writeDocs(rows: Seq[(Long, String)], prefix: String): String = {
    import spark.implicits._
    val tmp = TestSpark.tempDir(prefix)
    rows.map { case (id, txt) => (id, txt, "en", "src0", txt.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("gopher rules: fabricated docs fail exactly the rules they violate") {
    // clean: 60 tokens, two stop words, 4-char words, no dominance
    val clean = (("the" +: "a" +: (1 to 58).map(i => s"wd$i")): Seq[String]).mkString(" ")
    // short: passes everything except the 50-word floor
    val short = ("the" +: "a" +: (1 to 10).map(i => s"word$i")).mkString(" ")
    // degenerate: one 1-char word repeated 60× — dominance + mean-word-len
    // + stopword failures, but NOT word count
    val degen = Seq.fill(60)("x").mkString(" ")
    val dir = writeDocs(Seq((0L, clean), (1L, short), (2L, degen)), "gopher")
    val rows = TextAnalysis.q244_gopher_rules(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("word_count_low") == ((1L, 3333L)))
    assert(rows("word_count_high")._1 == 0L)
    assert(rows("mean_word_len")._1 == 1L, "only the 1-char-word doc")
    assert(rows("stopword_min2")._1 == 1L, "only the degenerate doc")
    assert(rows("top_word_dominance")._1 == 1L, "only the degenerate doc")
    assert(rows("any_rule")._1 == 2L, "clean doc passes every rule")
  }

  test("mattr: closed forms — uniform doc = 1000/W, all-distinct = 1000, short-doc TTR fallback") {
    val uniform = Seq.fill(100)("w").mkString(" ")          // every window: 1 type
    val distinct = (1 to 100).map(i => s"t$i").mkString(" ") // every window: 25 types
    val short = (1 to 10).map(i => s"s$i").mkString(" ")     // n<25 → TTR = 1
    val dir = writeDocs(Seq((0L, uniform), (1L, distinct), (2L, short)), "mattr")
    val r = TextAnalysis.q245_mattr_diversity(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getLong(3) == 40L, "min = uniform doc: 1000/25")
    assert(r.head.getLong(4) == 1000L, "max = fully distinct windows")
    assert(r.head.getLong(1) == 3L)
  }

  test("heldout surprisal: copied val doc has zero OOV; disjoint-vocab val doc is all OOV") {
    val trainId = idIn(0, 80)
    val valId = idIn(80, 90)
    val valId2 = idIn(80, 90, valId + 1)
    val trainTxt = "a b a b a"
    val dir = writeDocs(Seq(
      (trainId, trainTxt), (valId, trainTxt),
      (valId2, "zz qq zz qq")), "heldout")
    val rows = TextAnalysis.q246_heldout_surprisal(spark, dir).collect()
    val valRow = rows.find(_.getString(0) == "val").get
    // val split: 4 covered bigrams from the copy + 3 OOV from the
    // disjoint doc → oov_bp = round(10000*3/7)
    assert(valRow.getLong(1) == 7L)
    assert(valRow.getLong(2) == 3L)
    assert(valRow.getLong(3) == 4286L)
    // covered bigrams: (a,b) c1=3 c2=2 → 0 bits; (b,a) c1=2 c2=2 → 0 bits
    assert(valRow.getLong(4) == 0L)
  }

  test("q264 MI: an independent grid gives exactly 0; a bijective coupling saturates at min-entropy") {
    import spark.implicits._
    // independent: 3 langs × 3 sources, 2 docs per cell ⇒ every
    // ln-ratio is ln(1) = 0 ⇒ MI exactly 0
    val ind = for (l <- Seq("en", "de", "fr"); s <- Seq("s0", "s1", "s2");
      i <- 1 to 2) yield (s"$l$s$i".hashCode.toLong, "t", l, s)
    val tmp1 = TestSpark.tempDir("mi_ind")
    ind.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp1/documents.parquet")
    val r1 = TextAnalysis.q264_mutual_info(spark, tmp1).collect()(0)
    assert(r1.getLong(1) == 0L, s"independent MI=${r1.getLong(1)}")
    // bijective lang↔source ⇒ I = H(lang) = H(source) (±1 micro for
    // the two differently-shaped but mathematically equal ln trees)
    val cpl = for (i <- 0 to 2; j <- 1 to 2) yield
      (i.toLong * 10 + j, "t", s"l$i", s"s$i")
    val tmp2 = TestSpark.tempDir("mi_cpl")
    cpl.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp2/documents.parquet")
    val r2 = TextAnalysis.q264_mutual_info(spark, tmp2).collect()(0)
    assert(math.abs(r2.getLong(1) - r2.getLong(2)) <= 1L,
      s"coupled MI=${r2.getLong(1)} H_lang=${r2.getLong(2)}")
    assert(math.abs(r2.getLong(4) - 1000L) <= 1L, s"nmi=${r2.getLong(4)}")
  }

  test("q266 NFC audit: planted decomposed doc is counted with its code-point delta") {
    import spark.implicits._
    val decomposed = "cafe" + "́" + " au lait" // 13 cps, NFC = 12
    val rows = Seq((1L, decomposed, "fr"), (2L, "plain ascii", "fr"),
      (3L, "clean english", "en"))
    val tmp = TestSpark.tempDir("nfc_audit")
    rows.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = TextAnalysis.q266_nfc_audit(spark, tmp).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(("en", 1L, 0L, 0L), ("fr", 2L, 1L, 1L)), r.mkString(", "))
  }

  test("q267 script mix: planted Latin+Han doc flags as mixed with the right mille shares") {
    import spark.implicits._
    // 4 Latin + 1 space + 5 Han = 10 cps ⇒ latin 400‰, han 500‰
    val mixed = "abcd " + "一二三四五"
    val rows = Seq((1L, mixed, "zh"), (2L, "pure latin here", "en"))
    val tmp = TestSpark.tempDir("script_mix")
    rows.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val byLang = TextAnalysis.q267_script_mix(spark, tmp).collect()
      .map(x => x.getString(0) -> (x.getLong(2), x.getLong(3), x.getLong(6))).toMap
    assert(byLang("zh") == ((400L, 500L, 1L)), byLang.toString)
    assert(byLang("en")._2 == 0L && byLang("en")._3 == 0L)
  }

  test("q277 readability: closed form — 'go. go go.' scores FK(1.5, 1.0) exactly") {
    import spark.implicits._
    // words 3, sentence runs 2, vowel groups 3 ⇒
    // 0.39·1.5 + 11.8·1 − 15.59 = −3.205 ⇒ −3205 milli
    val tmp = TestSpark.tempDir("fk_fix")
    Seq((1L, "go. go go.", "en")).toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = TextAnalysis.q277_readability(spark, tmp).collect()(0)
    assert(r.getLong(2) == 3L && r.getLong(3) == 2L && r.getLong(4) == 3L)
    assert(r.getLong(5) == -3205L, s"fk=${r.getLong(5)}")
  }

  test("q253 isotonic: a decreasing two-bin curve pools to the weighted mean") {
    import spark.implicits._
    // "x" scores 5010 (bin 25, all English ⇒ raw 10000); ten "the"s
    // score 6300 (bin 31, all German ⇒ raw 0). The raw curve decreases,
    // so the non-decreasing isotonic fit pools both bins to 4/8 = 0.5.
    val rows =
      (1 to 4).map(i => (i.toLong, "x", "en")) ++
        (1 to 4).map(i => (10L + i, Seq.fill(10)("the").mkString(" "), "de"))
    val tmp = TestSpark.tempDir("iso_pool")
    rows.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = TextAnalysis.q253_isotonic_calibration(spark, tmp).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq((25L, 4L, 10000L, 5000L), (31L, 4L, 0L, 5000L)), r.mkString(", "))
  }

  test("q253 isotonic: fit is monotone non-decreasing on real data and preserves the weighted mean") {
    val r = TextAnalysis.q253_isotonic_calibration(spark, "/root/testdata/sf0.001")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.sliding(2).filter(_.length == 2).forall(p => p(0)._4 <= p(1)._4),
      r.mkString(", "))
    // PAVA preserves Σ n·rate (up to the per-bin bp rounding)
    val rawMass = r.map(x => x._2 * x._3).sum
    val isoMass = r.map(x => x._2 * x._4).sum
    assert(math.abs(rawMass - isoMass) <= r.map(_._2).sum,
      s"raw=$rawMass iso=$isoMass")
  }

  test("q254 bootstrap: a constant-score corpus gives a zero-width interval at the score") {
    import spark.implicits._
    // every doc is "x" (score 5010): each replicate mean is exactly
    // 5010, so lo = hi = 5010000 and all 100 replicates survive.
    val rows = (1 to 50).map(i => (i.toLong, "x", "en", "src0"))
    val tmp = TestSpark.tempDir("boot_const")
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = DataPrep.q254_bootstrap_ci(spark, tmp).collect()(0)
    assert(r.getLong(1) == 100L, s"n_reps=${r.getLong(1)}")
    assert(r.getLong(2) == 5010000L && r.getLong(3) == 5010000L,
      s"lo=${r.getLong(2)} hi=${r.getLong(3)}")
  }

  test("q255 conformal: identical docs give zero width and full coverage") {
    import spark.implicits._
    val rows = (1 to 300).map(i => (i.toLong, "x", "en", "src0"))
    val tmp = TestSpark.tempDir("conf_const")
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = DataPrep.q255_conformal_interval(spark, tmp).collect()(0)
    assert(r.getLong(1) + r.getLong(2) + r.getLong(3) == 300L)
    assert(r.getLong(4) == 0L, s"width_milli=${r.getLong(4)}")
    assert(r.getLong(5) == 10000L, s"cover_bp=${r.getLong(5)}")
  }
}
