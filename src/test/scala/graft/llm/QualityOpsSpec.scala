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
}
