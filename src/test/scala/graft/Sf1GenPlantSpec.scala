package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the sf1.0 generator's planted-positive families (round-16
  * directive #3): the same-source (S) family q25 needs, the
  * rare-token (R) family q94 needs, and the ≥ 0.99-cosine embedding
  * family q30 needs — plus the invariants the plants must NOT break
  * (q203's batch/index parity, the constant vocabulary, family
  * disjointness). Generates a small corpus with the production code
  * path and drives the actual consumers over it.
  */
class Sf1GenPlantSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one generated corpus shared by the text tests: 3000 docs covers
  // one R pair (197/217) and 15 S pairs (32/12 … 2832/2812)
  private lazy val docDir: String = {
    val d = TestSpark.tempDir("sf1plant")
    Sf1Gen.synthHarnessDocuments(spark, 3000, s"$d/documents.parquet")
    d
  }

  private def doc(id: Long): (String, String, String) = {
    val r = spark.read.parquet(s"$docDir/documents.parquet")
      .filter($"doc_id" === id)
      .select($"text", $"lang", $"source").head()
    (r.getString(0), r.getString(1), r.getString(2))
  }

  test("S family: mutant replays seed with trailing base-word marker, same source, both even") {
    val (mt, _, msrc) = doc(232)
    val (st, _, ssrc) = doc(212)
    val mw = mt.split(" ")
    val sw = st.split(" ")
    assert(mw.length === sw.length)
    assert(mw.init.sameElements(sw.init), "prefix must replay the seed")
    assert(mw.last === Sf1Gen.HarnessVocab(0))
    assert(msrc === "src12" && ssrc === "src12")
    assert(232 % 2 === 0 && 212 % 2 === 0) // invisible to q203's odd×even join
  }

  test("R family: mutant replays anchor with trailing dup, inherits lang, J3 = 8/9") {
    val (at, alang, asrc) = doc(197)
    val (mt, mlang, msrc) = doc(217)
    val aw = at.split(" ")
    val mw = mt.split(" ")
    assert(aw.length >= 20 && aw.length === mw.length)
    assert(mw.init.sameElements(aw.init))
    assert(mw.last === "dup")
    assert(alang === mlang, "the pair must share q94's lang block")
    assert(asrc === "src17" && msrc === "src17")
    def grams(w: Array[String]) = w.sliding(3).map(_.mkString(" ")).toSet
    val (ga, gm) = (grams(aw), grams(mw))
    assert(ga.size === 8, "de Bruijn cycle realizes all 8 3-gram types")
    assert((ga & gm).size === 8, "trailing mutation removes no type")
    assert((ga | gm).size === 9)
  }

  test("vocabulary stays constant: ≤ 41 distinct tokens") {
    val n = spark.read.parquet(s"$docDir/documents.parquet")
      .select(explode(split($"text", " ")).as("tok"))
      .agg(countDistinct($"tok")).head().getLong(0)
    assert(n <= 41)
  }

  test("q25 sees the planted same-source pairs") {
    val out = graft.llm.Dedup.q25_ngram_jaccard_blocked(spark, docDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(out.contains((212L, 232L)), "S pair must clear the source block + J2 gate")
    assert(out.contains((197L, 217L)), "R pair is same-source too")
  }

  test("q23 banded LSH finds every planted pair (certain-recall region)") {
    val out = graft.llm.Dedup.q23_minhash_dedup(spark, docDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val sPairs = (32L until 3000L by 200L).map(m => (m - 20, m))
    sPairs.foreach(p => assert(out.contains(p), s"missing S pair $p"))
    assert(out.contains((197L, 217L)), "missing R pair")
  }

  test("embedding plant: cosine(42, 49) ≥ 0.99 and detected by q30") {
    val d = TestSpark.tempDir("sf1plantEmb")
    graft.llm.LlmScaleBench.synthEmbeddings(spark, 3000, s"$d/embeddings.parquet")
    val vs = spark.read.parquet(s"$d/embeddings.parquet")
      .filter($"vec_id".isin(42L, 49L, 2542L, 2549L))
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d0 = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d0 += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d0 / math.sqrt(na * nb)
    }
    assert(cos(vs(42L), vs(49L)) >= 0.999)
    assert(cos(vs(2542L), vs(2549L)) >= 0.999)
    val found = graft.llm.Similarity.q30_embedding_neardup(spark, d)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    assert(found.contains((42L, 49L)))
    assert(found.contains((2542L, 2549L)))
  }
}
