package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class NfcNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val combiningAcute = "́"
  private val samples = Seq(
    "plain ascii 42",
    "precomposed éàü", // already NFC
    "decomposed e" + combiningAcute + "a" + "̀" + "u" + "̈",
    "hangul 가 vs " + "가", // precomposed vs jamo pair
    "", " ")

  test("matches java.text.Normalizer NFC on every sample") {
    import spark.implicits._
    val got = samples.toDF("text")
      .select(NfcNormalize($"text")).as[String].collect()
    val expect = samples.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(got.toSeq == expect)
    // the decomposed sample must actually change under NFC
    assert(samples(2) != expect(2))
  }

  test("decomposed and precomposed forms normalize to identical strings") {
    import spark.implicits._
    val r = Seq(("cafe" + combiningAcute, "café")).toDF("a", "b")
      .select(NfcNormalize($"a").as("na"), NfcNormalize($"b").as("nb"))
      .collect()(0)
    assert(r.getString(0) == r.getString(1))
    assert(r.getString(0) == "café")
  }

  test("null propagates; already-NFC text is unchanged") {
    import spark.implicits._
    val r = Seq[String](null).toDF("text")
      .select(NfcNormalize($"text")).collect()
    assert(r.head.isNullAt(0))
    val s = Seq("already clean").toDF("text")
      .select(NfcNormalize($"text")).as[String].collect()
    assert(s.head == "already clean")
  }
}
