package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** NormalizeText must be byte-equivalent to the regex composition it
  * replaced (q63's oracle replays that composition in DuckDB, so this
  * equivalence IS the cross-engine contract), in both interpreted and
  * codegen evaluation.
  */
class NormalizeTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val samples = Seq(
    "Hello, World!",
    "  leading and trailing  ",
    "ALL CAPS 123",
    "punct!!!///###   runs",
    "tabs\tand\nnewlines",
    "accents éàü ÉÀÜ œŒ",
    "mixed 日本語 and ascii",
    "İstanbul DŽungle ẞharp", // multi-char / special lowercase mappings
    "", " ", "...", "a", "7",
    "already normal text 42")

  test("matches trim(regexp_replace(regexp_replace(lower(s)))) on every sample") {
    import spark.implicits._
    val df = samples.toDF("text")
      .withColumn("fast", NormalizeText.normalizeText($"text"))
      .withColumn("slow", trim(regexp_replace(
        regexp_replace(lower($"text"), "[^a-z0-9 ]", " "), " +", " ")))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"mismatch for input '${r.getString(0)}': " +
          s"fast='${r.getString(1)}' slow='${r.getString(2)}'")
    }
  }

  test("codegen and interpreted paths agree; SQL registration works") {
    import spark.implicits._
    // SQL path exercises the injected function (codegen'd in the
    // whole-stage pipeline); the Column path above already covered
    // the same expression — equality with the regex column proves
    // both evaluate identically.
    val out = samples.toDF("text").createOrReplaceTempView("norm_in")
    val viaSql = spark.sql(
      "SELECT normalize_text(text) FROM norm_in").as[String].collect()
    val expected = samples.map(s =>
      NormalizeText.normalize(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString)
    assert(viaSql.toSeq == expected)
  }

  test("null propagates") {
    import spark.implicits._
    val r = Seq[String](null).toDF("text")
      .select(NormalizeText.normalizeText($"text")).collect()
    assert(r.head.isNullAt(0))
  }

  test("property: equivalence holds on arbitrary unicode strings (500 cases)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    import spark.implicits._
    val charGen: Gen[Char] = Gen.frequency(
      8 -> Gen.alphaNumChar,
      4 -> Gen.const(' '),
      3 -> Gen.oneOf("!@#$%^&*()_+-=[]{};:'\"|,.<>/?~`".toSeq),
      2 -> Gen.oneOf("\u00e9\u00e0\u00fc\u00c9\u00c0\u00dc\u0153\u0152\u00df\u0130\u01c4".toSeq),
      2 -> Gen.oneOf("\u65e5\u672c\u8a9e\u4e2d\u6587".toSeq),
      1 -> Gen.oneOf("\t\n\r".toSeq),
      1 -> Gen.choose(0x20.toChar, 0x7e.toChar))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    // batch the property inputs through ONE dataframe per run for speed
    val inputs = Gen.listOfN(500, strGen).sample.get
    val rows = inputs.toDF("text")
      .withColumn("fast", NormalizeText.normalizeText($"text"))
      .withColumn("slow", trim(regexp_replace(
        regexp_replace(lower($"text"), "[^a-z0-9 ]", " "), " +", " ")))
      .collect()
    val bad = rows.filter(r => r.getString(1) != r.getString(2))
    assert(bad.isEmpty, bad.take(3).map(r =>
      s"input='${r.getString(0)}' fast='${r.getString(1)}' slow='${r.getString(2)}'").mkString("; "))
  }
}
