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
}
