package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The native Generator UDTF: fan-out correctness (incl. byte-range
  * gram assembly on multi-byte UTF-8), degenerate inputs, SQL
  * registration, and the analysis-time arity/type errors.
  */
class WordNGramsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def grams(text: String, n: Int): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(NGrams.wordNGrams($"t", n).as("g"))
      .collect().map(_.getString(0)).toSeq
  }

  test("trigram fan-out matches the sliding window") {
    assert(grams("a b c d e", 3) == Seq("a b c", "b c d", "c d e"))
    assert(grams("a b", 1) == Seq("a", "b"))
    assert(grams("a b", 2) == Seq("a b"))
  }

  test("degenerate inputs: short text, empty words, multi-byte UTF-8") {
    assert(grams("a b", 3).isEmpty)
    assert(grams("", 1) == Seq("")) // split keeps empties, as everywhere
    assert(grams("a  b", 2) == Seq("a ", " b")) // double space = empty word
    assert(grams("héllo wörld żółć", 2) == Seq("héllo wörld", "wörld żółć"))
  }

  test("null text generates nothing (not a null row)") {
    import spark.implicits._
    val out = Seq[(Long, String)]((1L, null), (2L, "x y"))
      .toDF("id", "t")
      .select($"id", NGrams.wordNGrams($"t", 2).as("g"))
      .collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "x y")))
  }

  test("SQL surface: registered generator works in a lateral position") {
    import spark.implicits._
    NGrams.register(spark)
    Seq("p q r").toDF("t").createOrReplaceTempView("ng_in")
    val viaSql = spark.sql("SELECT word_ngrams(t, 2) AS g FROM ng_in")
      .collect().map(_.getString(0)).toSeq
    assert(viaSql == Seq("p q", "q r"))
  }

  test("analysis errors: wrong arity and non-literal n fail cleanly") {
    import spark.implicits._
    NGrams.register(spark)
    Seq("a b").toDF("t").createOrReplaceTempView("ng_err")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT word_ngrams(t) FROM ng_err").collect()
    }
    assert(e1.getMessage.contains("word_ngrams"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT word_ngrams(t, length(t)) FROM ng_err").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("literal") ||
      e2.getMessage.contains("word_ngrams"))
  }
}
