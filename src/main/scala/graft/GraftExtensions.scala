package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{GtfsTimeToSeconds, NormalizeText, VectorDot, WordNGrams}

/** Library entry point for `spark.sql.extensions`: users add
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` at
  * session build and every custom expression is available in SQL
  * without imperative registration calls — the idiomatic way to ship
  * Catalyst extensions in a library jar.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    extensions.injectOptimizerRule(_ => graft.plans.RankLimitRewrite)
    extensions.injectFunction((
      FunctionIdentifier("gtfs_time_to_seconds"),
      new ExpressionInfo(classOf[GtfsTimeToSeconds].getName, "gtfs_time_to_seconds"),
      {
        case Seq(e) => GtfsTimeToSeconds(e)
        case exprs => throw GraftExtensions.arity("gtfs_time_to_seconds", 1, exprs.length)
      }))
    extensions.injectFunction((
      FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
      {
        case Seq(e) => NormalizeText(e)
        case exprs => throw GraftExtensions.arity("normalize_text", 1, exprs.length)
      }))
    extensions.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
      {
        case Seq(t, k) => WordNGrams(t, k)
        case exprs => throw GraftExtensions.arity("word_ngrams", 2, exprs.length)
      }))
    extensions.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      {
        case Seq(a, b) => VectorDot(a, b)
        case exprs => throw GraftExtensions.arity("vector_dot", 2, exprs.length)
      }))
  }
}

object GraftExtensions {
  /** Clean analysis-time error for a wrong argument count (instead of
    * an IndexOutOfBoundsException escaping the builder).
    */
  private[graft] def arity(fn: String, expected: Int, got: Int) =
    new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> fn, "expectedNum" -> expected.toString,
        "actualNum" -> got.toString, "docroot" -> "https://spark.apache.org/docs/latest"))
}
