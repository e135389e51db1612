package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the round-20 native maxsim_micro expression to the Catalyst
  * composition it replaced in q300: per 8-dim sub-vector pair,
  * round(dot / greatest(‖q_m‖·‖d_m′‖, 1e-12) · 1e6) cast to long,
  * max over the doc part, summed over the query parts. Exact equality
  * on randomized vectors (including near-tie magnitudes) is the
  * contract that keeps the q300 oracle hash stable.
  */
class MaxSimMicroSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Subs = 8

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    VectorOps.vectorDot(a, b)
  private def norm(c: org.apache.spark.sql.Column) = sqrt(dot(c, c))

  test("maxsim_micro matches the exploded greatest/round/sum composition exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(80)((
      Array.fill(64)(rnd.nextDouble() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("q", "d")
    // the pre-round-20 q300 cell tree, fused per row for the test
    // (8 query parts × greatest over 8 doc parts, summed)
    val old = (0 until Subs).map { m =>
      val qv = slice($"q", m * 8 + 1, 8)
      val qn = norm(qv)
      (0 until Subs).map { mp =>
        val pv = slice($"d", mp * 8 + 1, 8)
        round(dot(qv, pv) / greatest(qn * norm(pv), lit(1e-12)) * 1e6)
          .cast("long")
      }.reduce(greatest(_, _))
    }.reduce(_ + _)
    val expected = df.select(old).collect().map(_.getLong(0))
    val native = df.select(MaxSimMicro.maxsimMicro($"q", $"d", Subs))
      .collect().map(_.getLong(0))
    assert(expected.sameElements(native))
  }

  test("identical vectors score Subs * 1e6; null element propagates") {
    import spark.implicits._
    val v = Array.tabulate(64)(i => (i % 7 + 1).toDouble)
    val same = Seq((v, v)).toDF("q", "d")
      .select(MaxSimMicro.maxsimMicro($"q", $"d", Subs)).collect()
    assert(same.head.getLong(0) === Subs * 1000000L)
    val withNull = Seq((
      Seq[java.lang.Double](1.0, null) ++ Seq.fill[java.lang.Double](62)(0.5),
      Seq.fill[java.lang.Double](64)(0.5)))
      .toDF("q", "d")
      .select(MaxSimMicro.maxsimMicro($"q", $"d", Subs)).collect()
    assert(withNull.head.isNullAt(0))
  }

  test("dimension mismatch fails loudly instead of truncating the grid") {
    import spark.implicits._
    val bad = Seq((Array.fill(64)(1.0), Array.fill(32)(1.0))).toDF("q", "d")
    val e = intercept[Exception] {
      bad.select(MaxSimMicro.maxsimMicro($"q", $"d", Subs)).collect()
    }
    assert(e.getMessage != null)
  }
}
