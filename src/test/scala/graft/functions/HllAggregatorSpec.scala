package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The sketch laws that make HllAggregator safe to run as a
  * distributed partial/final aggregate under ANY partitioning:
  * duplicate idempotence, merge = union semantics, and
  * order-independence. Plus the SQL registration surface.
  */
class HllAggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes("UTF-8"))
    var v = 0L
    (0 until 8).foreach(j => v = (v << 8) | (d(j) & 0xffL))
    v >>> 4
  }

  private val keys = (1 to 5000).map(i => h60(s"key$i"))

  private def run(hs: Seq[Long]): Array[Long] =
    hs.foldLeft(HllAggregator.zero)(HllAggregator.reduce)

  test("duplicates never change the sketch (idempotent reduce)") {
    val once = run(keys)
    val thrice = run(keys ++ keys ++ keys)
    assert(once.toSeq == thrice.toSeq)
  }

  test("merge of split parts equals the single-pass sketch, any split, any order") {
    val whole = run(keys)
    for (splitAt <- Seq(1, 777, 2500, 4999)) {
      val (a, b) = keys.splitAt(splitAt)
      val merged = HllAggregator.merge(run(b.reverse), run(a))
      assert(merged.toSeq == whole.toSeq, s"split at $splitAt diverges")
    }
  }

  test("estimate lands within 20% of truth at 5k distinct (m=64 => ~13% stderr)") {
    val est = HllAggregator.finish(run(keys)).hll_est
    assert(math.abs(est - 5000.0) / 5000.0 < 0.2, s"estimate $est too far from 5000")
  }

  test("SQL registration aggregates through the udaf surface") {
    import spark.implicits._
    HllAggregator.register(spark)
    keys.toDF("h").createOrReplaceTempView("hll_in")
    val viaSql = spark.sql(
      "SELECT hll_sketch(h).hll_est FROM hll_in").as[Long].head()
    assert(viaSql == HllAggregator.finish(run(keys)).hll_est)
  }
}
