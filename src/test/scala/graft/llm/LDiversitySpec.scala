package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q335 entropy / recursive ℓ-diversity — planted class fixtures with
  * closed-form entropies plus a naive replay on the harness tables.
  */
class LDiversitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q335 planted: uniform, skewed and pure classes score their closed forms") {
    import spark.implicits._
    val tmp = TestSpark.tempDir("ldiv_planted")
    // class (1, U): one customer, 20 orders uniform over 4 priorities
    // class (2, S): one customer, 100 orders split 97/1/1/1
    // class (3, P): one customer, 10 orders of one priority
    Seq((1L, 1L, "U"), (2L, 2L, "S"), (3L, 3L, "P"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val orders =
      (0 until 20).map(i => (1L, s"${i % 4}-PRIO")) ++
        ((0 until 97).map(_ => (2L, "0-PRIO")) ++
          Seq((2L, "1-PRIO"), (2L, "2-PRIO"), (2L, "3-PRIO"))) ++
        (0 until 10).map(_ => (3L, "0-PRIO"))
    orders.toDF("o_custkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = DataPrep.q335_l_diversity(spark, tmp).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getInt(6)))).toMap
    graft.Caches.releaseAll()
    // uniform: each term = round(1e6·(1/4)·ln 4), H = 4 terms exactly
    val uTerm = math.round(1e6 * 0.25 * math.log(4.0))
    val uH = 4 * uTerm
    val uEff = math.round(1e6 * math.exp(uH / 1e6))
    assert(got(1L) == ((20L, 4L, uH, uEff, 1)), s"uniform: ${got(1L)}")
    assert(uEff >= 3999000L && uEff <= 4001000L, s"eff-l ≈ 4: $uEff")
    // skewed: distinct-l still 4, but recursive (3,2) fails (4·97 > 3·100)
    val sH = math.round(1e6 * 0.97 * math.log(100.0 / 97.0)) +
      3 * math.round(1e6 * 0.01 * math.log(100.0))
    val sEff = math.round(1e6 * math.exp(sH / 1e6))
    assert(got(2L) == ((100L, 4L, sH, sEff, 0)), s"skewed: ${got(2L)}")
    assert(sEff < 2000000L, s"a 97% class must have effective l < 2: $sEff")
    // pure: entropy 0, effective l exactly 1
    assert(got(3L) == ((10L, 1L, 0L, 1000000L, 0)), s"pure: ${got(3L)}")
  }

  test("q335: classes match q209's partition and the naive entropy replay") {
    val dir = "/root/testdata/sf0.001"
    val got = DataPrep.q335_l_diversity(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6)))).toMap
    graft.Caches.releaseAll()
    val cust = graft.Tables.load(spark, dir, "customer")
      .selectExpr("c_custkey", "cast(c_nationkey as long) nation", "c_mktsegment")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap
    val joined = graft.Tables.load(spark, dir, "orders")
      .selectExpr("o_custkey", "o_orderpriority").collect()
      .flatMap(r => cust.get(r.getLong(0)).map(c => (c, r.getString(1))))
    val naive = joined.groupBy(_._1).map { case (cls, g) =>
      val bySens = g.groupBy(_._2).map { case (_, h) => h.length.toLong }
      val n = g.length.toLong
      val h = bySens.map(c =>
        math.round(1e6 * (c.toDouble / n) * math.log(n.toDouble / c))).sum
      cls -> (n, bySens.size.toLong, h,
        math.round(1e6 * math.exp(h / 1e6)),
        if (4 * bySens.max < 3 * n) 1 else 0)
    }
    assert(got == naive)
  }
}
