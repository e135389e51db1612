package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Randomized-fixture properties for the valuation layer — invariants
  * that must hold on ANY corpus, checked across seeds (each case runs
  * a real Spark job, so seeds are few but the properties are sharp):
  *
  *  - KNN-Shapley: efficiency (values sum to hits@K/K per query) and
  *    symmetry (byte-identical training points earn identical value);
  *  - k-center: the coverage radius is non-increasing in rounds
  *    (adding a center can only shrink every min-distance);
  *  - geometric median: bit-exact invariance under vec_id relabeling
  *    (the estimator depends only on values — any id/partition-order
  *    sensitivity would be a hidden nondeterminism).
  */
class EvaluationPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def randVecs(seed: Int, n: Int): IndexedSeq[(Long, Array[Float], Int)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f), rnd.nextInt(4)))
  }

  private def write(rows: Seq[(Long, Array[Float], Int)], tag: String): String = {
    import spark.implicits._
    val tmp = TestSpark.tempDir(tag)
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  test("shapley: efficiency holds on random corpora across seeds") {
    for (seed <- Seq(101, 202, 303)) {
      val rows = randVecs(seed, 60) // vec 0 and 50 are queries
      val dir = write(rows, s"prop_shap_$seed")
      val out = Evaluation.q288_knn_shapley(spark, dir).collect()
      val total = out.map(_.getLong(4)).sum
      // independent expected: for each query, hits@K of the exact
      // cosine ranking among the OTHER 59 points
      def cosMicro(a: Array[Float], b: Array[Float]): Long = {
        var d = 0.0; var na = 0.0; var nb = 0.0
        for (i <- a.indices) {
          d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
          nb += b(i).toDouble * b(i)
        }
        math.round(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6)
      }
      val expected = Seq(0, 50).map { q =>
        val qr = rows(q)
        val hits = rows.filter(_._1 != qr._1)
          .map(r => (r._1, r._3, cosMicro(qr._2, r._2)))
          .sortBy(t => (-t._3, t._1)).take(Evaluation.ShapK)
          .count(_._2 == qr._3)
        math.round(1e12 * hits / Evaluation.ShapK)
      }.sum
      assert(math.abs(total - expected) <= 2000L,
        s"seed $seed: sum=$total expected=$expected")
    }
  }

  test("shapley: byte-identical training points earn identical value") {
    import spark.implicits._
    val rows = randVecs(7, 40)
    // duplicate training point 5 as id 99 (same vector, same label;
    // NOT a multiple of 50 — that would make the copy a query and
    // break the symmetry by self-exclusion)
    val withDup = rows :+ (99L, rows(5)._2, rows(5)._3)
    val dir = write(withDup, "prop_shap_sym")
    val out = Evaluation.q288_knn_shapley(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(out(5L) == out(99L),
      s"symmetry: ${out(5L)} vs ${out(99L)}")
  }

  test("k-center: coverage radius is non-increasing across rounds") {
    for (seed <- Seq(11, 23)) {
      val dir = write(randVecs(seed, 80), s"prop_kc_$seed")
      val cov = Evaluation.q289_kcenter_coreset(spark, dir).collect()
        .sortBy(_.getLong(0)).map(_.getLong(2))
      cov.sliding(2).foreach { case Array(a, b) =>
        assert(b <= a, s"seed $seed: coverage grew $a -> $b")
      }
    }
  }

  test("geometric median: invariant under vec_id relabeling (no hidden order dependence)") {
    // the estimator depends only on VALUES — re-labeling every vec_id
    // (and therefore every partition/sort order the ids induce) must
    // reproduce the output bit-for-bit
    val base = randVecs(31, 50)
    val relabeled = base.map { case (id, v, l) => (1000L - id, v, l) }
    val d1 = write(base, "prop_gm_base")
    val d2 = write(relabeled, "prop_gm_relabel")
    val g1 = Evaluation.q296_geometric_median(spark, d1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val g2 = Evaluation.q296_geometric_median(spark, d2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(g1 == g2, "relabeling ids must not move the median")
  }
}
