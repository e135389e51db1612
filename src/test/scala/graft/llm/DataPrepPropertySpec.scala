package graft.llm

import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Randomized invariants for the water-filling solver (q192's core):
  * over seeded random (mass, weight) tables and budget fractions,
  *
  *  - conservation: Σ alloc = budget EXACTLY (the property a float
  *    waterline cannot give);
  *  - feasibility: alloc ≤ mass everywhere, alloc ≥ 0;
  *  - cap consistency: capped sources get exactly their mass, and no
  *    UNcapped source would fit under the waterline its peers imply
  *    (otherwise the binding prefix was cut short);
  *  - proportionality: uncapped allocations are within 1 token of the
  *    residual-budget share w·B'/W' (largest-remainder rounding).
  *
  * Seeded Random, not ScalaCheck: each case costs a Spark job, so the
  * spec runs a fixed batch of 8 tables (incl. the all-capped and
  * single-source edges) rather than 100+ generative cases.
  */
class DataPrepPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(masses: Seq[Long], weights: Seq[Long],
                    num: Long, den: Long): Unit = {
    import spark.implicits._
    val rows = masses.indices.map(i => (f"src$i%02d", masses(i), weights(i)))
    val out = DataPrep.waterfill(
        rows.toDF("source", "mass", "w"), num, den)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val label = s"masses=$masses weights=$weights budget=$num/$den"
    val totalMass = masses.sum
    val budget = num * totalMass / den

    assert(out.map(_._5).sum == budget, s"conservation: $label -> ${out.toSeq}")
    out.foreach { case (s, m, _, _, a) =>
      assert(a >= 0L && a <= m, s"feasibility at $s: $label -> ${out.toSeq}")
    }
    val uncapped = out.filter(_._4 == 0L)
    val residB = budget - out.filter(_._4 == 1L).map(_._2).sum
    val residW = uncapped.map(_._3).sum
    out.filter(_._4 == 1L).foreach { case (s, m, _, _, a) =>
      assert(a == m, s"capped source $s must get its mass: $label")
    }
    uncapped.foreach { case (s, _, w, _, a) =>
      val share = residB.toDouble * w / math.max(residW, 1L)
      assert(math.abs(a - share) <= 1.0 + 1e-9,
        s"proportionality at $s: alloc $a vs share $share ($label)")
    }
  }

  test("conservation, feasibility, and proportionality over random tables") {
    val rnd = new Random(20260813L)
    for (_ <- 1 to 5) {
      val n = 2 + rnd.nextInt(10)
      val masses = Seq.fill(n)(1L + rnd.nextInt(100000).toLong)
      val weights = Seq.fill(n)(1L + rnd.nextInt(5).toLong)
      val (num, den) = Seq((1L, 2L), (4L, 5L), (9L, 10L))(rnd.nextInt(3))
      check(masses, weights, num, den)
    }
  }

  test("edge: budget = full corpus caps everyone") {
    check(Seq(100L, 200L, 300L), Seq(1L, 2L, 3L), 1L, 1L)
  }

  test("edge: single source") {
    check(Seq(12345L), Seq(3L), 4L, 5L)
  }

  test("edge: extreme skew binds several caps") {
    // tiny sources with big weights must cap; the giant absorbs the rest
    check(Seq(10L, 10L, 10L, 1000000L), Seq(5L, 5L, 5L, 1L), 4L, 5L)
  }
}
