package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[RoundHalfUp.halfUp]]'s fast path to the BigDecimal HALF_UP
  * reference on the adversarial cases: exact half-integers (tie away
  * from zero both signs), the doubles one ulp either side of a half,
  * negatives, zero, large magnitudes near the fast-path cutoff, and a
  * large randomized sweep over the micro-rounded similarity/distance
  * domain.
  */
class RoundHalfUpSpec extends AnyFunSuite {
  private def reference(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  test("half-integers, ulp-adjacent values, signs, zero") {
    val cases = Seq.newBuilder[Double]
    for (i <- -1000 to 1000) {
      val h = i + 0.5
      cases += h
      cases += Math.nextUp(h)
      cases += Math.nextDown(h)
      cases += i.toDouble
    }
    for (m <- Seq(1e6, 1e9, 1e12, 2251799813685247.0, 2251799813685249.0)) {
      cases += m + 0.5
      cases += Math.nextUp(m + 0.5)
      cases += Math.nextDown(m + 0.5)
      cases += -(m + 0.5)
    }
    cases += 0.0
    cases += -0.0
    for (x <- cases.result())
      assert(RoundHalfUp.halfUp(x) === reference(x), s"x=$x (bits ${java.lang.Double.doubleToLongBits(x)})")
  }

  test("randomized sweep over the micro domain") {
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 200000) {
      val x = (rnd.nextDouble() * 2 - 1) * math.pow(10, rnd.nextInt(13))
      assert(RoundHalfUp.halfUp(x) === reference(x), s"x=$x")
    }
  }
}
