package graft.functions

/** Spark `Round(x, 0)`-equivalent rounding of a double to a long —
  * ties away from zero on the value's SHORTEST-DECIMAL representation
  * (java.math.BigDecimal.valueOf + HALF_UP, the semantics DuckDB's
  * ROUND shares) — with a branch-free fast path instead of the
  * BigDecimal string round-trip (~100 ns/call; the graph/ANN native
  * expressions call this up to 64× per pair row).
  *
  * Why the fast path is EXACT, not approximate, for |x| < 2⁵¹:
  * let f = floor(|x|). Both f and f + 0.5 are exactly representable
  * (|x| < 2⁵¹ ⇒ half-integers fit in a double), and |x| − f is exact
  * (Sterbenz for f ≥ 1, trivial for f = 0). BigDecimal.valueOf
  * rounds the shortest decimal d of |x|, and d and |x| are always on
  * the SAME side of f + 0.5: d round-trips to |x| (no other double
  * is closer to d), so d crossing the exactly-representable
  * f + 0.5 while |x| did not would make d parse back to f + 0.5 ≠
  * |x| — a contradiction. Hence HALF_UP(d) = f + (|x| − f ≥ 0.5),
  * and the sign is restored by negation (ties away from zero).
  * |x| ≥ 2⁵¹ (never reached by the micro-rounded similarity /
  * distance domains, which top out around 1e12) falls back to the
  * BigDecimal path unchanged. RoundHalfUpSpec pins equality on
  * random, half-integer and ±ulp-adjacent values.
  */
object RoundHalfUp {
  private final val FastMax = 2251799813685248.0 // 2^51

  def halfUp(x: Double): Long = {
    val ax = math.abs(x)
    if (ax < FastMax) {
      val f = math.floor(ax)
      val r = if (ax - f >= 0.5) f + 1.0 else f
      if (x < 0) -r.toLong else r.toLong
    } else {
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }
  }
}
