package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Final sketch summary — field names are the output column names
  * (match the q58/q71 oracle aliases exactly).
  */
case class HllSummary(regs_hit: Long, sum_rho: Long, hll_est: Long)

/** `hll_sketch(h)`: typed `Aggregator` (the UDAF surface) building a
  * 64-register HyperLogLog from 60-bit hashes — the custom-aggregate
  * dual of q58's groupBy(register).max(rho) relational formulation.
  * Same register semantics bit-for-bit (j = h mod 64, rho = 55 −
  * bitlength(h div 64)), so it shares q58's SQL oracle machinery.
  *
  * Scale property: the buffer IS the mergeable sketch. Catalyst runs
  * this as an ObjectHashAggregate with map-side partial aggregation,
  * so each map task ships ONE 64-long array per group — no distinct
  * pre-pass needed (register max is idempotent under duplicates),
  * which removes the per-partition dedup set the relational plan
  * uses to bound its shuffle.
  *
  * Estimator matches `Sketches.q58_hll_distinct`: denominator kept
  * exact-integer (Σ 2^(55−reg) over all registers, empty = 2^55), one
  * floating division at the end → order-independent and
  * engine-replayable.
  */
object HllAggregator extends Aggregator[Long, Array[Long], HllSummary] {
  final val M = 64
  final val MaxRho = 55L
  final val AlphaM2 = 0.709 * 4096 // alpha_64 * m², same constant as q58

  override def zero: Array[Long] = new Array[Long](M)

  private def rho(h: Long): Long = {
    val rest = h >>> 6 // 54 remaining bits of the 60-bit hash
    if (rest == 0L) MaxRho
    else MaxRho - (64 - java.lang.Long.numberOfLeadingZeros(rest))
  }

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    val j = (h % M).toInt
    val r = rho(h)
    if (r > b(j)) b(j) = r
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): HllSummary = {
    var hit = 0L; var sumRho = 0L; var den = 0L
    var i = 0
    while (i < M) {
      val r = b(i)
      if (r > 0) { hit += 1; sumRho += r }
      den += 1L << (MaxRho - r) // empty register contributes 2^55
      i += 1
    }
    val est = math.round(AlphaM2 * math.pow(2.0, MaxRho.toDouble) / den.toDouble)
    HllSummary(hit, sumRho, est)
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[HllSummary] = Encoders.product[HllSummary]

  /** Column-API entry point. */
  def sketch(h: Column): Column =
    functions.udaf(HllAggregator, Encoders.scalaLong).apply(h)

  /** SQL registration: `SELECT hll_sketch(h) … GROUP BY …`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("hll_sketch", functions.udaf(HllAggregator, Encoders.scalaLong))
}
