package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `maxsim_micro(q, d)`: the late-interaction (ColBERT) pair score
  * Σ_m max_m′ round(cos(q_m, d_m′)·1e6) over the [[subs]]×[[subs]]
  * sub-vector grid of two equal-length ARRAY<DOUBLE> embeddings — the
  * per-pair inner loop of q300 (and the exact-cell arithmetic q312's
  * bounded form shares), as ONE generated call into a tight primitive
  * loop.
  *
  * Why an Expression (round-20, guide §1.2 step 2 / codegen): the
  * previous q300 shape exploded the query side into [[subs]] rows per
  * pair so that each row's 8-way `greatest(round(dot...))` projection
  * stayed under the 64 KB codegen method limit (the fully fused
  * 64-cell Catalyst projection blew it and ran interpreted — 293 s at
  * the 20× stress, documented in Evaluation.scala since round 14),
  * then re-aggregated the [[subs]] rows per (query, doc). This
  * expression computes the whole 64-cell grid per PAIR row — the pair
  * stream drops 8× to |q|·|corpus| rows and the hash re-aggregation
  * disappears, while the generated call stays a few lines (the
  * VectorDot / QuantizerArgmin pattern).
  *
  * Bit-identical to the Catalyst composition it replaces:
  *  - each cell is dot(q_m, d_m′) accumulated left-to-right from 0.0
  *    over the sliced sub-array (the VectorDot contract), divided by
  *    greatest(‖q_m‖·‖d_m′‖, 1e-12) — norms are sqrt of the
  *    left-to-right self-dot of the same slice — then ·1e6 in that
  *    order;
  *  - rounding is Spark Round(x, 0) semantics (BigDecimal.valueOf,
  *    HALF_UP — ties away from zero) followed by the long cast, the
  *    [[QuantizerArgmin]] halfUp contract;
  *  - max over m′ and the sum over m are exact integer ops, so any
  *    evaluation order matches the old `greatest(...)` + `sum(...)`.
  * NULL input (never exercised by the non-null embedding tables)
  * nulls the result, and a length mismatch or a length not divisible
  * by [[subs]] fails loudly rather than truncating the grid.
  */
case class MaxSimMicro(left: Expression, right: Expression, subs: Int)
    extends BinaryExpression {
  require(subs > 0, "maxsim_micro needs a positive sub-vector count")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "maxsim_micro"

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"maxsim_micro requires ARRAY<DOUBLE>, got (${left.dataType.sql}, ${right.dataType.sql})")

  /** Spark Round(x, 0) on doubles, then the long cast — the shared
    * proven-exact fast path (see [[RoundHalfUp]]).
    */
  private def halfUp(x: Double): Long = RoundHalfUp.halfUp(x)

  def compute(qa: ArrayData, da: ArrayData): java.lang.Long = {
    val n = qa.numElements()
    require(n == da.numElements() && n % subs == 0 && n > 0,
      s"maxsim_micro: got dims ${n}×${da.numElements()}, need equal and divisible by $subs")
    var i = 0
    while (i < n) {
      if (qa.isNullAt(i) || da.isNullAt(i)) return null
      i += 1
    }
    val q = new Array[Double](n)
    val d = new Array[Double](n)
    i = 0
    while (i < n) { q(i) = qa.getDouble(i); d(i) = da.getDouble(i); i += 1 }
    val sub = n / subs
    // per-part norms once per call: sqrt of the left-to-right
    // self-dot over the slice — the norm(slice(...)) contract
    val qn = new Array[Double](subs)
    val dn = new Array[Double](subs)
    var m = 0
    while (m < subs) {
      var sq = 0.0
      var sd = 0.0
      var j = 0
      while (j < sub) {
        val x = q(m * sub + j); sq += x * x
        val y = d(m * sub + j); sd += y * y
        j += 1
      }
      qn(m) = math.sqrt(sq)
      dn(m) = math.sqrt(sd)
      m += 1
    }
    var total = 0L
    m = 0
    while (m < subs) {
      var best = Long.MinValue
      var mp = 0
      while (mp < subs) {
        var dot = 0.0
        var j = 0
        while (j < sub) { dot += q(m * sub + j) * d(mp * sub + j); j += 1 }
        val den = math.max(qn(m) * dn(mp), 1e-12)
        val cell = halfUp(dot / den * 1e6)
        if (cell > best) best = cell
        mp += 1
      }
      total += best
      m += 1
    }
    java.lang.Long.valueOf(total)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("msm", this, classOf[MaxSimMicro].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |java.lang.Long ${ev.value}_r = $ref.compute($a, $b);
       |if (${ev.value}_r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ${ev.value}_r.longValue(); }
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MaxSimMicro =
    copy(left = newLeft, right = newRight)
}

object MaxSimMicro {
  import org.apache.spark.sql.graftglue.ColumnGlue.{column, expression}

  /** Column-API entry point. */
  def maxsimMicro(q: Column, d: Column, subs: Int): Column =
    column(MaxSimMicro(expression(q), expression(d), subs))
}
