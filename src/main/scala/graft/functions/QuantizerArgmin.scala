package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `quantizer_argmin(v)`: native nearest-centroid assignment — the
  * inner loop of the whole quantizer family (IVF assignment q34/q49,
  * SemDeDup clusters q195, purity q227, probe sweep q249, the PQ
  * subspace codes q198/q199/q287).
  *
  * Returns STRUCT(d: BIGINT, cid: INT) — the micro-rounded squared
  * distance and id of the nearest centroid — bit-identical to the
  * `array_min(array(struct(round((vv − 2·dot + cc)·1e6), cid), …))`
  * composition it replaces:
  *  - vv and each dot accumulate left-to-right from 0.0 (the
  *    VectorDot contract that matches DuckDB's list_inner_product);
  *  - cc is the PRECOMPUTED Scala `c.map(x·x).sum` fold, passed in so
  *    the constant matches the oracle's list_inner_product exactly;
  *  - the combine order is ((vv − 2.0·dot) + cc) · 1e6, then Spark's
  *    Round semantics (BigDecimal.valueOf HALF_UP — ties away from
  *    zero, same as DuckDB's ROUND);
  *  - ties break to the LOWER cid (strict <, ascending scan) — the
  *    array_min lexicographic struct order.
  *
  * Why an Expression: `array_min` is CodegenFallback, so the HOF
  * composition ran an interpreted 16-struct allocation per row at the
  * base of every quantizer scan (~95 µs/row measured at 20k vectors)
  * AND broke the whole-stage codegen span; this is one generated call
  * per row into a tight primitive loop. Any NULL element nulls the
  * result (the composition's d would be null — never exercised by the
  * non-null embedding tables, pinned by spec).
  */
case class QuantizerArgmin(child: Expression,
    centers: Seq[Seq[Double]], cc: Seq[Double]) extends UnaryExpression {
  require(centers.nonEmpty && centers.length == cc.length,
    "quantizer_argmin needs aligned centers and Σc² constants")

  @transient private lazy val cArr: Array[Array[Double]] =
    centers.map(_.toArray).toArray
  @transient private lazy val ccArr: Array[Double] = cc.toArray

  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "quantizer_argmin"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantizer_argmin requires ARRAY<DOUBLE>, got ${t.sql}")
  }

  /** Spark Round(x, 0) semantics on doubles: BigDecimal.valueOf →
    * HALF_UP (ties away from zero), identical to DuckDB's ROUND.
    */
  private def halfUp(x: Double): Long = RoundHalfUp.halfUp(x)

  def compute(a: ArrayData): InternalRow = {
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    val v = new Array[Double](n)
    i = 0
    while (i < n) { v(i) = a.getDouble(i); i += 1 }
    var vv = 0.0
    i = 0
    while (i < n) { vv += v(i) * v(i); i += 1 }
    var bestD = Long.MaxValue
    var bestC = 0
    var c = 0
    while (c < cArr.length) {
      val ctr = cArr(c)
      // a malformed codebook must fail loudly — a truncated dot loop
      // would silently corrupt every assignment downstream
      require(ctr.length == n,
        s"quantizer_argmin: vector dim $n != centroid dim ${ctr.length} (cid $c)")
      var dot = 0.0
      i = 0
      while (i < n) { dot += v(i) * ctr(i); i += 1 }
      val d = halfUp(((vv - 2.0 * dot) + ccArr(c)) * 1e6)
      if (d < bestD) { bestD = d; bestC = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestC))
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qam", this, classOf[QuantizerArgmin].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($a);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizerArgmin =
    copy(child = newChild)
}

/** `quantizer_top2(v)`: the two nearest centroids in one generated
  * call — STRUCT(d1: BIGINT, c1: INT, d2: BIGINT, c2: INT), micro-
  * rounded squared distances with [[QuantizerArgmin]]'s exact float
  * tree, rounding and lower-cid tie-break (d1/c1 is bit-identical to
  * `quantizer_argmin`; d2/c2 is the runner-up under the same (d, cid)
  * order). Consumers: the simplified-silhouette validity index
  * (q333), whose per-point `b` term is the distance to the nearest
  * OTHER centroid — with nearest-centroid assignment that is exactly
  * the second-smallest distance, so one pass yields both terms and
  * nothing k-fold ever materializes per row. A single-centroid
  * codebook nulls d2/c2 (no runner-up — the q327 single-cluster
  * posture), never throws.
  */
case class QuantizerTop2(child: Expression,
    centers: Seq[Seq[Double]], cc: Seq[Double]) extends UnaryExpression {
  require(centers.nonEmpty && centers.length == cc.length,
    "quantizer_top2 needs aligned centers and Σc² constants")

  @transient private lazy val cArr: Array[Array[Double]] =
    centers.map(_.toArray).toArray
  @transient private lazy val ccArr: Array[Double] = cc.toArray

  override def dataType: DataType = StructType(Seq(
    StructField("d1", LongType, nullable = false),
    StructField("c1", IntegerType, nullable = false),
    StructField("d2", LongType, nullable = true),
    StructField("c2", IntegerType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "quantizer_top2"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantizer_top2 requires ARRAY<DOUBLE>, got ${t.sql}")
  }

  private def halfUp(x: Double): Long = RoundHalfUp.halfUp(x)

  def compute(a: ArrayData): InternalRow = {
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    val v = new Array[Double](n)
    i = 0
    while (i < n) { v(i) = a.getDouble(i); i += 1 }
    var vv = 0.0
    i = 0
    while (i < n) { vv += v(i) * v(i); i += 1 }
    var d1 = Long.MaxValue; var c1 = -1
    var d2 = Long.MaxValue; var c2 = -1
    var c = 0
    while (c < cArr.length) {
      val ctr = cArr(c)
      require(ctr.length == n,
        s"quantizer_top2: vector dim $n != centroid dim ${ctr.length} (cid $c)")
      var dot = 0.0
      i = 0
      while (i < n) { dot += v(i) * ctr(i); i += 1 }
      val d = halfUp(((vv - 2.0 * dot) + ccArr(c)) * 1e6)
      // ascending cid scan with strict < keeps both slots on the
      // lowest cid among ties — the (d, cid) struct order
      if (d < d1) { d2 = d1; c2 = c1; d1 = d; c1 = c }
      else if (d < d2) { d2 = d; c2 = c }
      c += 1
    }
    if (c2 < 0) new GenericInternalRow(Array[Any](d1, c1, null, null))
    else new GenericInternalRow(Array[Any](d1, c1, d2, c2))
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qt2", this, classOf[QuantizerTop2].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($a);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizerTop2 =
    copy(child = newChild)
}

/** `quantizer_topcap(v)`: the `cap` nearest centroids in one generated
  * call — ARRAY<STRUCT<d: BIGINT, cid: INT>> sorted ascending by
  * (d, cid), micro-rounded squared distances with [[QuantizerArgmin]]'s
  * exact float tree, rounding and lower-cid tie-break. Element i is
  * cell rank i+1: bit-identical to the
  * `explode(centroids) → dist2 → row_number over (dmicro, cid) →
  * crank ≤ cap` composition the graph-ANN rankCells helper used
  * through round 19 — that form fanned N·k rows through an exchange
  * and a per-vector sort window; this is one call per row with no
  * fan-out and no shuffle (round 20, guide §2.4). Returns
  * min(cap, k) entries when the codebook is smaller than the cap.
  */
case class QuantizerTopCap(child: Expression,
    centers: Seq[Seq[Double]], cc: Seq[Double], cids: Seq[Int], cap: Int)
  extends UnaryExpression {
  require(centers.nonEmpty && centers.length == cc.length &&
    centers.length == cids.length && cap > 0,
    "quantizer_topcap needs aligned centers/Σc²/cids and a positive cap")

  @transient private lazy val cArr: Array[Array[Double]] =
    centers.map(_.toArray).toArray
  @transient private lazy val ccArr: Array[Double] = cc.toArray
  @transient private lazy val cidArr: Array[Int] = cids.toArray

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("cid", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "quantizer_topcap"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantizer_topcap requires ARRAY<DOUBLE>, got ${t.sql}")
  }

  private def halfUp(x: Double): Long = RoundHalfUp.halfUp(x)

  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    val v = new Array[Double](n)
    i = 0
    while (i < n) { v(i) = a.getDouble(i); i += 1 }
    var vv = 0.0
    i = 0
    while (i < n) { vv += v(i) * v(i); i += 1 }
    val m = math.min(cap, cArr.length)
    // insertion-sorted (d, cid) slots: ascending cid scan with strict
    // ordering comparisons keeps the lower cid first among equal d —
    // the (dmicro, cid) window order
    val ds = new Array[Long](m)
    val cs = new Array[Int](m)
    var filled = 0
    var c = 0
    while (c < cArr.length) {
      val ctr = cArr(c)
      require(ctr.length == n,
        s"quantizer_topcap: vector dim $n != centroid dim ${ctr.length} (cid $c)")
      var dot = 0.0
      i = 0
      while (i < n) { dot += v(i) * ctr(i); i += 1 }
      val d = halfUp(((vv - 2.0 * dot) + ccArr(c)) * 1e6)
      // find insertion point among the filled slots (cid ascends, so
      // equal-d incumbents always keep priority: strict < on d)
      if (filled < m || d < ds(m - 1)) {
        var pos = if (filled < m) filled else m - 1
        while (pos > 0 && d < ds(pos - 1)) {
          ds(pos) = ds(pos - 1); cs(pos) = cs(pos - 1); pos -= 1
        }
        ds(pos) = d; cs(pos) = cidArr(c)
        if (filled < m) filled += 1
      }
      c += 1
    }
    val out = new Array[Any](filled)
    i = 0
    while (i < filled) {
      out(i) = new GenericInternalRow(Array[Any](ds(i), cs(i)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qtc", this, classOf[QuantizerTopCap].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($a);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizerTopCap =
    copy(child = newChild)
}

object QuantizerTopCap {
  import org.apache.spark.sql.graftglue.ColumnGlue.{column, expression}

  /** Column-API entry. Unlike [[QuantizerArgmin.argmin]]'s dense-cid
    * contract, cids need only be STRICTLY ASCENDING in scan order —
    * the q349 append audit derives seeds from the base slice, whose
    * vec_ids are sparse — which keeps the strict-< insertion's
    * lower-cid-first tie-break equal to the (dmicro, cid) window
    * order.
    */
  def topCap(v: Column, seeds: Array[(Int, Array[Double])], cap: Int): Column = {
    require(seeds.length <= 1 ||
      seeds.sliding(2).forall(p => p(0)._1 < p(1)._1),
      "quantizer_topcap expects strictly ascending cids")
    column(QuantizerTopCap(expression(v),
      seeds.map(_._2.toSeq).toSeq,
      seeds.map(_._2.map(x => x * x).sum).toSeq,
      seeds.map(_._1).toSeq, cap))
  }
}

object QuantizerTop2 {
  import org.apache.spark.sql.graftglue.ColumnGlue.{column, expression}

  /** Column-API entry — same dense-ordered-cid seed contract as
    * [[QuantizerArgmin.argmin]].
    */
  def top2(v: Column, seeds: Array[(Int, Array[Double])]): Column = {
    require(seeds.zipWithIndex.forall { case ((cid, _), i) => cid == i },
      "quantizer_top2 expects dense ordered cids 0..k-1")
    column(QuantizerTop2(expression(v),
      seeds.map(_._2.toSeq).toSeq,
      seeds.map(_._2.map(x => x * x).sum).toSeq))
  }
}

object QuantizerArgmin {
  import org.apache.spark.sql.graftglue.ColumnGlue.{column, expression}

  /** Column-API entry: seeds as the (cid, vector) list the quantizer
    * family already carries — cid MUST be the dense 0..k−1 range in
    * order (the assignment contract the oracles replay).
    */
  def argmin(v: Column, seeds: Array[(Int, Array[Double])]): Column = {
    require(seeds.zipWithIndex.forall { case ((cid, _), i) => cid == i },
      "quantizer_argmin expects dense ordered cids 0..k-1")
    column(QuantizerArgmin(expression(v),
      seeds.map(_._2.toSeq).toSeq,
      seeds.map(_._2.map(x => x * x).sum).toSeq))
  }

  /** Raw-codebook entry (the PQ subspace form): centers with their
    * PRECOMPUTED Σc² folds — pass the same Scala left-to-right sums
    * the expression composition used, never recompute in a different
    * order.
    */
  def argmin(v: Column, centers: Array[Array[Double]], ccs: Array[Double]): Column =
    column(QuantizerArgmin(expression(v),
      centers.map(_.toSeq).toSeq, ccs.toSeq))
}
