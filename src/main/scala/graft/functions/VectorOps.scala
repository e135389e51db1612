package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `vector_dot(a, b)`: native codegen'd dot product over two
  * ARRAY<DOUBLE> columns — the inner loop of every similarity-search
  * operator (Similarity q26/q27/q30/q34, DataPrep q46).
  *
  * Why an Expression and not `aggregate(zip_with(...))`: Catalyst
  * higher-order-function lambdas evaluate INTERPRETED per element
  * (measured 172x slower than a tight loop for per-row heavy compute
  * in this repo's Dedup sketches); a 64-dim dot via HOFs burns ~130
  * interpreted calls per pair. This expression is one generated Java
  * loop inside whole-stage codegen.
  *
  * Semantics match the HOF composition exactly: accumulation is
  * left-to-right from 0.0 (bit-identical doubles), NULL on NULL
  * input, NULL on any NULL element, NULL on length mismatch (the
  * zip_with null-pad → null-propagation behavior).
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_dot"

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot requires ARRAY<DOUBLE>, got (${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; }
         |  else { $s += $a.getDouble($i) * $b.getDouble($i); }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** `vector_to_double(a)`: native ARRAY<FLOAT> → ARRAY<DOUBLE> upcast.
  *
  * Why an Expression and not `transform(a, x -> cast(x as double))`:
  * HigherOrderFunction lambdas are CodegenFallback — the transform
  * puts an INTERPRETED projection (64 lambda invocations per row) at
  * the base of every embedding operator AND breaks the whole-stage
  * codegen span right above the scan. This expression is one method
  * call per row inside codegen; the cast itself is exact (every
  * float is representable as a double), so values are bit-identical
  * to the HOF form and no oracle changes. Accepts ARRAY<DOUBLE> as an
  * identity pass-through so double-typed fixture tables keep working.
  */
case class VectorToDouble(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private lazy val fromFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, containsNull) => ArrayType(DoubleType, containsNull)
    case _ => ArrayType(DoubleType, containsNull = true)
  }
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "vector_to_double"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) |
         ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vector_to_double requires ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${t.sql}")
  }

  def convert(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { if (a.isNullAt(i)) hasNull = true; i += 1 }
    if (!hasNull) {
      val out = new Array[Double](n)
      i = 0
      while (i < n) {
        out(i) = if (fromFloat) a.getFloat(i).toDouble else a.getDouble(i)
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) =
          if (a.isNullAt(i)) null
          else java.lang.Double.valueOf(
            if (fromFloat) a.getFloat(i).toDouble else a.getDouble(i))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override def nullSafeEval(a: Any): Any = convert(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vtd", this, classOf[VectorToDouble].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.convert($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): VectorToDouble =
    copy(child = newChild)
}

object VectorOps {
  import org.apache.spark.sql.graftglue.ColumnGlue.{column, expression}

  /** Column-API entry point. */
  def vectorDot(a: Column, b: Column): Column =
    column(VectorDot(expression(a), expression(b)))

  /** Column-API entry point for the native float→double upcast. */
  def vectorToDouble(a: Column): Column =
    column(VectorToDouble(expression(a)))

  /** SQL registration: `SELECT vector_dot(v, w)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", {
        case Seq(a, b) => VectorDot(a, b)
        case exprs => throw graft.GraftExtensions.arity("vector_dot", 2, exprs.length)
      }, "built-in")
}
