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

object VectorOps {
  import org.apache.spark.sql.graftglue.ColumnGlue.{column, expression}

  /** Column-API entry point. */
  def vectorDot(a: Column, b: Column): Column =
    column(VectorDot(expression(a), expression(b)))

  /** SQL registration: `SELECT vector_dot(v, w)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", {
        case Seq(a, b) => VectorDot(a, b)
        case exprs => throw graft.GraftExtensions.arity("vector_dot", 2, exprs.length)
      }, "built-in")
}
