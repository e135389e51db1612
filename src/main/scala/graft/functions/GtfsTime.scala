package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Parse helper shared by interpreted eval and generated code. Kept as
  * a static Java-callable so `doGenCode` can reference it from
  * whole-stage-generated Java.
  */
object GtfsTimeUtil {
  /** GTFS `H+:MM:SS` (hours may exceed 24 — service-day times,
    * dags/gtfs_static_daily.py:94-95) → seconds since service-day
    * start, or -1 when malformed (mapped to SQL NULL by the caller).
    */
  def toSeconds(s: UTF8String): Long = {
    if (s == null) return -1L
    val bytes = s.getBytes
    var i = 0
    val n = bytes.length
    // hours: 1+ digits
    var h = 0L; var nd = 0
    while (i < n && bytes(i) >= '0' && bytes(i) <= '9') { h = h * 10 + (bytes(i) - '0'); i += 1; nd += 1 }
    if (nd < 1 || i >= n || bytes(i) != ':') return -1L
    i += 1
    if (i + 1 >= n || bytes(i) < '0' || bytes(i) > '9' || bytes(i + 1) < '0' || bytes(i + 1) > '9') return -1L
    val m = (bytes(i) - '0') * 10 + (bytes(i + 1) - '0'); i += 2
    if (i >= n || bytes(i) != ':') return -1L
    i += 1
    if (i + 1 >= n || bytes(i) < '0' || bytes(i) > '9' || bytes(i + 1) < '0' || bytes(i + 1) > '9') return -1L
    val sec = (bytes(i) - '0') * 10 + (bytes(i + 1) - '0'); i += 2
    if (i != n || m > 59 || sec > 59) return -1L
    h * 3600L + m * 60L + sec
  }
}

/** `gtfs_time_to_seconds(col)`: the one scalar the reference's KPI
  * layer needs that Spark lacks (SURVEY.md §2.11, §7.3). Implemented
  * as a native codegen'd `UnaryExpression` so it stays inside
  * whole-stage codegen on the hot delay-derivation path (a Scala UDF
  * would break the codegen span and box every row).
  *
  * NULL on NULL input and on malformed strings — the reference data
  * keeps these as free-form strings in bronze, so parse failures must
  * not kill a 100 TB job.
  */
case class GtfsTimeToSeconds(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gtfs_time_to_seconds requires STRING, got ${child.dataType.sql}")
  override def nullable: Boolean = true
  override def prettyName: String = "gtfs_time_to_seconds"
  // Literal inputs fold at optimization time (Catalyst ConstantFolding
  // calls eval) — keeps `gtfs_time_to_seconds('09:00:00')` thresholds
  // out of the per-row path entirely.
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any = {
    val r = GtfsTimeUtil.toSeconds(input.asInstanceOf[UTF8String])
    if (r < 0) null else java.lang.Long.valueOf(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val parsed = ctx.freshName("parsed")
      s"""
         |long $parsed = graft.functions.GtfsTimeUtil.toSeconds($c);
         |if ($parsed < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $parsed; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GtfsTimeToSeconds =
    copy(child = newChild)
}

object GtfsTime {
  /** Column-API entry point. */
  def gtfsTimeToSeconds(c: Column): Column =
    org.apache.spark.sql.graftglue.ColumnGlue.column(
      GtfsTimeToSeconds(org.apache.spark.sql.graftglue.ColumnGlue.expression(c)))

  /** SQL registration: `SELECT gtfs_time_to_seconds(arrival_time)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gtfs_time_to_seconds", {
        case Seq(e) => GtfsTimeToSeconds(e)
        case exprs => throw graft.GraftExtensions.arity("gtfs_time_to_seconds", 1, exprs.length)
      }, "built-in")
}
