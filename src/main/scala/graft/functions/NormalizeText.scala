package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `normalize_text(s)`: canonical-form text normalization — lowercase,
  * map every char outside `[a-z0-9 ]` to a space, collapse space runs,
  * trim — in ONE byte scan instead of the two full `regexp_replace`
  * passes + `trim` it replaces (java.util.regex allocates a matcher
  * and re-walks the string per pass; measured ~3.5s → sub-second for
  * q63 at sf0.1).
  *
  * Equivalence to `trim(regexp_replace(regexp_replace(lower(s),
  * "[^a-z0-9 ]", " "), " +", " "))`: lowercase first (same
  * `UTF8String.toLowerCase` the `lower` expression uses), then scan
  * the UTF-8 bytes. Any byte outside ASCII `[a-z0-9 ]` opens/extends
  * a space run. A multi-byte code point contributes 2-4 such bytes
  * where the regex form substitutes one space per code point — but
  * both collapse to a single space under the run-collapse, so the
  * outputs agree byte-for-byte. Output is pure ASCII by construction.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "normalize_text"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize_text requires STRING, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  /** Static worker the generated code calls: one pass over the
    * lowercased bytes, writing keep-bytes and single spaces for
    * non-keep runs; leading/trailing runs are dropped (trim).
    */
  def normalize(s: UTF8String): UTF8String = {
    val lower = s.toLowerCase.getBytes
    val out = new Array[Byte](lower.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < lower.length) {
      val b = lower(i)
      val keep = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (keep) {
        if (pendingSpace && n > 0) { out(n) = ' '; n += 1 }
        pendingSpace = false
        out(n) = b; n += 1
      } else pendingSpace = true // space, punct, or any UTF-8 multi-byte
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }

  /** Column-API entry point. */
  def normalizeText(c: Column): Column = {
    import org.apache.spark.sql.graftglue.ColumnGlue.{column, expression}
    column(NormalizeText(expression(c)))
  }
}
