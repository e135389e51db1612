package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(s)`: Unicode canonical composition (NFC) as a
  * codegen'd Catalyst expression — the normalization pass a corpus
  * ingest runs so that byte-level dedup/fingerprinting (q20, q24,
  * q225) can't be defeated by visually-identical decomposed forms
  * (e + U+0301 vs é). Spark ships no normalizer; a Scala UDF would
  * drop the surrounding projection out of whole-stage codegen, so
  * this wraps `java.text.Normalizer` (ICU-equivalent for the
  * canonical forms) behind the same defineCodeGen shape as
  * [[NormalizeText]]. Fast path: `Normalizer.isNormalized` is a scan
  * without allocation — already-NFC text (the overwhelming majority
  * of real corpora) costs one pass and zero copies.
  *
  * DuckDB's built-in `nfc_normalize` replays the semantics exactly,
  * which is what makes the q266 audit oracle-checkable.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftglue.ColumnGlue
    ColumnGlue.column(NfcNormalize(ColumnGlue.expression(c)))
  }
}
