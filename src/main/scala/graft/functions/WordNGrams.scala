package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngrams(text, n)` — a native Catalyst `Generator` (the UDTF
  * surface, SURVEY §2.11): one input row fans out to one row per word
  * n-gram. Planned as a `Generate` node exactly like the built-in
  * `explode`, so Catalyst prunes columns through it and the fan-out
  * streams row-by-row — the array of grams is never materialized per
  * document (what `explode(transform(...))` does), which matters when
  * a 100 MB document would otherwise allocate its whole gram list.
  *
  * The n-gram text itself is assembled in one pass over the UTF8
  * bytes (no per-gram String decode/encode): a whitespace scan finds
  * word offsets, each gram is a single byte-range copy. n must be a
  * foldable positive literal (checked at analysis).
  *
  * Generators sit outside whole-stage codegen by design
  * (CodegenFallback) — the row fan-out dominates, as with the
  * built-ins. Heavy per-gram COMPUTE (hashing, sketching) still
  * belongs in mapPartitions (measured, see llm/Dedup).
  */
case class WordNGrams(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def elementSchema: StructType =
    StructType(StructField("gram", StringType) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"word_ngrams first argument must be STRING, got ${child.dataType.sql}")
    else if (n.dataType != IntegerType || !n.foldable)
      TypeCheckResult.TypeCheckFailure("word_ngrams n must be an INT literal")
    else n.eval() match {
      case k: Integer if k >= 1 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("word_ngrams n must be >= 1")
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input).asInstanceOf[UTF8String]
    if (text == null) return Iterator.empty
    val k = n.eval().asInstanceOf[Int]
    val bytes = text.getBytes
    // word start offsets (split on single space, keeping empties —
    // the same contract as split(text, ' ', -1) everywhere else)
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') starts += i + 1
      i += 1
    }
    val nWords = starts.length
    if (nWords < k) return Iterator.empty
    // gram i spans words [i, i+k): bytes from starts(i) to the end of
    // word i+k-1 (one byte-range copy per gram, no String round-trip)
    (0 to nWords - k).iterator.map { w =>
      val from = starts(w)
      val until = if (w + k < nWords) starts(w + k) - 1 else bytes.length
      InternalRow(UTF8String.fromBytes(bytes, from, until - from))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WordNGrams =
    copy(child = newChildren(0), n = newChildren(1))
}

object NGrams {
  import org.apache.spark.sql.graftglue.ColumnGlue.{column, expression}

  /** Column-API entry point: `df.select(NGrams.wordNGrams($"text", 3))`. */
  def wordNGrams(text: Column, n: Int): Column =
    column(WordNGrams(expression(text), Literal(n)))

  /** SQL registration: `SELECT word_ngrams(text, 3) FROM ...` /
    * `LATERAL VIEW word_ngrams(text, 3)`.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams", {
        case Seq(t, k) => WordNGrams(t, k)
        case exprs => throw graft.GraftExtensions.arity("word_ngrams", 2, exprs.length)
      }, "built-in")
}
