package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-≤) join — the time-series operator Spark has no
  * built-in for, composed from existing operators per the preference
  * order (compose > custom plan): tag both inputs, union, and take a
  * running `last(right_payload, ignoreNulls)` over a window
  * partitioned by key and ordered by (time, side). Each left row then
  * carries the latest right row at-or-before its timestamp.
  *
  * Why this beats the naive formulations at scale:
  *  - range-condition join (`r.ts <= l.ts`) plans as a broadcast
  *    nested-loop or cartesian — O(|L|·|R|) per key;
  *  - windowed self-join + max-subquery does two shuffles.
  *  This is ONE shuffle of L∪R on the key + a partition-local sort —
  *  the merge-join formulation, and the window state is a single
  *  struct (the running last), so memory is O(1) per key.
  *
  * Requirements: `right` must be unique per (key, rightTs) — pre-dedup
  * with the usual max_by pattern; both ts columns must share a type.
  * Right rows sort before left rows on equal timestamps → inclusive
  * (≤) match semantics, like DuckDB's ASOF JOIN.
  */
object AsOfJoin {

  /** Left columns pass through; the matched right row lands in one
    * struct column `matchCol` (null when nothing precedes).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, matchCol: String = "matched"): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    val rightStruct = struct(right.columns.map(col).toSeq: _*)
    val leftType = left.select(leftStruct).schema.head.dataType
    val rightType = right.select(rightStruct).schema.head.dataType

    val r = right.select(col(key).as("__k"), col(rightTs).as("__t"),
      lit(0).as("__side"), rightStruct.as("__r"), lit(null).cast(leftType).as("__l"))
    val l = left.select(col(key).as("__k"), col(leftTs).as("__t"),
      lit(1).as("__side"), lit(null).cast(rightType).as("__r"), leftStruct.as("__l"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col("__match").as(matchCol))
  }
}
