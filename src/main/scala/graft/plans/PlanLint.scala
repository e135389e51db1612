package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.execution.{SparkPlan, FileSourceScanExec}
import org.apache.spark.sql.functions.{approx_count_distinct, count, lit, struct}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

/** Plan linter — the scale guardrails this library designs every
  * operator around, executable as a check: walk a physical plan and
  * flag the anti-patterns that are survivable at sf0.1 and fatal at
  * 100 TB. Intended for CI (specs assert `lint(df).isEmpty` on
  * shipped queries) and for interactive triage of new pipelines.
  *
  * Rules:
  *  - `cartesian-product`: CartesianProductExec, or a
  *    BroadcastNestedLoopJoin WITH a join condition — the silent
  *    fallback for a non-equi predicate (a missing equi-key or an
  *    un-bucketable range condition). A condition-less BNLJ is the
  *    idiomatic `crossJoin(broadcast(tiny))` — scalar stats, query
  *    batches, bounded dimension grids — and is not flagged.
  *  - `single-partition-window`: a WindowExec whose child exchange is
  *    SinglePartition — the global `Window.orderBy` funnel (one
  *    reducer does everything; q76/q92 show the scalable rewrites).
  *  - `unpruned-wide-scan`: a parquet scan materializing ≥ `wideScanFactor`×
  *    more columns than the table exposes... flagged when the read
  *    schema is the full table width while the query uses a strict
  *    subset (column pruning failed to reach the source).
  *
  * AQE note: adaptive plans and reused exchanges hide subtrees from
  * `children` — walked explicitly (same traversal as Observability).
  *
  * Findings are advisory triage, not a hard gate: three shipped
  * queries flag BY DESIGN and document why — q26/q199 (broadcast
  * query batch × corpus with the self-exclusion predicate as the
  * join condition; the LSH/IVF variants are the scale paths q26
  * calibrates, and q199's corpus side is the 32×-compressed PQ
  * codes), q42 (broadcast per-source stats with
  * an exclusion predicate), and the global-window-over-a-pre-bounded-
  * aggregate family (q83 deciles, q126 weekly backlog — inputs are
  * hundreds of rows by construction; q76 is the documented escape
  * hatch when they are not).
  */
object PlanLint {
  final case class Finding(rule: String, node: String)

  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val tail = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case r: ReusedExchangeExec => walk(r.child)
      case other => other.children.flatMap(walk)
    }
    p +: tail
  }

  def lint(df: DataFrame): Seq[Finding] = {
    val nodes = walk(df.queryExecution.executedPlan)
    val cartesian = nodes.collect {
      case c: CartesianProductExec =>
        Finding("cartesian-product", c.nodeName)
      case b: BroadcastNestedLoopJoinExec if b.condition.isDefined =>
        Finding("cartesian-product", b.nodeName)
    }
    val globalWindow = nodes.collect {
      case w: WindowExec
          if walk(w.child).exists {
            case e: ShuffleExchangeExec => e.outputPartitioning == SinglePartition
            case _ => false
          } =>
        Finding("single-partition-window", w.nodeName)
    }
    val wideScan = nodes.collect {
      case s: FileSourceScanExec
          if s.relation.dataSchema.size >= 4 &&
            s.requiredSchema.size == s.relation.dataSchema.size &&
            df.schema.size * 2 < s.requiredSchema.size =>
        Finding("unpruned-wide-scan",
          s"${s.nodeName} reads ${s.requiredSchema.size} cols for a " +
            s"${df.schema.size}-col result")
    }
    cartesian ++ globalWindow ++ wideScan
  }

  /** Data-aware rule: `low-cardinality-partition-window` — a window
    * partitioned by a key with too few distinct values to spread the
    * data (lang, source, …). Unlike the single-partition funnel this
    * is invisible in the plan shape — `Window.partitionBy($"lang")`
    * hash-partitions like any other window and runs fine at sf0.1 —
    * but each group serializes its FULL row set through one task, so
    * at 100× the group, not the cluster, is the unit of parallelism.
    * The fix is the two-phase range-partition scan
    * (`llm.DataPrep.groupedPrefixSum`, q76/q134): range-partition on
    * (group, id) so groups span partitions, seed per-partition scans
    * with driver-folded offsets.
    *
    * Cardinality is a property of the data, not the plan, so this
    * rule RUNS one bounded aggregate job per window node (approx
    * distinct of the partition key + row count over the window's
    * child) — call it from CI/specs, not from hot paths. A window is
    * flagged when the key has fewer than `minGroups` groups AND the
    * mean group is at least `minRowsPerGroup` rows — windows over
    * pre-bounded aggregates (tiny inputs) pass untouched.
    */
  def lintGroupedWindows(df: DataFrame, minGroups: Long = 64,
                         minRowsPerGroup: Long = 512): Seq[Finding] = {
    val spark = df.sparkSession
    val windows = df.queryExecution.analyzed.collect {
      case w: logical.Window if w.partitionSpec.nonEmpty => w
    }
    windows.flatMap { w =>
      val child = ColumnGlue.ofRows(spark, w.child)
      val keys = w.partitionSpec.map(ColumnGlue.column)
      val r = child
        .select(approx_count_distinct(struct(keys: _*)).as("g"),
          count(lit(1)).as("n"))
        .head()
      val (g, n) = (r.getLong(0), r.getLong(1))
      if (g > 0 && g < minGroups && n / g >= minRowsPerGroup)
        Some(Finding("low-cardinality-partition-window",
          s"Window partitioned by [${w.partitionSpec.map(_.sql).mkString(", ")}]: " +
            s"~$g groups over $n rows (~${n / g} rows funnel through each group's task)"))
      else None
    }
  }
}
