package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.util.QueryExecutionListener

/** Pipeline observability — per-query metrics harvested from the
  * EXECUTED plan (actuals, not estimates) through the public
  * `QueryExecutionListener` hook: scan rows/files/bytes, shuffle
  * count and shuffle rows, wall time. This is what a production
  * driver exports per pipeline stage; queries need no code changes.
  *
  * Everything here reads driver-side plan metrics (SQLMetrics are
  * already accumulated on the driver) — zero executor overhead and
  * no extra actions. Listener callbacks fire asynchronously after
  * the action completes; `drain()` is the synchronization point.
  */
object Observability {

  /** Actuals for one executed query (action). */
  case class QueryStats(
      action: String,
      durationMs: Long,
      scanRows: Long,
      scanFiles: Long,
      scanBytes: Long,
      shuffles: Int,
      shuffleRows: Long,
      failed: Boolean)

  /** Walk the final (adaptive) plan. AQE wraps materialized stages in
    * leaf QueryStageExec nodes whose subtree hangs off `.plan`, and
    * reused exchanges hide theirs under `.child` — plain `children`
    * recursion sees none of it.
    */
  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: walk(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r +: walk(r.child)
    case other => other +: other.children.flatMap(walk)
  }

  private def metric(p: SparkPlan, name: String): Long =
    p.metrics.get(name).map(_.value).getOrElse(0L)

  private[graft] def statsOf(action: String, qe: QueryExecution,
                             durationNs: Long, failed: Boolean): QueryStats = {
    val nodes = walk(qe.executedPlan)
    val scans = nodes.collect { case f: FileSourceScanExec => f }
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    QueryStats(
      action = action,
      durationMs = durationNs / 1000000L,
      scanRows = scans.map(metric(_, "numOutputRows")).sum,
      scanFiles = scans.map(metric(_, "numFiles")).sum,
      scanBytes = scans.map(metric(_, "filesSize")).sum,
      shuffles = shuffles.size,
      shuffleRows = shuffles.map(metric(_, "shuffleRecordsWritten")).sum,
      failed = failed)
  }

  /** A registrable listener accumulating QueryStats until drained. */
  final class StatsListener extends QueryExecutionListener {
    private val buf = new ConcurrentLinkedQueue[QueryStats]()

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      buf.add(statsOf(funcName, qe, durationNs, failed = false))

    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit =
      buf.add(statsOf(funcName, qe, 0L, failed = true))

    /** Synchronize (listener bus is async) and return all captured
      * stats since the last drain.
      */
    def drain(spark: SparkSession): Seq[QueryStats] = {
      org.apache.spark.sql.graftglue.ColumnGlue.flushListenerBus(spark)
      Iterator.continually(buf.poll()).takeWhile(_ != null).toSeq
    }
  }

  /** Attach a fresh listener to the session. Detach with `remove`. */
  def attach(spark: SparkSession): StatsListener = {
    val l = new StatsListener
    spark.listenerManager.register(l)
    l
  }

  def remove(spark: SparkSession, l: StatsListener): Unit =
    spark.listenerManager.unregister(l)

  /** Stage-level actuals via a plain SparkListener: sees EVERY job —
    * Dataset actions, `toRdd` drives, and raw RDD jobs — closing the
    * blind spot of the plan-walk paths (RDD-driven work has no
    * QueryExecution to walk; e.g. the two-phase range-partition
    * operators read as zero there). Metrics are Spark's own
    * task-aggregated stage totals; `drainTotals` is the sync point.
    */
  final class StageStatsListener extends org.apache.spark.scheduler.SparkListener {
    private val inRecs = new java.util.concurrent.atomic.AtomicLong
    private val inBytes = new java.util.concurrent.atomic.AtomicLong
    private val shWrite = new java.util.concurrent.atomic.AtomicLong

    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        inRecs.addAndGet(m.inputMetrics.recordsRead)
        inBytes.addAndGet(m.inputMetrics.bytesRead)
        shWrite.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }

    /** (inputRecords, inputBytes, shuffleRecordsWritten) since the
      * last drain; flushes the bus first, then resets.
      */
    def drainTotals(spark: SparkSession): (Long, Long, Long) = {
      org.apache.spark.sql.graftglue.ColumnGlue.flushListenerBus(spark)
      (inRecs.getAndSet(0L), inBytes.getAndSet(0L), shWrite.getAndSet(0L))
    }
  }

  def attachStages(spark: SparkSession): StageStatsListener = {
    val l = new StageStatsListener
    spark.sparkContext.addSparkListener(l)
    l
  }
}
