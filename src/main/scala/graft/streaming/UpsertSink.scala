package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming MERGE/upsert sink — the in-place-semantics counterpart
  * of the append-only file sinks (K-family): each micro-batch is
  * folded into a keyed snapshot ("current value per user") via
  * `foreachBatch`, the documented escape hatch for sinks Structured
  * Streaming has no native writer for. The batch dual of the merge
  * is q69's full-outer SCD1 core.
  *
  * Exactly-once without a transactional store: every epoch writes a
  * NEW immutable snapshot directory `v=<epochId>` derived from the
  * previous latest; a replayed epoch (sink-side retry after a crash
  * between write and checkpoint commit) rewrites the SAME directory
  * from the SAME parent — idempotent, the classic versioned-snapshot
  * foreachBatch pattern. Each version is written to a `_tmp_` dir and
  * RENAMED into place, so readers resolving max(v) never see a
  * half-written snapshot (rename is atomic on HDFS-like stores; on
  * object stores swap in a manifest commit). Stale versions are
  * pruned down to `retainVersions`.
  *
  * Cross-batch ordering: the snapshot keeps (ts_s, event_id) per key
  * and the merge takes whichever side is NEWER, so an out-of-order
  * event arriving a batch late cannot regress a key (latest-wins is
  * by event time, not arrival time).
  *
  * Scale: the merge is one full-outer equi-join per batch on the
  * high-cardinality key — both sides shuffle once; the within-batch
  * dedup window partitions on the same key. Directory listing via the
  * Hadoop FileSystem API (never java.io.File — HDFS/S3-correct).
  */
object UpsertSink {

  /** Within-batch latest-wins dedup + projection to snapshot shape. */
  private[streaming] def latestWins(batch: DataFrame): DataFrame = {
    import batch.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    batch
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", unix_timestamp($"ts").as("ts_s"), $"event_id",
        round($"value" * 100).cast("long").as("value_cents"))
  }

  /** Event-time latest-wins merge of an update batch into a snapshot
    * (both in snapshot shape) — q69's full-outer core with an ordered
    * tie-break instead of blind update-wins.
    */
  private[streaming] def merge(prev: DataFrame, upd: DataFrame): DataFrame = {
    val s = prev.sparkSession
    import s.implicits._
    val p = prev.select($"user_id", struct($"ts_s", $"event_id", $"value_cents").as("pv"))
    val u = upd.select($"user_id", struct($"ts_s", $"event_id", $"value_cents").as("uv"))
    p.join(u, Seq("user_id"), "full_outer")
      .select($"user_id",
        when($"pv".isNull, $"uv")
          .when($"uv".isNull, $"pv")
          .when($"uv.ts_s" > $"pv.ts_s" ||
            ($"uv.ts_s" === $"pv.ts_s" && $"uv.event_id" > $"pv.event_id"), $"uv")
          .otherwise($"pv").as("v"))
      .select($"user_id", $"v.ts_s", $"v.event_id", $"v.value_cents")
  }

  private val snapshotDdl = "user_id LONG, ts_s LONG, event_id LONG, value_cents LONG"

  private def fs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def versions(spark: SparkSession, tableDir: String): Seq[Long] = {
    val (f, p) = fs(spark, tableDir)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
  }

  /** Read the current snapshot (max committed version), if any. */
  def snapshot(spark: SparkSession, tableDir: String): Option[DataFrame] =
    versions(spark, tableDir) match {
      case Nil => None
      case vs => Some(spark.read.schema(snapshotDdl).parquet(s"$tableDir/v=${vs.max}"))
    }

  /** Time travel: read the table as of `version` — the newest
    * committed snapshot ≤ the requested version (the Delta/Iceberg
    * `VERSION AS OF` contract). Bounded by `retainVersions`: pruned
    * history returns None, never a silently-wrong newer snapshot.
    */
  def snapshotAsOf(spark: SparkSession, tableDir: String,
                   version: Long): Option[DataFrame] =
    versions(spark, tableDir).filter(_ <= version) match {
      case Nil => None
      case vs => Some(spark.read.schema(snapshotDdl).parquet(s"$tableDir/v=${vs.max}"))
    }

  /** Change-data-feed between two committed versions (the Delta
    * `table_changes` contract, derived rather than stored): diff the
    * as-of snapshots into (user_id, op, old_*, new_*) rows, op ∈
    * insert | update | delete. Derivation keeps the write path
    * untouched (no write amplification, nothing extra to keep
    * idempotent under epoch replay) and costs ONE co-partitioned
    * full-outer equi-join of two keyed snapshots — both sides shuffle
    * once on the key at any table size. Latest-wins merges never drop
    * keys, so `delete` cannot arise from THIS sink; the op is still
    * enumerated so the diff is a correct CDF for any snapshot pair.
    * Bounded by `retainVersions` like [[snapshotAsOf]]: a pruned
    * endpoint returns None, never a silently-wrong diff.
    */
  def changes(spark: SparkSession, tableDir: String,
              fromVersion: Long, toVersion: Long): Option[DataFrame] =
    for {
      a <- snapshotAsOf(spark, tableDir, fromVersion)
      b <- snapshotAsOf(spark, tableDir, toVersion)
    } yield {
      import spark.implicits._
      val p = a.select($"user_id", struct($"ts_s", $"event_id", $"value_cents").as("pv"))
      val n = b.select($"user_id", struct($"ts_s", $"event_id", $"value_cents").as("nv"))
      p.join(n, Seq("user_id"), "full_outer")
        .withColumn("op",
          when($"pv".isNull, "insert")
            .when($"nv".isNull, "delete")
            .when($"nv" =!= $"pv", "update"))
        .filter($"op".isNotNull)
        .select($"user_id", $"op",
          $"pv.ts_s".as("old_ts_s"), $"pv.event_id".as("old_event_id"),
          $"pv.value_cents".as("old_value_cents"),
          $"nv.ts_s".as("new_ts_s"), $"nv.event_id".as("new_event_id"),
          $"nv.value_cents".as("new_value_cents"))
    }

  /** Fold one epoch into the store (exposed for the spec's replay
    * test). Reading the previous version and overwriting `v=epochId`
    * is idempotent under sink-side replay: max(v < epochId) is the
    * same parent a retried epoch saw.
    */
  private[streaming] def commitEpoch(spark: SparkSession, tableDir: String,
                                     epochId: Long, batch: DataFrame,
                                     retainVersions: Int): Unit = {
    val upd = latestWins(batch)
    val prior = versions(spark, tableDir).filter(_ < epochId)
    val merged = prior match {
      case Nil => upd
      case vs =>
        merge(spark.read.schema(snapshotDdl).parquet(s"$tableDir/v=${vs.max}"), upd)
    }
    // write-then-rename: readers never list a half-written version
    merged.write.mode("overwrite").parquet(s"$tableDir/_tmp_v=$epochId")
    val (f, _) = fs(spark, tableDir)
    val live = new org.apache.hadoop.fs.Path(s"$tableDir/v=$epochId")
    f.delete(live, true) // replayed epoch: drop the previous attempt
    f.rename(new org.apache.hadoop.fs.Path(s"$tableDir/_tmp_v=$epochId"), live)
    // prune all but the newest `retainVersions` committed snapshots
    versions(spark, tableDir).sorted.dropRight(retainVersions).foreach { v =>
      f.delete(new org.apache.hadoop.fs.Path(s"$tableDir/v=$v"), true)
    }
  }

  /** Drive the upsert sink over a parquet landing dir. */
  def start(spark: SparkSession, landingDir: String, tableDir: String,
            checkpointDir: String, retainVersions: Int = 2,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val fold: (DataFrame, Long) => Unit =
      (batch, epochId) => commitEpoch(spark, tableDir, epochId, batch, retainVersions)
    spark.readStream.schema(EventSessions.eventSchema).parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(fold)
      .start()
  }
}
