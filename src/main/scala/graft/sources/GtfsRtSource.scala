package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.gtfs.{RtDecode, RtFeedMessage}

/** DataSourceV2 connector for GTFS-RT protobuf snapshot files —
  * `spark.read.format("gtfsrt").option("kind", …).load(dir)` — the
  * connector form of the S3 decode path (SURVEY §2.1), completing the
  * library's extension surface (expression / UDAF / UDTF / plan +
  * strategy + rule / connector).
  *
  * Scale design:
  *  - one input partition per snapshot file: thousands of polled
  *    2-minute snapshots parallelize across executors with no shuffle,
  *    and a file is the natural atomicity unit (T4 snapshot semantics);
  *  - COLUMN PRUNING pushed into the source (`SupportsPushDownRequiredColumns`):
  *    a `select(trip_id)` materializes one field per entity instead of
  *    eight — visible in the scan's description;
  *  - FILTER PUSHDOWN (`SupportsPushDownFilters`): comparison and
  *    null-check predicates evaluate during decode, before any row
  *    reaches Spark — exact, so Catalyst drops its own copy of the
  *    filter (visible in the scan description);
  *  - SNAPSHOT-FILE PRUNING (opt-in, `option("fileStampPrune","true")`):
  *    a pushed `timestamp_epoch` range skips whole minute-stamped
  *    snapshot files by their `yyyyMMdd_HHmm` name stamp — the custom-
  *    source analog of partition pruning. Opt-in because it relies on
  *    the WRITER contract (stamp ≈ feed header time, `StaticFetch`
  *    F10 stamping): `fileStampSlackMinutes` (default 10) pads the
  *    window, `fileStampZone` (default Europe/Paris, the reference's
  *    stamp zone) interprets the stamp;
  *  - corrupt snapshots decode to zero rows via `parseFeedSafe`
  *    (ON_ERROR='CONTINUE' parity), never a task failure.
  *
  * Wire decode itself is `graft.gtfs.ProtoWire` — cites
  * gtfs_rt_minutely.py:40-163 for field semantics.
  */
class GtfsRtSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gtfsrt"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GtfsRtSource.schemaFor(GtfsRtSource.kindOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new GtfsRtTable(GtfsRtSource.kindOf(opts), opts.get("path"), schema)
  }
}

object GtfsRtSource {
  final val VehiclePositions = "vehicle_positions"
  final val TripUpdates = "trip_updates"
  final val StopTimeUpdates = "stop_time_updates"

  private[sources] def kindOf(options: CaseInsensitiveStringMap): String =
    options.getOrDefault("kind", VehiclePositions) match {
      case k @ (VehiclePositions | TripUpdates | StopTimeUpdates) => k
      case other => throw new IllegalArgumentException(
        s"gtfsrt: unknown kind '$other' (expected $VehiclePositions, " +
          s"$TripUpdates or $StopTimeUpdates)")
    }

  private[sources] def schemaFor(kind: String): StructType = kind match {
    case VehiclePositions => StructType(Seq(
      StructField("trip_id", StringType), StructField("route_id", StringType),
      StructField("vehicle_id", StringType), StructField("latitude", DoubleType),
      StructField("longitude", DoubleType), StructField("bearing", LongType),
      StructField("stop_id", StringType), StructField("timestamp_epoch", LongType)))
    case TripUpdates => StructType(Seq(
      StructField("trip_id", StringType), StructField("route_id", StringType),
      StructField("direction_id", LongType)))
    case StopTimeUpdates => StructType(Seq(
      StructField("trip_id", StringType), StructField("stop_sequence", LongType),
      StructField("stop_id", StringType), StructField("arrival_time", LongType),
      StructField("departure_time", LongType)))
  }

  /** Full-width catalyst values for one decoded feed, in schemaFor
    * field order. Strings become UTF8String; Options unwrap to null.
    */
  private[sources] def catalystRows(kind: String, feed: RtFeedMessage): Seq[Array[Any]] = {
    def s(v: String): Any = if (v == null) null else UTF8String.fromString(v)
    def o(v: Option[Any]): Any = v.orNull
    kind match {
      case VehiclePositions => RtDecode.vehiclePositions(feed).map { r =>
        Array[Any](s(r.trip_id), s(r.route_id), s(r.vehicle_id),
          o(r.latitude), o(r.longitude), o(r.bearing), s(r.stop_id),
          o(r.timestamp_epoch))
      }
      case TripUpdates => RtDecode.tripUpdates(feed).map { r =>
        Array[Any](s(r.trip_id), s(r.route_id), o(r.direction_id))
      }
      case StopTimeUpdates => RtDecode.tripStopTimes(feed).map { r =>
        Array[Any](s(r.trip_id), o(r.stop_sequence), s(r.stop_id),
          o(r.arrival_time), o(r.departure_time))
      }
    }
  }
}

private[sources] class GtfsRtTable(kind: String, path: String, schema: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"gtfsrt.$kind($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GtfsRtScanBuilder(kind, path, schema, options)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new GtfsRtWriteBuilder(kind, path, info)
}

private[sources] class GtfsRtScanBuilder(kind: String, path: String,
                                         full: StructType,
                                         options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept the comparison/null-check shapes the decode loop can
    * evaluate exactly; everything else stays with Spark. Accepted
    * filters are applied by the source EXACTLY, so they are not
    * returned as post-scan residuals — which is why comparisons are
    * accepted ONLY on string/long/double columns: those are the types
    * the reader compares with Spark-identical semantics. Any other
    * decoded type would fall into a toString comparison that silently
    * diverges from Spark's, with no residual to catch it, so such
    * filters stay Spark-side.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def comparable(name: String): Boolean =
      full.fields.find(_.name == name).map(_.dataType).exists {
        case org.apache.spark.sql.types.StringType => true
        case org.apache.spark.sql.types.LongType => true
        case org.apache.spark.sql.types.DoubleType => true
        case _ => false
      }
    val (ok, rest) = filters.partition {
      case EqualTo(a, _) => comparable(a)
      case GreaterThan(a, _) => comparable(a)
      case GreaterThanOrEqual(a, _) => comparable(a)
      case LessThan(a, _) => comparable(a)
      case LessThanOrEqual(a, _) => comparable(a)
      case IsNotNull(a) => full.fieldNames.contains(a)
      case _ => false
    }
    pushed = ok
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new GtfsRtScan(kind, path, full, required,
    pushed,
    options.getBoolean("fileStampPrune", false),
    options.getLong("fileStampSlackMinutes", 10L),
    options.getOrDefault("fileStampZone", "Europe/Paris"),
    options.getInt("maxFilesPerTrigger", 0))
}

private[sources] class GtfsRtScan(kind: String, path: String,
                                  full: StructType, required: StructType,
                                  pushed: Array[Filter],
                                  stampPrune: Boolean, slackMinutes: Long,
                                  stampZone: String,
                                  maxFilesPerTrigger: Int = 0)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"gtfsrt kind=$kind path=$path pruned=[${required.fieldNames.mkString(",")}]" +
      s" filters=[${pushed.mkString(",")}]" +
      (if (stampPrune) s" fileStampPrune(slack=${slackMinutes}m)" else "")

  /** The pushed timestamp_epoch range, widened by the slack — the
    * file-level prune window. (lo, hi) in epoch seconds.
    */
  private def stampWindow: Option[(Long, Long)] = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    def num(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case _ => None
    }
    pushed.foreach {
      case GreaterThan("timestamp_epoch", v) => num(v).foreach(x => lo = math.max(lo, x + 1))
      case GreaterThanOrEqual("timestamp_epoch", v) => num(v).foreach(x => lo = math.max(lo, x))
      case LessThan("timestamp_epoch", v) => num(v).foreach(x => hi = math.min(hi, x - 1))
      case LessThanOrEqual("timestamp_epoch", v) => num(v).foreach(x => hi = math.min(hi, x))
      case EqualTo("timestamp_epoch", v) => num(v).foreach { x => lo = math.max(lo, x); hi = math.min(hi, x) }
      case _ =>
    }
    if (lo == Long.MinValue && hi == Long.MaxValue) None
    else Some((lo, hi))
  }

  /** Epoch seconds of a `..._yyyyMMdd_HHmm.pb` name stamp in the
    * writer's zone; None when the name carries no stamp (never
    * pruned).
    */
  private def stampEpoch(name: String): Option[Long] = {
    val m = GtfsRtScan.StampRe.findFirstMatchIn(name)
    m.flatMap { g =>
      try {
        val dt = java.time.LocalDateTime.parse(g.group(1),
          GtfsRtScan.StampFmt)
        Some(dt.atZone(java.time.ZoneId.of(stampZone)).toEpochSecond)
      } catch { case _: Exception => None }
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val it = fs.listFiles(p, true)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".pb"))
        files += st.getPath.toString
    }
    val window = if (stampPrune) stampWindow else None
    val kept = window match {
      case Some((lo, hi)) =>
        val slack = slackMinutes * 60
        // saturating bounds: a one-sided range keeps the open side open
        val loB = if (lo <= Long.MinValue + slack) Long.MinValue else lo - slack
        val hiB = if (hi >= Long.MaxValue - slack) Long.MaxValue else hi + slack
        files.filter { f =>
          stampEpoch(new Path(f).getName) match {
            case Some(s) => s >= loB && s <= hiB
            case None => true // unstamped file: never prune
          }
        }
      case None => files
    }
    kept.sorted.map(f => GtfsRtPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // indices of the pruned fields within the full row
    val idx = required.fieldNames.map(full.fieldIndex)
    new GtfsRtReaderFactory(kind, idx, full, pushed)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GtfsRtMicroBatchStream(kind, path, full, required, pushed,
      maxFilesPerTrigger)
}

/** Streaming form of the snapshot scan: the offset is the
  * lexicographically-largest processed file NAME. Minute-stamped
  * snapshot names (`…_yyyyMMdd_HHmm.pb`, F10 stamping) sort
  * chronologically, so each micro-batch is exactly the files that
  * arrived since the checkpointed watermark — exactly-once across
  * restarts with an O(1) offset (no seen-files log to compact).
  * CONTRACT (documented, writer-enforced by `StaticFetch`): the
  * landing dir is append-only and stamps are monotonic; a file
  * back-dated behind the watermark is never picked up (the batch
  * scan remains the backfill path).
  */
private[sources] class GtfsRtMicroBatchStream(kind: String, path: String,
                                              full: StructType,
                                              required: StructType,
                                              pushed: Array[Filter],
                                              maxFilesPerTrigger: Int = 0)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow contract: pin the end offset ONCE at query
  // start, so the run drains exactly the files present then and
  // terminates even while new snapshots keep landing
  @volatile private var availableNowTarget: Option[String] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(listNames().lastOption.getOrElse(""))
  // `maxFilesPerTrigger` caps each micro-batch's admission (the
  // backfill throttle: a relay restarted against a deep landing dir
  // drains in bounded batches instead of one mega-batch — and each
  // batch is a checkpoint commit, so a mid-drain kill loses at most
  // one batch of work). 0 = unlimited (one AvailableNow batch).
  override def getDefaultReadLimit: ReadLimit =
    if (maxFilesPerTrigger > 0) ReadLimit.maxFiles(maxFilesPerTrigger)
    else ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startKey = start.asInstanceOf[GtfsRtOffset].lastName
    val names = listNames()
    val target = availableNowTarget.getOrElse(names.lastOption.getOrElse(""))
    val pending = names.filter(n => n > startKey && n <= target)
    val admitted = limit match {
      case m: ReadMaxFiles => pending.take(m.maxFiles())
      case _ => pending
    }
    GtfsRtOffset(if (admitted.nonEmpty) admitted.last else startKey)
  }
  override def reportLatestOffset(): Offset =
    GtfsRtOffset(listNames().lastOption.getOrElse(""))

  /** Offset keys are `<basename>\t<root-relative-path>`: the
    * recursive listing admits nested subdirectories, so a bare-name
    * key would reconstruct a wrong path in planInputPartitions and
    * collide identically-named files across subdirs, while a
    * relative-PATH key would order `day10/…` before `day9/…` and
    * silently drop every later-stamped file landing in a
    * lexicographically-earlier subdir. Leading with the basename
    * keeps the watermark ordered by the chronological name stamp
    * regardless of subdirectory (the documented "monotonic stamps
    * suffice" contract); the relative-path suffix keeps same-named
    * files in different subdirs distinct and carries the real path to
    * the reader. Tab can't appear in the stamp names and keeps the
    * key single-line for the checkpoint log. Flat landing dirs —
    * the reference layout — degenerate to `<name>\t<name>`, which
    * sorts exactly like the pre-nested bare-name keys.
    */
  private def listNames(): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) return Seq.empty
    val rootUri = fs.getFileStatus(p).getPath.toUri.getPath.stripSuffix("/")
    val it = fs.listFiles(p, true)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".pb")) {
        val rel = st.getPath.toUri.getPath.stripPrefix(rootUri + "/")
        files += s"${st.getPath.getName}\t$rel"
      }
    }
    files.sorted.toSeq
  }

  override def initialOffset(): Offset = GtfsRtOffset("")
  /** Checkpoints written before the key format grew its
    * `\t<relpath>` suffix store a bare basename; left as-is, the
    * same file's new key `name\tname` compares GREATER than the
    * stored `name`, and the already-processed latest snapshot would
    * be re-read once on restart. Legacy keys could only come from
    * flat landing dirs (nested subdirs postdate the format change),
    * where the new key is exactly `name\tname` — so normalizing a
    * tab-less key to that form makes old checkpoints restart clean.
    */
  override def deserializeOffset(json: String): Offset =
    if (json.nonEmpty && !json.contains('\t')) GtfsRtOffset(s"$json\t$json")
    else GtfsRtOffset(json)
  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[GtfsRtOffset].lastName
    val hi = end.asInstanceOf[GtfsRtOffset].lastName
    listNames()
      .filter(n => n > lo && n <= hi)
      // key = "<basename>\t<relpath>"; the path part is after the tab
      .map(n => GtfsRtPartition(s"$path/${n.substring(n.indexOf('\t') + 1)}"): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GtfsRtReaderFactory(kind,
      required.fieldNames.map(full.fieldIndex), full, pushed)
}

/** O(1) streaming offset: the last processed snapshot file name. */
private[sources] case class GtfsRtOffset(lastName: String) extends Offset {
  override def json(): String = lastName
}

private[sources] object GtfsRtScan {
  // optional _pNN suffix: multi-partition sink commits stay prunable
  val StampRe = """(\d{8}_\d{4})(?:_p\d+)?\.pb$""".r
  val StampFmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmm")
}

private[sources] case class GtfsRtPartition(file: String) extends InputPartition

private[sources] class GtfsRtReaderFactory(kind: String, fieldIdx: Array[Int],
                                           full: StructType,
                                           pushed: Array[Filter])
    extends PartitionReaderFactory {

  /** Compile the pushed filters into one predicate over the
    * full-width decoded row. Strings compare as UTF8String (the
    * decode emission type); integral types widen to Long. NULL fails
    * every comparison (SQL semantics).
    */
  private def predicate: Array[Any] => Boolean = {
    def cmp(colIdx: Int, v: Any)(op: Int => Boolean): Array[Any] => Boolean = {
      row => row(colIdx) match {
        case null => false
        case s: UTF8String => op(s.compareTo(UTF8String.fromString(v.toString)))
        case l: Long => op(java.lang.Long.compare(l, v.asInstanceOf[Number].longValue()))
        case d: Double => op(java.lang.Double.compare(d, v.asInstanceOf[Number].doubleValue()))
        case other => op(other.toString.compareTo(v.toString))
      }
    }
    val fns = pushed.map {
      case EqualTo(a, v) => cmp(full.fieldIndex(a), v)(_ == 0)
      case GreaterThan(a, v) => cmp(full.fieldIndex(a), v)(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(full.fieldIndex(a), v)(_ >= 0)
      case LessThan(a, v) => cmp(full.fieldIndex(a), v)(_ < 0)
      case LessThanOrEqual(a, v) => cmp(full.fieldIndex(a), v)(_ <= 0)
      case IsNotNull(a) =>
        val i = full.fieldIndex(a)
        (row: Array[Any]) => row(i) != null
      case f => throw new IllegalStateException(s"unpushable filter $f")
    }
    row => fns.forall(_(row))
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[GtfsRtPartition].file
    val pred = predicate
    new PartitionReader[InternalRow] {
      private val rows: Iterator[Array[Any]] = {
        val p = new Path(file)
        val fs = p.getFileSystem(new Configuration())
        val in = fs.open(p)
        val bytes =
          try {
            val len = fs.getFileStatus(p).getLen.toInt
            val buf = new Array[Byte](len)
            in.readFully(0, buf)
            buf
          } finally in.close()
        // corrupt snapshot → zero rows, not a task failure
        RtDecode.parseFeedSafe(bytes).toSeq
          .flatMap(GtfsRtSource.catalystRows(kind, _))
          .iterator.filter(pred)
      }
      private var current: Array[Any] = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow =
        new GenericInternalRow(fieldIdx.map(current(_)))
      override def close(): Unit = ()
    }
  }
}
