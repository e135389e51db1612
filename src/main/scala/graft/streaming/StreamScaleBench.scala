package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Scale drive for the streaming state layer (round-11/12 directive
  * #6): push ~1M events / ~1M docs through CHECKPOINTED
  * `Trigger.AvailableNow` runs of the four stateful operators whose
  * 100 TB claims rest on bounded state — StreamDedup (content-hash
  * dedup within watermark), StreamingSketch (windowed HLL),
  * QuotaGate (transformWithState per-user counter), StreamJoin
  * (stream-stream time-interval join) — and MEASURE the claims
  * instead of asserting them at toy size:
  *
  *  - `maxFilesPerTrigger` splits each run into many micro-batches,
  *    so the watermark ADVANCES mid-run and state must be created
  *    AND evicted (a single AvailableNow mega-batch would hide
  *    unbounded state growth);
  *  - per-stage `max_state_rows` is read from the recorded
  *    StreamingQueryProgress stateOperators — the proof is
  *    max-state ≪ total-rows, with the bound tied to the watermark
  *    window × arrival rate, not to stream length;
  *  - row-count invariants are EXACT (constructed duplicates;
  *    QuotaGate and StreamJoin replay their batch duals on the same
  *    landing data and must agree to the row).
  *
  * Emits one JSON line (stream_scale) the round artifact records:
  *   {"metric":"stream_scale","events":N,"docs":N,"stages":{...}}
  *
  * Event-time layout: ids ascend with time (one event every ~172 ms
  * over ~48 h), files land in id order, so arrival order tracks
  * event time — the same discipline a partitioned log (Kafka,
  * Kinesis) gives a real deployment.
  */
object StreamScaleBench {
  final val NEvents = 1200000L
  final val NDocs = 1200000L
  final val NFiles = 24
  final val FilesPerTrigger = 2
  final val Quota = 5L
  final val NUsers = 50000L

  private def t[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Drain an AvailableNow query and return (batches, maxStateRows). */
  private def drain(q: StreamingQuery): (Long, Long) = {
    q.awaitTermination()
    val ps = q.recentProgress
    val batches = ps.count(_.numInputRows > 0).toLong
    val maxState = ps.flatMap(_.stateOperators.map(_.numRowsTotal))
      .foldLeft(0L)(math.max)
    (batches, maxState)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    // `rocksdb` arg: run EVERY stateful stage on the RocksDB state
    // store — the production posture at 100 TB/day, where keyed state
    // outgrows executor heaps and needs native-memory + spill-to-disk
    // (round-13 directive #5). Default stays the HDFS-backed store so
    // the two stanzas in STRESS20X can be compared for max-state
    // parity: the BOUND is a property of watermark × arrival rate,
    // not of the store backend.
    val rocks = args.contains("rocksdb")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (rocks) builder.config(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("stream_scale").toString
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime

    // ---- landing synthesis: files land in event-time order ----------
    // events: one every ~144 ms across 48 h; 5% errors, 10% purchases;
    // user ids hash-spread over NUsers
    val (_, tEv) = t {
      (0 until NFiles).foreach { f =>
        val per = NEvents / NFiles
        spark.range(f * per, (f + 1) * per, 1, 1)
          .select($"id".as("event_id"),
            to_timestamp(from_unixtime(lit(base / 1000) + ($"id" * 144000L) / 1000000L))
              .as("ts"),
            pmod(conv(substring(md5(concat(lit("u"), $"id")), 1, 15), 16, 10)
              .cast("long"), lit(NUsers)).as("user_id"),
            when($"id" % 20 === 0, "error")
              .when($"id" % 10 === 3, "purchase")
              .otherwise("view").as("event_type"),
            (($"id" % 997L) / lit(10.0)).as("value"),
            lit("{}").as("props"))
          .write.mode("append").parquet(s"$dir/events")
      }
    }
    // docs: every 10th doc re-delivers the previous doc's payload at
    // the same second -> exactly NDocs/10 in-window duplicates, so
    // survivors = NDocs - NDocs/10 exactly. (Column `/` is DOUBLE
    // division — the payload id must stay integral or every payload
    // renders unique and nothing dedups.)
    val (_, tDc) = t {
      (0 until NFiles).foreach { f =>
        val per = NDocs / NFiles
        val payloadId =
          when($"id" % 10 === 9, $"id" - 1L).otherwise($"id").cast("long")
        spark.range(f * per, (f + 1) * per, 1, 1)
          .select($"id".as("doc_id"),
            to_timestamp(from_unixtime(lit(base / 1000)
              + (payloadId * 172800L) / 1000000L)).as("ts"),
            concat(lit("payload "), payloadId.cast("string")).as("text"))
          .write.mode("append").parquet(s"$dir/docs")
      }
    }

    // near-dup landing: real multi-token texts (the exact-dedup docs
    // above are 2-word payloads — no 3-gram shingles), 12..20 tokens
    // from the 30-word harness vocabulary via the doc-id LCG. Every
    // id ≡ 9 (mod 20) past the first two files replays id−100001's
    // stream with the trailing token → `dup` (J₃ = (s−1)/(s+1) ≥
    // 0.846 — banding miss ~1e-5/pair): the offset is > 2 file
    // widths, so the pair always lands in DIFFERENT micro-batches
    // (FilesPerTrigger = 2) and EITHER arrival order emits exactly
    // one cross-batch pair — whichever side arrives first has no
    // index partner, survives into the index, and the later side
    // verifies against it. The seed class id ≡ 8 (mod 20) is never
    // itself a mutant, so no chains.
    val vocab = graft.Sf1Gen.HarnessVocab
    val ndText = udf { id: Long =>
      val isMut = id % 20 == 9 && id >= 100001L
      val seed = if (isMut) id - 100001L else id
      var h = seed * 0x9e3779b97f4a7c15L + 0x1405d2f0a3c1e7b9L
      h = h * 6364136223846793005L + 1442695040888963407L
      val n = 12 + ((h >>> 33) % 9).toInt
      val words = new Array[String](n)
      var j = 0
      while (j < n) {
        h = h * 6364136223846793005L + 1442695040888963407L
        words(j) = vocab(((h >>> 33) % vocab.length).toInt)
        j += 1
      }
      if (isMut) words(n - 1) = "dup"
      words.mkString(" ")
    }
    // The cross-batch invariants below (emitted ≤ planted, index
    // conservation) need the seed file to be DELIVERED ≥ 2 files
    // before its mutant. FileStreamSource orders by modification time
    // with PATH tiebreak — so the guarantee is made structural: each
    // id-range lands as ONE file with a lexicographically ascending
    // name (nd-00000.parquet, …), and an mtime tie between appends
    // (coarse-granularity filesystems) resolves to id order instead
    // of uuid-random part names that could co-batch a seed with its
    // mutant (round-18 ADVICE).
    val (_, tNdSynth) = t {
      val ndDir = new java.io.File(s"$dir/docs_nd")
      ndDir.mkdirs()
      (0 until NFiles).foreach { f =>
        val per = NDocs / NFiles
        val stage = new java.io.File(s"$dir/nd_stage")
        spark.range(f * per, (f + 1) * per, 1, 1)
          .select($"id".as("doc_id"),
            to_timestamp(from_unixtime(lit(base / 1000)
              + ($"id" * 144000L) / 1000000L)).as("ts"),
            ndText($"id").as("text"))
          .write.mode("overwrite").parquet(stage.toString)
        val parts = stage.listFiles()
          .filter(p => p.getName.startsWith("part-") &&
            p.getName.endsWith(".parquet"))
        // exactly one part by construction (spark.range(..., 1) is a
        // single partition); assert so a partition-count regression
        // fails loudly instead of silently dropping rows, and replace
        // so a re-run against a reused dir can't throw
        // FileAlreadyExistsException (round-18 ADVICE)
        require(parts.length == 1,
          s"nd stage wrote ${parts.length} part files, expected exactly 1")
        java.nio.file.Files.move(parts.head.toPath,
          new java.io.File(ndDir, f"nd-$f%05d.parquet").toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }

    // ---- stage 1: StreamDedup over 1.2M docs -------------------------
    val (dedup, tDedup) = t {
      val src = spark.readStream
        .schema("doc_id LONG, ts TIMESTAMP, text STRING")
        .option("maxFilesPerTrigger", FilesPerTrigger)
        .parquet(s"$dir/docs")
        .withWatermark("ts", "10 minutes")
      val q = StreamDedup.keyed(src)
        .dropDuplicatesWithinWatermark("content_hash")
        .writeStream.format("parquet")
        .option("path", s"$dir/dedup_out")
        .option("checkpointLocation", s"$dir/dedup_ck")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      val (batches, maxState) = drain(q)
      val out = spark.read.parquet(s"$dir/dedup_out").count()
      (out, batches, maxState)
    }
    val expectedSurvivors = NDocs - NDocs / 10
    require(dedup._1 == expectedSurvivors,
      s"stream dedup: expected $expectedSurvivors survivors, got ${dedup._1}")
    require(dedup._2 >= NFiles / FilesPerTrigger / 2,
      s"stream dedup must run many micro-batches, got ${dedup._2}")
    // the watermark advances at BATCH boundaries, so peak state is one
    // micro-batch's unique keys (~2 files ≈ 90k hashes) plus the
    // 10-min tail — never the cumulative stream (12 batches with no
    // eviction would reach ~1.1M rows)
    require(dedup._3 < NDocs / 5,
      s"dedup state must stay bounded by per-batch keys + watermark " +
        s"tail (~90k), got ${dedup._3} rows for $NDocs docs")

    // ---- stage 2: StreamingSketch over 1.2M events -------------------
    val (sk, tSketch) = t {
      val src = spark.readStream
        .schema(EventSessions.eventSchema)
        .option("maxFilesPerTrigger", FilesPerTrigger)
        .parquet(s"$dir/events")
        .withWatermark("ts", "10 minutes")
      val q = StreamingSketch.transform(src, "10 minutes")
        .writeStream.format("parquet")
        .option("path", s"$dir/sketch_out")
        .option("checkpointLocation", s"$dir/sketch_ck")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      val (batches, maxState) = drain(q)
      val out = spark.read.parquet(s"$dir/sketch_out").count()
      (out, batches, maxState)
    }
    // closed windows emit once; open tail windows stay in state.
    // 1.2M events × 144 ms ≈ 48 h ⇒ 288 10-min windows × 3 types.
    require(sk._1 >= 280 * 3 && sk._1 <= 289 * 3,
      s"sketch: expected ~288×3 closed windows, got ${sk._1}")
    // one micro-batch spans ~4 h of event time ⇒ ~24 windows per type
    // live in state until the next batch's watermark closes them
    require(sk._3 <= 40 * 3,
      s"sketch state must hold only per-batch open windows (~26/type), got ${sk._3}")

    // ---- stage 3: QuotaGate (transformWithState, RocksDB) ------------
    val (qg, tQuota) = t {
      val q = QuotaGate.start(spark, s"$dir/events", s"$dir/quota_out",
        s"$dir/quota_ck", Quota)
      val (batches, maxState) = drain(q)
      val out = spark.read.parquet(s"$dir/quota_out").count()
      (out, batches, maxState)
    }
    val batchQuota = QuotaGate.admitBatch(
      spark.read.schema(EventSessions.eventSchema).parquet(s"$dir/events"),
      Quota).count()
    require(qg._1 == batchQuota,
      s"quota gate stream (${qg._1}) must equal its batch dual ($batchQuota)")
    require(qg._3 <= NUsers + NUsers / 10,
      s"quota state is one counter per user (≤ $NUsers), got ${qg._3}")
    // QuotaGate forces RocksDB on the session (transformWithState
    // requires it); in the default-store run, put the HDFS-backed
    // provider back so stage 4 measures the store it claims to
    if (!rocks) spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")

    // ---- stage 4: StreamJoin (stream-stream interval join) -----------
    val (sj, tJoin) = t {
      val src = spark.readStream
        .schema(EventSessions.eventSchema)
        .option("maxFilesPerTrigger", FilesPerTrigger)
        .parquet(s"$dir/events")
      val errors = src.filter(col("event_type") === "error")
        .withWatermark("ts", "10 minutes")
      val purchases = src.filter(col("event_type") === "purchase")
        .withWatermark("ts", "10 minutes")
      val q = StreamJoin.correlate(errors, purchases, "10 minutes")
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$dir/join_ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet")
        .option("path", s"$dir/join_out")
        .start()
      val (batches, maxState) = drain(q)
      val out = spark.read.parquet(s"$dir/join_out").count()
      (out, batches, maxState)
    }
    val ev = spark.read.schema(EventSessions.eventSchema).parquet(s"$dir/events")
    val batchJoin = StreamJoin.correlate(
      ev.filter(col("event_type") === "error"),
      ev.filter(col("event_type") === "purchase"), "10 minutes").count()
    require(sj._1 == batchJoin,
      s"stream-stream join (${sj._1}) must equal its batch dual ($batchJoin)")
    // state holds both sides' in-window slices: error rate 1/20 and
    // purchase rate 1/10 of ~4150 events per 10-min window, plus the
    // watermark delay tail — thousands, never the full 1.2M
    require(sj._3 < NEvents / 20,
      s"join state must stay bounded by the in-window slices, got ${sj._3}")

    // ---- stage 5: StreamNearDup gate over 1.2M real-text docs --------
    // (round-15 directive #7 composed into the 20× stress: the
    // quota-gated streaming family plus the near-dup gate in ONE
    // drive). Its keyed "state" is the persisted signature INDEX, not
    // store-backed operator state — reported as index_rows; bounded
    // by survivors, touched per batch only through the band-bucket
    // equi-join (never |index|²).
    val (nd, tNd) = t {
      val q = StreamNearDup.start(spark, s"$dir/docs_nd",
        s"$dir/nd_index", s"$dir/nd_pairs", s"$dir/nd_ck",
        maxFilesPerTrigger = Some(FilesPerTrigger))
      val (batches, _) = drain(q)
      val pairs = StreamNearDup.loadPairs(spark, s"$dir/nd_pairs").count()
      val index = StreamNearDup.loadIndex(spark, s"$dir/nd_index").count()
      (pairs, batches, index)
    }
    // ids ≡ 9 (mod 20) in [100001, NDocs): first 100009, step 20
    val planted = (NDocs - 1 - 100009L) / 20 + 1
    require(nd._2 >= NFiles / FilesPerTrigger / 2,
      s"near-dup gate must run many micro-batches, got ${nd._2}")
    // every emitted pair is exact-verified J ≥ 0.5; accidental pairs
    // are ~impossible (sharing ≥ half of ~15 specific 3-grams from a
    // 27k space), so emitted ≈ planted with only the deterministic
    // banding tail (J ≥ 0.846 ⇒ miss ~1e-5/pair) allowed to shave it
    require(nd._1 <= planted,
      s"near-dup gate emitted ${nd._1} pairs > planted $planted — " +
        "accidental pairs should not exist in this corpus")
    require(nd._1 >= planted - planted / 100,
      s"near-dup recall too low: ${nd._1} of $planted planted pairs")
    require(nd._3 == NDocs - nd._1,
      s"index conservation: ${nd._3} index rows + ${nd._1} dropped " +
        s"losers must equal $NDocs docs")

    val stages = Seq(
      ("synth_events", NEvents, tEv, -1L, -1L),
      ("synth_docs", NDocs, tDc, -1L, -1L),
      ("synth_docs_nd", NDocs, tNdSynth, -1L, -1L),
      ("stream_dedup", dedup._1, tDedup, dedup._2, dedup._3),
      ("windowed_sketch", sk._1, tSketch, sk._2, sk._3),
      ("quota_gate", qg._1, tQuota, qg._2, qg._3),
      ("stream_join", sj._1, tJoin, sj._2, sj._3),
      ("neardup_gate", nd._1, tNd, nd._2, nd._3))
    val json = stages.map { case (n, rows, sec, batches, st) =>
      s""""$n":{"rows":$rows,"sec":${math.round(sec * 1000) / 1000.0}""" +
        (if (batches >= 0) s""","batches":$batches,"max_state_rows":$st}"""
         else "}")
    }
    val store = if (rocks) "rocksdb" else "hdfs"
    println(s"""{"metric":"stream_scale","state_store":"$store",""" +
      s""""events":$NEvents,"docs":$NDocs,""" +
      s""""stages":{${json.mkString(",")}}}""")
    spark.stop()
  }
}
