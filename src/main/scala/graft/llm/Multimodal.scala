package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

/** One decoded-asset record: real dimensions read from the decoded
  * image plus cheap content features over the decoded pixels.
  */
case class MediaFeatures(
    img_id: Long, n_bytes: Long, fingerprint: Long,
    width: Long, height: Long, aspect_bp: Long)

/** Multimodal-column processing: media as opaque `binary` columns with
  * typed metadata, processed by a batched per-partition pipeline.
  *
  * The IMAGE path is real end-to-end: deterministic synthetic PNGs are
  * encoded with `javax.imageio` (ships in every JDK), decoded back
  * with `ImageIO.read`, and featurized over the decoded pixel raster —
  * dimensions come from the decoder, not metadata, and the
  * fingerprint is a digest of every decoded byte. Because the pixel
  * pattern is an arithmetic function of the image id and PNG is
  * lossless, DuckDB can reconstruct the DECODED byte stream in SQL and
  * replay the whole pipeline, so the oracle verifies the decode
  * itself, not just the plumbing (reference parallel: the RT pipeline
  * decodes opaque protobuf snapshots the same way,
  * dags/gtfs_rt_minutely.py:88-133).
  *
  * The AUDIO path is real the same way: deterministic 8-bit PCM mono
  * clips round-trip through the JDK's `javax.sound.sampled` RIFF/WAVE
  * writer and reader, features (frame count, parsed sample rate,
  * duration, energy, per-byte fingerprint) come from the DECODED
  * stream, and the oracle rebuilds the PCM bytes arithmetically.
  *
  * The VIDEO path is real too: [[graft.llm.Avi]] writes true minimal
  * AVI containers (RIFF hdrl/movi/idx1, MJPEG `00dc` chunks) and
  * demuxes them with an honest chunk walker; each frame payload
  * JPEG-decodes through the same `ImageIO` codec. Constant-per-8×8-
  * block grayscale at quality 1.0 makes the JPEG round-trip
  * bit-exact (DC-only blocks, all-ones quant table), so the oracle
  * rebuilds the decoded frames arithmetically AND replays the
  * container geometry (fixed-size chunks → arithmetic offsets).
  * [[q161_frame_sample]] additionally drives the one-asset→N-frames
  * fan-out over decoded PNG rasters.
  */
object Multimodal {

  // ---------------------------------------------------------------
  // Image codec (real: javax.imageio PNG)
  // ---------------------------------------------------------------

  // ImageIO defaults to a temp-FILE stream cache per encode/decode;
  // in-memory is both faster and safe for our small rasters.
  ImageIO.setUseCache(false)

  /** Raster dimensions for the synthetic image of `id` — small on
    * purpose (≤ 15×11) so the SQL oracle's per-byte reconstruction
    * stays tractable at every test scale factor.
    */
  private[llm] def dimsOf(id: Long): (Int, Int) =
    ((id % 12 + 4).toInt, (id % 8 + 4).toInt)

  /** Channel value at flat offset `i` of image `id`: the whole raster
    * is `(id*31 + i) mod 256` in row-major RGB order — arithmetic, so
    * an SQL engine can rebuild the decoded bytes without a codec.
    */
  @inline private[llm] def channel(id: Long, i: Int): Int =
    ((id * 31 + i) % 256).toInt

  /** Deterministic synthetic PNG for id: a REAL encoded image (PNG
    * signature, IHDR, zlib-compressed scanlines), not a byte-tagged
    * fake — `ImageIO.read` must do real work to get the raster back.
    */
  private[llm] def syntheticPng(id: Long): Array[Byte] = {
    val (w, h) = dimsOf(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (channel(id, i) << 16) | (channel(id, i + 1) << 8) | channel(id, i + 2))
        i += 3; x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A decoded image in canonical form: row-major RGB bytes. */
  private[llm] case class DecodedImage(width: Int, height: Int, pixels: Array[Byte])

  /** REAL decode via `ImageIO.read`. Pixels are extracted through
    * `getRGB` into canonical row-major RGB order, so the result is
    * independent of the reader's internal raster layout (PNG decoders
    * variously return TYPE_3BYTE_BGR / TYPE_INT_RGB); PNG is lossless
    * so the values are exact.
    */
  private[llm] def decodeImage(content: Array[Byte]): DecodedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(content))
    if (img == null) throw new java.io.IOException("undecodable image")
    val w = img.getWidth
    val h = img.getHeight
    val px = new Array[Byte](w * h * 3)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = img.getRGB(x, y)
        px(i) = ((v >> 16) & 0xff).toByte
        px(i + 1) = ((v >> 8) & 0xff).toByte
        px(i + 2) = (v & 0xff).toByte
        i += 3; x += 1
      }
      y += 1
    }
    DecodedImage(w, h, px)
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Lower-case ASCII hex of a byte array (the fingerprint domain:
    * DuckDB's md5 is VARCHAR-only, so both engines digest the hex
    * STRING of the decoded pixels — still a function of every decoded
    * byte).
    */
  private[llm] def hexOf(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sb.append(HexDigits(b >> 4)).append(HexDigits(b & 0xf))
      i += 1
    }
    sb.toString
  }

  /** First 15 hex digits of md5 over the pixel hex string, as a Long
    * (15 stays under Long.MaxValue; 16 would not).
    */
  private def fingerprintOf(md: java.security.MessageDigest, pixels: Array[Byte]): Long = {
    md.reset()
    val digest = md.digest(hexOf(pixels).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    java.lang.Long.parseLong(hexOf(digest).substring(0, 15), 16)
  }

  /** Rebalance the narrow id stream onto every core before the codec
    * stage. The parquet scan packs small files into very few splits
    * (16 × 640 KB ≈ one split under the default open-cost packing),
    * so without this the per-row encode/decode — the expensive stage,
    * ~200 µs/asset — inherits a near-single-threaded layout. The
    * exchange moves only longs; at 100 TB the same principle applies
    * (a cheap scan feeding an expensive per-row codec must rebalance
    * to the executor count, or tune maxPartitionBytes down).
    */
  private def spreadIds(ds: Dataset[Long]): Dataset[Long] =
    ds.repartition(ds.sparkSession.sparkContext.defaultParallelism)

  /** Synthesize the image table from `documents`: one real PNG per
    * doc_id, metadata struct alongside. At 100 TB this column would
    * come from `spark.read.format("binaryFile")` or parquet
    * BYTE_ARRAY — same (id, content: binary, meta: struct) schema
    * either way; the encode runs inside mapPartitions on executors,
    * never on the driver.
    */
  def imageTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spreadIds(load(spark, dir, "documents")
      .select($"doc_id".cast("long")).as[Long])
      .mapPartitions(_.map { id =>
        val (w, h) = dimsOf(id)
        (id, syntheticPng(id), w.toLong, h.toLong)
      })
      .toDF("img_id", "content", "w", "h")
      .select($"img_id", $"content",
        struct($"w".as("width"), $"h".as("height"),
          lit("image/png").as("format")).as("meta"))
  }

  /** The batched per-partition feature extractor: one MessageDigest
    * ("codec context") per partition, reused across rows — the
    * mapPartitions shape that amortizes codec init at scale. Width,
    * height, and byte count are read from the DECODED image, not the
    * metadata struct — the features prove the decode ran.
    */
  def extractFeatures(images: DataFrame): Dataset[MediaFeatures] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select($"img_id".cast("long"), $"content")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, content) =>
          val d = decodeImage(content)
          MediaFeatures(
            img_id = id,
            n_bytes = d.pixels.length.toLong,
            fingerprint = fingerprintOf(md, d.pixels),
            width = d.width.toLong,
            height = d.height.toLong,
            aspect_bp = math.round(10000.0 * d.width / d.height))
        }
      }
  }

  /** Feature extraction over real decoded PNGs, aggregated per width
    * bucket — exercises binary materialization, the typed
    * mapPartitions decode pipeline, and a downstream relational agg.
    */
  def q28_multimodal_features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(imageTable(spark, dir)).toDF()
      .groupBy(($"width" % 10).as("wbucket"))
      .agg(
        count(lit(1)).as("n"),
        sum($"n_bytes").as("sum_bytes"),
        min($"fingerprint").as("min_fp"),
        max($"fingerprint").as("max_fp"),
        round(avg($"aspect_bp")).cast("long").as("avg_aspect_bp"))
      .orderBy($"wbucket")
  }

  /** REAL image resize: decode, nearest-neighbor resample (explicit
    * source-index arithmetic — deterministic on every JVM, unlike
    * interpolating scalers), re-encode PNG. Binary in → binary out
    * with refreshed metadata, one codec pass per row.
    */
  private[llm] def resizeImage(content: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val src = ImageIO.read(new ByteArrayInputStream(content))
    if (src == null) throw new java.io.IOException("undecodable image")
    val out = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < targetH) {
      val sy = y * src.getHeight / targetH
      var x = 0
      while (x < targetW) {
        out.setRGB(x, y, src.getRGB(x * src.getWidth / targetW, sy) & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Batched resize over the image table: PNG → smaller PNG +
    * refreshed metadata.
    */
  def resize(images: DataFrame, targetW: Int, targetH: Int): Dataset[(Long, Array[Byte], Long, Long)] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select($"img_id".cast("long"), $"content").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, content) =>
        (id, resizeImage(content, targetW, targetH), targetW.toLong, targetH.toLong)
      })
  }

  // ---------------------------------------------------------------
  // Audio codec (real: javax.sound.sampled WAV/PCM)
  // ---------------------------------------------------------------

  /** Sample count / sample rate for the synthetic clip of `id` — small
    * on purpose (≤ 69 samples) so the SQL oracle's per-byte
    * reconstruction stays tractable, and three distinct rates so the
    * decoder's format parsing is actually exercised per clip.
    */
  private[llm] def samplesOf(id: Long): Int = (id % 50 + 20).toInt
  private[llm] def rateOf(id: Long): Int = (8000 + (id % 3) * 4000).toInt

  /** The JDK's WAVE codec SPI, resolved ONCE per JVM. Going through
    * `AudioSystem.write`/`getAudioInputStream` per clip funnels every
    * call through the sound registry's synchronized provider lookup —
    * measured on local[32]: 50k clips decode at the single-thread rate
    * (~9 s) no matter how many partitions, because all 32 threads
    * serialize on that lock. Resolving the stateless provider objects
    * up front (public `ServiceLoader` over the `javax.sound.sampled.spi`
    * interfaces — the exact same `java.desktop` WAVE classes
    * AudioSystem dispatches to) and calling them directly keeps the
    * codec real and makes the mapPartitions stage actually parallel.
    * The writer is picked by its declared WAVE support; the reader by
    * probing it with a WAVE container.
    */
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(throw new IllegalStateException("no WAVE AudioFileWriter provider"))
  }

  private lazy val wavReader: javax.sound.sampled.spi.AudioFileReader = {
    import scala.jdk.CollectionConverters._
    val probe = syntheticWav(0L)
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala
      .find { r =>
        try { r.getAudioInputStream(new ByteArrayInputStream(probe)).close(); true }
        catch { case _: Exception => false }
      }
      .getOrElse(throw new IllegalStateException("no WAVE AudioFileReader provider"))
  }

  /** Deterministic synthetic WAV for id: a REAL RIFF/WAVE container
    * (RIFF header, fmt chunk, PCM data chunk) written by the JDK's
    * WAVE writer ([[wavWriter]]) — 8-bit unsigned PCM mono, sample i =
    * `channel(id, i)` (the same arithmetic the image raster uses, so
    * an SQL engine can rebuild the decoded stream without a codec).
    */
  private[llm] def syntheticWav(id: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
    val n = samplesOf(id)
    val data = Array.tabulate[Byte](n)(i => channel(id, i).toByte)
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      rateOf(id).toFloat, 8, 1, 1, rateOf(id).toFloat, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    wavWriter.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** A decoded audio clip in canonical form: the PCM sample bytes plus
    * the format fields the DECODER parsed out of the fmt chunk.
    */
  private[llm] case class DecodedAudio(sampleRate: Int, samples: Array[Byte])

  /** REAL decode via the JDK WAVE reader ([[wavReader]] — the same
    * provider `AudioSystem.getAudioInputStream` dispatches to, minus
    * its per-call synchronized registry walk): parses the RIFF chunk
    * structure and fmt header, then streams the PCM frames. Only the
    * layout this pipeline produces (8-bit mono PCM) is accepted —
    * anything else is an honest codec-boundary error, not silently
    * misinterpreted bytes.
    */
  private[llm] def decodeAudio(content: Array[Byte]): DecodedAudio = {
    import javax.sound.sampled.AudioFormat
    val ais = wavReader.getAudioInputStream(new ByteArrayInputStream(content))
    val fmt = ais.getFormat
    // Encoding is part of the guard: an 8-bit mono ALAW/ULAW (or
    // signed PCM) WAV has the same size/channel shape but different
    // byte semantics — it must fail here, not decode to garbage.
    if (fmt.getEncoding != AudioFormat.Encoding.PCM_UNSIGNED ||
        fmt.getSampleSizeInBits != 8 || fmt.getChannels != 1)
      throw new java.io.IOException(
        s"unsupported PCM layout: ${fmt.getEncoding} " +
          s"${fmt.getSampleSizeInBits}-bit ${fmt.getChannels}ch")
    DecodedAudio(math.round(fmt.getSampleRate), ais.readAllBytes())
  }

  /** One decoded-clip record: format fields and content features all
    * derived from the DECODED stream (sample count from the frames
    * actually read, rate from the parsed fmt chunk), never from the
    * metadata struct.
    */
  case class AudioFeatures(
      clip_id: Long, n_samples: Long, sample_rate: Long,
      duration_us: Long, energy: Long, fingerprint: Long)

  /** Synthesize the audio table from `documents`: one real WAV per
    * doc_id. Same 100 TB story as [[imageTable]]: the binary column
    * would come from `binaryFile`/parquet in production; the encode
    * runs inside mapPartitions on executors.
    */
  def audioTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spreadIds(load(spark, dir, "documents")
      .select($"doc_id".cast("long")).as[Long])
      .mapPartitions(_.map(id => (id, syntheticWav(id), rateOf(id).toLong, samplesOf(id).toLong)))
      .toDF("clip_id", "content", "rate", "n")
      .select($"clip_id", $"content",
        struct($"rate".as("sample_rate"), $"n".as("n_samples"),
          lit("audio/wav").as("format")).as("meta"))
  }

  /** Batched per-partition audio featurizer — the audio twin of
    * [[extractFeatures]]: one MessageDigest per partition, every
    * feature a function of the decoded PCM stream. `energy` is the
    * integer mean-deviation proxy Σ|s − 128| (8-bit PCM is unsigned
    * around a 128 midline); `duration_us` is exact integer microseconds
    * from decoded frame count and parsed rate.
    */
  def extractAudioFeatures(audio: DataFrame): Dataset[AudioFeatures] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.select($"clip_id".cast("long"), $"content")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, content) =>
          val d = decodeAudio(content)
          var energy = 0L
          var i = 0
          while (i < d.samples.length) {
            energy += math.abs((d.samples(i) & 0xff) - 128); i += 1
          }
          AudioFeatures(
            clip_id = id,
            n_samples = d.samples.length.toLong,
            sample_rate = d.sampleRate.toLong,
            duration_us = 1000000L * d.samples.length / d.sampleRate,
            energy = energy,
            fingerprint = fingerprintOf(md, d.samples))
        }
      }
  }

  /** q194 — audio feature extraction over real WAV decodes, aggregated
    * per parsed sample rate: exercises the RIFF/PCM codec round-trip,
    * the batched mapPartitions decode pipeline, and a bounded
    * relational agg. The DuckDB oracle rebuilds the decoded PCM bytes
    * arithmetically (sample i of clip id = (id*31 + i) mod 256) — a
    * decoder returning wrong samples, rate, or frame count
    * hash-mismatches.
    */
  def q194_audio_features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractAudioFeatures(audioTable(spark, dir)).toDF()
      .groupBy($"sample_rate")
      .agg(
        count(lit(1)).as("n_clips"),
        sum($"n_samples").as("sum_samples"),
        sum($"duration_us").as("sum_duration_us"),
        sum($"energy").as("sum_energy"),
        min($"fingerprint").as("min_fp"),
        max($"fingerprint").as("max_fp"))
      .orderBy($"sample_rate")
  }

  // ---------------------------------------------------------------
  // Video codec (real: graft.llm.Avi RIFF demux + javax.imageio MJPEG)
  // ---------------------------------------------------------------

  /** Synthesize the video table from `documents` (every 5th doc
    * carries a clip — multimodal corpora are sparse in video): one
    * REAL minimal AVI per id ([[Avi.syntheticAvi]] — RIFF hdrl/movi/
    * idx1 with MJPEG `00dc` chunks). Same 100 TB story as
    * [[imageTable]]: binary column from `binaryFile`/parquet in
    * production, encode inside mapPartitions on executors.
    */
  def videoTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spreadIds(load(spark, dir, "documents")
      .select($"doc_id".cast("long")).as[Long]
      .filter(_ % 5 == 0))
      .mapPartitions(_.map(id => (id, Avi.syntheticAvi(id), Avi.framesOf(id).toLong)))
      .toDF("vid_id", "content", "nf")
      .select($"vid_id", $"content",
        struct($"nf".as("n_frames"), lit(Avi.FrameW.toLong).as("width"),
          lit(Avi.FrameH.toLong).as("height"),
          lit("video/x-msvideo").as("format")).as("meta"))
  }

  /** One demuxed+decoded frame record: container geometry from the
    * CHUNK WALK (the offset each frame was FOUND at, the declared
    * header frame count) and content features from the DECODED
    * raster — never from the metadata struct.
    */
  case class VideoFrame(
      vid_id: Long, frame_idx: Long, n_frames_declared: Long,
      chunk_offset: Long, width: Long, height: Long, fingerprint: Long)

  /** REAL video frame fan-out: parse each AVI's header, walk its
    * `movi` LIST, JPEG-decode every frame chunk, featurize the
    * decoded raster. The STREAMED one-asset → N-frames flatMap shape
    * (no per-asset frame array materializes in one row) is unchanged
    * from the former stand-in — [[Avi.demuxFrames]]'s iterator is
    * exactly what plugged into it.
    */
  def sampleVideoFrames(videos: DataFrame): Dataset[VideoFrame] = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.select($"vid_id".cast("long"), $"content")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, avi) =>
          val info = Avi.parseHeader(avi)
          Avi.demuxFrames(avi).map { fr =>
            val (w, h, px) = Avi.decodeGrayFrame(fr.payload)
            VideoFrame(
              vid_id = id,
              frame_idx = fr.frameIdx.toLong,
              n_frames_declared = info.declaredFrames.toLong,
              chunk_offset = fr.payloadOffset,
              width = w.toLong,
              height = h.toLong,
              fingerprint = fingerprintOf(md, px))
          }
        }
      }
  }

  /** Frame fan-out over REAL decoded rasters: decode each PNG, slice
    * the decoded pixel stream into fixed-size frames, keep every
    * `stride`-th — the video-pipeline UDTF shape driven through a
    * real image decode.
    */
  def sampleDecodedFrames(images: DataFrame, frameBytes: Int, stride: Int): Dataset[(Long, Long, Array[Byte])] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select($"img_id".cast("long"), $"content").as[(Long, Array[Byte])]
      .flatMap { case (id, content) =>
        decodeImage(content).pixels.grouped(frameBytes).zipWithIndex.collect {
          case (f, idx) if idx % stride == 0 => (id, idx.toLong, f)
        }
      }
  }

  /** q161 — frame-sampling end-to-end over real decodes: each PNG's
    * DECODED raster fans out to sampled frame rows
    * ([[sampleDecodedFrames]]), each frame fingerprints via md5 over
    * its hex (the VARCHAR-md5 domain DuckDB shares), then a bounded
    * per-bucket aggregate. DuckDB replays the ENTIRE pipeline —
    * decode (by arithmetic reconstruction), frame slicing, stride,
    * digest — not just the aggregate.
    */
  final val FrameBytes = 64
  final val FrameStride = 2

  def q161_frame_sample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sampleDecodedFrames(imageTable(spark, dir), FrameBytes, FrameStride)
      .toDF("img_id", "frame_idx", "frame")
      .select($"img_id",
        conv(substring(md5(lower(hex($"frame"))), 1, 15), 16, 10).cast("long").as("fp"),
        length($"frame").cast("long").as("n_bytes"))
      .groupBy(($"img_id" % 16).as("bucket"))
      .agg(count(lit(1)).as("n_frames"),
        sum($"n_bytes").as("sum_bytes"),
        min($"fp").as("min_fp"), max($"fp").as("max_fp"))
      .orderBy($"bucket")
  }

  /** q196 — video demux + decode end-to-end: every clip's AVI is
    * chunk-walked, every MJPEG frame JPEG-decoded, and the output is
    * the per-frame record of container geometry (found payload
    * offset, header-declared frame count) plus decoded-raster
    * features. The DuckDB oracle replays BOTH halves arithmetically:
    * offsets from the fixed-chunk layout (a walker that misreads a
    * LIST size lands on wrong offsets) and fingerprints from the
    * block formula (a decoder returning wrong pixels mismatches).
    * One ORDER BY at the end; the demux/decode itself is a pure
    * streamed flatMap — no shuffle before the sort.
    */
  def q196_video_frames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sampleVideoFrames(videoTable(spark, dir)).toDF()
      .select($"vid_id", $"frame_idx", $"n_frames_declared",
        $"chunk_offset", $"width", $"height", $"fingerprint")
      .orderBy($"vid_id", $"frame_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_multimodal_features" -> q28_multimodal_features,
    "q161_frame_sample" -> q161_frame_sample,
    "q194_audio_features" -> q194_audio_features,
    "q196_video_frames" -> q196_video_frames)

  /** Both oracles rebuild the DECODED pixel bytes arithmetically
    * (raster value = (doc_id*31 + i) mod 256 — what ImageIO must
    * produce after the PNG round-trip) as a hex string, then replay
    * the same digests/aggregates. A decoder that returned wrong
    * pixels, dimensions, or byte order hash-mismatches here.
    */
  private def pixelCte =
    """dims AS (SELECT doc_id, doc_id % 12 + 4 AS w, doc_id % 8 + 4 AS h
      |    FROM documents),
      |px AS (SELECT doc_id, w, h,
      |    unnest(generate_series(0, CAST(w*h*3 - 1 AS BIGINT))) AS i
      |  FROM dims),
      |img AS (SELECT doc_id, w, h,
      |    -- DuckDB to_hex is UPPERCASE; the engine digests lowercase
      |    lower(string_agg(lpad(to_hex((doc_id*31 + i) % 256), 2, '0'), '' ORDER BY i)) AS hex
      |  FROM px GROUP BY doc_id, w, h)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q28_multimodal_features" ->
      s"""WITH $pixelCte,
         |f AS (SELECT w % 10 AS wbucket, CAST(w*h*3 AS BIGINT) AS n_bytes,
         |    CAST('0x' || substring(md5(hex), 1, 15) AS BIGINT) AS fingerprint,
         |    CAST(ROUND(10000.0 * w / h) AS BIGINT) AS aspect_bp
         |  FROM img)
         |SELECT wbucket, COUNT(*) AS n, CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes,
         |  MIN(fingerprint) AS min_fp, MAX(fingerprint) AS max_fp,
         |  CAST(ROUND(AVG(aspect_bp)) AS BIGINT) AS avg_aspect_bp
         |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "q194_audio_features" ->
      """WITH dims AS (SELECT doc_id, doc_id % 50 + 20 AS n,
        |    8000 + (doc_id % 3) * 4000 AS rate FROM documents),
        |px AS (SELECT doc_id, n, rate,
        |    unnest(generate_series(0, CAST(n - 1 AS BIGINT))) AS i
        |  FROM dims),
        |clip AS (SELECT doc_id, n, rate,
        |    lower(string_agg(lpad(to_hex((doc_id*31 + i) % 256), 2, '0'), '' ORDER BY i)) AS hex,
        |    SUM(ABS((doc_id*31 + i) % 256 - 128)) AS energy
        |  FROM px GROUP BY doc_id, n, rate)
        |SELECT CAST(rate AS BIGINT) AS sample_rate,
        |  COUNT(*) AS n_clips,
        |  CAST(SUM(n) AS BIGINT) AS sum_samples,
        |  CAST(SUM(1000000 * n // rate) AS BIGINT) AS sum_duration_us,
        |  CAST(SUM(energy) AS BIGINT) AS sum_energy,
        |  MIN(CAST('0x' || substring(md5(hex), 1, 15) AS BIGINT)) AS min_fp,
        |  MAX(CAST('0x' || substring(md5(hex), 1, 15) AS BIGINT)) AS max_fp
        |FROM clip GROUP BY 1 ORDER BY 1""".stripMargin,
    "q196_video_frames" ->
      s"""WITH vids AS (SELECT doc_id, doc_id % 4 + 2 AS nf FROM documents
        |    WHERE doc_id % 5 = 0),
        |fr AS (SELECT doc_id, nf,
        |    unnest(generate_series(0, CAST(nf - 1 AS BIGINT))) AS f
        |  FROM vids),
        |px AS (SELECT doc_id, nf, f,
        |    unnest(generate_series(0, ${Avi.FrameW * Avi.FrameH - 1})) AS i
        |  FROM fr),
        |img AS (SELECT doc_id, nf, f,
        |    lower(string_agg(lpad(to_hex(
        |      (doc_id*31 + f*17 + ((i // ${Avi.FrameW}) // 8 * ${Avi.FrameW / 8}
        |        + (i % ${Avi.FrameW}) // 8) * 11) % 256), 2, '0'), '' ORDER BY i)) AS hex
        |  FROM px GROUP BY doc_id, nf, f)
        |SELECT doc_id AS vid_id, f AS frame_idx,
        |  CAST(nf AS BIGINT) AS n_frames_declared,
        |  CAST(${Avi.firstPayloadOffset} + f * ${8 + Avi.FrameChunkBytes} AS BIGINT)
        |    AS chunk_offset,
        |  CAST(${Avi.FrameW} AS BIGINT) AS width,
        |  CAST(${Avi.FrameH} AS BIGINT) AS height,
        |  CAST('0x' || substring(md5(hex), 1, 15) AS BIGINT) AS fingerprint
        |FROM img ORDER BY vid_id, frame_idx""".stripMargin,
    "q161_frame_sample" ->
      s"""WITH $pixelCte,
         |fr AS (SELECT doc_id AS img_id, hex,
         |    unnest(generate_series(0, CAST((w*h*3 - 1) // $FrameBytes AS BIGINT))) AS idx
         |  FROM img),
         |s AS (SELECT img_id, idx,
         |    substring(hex, CAST(idx * ${2 * FrameBytes} + 1 AS INT), ${2 * FrameBytes}) AS fhex
         |  FROM fr WHERE idx % $FrameStride = 0)
         |SELECT img_id % 16 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_frames,
         |  CAST(SUM(length(fhex) // 2) AS BIGINT) AS sum_bytes,
         |  MIN(CAST('0x' || substring(md5(fhex), 1, 15) AS BIGINT)) AS min_fp,
         |  MAX(CAST('0x' || substring(md5(fhex), 1, 15) AS BIGINT)) AS max_fp
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin)
}
