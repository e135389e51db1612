package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

/** One decoded-asset record: the typed metadata a real pipeline would
  * extract from the media header plus cheap content features.
  */
case class MediaFeatures(
    img_id: Long, n_bytes: Long, fingerprint: Long,
    width: Long, height: Long, aspect_bp: Long)

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed by a batched per-partition pipeline.
  *
  * The container ships no image/audio codecs, so the *decode* step is
  * a deterministic stand-in (`decodeStub`) — but everything Spark-side
  * is real and load-bearing: the (id, content: binary, meta: struct)
  * schema, the mapPartitions batch walk (one codec context per
  * partition, the shape a JNI/FFI decoder needs), the typed Dataset
  * encoder, and the downstream relational join-ability of the
  * features. Swapping `decodeStub` for a real codec changes no
  * signatures.
  *
  * The features themselves are engine-independent (md5 fingerprint,
  * byte length, metadata arithmetic), so the whole pipeline —
  * including the binary column materialization — is DuckDB-verifiable.
  */
object Multimodal {

  /** Synthesize a media table from `documents`: content = utf-8 bytes
    * (stands in for an encoded image), metadata derived
    * deterministically from doc_id. At 100 TB this column would come
    * from `spark.read.format("binaryFile")` or parquet BYTE_ARRAY —
    * same schema either way.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "documents")
      .select(
        $"doc_id".as("img_id"),
        encode($"text", "UTF-8").as("content"),
        struct(
          ($"doc_id" % 320 + 16).as("width"),
          ($"doc_id" % 200 + 16).as("height"),
          lit("fake/rgb8").as("format")).as("meta"))
  }

  /** STUB — a real build links an image codec here (libjpeg/ffmpeg via
    * FFI). Deterministic fake: "decode" yields the byte array itself;
    * real per-byte work (md5) keeps the CPU profile honest.
    */
  private def decodeStub(content: Array[Byte]): Array[Byte] = content

  /** The batched per-partition feature extractor: one MessageDigest
    * ("codec context") per partition, reused across rows — the
    * mapPartitions shape that amortizes codec init at scale.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select($"img_id".cast("long"), $"content",
        $"meta.width".cast("long"), $"meta.height".cast("long"))
      .as[(Long, Array[Byte], Long, Long)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, content, w, h) =>
          val pixels = decodeStub(content)
          md.reset()
          val hex = md.digest(pixels).map("%02x".format(_)).mkString
          val fp = java.lang.Long.parseLong(hex.substring(0, 15), 16)
          MediaFeatures(
            img_id = id,
            n_bytes = pixels.length.toLong,
            fingerprint = fp,
            width = w,
            height = h,
            aspect_bp = math.round(10000.0 * w / h))
        }
      }
  }

  /** Feature extraction over the synthesized media table, aggregated
    * per width bucket — exercises binary materialization, the typed
    * mapPartitions pipeline, and a downstream relational agg.
    */
  def q28_multimodal_features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaTable(spark, dir)).toDF()
      .groupBy(($"width" % 10).as("wbucket"))
      .agg(
        count(lit(1)).as("n"),
        sum($"n_bytes").as("sum_bytes"),
        min($"fingerprint").as("min_fp"),
        max($"fingerprint").as("max_fp"),
        round(avg($"aspect_bp")).cast("long").as("avg_aspect_bp"))
      .orderBy($"wbucket")
  }

  /** STUB resize — a real build calls the codec's scaler. The
    * deterministic fake keeps every k-th byte so output size tracks
    * the target dimensions; the Spark-side shape (binary in → binary
    * out, metadata recomputed) is what a real scaler needs.
    */
  private[llm] def resizeStub(pixels: Array[Byte], targetBytes: Int): Array[Byte] = {
    if (pixels.isEmpty || targetBytes <= 0) return Array.emptyByteArray
    if (pixels.length <= targetBytes) return pixels
    val stride = pixels.length.toDouble / targetBytes
    Array.tabulate(targetBytes)(i => pixels((i * stride).toInt))
  }

  /** Batched resize over the media table: binary → smaller binary +
    * refreshed metadata, one codec context per partition.
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int): Dataset[(Long, Array[Byte], Long, Long)] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select($"img_id".cast("long"), $"content").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, content) =>
        val out = resizeStub(decodeStub(content), targetW * targetH)
        (id, out, targetW.toLong, targetH.toLong)
      })
  }

  /** STUB frame sampling — the video-pipeline UDTF shape: one input
    * asset explodes to one row per sampled frame. The fake treats the
    * byte stream as fixed-size frames and keeps every `stride`-th.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): Dataset[(Long, Long, Array[Byte])] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select($"img_id".cast("long"), $"content").as[(Long, Array[Byte])]
      .flatMap { case (id, content) =>
        val frames = decodeStub(content).grouped(frameBytes).toSeq
        frames.zipWithIndex.collect {
          case (f, idx) if idx % stride == 0 => (id, idx.toLong, f)
        }
      }
  }

  /** q161 — frame-sampling end-to-end: the video-pipeline UDTF shape
    * ([[sampleFrames]]: one asset → N sampled frame rows) driven
    * through fingerprinting and a bounded per-bucket aggregate. The
    * fan-out is a streamed flatMap (no per-asset frame array ever
    * materializes in one row), the per-frame md5 fingerprint is
    * engine-independent, and because the stub "decode" is byte
    * slicing over ASCII payloads, DuckDB replays the ENTIRE pipeline
    * — sampling stride included — not just the aggregate.
    */
  final val FrameBytes = 64
  final val FrameStride = 2

  def q161_frame_sample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sampleFrames(mediaTable(spark, dir), FrameBytes, FrameStride)
      .toDF("img_id", "frame_idx", "frame")
      .select($"img_id",
        conv(substring(md5($"frame"), 1, 15), 16, 10).cast("long").as("fp"),
        length($"frame").cast("long").as("n_bytes"))
      .groupBy(($"img_id" % 16).as("bucket"))
      .agg(count(lit(1)).as("n_frames"),
        sum($"n_bytes").as("sum_bytes"),
        min($"fp").as("min_fp"), max($"fp").as("max_fp"))
      .orderBy($"bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_multimodal_features" -> q28_multimodal_features,
    "q161_frame_sample" -> q161_frame_sample)

  val oracle: Map[String, String] = Map(
    // DuckDB md5 over the text's utf-8 bytes == Spark md5 over
    // encode(text,'UTF-8') == the mapPartitions MessageDigest — the
    // fingerprint is engine-independent by construction.
    "q161_frame_sample" ->
      s"""WITH fr AS (SELECT doc_id AS img_id, text,
         |    unnest(generate_series(0,
         |      CAST((length(text) - 1) // $FrameBytes AS BIGINT))) AS idx
         |  FROM documents WHERE length(text) > 0),
         |s AS (SELECT img_id,
         |    substring(text, idx * $FrameBytes + 1, $FrameBytes) AS frame
         |  FROM fr WHERE idx % $FrameStride = 0)
         |SELECT img_id % 16 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_frames,
         |  CAST(SUM(length(frame)) AS BIGINT) AS sum_bytes,
         |  MIN(CAST('0x' || substring(md5(frame), 1, 15) AS BIGINT)) AS min_fp,
         |  MAX(CAST('0x' || substring(md5(frame), 1, 15) AS BIGINT)) AS max_fp
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q28_multimodal_features" ->
      """WITH f AS (SELECT
        |    doc_id % 320 + 16 AS width,
        |    doc_id % 200 + 16 AS height,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) AS fingerprint,
        |    CAST(ROUND(10000.0 * (doc_id % 320 + 16) / (doc_id % 200 + 16)) AS BIGINT) AS aspect_bp
        |  FROM documents)
        |SELECT width % 10 AS wbucket, COUNT(*) AS n, CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes,
        |  MIN(fingerprint) AS min_fp, MAX(fingerprint) AS max_fp,
        |  CAST(ROUND(AVG(aspect_bp)) AS BIGINT) AS avg_aspect_bp
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin)
}
