package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, IOException}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import javax.imageio.stream.MemoryCacheImageOutputStream

/** Pure-JVM AVI (RIFF) video container codec — the demux leg of the
  * multimodal pipeline, closing the last video stand-in: a real
  * chunk-walking demuxer that yields MJPEG frame payloads to the
  * real `ImageIO` JPEG decode (no external codec libs; the JDK ships
  * both the RIFF primitives — none, we walk bytes — and the JPEG
  * codec). Reference parallel: the RT pipeline decodes opaque binary
  * protobuf snapshots the same parse-the-container-then-the-payload
  * way (dags/gtfs_rt_minutely.py:88-133).
  *
  * The fixture side writes a REAL minimal AVI: RIFF/AVI with a
  * `hdrl` LIST (a full 56-byte `avih` main header + one video
  * stream's `strl` LIST with 56-byte `strh` and a 40-byte
  * BITMAPINFOHEADER `strf`, fourcc MJPG), a `movi` LIST of `00dc`
  * frame chunks, and a real `idx1` index. Frames are grayscale
  * JPEGs at quality 1.0 whose rasters are CONSTANT per 8×8 block:
  * a constant block has a DC-only DCT, and at quality 1.0 the
  * quantization table is all ones, so the lossy-in-general JPEG
  * round-trip is BIT-EXACT for this family (verified per-pixel by
  * AviSpec over the full value range). Because the block values are
  * an arithmetic function of (id, frame, block), DuckDB reconstructs
  * the DECODED pixel stream in SQL — the oracle verifies the
  * container walk AND the JPEG decode, not just the plumbing.
  *
  * Every `00dc` chunk is padded to the fixed [[FrameChunkBytes]]
  * size (encoders routinely pad for CBR/alignment; a JPEG decoder
  * stops at the EOI marker, so trailing zeros are inert). Fixed
  * chunks make every payload offset an arithmetic function of the
  * frame index — which is what lets the SQL oracle replay the
  * CONTAINER GEOMETRY too: the demuxer reports the offset it FOUND
  * each frame at, and a walker that miscounts a header, misreads a
  * LIST size, or skips the wrong padding hash-mismatches.
  */
object Avi {

  // ---------------------------------------------------------------
  // Geometry & arithmetic (shared with the SQL oracle)
  // ---------------------------------------------------------------

  /** Frame raster dims — multiples of 8 so every JPEG block is fully
    * interior (no edge replication), keeping the round-trip exact.
    */
  final val FrameW = 24
  final val FrameH = 16
  private final val BlocksPerRow = FrameW / 8

  /** Fixed `00dc` chunk payload size: the deterministic quality-1.0
    * encode of a [[FrameW]]×[[FrameH]] gray JPEG measures 344 bytes;
    * 512 leaves headroom for JPEG-writer drift across JDKs while
    * keeping offsets arithmetic. Even, so no RIFF pad byte.
    */
  final val FrameChunkBytes = 512

  /** Frame count for the synthetic clip of `id`: 2..5. */
  def framesOf(id: Long): Int = (id % 4 + 2).toInt

  /** 25 fps — written to avih/strh and parsed back by the demuxer. */
  final val MicroSecPerFrame = 40000

  /** Gray value of 8×8 block `b` in frame `f` of clip `id` — pure
    * arithmetic, so an SQL engine can rebuild every DECODED pixel.
    */
  def blockVal(id: Long, f: Int, b: Int): Int = ((id * 31 + f * 17 + b * 11) % 256).toInt

  /** Container layout constants (derived, used by the oracle):
    * RIFF hdr 12 + hdrl LIST (8 + 4 + avih 64 + strl 136) → movi
    * LIST at 224-12=... computed explicitly in [[firstPayloadOffset]]
    * and asserted by AviSpec against the writer's actual bytes.
    */
  private final val HdrlListBytes = 8 + 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
  /** Absolute offset of frame f's JPEG payload inside the file. */
  def payloadOffset(f: Int): Long =
    12L + HdrlListBytes + 8 + 4 + 8 + f.toLong * (8 + FrameChunkBytes)
  def firstPayloadOffset: Long = payloadOffset(0)

  // ---------------------------------------------------------------
  // Fixture writer (real RIFF + real JPEG)
  // ---------------------------------------------------------------

  ImageIO.setUseCache(false)

  /** Quality-1.0 grayscale JPEG of frame `f` of clip `id`. */
  def syntheticFrameJpeg(id: Long, f: Int): Array[Byte] = {
    val img = new BufferedImage(FrameW, FrameH, BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < FrameH) {
      var x = 0
      while (x < FrameW) {
        img.getRaster.setSample(x, y, 0,
          blockVal(id, f, (y / 8) * BlocksPerRow + x / 8))
        x += 1
      }
      y += 1
    }
    val w = ImageIO.getImageWritersByFormatName("jpeg").next()
    try {
      val p = w.getDefaultWriteParam
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(1.0f)
      val bos = new ByteArrayOutputStream()
      val ios = new MemoryCacheImageOutputStream(bos)
      w.setOutput(ios)
      w.write(null, new IIOImage(img, null, null), p)
      ios.flush()
      bos.toByteArray
    } finally w.dispose()
  }

  private final class Out {
    val b = new ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      b.write((v & 0xff).toInt); b.write(((v >> 8) & 0xff).toInt)
      b.write(((v >> 16) & 0xff).toInt); b.write(((v >> 24) & 0xff).toInt)
    }
    def u16(v: Int): Unit = { b.write(v & 0xff); b.write((v >> 8) & 0xff) }
    def fourcc(s: String): Unit = b.write(s.getBytes("US-ASCII"))
    def bytes(a: Array[Byte]): Unit = b.write(a, 0, a.length)
  }

  /** A real minimal AVI for clip `id`: hdrl (avih + one vids/MJPG
    * strl) + movi (fixed-size `00dc` JPEG chunks) + idx1.
    */
  def syntheticAvi(id: Long): Array[Byte] = {
    val n = framesOf(id)
    val o = new Out
    val moviDataBytes = 4 + n * (8 + FrameChunkBytes)
    val idx1Bytes = 8 + n * 16
    val riffBytes = 4 + HdrlListBytes + 8 + moviDataBytes + idx1Bytes

    o.fourcc("RIFF"); o.u32(riffBytes); o.fourcc("AVI ")

    // hdrl LIST
    o.fourcc("LIST"); o.u32(HdrlListBytes - 8); o.fourcc("hdrl")
    //   avih: MainAVIHeader (14 dwords = 56 bytes)
    o.fourcc("avih"); o.u32(56)
    o.u32(MicroSecPerFrame); o.u32(FrameChunkBytes * 25L) // maxBytesPerSec
    o.u32(0) // padding granularity
    o.u32(0x10) // AVIF_HASINDEX
    o.u32(n); o.u32(0) // totalFrames, initialFrames
    o.u32(1) // streams
    o.u32(FrameChunkBytes) // suggested buffer
    o.u32(FrameW); o.u32(FrameH)
    o.u32(0); o.u32(0); o.u32(0); o.u32(0) // reserved
    //   strl LIST
    o.fourcc("LIST"); o.u32(4 + (8 + 56) + (8 + 40)); o.fourcc("strl")
    //     strh: AVIStreamHeader (56 bytes)
    o.fourcc("strh"); o.u32(56)
    o.fourcc("vids"); o.fourcc("MJPG")
    o.u32(0) // flags
    o.u16(0); o.u16(0) // priority, language
    o.u32(0) // initial frames
    o.u32(1); o.u32(25) // scale, rate → 25 fps
    o.u32(0); o.u32(n) // start, length (frames)
    o.u32(FrameChunkBytes); o.u32(10000) // suggested buffer, quality
    o.u32(0) // sample size (0 = varies)
    o.u16(0); o.u16(0); o.u16(FrameW); o.u16(FrameH) // rcFrame
    //     strf: BITMAPINFOHEADER (40 bytes)
    o.fourcc("strf"); o.u32(40)
    o.u32(40); o.u32(FrameW); o.u32(FrameH)
    o.u16(1); o.u16(24) // planes, bit count (MJPG convention)
    o.fourcc("MJPG")
    o.u32(FrameW.toLong * FrameH * 3) // biSizeImage
    o.u32(0); o.u32(0); o.u32(0); o.u32(0) // ppm/clr fields

    // movi LIST
    o.fourcc("LIST"); o.u32(moviDataBytes); o.fourcc("movi")
    val idxOffsets = new Array[Long](n) // chunk fourcc offset relative to 'movi'
    var f = 0
    while (f < n) {
      idxOffsets(f) = 4L + f * (8 + FrameChunkBytes)
      val jpeg = syntheticFrameJpeg(id, f)
      require(jpeg.length <= FrameChunkBytes,
        s"frame JPEG ${jpeg.length} B exceeds the fixed chunk $FrameChunkBytes B")
      o.fourcc("00dc"); o.u32(FrameChunkBytes)
      o.bytes(jpeg)
      o.bytes(new Array[Byte](FrameChunkBytes - jpeg.length)) // zero pad
      f += 1
    }

    // idx1: one AVIINDEXENTRY per frame; offsets relative to 'movi'
    o.fourcc("idx1"); o.u32(n * 16L)
    f = 0
    while (f < n) {
      o.fourcc("00dc"); o.u32(0x10) // AVIIF_KEYFRAME
      o.u32(idxOffsets(f)); o.u32(FrameChunkBytes)
      f += 1
    }
    o.b.toByteArray
  }

  // ---------------------------------------------------------------
  // Demuxer (honest chunk walker — no layout assumptions)
  // ---------------------------------------------------------------

  final case class AviInfo(declaredFrames: Int, width: Int, height: Int,
                           microSecPerFrame: Long)
  final case class AviFrame(frameIdx: Int, payloadOffset: Long, chunkSize: Int,
                            payload: Array[Byte])
  final case class IndexEntry(chunkId: String, flags: Long, offset: Long, size: Long)

  private def u32(a: Array[Byte], p: Int): Long =
    ((a(p) & 0xffL)) | ((a(p + 1) & 0xffL) << 8) |
      ((a(p + 2) & 0xffL) << 16) | ((a(p + 3) & 0xffL) << 24)

  private def fourcc(a: Array[Byte], p: Int): String = {
    if (p + 4 > a.length) throw new IOException(s"truncated fourcc at $p")
    new String(a, p, 4, "US-ASCII")
  }

  private def checkRiff(avi: Array[Byte]): Unit = {
    if (avi.length < 12 || fourcc(avi, 0) != "RIFF" || fourcc(avi, 8) != "AVI ")
      throw new IOException("not a RIFF/AVI file")
    val declared = u32(avi, 4)
    if (8 + declared > avi.length)
      throw new IOException(s"truncated RIFF: declares ${declared + 8} B, have ${avi.length}")
  }

  /** Walk top-level chunks, returning (fourcc, listType-or-"", dataStart,
    * dataSize) — the generic RIFF scan both entry points share. Chunks
    * pad to even sizes per the RIFF rule.
    */
  private def topChunks(avi: Array[Byte]): Iterator[(String, String, Int, Int)] =
    new Iterator[(String, String, Int, Int)] {
      private var p = 12
      private val end = math.min(avi.length, (8 + u32(avi, 4)).toInt)
      def hasNext: Boolean = p + 8 <= end
      def next(): (String, String, Int, Int) = {
        val id = fourcc(avi, p)
        val size = u32(avi, p + 4).toInt
        // Long arithmetic: a hostile 2 GiB size must not wrap the
        // bound check negative and pass
        if (size < 0 || p + 8L + size > end)
          throw new IOException(s"chunk $id at $p overruns the file")
        val listType = if (id == "LIST" && size >= 4) fourcc(avi, p + 8) else ""
        val r = (id, listType, p + 8, size)
        p += 8 + size + (size & 1)
        r
      }
    }

  /** Parse the `hdrl` headers: declared frame count + dims from avih,
    * frame cadence. Fails honestly on a container without them.
    */
  def parseHeader(avi: Array[Byte]): AviInfo = {
    checkRiff(avi)
    topChunks(avi).collectFirst { case ("LIST", "hdrl", start, size) =>
      // walk hdrl's sub-chunks for avih
      var p = start + 4
      val end = start + size
      var info: Option[AviInfo] = None
      while (p + 8 <= end && info.isEmpty) {
        val id = fourcc(avi, p)
        val sz = u32(avi, p + 4).toInt
        if (sz < 0 || p + 8L + sz > end)
          throw new IOException(s"hdrl chunk $id at $p overruns the list")
        if (id == "avih") {
          if (sz < 56) throw new IOException(s"avih too small: $sz")
          info = Some(AviInfo(
            declaredFrames = u32(avi, p + 8 + 16).toInt,
            width = u32(avi, p + 8 + 32).toInt,
            height = u32(avi, p + 8 + 36).toInt,
            microSecPerFrame = u32(avi, p + 8)))
        }
        p += 8 + sz + (sz & 1)
      }
      info.getOrElse(throw new IOException("hdrl without avih"))
    }.getOrElse(throw new IOException("no hdrl LIST"))
  }

  /** Streamed demux of the `movi` LIST: yields each video frame chunk
    * (`??dc`/`??db`) with the ABSOLUTE file offset its payload was
    * found at — the geometry the oracle replays. Non-video chunks
    * (audio `??wb`, sub-LISTs, padding `JUNK`) are walked over, not
    * assumed absent.
    */
  def demuxFrames(avi: Array[Byte]): Iterator[AviFrame] = {
    checkRiff(avi)
    topChunks(avi).collectFirst { case ("LIST", "movi", start, moviSize) =>
      new Iterator[AviFrame] {
        private var p = start + 4
        private val end = start + moviSize
        private var idx = 0
        private var nextFrame: AviFrame = null
        private def advance(): Unit = {
          nextFrame = null
          while (nextFrame == null && p + 8 <= end) {
            val id = fourcc(avi, p)
            val sz = u32(avi, p + 4).toInt
            if (sz < 0 || p + 8L + sz > end)
              throw new IOException(s"movi chunk $id at $p overruns the list")
            if (id.endsWith("dc") || id.endsWith("db")) {
              nextFrame = AviFrame(idx, p + 8L, sz,
                java.util.Arrays.copyOfRange(avi, p + 8, p + 8 + sz))
              idx += 1
            }
            p += 8 + sz + (sz & 1)
          }
        }
        advance()
        def hasNext: Boolean = nextFrame != null
        def next(): AviFrame = {
          val r = nextFrame; advance(); r
        }
      }
    }.getOrElse(throw new IOException("no movi LIST"))
  }

  /** Parse the `idx1` index (entries of 16 bytes). Offsets are
    * relative to the 'movi' fourcc per the classic convention the
    * writer uses; AviSpec cross-checks them against the walked
    * chunk positions.
    */
  def parseIndex(avi: Array[Byte]): Seq[IndexEntry] = {
    checkRiff(avi)
    topChunks(avi).collectFirst { case ("idx1", _, start, size) =>
      (0 until size / 16).map { i =>
        val p = start + i * 16
        IndexEntry(fourcc(avi, p), u32(avi, p + 4), u32(avi, p + 8), u32(avi, p + 12))
      }
    }.getOrElse(Seq.empty)
  }

  /** REAL JPEG decode of one demuxed frame payload to canonical
    * row-major grayscale bytes (trailing chunk padding after the EOI
    * marker is inert to the decoder).
    */
  def decodeGrayFrame(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    if (img == null) throw new IOException("undecodable frame payload")
    val w = img.getWidth
    val h = img.getHeight
    val px = new Array[Byte](w * h)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(i) = img.getRaster.getSample(x, y, 0).toByte
        i += 1; x += 1
      }
      y += 1
    }
    (w, h, px)
  }
}
