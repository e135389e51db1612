package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** The AVI codec's honesty suite: the writer must emit a real RIFF
  * container, the demuxer must WALK it (not assume the writer's
  * layout), and the JPEG round-trip must be bit-exact so the SQL
  * oracle's arithmetic pixel reconstruction is a true decode check.
  */
class AviSpec extends AnyFunSuite {

  test("writer emits real RIFF/AVI magic and a JFIF JPEG per frame") {
    val avi = Avi.syntheticAvi(7L)
    assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val frames = Avi.demuxFrames(avi).toSeq
    assert(frames.nonEmpty)
    // every payload starts with the JPEG SOI marker FFD8
    frames.foreach { f =>
      assert((f.payload(0) & 0xff) == 0xff && (f.payload(1) & 0xff) == 0xd8,
        s"frame ${f.frameIdx} must start with SOI")
    }
  }

  test("demux walks every frame at the arithmetic offset; header declares the count") {
    for (id <- Seq(0L, 1L, 5L, 42L, 255L, 9999L)) {
      val avi = Avi.syntheticAvi(id)
      val info = Avi.parseHeader(avi)
      assert(info.declaredFrames == Avi.framesOf(id), s"id=$id avih frame count")
      assert(info.width == Avi.FrameW && info.height == Avi.FrameH, s"id=$id avih dims")
      assert(info.microSecPerFrame == Avi.MicroSecPerFrame.toLong)
      val frames = Avi.demuxFrames(avi).toSeq
      assert(frames.length == Avi.framesOf(id), s"id=$id walked count")
      frames.foreach { f =>
        assert(f.payloadOffset == Avi.payloadOffset(f.frameIdx),
          s"id=$id frame ${f.frameIdx} offset")
        assert(f.chunkSize == Avi.FrameChunkBytes)
      }
    }
  }

  test("JPEG round-trip is bit-exact: decoded pixels equal the block formula") {
    // The load-bearing property for the oracle: constant 8x8 blocks +
    // quality 1.0 grayscale make the normally-lossy JPEG path exact,
    // so DuckDB's arithmetic raster IS what the decoder must produce.
    for (id <- Seq(0L, 3L, 17L, 123L, 4096L); f <- 0 until Avi.framesOf(id)) {
      val (w, h, px) = Avi.decodeGrayFrame(Avi.syntheticFrameJpeg(id, f))
      assert(w == Avi.FrameW && h == Avi.FrameH)
      var i = 0
      while (i < px.length) {
        val (x, y) = (i % w, i / w)
        val b = (y / 8) * (w / 8) + x / 8
        assert((px(i) & 0xff) == Avi.blockVal(id, f, b),
          s"id=$id frame=$f pixel ($x,$y)")
        i += 1
      }
    }
  }

  test("decode survives the fixed-chunk zero padding after EOI") {
    val avi = Avi.syntheticAvi(11L)
    Avi.demuxFrames(avi).foreach { fr =>
      assert(fr.payload.length == Avi.FrameChunkBytes) // padded payload
      val (w, h, _) = Avi.decodeGrayFrame(fr.payload)  // decoder stops at EOI
      assert(w == Avi.FrameW && h == Avi.FrameH)
    }
  }

  test("idx1 entries agree with the walked chunk positions") {
    val avi = Avi.syntheticAvi(42L)
    val idx = Avi.parseIndex(avi)
    val frames = Avi.demuxFrames(avi).toSeq
    assert(idx.length == frames.length)
    // classic convention: index offsets are relative to the 'movi'
    // fourcc; a frame's chunk fourcc sits 8 bytes before its payload
    val moviFourcc = Avi.payloadOffset(0) - 8 - 4
    idx.zip(frames).foreach { case (e, f) =>
      assert(e.chunkId == "00dc" && e.size == Avi.FrameChunkBytes.toLong)
      assert(moviFourcc + e.offset == f.payloadOffset - 8,
        s"idx1 offset for frame ${f.frameIdx}")
    }
  }

  test("the walker skips unknown chunks instead of assuming the layout") {
    // splice a JUNK chunk between hdrl and movi: offsets shift, a
    // layout-assuming parser breaks, a real walker does not
    val avi = Avi.syntheticAvi(5L)
    val junkData = 32
    // insertion point: where the movi LIST header starts (derived
    // from the payload arithmetic, not hardcoded)
    val insertAt = (Avi.payloadOffset(0) - 8 - 4 - 8).toInt
    val junk = new Array[Byte](8 + junkData)
    junk(0) = 'J'; junk(1) = 'U'; junk(2) = 'N'; junk(3) = 'K'
    junk(4) = junkData.toByte // little-endian 32
    val spliced = new Array[Byte](avi.length + junk.length)
    System.arraycopy(avi, 0, spliced, 0, insertAt)
    System.arraycopy(junk, 0, spliced, insertAt, junk.length)
    System.arraycopy(avi, insertAt, spliced, insertAt + junk.length, avi.length - insertAt)
    // fix the RIFF size
    val newRiff = avi.length + junk.length - 8
    spliced(4) = (newRiff & 0xff).toByte
    spliced(5) = ((newRiff >> 8) & 0xff).toByte
    spliced(6) = ((newRiff >> 16) & 0xff).toByte
    spliced(7) = ((newRiff >> 24) & 0xff).toByte

    val frames = Avi.demuxFrames(spliced).toSeq
    assert(frames.length == Avi.framesOf(5L))
    frames.foreach { f =>
      assert(f.payloadOffset == Avi.payloadOffset(f.frameIdx) + junk.length,
        "offsets must reflect where chunks actually are, not the default layout")
      val (w, h, _) = Avi.decodeGrayFrame(f.payload)
      assert(w == Avi.FrameW && h == Avi.FrameH)
    }
    assert(Avi.parseHeader(spliced).declaredFrames == Avi.framesOf(5L))
  }

  test("corrupt containers fail honestly, not silently") {
    val avi = Avi.syntheticAvi(9L)
    // wrong magic
    val notRiff = avi.clone(); notRiff(0) = 'X'
    intercept[java.io.IOException](Avi.demuxFrames(notRiff))
    // truncated file (RIFF declares more than is present)
    intercept[java.io.IOException](
      Avi.demuxFrames(java.util.Arrays.copyOfRange(avi, 0, avi.length / 2)))
    // a movi chunk whose declared size overruns the list
    val overrun = avi.clone()
    val p = Avi.payloadOffset(0).toInt - 4 // first 00dc size field
    overrun(p) = 0xff.toByte; overrun(p + 1) = 0xff.toByte
    overrun(p + 2) = 0xff.toByte; overrun(p + 3) = 0x7f.toByte
    intercept[java.io.IOException](Avi.demuxFrames(overrun).toSeq)
    // garbage frame payload is an undecodable-frame error
    intercept[java.io.IOException](Avi.decodeGrayFrame(new Array[Byte](100)))
  }
}
