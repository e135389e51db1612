package graft.gtfs

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import ProtoWire._

/** Randomized properties for the hand-written protobuf wire codec —
  * the binary-parsing code a malformed byte would hurt most. The
  * existing ProtoWireSpec pins chosen boundary values; these generate
  * across the full domains:
  *
  *  - varint/fixed/string encode→decode round-trips for arbitrary
  *    values (incl. negative longs = 10-byte varints, non-ASCII
  *    strings, float/double bit patterns — NaN payloads must survive
  *    bit-exactly, so comparisons are on raw bits);
  *  - `skip` must advance over any unknown field EXACTLY: a known
  *    sentinel written after a random unknown field must still parse
  *    (the forward-compatibility contract the RT decoder relies on
  *    when the feed adds fields).
  */
class ProtoWirePropertySpec extends AnyFunSuite {

  private def run(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("varint round-trips any Long (negatives take the 10-byte form)") {
    run(Prop.forAll((v: Long) => {
      val r = new Reader(new Writer().varintRaw(v).toBytes)
      r.readVarint() == v && !r.hasNext
    }))
  }

  test("int field round-trips value and field number") {
    run(Prop.forAll(Gen.choose(1, 536870911), Gen.long) { (f, v) =>
      val r = new Reader(new Writer().int(f, v).toBytes)
      val (fld, wt) = r.readTag()
      fld == f && wt == WireVarint && r.readVarint() == v && !r.hasNext
    })
  }

  test("float round-trips to the writer's canonical bits (NaN payloads canonicalize)") {
    run(Prop.forAll(Gen.choose(Int.MinValue, Int.MaxValue)) { bits =>
      val v = java.lang.Float.intBitsToFloat(bits)
      val r = new Reader(new Writer().float(1, v).toBytes)
      r.readTag()
      // Writer canonicalizes via floatToIntBits (protobuf-Java
      // behavior: every NaN payload → the canonical NaN); the Reader
      // must reproduce exactly those bits
      java.lang.Float.floatToRawIntBits(r.readFloat()) ==
        java.lang.Float.floatToIntBits(v)
    })
  }

  test("string round-trips arbitrary unicode") {
    run(Prop.forAll(Gen.asciiPrintableStr, Gen.listOf(Gen.choose(0x20, 0x2FFF))) {
      (ascii, cps) =>
        val s = ascii + cps.map(Character.toChars(_).mkString).mkString
        val r = new Reader(new Writer().string(1, s).toBytes)
        r.readTag()
        r.readString() == s
    })
  }

  test("skip consumes unknown fields exactly; the next field still parses") {
    run(Prop.forAll(Gen.long, Gen.oneOf(0, 1, 2, 3)) { (v, kind) =>
      val w = new Writer()
      kind match {
        case 0 => w.int(999, v)
        case 1 => w.float(998, 1.5f)
        case 2 => w.string(997, "zzz")
        case 3 => w.bytes(996, Array[Byte](1, 2, 3, 4, 5))
      }
      w.int(7, 42L)
      val r = new Reader(w.toBytes)
      val (_, wt) = r.readTag()
      r.skip(wt)
      val (fld, _) = r.readTag()
      fld == 7 && r.readVarint() == 42L && !r.hasNext
    })
  }

  test("nested messages frame correctly under random payloads") {
    run(Prop.forAll(Gen.long, Gen.long) { (a, b) =>
      val bytes = new Writer()
        .message(3)(_.int(1, a).message(2)(_.int(1, b)))
        .int(9, 5L).toBytes
      val r = new Reader(bytes)
      val (f3, _) = r.readTag()
      val m = r.readMessage()
      val (f1, _) = m.readTag()
      val ra = m.readVarint()
      val (f2, _) = m.readTag()
      val inner = m.readMessage()
      val (fi, _) = inner.readTag()
      val rb = inner.readVarint()
      val (f9, _) = r.readTag()
      f3 == 3 && f1 == 1 && ra == a && f2 == 2 && fi == 1 && rb == b &&
        !m.hasNext && !inner.hasNext && f9 == 9 && r.readVarint() == 5L
    })
  }
}
