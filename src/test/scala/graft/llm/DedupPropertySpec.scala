package graft.llm

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the deterministic sketch primitives in
  * [[Dedup]] — the invariants the 100 TB design leans on, checked
  * over generated inputs rather than the one harness corpus:
  *
  *  - `intersectSize` (the candidate-verify kernel) must be EXACT:
  *    any systematic error silently mis-scores every near-dup pair.
  *  - `shingleHashes` must be sorted+distinct (the merge-walk
  *    precondition) and order-stable, or the verify join's outputs
  *    become partitioning-dependent.
  *  - `minhashSig` must distribute over set union slot-wise
  *    (sig(A ∪ B) = min(sig(A), sig(B))) — the property that makes
  *    signatures partial-aggregatable: shard-local signatures merged
  *    at the reducer equal the signature of the whole document set,
  *    so sketch tables can be built map-side at any parallelism.
  */
class DedupPropertySpec extends AnyFunSuite {

  private def run(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val sortedDistinct: Gen[Array[Long]] =
    Gen.listOf(Gen.long).map(_.distinct.sorted.toArray)

  test("intersectSize equals naive set-intersection size") {
    run(Prop.forAll(sortedDistinct, sortedDistinct) { (a, b) =>
      Dedup.intersectSize(a, b) == a.toSet.intersect(b.toSet).size
    })
  }

  test("intersectSize is symmetric and bounded by min length") {
    run(Prop.forAll(sortedDistinct, sortedDistinct) { (a, b) =>
      val i = Dedup.intersectSize(a, b)
      i == Dedup.intersectSize(b, a) && i <= math.min(a.length, b.length)
    })
  }

  private val words: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "e", "gg", "h"))

  test("shingleHashes is sorted, distinct, and counts distinct n-grams") {
    run(Prop.forAll(words, Gen.choose(1, 4)) { (ws, n) =>
      val text = ws.mkString(" ")
      // expected side mirrors the operator's tokenization contract:
      // split(" ", -1), so "" is one (empty) word — same as DuckDB's
      // str_split on the oracle side
      val tw = text.split(" ", -1).toList
      val got = Dedup.shingleHashes(text, n)
      val grams = if (tw.length < n) Set.empty[String]
        else tw.sliding(n).map(_.mkString(" ")).toSet
      (got.toSeq == got.toSeq.sorted.distinct) :| "sorted+distinct" &&
        // distinct n-gram count, modulo 64-bit hash collisions the
        // generator's tiny vocabulary cannot produce
        (got.length == grams.size) :| s"count ${got.length} vs ${grams.size}"
    })
  }

  test("shingleHashes is null-safe and short-input-safe") {
    assert(Dedup.shingleHashes(null, 3).isEmpty)
    assert(Dedup.shingleHashes("one two", 3).isEmpty)
    assert(Dedup.shingleHashes("", 3).isEmpty)
  }

  test("minhashSig distributes over union: sig(A ∪ B) = min slot-wise") {
    run(Prop.forAll(sortedDistinct, sortedDistinct) { (a, b) =>
      val union = (a ++ b).distinct.sorted
      val merged = Dedup.minhashSig(a).zip(Dedup.minhashSig(b))
        .map { case (x, y) => math.min(x, y) }
      Dedup.minhashSig(union).sameElements(merged)
    })
  }

  test("minhashSig is insertion-order invariant") {
    run(Prop.forAll(sortedDistinct) { a =>
      Dedup.minhashSig(a.reverse).sameElements(Dedup.minhashSig(a))
    })
  }

  // ---- SimHash blocking (q24) ----

  private def chunksOf(h: Long): Seq[Long] =
    (0 until Dedup.SimChunks).map(c =>
      (h >>> (c * Dedup.ChunkBits)) & ((1L << Dedup.ChunkBits) - 1))

  /** The q24 candidate-generation guarantee: any pair within Hamming
    * distance MaxHamming MUST collide on at least one 15-bit chunk
    * (pigeonhole: ≤ 3 flipped bits cannot touch all 4 chunks). This
    * pins the CONSTANTS — raising MaxHamming to SimChunks, or
    * shrinking the chunk count, silently breaks recall of the chunk
    * equi-join; this property fails instead.
    */
  test("simhash blocking: Hamming ≤ MaxHamming implies a shared chunk") {
    val bit = Gen.choose(0, Dedup.SimHashBits - 1)
    val flips = Gen.choose(0, Dedup.MaxHamming).flatMap(k => Gen.listOfN(k, bit))
    val base = Gen.long.map(_ & ((1L << Dedup.SimHashBits) - 1))
    run(Prop.forAll(base, flips) { (h, bs) =>
      val other = bs.foldLeft(h)((acc, b) => acc ^ (1L << b))
      chunksOf(h).zip(chunksOf(other)).exists { case (x, y) => x == y }
    })
  }

  test("simhash is word-order invariant and deterministic") {
    run(Prop.forAll(words) { ws =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val a = Dedup.simhash(md, ws.mkString(" "))
      val b = Dedup.simhash(md, ws.reverse.mkString(" "))
      val again = Dedup.simhash(md, ws.mkString(" "))
      a == b && a == again
    })
  }
}
