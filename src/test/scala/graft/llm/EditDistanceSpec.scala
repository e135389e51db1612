package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q86's blocking must be lossless w.r.t. its own candidate
  * definition: the blocked join finds exactly the pairs a naive
  * all-pairs scan finds under the same (lang, leading-token, length
  * band, distance) predicate.
  */
class EditDistanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("blocked pairs equal the naive all-pairs answer") {
    import spark.implicits._
    val got = Dedup.q86_edit_distance(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.Caches.releaseAll()
    val docs = graft.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang", $"n_chars", $"text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val naive = (for {
      (aId, aLang, aN, aText) <- docs
      (bId, bLang, bN, bText) <- docs
      if aId < bId && aLang == bLang &&
        aText.split(" ", -1).head == bText.split(" ", -1).head &&
        math.abs(aN - bN) <= 24
      dist = lev(aText.take(48), bText.take(48))
      if dist <= 30
    } yield (aId, bId, dist.toLong)).toSet
    assert(got == naive)
    assert(naive.nonEmpty)
  }
}
