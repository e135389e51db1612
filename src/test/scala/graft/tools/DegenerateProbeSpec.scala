package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The degenerate-input robustness gate: EVERY registered query must
  * survive a pathologically small, constant-valued dataset (identical
  * texts, identical vectors, a constant single-day event stream,
  * 3-row TPC-H slices with mostly-empty joins) without throwing —
  * except the two trained-quantizer queries whose explicit `require`
  * names the minimum corpus they need. This is the gate that caught
  * eleven latent ANSI divide-by-zero / null-decode crashes in one
  * sweep (q40, q104, q107, q135, q172, q250, q264, q278, q290 are
  * now guarded with engine-mirrored degenerate semantics).
  */
class DegenerateProbeSpec extends AnyFunSuite {
  test("degenerate corpus never throws, except the two documented quantizer guards") {
    val spark = TestSpark.spark
    val dir = TestSpark.tempDir("degenerate_gate")
    DegenerateProbe.buildFixture(spark, "/root/testdata/sf0.001", dir)
    val failures = DegenerateProbe.probe(spark, dir)
    val names = failures.map(_._1).toSet
    assert(names == DegenerateProbe.DocumentedGuards,
      s"unexpected degenerate-input throwers:\n${failures.mkString("\n")}")
    failures.foreach { case (n, e) =>
      assert(e.startsWith("IllegalArgumentException: requirement failed"),
        s"$n must fail with its explicit corpus-size require, got: $e")
    }
  }

  test("zero-row corpus never throws, except the documented corpus-derived-codebook requires") {
    val spark = TestSpark.spark
    val dir = TestSpark.tempDir("degenerate_empty_gate")
    DegenerateProbe.buildEmptyFixture(spark, "/root/testdata/sf0.001", dir)
    val failures = DegenerateProbe.probe(spark, dir)
    val names = failures.map(_._1).toSet
    assert(names == DegenerateProbe.EmptyDocumentedGuards,
      s"unexpected zero-row throwers (or a guard that stopped firing):\n${failures.mkString("\n")}")
    failures.foreach { case (n, e) =>
      assert(e.startsWith("IllegalArgumentException: requirement failed"),
        s"$n must fail with its named corpus-shape require, got: $e")
    }
  }
}
