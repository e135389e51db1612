package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the round-20 native quantizer_topcap expression to the
  * explode → dist2 → row_number((dmicro, cid)) → crank ≤ cap
  * composition it replaced in the graph-ANN rankCells helper: same
  * micro-rounded expand-identity distances, same lower-cid tie-break,
  * same (crank, cid, dmicro) rows per vector.
  */
class QuantizerTopCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    VectorOps.vectorDot(a, b)

  test("quantizer_topcap matches the explode+window cell ranking exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 16
    // sparse ascending cids — the q349 base-slice seed shape
    val seeds: Array[(Int, Array[Double])] = Array.tabulate(12)(c =>
      (c * 3 + 1, Array.fill(dim)(rnd.nextDouble() * 2 - 1)))
    val cap = 5
    val df = Seq.tabulate(60)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextDouble() * 2 - 1))).toDF("vec_id", "v")

    val centArr = array(seeds.map { case (cid, c) =>
      struct(array(c.map(lit).toSeq: _*).as("cv"), lit(cid).as("cid"))
    }.toSeq: _*)
    val oldForm = df.select($"vec_id", $"v", explode(centArr).as("c"))
      .withColumn("dmicro",
        round((dot($"v", $"v") - lit(2.0) * dot($"v", $"c.cv")
          + dot($"c.cv", $"c.cv")) * 1e6)
          .cast("long"))
      .withColumn("crank", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"dmicro", $"c.cid")))
      .filter($"crank" <= cap)
      .select($"vec_id", $"crank", $"c.cid".as("cid"), $"dmicro")
      .orderBy($"vec_id", $"crank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))

    val newForm = df.select($"vec_id",
        posexplode(QuantizerTopCap.topCap($"v", seeds, cap)).as(Seq("i", "c")))
      .select($"vec_id", ($"i" + 1).as("crank"), $"c.cid".as("cid"),
        $"c.d".as("dmicro"))
      .orderBy($"vec_id", $"crank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))

    assert(oldForm.nonEmpty && oldForm.sameElements(newForm))
  }

  test("cap above the codebook size returns k entries, not cap") {
    import spark.implicits._
    val seeds: Array[(Int, Array[Double])] =
      Array.tabulate(3)(c => (c, Array.fill(4)(c + 1.0)))
    val out = Seq((1L, Array(0.5, 0.5, 0.5, 0.5))).toDF("vec_id", "v")
      .select(size(QuantizerTopCap.topCap($"v", seeds, 10)))
      .collect().head.getInt(0)
    assert(out === 3)
  }
}
