package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class VectorOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("vector_dot is bit-identical to the aggregate(zip_with(...)) HOF fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(50)((
      Array.fill(64)(rnd.nextDouble() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val hof = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
      .collect().map(_.getDouble(0))
    val native = df.select(VectorOps.vectorDot($"a", $"b"))
      .collect().map(_.getDouble(0))
    // exact comparison on the raw bits: same accumulation order is the
    // contract that keeps every DuckDB oracle hash stable
    assert(hof.zip(native).forall { case (h, n) =>
      java.lang.Double.doubleToLongBits(h) == java.lang.Double.doubleToLongBits(n)
    })
  }

  test("NULL semantics: null input, null element, length mismatch") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0), Array(3.0, 4.0)),     // 11.0
      (Array(1.0, 2.0), Array(3.0))           // length mismatch -> null
    ).toDF("a", "b")
    val out = df.select(VectorOps.vectorDot($"a", $"b")).collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(1).isNullAt(0))
    val withNulls = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 1.0)))
      .toDF("a", "b").select(VectorOps.vectorDot($"a", $"b")).collect()
    assert(withNulls.head.isNullAt(0), "null element must propagate")
    val nullInput = Seq((null: Array[Double], Array(1.0)))
      .toDF("a", "b").select(VectorOps.vectorDot($"a", $"b")).collect()
    assert(nullInput.head.isNullAt(0))
  }

  test("registered in SQL via session extensions; twice in one projection codegens") {
    val fresh = spark.newSession()
    // two occurrences in one generated function — guards the fresh
    // local-variable-name requirement of doGenCode
    val r = fresh.sql(
      """SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d1,
        |       vector_dot(array(2.0d, 2.0d), array(1.0d, 1.0d)) AS d2""".stripMargin)
      .collect().head
    assert(r.getDouble(0) === 11.0 && r.getDouble(1) === 4.0)
  }

  test("wrong argument count is a clean analysis error, not an index error") {
    val fresh = spark.newSession()
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      fresh.sql("SELECT vector_dot(array(1.0d, 2.0d))").collect()
    }
    assert(err.getMessage.contains("vector_dot"))
    val err2 = intercept[org.apache.spark.sql.AnalysisException] {
      fresh.sql("SELECT gtfs_time_to_seconds('01:02:03', 'extra')").collect()
    }
    assert(err2.getMessage.contains("gtfs_time_to_seconds"))
  }

  test("type check rejects non-double arrays") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
        .select(VectorOps.vectorDot($"a", $"b")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("vector_dot") ||
      err.getMessage.contains("ARRAY<DOUBLE>"))
  }

  test("vector_to_double is bit-identical to the transform(cast) HOF on floats") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(50)(Array.fill(64)(rnd.nextFloat() * 2 - 1)).toDF("a")
    val hof = df.select(transform($"a", x => x.cast("double")))
      .collect().map(_.getSeq[Double](0))
    val native = df.select(VectorOps.vectorToDouble($"a"))
      .collect().map(_.getSeq[Double](0))
    assert(hof.zip(native).forall { case (h, n) =>
      h.zip(n).forall { case (x, y) =>
        java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
      }
    })
  }

  test("quantizer_argmin is bit-identical to the array_min(struct) composition, ties to lower cid") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 16
    val seeds: Array[(Int, Array[Double])] =
      Array.tabulate(4)(i => (i, Array.fill(dim)(rnd.nextDouble() - 0.5)))
    // duplicate centroid 3 == centroid 1 → any point nearest to it must
    // report cid 1 (lower id wins the tie)
    seeds(3) = (3, seeds(1)._2.clone())
    val df = Seq.fill(200)(Array.fill(dim)(rnd.nextDouble() - 0.5)).toDF("v")
    val vv = VectorOps.vectorDot($"v", $"v")
    val hof = df.select(array_min(array(seeds.map { case (cid, c) =>
        struct(round((vv - lit(2.0) * VectorOps.vectorDot($"v", array(c.map(lit).toSeq: _*))
          + lit(c.map(x => x * x).sum)) * 1e6).cast("long").as("d"),
          lit(cid).as("cid"))
      }.toSeq: _*)).as("m"))
      .select($"m.d", $"m.cid").collect().map(r => (r.getLong(0), r.getInt(1)))
    val native = df.select(QuantizerArgmin.argmin($"v", seeds).as("m"))
      .select($"m.d", $"m.cid").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(hof.sameElements(native))
    assert(native.forall(_._2 != 3), "ties must resolve to the lower cid")
  }

  test("vector_to_double: null input, null element, double pass-through") {
    import spark.implicits._
    val nullInput = Seq((0, null: Array[Float]))
      .toDF("k", "a").select(VectorOps.vectorToDouble($"a")).collect()
    assert(nullInput.head.isNullAt(0))
    val withNulls = Seq(Tuple1(Seq[java.lang.Float](1.5f, null)))
      .toDF("a").select(VectorOps.vectorToDouble($"a")).collect()
    assert(withNulls.head.getSeq[Any](0) == Seq(1.5d, null))
    val passThrough = Seq(Tuple1(Array(1.25, -2.5)))
      .toDF("a").select(VectorOps.vectorToDouble($"a")).collect()
    assert(passThrough.head.getSeq[Double](0) == Seq(1.25, -2.5))
  }
}
