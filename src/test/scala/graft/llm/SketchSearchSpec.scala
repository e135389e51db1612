package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Fixture invariants for the quantized/sketch search operators
  * (q247 SQ8-ADC, q248 SRP rerank, q249 IVF probe sweep) beyond the
  * DuckDB oracle: a planted exact-duplicate vector must be recovered
  * through both compressed paths, and the probe sweep must trade
  * candidates for recall monotonically.
  */
class SketchSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** 100 deterministic vectors; vec 60 is an exact copy of the single
    * query (vec 0), so every search path must surface it at rank 1.
    */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val tmp = TestSpark.tempDir("sketch_planted")
    val rnd = new scala.util.Random(7)
    val base = (0 until 100).map { id =>
      (id.toLong, Array.fill(64)(rnd.nextFloat() * 2f - 1f), id % 5)
    }
    val rows = base.map { case (id, v, lab) =>
      if (id == 60L) (id, base(0)._2.toSeq, lab) else (id, v.toSeq, lab)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  test("sq8 adc: planted duplicate recovered; 8-bit ranking near-lossless") {
    val rows = Similarity.q247_sq8_adc_recall(spark, plantedDir).collect()
    assert(rows.length == 2, "queries are vec 0 and vec 50")
    val q0 = rows.find(_.getLong(0) == 0L).get
    // the exact copy plus most of the true neighborhood survive 8-bit codes
    assert(q0.getLong(1) >= 5L, s"recall@10 too low for SQ8: ${q0.getLong(1)}")
    assert(rows.forall(r => r.getLong(2) == r.getLong(1) * 1000L))
  }

  test("srp rerank: Hamming-0 planted duplicate is always a candidate and reranks into top-k") {
    val rows = Similarity.q248_srp_rerank(spark, plantedDir).collect()
    val q0 = rows.find(_.getLong(0) == 0L).get
    // identical vector ⇒ identical sketch ⇒ Hamming 0 ⇒ candidate rank 1
    // ⇒ exact rerank puts it at similarity 1.0, so overlap ≥ 1 always
    assert(q0.getLong(1) >= 1L, "planted duplicate lost by the sketch path")
  }

  test("ivf probe sweep: candidates grow with nprobe and recall never degrades end-to-end") {
    val rows = Similarity.q249_ivf_probe_sweep(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L))
    val cands = rows.map(_.getLong(3))
    assert(cands.zip(cands.tail).forall { case (a, b) => a < b },
      s"candidate volume must grow strictly with nprobe: ${cands.toSeq}")
    val recalls = rows.map(_.getLong(2))
    assert(recalls.last >= recalls.head,
      s"probing 8 lists must not recall less than probing 1: ${recalls.toSeq}")
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("q278 anisotropy: a single-axis cloud puts 100% of variance on the top component") {
    import spark.implicits._
    // every vector lies on dimension 0 with varying magnitude: the
    // covariance has exactly one nonzero cell, so the power iteration
    // must report top_share_micro = 1e6 exactly.
    val rows = (0 until 40).map { i =>
      val v = new Array[Float](64)
      v(0) = 0.1f * (i + 1)
      (i.toLong, v, 0)
    }
    val tmp = TestSpark.tempDir("aniso_axis")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val r = Similarity.q278_anisotropy(spark, tmp).collect()(0)
    assert(r.getLong(0) == 40L)
    assert(r.getLong(2) == 1000000L, s"top_share_micro=${r.getLong(2)}")
  }
}
