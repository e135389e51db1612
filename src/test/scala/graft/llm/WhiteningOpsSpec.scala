package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q329 whitened-recall apply-side, q330 OPQ-style dim allocation —
  * naive driver-side replays on the harness corpus plus closed-form
  * planted fixtures (a perfectly-symmetric corpus where whitening is
  * provably a no-op for ranking; a first-subspace-only corpus where
  * round-robin allocation provably balances).
  */
class WhiteningOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def loadVecs(d: String): Array[(Long, Array[Double])] = {
    graft.Tables.load(spark, d, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
  }

  private def dotLR(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Spark/DuckDB ROUND is HALF_UP (away from zero) — math.round is
    * floor(x+0.5), which disagrees on exact NEGATIVE halves.
    */
  private def rnd(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Naive whitening replay with the engine's exact arithmetic:
    * integer per-dim stats, w = (round(x·1e6) − mean_e6)/√var_e12,
    * micro-rounded cosine with the 1e-300 norm floor.
    */
  private def naiveWhitened(vecs: Array[(Long, Array[Double])])
      : Map[Long, Seq[(Long, Long)]] = {
    val dim = vecs.head._2.length
    val n = vecs.length.toLong
    val stats = Array.tabulate(dim) { d =>
      val xs = vecs.map(v => rnd(v._2(d) * 1e6))
      val sx = xs.sum
      val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum
      val mean = rnd(sx.toDouble / n)
      val varE12 = rnd(
        (BigInt(n) * sxx - BigInt(sx) * BigInt(sx)).toDouble / (n.toDouble * n))
      (mean, varE12)
    }
    val w = vecs.map { case (id, v) =>
      id -> Array.tabulate(dim) { d =>
        val (m, va) = stats(d)
        if (va == 0L) 0.0
        else (rnd(v(d) * 1e6) - m) / math.sqrt(va.toDouble)
      }
    }
    val nrm = w.map { case (id, ww) => id -> math.sqrt(dotLR(ww, ww)) }.toMap
    val byId = w.toMap
    w.collect { case (qid, qw) if qid % 50 == 0 =>
      val sims = w.filter(_._1 != qid).map { case (nid, nv) =>
        (nid, rnd(dotLR(qw, nv) /
          math.max(nrm(qid) * nrm(nid), 1e-300) * 1e6))
      }
      qid -> sims.sortBy { case (nid, s) => (-s, nid) }.take(10).toSeq
    }.toMap
  }

  test("q329: overlap and whitened top-1 match the naive integer-exact replay") {
    val got = Similarity.q329_whitened_recall(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val rawTop = Similarity.q26_ann_topk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))) // (q_id, neighbor_id)
      .groupBy(_._1).map { case (q, g) => q -> g.map(_._2).toSet }
    graft.Caches.releaseAll()
    Similarity.releaseShared()
    val wtop = naiveWhitened(loadVecs(dir))
    assert(got.keySet == wtop.keySet && got.nonEmpty)
    wtop.foreach { case (q, top) =>
      val overlap = top.map(_._1).toSet.intersect(rawTop(q)).size.toLong
      val (t1, s1) = top.head
      assert(got(q) == ((overlap, t1, s1)), s"q_id $q: ${got(q)} vs naive")
    }
  }

  test("q329: a zero-mean equal-variance corpus keeps the exact ranking (overlap = k)") {
    import spark.implicits._
    val d = TestSpark.tempDir("white_fix")
    // 12 balanced ±0.5 sign patterns: every dim has mean exactly 0
    // across the corpus and identical variance, so whitening is a
    // uniform rescale — cosine, and therefore the top-k, is unchanged.
    val rows = (0L until 12L).map { j =>
      val v = Array.tabulate(64)(dd =>
        if ((dd + j) % 12 < 6) 0.5f else -0.5f)
      (j, v.toSeq, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = Similarity.q329_whitened_recall(spark, d).collect()
    graft.Caches.releaseAll()
    Similarity.releaseShared()
    assert(out.length == 1 && out.head.getLong(0) == 0L)
    assert(out.head.getLong(1) == 10L,
      s"whitening a symmetric corpus must keep all 10: ${out.head}")
  }

  test("q330: allocation sums match the naive replay on the harness corpus") {
    val got = Similarity.q330_opq_allocation(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    graft.Caches.releaseAll()
    val vecs = loadVecs(dir)
    val n = vecs.length.toLong
    val dim = vecs.head._2.length
    val vars = Array.tabulate(dim) { dd =>
      val xs = vecs.map(v => rnd(v._2(dd) * 1e6))
      val sx = xs.sum
      val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum
      rnd((BigInt(n) * sxx - BigInt(sx) * BigInt(sx)).toDouble
        / (n.toDouble * n))
    }
    val nat = vars.zipWithIndex.groupBy(_._2 / 8)
      .map { case (s, g) => s.toLong -> g.map(_._1).sum }
    val rr = vars.zipWithIndex.sortBy { case (v, i) => (-v, i) }
      .zipWithIndex.groupBy(_._2 % 8)
      .map { case (s, g) => s.toLong -> g.map(_._1._1).sum }
    assert(got.keySet == nat.keySet)
    got.foreach { case (s, (nv, rv)) =>
      assert(nv == nat(s) && rv == rr(s), s"subspace $s")
    }
  }

  /** Naive q331 replay: permutation from integer variance ranks,
    * q198's seeded codebook + micro-rounded expand-identity argmin
    * (ties to the lowest codeword id) on both dim orders.
    */
  private def naiveOpqApply(vecs: Array[(Long, Array[Double])])
      : (Map[Long, (Long, Long)], Map[Long, Long]) = {
    val dim = vecs.head._2.length
    val n = vecs.length.toLong
    val vars = Array.tabulate(dim) { dd =>
      val xs = vecs.map(v => rnd(v._2(dd) * 1e6))
      val sx = xs.sum
      val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum
      rnd((BigInt(n) * sxx - BigInt(sx) * BigInt(sx)).toDouble / (n.toDouble * n))
    }
    val ranked = vars.zipWithIndex.sortBy { case (v, i) => (-v, i) }.map(_._2)
    val perm = Array.tabulate(dim)(j => ranked((j % 8) * 8 + j / 8))
    def assignErr(vs: Array[(Long, Array[Double])]): Map[Long, (Long, Long)] = {
      val seeds = vs.filter(_._1 < 16).sortBy(_._1).map(_._2)
      (0 until 8).map { m =>
        var cnt = 0L; var err = 0L
        vs.foreach { case (_, v) =>
          val s = v.slice(m * 8, m * 8 + 8)
          val best = seeds.zipWithIndex.map { case (c, cid) =>
            val cs = c.slice(m * 8, m * 8 + 8)
            (rnd((dotLR(s, s) - 2.0 * dotLR(s, cs) + cs.map(x => x * x).sum) * 1e6), cid)
          }.min
          cnt += 1; err += best._1
        }
        m.toLong -> (cnt, err)
      }.toMap
    }
    val nat = assignErr(vecs)
    val rr = assignErr(vecs.map { case (id, v) => (id, perm.map(v)) })
    (nat, rr.map { case (m, (_, e)) => m -> e })
  }

  test("q331: per-subspace error mass matches the naive replay on the harness corpus") {
    val got = Similarity.q331_opq_reallocation(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    graft.Caches.releaseAll()
    val (nat, rr) = naiveOpqApply(loadVecs(dir))
    assert(got.keySet == nat.keySet)
    got.foreach { case (m, (nv, ne, re)) =>
      assert((nv, ne) == nat(m) && re == rr(m), s"subspace $m")
    }
  }

  test("q331: live dims confined to one subspace -> reallocation quantizes exactly (gain 10000 bp)") {
    import spark.implicits._
    val d = TestSpark.tempDir("opq_apply_fix")
    // 40 vectors; 8 live dims with ±0.5 period-24 shift patterns (24
    // distinct patterns, only 16 in the seed codebook -> natural
    // error > 0), dead dims 0. Round-robin puts ONE live dim per
    // subspace; every 1-live-dim slice matches a seed slice of the
    // same sign exactly -> reallocated error is exactly 0.
    val rows = (0L until 40L).map { j =>
      val v = Array.tabulate(64)(dd =>
        if (dd < 8) { if ((dd + j) % 24 < 12) 0.5f else -0.5f } else 0.0f)
      (j, v.toSeq, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = Similarity.q331_opq_reallocation(spark, d).collect()
    graft.Caches.releaseAll()
    assert(out.length == 8)
    out.foreach { r =>
      assert(r.getLong(3) == 0L, s"reallocated subspace must quantize exactly: $r")
      assert(r.getLong(4) == 10000L, s"total gain must be 10000 bp: $r")
    }
    assert(out.map(_.getLong(2)).sum > 0L, "natural split must have error")
  }

  test("q330: variance confined to the first natural subspace balances under round-robin") {
    import spark.implicits._
    val d = TestSpark.tempDir("opq_fix")
    val rows = (0L until 12L).map { j =>
      val v = Array.tabulate(64)(dd =>
        if (dd < 8) { if ((dd + j) % 12 < 6) 0.5f else -0.5f } else 0.0f)
      (j, v.toSeq, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = Similarity.q330_opq_allocation(spark, d).collect()
    graft.Caches.releaseAll()
    assert(out.length == 8)
    val rrVars = out.map(_.getLong(2)).toSet
    assert(rrVars.size == 1, s"round-robin must spread the 8 live dims one per subspace: ${out.mkString(",")}")
    out.foreach { r =>
      assert(r.isNullAt(3), "a zero-variance natural subspace has no defined imbalance")
      assert(r.getLong(4) == 10000L, "balanced allocation has max/min = 1")
    }
  }
}
