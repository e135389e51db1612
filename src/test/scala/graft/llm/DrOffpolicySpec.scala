package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q336 doubly-robust off-policy estimate — planted perfect-model and
  * missing-model-half fixtures plus the naive replay on sf0.001.
  */
class DrOffpolicySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The shared quality gate, naively (CalibrationOpsSpec convention). */
  private def gate(nChars: Long, text: String): Long = {
    val toks = text.split(" ", -1)
    val ok = nChars >= 200L && nChars <= 450L &&
      toks.distinct.length.toLong * 100L >= toks.length.toLong * 40L
    if (ok) 1L else 0L
  }

  /** Naive replay of the whole estimator from (doc_id, source, pass). */
  private def naive(docs: Seq[(Long, String, Long)])
      : (Map[String, (Long, Option[Long], Long, Long, Option[Long])], (Long, Long, Long, Long)) = {
    val arms = docs.groupBy(_._2).map { case (s, g) =>
      val (m, e) = g.partition(_._1 % 2 == 0)
      s -> (m.length.toLong, m.map(_._3).sum, e.length.toLong, e.map(_._3).sum)
    }
    val qhat = arms.map { case (s, (nm, xm, _, _)) =>
      s -> (if (nm == 0) None else Some(math.round(1e6 * xm / nm)))
    }
    val nn = arms.values.map(_._3).sum
    val ns = arms.size.toLong
    val w = arms.map { case (s, (_, _, ne, _)) =>
      s -> (if (ne == 0) None
        else Some(math.min(math.round(1e6 * nn.toDouble / (ns * ne)), 10000000L)))
    }
    val q0 = qhat.map { case (s, q) => s -> q.getOrElse(0L) }
    val sq = q0.values.sum
    val sc = arms.map { case (s, (_, _, ne, xe)) =>
      if (ne == 0) BigInt(0)
      else BigInt(w(s).get) * (BigInt(xe) * 1000000 - BigInt(ne) * q0(s))
    }.sum
    val sx = arms.map { case (s, (_, _, ne, xe)) =>
      if (ne == 0) BigInt(0) else BigInt(w(s).get) * xe
    }.sum
    val dm = math.round(sq.toDouble / ns)
    val corr = math.round(sc.toDouble / (1e6 * nn))
    val ips = math.round(sx.toDouble / nn)
    val perArm = arms.map { case (s, (nm, _, ne, xe)) =>
      s -> (nm, qhat(s), ne, xe, w(s))
    }
    (perArm, (dm, corr, dm + corr, ips))
  }

  private def run(dir: String) =
    DataPrep.q336_doubly_robust(spark, dir).collect().map { r =>
      (r.getString(0), ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)): Option[Long],
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)): Option[Long]),
        (r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9))))
    }

  private val passText = (0 until 40).map(i => s"w$i").mkString(" ")

  test("q336 planted: a perfect direct model zeroes the correction - DR = DM = IPS exactly") {
    import spark.implicits._
    // per source, model and eval halves have IDENTICAL pass rates:
    // srcA 2/4 in both halves, srcB 1/4 in both halves
    def doc(id: Long, src: String, pass: Boolean) =
      (id, src, if (pass) passText else "x y", if (pass) 300L else 50L, "en")
    val docs =
      (0 until 8).map(i => doc(i.toLong, "srcA", (i / 2) % 2 == 0)) ++
        (8 until 16).map(i => doc(i.toLong, "srcB", i % 8 < 2))
    val tmp = TestSpark.tempDir("dr_perfect")
    docs.toDF("doc_id", "source", "text", "n_chars", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = run(tmp).toMap
    graft.Caches.releaseAll()
    val (_, (dm, corr, dr, ips)) =
      naive(docs.map(d => (d._1, d._2, gate(d._4, d._3))))
    assert(corr == 0L, s"perfect model must zero the correction: $corr")
    assert(dm == 375000L && dr == 375000L && ips == 375000L)
    got.values.foreach { case (_, tots) => assert(tots == ((dm, corr, dr, ips))) }
    assert(got("srcA")._1._2.contains(500000L) && got("srcB")._1._2.contains(250000L))
  }

  test("q336 planted: a source missing the model half degrades to pure IPS for that arm") {
    import spark.implicits._
    val docs =
      (0 until 8).map(i => (i.toLong, "srcA", passText, 300L, "en")) ++
        // srcC: only odd doc_ids — no model half, eval 2/4 pass
        Seq(17L, 19L, 21L, 23L).zipWithIndex.map { case (id, i) =>
          (id, "srcC", if (i < 2) passText else "x y",
            if (i < 2) 300L else 50L, "en")
        }
    val tmp = TestSpark.tempDir("dr_missing")
    docs.toDF("doc_id", "source", "text", "n_chars", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = run(tmp).toMap
    graft.Caches.releaseAll()
    val (perArm, tots) = naive(docs.map(d => (d._1, d._2, gate(d._4, d._3))))
    assert(got.view.mapValues(_._1).toMap == perArm)
    assert(got("srcC")._1._2.isEmpty, "missing model half must report NULL qhat")
    got.values.foreach { case (_, t) => assert(t == tots) }
  }

  test("q336: totals and per-arm stats match the naive replay on the harness corpus") {
    val dir = "/root/testdata/sf0.001"
    val got = run(dir).toMap
    graft.Caches.releaseAll()
    val docs = graft.Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "source", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), gate(r.getLong(2), r.getString(3))))
    val (perArm, tots) = naive(docs.map(d => (d._1, d._2, d._3)))
    assert(got.view.mapValues(_._1).toMap == perArm)
    got.values.foreach { case (_, t) => assert(t == tots) }
  }
}
