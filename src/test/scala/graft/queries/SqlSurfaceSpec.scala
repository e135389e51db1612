package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The SqlSurface family's oracles check values; these specs pin the
  * PLAN properties each query exists to demonstrate: subquery
  * decorrelation into joins, the Expand-based (shuffle-free) melt,
  * and the skyline's window form actually dominating the naive
  * quadratic join (same answer, no nested-loop join in the plan).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q84: EXISTS + scalar subquery decorrelate into joins (no subquery at exec)") {
    val qe = SqlSurface.q84_exists_subquery(spark, dir).queryExecution
    val plan = qe.executedPlan.toString
    // decorrelated: semi/outer joins on the customer key, no
    // per-row subquery execution nodes survive optimization
    assert(plan.contains("Join") || plan.contains("join"), plan.take(800))
    assert(!qe.optimizedPlan.toString.contains("correlated"), plan.take(800))
  }

  test("q85: unpivot plans as Expand over the aggregate, no extra shuffle") {
    val qe = SqlSurface.q85_unpivot(spark, dir).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("Expand"), plan.take(800))
    // exactly two exchanges: the groupBy shuffle + the output sort;
    // the melt itself must not add one
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <=2 exchanges, plan:\n${plan.take(1200)}")
  }

  test("q92: two-phase range-partitioned skyline equals the quadratic NOT EXISTS answer") {
    import spark.implicits._
    val got = SqlSurface.q92_skyline(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val p = graft.Tables.load(spark, dir, "part")
      .select($"p_partkey", graft.Tables.cents($"p_retailprice").as("pc"),
        $"p_size".cast("long").as("sz"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val naive = p.filter { case (_, pc, sz) =>
      !p.exists { case (_, pc2, sz2) =>
        pc2 <= pc && sz2 >= sz && (pc2 < pc || sz2 > sz)
      }
    }.sortBy(t => (t._2, t._1))
    assert(got == naive)
  }

  test("q83: deciles are contiguous and ranks cover (0, 10000]") {
    val rows = SqlSurface.q83_ntile_dist(spark, dir).collect()
    val deciles = rows.map(_.getLong(2)).distinct.sorted
    assert(deciles.head == 1L && deciles.last <= 10L)
    val cd = rows.map(_.getLong(4))
    assert(cd.max == 10000L && cd.min > 0L)
  }

  test("q147: proration conserves every order's total and stays within 1 cent of the exact share") {
    import spark.implicits._
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber",
        graft.Tables.cents($"l_extendedprice").as("ext_c"))
    val o = graft.Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_orderpriority",
        graft.Tables.cents($"o_totalprice").as("tot_c"))
    val items = SqlSurface.prorate(li.join(o, $"l_orderkey" === $"o_orderkey"))
      .select($"l_orderkey", $"tot_c", $"ext_c", $"sum_ext", $"alloc")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // exact conservation per order
    items.groupBy(_._1).foreach { case (ok, rows) =>
      assert(rows.map(_._5).sum == rows.head._2, s"order $ok leaks cents")
    }
    // per-item error bound: |alloc − tot·ext/Σext| < 1 cent
    items.foreach { case (ok, tot, ext, sumExt, alloc) =>
      val exact = tot.toDouble * ext / sumExt
      assert(math.abs(alloc - exact) < 1.0 + 1e-9, s"order $ok item off by ≥1c")
    }
    // aggregate audit agrees: zero mismatching orders
    val audit = SqlSurface.q147_proration(spark, dir).collect()
    assert(audit.nonEmpty && audit.forall(_.getAs[Long]("n_mismatch") == 0L))
    assert(audit.forall(r => r.getAs[Long]("alloc_c") == r.getAs[Long]("tot_c")))
  }

  test("q160: IGNORE NULLS navigation matches a driver recompute; NTH_VALUE counts null rows") {
    import spark.implicits._
    val ev = graft.Tables.load(spark, dir, "events")
      .select($"user_id", $"event_id", unix_timestamp($"ts").as("t"),
        when($"value" >= 30, graft.Tables.cents($"value")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val expected = ev.groupBy(_._1).map { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2)).map(_._4)
      (u, ordered.flatten.headOption, ordered.flatten.lastOption,
        if (ordered.length >= 2) ordered(1) else None)
    }.toSeq.sortBy(_._1)
    val got = SqlSurface.q160_value_navigation(spark, dir).collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      (r.getLong(0), opt(1), opt(2), opt(3))
    }.toSeq
    assert(got == expected)
    // the semantics contrast must actually occur in the data: some user
    // whose second ROW is null but whose first non-null exists
    assert(got.exists(r => r._4.isEmpty && r._2.nonEmpty),
      "need a row where RESPECT NULLS and IGNORE NULLS disagree")
  }

  test("q166: recursive clamped balance matches a per-customer linear fold") {
    import spark.implicits._
    val orders = graft.Tables.load(spark, dir, "orders")
      .select($"o_custkey", unix_timestamp($"o_orderdate").as("od"), $"o_orderkey",
        when($"o_orderstatus" === "O", graft.Tables.cents($"o_totalprice"))
          .otherwise(-graft.Tables.cents($"o_totalprice")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = orders.groupBy(_._1).map { case (k, rows) =>
      val deltas = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val (bal, clamps) = deltas.foldLeft((0L, 0L)) {
        case ((b, c), d) =>
          val nb = b + d
          if (nb < 0) (0L, c + 1) else (nb, c)
      }
      (k, deltas.length.toLong, bal, clamps)
    }.toSeq.sortBy(_._1)
    val got = SqlSurface.q166_clamped_balance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.forall(_._3 >= 0L), "clamp invariant: balance never negative")
    assert(got.exists(_._4 > 0L), "the clamp must actually fire somewhere")
    // the associative-fold scale path computes the identical answer
    val fold = SqlSurface.q169_clamped_balance_fold(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(fold == expected, "q169 fold must equal the recursion")
  }
}
