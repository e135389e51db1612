package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TemporalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("interval join equals the naive theta join") {
    import spark.implicits._
    val fast = Temporal.q60_interval_join(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // naive: plain range-predicate join, no bucketing
    val ev = graft.Tables.load(spark, dir, "events")
      .select($"event_id", $"user_id", $"event_type",
        unix_timestamp(date_trunc("second", $"ts")).as("ts_s"),
        graft.Tables.cents($"value").as("v_cents"))
    val inc = ev.filter($"event_type" === "error")
      .orderBy($"v_cents".desc, $"event_id").limit(Temporal.Incidents)
      .select($"event_id".as("incident_id"),
        ($"ts_s" - Temporal.WindowS).as("lo"), ($"ts_s" + Temporal.WindowS).as("hi"))
    val naive = ev.join(inc, $"ts_s" >= $"lo" && $"ts_s" <= $"hi")
      .groupBy($"incident_id")
      .agg(count(lit(1)).as("n_events"), countDistinct($"user_id").as("n_users"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(fast == naive)
  }

  test("q252: planted level shift splits at the exact boundary with exact means and gain") {
    import spark.implicits._
    // 10 days at 5 events/day, then 10 days at 50/day ⇒ the SSE-optimal
    // single split is the rate boundary; gain has a closed form:
    // 50²/10 + 500²/10 − 550²/20 = 10125.
    val rows = (for {
      day <- 0 until 20
      i <- 0 until (if (day < 10) 5 else 50)
    } yield (day.toLong * 100 + i,
      java.sql.Timestamp.valueOf(f"2024-03-${day + 1}%02d 12:00:${i % 60}%02d"))).toSeq
    val tmp = TestSpark.tempDir("cpt_shift")
    rows.toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Temporal.q252_changepoint(spark, tmp).collect()(0)
    assert(r.getDate(0).toString == "2024-03-10", s"split_day=${r.getDate(0)}")
    assert(r.getLong(1) == 10L && r.getLong(2) == 10L)
    assert(r.getLong(3) == 5000L, s"mean_left_milli=${r.getLong(3)}")
    assert(r.getLong(4) == 50000L, s"mean_right_milli=${r.getLong(4)}")
    assert(r.getLong(5) == 10125000L, s"gain_milli=${r.getLong(5)}")
  }

  test("interval join broadcasts the exploded incident buckets — fact side unshuffled before the agg") {
    val plan = Temporal.q60_interval_join(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.toLowerCase.contains("cartesian"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("SCD2 intervals are disjoint: every purchase matches at most one version") {
    import spark.implicits._
    val out = Temporal.q61_scd2_pit(spark, dir)
    val dups = out.groupBy($"event_id").count().filter($"count" > 1).count()
    assert(dups == 0)
    assert(out.count() > 0)
  }

  test("point-in-time state matches a driver-side recompute") {
    import spark.implicits._
    val ev = graft.Tables.load(spark, dir, "events")
      .select($"event_id", $"user_id", $"event_type",
        unix_timestamp(date_trunc("second", $"ts")).as("ts_s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val markers = ev.filter(e => e._3 == "signup" || e._3 == "error")
      .groupBy(_._2).map { case (u, ms) => u -> ms.sortBy(m => (m._4, m._1)) }
    val expected = ev.filter(_._3 == "purchase").flatMap { case (id, u, _, ts) =>
      markers.getOrElse(u, Array.empty[(Long, Long, String, Long)])
        .takeWhile(_._4 <= ts).lastOption
        .filter(_._4 <= ts) // state active at ts (from <= ts, next from > ts)
        .map(m => (id, u, m._3, m._4))
    }.toSeq.sorted
    val got = Temporal.q61_scd2_pit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq.sorted
    assert(got == expected)
  }

  test("overlap audit matches a per-supplier linear sweep (running max, not lag)") {
    import spark.implicits._
    // naive recompute: per supplier, sort intervals, track max end seen
    val iv = graft.Tables.load(spark, dir, "lineitem")
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        unix_timestamp(date_trunc("day", $"l_shipdate")).as("d0"))
      .withColumn("d1", $"d0" + ($"l_linenumber" % 14 + 1) * 86400L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    val perSupp = iv.groupBy(_._1).map { case (s, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._5, r._2, r._3))
      var maxEnd = Long.MinValue
      var nOv = 0L; var nGap = 0L; var ovS = 0L; var maxGapS = 0L
      sorted.foreach { case (_, _, _, d0, d1) =>
        if (maxEnd != Long.MinValue) {
          if (maxEnd > d0) { nOv += 1; ovS += maxEnd - d0 }
          else if (maxEnd < d0) { nGap += 1; maxGapS = math.max(maxGapS, d0 - maxEnd) }
        }
        maxEnd = math.max(maxEnd, d1)
      }
      s -> (rows.size.toLong, nOv, nGap, ovS, maxGapS)
    }
    val nationOf = graft.Tables.load(spark, dir, "supplier")
      .join(graft.Tables.load(spark, dir, "nation"),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val expected = perSupp.toSeq.groupBy(kv => nationOf(kv._1)).map {
      case (n, ss) =>
        val v = ss.map(_._2)
        (n, v.map(_._1).sum, v.map(_._2).sum, v.map(_._3).sum,
          v.map(_._4).sum / 86400L, v.map(_._5).max / 86400L)
    }.toSeq.sortBy(_._1)
    val got = Temporal.q148_overlap_audit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
  }

  test("CDC apply: census partitions the key universe; tombstones for unknown keys are no-ops") {
    import spark.implicits._
    val rows = Temporal.q152_cdc_apply(spark, dir).collect()
    val bySeg = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // every base key is exactly one of kept/updated/deleted
    val baseCounts = graft.Tables.load(spark, dir, "customer")
      .groupBy($"c_mktsegment").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    baseCounts.foreach { case (seg, n) =>
      val (nKeys, kept, upd, ins, del, noop) = bySeg(seg)
      assert(kept + upd + del == n, s"$seg census leaks base keys")
      assert(ins == 0 && noop == 0, s"$seg: inserts/noops must land in NEW")
      assert(nKeys == n)
    }
    // NEW holds only inserts and no-op deletes (keys outside the base)
    val (nNew, keptNew, updNew, insNew, delNew, noopNew) = bySeg("NEW")
    assert(keptNew == 0 && updNew == 0 && delNew == 0)
    assert(insNew > 0, "the re-keyed feed rows must exercise the insert path")
    assert(nNew == insNew + noopNew)
  }

  test("FIFO matching conserves quantity: matched per part = min(receipts, issues)") {
    import spark.implicits._
    // defining property of the cumulative-interval trick: the overlap
    // pieces tile [0, min(total_R, total_A)) exactly, once, per part
    val li = graft.Tables.load(spark, dir, "lineitem")
      .groupBy($"l_partkey")
      .agg(sum(when($"l_returnflag" === "R", $"l_quantity".cast("long"))
          .otherwise(0L)).as("r"),
        sum(when($"l_returnflag" === "A", $"l_quantity".cast("long"))
          .otherwise(0L)).as("a"))
      .collect().map(x => (x.getLong(0), math.min(x.getLong(1), x.getLong(2))))
    val brandOf = graft.Tables.load(spark, dir, "part")
      .select($"p_partkey", $"p_brand")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val expected = li.groupBy(x => brandOf(x._1)).map { case (b, xs) =>
      (b, xs.map(_._2).sum)
    }
    val got = Temporal.q170_fifo_match(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    expected.filter(_._2 > 0).foreach { case (b, q) =>
      assert(got.getOrElse(b, 0L) == q, s"brand $b: matched ${got.get(b)} vs min-total $q")
    }
  }
}
