package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PlanLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("flags a non-equi join fallback; tolerates crossJoin(broadcast(tiny))") {
    import spark.implicits._
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(4, 5).toDF("y")
    // non-equi predicate → BroadcastNestedLoopJoin WITH a condition
    val fallback = PlanLint.lint(a.join(b, $"x" < $"y"))
    assert(fallback.exists(_.rule == "cartesian-product"), fallback)
    // the idiomatic bounded cross join is accepted
    assert(PlanLint.lint(a.crossJoin(broadcast(b))).isEmpty)
  }

  test("flags the global Window.orderBy single-partition funnel") {
    import spark.implicits._
    val df = graft.Tables.load(spark, dir, "events")
      .withColumn("rk", row_number().over(Window.orderBy($"event_id")))
    val findings = PlanLint.lint(df)
    assert(findings.exists(_.rule == "single-partition-window"), findings)
  }

  test("flags a scan reading every column for a narrow result") {
    import spark.implicits._
    // defeat column pruning by forcing a full-width intermediate
    val li = graft.Tables.load(spark, dir, "lineitem")
    val wide = li.withColumn("all", to_json(struct(li.columns.map(col): _*)))
      .filter(length($"all") > 0)
      .select($"l_orderkey")
    val findings = PlanLint.lint(wide)
    assert(findings.exists(_.rule == "unpruned-wide-scan"), findings)
  }

  test("flags a window partitioned by a low-cardinality key; tolerates bounded inputs and the two-phase rewrite") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    // the OLD q45 form: per-lang prefix-sum window — a handful of
    // langs each funneling their full doc set through one task
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val funnel = docs
      .select($"doc_id", $"lang", size(split($"text", " ")).cast("long").as("toks"))
      .withColumn("cum0", coalesce(sum($"toks").over(w), lit(0L)))
    val findings = PlanLint.lintGroupedWindows(funnel, minRowsPerGroup = 50)
    assert(findings.exists(_.rule == "low-cardinality-partition-window"), findings)
    // a window over a PRE-BOUNDED aggregate (tiny input) is fine
    val bounded = docs.groupBy($"lang").agg(sum(length($"text")).as("x"))
      .withColumn("rk", row_number().over(Window.partitionBy($"lang").orderBy($"x")))
    assert(PlanLint.lintGroupedWindows(bounded, minRowsPerGroup = 50).isEmpty)
    // the shipped two-phase rewrite has no grouped window at all
    assert(PlanLint.lintGroupedWindows(
      graft.llm.DataPrep.shardAssignments(docs), minRowsPerGroup = 50).isEmpty)
    assert(PlanLint.lintGroupedWindows(
      graft.llm.DataPrep.q122_negative_sampling(spark, "/root/testdata/sf0.01"),
      minRowsPerGroup = 50).isEmpty)
  }

  test("shipped queries lint clean (representative sample)") {
    val clean = Seq(
      graft.queries.Relational.q03_join_broadcast(spark, dir),
      graft.queries.Analytics.q08_window_latest(spark, dir),
      graft.queries.Analytics.q90_group_sample(spark, dir),
      graft.queries.SqlSurface.q92_skyline(spark, dir),
      graft.queries.Graph.q87_pagerank(spark, dir))
    clean.foreach { df =>
      val findings = PlanLint.lint(df)
      graft.Caches.releaseAll()
      assert(findings.isEmpty, findings)
    }
  }

  /** Every registered query's plan walks through the linter. Flags
    * are allowed only where the operator documents them BY DESIGN:
    * the conditioned-broadcast baselines (q26's brute-force cosine
    * and its derivatives, q42's exclusion predicate), and the
    * global-window-over-a-pre-bounded-aggregate family (inputs are
    * ≤ hundreds of rows by construction; q76 is the escape hatch
    * when they are not). A new query that introduces a cartesian
    * product or a single-partition funnel fails here, not at 100 TB.
    */
  test("ALL shipped queries lint clean of scale anti-patterns (documented exceptions only)") {
    val allowed = PlanLint.shippedAllowlist
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val findings =
          try PlanLint.lint(fn(spark, dir))
          finally graft.Caches.releaseAll()
        findings.filterNot(f => allowed.getOrElse(name, Set.empty).contains(f.rule))
          .map(f => s"$name: ${f.rule} (${f.node})")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
