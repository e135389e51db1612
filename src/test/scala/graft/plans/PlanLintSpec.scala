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
    val allowed: Map[String, Set[String]] = Map(
      "q26_ann_topk" -> Set("cartesian-product"),
      // q199 is q26's query-batch-attach shape over the 32×-compressed
      // PQ codes (self-exclusion predicate in the BNLJ condition)
      "q199_pq_adc_topk" -> Set("cartesian-product"),
      "q42_mixture_rates" -> Set("cartesian-product"),
      // la < lb over two ≤|langs| register tables — a bounded grid
      "q120_hll_set_algebra" -> Set("cartesian-product"),
      // anchors × the broadcast |sources|-row size table (S tiny by
      // construction) with the ≠-source exclusion in the BNLJ
      // condition — the rank-indexed sampler's only non-equi join
      "q122_negative_sampling" -> Set("cartesian-product"),
      "q83_ntile_dist" -> Set("single-partition-window"),
      // q83's global-NTILE-on-bounded-aggregate form + 10-row cum table
      "q159_lift_curve" -> Set("single-partition-window"),
      "q126_backlog" -> Set("single-partition-window"),
      "q129_cumulative_reach" -> Set("single-partition-window"),
      "q133_rfm_segments" -> Set("single-partition-window"),
      "q135_ks_drift" -> Set("single-partition-window"),
      // rank window runs on the ≤10001-row distinct-score table
      "q250_mann_whitney" -> Set("single-partition-window"),
      // cumulative/rank windows run on the calendar-bounded daily
      // table; the BNLJ is the 1-row (n, s) totals broadcast attach
      "q252_changepoint" ->
        Set("single-partition-window", "cartesian-product"),
      // PAVA min-max grid: non-equi joins + cum window over the ≤51-row
      // quality-bin table — 51³ worst case, constant in corpus size
      "q253_isotonic_calibration" ->
        Set("cartesian-product", "single-partition-window"),
      // global day-index/rank windows + 1-row/7-row broadcast attaches,
      // all over calendar-bounded daily tables
      "q257_acf" -> Set("single-partition-window", "cartesian-product"),
      "q258_theil_sen" ->
        Set("single-partition-window", "cartesian-product"),
      // same calendar-bounded daily-table family as q257/q258
      "q268_cusum" -> Set("single-partition-window", "cartesian-product"),
      "q269_mann_kendall" ->
        Set("single-partition-window", "cartesian-product"),
      "q270_seasonal_dow" -> Set("single-partition-window"),
      // cumulative window + 1-row meta broadcasts over the
      // max-multiplicity-bounded freq-of-freq histogram
      "q271_skew_planner" ->
        Set("single-partition-window", "cartesian-product"),
      // 1-row totals/actual broadcast attaches
      "q272_join_card_audit" -> Set("cartesian-product"),
      // 1-row/64-row broadcast attaches in the fixed-cost power
      // iteration over the 4096-cell covariance table
      "q278_anisotropy" -> Set("cartesian-product"),
      // cum/lead windows over the bounded score domain + 1-row totals
      "q279_wasserstein" ->
        Set("single-partition-window", "cartesian-product"),
      "q136_survival" -> Set("single-partition-window"),
      // water-filling windows run on the |sources|-bounded aggregate
      "q192_budget_waterfill" -> Set("single-partition-window"),
      // RRF ranks two RrfDepth(=50)-row lists — both inputs go through
      // TakeOrdered limits BEFORE the rank windows, so the global
      // window only ever sees a bounded frame
      "q200_rrf_fusion" -> Set("single-partition-window"),
      // the epoch allocator's prefix-sum window runs on the
      // |sources|-row aggregate (q192's waterfill family), and q230
      // expands the same bounded frame
      "q215_repeat_epochs" -> Set("single-partition-window"),
      "q230_epoch_schedule" -> Set("single-partition-window"),
      // Heaps' law cumulates over the 10-row checkpoint table
      "q231_heaps_law" -> Set("single-partition-window"),
      // q222/q237 are q26-derived (hubness / probe re-aggregations of
      // the exact top-k): the self-exclusion predicate rides q26's
      // conditioned broadcast
      "q222_ann_hubness" -> Set("cartesian-product"),
      "q237_knn_probe" -> Set("cartesian-product"),
      // q247/q248 are q26's broadcast-query-batch exact-scan shape over
      // the SQ8-reconstructed corpus / 8-byte SRP sketches; q249's
      // recall denominator IS the q26 plan itself
      "q247_sq8_adc_recall" -> Set("cartesian-product"),
      "q248_srp_rerank" -> Set("cartesian-product"),
      "q249_ivf_probe_sweep" -> Set("cartesian-product"),
      // q240 attaches the 1-row median via crossJoin(broadcast) with
      // the rare-threshold predicate in the BNLJ condition — q42's
      // scalar-attach exception
      "q240_rare_token_retention" -> Set("cartesian-product"),
      // q281 is q26's conditioned broadcast-query-batch exact scan (the
      // demo ground truth for hard-negative mining; ANN candidates feed
      // the same conditional-max tail at scale)
      "q281_hard_negatives" -> Set("cartesian-product"),
      // q288 is the KNN-Shapley valuation over q26's conditioned
      // broadcast-query-batch scan (the probe batch is the bounded
      // side; the corpus is never self-joined)
      "q288_knn_shapley" -> Set("cartesian-product"),
      // q293 runs q26's shape once per matryoshka dim (3 sliced scans)
      "q293_matryoshka_recall" -> Set("cartesian-product"),
      // q299's cumulative/total windows run over the bounded length-
      // histogram (≤ max_chars/50 rows by construction)
      "q299_dp_quantile" -> Set("single-partition-window"),
      // q300 is q26's conditioned broadcast with both sides
      // pre-exploded into sub-vectors (the late-interaction scan)
      "q300_maxsim_retrieval" -> Set("cartesian-product"),
      // q301's windows/self-join run over the two LIMIT-50 run lists
      // (≤ 50 rows by construction); the doc_id< pair condition over
      // the 50-row broadcast is the bounded grid, not a corpus product
      "q301_rank_correlation" ->
        Set("cartesian-product", "single-partition-window"),
      // q305's cumulative sweep runs over the ≤10 001-row distinct-
      // score histogram — bounded by the basis-point range, not data
      "q305_threshold_opt" -> Set("single-partition-window"),
      // q308 fans each ranked row out against the 11-row decile
      // literal with the rank-selection predicate in the BNLJ
      // condition — a bounded ×11 attach, not a corpus product
      "q308_source_quantiles" -> Set("cartesian-product"))
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
