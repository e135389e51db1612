package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guards: the scale properties the 100 TB design depends
  * on, asserted on executed plans so refactors can't silently regress
  * them (a correct-but-cartesian plan passes every value check).
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("LSH dedup and near-dup candidate generation never plan a cartesian product") {
    for (q <- Seq("q23_minhash_dedup", "q203_incremental_dedup", "q24_simhash_dedup",
        "q30_embedding_neardup", "q73_prefix_jaccard", "q80_spatial_join")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
    }
  }

  test("brute-force ANN broadcasts the query batch, not the corpus") {
    val p = plan("q26_ann_topk")
    assert(p.contains("Broadcast"), "query batch must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("multi-join spine broadcasts every dimension and prunes+pushes the fact scan") {
    val p = plan("q04_join_multi")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, "dims must broadcast-hash-join")
    assert(!p.contains("SortMergeJoin"), "no dim should shuffle at this size")
    val lineitemScan = p.linesIterator.find(l => l.contains("lineitem") && l.contains("ReadSchema")).get
    assert(!lineitemScan.contains("l_comment") && !lineitemScan.contains("l_shipmode"),
      "column pruning must reach the fact scan")
    assert(p.contains("PushedFilters: [IsNotNull"), "filters must push to parquet")
  }

  test("top-k plans TakeOrderedAndProject, not a full sort") {
    assert(plan("q07_topk").contains("TakeOrderedAndProject"))
  }

  test("watermark subquery side pushes its filters to the parquet scan") {
    // assert membership, not exact-list equality: the harness testdata
    // has shipped `ts` both as nanos-as-long (where the > predicate
    // can't push — derived column) and as native timestamp_ntz (where
    // Spark ALSO pushes the ts range). Extra pushdown is a win, so the
    // check is: each required filter appears in SOME scan's
    // PushedFilters, order-free.
    val p = plan("q12_incremental_watermark")
    val scans = p.linesIterator.filter(_.contains("PushedFilters: [")).toSeq
    for (f <- Seq("IsNotNull(event_type)", "IsNotNull(ts)", "EqualTo(event_type,signup)"))
      assert(scans.exists(_.contains(f)),
        s"$f missing from every scan's PushedFilters:\n${scans.mkString("\n")}")
  }

  test("containment and tfidf candidate generation never plan a cartesian product") {
    val pc = plan("q55_containment")
    assert(!pc.contains("CartesianProduct"), "containment plans a data cartesian")
    assert(!pc.contains("BroadcastNestedLoopJoin"), "containment plans a nested-loop join")
    val pt = plan("q53_tfidf_keywords")
    assert(!pt.contains("CartesianProductExec"), "tfidf plans a data cartesian")
    // the corpus-size scalar rides in as a 1-row broadcast (the only
    // permissible nested-loop join: its build side is a single row)
    assert(pt.contains("Broadcast"))
    graft.Caches.releaseAll()
  }

  test("q66 bucketed join shuffles only at the final aggregate, never for the join") {
    val p = plan("q66_bucketed_join")
    assert(p.contains("SortMergeJoin"), "bucketed layout must carry a sort-merge join")
    // both join inputs read co-located buckets; the one hash exchange
    // in the plan is the post-join okey_mod aggregate
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"join inputs must not shuffle, plan:\n${p.take(2000)}")
  }

  test("token chunking is a pure fan-out: no shuffle before the final sort") {
    val p = plan("q54_token_chunks")
    assert(!p.contains("hashpartitioning"),
      "per-row posexplode must not shuffle the corpus")
    val scan = p.linesIterator.find(l => l.contains("documents") && l.contains("ReadSchema")).get
    assert(!scan.contains("lang") && !scan.contains("source"),
      "chunking reads doc_id+text only — other columns must prune out")
  }

  test("stratified sampling is a map-side filter: no shuffle before the final sort") {
    val p = plan("q41_stratified_sample")
    assert(!p.contains("hashpartitioning"),
      "the hash-threshold filter must not shuffle the corpus")
    assert(!p.contains("CartesianProduct"))
    val scan = p.linesIterator.find(l => l.contains("documents") && l.contains("ReadSchema")).get
    assert(!scan.contains("text"),
      "sampling decides on doc_id+lang only — the text column must prune out of the scan")
  }

  test("contamination and mixture join via broadcast, never cartesian") {
    for (q <- Seq("q42_mixture_rates", "q44_contamination", "q46_embedding_outliers")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q must broadcast the small side")
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("SortMergeJoin"), s"$q shuffles a side that should broadcast")
      // q42 attaches a 1-row global aggregate via crossJoin(broadcast) —
      // that BroadcastNestedLoopJoin with a single-row build side IS the
      // idiomatic scalar-attach plan; any other NLJ is a bug.
      if (q != "q42_mixture_rates")
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
    }
  }

  test("shard packing rides the two-phase range scan — no per-lang window funnel") {
    // q45's prefix sum is groupedPrefixSum (DataPrep.scala): range-
    // partition on (lang, doc_id) so languages SPAN partitions, fold
    // per-partition subtotals on the driver, seed a second scan. The
    // SQL plan therefore shows the materialized RDD scan feeding the
    // final aggregate — and, critically, NO Window node at all: the
    // superseded per-lang window would serialize each language's whole
    // corpus through one task at 100 TB.
    val df = SparkEntry.queries("q45_shard_pack")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      s"no window may appear — the per-lang window funnel is the superseded plan:\n${p.take(1200)}")
    assert(p.contains("SerializeFromObject") && p.contains("Scan[obj"),
      s"prefix sum must surface as the two-phase RDD object scan:\n${p.take(1200)}")
    assert(!p.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
      "no global-ordering exchange may appear in the plan")
    // and the data-aware lint agrees: nothing in the shard-assignment
    // lineage windows over a low-cardinality key
    val assign = graft.llm.DataPrep.shardAssignments(
      graft.Tables.load(spark, dir, "documents"))
    assert(graft.plans.PlanLint.lintGroupedWindows(assign).isEmpty)
  }

  test("GTFS silver incremental filter pushes insert_date to the bronze scan") {
    // the real P5 path: insert_date is a native TIMESTAMP_NTZ column,
    // so the watermark predicate prunes row groups at the scan
    import org.apache.spark.sql.functions.lit
    val root = TestSpark.tempDir("plan_wm")
    val src = s"$root/static"
    graft.gtfs.Fixtures.writeStaticCsvs(src)
    graft.gtfs.BronzeIngest.loadStatic(spark, src, s"$root/wh",
      java.time.LocalDateTime.of(2025, 9, 3, 4, 0))
    val bronze = graft.gtfs.BronzeIngest.readBronze(
      spark, s"$root/wh/bronze/routes_static", "routes_static")
    val filtered = graft.gtfs.SilverTransforms.incrementalFilter(
      bronze, Some(java.time.LocalDateTime.of(2025, 9, 3, 3, 0)))
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(insert_date"),
      s"insert_date watermark must push to parquet:\n${p.take(1500)}")
  }

  test("pair mining and sampled quantiles: top-k via TakeOrdered, sampler is map-side") {
    val pairs = graft.llm.TextAnalysis.q65_token_pairs(spark, dir)
      .queryExecution.executedPlan.toString
    assert(pairs.contains("TakeOrderedAndProject"), pairs.take(400))
    val q64 = graft.queries.Analytics.q64_sampled_quantiles(spark, dir)
    val plan = q64.queryExecution.executedPlan.toString
    // the md5-threshold sample must be a Filter under the scan stage,
    // before any exchange (stateless map-side sampling)
    val firstExchange = plan.indexOf("Exchange")
    val filterIdx = plan.indexOf("conv(substring(md5(")
    assert(filterIdx > firstExchange && firstExchange >= 0,
      s"sampler filter must sit below the first exchange:\n${plan.take(800)}")
  }

  test("curation reports keep their scale shapes: DP top-k rides bounded heaps, soft dedup and funnel never pair") {
    // q224's per-lang rank filter must rewrite to the partial/final
    // TopK heaps — a WindowExec here would serialize the vocab-sized
    // count table through |langs| tasks at corpus scale
    val p224 = plan("q224_dp_noisy_topk")
    assert(p224.contains("PartialTopK") && p224.contains("FinalTopK"),
      s"q224 must plan the bounded TopK heaps:\n${p224.take(600)}")
    assert(!p224.contains("Window"), "no rank window may survive the rewrite")
    // first-order statistics must never plan a pair join: exactly the
    // equi-joins on the gram/word key and nothing nested-loop (q208's
    // 1-row grand-total attach is the idiomatic scalar crossJoin —
    // the same documented exception as q42)
    for (q <- Seq("q214_soft_dedup", "q217_memorization_rate", "q208_source_divergence")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      if (q != "q208_source_divergence")
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
    }
    // the filter funnel is one codegen'd scan + one aggregate: a single
    // exchange (the source groupBy), no join anywhere
    val p213 = plan("q213_filter_funnel")
    assert(!p213.contains("Join"), s"the funnel must not join:\n${p213.take(600)}")
    assert("Exchange".r.findAllIn(p213).size <= 2,
      s"one aggregation exchange (+AQE read) at most:\n${p213.take(600)}")
  }

  test("deterministic sampling keeps the same rows under any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def kept(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter(conv(substring(md5(concat(lit("s"), $"event_id")), 1, 15), 16, 10)
          .cast("long") % 100 < 10)
        .select($"event_id").collect().map(_.getLong(0)).toSet
    val ev = graft.Tables.load(spark, dir, "events")
    val a = kept(ev)
    val b = kept(ev.repartition(13))
    val c = kept(ev.repartition(3, $"event_type"))
    assert(a == b && b == c)
    assert(a.nonEmpty && a.size < ev.count())
  }

  test("dynamic partition pruning: a selective dim filter prunes the fact's partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // fact laid out hive-style by event_type (the 100 TB layout where
    // partition columns carry the hot predicates)
    val base = TestSpark.tempDir("dpp")
    graft.Tables.load(spark, dir, "events")
      .select($"event_id", $"user_id", $"value", $"event_type")
      .write.partitionBy("event_type").mode("overwrite").parquet(base)
    val fact = spark.read.schema("event_id LONG, user_id LONG, value DOUBLE")
      .option("basePath", base).parquet(base)
    // the dim must be a scan relation — DPP's planner rule skips
    // driver-local LocalRelations (verified: LocalTableScan ⇒ no DPP)
    val dimDir = TestSpark.tempDir("dpp_dim")
    Seq(("purchase", "rev"), ("view", "traffic"), ("click", "traffic"),
      ("error", "ops"), ("signup", "growth")).toDF("event_type", "family")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)

    val q = fact.join(dim.filter($"family" === "rev"), "event_type")
      .agg(count(lit(1)).as("n"))
    q.queryExecution.toRdd.count()
    val planStr = q.queryExecution.executedPlan.toString
    // the fact scan's PartitionFilters must carry the runtime subquery
    assert(planStr.contains("dynamicpruning"),
      s"no dynamic pruning in:\n${planStr.take(1200)}")
    // and the scan must have read only the one matching partition
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.isEmpty || // AQE may wrap; fall back to the string form
      scan.get.metrics.get("numFiles").forall(_.value <= 2))
  }
}
