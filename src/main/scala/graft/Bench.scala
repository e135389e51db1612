package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Drive the EXECUTED plan, not `count()`: a count(1) lets Catalyst
    // prune every unreferenced projection (q02's scalar funcs, q16's
    // regexp work would be optimized away before timing). toRdd
    // materializes each row of the real physical plan.
    def drive(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    // Warm-up: JVM/codegen/session initialization lands here, not on
    // the first measured query (q06 paid ~3s of warm-up in round 1).
    try drive(SparkEntry.queries("q07_topk")(spark, sfDir)) catch { case _: Throwable => () }

    // Args: an optional comma-separated query-name list for targeted
    // profiling, and `--reps N` for isolated re-measurement (run each
    // query N times, report the MINIMUM — the min is the least
    // contaminated by machine contention / GC / codegen-cache misses,
    // which is exactly what a regression investigation needs).
    // e.g. `runMain graft.Bench q70_char_diversity,q71_hll_udaf --reps 5`
    // DEFAULT is min-of-2 (round-14 directive #3): single-rep suite
    // walls wobbled ±0.9 s and every regression audit needed per-query
    // floor adjudication; the second pass deletes that step. Override
    // with SPARK_GRAFT_BENCH_REPS=1 for quick iteration.
    // Defensive parse: a malformed or non-positive SPARK_GRAFT_BENCH_REPS
    // must not crash the bench (or silently run zero reps) — fall back
    // to the min-of-2 default and say so on stderr.
    var reps = sys.env.get("SPARK_GRAFT_BENCH_REPS") match {
      case None => 2
      case Some(v) =>
        scala.util.Try(v.trim.toInt).toOption.filter(_ >= 1).getOrElse {
          System.err.println(
            s"SPARK_GRAFT_BENCH_REPS='$v' is not a positive int; using 2")
          2
        }
    }
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      if (args(i) == "--reps" && i + 1 < args.length) { reps = args(i + 1).toInt; i += 2 }
      else { names ++= args(i).split(",").map(_.trim).filter(_.nonEmpty); i += 1 }
    }
    val only: Set[String] = names.toSet
    val picked =
      if (only.isEmpty) SparkEntry.queries.toSeq
      else SparkEntry.queries.filter { case (k, _) => only(k) }.toSeq

    // Load phase, timed separately from the queries: the shared
    // co-purchase edge list and the q66 bucketed fact tables are
    // session-lived load work — "shuffle the facts once at load" — so
    // their build cost is reported as `load`, not smeared into
    // whichever query runs first. Each warms only when a selected
    // query actually consumes it (targeted profiling of an unrelated
    // query must not pay it).
    val edgeConsumers = Set("q81_triangles", "q87_pagerank", "q107_bfs_hops",
      "q124_degree_distribution", "q131_link_prediction", "q173_assortativity")
    // Queries that rank against the session-shared exact top-k memo
    // (directly via exactTopK, or — q26 — via the CacheManager picking
    // up the memo's persisted plan). Warming it here makes the one
    // shared brute-force scan a NAMED load cost instead of silently
    // landing on the lexicographically-first consumer (round-19
    // verdict item 6; the copurchase_edges precedent).
    val exactTopKConsumers = Set("q26_ann_topk", "q222_ann_hubness",
      "q237_knn_probe", "q249_ivf_probe_sweep", "q292_retrieval_metrics",
      "q293_matryoshka_recall", "q318_mmr_rerank", "q329_whitened_recall",
      "q345_graph_ann_audit", "q346_graph_beam_sweep",
      "q349_graph_append_audit")
    val pickedNames = picked.map(_._1).toSet
    val loadSecs: Map[String, Double] = Map(
      "copurchase_edges" ->
        (if (pickedNames.exists(edgeConsumers)) {
          try graft.queries.Graph.warmCopurchaseEdges(spark, sfDir)
          catch { case _: Throwable => -1.0 }
        } else 0.0),
      "bucketed_facts" ->
        (if (pickedNames("q66_bucketed_join")) {
          try graft.operators.ScaleOps.warmBucketedFacts(spark, sfDir)
          catch { case _: Throwable => -1.0 }
        } else 0.0),
      "exact_topk" ->
        (if (pickedNames.exists(exactTopKConsumers)) {
          try graft.llm.Similarity.warmExactTopK(spark, sfDir)
          catch { case _: Throwable => -1.0 }
        } else 0.0))

    // One timed execution; alongside wall time, harvest scan/shuffle
    // ACTUALS from the executed plan's SQLMetrics (driver-side, zero
    // executor overhead — the Observability module's statsOf walks the
    // final adaptive plan). toRdd.count() bypasses the Dataset-action
    // listener hook, so harvest directly from the QueryExecution we
    // already hold: a future wall-time regression is then attributable
    // to plan change (rows/bytes moved) vs machine noise (same rows,
    // more seconds) from the bench artifact alone.
    case class Run(wall: Double, stats: Option[Observability.QueryStats],
                   stageInRecs: Long = -1, stageInBytes: Long = -1,
                   stageShWrite: Long = -1)
    // Two complementary capture paths, merged per query: the final
    // frame's executed plan (driven via toRdd, which bypasses the
    // Dataset-action listener) is read directly with statsOf, while
    // iterative operators' INTERNAL actions (BFS hops, CC rounds —
    // jobs that run while the frame is being BUILT) fire the
    // QueryExecutionListener and are drained per query. Either alone
    // under-counts: listener-only misses the final drive, plan-only
    // misses the iteration jobs.
    val obs = Observability.attach(spark)
    // Third capture path: stage-level SparkListener totals see every
    // job including raw-RDD drives (two-phase range operators), which
    // both plan walks miss — stats stop being a lower bound.
    val stages = Observability.attachStages(spark)
    def merge(name: String, wallNs: Long,
              parts: Seq[Observability.QueryStats]): Observability.QueryStats =
      Observability.QueryStats(name, wallNs / 1000000L,
        parts.map(_.scanRows).sum, parts.map(_.scanFiles).sum,
        parts.map(_.scanBytes).sum, parts.map(_.shuffles).sum,
        parts.map(_.shuffleRows).sum, failed = parts.exists(_.failed))
    def measure(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Run = {
      obs.drain(spark) // clear events from warm-up / load / prior rep
      stages.drainTotals(spark)
      // Time construction + drive together: iterative operators run
      // their Spark jobs while BUILDING the frame, so a drive-only
      // timer would exclude the actual work.
      val t0 = System.nanoTime()
      val df = try fn(spark, sfDir) catch { case _: Throwable => null }
      val ok = df != null && (try { drive(df); true } catch { case _: Throwable => false })
      val dtNs = System.nanoTime() - t0
      // blocking: eviction must not overlap the next query's timing
      Caches.releaseAll(blocking = true)
      // Collect the query's garbage on ITS OWN clock, not the next
      // query's: Spark's ContextCleaner reclaims unreferenced
      // broadcast/RDD blocks only when the JVM GC reports the weak
      // refs dead, so without a forced collection here the blocks
      // pile up and whichever query runs next pays the predecessor's
      // collection debt as wall time (measured at sf1.0: q238 34 s
      // in-suite vs 3.3 s isolated floor — the whole gap was carried
      // GC/cleaner work). One System.gc() per measured query makes
      // in-suite walls track isolated floors and retires the
      // per-round "in-suite contention, not compute" adjudications.
      System.gc()
      val internal = try obs.drain(spark) catch { case _: Throwable => Seq.empty }
      val direct = if (ok) {
        try Seq(Observability.statsOf(name, df.queryExecution, dtNs, failed = false))
        catch { case _: Throwable => Seq.empty }
      } else Seq.empty
      val all = internal ++ direct
      val (sInR, sInB, sShW) =
        try stages.drainTotals(spark) catch { case _: Throwable => (-1L, -1L, -1L) }
      Run(dtNs / 1e9, if (all.isEmpty) None else Some(merge(name, dtNs, all)),
        sInR, sInB, sShW)
    }

    val results = picked.sortBy(_._1).map { case (name, fn) =>
      val runs = (1 to math.max(1, reps)).map(_ => measure(name, fn))
      name -> runs.minBy(_.wall)
    }
    def statJson(r: Run): String = {
      val s = r.stats
      s"""{"wall":${r.wall},"shuffle_recs":${s.map(_.shuffleRows).getOrElse(-1L)},""" +
        s""""scan_bytes":${s.map(_.scanBytes).getOrElse(-1L)},""" +
        s""""scan_rows":${s.map(_.scanRows).getOrElse(-1L)},""" +
        s""""shuffles":${s.map(_.shuffles).getOrElse(-1)},""" +
        s""""stage_in_recs":${r.stageInRecs},"stage_in_bytes":${r.stageInBytes},""" +
        s""""stage_shw_recs":${r.stageShWrite}}"""
    }
    // Self-attribution against the committed quiet record (round-10
    // directive 7): re-run actuals_diff's verdict INLINE so the driver
    // artifact carries its own machine-vs-plan attribution — a wall
    // delta with IDENTICAL actuals (rows/records/shuffles exact,
    // scan_bytes within 10% for parquet-regen drift) is machine
    // conditions; changed actuals is a plan change and needs a
    // code-level explanation.
    // Normalized scale tag: "/root/testdata/sf0.1" / "target/sf1.0" /
    // the driver wrapper's bare numeric "0.1" all compare equal for
    // the same scale, so a baseline is never rejected for spelling
    // the same corpus differently.
    def sfNorm(s: String): String = {
      val b = s.stripSuffix("/")
      val base = b.substring(b.lastIndexOf('/') + 1)
      if (base.startsWith("sf")) base.drop(2) else base
    }
    // Default baseline = the PREVIOUS round's committed artifact for
    // this scale (highest round number present), so the drift
    // adjudication chain reads without archaeology (round-19
    // directive #4). Override with SPARK_GRAFT_BENCH_BASELINE.
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", {
      val pat = (if (sfNorm(sfDir) == "1.0") """BENCH_SF1_r(\d+)\.json"""
                 else """BENCH_r(\d+)\.json""").r
      val cands = Option(new java.io.File(".").listFiles())
        .getOrElse(Array.empty[java.io.File])
        .flatMap(f => f.getName match {
          case pat(n) => Some((n.toInt, f.getName)); case _ => None
        })
      if (cands.nonEmpty) cands.maxBy(_._1)._2 else "BENCH_LOCAL.json"
    })
    val attribution: String = try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      // The baseline is either a raw one-line Bench output (chain
      // artifacts, BENCH_LOCAL.json) or the driver's wrapper object
      // whose "parsed" block holds the walls; accept both, falling
      // back to the last raw line containing "queries".
      val root = {
        val whole = try {
          val n = om.readTree(java.nio.file.Files.readString(
            java.nio.file.Paths.get(baselinePath)))
          if (n.path("parsed").has("queries")) Some(n.path("parsed"))
          else if (n.has("queries")) Some(n)
          else None
        } catch { case _: Throwable => None }
        whole.getOrElse {
          val src = scala.io.Source.fromFile(baselinePath)
          val line =
            try src.getLines().filter(_.contains("\"queries\"")).toSeq.lastOption
            finally src.close()
          om.readTree(line.getOrElse("{}"))
        }
      }
      if (!root.has("queries"))
        s""""attribution":{"baseline":"$baselinePath","error":"no parseable line"}"""
      else if (sfNorm(root.path("sf").asText("")) != sfNorm(sfDir))
        s""""attribution":{"baseline":"$baselinePath","sf_mismatch":"${root.path("sf").asText("")}"}"""
      else {
          {
            val bq = root.path("queries"); val bs = root.path("stats")
            var machine = 0; var plan = 0; var inBand = 0; var noBase = 0
            var noStats = 0 // out-of-band, baseline carries no actuals
            val planQs = scala.collection.mutable.ArrayBuffer.empty[String]
            for ((k, r) <- results) {
              if (!bq.has(k) || bq.get(k).asDouble(-1) <= 0) noBase += 1
              else {
                val ratio = r.wall / bq.get(k).asDouble()
                if (ratio < 1.5 && ratio > 1.0 / 1.5) inBand += 1
                else if (bs.path(k).isMissingNode) noStats += 1
                else {
                  val s = bs.path(k)
                  val same = r.stats.exists { st =>
                    s.path("shuffle_recs").asLong(-2) == st.shuffleRows &&
                      s.path("scan_rows").asLong(-2) == st.scanRows &&
                      s.path("shuffles").asInt(-2) == st.shuffles && {
                        val bb = s.path("scan_bytes").asLong(-2)
                        bb == st.scanBytes || (bb > 0 && st.scanBytes > 0 &&
                          math.abs(bb - st.scanBytes).toDouble
                            / math.max(bb, st.scanBytes) <= 0.10)
                      }
                  }
                  if (same) machine += 1 else { plan += 1; planQs += k }
                }
              }
            }
            s""""attribution":{"baseline":"$baselinePath","in_band":$inBand,""" +
              s""""machine":$machine,"plan":$plan,"no_baseline":$noBase,""" +
              s""""no_stats":$noStats,""" +
              s""""plan_changed":[${planQs.sorted.take(20).map("\"" + _ + "\"").mkString(",")}]}"""
          }
      }
    } catch {
      case e: Throwable =>
        s""""attribution":{"baseline":"$baselinePath","error":"${e.getClass.getSimpleName}"}"""
    }

    val qs = results.map { case (k, r) => s"\"" + k + "\":" + r.wall }
      .mkString("{", ",", "}")
    val st = results.map { case (k, r) => s"\"" + k + "\":" + statJson(r) }
      .mkString("{", ",", "}")
    val ls = loadSecs.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2.wall).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,""" +
      s"""$attribution,"queries":$qs,"stats":$st,"load":$ls,"sf":"$sfDir"}"""
    println(json)
    // Side artifact: sbt appends its own "[success]" line after ours,
    // so a last-line parse of stdout misses the JSON. The file copy is
    // unambiguous for any consumer.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json"), json + "\n")
    catch { case _: Throwable => () }
    // The harness keeps only the last ~2000 chars of stdout; with 180+
    // queries the full line is ~5000 chars, so its head falls outside
    // the window and the line never parses (observed rounds 1-5:
    // parsed=null). Emit a compact final line that fits the window
    // whole: total + load + the slowest queries, with the complete map
    // in BENCH_LOCAL.json and the full line above.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val lsC = loadSecs.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val prefix = s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      s""""queries_total":${results.size},"reps":$reps,"load":$lsC,"sf":"$sfDir",""" +
      s"""$attribution,"detail":"BENCH_LOCAL.json","queries":{"""
    val budget = 1600 // < 2000-char window minus sbt's "[success]" trailer
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var len = prefix.length + 2
    var full = true
    for ((k, r) <- results.sortBy(-_._2.wall) if full) {
      val e = "\"" + k + "\":" + fmt(r.wall)
      if (len + e.length + 1 <= budget) { entries += e; len += e.length + 1 }
      else full = false
    }
    println(prefix + entries.mkString(",") + "}}")
    graft.queries.Graph.releaseEdgeMemo(spark) // session teardown hook
    graft.llm.Similarity.releaseShared()
    spark.stop()
  }
}
