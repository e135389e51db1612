package graft.tools

import org.apache.spark.sql.SparkSession
import graft.plans.PlanLint

/** Committed plan-lint artifact (round-11/12 directive #5): run every
  * registered query through BOTH linter passes — the plan-shape rules
  * (`PlanLint.lint`: cartesian products, single-partition windows,
  * unpruned wide scans) and the data-aware grouped-window rule
  * (`PlanLint.lintGroupedWindows`: windows partitioned by a key with
  * too few groups to spread the data) — and write one JSON row per
  * query with its findings, the documented-by-design allowance that
  * covers each, and a verdict.
  *
  *   /tmp/run_graft.sh graft.tools.LintDump /root/testdata/sf0.1 LINT_r13.json
  *
  * Exit status 1 if any finding is NOT covered by
  * [[PlanLint.shippedAllowlist]] / [[PlanLint.groupedWindowAllowlist]]
  * — the same gate PlanLintSpec enforces in CI, but emitted as a
  * per-query artifact a reviewer can read without running the tests.
  */
object LintDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = if (args.length > 1) args(1) else "LINT_r13.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // Same extensions as Verify/Bench: the lint must judge the plan
      // the engine actually ships (RankLimitRewrite turns rank-filter
      // windows into bounded heaps — without it every top-k-per-group
      // query would flag a funnel the deployed session doesn't have).
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", " ").replace("\r", " ")

    var unexplained = 0
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val (planF, dataF, err) =
          try {
            val df = fn(spark, sfDir)
            val p = PlanLint.lint(df)
            val g = PlanLint.lintGroupedWindows(df)
            (p, g, None)
          } catch {
            case e: Throwable => (Seq.empty, Seq.empty, Some(e.toString.take(200)))
          } finally graft.Caches.releaseAll()
        val planAllowed = PlanLint.shippedAllowlist.getOrElse(name, Set.empty)
        val dataAllowed = PlanLint.groupedWindowAllowlist.contains(name)
        val residual =
          planF.filterNot(f => planAllowed.contains(f.rule)) ++
            (if (dataAllowed) Seq.empty else dataF)
        val verdict = err match {
          case Some(_) => "ERROR"
          case None if residual.nonEmpty => "FLAGGED"
          case None if planF.nonEmpty || dataF.nonEmpty => "by_design"
          case None => "clean"
        }
        if (verdict == "FLAGGED" || verdict == "ERROR") unexplained += 1
        val fs = (planF ++ dataF).map(f =>
          s"""{"rule":"${esc(f.rule)}","node":"${esc(f.node)}","allowed":${
            planAllowed.contains(f.rule) || (dataF.contains(f) && dataAllowed)}}""")
          .mkString("[", ",", "]")
        val why = PlanLint.groupedWindowAllowlist.get(name)
          .map(w => s""","grouped_window_why":"${esc(w)}"""").getOrElse("")
        s""""$name":{"verdict":"$verdict","findings":$fs$why${
          err.map(e => s""","error":"${esc(e)}"""").getOrElse("")}}"""
    }
    val n = rows.size
    val clean = rows.count(_.contains("\"clean\""))
    val byDesign = rows.count(_.contains("\"by_design\""))
    val json = s"""{"sf":"$sfDir","n_queries":$n,"n_clean":$clean,""" +
      s""""n_by_design":$byDesign,"n_unexplained":$unexplained,""" +
      s""""queries":{${rows.mkString(",")}}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(s"LINT: $n queries, $clean clean, $byDesign by-design, " +
      s"$unexplained UNEXPLAINED -> $outPath")
    spark.stop()
    if (unexplained > 0) sys.exit(1)
  }
}
