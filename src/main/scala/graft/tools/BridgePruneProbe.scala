package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures whether a lossless geometric prune of the graph-ANN
  * bridge join's candidate stream (round-19 verdict item 3) would be
  * selective enough to pay for itself — BEFORE building it. For every
  * bridge candidate (src x with bridge cell c, member y of c) the
  * prune's upper bound on cos(x, y) is
  *
  *   ub = (|x|² + |y|² − L²) / (2·|x|·|y|),  L = max(0, |dx − dy|)
  *
  * with dx = d(x, centroid c), dy = d(y, centroid c) — both already
  * computed by rankCells, so the bound is a few flops per candidate
  * vs the 64-dim dot. A candidate is IDEALLY prunable when its ub is
  * strictly below the exact 2nd-best sim of its (src, c) group (the
  * top-2 the join keeps), and REALISTICALLY prunable when ub is below
  * the 2nd-best LOWER bound (lb via L' = dx + dy) of the group — the
  * threshold a two-phase implementation could know without any dot.
  * Prints both rates; measurement only, not a query.
  *
  *   tools/run_graft.sh graft.tools.BridgePruneProbe <sfDir>
  */
object BridgePruneProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.llm.Similarity.bridgePruneProbe(spark, dir)
    spark.stop()
  }
}
