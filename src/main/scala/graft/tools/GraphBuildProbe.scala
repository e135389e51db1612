package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage wall-clock decomposition of the q343 graph-ANN
  * BUILD (the shared cost of q343/q345/q346/q349) — the measurement
  * tool behind the round-19 optimization of [[graft.llm.Similarity]]'s
  * graphIndexOver. Each stage is forced with a count so its wall is
  * attributable; run twice in one JVM and read the SECOND block (the
  * first is JIT/codegen warm-up).
  *
  *   tools/run_graft.sh graft.tools.GraphBuildProbe <sfDir>
  */
object GraphBuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (round <- 1 to 2) {
      println(s"== pass $round ==")
      graft.llm.Similarity.buildProbe(spark, dir)
      graft.Caches.releaseAll(blocking = true)
      System.gc()
    }
    graft.llm.Similarity.releaseShared()
    spark.stop()
  }
}
