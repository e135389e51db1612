package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline knob sweep for the q343 graph-ANN design point — the
  * measurement harness behind the pinned [[Similarity.GraphKnobs]]
  * defaults (round-19 directive: recall@10 at sf1.0 from 4463 bp
  * toward serving grade, visited rows still ≪ the flat scan). Each
  * combo runs the EXACT production build+search
  * ([[Similarity.graphBeamCore]]) and reports gate-comparable
  * numbers: recall@10 vs the exact q26 answer, total visited rows,
  * stored edges, and wall seconds.
  *
  *   tools/run_graft.sh graft.llm.GraphSweep <sfDir> [m:bridgeM:buildProbes:maxDeg:W:R:E ...]
  *
  * Prints one JSON line per combo. Not a gate artifact — the gate's
  * sweep row is q346, which measures the beam-width axis through the
  * DuckDB-replayed path every round.
  */
object GraphSweep {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = args(0)
    val combos: Seq[Similarity.GraphKnobs] =
      if (args.length > 1) args.drop(1).toSeq.map { s =>
        val p = s.split(":").map(_.toInt)
        Similarity.GraphKnobs(m = p(0), bridgeM = p(1), buildProbes = p(2),
          maxDegree = p(3), beamWidth = p(4), rounds = p(5), entryProbes = p(6),
          medoidCosEntry = p.length > 7 && p(7) == 1)
      }
      else Seq(Similarity.GraphKnobs())

    val exact = Similarity.exactTopK(spark, dir)
      .select($"q_id", $"neighbor_id").persist()
    val exRows = exact.count()

    combos.foreach { k =>
      val t0 = System.nanoTime()
      val core = Similarity.graphBeamCore(spark, dir, k)
      val res = Similarity.rankVisited(core.visited)
      val hits = res.join(exact, Seq("q_id", "neighbor_id")).count()
      val visited = core.visited.count()
      val edges = core.adj.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val recallBp = math.round(10000.0 * hits / math.max(exRows, 1L))
      println(s"""{"knobs":"m=${k.m},bridgeM=${k.bridgeM},buildProbes=${k.buildProbes},maxDeg=${k.maxDegree},W=${k.beamWidth},R=${k.rounds},E=${k.entryProbes},medoidCos=${k.medoidCosEntry}","recall_bp":$recallBp,"visited_rows":$visited,"graph_edges":$edges,"wall_sec":${math.round(wall * 10) / 10.0}}""")
      graft.Caches.releaseAll()
      System.gc()
    }
    spark.stop()
  }
}
