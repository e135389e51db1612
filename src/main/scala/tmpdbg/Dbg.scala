import org.apache.spark.sql.SparkSession
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("dbg").toString
    graft.tools.DegenerateProbe.buildFixture(spark, "/root/testdata/sf0.001", dir)
    for (q <- Seq("q40_stats", "q107_bfs_hops")) {
      try { graft.SparkEntry.queries(q)(spark, dir).collect(); println(s"$q OK") }
      catch { case e: Throwable =>
        println(s"== $q")
        var c: Throwable = e
        while (c != null) { println("  CAUSE " + c.getClass.getName + ": " + String.valueOf(c.getMessage).linesIterator.take(3).mkString(" | ")); c = c.getCause }
      }
    }
  }
}
