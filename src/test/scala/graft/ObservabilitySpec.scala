package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The metrics listener reports ACTUALS from the executed plan:
  * scan rows/files/bytes and shuffle structure, with no query
  * changes and no extra actions.
  */
class ObservabilitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("listener captures scan and shuffle actuals for an aggregation") {
    import spark.implicits._
    val l = Observability.attach(spark)
    try {
      l.drain(spark) // discard anything pending from other suites
      val n = Tables.load(spark, dir, "events")
        .groupBy($"event_type").agg(count(lit(1)).as("n"))
        .collect().map(_.getLong(1)).sum
      val stats = l.drain(spark)
      assert(stats.nonEmpty, "collect() must fire onSuccess")
      val s = stats.last
      assert(!s.failed)
      assert(s.scanRows == Tables.load(spark, dir, "events").count(),
        "scan actuals must equal the table row count (no pushdown here)")
      assert(s.scanFiles >= 1 && s.scanBytes > 0)
      assert(s.shuffles >= 1, "groupBy must shuffle")
      assert(s.shuffleRows > 0 && s.shuffleRows <= n,
        "map-side partial agg must shrink the shuffle below the input")
    } finally Observability.remove(spark, l)
  }

  test("partition pruning shows up in the scan actuals (fewer files, fewer rows)") {
    import spark.implicits._
    val base = TestSpark.tempDir("obs_part")
    Tables.load(spark, dir, "events")
      .select($"event_id", $"value", $"event_type")
      .write.partitionBy("event_type").mode("overwrite").parquet(base)
    val l = Observability.attach(spark)
    try {
      l.drain(spark)
      spark.read.schema("event_id LONG, value DOUBLE").option("basePath", base)
        .parquet(base).filter($"event_type" === "purchase").collect()
      val s = l.drain(spark).last
      val total = Tables.load(spark, dir, "events").count()
      assert(s.scanRows > 0 && s.scanRows < total,
        s"pruned scan read ${s.scanRows} of $total rows")
      assert(s.scanFiles >= 1 && s.shuffles == 0)
    } finally Observability.remove(spark, l)
  }

  test("stage-level listener sees raw-RDD jobs the plan walks cannot") {
    import spark.implicits._
    val l = Observability.attachStages(spark)
    try {
      l.drainTotals(spark) // reset
      // a pure RDD job: no Dataset action fires, no QueryExecution to
      // walk — only the stage listener can account for it
      val n = spark.sparkContext.parallelize(1 to 1000, 4)
        .map(x => (x % 7, 1L)).reduceByKey(_ + _).count()
      assert(n == 7)
      val (_, _, shw) = l.drainTotals(spark)
      assert(shw > 0, "reduceByKey's shuffle write must be visible in stage totals")
      // and the totals reset on drain
      val (r2, b2, w2) = l.drainTotals(spark)
      assert(r2 == 0 && b2 == 0 && w2 == 0)
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
