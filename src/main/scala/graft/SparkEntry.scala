package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's demo query
  * (SURVEY.md §2 inventory, over the harness tables per FIXTURES.md §C);
  * `oracleSql` carries the DuckDB-equivalent ANSI SQL for each
  * SQL-expressible entry. Non-SQL-expressible operators (protobuf
  * decode, streaming, LSH internals) are covered by ScalaTest specs and
  * appear here without an oracle (rows-only check).
  */
object SparkEntry {

  /** Flagship: the "top delayed routes" spine (SURVEY.md §7.2) mapped
    * onto the harness star schema — fact×fact join, derived delay-style
    * metric, broadcast dim join, group, top-k.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val li = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .withColumn("latency_days",
        datediff($"l_shipdate", $"o_orderdate"))
      .groupBy($"c_mktsegment")
      .agg(avg($"latency_days").as("avg_latency_days"),
           count(lit(1)).as("n_items"))
      .orderBy($"avg_latency_days".desc, $"c_mktsegment")
      .limit(10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Analytics.queries ++
      graft.queries.SqlSurface.queries ++
      graft.queries.Temporal.queries ++
      graft.queries.Spatial.queries ++
      graft.queries.Graph.queries ++
      graft.operators.ScaleOps.queries ++
      graft.operators.DataQuality.queries ++
      graft.llm.Sketches.queries ++
      graft.llm.TextAnalysis.queries ++
      graft.llm.Dedup.queries ++
      graft.llm.Chunking.queries ++
      graft.llm.Similarity.queries ++
      graft.llm.Evaluation.queries ++
      graft.llm.Multimodal.queries ++
      graft.llm.CorpusPipeline.queries ++
      graft.llm.DataPrep.queries ++
      graft.gtfs.KpiHarness.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Analytics.oracle ++
      graft.queries.SqlSurface.oracle ++
      graft.queries.Temporal.oracle ++
      graft.queries.Spatial.oracle ++
      graft.queries.Graph.oracle ++
      graft.operators.ScaleOps.oracle ++
      graft.operators.DataQuality.oracle ++
      graft.llm.Sketches.oracle ++
      graft.llm.TextAnalysis.oracle ++
      graft.llm.Dedup.oracle ++
      graft.llm.Chunking.oracle ++
      graft.llm.Similarity.oracle ++
      graft.llm.Evaluation.oracle ++
      graft.llm.Multimodal.oracle ++
      graft.llm.CorpusPipeline.oracle ++
      graft.llm.DataPrep.oracle ++
      graft.gtfs.KpiHarness.oracle
}
