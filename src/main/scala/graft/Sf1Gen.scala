package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1.0 bench-table generator (round-10 directive 3): materialize a
  * 10× scale-up of the sf0.1 harness tables so `graft.Bench` can
  * record a committed sf1.0 evidence artifact for the headline
  * operators.
  *
  *   sbt "runMain graft.Sf1Gen"          # → target/sf1.0
  *
  * Design:
  *  - TPC-H-ish tables replicate the REAL sf0.1 data 10× with a
  *    uniform +r·1e8 key offset per replica on every key column —
  *    each replica keeps its internal referential integrity
  *    (orders→customer, lineitem→orders/part/supplier) while distinct
  *    key cardinality, join fan-in and group counts all grow 10×,
  *    exactly how a bigger TPC-H SF behaves. Non-key columns are
  *    untouched, so value distributions (dates, prices, flags) match
  *    the source scale point-for-point.
  *  - `region`/`nation` are fixed dimensions — copied once, as at
  *    every TPC-H SF.
  *  - `documents`/`embeddings` SYNTHESIZE at 10× with the
  *    LlmScaleBench planted-near-dup structure instead of replicating:
  *    text replicas of the same doc would make every doc a 10-way
  *    near-dup cluster, turning the dedup operators' true-pair output
  *    superlinear — not a fair scale-up. The planted corpus keeps
  *    true pairs at 10% of n, the same linear shape as the harness
  *    testdata.
  *
  * Writes nothing outside the repo (default target/sf1.0 is
  * git-ignored build output).
  */
object Sf1Gen {
  final val KeyOffset = 100000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "target/sf1.0"
    val reps = sys.env.getOrElse("SPARK_GRAFT_SF1_REPS", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (t <- Seq("region", "nation"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")

    def replicate(table: String, keys: Seq[String]): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      (0 until reps).map { r =>
        keys.foldLeft(base)((d, k) => d.withColumn(k, col(k) + lit(r * KeyOffset)))
          .select(base.columns.map(col): _*) // keep original column order
      }.reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dst/$table.parquet")
    }
    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", Seq("event_id", "user_id"))

    val nDocs = spark.read.parquet(s"$src/documents.parquet").count() * reps
    val nVecs = spark.read.parquet(s"$src/embeddings.parquet").count() * reps
    graft.llm.LlmScaleBench.synthDocuments(spark, nDocs, s"$dst/documents.parquet")
    graft.llm.LlmScaleBench.synthEmbeddings(spark, nVecs, s"$dst/embeddings.parquet")

    val counts = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .map(t => s""""$t":${spark.read.parquet(s"$dst/$t.parquet").count()}""")
    println(s"""{"metric":"sf1_gen","src":"$src","dst":"$dst","reps":$reps,"rows":{${counts.mkString(",")}}}""")
    spark.stop()
  }
}
