package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Loaders + shared column helpers for the harness tables
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * Scale notes (100 TB design intent):
  *  - Always read through `spark.read.parquet` so Catalyst gets column
  *    pruning + predicate pushdown + partition pruning for free.
  *  - Never collect a fact table; only tiny dimension aggregates
  *    (explicit scalar watermarks) may hit the driver.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark 4 refuses by
    // default; read nanos as long, then floor to the microsecond
    // precision Spark timestamps actually have. `div` keeps the
    // arithmetic in exact integer space (a double division would lose
    // precision above 2^53 ns ≈ 104 days).
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ != "true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) {
      case (d, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
        d.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case (d, _) => d
    }
  }

  /** Money-as-cents: exact integer arithmetic so aggregate results are
    * bit-identical regardless of partitioning / summation order — a
    * correctness property that must hold from local[32] to a
    * 1000-executor cluster (floating sums are order-dependent; 64-bit
    * integer sums are not). Matches DuckDB
    * `CAST(ROUND(x * 100) AS BIGINT)`.
    */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Epoch seconds as BIGINT. The events table is nanosecond-precision
    * parquet; Spark truncates to micros while DuckDB keeps nanos, so
    * raw timestamps can never be emitted from a verified query — only
    * second-floored epochs (identical in both engines).
    */
  def epochS(c: Column): Column = unix_timestamp(c)
}
