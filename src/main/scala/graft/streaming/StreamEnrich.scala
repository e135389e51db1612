package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Stream-static enrichment — the most common production join shape:
  * an unbounded fact stream decorated with a bounded, slowly-changing
  * dimension (user → segment, stop → name, …). The reference implies
  * exactly this ordering contract with its daily static load gating
  * the RT DAG (`/root/reference/dags/gtfs_rt_minutely.py:270-280`);
  * here it is the join itself.
  *
  * Two properties make the operator, both spec-pinned:
  *  - the dimension side is a BATCH frame: Spark re-executes its plan
  *    on every micro-batch, so a dimension refresh written between
  *    triggers is picked up by the next batch with no query restart —
  *    the streaming analog of the reference's daily re-load (T3);
  *  - the join is LEFT outer with the dim broadcast: facts with no
  *    dimension row survive with null attributes ("no data" beats
  *    silently dropped rows, README.md:138 parity), and the stream
  *    side never shuffles — no state, no watermark needed (unlike
  *    stream-stream, a static side cannot produce late matches).
  *
  * Scale: the dimension must fit broadcast reach (dimensions do; if
  * one doesn't, it's a fact — use [[StreamJoin]]). The stream side
  * stays a stateless map-side pipeline whatever the arrival rate.
  */
object StreamEnrich {

  /** Plan-generic enrichment: same function drives the batch dual in
    * the spec and the streaming frames in [[start]].
    */
  def enrich(facts: DataFrame, dim: DataFrame): DataFrame =
    facts.join(broadcast(dim), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ts_s"),
        col("event_type"),
        round(col("value") * 100).cast("long").as("v_cents"),
        col("segment"))

  /** Expected dimension shape: (user_id LONG, segment STRING). */
  def start(spark: SparkSession, landingDir: String, dimDir: String,
            outDir: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val facts = spark.readStream
      .schema(EventSessions.eventSchema).parquet(landingDir)
    // batch side, deliberately NOT cached: each micro-batch re-plans
    // and re-scans it, which is what makes dimension refresh work
    val dim = spark.read.schema("user_id LONG, segment STRING").parquet(dimDir)
    enrich(facts, dim)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }
}
