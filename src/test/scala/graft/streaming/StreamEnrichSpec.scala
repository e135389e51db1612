package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Stream-static enrichment: streaming output must equal the batch
  * dual, unmatched facts survive with null attributes, and a
  * dimension refresh between micro-batch runs is picked up WITHOUT a
  * stream restart (while already-emitted rows stay as written —
  * append sinks never retro-update).
  */
class StreamEnrichSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  private def events(rows: Seq[(Long, Int, Long)]) = {
    import spark.implicits._
    rows.map { case (id, min, user) => (id, ts(min), user, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def dim(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("user_id", "segment")
  }

  private val outSchema =
    "event_id LONG, user_id LONG, ts_s LONG, event_type STRING, v_cents LONG, segment STRING"

  test("streaming enrichment equals the batch dual; unmatched facts keep null segment") {
    val landing = TestSpark.tempDir("se_landing")
    val dimDir = TestSpark.tempDir("se_dim")
    val out = TestSpark.tempDir("se_out")
    val ckpt = TestSpark.tempDir("se_ckpt")

    val facts = events(Seq((1L, 0, 10L), (2L, 1, 20L), (3L, 2, 99L)))
    facts.write.mode("overwrite").parquet(landing)
    dim(Seq((10L, "gold"), (20L, "silver"))).write.mode("overwrite").parquet(dimDir)

    StreamEnrich.start(spark, landing, dimDir, out, ckpt).awaitTermination()

    val got = spark.read.schema(outSchema).parquet(out)
      .collect().map(r => (r.getLong(0), Option(r.getString(5)))).sortBy(_._1).toSeq
    val expected = StreamEnrich.enrich(facts,
        dim(Seq((10L, "gold"), (20L, "silver"))))
      .collect().map(r => (r.getLong(0), Option(r.getString(5)))).sortBy(_._1).toSeq
    assert(got == expected)
    assert(got == Seq((1L, Some("gold")), (2L, Some("silver")), (3L, None)),
      "unmatched user 99 must survive the left join with a null segment")
  }

  test("a dimension refresh between runs enriches NEW facts without a restart rewrite") {
    val landing = TestSpark.tempDir("se2_landing")
    val dimDir = TestSpark.tempDir("se2_dim")
    val out = TestSpark.tempDir("se2_out")
    val ckpt = TestSpark.tempDir("se2_ckpt")

    events(Seq((1L, 0, 10L))).write.mode("overwrite").parquet(landing)
    dim(Seq((10L, "gold"))).write.mode("overwrite").parquet(dimDir)
    StreamEnrich.start(spark, landing, dimDir, out, ckpt).awaitTermination()

    // dimension refresh: user 10 re-segmented, user 30 appears; a
    // second event file lands; same checkpoint — the file-source log
    // processes ONLY the new file, against the NEW dimension
    dim(Seq((10L, "platinum"), (30L, "bronze")))
      .write.mode("overwrite").parquet(dimDir)
    events(Seq((2L, 5, 10L), (3L, 6, 30L)))
      .write.mode("append").parquet(landing)
    StreamEnrich.start(spark, landing, dimDir, out, ckpt).awaitTermination()

    val got = spark.read.schema(outSchema).parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(5))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "gold"), (2L, "platinum"), (3L, "bronze")),
      "old rows stay as emitted; new rows see the refreshed dimension")
  }
}
