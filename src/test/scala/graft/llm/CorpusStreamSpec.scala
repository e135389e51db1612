package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Drives the streaming corpus ingest end-to-end with
  * Trigger.AvailableNow over a temp landing dir: quality gate,
  * same-batch exact-dup collapse, and cross-run dedup state carried
  * through the checkpoint (the T5/T7/T8 semantics of the GTFS RT
  * path, applied to training-data ingestion).
  */
class CorpusStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // quality_bp: hi ≈ 5000 + 9·120 + 17·10 = 6250 ≥ 5500; lo ≈ 4600 < 5500
  private val hiA = "the quick fox and the lazy dog run to the river in the morning of a day"
  private val hiD = "a calm wind is in the north and the road to the sea of grass is long"
  private val lo = "!!! ### $$$ %%%"

  private def land(dir: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("test"))
      .withColumn("n_chars", length($"text").cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("append").parquet(dir)
  }

  test("quality gate + same-batch and cross-run dedup within watermark") {
    val root = TestSpark.tempDir("corpus_stream")
    val landing = s"$root/landing"
    val curated = s"$root/curated"
    val ckpt = s"$root/ckpt"

    // run 1: one good doc, one low-quality doc, one same-batch dup
    land(landing, Seq((1L, hiA), (2L, lo), (3L, hiA)))
    CorpusStream.startIngest(spark, landing, curated, ckpt).awaitTermination()
    val after1 = spark.read.parquet(curated)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after1.size == 1 && after1.subsetOf(Set(1L, 3L)),
      s"one of the two identical docs must survive, low-quality dropped; got $after1")

    // run 2: a new good doc plus a replay of run 1's text — the dedup
    // state lives in the checkpoint, so the replay must be dropped
    land(landing, Seq((4L, hiD), (5L, hiA)))
    CorpusStream.startIngest(spark, landing, curated, ckpt).awaitTermination()
    val after2 = spark.read.parquet(curated)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after2 -- after1 == Set(4L),
      s"only the new unique doc may append on run 2; got ${after2 -- after1}")
  }

  test("streaming DP release: noisy counts only, bounded noise, replay-deterministic") {
    val root = TestSpark.tempDir("dp_stream")
    val landing = s"$root/landing"
    land(landing, (1L to 30L).map(i => (i, s"doc $i words here")))

    def releaseOnce(tag: Int): Array[(Long, String, String, Long)] = {
      val out = s"$root/release$tag"
      CorpusStream.startDpRelease(spark, landing, out, s"$root/ckpt$tag")
        .awaitTermination()
      spark.read.parquet(out).collect()
        .map(r => (r.getLong(r.fieldIndex("epoch")), r.getString(r.fieldIndex("source")),
          r.getString(r.fieldIndex("lang")), r.getLong(r.fieldIndex("n_noisy"))))
        .sortBy(t => (t._1, t._2, t._3))
    }
    val a = releaseOnce(1)
    assert(a.nonEmpty)
    // released schema carries NO true count; noise is bounded so the
    // noisy value stays within ±40 of the real 30 (clamped at 0)
    assert(!spark.read.parquet(s"$root/release1").columns.contains("n_true"),
      "true counts must never leave the release closure")
    assert(a.forall { case (_, _, _, n) => n >= 0L && (n - 30L).abs <= 40L })
    // a fresh run over the same files draws the SAME epoch ids and the
    // same seeded noise — the release is replay-deterministic
    val b = releaseOnce(2)
    assert(a.toSeq == b.toSeq, "same epoch + same keys must release identical values")
  }
}
