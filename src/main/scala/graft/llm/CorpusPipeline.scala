package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.load

/** The flagship training-data curation chain, end to end in one
  * deterministic query: quality filter → exact dedup (md5,
  * first-wins) → MinHash-LSH near-dup dedup (drop the higher id of
  * each verified pair) → the kept corpus. Each stage is the already-
  * verified operator (q21 formula, q20 keeper rule, q23 pair core) —
  * this composes them the way a real pipeline runs them, and the
  * DuckDB oracle recomputes the whole chain exactly.
  *
  * Scale shape: stage 1 is a scan-local filter; stage 2 one shuffle
  * on the content hash; stage 3 the LSH bucket join over survivors
  * only (the filter stages shrink the expensive stage's input — the
  * reason pipelines order cheap-first).
  */
object CorpusPipeline {

  final val QualityThresholdBp = 5500L

  def q39_corpus_curation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = load(spark, dir, "documents")
      .select($"doc_id", $"text", $"lang", $"source")
      .withColumn("quality_bp", TextAnalysis.qualityBp($"text"))
    val survivors = docs.filter($"quality_bp" >= QualityThresholdBp)

    val byHash = Window.partitionBy(md5($"text"))
    val exactKept = graft.Caches.tracked(survivors
      .withColumn("keep_id", min($"doc_id").over(byHash))
      .filter($"doc_id" === $"keep_id").drop("keep_id"))
      // consumed by the LSH stage AND the final anti-join — tracked-
      // persist so the scan + quality filter + hash-window run once

    val nearDupLosers = Dedup.minhashPairs(exactKept.select($"doc_id", $"text"))
      .select($"doc_b".as("doc_id")).distinct()

    exactKept.join(nearDupLosers, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"lang", $"source", $"quality_bp")
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_corpus_curation" -> q39_corpus_curation)

  val oracle: Map[String, String] = Map(
    "q39_corpus_curation" ->
      s"""WITH q AS (SELECT doc_id, text, lang, source,
        |    ${TextAnalysis.QualityBpSql} AS quality_bp FROM documents),
        |  s AS (SELECT * FROM q WHERE quality_bp >= $QualityThresholdBp),
        |  e AS (SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM s),
        |  ek AS (SELECT * FROM e WHERE doc_id = keep_id),
        |  d AS (SELECT doc_id, ${Dedup.Shingle3Sql} AS sh FROM ek),
        |  d2 AS (SELECT * FROM d WHERE len(sh) > 0),
        |  p AS (SELECT DISTINCT b.doc_id AS doc_b
        |        FROM d2 a JOIN d2 b ON a.doc_id < b.doc_id
        |        WHERE ROUND(10000.0 * len(list_intersect(a.sh, b.sh))
        |                    / len(list_distinct(a.sh || b.sh))) >= 5000)
        |SELECT doc_id, lang, source, quality_bp FROM ek
        |WHERE doc_id NOT IN (SELECT doc_b FROM p)
        |ORDER BY doc_id""".stripMargin)
}
