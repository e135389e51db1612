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

  /** q229 — the dataset card: the one-row release summary a corpus
    * ships with (docs, exact token/char mass, language and source
    * spread, exact-duplicate mass, post-curation survivor count) —
    * every number the card quotes is the SAME statistic its
    * dedicated operator verifies (q19 masses, q20 dup rule, q39
    * survivors), composed here the way a release pipeline stamps its
    * manifest. Two corpus scans (raw stats + the curation chain),
    * both already linear; everything else is 1-row arithmetic.
    */
  def q229_dataset_card(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = load(spark, dir, "documents")
      .select($"lang", $"source", $"n_chars",
        size(split($"text", " ")).cast("long").as("toks"), md5($"text").as("h"))
      .agg(count(lit(1)).as("n_docs"),
        sum($"toks").as("n_tokens"),
        sum($"n_chars").as("n_chars"),
        countDistinct($"lang").as("n_langs"),
        countDistinct($"source").as("n_sources"),
        countDistinct($"h").as("n_unique"))
    val kept = q39_corpus_curation(spark, dir).agg(count(lit(1)).as("n_curated"))
    // n_docs = 0 guard (zero-row degenerate-probe finding): an empty
    // corpus reports NULL rates instead of an ANSI divide-by-zero —
    // oracle-mirrored CASE
    base.crossJoin(kept)
      .select($"n_docs", $"n_tokens", $"n_chars", $"n_langs", $"n_sources",
        ($"n_docs" - $"n_unique").as("n_exact_dups"),
        when($"n_docs" > 0,
          round(lit(10000.0) * ($"n_docs" - $"n_unique") / $"n_docs")
            .cast("long")).as("dup_bp"),
        $"n_curated",
        when($"n_docs" > 0,
          round(lit(10000.0) * $"n_curated" / $"n_docs").cast("long"))
          .as("kept_bp"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q229_dataset_card" -> q229_dataset_card,
    "q39_corpus_curation" -> q39_corpus_curation)

  val oracle: Map[String, String] = Map(
    "q229_dataset_card" ->
      s"""WITH base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        |    CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique
        |  FROM documents),
        |q AS (SELECT doc_id, text, ${TextAnalysis.QualityBpSql} AS quality_bp
        |      FROM documents),
        |s AS (SELECT * FROM q WHERE quality_bp >= $QualityThresholdBp),
        |e AS (SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM s),
        |ek AS MATERIALIZED (SELECT * FROM e WHERE doc_id = keep_id),
        |${Dedup.gramIxOver("ek")},
        |p AS (SELECT DISTINCT db AS doc_b FROM ix
        |      WHERE ROUND(10000.0 * i / (la + lb - i)) >= 5000),
        |kept AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_curated FROM ek
        |         WHERE doc_id NOT IN (SELECT doc_b FROM p))
        |SELECT n_docs, n_tokens, n_chars, n_langs, n_sources,
        |  n_docs - n_unique AS n_exact_dups,
        |  CASE WHEN n_docs > 0 THEN CAST(ROUND(10000.0 * (n_docs - n_unique)
        |    / n_docs) AS BIGINT) END AS dup_bp,
        |  kept.n_curated,
        |  CASE WHEN n_docs > 0 THEN CAST(ROUND(10000.0 * kept.n_curated
        |    / n_docs) AS BIGINT) END AS kept_bp
        |FROM base CROSS JOIN kept""".stripMargin,
    "q39_corpus_curation" ->
      s"""WITH q AS (SELECT doc_id, text, lang, source,
        |    ${TextAnalysis.QualityBpSql} AS quality_bp FROM documents),
        |  s AS (SELECT * FROM q WHERE quality_bp >= $QualityThresholdBp),
        |  e AS (SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM s),
        |  ek AS MATERIALIZED (SELECT * FROM e WHERE doc_id = keep_id),
        |  ${Dedup.gramIxOver("ek")},
        |  p AS (SELECT DISTINCT db AS doc_b FROM ix
        |        WHERE ROUND(10000.0 * i / (la + lb - i)) >= 5000)
        |SELECT doc_id, lang, source, quality_bp FROM ek
        |WHERE doc_id NOT IN (SELECT doc_b FROM p)
        |ORDER BY doc_id""".stripMargin)
}
