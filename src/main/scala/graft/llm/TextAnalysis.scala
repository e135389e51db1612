package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Text-analysis operators for a large-scale training-data pipeline,
  * run over the `documents` table (doc_id, text, lang, source,
  * n_chars). These extend the reference's capability surface (the
  * reference ingests transit text columns but never analyzes them)
  * with the corpus-statistics layer an LLM data pipeline needs:
  * token counting, quality scoring, language-ID, content hashing.
  *
  * Design rules shared by every operator here:
  *  - All outputs are integers (counts / basis points) so results are
  *    bit-identical across engines and partition orders — the same
  *    exact-arithmetic discipline as Tables.cents.
  *  - Everything is a single narrow projection + partial/final
  *    aggregation; no shuffle beyond the final groupBy, no driver
  *    collect, no UDFs — all codegen'd built-ins, so the operators run
  *    unchanged against 100 TB of parquet shards.
  */
object TextAnalysis {

  /** Whitespace tokens. Spark `split` keeps trailing empty strings
    * (limit -1), matching DuckDB's string_split — both engines see
    * identical token lists.
    */
  private def wsTokens(text: Column): Column = split(text, " ")

  /** BPE-ish lexer: letter runs, digit runs, single non-alphanumerics.
    * Same regex class semantics in Java regex and DuckDB's RE2.
    */
  final val TokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Corpus statistics per (lang, source): document counts, exact
    * char/token sums, average document length in centichars.
    * One scan, one partial+final aggregation.
    */
  def q19_text_stats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "documents")
      .select($"lang", $"source",
        length($"text").as("chars"),
        size(wsTokens($"text")).as("ws_toks"),
        size(regexp_extract_all($"text", lit(TokenPattern), lit(0))).as("bpe_toks"))
      .groupBy($"lang", $"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"chars").as("sum_chars"),
        sum($"ws_toks").as("sum_ws_tokens"),
        sum($"bpe_toks").as("sum_bpe_tokens"),
        round(sum($"chars") * 100.0 / count(lit(1))).cast("long").as("avg_chars_centi"))
      .orderBy($"lang", $"source")
  }

  /** Exact content dedup: md5 content fingerprint, first-wins keeper
    * per fingerprint group (min doc_id — deterministic across any
    * partitioning). Emits every doc with its keeper so the result is
    * non-trivial even on a dup-free corpus. The window partitions on
    * the high-cardinality hash, so state shards evenly at scale.
    */
  def q20_exact_dedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"content_hash")
    load(spark, dir, "documents")
      .select($"doc_id", md5($"text").as("content_hash"))
      .withColumn("keep_id", min($"doc_id").over(w))
      .withColumn("is_dup", ($"doc_id" =!= $"keep_id").cast("int"))
      .orderBy($"doc_id")
  }

  private val StopWords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** The q21 quality formula as a standalone column — reused by
    * CorpusPipeline's filter stage. Must stay in lockstep with q21's
    * inline computation and QualityBpSql below.
    */
  private[llm] def qualityBp(text: Column): Column = {
    val toks = wsTokens(text)
    val stopHits = size(filter(toks, w => w.isInCollection(StopWords)))
    val nPunct = size(regexp_extract_all(text, lit("[^A-Za-z0-9 ]"), lit(0)))
    least(lit(10000L), greatest(lit(0L),
      lit(5000L) + stopHits * 120L - nPunct * 40L +
        least(size(toks).cast("long"), lit(100L)) * 10L))
  }

  /** DuckDB rendering of the same formula. */
  private[llm] val QualityBpSql: String =
    """LEAST(10000, GREATEST(0,
      |  5000 + len(list_filter(string_split(text, ' '),
      |           w -> w IN ('the','a','of','and','to','in','is'))) * 120
      |       - len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) * 40
      |       + LEAST(len(string_split(text, ' ')), 100) * 10))""".stripMargin

  /** Per-document quality score (basis points): rewards stopword
    * presence and length, penalizes punctuation density — the classic
    * cheap pre-filter before expensive pipeline stages. Pure integer
    * arithmetic end-to-end.
    */
  def q21_quality_score(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "documents")
      .select($"doc_id", $"lang",
        length($"text").as("chars"),
        size(wsTokens($"text")).as("n_toks"),
        size(regexp_extract_all($"text", lit("[^A-Za-z0-9 ]"), lit(0))).as("n_punct"),
        size(filter(wsTokens($"text"), w => w.isInCollection(StopWords))).as("stop_hits"))
      .withColumn("quality_bp",
        least(lit(10000L), greatest(lit(0L),
          lit(5000L) + $"stop_hits" * 120L - $"n_punct" * 40L +
            least($"n_toks".cast("long"), lit(100L)) * 10L)))
      .orderBy($"doc_id")
  }

  private val Lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "et", "est", "un"),
    "de" -> Seq("der", "die", "und", "ist", "ein"),
    "es" -> Seq("el", "los", "y", "es", "un"))

  /** Language-ID by stopword-lexicon voting (the n-gram-heuristic
    * family): count lexicon hits per language, argmax with a fixed
    * deterministic tie-break (en > fr > de > es), 'und' when no
    * lexicon fires. Emitted as a (label × prediction) confusion
    * matrix — one scan + one aggregation.
    */
  def q22_lang_id(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = wsTokens($"text")
    val hits = Lexicons.map { case (l, lex) =>
      size(filter(toks, w => w.isInCollection(lex))).as(s"h_$l")
    }
    val pred = when($"h_en" + $"h_fr" + $"h_de" + $"h_es" === 0, lit("und"))
      .when($"h_en" >= $"h_fr" && $"h_en" >= $"h_de" && $"h_en" >= $"h_es", lit("en"))
      .when($"h_fr" >= $"h_de" && $"h_fr" >= $"h_es", lit("fr"))
      .when($"h_de" >= $"h_es", lit("de"))
      .otherwise(lit("es"))
    load(spark, dir, "documents")
      .select(($"lang" +: hits): _*)
      .withColumn("predicted", pred)
      .groupBy($"lang", $"predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy($"lang", $"predicted")
  }

  final val GramChars = 8
  final val WinnowWindow = 4

  /** Winnowing fingerprints (the rolling-hash document-fingerprint
    * family, Schleimer/Wilkerson/Aiken): hash every 8-char gram, keep
    * the min of each 4-gram window, distinct. The hash is md5-derived
    * (top 60 bits) so DuckDB recomputes it exactly; the per-doc loop
    * runs in mapPartitions (one digest per partition) — same
    * HOF-interpretation rationale as the Dedup sketches.
    */
  private[llm] def winnowFingerprints(md: java.security.MessageDigest, text: String): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val n = text.length - GramChars + 1
    if (n <= 0) return Array.emptyLongArray
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(text.substring(i, i + GramChars)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      h(i) = v >>> 4
      i += 1
    }
    val set = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i <= n - WinnowWindow) {
      var m = h(i)
      var j = 1
      while (j < WinnowWindow) { if (h(i + j) < m) m = h(i + j); j += 1 }
      set.add(m)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }

  /** Per-document winnowing-fingerprint stats — the compact sketch a
    * plagiarism/containment pipeline indexes instead of full text.
    */
  def q35_fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "documents")
      .select($"doc_id".cast("long"), $"text").as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val fp = winnowFingerprints(md, text)
          (id, fp.length.toLong,
            if (fp.isEmpty) None else Some(fp.min),
            if (fp.isEmpty) None else Some(fp.max))
        }
      }
      .toDF("doc_id", "n_fp", "min_fp", "max_fp")
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q19_text_stats" -> q19_text_stats,
    "q20_exact_dedup" -> q20_exact_dedup,
    "q21_quality_score" -> q21_quality_score,
    "q22_lang_id" -> q22_lang_id,
    "q35_fingerprint" -> q35_fingerprint)

  val oracle: Map[String, String] = Map(
    "q35_fingerprint" ->
      s"""WITH g AS (SELECT doc_id,
        |    list_transform(generate_series(1, greatest(length(text) - ${GramChars - 1}, 0)),
        |      i -> CAST('0x' || substring(md5(substring(text, i, $GramChars)), 1, 15) AS BIGINT)) AS h
        |  FROM documents),
        |  f AS (SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(h) - ${WinnowWindow - 1}, 0)),
        |      i -> list_min(h[i:i+${WinnowWindow - 1}]))) AS fp
        |  FROM g)
        |SELECT doc_id, CAST(len(fp) AS BIGINT) AS n_fp,
        |  list_min(fp) AS min_fp, list_max(fp) AS max_fp
        |FROM f ORDER BY doc_id""".stripMargin,
    "q19_text_stats" ->
      s"""SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_ws_tokens,
        |  CAST(SUM(len(regexp_extract_all(text, '$TokenPattern'))) AS BIGINT) AS sum_bpe_tokens,
        |  CAST(ROUND(SUM(length(text)) * 100.0 / COUNT(*)) AS BIGINT) AS avg_chars_centi
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q20_exact_dedup" ->
      """SELECT doc_id, md5(text) AS content_hash,
        |  MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id,
        |  CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS INT) AS is_dup
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q21_quality_score" ->
      """SELECT doc_id, lang, length(text) AS chars,
        |  len(string_split(text, ' ')) AS n_toks,
        |  len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct,
        |  len(list_filter(string_split(text, ' '),
        |      w -> w IN ('the','a','of','and','to','in','is'))) AS stop_hits,
        |  LEAST(10000, GREATEST(0,
        |    5000 + len(list_filter(string_split(text, ' '),
        |             w -> w IN ('the','a','of','and','to','in','is'))) * 120
        |         - len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) * 40
        |         + LEAST(len(string_split(text, ' ')), 100) * 10)) AS quality_bp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q22_lang_id" ->
      """WITH h AS (SELECT lang,
        |    len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and','is'))) AS h_en,
        |    len(list_filter(string_split(text,' '), w -> w IN ('le','la','et','est','un'))) AS h_fr,
        |    len(list_filter(string_split(text,' '), w -> w IN ('der','die','und','ist','ein'))) AS h_de,
        |    len(list_filter(string_split(text,' '), w -> w IN ('el','los','y','es','un'))) AS h_es
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN h_en + h_fr + h_de + h_es = 0 THEN 'und'
        |       WHEN h_en >= h_fr AND h_en >= h_de AND h_en >= h_es THEN 'en'
        |       WHEN h_fr >= h_de AND h_fr >= h_es THEN 'fr'
        |       WHEN h_de >= h_es THEN 'de' ELSE 'es' END AS predicted,
        |  COUNT(*) AS n
        |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
