package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Content-defined chunking (CDC) over `documents` — sub-document
  * exact dedup, the granularity document-level dedup (q20) can't see.
  * A boilerplate paragraph pasted into thousands of otherwise-distinct
  * pages never trips a whole-document hash; chunk-level dedup finds
  * it. The chunk boundaries are CONTENT-defined (a rolling window
  * hash), not fixed-stride, so inserting or deleting a prefix shifts
  * every byte position yet leaves all chunk boundaries after the edit
  * region unchanged — the property that makes chunk hashes comparable
  * across near-identical documents (the FastCDC/LBFS cut-point idea,
  * applied to corpus dedup).
  *
  * Determinism across engines: the window hash is the repo-standard
  * 60-bit md5 prefix (identical in Spark and DuckDB), taken over the
  * 16-char window ENDING at each position; a cut lands after position
  * i iff hash % 32 == 0 (expected chunk ≈ 32 chars on this corpus's
  * ~300-char docs). The oracle replays boundary detection, chunk
  * extraction, and the cross-doc aggregate bit-for-bit.
  *
  * Scale design (100 TB): chunking is PURELY map-side — each doc's
  * boundaries depend only on its own text, so the corpus is never
  * shuffled; the md5 loop runs in a typed mapPartitions (one digest
  * instance per partition — the Dedup.scala lesson: HOF lambdas
  * evaluate interpreted per element, a JVM loop doesn't). The only
  * exchange in the plan carries (chunk_hash, doc_id) pairs — bounded
  * by total chunk count, partially aggregated map-side — and the
  * repeated-chunk report is a bounded groupBy on the 16-byte hash.
  * No cartesian anywhere; skew is impossible by construction (hash
  * keys are uniform).
  */
object Chunking {

  /** Rolling window length (chars) and cut divisor: a cut is declared
    * after any position whose trailing 16-char window hashes to
    * 0 mod 32 → expected chunk length ≈ 32 chars.
    */
  final val Window = 16
  final val Divisor = 32

  /** Chunks shorter than this are cut-point shrapnel (two boundaries
    * landing a couple of chars apart) — real CDC suppresses them with
    * a stateful min-length scan; here they are simply excluded from
    * the report, which keeps the boundary rule stateless (= exactly
    * SQL-replayable) while the report stays meaningful.
    */
  final val MinChunk = 8

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** 60-bit bucket of the md5 hex prefix — the same engine-portable
    * uniform used by the samplers (q41/q64/q90) and the SimHash token
    * hash: DuckDB replays it as
    * `CAST('0x' || substring(md5(w), 1, 15) AS BIGINT) % Divisor`.
    */
  private def bucket(md: java.security.MessageDigest, w: String): Long =
    java.lang.Long.parseLong(md5Hex(md, w).substring(0, 15), 16) % Divisor

  /** Content-defined chunks of one document, in order. Null/empty-safe
    * (a null doc contributes no chunks — must not kill a 100 TB job).
    * Docs shorter than the window emit themselves as one chunk.
    */
  private[llm] def cdcChunks(md: java.security.MessageDigest,
                             text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val n = text.length
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = Window
    while (i <= n) {
      if (bucket(md, text.substring(i - Window, i)) == 0L) cuts += i
      i += 1
    }
    val bounds = 0 +: cuts.toSeq :+ n
    bounds.sliding(2).collect {
      case Seq(a, b) if b - a >= MinChunk => text.substring(a, b)
    }.toSeq
  }

  /** Reusable operator: (doc_id, chunk_hash) for every CDC chunk of
    * every document — the frame a chunk-level dedup/contamination
    * pipeline builds on. Map-side only; no shuffle.
    */
  def chunkHashes(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select($"doc_id".cast("long"), $"text")
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          cdcChunks(md, text).map(c => (id, md5Hex(md, c)))
        }
      }
      .toDF("doc_id", "chunk_hash")
  }

  /** q197 — repeated-chunk report: every chunk whose exact content
    * appears in ≥ 2 distinct documents, with occurrence counts and
    * the first (lowest-id) document carrying it. The planted near-dup
    * documents in this corpus share most of their text, so their
    * common chunks surface here; at production scale this is the
    * boilerplate/license-header/navigation-chrome detector that runs
    * before span-level cleaning (q191 removes WITHIN-doc repetition;
    * this finds CROSS-doc repetition).
    */
  def q197_cdc_chunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chunkHashes(load(spark, dir, "documents"))
      .groupBy($"chunk_hash")
      .agg(countDistinct($"doc_id").as("n_docs"),
        count(lit(1)).as("n_occ"),
        min($"doc_id").as("first_doc"))
      .filter($"n_docs" >= 2)
      .orderBy($"n_docs".desc, $"n_occ".desc, $"chunk_hash")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q197_cdc_chunks" -> q197_cdc_chunks)

  val oracle: Map[String, String] = Map(
    "q197_cdc_chunks" ->
      s"""WITH d AS (
        |  SELECT doc_id, text, length(text) AS n FROM documents
        |  WHERE text IS NOT NULL AND length(text) > 0),
        |cut AS (
        |  SELECT d.doc_id, i.i
        |  FROM d, unnest(generate_series($Window, CAST(d.n AS INTEGER))) AS i(i)
        |  WHERE CAST('0x' || substring(md5(substring(d.text, i.i - ${Window - 1}, $Window)), 1, 15)
        |        AS BIGINT) % $Divisor = 0),
        |cl AS (SELECT doc_id, list_sort(list(i)) AS cs FROM cut GROUP BY doc_id),
        |wb AS (
        |  SELECT d.doc_id, d.text, [0] || COALESCE(cl.cs, []) || [CAST(d.n AS INTEGER)] AS bs
        |  FROM d LEFT JOIN cl ON d.doc_id = cl.doc_id),
        |ch AS (
        |  SELECT doc_id, md5(substring(text, bs[k.k] + 1, bs[k.k + 1] - bs[k.k])) AS chunk_hash
        |  FROM wb, unnest(generate_series(1, len(bs) - 1)) AS k(k)
        |  WHERE bs[k.k + 1] - bs[k.k] >= $MinChunk)
        |SELECT chunk_hash, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_occ, MIN(doc_id) AS first_doc
        |FROM ch GROUP BY chunk_hash HAVING COUNT(DISTINCT doc_id) >= 2
        |ORDER BY n_docs DESC, n_occ DESC, chunk_hash""".stripMargin)
}
