package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Near-duplicate detection over `documents` — the three standard
  * families an LLM training-data pipeline runs before anything else:
  *
  *  - MinHash + banded LSH (q23): shingle → 64-hash signature →
  *    16 bands × 4 rows → bucket join → exact-Jaccard verify on the
  *    candidates only. Never all-pairs: the only joins are equi-joins
  *    on band keys (shuffle-partitioned by bucket) and on doc_id.
  *    With J≥0.5 targets, P(miss) per pair is (1-0.5⁴)¹⁶ ≈ 0.35 at
  *    the threshold boundary and < 4e-8 for the J≥0.9 dups this
  *    corpus plants — and the oracle checks exact equality at sf0.01.
  *  - SimHash (q24): 60-bit weighted fingerprint from md5-derived
  *    token hashes; pigeonhole blocking on 4 × 15-bit chunks
  *    guarantees any pair within Hamming distance 3 shares a chunk —
  *    candidate generation is again a bucket equi-join, exact Hamming
  *    on candidates only.
  *  - Blocked exact n-gram Jaccard (q25): exact bigram Jaccard inside
  *    a blocking key (source) — the pattern for "compare only within
  *    a partition-sized block" dedup.
  *
  * Determinism across engines: token hashes are md5-derived 60-bit
  * ints (identical in Spark and DuckDB); similarity is emitted in
  * basis points via the same double expression on both sides; MinHash
  * internals use Spark's xxhash64 but never leak into the output —
  * the output is the *exact* Jaccard of the candidate pairs, which
  * the oracle recomputes all-pairs.
  */
object Dedup {

  /** Distinct word-3-gram shingle set; empty for docs under 3 tokens
    * (guarded — `sequence(0, negative)` would count down).
    */
  private def shingles3(text: Column): Column = {
    val w = split(text, " ")
    when(size(w) >= 3,
      array_distinct(transform(sequence(lit(0), size(w) - 3),
        i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3)))))
      .otherwise(array().cast("array<string>"))
  }

  private def shingles2(text: Column): Column = {
    val w = split(text, " ")
    when(size(w) >= 2,
      array_distinct(transform(sequence(lit(0), size(w) - 2),
        i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact Jaccard in basis points — identical double expression in
    * DuckDB (`ROUND(10000.0 * i / u)`), so bit-equal results.
    */
  private def jaccardBp(a: Column, b: Column): Column =
    round(lit(10000.0) * size(array_intersect(a, b)) / size(array_union(a, b))).cast("long")

  final val NumHashes = 64
  final val NumBands = 16
  final val RowsPerBand = 4

  /** MinHash-LSH near-dup pairs with exact-Jaccard verification.
    * Output: (doc_a, doc_b, j_bp) for pairs with Jaccard ≥ 0.5 on
    * word-3-gram shingle sets.
    */
  def q23_minhash_dedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = load(spark, dir, "documents")
      .select($"doc_id", shingles3($"text").as("sh"))
      .filter(size($"sh") > 0)

    // 64-way MinHash signature: sig[k] = min over shingles of
    // xxhash64(shingle, k). Computed with codegen'd higher-order
    // functions — one narrow projection, no shuffle, no UDF.
    val sig = transform(sequence(lit(0), lit(NumHashes - 1)),
      k => aggregate($"sh", lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(s, k))))

    // 16 bands of 4 rows; band key = the 4 signature slots joined.
    // posexplode-style fan-out: 16 rows per doc, bucketed by
    // (band_idx, band_key) — the LSH join key.
    val bands = docs
      .withColumn("sig", sig)
      .select($"doc_id", explode(transform(sequence(lit(0), lit(NumBands - 1)),
        b => struct(b.as("band_idx"),
          concat_ws(",", slice($"sig", b * RowsPerBand + 1, lit(RowsPerBand))).as("band_key")))).as("bk"))
      .select($"doc_id", $"bk.band_idx", $"bk.band_key")

    // Bucket self-join: pairs sharing any band. Equi-join on the
    // bucket key — shuffle-partitioned, never cartesian. distinct()
    // collapses multi-band collisions before the (more expensive)
    // exact verify.
    val cand = bands.as("a").join(bands.as("b"),
        $"a.band_idx" === $"b.band_idx" && $"a.band_key" === $"b.band_key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()

    // Exact verify on candidates only: join shingle sets back in
    // (equi-joins on doc_id) and compute true Jaccard.
    cand
      .join(docs.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
      .join(docs.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
      .select($"doc_a", $"doc_b", jaccardBp($"sh_a", $"sh_b").as("j_bp"))
      .filter($"j_bp" >= 5000)
      .orderBy($"doc_a", $"doc_b")
  }

  final val SimHashBits = 60
  final val SimChunks = 4
  final val ChunkBits = 15
  final val MaxHamming = 3

  /** 60-bit weighted SimHash from md5-derived token hashes — the md5
    * route keeps the fingerprint engine-independent so DuckDB
    * recomputes it exactly. Token multiplicity weights the votes.
    */
  private val simhashExpr: Column = expr(
    s"""aggregate(sequence(0, ${SimHashBits - 1}), cast(0 as bigint), (acc, i) ->
       |  acc + if(aggregate(th_arr, cast(0 as bigint), (a2, h) ->
       |             a2 + if((shiftright(h, i) & 1) = 1, cast(1 as bigint), cast(-1 as bigint))) > 0,
       |           shiftleft(cast(1 as bigint), i), cast(0 as bigint)))""".stripMargin)

  /** SimHash near-dup pairs: Hamming distance ≤ 3 over the 60-bit
    * fingerprint. Blocking: any pair within distance 3 must agree on
    * at least one of the 4 15-bit chunks (pigeonhole), so candidate
    * generation is an equi-join on (chunk_idx, chunk_value).
    */
  def q24_simhash_dedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = load(spark, dir, "documents")
      .select($"doc_id",
        expr("transform(split(text, ' '), w -> cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint))")
          .as("th_arr"))
      .withColumn("simhash", simhashExpr)
      .select($"doc_id", $"simhash")

    // Chunk extraction shifts by the lambda variable, which the Column
    // API's shiftright(col, Int) can't express — selectExpr keeps it
    // in (codegen'd) SQL.
    val chunked = docs.selectExpr("doc_id", "simhash",
      s"explode(transform(sequence(0, ${SimChunks - 1}), c -> struct(c as chunk_idx, (shiftright(simhash, c * $ChunkBits) & ${(1L << ChunkBits) - 1}) as chunk_val))) as ck")
      .select($"doc_id", $"simhash", $"ck.chunk_idx", $"ck.chunk_val")

    chunked.as("a").join(chunked.as("b"),
        $"a.chunk_idx" === $"b.chunk_idx" && $"a.chunk_val" === $"b.chunk_val" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        bit_count($"a.simhash".bitwiseXOR($"b.simhash")).cast("long").as("hamming"))
      .distinct()
      .filter($"hamming" <= MaxHamming)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Blocked exact bigram-Jaccard: compare only within the `source`
    * blocking key (block-local pairs, the "compare within partition"
    * dedup pattern). Threshold 0.3.
    */
  def q25_ngram_jaccard_blocked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = load(spark, dir, "documents")
      .select($"doc_id", $"source", shingles2($"text").as("sh"))
      .filter(size($"sh") > 0)
    docs.as("a").join(docs.as("b"),
        $"a.source" === $"b.source" && $"a.doc_id" < $"b.doc_id")
      .select($"a.source".as("source"), $"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        jaccardBp($"a.sh", $"b.sh").as("j_bp"))
      .filter($"j_bp" >= 3000)
      .orderBy($"source", $"doc_a", $"doc_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_minhash_dedup" -> q23_minhash_dedup,
    "q24_simhash_dedup" -> q24_simhash_dedup,
    "q25_ngram_jaccard_blocked" -> q25_ngram_jaccard_blocked)

  // Oracles recompute the *exact* similarity all-pairs (feasible at
  // sf0.01's 500 docs; the Spark side must find the same pairs via
  // LSH/blocking — that equality is precisely what's being graded).
  private val Shingle3Sql =
    """list_distinct(list_transform(generate_series(1, greatest(len(string_split(text,' '))-2, 0)),
      |  i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2]))""".stripMargin

  private val Shingle2Sql =
    """list_distinct(list_transform(generate_series(1, greatest(len(string_split(text,' '))-1, 0)),
      |  i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]))""".stripMargin

  private val SimHashSql =
    s"""list_sum(list_transform(generate_series(0, ${SimHashBits - 1}), i ->
       |  CASE WHEN list_sum(list_transform(th_arr, h ->
       |         CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END)) > 0
       |       THEN (CAST(1 AS BIGINT) << i) ELSE 0 END))""".stripMargin

  val oracle: Map[String, String] = Map(
    "q23_minhash_dedup" ->
      s"""WITH d AS (SELECT doc_id, $Shingle3Sql AS sh FROM documents),
        |     d2 AS (SELECT * FROM d WHERE len(sh) > 0)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(ROUND(10000.0 * len(list_intersect(a.sh, b.sh))
        |             / len(list_distinct(a.sh || b.sh))) AS BIGINT) AS j_bp
        |FROM d2 a JOIN d2 b ON a.doc_id < b.doc_id
        |WHERE ROUND(10000.0 * len(list_intersect(a.sh, b.sh))
        |            / len(list_distinct(a.sh || b.sh))) >= 5000
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q24_simhash_dedup" ->
      s"""WITH t AS (SELECT doc_id,
        |    list_transform(string_split(text, ' '),
        |      w -> CAST('0x' || substring(md5(w), 1, 15) AS BIGINT)) AS th_arr
        |  FROM documents),
        |  s AS (SELECT doc_id, $SimHashSql AS simhash FROM t)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= $MaxHamming
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q25_ngram_jaccard_blocked" ->
      s"""WITH d AS (SELECT doc_id, source, $Shingle2Sql AS sh FROM documents),
        |     d2 AS (SELECT * FROM d WHERE len(sh) > 0)
        |SELECT a.source AS source, a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(ROUND(10000.0 * len(list_intersect(a.sh, b.sh))
        |             / len(list_distinct(a.sh || b.sh))) AS BIGINT) AS j_bp
        |FROM d2 a JOIN d2 b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE ROUND(10000.0 * len(list_intersect(a.sh, b.sh))
        |            / len(list_distinct(a.sh || b.sh))) >= 3000
        |ORDER BY source, doc_a, doc_b""".stripMargin)
}
