package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Training-data preparation operators beyond cleaning/dedup: the
  * corpus-shaping stages a 100 TB pipeline runs between "filtered
  * documents" and "tokenizer-ready shards". Extends the reference's
  * capability surface (its silver layer stops at normalization,
  * `/root/reference/dags/gtfs_silver.py:125-213`) the same way
  * Dedup/Similarity do — see SURVEY.md §2.13.
  *
  * Scale design notes, per operator:
  *  - sampling/mixing decisions are pure hash functions of the row
  *    (md5-derived, engine-independent) — stateless map-side filters,
  *    no shuffle, reproducible under any partitioning or retry;
  *  - mixture rates derive from a per-source aggregate that is tiny
  *    (|sources| rows) and broadcast back — the corpus never shuffles;
  *  - contamination joins on n-gram hashes (equi-join), never
  *    doc × doc;
  *  - grouped running folds (shard packing's per-lang prefix sum,
  *    negative sampling's per-source rank) run the two-phase
  *    range-partition scan ([[groupedPrefixSum]]) — low-cardinality
  *    group keys never become per-group window funnels.
  */
object DataPrep {

  /** Top 60 bits of md5 as a positive long — identical to DuckDB's
    * CAST('0x' || substring(md5(s),1,15) AS BIGINT) (see Dedup q24).
    */
  private def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def wsToks(text: Column): Column = size(split(text, " "))

  // ---------------------------------------------------------------
  // q41 — stratified sampling
  // ---------------------------------------------------------------

  /** Per-language target rates in basis points. A real pipeline reads
    * these from config; fixed literals keep the oracle total.
    */
  final val SampleRateBp: Map[String, Int] =
    Map("en" -> 5000, "fr" -> 3000, "de" -> 2000, "es" -> 1500)
  final val SampleRateDefaultBp = 1000

  private def rateBp(lang: Column): Column =
    SampleRateBp.foldLeft(lit(SampleRateDefaultBp)) { case (acc, (l, r)) =>
      when(lang === l, r).otherwise(acc)
    }

  /** Deterministic hash-based stratified sampling: doc kept iff
    * md5("graft_sample_" || doc_id) mod 10000 falls under its
    * language's rate. No RNG, no state — the sample is a pure
    * function of the row, so it is identical across runs, retries,
    * and partitionings (the property that matters for reproducible
    * training mixes at scale).
    */
  def q41_stratified_sample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "documents")
      .select($"doc_id", $"lang",
        (hash60(concat(lit("graft_sample_"), $"doc_id".cast("string"))) % 10000)
          .as("h_bp"),
        rateBp($"lang").cast("long").as("rate_bp"))
      .filter($"h_bp" < $"rate_bp")
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------
  // q205 — DSIR-style target-affinity data selection
  // ---------------------------------------------------------------

  /** The "curated target" slice q205 selects toward. */
  final val DsirTargetSources: Seq[String] = Seq("src0", "src1", "src2", "src3")
  final val DsirTopK = 50

  /** Core of q205, factored for fixture-driven specs: rank the
    * non-target docs by how much their unigram distribution resembles
    * the target slice's. Per word w the affinity is
    * round(1e6 · c_target(w) / c_total(w)) — an INTEGER micro-ratio,
    * so the per-doc score is an exact integer sum (no float
    * accumulation order anywhere; the only division is the final
    * per-doc average, a ratio of two longs both engines round
    * identically). This is the hashed-n-gram importance-weighting
    * shape of DSIR (Xie et al. 2023) with unigram features and a
    * ratio score in place of the log-likelihood ratio — monotone in
    * the same per-word evidence, and exactly SQL-replayable.
    *
    * Scale: one explode pass, one partial+final aggregate keyed on
    * the word, one equi-join back on the word (Zipf-hot words are
    * skewed JOIN keys — AQE skew-join splits them; the downstream
    * agg is per-doc), one partial+final per-doc aggregate, and a
    * TakeOrdered global top-k — no windows, no driver data.
    */
  def dsirSelect(docs: DataFrame, isTarget: Column, k: Int = DsirTopK): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = graft.Caches.tracked(
      docs.select($"doc_id".cast("long").as("doc_id"), isTarget.as("tgt"),
        explode(split($"text", " ")).as("w")))
    val aff = toks.groupBy($"w")
      .agg(round(lit(1000000.0) * sum(when($"tgt", 1L).otherwise(0L)) / count(lit(1)))
        .cast("long").as("aff_micro"))
    toks.filter(!$"tgt").join(aff, "w")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_toks"), sum($"aff_micro").as("aff_sum"))
      .withColumn("aff_avg_micro", round(lit(1.0) * $"aff_sum" / $"n_toks").cast("long"))
      .select($"doc_id", $"n_toks", $"aff_sum", $"aff_avg_micro")
      .orderBy($"aff_avg_micro".desc, $"doc_id")
      .limit(k)
  }

  /** q205 — data selection for a target domain: score every
    * non-curated doc by target-unigram affinity, keep the top 50.
    */
  def q205_dsir_select(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dsirSelect(load(spark, dir, "documents"),
      $"source".isin(DsirTargetSources.map(x => x: Any): _*))
  }

  /** q74 — importance (weighted) sampling: each doc's inclusion
    * probability IS its quality score (p = quality_bp / 10000), so
    * high-quality docs are kept preferentially while every kept row
    * carries the exact inverse-probability weight (Horvitz-Thompson:
    * any downstream sum reweighted by w is an unbiased estimate of
    * the full-corpus sum). Same deterministic md5 acceptance as q41 —
    * a pure per-row map: no RNG, no state, identical under any
    * partitioning, retry, or speculative re-execution. The weight is
    * integer floor-division (10^8 div quality_bp, 1e-4 units), so
    * both engines compute it bit-identically.
    */
  def q74_importance_sample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "documents")
      .select($"doc_id", $"lang", TextAnalysis.qualityBp($"text").as("quality_bp"),
        (hash60(concat(lit("graft_weight_"), $"doc_id".cast("string"))) % 10000)
          .as("h_bp"))
      .filter($"h_bp" < $"quality_bp")
      .withColumn("w_x4", expr("CAST(100000000 AS BIGINT) div quality_bp"))
      .select($"doc_id", $"lang", $"quality_bp", $"w_x4")
      .orderBy($"doc_id")
  }

  final val WrsPerLang = 10

  /** q201 — weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006, "Weighted random sampling with a reservoir",
    * A-ES): per language, keep the `WrsPerLang` documents with the
    * largest priority u^(1/w), where u is a per-doc uniform and
    * w the token weight — the one-pass distributed primitive for
    * "sample k docs ∝ token mass, no repeats" that q41 (fixed strata
    * rates) and q74 (with-replacement importance weights) don't
    * cover: heavy docs are favored, a doc can't be drawn twice, and
    * exactly k survive per group regardless of weight skew.
    *
    * Determinism across engines: u = (h+1)/2^60 from the repo's
    * md5-60-bit uniform, ranking on the monotone-equivalent
    * round(1e6·ln(u)/w) (largest first) with doc-id tie-breaks — the
    * log is the one transcendental, micro-rounded like every cosine
    * in the ANN family so a last-ulp libm difference can't flip the
    * hash.
    *
    * Scale design: the priority key is computed map-side from doc_id
    * and the token count (no joins, no state); the per-lang top-k
    * rank-filter is the exact pattern `RankLimitRewrite` turns into
    * bounded partial/final heaps — per-partition O(k) memory with a
    * k-row-per-group exchange, so few-language corpora do NOT funnel
    * a language through one task's full sort (the low-cardinality
    * window trap lintGroupedWindows exists for).
    */
  def q201_weighted_sample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = load(spark, dir, "documents")
      .select($"doc_id", $"lang", wsToks($"text").cast("long").as("toks"))
      .filter($"toks" > 0)
      .withColumn("u",
        (hash60(concat(lit("graft_wrs_"), $"doc_id".cast("string"))) + lit(1L))
          .cast("double") / lit(1152921504606846976.0)) // 2^60
      .withColumn("key_micro", round(log($"u") / $"toks" * 1e6).cast("long"))
    val w = Window.partitionBy($"lang").orderBy($"key_micro".desc, $"doc_id")
    keyed.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= WrsPerLang)
      .select($"lang", $"rank", $"doc_id", $"toks", $"key_micro")
      .orderBy($"lang", $"rank")
  }

  // ---------------------------------------------------------------
  // q42 — mixture balancing
  // ---------------------------------------------------------------

  /** Source-mixture balancing: compute per-source acceptance rates
    * that downsample every source to the token mass of the smallest
    * one (equal-share mixture), then apply them with the same
    * hash-filter as q41. Two tiny aggregates (|sources| rows) are
    * broadcast back onto the corpus scan — the full corpus is never
    * shuffled, only scanned twice (stats pass + filter pass); at
    * scale the stats pass runs on a sample or a maintained catalog.
    */
  def q42_mixture_rates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = load(spark, dir, "documents")
      .select($"doc_id", $"source", wsToks($"text").cast("long").as("toks"))

    val perSource = docs.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"toks").as("sum_toks"))
    val minToks = perSource.agg(min($"sum_toks").as("min_toks"))
    val rates = perSource.crossJoin(broadcast(minToks))
      .select($"source", $"n_docs", $"sum_toks",
        round($"min_toks" * 1e6 / $"sum_toks").cast("long").as("rate_micro"))

    val kept = docs.join(broadcast(rates.select($"source", $"rate_micro")), "source")
      .filter(hash60(concat(lit("graft_mix_"), $"doc_id".cast("string"))) % 1000000
        < $"rate_micro")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_kept"), sum($"toks").as("kept_toks"))

    rates.join(broadcast(kept), Seq("source"), "left")
      .select($"source", $"n_docs", $"sum_toks", $"rate_micro",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        coalesce($"kept_toks", lit(0L)).as("kept_toks"))
      .orderBy($"source")
  }

  // ---------------------------------------------------------------
  // q43 — PII redaction
  // ---------------------------------------------------------------

  /** ASCII-only patterns that parse identically under Java regex and
    * DuckDB's RE2 (no backreferences, no lookaround).
    */
  final val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  final val PhoneRe = "\\+[0-9][0-9 ]+[0-9]"

  /** PII scrubbing: detect + redact emails/phone numbers, emit match
    * counts and a fingerprint of the redacted text. The harness corpus
    * is synthetic and PII-free, so deterministic PII is injected from
    * doc_id first (same construction on the oracle side) — the q29
    * pattern: synthesize adversarial input in-query, verify the
    * operator on it. Pure per-row map, no shuffle.
    */
  def q43_pii_redact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withPii = concat(
      $"text",
      when($"doc_id" % 7 === 0,
        concat(lit(" contact user"), $"doc_id".cast("string"),
          lit("@mail.example.com"))).otherwise(lit("")),
      when($"doc_id" % 11 === 0,
        concat(lit(" tel +33 6 12 34 "), ($"doc_id" % 90 + 10).cast("string")))
        .otherwise(lit("")))
    load(spark, dir, "documents")
      .select($"doc_id", withPii.as("t"))
      .select($"doc_id",
        size(regexp_extract_all($"t", lit(EmailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all($"t", lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
        hash60(regexp_replace(regexp_replace($"t", EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>")).as("redacted_h"))
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------
  // q44 — eval-set contamination
  // ---------------------------------------------------------------

  final val ContamGramWords = 5
  final val ContamMinShared = 2
  /** Harness eval split: every 17th doc plays the benchmark set. */
  final val EvalModulus = 17

  /** Distinct md5-60-bit hashes of a doc's word n-grams — identical
    * to the oracle's `CAST('0x' || substring(md5(gram),1,15) AS
    * BIGINT)` (big-endian first 8 digest bytes >>> 4, the q35
    * winnowing convention).
    */
  private[llm] def gramHashes(md: java.security.MessageDigest, text: String,
                              n: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val words = text.split(" ", -1)
    if (words.length < n) return Array.emptyLongArray
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i <= words.length - n) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      set.add(v >>> 4)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }

  /** Positional variant of [[gramHashes]] for span detection (q204):
    * every gram start keeps its 1-based word index, nothing deduped —
    * the same md5-60-bit hash convention as the oracle's
    * `CAST('0x' || substring(md5(gram),1,15) AS BIGINT)`.
    */
  private[llm] def gramHashesWithPos(md: java.security.MessageDigest, text: String,
                                     n: Int): Array[(Long, Long)] = {
    if (text == null) return Array.empty
    val words = text.split(" ", -1)
    if (words.length < n) return Array.empty
    val out = new Array[(Long, Long)](words.length - n + 1)
    var i = 0
    while (i <= words.length - n) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      out(i) = (i + 1L, v >>> 4)
      i += 1
    }
    out
  }

  /** Core of q44, factored for fixture-driven specs: flag (corpus,
    * eval) doc pairs sharing >= ContamMinShared distinct word
    * 5-grams. Grams are md5-hashed 60-bit longs (engine-independent);
    * candidate generation is an equi-join on the gram hash — never
    * doc × doc. The gram pass is one narrow mapPartitions (per-doc
    * distinct inside the loop — no global distinct shuffle; measured
    * 16 s → map-side at 100k docs in LlmScaleBench). At 100 TB the
    * eval side is small → broadcast; the per-pair count is a
    * partial+final aggregate.
    */
  def contaminationPairs(docs: DataFrame, isEval: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = graft.Caches.tracked(docs
      .select($"doc_id".cast("long"), isEval.as("is_eval"), $"text")
      .as[(Long, Boolean, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, ev, text) =>
          gramHashes(md, text, ContamGramWords).map(g => (id, ev, g))
        }
      }
      .toDF("doc_id", "is_eval", "g"))
      // both the eval and corpus filters consume this frame — tracked-
      // persist so the md5 gram pass runs once (see Dedup.sketches)
    val eval = grams.filter($"is_eval").select($"doc_id".as("eval_doc"), $"g")
    val corpus = grams.filter(!$"is_eval").select($"doc_id".as("corpus_doc"), $"g")
    corpus.join(broadcast(eval), "g")
      .groupBy($"corpus_doc", $"eval_doc")
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= ContamMinShared)
      .orderBy($"corpus_doc", $"eval_doc")
  }

  def q44_contamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    contaminationPairs(load(spark, dir, "documents"), $"doc_id" % EvalModulus === 0)
  }

  // ---------------------------------------------------------------
  // q45 — shard packing
  // ---------------------------------------------------------------

  final val ShardTokenBudget = 2000L

  /** Two-phase per-GROUP exclusive prefix sum — the q76/q134
    * distributed-total-order pattern generalized to grouped running
    * folds, for the case where the group key is LOW-cardinality
    * (lang, source): a `Window.partitionBy(group)` would serialize
    * each group's full row set through one task — survivable at
    * sf0.1, a funnel at 100 TB, and exactly what PlanLint's
    * `low-cardinality-partition-window` rule flags. Instead:
    * range-repartition on (group, id) — each group SPANS partitions,
    * so parallelism is data-sized, not group-sized — sort within
    * partitions, ship one (group → weight subtotal) map per partition
    * to the driver (O(partitions × groups-per-partition) longs, never
    * rows; a partition holds a contiguous (group, id) range so it
    * touches few groups), prefix-fold those into per-partition seed
    * offsets, and run an independent seeded scan per partition.
    * Deterministic for any sampled range boundaries because
    * (group, id) is a unique total order.
    *
    * The single `.rdd` instance is load-bearing (q134): both jobs
    * must see the SAME RangePartitioner sample, or the offsets would
    * not line up with the partitions.
    *
    * Returns (group, id, weight, cum0) with cum0 = Σ weight over
    * rows of the same group strictly before id.
    */
  private[graft] def groupedPrefixSum(rows: DataFrame, group: String, id: String,
                                      weight: String): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val sorted = rows
      .select(col(group).cast("string"), col(id).cast("long"), col(weight).cast("long"))
      .as[(String, Long, Long)]
      .repartitionByRange(32, col(group), col(id))
      .sortWithinPartitions(col(group), col(id))
    val rdd = sorted.rdd
    val perPart: Array[Map[String, Long]] = rdd.mapPartitions { it =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { case (g, _, w) => m.update(g, m.getOrElse(g, 0L) + w) }
      Iterator(m.toMap)
    }.collect()
    val offsets: Array[Map[String, Long]] = perPart
      .scanLeft(Map.empty[String, Long]) { (acc, m) =>
        m.foldLeft(acc) { case (a, (g, w)) => a.updated(g, a.getOrElse(g, 0L) + w) }
      }
      .dropRight(1)
    rdd.mapPartitionsWithIndex { (i, it) =>
      val cum = scala.collection.mutable.HashMap.empty[String, Long]
      offsets(i).foreach { case (g, w) => cum(g) = w }
      it.map { case (g, rowId, w) =>
        val before = cum.getOrElse(g, 0L)
        cum(g) = before + w
        (g, rowId, w, before)
      }
    }.toDF(group, id, weight, "cum0")
  }

  /** Core of q45, factored for specs: assign docs to token-budget
    * shards by exclusive prefix sum of tokens in (lang, doc_id) order —
    * shard = floor(tokens_before_this_doc / budget). The prefix sum is
    * the [[groupedPrefixSum]] two-phase range-partition scan, NOT a
    * lang-partitioned window: langs are few, so a per-lang window
    * funnels each language's whole corpus through one task at scale.
    * Deterministic: doc order is doc_id.
    */
  def shardAssignments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    groupedPrefixSum(
        docs.select($"doc_id", $"lang", wsToks($"text").cast("long").as("toks")),
        group = "lang", id = "doc_id", weight = "toks")
      .select($"doc_id", $"lang", $"toks", $"cum0",
        floor($"cum0" / ShardTokenBudget).cast("long").as("shard"))
  }

  def q45_shard_pack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    shardAssignments(load(spark, dir, "documents"))
      .groupBy($"lang", $"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"toks").as("sum_toks"))
      .orderBy($"lang", $"shard")
  }

  // ---------------------------------------------------------------
  // q206 — concat-and-chunk sequence packing
  // ---------------------------------------------------------------

  /** Fixed training context length for q206 (tokens per window). */
  final val PackWindowTokens = 256L

  /** Core of q206, factored for specs: GPT-style sequence packing —
    * concatenate the corpus in doc_id order into one token stream and
    * cut it every [[PackWindowTokens]] tokens; emit one row per
    * (window, document segment) with the segment's offset inside the
    * window. This is the step that turns curated documents into
    * fixed-length training rows with attention-segment boundaries —
    * distinct from q45 (whole-doc shard assignment: nothing splits)
    * and q54 (per-doc overlapping chunks: no cross-doc stream).
    *
    * The global token offset is [[groupedPrefixSum]] with a single
    * constant group — the same two-phase range-partition scan, so the
    * concatenation order is a distributed total order, never a
    * single-partition window. The window fan-out is a narrow per-row
    * flatMap (a doc spans ⌈toks/W⌉ windows); everything downstream
    * keys on (window_id, doc_id) — both data-sized.
    */
  def packAssignments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val W = PackWindowTokens
    groupedPrefixSum(
        docs.select($"doc_id", lit("_all").as("g"), wsToks($"text").cast("long").as("toks")),
        group = "g", id = "doc_id", weight = "toks")
      .as[(String, Long, Long, Long)]
      .flatMap { case (_, docId, toks, cum0) =>
        if (toks <= 0) Iterator.empty
        else {
          val w0 = cum0 / W
          val w1 = (cum0 + toks - 1) / W
          (w0 to w1).iterator.map { w =>
            val segStart = math.max(cum0, w * W)
            val segEnd = math.min(cum0 + toks, (w + 1) * W)
            (w, docId, segStart - w * W, segEnd - segStart)
          }
        }
      }
      .toDF("window_id", "doc_id", "tok_start", "n_toks")
  }

  def q206_pack_windows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    packAssignments(load(spark, dir, "documents"))
      .orderBy($"window_id", $"doc_id")
  }

  // ---------------------------------------------------------------
  // q46 — embedding outliers
  // ---------------------------------------------------------------

  /** Core of q46, factored for specs: per-label centroid-drift
    * outliers — vectors whose cosine to their label's mean vector
    * falls below mean − 2·stddev of the label group. Training-data
    * QA: mislabeled or corrupt vectors surface as drift outliers
    * before they reach a trainer (the harness embeddings are all
    * unit-norm, so norm checks alone are blind here).
    *
    * Scale: the centroid pass partially aggregates (label, dim)
    * means — the shuffle carries |labels|·64 rows per map partition,
    * not the corpus; centroids and per-label stats are tiny frames
    * broadcast back onto the scan. No corpus-side shuffle at all.
    */
  def centroidOutliers(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select($"vec_id", $"label",
      Similarity.toDouble($"embedding").as("v"))
    val cent = e.select($"label", posexplode($"v"))
      .toDF("label", "i", "x")
      .groupBy($"label", $"i").agg(avg($"x").as("m"))
      .groupBy($"label")
      .agg(transform(array_sort(collect_list(struct($"i", $"m"))),
        s => s.getField("m")).as("cv"))
    val sims = e.join(broadcast(cent), "label")
      .select($"vec_id", $"label",
        round(Similarity.dot($"v", $"cv")
          / (Similarity.norm($"v") * Similarity.norm($"cv")) * 1e6)
          .cast("long").as("sim_micro"))
    val stats = sims.groupBy($"label")
      .agg((avg($"sim_micro") - lit(2.0) * stddev_samp($"sim_micro")).as("thresh"))
    sims.join(broadcast(stats), "label")
      .filter($"sim_micro" < $"thresh")
      .select($"label", $"vec_id", $"sim_micro")
      .orderBy($"label", $"vec_id")
  }

  def q46_embedding_outliers(spark: SparkSession, dir: String): DataFrame =
    centroidOutliers(load(spark, dir, "embeddings"))

  // ---------------------------------------------------------------
  // q50 — int8 embedding quantization
  // ---------------------------------------------------------------

  /** Int8 scalar quantization — the 4× storage/bandwidth step before
    * embeddings ship to an index: per-vector scale = max |x_i|,
    * q_i = round(x_i · 127 / scale) ∈ [−127, 127]. Emits the scale and
    * integer summary stats of each quantized vector (the payload a
    * quantized index stores). Pure per-row map, no shuffle; both
    * engines use ROUND half-away-from-zero so the codes match exactly.
    * The small arrays (64 elems) keep the HOF lambdas cheap here —
    * per-element work is one multiply, not a sketch (see the Dedup
    * note for when mapPartitions wins instead).
    */
  def q50_embedding_quantize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "embeddings")
      .select($"vec_id", Similarity.toDouble($"embedding").as("v"))
      .withColumn("scale",
        greatest(array_max(transform($"v", x => abs(x))), lit(1e-30)))
      .withColumn("qv", transform($"v", x => round(x * 127 / $"scale").cast("long")))
      .select($"vec_id",
        round($"scale" * 1e6).cast("long").as("scale_micro"),
        aggregate($"qv", lit(0L), (a, x) => a + x).as("sum_q"),
        array_min($"qv").as("min_q"),
        array_max($"qv").as("max_q"))
      .orderBy($"vec_id")
  }

  // ---------------------------------------------------------------

  /** q122 — deterministic negative sampling for contrastive training:
    * for each anchor document (a hash-strided 10% of the corpus), k=3
    * stratified "negatives" from OTHER sources — hash-reproducible
    * across runs, retries, partitionings and engines (RNG-based
    * sampling is none of those). Negative j of an anchor is picked by
    * RANK INDEXING: a salted hash chooses one of the other sources,
    * a second hash chooses a 0-based position inside that source's
    * doc_id ordering, and an equi-join on (source, position) resolves
    * the document. Total work is O(|docs| + k·|anchors|) — the
    * previous formulation ranked a salted hash over every
    * (anchor, other-source doc) PAIR, whose generate-then-discard
    * compute is O(|docs|·|anchors|): invisible in shuffle volume
    * (TopK heaps pruned it map-side) but quadratic in corpus size,
    * exactly the kind of cost a 100× scale-up turns fatal. Stratified
    * (source-uniform, then uniform within source) is the standard
    * choice for contrastive negatives — it stops a majority source
    * from dominating the negative pool.
    *
    * The per-source position rank is the [[groupedPrefixSum]]
    * two-phase range-partition scan with unit weights (cum0 of a
    * 1-weight IS the 0-based rank) — not a source-partitioned window,
    * which would funnel each source's full document set through one
    * task at scale. The join and hash arithmetic are scale-free.
    */
  def q122_negative_sampling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = load(spark, dir, "documents")
      .select($"doc_id".cast("long").as("doc_id"), $"source")
    val sizes = docs.groupBy($"source").agg(count(lit(1)).as("n_src"))
    val ranked = groupedPrefixSum(docs.withColumn("one", lit(1L)),
        group = "source", id = "doc_id", weight = "one")
      .select($"source", $"doc_id", $"cum0".as("r"))
    val anchors = docs.filter($"doc_id" % 10 === 0)
      .select($"doc_id".as("anchor_id"), $"source".as("a_src"))
    // per-anchor directory of the OTHER sources (deterministic order
    // by name): S-1 tiny rows per anchor via a broadcast of the
    // S-row size table
    val wA = org.apache.spark.sql.expressions.Window.partitionBy($"anchor_id")
    val others = anchors.join(broadcast(sizes), $"source" =!= $"a_src")
      .withColumn("os_idx", row_number().over(
        wA.orderBy($"source")).cast("long") - 1)
      .withColumn("n_others", count(lit(1)).over(wA))
    def salted(tag: String) = hash60(concat(lit(tag), $"anchor_id".cast("string"),
      lit(":"), $"rank".cast("string")))
    val picks = others
      .withColumn("rank", explode(array(lit(1L), lit(2L), lit(3L))))
      .filter($"os_idx" === pmod(salted("nsrc:"), $"n_others"))
      .select($"anchor_id", $"rank", $"source".as("o_src"),
        pmod(salted("nidx:"), $"n_src").as("idx"))
    val negSide = ranked.select($"source".as("neg_src"), $"r".as("neg_r"),
      $"doc_id".as("neg_id"))
    picks.join(negSide, $"o_src" === $"neg_src" && $"idx" === $"neg_r")
      .select($"anchor_id", $"rank", $"neg_id")
      .orderBy($"anchor_id", $"rank")
  }

  /** q130 — deterministic train/val/test split: every document lands
    * in exactly one split by pure hash arithmetic (md5 bucket mod 100
    * → <80 train, <90 val, else test), so the assignment is stable
    * across runs, retries, partitionings and engines — the property
    * an eval set must have (an RNG split silently re-shuffles eval
    * docs into train on every backfill). Output is the split audit:
    * per (split, lang) document counts and token mass. One map-side
    * hash per row + one partial/final aggregate; the corpus never
    * shuffles raw text.
    */
  def q130_train_val_test(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "documents")
      .withColumn("bucket",
        hash60(concat(lit("graft_split_"), $"doc_id".cast("string"))) % 100)
      .withColumn("split",
        when($"bucket" < 80, "train")
          .when($"bucket" < 90, "val").otherwise("test"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(wsToks($"text").cast("long")).as("sum_toks"))
      .orderBy($"split", $"lang")
  }

  /** q135 — Kolmogorov–Smirnov drift statistic between two sources'
    * document-length distributions — the distribution-shift gate a
    * corpus refresh runs before new data joins the training mix. The
    * doc stream reduces to per-distinct-length counts (bounded by the
    * length domain, not corpus size); CDFs are cumulative sums over
    * that bounded table; the statistic is computed in EXACT integer
    * cross-multiplication (|cum0·n1 − cum1·n0|, one final divide for
    * basis points) so both engines agree bit-for-bit. At counts past
    * ~3e9 docs per source the cross-product needs decimal(38,0) —
    * same shape, wider type.
    */
  def q135_ks_drift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = load(spark, dir, "documents")
      .filter($"source".isin("src0", "src1"))
      .select($"source", $"n_chars")
    val counts = d.groupBy($"n_chars")
      .agg(sum(when($"source" === "src0", 1L).otherwise(0L)).as("c0"),
        sum(when($"source" === "src1", 1L).otherwise(0L)).as("c1"))
    val w = Window.orderBy($"n_chars")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = d.agg(
      sum(when($"source" === "src0", 1L).otherwise(0L)).as("n0"),
      sum(when($"source" === "src1", 1L).otherwise(0L)).as("n1"))
    counts
      .withColumn("cum0", sum($"c0").over(w))
      .withColumn("cum1", sum($"c1").over(w))
      .crossJoin(broadcast(tot))
      .groupBy($"n0", $"n1")
      .agg(max(abs($"cum0" * $"n1" - $"cum1" * $"n0")).as("dmax"))
      // runtime guard for the documented Long limit: past ~3e9 docs
      // per source the cross-products would WRAP, not fail — surface
      // it as an error instead of a silently wrong statistic. The
      // check is exact (n0 > MaxValue DIV n1, INTEGER division — a
      // double `/` loses ~10 bits near 2^63 and can pass a product
      // that just overflows), not a negativity test: a product past
      // 2^64 wraps back to POSITIVE and would sail through a sign
      // check.
      .select(when($"n1" =!= 0L && $"n0" > expr(s"${Long.MaxValue}L DIV n1"),
          raise_error(lit("q135: n0*n1 overflows Long — use decimal(38,0)")))
        .otherwise($"n0").as("n0"), $"n1",
        when($"n0" > 0L && $"n1" > 0L,
          round(lit(10000.0) * $"dmax" / ($"n0" * $"n1")).cast("long"))
          .otherwise(lit(null).cast("long")).as("ks_bp"))
  }

  /** q250 — Mann-Whitney U rank-sum test (tie-corrected) between two
    * sources' quality-score distributions — the NONPARAMETRIC sibling
    * of q118's z-test (no normality assumption; quality scores are
    * bounded and skewed, exactly where rank tests earn their keep) and
    * the location-shift complement of q135's KS shape test. Ranks
    * never materialize per document: the score domain is bounded
    * ([0, 10000] basis points), so the corpus reduces to per-distinct-
    * score counts, average ranks come from one cumulative window over
    * that bounded table (q135's pattern), and the U statistic, tie
    * term Σ(t³−t), and normal-approximation z all derive from exact
    * integer sums — both engines agree bit-for-bit up to the one final
    * rounded division. U is emitted in ×2 units (average ranks are
    * half-integers under ties).
    */
  def q250_mann_whitney(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = load(spark, dir, "documents")
      .filter($"source".isin("src0", "src1"))
      .select($"source", TextAnalysis.qualityBp($"text").as("s"))
    val c = d.groupBy($"s").agg(
      sum(when($"source" === "src0", 1L).otherwise(0L)).as("n1"),
      sum(when($"source" === "src1", 1L).otherwise(0L)).as("n2"))
    val w = Window.orderBy($"s").rowsBetween(Window.unboundedPreceding, -1)
    c.withColumn("t", $"n1" + $"n2")
      .withColumn("cumb", coalesce(sum($"n1" + $"n2").over(w), lit(0L)))
      .agg(sum($"n1").as("nn1"), sum($"n2").as("nn2"),
        sum($"n1" * (lit(2L) * $"cumb" + $"t" + 1)).as("r1x2"),
        sum($"t" * $"t" * $"t" - $"t").as("tie_term"))
      // degenerate guards (mirrored in the oracle): an empty group, a
      // singleton union, or an all-tied sample has no defined z —
      // report NULL instead of an ANSI division error
      .select($"nn1".as("n1"), $"nn2".as("n2"),
        ($"r1x2" - $"nn1" * ($"nn1" + 1)).as("u1_x2"), $"tie_term",
        when($"nn1" > 0L && $"nn2" > 0L && $"nn1" + $"nn2" > 1L &&
            ($"nn1".cast("double") * $"nn2" / lit(12.0)
              * (($"nn1" + $"nn2" + 1) - $"tie_term".cast("double")
                / (($"nn1" + $"nn2").cast("double") * ($"nn1" + $"nn2" - 1)))) > 0.0,
          round(lit(1000.0) * ($"r1x2" - $"nn1" * ($"nn1" + 1) - $"nn1" * $"nn2")
            / (lit(2.0) * sqrt($"nn1".cast("double") * $"nn2" / lit(12.0)
              * (($"nn1" + $"nn2" + 1) - $"tie_term".cast("double")
                / (($"nn1" + $"nn2").cast("double") * ($"nn1" + $"nn2" - 1))))))
            .cast("long")).otherwise(lit(null).cast("long")).as("z_milli"))
  }

  /** q254 — Poisson bootstrap confidence interval on each source's
    * mean quality score (B = 100 replicates): the online-bootstrap
    * construction (Poisson(1) weights per (doc, replicate) instead of
    * multinomial resampling) that needs NO global coordination — the
    * standard way to bootstrap a distributed dataset, since each
    * element draws its replicate weights independently. All
    * randomness is the shared md5-derived 60-bit hash (q130's
    * pattern), mapped through the exact Poisson(1) inverse CDF on a
    * 1e-6 grid, so both engines draw IDENTICAL weights. The 100×
    * fan-out happens map-side (explode straight into the partial
    * aggregate on (source, replicate) — the shuffle carries only
    * |sources|·100 rows); replicate means are exactly-rounded IEEE
    * divisions of integer sums, ranked per source with a replicate-id
    * tie-break, and the CI is the 5th/95th order statistic.
    */
  def q254_bootstrap_ci(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rep = load(spark, dir, "documents")
      .select($"source", $"doc_id", TextAnalysis.qualityBp($"text").as("x"))
      .withColumn("b", explode(sequence(lit(0), lit(99))))
      .withColumn("u6", hash60(concat(lit("graft_boot_"),
        $"doc_id".cast("string"), lit("_"), $"b".cast("string"))) % 1000000)
      .withColumn("wt",
        when($"u6" < 367879, 0L).when($"u6" < 735759, 1L)
          .when($"u6" < 919699, 2L).when($"u6" < 981012, 3L)
          .when($"u6" < 996340, 4L).when($"u6" < 999406, 5L)
          .when($"u6" < 999917, 6L).otherwise(7L))
    val m = rep.groupBy($"source", $"b")
      .agg(sum($"wt" * $"x").as("sw"), sum($"wt").as("w"))
      .filter($"w" > 0)
      .select($"source", $"b", ($"sw".cast("double") / $"w").as("mb"))
    val rk = m
      .withColumn("rn", row_number().over(
        Window.partitionBy($"source").orderBy($"mb", $"b")))
      .withColumn("nb", count(lit(1)).over(Window.partitionBy($"source")))
    rk.groupBy($"source")
      .agg(max($"nb").as("n_reps"),
        round(lit(1000.0) * min(when($"rn" === 5, $"mb")))
          .cast("long").as("lo_milli"),
        round(lit(1000.0) * min(when($"rn" === 95, $"mb")))
          .cast("long").as("hi_milli"))
      .orderBy($"source")
  }

  /** q255 — split-conformal prediction intervals for per-lang quality
    * (Vovk's split-conformal recipe, 90 % target): the distribution-
    * free interval machinery an eval harness wants around any point
    * predictor. Reuses q130's hash split three ways (train fits the
    * per-lang mean, calibration supplies the |x−μ| residual ranks,
    * test measures honest coverage). The conformal width is the
    * ⌈0.9·(n_cal+1)⌉-th smallest calibration residual (rank windows
    * run inside lang partitions; tie-break doc_id), and every
    * residual is |int − exactly-rounded-division| so both engines
    * rank identical doubles. Output is |langs| rows end-to-end — the
    * fact stream is touched exactly three times, each reducing
    * straight into a bounded aggregate.
    */
  def q255_conformal_interval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = graft.Caches.tracked(load(spark, dir, "documents")
      .withColumn("x", TextAnalysis.qualityBp($"text"))
      .withColumn("bucket",
        hash60(concat(lit("graft_split_"), $"doc_id".cast("string"))) % 100)
      .select($"lang", $"doc_id", $"x",
        when($"bucket" < 80, "train").when($"bucket" < 90, "cal")
          .otherwise("test").as("split")))
    val mu = s.filter($"split" === "train").groupBy($"lang")
      .agg(sum($"x").as("sx"), count(lit(1)).as("n_train"))
      .select($"lang", $"n_train",
        ($"sx".cast("double") / $"n_train").as("mu"))
    val calr = s.filter($"split" === "cal")
      .join(broadcast(mu.select($"lang", $"mu")), "lang")
      .select($"lang", abs($"x" - $"mu").as("r"), $"doc_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"lang").orderBy($"r", $"doc_id")).cast("long"))
      .withColumn("n_cal", count(lit(1)).over(Window.partitionBy($"lang")))
    val q = calr.groupBy($"lang")
      .agg(max($"n_cal").as("n_cal"),
        min(when($"rn" === least($"n_cal",
          ceil(lit(0.9) * ($"n_cal" + 1)).cast("long")), $"r")).as("width"))
    val tst = s.filter($"split" === "test")
      .join(broadcast(mu.select($"lang", $"mu")), "lang")
      .join(broadcast(q.select($"lang", $"width")), "lang")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_test"),
        sum(when(abs($"x" - $"mu") <= $"width", 1L).otherwise(0L)).as("n_in"))
    mu.join(q, "lang").join(tst, "lang")
      .select($"lang", $"n_train", $"n_cal", $"n_test",
        round(lit(1000.0) * $"width").cast("long").as("width_milli"),
        round(lit(10000.0) * $"n_in" / $"n_test").cast("long").as("cover_bp"))
      .orderBy($"lang")
  }

  /** q259 — fill-in-the-middle (FIM) transform (Bavarian et al. 2022):
    * the PSM rearrangement an infilling-capable code/text model trains
    * on. Half the corpus (hash-gated, so the choice is reproducible
    * shard-by-shard) is split at two hash-derived CHARACTER cuts
    * confined to the middle 80 % of the doc and re-emitted as
    * ⟨PRE⟩prefix⟨SUF⟩suffix⟨MID⟩middle; short docs (< 20 chars) and
    * the other half stay causal. A pure per-row projection — zero
    * shuffles before the output sort, trivially 100 TB-safe. Both
    * engines count cut positions in Unicode code points and fingerprint
    * the transformed text with md5 over its UTF-8 bytes, so the oracle
    * replays the rearrangement itself, not just the bookkeeping.
    */
  def q259_fim_transform(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = load(spark, dir, "documents")
      .select($"doc_id", $"text", length($"text").cast("long").as("l"),
        (hash60(concat(lit("graft_fim_g_"), $"doc_id".cast("string"))) % 100).as("g"),
        hash60(concat(lit("graft_fim_a_"), $"doc_id".cast("string"))).as("ha"),
        hash60(concat(lit("graft_fim_b_"), $"doc_id".cast("string"))).as("hb"))
      .withColumn("mode", when($"l" >= 20 && $"g" < 50, "psm").otherwise("causal"))
      .withColumn("lo", lit(1L) + expr("l div 10"))
      .withColumn("hi", $"l" - expr("l div 10"))
      .withColumn("pa", $"lo" + $"ha" % ($"hi" - $"lo" + 1))
      .withColumn("pb", $"lo" + $"hb" % ($"hi" - $"lo" + 1))
      .withColumn("c1", least($"pa", $"pb"))
      .withColumn("c2", greatest($"pa", $"pb"))
    d.select($"doc_id", $"mode",
      when($"mode" === "psm", $"c1" - 1).otherwise($"l").as("len_p"),
      when($"mode" === "psm", $"c2" - $"c1").otherwise(lit(0L)).as("len_m"),
      when($"mode" === "psm", $"l" - $"c2" + 1).otherwise(lit(0L)).as("len_s"),
      when($"mode" === "psm", md5(concat(lit("<PRE>"),
          expr("substring(text, 1, CAST(c1 AS INT) - 1)"),
          lit("<SUF>"), expr("substring(text, CAST(c2 AS INT), CAST(l - c2 AS INT) + 1)"),
          lit("<MID>"), expr("substring(text, CAST(c1 AS INT), CAST(c2 - c1 AS INT))"))))
        .otherwise(md5($"text")).as("fim_md5"))
      .orderBy($"doc_id")
  }

  /** q260 — preference-pair construction: per (source, lang) slice,
    * the highest- and lowest-quality documents become a
    * chosen/rejected pair with its score margin — the bulk
    * bootstrap for reward-model data when human labels are scarce.
    * Deliberately NOT a rank window (a (source, lang) slice can be a
    * double-digit share of a 100 TB corpus — sorting it to read off
    * two endpoints is the funnel PlanLint exists to catch): both
    * endpoints are argmax/argmin aggregates under the lexicographic
    * (quality, ∓doc_id) order — ONE partial+final exchange, and
    * chosen ≠ rejected on every emitted pair even under total
    * quality ties because the tie-breaks point in opposite
    * directions. Slices with one document produce no pair.
    */
  def q260_preference_pairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "documents")
      .select($"doc_id", $"source", $"lang", TextAnalysis.qualityBp($"text").as("q"))
      .groupBy($"source", $"lang")
      .agg(count(lit(1)).as("n"),
        max_by($"doc_id", struct($"q", -$"doc_id")).as("chosen_id"),
        min_by($"doc_id", struct($"q", -$"doc_id")).as("rejected_id"),
        (max($"q") - min($"q")).as("margin_bp"))
      .filter($"n" >= 2)
      .select($"source", $"lang", $"chosen_id", $"rejected_id", $"margin_bp")
      .orderBy($"source", $"lang")
  }

  /** q262 — t-closeness audit (the third leg of the k-anonymity /
    * l-diversity / t-closeness privacy battery, completing q209):
    * per equivalence class, the TOTAL-VARIATION distance between the
    * class's sensitive-attribute distribution and the global one — a
    * class can be k-large and l-diverse yet still leak when its
    * sensitive mix is skewed far from baseline. The distance is
    * computed in EXACT integer cross-multiplication (q135's trick:
    * |n_cs·N − N_s·n_c| summed over the class×sensitive grid, ONE
    * rounded division per class), so both engines agree bit-for-bit.
    * Everything after the two fact aggregates is bounded:
    * |classes|·|sensitive-values| grid rows.
    */
  def q262_t_closeness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val j = graft.Caches.tracked(load(spark, dir, "customer")
      .select($"c_custkey", $"c_nationkey".cast("long").as("nation"),
        $"c_mktsegment".as("segment"))
      .join(load(spark, dir, "orders")
        .select($"o_custkey", $"o_orderpriority".as("s")),
        $"c_custkey" === $"o_custkey")
      .select($"nation", $"segment", $"s"))
    val g = j.groupBy($"s").agg(count(lit(1)).as("ns"))
    val tot = j.agg(count(lit(1)).as("n"))
    val cls = j.groupBy($"nation", $"segment", $"s")
      .agg(count(lit(1)).as("ncs"))
    val csz = cls.groupBy($"nation", $"segment").agg(sum($"ncs").as("nc"))
    csz.crossJoin(broadcast(g))
      .join(cls, Seq("nation", "segment", "s"), "left")
      .crossJoin(broadcast(tot))
      .groupBy($"nation", $"segment", $"nc", $"n")
      .agg(sum(abs(coalesce($"ncs", lit(0L)) * $"n" - $"ns" * $"nc")).as("num"))
      .select($"nation", $"segment", $"nc".as("class_size"),
        round(lit(1000.0) * $"num" / (lit(2.0) * $"nc" * $"n"))
          .cast("long").as("tv_milli"))
      .orderBy($"nation", $"segment")
  }

  /** q335 — entropy and recursive ℓ-diversity (Machanavajjhala et al.
    * 2006, the PUBLISHED stronger forms of the distinct-ℓ count q209
    * already reports): per equivalence class, the Shannon entropy of
    * the sensitive-attribute distribution with its effective
    * ℓ = exp(H) (an entropy-ℓ-diverse class needs H ≥ ln ℓ — distinct
    * counting calls a 99 %/1 % class 2-diverse; entropy does not),
    * plus the recursive (c,ℓ) = (3,2) check r₁ < c·(n − r₁) in EXACT
    * integers (4·r₁ < 3·n). Entropy follows the house ln convention
    * (q263/q232): each (class, sensitive) term micro-rounds its own
    * identically-evaluated float tree, then the per-class sum is
    * exact integer addition — never an order-dependent double sum;
    * exp() is the q118/q317 in-engine EXP treatment. Both aggregates
    * are |classes|·|sensitive| bounded after the one fact join; the
    * customer side broadcasts.
    */
  def q335_l_diversity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val j = load(spark, dir, "customer")
      .select($"c_custkey", $"c_nationkey".cast("long").as("nation"),
        $"c_mktsegment".as("segment"))
      .join(load(spark, dir, "orders")
        .select($"o_custkey", $"o_orderpriority".as("s")),
        $"c_custkey" === $"o_custkey")
      .select($"nation", $"segment", $"s")
    val cls = graft.Caches.tracked(j.groupBy($"nation", $"segment", $"s")
      .agg(count(lit(1)).as("ncs")))
    val csz = cls.groupBy($"nation", $"segment")
      .agg(sum($"ncs").as("nc"), count(lit(1)).as("distinct_l"),
        max($"ncs").as("r1"))
    val ent = cls.join(csz.select($"nation", $"segment", $"nc"),
        Seq("nation", "segment"))
      .select($"nation", $"segment",
        round(lit(1e6) * ($"ncs".cast("double") / $"nc")
          * log($"nc".cast("double") / $"ncs")).cast("long").as("term"))
      .groupBy($"nation", $"segment")
      .agg(sum($"term").as("entropy_micro"))
    csz.join(ent, Seq("nation", "segment"))
      .select($"nation", $"segment", $"nc".as("class_size"), $"distinct_l",
        $"entropy_micro",
        round(lit(1e6) * exp($"entropy_micro".cast("double") / lit(1e6)))
          .cast("long").as("eff_l_micro"),
        ($"r1" * 4 < $"nc" * 3).cast("int").as("recursive_ok"))
      .orderBy($"nation", $"segment")
  }

  /** q263 — population stability index between two sources' quality
    * distributions over FIXED bins (bp div 1000 — data-driven decile
    * edges would make bin membership itself float-dependent): the
    * industry drift gate beside q135's KS (shape) and q250's rank
    * test (location); PSI weights tail moves by the log-ratio, which
    * the sup-statistic family under-reports. Laplace +1 smoothing
    * keeps empty bins defined and deterministic. Counts are exact
    * integers; the 11-term Σ(p−q)·ln(p/q) is one fixed float tree
    * micro-rounded at the end (the house ln convention, q232/q46).
    */
  def q263_psi_drift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = load(spark, dir, "documents")
      .filter($"source".isin("src0", "src1"))
      .withColumn("q", TextAnalysis.qualityBp($"text"))
      .select(expr("q div 1000").as("b"), $"source")
    val grid = spark.range(0, 11).select($"id".as("b"))
    val bins = grid.join(
        d.groupBy($"b").agg(
          sum(when($"source" === "src0", 1L).otherwise(0L)).as("r0"),
          sum(when($"source" === "src1", 1L).otherwise(0L)).as("r1")),
        Seq("b"), "left")
      .select($"b", (lit(1L) + coalesce($"r0", lit(0L))).as("c0"),
        (lit(1L) + coalesce($"r1", lit(0L))).as("c1"))
    val tot = bins.agg(sum($"c0").as("n0"), sum($"c1").as("n1"))
    bins.crossJoin(broadcast(tot))
      .groupBy($"n0", $"n1")
      .agg(round(lit(1e6) * sum(
        ($"c0".cast("double") / $"n0" - $"c1".cast("double") / $"n1")
          * log(($"c0".cast("double") / $"n0") / ($"c1".cast("double") / $"n1"))))
        .cast("long").as("psi_micro"))
  }

  /** Shared bounded-domain cumulative table for the robust-stat pair
    * (q273/q274): per (source, quality-bp) counts with per-source
    * cumulative and total counts — the structure that replaces a
    * per-source SORT of the corpus (the thing that cannot run at
    * 100 TB) with windows over a table bounded by |sources|·10001.
    */
  private def qualityCum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = load(spark, dir, "documents")
      .select($"source", TextAnalysis.qualityBp($"text").as("s"))
      .groupBy($"source", $"s").agg(count(lit(1)).as("cnt"))
    val wc = Window.partitionBy($"source").orderBy($"s")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wa = Window.partitionBy($"source")
    c.withColumn("cc", sum($"cnt").over(wc))
      .withColumn("n", sum($"cnt").over(wa))
      .withColumn("tot", sum($"cnt" * $"s").over(wa))
  }

  /** q273 — 10 %-trimmed and winsorized mean quality per source:
    * robust location WITHOUT a per-source sort. Order statistics come
    * from the bounded score-domain cumulative table ([[qualityCum]]):
    * the bottom-k/top-k mass is whole-bins-plus-a-partial-boundary-bin
    * arithmetic (all exact integers — the boundary bin contributes
    * (k − mass-below)·boundary-score), the winsorized form puts the
    * trimmed mass back at the (k+1)-th / (n−k)-th order statistics,
    * and each output is ONE closing division. The k=0 small-source
    * case degrades to the plain mean with every correction term
    * exactly zero.
    */
  def q273_robust_mean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = qualityCum(spark, dir).withColumn("k", expr("n div 10"))
    val lo = k.filter($"cc" >= $"k").groupBy($"source").agg(min($"s").as("lo_s"))
    val lo2 = k.filter($"cc" >= $"k" + 1).groupBy($"source").agg(min($"s").as("lo2_s"))
    val hi = k.filter($"cc" >= $"n" - $"k").groupBy($"source").agg(min($"s").as("hi_s"))
    k.join(broadcast(lo), "source").join(broadcast(lo2), "source")
      .join(broadcast(hi), "source")
      .groupBy($"source")
      .agg(max($"n").as("n"), max($"k").as("kk"), max($"tot").as("tot"),
        max($"lo_s").as("lo_s"), max($"lo2_s").as("lo2_s"), max($"hi_s").as("hi_s"),
        sum(when($"s" < $"lo_s", $"cnt" * $"s").otherwise(0L)).as("bot_full"),
        sum(when($"s" < $"lo_s", $"cnt").otherwise(0L)).as("bel"),
        sum(when($"s" > $"hi_s", $"cnt" * $"s").otherwise(0L)).as("top_full"),
        sum(when($"s" > $"hi_s", $"cnt").otherwise(0L)).as("abv"))
      .select($"source", $"n", $"kk".as("k_trim"),
        round(lit(1000.0) * $"tot" / $"n").cast("long").as("mean_milli"),
        round(lit(1000.0) * ($"tot" - ($"bot_full" + ($"kk" - $"bel") * $"lo_s")
          - ($"top_full" + ($"kk" - $"abv") * $"hi_s")) / ($"n" - $"kk" * 2))
          .cast("long").as("trimmed_milli"),
        round(lit(1000.0) * ($"tot" - ($"bot_full" + ($"kk" - $"bel") * $"lo_s")
          - ($"top_full" + ($"kk" - $"abv") * $"hi_s")
          + $"kk" * $"lo2_s" + $"kk" * $"hi_s") / $"n")
          .cast("long").as("winsor_milli"))
      .orderBy($"source")
  }

  /** q274 — median / MAD / robust-outlier count per source: the
    * scale companion to q273, same no-sort construction — the
    * deviation domain |s − median| is ALSO bounded, so the MAD is a
    * second cumulative pass over a ≤10001-row table and the outlier
    * rule (|s − med| > 3·MAD) is an exact integer comparison folded
    * into the same aggregate. Lower-median convention throughout
    * (q139's), so every statistic is a domain value, not an
    * interpolation.
    */
  def q274_robust_scale(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cum = graft.Caches.tracked(qualityCum(spark, dir))
    val med = cum.filter(lit(2L) * $"cc" >= $"n")
      .groupBy($"source").agg(min($"s").as("med"))
    val dev = cum.join(broadcast(med), "source")
      .groupBy($"source", abs($"s" - $"med").as("a"))
      .agg(sum($"cnt").as("cnt"))
    val wd = Window.partitionBy($"source").orderBy($"a")
      .rowsBetween(Window.unboundedPreceding, 0)
    val dcum = dev.withColumn("cc", sum($"cnt").over(wd))
      .withColumn("n", sum($"cnt").over(Window.partitionBy($"source")))
    val mad = dcum.filter(lit(2L) * $"cc" >= $"n")
      .groupBy($"source").agg(min($"a").as("mad"))
    dcum.join(broadcast(med), "source").join(broadcast(mad), "source")
      .groupBy($"source")
      .agg(max($"n").as("n"), max($"med").as("median_bp"), max($"mad").as("mad_bp"),
        sum(when($"a" > lit(3L) * $"mad", $"cnt").otherwise(0L)).as("n_outliers"))
      .orderBy($"source")
  }

  /** q279 — exact 1-D Wasserstein (earth-mover) drift between two
    * sources' quality distributions: completes the drift family with
    * the MASS-TRANSPORT view (L51/q135 KS = sup-norm, L123/q263
    * PSI = log-weighted, L116/q250 = rank location). In 1-D the W₁
    * distance has the closed form ∫|F₀−F₁|, which on the bounded
    * score domain is Σ gap·|cum₀·n₁ − cum₁·n₀| — EXACT integers
    * (q135's cross-multiplication) with the inter-score gap from one
    * lead window, one closing division to milli score units.
    */
  def q279_wasserstein(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = load(spark, dir, "documents")
      .filter($"source".isin("src0", "src1"))
      .select($"source", TextAnalysis.qualityBp($"text").as("s"))
      .groupBy($"s").agg(
        sum(when($"source" === "src0", 1L).otherwise(0L)).as("c0"),
        sum(when($"source" === "src1", 1L).otherwise(0L)).as("c1"))
    val t = c.agg(sum($"c0").as("n0"), sum($"c1").as("n1"))
    val wCum = Window.orderBy($"s").rowsBetween(Window.unboundedPreceding, 0)
    c.withColumn("cum0", sum($"c0").over(wCum))
      .withColumn("cum1", sum($"c1").over(wCum))
      .withColumn("s_next", lead($"s", 1).over(Window.orderBy($"s")))
      .filter($"s_next".isNotNull)
      .crossJoin(broadcast(t))
      .groupBy($"n0", $"n1")
      .agg(round(lit(1000.0) * sum(($"s_next" - $"s")
        * abs($"cum0" * $"n1" - $"cum1" * $"n0"))
        / ($"n0".cast("double") * $"n1")).cast("long").as("w1_milli"))
  }

  /** q139 — token-weighted median document length per source: the
    * "where is the token mass" diagnostic (an unweighted median
    * over-represents short documents; training cost is per TOKEN).
    * Exact weighted percentile without sorting raw data: the corpus
    * reduces to per-(source, length) token sums — bounded by the
    * length domain — cumulative weight runs inside source partitions
    * of that bounded table, and the median is the smallest length
    * whose cumulative weight reaches half the total. All integer.
    */
  def q139_weighted_median(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agg = load(spark, dir, "documents")
      .select($"source", $"n_chars", wsToks($"text").cast("long").as("wtok"))
      .groupBy($"source", $"n_chars").agg(sum($"wtok").as("w"))
    val cumW = Window.partitionBy($"source").orderBy($"n_chars")
      .rowsBetween(Window.unboundedPreceding, 0)
    val totW = Window.partitionBy($"source")
    agg
      .withColumn("cw", sum($"w").over(cumW))
      .withColumn("tw", sum($"w").over(totW))
      .filter($"cw" * 2 >= $"tw")
      .groupBy($"source")
      .agg(min($"n_chars").as("weighted_median_len"),
        max($"tw").as("total_tokens"))
      .orderBy($"source")
  }

  /** Blocklist for q144 — a real pipeline loads this from config; a
    * fixed literal keeps the oracle total. Terms chosen to actually
    * occur in the harness vocabulary.
    */
  final val Blocklist: Seq[String] = Seq("error", "slow", "null", "drop")

  /** q144 — blocklist filtering (the corpus safety/keyword gate):
    * per source, how many documents trip any blocklisted term, plus
    * per-term hit counts — the audit a filter rollout reviews before
    * dropping data. The blocklist broadcasts as a literal array; the
    * match is a map-side `exists` over the token array (no token
    * fan-out, no join, zero shuffle before the bounded per-source
    * aggregate); per-term counts come from one `aggregate` fold over
    * the same array, so the corpus is scanned ONCE. At a 10k-term
    * real blocklist the same plan swaps the array `exists` for a
    * broadcast-join on exploded tokens — the audit shape is
    * unchanged.
    */
  def q144_blocklist_audit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = split($"text", " ")
    val flagged = Blocklist.foldLeft(lit(0L)) { (acc, t) =>
      acc + when(array_contains(toks, t), 1L).otherwise(0L)
    }
    load(spark, dir, "documents")
      .select($"source", flagged.as("n_terms_hit"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"n_terms_hit" > 0, 1L).otherwise(0L)).as("n_flagged"),
        sum($"n_terms_hit").as("sum_terms_hit"))
      .orderBy($"source")
  }

  /** q191 — boilerplate-span audit (the C4/RefinedWeb cleaning step):
    * how much of each source is made of text spans that also appear
    * in OTHER documents — navigation chrome, license footers, scraped
    * templates. Documents tile into tumbling 10-word spans (tumbling,
    * not sliding: the span set is |tokens|/10 per doc, and removal
    * arithmetic stays non-overlapping); a span is boilerplate when its
    * hash occurs in ≥ 2 distinct documents. Everything is one
    * explode → two aggregates — linear in the corpus with one shuffle
    * on the span hash, the span strings themselves never shuffle
    * (md5-60-bit hashes do; the same `'0x'||substring(md5…)` device
    * as q24/q44, so DuckDB replays hashes bit-for-bit). Output is the
    * bounded per-source audit: span counts, boilerplate mass, and the
    * docs-affected count that decides "strip spans" vs "drop docs".
    */
  def q191_boilerplate_spans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val spans = graft.Caches.tracked(load(spark, dir, "documents")
      .select($"doc_id", $"source",
        expr("""CASE WHEN size(split(text, ' ')) >= 10 THEN
                |  transform(sequence(0, int(size(split(text, ' ')) / 10) - 1),
                |    i -> array_join(slice(split(text, ' '), i * 10 + 1, 10), ' '))
                |ELSE array() END""".stripMargin).as("tiles"))
      .select($"doc_id", $"source", explode($"tiles").as("span"))
      .select($"doc_id", $"source",
        conv(substring(md5($"span"), 1, 15), 16, 10).cast("long").as("h")))
      // consumed by the global span-frequency aggregate AND the
      // per-source flag join — tracked-persist so tiling runs once
    val freq = spans.groupBy($"h")
      .agg(count_distinct($"doc_id").as("nd"))
      .filter($"nd" >= 2)
      .select($"h", lit(1L).as("is_boiler"))
    spans.join(freq, Seq("h"), "left")
      .groupBy($"doc_id", $"source")
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce($"is_boiler", lit(0L))).as("n_boiler"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_spans").as("n_spans"),
        sum($"n_boiler").as("n_boiler_spans"),
        sum(when($"n_boiler" > 0, 1L).otherwise(0L)).as("n_docs_affected"))
      // integer DIV on both engines — float division then cast would
      // truncate in Spark but round in DuckDB
      .withColumn("boiler_bp",
        expr("10000 * n_boiler_spans DIV greatest(n_spans, 1)"))
      .orderBy($"source")
  }

  /** q192 — token-budget water-filling: allocate an epoch's token
    * budget (80% of the corpus here — high enough that heavy-weight
    * sources hit their mass caps and the waterline genuinely binds)
    * across sources proportionally to
    * declared mixture weights, CAPPED at each source's actual mass —
    * the "I want 3:2:1 domain mix but src7 only has so many tokens"
    * allocator every training-mix plan needs. Exact-integer
    * water-filling: sort sources by mass/weight (the order in which
    * caps bind), find the binding prefix with cross-multiplied
    * integer comparisons (no float waterline), then split the
    * residual budget over uncapped sources by largest remainder
    * (q147's conservation device) so Σ alloc = budget EXACTLY.
    *
    * Scale: the corpus reduces ONCE to the |sources|-bounded
    * (mass, weight) table; every window after that runs on ≤ dozens
    * of rows (the single-partition windows are the q83
    * bounded-aggregate family, PlanLint-excepted). Weights are
    * declared arithmetic on the source name so both engines derive
    * them identically.
    */
  /** The water-filling solver over a (source, mass, w) table — q192's
    * reusable core, property-tested in DataPrepPropertySpec. Budget =
    * budgetNum·Σmass DIV budgetDen. Returns (source, mass, w,
    * is_capped, alloc_toks) with Σ alloc = budget exactly (provided
    * budget ≤ Σ mass), alloc ≤ mass everywhere, and uncapped allocs
    * within 1 token of the residual-proportional share.
    */
  private[llm] def waterfill(perSource: DataFrame,
                             budgetNum: Long, budgetDen: Long): DataFrame = {
    val spark = perSource.sparkSession
    import spark.implicits._
    val full = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy($"ratio", $"source")
    val prefix = ord.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val upto = ord.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)

    val m = perSource
      .withColumn("ratio", $"mass" / $"w")
      .withColumn("mm", sum($"mass").over(full))
      .withColumn("ww", sum($"w").over(full))
      .withColumn("budget", expr(s"($budgetNum * mm) DIV $budgetDen"))
      // exclusive prefixes in cap-binding order; a source is capped
      // when its full mass fits under the waterline the REMAINING
      // budget and weight imply: mass·(W−pw) ≤ w·(B−pm), integers only
      .withColumn("pm", coalesce(sum($"mass").over(prefix), lit(0L)))
      .withColumn("pw", coalesce(sum($"w").over(prefix), lit(0L)))
      .withColumn("flag",
        when($"mass" * ($"ww" - $"pw") <= $"w" * ($"budget" - $"pm"), 1L)
          .otherwise(0L))
      .withColumn("capped", min($"flag").over(upto))
      .withColumn("bp", $"budget" - sum(when($"capped" === 1L, $"mass")
        .otherwise(0L)).over(full))
      .withColumn("wp", greatest(sum(when($"capped" === 0L, $"w")
        .otherwise(0L)).over(full), lit(1L)))
    val capped = m.filter($"capped" === 1L)
      .select($"source", $"mass", $"w", lit(1L).as("is_capped"),
        $"mass".as("alloc_toks"))
    val open = m.filter($"capped" === 0L)
      .withColumn("base", expr("(bp * w) DIV wp"))
      .withColumn("rem", expr("(bp * w) % wp"))
      .withColumn("leftover", $"bp" - sum($"base").over(full))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"rem".desc, $"source")))
      .select($"source", $"mass", $"w", lit(0L).as("is_capped"),
        ($"base" + when($"rk" <= $"leftover", 1L).otherwise(0L))
          .as("alloc_toks"))
    capped.unionByName(open).orderBy($"source")
  }

  final val CurriculumPrefix = 150

  /** q202 — deterministic curriculum interleave (stride scheduling,
    * Waldspurger & Weihl 1995, applied to training-mixture ordering):
    * assign every document a global training position such that each
    * source appears in proportion to its declared weight in EVERY
    * prefix of the stream, not just in expectation — the property a
    * training run needs when it may stop early or checkpoint-resume
    * mid-epoch (a global shuffle only balances the mixture on
    * average; a stride interleave balances every window). The i-th
    * document of source s (0-based, within-source doc_id order) lands
    * at stride key (2i+1)/(2·w_s), materialized as the EXACT integer
    * key_nano = ((2i+1)·10⁹) div (2·w_s) with (source, doc_id)
    * tie-breaks, so both engines order identically — no floats
    * anywhere. Weights reuse q192's declared derivation (source
    * number % 3 + 1).
    *
    * Scale design: the within-source rank comes from
    * [[groupedPrefixSum]] (unit weights) — the two-phase range scan,
    * NOT a per-source window, so few-source corpora don't funnel one
    * source through one task; the key is then map-side arithmetic;
    * the bounded CurriculumPrefix head plans as TakeOrdered
    * (per-partition heaps); only that bounded head sees the final
    * position-numbering window.
    */
  def q202_training_order(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ranked = groupedPrefixSum(
        load(spark, dir, "documents")
          .select($"source", $"doc_id", lit(1L).as("one")),
        group = "source", id = "doc_id", weight = "one")
      .select($"source", $"doc_id", $"cum0".as("i"))
    val keyed = ranked
      .withColumn("w",
        (expr("CAST(substring(source, 4) AS INT)") % 3 + 1).cast("long"))
      .withColumn("key_nano", expr("((2 * i + 1) * 1000000000) DIV (2 * w)"))
    keyed.orderBy($"key_nano", $"source", $"doc_id").limit(CurriculumPrefix)
      .withColumn("pos", row_number().over(Window.orderBy(
        $"key_nano", $"source", $"doc_id")).cast("long"))
      .select($"pos", $"source", $"doc_id", $"key_nano")
      .orderBy($"pos")
  }

  def q192_budget_waterfill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    waterfill(load(spark, dir, "documents")
      .groupBy($"source")
      .agg(sum(wsToks($"text").cast("long")).as("mass"))
      .withColumn("w",
        (expr("CAST(substring(source, 4) AS INT)") % 3 + 1).cast("long")),
      budgetNum = 4L, budgetDen = 5L)
  }

  /** q209 — k-anonymity / l-diversity audit over a released join: the
    * privacy gate a data pipeline runs before publishing derived
    * tables. Quasi-identifier = (nation, market segment); sensitive
    * attribute = order priority. Emits every equivalence class with
    * its size (k), its distinct-sensitive-value count (l), and the
    * pass flags (k ≥ 5, l ≥ 3) the release policy would enforce.
    * One equi-join (customer side broadcast-eligible) and one
    * aggregation with an exact count-distinct; the class-key shuffle
    * is |nations|×|segments| bounded regardless of fact size.
    */
  def q209_k_anonymity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "customer")
      .select($"c_custkey", $"c_nationkey".as("nation"),
        $"c_mktsegment".as("segment"))
      .join(load(spark, dir, "orders")
        .select($"o_custkey", $"o_orderpriority".as("sensitive")),
        $"c_custkey" === $"o_custkey")
      .groupBy($"nation", $"segment")
      .agg(count(lit(1)).as("class_size"),
        countDistinct($"sensitive").as("l_diversity"))
      .select($"nation", $"segment", $"class_size", $"l_diversity",
        ($"class_size" >= 5).cast("int").as("k_ok"),
        ($"l_diversity" >= 3).cast("int").as("l_ok"))
      .orderBy($"nation", $"segment")
  }

  /** q210 — differentially-private release counts via the discrete
    * Laplace (two-sided geometric) mechanism with α = ½ (ε = ln 2).
    * The noise draw is exact integer arithmetic end-to-end: the
    * md5-60-bit uniform h is scaled to w = 3h ∈ [0, 3·2⁶⁰); the
    * central third is k = 0 (mass (1−α)/(1+α) = ⅓) and each dyadic
    * interval outward is one more noise step (mass ⅓·2⁻ⁱᵏᵢ), so k
    * falls out of the BIT LENGTH of w — no transcendentals, no
    * engine-dependent float, and the DuckDB oracle replays the draw
    * bit-for-bit. (A real release would drop n_true and fix the seed
    * per release epoch; the demo emits both sides for auditability.)
    * Map-side only until the dimension-bounded (source, lang) count.
    */
  /** Discrete-Laplace (two-sided geometric, α = ½, ε = ln 2) noise
    * from a seed string — exact integer arithmetic only (see q210's
    * derivation): md5-60-bit uniform → w = 3h; central third is 0,
    * each dyadic interval outward one more step, so the draw is the
    * BIT LENGTH of w. Shared by q210 (group counts) and q224 (top-k).
    */
  private[llm] def geometricNoise(seed: Column): Column = {
    val third = 1L << 60
    val w = hash60(seed) * 3
    when(w >= third && w < 2 * third, lit(0))
      .when(w < third,
        greatest(length(bin(greatest(w, lit(1)))) - 61, lit(-40)))
      .otherwise(
        least(lit(61) - length(bin(greatest(lit(3 * third - 1) - w, lit(1)))),
          lit(40)))
      .cast("long")
  }

  def q210_dp_noisy_counts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "documents")
      .groupBy($"source", $"lang").agg(count(lit(1)).as("n_true"))
      .withColumn("noise",
        geometricNoise(concat(lit("graft_dp_"), $"source", lit("_"), $"lang")))
      .select($"source", $"lang", $"n_true", $"noise",
        greatest($"n_true" + $"noise", lit(0L)).as("n_noisy"),
        lit(693L).as("epsilon_milli"))
      .orderBy($"source", $"lang")
  }

  /** q213 — sequential quality-filter funnel (the CCNet/Dolma-style
    * gate report): four per-document gates applied in order — length
    * in [100, 500] chars, within-document distinct-token ratio ≥ 30 %,
    * mean word length in [2, 9], digit share ≤ 20 % — with per-source
    * survivor counts after each stage, so the report shows WHICH gate
    * eats a slice, not just the final rate. Every gate is a scalar
    * expression over the row (distinct-ratio via array_distinct, no
    * per-doc aggregation), so the whole funnel is one codegen'd scan
    * plus a source-bounded final aggregate — embarrassingly parallel
    * at any corpus size.
    */
  final val DpQuantileBinWidth = 50L

  /** q299 — differentially-private quantiles via report-noisy-max
    * (the exponential mechanism over histogram bins, in the
    * noisy-argmax form q224's DP top-k already uses): release the
    * p25/p50/p75 of the document-length distribution without exposing
    * exact ranks. Per candidate bin the utility is −|cum(bin) −
    * target| (sensitivity 1 under add/remove); the released bin is
    * the argmax of utility + discrete-Laplace noise drawn by the
    * exact bit-length mechanism (q210 — no transcendentals, replayed
    * bit-for-bit by the oracle), tie to the lower bin. One corpus
    * scan folds to the bounded bin histogram; everything after is
    * |bins|·|quantiles| integer work. The demo emits the true bin
    * beside the DP bin for auditability — a real release drops it.
    */
  def q299_dp_quantile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val binned = load(spark, dir, "documents")
      .select(expr(s"n_chars div $DpQuantileBinWidth").as("bin"))
      .groupBy($"bin").agg(count(lit(1)).as("c"))
    val cum = binned
      .withColumn("cum", sum($"c").over(Window.orderBy($"bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum($"c").over(Window.partitionBy()))
    val targets = Seq(25L, 50L, 75L).toDF("q_pct")
    val scored = cum.crossJoin(broadcast(targets))
      .withColumn("target", expr("(n * q_pct) div 100"))
      .withColumn("score", -abs($"cum" - $"target"))
      .withColumn("noisy", $"score" + geometricNoise(
        concat(lit("graft_dpq_"), $"q_pct".cast("string"),
          lit("_"), $"bin".cast("string"))))
    scored.groupBy($"q_pct")
      .agg(max($"n").as("n_docs"),
        min(when($"cum" >= $"target", $"bin")).as("true_bin"),
        max(struct($"noisy", (-$"bin").as("negbin"))).as("mx"))
      .select($"q_pct", $"n_docs", $"true_bin",
        (-$"mx.negbin").as("dp_bin"), lit(693L).as("epsilon_milli"))
      .orderBy($"q_pct")
  }

  def q213_filter_funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = load(spark, dir, "documents")
      .withColumn("toks", split($"text", " "))
      .withColumn("n_toks", size($"toks").cast("long"))
      .withColumn("nsp", length(regexp_replace($"text", " ", "")).cast("long"))
      .withColumn("g1", $"n_chars".between(100, 500))
      .withColumn("g2",
        size(array_distinct($"toks")).cast("long") * 10 >= $"n_toks" * 3)
      .withColumn("g3",
        $"nsp" * 10 >= $"n_toks" * 20 && $"nsp" * 10 <= $"n_toks" * 90)
      .withColumn("g4",
        length(regexp_replace($"text", "[^0-9]", "")).cast("long") * 5 <= $"n_chars")
    d.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"g1".cast("long")).as("pass_len"),
        sum(($"g1" && $"g2").cast("long")).as("pass_distinct"),
        sum(($"g1" && $"g2" && $"g3").cast("long")).as("pass_wordlen"),
        sum(($"g1" && $"g2" && $"g3" && $"g4").cast("long")).as("pass_digit"))
      .withColumn("keep_bp",
        round(lit(10000.0) * $"pass_digit" / $"n_docs").cast("long"))
      .orderBy($"source")
  }

  /** q215 — data-constrained epoch allocator (the "repeat good data
    * up to E epochs" budgeting step of data-constrained scaling):
    * rank sources by a quality proxy (mean document length), then
    * greedily grant each source up to 4 epochs of its unique tokens
    * until a budget of 2× the corpus's unique tokens is exhausted —
    * the partially-funded boundary source gets the integer remainder.
    * The scan aggregates to |sources| rows FIRST; the prefix-sum
    * window then runs on that dimension-sized frame (bounded by
    * construction, same rationale as q192's waterfill), so no
    * corpus-sized data ever crosses a single-partition boundary.
    */
  /** The q215 allocation frame, factored so q230 can expand the same
    * grants into an epoch-by-epoch schedule without re-deriving them.
    */
  private def repeatGrants(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = load(spark, dir, "documents")
      .groupBy($"source")
      .agg(sum(wsToks($"text").cast("long")).as("u_tokens"),
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"))
      .withColumn("quality_milli",
        round(lit(1000.0) * $"sum_chars" / $"n_docs").cast("long"))
    val tot = src.agg(sum($"u_tokens").as("corpus_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"quality_milli".desc, $"source")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    src.crossJoin(broadcast(tot))
      .withColumn("pre", coalesce(sum($"u_tokens" * 4).over(w), lit(0L)))
      .withColumn("grant_tokens",
        greatest(least(lit(2) * $"corpus_tokens" - $"pre", $"u_tokens" * 4), lit(0L)))
  }

  def q215_repeat_epochs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    repeatGrants(spark, dir)
      .select($"source", $"u_tokens", $"quality_milli", $"grant_tokens",
        round(lit(1000.0) * $"grant_tokens" / $"u_tokens").cast("long")
          .as("epochs_milli"))
      .orderBy($"quality_milli".desc, $"source")
  }

  /** q230 — epoch-by-epoch consumption schedule: expand q215's grants
    * into the concrete plan the trainer executes — one row per
    * (source, epoch) with that epoch's token draw; full epochs carry
    * the source's whole unique mass, the boundary epoch carries the
    * integer remainder. Fan-out is a sequence explode bounded by the
    * 4-epoch cap on the \|sources\|-row frame — nothing corpus-sized
    * moves.
    */
  def q230_epoch_schedule(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    repeatGrants(spark, dir)
      .filter($"grant_tokens" > 0)
      .select($"source", $"u_tokens", $"grant_tokens",
        explode(expr(
          "sequence(1, CAST((grant_tokens + u_tokens - 1) DIV u_tokens AS INT))"))
          .as("epoch"))
      .withColumn("epoch_tokens",
        when($"epoch" * $"u_tokens" <= $"grant_tokens", $"u_tokens")
          .otherwise($"grant_tokens" - ($"epoch" - 1) * $"u_tokens"))
      .select($"source", $"epoch".cast("long").as("epoch"), $"epoch_tokens")
      .orderBy($"source", $"epoch")
  }

  /** q218 — n-gram novelty audit: for each candidate document (the
    * src0 slice, standing in for a synthetic/generated batch), the
    * share of its distinct word 4-grams NEVER seen in the reference
    * corpus (everything else) — the inverse of q44's contamination
    * check, used to answer "is this generated data new text or a
    * paraphrase mosaic?" before admitting it to training. The
    * reference gram set is a distinct aggregate; membership is one
    * equi-join on the gram string (left join + null flag, so the
    * unseen count needs no anti-join pass); per-candidate aggregate
    * closes it. All shuffle keys are vocab-bounded.
    */
  def q218_ngram_novelty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def grams4(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"source", split($"text", " ").as("sp"))
      .filter(size($"sp") >= 4)
      .select($"doc_id", $"source", explode(array_distinct(expr(
        "transform(sequence(0, size(sp) - 4), i -> concat(sp[i], ' ', sp[i+1], ' ', sp[i+2], ' ', sp[i+3]))")))
        .as("g"))
    val docs = graft.Caches.tracked(grams4(load(spark, dir, "documents")))
    val cand = docs.filter($"source" === "src0")
    val ref = docs.filter($"source" =!= "src0")
      .select($"g").distinct().withColumn("seen", lit(1))
    cand.join(ref, Seq("g"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"seen".isNull, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_bp",
        round(lit(10000.0) * $"n_novel" / $"n_grams").cast("long"))
      .orderBy($"doc_id")
  }

  /** q219 — embedding distribution drift: per label, compare the
    * centroid of the even-id half of the corpus against the odd-id
    * half (standing in for "last ingest" vs "this ingest") via L2
    * shift and centroid cosine — the embedding-space analog of q135's
    * scalar KS drift, the canary that an encoder change or a crawl
    * shift moved a slice's semantic mass. Per-(label, half, dim)
    * means are one partial+final aggregate (64·|labels|·2 cells, no
    * row ever leaves its partition before partial agg); the distance
    * fold runs on that bounded cell table. Micro-rounding absorbs
    * engine summation-order ulps, as across the ANN layer.
    */
  def q219_embedding_drift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = load(spark, dir, "embeddings")
      .select($"label", ($"vec_id" % 2).as("half"),
        posexplode(graft.llm.Similarity.toDouble($"embedding")))
      .toDF("label", "half", "i", "x")
    val cent = graft.Caches.tracked(
      e.groupBy($"label", $"half", $"i").agg(avg($"x").as("m")))
    val a = cent.filter($"half" === 0).select($"label", $"i", $"m".as("ma"))
    val b = cent.filter($"half" === 1).select($"label", $"i", $"m".as("mb"))
    val d = a.join(b, Seq("label", "i"))
      .groupBy($"label")
      .agg(sum(($"ma" - $"mb") * ($"ma" - $"mb")).as("d2"),
        sum($"ma" * $"mb").as("dt"),
        sum($"ma" * $"ma").as("na2"),
        sum($"mb" * $"mb").as("nb2"))
    val cnt = load(spark, dir, "embeddings")
      .groupBy($"label")
      .agg(sum(when($"vec_id" % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when($"vec_id" % 2 === 1, 1L).otherwise(0L)).as("n_b"))
    d.join(broadcast(cnt), "label")
      .select($"label", $"n_a", $"n_b",
        round(sqrt($"d2") * 1e6).cast("long").as("l2_micro"),
        round($"dt" / (sqrt($"na2") * sqrt($"nb2")) * 1e6).cast("long")
          .as("cos_micro"))
      .orderBy($"label")
  }

  /** q221 — temperature-scaled language mixture (the mC4/XLM-R
    * α-sampling rule): sampling shares p_l ∝ mass_l^α with α = 0.3
    * flatten the language distribution so low-resource languages
    * aren't drowned — emitted next to the raw proportional shares
    * with the per-language boost factor. The only transcendental is
    * pow (micro-rounded like every ANN cosine; the ratio of ~0.2-
    * scale doubles puts engine ulps 10 orders below the rounding
    * grain). One aggregation to |langs| rows, a 1-row broadcast of
    * the two normalizers, map-side arithmetic after that.
    */
  def q221_temperature_mixture(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = load(spark, dir, "documents")
      .groupBy($"lang").agg(sum(wsToks($"text").cast("long")).as("mass"))
    val tot = m.agg(sum($"mass").as("tot"), sum(pow($"mass", 0.3)).as("tot_t"))
    m.crossJoin(broadcast(tot))
      .select($"lang", $"mass",
        round(lit(1000000.0) * $"mass" / $"tot").cast("long").as("raw_micro"),
        round(lit(1000000.0) * pow($"mass", 0.3) / $"tot_t").cast("long")
          .as("temp_micro"))
      .withColumn("boost_milli",
        round(lit(1000.0) * $"temp_micro" / $"raw_micro").cast("long"))
      .orderBy($"lang")
  }

  /** q315 — UCB1 source-selection scores (Auer et al. 2002, the
    * online-data-mixing readout of Albalak et al. 2023): treat each
    * corpus source as a bandit arm, reward = the quality-gate pass
    * rate of its documents, plays = documents seen, and emit each
    * arm's UCB score mean + √(2·ln N / n) — the "which source should
    * the sampler draw from next" table that sits beside the OFFLINE
    * mixers (q221 temperature reweighting, q238 excess-loss weights).
    * The quality gate is the deterministic cross-multiplied band the
    * funnel family uses (length band + distinct-token ratio ≥ 0.40),
    * so the reward is integer-exact; the single transcendental
    * exploration bonus is basis-point-rounded, the established
    * cross-engine treatment (q201's ln, q26's cosine). One scan to a
    * |sources|-row aggregate — scale cost is the scan; the bonus math
    * runs on the bounded arm table. Exploration dominance is visible
    * by construction: an under-sampled source outranks an
    * equally-good heavily-sampled one.
    */
  def q315_ucb_source_selection(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val arms = load(spark, dir, "documents")
      .select($"source",
        TextAnalysis.qualityGatePass($"n_chars", $"text").as("pass"))
      .groupBy($"source")
      .agg(count(lit(1)).as("plays"), sum($"pass").as("rewards"))
    val tot = arms.agg(sum($"plays").as("n_total"))
    arms.crossJoin(broadcast(tot))
      .select($"source", $"plays", $"rewards",
        round(lit(10000.0) * $"rewards" / $"plays").cast("long")
          .as("mean_bp"),
        round(lit(10000.0) *
          sqrt(lit(2.0) * log($"n_total") / $"plays")).cast("long")
          .as("bonus_bp"))
      .withColumn("ucb_bp", $"mean_bp" + $"bonus_bp")
      .orderBy($"ucb_bp".desc, $"source")
  }

  /** Importance-weight clip for q319 (micro units): w̃ = min(w, 10).
    * The standard IPS variance control — unclipped weights explode on
    * rare sources, and the clip is exactly what makes IPS ≠ SNIPS.
    */
  final val IpsClipMicro = 10000000L

  /** q319 — off-policy evaluation of a data-mixing policy (IPS and
    * SNIPS, Horvitz–Thompson / self-normalized importance sampling;
    * Swaminathan & Joachims 2015): the OFFLINE dual of q315's online
    * UCB — given documents logged under the historical sampler (each
    * corpus doc = one logged draw, propensity 1/N), estimate the mean
    * quality-gate reward the UNIFORM-OVER-SOURCES target policy would
    * have earned, without re-sampling. Per-doc importance weight
    * w = π/p = N/(|S|·n_s) collapses to ONE weight per source, so the
    * whole estimator runs on the bounded arms table: micro-rounded
    * per-source weights clipped at [[IpsClipMicro]] (the clip is the
    * variance control that makes the two estimators differ), exact
    * long term sums Σw̃·x and Σw̃·n, one closing division each —
    * ips_micro = Σw̃x/N, snips_micro = 1e6·Σw̃x/Σw̃n. Reward is the
    * SAME shared gate as q315/q317 ([[TextAnalysis.qualityGatePass]]).
    * One scan to a |sources|-row aggregate; scale cost is the scan.
    */
  def q319_ips_offpolicy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val arms = load(spark, dir, "documents")
      .select($"source",
        TextAnalysis.qualityGatePass($"n_chars", $"text").as("pass"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n"), sum($"pass").as("x"))
    val tot = arms.agg(sum($"n").as("nn"),
      count(lit(1)).cast("long").as("ns"))
    val w = arms.crossJoin(broadcast(tot))
      .withColumn("w_raw_micro",
        round(lit(1e6) * $"nn" / ($"ns" * $"n")).cast("long"))
      .withColumn("w_micro", least($"w_raw_micro", lit(IpsClipMicro)))
      .withColumn("clipped", $"w_raw_micro" > lit(IpsClipMicro))
      .withColumn("term_x", $"w_micro" * $"x")
      .withColumn("term_n", $"w_micro" * $"n")
    val est = w.agg(sum($"term_x").as("sx"), sum($"term_n").as("sn"),
      max($"nn").as("nn2"))
    w.crossJoin(broadcast(est))
      .select($"source", $"n", $"x", $"w_micro", $"clipped",
        round($"sx".cast("double") / $"nn2").cast("long").as("ips_micro"),
        round(lit(1e6) * $"sx" / $"sn").cast("long").as("snips_micro"))
      .orderBy($"source")
  }

  /** q336 — doubly-robust off-policy estimate (Dudík, Langford & Li
    * 2011): V_DR = Σ_s π(s)·q̂_s + (1/N)Σ w_s·(r − q̂_s) — the
    * estimator that is unbiased if EITHER the direct model OR the
    * propensities are right, completing the q319 IPS/SNIPS pair. The
    * direct model q̂ is fitted on the doc_id-parity MODEL half (per-
    * arm pass rate, one rounded division) and evaluated against the
    * EVAL half with q319's clipped uniform-target weights, so the
    * model is never scored on its own fitting data. An arm missing
    * the model half degrades to q̂ = 0 (pure IPS for that arm — the
    * DR fallback, not an error); an arm with no eval rows contributes
    * its DM term with zero correction. ONE corpus scan into the
    * |sources|-row conditional aggregate; the per-arm correction
    * cross-product w·(x·1e6 − n·q̂) is decimal(38,0)/HUGEINT (clip ×
    * count × 1e6 clears int64 only to ~9e5 rows/arm) with exact
    * integer sums and one closing division per estimate. The readout
    * carries DM, correction, DR and the eval-half IPS side by side —
    * |DR − IPS| is the "was the model worth it" variance diagnostic.
    */
  def q336_doubly_robust(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = load(spark, dir, "documents")
      .select($"source", ($"doc_id" % 2 === 0).as("m"),
        TextAnalysis.qualityGatePass($"n_chars", $"text").as("pass"))
    val arms = d.groupBy($"source").agg(
      sum(when($"m", 1L).otherwise(0L)).as("n_model"),
      sum(when($"m", $"pass").otherwise(0L)).as("x_model"),
      sum(when(!$"m", 1L).otherwise(0L)).as("n_eval"),
      sum(when(!$"m", $"pass").otherwise(0L)).as("x_eval"))
    val q = arms.withColumn("qhat_micro",
      when($"n_model" === 0, lit(null).cast("long"))
        .otherwise(round(lit(1e6) * $"x_model" / $"n_model").cast("long")))
    val tot = q.agg(sum($"n_eval").as("nn"),
      count(lit(1)).cast("long").as("ns"))
    val dec = "decimal(38,0)"
    val w = graft.Caches.tracked(q.crossJoin(broadcast(tot))
      .withColumn("w_micro",
        when($"n_eval" === 0, lit(null).cast("long"))
          .otherwise(least(round(lit(1e6) * $"nn" / ($"ns" * $"n_eval"))
            .cast("long"), lit(IpsClipMicro))))
      .withColumn("qhat0", coalesce($"qhat_micro", lit(0L)))
      .withColumn("corr_e12",
        when($"n_eval" === 0, lit(0L).cast(dec))
          .otherwise($"w_micro".cast(dec)
            * ($"x_eval".cast(dec) * lit(1000000L).cast(dec)
              - $"n_eval".cast(dec) * $"qhat0".cast(dec))))
      .withColumn("sx_term",
        when($"n_eval" === 0, lit(0L).cast(dec))
          .otherwise($"w_micro".cast(dec) * $"x_eval".cast(dec))))
    val est = w.agg(sum($"qhat0").as("sq"), sum($"corr_e12").as("sc"),
      sum($"sx_term").as("sx"), max($"nn").as("nn2"), max($"ns").as("ns2"))
    w.crossJoin(broadcast(est))
      .withColumn("dm_micro",
        round($"sq".cast("double") / $"ns2").cast("long"))
      .withColumn("corr_micro",
        round($"sc".cast("double") / (lit(1e6) * $"nn2")).cast("long"))
      .select($"source", $"n_model", $"qhat_micro", $"n_eval", $"x_eval",
        $"w_micro", $"dm_micro", $"corr_micro",
        ($"dm_micro" + $"corr_micro").as("dr_micro"),
        round($"sx".cast("double") / $"nn2").cast("long").as("ips_micro"))
      .orderBy($"source")
  }

  /** Group-DRO exponentiated-gradient rounds (fixed, oracle-unrolled
    * like the q34 Lloyd replay) and step size η = 1. */
  final val DroIters = 5

  /** q321 — Group-DRO mixture weights (Sagawa et al. 2020, "group
    * distributionally robust optimization"): upweight the WORST
    * groups' share of the training mix instead of the average — the
    * robustness counterpoint to q315's regret-minimizing UCB and
    * q221's temperature mixing. Groups are sources, per-group loss is
    * the quality-gate FAILURE rate (1 − pass rate, micro-exact, the
    * shared q315/q317 gate), and [[DroIters]] exponentiated-gradient
    * rounds run on the bounded |sources| arm table collected to the
    * driver (the codebook-seed posture): w ← w·exp(η·loss), then
    * normalize to Σ = 1e6 — each step micro-rounded HALF_UP with the
    * exponential evaluated once per (source, round) on identical
    * expressions in both engines (the q317 EXP treatment). One corpus
    * scan; everything after is |sources|-bounded arithmetic.
    */
  def q321_group_dro(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val arms = load(spark, dir, "documents")
      .select($"source",
        TextAnalysis.qualityGatePass($"n_chars", $"text").as("pass"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n"), sum($"pass").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1) // bounded: one row per source
    def halfUp(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val loss = arms.map { case (s, n, x) =>
      s -> (1000000L - halfUp(1e6 * x / n)) }.toMap
    var w = arms.map(a => a._1 -> 1000000L).toMap
    for (_ <- 1 to DroIters) {
      val raw = arms.map { case (s, _, _) =>
        s -> halfUp(w(s) * math.exp(loss(s) / 1e6)) }.toMap
      val tot = raw.values.sum
      w = arms.map { case (s, _, _) =>
        s -> math.max(1L, halfUp(1e6 * raw(s) / tot)) }.toMap
    }
    arms.map { case (s, n, x) => (s, n, loss(s), w(s)) }.toSeq
      .toDF("source", "n", "loss_micro", "w_micro")
      .withColumn("dro_rank", row_number().over(
        Window.orderBy($"w_micro".desc, $"source")).cast("long"))
      .orderBy($"source")
  }

  /** Quality-histogram bin width for q322 (bp // 1000 → 11 bins) and
    * the micro-scaled keep-probability cap. */
  final val QmBinBp = 1000L

  /** q322 — quantile-matched downsampling: reshape every source's
    * quality DISTRIBUTION to match a reference source's (src0), not
    * just its mean — the distribution-matching curation step beside
    * the size-equalizer q42 and the temperature mixer q221. Per
    * (source, quality-bin): keep probability p = min(1, target-share/
    * source-share) from exact integer cross-products (t_b·n_s vs
    * n_t·s_b — the q135 trick) with one micro-rounding; the keep rule
    * is q201's deterministic integer hash draw (md5-derived
    * u < p — reproducible, partitioning-independent). Output is the
    * bounded per-(source, bin) audit: n, p, kept. Scale cost: one
    * stats scan + one filter scan; only |sources|·11 rows shuffle.
    */
  def q322_quantile_match(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // ONE quality pass: bin and the hash draw materialize together —
    // hist/tgt/nS/nt and the keep scan all reuse it (uncached, the
    // string-heavy qualityBp re-ran 5x: measured 11.3 s → ~2.5 s sf1.0)
    val docs = graft.Caches.tracked(load(spark, dir, "documents")
      .select($"doc_id", $"source",
        (TextAnalysis.qualityBp($"text") / QmBinBp).cast("long").as("bin"))
      .withColumn("u",
        hash60(concat(lit("graft_qmatch_"), $"doc_id".cast("string")))
          % 1000000L))
    val hist = graft.Caches.tracked(
      docs.groupBy($"source", $"bin").agg(count(lit(1)).as("sb")))
    val tgt = hist.filter($"source" === "src0")
      .select($"bin", $"sb".as("tb"))
    val nS = hist.groupBy($"source").agg(sum($"sb").as("ns"))
    val nT = tgt.agg(sum($"tb").as("nt"))
    val p = hist.join(broadcast(tgt), Seq("bin"), "left")
      .join(broadcast(nS), "source").crossJoin(broadcast(nT))
      .select($"source", $"bin", $"sb",
        least(lit(1000000L),
          round(lit(1e6) * (coalesce($"tb", lit(0L)) * $"ns")
            / ($"nt" * $"sb")).cast("long")).as("p_micro"))
    val kept = docs
      .join(broadcast(p), Seq("source", "bin"))
      .groupBy($"source", $"bin")
      .agg(count(lit(1)).as("n"), max($"p_micro").as("p_micro"),
        sum(when($"u" < $"p_micro", 1L).otherwise(0L)).as("kept"))
    kept.orderBy($"source", $"bin")
  }

  /** q328 — 1-D earth mover's distance between quality distributions
    * (Wasserstein-1 via the closed form W₁ = Σ|F_s − F_ref| over the
    * ordered bins): HOW FAR each source's quality distribution sits
    * from the reference source's, in quality-bin units — the
    * magnitude statistic the existence tests don't give (q135 KS =
    * max gap, q208 TV = unordered mass diff; EMD respects the ORDER
    * of the quality axis, so "all mass one bin low" scores less than
    * "all mass ten bins low"). The natural companion readout to
    * q322's quantile matching: it measures exactly the distance q322
    * then removes, against the same src0 reference and the same
    * [[QmBinBp]] bins. Exact integers end-to-end: CDF gaps
    * cross-multiply (|cum_s·n_ref − cum_ref·n_s|), one milli-rounded
    * closing division; ALL THREE cross products (the two CDF gaps
    * AND the n_docs·n_ref denominator) are exact decimal(38,0) /
    * HUGEINT so nothing overflows int64 at ~3e9 docs/side — the q104
    * treatment, doubles only in the one closing division with an
    * identical expression tree on both engines. One scan to a
    * |sources|·11 grid;
    * the per-source cumulative window is 11 rows per group by
    * construction. Corpora without the reference source emit zero
    * rows, never throw.
    */
  def q328_emd_quality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hist = graft.Caches.tracked(load(spark, dir, "documents")
      .select($"source",
        (TextAnalysis.qualityBp($"text") / QmBinBp).cast("long").as("bin"))
      .groupBy($"source", $"bin").agg(count(lit(1)).as("c")))
    // dense 0..10 grid per source: missing bins carry zero mass but
    // still propagate the running CDF gap
    val grid = hist.select($"source").distinct()
      .select($"source", explode(sequence(lit(0L), lit(10L))).as("bin"))
    val cum = graft.Caches.tracked(grid
      .join(hist, Seq("source", "bin"), "left")
      .select($"source", $"bin", coalesce($"c", lit(0L)).as("c"))
      .withColumn("cum", sum($"c").over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"source").orderBy($"bin"))))
    val tot = cum.filter($"bin" === 10L).select($"source", $"cum".as("ns"))
    val ref = cum.filter($"source" === "src0")
      .select($"bin", $"cum".as("rcum"))
    val nr = tot.filter($"source" === "src0").select($"ns".as("nr"))
    cum.filter($"bin" <= 9L)
      .join(broadcast(ref), "bin")
      .join(broadcast(tot), "source")
      .crossJoin(broadcast(nr))
      .groupBy($"source")
      .agg(max($"ns").as("n_docs"), max($"nr").as("n_ref"),
        sum(abs($"cum".cast("decimal(38,0)") * $"nr" -
          $"rcum".cast("decimal(38,0)") * $"ns")).as("a"))
      .select($"source", $"n_docs",
        round(lit(1000.0) * $"a".cast("double") /
          ($"n_docs".cast("decimal(38,0)") * $"n_ref").cast("double"))
          .cast("long").as("emd_milli"))
      .orderBy($"source")
  }

  /** q223 — context-window truncation loss: per source, the token
    * mass and document count lost if every document is cut at a
    * 48-token window (sized to this corpus's ~55-token mean; a
    * production run sets the model context length) — the report that
    * decides between truncation and q206-style packing for a slice.
    * Single narrow scan + one aggregation; trivially parallel.
    */
  def q223_truncation_loss(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val win = 48L
    load(spark, dir, "documents")
      .select($"source", wsToks($"text").cast("long").as("n_toks"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_toks").as("total_tokens"),
        sum(greatest($"n_toks" - win, lit(0L))).as("tokens_cut"),
        sum(when($"n_toks" > win, 1L).otherwise(0L)).as("docs_cut"))
      .withColumn("loss_bp",
        round(lit(10000.0) * $"tokens_cut" / $"total_tokens").cast("long"))
      .orderBy($"source")
  }

  /** q224 — differentially-private top-k release: the most frequent
    * tokens per language with geometric noise (q210's exact integer
    * draw, seeded per (lang, token)) added BEFORE ranking, so the
    * released list and its counts are both noisy — the
    * noisy-top-k/"report noisy max" composition privacy releases
    * use for vocabulary statistics. True counts never leave the
    * plan. The per-lang rank-filter rewrites to the bounded TopK
    * heaps (RankLimitRewrite), so few-language corpora don't funnel
    * the vocab-sized count table through single-partition windows.
    */
  def q224_dp_noisy_topk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = load(spark, dir, "documents")
      .select($"lang", explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"lang", $"w").agg(count(lit(1)).as("n"))
      .withColumn("n_noisy",
        greatest($"n" + geometricNoise(
          concat(lit("graft_dptk_"), $"lang", lit("_"), $"w")), lit(0L)))
    counts
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"lang").orderBy($"n_noisy".desc, $"w")).cast("long"))
      .filter($"rank" <= 5)
      .select($"lang", $"rank", $"w".as("token"), $"n_noisy")
      .orderBy($"lang", $"rank")
  }

  /** q236 — split-leakage audit: for every val/test document under
    * q130's deterministic split rule, the share of its distinct word
    * 5-grams that also occur in the TRAIN split — the eval-integrity
    * check that catches near-duplicates straddling a random split
    * (the reason real pipelines split by URL/cluster, not by doc
    * hash). Documents with ≥ 25 % leaked grams are flagged. The train
    * gram set is a distinct aggregate; membership is one left
    * equi-join on the gram; everything is vocab-keyed.
    */
  def q236_split_leakage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = load(spark, dir, "documents")
      .withColumn("bucket",
        hash60(concat(lit("graft_split_"), $"doc_id".cast("string"))) % 100)
      .withColumn("split",
        when($"bucket" < 80, "train")
          .when($"bucket" < 90, "val").otherwise("test"))
      .select($"doc_id", $"split", split($"text", " ").as("sp"))
      .filter(size($"sp") >= 5)
    val grams = graft.Caches.tracked(docs
      .select($"doc_id", $"split", explode(array_distinct(expr(
        "transform(sequence(0, size(sp) - 5), i -> concat_ws(' ', sp[i], sp[i+1], sp[i+2], sp[i+3], sp[i+4]))")))
        .as("g")))
    val train = grams.filter($"split" === "train")
      .select($"g").distinct().withColumn("seen", lit(1))
    grams.filter($"split" =!= "train")
      .join(train, Seq("g"), "left")
      .groupBy($"split", $"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"seen".isNotNull, 1L).otherwise(0L)).as("n_leaked"))
      .withColumn("leak_bp",
        round(lit(10000.0) * $"n_leaked" / $"n_grams").cast("long"))
      .filter($"leak_bp" >= 2500)
      .orderBy($"split", $"doc_id")
  }

  /** q239 — shard provenance manifest: per packed shard (the q45
    * assignment), the reproducibility record a release writes next to
    * the data — document count, token mass, id range, and an
    * ORDER-INDEPENDENT content checksum (bit-xor of the md5-60-bit
    * content hashes, so any engine and any partitioning reproduces
    * the same fingerprint). Verifying a delivered shard is one scan +
    * compare against this table. The assignment rides the two-phase
    * range scan (q45); the manifest is one further bounded aggregate.
    */
  def q239_shard_manifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val h = load(spark, dir, "documents")
      .select($"doc_id", hash60($"text").as("h"))
    shardAssignments(load(spark, dir, "documents"))
      .join(h, "doc_id")
      .groupBy($"lang", $"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"toks").as("sum_toks"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"),
        expr("bit_xor(h)").as("content_xor"))
      .orderBy($"lang", $"shard")
  }

  /** q240 — rare-token retention list: documents carrying corpus-tail
    * vocabulary — the protection list aggressive quality filtering
    * consults so tail knowledge (named entities, rare terminology)
    * isn't silently purged with the junk. "Rare" is RELATIVE (cf ≤
    * median cf / 4), so the list is non-degenerate on any frequency
    * profile — an absolute floor returns nothing on a flat synthetic
    * vocabulary and everything on a Zipf head-heavy one. One
    * word-keyed count, a 1-row median broadcast, one equi-join back,
    * per-doc aggregate.
    */
  def q240_rare_token_retention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = graft.Caches.tracked(load(spark, dir, "documents")
      .select($"doc_id", $"source", explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0))
    val cfs = words.groupBy($"w").agg(count(lit(1)).as("cf"))
    val med = cfs.agg(expr("percentile(cf, 0.5)").as("med"))
    val rare = cfs.crossJoin(broadcast(med))
      .filter($"cf" * 4 <= $"med").select($"w")
    words.join(rare, "w")
      .groupBy($"doc_id", $"source")
      .agg(count(lit(1)).as("n_rare_tokens"),
        countDistinct($"w").as("n_rare_types"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q239_shard_manifest" -> q239_shard_manifest,
    "q240_rare_token_retention" -> q240_rare_token_retention,
    "q236_split_leakage" -> q236_split_leakage,
    "q230_epoch_schedule" -> q230_epoch_schedule,
    "q221_temperature_mixture" -> q221_temperature_mixture,
    "q315_ucb_source_selection" -> q315_ucb_source_selection,
    "q319_ips_offpolicy" -> q319_ips_offpolicy,
    "q336_doubly_robust" -> q336_doubly_robust,
    "q321_group_dro" -> q321_group_dro,
    "q322_quantile_match" -> q322_quantile_match,
    "q328_emd_quality" -> q328_emd_quality,
    "q223_truncation_loss" -> q223_truncation_loss,
    "q224_dp_noisy_topk" -> q224_dp_noisy_topk,
    "q218_ngram_novelty" -> q218_ngram_novelty,
    "q219_embedding_drift" -> q219_embedding_drift,
    "q209_k_anonymity" -> q209_k_anonymity,
    "q210_dp_noisy_counts" -> q210_dp_noisy_counts,
    "q299_dp_quantile" -> q299_dp_quantile,
    "q213_filter_funnel" -> q213_filter_funnel,
    "q215_repeat_epochs" -> q215_repeat_epochs,
    "q192_budget_waterfill" -> q192_budget_waterfill,
    "q191_boilerplate_spans" -> q191_boilerplate_spans,
    "q144_blocklist_audit" -> q144_blocklist_audit,
    "q139_weighted_median" -> q139_weighted_median,
    "q135_ks_drift" -> q135_ks_drift,
    "q250_mann_whitney" -> q250_mann_whitney,
    "q254_bootstrap_ci" -> q254_bootstrap_ci,
    "q255_conformal_interval" -> q255_conformal_interval,
    "q259_fim_transform" -> q259_fim_transform,
    "q260_preference_pairs" -> q260_preference_pairs,
    "q262_t_closeness" -> q262_t_closeness,
    "q335_l_diversity" -> q335_l_diversity,
    "q263_psi_drift" -> q263_psi_drift,
    "q273_robust_mean" -> q273_robust_mean,
    "q274_robust_scale" -> q274_robust_scale,
    "q279_wasserstein" -> q279_wasserstein,
    "q130_train_val_test" -> q130_train_val_test,
    "q122_negative_sampling" -> q122_negative_sampling,
    "q41_stratified_sample" -> q41_stratified_sample,
    "q74_importance_sample" -> q74_importance_sample,
    "q205_dsir_select" -> q205_dsir_select,
    "q206_pack_windows" -> q206_pack_windows,
    "q201_weighted_sample" -> q201_weighted_sample,
    "q202_training_order" -> q202_training_order,
    "q42_mixture_rates" -> q42_mixture_rates,
    "q43_pii_redact" -> q43_pii_redact,
    "q44_contamination" -> q44_contamination,
    "q45_shard_pack" -> q45_shard_pack,
    "q46_embedding_outliers" -> q46_embedding_outliers,
    "q50_embedding_quantize" -> q50_embedding_quantize)

  private def rateBpSql: String =
    SampleRateBp.foldLeft(s"$SampleRateDefaultBp") { case (acc, (l, r)) =>
      s"CASE WHEN lang = '$l' THEN $r ELSE $acc END"
    }

  private def blocklistHitsSql: String = Blocklist
    .map(t => s"CASE WHEN list_contains(string_split(text, ' '), '$t') " +
      "THEN 1 ELSE 0 END")
    .mkString("(", " + ", ")")

  val oracle: Map[String, String] = Map(
    "q239_shard_manifest" ->
      s"""WITH d AS (SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |a AS (SELECT doc_id, lang, toks, h,
        |        CAST(COALESCE(SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum0
        |      FROM d)
        |SELECT lang, CAST(FLOOR(cum0 / $ShardTokenBudget) AS BIGINT) AS shard,
        |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS sum_toks,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
        |  CAST(bit_xor(h) AS BIGINT) AS content_xor
        |FROM a GROUP BY 1, 2 ORDER BY lang, shard""".stripMargin,
    "q240_rare_token_retention" ->
      """WITH t AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        |           FROM documents),
        |tz AS (SELECT doc_id, source, w FROM t WHERE len(w) > 0),
        |c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cf FROM tz GROUP BY 1),
        |m AS (SELECT quantile_cont(cf, 0.5) AS med FROM c),
        |r AS (SELECT w FROM c CROSS JOIN m WHERE cf * 4 <= med)
        |SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_rare_tokens,
        |  CAST(COUNT(DISTINCT w) AS BIGINT) AS n_rare_types
        |FROM tz JOIN r USING (w) GROUP BY 1, 2 ORDER BY doc_id""".stripMargin,
    "q236_split_leakage" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN CAST(('0x' || substring(md5('graft_split_' || doc_id), 1, 15))
        |              AS BIGINT) % 100 < 80 THEN 'train'
        |         WHEN CAST(('0x' || substring(md5('graft_split_' || doc_id), 1, 15))
        |              AS BIGINT) % 100 < 90 THEN 'val' ELSE 'test' END AS split,
        |    string_split(text, ' ') AS sp
        |  FROM documents WHERE len(string_split(text, ' ')) >= 5),
        |g AS (SELECT DISTINCT doc_id, split,
        |        sp[i] || ' ' || sp[i+1] || ' ' || sp[i+2] || ' ' || sp[i+3]
        |          || ' ' || sp[i+4] AS g
        |      FROM (SELECT doc_id, split, sp,
        |              unnest(generate_series(1, len(sp) - 4)) AS i FROM d)),
        |tr AS (SELECT DISTINCT g FROM g WHERE split = 'train'),
        |ev AS (SELECT g.split, g.doc_id, g.g, tr.g IS NOT NULL AS seen
        |       FROM g LEFT JOIN tr USING (g) WHERE g.split <> 'train'),
        |a AS (SELECT split, doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |        CAST(SUM(CASE WHEN seen THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked
        |      FROM ev GROUP BY 1, 2)
        |SELECT split, doc_id, n_grams, n_leaked,
        |  CAST(ROUND(10000.0 * n_leaked / n_grams) AS BIGINT) AS leak_bp
        |FROM a WHERE ROUND(10000.0 * n_leaked / n_grams) >= 2500
        |ORDER BY split, doc_id""".stripMargin,
    "q230_epoch_schedule" ->
      """WITH s AS (SELECT source,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS u_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |  FROM documents GROUP BY 1),
        |q AS (SELECT source, u_tokens,
        |    CAST(ROUND(1000.0 * sum_chars / n_docs) AS BIGINT) AS quality_milli
        |  FROM s),
        |t AS (SELECT CAST(SUM(u_tokens) AS BIGINT) AS corpus_tokens FROM q),
        |p AS (SELECT q.*, t.corpus_tokens,
        |    COALESCE(SUM(u_tokens * 4) OVER (ORDER BY quality_milli DESC, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
        |  FROM q CROSS JOIN t),
        |g AS (SELECT source, u_tokens,
        |    CAST(greatest(least(2 * corpus_tokens - pre, u_tokens * 4), 0) AS BIGINT)
        |      AS grant_tokens
        |  FROM p)
        |SELECT source, CAST(e AS BIGINT) AS epoch,
        |  CAST(CASE WHEN e * u_tokens <= grant_tokens THEN u_tokens
        |       ELSE grant_tokens - (e - 1) * u_tokens END AS BIGINT) AS epoch_tokens
        |FROM (SELECT source, u_tokens, grant_tokens,
        |        unnest(generate_series(1,
        |          CAST((grant_tokens + u_tokens - 1) // u_tokens AS INT))) AS e
        |      FROM g WHERE grant_tokens > 0)
        |ORDER BY source, epoch""".stripMargin,
    "q321_group_dro" -> {
      val iters = (1 to DroIters).map { t =>
        s"""r$t AS MATERIALIZED (SELECT a.source,
           |    CAST(ROUND(p${t - 1}.w * EXP(a.loss_micro / 1e6)) AS BIGINT) AS raw
           |  FROM arms a JOIN p${t - 1} ON p${t - 1}.source = a.source),
           |s$t AS (SELECT CAST(SUM(raw) AS BIGINT) AS tot FROM r$t),
           |p$t AS MATERIALIZED (SELECT source,
           |    GREATEST(1, CAST(ROUND(1e6 * raw / tot) AS BIGINT)) AS w
           |  FROM r$t, s$t)""".stripMargin
      }.mkString(",\n")
      s"""WITH arms0 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(${TextAnalysis.QualityGateSql}) AS BIGINT) AS x
        |  FROM documents GROUP BY 1),
        |arms AS MATERIALIZED (SELECT source, n, x,
        |    1000000 - CAST(ROUND(1e6 * x / n) AS BIGINT) AS loss_micro
        |  FROM arms0),
        |p0 AS (SELECT source, CAST(1000000 AS BIGINT) AS w FROM arms),
        |$iters
        |SELECT a.source, a.n, a.loss_micro, pf.w AS w_micro,
        |  CAST(ROW_NUMBER() OVER (ORDER BY pf.w DESC, a.source) AS BIGINT)
        |    AS dro_rank
        |FROM arms a JOIN p$DroIters pf ON pf.source = a.source
        |ORDER BY a.source""".stripMargin
    },
    "q328_emd_quality" ->
      s"""WITH d AS (SELECT source,
        |    ${TextAnalysis.QualityBpSql} // $QmBinBp AS bin FROM documents),
        |h AS (SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM d GROUP BY 1, 2),
        |grid AS (SELECT s.source, t.b AS bin
        |  FROM (SELECT DISTINCT source FROM h) s, generate_series(0, 10) t(b)),
        |cum AS (SELECT g.source, g.bin,
        |    CAST(SUM(COALESCE(h.c, 0)) OVER (PARTITION BY g.source
        |      ORDER BY g.bin) AS BIGINT) AS cum
        |  FROM grid g LEFT JOIN h ON h.source = g.source AND h.bin = g.bin),
        |tot AS (SELECT source, cum AS ns FROM cum WHERE bin = 10),
        |ref AS (SELECT bin, cum AS rcum FROM cum WHERE source = 'src0'),
        |nr AS (SELECT ns AS nr FROM tot WHERE source = 'src0')
        |SELECT c.source, MAX(t.ns) AS n_docs,
        |  CAST(ROUND(1000.0 * CAST(SUM(ABS(CAST(c.cum AS HUGEINT) * nr.nr
        |      - CAST(r.rcum AS HUGEINT) * t.ns)) AS DOUBLE)
        |    / CAST(CAST(MAX(t.ns) AS HUGEINT) * MAX(nr.nr) AS DOUBLE))
        |    AS BIGINT) AS emd_milli
        |FROM cum c JOIN ref r ON r.bin = c.bin
        |  JOIN tot t ON t.source = c.source CROSS JOIN nr
        |WHERE c.bin <= 9 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q322_quantile_match" ->
      s"""WITH d AS (SELECT doc_id, source,
        |    ${TextAnalysis.QualityBpSql} // $QmBinBp AS bin
        |  FROM documents),
        |hist AS (SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS sb
        |  FROM d GROUP BY 1, 2),
        |tgt AS (SELECT bin, sb AS tb FROM hist WHERE source = 'src0'),
        |ns AS (SELECT source, CAST(SUM(sb) AS BIGINT) AS ns FROM hist GROUP BY 1),
        |nt AS (SELECT CAST(SUM(tb) AS BIGINT) AS nt FROM tgt),
        |p AS (SELECT hist.source, hist.bin, hist.sb,
        |    LEAST(1000000, CAST(ROUND(1e6 * (COALESCE(tgt.tb, 0) * ns.ns)
        |      / (nt.nt * hist.sb)) AS BIGINT)) AS p_micro
        |  FROM hist LEFT JOIN tgt ON tgt.bin = hist.bin
        |  JOIN ns ON ns.source = hist.source, nt)
        |SELECT d.source, d.bin, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MAX(p.p_micro) AS BIGINT) AS p_micro,
        |  CAST(SUM(CASE WHEN
        |      CAST('0x' || substring(md5('graft_qmatch_' || CAST(d.doc_id AS VARCHAR)), 1, 15)
        |        AS BIGINT) % 1000000 < p.p_micro
        |    THEN 1 ELSE 0 END) AS BIGINT) AS kept
        |FROM d JOIN p ON p.source = d.source AND p.bin = d.bin
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q319_ips_offpolicy" ->
      s"""WITH arms AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(${TextAnalysis.QualityGateSql}) AS BIGINT) AS x
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |    CAST(COUNT(*) AS BIGINT) AS ns FROM arms),
        |w AS (SELECT source, n, x, nn,
        |    LEAST(CAST(ROUND(1e6 * nn / (ns * n)) AS BIGINT), $IpsClipMicro)
        |      AS w_micro,
        |    (CAST(ROUND(1e6 * nn / (ns * n)) AS BIGINT) > $IpsClipMicro)
        |      AS clipped
        |  FROM arms, tot),
        |est AS (SELECT CAST(SUM(w_micro * x) AS BIGINT) AS sx,
        |    CAST(SUM(w_micro * n) AS BIGINT) AS sn FROM w)
        |SELECT source, n, x, w_micro, clipped,
        |  CAST(ROUND(CAST(sx AS DOUBLE) / nn) AS BIGINT) AS ips_micro,
        |  CAST(ROUND(1e6 * sx / sn) AS BIGINT) AS snips_micro
        |FROM w, est ORDER BY source""".stripMargin,
    "q336_doubly_robust" ->
      s"""WITH d AS (SELECT source, doc_id % 2 = 0 AS m,
        |    ${TextAnalysis.QualityGateSql} AS pass FROM documents),
        |arms AS (SELECT source,
        |    CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_model,
        |    CAST(SUM(CASE WHEN m THEN pass ELSE 0 END) AS BIGINT) AS x_model,
        |    CAST(SUM(CASE WHEN m THEN 0 ELSE 1 END) AS BIGINT) AS n_eval,
        |    CAST(SUM(CASE WHEN m THEN 0 ELSE pass END) AS BIGINT) AS x_eval
        |  FROM d GROUP BY 1),
        |q AS (SELECT *, CASE WHEN n_model = 0 THEN NULL
        |    ELSE CAST(ROUND(1e6 * x_model / n_model) AS BIGINT) END
        |    AS qhat_micro FROM arms),
        |tot AS (SELECT CAST(SUM(n_eval) AS BIGINT) AS nn,
        |    CAST(COUNT(*) AS BIGINT) AS ns FROM q),
        |w AS (SELECT q.*, nn, ns,
        |    CASE WHEN n_eval = 0 THEN NULL
        |      ELSE LEAST(CAST(ROUND(1e6 * nn / (ns * n_eval)) AS BIGINT),
        |        $IpsClipMicro) END AS w_micro,
        |    COALESCE(qhat_micro, 0) AS qhat0
        |  FROM q, tot),
        |terms AS (SELECT *,
        |    CASE WHEN n_eval = 0 THEN CAST(0 AS HUGEINT)
        |      ELSE CAST(w_micro AS HUGEINT)
        |        * (x_eval * CAST(1000000 AS HUGEINT) - n_eval * qhat0)
        |    END AS corr_e12,
        |    CASE WHEN n_eval = 0 THEN CAST(0 AS HUGEINT)
        |      ELSE CAST(w_micro AS HUGEINT) * x_eval END AS sx_term
        |  FROM w),
        |est AS (SELECT CAST(SUM(qhat0) AS BIGINT) AS sq, SUM(corr_e12) AS sc,
        |    SUM(sx_term) AS sx, MAX(nn) AS nn2, MAX(ns) AS ns2 FROM terms)
        |SELECT source, n_model, qhat_micro, n_eval, x_eval, w_micro,
        |  CAST(ROUND(CAST(sq AS DOUBLE) / ns2) AS BIGINT) AS dm_micro,
        |  CAST(ROUND(CAST(sc AS DOUBLE) / (1e6 * nn2)) AS BIGINT)
        |    AS corr_micro,
        |  CAST(ROUND(CAST(sq AS DOUBLE) / ns2) AS BIGINT)
        |    + CAST(ROUND(CAST(sc AS DOUBLE) / (1e6 * nn2)) AS BIGINT)
        |    AS dr_micro,
        |  CAST(ROUND(CAST(sx AS DOUBLE) / nn2) AS BIGINT) AS ips_micro
        |FROM terms, est ORDER BY source""".stripMargin,
    "q315_ucb_source_selection" ->
      s"""WITH arms AS (SELECT source,
        |    CAST(COUNT(*) AS BIGINT) AS plays,
        |    CAST(SUM(${TextAnalysis.QualityGateSql}) AS BIGINT) AS rewards
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(plays) AS BIGINT) AS n_total FROM arms)
        |SELECT source, plays, rewards,
        |  CAST(ROUND(10000.0 * rewards / plays) AS BIGINT) AS mean_bp,
        |  CAST(ROUND(10000.0 * SQRT(2.0 * LN(n_total) / plays)) AS BIGINT) AS bonus_bp,
        |  CAST(ROUND(10000.0 * rewards / plays) AS BIGINT) +
        |  CAST(ROUND(10000.0 * SQRT(2.0 * LN(n_total) / plays)) AS BIGINT) AS ucb_bp
        |FROM arms, tot
        |ORDER BY ucb_bp DESC, source""".stripMargin,
    "q221_temperature_mixture" ->
      """WITH m AS (SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
        |             AS mass FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(mass) AS BIGINT) AS tot, SUM(POW(mass, 0.3)) AS tot_t
        |      FROM m)
        |SELECT lang, mass,
        |  CAST(ROUND(1000000.0 * mass / tot) AS BIGINT) AS raw_micro,
        |  CAST(ROUND(1000000.0 * POW(mass, 0.3) / tot_t) AS BIGINT) AS temp_micro,
        |  CAST(ROUND(1000.0 * ROUND(1000000.0 * POW(mass, 0.3) / tot_t)
        |       / ROUND(1000000.0 * mass / tot)) AS BIGINT) AS boost_milli
        |FROM m CROSS JOIN t ORDER BY lang""".stripMargin,
    "q223_truncation_loss" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(SUM(greatest(len(string_split(text, ' ')) - 48, 0)) AS BIGINT)
        |    AS tokens_cut,
        |  CAST(SUM(CASE WHEN len(string_split(text, ' ')) > 48 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS docs_cut,
        |  CAST(ROUND(10000.0 * SUM(greatest(len(string_split(text, ' ')) - 48, 0))
        |       / SUM(len(string_split(text, ' ')))) AS BIGINT) AS loss_bp
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q224_dp_noisy_topk" ->
      """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM t WHERE len(w) > 0 GROUP BY 1, 2),
        |h AS (SELECT lang, w, n,
        |        3 * CAST(('0x' || substring(md5('graft_dptk_' || lang || '_' || w),
        |                  1, 15)) AS BIGINT) AS wd FROM c),
        |k AS (SELECT lang, w, n,
        |        CASE WHEN wd >= 1152921504606846976 AND wd < 2305843009213693952 THEN 0
        |             WHEN wd < 1152921504606846976
        |               THEN greatest(length(bin(greatest(wd, 1))) - 61, -40)
        |             ELSE least(61 - length(bin(greatest(3458764513820540927 - wd, 1))), 40)
        |        END AS noise FROM h),
        |r AS (SELECT lang, w AS token, CAST(greatest(n + noise, 0) AS BIGINT) AS n_noisy,
        |        ROW_NUMBER() OVER (PARTITION BY lang
        |          ORDER BY greatest(n + noise, 0) DESC, w) AS rank FROM k)
        |SELECT lang, CAST(rank AS BIGINT) AS rank, token, n_noisy FROM r
        |WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,
    "q218_ngram_novelty" ->
      """WITH d AS (SELECT doc_id, source,
        |    list_distinct(list_transform(
        |      generate_series(1, len(string_split(text, ' ')) - 3),
        |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
        |           || ' ' || string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3]))
        |      AS gs
        |  FROM documents WHERE len(string_split(text, ' ')) >= 4),
        |g AS (SELECT doc_id, source, unnest(gs) AS g FROM d),
        |ref AS (SELECT DISTINCT g FROM g WHERE source <> 'src0'),
        |c AS (SELECT g.doc_id, g.g, ref.g IS NOT NULL AS seen
        |      FROM g LEFT JOIN ref USING (g) WHERE g.source = 'src0')
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN seen THEN 0 ELSE 1 END) AS BIGINT) AS n_novel,
        |  CAST(ROUND(10000.0 * SUM(CASE WHEN seen THEN 0 ELSE 1 END) / COUNT(*))
        |    AS BIGINT) AS novelty_bp
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q219_embedding_drift" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |u AS (SELECT label, vec_id % 2 AS half, r.range + 1 AS i,
        |        AVG(v[r.range + 1]) AS m
        |      FROM e, range(64) r GROUP BY 1, 2, 3),
        |a AS (SELECT label, i, m FROM u WHERE half = 0),
        |b AS (SELECT label, i, m FROM u WHERE half = 1),
        |d AS (SELECT a.label, SUM((a.m - b.m) * (a.m - b.m)) AS d2,
        |        SUM(a.m * b.m) AS dt, SUM(a.m * a.m) AS na2, SUM(b.m * b.m) AS nb2
        |      FROM a JOIN b ON a.label = b.label AND a.i = b.i GROUP BY 1),
        |c AS (SELECT label,
        |        CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |        CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |      FROM e GROUP BY 1)
        |SELECT d.label AS label, c.n_a, c.n_b,
        |  CAST(ROUND(SQRT(d2) * 1e6) AS BIGINT) AS l2_micro,
        |  CAST(ROUND(dt / (SQRT(na2) * SQRT(nb2)) * 1e6) AS BIGINT) AS cos_micro
        |FROM d JOIN c ON d.label = c.label ORDER BY 1""".stripMargin,
    "q209_k_anonymity" ->
      """SELECT c.c_nationkey AS nation, c.c_mktsegment AS segment,
        |  CAST(COUNT(*) AS BIGINT) AS class_size,
        |  CAST(COUNT(DISTINCT o.o_orderpriority) AS BIGINT) AS l_diversity,
        |  CAST(COUNT(*) >= 5 AS INT) AS k_ok,
        |  CAST(COUNT(DISTINCT o.o_orderpriority) >= 3 AS INT) AS l_ok
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q299_dp_quantile" ->
      s"""WITH hb AS (SELECT n_chars // $DpQuantileBinWidth AS lb,
        |    CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY 1),
        |cum AS (SELECT lb, c,
        |    CAST(SUM(c) OVER (ORDER BY lb ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(SUM(c) OVER () AS BIGINT) AS n FROM hb),
        |t AS (SELECT * FROM (VALUES (CAST(25 AS BIGINT)), (50), (75))
        |      AS t(q_pct)),
        |x AS (SELECT t.q_pct, cum.lb, cum.cum, cum.n,
        |    (cum.n * t.q_pct) // 100 AS target FROM cum, t),
        |sc AS (SELECT q_pct, lb, cum, n, target,
        |    -abs(cum - target) AS score,
        |    3 * CAST(('0x' || substring(md5('graft_dpq_' || q_pct || '_'
        |      || lb), 1, 15)) AS BIGINT) AS w FROM x),
        |nz AS (SELECT *, score + CASE
        |    WHEN w >= 1152921504606846976 AND w < 2305843009213693952 THEN 0
        |    WHEN w < 1152921504606846976
        |      THEN greatest(length(bin(greatest(w, 1))) - 61, -40)
        |    ELSE least(61 - length(bin(greatest(3458764513820540927 - w, 1))), 40)
        |  END AS noisy FROM sc),
        |win AS (SELECT q_pct, lb AS dp_bin FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_pct
        |      ORDER BY noisy DESC, lb) AS r FROM nz) WHERE r = 1),
        |tb AS (SELECT q_pct, MAX(n) AS n_docs,
        |    MIN(CASE WHEN cum >= target THEN lb END) AS true_bin
        |  FROM nz GROUP BY 1)
        |SELECT tb.q_pct, tb.n_docs, tb.true_bin, win.dp_bin,
        |  CAST(693 AS BIGINT) AS epsilon_milli
        |FROM tb JOIN win ON win.q_pct = tb.q_pct ORDER BY tb.q_pct""".stripMargin,
    "q210_dp_noisy_counts" ->
      """WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_true
        |           FROM documents GROUP BY 1, 2),
        |h AS (SELECT source, lang, n_true,
        |        3 * CAST(('0x' || substring(md5('graft_dp_' || source || '_' || lang),
        |                  1, 15)) AS BIGINT) AS w FROM c),
        |k AS (SELECT source, lang, n_true,
        |        CASE WHEN w >= 1152921504606846976 AND w < 2305843009213693952 THEN 0
        |             WHEN w < 1152921504606846976
        |               THEN greatest(length(bin(greatest(w, 1))) - 61, -40)
        |             ELSE least(61 - length(bin(greatest(3458764513820540927 - w, 1))), 40)
        |        END AS noise FROM h)
        |SELECT source, lang, n_true, CAST(noise AS BIGINT) AS noise,
        |  CAST(greatest(n_true + noise, 0) AS BIGINT) AS n_noisy,
        |  CAST(693 AS BIGINT) AS epsilon_milli
        |FROM k ORDER BY source, lang""".stripMargin,
    "q213_filter_funnel" ->
      """WITH d AS (SELECT source, n_chars, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS d_toks,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS nsp,
        |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS dig
        |  FROM documents),
        |g AS (SELECT source,
        |    (n_chars BETWEEN 100 AND 500) AS g1,
        |    (d_toks * 10 >= n_toks * 3) AS g2,
        |    (nsp * 10 >= n_toks * 20 AND nsp * 10 <= n_toks * 90) AS g3,
        |    (dig * 5 <= n_chars) AS g4
        |  FROM d)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS pass_len,
        |  CAST(SUM(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS BIGINT) AS pass_distinct,
        |  CAST(SUM(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS pass_wordlen,
        |  CAST(SUM(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS pass_digit,
        |  CAST(ROUND(10000.0 * SUM(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END)
        |       / COUNT(*)) AS BIGINT) AS keep_bp
        |FROM g GROUP BY source ORDER BY source""".stripMargin,
    "q215_repeat_epochs" ->
      """WITH s AS (SELECT source,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS u_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |  FROM documents GROUP BY 1),
        |q AS (SELECT source, u_tokens,
        |    CAST(ROUND(1000.0 * sum_chars / n_docs) AS BIGINT) AS quality_milli
        |  FROM s),
        |t AS (SELECT CAST(SUM(u_tokens) AS BIGINT) AS corpus_tokens FROM q),
        |p AS (SELECT q.*, t.corpus_tokens,
        |    COALESCE(SUM(u_tokens * 4) OVER (ORDER BY quality_milli DESC, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
        |  FROM q CROSS JOIN t)
        |SELECT source, u_tokens, quality_milli,
        |  CAST(greatest(least(2 * corpus_tokens - pre, u_tokens * 4), 0) AS BIGINT)
        |    AS grant_tokens,
        |  CAST(ROUND(1000.0 * greatest(least(2 * corpus_tokens - pre, u_tokens * 4), 0)
        |       / u_tokens) AS BIGINT) AS epochs_milli
        |FROM p ORDER BY quality_milli DESC, source""".stripMargin,
    "q192_budget_waterfill" ->
      """WITH m0 AS (SELECT source,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS mass,
        |    CAST(CAST(substring(source, 4) AS INT) % 3 + 1 AS BIGINT) AS w
        |  FROM documents GROUP BY source),
        |m AS (SELECT *, mass / w AS ratio,
        |    SUM(mass) OVER () AS mm, SUM(w) OVER () AS ww,
        |    (4 * SUM(mass) OVER ()) // 5 AS budget,
        |    COALESCE(SUM(mass) OVER (ORDER BY mass / w, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pm,
        |    COALESCE(SUM(w) OVER (ORDER BY mass / w, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pw
        |  FROM m0),
        |f AS (SELECT *, CASE WHEN mass * (ww - pw) <= w * (budget - pm)
        |      THEN 1 ELSE 0 END AS flag FROM m),
        |c AS (SELECT *, MIN(flag) OVER (ORDER BY ratio, source
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS capped
        |  FROM f),
        |s AS (SELECT *,
        |    budget - SUM(CASE WHEN capped = 1 THEN mass ELSE 0 END) OVER ()
        |      AS bp,
        |    GREATEST(SUM(CASE WHEN capped = 0 THEN w ELSE 0 END) OVER (), 1)
        |      AS wp
        |  FROM c),
        |open_alloc AS (SELECT source, mass, w, CAST(0 AS BIGINT) AS is_capped,
        |    (bp * w) // wp
        |      + CASE WHEN ROW_NUMBER() OVER (ORDER BY (bp * w) % wp DESC,
        |          source)
        |        <= bp - SUM((bp * w) // wp) OVER () THEN 1 ELSE 0 END
        |      AS alloc_toks
        |  FROM s WHERE capped = 0),
        |cap_alloc AS (SELECT source, mass, w, CAST(1 AS BIGINT) AS is_capped,
        |    mass AS alloc_toks FROM s WHERE capped = 1)
        |SELECT source, mass, w, is_capped, CAST(alloc_toks AS BIGINT)
        |    AS alloc_toks
        |FROM (SELECT * FROM cap_alloc UNION ALL SELECT * FROM open_alloc)
        |ORDER BY source""".stripMargin,
    "q191_boilerplate_spans" ->
      """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
        |  FROM documents),
        |t AS (SELECT doc_id, source,
        |    array_to_string(ws[(i - 1) * 10 + 1 : (i - 1) * 10 + 10], ' ')
        |      AS span
        |  FROM w, UNNEST(generate_series(1, len(ws) // 10)) AS g(i)),
        |h AS (SELECT doc_id, source,
        |    CAST('0x' || substring(md5(span), 1, 15) AS BIGINT) AS h
        |  FROM t),
        |f AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM h GROUP BY 1),
        |per_doc AS (SELECT h.doc_id, h.source,
        |    CAST(COUNT(*) AS BIGINT) AS n_spans,
        |    CAST(SUM(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_boiler
        |  FROM h JOIN f USING (h) GROUP BY 1, 2)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_spans) AS BIGINT) AS n_spans,
        |  CAST(SUM(n_boiler) AS BIGINT) AS n_boiler_spans,
        |  CAST(SUM(CASE WHEN n_boiler > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_docs_affected,
        |  CAST(10000 * SUM(n_boiler) // GREATEST(SUM(n_spans), 1) AS BIGINT)
        |    AS boiler_bp
        |FROM per_doc GROUP BY 1 ORDER BY 1""".stripMargin,
    "q144_blocklist_audit" ->
      s"""WITH d AS (SELECT source, $blocklistHitsSql AS n_terms_hit
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN n_terms_hit > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged,
        |  CAST(SUM(n_terms_hit) AS BIGINT) AS sum_terms_hit
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q139_weighted_median" ->
      """WITH a AS (SELECT source, n_chars,
        |    CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS w
        |  FROM documents GROUP BY 1, 2),
        |c AS (SELECT source, n_chars,
        |    CAST(SUM(w) OVER (PARTITION BY source ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
        |    CAST(SUM(w) OVER (PARTITION BY source) AS BIGINT) AS tw
        |  FROM a)
        |SELECT source, MIN(n_chars) AS weighted_median_len,
        |  CAST(MAX(tw) AS BIGINT) AS total_tokens
        |FROM c WHERE cw * 2 >= tw GROUP BY 1 ORDER BY 1""".stripMargin,
    "q135_ks_drift" ->
      """WITH d AS (SELECT source, n_chars FROM documents
        |           WHERE source IN ('src0', 'src1')),
        |c AS (SELECT n_chars,
        |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |  FROM d GROUP BY 1),
        |cum AS (SELECT
        |    CAST(SUM(c0) OVER (ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum0,
        |    CAST(SUM(c1) OVER (ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1
        |  FROM c),
        |t AS (SELECT
        |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS n1
        |  FROM d)
        |SELECT t.n0, t.n1,
        |  CASE WHEN t.n0 > 0 AND t.n1 > 0 THEN
        |    CAST(ROUND(10000.0 * MAX(ABS(cum0 * t.n1 - cum1 * t.n0))
        |      / (t.n0 * t.n1)) AS BIGINT) END AS ks_bp
        |FROM cum, t GROUP BY t.n0, t.n1""".stripMargin,
    "q250_mann_whitney" ->
      s"""WITH d AS (SELECT source, ${TextAnalysis.QualityBpSql} AS s
         |  FROM documents WHERE source IN ('src0', 'src1')),
         |c AS (SELECT s,
         |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS n2
         |  FROM d GROUP BY 1),
         |r AS (SELECT n1, n2, n1 + n2 AS t,
         |    CAST(COALESCE(SUM(n1 + n2) OVER (ORDER BY s
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumb
         |  FROM c),
         |a AS (SELECT CAST(SUM(n1) AS BIGINT) AS nn1,
         |    CAST(SUM(n2) AS BIGINT) AS nn2,
         |    CAST(SUM(n1 * (2 * cumb + t + 1)) AS BIGINT) AS r1x2,
         |    CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
         |  FROM r)
         |SELECT nn1 AS n1, nn2 AS n2,
         |  r1x2 - nn1 * (nn1 + 1) AS u1_x2, tie_term,
         |  CASE WHEN nn1 > 0 AND nn2 > 0 AND nn1 + nn2 > 1 AND
         |      (CAST(nn1 AS DOUBLE) * nn2 / 12.0
         |        * ((nn1 + nn2 + 1) - CAST(tie_term AS DOUBLE)
         |          / (CAST(nn1 + nn2 AS DOUBLE) * (nn1 + nn2 - 1)))) > 0.0
         |  THEN CAST(ROUND(1000.0 * (r1x2 - nn1 * (nn1 + 1) - nn1 * nn2)
         |    / (2.0 * SQRT(CAST(nn1 AS DOUBLE) * nn2 / 12.0
         |      * ((nn1 + nn2 + 1) - CAST(tie_term AS DOUBLE)
         |        / (CAST(nn1 + nn2 AS DOUBLE) * (nn1 + nn2 - 1)))))) AS BIGINT)
         |  END AS z_milli
         |FROM a""".stripMargin,
    "q254_bootstrap_ci" ->
      s"""WITH d AS (SELECT source, doc_id, ${TextAnalysis.QualityBpSql} AS x
         |  FROM documents),
         |rep AS (SELECT d.source, d.x, b.range AS b,
         |    CAST('0x' || substring(md5('graft_boot_' || CAST(d.doc_id AS VARCHAR)
         |      || '_' || CAST(b.range AS VARCHAR)), 1, 15) AS BIGINT)
         |      % 1000000 AS u6
         |  FROM d CROSS JOIN range(100) b),
         |w AS (SELECT source, x, b,
         |    CASE WHEN u6 < 367879 THEN 0 WHEN u6 < 735759 THEN 1
         |         WHEN u6 < 919699 THEN 2 WHEN u6 < 981012 THEN 3
         |         WHEN u6 < 996340 THEN 4 WHEN u6 < 999406 THEN 5
         |         WHEN u6 < 999917 THEN 6 ELSE 7 END AS wt FROM rep),
         |m AS (SELECT source, b,
         |    CAST(SUM(wt * x) AS DOUBLE) / SUM(wt) AS mb
         |  FROM w GROUP BY 1, 2 HAVING SUM(wt) > 0),
         |rk AS (SELECT source, mb,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY mb, b) AS rn,
         |    COUNT(*) OVER (PARTITION BY source) AS nb FROM m)
         |SELECT source, CAST(MAX(nb) AS BIGINT) AS n_reps,
         |  CAST(ROUND(1000.0 * MIN(CASE WHEN rn = 5 THEN mb END)) AS BIGINT)
         |    AS lo_milli,
         |  CAST(ROUND(1000.0 * MIN(CASE WHEN rn = 95 THEN mb END)) AS BIGINT)
         |    AS hi_milli
         |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin,
    "q255_conformal_interval" ->
      s"""WITH s AS (SELECT lang, doc_id, ${TextAnalysis.QualityBpSql} AS x,
         |    CASE WHEN CAST('0x' || substring(md5('graft_split_'
         |        || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 80
         |      THEN 'train'
         |      WHEN CAST('0x' || substring(md5('graft_split_'
         |        || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 90
         |      THEN 'cal' ELSE 'test' END AS split
         |  FROM documents),
         |mu AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_train,
         |    CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mu
         |  FROM s WHERE split = 'train' GROUP BY 1),
         |calr AS (SELECT s.lang, ABS(s.x - mu.mu) AS r,
         |    ROW_NUMBER() OVER (PARTITION BY s.lang
         |      ORDER BY ABS(s.x - mu.mu), s.doc_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY s.lang) AS n_cal
         |  FROM s JOIN mu ON s.lang = mu.lang WHERE s.split = 'cal'),
         |q AS (SELECT lang, CAST(MAX(n_cal) AS BIGINT) AS n_cal,
         |    MIN(CASE WHEN rn = LEAST(n_cal,
         |      CAST(CEIL(0.9 * (n_cal + 1)) AS BIGINT)) THEN r END) AS width
         |  FROM calr GROUP BY 1),
         |tst AS (SELECT s.lang, CAST(COUNT(*) AS BIGINT) AS n_test,
         |    CAST(SUM(CASE WHEN ABS(s.x - mu.mu) <= q.width
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_in
         |  FROM s JOIN mu ON s.lang = mu.lang JOIN q ON s.lang = q.lang
         |  WHERE s.split = 'test' GROUP BY 1)
         |SELECT mu.lang, mu.n_train, q.n_cal, tst.n_test,
         |  CAST(ROUND(1000.0 * q.width) AS BIGINT) AS width_milli,
         |  CAST(ROUND(10000.0 * tst.n_in / tst.n_test) AS BIGINT) AS cover_bp
         |FROM mu JOIN q ON mu.lang = q.lang JOIN tst ON mu.lang = tst.lang
         |ORDER BY mu.lang""".stripMargin,
    "q259_fim_transform" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS l,
        |    CAST('0x' || substring(md5('graft_fim_g_'
        |      || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS g,
        |    CAST('0x' || substring(md5('graft_fim_a_'
        |      || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS ha,
        |    CAST('0x' || substring(md5('graft_fim_b_'
        |      || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS hb
        |  FROM documents),
        |c AS (SELECT doc_id, text, l, ha, hb,
        |    CASE WHEN l >= 20 AND g < 50 THEN 'psm' ELSE 'causal' END AS mode,
        |    1 + (l // 10) AS lo, l - (l // 10) AS hi FROM d),
        |p AS (SELECT doc_id, text, l, mode,
        |    LEAST(lo + ha % (hi - lo + 1), lo + hb % (hi - lo + 1)) AS c1,
        |    GREATEST(lo + ha % (hi - lo + 1), lo + hb % (hi - lo + 1)) AS c2
        |  FROM c)
        |SELECT doc_id, mode,
        |  CAST(CASE WHEN mode = 'psm' THEN c1 - 1 ELSE l END AS BIGINT) AS len_p,
        |  CAST(CASE WHEN mode = 'psm' THEN c2 - c1 ELSE 0 END AS BIGINT) AS len_m,
        |  CAST(CASE WHEN mode = 'psm' THEN l - c2 + 1 ELSE 0 END AS BIGINT) AS len_s,
        |  CASE WHEN mode = 'psm' THEN md5('<PRE>' || substring(text, 1, c1 - 1)
        |    || '<SUF>' || substring(text, c2, l - c2 + 1)
        |    || '<MID>' || substring(text, c1, c2 - c1))
        |  ELSE md5(text) END AS fim_md5
        |FROM p ORDER BY doc_id""".stripMargin,
    "q260_preference_pairs" ->
      s"""WITH q AS (SELECT doc_id, source, lang, ${TextAnalysis.QualityBpSql} AS q
         |  FROM documents),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source, lang
         |      ORDER BY q DESC, doc_id) AS rd,
         |    COUNT(*) OVER (PARTITION BY source, lang) AS n FROM q)
         |SELECT a.source, a.lang, a.doc_id AS chosen_id,
         |  b.doc_id AS rejected_id, a.q - b.q AS margin_bp
         |FROM r a JOIN r b ON a.source = b.source AND a.lang = b.lang
         |WHERE a.rd = 1 AND a.n >= 2 AND b.rd = b.n
         |ORDER BY 1, 2""".stripMargin,
    "q262_t_closeness" ->
      """WITH j AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |    c_mktsegment AS segment, o_orderpriority AS s
        |  FROM customer JOIN orders ON c_custkey = o_custkey),
        |g AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS ns FROM j GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM j),
        |cls AS (SELECT nation, segment, s, CAST(COUNT(*) AS BIGINT) AS ncs
        |  FROM j GROUP BY 1, 2, 3),
        |csz AS (SELECT nation, segment, CAST(SUM(ncs) AS BIGINT) AS nc
        |  FROM cls GROUP BY 1, 2)
        |SELECT csz.nation, csz.segment, csz.nc AS class_size,
        |  CAST(ROUND(1000.0 * SUM(ABS(COALESCE(cls.ncs, 0) * tot.n
        |      - g.ns * csz.nc)) / (2.0 * csz.nc * tot.n)) AS BIGINT) AS tv_milli
        |FROM csz CROSS JOIN g CROSS JOIN tot
        |LEFT JOIN cls ON cls.nation = csz.nation
        |  AND cls.segment = csz.segment AND cls.s = g.s
        |GROUP BY csz.nation, csz.segment, csz.nc, tot.n
        |ORDER BY 1, 2""".stripMargin,
    "q335_l_diversity" ->
      """WITH j AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |    c_mktsegment AS segment, o_orderpriority AS s
        |  FROM customer JOIN orders ON c_custkey = o_custkey),
        |cls AS (SELECT nation, segment, s, CAST(COUNT(*) AS BIGINT) AS ncs
        |  FROM j GROUP BY 1, 2, 3),
        |csz AS (SELECT nation, segment, CAST(SUM(ncs) AS BIGINT) AS nc,
        |    CAST(COUNT(*) AS BIGINT) AS distinct_l,
        |    CAST(MAX(ncs) AS BIGINT) AS r1
        |  FROM cls GROUP BY 1, 2),
        |ent AS (SELECT cls.nation, cls.segment,
        |    CAST(SUM(CAST(ROUND(1e6 * (CAST(ncs AS DOUBLE) / csz.nc)
        |      * LN(CAST(csz.nc AS DOUBLE) / ncs)) AS BIGINT)) AS BIGINT)
        |      AS entropy_micro
        |  FROM cls JOIN csz ON csz.nation = cls.nation
        |    AND csz.segment = cls.segment
        |  GROUP BY 1, 2)
        |SELECT csz.nation, csz.segment, csz.nc AS class_size, distinct_l,
        |  entropy_micro,
        |  CAST(ROUND(1e6 * EXP(CAST(entropy_micro AS DOUBLE) / 1e6))
        |    AS BIGINT) AS eff_l_micro,
        |  CAST(CASE WHEN 4 * r1 < 3 * csz.nc THEN 1 ELSE 0 END AS INT)
        |    AS recursive_ok
        |FROM csz JOIN ent ON ent.nation = csz.nation
        |  AND ent.segment = csz.segment
        |ORDER BY 1, 2""".stripMargin,
    "q263_psi_drift" ->
      s"""WITH d AS (SELECT source, ${TextAnalysis.QualityBpSql} // 1000 AS b
         |  FROM documents WHERE source IN ('src0', 'src1')),
         |bins AS (SELECT g.range AS b,
         |    CAST(1 + SUM(CASE WHEN d.source = 'src0' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c0,
         |    CAST(1 + SUM(CASE WHEN d.source = 'src1' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c1
         |  FROM range(0, 11) g LEFT JOIN d ON d.b = g.range GROUP BY 1),
         |tot AS (SELECT CAST(SUM(c0) AS BIGINT) AS n0,
         |    CAST(SUM(c1) AS BIGINT) AS n1 FROM bins)
         |SELECT tot.n0, tot.n1,
         |  CAST(ROUND(1e6 * SUM((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
         |    * ln((CAST(c0 AS DOUBLE) / n0) / (CAST(c1 AS DOUBLE) / n1))))
         |    AS BIGINT) AS psi_micro
         |FROM bins, tot GROUP BY 1, 2""".stripMargin,
    "q273_robust_mean" ->
      s"""WITH d AS (SELECT source, ${TextAnalysis.QualityBpSql} AS s
         |  FROM documents),
         |c AS (SELECT source, s, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM d GROUP BY 1, 2),
         |cum AS (SELECT source, s, cnt,
         |    CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY s
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc,
         |    CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n,
         |    CAST(SUM(cnt * s) OVER (PARTITION BY source) AS BIGINT) AS tot
         |  FROM c),
         |k AS (SELECT *, n // 10 AS k FROM cum),
         |lo AS (SELECT source, MIN(s) AS lo_s FROM k WHERE cc >= k GROUP BY 1),
         |lo2 AS (SELECT source, MIN(s) AS lo2_s FROM k WHERE cc >= k + 1
         |  GROUP BY 1),
         |hi AS (SELECT source, MIN(s) AS hi_s FROM k WHERE cc >= n - k
         |  GROUP BY 1),
         |agg AS (SELECT k.source, MAX(k.n) AS n, MAX(k.k) AS kk,
         |    MAX(k.tot) AS tot, MAX(lo.lo_s) AS lo_s, MAX(lo2.lo2_s) AS lo2_s,
         |    MAX(hi.hi_s) AS hi_s,
         |    CAST(SUM(CASE WHEN k.s < lo.lo_s THEN k.cnt * k.s ELSE 0 END)
         |      AS BIGINT) AS bot_full,
         |    CAST(SUM(CASE WHEN k.s < lo.lo_s THEN k.cnt ELSE 0 END)
         |      AS BIGINT) AS bel,
         |    CAST(SUM(CASE WHEN k.s > hi.hi_s THEN k.cnt * k.s ELSE 0 END)
         |      AS BIGINT) AS top_full,
         |    CAST(SUM(CASE WHEN k.s > hi.hi_s THEN k.cnt ELSE 0 END)
         |      AS BIGINT) AS abv
         |  FROM k JOIN lo ON k.source = lo.source
         |    JOIN lo2 ON k.source = lo2.source JOIN hi ON k.source = hi.source
         |  GROUP BY 1)
         |SELECT source, n, kk AS k_trim,
         |  CAST(ROUND(1000.0 * tot / n) AS BIGINT) AS mean_milli,
         |  CAST(ROUND(1000.0 * (tot - (bot_full + (kk - bel) * lo_s)
         |    - (top_full + (kk - abv) * hi_s)) / (n - 2 * kk)) AS BIGINT)
         |    AS trimmed_milli,
         |  CAST(ROUND(1000.0 * (tot - (bot_full + (kk - bel) * lo_s)
         |    - (top_full + (kk - abv) * hi_s) + kk * lo2_s + kk * hi_s) / n)
         |    AS BIGINT) AS winsor_milli
         |FROM agg ORDER BY 1""".stripMargin,
    "q274_robust_scale" ->
      s"""WITH d AS (SELECT source, ${TextAnalysis.QualityBpSql} AS s
         |  FROM documents),
         |c AS (SELECT source, s, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM d GROUP BY 1, 2),
         |cum AS (SELECT source, s, cnt,
         |    CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY s
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc,
         |    CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n FROM c),
         |med AS (SELECT source, MIN(s) AS med FROM cum WHERE 2 * cc >= n
         |  GROUP BY 1),
         |dev AS (SELECT c.source, ABS(c.s - med.med) AS a,
         |    CAST(SUM(c.cnt) AS BIGINT) AS cnt
         |  FROM c JOIN med ON c.source = med.source GROUP BY 1, 2),
         |dcum AS (SELECT source, a, cnt,
         |    CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY a
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc,
         |    CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n FROM dev),
         |mad AS (SELECT source, MIN(a) AS mad FROM dcum WHERE 2 * cc >= n
         |  GROUP BY 1)
         |SELECT med.source, MAX(dcum.n) AS n, MAX(med.med) AS median_bp,
         |  MAX(mad.mad) AS mad_bp,
         |  CAST(SUM(CASE WHEN dcum.a > 3 * mad.mad THEN dcum.cnt ELSE 0 END)
         |    AS BIGINT) AS n_outliers
         |FROM med JOIN mad ON med.source = mad.source
         |  JOIN dcum ON med.source = dcum.source
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q279_wasserstein" ->
      s"""WITH d AS (SELECT source, ${TextAnalysis.QualityBpSql} AS s
         |  FROM documents WHERE source IN ('src0', 'src1')),
         |c AS (SELECT s,
         |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c0,
         |    CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c1
         |  FROM d GROUP BY 1),
         |t AS (SELECT CAST(SUM(c0) AS BIGINT) AS n0,
         |    CAST(SUM(c1) AS BIGINT) AS n1 FROM c),
         |cum AS (SELECT s, CAST(SUM(c0) OVER w AS BIGINT) AS cum0,
         |    CAST(SUM(c1) OVER w AS BIGINT) AS cum1,
         |    LEAD(s) OVER (ORDER BY s) AS s_next
         |  FROM c WINDOW w AS (ORDER BY s
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT t.n0, t.n1,
         |  CAST(ROUND(1000.0 * SUM((s_next - s) * ABS(cum0 * t.n1 - cum1 * t.n0))
         |    / (CAST(t.n0 AS DOUBLE) * t.n1)) AS BIGINT) AS w1_milli
         |FROM cum, t WHERE s_next IS NOT NULL GROUP BY 1, 2""".stripMargin,
    "q130_train_val_test" ->
      """WITH s AS (SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        |    CAST('0x' || substring(md5('graft_split_' || CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  lang, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS sum_toks
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q122_negative_sampling" ->
      """WITH sz AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY 1),
        |rk AS (SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS r
        |  FROM documents),
        |a AS (SELECT doc_id AS anchor_id, source AS a_src
        |  FROM documents WHERE doc_id % 10 = 0),
        |o AS (SELECT a.anchor_id, s.source AS o_src, s.n_src,
        |    ROW_NUMBER() OVER (PARTITION BY a.anchor_id ORDER BY s.source) - 1 AS os_idx,
        |    COUNT(*) OVER (PARTITION BY a.anchor_id) AS n_others
        |  FROM a JOIN sz s ON s.source <> a.a_src),
        |jx AS (SELECT o.*, j.rank FROM o
        |  CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS rank) j),
        |p AS (SELECT * FROM jx WHERE os_idx =
        |    CAST('0x' || substring(md5('nsrc:' || CAST(anchor_id AS VARCHAR)
        |      || ':' || CAST(rank AS VARCHAR)), 1, 15) AS BIGINT) % n_others),
        |n AS (SELECT anchor_id, rank, o_src,
        |    CAST('0x' || substring(md5('nidx:' || CAST(anchor_id AS VARCHAR)
        |      || ':' || CAST(rank AS VARCHAR)), 1, 15) AS BIGINT) % n_src AS idx
        |  FROM p)
        |SELECT n.anchor_id, CAST(n.rank AS BIGINT) AS rank, rk.doc_id AS neg_id
        |FROM n JOIN rk ON rk.source = n.o_src AND rk.r = n.idx
        |ORDER BY anchor_id, rank""".stripMargin,
    "q205_dsir_select" ->
      s"""WITH d AS (SELECT doc_id,
        |    source IN (${DsirTargetSources.map("'" + _ + "'").mkString(", ")}) AS tgt,
        |    unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT w,
        |    CAST(ROUND(1000000.0 * SUM(CASE WHEN tgt THEN 1 ELSE 0 END)
        |      / COUNT(*)) AS BIGINT) AS aff_micro
        |  FROM d GROUP BY w),
        |s AS (SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
        |    CAST(SUM(c.aff_micro) AS BIGINT) AS aff_sum
        |  FROM d JOIN c USING (w) WHERE NOT d.tgt GROUP BY d.doc_id)
        |SELECT doc_id, n_toks, aff_sum,
        |  CAST(ROUND(1.0 * aff_sum / n_toks) AS BIGINT) AS aff_avg_micro
        |FROM s ORDER BY aff_avg_micro DESC, doc_id LIMIT $DsirTopK""".stripMargin,
    "q206_pack_windows" ->
      s"""WITH d AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks FROM documents),
        |a AS (SELECT doc_id, toks,
        |    CAST(COALESCE(SUM(toks) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum0
        |  FROM d),
        |e AS (SELECT doc_id, toks, cum0,
        |    unnest(generate_series(cum0 // $PackWindowTokens,
        |      (cum0 + toks - 1) // $PackWindowTokens)) AS window_id
        |  FROM a WHERE toks > 0)
        |SELECT CAST(window_id AS BIGINT) AS window_id, doc_id,
        |  CAST(GREATEST(cum0, window_id * $PackWindowTokens)
        |    - window_id * $PackWindowTokens AS BIGINT) AS tok_start,
        |  CAST(LEAST(cum0 + toks, (window_id + 1) * $PackWindowTokens)
        |    - GREATEST(cum0, window_id * $PackWindowTokens) AS BIGINT) AS n_toks
        |FROM e ORDER BY window_id, doc_id""".stripMargin,
    "q74_importance_sample" ->
      s"""WITH q AS (SELECT doc_id, lang,
        |    ${TextAnalysis.QualityBpSql} AS quality_bp,
        |    CAST('0x' || substring(md5('graft_weight_' || doc_id), 1, 15) AS BIGINT)
        |      % 10000 AS h_bp
        |  FROM documents)
        |SELECT doc_id, lang, CAST(quality_bp AS BIGINT) AS quality_bp,
        |  CAST(100000000 // quality_bp AS BIGINT) AS w_x4
        |FROM q WHERE h_bp < quality_bp ORDER BY doc_id""".stripMargin,
    "q202_training_order" ->
      s"""WITH r AS (SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS i
        |  FROM documents),
        |k AS (SELECT doc_id, source,
        |    ((2 * i + 1) * 1000000000)
        |      // (2 * (CAST(substring(source, 4) AS INT) % 3 + 1)) AS key_nano
        |  FROM r),
        |h AS (SELECT * FROM k
        |  ORDER BY key_nano, source, doc_id LIMIT $CurriculumPrefix)
        |SELECT ROW_NUMBER() OVER (ORDER BY key_nano, source, doc_id) AS pos,
        |  source, doc_id, CAST(key_nano AS BIGINT) AS key_nano
        |FROM h ORDER BY pos""".stripMargin,
    "q201_weighted_sample" ->
      s"""WITH d AS (SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents WHERE len(string_split(text, ' ')) > 0),
        |k AS (SELECT doc_id, lang, toks,
        |    CAST(ROUND(ln(
        |      (CAST('0x' || substring(md5('graft_wrs_' || CAST(doc_id AS VARCHAR)), 1, 15)
        |         AS BIGINT) + 1) / 1152921504606846976.0)
        |      / toks * 1e6) AS BIGINT) AS key_micro
        |  FROM d),
        |r AS (SELECT lang, doc_id, toks, key_micro,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY key_micro DESC, doc_id) AS rank
        |  FROM k)
        |SELECT lang, rank, doc_id, toks, key_micro FROM r
        |WHERE rank <= $WrsPerLang ORDER BY lang, rank""".stripMargin,
    "q41_stratified_sample" ->
      s"""SELECT doc_id, lang,
        |  CAST('0x' || substring(md5('graft_sample_' || doc_id), 1, 15) AS BIGINT) % 10000 AS h_bp,
        |  CAST($rateBpSql AS BIGINT) AS rate_bp
        |FROM documents
        |WHERE CAST('0x' || substring(md5('graft_sample_' || doc_id), 1, 15) AS BIGINT) % 10000
        |  < $rateBpSql
        |ORDER BY doc_id""".stripMargin,
    "q42_mixture_rates" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks FROM documents),
        |  s AS (SELECT source, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS sum_toks
        |        FROM d GROUP BY source),
        |  r AS (SELECT source, n_docs, sum_toks,
        |          CAST(ROUND(MIN(sum_toks) OVER () * 1e6 / sum_toks) AS BIGINT) AS rate_micro
        |        FROM s),
        |  k AS (SELECT d.source, COUNT(*) AS n_kept, CAST(SUM(d.toks) AS BIGINT) AS kept_toks
        |        FROM d JOIN r ON d.source = r.source
        |        WHERE CAST('0x' || substring(md5('graft_mix_' || d.doc_id), 1, 15) AS BIGINT) % 1000000
        |          < r.rate_micro
        |        GROUP BY d.source)
        |SELECT r.source, r.n_docs, r.sum_toks, r.rate_micro,
        |  COALESCE(k.n_kept, 0) AS n_kept, COALESCE(k.kept_toks, 0) AS kept_toks
        |FROM r LEFT JOIN k ON r.source = k.source
        |ORDER BY r.source""".stripMargin,
    "q43_pii_redact" ->
      s"""WITH p AS (SELECT doc_id, text
        |    || CASE WHEN doc_id % 7 = 0
        |         THEN ' contact user' || doc_id || '@mail.example.com' ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0
        |         THEN ' tel +33 6 12 34 ' || (doc_id % 90 + 10) ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phones,
        |  CAST('0x' || substring(md5(
        |    regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
        |      '$PhoneRe', '<PHONE>', 'g')), 1, 15) AS BIGINT) AS redacted_h
        |FROM p ORDER BY doc_id""".stripMargin,
    "q44_contamination" ->
      s"""WITH g AS (SELECT DISTINCT doc_id, doc_id % $EvalModulus = 0 AS is_eval,
        |    unnest(list_transform(
        |      generate_series(1, greatest(len(string_split(text, ' ')) - ${ContamGramWords - 1}, 0)),
        |      i -> CAST('0x' || substring(md5(
        |             array_to_string(string_split(text, ' ')[i:i+${ContamGramWords - 1}], ' ')),
        |             1, 15) AS BIGINT))) AS g
        |  FROM documents)
        |SELECT c.doc_id AS corpus_doc, e.doc_id AS eval_doc, COUNT(*) AS n_shared
        |FROM (SELECT * FROM g WHERE NOT is_eval) c
        |JOIN (SELECT * FROM g WHERE is_eval) e ON c.g = e.g
        |GROUP BY 1, 2 HAVING COUNT(*) >= $ContamMinShared
        |ORDER BY corpus_doc, eval_doc""".stripMargin,
    "q45_shard_pack" ->
      s"""WITH d AS (SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks FROM documents),
        |  a AS (SELECT lang, toks,
        |          CAST(COALESCE(SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum0
        |        FROM d)
        |SELECT lang, CAST(FLOOR(cum0 / $ShardTokenBudget) AS BIGINT) AS shard,
        |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS sum_toks
        |FROM a GROUP BY 1, 2 ORDER BY lang, shard""".stripMargin,
    "q46_embedding_outliers" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |  u AS (SELECT label, r.range + 1 AS i, AVG(v[r.range + 1]) AS m
        |        FROM e, range(64) r GROUP BY 1, 2),
        |  c AS (SELECT label, list(m ORDER BY i) AS cv FROM u GROUP BY label),
        |  s AS (SELECT e.vec_id, e.label,
        |          CAST(ROUND(list_cosine_similarity(e.v, c.cv) * 1e6) AS BIGINT) AS sim_micro
        |        FROM e JOIN c USING (label)),
        |  st AS (SELECT label, AVG(sim_micro) - 2.0 * STDDEV_SAMP(sim_micro) AS thresh
        |         FROM s GROUP BY label)
        |SELECT s.label, s.vec_id, s.sim_micro
        |FROM s JOIN st ON s.label = st.label
        |WHERE s.sim_micro < st.thresh
        |ORDER BY s.label, s.vec_id""".stripMargin,
    "q50_embedding_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |  s AS (SELECT vec_id, v,
        |          GREATEST(list_max(list_transform(v, x -> abs(x))), 1e-30) AS scale
        |        FROM e),
        |  q AS (SELECT vec_id, CAST(ROUND(scale * 1e6) AS BIGINT) AS scale_micro,
        |          list_transform(v, x -> CAST(ROUND(x * 127 / scale) AS BIGINT)) AS qv
        |        FROM s)
        |SELECT vec_id, scale_micro, CAST(list_sum(qv) AS BIGINT) AS sum_q,
        |  list_min(qv) AS min_q, list_max(qv) AS max_q
        |FROM q ORDER BY vec_id""".stripMargin)
}
