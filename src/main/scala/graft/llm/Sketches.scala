package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Caches
import graft.Tables.load

/** Mergeable sketch operators — the approximate-aggregation family a
  * 100 TB pipeline leans on when exact distinct/frequency state stops
  * fitting anywhere: a HyperLogLog-style distinct sketch and a
  * count-min frequency sketch. Both are built from md5-derived
  * hashes, so the identical sketch is recomputable in ANSI SQL and
  * the whole machinery (not just the final answer) is
  * oracle-verified.
  *
  * The scale property being demonstrated is MERGEABILITY:
  *  - HLL registers combine by elementwise max — Spark's partial/final
  *    `max` aggregation IS the sketch merge, so a 1000-executor
  *    cluster ships 64 longs per group per map task, never raw
  *    values.
  *  - Count-min cells combine by elementwise sum — same shape,
  *    `sum` partial aggregation, d×w integers per task.
  *
  * Reference analog: the KPI layer's COUNT(DISTINCT …) dashboards
  * (README.md:118-129) are exactly what gets replaced by HLL when
  * the group count × key cardinality stops fitting in an exact
  * aggregate's hash map.
  */
object Sketches {

  /** HLL parameters: m = 64 registers (p = 6 index bits), hash = top
    * 60 bits of md5 (15 hex chars — the repo-wide engine-independent
    * hash). rho counts leading zeros in the remaining 54 bits + 1,
    * so register values live in [1, 55].
    */
  final val HllRegisters = 64
  final val HllAlphaM2 = 0.709 * 4096 // alpha_64 * m^2, the standard bias constant

  /** Count-min parameters: 4 independent rows × 512 buckets. */
  final val CmsRows = 4
  final val CmsWidth = 512
  final val CmsTopK = 20

  /** DISTINCT 8-char-gram hashes per language — the key stream the
    * HLL sketch consumes. Generated in mapPartitions (one
    * MessageDigest per partition; HOF lambdas interpret per element,
    * measured 170× slower on exactly this shape) with a PER-PARTITION
    * dedup set, so the shuffle carries each (lang, hash) once per map
    * partition instead of once per occurrence — the distinct analog
    * of map-side combine. Distinct-ness is exactly what both the
    * registers (max over equal values is idempotent) and the exact
    * count need, so one pass feeds both.
    */
  /** RAW (lang, gram-hash) stream — no dedup: consumers whose
    * aggregation is idempotent under duplicates (the HLL register max,
    * q71) skip the per-partition set entirely; their map-side partial
    * agg is the volume bound instead.
    */
  private[llm] def rawGramHashes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "documents")
      .select($"lang", $"text").as[(String, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (lang, text) =>
          val n = if (text == null) 0 else text.length - TextAnalysis.GramChars + 1
          (0 until math.max(n, 0)).iterator.map { i =>
            md.reset()
            val d = md.digest(text.substring(i, i + TextAnalysis.GramChars)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            var v = 0L
            var j = 0
            while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
            (lang, v >>> 4)
          }
        }
      }.toDF("lang", "h")
  }

  /** Partition-LOCAL distinct gram hashes: the map-side HashSet cuts
    * the per-occurrence stream to per-partition-distinct rows with
    * ZERO shuffle — the right input for idempotent sketch builds
    * (register max, q120) where a global distinct would shuffle the
    * full gram table for nothing.
    */
  private[llm] def partitionDistinctGramHashes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "documents")
      .select($"lang", $"text").as[(String, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val seen = new java.util.HashSet[(String, Long)]()
        it.foreach { case (lang, text) =>
          val n = if (text == null) 0 else text.length - TextAnalysis.GramChars + 1
          var i = 0
          while (i < n) {
            md.reset()
            val d = md.digest(text.substring(i, i + TextAnalysis.GramChars)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            var v = 0L
            var j = 0
            while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
            seen.add((lang, v >>> 4))
            i += 1
          }
        }
        import scala.jdk.CollectionConverters._
        seen.iterator().asScala
      }.toDF("lang", "h")
  }

  private[llm] def distinctGramHashes(spark: SparkSession, dir: String): DataFrame =
    partitionDistinctGramHashes(spark, dir).distinct()

  /** q58 — HLL-style distinct-count sketch per language over the
    * 8-char grams of `documents` (5–8k distinct per lang at sf0.01,
    * well past the m·2.5 linear-counting regime, so the raw HLL
    * estimator applies with no small-range correction).
    *
    * Register build: groupBy(lang, register).max(rho) — the map-side
    * partial max is the HLL merge, so shuffle volume is bounded by
    * 64 rows per (lang, map task) regardless of input size. The
    * harmonic-mean denominator is kept EXACT-INTEGER on both engines
    * (sum of 2^(55-reg) scaled by 2^55 for empty registers), so the
    * one floating division at the end is deterministic regardless of
    * aggregation order. n_exact rides along to show sketch error.
    */
  def q58_hll_distinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grams = Caches.tracked(distinctGramHashes(spark, dir))
    val regs = grams.select($"lang",
        ($"h" % HllRegisters).cast("int").as("j"),
        expr(s"h DIV $HllRegisters").as("w"))
      .withColumn("rho",
        when($"w" === 0, lit(55)).otherwise(lit(55) - length(conv($"w", 10, 2))))
      .groupBy($"lang", $"j").agg(max($"rho").as("reg"))
    val sketch = regs.groupBy($"lang").agg(
      count(lit(1)).cast("long").as("regs_hit"),
      sum($"reg").cast("long").as("sum_rho"),
      sum(pow(lit(2.0), lit(55) - $"reg").cast("long")).as("s_hit"))
    val exact = grams.groupBy($"lang")
      .agg(count(lit(1)).as("n_exact")) // grams is distinct by construction
    sketch.join(broadcast(exact), "lang")
      .withColumn("s_total",
        $"s_hit" + (lit(HllRegisters.toLong) - $"regs_hit") * lit(1L << 55))
      .withColumn("hll_est",
        round(lit(HllAlphaM2) * pow(lit(2.0), lit(55)) / $"s_total").cast("long"))
      .select($"lang", $"regs_hit", $"sum_rho", $"hll_est", $"n_exact")
      .orderBy($"lang")
  }

  /** q59 — count-min heavy hitters: the 20 most frequent 8-char grams
    * with their sketch estimates next to the true counts.
    *
    * Scale shape: ONE shuffle over the gram stream (groupBy gram —
    * partial counts map-side); everything downstream operates on the
    * distinct-gram table (~8k rows): the d×w counter build is a
    * union of 4 cheap projections aggregated to 2048 cells, and the
    * probe joins broadcast those cells. The estimate is min over the
    * d row-counters, ≥ the true count by construction.
    */
  def q59_cms_heavy_hitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grams = load(spark, dir, "documents")
      .select($"text").as[String]
      .mapPartitions { it =>
        it.flatMap { text =>
          val n = if (text == null) 0 else text.length - TextAnalysis.GramChars + 1
          (0 until n).iterator.map(i => text.substring(i, i + TextAnalysis.GramChars))
        }
      }.toDF("gram")
    val counts = Caches.tracked(
      grams.groupBy($"gram").agg(count(lit(1)).as("n")))
    def bucket(r: Int) =
      (conv(substring(md5(concat(lit(s"$r:"), $"gram")), 1, 15), 16, 10)
        .cast("long") % CmsWidth).cast("int")
    val cells = (0 until CmsRows).map { r =>
        counts.select(lit(r).as("r"), bucket(r).as("bucket"), $"n")
      }.reduce(_ union _)
      .groupBy($"r", $"bucket").agg(sum($"n").as("cnt"))
    val top = counts.orderBy($"n".desc, $"gram").limit(CmsTopK)
    val probes = (0 until CmsRows).map { r =>
        top.select($"gram", $"n", lit(r).as("r"), bucket(r).as("bucket"))
      }.reduce(_ union _)
    probes.join(broadcast(cells), Seq("r", "bucket"))
      .groupBy($"gram", $"n").agg(min($"cnt").as("cms_est"))
      .select($"gram", $"n".cast("long").as("true_count"),
        $"cms_est".cast("long").as("cms_est"))
      .orderBy($"true_count".desc, $"gram")
  }

  /** q68 — fixed-resolution histogram quantile sketch over event
    * values: bin = exact cents (integer), per-(event_type, bin) counts
    * partial-aggregate map-side, and each quantile reads off the
    * cumulative histogram as the smallest bin with cum·100 ≥ n·p —
    * all-integer, so both engines agree bit-for-bit. The sketch is
    * MERGEABLE (bin counts sum — same shape as the count-min cells
    * above): a 1000-executor cluster ships one row per (group,
    * distinct bin) per map task and never sorts the raw data, unlike
    * sort-based exact percentile state (q38). Resolution is the bin
    * width; at cent granularity over this domain the answer is exact.
    */
  def q68_histogram_quantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val binned = load(spark, dir, "events")
      .groupBy($"event_type", graft.Tables.cents($"value").as("bin"))
      .agg(count(lit(1)).as("c"))
    val cum = binned
      .withColumn("cum", sum($"c").over(
        Window.partitionBy($"event_type").orderBy($"bin")))
      .withColumn("n", sum($"c").over(Window.partitionBy($"event_type")))
    cum.groupBy($"event_type")
      .agg(max($"n").cast("long").as("n"),
        min(when($"cum" * 100 >= $"n" * 50, $"bin")).cast("long").as("p50_cents"),
        min(when($"cum" * 100 >= $"n" * 90, $"bin")).cast("long").as("p90_cents"),
        min(when($"cum" * 100 >= $"n" * 99, $"bin")).cast("long").as("p99_cents"))
      .orderBy($"event_type")
  }

  /** q71 — the HLL sketch as a typed `Aggregator` UDAF
    * (`functions/HllAggregator.scala`): same registers and estimator
    * as q58, built by custom-aggregate partial/final merge over the
    * RAW gram stream (no distinct pre-pass — register max is
    * idempotent). One shuffle of a 64-long buffer per (lang, map
    * task); completes the UDF(expr)/UDAF/UDTF extension triple.
    */
  def q71_hll_udaf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    rawGramHashes(spark, dir)
      .groupBy($"lang")
      .agg(graft.functions.HllAggregator.sketch($"h").as("s"))
      .select($"lang", $"s.regs_hit", $"s.sum_rho", $"s.hll_est")
      .orderBy($"lang")
  }

  /** q120 — HLL set algebra: estimated distinct-gram overlap between
    * every language pair via inclusion–exclusion (est A + est B −
    * est A∪B). The union sketch is just union-all + max over the two
    * register tables — the MERGE operation itself, demonstrated as
    * data: audience-overlap at 100 TB costs two 64-register sketches
    * per side, not a distinct-join. The estimate difference can go
    * negative within sketch error — clamped at 0 like every practical
    * implementation. The exact-intersection error reference lives in
    * SketchSpec ("HLL inclusion–exclusion…"), NOT here: a gram×gram
    * distinct self-join in the shipped query would be exactly the
    * all-pairs shuffle the sketch exists to avoid.
    *
    * Registers build from the partition-distinct gram stream (q71's
    * observation: register max is idempotent, so residual cross-
    * partition duplicates change nothing) — the map-side HashSet
    * bounds per-row rho work without the global distinct's full-table
    * shuffle; shuffle volume is 64 rows per (lang, map task) at any
    * corpus size. q58 keeps the global distinct because its OUTPUT
    * includes the exact count; this query's doesn't.
    */
  def q120_hll_set_algebra(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val regs = Caches.tracked(partitionDistinctGramHashes(spark, dir).select($"lang",
        ($"h" % HllRegisters).cast("int").as("j"),
        expr(s"h DIV $HllRegisters").as("w"))
      .withColumn("rho",
        when($"w" === 0, lit(55)).otherwise(lit(55) - length(conv($"w", 10, 2))))
      .groupBy($"lang", $"j").agg(max($"rho").as("reg")))

    def estCol(hit: org.apache.spark.sql.Column, sHit: org.apache.spark.sql.Column) =
      round(lit(HllAlphaM2) * pow(lit(2.0), lit(55)) /
        (sHit + (lit(HllRegisters.toLong) - hit) * lit(1L << 55))).cast("long")

    val perLang = regs.groupBy($"lang").agg(
        count(lit(1)).cast("long").as("hit"),
        sum(pow(lit(2.0), lit(55) - $"reg").cast("long")).as("s_hit"))
      .select($"lang", estCol($"hit", $"s_hit").as("e"))

    val langs = regs.select($"lang").distinct()
    val pairs = langs.select($"lang".as("la"))
      .crossJoin(broadcast(langs.select($"lang".as("lb"))))
      .filter($"la" < $"lb")

    // union sketch = union-all of the two register tables + max — the
    // HLL merge, expressed relationally
    val u = pairs.join(regs.select($"lang".as("la"), $"j", $"reg"), Seq("la"))
      .select($"la", $"lb", $"j", $"reg")
      .unionByName(pairs.join(regs.select($"lang".as("lb"), $"j", $"reg"), Seq("lb"))
        .select($"la", $"lb", $"j", $"reg"))
      .groupBy($"la", $"lb", $"j").agg(max($"reg").as("reg"))
    val estU = u.groupBy($"la", $"lb").agg(
        count(lit(1)).cast("long").as("hit"),
        sum(pow(lit(2.0), lit(55) - $"reg").cast("long")).as("s_hit"))
      .select($"la", $"lb", estCol($"hit", $"s_hit").as("e_union"))

    pairs
      .join(broadcast(perLang.select($"lang".as("la"), $"e".as("est_a"))), "la")
      .join(broadcast(perLang.select($"lang".as("lb"), $"e".as("est_b"))), "lb")
      .join(broadcast(estU), Seq("la", "lb"))
      .select($"la", $"lb", $"est_a", $"est_b", $"e_union",
        greatest(lit(0L), $"est_a" + $"est_b" - $"e_union").as("est_inter"))
      .orderBy($"la", $"lb")
  }

  final val KmvK = 64

  /** q151 — KMV (bottom-k / theta) distinct sketch: the third member
    * of the distinct-estimation family (exact bitmap q149, HLL q58).
    * Keep the [[KmvK]] smallest md5-60-bit hashes of the key per
    * group; the k-th smallest estimates the distinct count as
    * (k−1)·2^60 / h_k (uniform hashes ⇒ the k-th order statistic sits
    * at ≈ k/n of the hash space). Unlike HLL the sketch supports
    * set intersection natively, and its build IS the library's native
    * top-k-per-group operator with an ascending order — bounded
    * [[KmvK]]-row heaps before and after the group exchange, never a
    * per-group sort. Groups with < k distinct keys fall back to the
    * exact count (the sketch is the whole set there). Estimate is a
    * fixed IEEE-double tree over two longs — identical in DuckDB.
    * Key = (user, payload) combination: per-type distinct USERS are
    * identical across types in this data (every user does everything
    * — the estimates would all collapse to one value), while distinct
    * combinations vary per type and actually exercise the estimator.
    */
  def q151_kmv_distinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val h = Caches.tracked(load(spark, dir, "events")
      .select($"event_type",
        conv(substring(md5(
          concat($"user_id".cast("string"), lit(":"), $"props")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .distinct())
    val bottomK = graft.plans.TopKPerGroup.topK(
      h, Seq("event_type"), Seq($"h".asc), KmvK, rankCol = "rk")
    val hk = bottomK.groupBy($"event_type")
      .agg(max(when($"rk" === KmvK, $"h")).as("h_k"))
    val exact = h.groupBy($"event_type").agg(count(lit(1)).as("n_exact"))
    exact.join(hk, "event_type")
      .withColumn("est_kmv", coalesce(
        round(lit((KmvK - 1).toDouble) * lit(1152921504606846976.0) / $"h_k")
          .cast("long"),
        $"n_exact"))
      .withColumn("err_bp",
        round(lit(10000.0) * ($"est_kmv" - $"n_exact") / $"n_exact").cast("long"))
      .select($"event_type", $"n_exact", coalesce($"h_k", lit(0L)).as("h_k"),
        $"est_kmv", $"err_bp")
      .orderBy($"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q151_kmv_distinct" -> q151_kmv_distinct,
    "q120_hll_set_algebra" -> q120_hll_set_algebra,
    "q58_hll_distinct" -> q58_hll_distinct,
    "q59_cms_heavy_hitters" -> q59_cms_heavy_hitters,
    "q68_histogram_quantiles" -> q68_histogram_quantiles,
    "q71_hll_udaf" -> q71_hll_udaf)

  private val GramSql =
    s"""SELECT lang, unnest(list_transform(
       |    generate_series(1, greatest(length(text) - ${TextAnalysis.GramChars - 1}, 0)),
       |    i -> substring(text, i, ${TextAnalysis.GramChars}))) AS gram
       |  FROM documents""".stripMargin

  val oracle: Map[String, String] = Map(
    "q151_kmv_distinct" ->
      s"""WITH h AS (SELECT DISTINCT event_type,
         |    CAST('0x' || substring(md5(
         |      CAST(user_id AS VARCHAR) || ':' || props), 1, 15)
         |      AS BIGINT) AS h
         |  FROM events),
         |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
         |    ORDER BY h) AS rk FROM h),
         |hk AS (SELECT event_type,
         |    MAX(CASE WHEN rk = $KmvK THEN h END) AS h_k FROM rk GROUP BY 1),
         |ex AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact
         |  FROM h GROUP BY 1)
         |SELECT ex.event_type, ex.n_exact, COALESCE(hk.h_k, 0) AS h_k,
         |  COALESCE(CAST(ROUND(${KmvK - 1}.0 * 1152921504606846976.0 / hk.h_k)
         |    AS BIGINT), ex.n_exact) AS est_kmv,
         |  CAST(ROUND(10000.0 * (COALESCE(CAST(ROUND(${KmvK - 1}.0
         |      * 1152921504606846976.0 / hk.h_k) AS BIGINT), ex.n_exact)
         |    - ex.n_exact) / ex.n_exact) AS BIGINT) AS err_bp
         |FROM ex JOIN hk ON ex.event_type = hk.event_type
         |ORDER BY ex.event_type""".stripMargin,
    "q120_hll_set_algebra" ->
      s"""WITH g AS ($GramSql),
         |h0 AS (SELECT lang,
         |    CAST('0x' || substring(md5(gram), 1, 15) AS BIGINT) AS h FROM g),
         |dh AS (SELECT DISTINCT lang, h FROM h0),
         |r AS (SELECT lang, h % $HllRegisters AS j,
         |    CASE WHEN h // $HllRegisters = 0 THEN 55
         |         ELSE 55 - length(printf('%b', h // $HllRegisters)) END AS rho
         |  FROM dh),
         |s AS (SELECT lang, j, MAX(rho) AS reg FROM r GROUP BY 1, 2),
         |f AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS hit,
         |    CAST(SUM(CAST(POW(2, 55 - reg) AS BIGINT)) AS BIGINT) AS s_hit
         |  FROM s GROUP BY 1),
         |est AS (SELECT lang, CAST(ROUND($HllAlphaM2 * POW(2, 55)
         |    / (s_hit + ($HllRegisters - hit) * CAST(POW(2, 55) AS BIGINT))) AS BIGINT) AS e
         |  FROM f),
         |langs AS (SELECT DISTINCT lang FROM s),
         |pairs AS (SELECT a.lang AS la, b.lang AS lb
         |          FROM langs a JOIN langs b ON a.lang < b.lang),
         |u AS (SELECT la, lb, j, MAX(reg) AS reg FROM (
         |    SELECT p.la, p.lb, s.j, s.reg FROM pairs p JOIN s ON s.lang = p.la
         |    UNION ALL
         |    SELECT p.la, p.lb, s.j, s.reg FROM pairs p JOIN s ON s.lang = p.lb)
         |  GROUP BY 1, 2, 3),
         |fu AS (SELECT la, lb, CAST(COUNT(*) AS BIGINT) AS hit,
         |    CAST(SUM(CAST(POW(2, 55 - reg) AS BIGINT)) AS BIGINT) AS s_hit
         |  FROM u GROUP BY 1, 2),
         |eu AS (SELECT la, lb, CAST(ROUND($HllAlphaM2 * POW(2, 55)
         |    / (s_hit + ($HllRegisters - hit) * CAST(POW(2, 55) AS BIGINT))) AS BIGINT)
         |    AS e_union FROM fu)
         |SELECT p.la AS la, p.lb AS lb, ea.e AS est_a, eb.e AS est_b, eu.e_union,
         |  GREATEST(0, ea.e + eb.e - eu.e_union) AS est_inter
         |FROM pairs p
         |JOIN est ea ON p.la = ea.lang JOIN est eb ON p.lb = eb.lang
         |JOIN eu ON p.la = eu.la AND p.lb = eu.lb
         |ORDER BY la, lb""".stripMargin,
    "q71_hll_udaf" ->
      s"""WITH g AS ($GramSql),
         |h AS (SELECT lang,
         |    CAST('0x' || substring(md5(gram), 1, 15) AS BIGINT) AS h FROM g),
         |r AS (SELECT lang, h % $HllRegisters AS j,
         |    CASE WHEN h // $HllRegisters = 0 THEN 55
         |         ELSE 55 - length(printf('%b', h // $HllRegisters)) END AS rho
         |  FROM h),
         |s AS (SELECT lang, j, MAX(rho) AS reg FROM r GROUP BY 1, 2),
         |f AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS regs_hit,
         |    CAST(SUM(reg) AS BIGINT) AS sum_rho,
         |    CAST(SUM(CAST(POW(2, 55 - reg) AS BIGINT)) AS BIGINT) AS s_hit
         |  FROM s GROUP BY 1)
         |SELECT lang, regs_hit, sum_rho,
         |  CAST(ROUND($HllAlphaM2 * POW(2, 55)
         |    / (s_hit + ($HllRegisters - regs_hit) * CAST(POW(2, 55) AS BIGINT))) AS BIGINT) AS hll_est
         |FROM f ORDER BY lang""".stripMargin,
    "q68_histogram_quantiles" ->
      """WITH b AS (SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS bin,
        |    COUNT(*) AS c FROM events GROUP BY 1, 2),
        |cw AS (SELECT event_type, bin,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |    SUM(c) OVER (PARTITION BY event_type) AS n FROM b)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(MIN(CASE WHEN cum * 100 >= n * 50 THEN bin END) AS BIGINT) AS p50_cents,
        |  CAST(MIN(CASE WHEN cum * 100 >= n * 90 THEN bin END) AS BIGINT) AS p90_cents,
        |  CAST(MIN(CASE WHEN cum * 100 >= n * 99 THEN bin END) AS BIGINT) AS p99_cents
        |FROM cw GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q58_hll_distinct" ->
      s"""WITH g AS ($GramSql),
         |h AS (SELECT lang,
         |    CAST('0x' || substring(md5(gram), 1, 15) AS BIGINT) AS h FROM g),
         |r AS (SELECT lang, h % $HllRegisters AS j,
         |    CASE WHEN h // $HllRegisters = 0 THEN 55
         |         ELSE 55 - length(printf('%b', h // $HllRegisters)) END AS rho
         |  FROM h),
         |s AS (SELECT lang, j, MAX(rho) AS reg FROM r GROUP BY 1, 2),
         |f AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS regs_hit,
         |    CAST(SUM(reg) AS BIGINT) AS sum_rho,
         |    CAST(SUM(CAST(POW(2, 55 - reg) AS BIGINT)) AS BIGINT) AS s_hit
         |  FROM s GROUP BY 1),
         |x AS (SELECT lang, CAST(COUNT(DISTINCT h) AS BIGINT) AS n_exact
         |  FROM h GROUP BY 1)
         |SELECT f.lang, regs_hit, sum_rho,
         |  CAST(ROUND($HllAlphaM2 * POW(2, 55)
         |    / (s_hit + ($HllRegisters - regs_hit) * CAST(POW(2, 55) AS BIGINT))) AS BIGINT) AS hll_est,
         |  n_exact
         |FROM f JOIN x USING (lang) ORDER BY lang""".stripMargin,
    "q59_cms_heavy_hitters" ->
      s"""WITH g AS ($GramSql),
         |c AS (SELECT gram, COUNT(*) AS n FROM g GROUP BY 1),
         |cells AS (SELECT r.range AS r,
         |    CAST('0x' || substring(md5(CAST(r.range AS VARCHAR) || ':' || gram), 1, 15) AS BIGINT)
         |      % $CmsWidth AS bucket,
         |    SUM(n) AS cnt
         |  FROM c, range($CmsRows) r GROUP BY 1, 2),
         |top AS (SELECT gram, n FROM c ORDER BY n DESC, gram LIMIT $CmsTopK)
         |SELECT gram, CAST(n AS BIGINT) AS true_count,
         |  CAST(MIN(cnt) AS BIGINT) AS cms_est
         |FROM top, range($CmsRows) r
         |JOIN cells ON cells.r = r.range
         |  AND cells.bucket = CAST('0x' || substring(md5(CAST(r.range AS VARCHAR) || ':' || gram), 1, 15) AS BIGINT)
         |      % $CmsWidth
         |GROUP BY gram, n ORDER BY true_count DESC, gram""".stripMargin)
}
