package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{cents, load}

/** Declarative data-quality audit (Deequ-style, reduced to its Spark
  * core): a rule set evaluated in ONE scan of the audited table —
  * every predicate becomes a conditional-sum aggregate, so adding a
  * rule adds zero passes — plus referential rules as anti-join
  * counts. Violation semantics: a row violates a rule when the
  * predicate is false OR null (CASE WHEN p THEN 0 ELSE 1), so null
  * keys count as violations, not as silently-passing rows.
  */
object DataQuality {

  /** q93 — audit the orders table: domain, range, positivity,
    * null-key rules in one aggregate; customer referential integrity
    * as a broadcast anti-join count. Output long form (rule,
    * n_violations, n_checked) — the shape a quality dashboard or a
    * circuit-breaker gate consumes.
    */
  def q93_quality_checks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = load(spark, dir, "orders")
    val rules: Seq[(String, Column)] = Seq(
      "orderdate_in_range" ->
        ($"o_orderdate" >= lit("1992-01-01") && $"o_orderdate" <= lit("1998-12-31")),
      "priority_in_domain" ->
        $"o_orderpriority".isin("1-URGENT", "2-HIGH", "3-MEDIUM",
          "4-NOT SPECIFIED", "5-LOW"),
      "totalprice_positive" -> ($"o_totalprice" > 0),
      "custkey_not_null" -> $"o_custkey".isNotNull)
    val violationCols = rules.map { case (name, p) =>
      sum(when(p, 0L).otherwise(1L)).as(name)
    }
    val wide = o.agg(count(lit(1)).as("n_checked"), violationCols: _*)
    val scan = wide.unpivot(
      ids = Array($"n_checked"),
      values = rules.map(r => col(r._1)).toArray,
      variableColumnName = "rule",
      valueColumnName = "n_violations")
    val orphans = o.join(
        load(spark, dir, "customer").select($"c_custkey"),
        $"o_custkey" === $"c_custkey", "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(o.agg(count(lit(1)).as("n_checked")))
      .select(lit("referential_customer").as("rule"),
        $"n_violations", $"n_checked")
    scan.select($"rule", $"n_violations", $"n_checked")
      .unionByName(orphans)
      .orderBy($"rule")
  }

  /** Posting-list cap for q94: tokens whose per-block document
    * frequency exceeds this are dropped from the index (and from the
    * norms — cosine is computed consistently in the capped term
    * space). Σ df(t)² is the join's pair fan-out, so the cap bounds
    * the worst token's contribution at DfCut² regardless of corpus
    * size — the df-cut every production all-pairs system applies
    * (ubiquitous tokens carry ~no discriminative signal but all the
    * quadratic cost). Sized above every real-corpus df at the
    * verification scales (max block-df: 15 at sf0.01, 101 at sf0.1 —
    * outputs there are IDENTICAL with or without the cap) and
    * measured at the sf1.0 linearity audit to collapse the
    * dense-vocab pathology: Σ df² 1.35e9 → 5e3 (wall 174 s → ~1 s).
    */
  final val Q94DfCut = 150L

  /** q94 — sparse cosine similarity via an INVERTED-INDEX join: the
    * scalable form of all-pairs text similarity. Token-count vectors
    * never materialize — the postings list (block key, token, doc,
    * tf) joins itself on (block, token), partial products aggregate
    * per pair, norms join back as a broadcast |docs|-vector. Pair
    * fan-out is Σ df(t)² per block, bounded by the block key plus the
    * [[Q94DfCut]] document-frequency cut (q73's prefix-filter idea;
    * the df aggregate and the postings join hash on the same
    * (block, token) key, so the cut costs no extra shuffle). All
    * arithmetic is exact-integer dots + IEEE sqrt/divide in a fixed
    * shape, so the score is bit-identical across engines and
    * partitionings.
    */
  def q94_sparse_cosine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tfAll = load(spark, dir, "documents")
      .select($"doc_id", $"lang", $"source",
        explode(split($"text", " ")).as("tok"))
      .filter(length($"tok") > 0)
      .groupBy($"doc_id", $"lang", $"source", $"tok")
      .agg(count(lit(1)).as("tf"))
    val dfCut = tfAll.groupBy($"lang", $"source", $"tok")
      .agg(count(lit(1)).as("df"))
      .filter($"df" <= Q94DfCut)
      .select($"lang", $"source", $"tok")
    val tf = graft.Caches.tracked(tfAll.join(dfCut, Seq("lang", "source", "tok")))
    val nrm = tf.groupBy($"doc_id").agg(sum($"tf" * $"tf").as("n2"))
    val a = tf.select($"lang", $"source", $"tok",
      $"doc_id".as("a_id"), $"tf".as("a_tf"))
    val b = tf.select($"lang", $"source", $"tok",
      $"doc_id".as("b_id"), $"tf".as("b_tf"))
    a.join(b, Seq("lang", "source", "tok"))
      .filter($"a_id" < $"b_id")
      .groupBy($"a_id", $"b_id").agg(sum($"a_tf" * $"b_tf").as("dot"))
      .join(broadcast(nrm.select($"doc_id".as("a_id"), $"n2".as("a_n2"))), "a_id")
      .join(broadcast(nrm.select($"doc_id".as("b_id"), $"n2".as("b_n2"))), "b_id")
      .withColumn("cos", $"dot" / (sqrt($"a_n2") * sqrt($"b_n2")))
      .filter($"cos" >= 0.82)
      .select($"a_id", $"b_id", round($"cos" * 1e6).cast("long").as("cos_e6"))
      .orderBy($"a_id", $"b_id")
  }

  /** q102 — one-pass table profiling (Deequ/Glue-crawler analog):
    * per-column row count, null count, exact distinct count, min/max,
    * and mode (most frequent value, tie-broken by value). The melt is
    * an Expand (rows × |columns|, zero shuffle); all stats then hang
    * off two aggregations keyed by column name / (column, value).
    * Columns are profiled through a canonical string rendering;
    * floats go through the cents cast first because float→string
    * rendering is NOT engine-portable (the one profiling gotcha).
    */
  def q102_profile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = load(spark, dir, "customer").select(
      $"c_custkey".cast("string").as("c_custkey"),
      $"c_name", $"c_nationkey".cast("string").as("c_nationkey"),
      cents($"c_acctbal").cast("string").as("c_acctbal_cents"),
      $"c_mktsegment")
    val cols = c.columns
    val melted = graft.Caches.tracked(c.unpivot(
      Array.empty[org.apache.spark.sql.Column],
      cols.map(col), "col_name", "val"))
    val stats = melted.groupBy($"col_name").agg(
      count(lit(1)).as("n"),
      sum(when($"val".isNull, 1L).otherwise(0L)).as("n_nulls"),
      countDistinct($"val").as("n_distinct"),
      min($"val").as("min_s"), max($"val").as("max_s"))
    // Mode per column WITHOUT a col_name-partitioned window: for a key
    // column the (col, value) count table has one row per table row, so
    // `Window.partitionBy(col_name)` would funnel a full column through
    // one task (|columns| ≈ 5 groups — the low-cardinality trap). Both
    // aggregates below partial-aggregate map-side (a low-cardinality
    // groupBy is safe; only the window form is not), and the max count
    // comes back as a ≤|columns|-row broadcast.
    val counts = graft.Caches.tracked(melted.filter($"val".isNotNull)
      .groupBy($"col_name", $"val").agg(count(lit(1)).as("cnt")))
    val top = counts.groupBy($"col_name").agg(max($"cnt").as("top_count"))
    val mode = counts.join(broadcast(top), "col_name")
      .filter($"cnt" === $"top_count")
      .groupBy($"col_name")
      .agg(min($"val").as("top_value"), max($"cnt").as("top_count"))
    stats.join(mode, Seq("col_name"), "left")
      .orderBy($"col_name")
  }

  /** q103 — snapshot diff (CDC reconciliation): classify every key
    * across two table versions as added / removed / changed /
    * unchanged with ONE co-partitioned full-outer join on the
    * high-cardinality key. At 100 TB the change test compares a
    * single row-hash column computed at scan (not N wide columns) —
    * here the payload is one value, which is its own hash. Both
    * versions derive deterministically from the same snapshot so the
    * oracle can replay them.
    */
  def q103_snapshot_diff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = load(spark, dir, "orders")
      .select($"o_orderkey".as("k"), cents($"o_totalprice").as("c"))
    val base = o.filter($"k" % 10 =!= 0).select($"k", $"c".as("v1"))
    val next = o.filter($"k" % 7 =!= 0)
      .select($"k", ($"c" + when($"k" % 5 === 0, 1000L).otherwise(0L)).as("v2"))
    base.join(next, Seq("k"), "full_outer")
      .select(
        when($"v1".isNull, "added")
          .when($"v2".isNull, "removed")
          .when($"v1" =!= $"v2", "changed")
          .otherwise("unchanged").as("status"))
      .groupBy($"status").agg(count(lit(1)).as("n"))
      .orderBy($"status")
  }

  /** q145 — join-health preflight: before running a big join, audit
    * the key relationship — distinct keys per side, overlap,
    * one-sided keys, worst per-key multiplicity, and the EXACT output
    * row count the join would produce (Σ over shared keys of
    * left_mult × right_mult). At 100 TB this one-key-cardinality-
    * sized report is what catches a join explosion (an unexpected
    * many-to-many) before it takes the cluster down. Plan: each side
    * reduces to a per-key count (partial+final on the join key), the
    * audit is ONE full-outer join of those bounded count tables, and
    * every metric is an exact integer sum over it.
    */
  def q145_join_health(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = load(spark, dir, "lineitem")
      .groupBy($"l_orderkey".as("k")).agg(count(lit(1)).as("lm"))
    val r = load(spark, dir, "orders")
      .groupBy($"o_orderkey".as("k")).agg(count(lit(1)).as("rm"))
    l.join(r, Seq("k"), "full_outer")
      .agg(
        sum(when($"lm".isNotNull, 1L).otherwise(0L)).as("n_left_keys"),
        sum(when($"rm".isNotNull, 1L).otherwise(0L)).as("n_right_keys"),
        sum(when($"lm".isNotNull && $"rm".isNotNull, 1L).otherwise(0L)).as("n_shared_keys"),
        sum(when($"rm".isNull, 1L).otherwise(0L)).as("n_left_only"),
        sum(when($"lm".isNull, 1L).otherwise(0L)).as("n_right_only"),
        max(coalesce($"lm", lit(0L))).as("max_left_mult"),
        max(coalesce($"rm", lit(0L))).as("max_right_mult"),
        sum(when($"lm".isNotNull && $"rm".isNotNull, $"lm" * $"rm")
          .otherwise(0L)).as("inner_join_rows"))
  }

  /** Benford basis-point frequencies log10(1 + 1/d), d = 1..9 —
    * pre-computed literals so no runtime transcendental enters the
    * plan (last-ulp log differences would be engine-visible).
    */
  private val BenfordBp = Seq(3010L, 1761L, 1249L, 969L, 792L, 669L, 580L, 512L, 458L)

  /** q172 — Benford first-digit audit: the fraud/fabrication screen —
    * organically-grown monetary amounts follow log10(1+1/d) leading-
    * digit frequencies; fabricated or capped data doesn't. One scan
    * reduces to 9 digit counts; expected counts come from literal
    * basis points (integer div), the χ² contribution per digit is a
    * fixed float tree. The verdict (synthetic uniform-ish prices WILL
    * diverge — large chi2) is part of the point: the operator
    * reports, the threshold is the consumer's.
    */
  def q172_benford(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = load(spark, dir, "orders")
      .select(substring(cents($"o_totalprice").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n_observed"))
    val total = counts.agg(sum($"n_observed").as("n_total"))
    counts.crossJoin(broadcast(total))
      .withColumn("benford_bp",
        element_at(array(BenfordBp.map(lit): _*), $"digit".cast("int")))
      .withColumn("expected_n", expr("(n_total * benford_bp) div 10000"))
      // a tiny sample can round an expected cell to 0 — the chi2 term
      // is undefined there (degenerate-probe finding; mirrored guard)
      .withColumn("chi2_milli",
        when($"expected_n" > 0L,
          round(lit(1000.0) * ($"n_observed" - $"expected_n")
            * ($"n_observed" - $"expected_n") / $"expected_n").cast("long"))
          .otherwise(lit(null).cast("long")))
      .select($"digit", $"n_observed", $"benford_bp", $"expected_n", $"chi2_milli")
      .orderBy($"digit")
  }

  /** q174 — duplicate-payment screen: multiple orders from the same
    * customer on the same day, with how close their amounts sit — the
    * double-submission audit (exact-amount repeats are the smoking
    * gun; near-equal amounts are review candidates). One window pass
    * on the (customer, day) key computes adjacent amount gaps inside
    * each group (group sizes are tiny), one aggregate finds the
    * groups, and the per-segment rollup reports group count, orders
    * involved, total same-day exposure, and the closest amount gap
    * seen — all integer cents.
    */
  def q174_duplicate_payments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = load(spark, dir, "orders")
      .select($"o_custkey", $"o_orderkey", cents($"o_totalprice").as("amt_c"),
        date_trunc("day", $"o_orderdate").as("day"))
    val byGroup = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey", $"day").orderBy($"amt_c", $"o_orderkey")
    val groups = o
      .withColumn("gap_c", $"amt_c" - lag($"amt_c", 1).over(byGroup))
      .groupBy($"o_custkey", $"day")
      .agg(count(lit(1)).as("n"), sum($"amt_c").as("day_cents"),
        min($"gap_c").as("min_gap_c"))
      .filter($"n" > 1)
    groups
      .join(broadcast(load(spark, dir, "customer")
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_dup_groups"),
        sum($"n").as("n_orders_involved"),
        sum($"day_cents").as("exposure_cents"),
        min($"min_gap_c").as("closest_gap_c"))
      .orderBy($"c_mktsegment")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q172_benford" -> q172_benford,
    "q174_duplicate_payments" -> q174_duplicate_payments,
    "q145_join_health" -> q145_join_health,
    "q93_quality_checks" -> q93_quality_checks,
    "q94_sparse_cosine" -> q94_sparse_cosine,
    "q102_profile" -> q102_profile,
    "q103_snapshot_diff" -> q103_snapshot_diff)

  val oracle: Map[String, String] = Map(
    "q174_duplicate_payments" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt_c,
        |    date_trunc('day', o_orderdate) AS day
        |  FROM orders),
        |w AS (SELECT *, amt_c - LAG(amt_c) OVER (
        |    PARTITION BY o_custkey, day ORDER BY amt_c, o_orderkey) AS gap_c
        |  FROM o),
        |g AS (SELECT o_custkey, day, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(amt_c) AS BIGINT) AS day_cents,
        |    CAST(MIN(gap_c) AS BIGINT) AS min_gap_c
        |  FROM w GROUP BY 1, 2 HAVING COUNT(*) > 1)
        |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_dup_groups,
        |  CAST(SUM(n) AS BIGINT) AS n_orders_involved,
        |  CAST(SUM(day_cents) AS BIGINT) AS exposure_cents,
        |  CAST(MIN(min_gap_c) AS BIGINT) AS closest_gap_c
        |FROM g JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q172_benford" ->
      """WITH d AS (SELECT CAST(substring(
        |      CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
        |    AS BIGINT) AS digit
        |  FROM orders),
        |c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_observed
        |  FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_observed) AS BIGINT) AS n_total FROM c)
        |SELECT digit, n_observed,
        |  CAST(([3010, 1761, 1249, 969, 792, 669, 580, 512, 458])[digit]
        |    AS BIGINT) AS benford_bp,
        |  CAST((n_total * ([3010, 1761, 1249, 969, 792, 669, 580, 512, 458])[digit])
        |    // 10000 AS BIGINT) AS expected_n,
        |  CASE WHEN (n_total * ([3010, 1761, 1249, 969, 792, 669, 580, 512, 458])[digit]) // 10000 > 0 THEN
        |    CAST(ROUND(1000.0
        |      * (n_observed - (n_total * ([3010, 1761, 1249, 969, 792, 669, 580, 512, 458])[digit]) // 10000)
        |      * (n_observed - (n_total * ([3010, 1761, 1249, 969, 792, 669, 580, 512, 458])[digit]) // 10000)
        |      / ((n_total * ([3010, 1761, 1249, 969, 792, 669, 580, 512, 458])[digit]) // 10000)) AS BIGINT)
        |  END AS chi2_milli
        |FROM c, t ORDER BY digit""".stripMargin,
    "q145_join_health" ->
      """WITH l AS (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS lm
        |           FROM lineitem GROUP BY 1),
        |r AS (SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS rm
        |      FROM orders GROUP BY 1),
        |j AS (SELECT l.lm, r.rm FROM l FULL JOIN r ON l.k = r.k)
        |SELECT
        |  CAST(SUM(CASE WHEN lm IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_left_keys,
        |  CAST(SUM(CASE WHEN rm IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_right_keys,
        |  CAST(SUM(CASE WHEN lm IS NOT NULL AND rm IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_shared_keys,
        |  CAST(SUM(CASE WHEN rm IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_left_only,
        |  CAST(SUM(CASE WHEN lm IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_right_only,
        |  CAST(MAX(COALESCE(lm, 0)) AS BIGINT) AS max_left_mult,
        |  CAST(MAX(COALESCE(rm, 0)) AS BIGINT) AS max_right_mult,
        |  CAST(SUM(CASE WHEN lm IS NOT NULL AND rm IS NOT NULL
        |    THEN lm * rm ELSE 0 END) AS BIGINT) AS inner_join_rows
        |FROM j""".stripMargin,
    "q93_quality_checks" ->
      """WITH base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN o_orderdate >= '1992-01-01'
        |        AND o_orderdate <= '1998-12-31' THEN 0 ELSE 1 END) AS BIGINT) AS r_date,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM',
        |        '4-NOT SPECIFIED','5-LOW') THEN 0 ELSE 1 END) AS BIGINT) AS r_prio,
        |  CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT) AS r_price,
        |  CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS r_cust
        |  FROM orders)
        |SELECT * FROM (
        |  SELECT 'orderdate_in_range' AS rule, r_date AS n_violations, n AS n_checked FROM base
        |  UNION ALL SELECT 'priority_in_domain', r_prio, n FROM base
        |  UNION ALL SELECT 'totalprice_positive', r_price, n FROM base
        |  UNION ALL SELECT 'custkey_not_null', r_cust, n FROM base
        |  UNION ALL SELECT 'referential_customer',
        |    CAST((SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
        |    CAST((SELECT COUNT(*) FROM orders) AS BIGINT))
        |ORDER BY rule""".stripMargin,
    "q102_profile" ->
      """WITH m AS (
        |  SELECT 'c_custkey' AS col_name, CAST(c_custkey AS VARCHAR) AS val FROM customer
        |  UNION ALL SELECT 'c_name', c_name FROM customer
        |  UNION ALL SELECT 'c_nationkey', CAST(c_nationkey AS VARCHAR) FROM customer
        |  UNION ALL SELECT 'c_acctbal_cents',
        |    CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) AS VARCHAR) FROM customer
        |  UNION ALL SELECT 'c_mktsegment', c_mktsegment FROM customer),
        |stats AS (SELECT col_name, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |    CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
        |    MIN(val) AS min_s, MAX(val) AS max_s
        |  FROM m GROUP BY 1),
        |mode AS (SELECT col_name, val AS top_value, cnt AS top_count FROM (
        |    SELECT col_name, val, CAST(COUNT(*) AS BIGINT) AS cnt,
        |      ROW_NUMBER() OVER (PARTITION BY col_name
        |        ORDER BY COUNT(*) DESC, val) AS rn
        |    FROM m WHERE val IS NOT NULL GROUP BY col_name, val)
        |  WHERE rn = 1)
        |SELECT stats.col_name AS col_name, n, n_nulls, n_distinct, min_s, max_s,
        |  top_value, top_count
        |FROM stats LEFT JOIN mode ON stats.col_name = mode.col_name
        |ORDER BY col_name""".stripMargin,
    "q103_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders),
        |base AS (SELECT k, c AS v1 FROM o WHERE k % 10 <> 0),
        |nxt AS (SELECT k, c + CASE WHEN k % 5 = 0 THEN 1000 ELSE 0 END AS v2
        |        FROM o WHERE k % 7 <> 0),
        |d AS (SELECT CASE WHEN v1 IS NULL THEN 'added'
        |             WHEN v2 IS NULL THEN 'removed'
        |             WHEN v1 <> v2 THEN 'changed'
        |             ELSE 'unchanged' END AS status
        |      FROM base FULL OUTER JOIN nxt USING (k))
        |SELECT status, CAST(COUNT(*) AS BIGINT) AS n
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q94_sparse_cosine" ->
      s"""WITH t AS (SELECT doc_id, lang, source,
        |        unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf0 AS (SELECT doc_id, lang, source, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM t WHERE len(tok) > 0 GROUP BY 1, 2, 3, 4),
        |dfc AS (SELECT lang, source, tok FROM tf0
        |       GROUP BY 1, 2, 3 HAVING COUNT(*) <= ${Q94DfCut}),
        |tf AS (SELECT tf0.* FROM tf0 JOIN dfc USING (lang, source, tok)),
        |nrm AS (SELECT doc_id, SUM(tf * tf) AS n2 FROM tf GROUP BY 1),
        |dots AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |        SUM(a.tf * b.tf) AS dot
        |      FROM tf a JOIN tf b ON a.tok = b.tok AND a.lang = b.lang
        |        AND a.source = b.source AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |c AS (SELECT a_id, b_id,
        |        dot / (sqrt(na.n2) * sqrt(nb.n2)) AS cos
        |      FROM dots JOIN nrm na ON a_id = na.doc_id
        |                JOIN nrm nb ON b_id = nb.doc_id)
        |SELECT a_id, b_id, CAST(ROUND(cos * 1e6) AS BIGINT) AS cos_e6
        |FROM c WHERE cos >= 0.82 ORDER BY a_id, b_id""".stripMargin)
}
