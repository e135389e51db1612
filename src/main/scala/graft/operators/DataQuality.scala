package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

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

  /** q94 — sparse cosine similarity via an INVERTED-INDEX join: the
    * scalable form of all-pairs text similarity. Token-count vectors
    * never materialize — the postings list (block key, token, doc,
    * tf) joins itself on (block, token), partial products aggregate
    * per pair, norms join back as a broadcast |docs|-vector. Pair
    * fan-out is Σ df(t)² per block, which the block key bounds here
    * and a document-frequency cut (drop ubiquitous tokens, exactly
    * q73's prefix-filter idea) bounds at open scale. All arithmetic
    * is exact-integer dots + IEEE sqrt/divide in a fixed shape, so
    * the score is bit-identical across engines and partitionings.
    */
  def q94_sparse_cosine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tf = graft.Caches.tracked(load(spark, dir, "documents")
      .select($"doc_id", $"lang", $"source",
        explode(split($"text", " ")).as("tok"))
      .filter(length($"tok") > 0)
      .groupBy($"doc_id", $"lang", $"source", $"tok")
      .agg(count(lit(1)).as("tf")))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q93_quality_checks" -> q93_quality_checks,
    "q94_sparse_cosine" -> q94_sparse_cosine)

  val oracle: Map[String, String] = Map(
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
    "q94_sparse_cosine" ->
      """WITH t AS (SELECT doc_id, lang, source,
        |        unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, lang, source, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM t WHERE len(tok) > 0 GROUP BY 1, 2, 3, 4),
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
