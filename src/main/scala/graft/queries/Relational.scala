package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{cents, load}

/** Core relational operator coverage (SURVEY.md §2.1, §2.4-2.6, §2.9)
  * expressed over the harness tables (FIXTURES.md §C maps the GTFS
  * domain onto them: dims → customer/nation/region, fact stream →
  * lineitem/orders/events).
  *
  * Every query is deterministic (stable ORDER BY on key columns) and
  * emits only exact types (BIGINT counts/cents, strings, dates) so the
  * DuckDB hash-compare cannot flake on float summation order.
  *
  * Scale design: aggregates are partial+final hash aggregates (Catalyst
  * default), joins broadcast the dimension side explicitly, and every
  * filter is a plain parquet-pushable predicate. Nothing collects to
  * the driver.
  */
object Relational {

  /** TPC-H Q1 shape: scan → pushed filter → 2-key hash agg.
    * Reference analog: silver projection + KPI aggregation
    * (dags/gtfs_silver.py:125-213 + README.md:120).
    */
  def q01_pricing_summary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").cast("long").as("sum_qty"),
        sum(cents($"l_extendedprice")).as("sum_base_cents"),
        sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("sum_disc_cents"),
        avg($"l_quantity").as("avg_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Projection/derivation surface: COALESCE/NULLIF (F1), CASE WHEN
    * (F2, the `direction_id` sentinel of dags/gtfs_silver.py:184),
    * casts (F3/F4), TRY_CAST (F7, pandas `to_numeric(errors="coerce")`
    * of dags/gtfs_rt_minutely.py:120-123).
    */
  def q02_scalar_funcs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "lineitem")
      .filter($"l_orderkey" % 100 === 0)
      .select(
        $"l_orderkey", $"l_linenumber",
        coalesce(nullif($"l_returnflag", lit("N")), $"l_linestatus").as("flag_or_status"),
        when($"l_tax" === 0, lit("zero")).otherwise(lit("taxed")).as("tax_class"),
        $"l_quantity".cast("int").as("qty_int"),
        expr("try_cast(l_returnflag AS INT)").as("flag_as_int"),
        cents($"l_extendedprice").as("price_cents"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Broadcast equi-join fact×dim + group (SURVEY §2.5: KPI joins with
    * small dims broadcast — routes ~100 rows ≙ customer here).
    */
  def q03_join_broadcast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = load(spark, dir, "orders")
    val customer = load(spark, dir, "customer")
    orders
      .join(broadcast(customer), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), sum(cents($"o_totalprice")).as("sum_cents"))
      .orderBy($"c_mktsegment")
  }

  /** TPC-H Q5 shape: 6-table join spine. lineitem×orders shuffles on
    * the join key; all dimension joins broadcast (at 100 TB the fact-
    * fact join is the only unavoidable shuffle; AQE handles skew).
    */
  def q04_join_multi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = load(spark, dir, "lineitem")
    val o = load(spark, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1997-01-01").cast("timestamp"))
    val c = load(spark, dir, "customer")
    val s = load(spark, dir, "supplier")
    val n = load(spark, dir, "nation")
    val r = load(spark, dir, "region")
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(s), $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_cents"))
      .orderBy($"n_name")
  }

  /** Left outer join keeping unmatched dimension rows (README.md:128
    * "carte des arrêts avec état de service": stops with no
    * observation → zero count).
    */
  def q05_left_join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val customer = load(spark, dir, "customer")
    val orders = load(spark, dir, "orders")
    customer
      .join(orders, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"))
      .orderBy($"c_custkey")
  }

  /** Left anti join: dimension rows with no recent observation
    * (README.md:138 "certains arrêts peuvent manquer"; the right side
    * is window-filtered like every dashboard query, README.md:139).
    */
  def q06_anti_join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val customer = load(spark, dir, "customer")
    val recent = load(spark, dir, "orders")
      .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
      .select($"o_custkey")
    customer
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Top-k: group → order desc → limit (README.md:122 "lignes les plus
    * en retard"; Spark plans TakeOrderedAndProject — no full sort at
    * scale).
    */
  def q07_topk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "lineitem")
      .groupBy($"l_suppkey")
      .agg(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_cents"),
           count(lit(1)).as("n_items"))
      .orderBy($"revenue_cents".desc, $"l_suppkey")
      .limit(10)
  }

  /** Full outer join: reconcile two partial aggregates that each miss
    * some keys (high-balance customers vs low-balance suppliers per
    * nation) — the "merge two reports, keep both null sides" shape.
    * Both inputs are pre-aggregated to one row per nation, so the
    * outer join is tiny regardless of fact size — aggregate-then-join,
    * never join-then-aggregate, is what survives the 100× scale-up.
    */
  def q56_full_outer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = load(spark, dir, "customer")
      .filter($"c_acctbal" > 9000)
      .groupBy($"c_nationkey").agg(count(lit(1)).as("n_rich_cust"))
    val supp = load(spark, dir, "supplier")
      .filter($"s_acctbal" < 500)
      .groupBy($"s_nationkey").agg(count(lit(1)).as("n_poor_supp"))
    cust.join(supp, $"c_nationkey" === $"s_nationkey", "full_outer")
      .select(
        coalesce($"c_nationkey", $"s_nationkey").as("nation_key"),
        coalesce($"n_rich_cust", lit(0L)).as("n_rich_cust"),
        coalesce($"n_poor_supp", lit(0L)).as("n_poor_supp"),
        ($"c_nationkey".isNotNull && $"s_nationkey".isNotNull).cast("int").as("in_both"))
      .orderBy($"nation_key")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_full_outer" -> q56_full_outer,
    "q01_pricing_summary" -> q01_pricing_summary,
    "q02_scalar_funcs" -> q02_scalar_funcs,
    "q03_join_broadcast" -> q03_join_broadcast,
    "q04_join_multi" -> q04_join_multi,
    "q05_left_join" -> q05_left_join,
    "q06_anti_join" -> q06_anti_join,
    "q07_topk" -> q07_topk)

  val oracle: Map[String, String] = Map(
    "q56_full_outer" ->
      """WITH c AS (SELECT c_nationkey, COUNT(*) AS n_rich_cust
        |    FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey),
        |  s AS (SELECT s_nationkey, COUNT(*) AS n_poor_supp
        |    FROM supplier WHERE s_acctbal < 500 GROUP BY s_nationkey)
        |SELECT COALESCE(c_nationkey, s_nationkey) AS nation_key,
        |  COALESCE(n_rich_cust, 0) AS n_rich_cust,
        |  COALESCE(n_poor_supp, 0) AS n_poor_supp,
        |  CAST(c_nationkey IS NOT NULL AND s_nationkey IS NOT NULL AS INT) AS in_both
        |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
        |ORDER BY nation_key""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |  AVG(l_quantity) AS avg_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_scalar_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  COALESCE(NULLIF(l_returnflag,'N'), l_linestatus) AS flag_or_status,
        |  CASE WHEN l_tax = 0 THEN 'zero' ELSE 'taxed' END AS tax_class,
        |  CAST(l_quantity AS INT) AS qty_int,
        |  TRY_CAST(l_returnflag AS INT) AS flag_as_int,
        |  CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_cents
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_broadcast" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q04_join_multi" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q05_left_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "q07_topk" ->
      """SELECT l_suppkey,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  COUNT(*) AS n_items
        |FROM lineitem GROUP BY l_suppkey
        |ORDER BY revenue_cents DESC, l_suppkey LIMIT 10""".stripMargin)
}
