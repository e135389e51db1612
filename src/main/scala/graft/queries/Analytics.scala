package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.{cents, epochS, load}

/** KPI-shaped analytics over the `events` stream table — the declared
  * dashboard layer of the reference (SURVEY.md §2.7, §2.12,
  * README.md:118-129) mapped onto harness data per FIXTURES.md §C
  * (events ≙ RT observations, value ≙ delay seconds, user_id ≙
  * vehicle/stop id).
  *
  * Determinism rules (see Tables.scala): epoch-second BIGINTs instead
  * of raw ns timestamps; cents-BIGINTs for money/metric sums; every
  * window ordered by (ts, event_id) so ties cannot flake; ORDER BY on
  * output keys.
  *
  * Scale design: all windows partition by a high-cardinality key
  * (user_id), so state is evenly sharded; aggregations are partial+
  * final; the scalar watermark is the only driver-visible value.
  */
object Analytics {

  /** Latest event per user — README.md:127 "carte des bus en temps
    * réel" (latest vehicle position via ranking window, SURVEY §2.7).
    */
  def q08_window_latest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    load(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type", epochS($"ts").as("ts_s"))
      .orderBy($"user_id")
  }

  /** Per-key LAG delta — README.md:129 "évolution du retard par
    * arrêt" (change vs previous observation).
    */
  def q09_window_lag(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    load(spark, dir, "events")
      .filter($"event_type" === "purchase")
      .withColumn("value_cents", cents($"value"))
      .withColumn("delta_cents", $"value_cents" - lag($"value_cents", 1).over(w))
      .select($"user_id", $"event_id", $"value_cents", $"delta_cents")
      .orderBy($"user_id", $"event_id")
  }

  /** Running total per key (unbounded-preceding row frame) —
    * SURVEY §2.7 first/last-over-sequence shape ("temps de parcours",
    * README.md:126).
    */
  def q10_window_running(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    load(spark, dir, "events")
      .filter($"user_id" < 20)
      .withColumn("running_cents", sum(cents($"value")).over(w))
      .select($"user_id", $"event_id", $"running_cents")
      .orderBy($"user_id", $"event_id")
  }

  /** Set-operation semantics (SURVEY §2.8) via the scale-safe plan:
    * EXCEPT/INTERSECT over per-type key sets would cost 2 distincts +
    * 2 set-ops ≈ 4 shuffles over the same scan; one groupBy with
    * boolean membership flags derives both groups in ONE scan and ONE
    * shuffle, bit-identical output (the DuckDB oracle still runs
    * literal EXCEPT/INTERSECT — semantic equivalence is the check).
    */
  def q11_set_ops(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "events")
      .filter($"event_type".isin("click", "error"))
      .groupBy($"user_id")
      .agg(
        max(when($"event_type" === "click", 1).otherwise(0)).as("has_click"),
        max(when($"event_type" === "error", 1).otherwise(0)).as("has_error"))
      .filter($"has_click" === 1)
      .select(
        when($"has_error" === 1, lit("both")).otherwise(lit("click_no_error")).as("grp"),
        $"user_id")
      .orderBy($"grp", $"user_id")
  }

  /** The reference's core incremental pattern (P5,
    * dags/gtfs_silver.py:133): rows newer than the downstream table's
    * MAX watermark, COALESCEd to 1900-01-01 for cold start — as an
    * uncorrelated scalar subquery through Spark SQL. Second-floored on
    * both sides (ns parquet vs µs Spark).
    */
  def q12_incremental_watermark(spark: SparkSession, dir: String): DataFrame = {
    load(spark, dir, "events").createOrReplaceTempView("events_v")
    spark.sql(
      """SELECT event_type, COUNT(*) AS n,
        |  MIN(unix_timestamp(ts)) AS min_ts_s, MAX(unix_timestamp(ts)) AS max_ts_s
        |FROM events_v
        |WHERE date_trunc('second', ts) > COALESCE(
        |  (SELECT MAX(date_trunc('second', ts)) FROM events_v
        |   WHERE event_type = 'signup' AND ts < TIMESTAMP '2024-01-25'),
        |  TIMESTAMP '1900-01-01')
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** Heatmap hours × days (README.md:124): 2-key GROUP BY on derived
    * time parts; ISO day-of-week to match DuckDB's isodow.
    */
  def q13_heatmap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "events")
      .groupBy((weekday($"ts") + 1).as("isodow"), hour($"ts").as("hh"))
      .agg(count(lit(1)).as("n"), avg(cents($"value")).as("avg_cents"))
      .orderBy($"isodow", $"hh")
  }

  /** Delay distribution (README.md:125): fixed-width bucket histogram.
    */
  def q14_histogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "events")
      .groupBy(floor($"value" / 10).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"bucket")
  }

  /** Punctuality rate (README.md:121): share of observations under a
    * threshold, per group — conditional aggregation; rate emitted as
    * basis points BIGINT (single exact division then round).
    */
  def q15_punctuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "events")
      .groupBy($"event_type")
      .agg(
        sum(when($"value" <= 50.0, 1L).otherwise(0L)).as("on_time"),
        count(lit(1)).as("total"))
      .withColumn("rate_bp", round($"on_time" * 10000.0 / $"total").cast("long"))
      .orderBy($"event_type")
  }

  /** Semi-structured extraction: numeric field out of the JSON-ish
    * `props` string via regexp (F-series string functions; the
    * reference has none — this is the KPI layer's JSON surface).
    */
  def q16_json_extract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "events")
      .withColumn("k", regexp_extract($"props", "(\\d+)", 1).cast("long"))
      .groupBy($"event_type")
      .agg(min($"k").as("min_k"), max($"k").as("max_k"),
           sum($"k").as("sum_k"), count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  /** Latest-dimension-snapshot pick (SURVEY §7.4 hazard 5: daily
    * re-appended dims need an as-of selection before KPI joins):
    * MAX_BY on a unique ordering key.
    */
  def q17_latest_dim(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "orders")
      .groupBy($"o_custkey")
      .agg(max_by(cents($"o_totalprice"), $"o_orderkey").as("latest_price_cents"),
           max($"o_orderkey").as("latest_orderkey"))
      .orderBy($"o_custkey")
  }

  /** First-wins dedup (A2, dags/gtfs_rt_minutely.py:98-100): keep the
    * earliest observation per (user, type) — deterministic via MIN_BY
    * on the unique event_id (SURVEY §7.4 hazard 4).
    */
  def q18_dedup_first_wins(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "events")
      .groupBy($"user_id", $"event_type")
      .agg(min($"event_id").as("first_event_id"),
           min_by(cents($"value"), $"event_id").as("first_value_cents"),
           count(lit(1)).as("n_dups"))
      .orderBy($"user_id", $"event_type")
  }

  /** The one custom Catalyst expression, oracle-verified (SURVEY §7.3):
    * GTFS `H+:MM:SS` service-day times (hours may exceed 24) built
    * deterministically from integer columns, parsed by the native
    * codegen'd GtfsTimeToSeconds, with malformed inputs → NULL. The
    * DuckDB side re-derives seconds via split_part arithmetic with
    * TRY_CAST null-propagation — parse parity, not shared code.
    */
  def q29_gtfs_time(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.GtfsTime.register(spark)
    load(spark, dir, "events").createOrReplaceTempView("events_gtfs_v")
    spark.sql(
      """SELECT event_type,
        |  COUNT(secs) AS n_valid, COUNT(*) - COUNT(secs) AS n_malformed,
        |  SUM(secs) AS sum_s, MIN(secs) AS min_s, MAX(secs) AS max_s
        |FROM (
        |  SELECT event_type, gtfs_time_to_seconds(
        |    CASE WHEN user_id % 97 = 0 THEN 'not-a-time'
        |         ELSE printf('%d:%02d:%02d', 20 + user_id % 10, event_id % 60, user_id % 60)
        |    END) AS secs
        |  FROM events_gtfs_v)
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** As-of join (graft.operators.AsOfJoin): each purchase matched to
    * the user's latest click at-or-before it. Second-floored on both
    * engines (parquet carries nanos, Spark keeps micros — comparisons
    * must happen at a shared granularity). DuckDB oracle uses its
    * native ASOF LEFT JOIN.
    */
  def q31_asof_join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = load(spark, dir, "events")
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", date_trunc("second", $"ts").as("cts"))
      .agg(max($"event_id").as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", date_trunc("second", $"ts").as("pts"),
        $"event_id".as("purchase_id"))
    graft.operators.AsOfJoin.asOf(purchases, clicks, "user_id", "pts", "cts")
      .select($"purchase_id", $"user_id",
        unix_timestamp($"pts").as("purchase_ts_s"),
        $"matched.click_id".as("click_id"),
        unix_timestamp($"matched.cts").as("click_ts_s"))
      .orderBy($"purchase_id")
  }

  /** Pivot (heatmap in matrix form, README.md:124): hours × ISO
    * weekday columns. Values pinned to 1..7 so the output schema is
    * static (no extra distinct-scan, required at scale); absent cells
    * coalesce to 0 to match the SQL conditional-aggregation oracle.
    */
  def q32_pivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pivoted = load(spark, dir, "events")
      .groupBy(hour($"ts").as("hh"))
      .pivot(weekday($"ts") + 1, 1 to 7)
      .agg(count(lit(1)))
    pivoted.select(($"hh" +: (1 to 7).map(d => coalesce(col(s"$d"), lit(0L)).as(s"d$d"))): _*)
      .orderBy($"hh")
  }

  /** ROLLUP hierarchy totals: (type, dow) → (type) → grand total,
    * with GROUPING flags disambiguating the subtotal rows.
    */
  def q33_rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "events")
      .select($"event_type", (weekday($"ts") + 1).as("isodow"), cents($"value").as("cents"))
      .rollup($"event_type", $"isodow")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"),
        (grouping($"event_type") * 2 + grouping($"isodow")).as("lvl"))
      .orderBy($"lvl", $"event_type", $"isodow")
  }

  /** F5 CONVERT_TIMEZONE parity (gtfs_silver.py:15): UTC instants →
    * Paris wall-clock (DST-correct via IANA tzdata on both engines),
    * aggregated by Paris hour. The oracle anchors both conversion
    * steps explicitly (`timezone('UTC', ts)` then Paris) so neither
    * engine's session timezone can leak in.
    */
  def q36_tz_convert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "events")
      .withColumn("paris_ts", from_utc_timestamp($"ts", "Europe/Paris"))
      .groupBy(hour($"paris_ts").as("paris_hh"))
      .agg(count(lit(1)).as("n"),
        min(unix_timestamp($"paris_ts")).as("min_paris_s"),
        max(unix_timestamp($"paris_ts")).as("max_paris_s"))
      .orderBy($"paris_hh")
  }

  /** Sessionization (gaps-and-islands): a new session starts after a
    * 30-minute silence; session id = running count of session starts.
    * Two windows over the same (user, time) partitioning — one
    * shuffle, state O(1) per row. The batch analog of streaming
    * session windows.
    */
  def q37_sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"t")
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    load(spark, dir, "events")
      .select($"user_id", date_trunc("second", $"ts").as("t"))
      .withColumn("prev", lag($"t", 1).over(byUser))
      .withColumn("is_new",
        when($"prev".isNull ||
          unix_timestamp($"t") - unix_timestamp($"prev") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum($"is_new").over(running))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min(unix_timestamp($"t")).as("session_start_s"),
        (max(unix_timestamp($"t")) - min(unix_timestamp($"t"))).as("duration_s"))
      .orderBy($"user_id", $"session_id")
  }

  /** q72 — error-burst detection (gaps-and-islands): maximal runs of
    * ≥ 3 consecutive `error` events per user, where a run survives
    * only if nothing intervenes and each step is ≤ 1 day after
    * the previous event. The batch dual of the custom-state streaming
    * detector (`streaming/StatefulBursts` — flatMapGroupsWithState);
    * StatefulBurstsSpec asserts the two agree on the same rows.
    *
    * Scale: one shuffle on the high-cardinality user_id for the
    * window pass, then a partial+final agg on (user, run) — the
    * standard islands plan; no self-join.
    */
  def q72_error_bursts(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StatefulBursts.burstsBatch(load(spark, dir, "events"))

  /** q76 — GLOBAL row numbering the scale-safe way. The naive
    * formulation — `row_number().over(Window.orderBy(...))` with no
    * partitionBy — funnels the entire table through ONE partition
    * (Spark even warns); at 100 TB that's the job-killing anti-plan.
    * The distributed total order instead: range-repartition on the
    * sort key (sampled boundaries → balanced partitions), sort within
    * partitions, then `zipWithIndex` — which runs one lightweight
    * count job over partition SIZES (a Long per partition reaches the
    * driver, never data) and assigns offsets per partition in a
    * second pass. This is the documented legitimate RDD drop-down:
    * per-partition imperative indexing the relational API can't
    * express without the single-partition window.
    *
    * Output rank is deterministic whatever boundaries the range
    * sampler picks, because (ts_s, event_id) is a unique total order.
    */
  def q76_global_rank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sorted = load(spark, dir, "events")
      .filter($"event_type" === "purchase")
      .select($"event_id", epochS($"ts").as("ts_s"), cents($"value").as("value_cents"))
      .repartitionByRange(32, $"ts_s", $"event_id")
      .sortWithinPartitions($"ts_s", $"event_id")
    sorted.as[(Long, Long, Long)].rdd.zipWithIndex()
      .map { case ((id, tsS, cents), i) => (id, tsS, cents, i + 1) }
      .toDF("event_id", "ts_s", "value_cents", "global_rank")
      .orderBy($"global_rank")
  }

  /** q77 — ordered funnel analysis: how many users progress through
    * view → click → purchase IN ORDER (a later-stage event only
    * counts after the user's first previous-stage event). Each stage
    * is a filtered partial+final min-aggregate on user_id followed by
    * an equi-join back — the joins stay on the same high-cardinality
    * key, so at scale all three stages co-partition and the "funnel"
    * never materializes per-user event lists.
    */
  def q77_funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = load(spark, dir, "events")
      .select($"user_id", $"event_type", epochS($"ts").as("t"))
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"t").as("v_t"))
    val c = e.filter($"event_type" === "click").join(v, "user_id")
      .filter($"t" > $"v_t")
      .groupBy($"user_id").agg(min($"t").as("c_t"))
    val p = e.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"t" > $"c_t")
      .groupBy($"user_id").agg(min($"t").as("p_t"))
    v.agg(count(lit(1)).as("n_users")).select(lit(1L).as("stage"), lit("view").as("name"), $"n_users")
      .union(c.agg(count(lit(1)).as("n_users"))
        .select(lit(2L).as("stage"), lit("click").as("name"), $"n_users"))
      .union(p.agg(count(lit(1)).as("n_users"))
        .select(lit(3L).as("stage"), lit("purchase").as("name"), $"n_users"))
      .orderBy($"stage")
  }

  /** q78 — retention cohorts: users grouped by first-activity week,
    * matrix of (cohort_week, activity_week, active users). Two
    * aggregations and one join, all keyed on user_id / week — the
    * cohort dimension never exceeds |weeks|², and the user table is
    * touched once for the cohort assignment (partial+final min).
    */
  def q78_retention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val act = load(spark, dir, "events")
      .select($"user_id", unix_timestamp(date_trunc("week", $"ts")).as("week_s"))
      .distinct()
    val cohort = act.groupBy($"user_id").agg(min($"week_s").as("cohort_s"))
    act.join(cohort, "user_id")
      .groupBy($"cohort_s", $"week_s")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"cohort_s", $"week_s")
  }

  /** q79 — time-series resample + gap-fill: project each user's
    * purchase history onto an hourly grid between their first and
    * last observation, forward-filling the last known value (the
    * as-of resampling every feature/observability pipeline needs).
    * The grid is a bounded `sequence` explode per user — fan-out is
    * |user's span in hours|, never a cross join against a calendar
    * table — and the fill is `last(ignoreNulls)` over a running frame
    * partitioned by the high-cardinality user key.
    */
  def q79_gap_fill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = load(spark, dir, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id", unix_timestamp(date_trunc("hour", $"ts")).as("h"),
        $"ts", $"event_id", cents($"value").as("cents"))
    val wHour = Window.partitionBy($"user_id", $"h").orderBy($"ts".desc, $"event_id".desc)
    val hv = p.withColumn("rn", row_number().over(wHour))
      .filter($"rn" === 1).select($"user_id", $"h", $"cents")
    val grid = p.groupBy($"user_id").agg(min($"h").as("mn"), max($"h").as("mx"))
      .select($"user_id", explode(sequence($"mn", $"mx", lit(3600L))).as("h"))
    val fill = Window.partitionBy($"user_id").orderBy($"h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hv, Seq("user_id", "h"), "left")
      .select($"user_id", $"h".as("hour_s"),
        last($"cents", ignoreNulls = true).over(fill).as("cents_filled"),
        $"cents".isNotNull.as("observed"))
      .orderBy($"user_id", $"hour_s")
  }

  /** Exact percentiles (linear interpolation — same formula as
    * DuckDB's quantile_cont), centi-rounded to absorb 1-ulp
    * interpolation differences.
    */
  def q38_percentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "events")
      .select($"event_type", cents($"value").as("cents"))
      .groupBy($"event_type")
      .agg(
        round(percentile($"cents", lit(0.5)) * 100).cast("long").as("p50_centi"),
        round(percentile($"cents", lit(0.9)) * 100).cast("long").as("p90_centi"),
        round(percentile($"cents", lit(0.99)) * 100).cast("long").as("p99_centi"))
      .orderBy($"event_type")
  }

  /** q64 — sample-based quantile estimation: the mergeable path to
    * percentiles at 100 TB. The sampler is a stateless md5-threshold
    * filter (10% keep), so it composes under any partitioning, retry,
    * or union — merging two sampled partitions IS the sampled merge,
    * unlike an exact percentile whose state is the whole value set.
    * The exact per-group percentile then runs on the bounded sample.
    * Exact p50 over the full data rides along to show sampling error.
    */
  def q64_sampled_quantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = load(spark, dir, "events")
      .select($"event_id", $"event_type", cents($"value").as("cents"))
    val sampled = ev.filter(
      conv(substring(md5(concat(lit("s"), $"event_id")), 1, 15), 16, 10)
        .cast("long") % 100 < 10)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_sampled"),
        round(percentile($"cents", lit(0.5)) * 100).cast("long").as("p50_centi"),
        round(percentile($"cents", lit(0.9)) * 100).cast("long").as("p90_centi"))
    val exact = ev.groupBy($"event_type")
      .agg(round(percentile($"cents", lit(0.5)) * 100).cast("long").as("p50_exact_centi"))
    sampled.join(broadcast(exact), "event_type")
      .select($"event_type", $"n_sampled", $"p50_centi", $"p90_centi",
        $"p50_exact_centi")
      .orderBy($"event_type")
  }

  /** Statistical aggregates (stddev/corr) — rounded to fixed points
    * coarse enough that the engines' different accumulation algorithms
    * (Welford vs two-pass) can't flip a digit.
    */
  def q40_stats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // stddev and correlation from EXACT integer sums (one identically-
    // evaluated double tree per statistic, mirrored in the oracle) —
    // the builtin `corr` raises ANSI DIVIDE_BY_ZERO on a zero-variance
    // column (degenerate-probe finding) and its internal streaming
    // merge is not bit-portable anyway; zero-variance/singleton
    // degenerates report NULL, matching SQL aggregate conventions.
    // ALL integer accumulations — first-order sums included — run in
    // decimal(38,0) (the q285/q278 pattern): user_id reaches ~1e9 at
    // sf1.0 (Sf1Gen round offsets), so uid² per-TERM is ~1e18 and any
    // Long accumulation wraps after a handful of rows, while the
    // first-order SUM(user_id) itself wraps int64 around ~9e9 rows per
    // group — decimal holds every term to ~1e38 (≈sf100 for the
    // second-order terms, far beyond for the first-order ones) and
    // narrows to double once, exactly rounded, in both engines.
    val d38 = "decimal(38,0)"
    load(spark, dir, "events")
      .select($"event_type", $"user_id", cents($"value").as("c"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"c".cast(d38)).as("sc"),
        sum($"c".cast(d38) * $"c").as("scc"),
        sum($"user_id".cast(d38)).as("su"),
        sum($"user_id".cast(d38) * $"user_id").as("suu"),
        sum($"c".cast(d38) * $"user_id").as("scu"))
      .select($"event_type",
        when($"n" > 1L,
          round(sqrt(($"n".cast(d38) * $"scc" - $"sc".cast(d38) * $"sc")
            .cast("double")
            / ($"n".cast("double") * ($"n" - 1L)))).cast("long"))
          .otherwise(lit(null).cast("long")).as("sd"),
        when($"n".cast(d38) * $"scc" - $"sc".cast(d38) * $"sc" > 0 &&
            $"n".cast(d38) * $"suu" - $"su".cast(d38) * $"su" > 0,
          round(lit(1e6) * ($"n".cast(d38) * $"scu" - $"sc".cast(d38) * $"su")
            .cast("double")
            / sqrt(($"n".cast(d38) * $"scc" - $"sc".cast(d38) * $"sc")
              .cast("double")
              * ($"n".cast(d38) * $"suu" - $"su".cast(d38) * $"su")
                .cast("double"))).cast("long"))
          .otherwise(lit(null).cast("long")).as("cr"),
        $"n")
      .orderBy($"event_type")
  }

  /** GROUPING SETS beyond ROLLUP's prefix hierarchy (q33): the
    * (type, dow) detail plus BOTH standalone marginals and the grand
    * total in one pass — Catalyst expands to a single Expand + one
    * aggregate, not four scans. Integer sums keep every grouping
    * combination order-independent at any parallelism.
    */
  def q47_grouping_sets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "events")
      .select($"event_type", (weekday($"ts") + 1).as("isodow"), cents($"value").as("c"))
      .createOrReplaceTempView("events_gs_v")
    spark.sql(
      """SELECT event_type, isodow, COUNT(*) AS n,
        |  SUM(c) AS sum_cents,
        |  CAST(GROUPING(event_type) * 2 + GROUPING(isodow) AS INT) AS lvl
        |FROM events_gs_v
        |GROUP BY GROUPING SETS ((event_type, isodow), (event_type), (isodow), ())
        |ORDER BY lvl, event_type, isodow""".stripMargin)
  }

  /** Event-time RANGE-frame window: per user, activity in the
    * trailing hour of each event (count + exact cents sum). The frame
    * bounds are integer epoch seconds, so the peer set is identical
    * across engines; the window partitions on the high-cardinality
    * user_id.
    */
  def q48_range_window(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "events")
      .select($"event_id", $"user_id",
        unix_timestamp(date_trunc("second", $"ts")).as("ts_s"),
        cents($"value").as("c"))
      .createOrReplaceTempView("events_rw_v")
    spark.sql(
      """SELECT event_id, user_id, ts_s,
        |  COUNT(*) OVER w AS n_1h, SUM(c) OVER w AS sum_cents_1h
        |FROM events_rw_v
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)
  }

  /** Top-k per group through the native bounded-heap operator
    * (graft.plans.TopKPerGroup — custom LogicalPlan + Strategy +
    * SparkPlan): top-3 events by value per user. The window
    * formulation sorts every user's full event set; this plan keeps
    * 3-row heaps, shuffles only the per-map-partition survivors, and
    * never materializes a full sort. The oracle IS the window
    * formulation — semantics must match exactly (ties broken by
    * event_id, a total order).
    */
  def q57_topk_native(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = load(spark, dir, "events")
      .select($"user_id", $"event_id", $"value")
    graft.plans.TopKPerGroup.topK(ev, Seq("user_id"),
        Seq($"value".desc, $"event_id".asc), k = 3)
      .select($"user_id", $"rank", $"event_id",
        round($"value" * 100).cast("long").as("value_cents"))
      .orderBy($"user_id", $"rank")
  }

  /** q88 — incremental aggregate maintenance: the 100 TB pattern for
    * keeping a rollup fresh without rescanning history. Both halves
    * (cold base, hot delta) reduce to ALGEBRAIC partials (count, sum,
    * min, max) whose union re-aggregates to exactly the full-scan
    * answer; avg derives from sum/count at the end (never averaged
    * across partials). The oracle is the full recompute — equality IS
    * the maintenance invariant. At scale the base partial is a stored
    * table and only the delta scan runs per refresh.
    */
  def q88_incremental_agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = load(spark, dir, "orders")
      .select($"o_orderpriority", cents($"o_totalprice").as("c"), $"o_orderdate")
    def partial(df: DataFrame): DataFrame = df
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum($"c").as("s"),
        min($"c").as("mn"), max($"c").as("mx"))
    val base = partial(o.filter($"o_orderdate" < lit("1997-01-01")))
    val delta = partial(o.filter($"o_orderdate" >= lit("1997-01-01")))
    base.unionByName(delta)
      .groupBy($"o_orderpriority")
      .agg(sum($"n").as("n_orders"), sum($"s").as("sum_cents"),
        min($"mn").as("min_cents"), max($"mx").as("max_cents"))
      .withColumn("avg_cents",
        round($"sum_cents".cast("double") / $"n_orders").cast("long"))
      .orderBy($"o_orderpriority")
  }

  /** q90 — deterministic k-per-group sampling: row_number over a
    * salted md5 hash order. Statistically a uniform without-replacement
    * k-sample per group, but reproducible across runs, retries, and
    * engines — the property a 100 TB pipeline needs for debuggable
    * eval sets (a true reservoir sample differs per execution). The
    * hash is the engine-independent 60-bit md5 prefix used across this
    * library (Spark conv == DuckDB 0x-cast). Though written as the
    * standard row_number()≤k window idiom, RankLimitRewrite plans it
    * as PartialTopK→FinalTopK bounded heaps (spec-pinned) — per-group
    * state is k rows however large the group, so the sample scales to
    * arbitrarily hot groups.
    */
  def q90_group_sample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hk = conv(substring(md5(concat(lit("g"), $"event_id".cast("string"))), 1, 15),
      16, 10).cast("long")
    load(spark, dir, "events")
      .select($"event_type", $"event_id").withColumn("hk", hk)
      .withColumn("rn", row_number()
        .over(Window.partitionBy($"event_type").orderBy($"hk", $"event_id"))
        .cast("long"))
      .filter($"rn" <= 5)
      .select($"event_type", $"rn", $"event_id")
      .orderBy($"event_type", $"rn")
  }

  /** q91 — first-order Markov transition matrix over per-user event
    * sequences: P(next event type | current) in basis points. One
    * window pass keyed on the high-cardinality user_id for the lag,
    * then a tiny |types|² aggregate; the normalizing sum is a window
    * over that tiny matrix, never over the event stream. Sequence
    * order is (epoch second, event_id) — a total order both engines
    * agree on (raw ns timestamps do not round-trip, Tables.scala).
    */
  def q91_markov(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val seq = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    load(spark, dir, "events")
      .select($"user_id", epochS($"ts").as("t"), $"event_id", $"event_type")
      .withColumn("prev", lag($"event_type", 1).over(seq))
      .filter($"prev".isNotNull)
      .groupBy($"prev", $"event_type").agg(count(lit(1)).as("n"))
      .withColumn("p_bp", round(lit(10000) * $"n" /
        sum($"n").over(Window.partitionBy($"prev"))).cast("long"))
      .select($"prev".as("from_type"), $"event_type".as("to_type"), $"n", $"p_bp")
      .orderBy($"from_type", $"to_type")
  }

  /** q97 — rolling 7-day distinct users (rolling DAU/WAU): COUNT
    * (DISTINCT) over a sliding frame, which no engine's window
    * operator supports directly. The scalable formulation: reduce the
    * stream to the distinct (day, user) set FIRST (one shuffle —
    * typically orders of magnitude smaller than the event stream),
    * then fan each day-user pair out to the ≤ 7 window anchors it
    * contributes to (a bounded explode, the q79 grid idea), and
    * count-distinct per anchor day. Fan-out is 7×|distinct pairs|,
    * never 7×|events|.
    */
  def q97_rolling_distinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val day = 86400L
    val du = load(spark, dir, "events")
      .filter($"event_type" === "purchase")
      .select(unix_timestamp(date_trunc("day", $"ts")).as("d"), $"user_id")
      .distinct()
    val days = du.select($"d").distinct()
    du.withColumn("anchor", explode(sequence($"d", $"d" + lit(6 * day), lit(day))))
      .join(days.select($"d".as("anchor")), "anchor") // only real days
      .groupBy($"anchor")
      .agg(countDistinct($"user_id").as("users_7d"))
      .select($"anchor".as("day_s"), $"users_7d")
      .orderBy($"day_s")
  }

  /** q98 — dense reporting grid with zero-fill: every (day, event
    * type) cell even when no event occurred — the shape dashboards
    * and downstream diff jobs need. The cross join multiplies two
    * BOUNDED dimension sets (days × types), never fact rows; actual
    * counts left-join in and coalesce to zero.
    */
  def q98_dense_grid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = load(spark, dir, "events")
      .select(unix_timestamp(date_trunc("day", $"ts")).as("d"), $"event_type")
    val counts = e.groupBy($"d", $"event_type").agg(count(lit(1)).as("n"))
    val days = e.select($"d").distinct()
    val types = e.select($"event_type").distinct()
    days.crossJoin(types)
      .join(counts, Seq("d", "event_type"), "left")
      .select($"d".as("day_s"), $"event_type",
        coalesce($"n", lit(0L)).as("n"))
      .orderBy($"day_s", $"event_type")
  }

  /** q100 — robust outlier detection (median / MAD): the
    * distribution-free anomaly flag that survives the skew that wrecks
    * mean/stddev z-scores. Two bounded stat passes — per-group median,
    * then median absolute deviation — each a tiny aggregate broadcast
    * back to the stream; the outlier test is a map-side comparison.
    * Exact percentile is the deliberate choice here (the robust-stats
    * contract); q64's mergeable sampled path is the open-scale
    * variant when |group| exceeds sort reach.
    */
  def q100_robust_outliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = load(spark, dir, "events")
      .select($"event_type", cents($"value").as("c"))
    val med = ev.groupBy($"event_type")
      .agg(percentile($"c", lit(0.5)).as("med"))
    val withMed = ev.join(broadcast(med), "event_type")
    val mad = withMed
      .groupBy($"event_type")
      .agg(percentile(abs($"c" - $"med"), lit(0.5)).as("mad"))
    withMed.join(broadcast(mad), "event_type")
      .groupBy($"event_type")
      .agg(
        round(max($"med") * 100).cast("long").as("med_centi"),
        round(max($"mad") * 100).cast("long").as("mad_centi"),
        sum(when(abs($"c" - $"med") > $"mad" * 5, 1L).otherwise(0L))
          .as("n_outliers"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  /** q101 — time-weighted average (TWAP): per-user purchase value
    * integrated over holding time — the observability/finance
    * aggregate where arithmetic means lie. One lead() pass on the
    * high-cardinality user key; the integral's numerator stays exact
    * 64-bit (cents × seconds), one final double divide.
    */
  def q101_twap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    load(spark, dir, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id", epochS($"ts").as("t"), $"event_id", cents($"value").as("c"))
      .withColumn("t_next", lead($"t", 1).over(w))
      .filter($"t_next".isNotNull)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_segments"),
        sum($"c" * ($"t_next" - $"t")).as("num"),
        sum($"t_next" - $"t").as("den"))
      .filter($"den" > 0)
      .select($"user_id", $"n_segments",
        round(lit(100.0) * $"num" / $"den").cast("long").as("twap_centicents"))
      .orderBy($"user_id")
  }

  /** q104 — group-wise least-squares trend (slope/intercept): is each
    * event type's value drifting over time? Computed from the five
    * algebraic sums (n, Σx, Σy, Σxy, Σx²) — one partial+final
    * aggregate, mergeable across any partitioning, the same shape
    * DuckDB's regr_slope uses. All sums stay exact 64-bit (x = days
    * since epoch, y = cents); the only floats are the two final
    * divides, in a fixed expression tree. Slope is cents/day ×1e6.
    */
  def q104_trend(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = load(spark, dir, "events")
      .select($"event_type",
        (epochS($"ts") / lit(86400L)).cast("long").as("x"),
        cents($"value").as("y"))
    // cross products n·sxx, sx², n·sxy, sx·sy exceed int64 at ~5e5
    // rows/group (x ≈ 19 700 days: n·sxx ≈ 9.7e19 — overflowed live
    // at sf1.0, round 15): the q40 treatment — exact decimal(38,0)
    // products, double only for the two closing divides (both
    // engines cast the SAME exact integer, so the doubles agree)
    val d = ($"n".cast("decimal(38,0)") * $"sxx" -
      $"sx".cast("decimal(38,0)") * $"sx")
    val num = ($"n".cast("decimal(38,0)") * $"sxy" -
      $"sx".cast("decimal(38,0)") * $"sy")
    ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      // single-day (or otherwise x-constant) series: the slope is
      // undefined (zero x-variance) — report slope 0 with the mean as
      // intercept instead of an ANSI division error (degenerate-probe
      // finding; mirrored in the oracle)
      .select($"event_type", $"n",
        when(d =!= 0,
          round(lit(1e6) * num.cast("double") / d.cast("double"))
            .cast("long"))
          .otherwise(0L).as("slope_e6"),
        when(d =!= 0,
          round(($"sy" - num.cast("double") / d.cast("double") * $"sx")
            / $"n").cast("long"))
          .otherwise(round($"sy".cast("double") / $"n").cast("long"))
          .as("intercept_cents"))
      .orderBy($"event_type")
  }

  /** q105 — period-over-period comparison (WoW deltas): weekly sums
    * per event type with previous-week lag and change in basis
    * points — the dashboard staple. The lag window runs over the tiny
    * (type, week) aggregate, never the event stream.
    */
  def q105_week_over_week(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wk = load(spark, dir, "events")
      .groupBy($"event_type",
        unix_timestamp(date_trunc("week", $"ts")).as("week_s"))
      .agg(sum(cents($"value")).as("sum_cents"))
    val w = Window.partitionBy($"event_type").orderBy($"week_s")
    wk.withColumn("prev_cents", lag($"sum_cents", 1).over(w))
      .withColumn("delta_bp",
        when($"prev_cents".isNotNull && $"prev_cents" =!= 0,
          round(lit(10000.0) * ($"sum_cents" - $"prev_cents") / $"prev_cents")
            .cast("long")))
      .orderBy($"event_type", $"week_s")
  }

  /** q109 — tumbling event-time windows in batch: the EXACT transform
    * the streaming path runs (graft.streaming.WindowedCounts.transform
    * — Structured Streaming's batch/stream unification), driven
    * through the correctness gate. `window()` compiles to a bucket projection
    * + plain aggregate; no state, no sort.
    */
  def q109_tumbling_windows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.streaming.WindowedCounts
      .transform(load(spark, dir, "events"), "10 minutes")
      .orderBy($"window_s", $"event_type")
  }

  /** q167 — SLIDING (hopping) window aggregate: 30-minute windows
    * advancing every 10 — each event lands in exactly 3 overlapping
    * windows, the smoothing shape dashboards use when tumbling edges
    * are too jumpy. Spark's `window(ts, len, slide)` plans this as a
    * 3-way Expand before the one aggregate (fan-out = len/slide, a
    * constant — never a self-join); the oracle replays the same
    * epoch-aligned window arithmetic with a bounded series explode.
    * Completes the window-shape family: tumbling q109, session q168,
    * sliding here.
    */
  def q167_sliding_window(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "events")
      .groupBy(window($"ts", "30 minutes", "10 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sum(cents($"value")).as("sum_cents"))
      .select(unix_timestamp($"w.start").as("window_s"), $"event_type",
        $"n", $"sum_cents")
      .orderBy($"window_s", $"event_type")
  }

  /** q168 — native `session_window` in batch: per-user activity
    * sessions with a 30-minute inactivity gap, via the SAME built-in
    * that runs the streaming form (streaming/EventSessions) — pinned
    * here against the classic SQL rewrite (lag → gap flag → running
    * sum island id), which is exactly what the DuckDB oracle runs.
    * One shuffle on the user key; Spark merges sessions inside each
    * partition without materializing per-user event lists.
    */
  def q168_session_native(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    load(spark, dir, "events")
      .groupBy(session_window($"ts", "30 minutes").as("s"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        (unix_timestamp(max($"ts")) - unix_timestamp(min($"ts"))).as("span_s"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum($"n_events").as("n_events"),
        sum($"span_s").as("sum_span_s"))
      .orderBy($"user_id")
  }

  /** q175 — CUSUM drift detection: the sequential change-detector for
    * a daily KPI series — c_t = max(0, c_{t−1} + (x_t − target − k)),
    * alarm while c_t > h. The clamp makes it window-inexpressible
    * (q166's argument), but the series is BOUNDED (days × types), so
    * the whole detector is one bounded collect + deterministic
    * sort_array + in-row fold per type (q169's max-plus machinery) —
    * no recursion rounds, no state store. Target/slack/threshold are
    * integer cents derived per type (slack 5%, threshold 20% of
    * target). Output: per type, the peak CUSUM and alarm-day count.
    */
  def q175_cusum_drift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = load(spark, dir, "events")
      .groupBy($"event_type",
        unix_timestamp(date_trunc("day", $"ts")).as("day_s"))
      .agg(expr("sum(cast(round(value * 100) as bigint)) div count(1)").as("x"))
    val target = daily.groupBy($"event_type")
      .agg(expr("sum(x) div count(1)").as("target_c"),
        count(lit(1)).as("n_days"))
    daily.groupBy($"event_type")
      .agg(sort_array(collect_list(struct($"day_s", $"x"))).as("xs"))
      .join(broadcast(target), "event_type")
      .select($"event_type", $"n_days", $"target_c",
        aggregate($"xs",
          struct(lit(0L).as("c"), lit(0L).as("maxc"), lit(0L).as("alarms")),
          (acc, e) => {
            val step = acc("c") + e("x") - $"target_c" -
              expr("target_c div 20")
            val c = greatest(step, lit(0L))
            struct(c.as("c"), greatest(acc("maxc"), c).as("maxc"),
              (acc("alarms") +
                when(c > expr("target_c div 5"), 1L).otherwise(0L)).as("alarms"))
          }).as("r"))
      .select($"event_type", $"n_days", $"target_c",
        $"r.maxc".as("max_cusum_c"), $"r.alarms".as("n_alarm_days"))
      .orderBy($"event_type")
  }

  /** q176 — maximum drawdown of the DETRENDED revenue curve: raw
    * cumulative revenue is monotone (daily cents are positive), so
    * its drawdown is trivially zero — the informative curve is the
    * cumulative deviation from the type's mean daily revenue, whose
    * drawdown is the worst below-trend stretch ("how far behind plan
    * did we fall, peak to trough"). Window-expressible, unlike the
    * clamped family (q175): running sum → running max → max gap,
    * three frames over the bounded (type, day) aggregate partitioned
    * by type; target and curve in exact integer cents.
    */
  def q176_max_drawdown(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = load(spark, dir, "events")
      .groupBy($"event_type",
        unix_timestamp(date_trunc("day", $"ts")).as("day_s"))
      .agg(sum(cents($"value")).as("c"))
    val target = daily.groupBy($"event_type")
      .agg(expr("sum(c) div count(1)").as("target_c"))
    val run = Window.partitionBy($"event_type").orderBy($"day_s")
      .rowsBetween(Window.unboundedPreceding, 0)
    daily.join(broadcast(target), "event_type")
      .withColumn("cum", sum($"c" - $"target_c").over(run))
      .withColumn("peak", greatest(max($"cum").over(run), lit(0L)))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        max($"peak" - $"cum").as("max_drawdown_c"),
        max($"cum").as("peak_c"))
      .orderBy($"event_type")
  }

  /** q177 — distribution similarity via histogram intersection: how
    * alike are two segments' order-value distributions, in basis
    * points — the cohort-comparison readout behind "can I pool these
    * populations". Each segment reduces to a bounded cents-histogram
    * (25k-unit bins); pairwise overlap = Σ min of NORMALIZED bin
    * masses, kept exact by cross-multiplying counts instead of
    * dividing early. Output is the bounded segment-pair matrix.
    */
  def q177_histogram_overlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val binned = load(spark, dir, "orders")
      .join(broadcast(load(spark, dir, "customer")
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment".as("seg"),
        expr("cast(round(o_totalprice * 100) as bigint) div 2500000").as("bin"))
      .groupBy($"seg", $"bin").agg(count(lit(1)).as("n"))
    val totals = binned.groupBy($"seg").agg(sum($"n").as("tot"))
    val h = binned.join(broadcast(totals), "seg")
    h.as("a").join(h.as("b"),
        $"a.bin" === $"b.bin" && $"a.seg" < $"b.seg")
      .groupBy($"a.seg".as("seg_a"), $"b.seg".as("seg_b"),
        $"a.tot".as("tot_a"), $"b.tot".as("tot_b"))
      .agg(sum(least($"a.n" * $"b.tot", $"b.n" * $"a.tot")).as("num"))
      .select($"seg_a", $"seg_b",
        round(lit(10000.0) * $"num" / ($"tot_a" * $"tot_b"))
          .cast("long").as("overlap_bp"))
      .orderBy($"seg_a", $"seg_b")
  }

  /** q113 — winsorized mean: clamp each group's values to its
    * [p5, p95] band, then average — the outlier-robust mean that
    * keeps sample size (unlike trimming). Same two-pass shape as
    * q100: a bounded percentile aggregate broadcasts back, the clamp
    * is map-side, one final aggregate. Output in centicents so the
    * interpolated clamp survives engine-exact rounding.
    */
  def q113_winsorized_mean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = load(spark, dir, "events")
      .select($"event_type", cents($"value").as("c"))
    val bands = ev.groupBy($"event_type")
      .agg(percentile($"c", lit(0.05)).as("lo"),
        percentile($"c", lit(0.95)).as("hi"))
    ev.join(broadcast(bands), "event_type")
      .select($"event_type",
        least(greatest($"c".cast("double"), $"lo"), $"hi").as("w"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        round(avg($"w") * 100).cast("long").as("wmean_centi"))
      .orderBy($"event_type")
  }

  /** q115 — chi-square test of independence between two categorical
    * columns (market segment × order priority): the contingency table
    * is one aggregate over the joined facts; marginals and the
    * statistic derive from that |segments|×|priorities| table, so the
    * heavy data is touched once (the contingency table is cached —
    * its four consumers, marginals/total/statistic, would otherwise
    * each re-run the orders join) and the statistical machinery runs
    * on a bounded frame. The grand total folds in-plan via a
    * broadcast 1-row aggregate (the q42/q46 idiom) instead of a
    * separate driver action. Expected counts and the statistic use a
    * fixed float expression tree; the ~25-term sum is far inside
    * double precision at e6 rounding.
    */
  def q115_chi_square(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val obs = graft.Caches.tracked(load(spark, dir, "orders")
      .join(broadcast(load(spark, dir, "customer")
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"o_orderpriority")
      .agg(count(lit(1)).as("o")))
    val rowT = obs.groupBy($"c_mktsegment").agg(sum($"o").as("rt"))
    val colT = obs.groupBy($"o_orderpriority").agg(sum($"o").as("ct"))
    val tot = obs.agg(sum($"o").cast("double").as("n_total"))
    obs.join(broadcast(rowT), "c_mktsegment")
      .join(broadcast(colT), "o_orderpriority")
      .crossJoin(broadcast(tot))
      .withColumn("exp", $"rt" * $"ct" / $"n_total")
      .agg(
        count(lit(1)).as("n_cells"),
        round(sum(($"o" - $"exp") * ($"o" - $"exp") / $"exp") * 1e6)
          .cast("long").as("chi2_e6"))
      .select($"n_cells", $"chi2_e6")
  }

  /** q117 — spend concentration per market segment: Gini coefficient
    * (2Σr·x / nΣx − (n+1)/n over ascending ranks) and top-10-customer
    * revenue share. The fact table reduces to per-(segment, customer)
    * cents in one shuffle — but the ranks do NOT run in a
    * segment-partitioned window (|segments| = 5 groups each funneling
    * its full customer set through one task, the exact
    * low-cardinality trap `PlanLint.lintGroupedWindows` flags):
    *
    *  - the ascending rank exists only inside Σ r·x, which is
    *    tie-permutation-invariant (a tie group at spend x contributes
    *    x·Σ of a consecutive rank run whatever the order within the
    *    tie), so it is computed with the two-phase range-partitioned
    *    prefix scan (`llm.DataPrep.groupedPrefixSum` — segments SPAN
    *    partitions; parallelism is data-sized, not 5);
    *  - the top-10 cut is a bounded-heap top-k per segment
    *    (`TopKPerGroup`): per-partition 10-row heaps before the
    *    shuffle, never a segment-wide sort.
    *
    * Rank·spend sums stay exact 64-bit; the two final ratios are
    * fixed-tree doubles rounded to e6/bp.
    */
  def q117_concentration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val spend = graft.Caches.tracked(load(spark, dir, "orders")
      .join(broadcast(load(spark, dir, "customer")
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"c_custkey")
      .agg(sum(cents($"o_totalprice")).as("x")))
    val ranked = graft.llm.DataPrep.groupedPrefixSum(
      spend.select($"c_mktsegment", $"x".as("id"), lit(1L).as("w")),
      "c_mktsegment", "id", "w")
    val gini = ranked.groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        sum($"id").as("total"),
        sum(($"cum0" + lit(1L)) * $"id").as("rx"))
    val top10 = graft.plans.TopKPerGroup.topK(spend, Seq("c_mktsegment"),
        Seq($"x".desc, $"c_custkey".asc), 10, "rd")
      .groupBy($"c_mktsegment").agg(sum($"x").as("top10"))
    gini.join(broadcast(top10), Seq("c_mktsegment"))
      .select($"c_mktsegment", $"n_customers",
        round((lit(2.0) * $"rx" / ($"n_customers" * $"total")
          - ($"n_customers" + lit(1L)).cast("double") / $"n_customers") * 1e6)
          .cast("long").as("gini_e6"),
        round(lit(10000.0) * $"top10" / $"total").cast("long").as("top10_share_bp"))
      .orderBy($"c_mktsegment")
  }

  /** q118 — two-proportion z-test over a deterministic 50/50
    * experiment split (user_id parity = assignment, so the test is
    * reproducible): purchase rate per arm, pooled-variance z. One
    * aggregate over the events scan; the statistic is arithmetic on
    * four longs. sqrt is IEEE-exact, the tree is fixed, so z_e6 is
    * engine-identical.
    */
  def q118_ab_ztest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val arms = load(spark, dir, "events")
      .select(($"user_id" % 2).cast("long").as("arm"),
        ($"event_type" === "purchase").cast("long").as("conv"))
      .groupBy($"arm")
      .agg(count(lit(1)).as("n"), sum($"conv").as("k"))
    val w = arms.select(
      sum(when($"arm" === 0, $"n")).as("n0"), sum(when($"arm" === 0, $"k")).as("k0"),
      sum(when($"arm" === 1, $"n")).as("n1"), sum(when($"arm" === 1, $"k")).as("k1"))
    w.select(
        $"n0", $"k0", $"n1", $"k1",
        round(lit(10000.0) * $"k0" / $"n0").cast("long").as("rate0_bp"),
        round(lit(10000.0) * $"k1" / $"n1").cast("long").as("rate1_bp"),
        round(
          (($"k0".cast("double") / $"n0") - ($"k1".cast("double") / $"n1")) /
            sqrt((($"k0" + $"k1").cast("double") / ($"n0" + $"n1")) *
              (lit(1.0) - ($"k0" + $"k1").cast("double") / ($"n0" + $"n1")) *
              (lit(1.0) / $"n0" + lit(1.0) / $"n1")) * 1e6)
          .cast("long").as("z_e6"))
  }

  /** q317 — Benjamini–Hochberg FDR control (1995) over the per-source
    * quality z-test battery: the multiple-testing correction the
    * audit family (q115 χ², q118 z-test, q135 KS, q252 Mann-Whitney)
    * needs the moment it runs across MANY slices — at 20 sources and
    * α=0.05, one uncorrected "significant" slice is expected by pure
    * chance. Each source gets a two-proportion z-test of its
    * quality-gate pass rate (the q315 gate) against the rest of the
    * corpus; p-values come from the Zelen–Severo 26.2.17 normal-CDF
    * polynomial — pure arithmetic both engines evaluate identically
    * (constants inlined, Horner form), micro-rounded like every
    * transcendental in the suite; then the BH step-up: sort p
    * ascending, reject all ranks ≤ k* = max{i : p_i ≤ (i/m)·α}.
    * Everything after the one corpus scan runs on the bounded
    * |sources|-row table (ranking window included); degenerate
    * corpora (single source, all-pass, all-fail) emit zero rows — the
    * test is undefined there, filtered identically in both engines.
    */
  /** q323 — prediction-powered inference (PPI; Angelopoulos et al.
    * 2023): estimate a per-source "gold quality" rate from a SMALL
    * labeled slice plus a cheap predictor on the FULL corpus —
    * θ̂ = mean(f, all) − mean(f, labeled) + mean(y, labeled) — the
    * modern eval recipe when gold labels are scarce and model
    * predictions are plentiful. Here the predictor f is the shared
    * quality gate (q315/q317/q319/q321) and the "gold" label y is the
    * richer q21 quality score ≥ 5500 bp, observed only on the
    * deterministic doc_id % 20 = 0 slice; production swaps in real
    * annotations. The rectifier (y − f on the labeled slice) both
    * debiases the prediction mean and drives the CI: sums, squared
    * sums and counts are exact long aggregates (y, f ∈ {0,1}), the
    * two variance terms and the z·se half-width close with one
    * micro-rounded sqrt (IEEE sqrt — bit-identical in both engines).
    * One corpus scan to a |sources|-row table; everything after is
    * bounded arithmetic. Sources whose labeled slice is empty emit
    * NULL estimates (honest "cannot rectify here"), never throw.
    */
  def q323_ppi_estimate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = load(spark, dir, "documents")
      .select($"source", ($"doc_id" % 20L === 0L).as("lab"),
        graft.llm.TextAnalysis.qualityGatePass($"n_chars", $"text").as("f"),
        when(graft.llm.TextAnalysis.qualityBp($"text") >= 5500L, 1L)
          .otherwise(0L).as("y"))
    val g = d.groupBy($"source").agg(
      count(lit(1)).as("n_all"), sum($"f").as("f_all"),
      sum(when($"lab", 1L).otherwise(0L)).as("n_lab"),
      sum(when($"lab", $"f").otherwise(0L)).as("f_lab"),
      sum(when($"lab", $"y").otherwise(0L)).as("y_lab"),
      // rectifier moments on the labeled slice: r = y − f ∈ {−1,0,1}
      sum(when($"lab", $"y" - $"f").otherwise(0L)).as("r_sum"),
      sum(when($"lab", ($"y" - $"f") * ($"y" - $"f")).otherwise(0L))
        .as("r_sq"))
    val fbar = $"f_all".cast("double") / $"n_all"
    val rbar = $"r_sum".cast("double") / $"n_lab"
    val varF = fbar * (lit(1.0) - fbar) / $"n_all"
    val varR = ($"r_sq".cast("double") / $"n_lab" - rbar * rbar) / $"n_lab"
    val se = sqrt(varF + varR)
    g.select($"source", $"n_all", $"n_lab",
        when($"n_lab" > 0L,
          round(lit(1e6) * (fbar - $"f_lab".cast("double") / $"n_lab"
            + $"y_lab".cast("double") / $"n_lab")).cast("long"))
          .as("ppi_micro"),
        when($"n_lab" > 0L,
          round(lit(1e6) * $"y_lab" / $"n_lab").cast("long"))
          .as("classical_micro"),
        when($"n_lab" > 0L, round(lit(1e6) * se).cast("long"))
          .as("se_micro"),
        when($"n_lab" > 0L,
          round(lit(1.96e6) * se).cast("long")).as("ci_half_micro"))
      .orderBy($"source")
  }

  /** q324 — split-conformal prediction coverage (Vovk et al. 2005;
    * Angelopoulos & Bates 2023 gentle-intro recipe): the
    * distribution-free CI companion to q323's PPI — calibrate ONE
    * quantile of a nonconformity score on a held-out slice, then
    * audit the finite-sample coverage guarantee (≥ 1−α marginally)
    * per source. Predictor ŷ = the length component of the q21
    * quality score (5000 + 10·min(tokens,100) bp), gold y = the full
    * q21 score; nonconformity = |y − ŷ| (the stopword/punctuation
    * part the cheap predictor can't see). Calibration slice is the
    * deterministic doc_id % 10 = 3; q̂ = the ⌈(n_cal+1)(1−α)⌉-th
    * smallest score at α = 0.1, selected EXACTLY by integer rank —
    * not by sorting rows, but by a cumulative count over the BOUNDED
    * nonconformity value space (bp scale ⇒ ≤ 10 001 distinct values
    * at any corpus size, so the one unpartitioned window is
    * value-bounded by construction, never corpus-bounded). Output:
    * per-source test coverage at q̂ — the per-slice audit that shows
    * WHERE the marginal guarantee hides under-coverage. One cached
    * scan + bounded aggregates; corpora with an empty or too-small
    * calibration slice (rank beyond n_cal) emit zero rows, never
    * throw.
    */
  def q324_conformal_coverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // cached: calibration quantile + test coverage both consume the
    // string-heavy quality scan (the q322 convention)
    val d = graft.Caches.tracked(load(spark, dir, "documents")
      .select($"doc_id", $"source",
        graft.llm.TextAnalysis.qualityBp($"text").as("y"),
        (lit(5000L) +
          least(size(split($"text", " ")).cast("long"), lit(100L)) * 10L)
          .as("yhat"))
      .select($"doc_id", $"source", abs($"y" - $"yhat").as("nc"),
        ($"doc_id" % 10L === 3L).as("cal")))
    val calN = d.filter($"cal").agg(count(lit(1)).as("n_cal"))
    // exact order statistic over ≤10 001 value rows (see scaladoc)
    val cum = d.filter($"cal").groupBy($"nc").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum($"c").over(
        org.apache.spark.sql.expressions.Window.orderBy($"nc")))
    val qh = cum.crossJoin(broadcast(calN))
      .filter($"cum" >= expr("((n_cal + 1) * 9 + 9) div 10"))
      .agg(min($"nc").as("qhat_bp"), max($"n_cal").as("n_cal"))
      .filter($"qhat_bp".isNotNull)
    d.filter(!$"cal").crossJoin(broadcast(qh))
      .groupBy($"source", $"n_cal", $"qhat_bp")
      .agg(count(lit(1)).as("n_test"),
        sum(when($"nc" <= $"qhat_bp", 1L).otherwise(0L)).as("n_covered"))
      .select($"source", $"n_cal", $"qhat_bp", $"n_test", $"n_covered",
        round(lit(10000.0) * $"n_covered" / $"n_test").cast("long")
          .as("coverage_bp"))
      .orderBy($"source")
  }

  def q317_bh_fdr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val arms = load(spark, dir, "documents")
      .select($"source",
        graft.llm.TextAnalysis.qualityGatePass($"n_chars", $"text").as("pass"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n"), sum($"pass").as("x"))
    val tot = arms.agg(sum($"n").as("nn"), sum($"x").as("xx"))
    val tested = arms.crossJoin(broadcast(tot))
      .filter($"n" < $"nn" && $"xx" > 0L && $"xx" < $"nn")
      .withColumn("nr", $"nn" - $"n")
      .withColumn("xr", $"xx" - $"x")
    val phat = $"xx".cast("double") / $"nn"
    val z = (($"x".cast("double") / $"n") - ($"xr".cast("double") / $"nr")) /
      sqrt(phat * (lit(1.0) - phat) * (lit(1.0) / $"n" + lit(1.0) / $"nr"))
    val az = abs(z)
    val kk = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val pdf = lit(0.3989422804014327) * exp(az * az * lit(-0.5))
    val tail = pdf * (kk * (lit(0.319381530) + kk * (lit(-0.356563782) +
      kk * (lit(1.781477937) + kk * (lit(-1.821255978) +
        kk * lit(1.330274429))))))
    val scored = tested.select($"source", $"n", $"x",
      round(z * 1e6).cast("long").as("z_micro"),
      round(lit(2000000.0) * tail).cast("long").as("p_micro"))
    val m = scored.agg(count(lit(1)).as("m"))
    val ranked = scored.crossJoin(broadcast(m))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"p_micro", $"source"))
        .cast("long"))
      .withColumn("crit_micro",
        round(lit(50000.0) * $"rank" / $"m").cast("long"))
    val kstar = ranked.filter($"p_micro" <= $"crit_micro")
      .agg(max($"rank").as("kstar"))
    ranked.crossJoin(broadcast(kstar))
      .select($"source", $"n", $"x", $"z_micro", $"p_micro", $"rank",
        $"crit_micro",
        coalesce($"rank" <= $"kstar", lit(false)).as("rejected"))
      .orderBy($"rank")
  }

  /** q119 — conversion latency percentiles: per user, first view →
    * first subsequent purchase; p50/p90 of that latency. Each stage is
    * a min-aggregate on the user key (the q77 funnel shape); the
    * percentile runs over the bounded converted-user set.
    */
  def q119_conversion_latency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = load(spark, dir, "events")
      .select($"user_id", $"event_type", epochS($"ts").as("t"))
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"t").as("v_t"))
    val p = e.filter($"event_type" === "purchase").join(v, "user_id")
      .filter($"t" > $"v_t")
      .groupBy($"user_id").agg(min($"t").as("p_t"), min($"v_t").as("v_t"))
    p.select(($"p_t" - $"v_t").as("lat_s"))
      .agg(count(lit(1)).as("n_converted"),
        round(percentile($"lat_s", lit(0.5))).cast("long").as("p50_s"),
        round(percentile($"lat_s", lit(0.9))).cast("long").as("p90_s"))
  }

  /** q123 — equal-frequency binning (quartiles) per event type: the
    * feature-engineering step that turns a numeric column into a
    * balanced categorical one. Boundaries come from one bounded
    * percentile aggregate broadcast back; assignment is a map-side
    * CASE; the profile (count/min/max per bin) is one more aggregate.
    * Boundary ties bin by <= consistently in both engines.
    */
  def q123_equifreq_binning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = load(spark, dir, "events")
      .select($"event_type", cents($"value").as("c"))
    val bounds = ev.groupBy($"event_type").agg(
      percentile($"c", lit(0.25)).as("q1"),
      percentile($"c", lit(0.5)).as("q2"),
      percentile($"c", lit(0.75)).as("q3"))
    ev.join(broadcast(bounds), "event_type")
      .withColumn("bin",
        when($"c" <= $"q1", 1L).when($"c" <= $"q2", 2L)
          .when($"c" <= $"q3", 3L).otherwise(4L))
      .groupBy($"event_type", $"bin")
      .agg(count(lit(1)).as("n"),
        min($"c").as("min_cents"), max($"c").as("max_cents"))
      .orderBy($"event_type", $"bin")
  }

  /** q125 — cohort LTV curve: cumulative purchase value per signup
    * cohort by weeks-since-cohort, normalized per cohort member — the
    * growth chart behind every retention decision. Cohort assignment
    * is q78's min-aggregate; spend buckets into (cohort, week-index)
    * with one aggregate; the cumulative window runs over the bounded
    * cohorts × weeks grid, never over events.
    */
  def q125_cohort_ltv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val act = load(spark, dir, "events")
      .select($"user_id", unix_timestamp(date_trunc("week", $"ts")).as("week_s"),
        $"event_type", cents($"value").as("c"))
    val cohort = act.groupBy($"user_id").agg(min($"week_s").as("cohort_s"))
    val sizes = cohort.groupBy($"cohort_s").agg(count(lit(1)).as("n_users"))
    val spend = act.filter($"event_type" === "purchase")
      .join(cohort, "user_id")
      .groupBy($"cohort_s",
        (($"week_s" - $"cohort_s") / lit(604800L)).cast("long").as("k"))
      .agg(sum($"c").as("wk_cents"))
    val w = Window.partitionBy($"cohort_s").orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, 0)
    spend.join(broadcast(sizes), "cohort_s")
      .withColumn("cum_cents", sum($"wk_cents").over(w))
      .select($"cohort_s", $"k", $"wk_cents", $"cum_cents",
        round($"cum_cents".cast("double") / $"n_users").cast("long")
          .as("ltv_per_user_cents"))
      .orderBy($"cohort_s", $"k")
  }

  /** q129 — cumulative reach curve: total unique users ever seen, by
    * week. Running COUNT(DISTINCT) over an ever-growing set is
    * unbounded state done naively; the scalable identity is
    * first-seen attribution — each user counts exactly once, at their
    * min week (one aggregate on the user key), and the cumulative sum
    * runs over the bounded week table.
    */
  def q129_cumulative_reach(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val firstSeen = load(spark, dir, "events")
      .select($"user_id", unix_timestamp(date_trunc("week", $"ts")).as("week_s"))
      .groupBy($"user_id").agg(min($"week_s").as("first_week"))
      .groupBy($"first_week").agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy($"first_week")
      .rowsBetween(Window.unboundedPreceding, 0)
    firstSeen
      .withColumn("reach", sum($"n_new").over(w))
      .select($"first_week".as("week_s"), $"n_new", $"reach")
      .orderBy($"week_s")
  }

  /** q132 — demand cross-correlation matrix: Pearson r of weekly
    * event counts for every pair of event types ("do clicks move
    * with purchases?"). The fact stream reduces ONCE to the bounded
    * (week, type) count table; weeks with no events of a type are
    * zero-filled through the q98 dense-grid trick (missing weeks ARE
    * data — an inner join would bias r upward); the pair fan-out and
    * the corr aggregate run entirely on the |types|²·|weeks| grid,
    * never the event stream. corr rounds at 1e6 like q40 so the
    * engines' accumulation-order differences can't flip a digit.
    */
  def q132_demand_correlation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = load(spark, dir, "events")
      .select(unix_timestamp(date_trunc("week", $"ts")).as("week_s"),
        $"event_type")
    val counts = e.groupBy($"week_s", $"event_type").agg(count(lit(1)).as("n"))
    val grid = e.select($"week_s").distinct()
      .crossJoin(broadcast(e.select($"event_type").distinct()))
      .join(counts, Seq("week_s", "event_type"), "left")
      .select($"week_s", $"event_type", coalesce($"n", lit(0L)).as("n"))
    grid.as("a").join(grid.as("b"),
        $"a.week_s" === $"b.week_s" && $"a.event_type" < $"b.event_type")
      .groupBy($"a.event_type".as("type_a"), $"b.event_type".as("type_b"))
      .agg(count(lit(1)).as("n_weeks"),
        round(corr($"a.n", $"b.n") * 1e6).cast("long").as("corr_e6"))
      .orderBy($"type_a", $"type_b")
  }

  /** q133 — RFM segmentation: every customer scored 1–5 on Recency
    * (days since last order, vs the corpus max date), Frequency
    * (order count) and Monetary (exact cents), via NTILE quintiles;
    * output is the bounded 5×5×5 segment census. The fact table
    * reduces once to a |customers|-sized aggregate; the anchor date
    * is a broadcast 1-row aggregate (never a driver collect); the
    * three quintile windows run on the aggregate only — same global-
    * window-on-bounded-aggregate shape as q83, with unique-key
    * tie-breaks so every rank is engine-exact.
    */
  def q133_rfm_segments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = load(spark, dir, "orders")
    val per = o.groupBy($"o_custkey")
      .agg(max(unix_timestamp($"o_orderdate")).as("last_s"),
        count(lit(1)).as("f"),
        sum(cents($"o_totalprice")).as("m"))
    val anchor = o.agg(max(unix_timestamp($"o_orderdate")).as("anchor_s"))
    val wr = Window.orderBy($"r_days", $"o_custkey")
    val wf = Window.orderBy($"f".desc, $"o_custkey")
    val wm = Window.orderBy($"m".desc, $"o_custkey")
    per.crossJoin(broadcast(anchor))
      .withColumn("r_days", floor(($"anchor_s" - $"last_s") / 86400L))
      .withColumn("r_q", ntile(5).over(wr).cast("long"))
      .withColumn("f_q", ntile(5).over(wf).cast("long"))
      .withColumn("m_q", ntile(5).over(wm).cast("long"))
      .groupBy($"r_q", $"f_q", $"m_q")
      .agg(count(lit(1)).as("n_customers"), sum($"m").as("sum_cents"))
      .orderBy($"r_q", $"f_q", $"m_q")
  }

  /** q134 — ABC (Pareto) classification: parts bucketed by their
    * cumulative share of revenue — A covers the first 70%, B to 90%,
    * C the tail. The classic inventory cut needs a GLOBAL cumulative
    * sum over parts ordered by revenue; the naive single-partition
    * window funnel is the q76 anti-plan, so the cumsum is built the
    * distributed way: range-repartition the |parts| aggregate on
    * (revenue desc, part), per-partition totals to the driver (one
    * long each), prefix offsets seed an independent within-partition
    * scan. Output: per class, part count and revenue share in bp.
    */
  def q134_abc_classification(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // cached: consumed twice (grand total + the range-partitioned
    // classify pass) — uncached it would re-run the lineitem aggregate
    val rev = graft.Caches.tracked(load(spark, dir, "lineitem")
      .groupBy($"l_partkey".cast("long").as("p"))
      .agg(sum(cents($"l_extendedprice")).as("x")))
    // coalesce: SUM over an empty fact table is NULL, which the Long
    // encoder rejects (zero-row degenerate-probe finding); with no
    // rows the classify pass emits nothing, so the 0 never divides
    val total = rev.agg(coalesce(sum($"x"), lit(0L))).as[Long].head()
    val sorted = rev.repartitionByRange(32, $"x".desc, $"p")
      .sortWithinPartitions($"x".desc, $"p")
      .as[(Long, Long)]
    // SINGLE .rdd instance, reused by both jobs below — load-bearing:
    // the per-partition sums and the classify pass must see the SAME
    // RangePartitioner sample (shuffle reuse). Two separate .rdd
    // calls could resample different range boundaries and the prefix
    // offsets would no longer line up with the partitions.
    val rdd = sorted.rdd
    val sums = rdd.mapPartitions(it => Iterator(it.map(_._2).sum)).collect()
    val offsets = sums.scanLeft(0L)(_ + _)
    val classified = rdd.mapPartitionsWithIndex { (i, it) =>
      var cum = offsets(i)
      it.map { case (_, x) =>
        cum += x
        // class from the INCLUSIVE prefix: a part is A while the
        // running share (this part included) is still ≤ 70%, etc.
        val cls = if (cum * 10 <= total * 7) "A"
          else if (cum * 10 <= total * 9) "B" else "C"
        (cls, x)
      }
    }
    classified.toDF("cls", "x")
      .groupBy($"cls")
      .agg(count(lit(1)).as("n_parts"),
        sum($"x").as("revenue_cents"))
      .withColumn("share_bp",
        round(lit(10000.0) * $"revenue_cents" / lit(total.toDouble)).cast("long"))
      .orderBy($"cls")
  }

  /** q136 — survival table for view→purchase conversion (the
    * Kaplan–Meier input): per whole-day duration with ≥1 conversion,
    * how many users were still at risk and how many converted that
    * day. Users who never convert are right-censored at the corpus
    * max timestamp — dropping them (the naive "converted only"
    * analysis) overstates conversion speed, which is the estimator's
    * whole point. All counts integer-exact; the KM product itself is
    * left to the consumer (it's a float fold over this bounded
    * table). Plan: two min-aggregates on the user key (q77's funnel
    * shape), one bounded per-day aggregate, and the at-risk curve as
    * a cumulative window over the bounded day table only.
    */
  def q136_survival(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = load(spark, dir, "events")
      .select($"user_id", $"event_type", epochS($"ts").as("t"))
    val fv = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"t").as("v_t"))
    val fp = e.filter($"event_type" === "purchase").join(fv, "user_id")
      .filter($"t" > $"v_t")
      .groupBy($"user_id").agg(min($"t").as("p_t"))
    val tmax = e.agg(max($"t").as("t_max"))
    val users = fv.join(fp, Seq("user_id"), "left")
      .crossJoin(broadcast(tmax))
      .select(
        when($"p_t".isNotNull, floor(($"p_t" - $"v_t") / 86400L))
          .otherwise(floor(($"t_max" - $"v_t") / 86400L)).as("end_day"),
        $"p_t".isNotNull.as("converted"))
    val perDay = users.groupBy($"end_day")
      .agg(count(lit(1)).as("n_end"),
        sum(when($"converted", 1L).otherwise(0L)).as("n_conv"))
    val before = Window.orderBy($"end_day")
      .rowsBetween(Window.unboundedPreceding, -1)
    perDay
      .withColumn("ended_before", coalesce(sum($"n_end").over(before), lit(0L)))
      .crossJoin(broadcast(users.agg(count(lit(1)).as("n_users"))))
      .filter($"n_conv" > 0)
      .select($"end_day".as("day"),
        ($"n_users" - $"ended_before").as("n_at_risk"),
        $"n_conv".as("n_converted"))
      .orderBy($"day")
  }

  /** q150 — top-N with OTHERS rollup: the dashboard staple that keeps
    * total mass intact. Per market segment, the 5 highest-revenue
    * part brands stay named and everything else collapses into one
    * OTHER row, with each row's share of its segment in basis points
    * — so the pie always sums to ~100% instead of silently dropping
    * the tail. Plan: facts reduce once to the bounded
    * (segment, brand) aggregate; the top-5 ranking window and the
    * share window both run inside segment partitions of that
    * aggregate (RankLimitRewrite plans the rank filter as bounded
    * TopK heaps), never over the fact stream.
    */
  def q150_top_n_others(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byBrand = load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey", cents($"l_extendedprice").as("c"))
      .join(load(spark, dir, "orders").select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(load(spark, dir, "customer")
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      .join(broadcast(load(spark, dir, "part")
        .select($"p_partkey", $"p_brand")), $"l_partkey" === $"p_partkey")
      .groupBy($"c_mktsegment", $"p_brand")
      .agg(sum($"c").as("rev_c"))
    val bySeg = Window.partitionBy($"c_mktsegment")
    val labeled = byBrand
      .withColumn("rk", row_number().over(
        bySeg.orderBy($"rev_c".desc, $"p_brand")))
      .withColumn("label", when($"rk" <= 5, $"p_brand").otherwise(lit("OTHER")))
      .groupBy($"c_mktsegment", $"label")
      .agg(sum($"rev_c").as("revenue_c"), count(lit(1)).as("n_brands"))
    labeled
      .withColumn("share_bp",
        round(lit(10000.0) * $"revenue_c" / sum($"revenue_c").over(bySeg))
          .cast("long"))
      .orderBy($"c_mktsegment", $"revenue_c".desc, $"label")
  }

  /** q153 — first-touch attribution: credit every purchase's value to
    * the event type of the user's FIRST event (the marketing-channel
    * question "what first brought the buyer here"). The first touch
    * is one min_by aggregate on the user key — min over the
    * (epoch, event_id) struct gives a total order, so ties cannot
    * flake — and purchases co-partition on the same key for the
    * join-back; no window ever touches the raw stream. Output is the
    * bounded per-channel credit table.
    */
  def q153_first_touch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = load(spark, dir, "events")
      .select($"user_id", $"event_type", $"event_id",
        epochS($"ts").as("t"), cents($"value").as("v_c"))
    val firstTouch = e.groupBy($"user_id")
      .agg(min_by($"event_type", struct($"t", $"event_id")).as("channel"))
    e.filter($"event_type" === "purchase")
      .join(firstTouch, "user_id")
      .groupBy($"channel")
      .agg(count(lit(1)).as("n_purchases"),
        sum($"v_c").as("attributed_cents"))
      .orderBy($"channel")
  }

  /** q154 — longest consecutive-day activity streak per user: the
    * classic gaps-and-islands rewrite. Distinct (user, day) first —
    * the stream reduces to at most users × days rows — then island id
    * = day_index − row_number inside user partitions (consecutive
    * days share it), streak = island size. Every window partitions on
    * the high-cardinality user key; output is one row per user.
    */
  def q154_streaks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val days = load(spark, dir, "events")
      .select($"user_id",
        (unix_timestamp(date_trunc("day", $"ts")) / 86400L).cast("long").as("d"))
      .distinct()
    val byUser = Window.partitionBy($"user_id").orderBy($"d")
    val islands = days
      .withColumn("island", $"d" - row_number().over(byUser))
      .groupBy($"user_id", $"island").agg(count(lit(1)).as("len"))
    islands.groupBy($"user_id")
      .agg(sum($"len").as("n_active_days"), max($"len").as("max_streak_days"))
      .orderBy($"user_id")
  }

  /** q156 — seasonally-adjusted anomaly detection: flag event values
    * that are extreme FOR THEIR DAY OF WEEK, not globally — a Monday
    * spike is normal if Mondays always spike. Detrend by the day-of-
    * week median (bounded 7-row percentile aggregate, broadcast
    * back), then flag residuals beyond 3 robust sigmas of the
    * per-type MAD (bounded per-type aggregate, broadcast back) —
    * q100's robust machinery composed with seasonal normalization.
    * The residual frame persists through [[graft.Caches.tracked]]:
    * it feeds both the MAD aggregate and the final census, and the
    * two consumers must see one scan, not two. All thresholds are
    * integer centi-cents; the only floats are inside the exact
    * percentile, which q38 pins engine-identical.
    */
  def q156_seasonal_anomaly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = load(spark, dir, "events")
      .select($"event_type", (weekday($"ts") + 1).as("dow"),
        cents($"value").as("v_c"))
    val medDow = e.groupBy($"dow")
      .agg(round(expr("percentile(v_c, 0.5)") * 100).cast("long").as("med_cc"))
    val resid = graft.Caches.tracked(
      e.join(broadcast(medDow), "dow")
        .withColumn("resid_cc", $"v_c" * 100 - $"med_cc"))
    val mad = resid.groupBy($"event_type")
      .agg(round(expr("percentile(abs(resid_cc), 0.5)")).cast("long").as("mad_cc"))
    resid.join(broadcast(mad), "event_type")
      // 3 robust sigmas: 3 × 1.4826 = 4.4478 as an integer ratio
      .withColumn("is_outlier",
        abs($"resid_cc") > expr("mad_cc * 44478 div 10000"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(when($"is_outlier", 1L).otherwise(0L)).as("n_outliers"),
        max($"mad_cc").as("mad_cc"))
      .orderBy($"event_type")
  }

  /** q157 — inter-arrival burstiness histogram: the distribution of
    * per-user gaps between consecutive events, bucketed by the gap's
    * binary order of magnitude (integer bit length — no float log at
    * any scale, q124's trick). One lag window on the high-cardinality
    * user key reduces the stream to gaps; the histogram is bounded by
    * ~40 buckets. The operational readout behind session-gap and
    * rate-limit tuning.
    */
  def q157_interarrival(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
    load(spark, dir, "events")
      .select($"user_id", $"event_id", epochS($"ts").as("t"))
      .withColumn("dt", $"t" - lag($"t", 1).over(byUser))
      .filter($"dt".isNotNull)
      .withColumn("bucket", (length(conv($"dt", 10, 2)) - 1).cast("long"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_gaps"),
        min($"dt").as("min_gap_s"), max($"dt").as("max_gap_s"))
      .orderBy($"bucket")
  }

  /** q158 — user-journey paths: the top opening sequences ("what do
    * users do first"). Each user's first 3 events come from the
    * native top-k-per-group operator (bounded 3-row heaps both sides
    * of the exchange — never a per-user sort), the path string
    * assembles via the deterministic collect→sort_array→concat_ws
    * form (q96: a bare collect_list is order-nondeterministic under
    * parallelism), and the final top-20 is TakeOrderedAndProject.
    */
  def q158_user_paths(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val first3 = graft.plans.TopKPerGroup.topK(
      load(spark, dir, "events")
        .select($"user_id", $"event_type", epochS($"ts").as("t"), $"event_id"),
      Seq("user_id"), Seq($"t".asc, $"event_id".asc), 3, rankCol = "pos")
    first3
      .groupBy($"user_id")
      .agg(concat_ws(">", transform(
        sort_array(collect_list(struct($"pos", $"event_type"))),
        x => x("event_type"))).as("path"))
      .groupBy($"path").agg(count(lit(1)).as("n_users"))
      .orderBy($"n_users".desc, $"path").limit(20)
  }

  /** q159 — decile lift / gains curve: rank customers by total spend,
    * cut into NTILE(10) deciles, report each decile's spend share and
    * the cumulative share — "the top decile carries X% of revenue",
    * the model-eval gains chart. The fact stream reduces once to the
    * per-customer aggregate; the NTILE window runs over that bounded
    * aggregate (q83's documented global-window-on-aggregate form —
    * q76's two-phase rank is the escape hatch when customers stop
    * fitting one partition), and the cumulative window runs over the
    * 10-row decile table only.
    */
  def q159_lift_curve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val spend = load(spark, dir, "orders")
      .groupBy($"o_custkey")
      .agg(sum(cents($"o_totalprice")).as("spend_c"))
    val dec = spend.withColumn("decile",
      ntile(10).over(Window.orderBy($"spend_c".desc, $"o_custkey")).cast("long"))
    val byDec = dec.groupBy($"decile")
      .agg(count(lit(1)).as("n_customers"), sum($"spend_c").as("spend_c"))
    val cum = Window.orderBy($"decile")
      .rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byDec
      .withColumn("share_bp",
        round(lit(10000.0) * $"spend_c" / sum($"spend_c").over(all)).cast("long"))
      .withColumn("cum_share_bp",
        round(lit(10000.0) * sum($"spend_c").over(cum) / sum($"spend_c").over(all))
          .cast("long"))
      .orderBy($"decile")
  }

  /** q162 — linear multi-touch attribution: each purchase's value
    * splits EQUALLY across every touch event (view/click/signup/
    * error) the user made before it — q153's all-credit-to-first
    * generalized to the shape marketing actually reconciles. One
    * window pass per user carries five conditional running counts
    * (rows-preceding frame, so the purchase's own row is excluded);
    * the per-channel split is then a bounded 5-way map-side fan-out.
    * Credits are integer micro-cents via `div` — each purchase leaks
    * at most 4 micro-cents to flooring (spec-bounded), purchases with
    * no prior touch credit 'direct' in full. Identical integer
    * arithmetic on both engines.
    */
  def q162_linear_attribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val touchTypes = Seq("view", "click", "signup", "error")
    val before = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val e = load(spark, dir, "events")
      .select($"user_id", $"event_type", $"event_id",
        epochS($"ts").as("t"), cents($"value").as("v_c"))
    val counted = touchTypes.foldLeft(
        e.withColumn("cnt_total",
          coalesce(sum(when($"event_type" =!= "purchase", 1L)).over(before), lit(0L)))) {
        case (df, tn) => df.withColumn(s"cnt_$tn",
          coalesce(sum(when($"event_type" === tn, 1L)).over(before), lit(0L)))
      }
    val channelStructs = touchTypes.map { tn =>
      struct(lit(tn).as("channel"),
        when($"cnt_total" > 0,
          expr(s"(v_c * 1000000 * cnt_$tn) div cnt_total")).otherwise(0L).as("credit"))
    } :+ struct(lit("direct").as("channel"),
      when($"cnt_total" === 0, $"v_c" * 1000000L).otherwise(0L).as("credit"))
    counted.filter($"event_type" === "purchase")
      .select(explode(array(channelStructs: _*)).as("c"))
      .groupBy($"c.channel".as("channel"))
      .agg(sum($"c.credit").as("credit_microcents"),
        sum(when($"c.credit" > 0, 1L).otherwise(0L)).as("n_credited_purchases"))
      .orderBy($"channel")
  }

  /** q163 — recency-decayed engagement score: half-life weighting
    * with NO transcendental function — weight halves per week of age,
    * implemented as `v_c div (1 << age_weeks)` (shift capped at 40,
    * where the contribution is already zero) — so the score is
    * integer-exact and bit-identical on any engine and any partition
    * order, where an exp()-based decay would be neither. The anchor
    * timestamp is a broadcast 1-row aggregate, never a collect; the
    * scoring itself is map-side.
    */
  def q163_decayed_engagement(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = load(spark, dir, "events")
      .select($"event_type", epochS($"ts").as("t"), cents($"value").as("v_c"))
    val anchor = e.agg(max($"t").as("t_max"))
    e.crossJoin(broadcast(anchor))
      .withColumn("age_weeks",
        least(expr("(t_max - t) div 604800"), lit(40L)).cast("int"))
      .withColumn("decayed_c", expr("v_c div shiftleft(1L, age_weeks)"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"v_c").as("raw_cents"),
        sum($"decayed_c").as("decayed_cents"))
      .orderBy($"event_type")
  }

  /** q256 — dyadic EWMA one-step-ahead forecast error (α = 1/2) per
    * event type. α is chosen as a POWER OF TWO so the recursive
    * smoother escapes float-summation order entirely: h_t = S_t/2^t
    * where S_t = 2·x_1 + Σ_{i≥2} x_i·2^{i−1} is an exact integer
    * window sum, and the single closing division by a power of two is
    * exact — every h_t, every residual |x_t − h_{t−1}|, and their sum
    * are dyadic rationals inside the 53-bit mantissa, so both engines
    * agree bit-for-bit with NO quantize-before-compare crutch. The
    * event stream reduces once to the calendar-bounded (type, day)
    * table; windows run inside type partitions. Exactness bound
    * (documented, q135-style): S_t needs t + log₂(max daily count)
    * < 63 — at ~33 days × 10⁹ events/day the sum wants decimal(38,0),
    * same shape wider type; re-anchor per quarter for longer series.
    */
  def q256_ewma_forecast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = load(spark, dir, "events")
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("x"))
    val wOrd = Window.partitionBy($"event_type").orderBy($"d")
    val idx = daily.withColumn("t", row_number().over(wOrd).cast("long"))
    val wCum = Window.partitionBy($"event_type").orderBy($"t")
      .rowsBetween(Window.unboundedPreceding, 0)
    val h = idx
      .withColumn("st", sum(when($"t" === 1, $"x" * 2)
        .otherwise($"x" * expr("shiftleft(1L, CAST(t AS INT) - 1)"))).over(wCum))
      .withColumn("ht", $"st".cast("double") / expr("shiftleft(1L, CAST(t AS INT))"))
      .withColumn("hprev", lag($"ht", 1).over(
        Window.partitionBy($"event_type").orderBy($"t")))
    val n = h.groupBy($"event_type".as("et")).agg(max($"t").as("n"))
    h.join(broadcast(n), $"event_type" === $"et")
      .filter($"hprev".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        round(lit(1000.0) * sum(abs($"x" - $"hprev")) / count(lit(1)))
          .cast("long").as("mae_milli"),
        round(lit(1000.0) * max(when($"t" === $"n", $"ht")))
          .cast("long").as("last_ewma_milli"))
      .orderBy($"event_type")
  }

  /** q257 — autocorrelation function of the global daily event-count
    * series at lags 1..7 (the weekly-seasonality detector behind
    * q156's anomaly gate). Exact-integer centering: with n·x_t − S in
    * place of x_t − x̄ the lag products and the lag-0 denominator are
    * EXACT BIGINT sums (one engine-identical rounded division at the
    * end). The series is the calendar-bounded daily table; the lag
    * pairing is an equi-join on the day index against the 7-row lag
    * dimension — bounded · bounded, constant in event volume.
    */
  def q257_acf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = load(spark, dir, "events")
      .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("x"))
    val idx = daily.withColumn("t",
      row_number().over(Window.orderBy($"d")).cast("long"))
    val tot = idx.agg(count(lit(1)).as("n"), sum($"x").as("s"))
    val c = graft.Caches.tracked(idx.crossJoin(broadcast(tot))
      .select($"t", ($"n" * $"x" - $"s").as("cx")))
    val den = c.agg(sum($"cx" * $"cx").as("den"))
    val lags = spark.range(1, 8).select($"id".as("lag"))
    c.as("a").crossJoin(broadcast(lags))
      .join(c.as("b"), $"b.t" === $"a.t" + $"lag")
      .groupBy($"lag").agg(sum($"a.cx" * $"b.cx").as("num"))
      .crossJoin(broadcast(den))
      // constant series ⇒ zero variance: autocorrelation is undefined
      // there — report 0 instead of dividing by zero (a constant
      // daily count is a legitimate production input; the 20× stress
      // found the unguarded form crashing under ANSI mode)
      .select($"lag",
        when($"den" > 0L,
          round(lit(1000.0) * $"num" / $"den").cast("long"))
          .otherwise(0L).as("acf_milli"))
      .orderBy($"lag")
  }

  /** q258 — Theil–Sen robust trend (median of pairwise slopes, with
    * the median-of-residuals intercept): the outlier-proof trend
    * estimate ordinary least squares can't give when one bad day
    * skews the series. The pair grid is |days|² over the
    * calendar-bounded daily table (435 pairs on a month — constant in
    * event volume); each slope is ONE exactly-rounded IEEE division
    * of integer differences, so both engines sort identical doubles
    * and elect the same middle ranks (even count → mean of the two).
    */
  def q258_theil_sen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = load(spark, dir, "events")
      .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("x"))
    val idx = graft.Caches.tracked(daily.withColumn("t",
      row_number().over(Window.orderBy($"d")).cast("long")))
    val sl = idx.as("a").join(idx.as("b"), $"a.t" < $"b.t")
      .select((($"b.x" - $"a.x").cast("double") / ($"b.t" - $"a.t")).as("slope"))
    def median(df: DataFrame, col: String): DataFrame = df
      .withColumn("rn", row_number().over(Window.orderBy(org.apache.spark.sql.functions.col(col))).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy()))
      .filter($"rn" === expr("(cnt + 1) div 2") || $"rn" === expr("(cnt + 2) div 2"))
      .agg(avg(org.apache.spark.sql.functions.col(col)).as("m"))
    val slope = median(sl, "slope")
    val res = idx.crossJoin(broadcast(slope))
      .select(($"x" - $"m" * $"t").as("r"))
    val icept = median(res, "r").select($"m".as("i"))
    val meta = idx.agg(count(lit(1)).as("n_days"))
      .crossJoin(sl.agg(count(lit(1)).as("n_pairs")))
    meta.crossJoin(slope).crossJoin(icept)
      .select($"n_days", $"n_pairs",
        round(lit(1000.0) * $"m").cast("long").as("slope_milli"),
        round(lit(1000.0) * $"i").cast("long").as("intercept_milli"))
  }

  /** q265 — difference-in-differences estimator: the two-group ×
    * two-period causal workhorse (did a change at the cutoff move the
    * treated group's metric beyond the control group's common
    * trend?). Treated = purchase events, control = view events,
    * cutoff 2024-01-16; the metric is cents-exact value. Four cell
    * means are one partial+final aggregate to a 4-row table; the DiD
    * contrast (t₁−t₀)−(c₁−c₀) is a fixed float tree over the four
    * exactly-rounded divisions, rounded once to MILLI CURRENCY UNITS
    * (cents × 10). Nothing after the first aggregate scales with
    * event volume.
    */
  def q265_diff_in_diff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = load(spark, dir, "events")
      .filter($"event_type".isin("purchase", "view"))
      .select($"event_type", cents($"value").as("v"),
        when(to_date($"ts") < lit("2024-01-16").cast("date"), 0).otherwise(1).as("aft"))
      .groupBy($"event_type", $"aft")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
    m.agg(
        min(when($"event_type" === "purchase" && $"aft" === 1,
          $"s".cast("double") / $"n")).as("t1"),
        min(when($"event_type" === "purchase" && $"aft" === 0,
          $"s".cast("double") / $"n")).as("t0"),
        min(when($"event_type" === "view" && $"aft" === 1,
          $"s".cast("double") / $"n")).as("c1"),
        min(when($"event_type" === "view" && $"aft" === 0,
          $"s".cast("double") / $"n")).as("c0"),
        sum($"n").as("n_events"))
      .select($"n_events",
        round($"t0").cast("long").as("treated_before_cents"),
        round($"t1").cast("long").as("treated_after_cents"),
        round($"c0").cast("long").as("control_before_cents"),
        round($"c1").cast("long").as("control_after_cents"),
        round(lit(10.0) * (($"t1" - $"t0") - ($"c1" - $"c0")))
          .cast("long").as("did_milli"))
  }

  /** q268 — one-sided CUSUM excursion (Page 1954) on the daily
    * event-count series: the SEQUENTIAL level-shift monitor beside
    * q252's retrospective changepoint. The recursive definition
    * S_t = max(0, S_{t−1} + x_t − μ) never runs as a recursion: with
    * P the prefix sum of the n-scaled centered series (n·x − S, q257's
    * exact-integer centering), S_t = P_t − min_{i≤t} P_i — a prefix
    * sum and a running min, both single windows over the
    * calendar-bounded daily table, all integer-exact until the one
    * closing division by n². Output is the peak excursion and its
    * (earliest) day — the alarm a monitor would have fired.
    */
  def q268_cusum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = load(spark, dir, "events")
      .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("x"))
    val tot = daily.agg(count(lit(1)).as("n"), sum($"x").as("s"))
    val wCum = Window.orderBy($"d").rowsBetween(Window.unboundedPreceding, 0)
    daily.crossJoin(broadcast(tot))
      .withColumn("pn", sum($"n" * $"x" - $"s").over(wCum))
      .withColumn("cus", $"pn" - min($"pn").over(wCum))
      .withColumn("rn", row_number().over(Window.orderBy($"cus".desc, $"d")))
      .filter($"rn" === 1)
      .select($"d".as("alarm_day"),
        round(lit(1000.0) * $"cus" / ($"n" * $"n")).cast("long").as("cusum_milli"))
  }

  /** q269 — Mann–Kendall trend test (the significance companion to
    * q258's Theil–Sen slope): S = Σ_{j<k} sign(x_k − x_j) is an EXACT
    * integer over the bounded |days|² pair grid, the tie-corrected
    * variance is exact integer arithmetic, and the
    * continuity-corrected z is one fixed sqrt+division milli-rounded
    * at the end. Nothing scales with event volume past the daily
    * aggregate.
    */
  def q269_mann_kendall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = load(spark, dir, "events")
      .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("x"))
    val idx = graft.Caches.tracked(daily.withColumn("t",
      row_number().over(Window.orderBy($"d")).cast("long")))
    val s = idx.as("a").join(idx.as("b"), $"a.t" < $"b.t")
      .agg(sum(when($"b.x" > $"a.x", 1L).when($"b.x" < $"a.x", -1L)
        .otherwise(0L)).as("mk"))
    val ties = idx.groupBy($"x").agg(count(lit(1)).as("c")).filter($"c" > 1)
      .agg(coalesce(sum($"c" * ($"c" - 1) * (lit(2L) * $"c" + 5)), lit(0L)).as("tt"))
    val n = idx.agg(count(lit(1)).as("n"))
    s.crossJoin(broadcast(ties)).crossJoin(broadcast(n))
      .select($"mk".as("s_stat"), $"n".as("n_days"),
        round(lit(1000.0) * ($"mk" - when($"mk" > 0, 1L).when($"mk" < 0, -1L).otherwise(0L))
          / sqrt(($"n".cast("double") * ($"n" - 1) * (lit(2L) * $"n" + 5) - $"tt") / lit(18.0)))
          .cast("long").as("z_milli"))
  }

  /** q270 — additive weekly seasonal decomposition (classical
    * moving-average form): day-of-week effects from the detrended
    * series, where "detrended" is 7·x − (centered 7-day sum) — an
    * EXACT INTEGER per interior day (the ×7 clears the moving-average
    * division), so per-dow effects are integer sums until the one
    * closing division by 7·count. The dow-effect table is what a
    * forecast/anomaly layer (q156) subtracts before thresholding.
    */
  def q270_seasonal_dow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = load(spark, dir, "events")
      .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("x"))
    val w7 = Window.orderBy($"d").rowsBetween(-3, 3)
    val idx = daily
      .withColumn("dow", (weekday($"d") + 1).cast("long"))
      .withColumn("t", row_number().over(Window.orderBy($"d")).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("s7", sum($"x").over(w7))
    idx.filter($"t" >= 4 && $"t" <= $"n" - 3)
      .select($"dow", ($"x" * 7 - $"s7").as("num"))
      .groupBy($"dow")
      .agg(count(lit(1)).as("n_days"),
        round(lit(1000.0) * sum($"num") / (lit(7.0) * count(lit(1))))
          .cast("long").as("seasonal_milli"))
      .orderBy($"dow")
  }

  /** q276 — cohort LTV curves: cumulative revenue per customer by
    * (acquisition-month cohort, months-since-acquisition age) — the
    * finance view on top of q78's retention triangle. Cohort
    * assignment is one aggregate on the customer key; revenue folds
    * to the bounded (cohort, age) grid BEFORE the cumulative window
    * runs (the window never sees order rows), and LTV is exact
    * integer cents with a closing integer division by cohort size.
    */
  def q276_cohort_ltv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = load(spark, dir, "orders")
      .select($"o_custkey".as("c"),
        date_trunc("month", $"o_orderdate").cast("date").as("m"),
        cents($"o_totalprice").as("cents"))
    val coh = o.groupBy($"c").agg(min($"m").as("cm"))
    val sz = coh.groupBy($"cm").agg(count(lit(1)).as("n_cust"))
    val rev = o.join(coh, "c")
      .groupBy($"cm", months_between($"m", $"cm").cast("long").as("age"))
      .agg(sum($"cents").as("rev"))
    val w = Window.partitionBy($"cm").orderBy($"age")
      .rowsBetween(Window.unboundedPreceding, 0)
    rev.withColumn("cum_rev", sum($"rev").over(w))
      .join(sz, "cm")
      .select($"cm".as("cohort_month"), $"age", $"n_cust",
        expr("cum_rev div n_cust").as("ltv_cents"))
      .orderBy($"cohort_month", $"age")
  }

  /** q294 — iterative proportional fitting (IPF / RAS / raking,
    * Deming–Stephan 1940): calibrate a seed contingency table to
    * fresh marginal totals — the survey-weighting / demand-matrix
    * workhorse ("yesterday's (event_type × weekday) mix, re-scaled to
    * today's row and column totals"). Seed = counts over even
    * event_ids, target margins = counts over odd event_ids (a
    * deterministic, SF-stable split). Two full row→column rounds,
    * unrolled (fixed iteration count — the q261/q278 bounded-rounds
    * policy): cells live on a 1e-6 integer grid, every rescale is ONE
    * identically-parenthesised double expression rounded back to the
    * grid, and the margin sums between rescales are exact BIGINT —
    * both engines walk bit-identical tables. The only corpus-sized
    * work is the two counting scans; all fitting happens on the
    * |types|·|weekdays| grid.
    */
  def q294_ipf_margins(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = load(spark, dir, "events")
      .select($"event_id", $"event_type",
        (weekday(to_date($"ts")) + 1).cast("long").as("dow"))
    val seed = ev.filter($"event_id" % 2 === 0)
      .groupBy($"event_type", $"dow").agg(count(lit(1)).as("seed_n"))
    val tr = ev.filter($"event_id" % 2 === 1)
      .groupBy($"event_type").agg(count(lit(1)).as("tr"))
    val tc = ev.filter($"event_id" % 2 === 1)
      .groupBy($"dow").agg(count(lit(1)).as("tc"))

    val x0 = seed.join(broadcast(tr), "event_type").join(broadcast(tc), "dow")
    // row pass 1: x1 = seed·1e6 · tr / sr  (sr exact BIGINT)
    val sr0 = Window.partitionBy($"event_type")
    val x1 = x0.withColumn("sr", sum($"seed_n").over(sr0))
      .withColumn("x1",
        round($"seed_n" * lit(1e6) * $"tr" / $"sr").cast("long"))
    // column pass 1: x2 = x1 · (1e6·tc) / sc1
    val sc1 = Window.partitionBy($"dow")
    val x2 = x1.withColumn("sc1", sum($"x1").over(sc1))
      .withColumn("x2",
        round($"x1" * (lit(1e6) * $"tc") / $"sc1").cast("long"))
    // row pass 2
    val x3 = x2.withColumn("sr2", sum($"x2").over(sr0))
      .withColumn("x3",
        round($"x2" * (lit(1e6) * $"tr") / $"sr2").cast("long"))
    // column pass 2
    val x4 = x3.withColumn("sc3", sum($"x3").over(sc1))
      .withColumn("fitted_e6",
        round($"x3" * (lit(1e6) * $"tc") / $"sc3").cast("long"))
    x4.select($"event_type", $"dow", $"seed_n", $"fitted_e6")
      .orderBy($"event_type", $"dow")
  }

  /** q297 — Simpson's-paradox audit: the aggregation trap every
    * metrics stack eventually hits — a per-stratum effect whose SIGN
    * flips when strata are pooled (confounding by stratum mix). The
    * audit compares the purchase-vs-click mean value (exact integer
    * cents) per ISO weekday against the pooled contrast, flagging any
    * stratum whose direction disagrees with the overall row. The
    * pooled row derives from the SAME 7-row stratum aggregate (exact
    * integer sums — no second scan); means round once to milli-cents,
    * the flip test compares signs of integer differences. Stratum
    * row dow 0 = pooled.
    */
  def q297_simpson_paradox(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val strata = load(spark, dir, "events")
      .filter($"event_type".isin("purchase", "click"))
      .select((weekday(to_date($"ts")) + 1).cast("long").as("dow"),
        $"event_type", graft.Tables.cents($"value").as("v"))
      .groupBy($"dow")
      .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("n_a"),
        sum(when($"event_type" === "purchase", $"v").otherwise(0L)).as("s_a"),
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("n_b"),
        sum(when($"event_type" === "click", $"v").otherwise(0L)).as("s_b"))
    val pooled = strata.agg(
        sum($"n_a").as("n_a"), sum($"s_a").as("s_a"),
        sum($"n_b").as("n_b"), sum($"s_b").as("s_b"))
      .select(lit(0L).as("dow"), $"n_a", $"s_a", $"n_b", $"s_b")
    // one-sided strata guard: a weekday with clicks but zero purchases
    // (or vice versa) would make 0.0/0 = NaN and the ANSI cast throw —
    // NULL mean instead, mirrored as CASE in the oracle; the sign_flip
    // comparison then propagates NULL for that stratum
    val withMeans = strata.unionByName(pooled)
      .select($"dow", $"n_a", $"n_b",
        when($"n_a" > 0L,
          round(lit(1000.0) * $"s_a" / $"n_a").cast("long")).as("mean_a_milli"),
        when($"n_b" > 0L,
          round(lit(1000.0) * $"s_b" / $"n_b").cast("long")).as("mean_b_milli"))
      .withColumn("diff_milli", $"mean_a_milli" - $"mean_b_milli")
    val overall = withMeans.filter($"dow" === 0L)
      .select($"diff_milli".as("overall_diff"))
    withMeans.crossJoin(broadcast(overall))
      .select($"dow", $"n_a", $"n_b", $"mean_a_milli", $"mean_b_milli",
        $"diff_milli",
        (signum($"diff_milli") =!= signum($"overall_diff")).as("sign_flip"))
      .orderBy($"dow")
  }

  /** q309 — covariate balance audit (standardized mean differences):
    * the pre-flight check before ANY observational causal estimate
    * (q265's DiD, q310's matching) — are treated and control units
    * comparable on their covariates? |SMD| > 0.1 is the conventional
    * imbalance alarm. Users aggregate once (data-sized shuffle on
    * user_id), the treated/control split reduces to TWO rows of exact
    * integer sums per covariate, and the SMD is one fixed float tree
    * (population variances via the n·Σx² − (Σx)² cross-mult, one
    * sqrt, one division) rounded to milli. Pooled-zero-variance
    * degenerates report 0 (mirrored guard).
    */
  def q309_covariate_balance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val users = load(spark, dir, "events")
      .groupBy($"user_id")
      .agg(sum(when($"event_type" === "click", 1L).otherwise(0L)).as("clicks"),
        sum(when($"event_type" === "view", 1L).otherwise(0L)).as("views"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("np"),
        count(lit(1)).as("tot"))
      // scale-invariant treatment: purchase-heavy users (> 1/5 share)
      .withColumn("treated", ($"np" * 5L > $"tot").cast("long"))
    val long = users.select($"treated", explode(map(
        lit("clicks"), $"clicks", lit("views"), $"views")).as(Seq("covariate", "x")))
    val g = long.groupBy($"covariate", $"treated")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"x" * $"x").as("sxx"))
    val t = g.filter($"treated" === 1L)
      .select($"covariate", $"n".as("nt"), $"sx".as("sxt"), $"sxx".as("sxxt"))
    val c = g.filter($"treated" === 0L)
      .select($"covariate", $"n".as("nc"), $"sx".as("sxc"), $"sxx".as("sxxc"))
    val mt = $"sxt".cast("double") / $"nt"
    val mc = $"sxc".cast("double") / $"nc"
    val vt = ($"nt" * $"sxxt" - $"sxt" * $"sxt").cast("double") / ($"nt".cast("double") * $"nt")
    val vc = ($"nc" * $"sxxc" - $"sxc" * $"sxc").cast("double") / ($"nc".cast("double") * $"nc")
    t.join(c, "covariate")
      .select($"covariate", $"nt".as("n_treated"), $"nc".as("n_control"),
        round(lit(1000.0) * mt).cast("long").as("mean_treated_milli"),
        round(lit(1000.0) * mc).cast("long").as("mean_control_milli"),
        when((vt + vc) > 0.0,
          round(lit(1000.0) * (mt - mc) / sqrt((vt + vc) / lit(2.0)))
            .cast("long")).otherwise(0L).as("smd_milli"))
      .orderBy($"covariate")
  }

  final val MatchCaliper = 8L

  /** q310 — caliper nearest-neighbor matching ATT (with replacement):
    * each treated user matches the control whose covariate (total
    * event count) is closest WITHIN its covariate bucket of width
    * [[MatchCaliper]] — the standard caliper restriction (matches
    * farther than the caliper are worse than no match), which is also
    * what makes the estimator distributed: windows partition by
    * bucket, so the sort is per-bucket, never a global single
    * partition. With-replacement matching needs only each treated
    * unit's nearest control in covariate order — two running extremes
    * per bucket (last control at-or-before, first after), closer one
    * wins, ties to the at-or-before side. Treated units with no
    * in-caliper control are counted unmatched, never silently
    * dropped. One user-level aggregate + one bucket-partitioned
    * window — the 100 TB shape of a matching estimator.
    */
  def q310_nn_matching(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val users = load(spark, dir, "events")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("cov"),
        sum(graft.Tables.cents($"value")).as("y_cents"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("np"))
      .withColumn("treated", ($"np" * 5L > $"cov").cast("long"))
      .withColumn("bucket", expr(s"cov div $MatchCaliper"))
    val ord = Window.partitionBy($"bucket").orderBy($"cov", $"user_id")
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    val after = ord.rowsBetween(1, Window.unboundedFollowing)
    val m = users
      .withColumn("prevc", max(when($"treated" === 0L,
        struct($"cov", (-$"user_id").as("nid"), $"y_cents"))).over(before))
      .withColumn("nextc", min(when($"treated" === 0L,
        struct($"cov", $"user_id", $"y_cents"))).over(after))
      .filter($"treated" === 1L)
      .withColumn("dprev", when($"prevc".isNotNull, $"cov" - $"prevc.cov"))
      .withColumn("dnext", when($"nextc".isNotNull, $"nextc.cov" - $"cov"))
      .withColumn("match_y", when($"dprev".isNotNull &&
          ($"dnext".isNull || $"dprev" <= $"dnext"), $"prevc.y_cents")
        .otherwise($"nextc.y_cents"))
    m.agg(count(lit(1)).as("n_treated"),
        sum($"match_y".isNotNull.cast("long")).as("n_matched"),
        sum(when($"match_y".isNotNull, $"y_cents" - $"match_y")).as("gap"))
      .select($"n_treated", $"n_matched",
        when($"n_matched" > 0L,
          round(lit(1000.0) * $"gap" / $"n_matched").cast("long"))
          .otherwise(0L).as("att_milli_cents"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q309_covariate_balance" -> q309_covariate_balance,
    "q310_nn_matching" -> q310_nn_matching,
    "q294_ipf_margins" -> q294_ipf_margins,
    "q297_simpson_paradox" -> q297_simpson_paradox,
    "q276_cohort_ltv" -> q276_cohort_ltv,
    "q268_cusum" -> q268_cusum,
    "q269_mann_kendall" -> q269_mann_kendall,
    "q270_seasonal_dow" -> q270_seasonal_dow,
    "q265_diff_in_diff" -> q265_diff_in_diff,
    "q256_ewma_forecast" -> q256_ewma_forecast,
    "q257_acf" -> q257_acf,
    "q258_theil_sen" -> q258_theil_sen,
    "q153_first_touch" -> q153_first_touch,
    "q154_streaks" -> q154_streaks,
    "q156_seasonal_anomaly" -> q156_seasonal_anomaly,
    "q157_interarrival" -> q157_interarrival,
    "q158_user_paths" -> q158_user_paths,
    "q159_lift_curve" -> q159_lift_curve,
    "q162_linear_attribution" -> q162_linear_attribution,
    "q163_decayed_engagement" -> q163_decayed_engagement,
    "q150_top_n_others" -> q150_top_n_others,
    "q136_survival" -> q136_survival,
    "q134_abc_classification" -> q134_abc_classification,
    "q133_rfm_segments" -> q133_rfm_segments,
    "q132_demand_correlation" -> q132_demand_correlation,
    "q129_cumulative_reach" -> q129_cumulative_reach,
    "q125_cohort_ltv" -> q125_cohort_ltv,
    "q123_equifreq_binning" -> q123_equifreq_binning,
    "q118_ab_ztest" -> q118_ab_ztest,
    "q317_bh_fdr" -> q317_bh_fdr,
    "q323_ppi_estimate" -> q323_ppi_estimate,
    "q324_conformal_coverage" -> q324_conformal_coverage,
    "q119_conversion_latency" -> q119_conversion_latency,
    "q117_concentration" -> q117_concentration,
    "q115_chi_square" -> q115_chi_square,
    "q113_winsorized_mean" -> q113_winsorized_mean,
    "q109_tumbling_windows" -> q109_tumbling_windows,
    "q167_sliding_window" -> q167_sliding_window,
    "q168_session_native" -> q168_session_native,
    "q175_cusum_drift" -> q175_cusum_drift,
    "q176_max_drawdown" -> q176_max_drawdown,
    "q177_histogram_overlap" -> q177_histogram_overlap,
    "q104_trend" -> q104_trend,
    "q105_week_over_week" -> q105_week_over_week,
    "q100_robust_outliers" -> q100_robust_outliers,
    "q101_twap" -> q101_twap,
    "q97_rolling_distinct" -> q97_rolling_distinct,
    "q98_dense_grid" -> q98_dense_grid,
    "q57_topk_native" -> q57_topk_native,
    "q88_incremental_agg" -> q88_incremental_agg,
    "q90_group_sample" -> q90_group_sample,
    "q91_markov" -> q91_markov,
    "q40_stats" -> q40_stats,
    "q47_grouping_sets" -> q47_grouping_sets,
    "q48_range_window" -> q48_range_window,
    "q37_sessionize" -> q37_sessionize,
    "q72_error_bursts" -> q72_error_bursts,
    "q76_global_rank" -> q76_global_rank,
    "q77_funnel" -> q77_funnel,
    "q78_retention" -> q78_retention,
    "q79_gap_fill" -> q79_gap_fill,
    "q38_percentiles" -> q38_percentiles,
    "q64_sampled_quantiles" -> q64_sampled_quantiles,
    "q29_gtfs_time" -> q29_gtfs_time,
    "q31_asof_join" -> q31_asof_join,
    "q32_pivot" -> q32_pivot,
    "q33_rollup" -> q33_rollup,
    "q36_tz_convert" -> q36_tz_convert,
    "q08_window_latest" -> q08_window_latest,
    "q09_window_lag" -> q09_window_lag,
    "q10_window_running" -> q10_window_running,
    "q11_set_ops" -> q11_set_ops,
    "q12_incremental_watermark" -> q12_incremental_watermark,
    "q13_heatmap" -> q13_heatmap,
    "q14_histogram" -> q14_histogram,
    "q15_punctuality" -> q15_punctuality,
    "q16_json_extract" -> q16_json_extract,
    "q17_latest_dim" -> q17_latest_dim,
    "q18_dedup_first_wins" -> q18_dedup_first_wins)

  val oracle: Map[String, String] = Map(
    "q309_covariate_balance" ->
      """WITH u AS (SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS clicks,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS views,
        |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           * 5 > COUNT(*) THEN 1 ELSE 0 END AS treated
        |  FROM events GROUP BY 1),
        |lg AS (SELECT treated, 'clicks' AS covariate, clicks AS x FROM u
        |  UNION ALL SELECT treated, 'views', views FROM u),
        |g AS (SELECT covariate, treated, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM lg GROUP BY 1, 2),
        |t AS (SELECT covariate, n AS nt, sx AS sxt, sxx AS sxxt FROM g
        |      WHERE treated = 1),
        |c AS (SELECT covariate, n AS nc, sx AS sxc, sxx AS sxxc FROM g
        |      WHERE treated = 0)
        |SELECT t.covariate, nt AS n_treated, nc AS n_control,
        |  CAST(ROUND(1000.0 * (CAST(sxt AS DOUBLE) / nt)) AS BIGINT)
        |    AS mean_treated_milli,
        |  CAST(ROUND(1000.0 * (CAST(sxc AS DOUBLE) / nc)) AS BIGINT)
        |    AS mean_control_milli,
        |  CASE WHEN (CAST(nt * sxxt - sxt * sxt AS DOUBLE)
        |        / (CAST(nt AS DOUBLE) * nt))
        |      + (CAST(nc * sxxc - sxc * sxc AS DOUBLE)
        |        / (CAST(nc AS DOUBLE) * nc)) > 0.0
        |    THEN CAST(ROUND(1000.0
        |      * (CAST(sxt AS DOUBLE) / nt - CAST(sxc AS DOUBLE) / nc)
        |      / SQRT(((CAST(nt * sxxt - sxt * sxt AS DOUBLE)
        |          / (CAST(nt AS DOUBLE) * nt))
        |        + (CAST(nc * sxxc - sxc * sxc AS DOUBLE)
        |          / (CAST(nc AS DOUBLE) * nc))) / 2.0)) AS BIGINT)
        |    ELSE 0 END AS smd_milli
        |FROM t JOIN c ON c.covariate = t.covariate ORDER BY t.covariate""".stripMargin,
    "q310_nn_matching" ->
      """WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cov,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y_cents,
        |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           * 5 > COUNT(*) THEN 1 ELSE 0 END AS treated,
        |    CAST(COUNT(*) AS BIGINT) // 8 AS bucket
        |  FROM events GROUP BY 1),
        |w AS (SELECT *,
        |    MAX(CASE WHEN treated = 0 THEN ROW(cov, -user_id, y_cents) END)
        |      OVER (PARTITION BY bucket ORDER BY cov, user_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevc,
        |    MIN(CASE WHEN treated = 0 THEN ROW(cov, user_id, y_cents) END)
        |      OVER (PARTITION BY bucket ORDER BY cov, user_id
        |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nextc
        |  FROM u),
        |m AS (SELECT y_cents,
        |    CASE WHEN prevc IS NOT NULL AND (nextc IS NULL
        |           OR cov - (prevc)[1] <= (nextc)[1] - cov)
        |         THEN (prevc)[3] ELSE (nextc)[3] END AS match_y
        |  FROM w WHERE treated = 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_treated,
        |  CAST(SUM(CASE WHEN match_y IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_matched,
        |  CASE WHEN SUM(CASE WHEN match_y IS NOT NULL THEN 1 ELSE 0 END) > 0
        |    THEN CAST(ROUND(1000.0
        |      * SUM(CASE WHEN match_y IS NOT NULL THEN y_cents - match_y END)
        |      / SUM(CASE WHEN match_y IS NOT NULL THEN 1 ELSE 0 END))
        |      AS BIGINT)
        |    ELSE 0 END AS att_milli_cents
        |FROM m""".stripMargin,
    "q294_ipf_margins" ->
      """WITH ev AS (SELECT event_id, event_type,
        |    CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS dow FROM events),
        |seed AS (SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS seed_n
        |  FROM ev WHERE event_id % 2 = 0 GROUP BY 1, 2),
        |tr AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS tr
        |  FROM ev WHERE event_id % 2 = 1 GROUP BY 1),
        |tc AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS tc
        |  FROM ev WHERE event_id % 2 = 1 GROUP BY 1),
        |x0 AS (SELECT s.event_type, s.dow, s.seed_n, tr.tr, tc.tc
        |  FROM seed s JOIN tr ON tr.event_type = s.event_type
        |  JOIN tc ON tc.dow = s.dow),
        |x1 AS (SELECT *, CAST(ROUND(seed_n * 1e6 * tr /
        |    (SUM(seed_n) OVER (PARTITION BY event_type))) AS BIGINT) AS x1
        |  FROM x0),
        |x2 AS (SELECT *, CAST(ROUND(x1 * (1e6 * tc) /
        |    (SUM(x1) OVER (PARTITION BY dow))) AS BIGINT) AS x2
        |  FROM x1),
        |x3 AS (SELECT *, CAST(ROUND(x2 * (1e6 * tr) /
        |    (SUM(x2) OVER (PARTITION BY event_type))) AS BIGINT) AS x3
        |  FROM x2),
        |x4 AS (SELECT *, CAST(ROUND(x3 * (1e6 * tc) /
        |    (SUM(x3) OVER (PARTITION BY dow))) AS BIGINT) AS fitted_e6
        |  FROM x3)
        |SELECT event_type, dow, seed_n, fitted_e6 FROM x4
        |ORDER BY event_type, dow""".stripMargin,
    "q297_simpson_paradox" ->
      """WITH st AS (SELECT CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS dow,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS s_a,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN event_type = 'click'
        |      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS s_b
        |  FROM events WHERE event_type IN ('purchase', 'click') GROUP BY 1),
        |allr AS (SELECT * FROM st
        |  UNION ALL
        |  SELECT 0, CAST(SUM(n_a) AS BIGINT), CAST(SUM(s_a) AS BIGINT),
        |    CAST(SUM(n_b) AS BIGINT), CAST(SUM(s_b) AS BIGINT) FROM st),
        |m AS (SELECT dow, n_a, n_b,
        |    CASE WHEN n_a > 0
        |      THEN CAST(ROUND(1000.0 * s_a / n_a) AS BIGINT) END AS mean_a_milli,
        |    CASE WHEN n_b > 0
        |      THEN CAST(ROUND(1000.0 * s_b / n_b) AS BIGINT) END AS mean_b_milli
        |  FROM allr),
        |d AS (SELECT *, mean_a_milli - mean_b_milli AS diff_milli FROM m),
        |o AS (SELECT diff_milli AS overall_diff FROM d WHERE dow = 0)
        |SELECT dow, n_a, n_b, mean_a_milli, mean_b_milli, diff_milli,
        |  SIGN(diff_milli) <> SIGN(overall_diff) AS sign_flip
        |FROM d, o ORDER BY dow""".stripMargin,
    "q276_cohort_ltv" ->
      """WITH o AS (SELECT o_custkey AS c,
        |    date_trunc('month', o_orderdate) AS m,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |coh AS (SELECT c, MIN(m) AS cm FROM o GROUP BY 1),
        |sz AS (SELECT cm, CAST(COUNT(*) AS BIGINT) AS n_cust FROM coh
        |  GROUP BY 1),
        |rev AS (SELECT coh.cm,
        |    CAST(datediff('month', coh.cm, o.m) AS BIGINT) AS age,
        |    CAST(SUM(o.cents) AS BIGINT) AS rev
        |  FROM o JOIN coh ON o.c = coh.c GROUP BY 1, 2),
        |cum AS (SELECT cm, age, CAST(SUM(rev) OVER (PARTITION BY cm
        |    ORDER BY age ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_rev FROM rev)
        |SELECT CAST(cum.cm AS DATE) AS cohort_month, cum.age, sz.n_cust,
        |  CAST(cum.cum_rev // sz.n_cust AS BIGINT) AS ltv_cents
        |FROM cum JOIN sz ON cum.cm = sz.cm
        |ORDER BY 1, 2""".stripMargin,
    "q268_cusum" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS s FROM daily),
        |p AS (SELECT d, CAST(SUM(n * x - s) OVER (ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pn, n
        |  FROM daily, tot),
        |c AS (SELECT d, n, pn - MIN(pn) OVER (ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cus FROM p)
        |SELECT d AS alarm_day,
        |  CAST(ROUND(1000.0 * cus / (n * n)) AS BIGINT) AS cusum_milli
        |FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cus DESC, d) AS rn FROM c)
        |WHERE rn = 1""".stripMargin,
    "q269_mann_kendall" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |idx AS (SELECT x,
        |    CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t FROM daily),
        |s AS (SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
        |    WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS mk
        |  FROM idx a JOIN idx b ON a.t < b.t),
        |ties AS (SELECT COALESCE(CAST(SUM(c * (c - 1) * (2 * c + 5))
        |    AS BIGINT), 0) AS tt
        |  FROM (SELECT COUNT(*) AS c FROM idx GROUP BY x HAVING COUNT(*) > 1)),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM idx)
        |SELECT s.mk AS s_stat, n.n AS n_days,
        |  CAST(ROUND(1000.0 * (s.mk - CASE WHEN s.mk > 0 THEN 1
        |      WHEN s.mk < 0 THEN -1 ELSE 0 END)
        |    / SQRT((CAST(n.n AS DOUBLE) * (n.n - 1) * (2 * n.n + 5) - ties.tt)
        |      / 18.0)) AS BIGINT) AS z_milli
        |FROM s, ties, n""".stripMargin,
    "q270_seasonal_dow" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |idx AS (SELECT d, x, isodow(d) AS dow,
        |    CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n,
        |    CAST(SUM(x) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
        |      AND 3 FOLLOWING) AS BIGINT) AS s7
        |  FROM daily),
        |det AS (SELECT dow, 7 * x - s7 AS num FROM idx
        |  WHERE t >= 4 AND t <= n - 3)
        |SELECT CAST(dow AS BIGINT) AS dow, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(ROUND(1000.0 * SUM(num) / (7.0 * COUNT(*))) AS BIGINT)
        |    AS seasonal_milli
        |FROM det GROUP BY 1 ORDER BY 1""".stripMargin,
    "q265_diff_in_diff" ->
      """WITH e AS (SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v,
        |    CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 0 ELSE 1 END AS aft
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |m AS (SELECT event_type, aft, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(v) AS BIGINT) AS s FROM e GROUP BY 1, 2),
        |w AS (SELECT
        |  MIN(CASE WHEN event_type = 'purchase' AND aft = 1
        |    THEN CAST(s AS DOUBLE) / n END) AS t1,
        |  MIN(CASE WHEN event_type = 'purchase' AND aft = 0
        |    THEN CAST(s AS DOUBLE) / n END) AS t0,
        |  MIN(CASE WHEN event_type = 'view' AND aft = 1
        |    THEN CAST(s AS DOUBLE) / n END) AS c1,
        |  MIN(CASE WHEN event_type = 'view' AND aft = 0
        |    THEN CAST(s AS DOUBLE) / n END) AS c0,
        |  CAST(SUM(n) AS BIGINT) AS n_events FROM m)
        |SELECT n_events,
        |  CAST(ROUND(t0) AS BIGINT) AS treated_before_cents,
        |  CAST(ROUND(t1) AS BIGINT) AS treated_after_cents,
        |  CAST(ROUND(c0) AS BIGINT) AS control_before_cents,
        |  CAST(ROUND(c1) AS BIGINT) AS control_after_cents,
        |  CAST(ROUND(10.0 * ((t1 - t0) - (c1 - c0))) AS BIGINT) AS did_milli
        |FROM w""".stripMargin,
    "q256_ewma_forecast" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |idx AS (SELECT event_type, d, x,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
        |      AS BIGINT) AS t FROM daily),
        |s AS (SELECT event_type, d, x, t,
        |    CAST(SUM(CASE WHEN t = 1 THEN 2 * x
        |        ELSE x * (CAST(1 AS BIGINT) << (t - 1)) END)
        |      OVER (PARTITION BY event_type ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS st
        |  FROM idx),
        |h AS (SELECT event_type, x, t,
        |    CAST(st AS DOUBLE) / (CAST(1 AS BIGINT) << t) AS ht,
        |    LAG(CAST(st AS DOUBLE) / (CAST(1 AS BIGINT) << t))
        |      OVER (PARTITION BY event_type ORDER BY t) AS hprev
        |  FROM s),
        |mx AS (SELECT event_type AS et, MAX(t) AS n FROM h GROUP BY 1)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(ROUND(1000.0 * SUM(ABS(x - hprev)) / COUNT(*)) AS BIGINT)
        |    AS mae_milli,
        |  CAST(ROUND(1000.0 * MAX(CASE WHEN t = n THEN ht END)) AS BIGINT)
        |    AS last_ewma_milli
        |FROM h JOIN mx ON h.event_type = mx.et
        |WHERE hprev IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,
    "q257_acf" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |idx AS (SELECT x,
        |    CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t FROM daily),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS s FROM idx),
        |c AS (SELECT t, n * x - s AS cx FROM idx, tot),
        |c0 AS (SELECT CAST(SUM(cx * cx) AS BIGINT) AS den FROM c),
        |l AS (SELECT lg.range AS lag, CAST(SUM(a.cx * b.cx) AS BIGINT) AS num
        |  FROM range(1, 8) lg JOIN c a ON true JOIN c b ON b.t = a.t + lg.range
        |  GROUP BY 1)
        |SELECT lag, CASE WHEN den > 0
        |    THEN CAST(ROUND(1000.0 * num / den) AS BIGINT)
        |    ELSE 0 END AS acf_milli
        |FROM l, c0 ORDER BY lag""".stripMargin,
    "q258_theil_sen" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |idx AS (SELECT x,
        |    CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t FROM daily),
        |sl AS (SELECT CAST(b.x - a.x AS DOUBLE) / (b.t - a.t) AS slope
        |  FROM idx a JOIN idx b ON a.t < b.t),
        |med AS (SELECT AVG(slope) AS m FROM (
        |  SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn,
        |    COUNT(*) OVER () AS cnt FROM sl)
        |  WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)),
        |res AS (SELECT idx.x - med.m * idx.t AS r FROM idx, med),
        |ic AS (SELECT AVG(r) AS i FROM (
        |  SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rn,
        |    COUNT(*) OVER () AS cnt FROM res)
        |  WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2))
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM idx) AS n_days,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sl) AS n_pairs,
        |  CAST(ROUND(1000.0 * med.m) AS BIGINT) AS slope_milli,
        |  CAST(ROUND(1000.0 * ic.i) AS BIGINT) AS intercept_milli
        |FROM med, ic""".stripMargin,
    "q176_max_drawdown" ->
      """WITH d AS (SELECT event_type,
        |    CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) AS day_s,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(SUM(c) // COUNT(*) AS BIGINT) AS target_c
        |  FROM d GROUP BY 1),
        |r0 AS (SELECT d.event_type, day_s,
        |    SUM(c - target_c) OVER w AS cum
        |  FROM d JOIN t USING (event_type)
        |  WINDOW w AS (PARTITION BY d.event_type ORDER BY day_s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |r AS (SELECT event_type, day_s, cum,
        |    GREATEST(MAX(cum) OVER w, 0) AS peak
        |  FROM r0
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day_s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown_c,
        |  CAST(MAX(cum) AS BIGINT) AS peak_c
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q177_histogram_overlap" ->
      """WITH b AS (SELECT c_mktsegment AS seg,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) // 2500000 AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |t AS (SELECT seg, CAST(SUM(n) AS BIGINT) AS tot FROM b GROUP BY 1),
        |h AS (SELECT b.seg, b.bin, b.n, t.tot FROM b JOIN t USING (seg))
        |SELECT a.seg AS seg_a, c.seg AS seg_b,
        |  CAST(ROUND(10000.0 * SUM(LEAST(a.n * c.tot, c.n * a.tot))
        |    / (MAX(a.tot) * MAX(c.tot))) AS BIGINT) AS overlap_bp
        |FROM h a JOIN h c ON a.bin = c.bin AND a.seg < c.seg
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q175_cusum_drift" ->
      """WITH RECURSIVE d AS (SELECT event_type,
        |    CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) AS day_s,
        |    SUM(CAST(ROUND(value * 100) AS BIGINT)) // COUNT(*) AS x
        |  FROM events GROUP BY 1, 2),
        |q AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |    ORDER BY day_s) AS seq FROM d),
        |t AS (SELECT event_type, CAST(SUM(x) // COUNT(*) AS BIGINT) AS target_c,
        |    CAST(COUNT(*) AS BIGINT) AS n_days FROM d GROUP BY 1),
        |r AS (
        |  SELECT q.event_type, q.seq,
        |    GREATEST(q.x - t.target_c - t.target_c // 20, 0) AS c,
        |    GREATEST(q.x - t.target_c - t.target_c // 20, 0) AS maxc,
        |    CASE WHEN GREATEST(q.x - t.target_c - t.target_c // 20, 0)
        |           > t.target_c // 5 THEN 1 ELSE 0 END AS alarms
        |  FROM q JOIN t USING (event_type) WHERE q.seq = 1
        |  UNION ALL
        |  SELECT q.event_type, q.seq,
        |    GREATEST(r.c + q.x - t.target_c - t.target_c // 20, 0),
        |    GREATEST(r.maxc,
        |      GREATEST(r.c + q.x - t.target_c - t.target_c // 20, 0)),
        |    r.alarms + CASE WHEN
        |      GREATEST(r.c + q.x - t.target_c - t.target_c // 20, 0)
        |        > t.target_c // 5 THEN 1 ELSE 0 END
        |  FROM r JOIN q ON q.event_type = r.event_type AND q.seq = r.seq + 1
        |    JOIN t ON t.event_type = q.event_type)
        |SELECT t.event_type, t.n_days, t.target_c,
        |  CAST(r.maxc AS BIGINT) AS max_cusum_c,
        |  CAST(r.alarms AS BIGINT) AS n_alarm_days
        |FROM t JOIN r ON r.event_type = t.event_type AND r.seq = t.n_days
        |ORDER BY t.event_type""".stripMargin,
    "q167_sliding_window" ->
      """WITH e AS (SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS t, event_type,
        |    CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
        |x AS (SELECT event_type, c, ((t // 600) - k) * 600 AS window_s
        |  FROM e, unnest(generate_series(0, 2)) AS u(k))
        |SELECT window_s, event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(c) AS BIGINT) AS sum_cents
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q168_session_native" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS t_us FROM events),
        |f AS (SELECT user_id, t_us,
        |    CASE WHEN t_us - LAG(t_us) OVER (PARTITION BY user_id ORDER BY t_us)
        |           >= 1800000000 OR
        |         LAG(t_us) OVER (PARTITION BY user_id ORDER BY t_us) IS NULL
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |g AS (SELECT user_id, t_us,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY t_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f),
        |s AS (SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    MAX(t_us) // 1000000 - MIN(t_us) // 1000000 AS span_s
        |  FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(SUM(n_events) AS BIGINT) AS n_events,
        |  CAST(SUM(span_s) AS BIGINT) AS sum_span_s
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q162_linear_attribution" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
        |    CAST(ROUND(value * 100) AS BIGINT) AS v_c FROM events),
        |c AS (SELECT *,
        |    COALESCE(SUM(CASE WHEN event_type <> 'purchase' THEN 1 END)
        |      OVER w, 0) AS cnt_total,
        |    COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END)
        |      OVER w, 0) AS cnt_view,
        |    COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END)
        |      OVER w, 0) AS cnt_click,
        |    COALESCE(SUM(CASE WHEN event_type = 'signup' THEN 1 END)
        |      OVER w, 0) AS cnt_signup,
        |    COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 END)
        |      OVER w, 0) AS cnt_error
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |p AS (SELECT * FROM c WHERE event_type = 'purchase'),
        |x AS (
        |  SELECT 'view' AS channel, CASE WHEN cnt_total > 0
        |    THEN (v_c * 1000000 * cnt_view) // cnt_total ELSE 0 END AS credit
        |  FROM p
        |  UNION ALL SELECT 'click', CASE WHEN cnt_total > 0
        |    THEN (v_c * 1000000 * cnt_click) // cnt_total ELSE 0 END FROM p
        |  UNION ALL SELECT 'signup', CASE WHEN cnt_total > 0
        |    THEN (v_c * 1000000 * cnt_signup) // cnt_total ELSE 0 END FROM p
        |  UNION ALL SELECT 'error', CASE WHEN cnt_total > 0
        |    THEN (v_c * 1000000 * cnt_error) // cnt_total ELSE 0 END FROM p
        |  UNION ALL SELECT 'direct', CASE WHEN cnt_total = 0
        |    THEN v_c * 1000000 ELSE 0 END FROM p)
        |SELECT channel, CAST(SUM(credit) AS BIGINT) AS credit_microcents,
        |  CAST(SUM(CASE WHEN credit > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_credited_purchases
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    "q163_decayed_engagement" ->
      """WITH e AS (SELECT event_type,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
        |    CAST(ROUND(value * 100) AS BIGINT) AS v_c FROM events),
        |a AS (SELECT MAX(t) AS t_max FROM e),
        |d AS (SELECT event_type, v_c,
        |    v_c // (1 << LEAST((t_max - t) // 604800, 40)) AS decayed_c
        |  FROM e, a)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(v_c) AS BIGINT) AS raw_cents,
        |  CAST(SUM(decayed_c) AS BIGINT) AS decayed_cents
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q158_user_paths" ->
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS t, event_id FROM events),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY t, event_id) AS pos FROM e),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY pos) AS path
        |  FROM r WHERE pos <= 3 GROUP BY 1)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM p GROUP BY 1 ORDER BY n_users DESC, path LIMIT 20""".stripMargin,
    "q159_lift_curve" ->
      """WITH s AS (SELECT o_custkey,
        |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS spend_c
        |  FROM orders GROUP BY 1),
        |d AS (SELECT *, CAST(NTILE(10) OVER (
        |    ORDER BY spend_c DESC, o_custkey) AS BIGINT) AS decile FROM s),
        |bd AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |    CAST(SUM(spend_c) AS BIGINT) AS spend_c FROM d GROUP BY 1)
        |SELECT decile, n_customers, spend_c,
        |  CAST(ROUND(10000.0 * spend_c / SUM(spend_c) OVER ()) AS BIGINT)
        |    AS share_bp,
        |  CAST(ROUND(10000.0 * SUM(spend_c) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    / SUM(spend_c) OVER ()) AS BIGINT) AS cum_share_bp
        |FROM bd ORDER BY decile""".stripMargin,
    "q156_seasonal_anomaly" ->
      """WITH e AS (SELECT event_type, isodow(ts) AS dow,
        |    CAST(ROUND(value * 100) AS BIGINT) AS v_c FROM events),
        |md AS (SELECT dow,
        |    CAST(ROUND(quantile_cont(v_c, 0.5) * 100) AS BIGINT) AS med_cc
        |  FROM e GROUP BY 1),
        |r AS (SELECT e.event_type, e.v_c * 100 - md.med_cc AS resid_cc
        |  FROM e JOIN md ON e.dow = md.dow),
        |mad AS (SELECT event_type,
        |    CAST(ROUND(quantile_cont(abs(resid_cc), 0.5)) AS BIGINT) AS mad_cc
        |  FROM r GROUP BY 1)
        |SELECT r.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN abs(r.resid_cc) > (mad.mad_cc * 44478) // 10000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST(MAX(mad.mad_cc) AS BIGINT) AS mad_cc
        |FROM r JOIN mad ON r.event_type = mad.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q157_interarrival" ->
      """WITH t AS (SELECT user_id, event_id,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS t FROM events),
        |d AS (SELECT t - LAG(t) OVER (PARTITION BY user_id
        |    ORDER BY t, event_id) AS dt FROM t)
        |SELECT CAST(length(printf('%b', dt)) - 1 AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |  CAST(MIN(dt) AS BIGINT) AS min_gap_s,
        |  CAST(MAX(dt) AS BIGINT) AS max_gap_s
        |FROM d WHERE dt IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q153_first_touch" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
        |    CAST(ROUND(value * 100) AS BIGINT) AS v_c FROM events),
        |ft AS (SELECT user_id, event_type AS channel FROM (
        |    SELECT user_id, event_type, ROW_NUMBER() OVER (
        |      PARTITION BY user_id ORDER BY t, event_id) AS rn FROM e)
        |  WHERE rn = 1)
        |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  CAST(SUM(v_c) AS BIGINT) AS attributed_cents
        |FROM e JOIN ft USING (user_id)
        |WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q154_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |    CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d
        |  FROM events),
        |i AS (SELECT user_id,
        |    d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS island
        |  FROM d),
        |s AS (SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len
        |  FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
        |  CAST(MAX(len) AS BIGINT) AS max_streak_days
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q150_top_n_others" ->
      """WITH bb AS (SELECT c_mktsegment, p_brand,
        |    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS rev_c
        |  FROM lineitem
        |    JOIN orders ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |    ORDER BY rev_c DESC, p_brand) AS rk FROM bb),
        |lab AS (SELECT c_mktsegment,
        |    CASE WHEN rk <= 5 THEN p_brand ELSE 'OTHER' END AS label,
        |    CAST(SUM(rev_c) AS BIGINT) AS revenue_c,
        |    CAST(COUNT(*) AS BIGINT) AS n_brands
        |  FROM rk GROUP BY 1, 2)
        |SELECT c_mktsegment, label, revenue_c, n_brands,
        |  CAST(ROUND(10000.0 * revenue_c /
        |    SUM(revenue_c) OVER (PARTITION BY c_mktsegment)) AS BIGINT)
        |    AS share_bp
        |FROM lab ORDER BY c_mktsegment, revenue_c DESC, label""".stripMargin,
    "q136_survival" ->
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS t FROM events),
        |fv AS (SELECT user_id, MIN(t) AS v_t FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |fp AS (SELECT e.user_id, MIN(e.t) AS p_t FROM e JOIN fv USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.t > fv.v_t GROUP BY 1),
        |u AS (SELECT
        |    CASE WHEN fp.p_t IS NOT NULL
        |      THEN CAST(FLOOR((fp.p_t - fv.v_t) / 86400) AS BIGINT)
        |      ELSE CAST(FLOOR(((SELECT MAX(t) FROM e) - fv.v_t) / 86400) AS BIGINT)
        |    END AS end_day,
        |    fp.p_t IS NOT NULL AS converted
        |  FROM fv LEFT JOIN fp USING (user_id)),
        |pd AS (SELECT end_day, CAST(COUNT(*) AS BIGINT) AS n_end,
        |    CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS n_conv
        |  FROM u GROUP BY 1),
        |c AS (SELECT end_day, n_conv,
        |    COALESCE(CAST(SUM(n_end) OVER (ORDER BY end_day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |      AS ended_before
        |  FROM pd)
        |SELECT end_day AS day,
        |  (SELECT COUNT(*) FROM u) - ended_before AS n_at_risk,
        |  n_conv AS n_converted
        |FROM c WHERE n_conv > 0 ORDER BY day""".stripMargin,
    "q132_demand_correlation" ->
      """WITH e AS (SELECT CAST(FLOOR(epoch(date_trunc('week', ts))) AS BIGINT)
        |    AS week_s, event_type FROM events),
        |c AS (SELECT week_s, event_type, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM e GROUP BY 1, 2),
        |g AS (SELECT w.week_s, t.event_type, COALESCE(c.n, 0) AS n
        |      FROM (SELECT DISTINCT week_s FROM e) w
        |      CROSS JOIN (SELECT DISTINCT event_type FROM e) t
        |      LEFT JOIN c ON c.week_s = w.week_s AND c.event_type = t.event_type)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  COUNT(*) AS n_weeks,
        |  CAST(ROUND(corr(a.n, b.n) * 1e6) AS BIGINT) AS corr_e6
        |FROM g a JOIN g b ON a.week_s = b.week_s AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q133_rfm_segments" ->
      """WITH per AS (SELECT o_custkey,
        |    MAX(CAST(FLOOR(epoch(o_orderdate)) AS BIGINT)) AS last_s,
        |    COUNT(*) AS f,
        |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m
        |  FROM orders GROUP BY 1),
        |q AS (SELECT per.*,
        |    CAST(FLOOR(((SELECT MAX(last_s) FROM per) - last_s) / 86400) AS BIGINT)
        |      AS r_days
        |  FROM per),
        |n AS (SELECT m,
        |    NTILE(5) OVER (ORDER BY r_days, o_custkey) AS r_q,
        |    NTILE(5) OVER (ORDER BY f DESC, o_custkey) AS f_q,
        |    NTILE(5) OVER (ORDER BY m DESC, o_custkey) AS m_q
        |  FROM q)
        |SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
        |  CAST(m_q AS BIGINT) AS m_q,
        |  COUNT(*) AS n_customers, CAST(SUM(m) AS BIGINT) AS sum_cents
        |FROM n GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q134_abc_classification" ->
      """WITH rev AS (SELECT CAST(l_partkey AS BIGINT) AS p,
        |    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(SUM(x) AS BIGINT) AS total FROM rev),
        |c AS (SELECT x, CAST(SUM(x) OVER (ORDER BY x DESC, p
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM rev),
        |k AS (SELECT x,
        |    CASE WHEN cum * 10 <= (SELECT total FROM t) * 7 THEN 'A'
        |         WHEN cum * 10 <= (SELECT total FROM t) * 9 THEN 'B'
        |         ELSE 'C' END AS cls FROM c)
        |SELECT cls, COUNT(*) AS n_parts, CAST(SUM(x) AS BIGINT) AS revenue_cents,
        |  CAST(ROUND(10000.0 * SUM(x) / (SELECT total FROM t)) AS BIGINT)
        |    AS share_bp
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,
    "q129_cumulative_reach" ->
      """WITH fs AS (SELECT user_id,
        |    MIN(CAST(FLOOR(epoch(date_trunc('week', ts))) AS BIGINT)) AS first_week
        |  FROM events GROUP BY 1),
        |n AS (SELECT first_week, CAST(COUNT(*) AS BIGINT) AS n_new FROM fs GROUP BY 1)
        |SELECT first_week AS week_s, n_new,
        |  CAST(SUM(n_new) OVER (ORDER BY first_week
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS reach
        |FROM n ORDER BY week_s""".stripMargin,
    "q125_cohort_ltv" ->
      """WITH act AS (SELECT user_id,
        |    CAST(FLOOR(epoch(date_trunc('week', ts))) AS BIGINT) AS week_s,
        |    event_type, CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
        |co AS (SELECT user_id, MIN(week_s) AS cohort_s FROM act GROUP BY 1),
        |sz AS (SELECT cohort_s, CAST(COUNT(*) AS BIGINT) AS n_users FROM co GROUP BY 1),
        |sp AS (SELECT co.cohort_s,
        |    CAST(FLOOR((act.week_s - co.cohort_s) / 604800) AS BIGINT) AS k,
        |    CAST(SUM(c) AS BIGINT) AS wk_cents
        |  FROM act JOIN co ON act.user_id = co.user_id
        |  WHERE event_type = 'purchase' GROUP BY 1, 2),
        |cum AS (SELECT sp.*, sz.n_users,
        |    CAST(SUM(wk_cents) OVER (PARTITION BY sp.cohort_s ORDER BY k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
        |  FROM sp JOIN sz ON sp.cohort_s = sz.cohort_s)
        |SELECT cohort_s, k, wk_cents, cum_cents,
        |  CAST(ROUND(CAST(cum_cents AS DOUBLE) / n_users) AS BIGINT)
        |    AS ltv_per_user_cents
        |FROM cum ORDER BY cohort_s, k""".stripMargin,
    "q123_equifreq_binning" ->
      """WITH ev AS (SELECT event_type,
        |        CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
        |b AS (SELECT event_type, quantile_cont(c, 0.25) AS q1,
        |        quantile_cont(c, 0.5) AS q2, quantile_cont(c, 0.75) AS q3
        |      FROM ev GROUP BY 1)
        |SELECT ev.event_type,
        |  CAST(CASE WHEN c <= q1 THEN 1 WHEN c <= q2 THEN 2
        |       WHEN c <= q3 THEN 3 ELSE 4 END AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MIN(c) AS BIGINT) AS min_cents,
        |  CAST(MAX(c) AS BIGINT) AS max_cents
        |FROM ev JOIN b USING (event_type)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q323_ppi_estimate" -> {
      val seSql =
        """SQRT((CAST(f_all AS DOUBLE) / n_all)
          |      * (1.0 - CAST(f_all AS DOUBLE) / n_all) / n_all
          |    + (CAST(r_sq AS DOUBLE) / n_lab
          |       - (CAST(r_sum AS DOUBLE) / n_lab)
          |         * (CAST(r_sum AS DOUBLE) / n_lab)) / n_lab)""".stripMargin
      s"""WITH d AS (SELECT source, (doc_id % 20 = 0) AS lab,
        |    ${graft.llm.TextAnalysis.QualityGateSql} AS f,
        |    CASE WHEN ${graft.llm.TextAnalysis.QualityBpSql} >= 5500
        |         THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_all,
        |    CAST(SUM(f) AS BIGINT) AS f_all,
        |    CAST(SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS n_lab,
        |    CAST(SUM(CASE WHEN lab THEN f ELSE 0 END) AS BIGINT) AS f_lab,
        |    CAST(SUM(CASE WHEN lab THEN y ELSE 0 END) AS BIGINT) AS y_lab,
        |    CAST(SUM(CASE WHEN lab THEN y - f ELSE 0 END) AS BIGINT) AS r_sum,
        |    CAST(SUM(CASE WHEN lab THEN (y - f) * (y - f) ELSE 0 END) AS BIGINT) AS r_sq
        |  FROM d GROUP BY 1)
        |SELECT source, n_all, n_lab,
        |  CASE WHEN n_lab > 0 THEN CAST(ROUND(1e6 *
        |    (CAST(f_all AS DOUBLE) / n_all - CAST(f_lab AS DOUBLE) / n_lab
        |     + CAST(y_lab AS DOUBLE) / n_lab)) AS BIGINT) END AS ppi_micro,
        |  CASE WHEN n_lab > 0 THEN CAST(ROUND(1e6 * y_lab / n_lab) AS BIGINT)
        |    END AS classical_micro,
        |  CASE WHEN n_lab > 0 THEN CAST(ROUND(1e6 * $seSql) AS BIGINT)
        |    END AS se_micro,
        |  CASE WHEN n_lab > 0 THEN CAST(ROUND(1.96e6 * $seSql) AS BIGINT)
        |    END AS ci_half_micro
        |FROM g ORDER BY source""".stripMargin
    },
    "q324_conformal_coverage" ->
      s"""WITH d AS (SELECT doc_id, source,
        |    ${graft.llm.TextAnalysis.QualityBpSql} AS y,
        |    5000 + LEAST(len(string_split(text, ' ')), 100) * 10 AS yhat
        |  FROM documents),
        |n AS (SELECT doc_id, source, ABS(y - yhat) AS nc,
        |    (doc_id % 10 = 3) AS cal FROM d),
        |ca AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM n WHERE cal),
        |cum AS (SELECT nc, SUM(COUNT(*)) OVER (ORDER BY nc) AS cum
        |  FROM n WHERE cal GROUP BY nc),
        |qh AS (SELECT CAST(MIN(nc) AS BIGINT) AS qhat_bp,
        |    CAST(MAX(n_cal) AS BIGINT) AS n_cal
        |  FROM cum, ca WHERE cum >= ((n_cal + 1) * 9 + 9) // 10)
        |SELECT source, n_cal, qhat_bp,
        |  CAST(COUNT(*) AS BIGINT) AS n_test,
        |  CAST(SUM(CASE WHEN nc <= qhat_bp THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_covered,
        |  CAST(ROUND(10000.0 * SUM(CASE WHEN nc <= qhat_bp THEN 1 ELSE 0 END)
        |    / COUNT(*)) AS BIGINT) AS coverage_bp
        |FROM n, qh WHERE NOT cal AND qhat_bp IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY source""".stripMargin,
    "q317_bh_fdr" ->
      s"""WITH arms AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(${graft.llm.TextAnalysis.QualityGateSql}) AS BIGINT) AS x
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |    CAST(SUM(x) AS BIGINT) AS xx FROM arms),
        |t1 AS (SELECT arms.source, arms.n, arms.x, nn, xx,
        |    nn - n AS nr, xx - x AS xr FROM arms, tot
        |  WHERE n < nn AND xx > 0 AND xx < nn),
        |zz AS (SELECT source, n, x,
        |    ((CAST(x AS DOUBLE)/n) - (CAST(xr AS DOUBLE)/nr)) /
        |      SQRT((CAST(xx AS DOUBLE)/nn) * (1.0 - CAST(xx AS DOUBLE)/nn) *
        |        (1.0/n + 1.0/nr)) AS z
        |  FROM t1),
        |pp AS (SELECT source, n, x, z, ABS(z) AS az,
        |    1.0/(1.0 + 0.2316419*ABS(z)) AS kk FROM zz),
        |sc AS (SELECT source, n, x,
        |    CAST(ROUND(z * 1e6) AS BIGINT) AS z_micro,
        |    CAST(ROUND(2000000.0 * (0.3989422804014327 * EXP(az*az*(-0.5)) *
        |      (kk*(0.319381530 + kk*(-0.356563782 + kk*(1.781477937 +
        |       kk*(-1.821255978 + kk*1.330274429))))))) AS BIGINT) AS p_micro
        |  FROM pp),
        |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM sc),
        |rk AS (SELECT sc.*, m,
        |    CAST(ROW_NUMBER() OVER (ORDER BY p_micro, source) AS BIGINT) AS "rank"
        |  FROM sc, mm),
        |cr AS (SELECT *, CAST(ROUND(50000.0 * "rank" / m) AS BIGINT) AS crit_micro
        |  FROM rk),
        |ks AS (SELECT MAX("rank") AS kstar FROM cr WHERE p_micro <= crit_micro)
        |SELECT source, n, x, z_micro, p_micro, "rank", crit_micro,
        |  COALESCE("rank" <= kstar, false) AS rejected
        |FROM cr, ks ORDER BY "rank" """.stripMargin,
    "q118_ab_ztest" ->
      """WITH arms AS (SELECT CAST(user_id % 2 AS BIGINT) AS arm,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM events GROUP BY 1),
        |w AS (SELECT
        |    CAST(SUM(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN arm = 0 THEN k END) AS BIGINT) AS k0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN arm = 1 THEN k END) AS BIGINT) AS k1
        |  FROM arms)
        |SELECT n0, k0, n1, k1,
        |  CAST(ROUND(10000.0 * k0 / n0) AS BIGINT) AS rate0_bp,
        |  CAST(ROUND(10000.0 * k1 / n1) AS BIGINT) AS rate1_bp,
        |  CAST(ROUND(
        |    ((CAST(k0 AS DOUBLE) / n0) - (CAST(k1 AS DOUBLE) / n1)) /
        |      sqrt((CAST(k0 + k1 AS DOUBLE) / (n0 + n1)) *
        |        (1.0 - CAST(k0 + k1 AS DOUBLE) / (n0 + n1)) *
        |        (1.0 / n0 + 1.0 / n1)) * 1e6) AS BIGINT) AS z_e6
        |FROM w""".stripMargin,
    "q119_conversion_latency" ->
      """WITH e AS (SELECT user_id, event_type,
        |        CAST(FLOOR(epoch(date_trunc('second', ts))) AS BIGINT) AS t FROM events),
        |v AS (SELECT user_id, MIN(t) AS v_t FROM e WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(t) AS p_t, MIN(v_t) AS v_t
        |      FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE event_type = 'purchase' AND t > v_t GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
        |  CAST(ROUND(quantile_cont(p_t - v_t, 0.5)) AS BIGINT) AS p50_s,
        |  CAST(ROUND(quantile_cont(p_t - v_t, 0.9)) AS BIGINT) AS p90_s
        |FROM p""".stripMargin,
    "q117_concentration" ->
      """WITH spend AS (SELECT c_mktsegment, c_custkey,
        |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
        |rk AS (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY x, c_custkey) AS r,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY x DESC, c_custkey) AS rd
        |  FROM spend),
        |a AS (SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |    CAST(SUM(x) AS BIGINT) AS total, CAST(SUM(r * x) AS BIGINT) AS rx,
        |    CAST(SUM(CASE WHEN rd <= 10 THEN x ELSE 0 END) AS BIGINT) AS top10
        |  FROM rk GROUP BY 1)
        |SELECT c_mktsegment, n_customers,
        |  CAST(ROUND((2.0 * rx / (n_customers * total)
        |    - CAST(n_customers + 1 AS DOUBLE) / n_customers) * 1e6) AS BIGINT)
        |    AS gini_e6,
        |  CAST(ROUND(10000.0 * top10 / total) AS BIGINT) AS top10_share_bp
        |FROM a ORDER BY c_mktsegment""".stripMargin,
    "q115_chi_square" ->
      """WITH obs AS (SELECT c_mktsegment, o_orderpriority,
        |        CAST(COUNT(*) AS BIGINT) AS o
        |      FROM orders JOIN customer ON o_custkey = c_custkey
        |      GROUP BY 1, 2),
        |r AS (SELECT c_mktsegment, CAST(SUM(o) AS BIGINT) AS rt FROM obs GROUP BY 1),
        |c AS (SELECT o_orderpriority, CAST(SUM(o) AS BIGINT) AS ct FROM obs GROUP BY 1),
        |n AS (SELECT CAST(SUM(o) AS DOUBLE) AS nn FROM obs),
        |e AS (SELECT obs.o, r.rt * c.ct / (SELECT nn FROM n) AS exp
        |      FROM obs JOIN r USING (c_mktsegment) JOIN c USING (o_orderpriority))
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
        |  CAST(ROUND(SUM((o - exp) * (o - exp) / exp) * 1e6) AS BIGINT) AS chi2_e6
        |FROM e""".stripMargin,
    "q113_winsorized_mean" ->
      """WITH ev AS (SELECT event_type,
        |        CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
        |b AS (SELECT event_type, quantile_cont(c, 0.05) AS lo,
        |        quantile_cont(c, 0.95) AS hi FROM ev GROUP BY 1)
        |SELECT ev.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(AVG(LEAST(GREATEST(CAST(c AS DOUBLE), lo), hi)) * 100)
        |    AS BIGINT) AS wmean_centi
        |FROM ev JOIN b USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q109_tumbling_windows" ->
      """SELECT CAST(FLOOR(epoch(date_trunc('second', ts)) / 600) * 600 AS BIGINT)
        |    AS window_s,
        |  event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1, 2 ORDER BY window_s, event_type""".stripMargin,
    "q104_trend" ->
      """WITH ev AS (SELECT event_type,
        |        CAST(FLOOR(epoch(date_trunc('second', ts)) / 86400) AS BIGINT) AS x,
        |        CAST(ROUND(value * 100) AS BIGINT) AS y FROM events),
        |s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |        CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
        |      FROM ev GROUP BY 1),
        |s2 AS (SELECT event_type, n, sx, sy,
        |        CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
        |        CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS d
        |      FROM s)
        |SELECT event_type, n,
        |  CASE WHEN d <> 0 THEN
        |    CAST(ROUND(1e6 * CAST(num AS DOUBLE)
        |      / CAST(d AS DOUBLE)) AS BIGINT) ELSE 0 END AS slope_e6,
        |  CASE WHEN d <> 0 THEN
        |    CAST(ROUND((sy - CAST(num AS DOUBLE)
        |      / CAST(d AS DOUBLE) * sx) / n) AS BIGINT)
        |  ELSE CAST(ROUND(CAST(sy AS DOUBLE) / n) AS BIGINT)
        |  END AS intercept_cents
        |FROM s2 ORDER BY event_type""".stripMargin,
    "q105_week_over_week" ->
      """WITH wk AS (SELECT event_type,
        |    CAST(FLOOR(epoch(date_trunc('week', ts))) AS BIGINT) AS week_s,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT *, LAG(sum_cents) OVER
        |        (PARTITION BY event_type ORDER BY week_s) AS prev_cents FROM wk)
        |SELECT event_type, week_s, sum_cents, prev_cents,
        |  CASE WHEN prev_cents IS NOT NULL AND prev_cents <> 0
        |       THEN CAST(ROUND(10000.0 * (sum_cents - prev_cents) / prev_cents)
        |            AS BIGINT) END AS delta_bp
        |FROM l ORDER BY event_type, week_s""".stripMargin,
    "q100_robust_outliers" ->
      """WITH ev AS (SELECT event_type,
        |        CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
        |med AS (SELECT event_type, quantile_cont(c, 0.5) AS med FROM ev GROUP BY 1),
        |wm AS (SELECT ev.event_type, c, med FROM ev JOIN med USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(abs(c - med), 0.5) AS mad
        |        FROM wm GROUP BY 1)
        |SELECT wm.event_type,
        |  CAST(ROUND(MAX(med) * 100) AS BIGINT) AS med_centi,
        |  CAST(ROUND(MAX(mad) * 100) AS BIGINT) AS mad_centi,
        |  CAST(SUM(CASE WHEN abs(c - med) > mad * 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM wm JOIN mad USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q101_twap" ->
      """WITH p AS (SELECT user_id,
        |        CAST(FLOOR(epoch(date_trunc('second', ts))) AS BIGINT) AS t,
        |        event_id, CAST(ROUND(value * 100) AS BIGINT) AS c
        |      FROM events WHERE event_type = 'purchase'),
        |l AS (SELECT user_id, t, c,
        |        LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS t_next
        |      FROM p),
        |s AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
        |        CAST(SUM(c * (t_next - t)) AS BIGINT) AS num,
        |        CAST(SUM(t_next - t) AS BIGINT) AS den
        |      FROM l WHERE t_next IS NOT NULL GROUP BY 1)
        |SELECT user_id, n_segments,
        |  CAST(ROUND(100.0 * num / den) AS BIGINT) AS twap_centicents
        |FROM s WHERE den > 0 ORDER BY user_id""".stripMargin,
    "q97_rolling_distinct" ->
      """WITH du AS (SELECT DISTINCT
        |    CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) AS d, user_id
        |  FROM events WHERE event_type = 'purchase'),
        |days AS (SELECT DISTINCT d FROM du),
        |f AS (SELECT du.user_id, days.d AS anchor FROM du
        |      JOIN days ON days.d BETWEEN du.d AND du.d + 6 * 86400)
        |SELECT anchor AS day_s, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_7d
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "q98_dense_grid" ->
      """WITH e AS (SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) AS d,
        |        event_type FROM events),
        |c AS (SELECT d, event_type, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
        |days AS (SELECT DISTINCT d FROM e),
        |types AS (SELECT DISTINCT event_type FROM e)
        |SELECT days.d AS day_s, types.event_type AS event_type,
        |  COALESCE(c.n, 0) AS n
        |FROM days CROSS JOIN types
        |LEFT JOIN c ON c.d = days.d AND c.event_type = types.event_type
        |ORDER BY day_s, event_type""".stripMargin,
    "q88_incremental_agg" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(c) AS BIGINT) AS sum_cents,
        |  CAST(MIN(c) AS BIGINT) AS min_cents,
        |  CAST(MAX(c) AS BIGINT) AS max_cents,
        |  CAST(ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*)) AS BIGINT) AS avg_cents
        |FROM (SELECT o_orderpriority,
        |        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q90_group_sample" ->
      """WITH h AS (SELECT event_type, event_id,
        |    CAST('0x' || substring(md5('g' || CAST(event_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS hk FROM events),
        |r AS (SELECT event_type, event_id, ROW_NUMBER() OVER
        |        (PARTITION BY event_type ORDER BY hk, event_id) AS rn FROM h)
        |SELECT event_type, CAST(rn AS BIGINT) AS rn, event_id
        |FROM r WHERE rn <= 5 ORDER BY event_type, rn""".stripMargin,
    "q91_markov" ->
      """WITH e AS (SELECT user_id,
        |    CAST(FLOOR(epoch(date_trunc('second', ts))) AS BIGINT) AS t,
        |    event_id, event_type FROM events),
        |l AS (SELECT *, LAG(event_type) OVER
        |        (PARTITION BY user_id ORDER BY t, event_id) AS prev FROM e),
        |m AS (SELECT prev, event_type, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM l WHERE prev IS NOT NULL GROUP BY 1, 2)
        |SELECT prev AS from_type, event_type AS to_type, n,
        |  CAST(ROUND(10000.0 * n / SUM(n) OVER (PARTITION BY prev)) AS BIGINT) AS p_bp
        |FROM m ORDER BY from_type, to_type""".stripMargin,
    "q79_gap_fill" ->
      """WITH p AS (SELECT user_id, CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS h,
        |        ts, event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
        |      FROM events WHERE event_type = 'purchase'),
        |hv AS (SELECT user_id, h, cents FROM
        |        (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, h
        |                ORDER BY ts DESC, event_id DESC) AS rn FROM p) WHERE rn = 1),
        |b AS (SELECT user_id, MIN(h) AS mn, MAX(h) AS mx FROM p GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(mn, mx, 3600)) AS h FROM b),
        |f AS (SELECT g.user_id, g.h, hv.cents FROM grid g
        |      LEFT JOIN hv ON g.user_id = hv.user_id AND g.h = hv.h)
        |SELECT user_id, h AS hour_s,
        |  CAST(last_value(cents IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cents_filled,
        |  (cents IS NOT NULL) AS observed
        |FROM f ORDER BY user_id, hour_s""".stripMargin,
    "q77_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |        CAST(FLOOR(epoch(date_trunc('second', ts))) AS BIGINT) AS t FROM events),
        |v AS (SELECT user_id, MIN(t) AS v_t FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(t) AS c_t FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE event_type = 'click' AND t > v_t GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(t) AS p_t FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE event_type = 'purchase' AND t > c_t GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS name,
        |  CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_users
        |UNION ALL SELECT 2, 'click', CAST((SELECT COUNT(*) FROM c) AS BIGINT)
        |UNION ALL SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM p) AS BIGINT)
        |ORDER BY stage""".stripMargin,
    "q78_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |        CAST(FLOOR(epoch(date_trunc('week', ts))) AS BIGINT) AS week_s FROM events),
        |co AS (SELECT user_id, MIN(week_s) AS cohort_s FROM a GROUP BY 1)
        |SELECT co.cohort_s, a.week_s, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM a JOIN co ON a.user_id = co.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q76_global_rank" ->
      """SELECT event_id, CAST(FLOOR(epoch(date_trunc('second', ts))) AS BIGINT) AS ts_s,
        |  CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
        |  ROW_NUMBER() OVER (ORDER BY date_trunc('second', ts), event_id) AS global_rank
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY global_rank""".stripMargin,
    "q72_error_bursts" ->
      """WITH e AS (SELECT user_id, event_id, date_trunc('second', ts) AS t,
        |        event_type = 'error' AS is_err FROM events),
        |m AS (SELECT user_id, event_id, t, is_err,
        |        LAG(is_err) OVER w AS prev_err,
        |        epoch(t) - epoch(LAG(t) OVER w) AS gap_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |r AS (SELECT *, CASE WHEN is_err
        |          AND NOT (COALESCE(prev_err, FALSE) AND gap_s <= 86400)
        |        THEN 1 ELSE 0 END AS new_run FROM m),
        |s AS (SELECT *, SUM(new_run) OVER (PARTITION BY user_id ORDER BY t, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id FROM r)
        |SELECT user_id,
        |  CAST(FLOOR(epoch(MIN(t))) AS BIGINT) AS start_s,
        |  CAST(FLOOR(epoch(MAX(t))) AS BIGINT) AS end_s,
        |  CAST(COUNT(*) AS BIGINT) AS n_errors
        |FROM s WHERE is_err GROUP BY user_id, run_id HAVING COUNT(*) >= 3
        |ORDER BY user_id, start_s""".stripMargin,
    "q57_topk_native" ->
      """WITH r AS (SELECT user_id, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY value DESC, event_id) AS rank
        |  FROM events)
        |SELECT user_id, rank, event_id,
        |  CAST(ROUND(value * 100) AS BIGINT) AS value_cents
        |FROM r WHERE rank <= 3 ORDER BY user_id, rank""".stripMargin,
    "q47_grouping_sets" ->
      """SELECT event_type, isodow, COUNT(*) AS n,
        |  CAST(SUM(c) AS BIGINT) AS sum_cents,
        |  CAST(GROUPING(event_type) * 2 + GROUPING(isodow) AS INT) AS lvl
        |FROM (SELECT event_type, isodow(ts) AS isodow,
        |        CAST(ROUND(value * 100) AS BIGINT) AS c FROM events)
        |GROUP BY GROUPING SETS ((event_type, isodow), (event_type), (isodow), ())
        |ORDER BY lvl, event_type, isodow""".stripMargin,
    "q48_range_window" ->
      """SELECT event_id, user_id, ts_s,
        |  COUNT(*) OVER w AS n_1h, CAST(SUM(c) OVER w AS BIGINT) AS sum_cents_1h
        |FROM (SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s,
        |        CAST(ROUND(value * 100) AS BIGINT) AS c FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q40_stats" ->
      """WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(c AS DECIMAL(38,0))) AS sc,
        |    SUM(CAST(c AS DECIMAL(38,0)) * c) AS scc,
        |    SUM(CAST(user_id AS DECIMAL(38,0))) AS su,
        |    SUM(CAST(user_id AS DECIMAL(38,0)) * user_id) AS suu,
        |    SUM(CAST(c AS DECIMAL(38,0)) * user_id) AS scu
        |  FROM (SELECT event_type, user_id,
        |          CAST(ROUND(value*100) AS BIGINT) AS c FROM events)
        |  GROUP BY event_type)
        |SELECT event_type,
        |  CASE WHEN n > 1 THEN
        |    CAST(ROUND(SQRT(CAST(CAST(n AS DECIMAL(38,0)) * scc
        |        - CAST(sc AS DECIMAL(38,0)) * sc AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (n - 1)))) AS BIGINT) END AS sd,
        |  CASE WHEN CAST(n AS DECIMAL(38,0)) * scc
        |        - CAST(sc AS DECIMAL(38,0)) * sc > 0
        |      AND CAST(n AS DECIMAL(38,0)) * suu
        |        - CAST(su AS DECIMAL(38,0)) * su > 0 THEN
        |    CAST(ROUND(1e6 * CAST(CAST(n AS DECIMAL(38,0)) * scu
        |        - CAST(sc AS DECIMAL(38,0)) * su AS DOUBLE)
        |      / SQRT(CAST(CAST(n AS DECIMAL(38,0)) * scc
        |          - CAST(sc AS DECIMAL(38,0)) * sc AS DOUBLE)
        |        * CAST(CAST(n AS DECIMAL(38,0)) * suu
        |          - CAST(su AS DECIMAL(38,0)) * su AS DOUBLE))) AS BIGINT)
        |    END AS cr,
        |  n
        |FROM g ORDER BY event_type""".stripMargin,
    "q37_sessionize" ->
      """WITH o AS (SELECT user_id, date_trunc('second', ts) AS t FROM events),
        |  l AS (SELECT user_id, t,
        |    LAG(t) OVER (PARTITION BY user_id ORDER BY t) AS prev FROM o),
        |  m AS (SELECT user_id, t,
        |    CASE WHEN prev IS NULL OR epoch(t) - epoch(prev) > 1800
        |         THEN 1 ELSE 0 END AS is_new FROM l),
        |  s AS (SELECT user_id, t,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM m)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  COUNT(*) AS n_events,
        |  CAST(FLOOR(epoch(MIN(t))) AS BIGINT) AS session_start_s,
        |  CAST(FLOOR(epoch(MAX(t))) - FLOOR(epoch(MIN(t))) AS BIGINT) AS duration_s
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q64_sampled_quantiles" ->
      """WITH ev AS (SELECT event_id, event_type,
        |    CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events),
        |s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sampled,
        |    CAST(ROUND(quantile_cont(cents, 0.5) * 100) AS BIGINT) AS p50_centi,
        |    CAST(ROUND(quantile_cont(cents, 0.9) * 100) AS BIGINT) AS p90_centi
        |  FROM ev
        |  WHERE CAST('0x' || substring(md5('s' || CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 10
        |  GROUP BY event_type),
        |x AS (SELECT event_type,
        |    CAST(ROUND(quantile_cont(cents, 0.5) * 100) AS BIGINT) AS p50_exact_centi
        |  FROM ev GROUP BY event_type)
        |SELECT s.event_type, n_sampled, p50_centi, p90_centi, p50_exact_centi
        |FROM s JOIN x USING (event_type) ORDER BY event_type""".stripMargin,
    "q38_percentiles" ->
      """SELECT event_type,
        |  CAST(ROUND(quantile_cont(cents, 0.5) * 100) AS BIGINT) AS p50_centi,
        |  CAST(ROUND(quantile_cont(cents, 0.9) * 100) AS BIGINT) AS p90_centi,
        |  CAST(ROUND(quantile_cont(cents, 0.99) * 100) AS BIGINT) AS p99_centi
        |FROM (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS cents FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q36_tz_convert" ->
      """WITH p AS (SELECT CAST(timezone('Europe/Paris', timezone('UTC', ts)) AS TIMESTAMP) AS paris_ts
        |  FROM events)
        |SELECT hour(paris_ts) AS paris_hh, COUNT(*) AS n,
        |  CAST(MIN(FLOOR(epoch(paris_ts))) AS BIGINT) AS min_paris_s,
        |  CAST(MAX(FLOOR(epoch(paris_ts))) AS BIGINT) AS max_paris_s
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q31_asof_join" ->
      """WITH c AS (SELECT user_id, date_trunc('second', ts) AS cts,
        |    MAX(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |  p AS (SELECT user_id, date_trunc('second', ts) AS pts,
        |    event_id AS purchase_id
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id,
        |  CAST(FLOOR(epoch(p.pts)) AS BIGINT) AS purchase_ts_s,
        |  c.click_id,
        |  CAST(FLOOR(epoch(c.cts)) AS BIGINT) AS click_ts_s
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.cts <= p.pts
        |ORDER BY purchase_id""".stripMargin,
    "q32_pivot" ->
      """SELECT hour(ts) AS hh,
        |  CAST(COALESCE(SUM(CASE WHEN isodow(ts) = 1 THEN 1 END), 0) AS BIGINT) AS d1,
        |  CAST(COALESCE(SUM(CASE WHEN isodow(ts) = 2 THEN 1 END), 0) AS BIGINT) AS d2,
        |  CAST(COALESCE(SUM(CASE WHEN isodow(ts) = 3 THEN 1 END), 0) AS BIGINT) AS d3,
        |  CAST(COALESCE(SUM(CASE WHEN isodow(ts) = 4 THEN 1 END), 0) AS BIGINT) AS d4,
        |  CAST(COALESCE(SUM(CASE WHEN isodow(ts) = 5 THEN 1 END), 0) AS BIGINT) AS d5,
        |  CAST(COALESCE(SUM(CASE WHEN isodow(ts) = 6 THEN 1 END), 0) AS BIGINT) AS d6,
        |  CAST(COALESCE(SUM(CASE WHEN isodow(ts) = 7 THEN 1 END), 0) AS BIGINT) AS d7
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q33_rollup" ->
      """SELECT event_type, isodow, COUNT(*) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
        |  CAST(GROUPING(event_type) * 2 + GROUPING(isodow) AS INT) AS lvl
        |FROM (SELECT event_type, isodow(ts) AS isodow,
        |        CAST(ROUND(value*100) AS BIGINT) AS cents FROM events)
        |GROUP BY ROLLUP(event_type, isodow)
        |ORDER BY lvl, event_type, isodow""".stripMargin,
    "q29_gtfs_time" ->
      """WITH t AS (SELECT event_type,
        |    CASE WHEN user_id % 97 = 0 THEN 'not-a-time'
        |         ELSE printf('%d:%02d:%02d', 20 + user_id % 10, event_id % 60, user_id % 60)
        |    END AS ts FROM events),
        |  p AS (SELECT event_type,
        |    TRY_CAST(split_part(ts, ':', 1) AS BIGINT) * 3600
        |      + TRY_CAST(split_part(ts, ':', 2) AS BIGINT) * 60
        |      + TRY_CAST(split_part(ts, ':', 3) AS BIGINT) AS secs
        |  FROM t)
        |SELECT event_type,
        |  COUNT(secs) AS n_valid, COUNT(*) - COUNT(secs) AS n_malformed,
        |  CAST(SUM(secs) AS BIGINT) AS sum_s, MIN(secs) AS min_s, MAX(secs) AS max_s
        |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q08_window_latest" ->
      """SELECT user_id, event_id, event_type,
        |  CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s
        |FROM (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "q09_window_lag" ->
      """SELECT user_id, event_id, value_cents,
        |  value_cents - LAG(value_cents, 1) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS delta_cents
        |FROM (SELECT *, CAST(ROUND(value*100) AS BIGINT) AS value_cents
        |      FROM events WHERE event_type = 'purchase')
        |ORDER BY user_id, event_id""".stripMargin,
    "q10_window_running" ->
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS running_cents
        |FROM events WHERE user_id < 20
        |ORDER BY user_id, event_id""".stripMargin,
    "q11_set_ops" ->
      """WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type='click'),
        |     e AS (SELECT DISTINCT user_id FROM events WHERE event_type='error')
        |SELECT 'click_no_error' AS grp, user_id FROM (SELECT user_id FROM c EXCEPT SELECT user_id FROM e)
        |UNION ALL
        |SELECT 'both' AS grp, user_id FROM (SELECT user_id FROM c INTERSECT SELECT user_id FROM e)
        |ORDER BY grp, user_id""".stripMargin,
    "q12_incremental_watermark" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(MIN(FLOOR(epoch(ts))) AS BIGINT) AS min_ts_s,
        |  CAST(MAX(FLOOR(epoch(ts))) AS BIGINT) AS max_ts_s
        |FROM events
        |WHERE date_trunc('second', ts) > COALESCE(
        |  (SELECT MAX(date_trunc('second', ts)) FROM events
        |   WHERE event_type = 'signup' AND ts < TIMESTAMP '2024-01-25'),
        |  TIMESTAMP '1900-01-01')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q13_heatmap" ->
      """SELECT isodow(ts) AS isodow, hour(ts) AS hh, COUNT(*) AS n,
        |  AVG(CAST(ROUND(value*100) AS BIGINT)) AS avg_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q14_histogram" ->
      """SELECT CAST(FLOOR(value/10) AS BIGINT) AS bucket, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q15_punctuality" ->
      """SELECT event_type,
        |  CAST(SUM(CASE WHEN value <= 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS on_time,
        |  COUNT(*) AS total,
        |  CAST(ROUND(SUM(CASE WHEN value <= 50.0 THEN 1 ELSE 0 END) * 10000.0
        |             / COUNT(*)) AS BIGINT) AS rate_bp
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q16_json_extract" ->
      """SELECT event_type,
        |  CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k,
        |  CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(*) AS n
        |FROM (SELECT event_type,
        |        TRY_CAST(regexp_extract(props, '(\d+)', 1) AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q17_latest_dim" ->
      """SELECT o_custkey,
        |  arg_max(CAST(ROUND(o_totalprice*100) AS BIGINT), o_orderkey) AS latest_price_cents,
        |  MAX(o_orderkey) AS latest_orderkey
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q18_dedup_first_wins" ->
      """SELECT user_id, event_type,
        |  MIN(event_id) AS first_event_id,
        |  arg_min(CAST(ROUND(value*100) AS BIGINT), event_id) AS first_value_cents,
        |  COUNT(*) AS n_dups
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin)
}
