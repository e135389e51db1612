package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.{cents, load}

/** Temporal join operators beyond the as-of join (q31): interval
  * (range-overlap) joins and SCD2 point-in-time dimension lookups —
  * the two remaining time-travel shapes a warehouse KPI layer needs
  * (the reference's delay dashboards, README.md:118-129, all reduce
  * to "what was true at time t" / "what happened around time t").
  *
  * Both are written so the non-equi predicate never degenerates into
  * a cartesian product:
  *  - the interval join buckets time and equi-joins on the bucket id
  *    (the standard bin-and-verify range-join plan), with the tiny
  *    side broadcast;
  *  - the point-in-time join rides the user_id equi-key and applies
  *    the interval predicate as a post-join filter over the ~tens of
  *    versions per key.
  */
object Temporal {

  /** Incident window half-width and the bucket size (equal so a
    * window spans at most 3 buckets).
    */
  final val WindowS = 300L
  final val Incidents = 20

  /** q60 — interval/range join: the 20 highest-value error events
    * define ±5-minute incident windows; count the events (and
    * distinct affected users) inside each window.
    *
    * Plan: events bucketed by floor(ts/300) — a pure projection; the
    * incident side explodes into its ≤3 covered buckets and is
    * BROADCAST, so the fact stream is never shuffled at all; the
    * exact [lo, hi] containment runs as a post-join filter. At 100 TB
    * this is the only interval-join plan that works: the alternative
    * theta-join is a cartesian per time-overlap.
    */
  def q60_interval_join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = load(spark, dir, "events")
      .select($"event_id", $"user_id", $"event_type",
        unix_timestamp(date_trunc("second", $"ts")).as("ts_s"),
        cents($"value").as("v_cents"))
    val incidents = ev.filter($"event_type" === "error")
      .orderBy($"v_cents".desc, $"event_id")
      .limit(Incidents)
      .select($"event_id".as("incident_id"),
        ($"ts_s" - WindowS).as("lo"), ($"ts_s" + WindowS).as("hi"))
    val incidentBuckets = incidents
      .withColumn("bucket",
        explode(sequence(expr(s"lo DIV $WindowS"), expr(s"hi DIV $WindowS"))))
    ev.withColumn("bucket", expr(s"ts_s DIV $WindowS"))
      .join(broadcast(incidentBuckets), "bucket")
      .filter($"ts_s".between($"lo", $"hi"))
      .groupBy($"incident_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"incident_id")
  }

  /** q61 — SCD2 build + point-in-time join: signup/error events are
    * state-change markers; lead() over each user's marker sequence
    * turns the log into [from, to) validity intervals (the
    * slowly-changing-dimension type-2 build); every purchase is then
    * joined to the version that was active when it happened.
    *
    * The join is equi on user_id (high-cardinality, evenly sharded);
    * the interval predicate filters the per-user version list.
    * Purchases before a user's first marker carry no state and are
    * dropped (inner join) — the SQL-standard PIT shape.
    */
  def q61_scd2_pit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = load(spark, dir, "events")
      .select($"event_id", $"user_id", $"event_type",
        unix_timestamp(date_trunc("second", $"ts")).as("ts_s"))
    val w = Window.partitionBy($"user_id").orderBy($"ts_s", $"event_id")
    val dim = ev.filter($"event_type".isin("signup", "error"))
      .withColumn("to_s", lead($"ts_s", 1).over(w))
      .select($"user_id", $"event_type".as("state"),
        $"ts_s".as("from_s"), $"to_s")
    ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_s")
      .join(dim, Seq("user_id"))
      .filter($"ts_s" >= $"from_s" && ($"to_s".isNull || $"ts_s" < $"to_s"))
      .select($"event_id", $"user_id", $"state", $"from_s")
      .orderBy($"event_id")
  }

  /** Key offset that makes a deterministic subset of the update batch
    * target keys absent from the base (the INSERT arm of the merge);
    * far above any harness custkey.
    */
  final val InsertOffset = 200000L
  final val InsertStride = 37

  /** q69 — MERGE / upsert (SCD1): apply a batch of keyed updates to a
    * base snapshot with latest-wins-within-batch semantics — the
    * incremental "apply the day's changes" operator every warehouse
    * table needs (the reference's K4 incremental INSERT…SELECT is the
    * append-only cousin; this is the in-place-semantics one).
    * Base = customer balances; updates = order totals keyed by
    * customer, deduped to the latest (o_orderdate, o_orderkey) per key
    * via a ranking window on the high-cardinality key; a strided
    * subset of keys is offset out of the base's key space to exercise
    * the INSERT arm. The merge itself is one full-outer equi-join on
    * the key: matched → update, update-only → insert, base-only →
    * keep. Scale: both sides shuffle once on the merge key (or zero
    * times if the base is bucketed on it — q66); the window never
    * sees more than the update batch.
    */
  def q69_merge_upsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = load(spark, dir, "customer")
      .select($"c_custkey".cast("long").as("k"),
        cents($"c_acctbal").as("bal_cents"), lit(true).as("in_base"))
    val ords = load(spark, dir, "orders")
      .select($"o_custkey".cast("long").as("ck"), $"o_orderdate", $"o_orderkey",
        cents($"o_totalprice").as("upd_cents"))
    val updates = ords.select($"ck".as("k"), $"o_orderdate", $"o_orderkey", $"upd_cents")
      .union(ords.filter($"ck" % InsertStride === 0)
        .select(($"ck" + InsertOffset).as("k"), $"o_orderdate", $"o_orderkey", $"upd_cents"))
    val latest = updates
      .withColumn("rn", row_number().over(
        Window.partitionBy($"k").orderBy($"o_orderdate".desc, $"o_orderkey".desc)))
      .filter($"rn" === 1)
      .select($"k", $"upd_cents", lit(true).as("in_upd"))
    base.join(latest, Seq("k"), "full_outer")
      .select($"k",
        coalesce($"upd_cents", $"bal_cents").cast("long").as("bal_cents"),
        when($"in_upd".isNull, "keep")
          .when($"in_base".isNull, "insert")
          .otherwise("update").as("action"))
      .orderBy($"k")
  }

  /** q110 — sweep-line peak concurrency: the maximum number of
    * lineitems simultaneously in transit per supplier nation
    * (interval = shipdate → shipdate + a deterministic per-line
    * transit duration; the harness lineitem has no receiptdate). The classic interval-overlap question
    * without sorting events globally: intervals reduce to per-(nation,
    * day) +start/−end deltas in ONE aggregate over the fact scan, the
    * cumulative sum runs over the BOUNDED (nation × days) delta table,
    * and the peak is a plain max — no global-order window ever touches
    * fact rows. Ties on the peak resolve to the earliest day.
    */
  def q110_peak_concurrency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = load(spark, dir, "lineitem")
      .join(broadcast(load(spark, dir, "supplier")
        .select($"s_suppkey", $"s_nationkey")), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(load(spark, dir, "nation")
        .select($"n_nationkey", $"n_name")), $"s_nationkey" === $"n_nationkey")
      .select($"n_name",
        unix_timestamp(date_trunc("day", $"l_shipdate")).as("d0"),
        (unix_timestamp(date_trunc("day", $"l_shipdate"))
          + ($"l_linenumber" % 14 + 1) * 86400L).as("d1"))
    val deltas = li
      .select($"n_name", explode(array(
        struct($"d0".as("day_s"), lit(1L).as("delta")),
        struct($"d1".as("day_s"), lit(-1L).as("delta")))).as("e"))
      .groupBy($"n_name", $"e.day_s").agg(sum($"e.delta").as("delta"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"n_name").orderBy($"day_s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val active = deltas.withColumn("active", sum($"delta").over(w))
    val byPeak = org.apache.spark.sql.expressions.Window
      .partitionBy($"n_name").orderBy($"active".desc, $"day_s")
    active.withColumn("rn", row_number().over(byPeak)).filter($"rn" === 1)
      .select($"n_name", $"active".as("peak_active"), $"day_s".as("peak_day_s"))
      .orderBy($"n_name")
  }

  /** q126 — backlog curve: cumulative lineitems ordered vs shipped
    * per week, and the open backlog between them — the operational
    * balance every fulfillment dashboard tracks. Both series reduce
    * to per-week counts in one union-all aggregate (the q110 delta
    * idea with two signs); the cumulative window runs over the
    * bounded week table only (a few hundred rows for any calendar
    * range — the q83-style accepted global window over a pre-bounded
    * aggregate).
    */
  def q126_backlog(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = load(spark, dir, "lineitem")
      .join(load(spark, dir, "orders").select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
    val deltas = li.select(
        unix_timestamp(date_trunc("week", $"o_orderdate")).as("week_s"),
        lit(1L).as("ordered"), lit(0L).as("shipped"))
      .unionByName(li.select(
        unix_timestamp(date_trunc("week", $"l_shipdate")).as("week_s"),
        lit(0L).as("ordered"), lit(1L).as("shipped")))
      .groupBy($"week_s")
      .agg(sum($"ordered").as("n_ordered"), sum($"shipped").as("n_shipped"))
    val w = Window.orderBy($"week_s")
      .rowsBetween(Window.unboundedPreceding, 0)
    deltas
      .withColumn("cum_ordered", sum($"n_ordered").over(w))
      .withColumn("cum_shipped", sum($"n_shipped").over(w))
      .withColumn("backlog", $"cum_ordered" - $"cum_shipped")
      .orderBy($"week_s")
  }

  /** q140 — feed-gap audit: per day, the minute-resolution holes in
    * the purchase event stream (gap count, total missing minutes,
    * longest outage). The operational freshness check behind the
    * reference's 2-minute RT cadence (`gtfs_rt_minutely.py:262` — a
    * missed poll IS a minute gap). Scale shape: the stream reduces to
    * DISTINCT (day, minute) — bounded at 1440 rows per day whatever
    * the event rate — and the lag window runs inside day partitions
    * of that bounded set only. All integer arithmetic.
    */
  def q140_feed_gaps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val minutes = load(spark, dir, "events")
      .filter($"event_type" === "purchase")
      .select(unix_timestamp(date_trunc("day", $"ts")).as("day_s"),
        floor(unix_timestamp($"ts") / 60L).as("m"))
      .distinct()
    val w = Window.partitionBy($"day_s").orderBy($"m")
    minutes
      .withColumn("gap", $"m" - lag($"m", 1).over(w) - 1L)
      .groupBy($"day_s")
      .agg(sum(when($"gap" > 0, 1L).otherwise(0L)).as("n_gaps"),
        coalesce(sum(when($"gap" > 0, $"gap")), lit(0L)).as("missing_minutes"),
        coalesce(max(when($"gap" > 0, $"gap")), lit(0L)).as("max_gap_minutes"))
      .orderBy($"day_s")
  }

  /** q143 — calendar spine (dim_date build): the full day dimension
    * spanning the fact table's date range, generated with a bounded
    * `sequence` explode from a 1-row min/max aggregate — never a
    * recursive loop or a driver-side range — then audited against
    * actual order days per month (days, weekend days, days with
    * orders). The date dimension every BI layer joins against,
    * including days with no facts (which an orders-derived distinct
    * would silently drop).
    */
  def q143_calendar_spine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = load(spark, dir, "orders")
    val range = o.agg(min(date_trunc("day", $"o_orderdate")).as("lo"),
      max(date_trunc("day", $"o_orderdate")).as("hi"))
    val days = range
      .select(explode(sequence($"lo", $"hi", expr("interval 1 day"))).as("day"))
      .select($"day", (weekday($"day") + 1).as("isodow"),
        date_format($"day", "yyyy-MM").as("month"))
    val perDay = o.groupBy(date_trunc("day", $"o_orderdate").as("day"))
      .agg(count(lit(1)).as("n"))
    days.join(perDay, Seq("day"), "left")
      .groupBy($"month")
      .agg(count(lit(1)).as("n_days"),
        sum(when($"isodow" >= 6, 1L).otherwise(0L)).as("n_weekend_days"),
        sum(when($"n".isNotNull, 1L).otherwise(0L)).as("n_days_with_orders"))
      .orderBy($"month")
  }

  /** q146 — business-day lead time (order → ship) per order priority.
    * Weekday arithmetic is CLOSED-FORM, not a calendar join: with
    * g(d) = weekdays in (−∞, d] anchored to a known Monday
    * (1970-01-05), g(d) = 5·⌊days/7⌋ + min(days mod 7 + 1, 5), and
    * business days between two dates = g(ship) − g(order) — two
    * integer expressions per row, map-side, no dimension table to
    * broadcast or join at any scale. Average in exact centi-days.
    */
  def q146_business_days(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def g(d: org.apache.spark.sql.Column) = {
      val days = datediff(d, to_date(lit("1970-01-05")))
      lit(5) * floor(days / 7) + least(days % 7 + 1, lit(5))
    }
    val o = load(spark, dir, "orders")
      .select($"o_orderkey", $"o_orderpriority", $"o_orderdate")
    load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_shipdate")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .select($"o_orderpriority",
        (g($"l_shipdate") - g($"o_orderdate")).cast("long").as("bd"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(lit(100.0) * sum($"bd") / count(lit(1))).cast("long")
          .as("avg_bd_centi"))
      .orderBy($"o_orderpriority")
  }

  /** q148 — validity-interval overlap/gap audit: the data-quality
    * check every SCD2/interval table needs before a point-in-time
    * join can be trusted (q61's prerequisite). Per supplier, shipment
    * intervals [d0, d1) (q110's in-transit windows) sort by start;
    * an interval OVERLAPS its predecessors when it starts before the
    * running max of prior ends (plain lag is wrong — an earlier long
    * interval can swallow several successors), and opens a GAP when
    * it starts after. One window pass partitioned on the
    * high-cardinality supplier key, then a bounded per-nation rollup.
    */
  def q148_overlap_audit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val iv = load(spark, dir, "lineitem")
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        unix_timestamp(date_trunc("day", $"l_shipdate")).as("d0"))
      .withColumn("d1", $"d0" + ($"l_linenumber" % 14 + 1) * 86400L)
    val bySupp = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_suppkey")
      .orderBy($"d0", $"d1", $"l_orderkey", $"l_linenumber")
    val flagged = iv
      .withColumn("prev_max_end", max($"d1").over(
        bySupp.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .withColumn("overlap_s",
        when($"prev_max_end" > $"d0", $"prev_max_end" - $"d0").otherwise(0L))
      .withColumn("gap_s",
        when($"prev_max_end".isNotNull && ($"prev_max_end" < $"d0"),
          $"d0" - $"prev_max_end").otherwise(0L))
    flagged
      .join(broadcast(load(spark, dir, "supplier")
        .select($"s_suppkey", $"s_nationkey")), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(load(spark, dir, "nation")
        .select($"n_nationkey", $"n_name")), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_intervals"),
        sum(when($"overlap_s" > 0, 1L).otherwise(0L)).as("n_overlapping"),
        sum(when($"gap_s" > 0, 1L).otherwise(0L)).as("n_gaps"),
        expr("sum(overlap_s) div 86400").as("overlap_days"),
        expr("max(gap_s) div 86400").as("max_gap_days"))
      .orderBy($"n_name")
  }

  /** q152 — CDC apply (change feed with tombstones): reconcile a base
    * snapshot with an out-of-order change feed carrying upserts AND
    * deletes — q69's SCD1 merge extended with the two cases it lacks:
    * tombstones and brand-new keys. The latest change per key wins
    * (ranking window on the high-cardinality key, version + unique
    * tie-break); a full-outer join against the base then classifies
    * every key as kept / updated / inserted / deleted, and tombstones
    * for unknown keys are no-ops. Feed: orders as balance updates,
    * urgent orders as deletes, every 20th order re-keyed past the
    * base key space to exercise inserts. Output is the bounded
    * per-segment census (inserted keys land in 'NEW').
    */
  def q152_cdc_apply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = load(spark, dir, "customer")
      .select($"c_custkey".as("key"), $"c_mktsegment",
        graft.Tables.cents($"c_acctbal").as("bal_c"))
    val feed = load(spark, dir, "orders")
      .select(
        when($"o_orderkey" % 20 === 0, $"o_custkey" + 1000000L)
          .otherwise($"o_custkey").as("key"),
        unix_timestamp($"o_orderdate").as("ver_s"),
        $"o_orderkey".as("tie"),
        when($"o_orderpriority" === "1-URGENT", lit("delete"))
          .otherwise(lit("upsert")).as("op"),
        graft.Tables.cents($"o_totalprice").as("payload_c"))
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy($"key").orderBy($"ver_s".desc, $"tie".desc)
    val latest = feed.withColumn("rn", row_number().over(byKey))
      .filter($"rn" === 1).select($"key", $"op", $"payload_c")
    val applied = base.join(latest, Seq("key"), "full")
      .withColumn("state",
        when($"op".isNull, "kept")
          .when($"op" === "delete" && $"c_mktsegment".isNull, "noop_delete")
          .when($"op" === "delete", "deleted")
          .when($"c_mktsegment".isNull, "inserted")
          .otherwise("updated"))
      .withColumn("segment", coalesce($"c_mktsegment", lit("NEW")))
      .withColumn("new_bal_c",
        when($"state".isin("updated", "inserted"), $"payload_c")
          .when($"state" === "kept", $"bal_c")) // deleted rows carry none
    applied
      .groupBy($"segment")
      .agg(count(lit(1)).as("n_keys"),
        sum(when($"state" === "kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when($"state" === "updated", 1L).otherwise(0L)).as("n_updated"),
        sum(when($"state" === "inserted", 1L).otherwise(0L)).as("n_inserted"),
        sum(when($"state" === "deleted", 1L).otherwise(0L)).as("n_deleted"),
        sum(when($"state" === "noop_delete", 1L).otherwise(0L)).as("n_noop"),
        coalesce(sum($"new_bal_c"), lit(0L)).as("sum_bal_c"))
      .orderBy($"segment")
  }

  /** q170 — FIFO lot matching: allocate issued quantity against the
    * oldest received stock per part, WITHOUT the per-row loop FIFO is
    * usually written as. The trick: cumulative-quantity intervals.
    * Receipts (flag R) and issues (flag A) each get [cum_prev, cum)
    * ranges per part via one window pass on the part key; an issue
    * draws from exactly the receipts whose range overlaps its own,
    * and the matched quantity IS the overlap length — so FIFO
    * becomes an equi-join on part plus an overlap filter, with the
    * per-part pair fan-out bounded by lines-per-part. All quantities
    * integer units.
    */
  def q170_fifo_match(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = load(spark, dir, "lineitem")
      .select($"l_partkey", $"l_orderkey", $"l_linenumber", $"l_returnflag",
        unix_timestamp($"l_shipdate").as("t"),
        $"l_quantity".cast("long").as("qty"))
    val byPart = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_partkey")
      .orderBy($"t", $"l_orderkey", $"l_linenumber")
    def ranged(flag: String, lo: String, hi: String) = li
      .filter($"l_returnflag" === flag)
      .withColumn(hi, sum($"qty").over(byPart))
      .withColumn(lo, col(hi) - $"qty")
    val receipts = ranged("R", "s_lo", "s_hi")
      .select($"l_partkey".as("pk"), $"s_lo", $"s_hi")
    val issues = ranged("A", "d_lo", "d_hi")
      .select($"l_partkey".as("pk2"), $"d_lo", $"d_hi")
    receipts.join(issues,
        $"pk" === $"pk2" && $"s_lo" < $"d_hi" && $"d_lo" < $"s_hi")
      .select($"pk",
        (least($"s_hi", $"d_hi") - greatest($"s_lo", $"d_lo")).as("matched"))
      .join(broadcast(load(spark, dir, "part")
        .select($"p_partkey", $"p_brand")), $"pk" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_matches"),
        sum($"matched").as("matched_qty"))
      .orderBy($"p_brand")
  }

  /** q252 — binary-segmentation changepoint on the daily event-count
    * series: the single split day that maximizes the between-segment
    * variance reduction (equivalently minimizes within-segment SSE) —
    * the level-shift detector a feed-health monitor runs before
    * alerting on "traffic changed". The event stream reduces ONCE to
    * the per-day count table (bounded by the calendar, not the event
    * rate); cumulative left-sums come from one window over that
    * bounded table, and each candidate boundary's gain
    * SL²/nL + SR²/nR − S²/n evaluates as a single fixed float tree
    * over exact integer sums, quantized to milli units BEFORE the
    * argmax so the winner (tie-break: earliest day) is stable to
    * summation-order ulps in both engines. At 100 TB nothing after
    * the first aggregate grows: the candidate table is |days| rows.
    */
  def q252_changepoint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = load(spark, dir, "events")
      .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("cnt"))
    val tot = daily.agg(count(lit(1)).as("n"), sum($"cnt").as("s"))
    val w = Window.orderBy($"d").rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("sl", sum($"cnt").over(w))
      .withColumn("nl", row_number().over(Window.orderBy($"d")).cast("long"))
      .crossJoin(broadcast(tot))
      .filter($"nl" < $"n")
      .withColumn("nr", $"n" - $"nl")
      .withColumn("sr", $"s" - $"sl")
      .withColumn("gain_milli", round(lit(1000.0) * (
        $"sl".cast("double") * $"sl" / $"nl"
          + $"sr".cast("double") * $"sr" / $"nr"
          - $"s".cast("double") * $"s" / $"n")).cast("long"))
      .orderBy($"gain_milli".desc, $"d").limit(1)
      .select($"d".as("split_day"),
        $"nl".as("n_days_left"), $"nr".as("n_days_right"),
        round(lit(1000.0) * $"sl" / $"nl").cast("long").as("mean_left_milli"),
        round(lit(1000.0) * $"sr" / $"nr").cast("long").as("mean_right_milli"),
        $"gain_milli")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q252_changepoint" -> q252_changepoint,
    "q170_fifo_match" -> q170_fifo_match,
    "q152_cdc_apply" -> q152_cdc_apply,
    "q148_overlap_audit" -> q148_overlap_audit,
    "q146_business_days" -> q146_business_days,
    "q143_calendar_spine" -> q143_calendar_spine,
    "q140_feed_gaps" -> q140_feed_gaps,
    "q126_backlog" -> q126_backlog,
    "q110_peak_concurrency" -> q110_peak_concurrency,
    "q60_interval_join" -> q60_interval_join,
    "q61_scd2_pit" -> q61_scd2_pit,
    "q69_merge_upsert" -> q69_merge_upsert)

  val oracle: Map[String, String] = Map(
    "q252_changepoint" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cnt) AS BIGINT) AS s FROM daily),
        |c AS (SELECT d,
        |    CAST(SUM(cnt) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sl,
        |    CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS nl
        |  FROM daily),
        |g AS (SELECT d, nl, t.n - nl AS nr, sl, t.s - sl AS sr,
        |    CAST(ROUND(1000.0 * (CAST(sl AS DOUBLE) * sl / nl
        |      + CAST(t.s - sl AS DOUBLE) * (t.s - sl) / (t.n - nl)
        |      - CAST(t.s AS DOUBLE) * t.s / t.n)) AS BIGINT) AS gain_milli
        |  FROM c, t WHERE nl < t.n)
        |SELECT d AS split_day, nl AS n_days_left, nr AS n_days_right,
        |  CAST(ROUND(1000.0 * sl / nl) AS BIGINT) AS mean_left_milli,
        |  CAST(ROUND(1000.0 * sr / nr) AS BIGINT) AS mean_right_milli,
        |  gain_milli
        |FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY gain_milli DESC, d) AS rn
        |  FROM g) WHERE rn = 1""".stripMargin,
    "q170_fifo_match" ->
      """WITH li AS (SELECT l_partkey, l_orderkey, l_linenumber, l_returnflag,
        |    CAST(FLOOR(epoch(l_shipdate)) AS BIGINT) AS t,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem),
        |r AS (SELECT l_partkey AS pk,
        |    SUM(qty) OVER w - qty AS s_lo, SUM(qty) OVER w AS s_hi
        |  FROM li WHERE l_returnflag = 'R'
        |  WINDOW w AS (PARTITION BY l_partkey
        |    ORDER BY t, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |d AS (SELECT l_partkey AS pk,
        |    SUM(qty) OVER w - qty AS d_lo, SUM(qty) OVER w AS d_hi
        |  FROM li WHERE l_returnflag = 'A'
        |  WINDOW w AS (PARTITION BY l_partkey
        |    ORDER BY t, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |m AS (SELECT r.pk,
        |    LEAST(r.s_hi, d.d_hi) - GREATEST(r.s_lo, d.d_lo) AS matched
        |  FROM r JOIN d ON r.pk = d.pk
        |    AND r.s_lo < d.d_hi AND d.d_lo < r.s_hi)
        |SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_matches,
        |  CAST(SUM(matched) AS BIGINT) AS matched_qty
        |FROM m JOIN part ON pk = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q152_cdc_apply" ->
      """WITH base AS (SELECT c_custkey AS key, c_mktsegment,
        |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c FROM customer),
        |feed AS (SELECT
        |    CASE WHEN o_orderkey % 20 = 0 THEN o_custkey + 1000000
        |         ELSE o_custkey END AS key,
        |    CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS ver_s,
        |    o_orderkey AS tie,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 'delete'
        |         ELSE 'upsert' END AS op,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS payload_c
        |  FROM orders),
        |latest AS (SELECT key, op, payload_c FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY key
        |      ORDER BY ver_s DESC, tie DESC) AS rn FROM feed)
        |  WHERE rn = 1),
        |ap AS (SELECT COALESCE(c_mktsegment, 'NEW') AS segment,
        |    CASE WHEN op IS NULL THEN 'kept'
        |         WHEN op = 'delete' AND c_mktsegment IS NULL THEN 'noop_delete'
        |         WHEN op = 'delete' THEN 'deleted'
        |         WHEN c_mktsegment IS NULL THEN 'inserted'
        |         ELSE 'updated' END AS state,
        |    CASE WHEN op IS NULL THEN bal_c
        |         WHEN op = 'delete' THEN NULL
        |         ELSE payload_c END AS new_bal_c
        |  FROM base FULL JOIN latest USING (key))
        |SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(CASE WHEN state = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(SUM(CASE WHEN state = 'updated' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_updated,
        |  CAST(SUM(CASE WHEN state = 'inserted' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_inserted,
        |  CAST(SUM(CASE WHEN state = 'deleted' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_deleted,
        |  CAST(SUM(CASE WHEN state = 'noop_delete' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_noop,
        |  CAST(COALESCE(SUM(new_bal_c), 0) AS BIGINT) AS sum_bal_c
        |FROM ap GROUP BY 1 ORDER BY 1""".stripMargin,
    "q148_overlap_audit" ->
      """WITH iv AS (SELECT l_suppkey, l_orderkey, l_linenumber,
        |    CAST(FLOOR(epoch(date_trunc('day', l_shipdate))) AS BIGINT) AS d0,
        |    CAST(FLOOR(epoch(date_trunc('day', l_shipdate))) AS BIGINT)
        |      + (l_linenumber % 14 + 1) * 86400 AS d1
        |  FROM lineitem),
        |f AS (SELECT *,
        |    MAX(d1) OVER (PARTITION BY l_suppkey
        |      ORDER BY d0, d1, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM iv),
        |g AS (SELECT l_suppkey,
        |    CASE WHEN pme > d0 THEN pme - d0 ELSE 0 END AS overlap_s,
        |    CASE WHEN pme IS NOT NULL AND pme < d0 THEN d0 - pme
        |         ELSE 0 END AS gap_s
        |  FROM f)
        |SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_intervals,
        |  CAST(SUM(CASE WHEN overlap_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_overlapping,
        |  CAST(SUM(CASE WHEN gap_s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
        |  CAST(SUM(overlap_s) // 86400 AS BIGINT) AS overlap_days,
        |  CAST(MAX(gap_s) // 86400 AS BIGINT) AS max_gap_days
        |FROM g JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q146_business_days" ->
      """WITH g AS (SELECT o_orderpriority,
        |    (5 * (date_diff('day', DATE '1970-01-05', CAST(l_shipdate AS DATE)) // 7)
        |      + LEAST(date_diff('day', DATE '1970-01-05', CAST(l_shipdate AS DATE)) % 7 + 1, 5))
        |  - (5 * (date_diff('day', DATE '1970-01-05', CAST(o_orderdate AS DATE)) // 7)
        |      + LEAST(date_diff('day', DATE '1970-01-05', CAST(o_orderdate AS DATE)) % 7 + 1, 5))
        |    AS bd
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(ROUND(100.0 * SUM(bd) / COUNT(*)) AS BIGINT) AS avg_bd_centi
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q143_calendar_spine" ->
      """WITH r AS (SELECT date_trunc('day', MIN(o_orderdate)) AS lo,
        |    date_trunc('day', MAX(o_orderdate)) AS hi FROM orders),
        |days AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
        |         FROM r),
        |d AS (SELECT day, isodow(day) AS isodow,
        |    strftime(day, '%Y-%m') AS month FROM days),
        |pd AS (SELECT date_trunc('day', o_orderdate) AS day,
        |    COUNT(*) AS n FROM orders GROUP BY 1)
        |SELECT month, COUNT(*) AS n_days,
        |  CAST(SUM(CASE WHEN isodow >= 6 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_weekend_days,
        |  CAST(SUM(CASE WHEN pd.n IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_days_with_orders
        |FROM d LEFT JOIN pd USING (day) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q140_feed_gaps" ->
      """WITH m AS (SELECT DISTINCT
        |    CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) AS day_s,
        |    CAST(FLOOR(epoch(ts) / 60) AS BIGINT) AS m
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT day_s,
        |    m - LAG(m) OVER (PARTITION BY day_s ORDER BY m) - 1 AS gap
        |  FROM m)
        |SELECT day_s,
        |  CAST(SUM(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
        |  CAST(COALESCE(SUM(CASE WHEN gap > 0 THEN gap END), 0) AS BIGINT)
        |    AS missing_minutes,
        |  CAST(COALESCE(MAX(CASE WHEN gap > 0 THEN gap END), 0) AS BIGINT)
        |    AS max_gap_minutes
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q126_backlog" ->
      """WITH li AS (SELECT l_orderkey, l_shipdate, o_orderdate
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |d AS (SELECT week_s, CAST(SUM(ordered) AS BIGINT) AS n_ordered,
        |    CAST(SUM(shipped) AS BIGINT) AS n_shipped FROM (
        |    SELECT CAST(FLOOR(epoch(date_trunc('week', o_orderdate))) AS BIGINT)
        |      AS week_s, 1 AS ordered, 0 AS shipped FROM li
        |    UNION ALL
        |    SELECT CAST(FLOOR(epoch(date_trunc('week', l_shipdate))) AS BIGINT),
        |      0, 1 FROM li)
        |  GROUP BY 1)
        |SELECT week_s, n_ordered, n_shipped,
        |  CAST(SUM(n_ordered) OVER w AS BIGINT) AS cum_ordered,
        |  CAST(SUM(n_shipped) OVER w AS BIGINT) AS cum_shipped,
        |  CAST(SUM(n_ordered) OVER w - SUM(n_shipped) OVER w AS BIGINT) AS backlog
        |FROM d WINDOW w AS (ORDER BY week_s
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY week_s""".stripMargin,
    "q110_peak_concurrency" ->
      """WITH li AS (SELECT n_name,
        |    CAST(FLOOR(epoch(date_trunc('day', l_shipdate))) AS BIGINT) AS d0,
        |    CAST(FLOOR(epoch(date_trunc('day', l_shipdate)))
        |      + (l_linenumber % 14 + 1) * 86400 AS BIGINT) AS d1
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey),
        |deltas AS (
        |  SELECT n_name, day_s, CAST(SUM(delta) AS BIGINT) AS delta FROM (
        |    SELECT n_name, d0 AS day_s, 1 AS delta FROM li
        |    UNION ALL SELECT n_name, d1, -1 FROM li)
        |  GROUP BY 1, 2),
        |act AS (SELECT n_name, day_s,
        |    SUM(delta) OVER (PARTITION BY n_name ORDER BY day_s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS active
        |  FROM deltas),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name
        |        ORDER BY active DESC, day_s) AS rn FROM act)
        |SELECT n_name, CAST(active AS BIGINT) AS peak_active,
        |  day_s AS peak_day_s
        |FROM r WHERE rn = 1 ORDER BY n_name""".stripMargin,
    "q69_merge_upsert" ->
      s"""WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS k,
         |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer),
         |o AS (SELECT CAST(o_custkey AS BIGINT) AS ck, o_orderdate, o_orderkey,
         |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS upd_cents FROM orders),
         |u AS (SELECT ck AS k, o_orderdate, o_orderkey, upd_cents FROM o
         |  UNION ALL
         |  SELECT ck + $InsertOffset, o_orderdate, o_orderkey, upd_cents
         |  FROM o WHERE ck % $InsertStride = 0),
         |lat AS (SELECT k, upd_cents FROM (
         |    SELECT k, upd_cents, ROW_NUMBER() OVER (
         |      PARTITION BY k ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
         |    FROM u) WHERE rn = 1)
         |SELECT CAST(COALESCE(b.k, l.k) AS BIGINT) AS k,
         |  CAST(COALESCE(l.upd_cents, b.bal_cents) AS BIGINT) AS bal_cents,
         |  CASE WHEN l.k IS NULL THEN 'keep'
         |       WHEN b.k IS NULL THEN 'insert' ELSE 'update' END AS action
         |FROM base b FULL JOIN lat l ON b.k = l.k
         |ORDER BY k""".stripMargin,
    "q60_interval_join" ->
      s"""WITH ev AS (SELECT event_id, user_id, event_type,
         |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s,
         |    CAST(ROUND(value * 100) AS BIGINT) AS v_cents
         |  FROM events),
         |inc AS (SELECT event_id AS incident_id,
         |    ts_s - $WindowS AS lo, ts_s + $WindowS AS hi
         |  FROM ev WHERE event_type = 'error'
         |  ORDER BY v_cents DESC, event_id LIMIT $Incidents)
         |SELECT incident_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM ev JOIN inc ON ev.ts_s BETWEEN inc.lo AND inc.hi
         |GROUP BY incident_id ORDER BY incident_id""".stripMargin,
    "q61_scd2_pit" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |dim AS (SELECT user_id, event_type AS state, ts_s AS from_s,
        |    LEAD(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS to_s
        |  FROM ev WHERE event_type IN ('signup', 'error'))
        |SELECT p.event_id, p.user_id, d.state, d.from_s
        |FROM ev p JOIN dim d ON p.user_id = d.user_id
        |  AND p.ts_s >= d.from_s AND (d.to_s IS NULL OR p.ts_s < d.to_s)
        |WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin)
}
