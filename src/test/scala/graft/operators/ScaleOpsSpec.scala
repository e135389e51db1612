package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Salting and bucketing: result-equivalence with the plain plans,
  * and (for bucketing) the shuffle actually disappearing.
  */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("salted join ≡ plain join on a skewed key") {
    import spark.implicits._
    // skew: one hot user dominates
    val big = graft.Tables.load(spark, dir, "events")
      .withColumn("user_id", when($"event_id" % 3 === 0, 1L).otherwise($"user_id"))
      .select($"user_id", $"event_id", $"value")
    val small = graft.Tables.load(spark, dir, "customer")
      .select($"c_custkey".as("user_id"), $"c_mktsegment")

    val plain = big.join(small, "user_id")
      .agg(count(lit(1)), sum($"event_id")).collect().head
    val salted = ScaleOps.saltedJoin(big, small, "user_id", numSalts = 8)
      .agg(count(lit(1)), sum($"event_id")).collect().head
    assert(plain == salted)
  }

  test("salted two-phase sum/count ≡ direct aggregation") {
    import spark.implicits._
    val df = graft.Tables.load(spark, dir, "events")
      .select($"event_type", graft.Tables.cents($"value").as("cents"))
    val direct = df.groupBy($"event_type")
      .agg(sum($"cents").as("sum_cents"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = ScaleOps.saltedSumCount(df, Seq("event_type"), "cents", numSalts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(direct == salted)
  }

  test("bucketed co-located join plans no shuffle on the join key") {
    import spark.implicits._
    val orders = graft.Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey".as("o_orderkey"), $"l_quantity")
    ScaleOps.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    ScaleOps.writeBucketed(li, "lineitem_b", "o_orderkey", 4)

    val joined = ScaleOps.coLocatedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle, plan:\n${plan.take(2000)}")
    // and it is still the correct join
    val expected = orders.join(li, "o_orderkey").count()
    assert(joined.count() == expected)
  }

  test("q66 bucket load runs once per (session, dir): repeat calls don't rewrite the tables") {
    // The bucketed layout is LOAD work; q66 invocations after the
    // first must read the existing tables, not pay two fact writes.
    ScaleOps.ensureBucketedFacts(spark, dir)
    val probe = new java.io.File("/tmp/graft_buckets/orders_b")
    def stamp(): Long = probe.listFiles().map(_.lastModified()).max
    val before = stamp()
    ScaleOps.q66_bucketed_join(spark, dir).queryExecution.toRdd.count()
    assert(stamp() == before,
      "second q66 invocation must not rewrite the bucketed fact tables")
  }

  test("bloom filter has no false negatives and prunes most non-members") {
    import spark.implicits._
    val keys = (0L until 200L by 2).toDF("k") // even keys are members
    val bits = ScaleOps.bloomBits(keys, "k", mBits = 1024, numHashes = 3)
    val probe = (0L until 1000L).toDF("k")
      .withColumn("hit", ScaleOps.bloomMightContain(bits, $"k", 1024, 3))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    // every inserted key must test positive
    (0L until 200L by 2).foreach(k => assert(probe(k), s"false negative for $k"))
    // false-positive rate over the 900 non-members stays near theory
    val fp = probe.count { case (k, hit) => hit && !(k < 200 && k % 2 == 0) }
    assert(fp < 200, s"$fp false positives out of 900 — bloom not pruning")
  }

  test("bloom probe runs at the scan, below the aggregation exchange") {
    val plan = ScaleOps.q62_bloom_prune(spark, dir).queryExecution.executedPlan.toString
    // the probe (element_at over the bitset literal) must appear in the plan
    assert(plan.contains("element_at") || plan.contains("ElementAt"), plan.take(600))
    // and the big side must reach the join via broadcast, not a shuffle
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("compaction shrinks a many-small-files dir without changing its contents") {
    import spark.implicits._
    val events = graft.Tables.load(spark, dir, "events")
      .select($"event_id", $"user_id", $"value")
    val tmp = TestSpark.tempDir("compact") + "/events"
    events.repartition(40).write.mode("overwrite").parquet(tmp)
    def parquetFiles = new java.io.File(tmp).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val before = parquetFiles
    assert(before >= 40)
    val checksum = events.agg(sum($"event_id"), count(lit(1))).head()

    ScaleOps.compact(spark, tmp, targetFileBytes = 64L * 1024 * 1024,
      schemaDdl = "event_id LONG, user_id LONG, value DOUBLE")
    assert(parquetFiles < before / 10, s"still $parquetFiles files")
    val after = spark.read.schema("event_id LONG, user_id LONG, value DOUBLE")
      .parquet(tmp).agg(sum($"event_id"), count(lit(1))).head()
    assert(after == checksum, "compaction must be a pure rewrite")
    // idempotent: already-compact dirs are left alone
    val files = new java.io.File(tmp).listFiles().map(_.getName).sorted.toSeq
    ScaleOps.compact(spark, tmp, targetFileBytes = 64L * 1024 * 1024,
      schemaDdl = "event_id LONG, user_id LONG, value DOUBLE")
    assert(new java.io.File(tmp).listFiles().map(_.getName).sorted.toSeq == files)
  }

  test("clustered write lets parquet row-group stats prune a point scan") {
    import spark.implicits._
    val n = 400000L
    val wide = spark.range(n).select($"id".as("k"),
      md5($"id".cast("string")).as("payload"))
    val base = TestSpark.tempDir("cluster")

    ScaleOps.writeClustered(wide, s"$base/clustered", "k", numFiles = 8)
    wide.orderBy(rand(7)).coalesce(8) // same file count, shuffled layout
      .write.mode("overwrite").parquet(s"$base/shuffled")

    def scanRows(dir: String): Long = {
      val q = spark.read.schema("k LONG, payload STRING").parquet(dir)
        .filter($"k" === 123456L)
      assert(q.count() == 1)
      q.queryExecution.toRdd.count()
      val scan = q.queryExecution.executedPlan.collectLeaves()
        .find(_.metrics.contains("numOutputRows")).get
      scan.metrics("numOutputRows").value
    }
    val clustered = scanRows(s"$base/clustered")
    val shuffled = scanRows(s"$base/shuffled")
    // clustered: only the one row group whose [min,max] straddles the
    // key survives; shuffled: every row group straddles every key
    assert(clustered < n / 10,
      s"clustered scan should prune to ~one row group, read $clustered rows")
    assert(shuffled > clustered * 10,
      s"shuffled layout must not prune (read $shuffled vs $clustered)")
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    import spark.implicits._
    // The runtime complement to saltedJoin: when a shuffle partition's
    // bytes blow past threshold AND factor × median, AQE rewrites the
    // SMJ to read the hot partition in slices. This spec pins the
    // behavior our skew story depends on at 100 TB.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // one hot key carrying megabytes against a long tail of tiny
      // keys; the payload must be incompressible (shuffle sizes are
      // post-compression) — md5 hex, not a repeated char
      val pad = concat(md5($"id".cast("string")),
        md5(($"id" + 1).cast("string")), md5(($"id" + 2).cast("string")))
      val hot = spark.range(100000).select(lit(1L).as("k"), pad.as("payload"))
      val tail = spark.range(5000).select(($"id" % 500 + 2).as("k"), pad.as("payload"))
      val right = spark.range(600).select($"id".as("k"), $"id".as("v"))
      val joined = hot.union(tail).join(right, "k")

      // drive THIS plan (count() would wrap a fresh query execution,
      // leaving joined.queryExecution unexecuted / isFinalPlan=false)
      val n = joined.queryExecution.toRdd.count()
      assert(n == 105000L, "every left row matches exactly one right key")
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew split did not engage:\n${finalPlan.take(1200)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("z-order layout prunes range scans on BOTH dimensions; linear sort only on one") {
    import spark.implicits._
    val n = 400000L
    // two independent uniform 16-bit dims + incompressible payload
    val pts = spark.range(n).select(
      (graft.Tables.cents(lit(0)) + ($"id" * 48271L) % 65536L).as("x"),
      (($"id" * 69621L + 11L) % 65536L).as("y"),
      md5($"id".cast("string")).as("payload"))
    val base = TestSpark.tempDir("zorder")
    ScaleOps.writeZOrdered(pts, s"$base/z", "x", "y", numFiles = 32)
    ScaleOps.writeClustered(pts, s"$base/linear", "x", numFiles = 32)

    def scanRows(dir: String, pred: org.apache.spark.sql.Column): Long = {
      val q = spark.read.schema("x LONG, y LONG, payload STRING").parquet(dir)
        .filter(pred)
      q.queryExecution.toRdd.count()
      val scan = q.queryExecution.executedPlan.collectLeaves()
        .find(_.metrics.contains("numOutputRows")).get
      scan.metrics("numOutputRows").value
    }
    // 1/16-span range on each dimension
    val zX = scanRows(s"$base/z", $"x".between(1000L, 5095L))
    val zY = scanRows(s"$base/z", $"y".between(1000L, 5095L))
    val linX = scanRows(s"$base/linear", $"x".between(1000L, 5095L))
    val linY = scanRows(s"$base/linear", $"y".between(1000L, 5095L))
    // linear-by-x: near-perfect on x, no pruning on y
    assert(linX < n / 8, s"linear layout should prune x scans, read $linX")
    assert(linY > n * 9 / 10, s"linear layout cannot prune y, read $linY")
    // z-order: substantial pruning on BOTH dimensions. 32 files give
    // the curve 5 leading bits = 8 x-splits × 4 y-splits, so a
    // 1/16-span scan reads ~1/8 on x and ~1/4 (+ boundary files) on y
    assert(zX < n * 3 / 10, s"z-order should prune x scans, read $zX")
    assert(zY < n * 2 / 5, s"z-order should prune y scans, read $zY")
    assert(zY * 2 < linY, s"z-order y pruning must beat linear ($zY vs $linY)")
  }

  test("interleaveBits matches a reference Morton encoding on random 16-bit pairs") {
    import org.scalacheck.Gen
    import spark.implicits._
    def ref(a: Long, b: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
      }
    val pairs = Gen.listOfN(300,
      Gen.zip(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L))).sample.get
    val got = pairs.toDF("a", "b")
      .select(ScaleOps.interleaveBits($"a", $"b", 16).as("z"))
      .as[Long].collect()
    pairs.zip(got).foreach { case ((a, b), z) =>
      assert(z == ref(a, b), s"interleave($a, $b) = $z != ${ref(a, b)}")
    }
    // monotone in each coordinate with the other fixed (the property
    // that makes per-dimension range scans contiguous-ish on the curve)
    pairs.sliding(2).foreach {
      case Seq((a1, b1), _) =>
        assert(ref(a1, b1) <= ref(a1 + 1, b1) || a1 == 65535L)
        assert(ref(a1, b1) <= ref(a1, b1 + 1) || b1 == 65535L)
      case _ =>
    }
  }

  test("ignoreCorruptFiles reads past a truncated parquet shard") {
    import spark.implicits._
    val dir = TestSpark.tempDir("corrupt_scan")
    spark.range(1000).select($"id", md5($"id".cast("string")).as("payload"))
      .coalesce(2).write.mode("overwrite").parquet(dir)
    // truncate one shard mid-file: footer gone, scan would normally fail
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).minBy(_.getName)
    val ch = java.nio.channels.FileChannel.open(shard.toPath,
      java.nio.file.StandardOpenOption.WRITE)
    try ch.truncate(shard.length() / 3) finally ch.close()

    val strict = intercept[org.apache.spark.SparkException] {
      spark.read.schema("id LONG, payload STRING").parquet(dir).count()
    }
    assert(strict != null)
    val saved = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    try {
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
      val n = spark.read.schema("id LONG, payload STRING").parquet(dir).count()
      // the intact shard's rows survive; the corrupt shard drops
      assert(n > 0 && n < 1000, s"expected partial read, got $n")
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", v)
        case None => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
      }
    }
  }

  test("schema evolution: mergeSchema unions shard schemas; old rows null-fill the new column") {
    import spark.implicits._
    val dir = TestSpark.tempDir("evolve_scan")
    // epoch-1 shards: (id, payload); epoch-2 adds a quality column —
    // the long-lived-table reality at 100 TB (backfills are rewrites
    // you can't afford; readers must tolerate the union schema)
    spark.range(100).select($"id", md5($"id".cast("string")).as("payload"))
      .write.mode("overwrite").parquet(dir)
    spark.range(100, 150)
      .select($"id", md5($"id".cast("string")).as("payload"),
        ($"id" % 5).as("quality"))
      .write.mode("append").parquet(dir)

    // a pinned narrow schema keeps reading (column pruning still
    // works against evolved shards: missing column → nulls)
    assert(spark.read.schema("id LONG, quality LONG").parquet(dir).count() == 150)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "payload", "quality"))
    val byEpoch = merged
      .groupBy($"quality".isNull.as("pre_evolution"))
      .count().collect().map(r => (r.getBoolean(0), r.getLong(1))).toMap
    assert(byEpoch == Map(true -> 100L, false -> 50L),
      "old shards null-fill the new column; new shards carry it")
  }

  test("ANALYZE TABLE feeds the optimizer: exact rowCount + filter selectivity estimates") {
    import spark.implicits._
    val t = s"graft_stats_demo"
    graft.Tables.load(spark, dir, "customer")
      .write.mode("overwrite").saveAsTable(t)
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS c_custkey, c_mktsegment")
      val n = spark.table(t).count()
      // table-level stats: the optimizer sees the exact row count, not
      // a bytes-based guess
      val full = spark.table(t).queryExecution.optimizedPlan.stats
      assert(full.rowCount.contains(BigInt(n)),
        s"expected rowCount Some($n), got ${full.rowCount}")
      // column-level stats: an equality filter on a ~5-value column is
      // estimated well below the full table (histogram/NDV-based CBO
      // selectivity, not the 100% fallback)
      val filtered = spark.table(t).filter($"c_mktsegment" === "BUILDING")
        .queryExecution.optimizedPlan.stats
      assert(filtered.rowCount.isDefined)
      val est = filtered.rowCount.get.toLong
      assert(est < n / 2 && est > 0, s"selectivity estimate $est of $n rows")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("bitmap distinct ≡ exact count(distinct); shuffle carries bitmaps, not keys") {
    import spark.implicits._
    val got = ScaleOps.q149_bitmap_distinct(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = graft.Tables.load(spark, dir, "events")
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == exact)
    // the plan's distinct work is bitmap aggregation — no Expand-based
    // count(distinct) rewrite in sight
    val plan = ScaleOps.q149_bitmap_distinct(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bitmap_construct_agg"), plan.take(600))
    assert(!plan.contains("Expand"), plan.take(600))
  }

  test("q271 skew planner: planted hot key flags for salting, uniform key does not") {
    import spark.implicits._
    // l_orderkey: key 1 has 90 rows, keys 2..11 one each (max share
    // 90/100 = 900000 micro, advice 1); l_partkey/l_suppkey uniform
    // over 100 keys (gini 0, advice 0).
    val rows = (0 until 100).map { i =>
      val ok = if (i < 90) 1L else (i - 88).toLong
      (ok, (i % 100).toLong + 1, (i % 100).toLong + 1)
    }
    val tmp = TestSpark.tempDir("skew_plan")
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val r = ScaleOps.q271_skew_planner(spark, tmp).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(5), x.getInt(6))).toMap
    assert(r("l_orderkey")._1 == 11L)
    assert(r("l_orderkey")._2 == 900000L, r("l_orderkey").toString)
    assert(r("l_orderkey")._4 == 1)
    assert(r("l_partkey") == ((100L, 10000L, 0L, 0)), r("l_partkey").toString)
  }

  test("q272 join-card audit: uniform FK join estimates exactly, correlated skew underestimates") {
    import spark.implicits._
    // orders: key 1 ×5, keys 2..10 ×1 (na=14, da=10);
    // lineitem: key 1 ×21, keys 2..10 ×1 (nb=30, db=10)
    // actual = 5·21 + 9 = 114; System-R est = 14·30/10 = 42 ⇒ −63 %.
    val ords = (1 to 5).map(i => 1L) ++ (2L to 10L)
    val lis = (1 to 21).map(_ => 1L) ++ (2L to 10L)
    val tmp = TestSpark.tempDir("jcard")
    ords.toDF("o_orderkey").write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    lis.map(k => (k, k)).toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    (1L to 10L).toDF("p_partkey").write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val r = ScaleOps.q272_join_card_audit(spark, tmp).collect()
      .map(x => x.getString(0) -> (x.getLong(5), x.getLong(6), x.getLong(7))).toMap
    assert(r("orders_lineitem") == ((42L, 114L, -63L)), r.toString)
    // part side is 1-per-key: est = 10·30/10 = 30 = actual
    assert(r("part_lineitem") == ((30L, 30L, 0L)), r.toString)
  }
}
