package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Similarity search over the `embeddings` table (vec_id,
  * embedding FLOAT[64], label) — the ANN layer of an LLM data
  * pipeline (retrieval dedup, nearest-neighbor audit, cluster
  * assignment).
  *
  * Two plans, as the scale story requires:
  *  - q26 brute-force: broadcast the (small) query batch against the
  *    full corpus scan — exact top-k, the correctness baseline. The
  *    corpus side is never shuffled; per-query top-k is a ranking
  *    window partitioned by query id (query count grows with data, so
  *    parallelism scales).
  *  - q27 multiprobe random-hyperplane LSH: corpus is bucketed by an
  *    8-bit hyperplane sketch; each query probes all buckets within
  *    Hamming distance 2 of its own sketch (1+8+28 = 37 of 256) and
  *    ranks candidates exactly. Candidate generation is an equi-join
  *    on the bucket key — no cartesian product anywhere in the plan.
  *
  * All cosine math is double-precision (FLOAT input upcast first);
  * similarities are emitted as micro-units (round(sim·1e6)) so the
  * 1-ulp summation-order differences between engines can't flip a
  * hash compare, and ranking ties break on vec_id.
  */
object Similarity {

  /** Native codegen'd ARRAY<FLOAT>→ARRAY<DOUBLE> upcast
    * (graft.functions.VectorToDouble) — bit-identical to the
    * `transform(c, _.cast("double"))` HOF it replaced (float→double
    * is exact), but one generated call per row instead of ~64
    * interpreted lambda invocations, and it keeps the scan inside
    * whole-stage codegen (HOFs are CodegenFallback).
    */
  private[llm] def toDouble(c: Column): Column =
    graft.functions.VectorOps.vectorToDouble(c)

  /** Native codegen'd dot (graft.functions.VectorDot) — bit-identical
    * to the aggregate(zip_with(...)) HOF composition it replaced (same
    * left-to-right accumulation from 0.0), but one generated Java loop
    * instead of ~2·dim interpreted lambda calls per pair.
    */
  private[llm] def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.vectorDot(a, b)

  private[llm] def norm(c: Column): Column = sqrt(dot(c, c))

  final val TopK = 10

  /** Exact brute-force cosine top-k for a deterministic query batch
    * (every 50th vector). The query side is tiny relative to the
    * corpus → explicit broadcast; the big side streams through the
    * join with zero shuffle.
    */
  def q26_ann_topk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Norms materialize below the join: once per corpus row, not once
    // per (row × query) pair — the join-side expression would be
    // recomputed |queries|× per row. The cosine denominator divides by
    // qnrm*nrm UNfloored (the oracle's list_cosine_similarity has no
    // floor to mirror), which is safe only under the data invariant
    // that no FULL vector is all-zero (q293's dim-PREFIXES can be
    // zero and are floored there) — so the invariant fails LOUDLY
    // here instead of surfacing as a NaN→ANSI cast error downstream.
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
      .withColumn("nrm", when($"nrm" > 0d, $"nrm").otherwise(raise_error(
        concat(lit("q26: zero-norm embedding, vec_id="), $"vec_id"))))
    val queries = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))

    val sims = emb.join(broadcast(queries), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm") * 1e6).cast("long").as("sim_micro"))

    val w = Window.partitionBy($"q_id").orderBy($"sim_micro".desc, $"neighbor_id")
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TopK)
      .select($"q_id", $"rank", $"neighbor_id", $"sim_micro")
      .orderBy($"q_id", $"rank")
  }

  /** Session-shared memo of the exact q26 top-k (the recall/probe
    * DENOMINATOR every evaluation operator needs): q222 hubness, q237
    * kNN probe, q247 SQ8 recall, q248 SRP recall and q249's IVF sweep
    * all rank against the same exact baseline — recomputing the
    * O(|queries|·|corpus|) brute-force scan once per consumer tripled
    * an already-quadratic evaluation pass at 20× scale (78.5 s for the
    * sweep alone). The memo persists the RESULT (≤ |queries|·k rows —
    * tiny regardless of corpus size; the cost is the scan, not the
    * output), keyed by (session, dir) so Bench/Verify loops and the
    * scale stress all share one computation while `Caches.releaseAll`
    * between queries cannot evict it mid-harness. Release explicitly
    * with `releaseShared()` at session teardown.
    */
  private val exactTopKMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private[llm] def exactTopK(spark: SparkSession, dir: String): DataFrame =
    exactTopKMemo.computeIfAbsent((spark, dir), { _ =>
      val df = q26_ann_topk(spark, dir)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df
    })

  /** Materialize the session-shared exact top-k memo for `dir` and
    * return the brute-force scan's wall seconds. Bench calls this in
    * its `load` phase (the copurchase_edges precedent) whenever a
    * memo consumer is selected, so the one O(|queries|·|corpus|) scan
    * every evaluation query shares is REPORTED as session-load cost
    * instead of silently landing on whichever consumer happens to run
    * first (round-19 verdict item 6: q26's bench row read 0.10 s
    * because q237 had already populated the memo).
    */
  def warmExactTopK(spark: SparkSession, dir: String): Double = {
    val t0 = System.nanoTime()
    exactTopK(spark, dir).queryExecution.toRdd.count()
    (System.nanoTime() - t0) / 1e9
  }

  /** Unpersist and forget every memoized exact top-k frame. */
  def releaseShared(): Unit = {
    val it = exactTopKMemo.values().iterator()
    while (it.hasNext) {
      try it.next().unpersist(false) catch { case _: Throwable => () }
    }
    exactTopKMemo.clear()
  }

  final val NumPlanes = 8
  final val ProbeRadius = 2
  final val Dim = 64

  /** Target LSH bucket occupancy for q27: the plane count is
    * CORPUS-DERIVED — the smallest p in [NumPlanes, LshMaxPlanes]
    * with 2^p · LshBucketTarget ≥ N — so expected occupancy N/2^p
    * stays ≤ LshBucketTarget as the corpus grows and the candidate
    * stream is |q| · |probes(p)| · occupancy: linear in |q| with a
    * p² multiprobe factor that grows only logarithmically in N (the
    * production knob the fixed-8-planes demo only named in prose —
    * round-13 directive #2). At N=500/2000 the floor keeps p=8
    * (bit-identical to the historical behavior); N=20000 derives
    * p=12. Pure integer derivation (shift-and-compare) so the DuckDB
    * replay in [[LshPlanesSql]] can never diverge on a log boundary.
    */
  final val LshBucketTarget = 8
  final val LshMaxPlanes = 24

  def lshPlanes(n: Long): Int = {
    var p = NumPlanes
    while (p < LshMaxPlanes && (1L << p) * LshBucketTarget < n) p += 1
    p
  }

  /** DuckDB replay of [[lshPlanes]] over the embeddings CTE `e`. */
  private lazy val LshPlanesSql: String =
    s"(SELECT COALESCE(MIN(p), $LshMaxPlanes) FROM generate_series($NumPlanes, $LshMaxPlanes) t(p) " +
      s"WHERE (CAST(1 AS BIGINT) << p) * $LshBucketTarget >= (SELECT COUNT(*) FROM e))"

  /** ±1 hyperplane matrix, engine-independent and deterministic:
    * plane p, dimension d → sign from the parity of an md5 byte.
    * Materialized as a literal array-of-arrays column (8×64 ints) —
    * constant-folded by Catalyst, broadcast with the plan.
    */
  private def planesLit(firstPlane: Int, nPlanes: Int = NumPlanes): Column = {
    val md = java.security.MessageDigest.getInstance("MD5")
    // Double literals so the per-plane projection runs through the
    // native vector_dot (x·1.0 == x·1 bit-for-bit, oracle unchanged).
    val rows = (firstPlane until firstPlane + nPlanes).map { p =>
      (0 until Dim).map { d =>
        val h = md.digest(s"graft_plane_${p}_$d".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1.0 else -1.0
      }
    }
    array(rows.map(r => array(r.map(lit): _*)): _*)
  }

  /** nPlanes-bit sketch from planes [firstPlane, firstPlane+nPlanes):
    * bit i = sign of v·plane_{firstPlane+i}.
    */
  private def sketchWith(firstPlane: Int, v: Column,
                         nPlanes: Int = NumPlanes): Column =
    aggregate(
      zip_with(planesLit(firstPlane, nPlanes), sequence(lit(0), lit(nPlanes - 1)), (plane, p) =>
        when(dot(v, plane) > 0,
          pow(lit(2), p).cast("int")).otherwise(lit(0))),
      lit(0), (acc, x) => acc + x)

  /** All sketch values within Hamming distance ≤ 2 (multiprobe set:
    * the bucket itself, all 1-bit flips, all 2-bit flips).
    */
  private def probeSetFor(nPlanes: Int): Seq[Int] = {
    val masks = Seq(0) ++
      (0 until nPlanes).map(1 << _) ++
      (for (i <- 0 until nPlanes; j <- i + 1 until nPlanes) yield (1 << i) | (1 << j))
    masks
  }

  /** Multiprobe LSH ANN: approximate top-k from hash-bucket
    * candidates only. The md5-derived planes make the whole pipeline
    * deterministic and engine-independent, so the DuckDB oracle
    * replays sketch → multiprobe → exact rerank bit-for-bit; the
    * recall spec in LlmSpec additionally checks it against q26.
    */
  def q27_ann_lsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = lshPlanes(load(spark, dir, "embeddings").select($"vec_id").count())
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
      .withColumn("bucket", sketchWith(0, $"v", p))

    // query side from its OWN scan, not a filter of `emb`: the sketch
    // is a pure row function so both sides derive identical buckets,
    // and independent lineage sidesteps the self-join attribute-dedup
    // landmine (isolated q27 runs hit INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND
    // when the generator's inlined bucket kept a stale id — latent at
    // HEAD, exposed by exprId allocation order)
    val queries = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .filter($"vec_id" % 50 === 0)
      .withColumn("nrm", norm($"v"))
      .withColumn("bucket", sketchWith(0, $"v", p))
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"),
        explode(transform(array(probeSetFor(p).map(lit): _*), m => $"bucket".bitwiseXOR(m)))
          .as("probe_bucket"))

    val cands = emb.join(broadcast(queries),
        $"bucket" === $"probe_bucket" && $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm") * 1e6).cast("long").as("sim_micro"))
      .distinct()

    val w = Window.partitionBy($"q_id").orderBy($"sim_micro".desc, $"neighbor_id")
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TopK)
      .select($"q_id", $"rank", $"neighbor_id", $"sim_micro")
      .orderBy($"q_id", $"rank")
  }

  final val NearDupTables = 4
  final val NearDupThresholdMicro = 990000L // cosine ≥ 0.99

  /** Embedding-cosine near-duplicate pairs: 4 independent 8-plane
    * sketch tables; a pair is a candidate when ANY table buckets it
    * together (for cos ≥ 0.99 the per-table collision probability is
    * (1−θ/π)⁸ ≈ 0.69, so 4 tables miss with p ≈ 0.9%); candidates
    * verify with exact double cosine. Candidate generation is an
    * equi-join on (table_idx, sketch) — no cartesian product. The
    * oracle recomputes all-pairs exactly at sf0.01 (where the corpus
    * plants no near-dups — the empty result must match too;
    * LlmSpec plants positives to prove detection).
    */
  def q30_embedding_neardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    neardupPairs(load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v")))
  }

  /** The q30 sketch→candidate→verify core over any (vec_id, v ARRAY
    * OF DOUBLE) frame — shared with q344's planted-twin gate row so
    * the positive path runs the EXACT pipeline q30 runs.
    */
  private def neardupPairs(input: DataFrame): DataFrame = {
    val spark = input.sparkSession
    import spark.implicits._
    val emb = input.withColumn("nrm", norm($"v"))
    // table t uses planes [8t, 8t+8) of a 32-plane family; norms and
    // sketches materialize once per row, before the fan-out.
    val tables = (0 until NearDupTables).map(t =>
      struct(lit(t).as("table_idx"), sketchWith(t * NumPlanes, $"v").as("sk")))
    val sketched = emb.select($"vec_id", $"v", $"nrm", explode(array(tables: _*)).as("ts"))
      .select($"vec_id", $"v", $"nrm", $"ts.table_idx", $"ts.sk")

    sketched.as("a").join(sketched.as("b"),
        $"a.table_idx" === $"b.table_idx" && $"a.sk" === $"b.sk" &&
          $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
        round(dot($"a.v", $"b.v") / ($"a.nrm" * $"b.nrm") * 1e6).cast("long")
          .as("sim_micro"))
      .distinct()
      .filter($"sim_micro" >= NearDupThresholdMicro)
      .orderBy($"vec_a", $"vec_b")
  }

  final val PlantSliceMod = 5
  final val PlantTwinMod = 35
  final val PlantIdOffset = 10000000L

  /** q344 — q30's gate-scale positive twin (round-17 directive #6):
    * the driver corpora at sf0.01/sf0.1 plant no ≥ 0.99-cosine pairs,
    * so q30's hash-green rows verified only the EMPTY path below
    * sf1.0. This row derives a deterministic planted fixture from the
    * driver corpus itself — no side files, the KpiHarness pattern:
    * corpus = every [[PlantSliceMod]]-th embedding, twins = every
    * [[PlantTwinMod]]-th scaled by a positive per-id factor
    * 1 + ((id/35) mod 9 + 1)/10. A positive scalar multiple keeps
    * every hyperplane dot's SIGN in real arithmetic, so all four
    * sketch tables bucket twin with base and exact cosine 1.0 clears
    * the 0.99 verify. Floating-point caveat (round-18 ADVICE): the
    * twin's dot is computed per-component AFTER the scale, so a
    * hyperplane dot at the rounding boundary of zero could in
    * principle flip sign and desync a sketch table — recall is
    * certain up to that fp edge, not absolutely. A miss would need
    * all four tables to desync simultaneously AND would surface
    * loudly as an oracle FAIL (the DuckDB side is exact all-pairs),
    * so the failure mode is a visible gate red, never silent
    * wrongness. The pipeline is bit-identical to q30's
    * ([[neardupPairs]]); only the input frame differs, so the
    * ≥ 0.99 join path is hash-verified at EVERY scale each round.
    * The slice keeps the all-pairs oracle 25× under q30's, and (ids
    * ≡ 0 mod 5) excludes Sf1Gen's planted family (ids ≡ 49 mod 2500,
    * all ≡ 4 mod 5) so the two plants never interact.
    */
  def q344_neardup_planted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val slice = load(spark, dir, "embeddings")
      .filter($"vec_id" % PlantSliceMod === 0)
      .select($"vec_id", toDouble($"embedding").as("v"))
    // two-step select so `vec_id` can never resolve laterally against
    // the twin's REBASED id — the scale factor keys off the base id
    // (the DuckDB oracle mirrors the same subquery structure)
    val twins = slice.filter($"vec_id" % PlantTwinMod === 0)
      .select($"vec_id".as("base_id"), $"v")
      .select(($"base_id" + PlantIdOffset).as("vec_id"),
        expr(s"transform(v, x -> x * (1.0D + CAST((base_id div $PlantTwinMod) % 9 + 1" +
          " AS DOUBLE) / 10.0D))").as("v"))
    neardupPairs(slice.unionByName(twins))
  }

  /** PQ/RQ codebook size — a DESIGN constant (16 codewords per
    * subspace → 4-bit codes), the q316 candidate-pool bound, and the
    * floor of [[ivfK]]. Codebook size never scales with the corpus —
    * that is what distinguishes it from the IVF LIST COUNT below.
    */
  final val PqCodes = 16
  final val IvfProbes = 4

  /** Target inverted-list occupancy for the IVF family. The list
    * count k = ⌈N / IvfListTarget⌉ (clamped to [PqCodes, IvfTrainCap])
    * is CORPUS-DERIVED so list SIZE stays constant as the corpus
    * grows: probed-candidate streams are |q|·nprobe·IvfListTarget and
    * within-list pair scans are N·IvfListTarget — both linear in N,
    * which is the production posture the fixed k=16 demo only claimed
    * in prose (round-13 directive #2). At the correctness scales
    * (N=500 sf0.01, N=2000 sf0.1) the clamp floor gives k=16 —
    * bit-identical to the historical fixed-k behavior — while sf1.0
    * (N=20000) runs k=157. Flat nearest-centroid assignment costs
    * k·Dim per row (O(N²/IvfListTarget) total); past the IvfTrainCap
    * clamp a production deployment swaps in a two-level coarse
    * quantizer or HNSW-assign, which changes only [[assignTo]].
    */
  final val IvfListTarget = 128

  final val IvfTrainCap = 1024
  final val IvfTrainIters = 5

  /** Corpus-derived IVF list count (see [[IvfListTarget]]). */
  def ivfK(n: Long): Int =
    math.min(IvfTrainCap.toLong,
      math.max(PqCodes.toLong, (n + IvfListTarget - 1) / IvfListTarget)).toInt

  /** DuckDB replay of [[ivfK]] over the embeddings CTE `e` — every
    * seeded/trained-quantizer oracle derives its seed-set bound from
    * the data with this scalar subquery, so engine and oracle can
    * never disagree on k at any scale. `//` is DuckDB integer floor
    * division; both sides compute ⌈N/target⌉ as (N + target−1) ÷
    * target in exact integers.
    */
  private[llm] def ivfKSqlOver(rel: String): String =
    s"(SELECT LEAST($IvfTrainCap, GREATEST($PqCodes, " +
      s"(COUNT(*) + ${IvfListTarget - 1}) // $IvfListTarget)) FROM $rel)"

  private[llm] lazy val IvfKSql: String = ivfKSqlOver("e")

  /** HALF_UP rounding to a Long, bit-identical to Spark SQL's
    * `round()` and DuckDB's `ROUND()` on doubles (both round ties
    * away from zero) — the driver-side training below must quantize
    * exactly the way both engines' in-plan rounding does, or the two
    * Lloyd's replays diverge on a boundary point.
    */
  private def halfUp(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** Trained IVF coarse quantizer, SQL-replayable by construction:
    * Lloyd's algorithm run in EXACT integer micro-arithmetic so the
    * DuckDB oracle re-derives bit-identical centroids with five
    * unrolled CTE iterations (the round-10 verdict's last red row —
    * "KMeans isn't SQL-portable" — was a property of float Lloyd's,
    * not of training itself):
    *
    *  - sample: the IvfTrainCap rows with the smallest
    *    md5(vec_id-as-string) — a total order both engines share, so
    *    the sample is partitioning- and engine-independent (and
    *    bounded: at 100 TB the fit still touches 1024 rows);
    *  - quantization: coordinates scale to 1e-6 Longs (HALF_UP, the
    *    same rounding as both engines' ROUND);
    *  - init: the first IvfCentroids sample rows in md5 order;
    *  - iterate ×IvfTrainIters: assign each sample point to the
    *    argmin of the EXACT Long distance Σ(x−c)² (ties → lower cid;
    *    terms bounded by 64·(2e6)² ≈ 2.6e14, no overflow), then move
    *    each centroid to the HALF_UP-rounded mean of its members
    *    (sums ≤ 1024·1e6 are exact in a double, the division is one
    *    IEEE op, the rounding is the shared HALF_UP — every step
    *    reproducible in SQL); empty clusters keep their center.
    *
    * Returns (cid, centroid/1e6-as-doubles) shaped exactly like the
    * seeded quantizer, so assignment/probe/rerank machinery is shared.
    */
  private[llm] def trainedCentroids(emb: DataFrame): Array[(Int, Array[Double])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val k = ivfK(emb.select($"vec_id").count())
    val sample: Array[Array[Double]] = emb
      .select(md5($"vec_id".cast("string").cast("binary")).as("h"), $"v")
      .orderBy($"h").limit(IvfTrainCap)
      .collect().sortBy(_.getString(0))
      .map(_.getSeq[Double](1).toArray)
    require(sample.length >= k,
      s"IVF training needs ≥ $k rows, got ${sample.length}")
    val xq: Array[Array[Long]] = sample.map(_.map(x => halfUp(x * 1e6)))
    var centers: Array[Array[Long]] = xq.take(k).map(_.clone())
    for (_ <- 1 to IvfTrainIters) {
      val sums = Array.ofDim[Long](k, Dim)
      val counts = new Array[Int](k)
      var p = 0
      while (p < xq.length) {
        val x = xq(p)
        var best = 0; var bestD = Long.MaxValue
        var c = 0
        while (c < k) {
          val ctr = centers(c)
          var d = 0L; var j = 0
          while (j < Dim) { val t = x(j) - ctr(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c } // strict < → lowest cid wins ties
          c += 1
        }
        var j = 0
        while (j < Dim) { sums(best)(j) += x(j); j += 1 }
        counts(best) += 1
        p += 1
      }
      centers = Array.tabulate(k) { c =>
        if (counts(c) == 0) centers(c)
        else Array.tabulate(Dim)(j => halfUp(sums(c)(j).toDouble / counts(c)))
      }
    }
    centers.zipWithIndex.map { case (c, i) => (i, c.map(_.toDouble / 1e6)) }
  }

  /** IVF ANN with TRAINED centroids — the trained-partition scale
    * path: the micro-integer Lloyd's fit above partitions the corpus
    * into inverted lists; each query probes its IvfProbes nearest
    * centroids and exactly reranks only those lists. Candidate
    * generation is an equi-join on the centroid id; the centroid
    * table is driver-side tiny (16 × 64 doubles) and ships as a
    * constant-folded literal. Fully DuckDB-oracle-verified since
    * round 11 (training, assignment, probe AND rerank all replay);
    * LlmSpec additionally pins recall against the exact q26 answer.
    */
  def q34_ann_ivf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    ivfTopK(emb, trainedCentroids(emb))
  }

  /** The shared seeded-quantizer stage (q49 + q195): collect the
    * IvfCentroids seed vectors (a bounded tiny driver table — the
    * quantizer, same shape as shipping KMeans centers), then assign
    * every corpus row to its nearest seed. Both queries' oracles
    * replay the SAME assignment CTE, so the two call sites must stay
    * bit-identical — hence one helper, not two copies. The argmin is
    * UNROLLED to one top-level codegen'd VectorDot per centroid: a
    * `transform(centArr, …)` lambda evaluates interpreted per element
    * (HigherOrderFunction is CodegenFallback — the measured 170x
    * pitfall). Micro-rounded distances with centroid-id tie-breaks
    * keep the partition engine-independent.
    *
    * Input must carry (vec_id, v, nrm); returns the collected seeds
    * and the corpus frame with a `centroid` column appended.
    */
  /** Corpus → quantizer assignment for ANY (cid, centroid) set —
    * shared by the seeded family (q49/q195/q227/q249) and the trained
    * q34. cc is precomputed as the same left-to-right Σx² the dot
    * fold uses, so values match the oracle's list_inner_product
    * bit-for-bit.
    */
  private def assignTo(emb: DataFrame,
                       seeds: Array[(Int, Array[Double])]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // Native codegen'd argmin (graft.functions.QuantizerArgmin) —
    // bit-identical to the array_min-over-structs composition it
    // replaced (same folds, same HALF_UP micro-rounding, ties to the
    // lower cid), but one generated call per row instead of an
    // interpreted 16-struct allocation (array_min is CodegenFallback).
    emb
      .withColumn("centroid",
        graft.functions.QuantizerArgmin.argmin($"v", seeds).getField("cid"))
      .select($"vec_id", $"v", $"nrm", $"centroid")
  }

  private[llm] def seededAssignment(emb: DataFrame): (Array[(Int, Array[Double])], DataFrame) = {
    val seeds = ivfSeeds(emb)
    (seeds, assignTo(emb, seeds))
  }

  /** Shared IVF search (q34 trained / q49 seeded): assignment via
    * `assignTo`, query-side probe ranking over the centroid literals,
    * candidate equi-join on the centroid id, exact cosine rerank.
    * Distances rank on micro-rounded values with centroid-id
    * tie-breaks, so probe sets are engine-independent and the DuckDB
    * oracles replay the whole chain.
    */
  private def ivfTopK(emb: DataFrame,
                      seeds: Array[(Int, Array[Double])]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // MATERIALIZE the inverted lists before the candidate join. The
    // argmin projection contains CodegenFallback expressions
    // (array_min over per-row structs), and fused into the join stage
    // it re-evaluates per candidate ROW — |cands| interpreted argmins
    // instead of |corpus| (measured 21 s vs 1 s at 20k vectors, 2.5M
    // candidates). At cluster scale the lists are a stored table
    // anyway — build once, probe many.
    val assigned = graft.Caches.tracked(assignTo(emb, seeds))
    // Query probe ranking via ONE native quantizer_topcap call per
    // query (round 20) instead of exploding |q|·k centroid rows
    // through an exchange + row_number window — same micro-rounded
    // expand-identity distance, same (dmicro, cid) order, so the
    // probe sets are bit-identical (see QuantizerTopCap's scaladoc).
    val queries = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"),
        explode(graft.functions.QuantizerTopCap.topCap($"v", seeds, IvfProbes))
          .as("c"))
      .select($"q_id", $"qv", $"qnrm", $"c.cid".as("probe_centroid"))

    val cands = assigned.join(broadcast(queries),
        $"centroid" === $"probe_centroid" && $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm") * 1e6).cast("long").as("sim_micro"))

    val w = Window.partitionBy($"q_id").orderBy($"sim_micro".desc, $"neighbor_id")
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TopK)
      .select($"q_id", $"rank", $"neighbor_id", $"sim_micro")
      .orderBy($"q_id", $"rank")
  }

  /** IVF with deterministic seed centroids (the first IvfCentroids
    * vectors act as the coarse quantizer) — q34's exact plumbing
    * (argmin assignment → multi-probe → exact rerank) minus the
    * KMeans fit, which is the one piece SQL can't replay. This
    * variant is fully DuckDB-oracle-verified, so the inverted-list
    * machinery itself has a hash-checked ground truth; q34 keeps the
    * trained-centroid quality and its recall spec. Distances rank on
    * micro-rounded values with centroid-id tie-breaks, so the probe
    * sets are engine-independent.
    */
  def q49_ivf_seeded(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    ivfTopK(emb, ivfSeeds(emb))
  }

  // The pinned design point, chosen from the round-19 GraphSweep
  // measurement at sf1.0 (N=20k, 157 cells, 400 queries, flat scan =
  // 8M scored rows/suite): recall@10 = 9773 bp at 1.98M visited rows
  // (4.0× under the flat scan) and a stored index of ≤ N·32 edges.
  // The curve walked this round: the r18 seed point
  // (bp8/deg28/W18/R7/E6) measured 8850 bp at 1.03M visited;
  // buildProbes 10 + degree 32 took it to 9240, widening the beam to
  // W24/R8 to 9620 (1.67M), and W30/R8 lands 9773 at exactly 4×
  // under the flat scan — past it the curve flattens (W24/R9 = 9723
  // at 1.86M). Entry selection is measurably NOT the binding axis:
  // ranking all cell medoids by EXACT query cosine instead of the
  // quantizer's cell order (GraphKnobs.medoidCosEntry, sweepable)
  // buys +23 bp at this point, so the pinned entry stays the
  // zero-extra-cost quantizer-cell form. sf0.01/sf0.1 measure
  // 10000 bp at this point.
  final val GraphM = 12           // intra-cell out-degree of the build
  final val GraphBridgeM = 2      // per-bridge-cell out-degree
  final val GraphBuildProbes = 10 // cells a node's build edges may reach (own + next P−1)
  final val GraphMaxDegree = 32   // per-node cap after symmetrization
  final val GraphBeamWidth = 30   // beam width per search round
  final val GraphBeamRounds = 8   // fixed number of expansion rounds
  final val GraphEntryProbes = 6  // entry cells per query (their medoids)

  /** The graph-ANN design point as one value, so the q346 knob sweep
    * and the [[graft.llm.GraphSweep]] harness measure ALTERNATIVE
    * settings through the exact production code path instead of a
    * parallel implementation. Defaults are the pinned constants —
    * q343/q345/q347 always run the pinned point.
    */
  private[llm] final case class GraphKnobs(
      m: Int = GraphM,
      bridgeM: Int = GraphBridgeM,
      buildProbes: Int = GraphBuildProbes,
      maxDegree: Int = GraphMaxDegree,
      beamWidth: Int = GraphBeamWidth,
      rounds: Int = GraphBeamRounds,
      entryProbes: Int = GraphEntryProbes,
      medoidCosEntry: Boolean = false)

  /** q343 — graph-traversal ANN (the NSW/HNSW family, Malkov &
    * Yashunin 2016, re-expressed as bounded equi-join rounds): the
    * one serving structure the similarity family lacked next to LSH
    * (q27), IVF (q34/q49) and the quantization paths (PQ/SQ/RQ/OPQ).
    *
    * BUILD — a bounded-degree neighbor graph, one stored table at
    * production: assign every vector to its nearest seeded IVF cell
    * (the q49 quantizer — fully oracle-replayable), take each
    * vector's exact top-[[GraphM]] within its cell (Σ|cell|² ≈
    * N·IvfListTarget pair rows — linear in N) plus its
    * top-[[GraphBridgeM]] inside EACH of its next
    * [[GraphBuildProbes]]−1 nearest cells (the NSW long-range links
    * that let the walk escape its entry cell; one
    * N×(P−1)×|cell| equi-join, still linear in N), symmetrize, and
    * cap out-degree at
    * [[GraphMaxDegree]] by similarity rank. Every stage is an
    * equi-join on the cell id or a window keyed by the
    * high-cardinality vec_id — no cartesian product, no global sort.
    *
    * SEARCH — batched best-first with a fixed round count (q261's
    * bounded-iteration argument): enter at the medoids of the query's
    * [[GraphEntryProbes]] nearest cells, then [[GraphBeamRounds]] rounds of ONE
    * frontier×adjacency equi-join each, exact-scoring only NEW nodes
    * (left_anti against the visited set) and keeping the best
    * [[GraphBeamWidth]] fresh nodes per query as the next frontier.
    * Per round the candidate stream is |q|·W·deg — independent of
    * corpus size, the property that makes graph ANN the production
    * serving structure. Output: exact top-[[TopK]] of all visited
    * nodes, same shape as q26/q34 so recall is directly comparable
    * (LlmSpec pins recall@10 ≥ the IVF bar against the exact q26
    * answer). All ranks break ties on integer micro-sims then ids, so
    * the whole build+search replays bit-for-bit in the DuckDB oracle
    * (unrolled beam rounds, the IvfTrainSql pattern).
    */
  def q343_ann_graph_beam(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    rankVisited(graphBeamCore(spark, dir).visited)
      .orderBy($"q_id", $"rank")
  }

  /** The q343 build+search frames, shared with q345's audit. */
  private[llm] final case class GraphBeamFrames(
      assigned: DataFrame, adj: DataFrame, entries: DataFrame,
      visited: DataFrame)

  /** Exact top-[[TopK]] of the visited set, q26's output shape. */
  private[llm] def rankVisited(visited: DataFrame): DataFrame = {
    val spark = visited.sparkSession
    import spark.implicits._
    visited.filter($"node" =!= $"q_id")
      .withColumn("rank", row_number().over(
        Window.partitionBy($"q_id").orderBy($"sim_micro".desc, $"node")).cast("long"))
      .filter($"rank" <= TopK)
      .select($"q_id", $"rank", $"node".as("neighbor_id"), $"sim_micro")
  }

  /** The stored half of the graph index plus the query batch — what a
    * serving tier reads: the cell assignment, the degree-capped
    * adjacency, the per-query entry nodes, the query batch and the
    * (node, vector) corpus, all checkpointed. Shared by the pinned
    * search ([[graphBeamCore]]) and the q346 beam-width sweep, which
    * runs [[graphSearch]] several times over ONE build.
    */
  private[llm] final case class GraphIndex(
      assigned: DataFrame, adj: DataFrame, entries: DataFrame,
      qs: DataFrame, corpus: DataFrame, medoids: DataFrame)

  /** Batched best-first search over a built [[GraphIndex]]: fixed
    * `rounds` rounds of one frontier×adjacency equi-join each,
    * exact-scoring only NEW nodes, keeping the best `beamWidth` fresh
    * nodes per query as the next frontier. Returns the visited
    * (q_id, node, sim_micro) set. One-width view of
    * [[graphSearchMulti]] — the pinned walks (q343/q345/q349) and the
    * q346 sweep share the exact round machinery.
    */
  private[llm] def graphSearch(ix: GraphIndex, beamWidth: Int,
      rounds: Int): DataFrame = {
    val spark = ix.adj.sparkSession
    import spark.implicits._
    graphSearchMulti(ix, Seq(beamWidth), rounds)
      .select($"q_id", $"node", $"sim_micro")
  }

  /** The beam walk for EVERY width in one shared round loop: rows are
    * tagged with their width and every stage (neighbor expansion,
    * anti-join against the visited set, scoring, the frontier window)
    * keys on (beam_width, q_id), so no stage mixes rows across widths
    * and each width's visited set is bit-identical to an independent
    * walk — but a W-point sweep pays the round loop's job scheduling
    * ONCE instead of |W| times (round-19 measurement: the four
    * sequential q346 walks were 4× the round loop's driver-sequenced
    * checkpoints; this form pays the loop once — matched A/B
    * 17.2 → 9.5 s at sf0.1, bench actuals 157 → 45 scheduled
    * shuffles).
    *
    * Per round: one eager materialization of the freshly scored nodes
    * and one of the visited union (the union copy looks redundant but
    * keeps every round's physical plan SHAPE constant — see the
    * codegen-cache note in the loop body).
    */
  private[llm] def graphSearchMulti(ix: GraphIndex, widths: Seq[Int],
      rounds: Int): DataFrame = {
    val spark = ix.adj.sparkSession
    import spark.implicits._
    // Each round's wall at any scale is dominated by the number of
    // sequential stage round-trips inside its jobs (measured with
    // GraphBuildProbe at sf0.1: ~0.5 s/round, nearly all stage
    // latency — AQE OFF triples it, so the lever is round/stage
    // COUNT, not partition tuning).
    // Two variants that looked like wins on paper measured FLAT or
    // slower at the probe (kept out): carrying qv on the frontier to
    // drop the per-round query-batch broadcast (the 64-double payload
    // through every exchange/window/checkpoint outweighs one tiny
    // broadcast), and keying the neighbor dedup exchange on `node`
    // alone so anti-join + corpus join reuse it (within noise — the
    // round wall is the eager checkpoint's job latency, not any one
    // exchange).
    def score(cand: DataFrame): DataFrame = cand
      .join(ix.corpus, "node")
      .join(broadcast(ix.qs), "q_id")
      .select($"beam_width", $"q_id", $"node",
        round(dot($"qv", $"nv") / ($"qnrm" * $"nnrm") * 1e6).cast("long")
          .as("sim_micro"))
    val tagged = ix.entries.select(
      explode(array(widths.map(w => lit(w)): _*)).as("beam_width"),
      $"q_id", $"node")
    var visited = score(tagged).localCheckpoint(true)
    var frontier: DataFrame = visited.select($"beam_width", $"q_id", $"node")
    for (_ <- 1 to rounds) {
      val nbrs = frontier.join(ix.adj, $"node" === $"src")
        .select($"beam_width", $"q_id", $"dst".as("node")).distinct()
      val fresh = score(
        nbrs.join(visited.select($"beam_width", $"q_id", $"node"),
          Seq("beam_width", "q_id", "node"), "left_anti"))
        .localCheckpoint(true)
      // The visited set stays ONE re-checkpointed frame per round, not
      // an accumulated union of per-round parts: a k-part union gives
      // round k a DIFFERENT physical plan shape (k union children), so
      // every round compiles a fresh whole-stage-codegen class and the
      // suite's bounded codegen cache thrashes — measured +1.5–3 s on
      // q343/q345 in two full-suite runs while isolated (cache-warm)
      // A/Bs showed the forms tied. The checkpoint is LAZY (round 20):
      // the logical plan is cut to a LogicalRDD immediately (same
      // constant shape), but the union copy materializes inside the
      // NEXT round's fresh-scoring job (whose anti-join reads it)
      // instead of as its own driver-sequenced job — one scheduled job
      // per round instead of two, same rows persisted (the round wall
      // is job latency, measured r19; see OPTIMIZATION_r20.md).
      visited = visited.unionByName(fresh).localCheckpoint(false)
      // Literal rank bound when one width runs (the pinned walks):
      // RankLimitRewrite only fires on `rn <= <literal>`, and losing
      // it would replace the bounded-heap TopKPerGroup plan with a
      // full per-group WindowExec sort. The sweep's per-row
      // `rn <= beam_width` keeps the window form — its frontier
      // groups are W·deg rows, minor next to the 4× round-loop saving.
      val ranked = fresh.withColumn("rn", row_number().over(
        Window.partitionBy($"beam_width", $"q_id")
          .orderBy($"sim_micro".desc, $"node")))
      frontier = (if (widths.size == 1) ranked.filter($"rn" <= widths.head)
                  else ranked.filter($"rn" <= $"beam_width"))
        .select($"beam_width", $"q_id", $"node")
    }
    visited
  }

  private[llm] def graphBeamCore(spark: SparkSession, dir: String,
      k: GraphKnobs = GraphKnobs()): GraphBeamFrames = {
    val ix = graphIndexCore(spark, dir, k)
    GraphBeamFrames(ix.assigned, ix.adj, ix.entries,
      graphSearch(ix, k.beamWidth, k.rounds))
  }

  /** Cell ranks 1..cap of every vector in `emb` against a seed set —
    * the stored quantizer assignment every graph stage (build
    * adjacency, bridges, medoids, entry selection) and the q349
    * append pipeline consume. Persisted by callers as needed.
    */
  private[llm] def rankCells(emb: DataFrame,
      seeds: Array[(Int, Array[Double])], cap: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // One native quantizer_topcap call per vector (round 20) instead
    // of exploding N·k (vector, centroid) rows through an exchange and
    // a per-vector row_number sort window: element i of the returned
    // array IS cell rank i+1 under the same (dmicro, cid) order, with
    // the same micro-rounded expand-identity distance — bit-identical
    // output, zero shuffles (see QuantizerTopCap's scaladoc; plans/r20
    // q343 dump: the rankCells exchange+window pair is gone).
    emb.select($"vec_id", $"v", $"nrm",
        posexplode(graft.functions.QuantizerTopCap.topCap($"v", seeds, cap))
          .as(Seq("i", "c")))
      .select($"vec_id", $"v", $"nrm", $"c.cid".as("cid"),
        $"c.d".as("dmicro"), ($"i" + 1).as("crank"))
  }

  /** Wall-clock decomposition of the graph build + one pinned walk,
    * stage by stage (each stage forced with an action) — consumed by
    * [[graft.tools.GraphBuildProbe]]; measurement only, not a query.
    */
  private[graft] def buildProbe(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    val k = GraphKnobs()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    val seeds = t("ivfSeeds")(ivfSeeds(emb))
    val crankCap = math.max(k.entryProbes, k.buildProbes)
    val ranked = graft.Caches.tracked(rankCells(emb, seeds, crankCap))
    t("rankCells-mat")(ranked.count())
    val assigned = ranked.filter($"crank" === 1)
      .select($"vec_id", $"v", $"nrm", $"cid".as("cell"), $"dmicro")
    val second = ranked.filter($"crank" >= 2 && $"crank" <= k.buildProbes)
      .select($"vec_id", $"cid".as("cell2"))
    def pairSim(xv: org.apache.spark.sql.Column, xn: org.apache.spark.sql.Column,
        yv: org.apache.spark.sql.Column, yn: org.apache.spark.sql.Column) =
      round(dot(xv, yv) / (xn * yn) * 1e6).cast("long")
    val members = assigned.select($"cell", $"vec_id", $"v", $"nrm")
    val intra = members.as("x").join(members.as("y"),
        $"x.cell" === $"y.cell" && $"x.vec_id" =!= $"y.vec_id")
      .select($"x.vec_id".as("src"), $"y.vec_id".as("dst"),
        pairSim($"x.v", $"x.nrm", $"y.v", $"y.nrm").as("sim_micro"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"src").orderBy($"sim_micro".desc, $"dst")))
      .filter($"rn" <= k.m).drop("rn")
    t("intra")(intra.write.format("noop").mode("overwrite").save())
    val bridge = assigned.select($"vec_id", $"v", $"nrm")
      .join(second, "vec_id").as("x")
      .join(members.as("y"),
        $"x.cell2" === $"y.cell" && $"x.vec_id" =!= $"y.vec_id")
      .select($"x.vec_id".as("src"), $"x.cell2".as("bcell"),
        $"y.vec_id".as("dst"),
        pairSim($"x.v", $"x.nrm", $"y.v", $"y.nrm").as("sim_micro"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"src", $"bcell").orderBy($"sim_micro".desc, $"dst")))
      .filter($"rn" <= k.bridgeM).drop("rn").drop("bcell")
    t("bridge")(bridge.write.format("noop").mode("overwrite").save())
    val und = intra.unionByName(bridge)
    val adj = t("adj-checkpoint")(und
      .select(explode(array(
        struct($"src", $"dst", $"sim_micro"),
        struct($"dst".as("src"), $"src".as("dst"), $"sim_micro"))).as("e"))
      .select($"e.src", $"e.dst", $"e.sim_micro")
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy($"src").orderBy($"sim_micro".desc, $"dst")))
      .filter($"rn" <= k.maxDegree)
      .select($"src", $"dst", $"sim_micro")
      .localCheckpoint(true))
    val medoid = assigned.withColumn("mrank", row_number().over(
        Window.partitionBy($"cell").orderBy($"dmicro", $"vec_id")))
      .filter($"mrank" === 1).select($"cell", $"vec_id".as("medoid"))
    val qs = t("qs-checkpoint")(assigned.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
      .localCheckpoint(true))
    val entries = t("entries-checkpoint")(
      ranked.filter($"vec_id" % 50 === 0 && $"crank" <= k.entryProbes)
        .select($"vec_id".as("q_id"), $"cid".as("cell"))
        .join(medoid, Seq("cell"))
        .select($"q_id", $"medoid".as("node"))
        .distinct().localCheckpoint(true))
    val corpus = t("corpus-checkpoint")(assigned
      .select($"vec_id".as("node"), $"v".as("nv"), $"nrm".as("nnrm"))
      .localCheckpoint(true))
    val ix = GraphIndex(assigned, adj, entries, qs, corpus, medoid)
    val visited = t("walk-8-rounds")(graphSearch(ix, k.beamWidth, k.rounds))
    t("rank+drive")(rankVisited(visited)
      .write.format("noop").mode("overwrite").save())
  }

  /** Selectivity probe for a LOSSLESS geometric prune of the bridge
    * join's candidate stream (round-20, verdict item 3) — consumed by
    * [[graft.tools.BridgePruneProbe]]; measurement only, not a query.
    * Counts candidates whose centroid-triangle upper bound on cos is
    * strictly below the exact (ideal) / lower-bound-derived
    * (realistic) 2nd-best of their (src, bridge-cell) group.
    */
  private[graft] def bridgePruneProbe(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    val k = GraphKnobs()
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    val seeds = ivfSeeds(emb)
    val crankCap = math.max(k.entryProbes, k.buildProbes)
    val ranked = graft.Caches.tracked(rankCells(emb, seeds, crankCap))
    val assigned = ranked.filter($"crank" === 1)
      .select($"vec_id", $"v", $"nrm", $"cid".as("cell"), $"dmicro")
    val second = ranked.filter($"crank" >= 2 && $"crank" <= k.buildProbes)
      .select($"vec_id", $"cid".as("cell2"), $"dmicro".as("dx2"))
    val members = assigned
      .select($"cell", $"vec_id", $"v", $"nrm", $"dmicro".as("dy2"))
    val cand = assigned.select($"vec_id", $"v", $"nrm")
      .join(second, "vec_id").as("x")
      .join(members.as("y"),
        $"x.cell2" === $"y.cell" && $"x.vec_id" =!= $"y.vec_id")
      .select($"x.vec_id".as("src"), $"x.cell2".as("bcell"),
        $"y.vec_id".as("dst"),
        round(dot($"x.v", $"y.v") / ($"x.nrm" * $"y.nrm") * 1e6)
          .cast("long").as("sim"),
        $"x.nrm".as("xn"), $"y.nrm".as("yn"),
        sqrt($"x.dx2" / 1e6).as("dx"), sqrt($"y.dy2" / 1e6).as("dy"))
      .withColumn("lball", greatest(abs($"dx" - $"dy"), lit(0.0)))
      .withColumn("ub", round((($"xn" * $"xn" + $"yn" * $"yn"
          - $"lball" * $"lball") / (lit(2.0) * $"xn" * $"yn")) * 1e6)
        .cast("long"))
      .withColumn("lb", round((($"xn" * $"xn" + $"yn" * $"yn"
          - ($"dx" + $"dy") * ($"dx" + $"dy")) / (lit(2.0) * $"xn" * $"yn")) * 1e6)
        .cast("long"))
    val c = graft.Caches.tracked(cand)
    val wDesc = Window.partitionBy($"src", $"bcell").orderBy($"sim".desc, $"dst")
    val wLb = Window.partitionBy($"src", $"bcell").orderBy($"lb".desc, $"dst")
    val gg = c.withColumn("rks", row_number().over(wDesc))
      .withColumn("rkl", row_number().over(wLb))
    val t2e = gg.filter($"rks" === 2)
      .select($"src", $"bcell", $"sim".as("t2_exact"))
    val t2l = gg.filter($"rkl" === 2)
      .select($"src", $"bcell", $"lb".as("t2_lb"))
    val res = c.join(t2e, Seq("src", "bcell"), "left")
      .join(t2l, Seq("src", "bcell"), "left")
      .agg(count(lit(1)).as("cands"),
        sum(when($"ub" < $"t2_exact", 1L).otherwise(0L)).as("prune_ideal"),
        sum(when($"ub" < $"t2_lb", 1L).otherwise(0L)).as("prune_real"))
      .head
    println(s"bridge candidates=${res.getLong(0)} " +
      s"prunable_ideal=${res.getLong(1)} prunable_realistic=${res.getLong(2)}")
    graft.Caches.releaseAll(blocking = true)
  }

  private[llm] def graphIndexCore(spark: SparkSession, dir: String,
      k: GraphKnobs = GraphKnobs()): GraphIndex = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    graphIndexOver(emb, ivfSeeds(emb), k)
  }

  /** The graph build over any (vec_id, v, nrm) corpus and seed set —
    * [[graphIndexCore]] minus the load, so the q349 append audit can
    * build on the BASE slice with base-derived seeds (a production
    * append keeps the existing quantizer; it never retrains per
    * batch).
    */
  private[llm] def graphIndexOver(emb: DataFrame,
      seeds: Array[(Int, Array[Double])],
      k: GraphKnobs = GraphKnobs()): GraphIndex = {
    val spark = emb.sparkSession
    import spark.implicits._
    def pairSim(xv: Column, xn: Column, yv: Column, yn: Column): Column =
      round(dot(xv, yv) / (xn * yn) * 1e6).cast("long")

    // one explode pass ranks cells 1..max(entryProbes, buildProbes)
    // per vector; persisted — the adjacency build, bridge, medoid and
    // query stages all consume it (at production: the stored
    // assignment)
    val crankCap = math.max(k.entryProbes, k.buildProbes)
    val ranked = graft.Caches.tracked(rankCells(emb, seeds, crankCap))
    val assigned = ranked.filter($"crank" === 1)
      .select($"vec_id", $"v", $"nrm", $"cid".as("cell"), $"dmicro")
    // bridge targets: each node's cells ranked 2..buildProbes — the
    // NSW long-range links, one bounded batch per nearby cell
    val second = ranked.filter($"crank" >= 2 && $"crank" <= k.buildProbes)
      .select($"vec_id", $"cid".as("cell2"))

    val members = assigned.select($"cell", $"vec_id", $"v", $"nrm")
    val intra = members.as("x").join(members.as("y"),
        $"x.cell" === $"y.cell" && $"x.vec_id" =!= $"y.vec_id")
      .select($"x.vec_id".as("src"), $"y.vec_id".as("dst"),
        pairSim($"x.v", $"x.nrm", $"y.v", $"y.nrm").as("sim_micro"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"src").orderBy($"sim_micro".desc, $"dst")))
      .filter($"rn" <= k.m).drop("rn")
    val bridge = assigned.select($"vec_id", $"v", $"nrm")
      .join(second, "vec_id").as("x")
      .join(members.as("y"),
        $"x.cell2" === $"y.cell" && $"x.vec_id" =!= $"y.vec_id")
      .select($"x.vec_id".as("src"), $"x.cell2".as("bcell"),
        $"y.vec_id".as("dst"),
        pairSim($"x.v", $"x.nrm", $"y.v", $"y.nrm").as("sim_micro"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"src", $"bcell").orderBy($"sim_micro".desc, $"dst")))
      .filter($"rn" <= k.bridgeM).drop("rn").drop("bcell")
    val und = intra.unionByName(bridge)
    // The build outputs MATERIALIZE here (eager localCheckpoint): at
    // production adjacency/corpus/entries are STORED tables a search
    // tier reads, and in-process the checkpoint CUTS the logical
    // lineage — the beam loop below references `fresh` twice per
    // round, so an uncut plan doubles per round (2^rounds copies of
    // the whole build subtree, including the k×64 centroid literal)
    // and Catalyst spends minutes re-optimizing it: measured 474 s →
    // ~15 s at sf1.0 from this cut alone. Blocks are freed by the
    // ContextCleaner once the frames are unreachable (Bench GCs
    // between queries).
    // Both edge directions in ONE pass over the (expensive) intra ∪
    // bridge subtree (round 20, the connectedComponents edges trick):
    // the previous self-union referenced `und` twice, re-running the
    // two pair joins' window sort+filter once per branch (ReuseExchange
    // dedups only up to the exchanges below them). Multiset identical,
    // and distinct() makes the set — oracle unchanged.
    // dropDuplicates AFTER the src repartition: hash-partitioning on
    // src clusters every (src, dst, sim) row, so the dedup aggregate
    // AND the degree-cap window share ONE exchange instead of a
    // whole-row distinct exchange followed by a src-keyed window
    // exchange (round 20; the r19 support-backbone trick, guide §2.4).
    val adj = und
      .select(explode(array(
        struct($"src", $"dst", $"sim_micro"),
        struct($"dst".as("src"), $"src".as("dst"), $"sim_micro"))).as("e"))
      .select($"e.src", $"e.dst", $"e.sim_micro")
      .repartition($"src")
      .dropDuplicates("src", "dst", "sim_micro")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"src").orderBy($"sim_micro".desc, $"dst")))
      .filter($"rn" <= k.maxDegree)
      .select($"src", $"dst", $"sim_micro")
      .localCheckpoint(true)

    val medoid = assigned.withColumn("mrank", row_number().over(
        Window.partitionBy($"cell").orderBy($"dmicro", $"vec_id")))
      .filter($"mrank" === 1).select($"cell", $"vec_id".as("medoid"))
    // qs/entries checkpoint LAZILY (eager = false): the lineage cut is
    // identical, but materialization moves into the first consuming
    // job — so q349, which builds its OWN query batch and entry set
    // and discards these two, no longer pays two eager jobs for
    // frames it never reads (round-19; q343/q345/q346 materialize
    // them in their first search round at the same total cost).
    val qs = assigned.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
      .localCheckpoint(false)
    // Two entry-selection modes. Pinned: the medoids of the query's
    // entryProbes quantizer-nearest cells (crank ≤ E off the shared
    // ranked pass — zero extra work). medoidCosEntry: rank ALL cell
    // medoids by EXACT cosine to the query and enter at the top E —
    // the entry metric becomes the search metric instead of the
    // quantizer's L2-to-seed proxy. Costs one |q|×|cells| scored
    // explode over a collected medoid-vector literal (index metadata,
    // codebook-sized — the ivfSeeds/rankCells driver-state pattern),
    // still corpus-size independent per query.
    val entries = (if (k.medoidCosEntry) {
      val medVecs = medoid.join(
          assigned.select($"vec_id", $"v"), $"medoid" === $"vec_id")
        .select($"medoid", $"v").as[(Long, Seq[Double])]
        .collect().sortBy(_._1)
      val mArr = array(medVecs.map { case (mid, mv) =>
        struct(array(mv.map(lit).toSeq: _*).as("mv"), lit(mid).as("mid"))
      }.toSeq: _*)
      qs.select($"q_id", $"qv", $"qnrm", explode(mArr).as("m"))
        .withColumn("esim",
          round(dot($"qv", $"m.mv") / ($"qnrm" * norm($"m.mv")) * 1e6).cast("long"))
        .withColumn("ern", row_number().over(
          Window.partitionBy($"q_id").orderBy($"esim".desc, $"m.mid")))
        .filter($"ern" <= k.entryProbes)
        .select($"q_id", $"m.mid".as("node"))
    } else {
      ranked.filter($"vec_id" % 50 === 0 && $"crank" <= k.entryProbes)
        .select($"vec_id".as("q_id"), $"cid".as("cell"))
        .join(medoid, Seq("cell"))
        .select($"q_id", $"medoid".as("node"))
        .distinct()
    }).localCheckpoint(false)
    val corpus = assigned
      .select($"vec_id".as("node"), $"v".as("nv"), $"nrm".as("nnrm"))
      .localCheckpoint(true)
    GraphIndex(assigned, adj, entries, qs, corpus, medoid)
  }

  /** q345 — graph-ANN index/search audit: the q341/q342 observability
    * pattern pointed at q343 — the one-row census a capacity plan and
    * a recall SLO need from a deployed graph index: corpus size, cell
    * count, stored directed edges with max/avg out-degree (the
    * index's memory bound: edges ≤ N·[[GraphMaxDegree]] by
    * construction), entry rows, total visited-and-scored rows (the
    * per-query work actually done: visited/|q| vs the N a flat scan
    * pays is the serving speedup), and measured recall@10 in bp
    * against the exact q26 answer — recall as a NUMBER in the gate,
    * not a spec-only claim. The exact denominator reuses the q26
    * brute-force scan (the honest |q|·|corpus| eval cost, q300's
    * posture — this row is an EVAL readout, not a serving path). All
    * counts are 1-row aggregates broadcast into the single output
    * row; the DuckDB oracle replays build, walk, exact truth and
    * every count.
    */
  def q345_graph_ann_audit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val core = graphBeamCore(spark, dir)
    val result = rankVisited(core.visited)
    val exact = exactTopK(spark, dir)
    val hits = result.join(exact.select($"q_id", $"neighbor_id"),
      Seq("q_id", "neighbor_id")).agg(count(lit(1)).as("hits"))
    val exn = exact.agg(count(lit(1)).as("ex_rows"))
    // edge count + max out-degree in ONE pass over the adjacency
    // (round 20): Σ of the per-src counts IS count(*), so the two
    // census aggregates share the groupBy instead of scanning twice
    val adjStats = core.adj.groupBy($"src").agg(count(lit(1)).as("d"))
      .agg(coalesce(sum($"d"), lit(0L)).as("graph_edges"),
        max($"d").as("max_out_degree"))
    core.assigned
      .agg(count(lit(1)).as("n_docs"), countDistinct($"cell").as("n_cells"))
      .crossJoin(broadcast(adjStats))
      .crossJoin(broadcast(core.entries.agg(count(lit(1)).as("entry_rows"))))
      .crossJoin(broadcast(core.visited.agg(count(lit(1)).as("visited_rows"))))
      .crossJoin(broadcast(hits))
      .crossJoin(broadcast(exn))
      .select($"n_docs", $"n_cells", $"graph_edges", $"max_out_degree",
        round(lit(1000.0) * $"graph_edges" / $"n_docs").cast("long")
          .as("avg_degree_milli"),
        $"entry_rows", $"visited_rows",
        round(lit(10000.0) * $"hits" / greatest($"ex_rows", lit(1L)))
          .cast("long").as("recall_bp"))
  }

  final val GraphSweepWidths = Seq(6, 12, 18, 30)

  /** q346 — graph-ANN beam-width sweep: the q249 nprobe pattern
    * pointed at q343's one search-time knob — recall@10 and
    * visited-rows at beam width ∈ [[GraphSweepWidths]] over ONE
    * shared build, the tuning curve behind the pinned
    * [[GraphBeamWidth]] (round-19 directive #2: the knob choice is a
    * gate-MEASURED tradeoff, not folklore — the pinned width's row
    * must reproduce q345's recall_bp every round, and the curve shows
    * what a recall SLO change would cost in visited rows). The build
    * runs once ([[graphIndexCore]] — at production: the stored
    * index); each width is one [[graphSearch]] walk, per-walk cost
    * |q|·W·deg rounds independent of corpus size; recall denominators
    * reuse the memoized exact q26 scan (an EVAL readout, q300's
    * posture). The DuckDB oracle replays every walk against the same
    * shared build CTEs (prefixed unrolled rounds).
    */
  def q346_graph_beam_sweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ix = graphIndexCore(spark, dir)
    val exact = exactTopK(spark, dir)
    val exn = exact.agg(count(lit(1)).as("ex_rows"))
    // ONE shared round loop for all four widths (graphSearchMulti) —
    // per-width rows identical to four independent walks, 8 round
    // checkpoints instead of 32 (round-19 optimization; measured
    // 15.5 s → see OPTIMIZATION_r19.md). Census and recall then key
    // every aggregate on beam_width instead of looping.
    val visited = graphSearchMulti(ix, GraphSweepWidths, GraphBeamRounds)
    val ranked = visited.filter($"node" =!= $"q_id")
      .withColumn("rank", row_number().over(
        Window.partitionBy($"beam_width", $"q_id")
          .orderBy($"sim_micro".desc, $"node")).cast("long"))
      .filter($"rank" <= TopK)
      .select($"beam_width", $"q_id", $"node".as("neighbor_id"))
    val hits = ranked
      .join(exact.select($"q_id", $"neighbor_id"), Seq("q_id", "neighbor_id"))
      .groupBy($"beam_width").agg(count(lit(1)).as("hits"))
    visited.groupBy($"beam_width")
      .agg(countDistinct($"q_id").as("n_queries"),
        count(lit(1)).as("visited_rows"))
      .join(hits, Seq("beam_width"), "left")
      .crossJoin(broadcast(exn))
      .select($"beam_width".cast("long").as("beam_width"),
        $"n_queries", $"visited_rows",
        round(lit(10000.0) * coalesce($"hits", lit(0L))
          / greatest($"ex_rows", lit(1L)))
          .cast("long").as("recall_bp"))
      .orderBy($"beam_width")
  }

  final val GraphAppendMod = 10L // vec_id % 10 == 7 → the append batch

  /** q349 — graph-index append audit (round-19 directive #6, the q290
    * IVF-append pattern pointed at q343): the operational story a
    * deployed graph index needs — inserting a batch WITHOUT
    * rebuilding. Base = 90% of the corpus (vec_id % [[GraphAppendMod]]
    * ≠ 7) built exactly as q343 builds, with BASE-derived seeds (a
    * production append keeps the existing quantizer — it never
    * retrains per batch). Insert = the NSW insertion of Malkov &
    * Yashunin §4, batched: ONE [[graphSearch]] walk with the 10%
    * batch as the query set, each new node adopting its top-
    * [[GraphM]] visited as out-edges, symmetrized, then ONE degree
    * re-cap window over base∪new (the cap rule the build itself
    * uses). The census reports what a capacity plan needs: edges
    * before/added, degree-cap evictions, max out-degree after (must
    * stay ≤ [[GraphMaxDegree]]), the insert walk's scored rows (the
    * append COST — |batch|·W·deg per round, corpus-independent), and
    * recall@10 of the standard query set served by the APPENDED
    * graph against the exact full-corpus answer — append quality as
    * a gate number next to q345's full-build baseline. Every stage
    * is the same bounded equi-join machinery as q343; the DuckDB
    * oracle replays build, insert walk, re-cap, serving walk, truth
    * and every count.
    */
  def q349_graph_append_audit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = GraphKnobs()
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    val base = emb.filter($"vec_id" % GraphAppendMod =!= 7)
    val batch = emb.filter($"vec_id" % GraphAppendMod === 7)
    val seeds = ivfSeeds(base)
    val ix = graphIndexOver(base, seeds, k)
    // assignment of EVERY vector (base + batch) against the base
    // quantizer: batch entry cells for the insert walk, full query
    // entry cells for the serving walk
    val rankedAll = graft.Caches.tracked(
      rankCells(emb, seeds, k.entryProbes))
    // Lazy checkpoints (round 20): same lineage cut, but the four
    // entry/query frames materialize inside the first walk round that
    // reads them instead of as four separate eager jobs — q349's wall
    // is scheduled-job count, not row volume (scaling ratio 0.67:
    // faster on 8 cores than 32 in the r19 driver run).
    def entriesOf(pred: Column): DataFrame = rankedAll.filter(pred)
      .select($"vec_id".as("q_id"), $"cid".as("cell"))
      .join(ix.medoids, Seq("cell"))
      .select($"q_id", $"medoid".as("node")).distinct()
      .localCheckpoint(false)
    def qsOf(src: DataFrame, pred: Column): DataFrame = src.filter(pred)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
      .localCheckpoint(false)

    // ---- insert: one batched walk, top-M visited become out-edges
    val insertVisited = graphSearch(
      ix.copy(entries = entriesOf($"vec_id" % GraphAppendMod === 7),
        qs = qsOf(batch, lit(true))), k.beamWidth, k.rounds)
    val newOut = insertVisited.withColumn("rn", row_number().over(
        Window.partitionBy($"q_id").orderBy($"sim_micro".desc, $"node")))
      .filter($"rn" <= k.m)
      .select($"q_id".as("src"), $"node".as("dst"), $"sim_micro")
    // both directions in one pass over the ranked window's output
    // (round 20) — the self-union form re-ran the rank window per
    // branch; multiset identical, downstream re-cap/count unchanged
    val newEdges = newOut.select(explode(array(
        struct($"src", $"dst", $"sim_micro"),
        struct($"dst".as("src"), $"src".as("dst"), $"sim_micro"))).as("e"))
      .select($"e.src", $"e.dst", $"e.sim_micro")
    val combined = ix.adj.unionByName(newEdges)
    val appendedAdj = combined.withColumn("rn", row_number().over(
        Window.partitionBy($"src").orderBy($"sim_micro".desc, $"dst")))
      .filter($"rn" <= k.maxDegree)
      .select($"src", $"dst", $"sim_micro")
      .localCheckpoint(false)

    // ---- serve: the standard q343 query set on the appended graph.
    // The serving corpus (every vector, base + batch) reuses the
    // ALREADY-CHECKPOINTED base corpus blocks plus the 10% batch slice
    // instead of re-scanning and re-norming the full embedding table —
    // identical (node, nv, nnrm) values, one parquet scan saved
    // (round 20; row order is irrelevant to the keyed score join).
    val served = graphSearch(GraphIndex(ix.assigned, appendedAdj,
      entriesOf($"vec_id" % 50 === 0), qsOf(emb, $"vec_id" % 50 === 0),
      ix.corpus.unionByName(batch
          .select($"vec_id".as("node"), $"v".as("nv"), $"nrm".as("nnrm")))
        .localCheckpoint(false),
      ix.medoids), k.beamWidth, k.rounds)
    val exact = exactTopK(spark, dir)
    val hits = rankVisited(served)
      .join(exact.select($"q_id", $"neighbor_id"), Seq("q_id", "neighbor_id"))
      .agg(count(lit(1)).as("hits"))
    base.agg(count(lit(1)).as("n_base"))
      .crossJoin(broadcast(batch.agg(count(lit(1)).as("n_appended"))))
      .crossJoin(broadcast(ix.adj.agg(count(lit(1)).as("edges_before"))))
      .crossJoin(broadcast(newEdges.agg(count(lit(1)).as("edges_added"))))
      .crossJoin(broadcast(appendedAdj.groupBy($"src")
        .agg(count(lit(1)).as("d"))
        .agg(coalesce(sum($"d"), lit(0L)).as("edges_after"),
          max($"d").as("max_out_degree"))))
      .crossJoin(broadcast(insertVisited.agg(count(lit(1))
        .as("insert_visited_rows"))))
      .crossJoin(broadcast(served.agg(count(lit(1)).as("visited_rows"))))
      .crossJoin(broadcast(hits))
      .crossJoin(broadcast(exact.agg(count(lit(1)).as("ex_rows"))))
      .select($"n_base", $"n_appended", $"edges_before", $"edges_added",
        ($"edges_before" + $"edges_added" - $"edges_after").as("evictions"),
        $"max_out_degree", $"insert_visited_rows", $"visited_rows",
        round(lit(10000.0) * $"hits" / greatest($"ex_rows", lit(1L)))
          .cast("long").as("recall_after_bp"))
  }

  final val SemDedupThresholdMicro = 950000L // cosine ≥ 0.95

  /** q195 — SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space, then look for
    * near-duplicate pairs ONLY within a cluster — the design that
    * makes semantic dedup tractable at corpus scale, because the
    * all-pairs work is confined to cluster-sized blocks while
    * cross-cluster pairs (which can't be semantic dups) are never
    * generated. Clustering here is the seeded quantizer q49 already
    * oracle-verifies; production swaps in trained KMeans exactly as
    * q34 does, with k scaled ∝ corpus so cluster size stays bounded —
    * candidate generation remains one equi-join on the centroid id.
    *
    * Drop rule (deterministic, recursion-free): a member is dropped
    * iff SOME lower-id member of its cluster is within cosine ≥ 0.95
    * — "keep the first, drop later copies", the same first-wins
    * convention as q18/q20.
    *
    * Output is the per-cluster audit (members, candidate pairs, max
    * similarity, drops): the hash verifies the full assignment + pair
    * arithmetic even on a corpus with nothing to drop (this synthetic
    * embedding space tops out near cos 0.53, exactly like q30's
    * empty-at-0.99 contract), and the planted-duplicate spec proves
    * the drop rule fires.
    */
  def q195_semantic_dedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))

    // Seeded quantizer assignment — the SAME helper q49 uses, so the
    // two queries can never drift from the shared oracle CTE.
    // Materialized: the CodegenFallback argmin fused into the
    // within-cluster pair join would otherwise re-run per PAIR row
    // (measured 137 s vs ~5 s at 20k vectors — |pairs| ≈ Σ|cluster|²
    // interpreted argmins).
    val (_, assignedRaw) = seededAssignment(emb)
    val assigned = graft.Caches.tracked(assignedRaw)

    val members = assigned.groupBy($"centroid")
      .agg(count(lit(1)).as("n_members"))

    // Within-cluster pairs only: the self-join key IS the centroid —
    // the shuffle carries each member once per side, never a global
    // cartesian. a < b orients each pair once.
    val pairs = assigned.as("a").join(assigned.as("b"),
        $"a.centroid" === $"b.centroid" && $"a.vec_id" < $"b.vec_id")
      .select($"a.centroid".as("centroid"), $"b.vec_id".as("drop_id"),
        round(dot($"a.v", $"b.v") / ($"a.nrm" * $"b.nrm") * 1e6).cast("long")
          .as("sim_micro"))

    val audit = pairs.groupBy($"centroid")
      .agg(count(lit(1)).as("n_pairs"),
        max($"sim_micro").as("max_sim_micro"),
        countDistinct(when($"sim_micro" >= SemDedupThresholdMicro, $"drop_id"))
          .as("n_dropped"))

    members.join(audit, Seq("centroid"), "left")
      .select($"centroid".cast("long").as("centroid"), $"n_members",
        coalesce($"n_pairs", lit(0L)).as("n_pairs"),
        coalesce($"max_sim_micro", lit(-1000000L)).as("max_sim_micro"),
        coalesce($"n_dropped", lit(0L)).as("n_dropped"))
      .orderBy($"centroid")
  }

  final val ClusterSampleCap = 20L

  /** q207 — cluster-capped (density-balanced) sampling: cap every
    * embedding cluster's contribution to the training mix at
    * [[ClusterSampleCap]] members — the DataComp/SemDeDup-era recipe
    * for keeping dense semantic regions (boilerplate-heavy modes)
    * from dominating the corpus while sparse regions survive intact.
    * Clustering is the SAME seeded quantizer q49/q195 oracle-verify;
    * the survivor rule is first-wins by vec_id, so the output is a
    * pure function of the corpus.
    *
    * The within-cluster rank deliberately does NOT use a
    * `Window.partitionBy(centroid)`: k is small (16 here, and even
    * production k ≪ corpus), so a per-cluster window would funnel
    * each cluster's full membership through one task — exactly what
    * PlanLint's low-cardinality-partition-window rule flags. The rank
    * rides [[DataPrep.groupedPrefixSum]]'s two-phase range-partition
    * scan instead (rank = exclusive count of lower-id members + 1),
    * keeping parallelism data-sized at any k.
    */
  def q207_cluster_capped_sample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    val (_, assigned) = seededAssignment(emb)
    DataPrep.groupedPrefixSum(
        assigned.select($"centroid", $"vec_id", lit(1L).as("one")),
        group = "centroid", id = "vec_id", weight = "one")
      .select(col("centroid").cast("long").as("centroid"), col("vec_id"),
        (col("cum0") + 1L).as("crank"))
      .filter(col("crank") <= ClusterSampleCap)
      .orderBy(col("centroid"), col("vec_id"))
  }

  final val PqSubspaces = 8
  final val PqSubDim = Dim / PqSubspaces // 8

  /** q198 — product quantization (Jégou et al. 2011, TPAMI "Product
    * Quantization for Nearest Neighbor Search"): split each 64-dim
    * vector into 8 contiguous 8-dim subvectors and quantize each
    * against a 16-codeword subspace codebook → an 8-byte code per
    * vector, a 32× memory compression. PQ is the memory-scale path
    * for ANN at 100 TB: IVF (q34/q49) bounds WHICH vectors a query
    * scans, PQ bounds the BYTES each scanned vector costs — shipping
    * systems (FAISS IVFPQ) compose exactly these two stages.
    *
    * Codebook: the subvectors of the same `vec_id < IvfCentroids`
    * seed rows the quantizer family uses (deterministic, bounded
    * driver collect; production swaps in per-subspace KMeans exactly
    * as q34 swaps the coarse quantizer — the assignment plumbing
    * below is unchanged). Distances are micro-rounded with codeword-id
    * tie-breaks so the argmin is engine-independent, and the oracle
    * replays slice → expand-identity distance → argmin bit-for-bit.
    *
    * Output is the bounded per-(subspace, codeword) audit: member
    * count and EXACT integer sum of micro-distances (long sums are
    * summation-order-independent, so the hash verifies every one of
    * the N×8 assignments and quantization errors without emitting
    * N rows).
    *
    * Scale design: the codebook is 16×64 doubles in the PLAN
    * (constant-folded literals — no join, no broadcast var); the
    * whole assignment is one map-side projection over the corpus
    * scan; the only exchange carries ≤ 8×16 partially-aggregated
    * keys. Nothing here is corpus-quadratic and nothing shuffles the
    * corpus.
    */
  /** Subvector of codeword `cid` in subspace `m`. */
  private def pqSubvec(c: Array[Double], m: Int): Array[Double] =
    java.util.Arrays.copyOfRange(c, m * PqSubDim, (m + 1) * PqSubDim)

  /** Micro-rounded squared distance from a subspace slice column to a
    * codeword literal, via the expand identity the whole quantizer
    * family shares (`ss` is the precomputed Σx² of the slice — pass it
    * in so it's computed once per row, not once per codeword).
    */
  private def pqDistMicro(ss: Column, s: Column, sub: Array[Double]): Column =
    round((ss - lit(2.0) * dot(s, array(sub.map(lit).toSeq: _*))
      + lit(sub.map(x => x * x).sum)) * 1e6).cast("long")

  /** Shared PQ assignment stage (q198 + q199): per row, the 8 argmin
    * structs a0..a7 = (dmicro, cid) — one map-side projection, codebook
    * constant-folded into the plan. Each argmin is UNROLLED over 16
    * codeword literals on the codegen'd VectorDot path (the q49
    * lesson: a transform(...) lambda here would run interpreted per
    * element).
    */
  private def pqAssigned(emb: DataFrame,
                         seeds: Array[(Int, Array[Double])]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val withSubs = emb.select(($"vec_id" +: (0 until PqSubspaces).map(m =>
      slice($"v", m * PqSubDim + 1, PqSubDim).as(s"s$m"))): _*)
    withSubs.select(($"vec_id" +: (0 until PqSubspaces).map { m =>
      // native argmin per subspace (see assignTo) — Σc² folds
      // precomputed Scala-side, matching the oracle's
      // list_inner_product bit-for-bit
      val subs = seeds.map { case (_, c) => pqSubvec(c, m) }
      graft.functions.QuantizerArgmin.argmin(col(s"s$m"),
        subs, subs.map(_.map(x => x * x).sum)).as(s"a$m")
    }): _*)
  }

  /** First-`bound` vectors as a (cid, vector) quantizer, cids dense
    * from 0 — the shared derivation behind both seed families below.
    */
  private def firstSeeds(emb: DataFrame, bound: Int,
                         family: String): Array[(Int, Array[Double])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val seeds = emb.filter($"vec_id" < bound)
      .select($"vec_id".cast("int").as("cid"), $"v")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    // named failure for the whole seeded-quantizer family (q49/q195/
    // q198/q287/q312/…): an empty or id-sparse corpus cannot derive a
    // codebook — say so here, instead of the generic argmin dimension
    // require firing mid-scan (zero-row degenerate-probe finding)
    require(seeds.nonEmpty,
      s"$family needs vectors with vec_id < $bound to " +
        "derive its codebook (q49 convention) — corpus empty or id-sparse")
    seeds
  }

  /** PQ codebook seeds: the first [[PqCodes]] vectors — FIXED size,
    * a codebook is a design constant (see PqCodes), never ∝ corpus.
    * Public for q316's bounded candidate pool.
    */
  private[llm] def pqSeeds(emb: DataFrame): Array[(Int, Array[Double])] =
    firstSeeds(emb, PqCodes, "PQ codebook")

  /** IVF coarse-quantizer seeds: the first [[ivfK]](N) vectors — the
    * corpus-derived list count that keeps list size ≈ IvfListTarget
    * at every scale. The count scans one pruned column; callers that
    * re-derive seeds repeatedly should hold the returned array.
    */
  private[llm] def ivfSeeds(emb: DataFrame): Array[(Int, Array[Double])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    firstSeeds(emb, ivfK(emb.select($"vec_id").count()), "seeded quantizer")
  }

  def q198_product_quantization(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
    val seeds = pqSeeds(emb)
    val assigned = pqAssigned(emb, seeds)

    val stacked = assigned.select($"vec_id",
        explode(array((0 until PqSubspaces).map(m =>
          struct(lit(m).cast("long").as("subspace"),
            col(s"a$m").getField("cid").cast("long").as("code"),
            col(s"a$m").getField("d").as("dmicro"))): _*)).as("x"))
      .select($"x.subspace".as("subspace"), $"x.code".as("code"),
        $"x.dmicro".as("dmicro"))

    stacked.groupBy($"subspace", $"code")
      .agg(count(lit(1)).as("n_vecs"), sum($"dmicro").as("sum_dmicro"))
      .orderBy($"subspace", $"code")
  }

  /** q199 — PQ asymmetric-distance top-k (the ADC search of Jégou et
    * al. 2011, §IV): approximate each query→vector distance as
    * Σ_m LUT_q[m][code_m(x)], where LUT_q holds the query's EXACT
    * micro-distance to every codeword (8×16 entries, built once per
    * query) and the corpus contributes only its 8-byte PQ code. This
    * is the query-time half of IVFPQ: q49 bounds WHICH vectors a
    * query visits, q198 compresses WHAT each visited vector stores,
    * and this operator is the distance arithmetic that runs on the
    * compressed codes — per candidate, 8 array lookups + an exact
    * long sum instead of a 64-dim float scan.
    *
    * Determinism: LUT entries are the SAME micro-rounded expand-
    * identity distances as q198's assignment, and the ADC total is a
    * sum of 8 longs — order-independent, bit-identical in DuckDB's
    * replay (codes → LUT join → integer sum → rank with neighbor-id
    * tie-breaks).
    *
    * Scale design: the corpus side carries (vec_id, 8 codes) — the
    * 32×-compressed representation — and never reshuffles; the query
    * batch rides in as ONE broadcast with LUTs attached (|queries| ×
    * 128 longs); per-query top-k is a ranking window partitioned by
    * q_id exactly like q26/q27/q49, so parallelism scales with the
    * query load. Nothing corpus-quadratic, no cartesian: the
    * broadcast nested loop is the query-batch attach, the same
    * bounded-build-side shape as q26's baseline.
    */
  def q199_pq_adc_topk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
    val seeds = pqSeeds(emb)

    // corpus: PQ codes only (the compressed index) — MATERIALIZED so
    // the per-subspace argmin projection cannot collapse into the
    // query-batch attach and re-evaluate per (corpus × query) output
    // row (measured 22 s vs 1.5 s at 20k vectors × 400 queries); a
    // real PQ index is a stored code shelf anyway
    val codes = graft.Caches.tracked(pqAssigned(emb, seeds).select($"vec_id",
      array((0 until PqSubspaces).map(m => col(s"a$m").getField("cid")): _*)
        .as("codes")))

    // query batch: per query, the 8×16 LUT of exact micro-distances
    // to every codeword — computed once here, looked up per candidate
    val lut = array((0 until PqSubspaces).map { m =>
      val s = slice($"qv", m * PqSubDim + 1, PqSubDim)
      // the Σx² term repeats per codeword; the query batch is ~N/50
      // rows, so codegen CSE handles it — no hoist needed
      array(seeds.map { case (_, c) =>
        pqDistMicro(dot(s, s), s, pqSubvec(c, m))
      }.toSeq: _*)
    }: _*)
    val queries = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
      .withColumn("lut", lut)
      .select($"q_id", $"lut")

    val adc = (0 until PqSubspaces).map(m =>
        element_at(element_at($"lut", m + 1),
          element_at($"codes", m + 1) + lit(1)))
      .reduce(_ + _)
    val cands = codes.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"), adc.as("adc_micro"))

    val w = Window.partitionBy($"q_id").orderBy($"adc_micro", $"neighbor_id")
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TopK)
      .select($"q_id", $"rank", $"neighbor_id", $"adc_micro")
      .orderBy($"q_id", $"rank")
  }

  /** q211 — margin-based bitext mining (Artetxe & Schwenk, ACL'19):
    * the parallel-corpus mining step of a multilingual pipeline.
    * Two embedding pools (label 0 = "source side", label 1 = "target
    * side"); a raw cosine threshold over-selects hubs — vectors close
    * to EVERYTHING — so each pair is scored by its margin: cosine
    * normalized by the mean of both endpoints' k-NN cosines
    * (k = 4; ratio margin). Emits each source vector's best target
    * with the margin in milli-units.
    *
    * Determinism: margins are computed FROM the rounded sim_micro
    * integers (margin = 8000·sim/(Σk_x + Σk_y) since both sides use
    * k = 4), so no float path diverges between engines. Scale: the
    * demo scores the exact pair grid of two bounded pools; at corpus
    * scale the pair generator is the ANN layer (q27 LSH buckets /
    * q34 IVF probes) feeding the same margin rerank — the k-NN sums
    * and the rerank are per-query-bounded windows either way.
    */
  def q211_bitext_margin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .filter($"vec_id" % 5 === 0)
      .select($"vec_id", toDouble($"embedding").as("v"), $"label")
      .withColumn("nrm", norm($"v"))
    val xs = emb.filter($"label" === 0)
      .select($"vec_id".as("x_id"), $"v".as("xv"), $"nrm".as("xn"))
    val ys = emb.filter($"label" === 1)
      .select($"vec_id".as("y_id"), $"v".as("yv"), $"nrm".as("yn"))
    val pairs = graft.Caches.tracked(xs.crossJoin(broadcast(ys))
      .select($"x_id", $"y_id",
        round(dot($"xv", $"yv") / ($"xn" * $"yn") * 1e6).cast("long")
          .as("sim_micro")))
    val kx = pairs
      .withColumn("r", row_number().over(
        Window.partitionBy($"x_id").orderBy($"sim_micro".desc, $"y_id")))
      .filter($"r" <= 4)
      .groupBy($"x_id").agg(sum($"sim_micro").as("sumk_x"))
    val ky = pairs
      .withColumn("r", row_number().over(
        Window.partitionBy($"y_id").orderBy($"sim_micro".desc, $"x_id")))
      .filter($"r" <= 4)
      .groupBy($"y_id").agg(sum($"sim_micro").as("sumk_y"))
    pairs.join(broadcast(kx), "x_id").join(broadcast(ky), "y_id")
      .withColumn("margin_milli",
        when($"sumk_x" + $"sumk_y" === 0, lit(0L)).otherwise(
          round(lit(8000.0) * $"sim_micro" / ($"sumk_x" + $"sumk_y")).cast("long")))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"x_id").orderBy($"margin_milli".desc, $"y_id")))
      .filter($"rank" === 1)
      .select($"x_id", $"y_id", $"sim_micro", $"margin_milli")
      .orderBy($"x_id")
  }

  /** q222 — ANN hubness audit: how often each corpus vector appears
    * in the query batch's exact top-k lists (hubness — the
    * high-dimensional pathology where a few vectors are everyone's
    * neighbor, which silently skews retrieval dedup and k-NN
    * features). Derived from q26's exact broadcast top-k by one
    * bounded re-aggregation on the neighbor id (output ≤ \|queries\|·k
    * rows, so the shuffle is query-batch-sized regardless of corpus
    * size); emits vectors reached from ≥2 queries with their best
    * rank.
    */
  def q222_ann_hubness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    exactTopK(spark, dir)
      .groupBy($"neighbor_id")
      .agg(count(lit(1)).as("hub_count"), min($"rank").as("best_rank"))
      .filter($"hub_count" >= 2)
      .orderBy($"hub_count".desc, $"neighbor_id")
  }

  /** q227 — cluster purity audit: the clustering-quality gate for the
    * operators that TRUST the quantizer (q195 semantic dedup, q207
    * capped sampling) — per cluster, the majority label, its share
    * (purity), and the label spread, against the embeddings' own
    * labels as ground truth. Assignment is the same seeded quantizer
    * q49/q195 oracle-verify; the per-(cluster, label) table is
    * k·|labels| bounded, so every window and join after the one
    * corpus-wide assignment scan runs on dimension-sized frames.
    */
  def q227_cluster_purity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    val (_, assigned) = seededAssignment(emb)
    val cl = assigned
      .join(load(spark, dir, "embeddings").select($"vec_id", $"label"), "vec_id")
      .groupBy($"centroid", $"label").agg(count(lit(1)).as("n"))
    val top = cl.withColumn("r", row_number().over(
        Window.partitionBy($"centroid").orderBy($"n".desc, $"label")))
      .filter($"r" === 1)
      .select($"centroid", $"label".as("top_label"), $"n".as("top_n"))
    cl.groupBy($"centroid")
      .agg(sum($"n").as("n_members"), count(lit(1)).as("n_labels"))
      .join(top, "centroid")
      .select($"centroid".cast("long").as("centroid"), $"n_members", $"n_labels",
        $"top_label".cast("long").as("top_label"), $"top_n",
        round(lit(10000.0) * $"top_n" / $"n_members").cast("long").as("purity_bp"))
      .orderBy($"centroid")
  }

  /** q237 — kNN probe accuracy: predict each query vector's label by
    * the majority label of its exact top-10 neighbors (q26) and
    * score against its own label — the standard embedding-quality
    * probe ("do nearest neighbors share semantics?") run before an
    * embedding column is trusted for dedup or retrieval. Majority
    * vote ties break on higher best-similarity then lower label, so
    * the prediction is engine-independent. Everything after the q26
    * rerank operates on the ≤ |queries|·k vote table.
    */
  def q237_knn_probe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val labels = load(spark, dir, "embeddings").select($"vec_id", $"label")
    val votes = exactTopK(spark, dir)
      .join(labels.select($"vec_id".as("neighbor_id"), $"label".as("n_label")),
        "neighbor_id")
      .groupBy($"q_id", $"n_label")
      .agg(count(lit(1)).as("votes"), max($"sim_micro").as("best_sim"))
    votes
      .withColumn("r", row_number().over(Window.partitionBy($"q_id")
        .orderBy($"votes".desc, $"best_sim".desc, $"n_label")))
      .filter($"r" === 1)
      .join(labels.select($"vec_id".as("q_id"), $"label".as("actual")), "q_id")
      .select($"q_id", $"actual".cast("long").as("actual"),
        $"n_label".cast("long").as("predicted"), $"votes",
        ($"actual" === $"n_label").cast("int").as("correct"))
      .orderBy($"q_id")
  }

  /** Shared tail of the sketch-search operators (q247/q248): join an
    * approximate top-k against the exact q26 top-k and report
    * per-query overlap + recall@10. The exact side is the
    * oracle-verified q26 plan itself, so the recall denominator is
    * never a second implementation that could drift.
    */
  private def recallVsExact(spark: SparkSession, dir: String,
      atop: DataFrame): DataFrame = {
    import spark.implicits._
    exactTopK(spark, dir).select($"q_id", $"neighbor_id")
      .join(atop.withColumn("hit", lit(1)), Seq("q_id", "neighbor_id"), "left")
      .groupBy($"q_id")
      .agg(sum(coalesce($"hit", lit(0))).cast("long").as("n_common"))
      .select($"q_id", $"n_common", ($"n_common" * 1000L).as("recall_bp"))
      .orderBy($"q_id")
  }

  /** q247 — SQ8 scalar quantization + asymmetric-distance search (the
    * FAISS SQ8 design, the PQ sibling of q198/q199): per-dimension
    * min/max trained over the corpus (a bounded 64-row aggregate,
    * broadcast back as two arrays), codes q_i = round(255·(x−mn)/Δ),
    * and search runs the FULL-precision query against the
    * RECONSTRUCTED corpus vector (asymmetric — the query is never
    * quantized, which is where ADC gets its accuracy). Report:
    * per-query recall@10 of ADC ranking vs the exact q26 top-k — at 8
    * bits/dim the ranking should be near-lossless, and the oracle
    * replays codes, reconstruction, and ranking exactly. At 100 TB the
    * quantized corpus is 4× smaller scan volume; training stays one
    * bounded per-dim aggregate.
    */
  def q247_sq8_adc_recall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = graft.Caches.tracked(load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v")))
    val stats = emb
      .select(posexplode($"v").as(Seq("pos", "x")))
      .groupBy($"pos").agg(min($"x").as("mn"), max($"x").as("mx"))
      .agg(array_sort(collect_list(struct($"pos", $"mn", $"mx"))).as("st"))
      .select(transform($"st", s => s.getField("mn")).as("mins"),
        transform($"st", s => s.getField("mx")).as("maxs"))
    val rec = emb.crossJoin(broadcast(stats))
      .withColumn("rv", expr(
        "transform(sequence(0, 63), i -> mins[i] + round(255.0 * (v[i] - mins[i]) " +
          "/ greatest(maxs[i] - mins[i], 1e-30)) * (maxs[i] - mins[i]) / 255.0)"))
      .select($"vec_id", $"rv")
      .withColumn("rnrm", norm($"rv"))
    val queries = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
      .withColumn("qnrm", norm($"qv"))
    val adc = rec.join(broadcast(queries), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"rv") / ($"qnrm" * $"rnrm") * 1e6).cast("long").as("sim_micro"))
    val wa = Window.partitionBy($"q_id").orderBy($"sim_micro".desc, $"neighbor_id")
    val atop = adc.withColumn("rk", row_number().over(wa)).filter($"rk" <= TopK)
      .select($"q_id", $"neighbor_id")
    recallVsExact(spark, dir, atop)
  }

  final val SrpCandidates = 50

  /** q248 — sign-random-projection binary sketch + exact rerank: each
    * vector compresses to 64 Hamming bits (hyperplane signs from a
    * shared deterministic LCG — both engines derive the identical
    * plane matrix from pure integer arithmetic, no RNG state), the
    * scan ranks by Hamming distance, and only the top-50 candidates
    * get exact cosine rerank. This is the COMPRESSION flavor of
    * hyperplane LSH — q27 buckets for candidate generation, q248
    * linear-scans an 8-byte sketch (512× smaller than the raw
    * doubles) — the standard memory-bound trade at corpus scale. On
    * this near-orthogonal synthetic space 64 bits cannot separate the
    * tiny angular gaps, so measured recall is LOW — that honest
    * number is exactly what the report is for (cf. q222 hubness,
    * q234 LSH curve), and the planted-near-dup spec proves the sketch
    * finds true near-duplicates at Hamming ≈ 0.
    */
  def q248_srp_rerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // The 64 hyperplanes are a CONSTANT ±1 matrix from the pure
    // integer LCG — precompute the signs in Scala (the identical
    // arithmetic the DuckDB oracle replays in SQL) and evaluate each
    // plane as one codegen'd vector_dot against a literal array
    // instead of the interpreted transform×aggregate HOF tree the
    // first form used (64 planes × 64 dims of per-element lambda
    // invocations per row — the round-19 profile put ~4.5 s of this
    // query's sf0.1 wall in exactly that projection; HOF lambdas are
    // CodegenFallback). Per-plane accumulation order is unchanged
    // (left-to-right from 0.0 over s_d·v[d−1]), so every sign bit is
    // bit-identical to the HOF form.
    val planes: Seq[Seq[Double]] = (0 until 64).map { p =>
      (1 to 64).map { d =>
        val x = (1103515245L * (p * 64 + d) + 12345L) % 2147483648L
        if ((x / 32768L) % 2L == 0L) 1.0 else -1.0
      }
    }
    // Bits pack into ONE long (plane p at bit 63−p): Hamming distance
    // becomes bit_count(xor) — a single codegen'd popcount per
    // candidate pair instead of a 64-element zip_with fold, with the
    // identical integer distance (number of differing planes).
    val bitsExpr = planes.zipWithIndex.map { case (pl, p) =>
      when(dot(array(pl.map(lit): _*), $"v") >= 0.0, lit(1L << (63 - p)))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val emb = graft.Caches.tracked(load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("bits", bitsExpr))
    val queries = emb
      .filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"bits".as("qb"))
    val ham = emb.join(broadcast(queries), $"vec_id" =!= $"q_id")
      .select($"q_id", $"qv", $"vec_id".as("neighbor_id"), $"v",
        bit_count($"qb".bitwiseXOR($"bits")).as("ham"))
    val wh = Window.partitionBy($"q_id").orderBy($"ham", $"neighbor_id")
    val cand = ham.withColumn("hrk", row_number().over(wh))
      .filter($"hrk" <= SrpCandidates)
    val wr = Window.partitionBy($"q_id").orderBy($"sim_micro".desc, $"neighbor_id")
    val atop = cand
      .select($"q_id", $"neighbor_id",
        round(dot($"qv", $"v") / (norm($"qv") * norm($"v")) * 1e6).cast("long")
          .as("sim_micro"))
      .withColumn("rk", row_number().over(wr)).filter($"rk" <= TopK)
      .select($"q_id", $"neighbor_id")
    recallVsExact(spark, dir, atop)
  }

  final val IvfProbeLevels = Seq(1, 2, 4, 8)

  /** q249 — IVF probe sweep: recall@10 and candidate volume at nprobe
    * ∈ {1,2,4,8} on q49's oracle-verified seeded inverted lists — the
    * tuning curve behind every production nprobe choice, measured on
    * THIS corpus instead of folklore (the IVF member of the tuning
    * suite: q234 LSH recall curve, q242 band planner). One pass
    * computes all four levels: probe ranks are a bounded
    * |queries|×|centroids| window, the level explode multiplies only
    * the probe table (≤ 8 rows/query), candidates stay one equi-join
    * on centroid id, and the exact denominator is the q26 plan
    * itself.
    */
  def q249_ivf_probe_sweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    // Materialized for the same reason as ivfTopK: the sweep probes
    // up to 8 of 16 lists, so the fused CodegenFallback argmin would
    // re-run per candidate row (the round-10 verdict's 78.5 s at 20×
    // was THIS, not the exact denominator — q26 itself is sub-second).
    val (seeds, assignedRaw) = seededAssignment(emb)
    val assigned = graft.Caches.tracked(assignedRaw)
    // Probe ranking via quantizer_topcap (round 20): element i is cell
    // rank i+1 under the same (dmicro, cid) order — no |q|·k explode,
    // no ranking window (see QuantizerTopCap's scaladoc).
    val probes = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"),
        posexplode(graft.functions.QuantizerTopCap.topCap(
          $"v", seeds, IvfProbeLevels.max)).as(Seq("i", "c")))
      .withColumn("crank", $"i" + 1)
      .withColumn("nprobe", explode(array(IvfProbeLevels.map(lit): _*)))
      .filter($"crank" <= $"nprobe")
      .select($"nprobe", $"q_id", $"qv", $"qnrm", $"c.cid".as("probe_centroid"))
    val cands = graft.Caches.tracked(assigned.join(broadcast(probes),
        $"centroid" === $"probe_centroid" && $"vec_id" =!= $"q_id")
      .select($"nprobe", $"q_id", $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm") * 1e6).cast("long").as("sim_micro")))
    val nCand = cands.groupBy($"nprobe", $"q_id").agg(count(lit(1)).as("n_cand"))
    val wi = Window.partitionBy($"nprobe", $"q_id")
      .orderBy($"sim_micro".desc, $"neighbor_id")
    val itop = cands.withColumn("rk", row_number().over(wi)).filter($"rk" <= TopK)
      .select($"nprobe", $"q_id", $"neighbor_id")
    val lv = IvfProbeLevels.toDF("nprobe")
    val ov = exactTopK(spark, dir).select($"q_id", $"neighbor_id")
      .crossJoin(broadcast(lv))
      .join(itop.withColumn("hit", lit(1)),
        Seq("nprobe", "q_id", "neighbor_id"), "left")
      .groupBy($"nprobe", $"q_id")
      .agg(sum(coalesce($"hit", lit(0))).as("n_common"))
    ov.join(nCand, Seq("nprobe", "q_id"), "left")
      .groupBy($"nprobe")
      .agg(count(lit(1)).as("n_queries"),
        round(lit(10000.0) * sum($"n_common") / (lit(10) * count(lit(1))))
          .cast("long").as("recall_bp"),
        round(avg(coalesce($"n_cand", lit(0L)))).cast("long").as("mean_candidates"))
      .select($"nprobe".cast("long").as("nprobe"), $"n_queries",
        $"recall_bp", $"mean_candidates")
      .orderBy($"nprobe")
  }

  final val IvfPqRerank = 50

  /** q287 — IVFPQ end-to-end (Jégou et al. 2011 §V; the FAISS IVFPQ
    * composition, assembled from this library's own oracle-verified
    * stages): the coarse IVF quantizer bounds WHICH vectors a query
    * visits (q49's probe — IvfProbes of IvfCentroids inverted lists),
    * the PQ codes bound the BYTES each visited vector costs during the
    * scan (q198/q199's 8-byte ADC — 32× smaller than raw doubles),
    * and an exact cosine rerank of the top-IvfPqRerank ADC candidates
    * restores full precision at the end — the three-stage shape
    * production ANN actually serves. This variant encodes raw vectors
    * (IVFFlat-PQ, q199's convention) rather than residuals, so every
    * stage replays in the DuckDB oracle bit-for-bit.
    *
    * Scale design: the stored index is (centroid, 8 codes) per vector
    * — built once and MATERIALIZED (the inverted lists + code shelf of
    * a real deployment); the ADC pass touches ONLY the codes of the
    * probed lists (never raw vectors); the rerank fetches raw vectors
    * for just IvfPqRerank·|queries| rows via one equi-join back to the
    * index (the "fetch from the vector store" step). No stage is
    * corpus-quadratic; the one broadcast is the query batch with its
    * 8×16-long LUTs attached.
    */
  def q287_ivfpq_topk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    // two seed sets with different scaling laws: the coarse LIST
    // COUNT is corpus-derived (ivfK — constant list size), the PQ
    // CODEBOOK stays the fixed PqCodes design constant
    val cSeeds = ivfSeeds(emb)
    val seeds = pqSeeds(emb)

    // the stored index: coarse list id + 8-byte PQ code per vector
    // (materialized — CodegenFallback argmins must not re-evaluate
    // per candidate row, and a real IVFPQ index is a stored table)
    val codes = pqAssigned(emb, seeds).select($"vec_id",
      array((0 until PqSubspaces).map(m => col(s"a$m").getField("cid")): _*)
        .as("codes"))
    val index = graft.Caches.tracked(assignTo(emb, cSeeds).join(codes, "vec_id"))

    // query batch: probe ranking over the coarse centroids + the ADC
    // LUT of exact micro-distances to every codeword. Probe ranking
    // via quantizer_topcap (round 20): same micro-rounded distance
    // and (dmicro, cid) order as the explode+window form it replaces,
    // with no |q|·k fan-out and no ranking window.
    val lut = array((0 until PqSubspaces).map { m =>
      val s = slice($"qv", m * PqSubDim + 1, PqSubDim)
      array(seeds.map { case (_, c) =>
        pqDistMicro(dot(s, s), s, pqSubvec(c, m))
      }.toSeq: _*)
    }: _*)
    val queries = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
      .withColumn("lut", lut)
      .select($"q_id", $"lut",
        explode(graft.functions.QuantizerTopCap.topCap($"qv", cSeeds, IvfProbes))
          .as("c"))
      .select($"q_id", $"lut", $"c.cid".as("probe_centroid"))

    // ADC scan over the probed lists' CODES only — slim rows
    val adc = (0 until PqSubspaces).map(m =>
        element_at(element_at($"lut", m + 1),
          element_at($"codes", m + 1) + lit(1)))
      .reduce(_ + _)
    val cands = index.select($"vec_id", $"centroid", $"codes")
      .join(broadcast(queries),
        $"centroid" === $"probe_centroid" && $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"), adc.as("adc_micro"))
    val wa = Window.partitionBy($"q_id").orderBy($"adc_micro", $"neighbor_id")
    val atop = cands.withColumn("rk", row_number().over(wa))
      .filter($"rk" <= IvfPqRerank)
      .select($"q_id", $"neighbor_id")

    // exact rerank: fetch raw vectors for the IvfPqRerank·|queries|
    // survivors only
    val qvec = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val rr = atop
      .join(index.select($"vec_id".as("neighbor_id"), $"v", $"nrm"), "neighbor_id")
      .join(broadcast(qvec), "q_id")
      .select($"q_id", $"neighbor_id",
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm") * 1e6).cast("long").as("sim_micro"))
    val w = Window.partitionBy($"q_id").orderBy($"sim_micro".desc, $"neighbor_id")
    rr.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TopK)
      .select($"q_id", $"rank", $"neighbor_id", $"sim_micro")
      .orderBy($"q_id", $"rank")
  }

  /** q281 — hard-negative mining for contrastive training (the
    * in-batch-negatives upgrade every retrieval/embedding training
    * pipeline runs; cf. DPR, Karpukhin et al. 2020): for each query
    * vector, the most similar corpus vector with the SAME label (the
    * positive) and the most similar with a DIFFERENT label (the hard
    * negative), plus the margin between them — the smaller the
    * margin, the harder (and more valuable) the training pair.
    *
    * Scale design: one broadcast of the query batch against the
    * corpus scan (q26's exact shape — the demo ground truth; at
    * 100 TB the candidate generator is the ANN layer feeding the same
    * conditional-max tail), then ONE partial+final aggregation per
    * query with two conditional lexicographic maxes — no window, no
    * per-query sort. Determinism: maxes compare (sim_micro,
    * −neighbor_id) structs, so ties break to the lower neighbor id in
    * both engines.
    */
  def q281_hard_negatives(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"), $"label")
      .withColumn("nrm", norm($"v"))
    val queries = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"),
        $"label".as("q_label"))
    val sims = emb.join(broadcast(queries), $"vec_id" =!= $"q_id")
      .select($"q_id", $"q_label", $"label".as("n_label"),
        $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm") * 1e6).cast("long").as("sim_micro"))
    sims.groupBy($"q_id", $"q_label")
      .agg(
        max(when($"n_label" === $"q_label",
          struct($"sim_micro", (-$"neighbor_id").as("negid")))).as("pos"),
        max(when($"n_label" =!= $"q_label",
          struct($"sim_micro", (-$"neighbor_id").as("negid")))).as("neg"))
      .select($"q_id", $"q_label".cast("long").as("q_label"),
        (-$"pos.negid").as("pos_id"), $"pos.sim_micro".as("pos_sim_micro"),
        (-$"neg.negid").as("neg_id"), $"neg.sim_micro".as("neg_sim_micro"),
        ($"pos.sim_micro" - $"neg.sim_micro").as("margin_micro"))
      .orderBy($"q_id")
  }

  /** q285 — per-dimension embedding standardization parameters (the
    * diagonal-whitening fit that q278's anisotropy report decides
    * between: full PCA whitening vs this one-pass mean/variance
    * rescale). Exact-integer statistics via q278's micro-quantization
    * trick: coordinates round to 1e-6 BIGINTs once, so Σx and Σx² are
    * exact order-independent integer sums and the variance uses the
    * n·Σx² − (Σx)² cross-multiplication — bit-identical in both
    * engines, no float-summation drift anywhere. One corpus scan,
    * one 64-row aggregate; min/max ride the same pass.
    */
  def q285_embedding_standardize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ex = load(spark, dir, "embeddings")
      .select(posexplode(toDouble($"embedding")))
      .select($"pos".cast("long").as("i"),
        round($"col" * 1e6).cast("long").as("xq"))
    ex.groupBy($"i")
      .agg(count(lit(1)).as("n"), sum($"xq").as("sx"),
        sum($"xq" * $"xq").as("sxx"),
        min($"xq").as("min_e6"), max($"xq").as("max_e6"))
      .select($"i", $"n",
        round($"sx".cast("double") / $"n").cast("long").as("mean_e6"),
        round(($"n".cast("decimal(38,0)") * $"sxx"
          - $"sx".cast("decimal(38,0)") * $"sx").cast("double")
          / ($"n".cast("double") * $"n")).cast("long").as("var_e12"),
        $"min_e6", $"max_e6")
      .orderBy($"i")
  }

  /** q339 — diagonal-covariance Fréchet distance per label slice vs
    * the whole corpus (the FID functional of Heusel et al. 2017,
    * restricted to diagonal Gaussians — the form whose statistics a
    * distributed scan can actually produce): d² = ‖μ_ℓ − μ‖² +
    * Σ_d (σ²_ℓ + σ² − 2·√(σ²_ℓ·σ²)) — the DISTRIBUTION-level drift
    * readout beside the mean-only q219 (two slices can share a mean
    * and still differ wildly in spread; Fréchet sees it, a mean delta
    * cannot). Statistics follow q285's integer posture: per-element
    * micro-quantization, exact long/decimal sums, each per-dim
    * mean/variance ONE rounded division; the per-dim geometric term
    * micro-rounds its own √ tree before the exact integer sum over
    * the 64-dim axis (never an order-dependent double sum). Two
    * aggregations over the one exploded scan — |labels|·64 and
    * 64-row tables; the global side broadcasts. Per-dim variance
    * products run in DOUBLE (1e12·1e12 overflows int64; the double
    * product is one deterministic IEEE rounding both engines share).
    */
  def q339_frechet_labels(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = "decimal(38,0)"
    val ex = graft.Caches.tracked(load(spark, dir, "embeddings")
      .select($"label", posexplode(toDouble($"embedding")))
      .select($"label".cast("long").as("label"),
        $"pos".cast("long").as("i"),
        round($"col" * 1e6).cast("long").as("xq")))
    def moments(grouped: DataFrame): DataFrame = grouped
      .select(grouped.columns.dropRight(3).map(col) :+
        col("n") :+
        round(col("sx").cast("double") / col("n")).cast("long").as("mean_e6") :+
        round((col("n").cast(dec) * col("sxx")
          - col("sx").cast(dec) * col("sx")).cast("double")
          / (col("n").cast("double") * col("n"))).cast("long").as("var_e12"): _*)
    val sl = moments(ex.groupBy($"label", $"i")
      .agg(count(lit(1)).as("n"), sum($"xq").as("sx"),
        sum($"xq" * $"xq").as("sxx")))
    val sg = moments(ex.groupBy($"i")
      .agg(count(lit(1)).as("n"), sum($"xq").as("sx"),
        sum($"xq" * $"xq").as("sxx")))
      .select($"i", $"mean_e6".as("gmean_e6"), $"var_e12".as("gvar_e12"))
    sl.join(broadcast(sg), "i")
      .withColumn("dm", $"mean_e6" - $"gmean_e6")
      .withColumn("term_var", $"var_e12" + $"gvar_e12"
        - round(lit(2.0) * sqrt($"var_e12".cast("double") * $"gvar_e12"))
          .cast("long"))
      .groupBy($"label")
      .agg(max($"n").as("n_vecs"),
        sum($"dm" * $"dm").as("mean_gap_e12"),
        sum($"term_var").as("var_gap_e12"))
      .select($"label", $"n_vecs", $"mean_gap_e12", $"var_gap_e12",
        ($"mean_gap_e12" + $"var_gap_e12").as("frechet_e12"))
      .orderBy($"label")
  }

  /** q278 — embedding anisotropy (Ethayarajh 2019): the share of
    * total variance on the top principal component — the "is my
    * embedding space collapsing into a cone" diagnostic that decides
    * whether whitening is needed before cosine retrieval (an
    * anisotropic space makes every cosine look high and ANN recall
    * lie). The covariance is EXACT INTEGER arithmetic: embedding
    * values quantize to 1e-6 BIGINTs (round of a float→double is
    * engine-identical), and n·Σxy − Σx·Σy over the (i,j) grid keeps
    * every cell exact — so the 3-round power iteration downstream
    * runs on bit-identical matrices in both engines. The only
    * corpus-sized work is one self-join on vec_id producing the
    * 64×64 cell partial sums map-side; everything after is a
    * 4096-row fixed-cost computation. The n·Σxy − Σx·Σy combination
    * runs in decimal(38,0) — at 2e4 vecs the cells already pass 2⁶³
    * (found by the 20× scale stress; a silent Long wrap here is a
    * wrong eigenvector, not an error) — and only then narrows to
    * double (one exactly-rounded conversion, identical in both
    * engines) for the fixed-cost iteration. Σxy itself stays BIGINT:
    * it holds to ~4e7 vectors, and the decimal widening of the
    * combination is on 4096 rows, not the corpus.
    */
  def q278_anisotropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Quantize per vector (the same round(x·1e6)→BIGINT elementwise
    // expression the exploded form used — identical integers), then
    // accumulate the FULL 64×64 Gram matrix, the per-dim sums and the
    // vector count in ONE narrow mapPartitions pass: each partition
    // emits at most 64·64+64+1 partial rows, and one tiny aggregate
    // combines them. The first form exploded the corpus 64× (tracked
    // 128 k-row frame at sf0.1), ran THREE aggregates over it and a
    // vec_id self-join fanning out 64²·N pair rows through an
    // exchange; every partial here is an exact INTEGER sum, so any
    // accumulation order yields the bit-identical Σx/Σxy/n the
    // downstream decimal covariance consumed before (round-19
    // optimization — the power-iteration chain below is untouched).
    val grams = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .select($"vec_id",
        expr("transform(v, x -> cast(round(x * 1e6) as bigint))").as("xq"))
      .as[(Long, Array[Long])]
      .mapPartitions { it =>
        val sx = new Array[Long](Dim)
        val gram = Array.ofDim[Long](Dim, Dim)
        var n = 0L
        it.foreach { case (_, xq) =>
          n += 1
          var i = 0
          while (i < xq.length) {
            sx(i) += xq(i)
            var j = 0
            while (j < xq.length) { gram(i)(j) += xq(i) * xq(j); j += 1 }
            i += 1
          }
        }
        if (n == 0L) Iterator.empty
        else {
          val rows = for { i <- 0 until Dim; j <- 0 until Dim }
            yield (i.toLong, j.toLong, gram(i)(j), 0L)
          (rows.iterator
            ++ (0 until Dim).iterator.map(i => (i.toLong, -1L, sx(i), 0L))
            ++ Iterator((-1L, -1L, 0L, n)))
        }
      }
      .toDF("i", "j", "s", "cnt")
    val tot = graft.Caches.tracked(
      grams.groupBy($"i", $"j").agg(sum($"s").as("s"), sum($"cnt").as("cnt")))
    val n = tot.filter($"i" === -1L && $"j" === -1L).select($"cnt".as("n"))
    val sx = tot.filter($"i" >= 0L && $"j" === -1L).select($"i", $"s".as("sx"))
    val sxy = tot.filter($"i" >= 0L && $"j" >= 0L)
      .select($"i", $"j", $"s".as("sxy"))
    val cov = graft.Caches.tracked(sxy
      .join(broadcast(sx.select($"i", $"sx".as("sxi"))), "i")
      .join(broadcast(sx.select($"i".as("j"), $"sx".as("sxj"))), "j")
      .crossJoin(broadcast(n))
      .select($"i", $"j",
        ($"n".cast("decimal(38,0)") * $"sxy"
          - $"sxi".cast("decimal(38,0)") * $"sxj").cast("double").as("c"),
        $"n"))
    val tr = cov.filter($"i" === $"j").agg(sum($"c").as("trace"))
    val u1 = cov.groupBy($"i").agg(sum($"c").as("u"))
    // greatest(nm, tiny) is a no-op whenever nm > 0 (every real
    // corpus) and keeps the all-zero-covariance degenerate from an
    // ANSI division error (degenerate-probe finding)
    val v1 = u1.crossJoin(broadcast(u1.agg(sqrt(sum($"u" * $"u")).as("nm"))))
      .select($"i".as("j"), ($"u" / greatest($"nm", lit(1e-300))).as("v"))
    val u2 = cov.join(broadcast(v1), "j")
      .groupBy($"i").agg(sum($"c" * $"v").as("u"))
    val v2 = u2.crossJoin(broadcast(u2.agg(sqrt(sum($"u" * $"u")).as("nm"))))
      .select($"i".as("j"), ($"u" / greatest($"nm", lit(1e-300))).as("v"))
    val u3 = cov.join(broadcast(v2), "j")
      .groupBy($"i").agg(sum($"c" * $"v").as("u"))
    val ray = u3.join(broadcast(v2.select($"j".as("i"), $"v")), "i")
      .agg(sum($"u" * $"v").as("lam"))
    cov.select($"n").limit(1)
      .crossJoin(broadcast(tr)).crossJoin(broadcast(ray))
      .select($"n",
        round($"trace" / ($"n" * $"n")).cast("long").as("total_var_e12"),
        when($"trace" > 0.0,
          round(lit(1e6) * $"lam" / $"trace").cast("long"))
          .otherwise(lit(null).cast("long")).as("top_share_micro"))
  }

  /** q329 — whitening APPLY-side readout (the "did whitening help"
    * answer q278's anisotropy report and q285's fitted parameters
    * motivate): standardize every embedding with q285's per-dim
    * mean/variance (diagonal whitening), re-run the exact cosine
    * top-k, and report per query how much of the RAW exact top-k
    * (the memoized q26 denominator) survives the rescaling —
    * overlap@k = k means whitening didn't change retrieval; a low
    * overlap means high-variance dims were dominating the cosine and
    * the whitened ranking is genuinely different. Determinism: the
    * whitened coordinates derive from q285's oracle-verified INTEGER
    * stats (w = (round(x·1e6) − mean_e6)/√var_e12 — identical
    * integers → identical doubles in both engines), similarities
    * micro-round before ranking, ties break on vec_id; zero-variance
    * dims contribute 0 and the norm PRODUCT takes a GREATEST(·,
    * 1e-300) floor (degenerate-probe posture: constant corpora whiten
    * to all-zero vectors and emit sim 0, never NaN or an ANSI
    * divide — flooring each factor separately would underflow
    * 1e-300² to 0.0). Scale shape: the 64-row stats
    * collect is bounded driver state (codebook-seed posture); the
    * whitened ranking is one broadcast |q|×|corpus| eval scan beside
    * the memoized raw one — the eval-table family (allowlisted like
    * q293), not a serving path.
    */
  def q329_whitened_recall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats = q285_embedding_standardize(spark, dir)
      .select($"i", $"mean_e6", $"var_e12")
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2)))
      .sortBy(_._1) // ≤ Dim rows, never ∝ corpus
    val byDim = stats.map(s => s._1 -> s).toMap
    val means = Array.tabulate(Dim)(i => byDim.get(i).map(_._2.toDouble).getOrElse(0.0))
    val sds = Array.tabulate(Dim)(i =>
      byDim.get(i).map(s => math.sqrt(s._3.toDouble)).getOrElse(1.0))
    val wn = graft.Caches.tracked(load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("m", array(means.toIndexedSeq.map(lit): _*))
      .withColumn("sd", array(sds.toIndexedSeq.map(lit): _*))
      .withColumn("w", expr(
        """transform(v, (x, i) ->
          |  IF(element_at(sd, i + 1) = 0D, 0D,
          |     (round(x * 1e6) - element_at(m, i + 1)) / element_at(sd, i + 1)))""".stripMargin))
      .select($"vec_id", $"w", norm($"w").as("nrm")))
    val q = wn.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"w".as("qw"), $"nrm".as("qn"))
    val sims = wn.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        // the norm PRODUCT takes the floor (not each factor): two
        // zero norms would otherwise underflow 1e-300·1e-300 to 0.0
        // and trip the ANSI divide — the all-zero-whitened constant
        // corpus emits sim 0, never throws (degenerate-probe posture)
        round(dot($"qw", $"w")
          / greatest($"qn" * $"nrm", lit(1e-300))
          * 1e6).cast("long").as("sim_micro"))
    val w = Window.partitionBy($"q_id").orderBy($"sim_micro".desc, $"neighbor_id")
    val wtop = graft.Caches.tracked(sims
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TopK))
    val raw = exactTopK(spark, dir).select($"q_id", $"neighbor_id")
    val ov = wtop.join(raw, Seq("q_id", "neighbor_id"))
      .groupBy($"q_id").agg(count(lit(1)).as("n_overlap"))
    wtop.filter($"rank" === 1)
      .select($"q_id", $"neighbor_id".as("w_top1_id"),
        $"sim_micro".as("w_top1_sim_micro"))
      .join(ov, Seq("q_id"), "left")
      .select($"q_id", coalesce($"n_overlap", lit(0L)).as("n_overlap"),
        $"w_top1_id", $"w_top1_sim_micro")
      .orderBy($"q_id")
  }

  /** q330 — OPQ-style dimension-allocation audit for the PQ family
    * (Ge et al. 2013's eigenvalue allocation, in its permutation
    * form): product quantization splits the 64 dims into
    * [[PqSubspaces]] contiguous blocks, and its error concentrates
    * wherever one block hoards the variance. This audit compares the
    * per-subspace variance mass under (a) the natural contiguous
    * split q198 uses and (b) the OPQ-style balanced allocation —
    * dims sorted by variance, round-robined across subspaces — plus
    * the max/min imbalance ratio of each, the "would a rotation/
    * permutation help before re-training codebooks" readout. All
    * arithmetic is exact integers off q285's variance table (64
    * rows) until the two closing ratio divisions; corpora with a
    * zero-variance subspace emit NULL ratios, never throw. One
    * corpus scan (the q285 aggregate); everything after is 64 rows.
    */
  def q330_opq_allocation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val st = q285_embedding_standardize(spark, dir)
      .select($"i", $"var_e12")
      .withColumn("nat_sub", expr(s"i div $PqSubDim"))
      // value-bounded window: exactly Dim = 64 rows by construction
      .withColumn("rnk", row_number().over(
        Window.orderBy($"var_e12".desc, $"i")).cast("long"))
      .withColumn("rr_sub", ($"rnk" - 1) % PqSubspaces)
    val nat = st.groupBy($"nat_sub".as("subspace"))
      .agg(sum($"var_e12").as("nat_var_e12"))
    val rr = st.groupBy($"rr_sub".as("subspace"))
      .agg(sum($"var_e12").as("rr_var_e12"))
    val j = nat.join(rr, "subspace")
    val t = j.agg(max($"nat_var_e12").as("natmax"), min($"nat_var_e12").as("natmin"),
      max($"rr_var_e12").as("rrmax"), min($"rr_var_e12").as("rrmin"))
    j.crossJoin(broadcast(t))
      .select($"subspace", $"nat_var_e12", $"rr_var_e12",
        when($"natmin" > 0,
          round(lit(10000.0) * $"natmax" / $"natmin").cast("long"))
          .as("nat_imbalance_bp"),
        when($"rrmin" > 0,
          round(lit(10000.0) * $"rrmax" / $"rrmin").cast("long"))
          .as("rr_imbalance_bp"))
      .orderBy($"subspace")
  }

  /** q331 — OPQ-style reallocation APPLY side (the payoff metric
    * q330's variance audit only predicts): quantize the corpus twice
    * with the SAME 16-codeword-per-subspace PQ convention (q198's
    * seeded codebook, micro-rounded expand-identity distances,
    * codeword-id tie-breaks) — once on the natural contiguous dim
    * order, once with the dims PERMUTED by q330's variance-sorted
    * round-robin allocation (the permutation applies to data AND
    * codebook, exactly as OPQ applies its rotation) — and report the
    * per-subspace quantization-error mass of each plus the total
    * error reduction in basis points: the measured "did reallocation
    * help" answer. The permutation derives from q285's oracle-
    * verified integer variance table (64 rows, driver-side — the
    * codebook-seed posture), so both engines build the identical
    * permutation. Scale shape: two map-side assignment projections
    * over one corpus scan each (codebooks constant-folded into the
    * plan), one ≤ 8×16-key exchange each — linear, nothing
    * corpus-quadratic. Zero-total-error corpora emit NULL gain.
    */
  def q331_opq_reallocation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
    val seeds = pqSeeds(emb)
    // variance-ranked round-robin permutation: the dim with rank r
    // (var desc, dim asc) lands in subspace (r−1)%8, slot (r−1)/8 —
    // output position j therefore reads the dim ranked (j%8)·8+(j/8)+1
    val stats = q285_embedding_standardize(spark, dir)
      .select($"i", $"var_e12").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1))).toSeq
    val ranked = stats.sortBy { case (i, v) => (-v, i) }.map(_._1) // rank→dim
    val perm = Array.tabulate(Dim)(j => ranked((j % PqSubspaces) * PqSubDim
      + j / PqSubspaces))
    def permute(v: Array[Double]): Array[Double] = perm.map(v)
    val permCol = array(perm.toIndexedSeq.map(p =>
      element_at($"v", p + 1)): _*)

    def errBySub(assigned: DataFrame, tag: String): DataFrame =
      assigned.select(explode(array((0 until PqSubspaces).map(m =>
          struct(lit(m.toLong).as("subspace"),
            col(s"a$m").getField("d").as("dmicro"))): _*)).as("x"))
        .select($"x.subspace".as("subspace"), $"x.dmicro".as("dmicro"))
        .groupBy($"subspace")
        .agg(count(lit(1)).as(s"n_$tag"), sum($"dmicro").as(s"${tag}_err"))

    val nat = errBySub(pqAssigned(emb, seeds), "nat")
      .select($"subspace", $"n_nat".as("n_vecs"), $"nat_err".as("nat_err_sum"))
    val rr = errBySub(
      pqAssigned(emb.select($"vec_id", permCol.as("v")),
        seeds.map { case (cid, c) => (cid, permute(c)) }), "rr")
      .select($"subspace", $"rr_err".as("rr_err_sum"))
    val j = nat.join(rr, "subspace")
    val tot = j.agg(sum($"nat_err_sum").as("nt"), sum($"rr_err_sum").as("rt"))
    j.crossJoin(broadcast(tot))
      .select($"subspace", $"n_vecs", $"nat_err_sum", $"rr_err_sum",
        when($"nt" > 0,
          round(lit(10000.0) * ($"nt" - $"rt") / $"nt").cast("long"))
          .as("gain_bp"))
      .orderBy($"subspace")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q331_opq_reallocation" -> q331_opq_reallocation,
    "q329_whitened_recall" -> q329_whitened_recall,
    "q330_opq_allocation" -> q330_opq_allocation,
    "q287_ivfpq_topk" -> q287_ivfpq_topk,
    "q281_hard_negatives" -> q281_hard_negatives,
    "q285_embedding_standardize" -> q285_embedding_standardize,
    "q339_frechet_labels" -> q339_frechet_labels,
    "q278_anisotropy" -> q278_anisotropy,
    "q247_sq8_adc_recall" -> q247_sq8_adc_recall,
    "q248_srp_rerank" -> q248_srp_rerank,
    "q249_ivf_probe_sweep" -> q249_ivf_probe_sweep,
    "q237_knn_probe" -> q237_knn_probe,
    "q227_cluster_purity" -> q227_cluster_purity,
    "q222_ann_hubness" -> q222_ann_hubness,
    "q211_bitext_margin" -> q211_bitext_margin,
    "q26_ann_topk" -> q26_ann_topk,
    "q198_product_quantization" -> q198_product_quantization,
    "q199_pq_adc_topk" -> q199_pq_adc_topk,
    "q27_ann_lsh" -> q27_ann_lsh,
    "q30_embedding_neardup" -> q30_embedding_neardup,
    "q344_neardup_planted" -> q344_neardup_planted,
    "q343_ann_graph_beam" -> q343_ann_graph_beam,
    "q345_graph_ann_audit" -> q345_graph_ann_audit,
    "q346_graph_beam_sweep" -> q346_graph_beam_sweep,
    "q349_graph_append_audit" -> q349_graph_append_audit,
    "q34_ann_ivf" -> q34_ann_ivf,
    "q49_ivf_seeded" -> q49_ivf_seeded,
    "q207_cluster_capped_sample" -> q207_cluster_capped_sample,
    "q195_semantic_dedup" -> q195_semantic_dedup)

  val oracle: Map[String, String] = Map(
    "q331_opq_reallocation" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ex AS (SELECT vec_id, g.i - 1 AS i,
        |    CAST(ROUND(1e6 * embedding[g.i]) AS BIGINT) AS xq
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g),
        |st AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(xq * xq) AS BIGINT) AS sxx
        |      FROM ex GROUP BY 1),
        |pm AS (SELECT i, CAST(ROUND(CAST(CAST(n AS DECIMAL(38,0)) * sxx
        |            - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
        |          / (CAST(n AS DOUBLE) * n)) AS BIGINT) AS var_e12
        |      FROM st),
        |rk AS (SELECT i, ROW_NUMBER() OVER (ORDER BY var_e12 DESC, i) AS r FROM pm),
        |pos AS (SELECT j.j, rk.i + 1 AS src
        |      FROM generate_series(1, 64) j(j)
        |      JOIN rk ON rk.r = ((j.j - 1) % $PqSubspaces) * $PqSubDim
        |                       + (j.j - 1) // $PqSubspaces + 1),
        |perm AS (SELECT list(src ORDER BY j) AS p FROM pos),
        |pe AS MATERIALIZED (SELECT vec_id,
        |        list_transform(generate_series(1, 64), j -> v[p[j]]) AS v
        |      FROM e, perm),
        |sN AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < $PqCodes),
        |sR AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM pe WHERE vec_id < $PqCodes),
        |subN AS (
        |  SELECT e.vec_id, m.m, s.cid,
        |    CAST(ROUND((
        |      list_inner_product(e.v[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim],
        |                         e.v[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim])
        |      - 2.0 * list_inner_product(e.v[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim],
        |                                 s.cv[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim])
        |      + list_inner_product(s.cv[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim],
        |                           s.cv[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim])) * 1e6)
        |      AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN generate_series(0, ${PqSubspaces - 1}) m(m) CROSS JOIN sN s),
        |subR AS (
        |  SELECT pe.vec_id, m.m, s.cid,
        |    CAST(ROUND((
        |      list_inner_product(pe.v[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim],
        |                         pe.v[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim])
        |      - 2.0 * list_inner_product(pe.v[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim],
        |                                 s.cv[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim])
        |      + list_inner_product(s.cv[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim],
        |                           s.cv[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim])) * 1e6)
        |      AS BIGINT) AS dmicro
        |  FROM pe CROSS JOIN generate_series(0, ${PqSubspaces - 1}) m(m) CROSS JOIN sR s),
        |aN AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |        CAST(SUM(dmicro) AS BIGINT) AS nat_err_sum FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
        |      ORDER BY dmicro, cid) AS rn FROM subN) WHERE rn = 1 GROUP BY m),
        |aR AS (SELECT m, CAST(SUM(dmicro) AS BIGINT) AS rr_err_sum FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
        |      ORDER BY dmicro, cid) AS rn FROM subR) WHERE rn = 1 GROUP BY m),
        |j AS (SELECT aN.m, n_vecs, nat_err_sum, rr_err_sum
        |      FROM aN JOIN aR ON aR.m = aN.m),
        |t AS (SELECT CAST(SUM(nat_err_sum) AS BIGINT) AS nt,
        |        CAST(SUM(rr_err_sum) AS BIGINT) AS rt FROM j)
        |SELECT CAST(m AS BIGINT) AS subspace, n_vecs, nat_err_sum, rr_err_sum,
        |  CASE WHEN nt > 0
        |    THEN CAST(ROUND(10000.0 * (nt - rt) / nt) AS BIGINT) END AS gain_bp
        |FROM j CROSS JOIN t ORDER BY subspace""".stripMargin,
    "q329_whitened_recall" ->
      s"""WITH ex AS (SELECT vec_id, g.i AS i,
        |    CAST(ROUND(CAST(embedding[g.i] AS DOUBLE) * 1e6) AS BIGINT) AS xq
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g),
        |st AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(xq * xq) AS BIGINT) AS sxx
        |      FROM ex GROUP BY 1),
        |pm AS (SELECT i, CAST(ROUND(CAST(sx AS DOUBLE) / n) AS BIGINT) AS mean_e6,
        |        CAST(ROUND(CAST(CAST(n AS DECIMAL(38,0)) * sxx
        |            - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
        |          / (CAST(n AS DOUBLE) * n)) AS BIGINT) AS var_e12
        |      FROM st),
        |wv AS MATERIALIZED (SELECT e.vec_id,
        |        list(CASE WHEN pm.var_e12 = 0 THEN 0.0
        |          ELSE (ROUND(CAST(e.embedding[pm.i] AS DOUBLE) * 1e6) - pm.mean_e6)
        |               / sqrt(CAST(pm.var_e12 AS DOUBLE)) END ORDER BY pm.i) AS w
        |      FROM embeddings e, pm GROUP BY e.vec_id),
        |wn AS MATERIALIZED (SELECT vec_id, w,
        |        sqrt(list_sum(list_transform(w, x -> x * x))) AS nrm FROM wv),
        |q AS (SELECT vec_id AS q_id, w AS qw, nrm AS qn FROM wn WHERE vec_id % 50 = 0),
        |s AS (SELECT q.q_id, e.vec_id AS neighbor_id,
        |        CAST(ROUND(list_sum(list_transform(generate_series(1, 64),
        |            k -> q.qw[k] * e.w[k]))
        |          / GREATEST(q.qn * e.nrm, 1e-300) * 1e6)
        |          AS BIGINT) AS sim_micro
        |      FROM q JOIN wn e ON e.vec_id <> q.q_id),
        |r AS (SELECT q_id, neighbor_id, sim_micro,
        |        ROW_NUMBER() OVER (PARTITION BY q_id
        |          ORDER BY sim_micro DESC, neighbor_id) AS rank FROM s),
        |wt AS MATERIALIZED (SELECT * FROM r WHERE rank <= $TopK),
        |etop AS (SELECT q_id, neighbor_id FROM ($Q26Sql) zz),
        |ov AS (SELECT wt.q_id, CAST(COUNT(e.neighbor_id) AS BIGINT) AS n_overlap
        |      FROM wt LEFT JOIN etop e ON e.q_id = wt.q_id
        |        AND e.neighbor_id = wt.neighbor_id GROUP BY 1)
        |SELECT w1.q_id, ov.n_overlap, w1.neighbor_id AS w_top1_id,
        |  w1.sim_micro AS w_top1_sim_micro
        |FROM (SELECT * FROM wt WHERE rank = 1) w1 JOIN ov ON ov.q_id = w1.q_id
        |ORDER BY w1.q_id""".stripMargin,
    "q330_opq_allocation" ->
      s"""WITH ex AS (SELECT vec_id, g.i - 1 AS i,
        |    CAST(ROUND(1e6 * embedding[g.i]) AS BIGINT) AS xq
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g),
        |st AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(xq * xq) AS BIGINT) AS sxx
        |      FROM ex GROUP BY 1),
        |pm AS (SELECT i, CAST(ROUND(CAST(CAST(n AS DECIMAL(38,0)) * sxx
        |            - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
        |          / (CAST(n AS DOUBLE) * n)) AS BIGINT) AS var_e12
        |      FROM st),
        |al AS (SELECT i, var_e12, i // $PqSubDim AS nat_sub,
        |        (ROW_NUMBER() OVER (ORDER BY var_e12 DESC, i) - 1)
        |          % $PqSubspaces AS rr_sub FROM pm),
        |nat AS (SELECT nat_sub AS subspace,
        |        CAST(SUM(var_e12) AS BIGINT) AS nat_var_e12 FROM al GROUP BY 1),
        |rr AS (SELECT rr_sub AS subspace,
        |        CAST(SUM(var_e12) AS BIGINT) AS rr_var_e12 FROM al GROUP BY 1),
        |j AS (SELECT nat.subspace, nat_var_e12, rr_var_e12
        |      FROM nat JOIN rr USING (subspace)),
        |t AS (SELECT MAX(nat_var_e12) AS natmax, MIN(nat_var_e12) AS natmin,
        |        MAX(rr_var_e12) AS rrmax, MIN(rr_var_e12) AS rrmin FROM j)
        |SELECT CAST(subspace AS BIGINT) AS subspace, nat_var_e12, rr_var_e12,
        |  CASE WHEN natmin > 0
        |    THEN CAST(ROUND(10000.0 * natmax / natmin) AS BIGINT) END
        |    AS nat_imbalance_bp,
        |  CASE WHEN rrmin > 0
        |    THEN CAST(ROUND(10000.0 * rrmax / rrmin) AS BIGINT) END
        |    AS rr_imbalance_bp
        |FROM j CROSS JOIN t ORDER BY subspace""".stripMargin,
    "q278_anisotropy" ->
      """WITH ex AS (SELECT vec_id, g.i - 1 AS i,
        |    CAST(ROUND(1e6 * embedding[g.i]) AS BIGINT) AS xq
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g),
        |n AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM ex),
        |sx AS (SELECT i, CAST(SUM(xq) AS BIGINT) AS sx FROM ex GROUP BY 1),
        |sxy AS (SELECT a.i AS i, b.i AS j,
        |    CAST(SUM(a.xq * b.xq) AS BIGINT) AS sxy
        |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id GROUP BY 1, 2),
        |cov AS (SELECT sxy.i, sxy.j,
        |    CAST(CAST(n.n AS DECIMAL(38,0)) * sxy.sxy
        |      - CAST(si.sx AS DECIMAL(38,0)) * sj.sx AS DOUBLE) AS c
        |  FROM sxy, n JOIN sx si ON sxy.i = si.i JOIN sx sj ON sxy.j = sj.i),
        |tr AS (SELECT SUM(c) AS trace FROM cov WHERE i = j),
        |u1 AS (SELECT i, SUM(c) AS u FROM cov GROUP BY 1),
        |n1 AS (SELECT SQRT(SUM(u * u)) AS nm FROM u1),
        |v1 AS (SELECT i, u / GREATEST(nm, 1e-300) AS v FROM u1, n1),
        |u2 AS (SELECT cov.i, SUM(cov.c * v1.v) AS u FROM cov
        |  JOIN v1 ON cov.j = v1.i GROUP BY 1),
        |n2 AS (SELECT SQRT(SUM(u * u)) AS nm FROM u2),
        |v2 AS (SELECT i, u / GREATEST(nm, 1e-300) AS v FROM u2, n2),
        |u3 AS (SELECT cov.i, SUM(cov.c * v2.v) AS u FROM cov
        |  JOIN v2 ON cov.j = v2.i GROUP BY 1),
        |ray AS (SELECT SUM(u3.u * v2.v) AS lam FROM u3
        |  JOIN v2 ON u3.i = v2.i)
        |SELECT n.n,
        |  CAST(ROUND(tr.trace / (n.n * n.n)) AS BIGINT) AS total_var_e12,
        |  CASE WHEN tr.trace > 0.0 THEN
        |    CAST(ROUND(1e6 * ray.lam / tr.trace) AS BIGINT)
        |  END AS top_share_micro
        |FROM n, tr, ray""".stripMargin,
    // q34: the trained quantizer IS SQL-portable since round 11 —
    // Lloyd's runs in exact integer micro-arithmetic on an md5-ordered
    // bounded sample, so the oracle re-derives bit-identical centroids
    // with IvfTrainIters unrolled CTE iterations, then replays q49's
    // assignment/probe/rerank body against them.
    "q34_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |$IvfTrainSql,
        |ad AS (SELECT e.vec_id, e.v, s.cid,
        |    CAST(ROUND((list_inner_product(e.v, e.v) - 2.0 * list_inner_product(e.v, s.cv)
        |      + list_inner_product(s.cv, s.cv)) * 1e6) AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN s),
        |asg AS (SELECT vec_id, v, cid AS centroid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dmicro, cid) AS rn
        |    FROM ad) WHERE rn = 1),
        |qp AS (SELECT vec_id AS q_id, v AS qv, cid AS probe FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dmicro, cid) AS crank
        |    FROM ad WHERE vec_id % 50 = 0) WHERE crank <= $IvfProbes),
        |cand AS (SELECT qp.q_id, a.vec_id AS neighbor_id,
        |    CAST(ROUND(list_cosine_similarity(qp.qv, a.v) * 1e6) AS BIGINT) AS sim_micro
        |  FROM asg a JOIN qp ON a.centroid = qp.probe AND a.vec_id <> qp.q_id),
        |r AS (SELECT q_id, neighbor_id, sim_micro,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim_micro DESC, neighbor_id) AS rank
        |  FROM cand)
        |SELECT q_id, rank, neighbor_id, sim_micro FROM r
        |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin,
    "q287_ivfpq_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < ${IvfKSql}),
        |ps AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < $PqCodes),
        |ad AS MATERIALIZED (SELECT e.vec_id, e.v, s.cid,
        |    CAST(ROUND((list_inner_product(e.v, e.v) - 2.0 * list_inner_product(e.v, s.cv)
        |      + list_inner_product(s.cv, s.cv)) * 1e6) AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN s),
        |asg AS (SELECT vec_id, cid AS centroid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dmicro, cid) AS rn
        |    FROM ad) WHERE rn = 1),
        |sub AS MATERIALIZED (
        |  SELECT e.vec_id, m.m, ps.cid,
        |    CAST(ROUND((
        |      list_inner_product(e.v[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim],
        |                         e.v[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim])
        |      - 2.0 * list_inner_product(e.v[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim],
        |                                 ps.cv[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim])
        |      + list_inner_product(ps.cv[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim],
        |                           ps.cv[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim])) * 1e6)
        |      AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN generate_series(0, ${PqSubspaces - 1}) m(m) CROSS JOIN ps),
        |pasg AS (SELECT vec_id, m, cid AS code FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dmicro, cid) AS rn
        |    FROM sub) WHERE rn = 1),
        |qp AS (SELECT vec_id AS q_id, cid AS probe FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dmicro, cid) AS crank
        |    FROM ad WHERE vec_id % 50 = 0) WHERE crank <= $IvfProbes),
        |lutv AS (SELECT vec_id AS q_id, m, cid, dmicro FROM sub WHERE vec_id % 50 = 0),
        |cand AS (SELECT qp.q_id, a.vec_id AS neighbor_id
        |  FROM asg a JOIN qp ON a.centroid = qp.probe AND a.vec_id <> qp.q_id),
        |adc AS (SELECT c.q_id, c.neighbor_id, CAST(SUM(l.dmicro) AS BIGINT) AS adc_micro
        |  FROM cand c JOIN pasg p ON p.vec_id = c.neighbor_id
        |    JOIN lutv l ON l.q_id = c.q_id AND l.m = p.m AND l.cid = p.code
        |  GROUP BY 1, 2),
        |atop AS (SELECT q_id, neighbor_id FROM (
        |    SELECT adc.*, ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY adc_micro, neighbor_id) AS rk FROM adc) z WHERE rk <= $IvfPqRerank),
        |rr AS (SELECT atop.q_id, atop.neighbor_id,
        |    CAST(ROUND(list_cosine_similarity(q.v, n.v) * 1e6) AS BIGINT) AS sim_micro
        |  FROM atop JOIN e q ON q.vec_id = atop.q_id
        |    JOIN e n ON n.vec_id = atop.neighbor_id),
        |r AS (SELECT q_id, neighbor_id, sim_micro,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim_micro DESC, neighbor_id) AS rank
        |  FROM rr)
        |SELECT q_id, rank, neighbor_id, sim_micro FROM r
        |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin,
    "q281_hard_negatives" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv, label AS q_label FROM e WHERE vec_id % 50 = 0),
        |s AS (SELECT q.q_id, q.q_label, e.label AS n_label, e.vec_id AS neighbor_id,
        |        CAST(ROUND(list_cosine_similarity(q.qv, e.v) * 1e6) AS BIGINT) AS sim_micro
        |      FROM q JOIN e ON e.vec_id <> q.q_id),
        |p AS (SELECT q_id, neighbor_id AS pos_id, sim_micro AS pos_sim_micro FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY sim_micro DESC, neighbor_id) AS r
        |    FROM s WHERE n_label = q_label) WHERE r = 1),
        |g AS (SELECT q_id, neighbor_id AS neg_id, sim_micro AS neg_sim_micro FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY sim_micro DESC, neighbor_id) AS r
        |    FROM s WHERE n_label <> q_label) WHERE r = 1)
        |SELECT q.q_id, CAST(q.q_label AS BIGINT) AS q_label,
        |  p.pos_id, p.pos_sim_micro, g.neg_id, g.neg_sim_micro,
        |  p.pos_sim_micro - g.neg_sim_micro AS margin_micro
        |FROM q LEFT JOIN p USING (q_id) LEFT JOIN g USING (q_id)
        |ORDER BY q_id""".stripMargin,
    "q285_embedding_standardize" ->
      """WITH ex AS (SELECT vec_id, g.i - 1 AS i,
        |    CAST(ROUND(1e6 * embedding[g.i]) AS BIGINT) AS xq
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g),
        |s AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(xq) AS BIGINT) AS sx,
        |        CAST(SUM(xq * xq) AS BIGINT) AS sxx,
        |        CAST(MIN(xq) AS BIGINT) AS min_e6, CAST(MAX(xq) AS BIGINT) AS max_e6
        |      FROM ex GROUP BY 1)
        |SELECT CAST(i AS BIGINT) AS i, n,
        |  CAST(ROUND(CAST(sx AS DOUBLE) / n) AS BIGINT) AS mean_e6,
        |  CAST(ROUND(CAST(CAST(n AS DECIMAL(38,0)) * sxx
        |      - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * n)) AS BIGINT) AS var_e12,
        |  min_e6, max_e6
        |FROM s ORDER BY i""".stripMargin,
    "q339_frechet_labels" ->
      """WITH ex AS (SELECT label, g.i - 1 AS i,
        |    CAST(ROUND(1e6 * embedding[g.i]) AS BIGINT) AS xq
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g),
        |sl AS (SELECT CAST(label AS BIGINT) AS label, i,
        |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(xq) AS BIGINT) AS sx,
        |    CAST(SUM(xq * xq) AS BIGINT) AS sxx FROM ex GROUP BY 1, 2),
        |sg AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(xq) AS BIGINT) AS sx,
        |    CAST(SUM(xq * xq) AS BIGINT) AS sxx FROM ex GROUP BY 1),
        |ml AS (SELECT label, i, n,
        |    CAST(ROUND(CAST(sx AS DOUBLE) / n) AS BIGINT) AS mean_e6,
        |    CAST(ROUND(CAST(CAST(n AS DECIMAL(38,0)) * sxx
        |        - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n)) AS BIGINT) AS var_e12 FROM sl),
        |mg AS (SELECT i,
        |    CAST(ROUND(CAST(sx AS DOUBLE) / n) AS BIGINT) AS gmean_e6,
        |    CAST(ROUND(CAST(CAST(n AS DECIMAL(38,0)) * sxx
        |        - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n)) AS BIGINT) AS gvar_e12 FROM sg),
        |t AS (SELECT ml.label, ml.n,
        |    (ml.mean_e6 - mg.gmean_e6) AS dm,
        |    ml.var_e12 + mg.gvar_e12
        |      - CAST(ROUND(2.0 * SQRT(CAST(ml.var_e12 AS DOUBLE)
        |        * mg.gvar_e12)) AS BIGINT) AS term_var
        |  FROM ml JOIN mg USING (i))
        |SELECT label, MAX(n) AS n_vecs,
        |  CAST(SUM(dm * dm) AS BIGINT) AS mean_gap_e12,
        |  CAST(SUM(term_var) AS BIGINT) AS var_gap_e12,
        |  CAST(SUM(dm * dm) AS BIGINT) + CAST(SUM(term_var) AS BIGINT)
        |    AS frechet_e12
        |FROM t GROUP BY 1 ORDER BY label""".stripMargin,
    "q247_sq8_adc_recall" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |st AS (SELECT g.i AS pos, MIN(v[g.i]) AS mn, MAX(v[g.i]) AS mx
        |       FROM e, (SELECT unnest(generate_series(1, 64)) AS i) g GROUP BY 1),
        |sa AS (SELECT list(mn ORDER BY pos) AS mins, list(mx ORDER BY pos) AS maxs FROM st),
        |r AS (SELECT e.vec_id,
        |   list_transform(generate_series(1, 64), i ->
        |     mins[i] + ROUND(255.0 * (v[i] - mins[i]) / GREATEST(maxs[i] - mins[i], 1e-30))
        |       * (maxs[i] - mins[i]) / 255.0) AS rv
        |  FROM e CROSS JOIN sa),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 50 = 0),
        |adc AS (SELECT q.q_id, r.vec_id AS neighbor_id,
        |     CAST(ROUND(list_cosine_similarity(q.qv, r.rv) * 1e6) AS BIGINT) AS sim_micro
        |   FROM q JOIN r ON r.vec_id <> q.q_id),
        |atop AS (SELECT q_id, neighbor_id FROM (
        |    SELECT adc.*, ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY sim_micro DESC, neighbor_id) AS rk FROM adc) z WHERE rk <= $TopK),
        |etop AS (SELECT q_id, neighbor_id FROM ($Q26Sql) zz)
        |SELECT e2.q_id, CAST(COUNT(a.q_id) AS BIGINT) AS n_common,
        |  CAST(COUNT(a.q_id) * 1000 AS BIGINT) AS recall_bp
        |FROM etop e2 LEFT JOIN atop a ON e2.q_id = a.q_id
        |  AND e2.neighbor_id = a.neighbor_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q248_srp_rerank" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sk AS (SELECT vec_id, v,
        |   list_transform(generate_series(0, 63), p ->
        |     CASE WHEN list_reduce(list_transform(generate_series(1, 64), d ->
        |       (CASE WHEN (((CAST(1103515245 AS BIGINT) * (p * 64 + d) + 12345)
        |           % 2147483648) // 32768) % 2 = 0
        |         THEN 1.0 ELSE -1.0 END) * v[d]), (a, b) -> a + b) >= 0.0
        |       THEN 1 ELSE 0 END) AS bits
        |  FROM e),
        |q AS (SELECT vec_id AS q_id, v AS qv, bits AS qb FROM sk WHERE vec_id % 50 = 0),
        |h AS (SELECT q.q_id, q.qv, sk.vec_id AS neighbor_id, sk.v,
        |    list_sum(list_transform(generate_series(1, 64), p ->
        |      CASE WHEN q.qb[p] <> sk.bits[p] THEN 1 ELSE 0 END)) AS ham
        |  FROM q JOIN sk ON sk.vec_id <> q.q_id),
        |cand AS (SELECT q_id, qv, neighbor_id, v FROM (
        |    SELECT h.*, ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY ham, neighbor_id) AS hrk FROM h) z WHERE hrk <= $SrpCandidates),
        |rr AS (SELECT q_id, neighbor_id,
        |    CAST(ROUND(list_cosine_similarity(qv, v) * 1e6) AS BIGINT) AS sim_micro
        |  FROM cand),
        |atop AS (SELECT q_id, neighbor_id FROM (
        |    SELECT rr.*, ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY sim_micro DESC, neighbor_id) AS rk FROM rr) z WHERE rk <= $TopK),
        |etop AS (SELECT q_id, neighbor_id FROM ($Q26Sql) zz)
        |SELECT e2.q_id, CAST(COUNT(a.q_id) AS BIGINT) AS n_common,
        |  CAST(COUNT(a.q_id) * 1000 AS BIGINT) AS recall_bp
        |FROM etop e2 LEFT JOIN atop a ON e2.q_id = a.q_id
        |  AND e2.neighbor_id = a.neighbor_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q249_ivf_probe_sweep" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < ${IvfKSql}),
        |ad AS (SELECT e.vec_id, e.v, s.cid,
        |    CAST(ROUND((list_inner_product(e.v, e.v) - 2.0 * list_inner_product(e.v, s.cv)
        |      + list_inner_product(s.cv, s.cv)) * 1e6) AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN s),
        |asg AS (SELECT vec_id, v, cid AS centroid FROM (
        |    SELECT ad.*, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dmicro, cid) AS r
        |    FROM ad) z WHERE r = 1),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 50 = 0),
        |qc AS (SELECT q.q_id, q.qv, ad.cid, ROW_NUMBER() OVER (PARTITION BY q.q_id
        |         ORDER BY ad.dmicro, ad.cid) AS crank
        |       FROM q JOIN ad ON ad.vec_id = q.q_id),
        |lv AS (SELECT unnest([1, 2, 4, 8]) AS nprobe),
        |probe AS (SELECT lv.nprobe, qc.q_id, qc.qv, qc.cid
        |          FROM qc CROSS JOIN lv WHERE qc.crank <= lv.nprobe),
        |cand AS (SELECT p.nprobe, p.q_id, a.vec_id AS neighbor_id,
        |    CAST(ROUND(list_cosine_similarity(p.qv, a.v) * 1e6) AS BIGINT) AS sim_micro
        |  FROM probe p JOIN asg a ON a.centroid = p.cid AND a.vec_id <> p.q_id),
        |nc AS (SELECT nprobe, q_id, CAST(COUNT(*) AS BIGINT) AS n_cand
        |       FROM cand GROUP BY 1, 2),
        |itop AS (SELECT nprobe, q_id, neighbor_id FROM (
        |    SELECT cand.*, ROW_NUMBER() OVER (PARTITION BY nprobe, q_id
        |      ORDER BY sim_micro DESC, neighbor_id) AS rk FROM cand) z WHERE rk <= $TopK),
        |etop AS (SELECT q_id, neighbor_id FROM ($Q26Sql) zz),
        |ov AS (SELECT lv.nprobe, e2.q_id, CAST(COUNT(i.q_id) AS BIGINT) AS n_common
        |       FROM etop e2 CROSS JOIN lv
        |       LEFT JOIN itop i ON i.nprobe = lv.nprobe AND i.q_id = e2.q_id
        |         AND i.neighbor_id = e2.neighbor_id
        |       GROUP BY 1, 2)
        |SELECT CAST(ov.nprobe AS BIGINT) AS nprobe, CAST(COUNT(*) AS BIGINT) AS n_queries,
        |  CAST(ROUND(10000.0 * SUM(ov.n_common) / (10 * COUNT(*))) AS BIGINT) AS recall_bp,
        |  CAST(ROUND(AVG(COALESCE(nc.n_cand, 0))) AS BIGINT) AS mean_candidates
        |FROM ov LEFT JOIN nc ON nc.nprobe = ov.nprobe AND nc.q_id = ov.q_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q237_knn_probe" ->
      s"""WITH base AS ($Q26Sql),
        |lab AS (SELECT vec_id, label FROM embeddings),
        |v AS (SELECT base.q_id, lab.label AS n_label,
        |        CAST(COUNT(*) AS BIGINT) AS votes,
        |        CAST(MAX(base.sim_micro) AS BIGINT) AS best_sim
        |      FROM base JOIN lab ON base.neighbor_id = lab.vec_id
        |      GROUP BY 1, 2),
        |p AS (SELECT q_id, n_label, votes FROM (
        |    SELECT v.*, ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY votes DESC, best_sim DESC, n_label) AS r FROM v) WHERE r = 1)
        |SELECT p.q_id, CAST(lab.label AS BIGINT) AS actual,
        |  CAST(p.n_label AS BIGINT) AS predicted, p.votes,
        |  CAST(lab.label = p.n_label AS INT) AS correct
        |FROM p JOIN lab ON p.q_id = lab.vec_id
        |ORDER BY p.q_id""".stripMargin,
    "q227_cluster_purity" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < ${IvfKSql}),
        |ad AS (SELECT e.vec_id, e.label, s.cid,
        |    CAST(ROUND((list_inner_product(e.v, e.v) - 2.0 * list_inner_product(e.v, s.cv)
        |      + list_inner_product(s.cv, s.cv)) * 1e6) AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN s),
        |asg AS (SELECT vec_id, label, cid AS centroid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dmicro, cid) AS rn
        |    FROM ad) WHERE rn = 1),
        |cl AS (SELECT centroid, label, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM asg GROUP BY 1, 2),
        |top AS (SELECT centroid, label AS top_label, n AS top_n FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY centroid
        |      ORDER BY n DESC, label) AS r FROM cl) WHERE r = 1),
        |sz AS (SELECT centroid, CAST(SUM(n) AS BIGINT) AS n_members,
        |         CAST(COUNT(*) AS BIGINT) AS n_labels FROM cl GROUP BY 1)
        |SELECT CAST(sz.centroid AS BIGINT) AS centroid, sz.n_members, sz.n_labels,
        |  CAST(top.top_label AS BIGINT) AS top_label, top.top_n,
        |  CAST(ROUND(10000.0 * top.top_n / sz.n_members) AS BIGINT) AS purity_bp
        |FROM sz JOIN top ON sz.centroid = top.centroid
        |ORDER BY 1""".stripMargin,
    "q211_bitext_margin" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
        |           FROM embeddings WHERE vec_id % 5 = 0),
        |x AS (SELECT vec_id AS x_id, v FROM e WHERE label = 0),
        |y AS (SELECT vec_id AS y_id, v FROM e WHERE label = 1),
        |p AS (SELECT x_id, y_id,
        |        CAST(ROUND(list_cosine_similarity(x.v, y.v) * 1e6) AS BIGINT)
        |          AS sim_micro
        |      FROM x CROSS JOIN y),
        |kx AS (SELECT x_id, CAST(SUM(sim_micro) AS BIGINT) AS sx FROM (
        |    SELECT x_id, sim_micro, ROW_NUMBER() OVER (PARTITION BY x_id
        |      ORDER BY sim_micro DESC, y_id) AS r FROM p) WHERE r <= 4 GROUP BY 1),
        |ky AS (SELECT y_id, CAST(SUM(sim_micro) AS BIGINT) AS sy FROM (
        |    SELECT y_id, sim_micro, ROW_NUMBER() OVER (PARTITION BY y_id
        |      ORDER BY sim_micro DESC, x_id) AS r FROM p) WHERE r <= 4 GROUP BY 1),
        |m AS (SELECT p.x_id, p.y_id, p.sim_micro,
        |        CASE WHEN kx.sx + ky.sy = 0 THEN 0
        |             ELSE CAST(ROUND(8000.0 * p.sim_micro / (kx.sx + ky.sy)) AS BIGINT)
        |        END AS margin_milli
        |      FROM p JOIN kx USING (x_id) JOIN ky USING (y_id)),
        |r AS (SELECT m.*, ROW_NUMBER() OVER (PARTITION BY x_id
        |        ORDER BY margin_milli DESC, y_id) AS rk FROM m)
        |SELECT x_id, y_id, sim_micro, margin_milli FROM r
        |WHERE rk = 1 ORDER BY x_id""".stripMargin,
    "q198_product_quantization" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < $PqCodes),
        |sub AS (
        |  SELECT e.vec_id, m.m, s.cid,
        |    CAST(ROUND((
        |      list_inner_product(e.v[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim],
        |                         e.v[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim])
        |      - 2.0 * list_inner_product(e.v[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim],
        |                                 s.cv[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim])
        |      + list_inner_product(s.cv[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim],
        |                           s.cv[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim])) * 1e6)
        |      AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN generate_series(0, ${PqSubspaces - 1}) m(m) CROSS JOIN s),
        |asg AS (SELECT vec_id, m, cid AS code, dmicro FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dmicro, cid) AS rn
        |    FROM sub) WHERE rn = 1)
        |SELECT CAST(m AS BIGINT) AS subspace, CAST(code AS BIGINT) AS code,
        |  CAST(COUNT(*) AS BIGINT) AS n_vecs, CAST(SUM(dmicro) AS BIGINT) AS sum_dmicro
        |FROM asg GROUP BY m, code ORDER BY subspace, code""".stripMargin,
    // q199 reuses q198's `sub` CTE twice: restricted to rn=1 it is the
    // corpus code book, restricted to query ids it IS the per-query
    // LUT (the distance to every codeword) — the ADC total is then an
    // exact integer sum over the 8 matched entries.
    "q199_pq_adc_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < $PqCodes),
        |sub AS (
        |  SELECT e.vec_id, m.m, s.cid,
        |    CAST(ROUND((
        |      list_inner_product(e.v[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim],
        |                         e.v[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim])
        |      - 2.0 * list_inner_product(e.v[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim],
        |                                 s.cv[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim])
        |      + list_inner_product(s.cv[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim],
        |                           s.cv[m.m*$PqSubDim+1 : m.m*$PqSubDim+$PqSubDim])) * 1e6)
        |      AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN generate_series(0, ${PqSubspaces - 1}) m(m) CROSS JOIN s),
        |asg AS (SELECT vec_id, m, cid AS code FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dmicro, cid) AS rn
        |    FROM sub) WHERE rn = 1),
        |lutv AS (SELECT vec_id AS q_id, m, cid, dmicro FROM sub WHERE vec_id % 50 = 0),
        |pair AS (
        |  SELECT l.q_id, a.vec_id AS neighbor_id,
        |    CAST(SUM(l.dmicro) AS BIGINT) AS adc_micro
        |  FROM asg a JOIN lutv l ON l.m = a.m AND l.cid = a.code
        |  WHERE a.vec_id <> l.q_id
        |  GROUP BY l.q_id, a.vec_id),
        |r AS (SELECT q_id, neighbor_id, adc_micro,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_micro, neighbor_id) AS rank
        |  FROM pair)
        |SELECT q_id, rank, neighbor_id, adc_micro FROM r
        |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin,
    "q207_cluster_capped_sample" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < ${IvfKSql}),
        |ad AS (SELECT e.vec_id, s.cid,
        |    CAST(ROUND((list_inner_product(e.v, e.v) - 2.0 * list_inner_product(e.v, s.cv)
        |      + list_inner_product(s.cv, s.cv)) * 1e6) AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN s),
        |asg AS (SELECT vec_id, cid AS centroid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dmicro, cid) AS rn
        |    FROM ad) WHERE rn = 1),
        |r AS (SELECT CAST(centroid AS BIGINT) AS centroid, vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY centroid ORDER BY vec_id) AS crank
        |  FROM asg)
        |SELECT centroid, vec_id, CAST(crank AS BIGINT) AS crank FROM r
        |WHERE crank <= $ClusterSampleCap ORDER BY centroid, vec_id""".stripMargin,
    "q49_ivf_seeded" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < ${IvfKSql}),
        |ad AS (SELECT e.vec_id, e.v, s.cid,
        |    CAST(ROUND((list_inner_product(e.v, e.v) - 2.0 * list_inner_product(e.v, s.cv)
        |      + list_inner_product(s.cv, s.cv)) * 1e6) AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN s),
        |asg AS (SELECT vec_id, v, cid AS centroid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dmicro, cid) AS rn
        |    FROM ad) WHERE rn = 1),
        |qp AS (SELECT vec_id AS q_id, v AS qv, cid AS probe FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dmicro, cid) AS crank
        |    FROM ad WHERE vec_id % 50 = 0) WHERE crank <= $IvfProbes),
        |cand AS (SELECT qp.q_id, a.vec_id AS neighbor_id,
        |    CAST(ROUND(list_cosine_similarity(qp.qv, a.v) * 1e6) AS BIGINT) AS sim_micro
        |  FROM asg a JOIN qp ON a.centroid = qp.probe AND a.vec_id <> qp.q_id),
        |r AS (SELECT q_id, neighbor_id, sim_micro,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim_micro DESC, neighbor_id) AS rank
        |  FROM cand)
        |SELECT q_id, rank, neighbor_id, sim_micro FROM r
        |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin,
    "q195_semantic_dedup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < ${IvfKSql}),
        |ad AS (SELECT e.vec_id, e.v, s.cid,
        |    CAST(ROUND((list_inner_product(e.v, e.v) - 2.0 * list_inner_product(e.v, s.cv)
        |      + list_inner_product(s.cv, s.cv)) * 1e6) AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN s),
        |asg AS (SELECT vec_id, v, cid AS centroid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dmicro, cid) AS rn
        |    FROM ad) WHERE rn = 1),
        |m AS (SELECT centroid, COUNT(*) AS n_members FROM asg GROUP BY 1),
        |p AS (SELECT a.centroid, b.vec_id AS drop_id,
        |    CAST(ROUND(list_cosine_similarity(a.v, b.v) * 1e6) AS BIGINT) AS sim_micro
        |  FROM asg a JOIN asg b ON a.centroid = b.centroid AND a.vec_id < b.vec_id),
        |au AS (SELECT centroid, COUNT(*) AS n_pairs, MAX(sim_micro) AS max_sim_micro,
        |    COUNT(DISTINCT CASE WHEN sim_micro >= $SemDedupThresholdMicro
        |                        THEN drop_id END) AS n_dropped
        |  FROM p GROUP BY 1)
        |SELECT CAST(m.centroid AS BIGINT) AS centroid, m.n_members,
        |  COALESCE(au.n_pairs, 0) AS n_pairs,
        |  COALESCE(au.max_sim_micro, -1000000) AS max_sim_micro,
        |  COALESCE(au.n_dropped, 0) AS n_dropped
        |FROM m LEFT JOIN au ON m.centroid = au.centroid
        |ORDER BY centroid""".stripMargin,
    "q27_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |np AS (SELECT ${LshPlanesSql} AS np),
        |pr AS (SELECT p FROM generate_series(0, ${LshMaxPlanes - 1}) t(p)
        |       WHERE p < (SELECT np FROM np)),
        |planes AS (
        |  SELECT p, list_transform(generate_series(0, ${Dim - 1}), d ->
        |    CASE WHEN CAST('0x'||substring(md5('graft_plane_'||p||'_'||d),1,2) AS INT) % 2 = 0
        |         THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END) AS plane
        |  FROM pr),
        |sk AS (
        |  SELECT e.vec_id, e.v,
        |    CAST(SUM(CASE WHEN list_inner_product(e.v, pl.plane) > 0 THEN (1<<pl.p) ELSE 0 END) AS INT) AS bucket
        |  FROM e CROSS JOIN planes pl GROUP BY e.vec_id, e.v),
        |masks AS (
        |  SELECT 0 AS m
        |  UNION ALL SELECT (1<<i.p) FROM pr i
        |  UNION ALL SELECT (1<<i.p)|(1<<j.p) FROM pr i, pr j WHERE i.p < j.p),
        |q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM sk WHERE vec_id % 50 = 0),
        |cand AS (
        |  SELECT DISTINCT q.q_id, s.vec_id AS neighbor_id,
        |    CAST(ROUND(list_cosine_similarity(q.qv, s.v) * 1e6) AS BIGINT) AS sim_micro
        |  FROM q CROSS JOIN masks m
        |  JOIN sk s ON s.bucket = xor(q.bucket, m.m) AND s.vec_id <> q.q_id),
        |r AS (SELECT q_id, neighbor_id, sim_micro,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim_micro DESC, neighbor_id) AS rank
        |      FROM cand)
        |SELECT q_id, rank, neighbor_id, sim_micro FROM r
        |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin,
    "q30_embedding_neardup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  CAST(ROUND(list_cosine_similarity(a.v, b.v) * 1e6) AS BIGINT) AS sim_micro
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE ROUND(list_cosine_similarity(a.v, b.v) * 1e6) >= $NearDupThresholdMicro
        |ORDER BY vec_a, vec_b""".stripMargin,
    "q344_neardup_planted" ->
      s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  WHERE vec_id % $PlantSliceMod = 0),
        |tw AS (SELECT base_id + $PlantIdOffset AS vec_id,
        |    list_transform(v, x -> x * (1.0 + CAST((base_id // $PlantTwinMod) % 9 + 1
        |      AS DOUBLE) / 10.0)) AS v
        |  FROM (SELECT vec_id AS base_id, v FROM e0 WHERE vec_id % $PlantTwinMod = 0)),
        |e AS (SELECT vec_id, v FROM e0 UNION ALL SELECT vec_id, v FROM tw)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  CAST(ROUND(list_cosine_similarity(a.v, b.v) * 1e6) AS BIGINT) AS sim_micro
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE ROUND(list_cosine_similarity(a.v, b.v) * 1e6) >= $NearDupThresholdMicro
        |ORDER BY vec_a, vec_b""".stripMargin,
    "q343_ann_graph_beam" -> Q343Sql,
    "q345_graph_ann_audit" -> Q345Sql,
    "q346_graph_beam_sweep" -> Q346Sql,
    "q349_graph_append_audit" -> Q349Sql,
    "q26_ann_topk" -> Q26Sql,
    "q222_ann_hubness" ->
      s"""WITH base AS ($Q26Sql)
        |SELECT neighbor_id, CAST(COUNT(*) AS BIGINT) AS hub_count,
        |  CAST(MIN(rank) AS BIGINT) AS best_rank
        |FROM base GROUP BY neighbor_id HAVING COUNT(*) >= 2
        |ORDER BY hub_count DESC, neighbor_id""".stripMargin)

  /** The SQL replay of `trainedCentroids`: md5-ordered bounded sample
    * quantized to 1e-6 BIGINTs, IvfTrainIters unrolled Lloyd's
    * iterations in exact integer arithmetic (argmin ties → lower cid;
    * means HALF_UP-rounded back to the integer grid each round; empty
    * clusters keep their center via the LEFT JOIN + COALESCE), then
    * the final centroids scale back to doubles as CTE `s` — the same
    * (cid, cv) shape every seeded-quantizer oracle consumes.
    */
  private lazy val IvfTrainSql: String = {
    val iters = (1 to IvfTrainIters).map { t =>
      s"""g$t AS (SELECT s.sid, s.xq, c.cid,
        |    list_sum(list_transform(generate_series(1, $Dim), j ->
        |      (s.xq[j] - c.c[j]) * (s.xq[j] - c.c[j]))) AS d
        |  FROM samp s CROSS JOIN c${t - 1} c),
        |a$t AS (SELECT sid, xq, cid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY sid ORDER BY d, cid) AS rn
        |    FROM g$t) WHERE rn = 1),
        |m$t AS (SELECT cid, g.j,
        |    CAST(ROUND(CAST(SUM(xq[g.j]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cj
        |  FROM a$t, (SELECT unnest(generate_series(1, $Dim)) AS j) g GROUP BY 1, 2),
        |c$t AS (SELECT p.cid, COALESCE(n.c, p.c) AS c FROM c${t - 1} p LEFT JOIN
        |    (SELECT cid, list(cj ORDER BY j) AS c FROM m$t GROUP BY 1) n USING (cid))"""
        .stripMargin
    }.mkString(",\n")
    s"""samp AS (SELECT ROW_NUMBER() OVER (ORDER BY h) AS sid, xq FROM (
      |    SELECT md5(CAST(vec_id AS VARCHAR)) AS h,
      |      list_transform(v, x -> CAST(ROUND(x * 1e6) AS BIGINT)) AS xq
      |    FROM e ORDER BY h LIMIT $IvfTrainCap) t),
      |c0 AS (SELECT CAST(sid - 1 AS INT) AS cid, xq AS c FROM samp WHERE sid <= ${IvfKSql}),
      |$iters,
      |s AS (SELECT cid, list_transform(c, x -> CAST(x AS DOUBLE) / 1e6) AS cv
      |      FROM c$IvfTrainIters)""".stripMargin
  }

  private lazy val Q26Sql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |  q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 50 = 0),
      |  s AS (SELECT q.q_id, e.vec_id AS neighbor_id,
      |          CAST(ROUND(list_cosine_similarity(q.qv, e.v) * 1e6) AS BIGINT) AS sim_micro
      |        FROM q JOIN e ON e.vec_id <> q.q_id),
      |  r AS (SELECT q_id, neighbor_id, sim_micro,
      |          ROW_NUMBER() OVER (PARTITION BY q_id
      |                             ORDER BY sim_micro DESC, neighbor_id) AS rank
      |        FROM s)
      |SELECT q_id, rank, neighbor_id, sim_micro FROM r
      |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin

  /** q343's full build+search replay: seeded-quantizer assignment
    * with cell ranks 1..[[GraphBuildProbes]] (the q49 `ad` CTE plus
    * the bridge ranks), the bounded-degree adjacency (intra-cell
    * top-M + bridge top-[[GraphBridgeM]] into each of the next
    * P−1 cells, symmetrized, degree-capped), cell
    * medoids, and [[GraphBeamRounds]] UNROLLED beam rounds (the
    * IvfTrainSql pattern) — each one frontier×adjacency join, an
    * anti-join against the visited set, an exact scoring join and a
    * beam-width window. Integer micro-sims with id tie-breaks at
    * every rank keep the replay bit-identical.
    */
  /** One batched beam walk as unrolled CTEs over the shared build
    * (`adj`/`qs`/`e`/`v0`/`f0`): round CTEs are named n{p}{r} etc. so
    * the q346 sweep can instantiate SEVERAL walks (one per beam
    * width, prefixes `w6_`, `w12_`, …) against ONE build — exactly
    * what the Spark side does with [[graphSearch]] over one
    * [[GraphIndex]]. Round 1 of every walk reads the shared v0/f0.
    */
  private def beamRoundsSql(p: String, width: Int, rounds: Int,
      adjRel: String = "adj", qsRel: String = "qs", corpusRel: String = "e",
      sharedEntry: Boolean = true): String = {
    def pv(r: Int) = if (r == 1) { if (sharedEntry) "0" else s"${p}0" }
                     else s"$p${r - 1}"
    (1 to rounds).map { r =>
      s"""n$p$r AS (SELECT DISTINCT f.q_id, a.dst AS node
        |  FROM f${pv(r)} f JOIN $adjRel a ON a.src = f.node),
        |x$p$r AS (SELECT n.q_id, n.node FROM n$p$r n
        |  LEFT JOIN v${pv(r)} p ON p.q_id = n.q_id AND p.node = n.node
        |  WHERE p.node IS NULL),
        |s$p$r AS MATERIALIZED (SELECT x.q_id, x.node,
        |    CAST(ROUND(list_cosine_similarity(q.qv, e.v) * 1e6) AS BIGINT) AS sim
        |  FROM x$p$r x JOIN $qsRel q ON q.q_id = x.q_id
        |    JOIN $corpusRel e ON e.vec_id = x.node),
        |v$p$r AS MATERIALIZED (SELECT * FROM v${pv(r)} UNION ALL SELECT * FROM s$p$r),
        |f$p$r AS (SELECT q_id, node FROM (SELECT *, ROW_NUMBER() OVER
        |    (PARTITION BY q_id ORDER BY sim DESC, node) AS rn FROM s$p$r)
        |  WHERE rn <= $width)""".stripMargin
    }.mkString(",\n")
  }

  private lazy val Q343BodySql: String =
    s"$GraphBuildSql,\n${beamRoundsSql("", GraphBeamWidth, GraphBeamRounds)}"

  /** The shared build+entry replay (everything up to v0/f0) — one
    * instantiation serves every beam walk appended after it.
    */
  /** ad/ar: every `e` vector ranked against the seed set `s` —
    * shared verbatim by the pinned build and the q349 append replay
    * (which ranks the FULL corpus against base-derived seeds).
    */
  private lazy val GraphRankSql: String =
    s"""ad AS MATERIALIZED (SELECT e.vec_id, e.v, s.cid,
      |    CAST(ROUND((list_inner_product(e.v, e.v) - 2.0 * list_inner_product(e.v, s.cv)
      |      + list_inner_product(s.cv, s.cv)) * 1e6) AS BIGINT) AS dmicro
      |  FROM e CROSS JOIN s),
      |ar AS MATERIALIZED (SELECT vec_id, v, cid, dmicro,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dmicro, cid) AS rn FROM ad)""".stripMargin

  private lazy val GraphBuildSql: String = {
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < ${IvfKSql}),
      |$GraphRankSql,
      |asg AS MATERIALIZED (SELECT vec_id, v, cid AS cell, dmicro FROM ar WHERE rn = 1),
      |a2 AS (SELECT vec_id, cid AS cell2 FROM ar
      |  WHERE rn BETWEEN 2 AND $GraphBuildProbes),
      |$GraphAdjFromAsgSql,
      |qs AS MATERIALIZED (SELECT vec_id AS q_id, v AS qv FROM asg
      |  WHERE vec_id % 50 = 0),
      |en AS (SELECT DISTINCT p.vec_id AS q_id, m.medoid AS node
      |  FROM ar p JOIN med m ON m.cell = p.cid
      |  WHERE p.rn <= $GraphEntryProbes AND p.vec_id % 50 = 0),
      |v0 AS MATERIALIZED (SELECT en.q_id, en.node,
      |    CAST(ROUND(list_cosine_similarity(q.qv, e.v) * 1e6) AS BIGINT) AS sim
      |  FROM en JOIN qs q ON q.q_id = en.q_id JOIN e ON e.vec_id = en.node),
      |f0 AS (SELECT q_id, node FROM v0)""".stripMargin
  }

  /** intra-cell top-M + per-cell bridges + symmetrize + degree cap +
    * cell medoids, all from asg/a2 — the adjacency build, shared
    * verbatim with the q349 append replay (whose asg/a2 carry a
    * base-slice filter).
    */
  private lazy val GraphAdjFromAsgSql: String = {
    s"""intra AS (SELECT x.vec_id AS src, y.vec_id AS dst,
      |    CAST(ROUND(list_cosine_similarity(x.v, y.v) * 1e6) AS BIGINT) AS sim
      |  FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id <> y.vec_id),
      |im AS (SELECT src, dst, sim FROM (SELECT *, ROW_NUMBER() OVER
      |    (PARTITION BY src ORDER BY sim DESC, dst) AS rn FROM intra)
      |  WHERE rn <= $GraphM),
      |br AS (SELECT x.vec_id AS src, a2.cell2 AS bcell, y.vec_id AS dst,
      |    CAST(ROUND(list_cosine_similarity(x.v, y.v) * 1e6) AS BIGINT) AS sim
      |  FROM asg x JOIN a2 ON a2.vec_id = x.vec_id
      |  JOIN asg y ON y.cell = a2.cell2 AND y.vec_id <> x.vec_id),
      |bm AS (SELECT src, dst, sim FROM (SELECT *, ROW_NUMBER() OVER
      |    (PARTITION BY src, bcell ORDER BY sim DESC, dst) AS rn FROM br)
      |  WHERE rn <= $GraphBridgeM),
      |und AS (SELECT src, dst, sim FROM im UNION SELECT src, dst, sim FROM bm
      |  UNION SELECT dst AS src, src AS dst, sim FROM im
      |  UNION SELECT dst AS src, src AS dst, sim FROM bm),
      |adj AS MATERIALIZED (SELECT src, dst, sim FROM (SELECT *, ROW_NUMBER() OVER
      |    (PARTITION BY src ORDER BY sim DESC, dst) AS rn FROM und)
      |  WHERE rn <= $GraphMaxDegree),
      |med AS (SELECT cell, vec_id AS medoid FROM (SELECT *, ROW_NUMBER() OVER
      |    (PARTITION BY cell ORDER BY dmicro, vec_id) AS rn FROM asg) WHERE rn = 1)""".stripMargin
  }

  private lazy val Q343Sql: String =
    s"""WITH $Q343BodySql
      |SELECT q_id, CAST(rank AS BIGINT) AS rank, node AS neighbor_id,
      |  sim AS sim_micro FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, node)
      |    AS rank FROM v$GraphBeamRounds WHERE node <> q_id) t
      |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin

  /** q345's replay: the shared q343 build+walk body plus the exact
    * q26-style truth (exs/exr), the graph result as a CTE (res), the
    * out-degree table and the single-row census.
    */
  private lazy val Q345Sql: String =
    s"""WITH $Q343BodySql,
      |exs AS (SELECT q.q_id, e2.vec_id AS neighbor_id,
      |    CAST(ROUND(list_cosine_similarity(q.qv, e2.v) * 1e6) AS BIGINT) AS sim
      |  FROM qs q JOIN e e2 ON e2.vec_id <> q.q_id),
      |exr AS (SELECT q_id, neighbor_id FROM (SELECT *, ROW_NUMBER() OVER
      |    (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rk FROM exs)
      |  WHERE rk <= $TopK),
      |res AS (SELECT q_id, node AS neighbor_id FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, node)
      |    AS rank FROM v$GraphBeamRounds WHERE node <> q_id) t
      |  WHERE rank <= $TopK),
      |deg AS (SELECT src, COUNT(*) AS d FROM adj GROUP BY 1)
      |SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_docs,
      |  (SELECT CAST(COUNT(DISTINCT cell) AS BIGINT) FROM asg) AS n_cells,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM adj) AS graph_edges,
      |  (SELECT CAST(MAX(d) AS BIGINT) FROM deg) AS max_out_degree,
      |  CAST(ROUND(1000.0 * (SELECT COUNT(*) FROM adj)
      |    / (SELECT COUNT(*) FROM e)) AS BIGINT) AS avg_degree_milli,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM en) AS entry_rows,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM v$GraphBeamRounds) AS visited_rows,
      |  CAST(ROUND(10000.0 * (SELECT COUNT(*) FROM res JOIN exr
      |      USING (q_id, neighbor_id))
      |    / GREATEST((SELECT COUNT(*) FROM exr), 1)) AS BIGINT) AS recall_bp""".stripMargin

  /** q346's replay: ONE shared build ([[GraphBuildSql]]), one
    * prefixed unrolled walk per sweep width, the shared exact truth,
    * and a per-width census row — the same one-build/many-walks
    * shape the Spark side runs.
    */
  private lazy val Q346Sql: String = {
    val walks = GraphSweepWidths.map { w =>
      beamRoundsSql(s"w${w}_", w, GraphBeamRounds)
    }.mkString(",\n")
    val results = GraphSweepWidths.map { w =>
      s"""res$w AS (SELECT q_id, node AS neighbor_id FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, node)
        |    AS rank FROM vw${w}_$GraphBeamRounds WHERE node <> q_id) t
        |  WHERE rank <= $TopK)""".stripMargin
    }.mkString(",\n")
    val rows = GraphSweepWidths.map { w =>
      s"""SELECT CAST($w AS BIGINT) AS beam_width,
        |  (SELECT CAST(COUNT(DISTINCT q_id) AS BIGINT) FROM vw${w}_$GraphBeamRounds) AS n_queries,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM vw${w}_$GraphBeamRounds) AS visited_rows,
        |  CAST(ROUND(10000.0 * (SELECT COUNT(*) FROM res$w JOIN exr
        |      USING (q_id, neighbor_id))
        |    / GREATEST((SELECT COUNT(*) FROM exr), 1)) AS BIGINT) AS recall_bp""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $GraphBuildSql,
      |$walks,
      |exs AS (SELECT q.q_id, e2.vec_id AS neighbor_id,
      |    CAST(ROUND(list_cosine_similarity(q.qv, e2.v) * 1e6) AS BIGINT) AS sim
      |  FROM qs q JOIN e e2 ON e2.vec_id <> q.q_id),
      |exr AS (SELECT q_id, neighbor_id FROM (SELECT *, ROW_NUMBER() OVER
      |    (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rk FROM exs)
      |  WHERE rk <= $TopK),
      |$results
      |$rows
      |ORDER BY beam_width""".stripMargin
  }

  /** q349's replay: rank the FULL corpus against BASE-derived seeds
    * (e = all, s from eb), build the base graph from base-filtered
    * asg/a2 via the shared fragments, run the batched insert walk
    * (prefix `i`, batch queries, own entry CTEs), adopt top-M visited
    * as edges, symmetrize, re-cap (adj2), then the serving walk
    * (prefix `z`) over adj2 with the standard query set, the exact
    * full-corpus truth, and the census.
    */
  private lazy val Q349Sql: String = {
    val insertWalk = beamRoundsSql("i", GraphBeamWidth, GraphBeamRounds,
      adjRel = "adj", qsRel = "iqs", corpusRel = "e", sharedEntry = false)
    val serveWalk = beamRoundsSql("z", GraphBeamWidth, GraphBeamRounds,
      adjRel = "adj2", qsRel = "zqs", corpusRel = "e", sharedEntry = false)
    val R = GraphBeamRounds
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |eb AS (SELECT * FROM e WHERE vec_id % $GraphAppendMod <> 7),
      |s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM eb
      |  WHERE vec_id < ${ivfKSqlOver("eb")}),
      |$GraphRankSql,
      |asg AS MATERIALIZED (SELECT vec_id, v, cid AS cell, dmicro FROM ar
      |  WHERE rn = 1 AND vec_id % $GraphAppendMod <> 7),
      |a2 AS (SELECT vec_id, cid AS cell2 FROM ar
      |  WHERE rn BETWEEN 2 AND $GraphBuildProbes AND vec_id % $GraphAppendMod <> 7),
      |$GraphAdjFromAsgSql,
      |iqs AS MATERIALIZED (SELECT vec_id AS q_id, v AS qv FROM e
      |  WHERE vec_id % $GraphAppendMod = 7),
      |ien AS (SELECT DISTINCT p.vec_id AS q_id, m.medoid AS node
      |  FROM ar p JOIN med m ON m.cell = p.cid
      |  WHERE p.rn <= $GraphEntryProbes AND p.vec_id % $GraphAppendMod = 7),
      |vi0 AS MATERIALIZED (SELECT ien.q_id, ien.node,
      |    CAST(ROUND(list_cosine_similarity(q.qv, e.v) * 1e6) AS BIGINT) AS sim
      |  FROM ien JOIN iqs q ON q.q_id = ien.q_id JOIN e ON e.vec_id = ien.node),
      |fi0 AS (SELECT q_id, node FROM vi0),
      |$insertWalk,
      |newout AS (SELECT q_id AS src, node AS dst, sim FROM (SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, node) AS rn
      |  FROM vi$R) WHERE rn <= $GraphM),
      |newe AS (SELECT src, dst, sim FROM newout
      |  UNION ALL SELECT dst AS src, src AS dst, sim FROM newout),
      |comb AS (SELECT src, dst, sim FROM adj
      |  UNION ALL SELECT src, dst, sim FROM newe),
      |adj2 AS MATERIALIZED (SELECT src, dst, sim FROM (SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY src ORDER BY sim DESC, dst) AS rn
      |  FROM comb) WHERE rn <= $GraphMaxDegree),
      |zqs AS MATERIALIZED (SELECT vec_id AS q_id, v AS qv FROM e
      |  WHERE vec_id % 50 = 0),
      |zen AS (SELECT DISTINCT p.vec_id AS q_id, m.medoid AS node
      |  FROM ar p JOIN med m ON m.cell = p.cid
      |  WHERE p.rn <= $GraphEntryProbes AND p.vec_id % 50 = 0),
      |vz0 AS MATERIALIZED (SELECT zen.q_id, zen.node,
      |    CAST(ROUND(list_cosine_similarity(q.qv, e.v) * 1e6) AS BIGINT) AS sim
      |  FROM zen JOIN zqs q ON q.q_id = zen.q_id JOIN e ON e.vec_id = zen.node),
      |fz0 AS (SELECT q_id, node FROM vz0),
      |$serveWalk,
      |exs AS (SELECT q.q_id, e2.vec_id AS neighbor_id,
      |    CAST(ROUND(list_cosine_similarity(q.qv, e2.v) * 1e6) AS BIGINT) AS sim
      |  FROM zqs q JOIN e e2 ON e2.vec_id <> q.q_id),
      |exr AS (SELECT q_id, neighbor_id FROM (SELECT *, ROW_NUMBER() OVER
      |    (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rk FROM exs)
      |  WHERE rk <= $TopK),
      |res AS (SELECT q_id, node AS neighbor_id FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, node)
      |    AS rank FROM vz$R WHERE node <> q_id) t
      |  WHERE rank <= $TopK),
      |dg2 AS (SELECT src, COUNT(*) AS d FROM adj2 GROUP BY 1)
      |SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM eb) AS n_base,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e WHERE vec_id % $GraphAppendMod = 7)
      |    AS n_appended,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM adj) AS edges_before,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM newe) AS edges_added,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM adj)
      |    + (SELECT COUNT(*) FROM newe)
      |    - (SELECT COUNT(*) FROM adj2) AS evictions,
      |  (SELECT CAST(MAX(d) AS BIGINT) FROM dg2) AS max_out_degree,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM vi$R) AS insert_visited_rows,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM vz$R) AS visited_rows,
      |  CAST(ROUND(10000.0 * (SELECT COUNT(*) FROM res JOIN exr
      |      USING (q_id, neighbor_id))
      |    / GREATEST((SELECT COUNT(*) FROM exr), 1)) AS BIGINT) AS recall_after_bp""".stripMargin
  }
}
