package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.load
import Similarity.{toDouble, dot, norm, TopK}

/** Training-data valuation and retrieval-evaluation operators over the
  * `embeddings` table — the "is this data worth training on / is this
  * index worth serving from" layer that sits beside the ANN stack
  * (q26/q34/q49) and the dedup stack (q23/q195):
  *
  *  - q288 exact KNN-Shapley data valuation (Jia et al., VLDB 2019):
  *    the closed-form per-training-point Shapley value of a K-NN
  *    classifier, computed with windows — no Monte-Carlo permutations.
  *  - q289 k-center coreset (greedy farthest-point / Gonzalez 1985):
  *    diversity selection with a 2-approximation coverage guarantee.
  *  - q290 IVF index maintenance audit: assign an append batch to the
  *    frozen coarse quantizer and measure per-list occupancy drift —
  *    the "do I need to retrain the index" signal.
  *  - q292 retrieval quality metrics (recall@k / MRR / nDCG@k) for the
  *    exact cosine run against label relevance.
  *  - q293 matryoshka truncation recall: top-k recall when embeddings
  *    are truncated to prefix dims (Kusupati et al. 2022) — the
  *    bytes-per-vector knob evaluated against the full-dim baseline.
  *
  * Determinism across engines follows the ANN-layer conventions: every
  * similarity/distance is micro-rounded to an integer immediately
  * after one double expression both engines evaluate identically; all
  * accumulation past that point is exact integer arithmetic; ranking
  * ties break on ids.
  */
object Evaluation {

  final val ShapK = 5

  /** q288 — exact KNN-Shapley data valuation (Jia et al. 2019, "Towards
    * Efficient Data Valuation Based on the Shapley Value"): for a K-NN
    * utility, the Shapley value of every training point has a closed
    * form over the distance-sorted corpus — s_(N) = 1[y_(N)=y]/N and
    * s_(j) = s_(j+1) + (1[y_(j)=y] − 1[y_(j+1)=y])·min(K,j)/(K·j) —
    * so the whole valuation is one ranking window + one lead + one
    * suffix sum, never a permutation sample. The probe batch is the
    * standard every-50th query set (bounded — the corpus side stays
    * linear at any SF; at 100 TB the batch is the knob, exactly like
    * the q26 exact-eval family). Each per-position term quantizes to
    * 1e-12 units with ONE identically-evaluated double expression,
    * then the suffix sum and the per-training-point total across
    * queries are exact integer sums — engine-identical by
    * construction. Output: the top-100 most valuable training points
    * (TakeOrdered — never a global single-partition window over the
    * corpus). Spec pins the efficiency property Σᵢ sᵢ = hits@K/K per
    * query and the all-same-label closed form.
    */
  def q288_knn_shapley(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"), $"label")
      .withColumn("nrm", norm($"v"))
    val queries = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"),
        $"label".as("q_label"))

    val sims = emb.join(broadcast(queries), $"vec_id" =!= $"q_id")
      .select($"q_id",
        $"vec_id".as("train_id"), $"label",
        when($"label" === $"q_label", 1L).otherwise(0L).as("ind"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm") * 1e6).cast("long").as("sim_micro"))

    val byDist = Window.partitionBy($"q_id").orderBy($"sim_micro".desc, $"train_id")
    val part = Window.partitionBy($"q_id")
    val ranked = sims
      .withColumn("pos", row_number().over(byDist))
      .withColumn("n", count(lit(1)).over(part))
      .withColumn("ind_next", lead($"ind", 1).over(byDist))
    val terms = ranked.withColumn("term_e12",
      when($"ind_next".isNull,
        round($"ind".cast("double") / $"n" * 1e12).cast("long"))
        .otherwise(round(($"ind" - $"ind_next") * least(lit(ShapK), $"pos")
          / (lit(ShapK.toDouble) * $"pos") * 1e12).cast("long")))
    // suffix sum in distance order = running sum over descending pos
    val suffix = Window.partitionBy($"q_id").orderBy($"pos".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val values = terms
      .withColumn("s_e12", sum($"term_e12").over(suffix))
      .groupBy($"train_id", $"label".cast("long").as("label"))
      .agg(count(lit(1)).as("n_queries"), sum($"s_e12").as("value_e12"))
    values
      .orderBy($"value_e12".desc, $"train_id")
      .limit(100)
      .withColumn("rank",
        row_number().over(Window.orderBy($"value_e12".desc, $"train_id")).cast("long"))
      .select($"rank", $"train_id", $"label", $"n_queries", $"value_e12")
      .orderBy($"rank")
  }

  final val KCenters = 5

  /** q289 — greedy k-center coreset (Gonzalez 1985, farthest-point
    * traversal): the diversity-selection dual of dedup — pick the K
    * training examples that COVER the embedding space (every point
    * within coverage_radius of some center, a 2-approximation of the
    * optimal k-center radius). Exactly K bounded rounds: each round
    * one corpus scan computes min-distance to the ≤K chosen centers
    * (literal vectors — broadcast with the plan, no join) and
    * TakeOrdered picks the farthest point (the next center AND the
    * current coverage radius in one row). Driver state is K·64
    * doubles — bounded scalars, the documented two-phase pattern. At
    * 100 TB: K scans, each embarrassingly parallel, no shuffle except
    * the single-row argmax reduce.
    */
  def q289_kcenter_coreset(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))

    def dist2Micro(v: Column, c: Array[Double]): Column = {
      val cv = array(c.map(lit).toSeq: _*)
      round((dot(v, v) - lit(2.0) * dot(v, cv) + dot(cv, cv)) * 1e6).cast("long")
    }

    // seed: the minimum vec_id (deterministic, engine-independent).
    // Greedy farthest-point has no defined seed on an empty corpus —
    // fail with the named require, not an index error (zero-row
    // degenerate-probe finding; the q34 corpus-shape convention).
    val firstRows = emb.orderBy($"vec_id").limit(1).collect()
    require(firstRows.nonEmpty,
      "k-center coreset needs a non-empty embeddings corpus to seed " +
        "the greedy farthest-point sweep")
    val first = firstRows(0)
    // head of `centers` is always the center chosen in the CURRENT
    // round: the farthest point found in round r is both round r's
    // coverage radius and round r+1's center (prepended below)
    var centers = List((first.getLong(0), first.getSeq[Double](1).toArray))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for (r <- 1 to KCenters) {
      val dmin = centers.map(c => dist2Micro($"v", c._2)).reduce(least(_, _))
      val far = emb.select($"vec_id", $"v", dmin.as("dmin"))
        .orderBy($"dmin".desc, $"vec_id").limit(1).collect()(0)
      out += ((r.toLong, centers.head._1, far.getLong(2)))
      centers = (far.getLong(0), far.getSeq[Double](1).toArray) :: centers
    }
    spark.createDataFrame(out.toList).toDF("round", "center_id", "coverage_micro")
      .orderBy($"round")
  }

  /** q290 — IVF index maintenance audit (incremental append + drift):
    * the operational question behind every served ANN index — an
    * append batch arrives, the coarse quantizer is FROZEN (retraining
    * re-shuffles every stored code), so new vectors go to their
    * nearest existing centroid; when per-list occupancy drifts, recall
    * degrades and a retrain is due. The audit assigns base corpus and
    * append batch (vec_id ≥ 16 with id%10 = 7 — the first 16 vectors
    * are q49's frozen seeds) through the SAME seeded quantizer the
    * oracle replays, and reports per-list base/new occupancy shares
    * (ppm) and their drift. One scan, one 16-row aggregate — index
    * maintenance cost is assignment-only, exactly how a 100 TB index
    * absorbs appends between retrains.
    */
  def q290_ivf_append_drift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    val (seeds, assigned) = Similarity.seededAssignment(emb)
    // the frozen quantizer is the first-k seed set; "new" = any later
    // id — seeds.length IS ivfK(N) (dense ids), the same bound the
    // oracle re-derives from the data
    val flagged = assigned.select($"centroid",
      when($"vec_id" >= seeds.length && $"vec_id" % 10 === 7, 1L)
        .otherwise(0L).as("isn"))
    val g = flagged.groupBy($"centroid")
      .agg(sum(lit(1L) - $"isn").as("n_base"), sum($"isn").as("n_new"))
    val t = g.agg(sum($"n_base").as("tb"), sum($"n_new").as("tn"))
    g.crossJoin(broadcast(t))
      .select($"centroid".cast("long").as("cid"), $"n_base", $"n_new",
        when($"tb" > 0L, round(lit(1e6) * $"n_base" / $"tb").cast("long"))
          .otherwise(0L).as("share_base_ppm"),
        when($"tn" > 0L, round(lit(1e6) * $"n_new" / $"tn").cast("long"))
          .otherwise(0L).as("share_new_ppm"))
      .withColumn("drift_ppm", abs($"share_base_ppm" - $"share_new_ppm"))
      .orderBy($"cid")
  }

  /** nDCG discount table, computed ONCE in Scala and spliced as
    * literal constants into BOTH the Spark plan and the DuckDB oracle
    * SQL — log2 across engines/libms can differ in the last ulp, so
    * neither engine ever evaluates a log: disc(i) = round(1e9/log2(i+1)).
    */
  private val DiscE9: IndexedSeq[Long] =
    (1 to TopK).map(i => math.round(1e9 / (math.log(i + 1.0) / math.log(2.0))))
  private val CumDiscE9: IndexedSeq[Long] = DiscE9.scanLeft(0L)(_ + _).tail

  /** q292 — retrieval quality metrics: recall@10, MRR and nDCG@10 of
    * the exact cosine run (q26's shared top-k memo) against label
    * relevance (a neighbor is relevant iff it carries the query's
    * label) — the eval harness every retrieval/RAG pipeline runs
    * before swapping an index. DCG terms use the pre-quantized
    * discount table (exact integer sums — engine-identical); ideal
    * DCG is the cumulative table at min(10, n_rel); each final metric
    * is ONE exactly-rounded division to micro units. Cost: the run is
    * the memoized exact top-k (≤|queries|·10 rows) joined to two
    * bounded label tables — nothing corpus-quadratic beyond the
    * shared denominator.
    */
  def q292_retrieval_metrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val labels = load(spark, dir, "embeddings").select($"vec_id", $"label")
    val labCnt = labels.groupBy($"label").agg(count(lit(1)).as("c"))
    val queries = labels.filter($"vec_id" % 50 === 0)
      .join(broadcast(labCnt), "label")
      .select($"vec_id".as("q_id"), $"label".as("q_label"), ($"c" - 1L).as("n_rel"))

    val discCol = array(DiscE9.map(lit): _*)
    val run = Similarity.exactTopK(spark, dir)
      .join(broadcast(labels.select($"vec_id".as("neighbor_id"), $"label".as("n_label"))),
        "neighbor_id")
      .join(broadcast(queries), "q_id")
      .withColumn("rel", ($"n_label" === $"q_label").cast("long"))

    val perQ = run.groupBy($"q_id", $"n_rel")
      .agg(sum($"rel").as("hits"),
        sum(when($"rel" === 1L, element_at(discCol, $"rank".cast("int")))
          .otherwise(0L)).as("dcg_e9"),
        min(when($"rel" === 1L, $"rank")).as("first_rel"))
    val cumCol = array(CumDiscE9.map(lit): _*)
    perQ.select($"q_id", $"n_rel", $"hits",
        when($"n_rel" > 0,
          round(lit(1e6) * $"hits" / least(lit(TopK.toLong), $"n_rel")).cast("long"))
          .otherwise(0L).as("recall_micro"),
        when($"first_rel".isNotNull,
          round(lit(1e6) / $"first_rel").cast("long")).otherwise(0L).as("mrr_micro"),
        when($"n_rel" > 0,
          round(lit(1e6) * $"dcg_e9"
            / element_at(cumCol, least(lit(TopK), $"n_rel").cast("int"))).cast("long"))
          .otherwise(0L).as("ndcg_micro"))
      .orderBy($"q_id")
  }

  final val MatryoshkaDims = Seq(16, 32, 64)

  /** q293 — matryoshka truncation recall (Kusupati et al. 2022,
    * "Matryoshka Representation Learning"): top-10 recall when the
    * cosine runs on only the first d dimensions — the bytes-per-vector
    * scan knob (d=16 reads 4× fewer bytes than full) evaluated against
    * the full-dim exact baseline. Per dim: the standard broadcast-
    * query scan on sliced vectors, rank window, overlap count vs the
    * shared exact memo; d=64 IS the baseline, so its recall is
    * exactly 1e6 — a built-in sanity anchor the oracle hashes too.
    */
  def q293_matryoshka_recall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
    val exact = Similarity.exactTopK(spark, dir)
      .select($"q_id", $"neighbor_id").withColumn("in_exact", lit(1L))

    val perDim = MatryoshkaDims.map { d =>
      val sub = emb.select($"vec_id", slice($"v", 1, d).as("vd"))
        .withColumn("nrm", norm($"vd"))
      val queries = sub.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("q_id"), $"vd".as("qv"), $"nrm".as("qnrm"))
      // the q300 norm-product floor: an all-zero d-dim PREFIX is
      // possible even when the full vector isn't — without it the
      // cosine is NaN and the ANSI long cast throws (oracle mirrors)
      val sims = sub.join(broadcast(queries), $"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id".as("neighbor_id"),
          round(dot($"qv", $"vd") / greatest($"qnrm" * $"nrm", lit(1e-12)) * 1e6)
            .cast("long").as("sim_micro"))
      val w = Window.partitionBy($"q_id").orderBy($"sim_micro".desc, $"neighbor_id")
      sims.withColumn("rank", row_number().over(w)).filter($"rank" <= TopK)
        .join(broadcast(exact), Seq("q_id", "neighbor_id"), "left")
        .groupBy($"q_id").agg(sum(coalesce($"in_exact", lit(0L))).as("ovl"))
        .agg(count(lit(1)).as("n_queries"), sum($"ovl").as("sum_overlap"))
        .select(lit(d.toLong).as("dim"), $"n_queries", $"sum_overlap",
          round(lit(1e6) * $"sum_overlap" / (lit(TopK.toLong) * $"n_queries"))
            .cast("long").as("mean_recall_micro"))
    }
    perDim.reduce(_.union(_)).orderBy($"dim")
  }

  final val GeoMedianIters = 2

  /** q296 — per-label geometric median (Weiszfeld 1937, fixed
    * [[GeoMedianIters]] iterations): the robust class centroid — a
    * handful of corrupt/mislabeled vectors drag the MEAN arbitrarily
    * far but barely move the geometric median (breakdown point 0.5),
    * so it's the anchor q46-style drift audits should trust when
    * contamination is the thing being hunted. Determinism by the
    * q278 grid discipline: coordinates quantize once to the 1e-6
    * integer grid; each iteration computes per-vector distances from
    * EXACT integer sums, weights quantize to 1e-9-reciprocal integers
    * (one identically-evaluated double expression per vector), and
    * the re-estimated center rounds back to the grid from a
    * decimal-exact weighted sum — both engines walk bit-identical
    * states. Fixed iteration count (the bounded-rounds policy: data-
    * dependent convergence loops can't be promised at 100 TB); each
    * round is one broadcast join of the 64·|labels| center table onto
    * the exploded scan + two aggregates, all linear.
    */
  def q296_geometric_median(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ex = graft.Caches.tracked(load(spark, dir, "embeddings")
      .select($"vec_id", $"label", posexplode(toDouble($"embedding")))
      .select($"label".cast("long").as("label"), $"vec_id",
        $"pos".cast("long").as("i"),
        round($"col" * 1e6).cast("long").as("xq")))
    val m0 = ex.groupBy($"label", $"i")
      .agg(round(sum($"xq").cast("double") / count(lit(1)))
        .cast("long").as("m"))
    var m = m0
    for (_ <- 1 to GeoMedianIters) {
      val w = ex.join(broadcast(m), Seq("label", "i"))
        .groupBy($"label", $"vec_id")
        .agg(sum(($"xq" - $"m") * ($"xq" - $"m")).as("ss"))
        .select($"label", $"vec_id",
          round(lit(1e9) / greatest(sqrt($"ss".cast("double")), lit(1.0)))
            .cast("long").as("wq"))
      m = ex.join(w, Seq("label", "vec_id"))
        .groupBy($"label", $"i")
        .agg(sum($"xq".cast("decimal(38,0)") * $"wq").as("num"),
          sum($"wq").as("den"))
        .select($"label", $"i",
          round($"num".cast("double") / $"den").cast("long").as("m"))
    }
    m0.withColumnRenamed("m", "mean_e6")
      .join(m.withColumnRenamed("m", "gm_e6"), Seq("label", "i"))
      .select($"label", $"i", $"mean_e6", $"gm_e6")
      .orderBy($"label", $"i")
  }

  final val NoiseK = 5

  /** q298 — label-noise detection by k-NN disagreement (the Confident-
    * Learning-style audit, Northcutt et al. 2021, reduced to its
    * geometric core): a vector whose nearest same-cluster neighbors
    * mostly carry a DIFFERENT label is a suspected mislabel — the QA
    * pass a training pipeline runs before trusting labels. Candidate
    * neighbors are CLUSTER-CONFINED (the q195 SemDeDup shape: pairs
    * only within a seeded-quantizer cell, one equi-join on the
    * centroid id — never all-pairs), top-[[NoiseK]] by exact cosine
    * with id tie-breaks; a vector is flagged when the majority of its
    * neighbors disagree, and the modal neighbor label is the
    * suggested correction. At 100 TB: k scales with cell size, cells
    * are bounded by k-means granularity — the audit stays
    * Σ|cell|², the same bound the dedup layer already lives under.
    */
  def q298_label_noise(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"), $"label")
      .withColumn("nrm", norm($"v"))
    val (_, assignedRaw) = Similarity.seededAssignment(emb.drop("label"))
    // materialized before the pair join (the q195 lesson: the argmin
    // fused into a pair join re-evaluates per PAIR row)
    val a = graft.Caches.tracked(assignedRaw
      .join(emb.select($"vec_id", $"label".cast("long").as("label")), "vec_id"))
    val pairs = a.as("x").join(a.as("y"),
        col("x.centroid") === col("y.centroid") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("x.label").as("label"),
        col("y.vec_id").as("nb"), col("y.label").as("nb_label"),
        round(dot(col("x.v"), col("y.v"))
          / (col("x.nrm") * col("y.nrm")) * 1e6).cast("long").as("sim_micro"))
    val w = Window.partitionBy($"vec_id").orderBy($"sim_micro".desc, $"nb")
    val byLab = pairs.withColumn("rk", row_number().over(w))
      .filter($"rk" <= NoiseK)
      .groupBy($"vec_id", $"label", $"nb_label")
      .agg(count(lit(1)).as("c"))
    byLab.groupBy($"vec_id", $"label")
      .agg(sum($"c").as("n_nb"),
        sum(when($"nb_label" =!= $"label", $"c").otherwise(0L)).as("n_diff"),
        max(struct($"c", (-$"nb_label").as("neg"))).as("md"))
      .filter($"n_diff" * 2 > $"n_nb")
      .select($"vec_id", $"label", $"n_nb", $"n_diff",
        (-$"md.neg").as("modal_label"))
      .orderBy($"vec_id")
  }

  final val MaxSimSubs = 8

  /** q300 — late-interaction retrieval (maxsim, the ColBERT scoring
    * of Khattab & Zaharia, SIGIR 2020): score(q,d) = Σ_m max_m′
    * cos(q_m, d_m′) over per-vector sub-embeddings — each query part
    * is free to match its best-aligned doc part, so meaning that
    * moved position still scores (the property whole-vector cosine
    * lacks; the spec plants a permuted-parts doc that maxsim ranks
    * first while full cosine does not). Sub-vectors here are the PQ
    * subspace decomposition ([[MaxSimSubs]]×8 dims) of the stored
    * embedding — the same layout a token-level index would store one
    * row per part. Plan shape is q26's conditioned broadcast: one
    * pair row per (query, doc), the whole 64-cell max/sum grid
    * evaluated by the native [[graft.functions.MaxSimMicro]] call
    * (cell(m,m′) rounds to micro BEFORE max/sum — integer semantics
    * identical in every formulation and in the oracle replay),
    * top-10 per query by ranking window.
    */
  def q300_maxsim_retrieval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
    // Formulation history (the three measured shapes before round 20):
    // exploding BOTH sides shuffled 64·|q|·|corpus| cell rows through
    // two aggregations (38 s at the 20× stress); fusing all 64 cells
    // into one Catalyst projection blew the 64 KB codegen method
    // limit and ran interpreted (293 s); the round-14→19 form exploded
    // only the query side into 8 rows per pair (codegen-sized 8-cell
    // projections + a hash re-aggregation, 3.6 s at sf0.1). The
    // native maxsim_micro expression (round 20) computes the full
    // grid per PAIR row — pair stream 8× smaller, no re-aggregation,
    // one generated call into a tight JIT-compiled loop; arithmetic
    // bit-identical (see MaxSimMicro's scaladoc).
    val qs = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
    val scored = emb.join(broadcast(qs), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        graft.functions.MaxSimMicro.maxsimMicro($"qv", $"v", MaxSimSubs)
          .as("maxsim_micro"))
    val w = Window.partitionBy($"q_id").orderBy($"maxsim_micro".desc, $"neighbor_id")
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TopK)
      .select($"q_id", $"rank", $"neighbor_id", $"maxsim_micro")
      .orderBy($"q_id", $"rank")
  }

  /** q312 — ANN-bounded maxsim: the SERVING composition of the two
    * oracle-verified stages beside it — q49's coarse IVF probe bounds
    * WHICH documents a query visits, q300's late-interaction maxsim
    * scores ONLY those candidates. q300 is the exact |q|·|corpus|
    * eval scan (18.8 s at sf1.0 — the honest denominator); this is
    * the plan a production ColBERT-style retriever actually runs:
    * candidate generation from the inverted lists, then the expensive
    * 64-cell late-interaction score on the IvfProbes/IvfCentroids
    * fraction of the corpus that survives.
    *
    * Scale design: the inverted lists are the MATERIALIZED stored
    * index (Caches.tracked — never rebuilt per candidate row); the
    * doc-side part slices + norms compute once per INDEX row below
    * the join; only the (tiny) query side — 8 parts × IvfProbes
    * probes per query — broadcasts. The candidate stream is
    * 8·|q|·|corpus|·(nprobe/k) rows instead of q300's 8·|q|·|corpus|,
    * and nothing else changes: the same codegen-sized per-row 8-dot
    * projection, the same two integer aggregates, the same top-k
    * window. Recall vs the exact q300 ranking is pinned by spec (the
    * q27-vs-q26 pattern); every stage replays in DuckDB.
    */
  def q312_ann_maxsim(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    val (seeds, assignedRaw) = Similarity.seededAssignment(emb)
    // the stored index: (vec_id, centroid) inverted lists with the
    // raw vector — the fused native maxsim call reads whole vectors,
    // so the 16 per-part slice/norm columns of the pre-round-20 form
    // are gone from the cache
    val ds = graft.Caches.tracked(
      assignedRaw.select($"vec_id", $"centroid", $"v"))

    // query probe ranking over the centroid literals (q49's shape:
    // micro-rounded L2 with centroid-id tie-breaks, engine-
    // independent), via one native quantizer_topcap call per query
    // (round 20) instead of the |q|·k explode + ranking window
    val probes = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"),
        explode(graft.functions.QuantizerTopCap.topCap(
          $"v", seeds, Similarity.IvfProbes)).as("c"))
      .select($"q_id", $"c.cid".as("probe_centroid"))

    // whole query vectors × probes — broadcast side; each (query, doc)
    // candidate meets at most once (one stored centroid per doc,
    // distinct probe cells per query), and the full 64-cell grid is
    // q300's native maxsim_micro call per pair row (the 8-row query
    // explode + re-aggregation of the pre-round-20 form is gone;
    // arithmetic bit-identical, see MaxSimMicro's scaladoc)
    val qs = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
      .join(probes, "q_id")
    val scored = ds.join(broadcast(qs),
        $"centroid" === $"probe_centroid" && $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        graft.functions.MaxSimMicro.maxsimMicro($"qv", $"v", MaxSimSubs)
          .as("maxsim_micro"))
    val w = Window.partitionBy($"q_id").orderBy($"maxsim_micro".desc, $"neighbor_id")
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TopK)
      .select($"q_id", $"rank", $"neighbor_id", $"maxsim_micro")
      .orderBy($"q_id", $"rank")
  }

  /** q302 — residual quantization (RQ, the two-level additive coder
    * of Chen et al. 2010 / FAISS's ResidualQuantizer): after the
    * coarse assignment, quantize the RESIDUAL v − c against a second
    * codebook — per extra byte it recovers error PQ's independent
    * subspaces can't, because the second stage sees the full-dim
    * leftover. Completes the stored-index compression suite beside
    * PQ (q198), SQ8 (q247) and SRP (q248). Codebooks stay
    * oracle-replayable: coarse = q49's seeds (the first ivfK(N)
    * vectors), residual codebook = the ENGINE-assigned residuals of
    * the first [[Similarity.PqCodes]] NON-centroid vectors — ids in
    * [ivfK(N), ivfK(N)+PqCodes) (collected — 16·64 doubles, bounded
    * driver state) — so both engines derive identical codebooks from
    * the data alone AND the seeds are never coarse centroids (a
    * centroid's residual is exactly zero, which would degenerate the
    * residual codebook to zeros whenever ivfK(N) ≥ 32 and nullify the
    * second stage). Output: per coarse list, mean
    * quantization error after stage 1 vs stage 2 — the bytes-vs-
    * recall evidence an index planner reads. One scan + one bounded
    * aggregate; both argmins are the native codegen'd expression.
    */
  def q302_residual_quantization(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    val (seeds, assignedRaw) = Similarity.seededAssignment(emb)
    val cvArr = array(seeds.map(s =>
      array(s._2.map(lit).toIndexedSeq: _*)): _*)
    // materialize the residuals once (zip_with is CodegenFallback —
    // never let it fuse into the second argmin scan twice)
    val assigned = graft.Caches.tracked(assignedRaw
      .withColumn("rv", zip_with($"v",
        element_at(cvArr, $"centroid" + 1), (a, b) => a - b)))
    // residual CODEBOOK size is the fixed PqCodes design constant
    // (codebooks never scale with the corpus — only the coarse LIST
    // COUNT above does, via seededAssignment's ivfK). Seeds start at
    // the first NON-centroid id: ids < seeds.length ARE the coarse
    // centroids, whose residuals are exactly zero.
    val k = Similarity.PqCodes
    val lo = seeds.length.toLong
    val rseeds = assigned
      .filter($"vec_id" >= lo && $"vec_id" < lo + k)
      .select($"vec_id", $"rv").collect()
      .sortBy(_.getLong(0))
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
    require(rseeds.nonEmpty,
      s"residual quantization needs vectors with ids in [$lo, ${lo + k}) to seed " +
        s"the residual codebook (q49 convention) — corpus too small/sparse")
    assigned
      .withColumn("err0", round(dot($"rv", $"rv") * 1e6).cast("long"))
      .withColumn("a2", graft.functions.QuantizerArgmin.argmin($"rv", rseeds))
      .select($"centroid".cast("long").as("cid"), $"err0",
        $"a2.d".as("err1"))
      .groupBy($"cid")
      .agg(count(lit(1)).as("n"),
        round(sum($"err0").cast("double") / count(lit(1)))
          .cast("long").as("mean_err0_micro"),
        round(sum($"err1").cast("double") / count(lit(1)))
          .cast("long").as("mean_err1_micro"))
      .orderBy($"cid")
  }

  /** q307 — kNN-graph reciprocity audit: the fraction of directed
    * kNN edges that are MUTUAL (i ∈ knn(j) ∧ j ∈ knn(i)) — with
    * q222's hubness, the standard "is this embedding space healthy"
    * pair: low reciprocity means asymmetric neighborhoods (hubs
    * attract, anti-hubs orphan) and predicts weak ANN recall.
    * Neighborhoods are cluster-confined (q298's equi-join shape), the
    * mutual test is one self-join of the bounded edge list on the
    * reversed key. Per-list rows keep the audit actionable: a single
    * degenerate IVF cell shows up as ITS row, not a diluted average.
    */
  def q307_knn_reciprocity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    val (_, assignedRaw) = Similarity.seededAssignment(emb)
    val a = graft.Caches.tracked(assignedRaw)
    val pairs = a.as("x").join(a.as("y"),
        col("x.centroid") === col("y.centroid") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.centroid").as("cid"), col("x.vec_id").as("src"),
        col("y.vec_id").as("dst"),
        round(dot(col("x.v"), col("y.v"))
          / (col("x.nrm") * col("y.nrm")) * 1e6).cast("long").as("sim_micro"))
    val w = Window.partitionBy($"src").orderBy($"sim_micro".desc, $"dst")
    val edges = graft.Caches.tracked(pairs
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= NoiseK)
      .select($"cid", $"src", $"dst"))
    val mutual = edges.as("e").join(edges.as("r"),
        col("e.src") === col("r.dst") && col("e.dst") === col("r.src"))
      .groupBy(col("e.cid").as("cid")).agg(count(lit(1)).as("n_mutual"))
    val base = edges.groupBy($"cid")
      .agg(countDistinct($"src").as("n_nodes"), count(lit(1)).as("n_edges"))
    base.join(mutual, Seq("cid"), "left")
      .select($"cid".cast("long").as("cid"), $"n_nodes", $"n_edges",
        coalesce($"n_mutual", lit(0L)).as("n_mutual"))
      .withColumn("reciprocity_milli",
        round(lit(1000.0) * $"n_mutual" / $"n_edges").cast("long"))
      .orderBy($"cid")
  }

  /** q327 — Davies–Bouldin cluster-validity index (Davies & Bouldin
    * 1979): the LABEL-FREE internal-validity statistic beside the
    * labeled purity (q227), hubness (q222) and reciprocity (q307)
    * audits — per cluster, the worst (scatter_i + scatter_j) /
    * separation(i,j) ratio over all other clusters; a high row means
    * that list overlaps a neighbor and ANN probes will leak across
    * the boundary. Clusters are the oracle-verified seeded quantizer
    * (q49 convention); scatter is the mean member→centroid L2
    * distance with every member's sqrt micro-rounded BEFORE the mean
    * (exact long sums, one closing division); centroid separations
    * and the final max run on the DRIVER over the bounded k-row
    * scatter table + k seed vectors (codebook-seed posture, ≤1024²
    * 64-dim dots — driver metadata by definition). One corpus scan;
    * clusters emptied by duplicate seeds simply have no row, and a
    * single-cluster corpus reports NULL db_micro (no neighbor),
    * never throws.
    */
  def q327_davies_bouldin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    val (seeds, assigned) = Similarity.seededAssignment(emb)
    val cvArr = array(seeds.map(s =>
      array(s._2.map(lit).toIndexedSeq: _*)): _*)
    val withC = assigned.withColumn("cv", element_at(cvArr, $"centroid" + 1))
    val d2 = dot($"v", $"v") - lit(2.0) * dot($"v", $"cv") + dot($"cv", $"cv")
    val scatter = withC
      .withColumn("d", round(sqrt(greatest(d2, lit(0.0))) * 1e6).cast("long"))
      .groupBy($"centroid".cast("long").as("cid"))
      .agg(count(lit(1)).as("n"),
        round(sum($"d").cast("double") / count(lit(1))).cast("long")
          .as("s_micro"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap // bounded: ≤ k rows (codebook-seed posture)
    def halfUp(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    def dotL(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val seedMap = seeds.map { case (cid, c) => cid.toLong -> c }.toMap
    def sepMicro(i: Long, j: Long): Long = {
      val (a, b) = (seedMap(i), seedMap(j))
      halfUp(math.sqrt(math.max(
        dotL(a, a) - 2.0 * dotL(a, b) + dotL(b, b), 0.0)) * 1e6)
    }
    val cids = scatter.keys.toSeq.sorted
    val rows = cids.map { i =>
      val (n, si) = scatter(i)
      val ratios = cids.filter(_ != i).map { j =>
        halfUp(1e6 * (si + scatter(j)._2).toDouble
          / math.max(sepMicro(i, j), 1L).toDouble)
      }
      (i, n, si,
        if (ratios.isEmpty) None else Some(ratios.max): Option[Long])
    }
    rows.toDF("cid", "n", "s_micro", "db_micro").orderBy($"cid")
  }

  /** q332 — adjusted Rand index (Hubert & Arabie 1985) between the
    * seeded quantizer's clustering and the embeddings' own labels:
    * the EXTERNAL chance-corrected agreement statistic beside the
    * internal validity pair (q327 Davies–Bouldin, q333 silhouette)
    * and the share-based purity (q227) — purity rewards shattering
    * (k singleton clusters score 1.0), ARI's pair-counting correction
    * does not. Everything is exact integer combinatorics on the
    * bounded k·|labels| contingency table after the one assignment
    * scan: Σᵢⱼ C(nᵢⱼ,2), row/column-margin pair sums and C(N,2), with
    * the expected-index cross-products promoted to decimal(38,0)/
    * HUGEINT (C(N,2)² clears int64 at ~N=9e4 — the q328 promotion
    * rule) and ONE closing double division micro-rounded:
    * ari = 2(S·C − A·B) / ((A+B)·C − 2AB). A degenerate partition
    * (one cluster, or all-singleton labels — denominator 0) reports
    * NULL, never throws.
    */
  def q332_adjusted_rand(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    val (_, assigned) = Similarity.seededAssignment(emb)
    // C(n,2) in exact longs: n(n−1) is always even, shiftright keeps
    // the integer type (Column./ on longs would promote to double)
    def c2(c: Column): Column = shiftright(c * (c - 1), 1)
    val ct = graft.Caches.tracked(assigned
      .join(load(spark, dir, "embeddings").select($"vec_id", $"label"), "vec_id")
      .groupBy($"centroid", $"label").agg(count(lit(1)).as("n")))
    val core = ct.agg(sum(c2($"n")).as("sij"),
      countDistinct($"centroid").as("n_clusters"),
      countDistinct($"label").as("n_labels"),
      sum($"n").as("nn"))
    val a = ct.groupBy($"centroid").agg(sum($"n").as("na"))
      .agg(sum(c2($"na")).as("sa"))
    val b = ct.groupBy($"label").agg(sum($"n").as("nb"))
      .agg(sum(c2($"nb")).as("sb"))
    // C(N,2) never materializes as its own long (N(N−1) clears int64
    // only to N≈3e9 — a real 100 TB row count): both sides of the
    // ratio are doubled so cn2 appears only as N(N−1) inside the
    // decimal products — num/den = 2(S·C − AB)/((A+B)·C − 2AB)
    val dec = "decimal(38,0)"
    core.crossJoin(broadcast(a)).crossJoin(broadcast(b))
      .withColumn("num", lit(2).cast(dec) * $"sij".cast(dec)
        * $"nn".cast(dec) * ($"nn" - 1).cast(dec)
        - lit(4).cast(dec) * $"sa".cast(dec) * $"sb".cast(dec))
      .withColumn("den",
        ($"sa".cast(dec) + $"sb".cast(dec))
          * $"nn".cast(dec) * ($"nn" - 1).cast(dec)
          - lit(4).cast(dec) * $"sa".cast(dec) * $"sb".cast(dec))
      .select($"nn".as("n"), $"n_clusters".cast("long").as("n_clusters"),
        $"n_labels".cast("long").as("n_labels"), $"sij", $"sa", $"sb",
        when($"den" === 0, lit(null).cast("long"))
          .otherwise(round(lit(1e6) * $"num".cast("double")
            / $"den".cast("double")).cast("long")).as("ari_micro"))
  }

  /** q333 — simplified silhouette (Hruschka et al. 2004): per point,
    * a = distance to its OWN centroid and b = distance to the nearest
    * OTHER centroid, s = (b − a)/max(a, b) — the centroid-based form
    * of Rousseeuw's silhouette whose cost is the assignment scan
    * itself, not the O(N²) pairwise original (which cannot run at
    * 100 TB; the centroid form is the production validity readout).
    * With nearest-centroid assignment, a and b are exactly the two
    * smallest centroid distances, so ONE generated `quantizer_top2`
    * call per row yields both — nothing k-fold materializes and no
    * corpus-sized shuffle happens (contrast: an explode-over-
    * centroids formulation shuffles k× the corpus into a min
    * aggregate). Distances micro-round the sqrt of the micro-rounded
    * d² (one deterministic IEEE tree both engines share); each
    * point's s micro-rounds with ONE division before the exact
    * integer per-cluster sum, mirroring q327's scatter treatment.
    * Single-centroid corpora (no runner-up) report NULL silhouette,
    * never throw.
    */
  def q333_simplified_silhouette(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
    val seeds = Similarity.ivfSeeds(emb.withColumn("nrm", norm($"v")))
    def eu(d2: Column): Column =
      round(sqrt(greatest(d2.cast("double") / 1e6, lit(0.0))) * 1e6).cast("long")
    val t2 = graft.functions.QuantizerTop2.top2($"v", seeds)
    emb.withColumn("t", t2)
      .select($"t.c1".cast("long").as("cid"),
        eu($"t.d1").as("a_micro"),
        // explicit NULL guard: Spark's greatest() SKIPS nulls, so a
        // null d2 (single-centroid corpus, no runner-up) would
        // otherwise surface as b_micro = 0 / s_micro = -1e6 instead
        // of the documented NULL; s_micro then null-propagates and
        // the cluster's sil_micro reports NULL, never throwing
        when($"t.d2".isNull, lit(null).cast("long"))
          .otherwise(eu($"t.d2")).as("b_micro"))
      .withColumn("s_micro",
        round(lit(1e6) * ($"b_micro" - $"a_micro").cast("double")
          / greatest(greatest($"a_micro", $"b_micro"), lit(1L)).cast("double"))
          .cast("long"))
      .groupBy($"cid")
      .agg(count(lit(1)).as("n"),
        round(sum($"s_micro").cast("double") / count(lit(1))).cast("long")
          .as("sil_micro"))
      .orderBy($"cid")
  }

  /** q311 — semi-hard negative mining (Schroff et al. 2015, FaceNet):
    * the negative that is CLOSER than margin-random but still farther
    * than the positive — sim(a,n) < sim(a,p) — the regime that trains
    * stably where q281's hardest negatives (which may violate the
    * margin outright) collapse embeddings. Per query: best same-label
    * positive first, then the max-similarity different-label neighbor
    * strictly below it; queries whose every negative ties or beats
    * the positive report NULL (the honest "no semi-hard exists here"
    * — the batch-resampling signal). Same conditioned-broadcast scan
    * as q281, one extra bounded join against the per-query positive.
    */
  def q311_semihard_negatives(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"), $"label")
      .withColumn("nrm", norm($"v"))
    val queries = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"),
        $"label".as("q_label"))
    val sims = graft.Caches.tracked(emb.join(broadcast(queries), $"vec_id" =!= $"q_id")
      .select($"q_id", $"q_label", $"label".as("n_label"),
        $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm") * 1e6).cast("long").as("sim_micro")))
    val pos = sims.filter($"n_label" === $"q_label")
      .groupBy($"q_id", $"q_label")
      .agg(max(struct($"sim_micro", (-$"neighbor_id").as("nid"))).as("p"))
      .select($"q_id", $"q_label".cast("long").as("q_label"),
        (-$"p.nid").as("pos_id"), $"p.sim_micro".as("pos_sim_micro"))
    val semi = sims.filter($"n_label" =!= $"q_label")
      .join(pos.select($"q_id", $"pos_sim_micro"), "q_id")
      .filter($"sim_micro" < $"pos_sim_micro")
      .groupBy($"q_id")
      .agg(max(struct($"sim_micro", (-$"neighbor_id").as("nid"))).as("s"))
      .select($"q_id", (-$"s.nid").as("semihard_id"),
        $"s.sim_micro".as("semihard_sim_micro"))
    pos.join(semi, Seq("q_id"), "left")
      .select($"q_id", $"q_label", $"pos_id", $"pos_sim_micro",
        $"semihard_id", $"semihard_sim_micro",
        ($"pos_sim_micro" - $"semihard_sim_micro").as("margin_micro"))
      .orderBy($"q_id")
  }

  /** Number of facilities q316 greedily selects. */
  final val FLRounds = 6

  /** q316 — facility-location greedy subset selection: the OTHER
    * canonical submodular coreset objective beside q289's k-center
    * (max-min coverage radius) — maximize F(S) = Σ_v max_{s∈S}
    * sim(v, s), the CRAIG/coreset-selection objective that picks the
    * subset best REPRESENTING the corpus rather than best SPREAD over
    * it. Exact greedy needs every candidate's marginal gain per round
    * (all-pairs at corpus scale), so the candidate pool is the
    * bounded representative set — the FIXED PqCodes-sized rep pool
    * (a pool-size design constant like FLRounds, NOT the corpus-
    * derived IVF list count: the per-round scan carries one sum
    * column per candidate, so the pool must stay O(constant); the
    * production shape picks facilities among a bounded rep sample,
    * not raw points). Per round: ONE corpus scan computing every
    * remaining candidate's covered mass as parallel sum-aggregate
    * columns (≤PqCodes codegen'd VectorDots per row — the q198
    * envelope), argmax on the driver from the 1-row result.
    * Cost = rounds × linear scans; nothing pairwise ever shuffles.
    * Similarities are clamped-at-zero micro-rounded inner products;
    * the 1e6-scaled coverage sums hold in int64 to ~9e12 corpus
    * mass (decimal(38,0) past that). Greedy guarantees (1−1/e)
    * of the optimum (Nemhauser 1978); the spec pins monotone
    * coverage and diminishing marginal gains — submodularity made
    * observable.
    */
  def q316_facility_location(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // cached: the greedy re-scans the corpus once per round
    val emb = graft.Caches.tracked(load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v")))
    val seeds = Similarity.pqSeeds(emb)
    def simTo(c: Array[Double]): Column = {
      val cv = array(c.map(lit).toSeq: _*)
      greatest(lit(0L), round(dot($"v", cv) * 1e6).cast("long"))
    }
    var chosen = List.empty[(Int, Array[Double])]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val rounds = math.min(FLRounds, seeds.length)
    for (r <- 1 to rounds) {
      val remaining = seeds.filterNot(s => chosen.exists(_._1 == s._1))
      val cover = chosen.map(c => simTo(c._2))
        .foldLeft(lit(0L): Column)(greatest(_, _))
      val sumCols = remaining.map(c =>
        sum(greatest(cover, simTo(c._2))).as(s"c${c._1}"))
      val row = emb.agg(sumCols.head, sumCols.tail: _*).collect()(0)
      val best = remaining.zipWithIndex
        .map { case (c, i) => (c, row.getLong(i)) }
        .maxBy { case (c, g) => (g, -c._1.toLong) }
      out += ((r.toLong, best._1._1.toLong, best._2))
      chosen = best._1 :: chosen
    }
    spark.createDataFrame(out.toList)
      .toDF("round", "facility_cid", "coverage_micro")
      .orderBy($"round")
  }

  /** Oracle for q316: the same greedy unrolled round-by-round — the
    * N×PqCodes similarity table materialized once, each round an
    * argmax over the remaining candidates' covered-mass sums against
    * the accumulated per-vector cover. The candidate-pool bound
    * interpolates the SAME PqCodes constant the engine's pqSeeds
    * uses, so a change to the constant can never diverge the two
    * (round-13 ADVICE).
    */
  private def facilitySql: String = {
    val rounds = (2 to FLRounds).map { r =>
      val excl = (1 until r).map(i => s"(SELECT cid FROM p$i)")
        .mkString("sim.cid NOT IN ", " AND sim.cid NOT IN ", "")
      s"""g$r AS (SELECT sim.cid,
         |    CAST(SUM(GREATEST(cov${r - 1}.cover, sim.s)) AS BIGINT) AS gain
         |  FROM sim JOIN cov${r - 1} USING (vec_id)
         |  WHERE $excl GROUP BY sim.cid),
         |p$r AS (SELECT cid, gain FROM g$r ORDER BY gain DESC, cid LIMIT 1),
         |cov$r AS (SELECT cov${r - 1}.vec_id,
         |    GREATEST(cov${r - 1}.cover, sim.s) AS cover
         |  FROM cov${r - 1} JOIN sim USING (vec_id), p$r
         |  WHERE sim.cid = p$r.cid)""".stripMargin
    }.mkString(",\n")
    val untied = (1 to FLRounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, cid AS facility_cid, gain AS coverage_micro FROM p$r")
      .mkString("\nUNION ALL ")
    s"""WITH $ESql,
       |cand AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < ${Similarity.PqCodes}),
       |sim AS MATERIALIZED (SELECT e.vec_id, c.cid,
       |    GREATEST(0, CAST(ROUND(list_inner_product(e.v, c.cv) * 1e6) AS BIGINT)) AS s
       |  FROM e, cand c),
       |g1 AS (SELECT cid, CAST(SUM(s) AS BIGINT) AS gain FROM sim GROUP BY cid),
       |p1 AS (SELECT cid, gain FROM g1 ORDER BY gain DESC, cid LIMIT 1),
       |cov1 AS (SELECT sim.vec_id, sim.s AS cover FROM sim, p1
       |  WHERE sim.cid = p1.cid),
       |$rounds
       |$untied
       |ORDER BY round""".stripMargin
  }

  /** MMR list size and the λ split as exact integers: score =
    * MmrLamNum·rel − (10−MmrLamNum)·max-pairwise-sim (λ = 0.7 scaled
    * ×10 — no division, so scores and tie-breaks are integer-exact).
    */
  final val MmrK = 5
  final val MmrLamNum = 7L

  /** q318 — MMR diversified rerank (maximal marginal relevance,
    * Carbonell & Goldstein 1998): greedily re-rank each query's exact
    * top-[[TopK]] into an [[MmrK]]-item list trading relevance against
    * redundancy — score(d) = λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s) —
    * the standard answer to near-duplicate hits crowding a RAG
    * context window (and the retrieval-side dual of the corpus-side
    * SemDeDup q195).
    *
    * Scale design: the greedy is a PER-QUERY LOCAL computation over a
    * bounded ≤[[TopK]] candidate list, so it runs as ONE
    * `flatMapGroups` over the query key — embarrassingly parallel
    * across queries, no driver round-trips, no per-round shuffles (a
    * plan-unrolled formulation was measured at 5.5 s from round-join
    * overhead alone; this shape is sub-second). This is the
    * documented per-partition-imperative exception: the greedy is
    * genuinely sequential WITHIN a query and bounded by TopK² sims.
    * Determinism: candidate order is (sim desc, id), pairwise sims
    * micro-round through the same left-to-right dot fold + HALF_UP
    * the columnar path uses, ties break to the lower neighbor id —
    * the DuckDB oracle replays the identical unrolled rounds. The
    * exact top-k input is the memoized q26 run (the documented eval
    * denominator); a production retriever feeds the serving
    * candidates (q34/q312) through the same group stage unchanged.
    */
  def q318_mmr_rerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    val cands = Similarity.exactTopK(spark, dir)
      .join(emb.select($"vec_id".as("neighbor_id"), $"v", $"nrm"), "neighbor_id")
      .select($"q_id", $"neighbor_id", $"sim_micro", $"v", $"nrm")
      .as[(Long, Long, Long, Seq[Double], Double)]
    mmrGreedy(cands)
  }

  /** The shared per-query MMR greedy (q318's flatMapGroups core —
    * see that scaladoc for the scale rationale): candidates in,
    * (q_id, mmr_rank, neighbor_id, mmr_score) out. Candidate tuple =
    * (q_id, neighbor_id, sim_micro, vector, norm).
    */
  private def mmrGreedy(
      cands: org.apache.spark.sql.Dataset[(Long, Long, Long, Seq[Double], Double)])
      : DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    def halfUp(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    cands.groupByKey(_._1)
      .flatMapGroups { (q, it) =>
        val cs = it.toArray.sortBy(c => (-c._3, c._2))
        val n = cs.length
        // pairwise candidate sims, the same micro-rounded cosine the
        // columnar path computes (left-to-right dot fold)
        val ps = Array.tabulate(n, n) { (i, j) =>
          if (i == j) 0L
          else {
            val (a, b) = (cs(i)._4, cs(j)._4)
            var d = 0.0; var k = 0
            while (k < a.length) { d += a(k) * b(k); k += 1 }
            halfUp(d / (cs(i)._5 * cs(j)._5) * 1e6)
          }
        }
        val chosen = scala.collection.mutable.ArrayBuffer.empty[Int]
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        var r = 1
        while (r <= MmrK && chosen.length < n) {
          var best = -1; var bestScore = Long.MinValue
          var i = 0
          while (i < n) {
            if (!chosen.contains(i)) {
              val pen = if (chosen.isEmpty) 0L
                else chosen.map(c => ps(i)(c)).max
              val score = MmrLamNum * cs(i)._3 -
                (if (chosen.isEmpty) 0L else (10L - MmrLamNum) * pen)
              // ties to the lower neighbor id (cs is id-sorted within
              // equal sims, scan order preserves it via strict >);
              // best < 0 initializes the argmax from the first unchosen
              // candidate — no Long.MinValue sentinel equality to rely on
              if (best < 0 || score > bestScore ||
                  (score == bestScore && cs(i)._2 < cs(best)._2)) {
                best = i; bestScore = score
              }
            }
            i += 1
          }
          out += ((q, r.toLong, cs(best)._2, bestScore))
          chosen += best
          r += 1
        }
        out.iterator
      }
      .toDF("q_id", "mmr_rank", "neighbor_id", "mmr_score")
      .orderBy($"q_id", $"mmr_rank")
  }

  /** q325 — two-stage serving rerank (retrieve-then-rerank, the
    * production RAG shape): stage 1 bounds the candidate set with the
    * stored-index IVF probe (q49's oracle-verified coarse quantizer →
    * multiprobe → exact cosine top-k), stage 2 diversifies it with
    * q318's MMR greedy — the full serving composition the q318
    * scaladoc promised ("a production retriever feeds the serving
    * candidates through the same group stage unchanged"). Differs
    * from the eval-side q318 exactly where serving differs from eval:
    * candidates come from the probed inverted lists (linear candidate
    * stream, |q|·probes·list-size), never the exact |q|×|corpus|
    * denominator. Both stages reuse the verified cores; the oracle
    * replays the q49 chain and the unrolled MMR rounds end-to-end.
    */
  def q325_twostage_rerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", norm($"v"))
    val cands = Similarity.q49_ivf_seeded(spark, dir)
      .join(emb.select($"vec_id".as("neighbor_id"), $"v", $"nrm"), "neighbor_id")
      .select($"q_id", $"neighbor_id", $"sim_micro", $"v", $"nrm")
      .as[(Long, Long, Long, Seq[Double], Double)]
    mmrGreedy(cands)
  }

  /** Bradley–Terry MM iteration count (fixed, unrolled in the oracle
    * exactly like the q34 Lloyd's replay). */
  final val BtIters = 5

  /** q320 — Bradley–Terry source-strength fit (Bradley & Terry 1952;
    * Hunter 2004's MM algorithm): turn pairwise quality preferences
    * into a per-source strength scale — the model behind reward-model
    * data curation and chatbot-arena-style rankings, and the
    * inferential step q260's raw preference PAIRS stop short of.
    * Comparisons are deterministic from the corpus: adjacent-id
    * cross-source document pairs judged by the shared quality score
    * (higher [[TextAnalysis.qualityBp]] wins; exact ties are dropped)
    * — one equi-join on doc_id+1, no window, no all-pairs.
    *
    * DENSE-ID CONTRACT: a duel exists only where BOTH doc_id i and
    * i+1 are present, so on a sparse-id corpus each id gap silently
    * removes its duel — never mispairs across the gap. The fit stays
    * valid (Bradley–Terry is consistent on any comparison subset;
    * fewer duels only widen the implicit error bars), and the harness
    * corpora are dense by construction. A gap-proof successor would
    * need a global id sort (single-partition window) — rejected at
    * 100 TB; spec pins the gapped-id behavior (PreferenceRankSpec).
    * The win
    * matrix is ≤|sources|² rows (bounded driver state, the codebook-
    * seed posture), and the MM fixed point runs [[BtIters]] rounds in
    * exact micro-integer arithmetic: per-pair denominator terms
    * round(1e12·n_ij/(π_i+π_j)) sum as longs (order-independent),
    * π′ = max(1, halfUp(wins·1e12/Σ)) — every step the DuckDB oracle
    * replays bit-for-bit with unrolled CTE iterations.
    */
  def q320_bradley_terry(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // cached: the self-join's two sides must not each re-run the
    // string-heavy quality pass (measured 4.5 s → ~2.5 s at sf1.0)
    val d = graft.Caches.tracked(load(spark, dir, "documents")
      .select($"doc_id", $"source", TextAnalysis.qualityBp($"text").as("q")))
    val duels = d.as("a").join(d.as("b"),
        col("b.doc_id") === col("a.doc_id") + 1L &&
          col("a.source") =!= col("b.source") &&
          col("a.q") =!= col("b.q"))
      .select(
        when(col("a.q") > col("b.q"), col("a.source"))
          .otherwise(col("b.source")).as("winner"),
        when(col("a.q") > col("b.q"), col("b.source"))
          .otherwise(col("a.source")).as("loser"))
      .groupBy($"winner", $"loser").agg(count(lit(1)).as("w"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap // bounded: ≤ |sources|² cells
    val sources = duels.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
    val wins = sources.map(s =>
      s -> duels.collect { case ((w, _), n) if w == s => n }.sum).toMap
    val games = sources.map(i => i -> sources.map(j =>
      j -> (duels.getOrElse((i, j), 0L) + duels.getOrElse((j, i), 0L))).toMap).toMap
    def halfUp(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    var pi = sources.map(_ -> 1000000L).toMap
    for (_ <- 1 to BtIters) {
      pi = sources.map { i =>
        val den = sources.filter(j => j != i && games(i)(j) > 0L)
          .map(j => halfUp(1e12 * games(i)(j) / (pi(i) + pi(j)))).sum
        i -> (if (den == 0L) pi(i)
              else math.max(1L, halfUp(wins(i).toDouble * 1e12 / den)))
      }.toMap
    }
    val rows = sources.map { s =>
      (s, games(s).values.sum, wins(s), pi(s))
    }
    rows.toDF("source", "games", "wins", "pi_micro")
      .withColumn("bt_rank", row_number().over(
        Window.orderBy($"pi_micro".desc, $"source")).cast("long"))
      .orderBy($"source")
  }

  /** q314 — inter-rater agreement (Cohen's kappa, 1960): the labeled-
    * data QA gate that tells you whether two annotation sources agree
    * beyond chance before you train on their labels. Raters here are
    * two deterministic heuristic judges every curation stack already
    * has — a length-bucket rater and a lexical-diversity (type-token
    * ratio) rater over `documents` — so the machinery is exercised
    * end-to-end without external annotations; production swaps in real
    * annotator columns. All agreement math is INTEGER-exact until the
    * final basis-point divisions: the TTR buckets compare
    * distinct·100 < tokens·threshold (cross-multiplied, no ratio
    * doubles), the confusion matrix is one partial+final count
    * aggregate on the (ra, rb) key — 9 cells regardless of corpus
    * size — and po/pe/kappa are exact-integer cross products of the
    * bounded marginals (kappa_bp = 10000·(N·Σdiag − Σrₖcₖ)/(N² −
    * Σrₖcₖ)). One scan, one 9-cell shuffle; scale cost is the scan.
    * Undefined ratios (empty corpus, pe = 1) emit NULL, never throw.
    */
  def q314_rater_agreement(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rated = load(spark, dir, "documents").select(
      when($"n_chars" < 250, 0L).when($"n_chars" < 380, 1L).otherwise(2L)
        .as("ra"),
      when(size(array_distinct(split($"text", " "))) * 100L >=
            size(split($"text", " ")) * 52L, 0L)
        .when(size(array_distinct(split($"text", " "))) * 100L >=
            size(split($"text", " ")) * 40L, 1L)
        .otherwise(2L).as("rb"))
    val conf = rated.groupBy($"ra", $"rb").agg(count(lit(1)).as("n"))
    val spine = spark.range(3).select($"id".as("cls"))
    val perClass = spine
      .join(conf.groupBy($"ra".as("cls")).agg(sum($"n").as("n_a")),
        Seq("cls"), "left")
      .join(conf.groupBy($"rb".as("cls")).agg(sum($"n").as("n_b")),
        Seq("cls"), "left")
      .join(conf.filter($"ra" === $"rb")
        .select($"ra".as("cls"), $"n".as("n_diag")), Seq("cls"), "left")
      .select($"cls", coalesce($"n_a", lit(0L)).as("n_a"),
        coalesce($"n_b", lit(0L)).as("n_b"),
        coalesce($"n_diag", lit(0L)).as("n_diag"))
    val tot = perClass.agg(sum($"n_a").as("n"), sum($"n_diag").as("sum_diag"),
      sum($"n_a" * $"n_b").as("sum_rc"))
    perClass.crossJoin(broadcast(tot))
      .select($"cls", $"n_a", $"n_b", $"n_diag",
        when($"n" > 0,
          round(lit(10000.0) * $"sum_diag" / $"n").cast("long")).as("po_bp"),
        when($"n" > 0,
          round(lit(10000.0) * $"sum_rc" / ($"n" * $"n")).cast("long"))
          .as("pe_bp"),
        when($"n" * $"n" - $"sum_rc" =!= 0L,
          round(lit(10000.0) * ($"n" * $"sum_diag" - $"sum_rc") /
            ($"n" * $"n" - $"sum_rc")).cast("long")).as("kappa_bp"))
      .orderBy($"cls")
  }

  /** q326 — expected calibration error (ECE, Naeini et al. 2015;
    * Guo et al. 2017): the reliability-diagram audit for a score used
    * as a PROBABILITY — does "quality 0.83" mean an 83% chance of
    * passing the gate? Complements q314 (do raters agree) and q164
    * (threshold metrics) with the calibration question reward-model
    * and filter-score pipelines act on. Confidence = the q21 quality
    * score read as a probability (bp), outcome = the shared quality
    * gate; 10 equal-width bins, per-bin confidence vs accuracy, and
    * ECE = Σ (n_b/N)·|conf_b − acc_b| computed from the micro-rounded
    * per-bin values (exact integer weights, one closing division) so
    * both engines agree bit-for-bit. One scan to a ≤10-row table;
    * empty corpora emit zero rows, never throw.
    */
  def q326_calibration_ece(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = load(spark, dir, "documents")
      .select(TextAnalysis.qualityBp($"text").as("p"),
        TextAnalysis.qualityGatePass($"n_chars", $"text").as("y"))
    // cached: the ≤10-row bin table feeds both the ECE total and the
    // final readout — never re-run the string-heavy scan twice
    val bins = graft.Caches.tracked(
      d.groupBy(least(expr("p div 1000"), lit(9L)).as("bin"))
        .agg(count(lit(1)).as("n"), sum($"p").as("sp"), sum($"y").as("sy"))
        .select($"bin", $"n",
          round($"sp".cast("double") / $"n").cast("long").as("conf_bp"),
          round(lit(10000.0) * $"sy" / $"n").cast("long").as("acc_bp"))
        .withColumn("gap_bp", abs($"conf_bp" - $"acc_bp")))
    val tot = bins.agg(sum($"n").as("nn"), sum($"n" * $"gap_bp").as("w"))
      .select(round($"w".cast("double") / $"nn").cast("long").as("ece_bp"))
    bins.crossJoin(broadcast(tot)).orderBy($"bin")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q318_mmr_rerank" -> q318_mmr_rerank,
    "q325_twostage_rerank" -> q325_twostage_rerank,
    "q320_bradley_terry" -> q320_bradley_terry,
    "q314_rater_agreement" -> q314_rater_agreement,
    "q326_calibration_ece" -> q326_calibration_ece,
    "q316_facility_location" -> q316_facility_location,
    "q311_semihard_negatives" -> q311_semihard_negatives,
    "q307_knn_reciprocity" -> q307_knn_reciprocity,
    "q327_davies_bouldin" -> q327_davies_bouldin,
    "q332_adjusted_rand" -> q332_adjusted_rand,
    "q333_simplified_silhouette" -> q333_simplified_silhouette,
    "q296_geometric_median" -> q296_geometric_median,
    "q298_label_noise" -> q298_label_noise,
    "q300_maxsim_retrieval" -> q300_maxsim_retrieval,
    "q312_ann_maxsim" -> q312_ann_maxsim,
    "q302_residual_quantization" -> q302_residual_quantization,
    "q288_knn_shapley" -> q288_knn_shapley,
    "q289_kcenter_coreset" -> q289_kcenter_coreset,
    "q290_ivf_append_drift" -> q290_ivf_append_drift,
    "q292_retrieval_metrics" -> q292_retrieval_metrics,
    "q293_matryoshka_recall" -> q293_matryoshka_recall)

  private val ESql =
    "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings)"

  private def kcenterSql: String = {
    def dist(dAlias: String, cAlias: String) =
      s"""CAST(ROUND((list_inner_product($dAlias.v, $dAlias.v)
         |  - 2.0 * list_inner_product($dAlias.v, $cAlias.cv)
         |  + list_inner_product($cAlias.cv, $cAlias.cv)) * 1e6) AS BIGINT)""".stripMargin
    val rounds = (2 to KCenters).map { r =>
      s"""f${r - 1} AS (SELECT vec_id, dmin FROM d${r - 1}
         |  ORDER BY dmin DESC, vec_id LIMIT 1),
         |c$r AS (SELECT e.vec_id AS cid, e.v AS cv FROM e, f${r - 1}
         |  WHERE e.vec_id = f${r - 1}.vec_id),
         |d$r AS (SELECT d.vec_id, d.v,
         |    LEAST(d.dmin, ${dist("d", "c")}) AS dmin
         |  FROM d${r - 1} d, c$r c)""".stripMargin
    }.mkString(",\n")
    val rows = (1 to KCenters).map { r =>
      val cid = if (r == 1) "(SELECT cid FROM c1)" else s"(SELECT cid FROM c$r)"
      s"""SELECT CAST($r AS BIGINT) AS round, CAST($cid AS BIGINT) AS center_id,
         |  (SELECT dmin FROM f$r) AS coverage_micro""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $ESql,
       |c1 AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 1),
       |d1 AS (SELECT e.vec_id, e.v, ${dist("e", "c")} AS dmin FROM e, c1 c),
       |$rounds,
       |f$KCenters AS (SELECT vec_id, dmin FROM d$KCenters
       |  ORDER BY dmin DESC, vec_id LIMIT 1)
       |$rows
       |ORDER BY round""".stripMargin
  }

  private def matryoshkaSql: String = {
    val blocks = MatryoshkaDims.map { d =>
      s"""SELECT CAST($d AS BIGINT) AS dim, n_queries, sum_overlap,
         |  CAST(ROUND(1e6 * sum_overlap / (10 * n_queries)) AS BIGINT)
         |    AS mean_recall_micro
         |FROM (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
         |    CAST(SUM(ovl) AS BIGINT) AS sum_overlap
         |  FROM (
         |    SELECT t.q_id, SUM(CASE WHEN ex.neighbor_id IS NOT NULL
         |                            THEN 1 ELSE 0 END) AS ovl
         |    FROM (
         |      SELECT q_id, neighbor_id FROM (
         |        SELECT q.q_id, s.vec_id AS neighbor_id,
         |          ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
         |            CAST(ROUND(list_inner_product(q.qv, s.vd)
         |              / GREATEST(q.qnrm * s.nrm, 1e-12) * 1e6)
         |              AS BIGINT) DESC, s.vec_id) AS rank
         |        FROM qd$d q JOIN sd$d s ON s.vec_id <> q.q_id)
         |      WHERE rank <= 10) t
         |    LEFT JOIN ex ON ex.q_id = t.q_id AND ex.neighbor_id = t.neighbor_id
         |    GROUP BY t.q_id))""".stripMargin
    }.mkString("\nUNION ALL\n")
    // mirrored norm-product floor: per-dim sliced corpora with explicit
    // dot/norms so the GREATEST(qnrm*nrm, 1e-12) guard matches Spark
    val dimCtes = MatryoshkaDims.map { d =>
      s"""sd$d AS (SELECT vec_id, list_slice(v, 1, $d) AS vd,
         |    SQRT(list_inner_product(list_slice(v, 1, $d),
         |      list_slice(v, 1, $d))) AS nrm FROM e),
         |qd$d AS (SELECT vec_id AS q_id, vd AS qv, nrm AS qnrm
         |  FROM sd$d WHERE vec_id % 50 = 0)""".stripMargin
    }.mkString(",\n")
    s"""WITH $ESql,
       |$dimCtes,
       |qq AS (SELECT vec_id AS q_id, v FROM e WHERE vec_id % 50 = 0),
       |ex AS (SELECT q_id, neighbor_id FROM (
       |    SELECT q.q_id, e.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
       |        CAST(ROUND(list_cosine_similarity(q.v, e.v) * 1e6) AS BIGINT)
       |        DESC, e.vec_id) AS rank
       |    FROM qq q JOIN e ON e.vec_id <> q.q_id)
       |  WHERE rank <= 10)
       |$blocks
       |ORDER BY dim""".stripMargin
  }

  private def geoMedianSql: String = {
    val iters = (1 to GeoMedianIters).map { k =>
      s"""w$k AS (SELECT e.label, e.vec_id,
         |    CAST(ROUND(1e9 / GREATEST(SQRT(CAST(
         |      SUM((e.xq - m.m) * (e.xq - m.m)) AS DOUBLE)), 1.0))
         |      AS BIGINT) AS wq
         |  FROM exg e JOIN m${k - 1} m ON m.label = e.label AND m.i = e.i
         |  GROUP BY 1, 2),
         |m$k AS (SELECT e.label, e.i,
         |    CAST(ROUND(CAST(SUM(CAST(e.xq AS DECIMAL(38,0)) * w.wq)
         |      AS DOUBLE) / SUM(w.wq)) AS BIGINT) AS m
         |  FROM exg e JOIN w$k w ON w.label = e.label AND w.vec_id = e.vec_id
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH exg AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    g.i - 1 AS i, CAST(ROUND(1e6 * embedding[g.i]) AS BIGINT) AS xq
       |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g),
       |m0 AS (SELECT label, i,
       |    CAST(ROUND(CAST(SUM(xq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
       |  FROM exg GROUP BY 1, 2),
       |$iters
       |SELECT m0.label, CAST(m0.i AS BIGINT) AS i, m0.m AS mean_e6,
       |  mf.m AS gm_e6
       |FROM m0 JOIN m$GeoMedianIters mf
       |  ON mf.label = m0.label AND mf.i = m0.i
       |ORDER BY 1, 2""".stripMargin
  }

  /** Oracle for q318: the exact top-k and the candidate-pair sim table
    * materialize once; each MMR round is one penalty aggregate + one
    * ranked selection, unrolled exactly like the engine's loop.
    */
  private def mmrSql: String = mmrRoundsSql(
    s"""q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 50 = 0),
       |sq AS (SELECT q.q_id, e.vec_id AS neighbor_id,
       |    CAST(ROUND(list_cosine_similarity(q.qv, e.v) * 1e6) AS BIGINT) AS sim_micro
       |  FROM q JOIN e ON e.vec_id <> q.q_id),
       |tk AS MATERIALIZED (SELECT q_id, neighbor_id, sim_micro FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY sim_micro DESC, neighbor_id) AS rk FROM sq) WHERE rk <= $TopK)"""
      .stripMargin)

  /** Oracle for q325: the q49 seeded-IVF probe chain supplies the
    * candidate top-k; the MMR rounds replay unchanged on top.
    */
  private def twoStageSql: String = mmrRoundsSql(
    s"""s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e
       |      WHERE vec_id < ${Similarity.IvfKSql}),
       |ad AS (SELECT e.vec_id, e.v, s.cid,
       |    CAST(ROUND((list_inner_product(e.v, e.v)
       |      - 2.0 * list_inner_product(e.v, s.cv)
       |      + list_inner_product(s.cv, s.cv)) * 1e6) AS BIGINT) AS dmicro
       |  FROM e CROSS JOIN s),
       |asg AS (SELECT vec_id, v, cid AS centroid FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY dmicro, cid) AS rn FROM ad) WHERE rn = 1),
       |qp AS (SELECT vec_id AS q_id, v AS qv, cid AS probe FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY dmicro, cid) AS crank
       |    FROM ad WHERE vec_id % 50 = 0) WHERE crank <= ${Similarity.IvfProbes}),
       |cand AS (SELECT qp.q_id, a.vec_id AS neighbor_id,
       |    CAST(ROUND(list_cosine_similarity(qp.qv, a.v) * 1e6) AS BIGINT) AS sim_micro
       |  FROM asg a JOIN qp ON a.centroid = qp.probe AND a.vec_id <> qp.q_id),
       |tk AS MATERIALIZED (SELECT q_id, neighbor_id, sim_micro FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY sim_micro DESC, neighbor_id) AS rk FROM cand) WHERE rk <= $TopK)"""
      .stripMargin)

  /** Shared MMR-round unroll: `tkCtes` must define a CTE `tk`
    * (q_id, neighbor_id, sim_micro) over the embeddings CTE `e`.
    */
  private def mmrRoundsSql(tkCtes: String): String = {
    val lam = MmrLamNum
    val rounds = (2 to MmrK).map { r =>
      s"""pen$r AS (SELECT p.q_id, p.a, MAX(p.ps) AS pen
         |  FROM ps p JOIN all${r - 1} s ON s.q_id = p.q_id AND s.neighbor_id = p.b
         |  GROUP BY 1, 2),
         |sc$r AS (SELECT t.q_id, t.neighbor_id,
         |    $lam * t.sim_micro - ${10 - lam} * pen.pen AS score
         |  FROM tk t JOIN pen$r pen ON pen.q_id = t.q_id AND pen.a = t.neighbor_id
         |  WHERE NOT EXISTS (SELECT 1 FROM all${r - 1} s
         |    WHERE s.q_id = t.q_id AND s.neighbor_id = t.neighbor_id)),
         |sel$r AS (SELECT q_id, neighbor_id, score AS mmr_score,
         |    CAST($r AS BIGINT) AS mmr_rank FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY score DESC, neighbor_id) AS rn FROM sc$r) WHERE rn = 1),
         |all$r AS (SELECT * FROM all${r - 1} UNION ALL SELECT * FROM sel$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $ESql,
       |$tkCtes,
       |ps AS MATERIALIZED (SELECT t1.q_id, t1.neighbor_id AS a, t2.neighbor_id AS b,
       |    CAST(ROUND(list_cosine_similarity(e1.v, e2.v) * 1e6) AS BIGINT) AS ps
       |  FROM tk t1 JOIN tk t2 ON t1.q_id = t2.q_id
       |    AND t1.neighbor_id <> t2.neighbor_id
       |  JOIN e e1 ON e1.vec_id = t1.neighbor_id
       |  JOIN e e2 ON e2.vec_id = t2.neighbor_id),
       |sel1 AS (SELECT q_id, neighbor_id, $lam * sim_micro AS mmr_score,
       |    CAST(1 AS BIGINT) AS mmr_rank FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY sim_micro DESC, neighbor_id) AS rn FROM tk) WHERE rn = 1),
       |all1 AS (SELECT * FROM sel1),
       |$rounds
       |SELECT q_id, mmr_rank, neighbor_id, mmr_score FROM all$MmrK
       |ORDER BY q_id, mmr_rank""".stripMargin
  }

  /** Oracle for q320: the duel derivation (adjacent-id cross-source
    * pairs under the shared quality score) and BtIters unrolled MM
    * iterations in the engine's exact micro-integer arithmetic.
    */
  private def btSql: String = {
    val iters = (1 to BtIters).map { t =>
      s"""d$t AS (SELECT s.source,
         |    CAST(SUM(CAST(ROUND(1e12 * g.n / (pa.pi + pb.pi)) AS BIGINT)) AS BIGINT) AS den
         |  FROM srcs s JOIN g ON g.i = s.source
         |  JOIN p${t - 1} pa ON pa.source = g.i
         |  JOIN p${t - 1} pb ON pb.source = g.j
         |  WHERE g.n > 0 GROUP BY 1),
         |p$t AS MATERIALIZED (SELECT s.source,
         |    CASE WHEN d.den IS NULL OR d.den = 0 THEN pp.pi
         |         ELSE GREATEST(1, CAST(ROUND(w.wins * 1e12 / d.den) AS BIGINT))
         |    END AS pi
         |  FROM srcs s JOIN p${t - 1} pp ON pp.source = s.source
         |  JOIN wn w ON w.source = s.source
         |  LEFT JOIN d$t d ON d.source = s.source)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (SELECT doc_id, source, ${TextAnalysis.QualityBpSql} AS q
       |  FROM documents),
       |duel AS (SELECT
       |    CASE WHEN a.q > b.q THEN a.source ELSE b.source END AS winner,
       |    CASE WHEN a.q > b.q THEN b.source ELSE a.source END AS loser
       |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
       |    AND a.source <> b.source AND a.q <> b.q),
       |wm AS MATERIALIZED (SELECT winner, loser, CAST(COUNT(*) AS BIGINT) AS w
       |  FROM duel GROUP BY 1, 2),
       |srcs AS MATERIALIZED (SELECT DISTINCT source FROM (
       |    SELECT winner AS source FROM wm UNION SELECT loser FROM wm)),
       |g AS MATERIALIZED (SELECT i.source AS i, j.source AS j,
       |    COALESCE(ij.w, 0) + COALESCE(ji.w, 0) AS n
       |  FROM srcs i JOIN srcs j ON i.source <> j.source
       |  LEFT JOIN wm ij ON ij.winner = i.source AND ij.loser = j.source
       |  LEFT JOIN wm ji ON ji.winner = j.source AND ji.loser = i.source),
       |wn AS MATERIALIZED (SELECT s.source, CAST(COALESCE(SUM(wm.w), 0) AS BIGINT) AS wins
       |  FROM srcs s LEFT JOIN wm ON wm.winner = s.source GROUP BY 1),
       |gt AS (SELECT i AS source, CAST(SUM(n) AS BIGINT) AS games
       |  FROM g GROUP BY 1),
       |p0 AS (SELECT source, CAST(1000000 AS BIGINT) AS pi FROM srcs),
       |$iters
       |SELECT s.source, gt.games, wn.wins, pf.pi AS pi_micro,
       |  CAST(ROW_NUMBER() OVER (ORDER BY pf.pi DESC, s.source) AS BIGINT)
       |    AS bt_rank
       |FROM srcs s JOIN gt ON gt.source = s.source
       |  JOIN wn ON wn.source = s.source
       |  JOIN p$BtIters pf ON pf.source = s.source
       |ORDER BY s.source""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q318_mmr_rerank" -> mmrSql,
    "q325_twostage_rerank" -> twoStageSql,
    "q320_bradley_terry" -> btSql,
    "q316_facility_location" -> facilitySql,
    "q326_calibration_ece" ->
      s"""WITH d AS (SELECT ${TextAnalysis.QualityBpSql} AS p,
        |    ${TextAnalysis.QualityGateSql} AS y FROM documents),
        |b AS (SELECT CAST(LEAST(p // 1000, 9) AS BIGINT) AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(p) AS BIGINT) AS sp,
        |    CAST(SUM(y) AS BIGINT) AS sy FROM d GROUP BY 1),
        |g AS (SELECT bin, n,
        |    CAST(ROUND(CAST(sp AS DOUBLE) / n) AS BIGINT) AS conf_bp,
        |    CAST(ROUND(10000.0 * sy / n) AS BIGINT) AS acc_bp FROM b),
        |g2 AS (SELECT *, ABS(conf_bp - acc_bp) AS gap_bp FROM g),
        |t AS (SELECT CAST(ROUND(CAST(SUM(n * gap_bp) AS DOUBLE) / SUM(n))
        |    AS BIGINT) AS ece_bp FROM g2)
        |SELECT bin, n, conf_bp, acc_bp, gap_bp, ece_bp
        |FROM g2, t ORDER BY bin""".stripMargin,
    "q314_rater_agreement" ->
      """WITH r AS (SELECT
        |    CASE WHEN n_chars < 250 THEN CAST(0 AS BIGINT)
        |         WHEN n_chars < 380 THEN 1 ELSE 2 END AS ra,
        |    CASE WHEN len(list_distinct(string_split(text,' ')))*100
        |              >= len(string_split(text,' '))*52 THEN CAST(0 AS BIGINT)
        |         WHEN len(list_distinct(string_split(text,' ')))*100
        |              >= len(string_split(text,' '))*40 THEN 1
        |         ELSE 2 END AS rb
        |  FROM documents),
        |conf AS (SELECT ra, rb, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM r GROUP BY 1, 2),
        |spine AS (SELECT unnest(generate_series(0, 2)) AS cls),
        |pc AS (SELECT s.cls,
        |    CAST(COALESCE((SELECT SUM(n) FROM conf WHERE ra = s.cls), 0) AS BIGINT) AS n_a,
        |    CAST(COALESCE((SELECT SUM(n) FROM conf WHERE rb = s.cls), 0) AS BIGINT) AS n_b,
        |    CAST(COALESCE((SELECT SUM(n) FROM conf WHERE ra = s.cls AND rb = s.cls), 0) AS BIGINT) AS n_diag
        |  FROM spine s),
        |tot AS (SELECT CAST(SUM(n_a) AS BIGINT) AS n,
        |    CAST(SUM(n_diag) AS BIGINT) AS sum_diag,
        |    CAST(SUM(n_a * n_b) AS BIGINT) AS sum_rc FROM pc)
        |SELECT cls, n_a, n_b, n_diag,
        |  CASE WHEN n > 0
        |    THEN CAST(ROUND(10000.0 * sum_diag / n) AS BIGINT) END AS po_bp,
        |  CASE WHEN n > 0
        |    THEN CAST(ROUND(10000.0 * sum_rc / (n * n)) AS BIGINT) END AS pe_bp,
        |  CASE WHEN n * n - sum_rc <> 0
        |    THEN CAST(ROUND(10000.0 * (n * sum_diag - sum_rc) /
        |         (n * n - sum_rc)) AS BIGINT) END AS kappa_bp
        |FROM pc, tot ORDER BY cls""".stripMargin,
    "q298_label_noise" ->
      s"""WITH $ESql,
        |s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e
        |      WHERE vec_id < ${Similarity.IvfKSql}),
        |ad AS (SELECT e.vec_id, e.v, e.label, s.cid,
        |    CAST(ROUND((list_inner_product(e.v, e.v)
        |      - 2.0 * list_inner_product(e.v, s.cv)
        |      + list_inner_product(s.cv, s.cv)) * 1e6) AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN s),
        |asg AS (SELECT vec_id, v, CAST(label AS BIGINT) AS label,
        |      cid AS centroid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY dmicro, cid) AS rn FROM ad) WHERE rn = 1),
        |p AS (SELECT x.vec_id, x.label, y.vec_id AS nb, y.label AS nb_label,
        |    CAST(ROUND(list_cosine_similarity(x.v, y.v) * 1e6) AS BIGINT)
        |      AS sim_micro
        |  FROM asg x JOIN asg y ON x.centroid = y.centroid
        |    AND x.vec_id <> y.vec_id),
        |top AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (
        |      PARTITION BY vec_id ORDER BY sim_micro DESC, nb) AS rk
        |    FROM p) WHERE rk <= $NoiseK),
        |bl AS (SELECT vec_id, label, nb_label, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM top GROUP BY 1, 2, 3),
        |mod AS (SELECT vec_id, CAST(nb_label AS BIGINT) AS modal_label FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY c DESC, nb_label) AS r FROM bl) WHERE r = 1),
        |agg AS (SELECT vec_id, label, CAST(SUM(c) AS BIGINT) AS n_nb,
        |    CAST(SUM(CASE WHEN nb_label <> label THEN c ELSE 0 END)
        |      AS BIGINT) AS n_diff
        |  FROM bl GROUP BY 1, 2)
        |SELECT agg.vec_id, agg.label, agg.n_nb, agg.n_diff, mod.modal_label
        |FROM agg JOIN mod ON mod.vec_id = agg.vec_id
        |WHERE n_diff * 2 > n_nb ORDER BY agg.vec_id""".stripMargin,
    "q300_maxsim_retrieval" ->
      s"""WITH $ESql,
        |sub AS (SELECT vec_id, CAST(m.m AS BIGINT) AS dm,
        |    list_slice(v, m.m * 8 + 1, m.m * 8 + 8) AS dv
        |  FROM e, (SELECT unnest(generate_series(0, ${MaxSimSubs - 1})) AS m) m),
        |sn AS (SELECT vec_id, dm, dv,
        |    SQRT(list_inner_product(dv, dv)) AS dn FROM sub),
        |q AS (SELECT vec_id AS q_id, dm AS qm, dv AS qv, dn AS qn
        |      FROM sn WHERE vec_id % 50 = 0),
        |cell AS (SELECT q.q_id, q.qm, s.vec_id AS neighbor_id,
        |    CAST(ROUND(list_inner_product(q.qv, s.dv)
        |      / GREATEST(q.qn * s.dn, 1e-12) * 1e6) AS BIGINT) AS c
        |  FROM sn s JOIN q ON s.vec_id <> q.q_id),
        |mx AS (SELECT q_id, neighbor_id, qm, MAX(c) AS mx
        |  FROM cell GROUP BY 1, 2, 3),
        |sc AS (SELECT q_id, neighbor_id, CAST(SUM(mx) AS BIGINT)
        |      AS maxsim_micro
        |  FROM mx GROUP BY 1, 2),
        |r AS (SELECT q_id, neighbor_id, maxsim_micro,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY maxsim_micro DESC, neighbor_id) AS rank FROM sc)
        |SELECT q_id, rank, neighbor_id, maxsim_micro FROM r
        |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin,
    "q312_ann_maxsim" ->
      s"""WITH $ESql,
        |s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e
        |      WHERE vec_id < ${Similarity.IvfKSql}),
        |ad AS (SELECT e.vec_id, e.v, s.cid,
        |    CAST(ROUND((list_inner_product(e.v, e.v)
        |      - 2.0 * list_inner_product(e.v, s.cv)
        |      + list_inner_product(s.cv, s.cv)) * 1e6) AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN s),
        |asg AS (SELECT vec_id, v, cid AS centroid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY dmicro, cid) AS rn FROM ad) WHERE rn = 1),
        |qp AS (SELECT vec_id AS q_id, cid AS probe FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY dmicro, cid) AS crank
        |    FROM ad WHERE vec_id % 50 = 0) WHERE crank <= ${Similarity.IvfProbes}),
        |dsub AS (SELECT a.vec_id, a.centroid, CAST(m.m AS BIGINT) AS dm,
        |    list_slice(a.v, m.m * 8 + 1, m.m * 8 + 8) AS dv
        |  FROM asg a, (SELECT unnest(generate_series(0, ${MaxSimSubs - 1})) AS m) m),
        |dn AS (SELECT vec_id, centroid, dm, dv,
        |    SQRT(list_inner_product(dv, dv)) AS dn FROM dsub),
        |qsub AS (SELECT e.vec_id AS q_id, CAST(m.m AS BIGINT) AS qm,
        |    list_slice(e.v, m.m * 8 + 1, m.m * 8 + 8) AS qv
        |  FROM e, (SELECT unnest(generate_series(0, ${MaxSimSubs - 1})) AS m) m
        |  WHERE e.vec_id % 50 = 0),
        |qn AS (SELECT q_id, qm, qv,
        |    SQRT(list_inner_product(qv, qv)) AS qn FROM qsub),
        |cell AS (SELECT q.q_id, q.qm, d.vec_id AS neighbor_id,
        |    CAST(ROUND(list_inner_product(q.qv, d.dv)
        |      / GREATEST(q.qn * d.dn, 1e-12) * 1e6) AS BIGINT) AS c
        |  FROM dn d
        |  JOIN qp ON d.centroid = qp.probe
        |  JOIN qn q ON q.q_id = qp.q_id AND d.vec_id <> q.q_id),
        |mx AS (SELECT q_id, neighbor_id, qm, MAX(c) AS mx
        |  FROM cell GROUP BY 1, 2, 3),
        |sc AS (SELECT q_id, neighbor_id, CAST(SUM(mx) AS BIGINT)
        |      AS maxsim_micro
        |  FROM mx GROUP BY 1, 2),
        |r AS (SELECT q_id, neighbor_id, maxsim_micro,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY maxsim_micro DESC, neighbor_id) AS rank FROM sc)
        |SELECT q_id, rank, neighbor_id, maxsim_micro FROM r
        |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin,
    "q311_semihard_negatives" ->
      s"""WITH $ESql,
        |q AS (SELECT vec_id AS q_id, v AS qv, label AS q_label FROM e
        |      WHERE vec_id % 50 = 0),
        |s AS (SELECT q.q_id, q.q_label, e.label AS n_label,
        |        e.vec_id AS neighbor_id,
        |        CAST(ROUND(list_cosine_similarity(q.qv, e.v) * 1e6) AS BIGINT)
        |          AS sim_micro
        |      FROM q JOIN e ON e.vec_id <> q.q_id),
        |pos AS (SELECT q_id, CAST(q_label AS BIGINT) AS q_label,
        |    neighbor_id AS pos_id, sim_micro AS pos_sim_micro FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY sim_micro DESC, neighbor_id) AS rn
        |    FROM s WHERE n_label = q_label) WHERE rn = 1),
        |shn AS (SELECT q_id, neighbor_id AS semihard_id,
        |    sim_micro AS semihard_sim_micro FROM (
        |    SELECT s.*, ROW_NUMBER() OVER (PARTITION BY s.q_id
        |      ORDER BY s.sim_micro DESC, s.neighbor_id) AS rn
        |    FROM s JOIN pos ON pos.q_id = s.q_id
        |    WHERE s.n_label <> s.q_label
        |      AND s.sim_micro < pos.pos_sim_micro) WHERE rn = 1)
        |SELECT pos.q_id, pos.q_label, pos.pos_id, pos.pos_sim_micro,
        |  shn.semihard_id, shn.semihard_sim_micro,
        |  pos.pos_sim_micro - shn.semihard_sim_micro AS margin_micro
        |FROM pos LEFT JOIN shn ON shn.q_id = pos.q_id
        |ORDER BY pos.q_id""".stripMargin,
    "q327_davies_bouldin" ->
      s"""WITH $ESql,
        |s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e
        |      WHERE vec_id < ${Similarity.IvfKSql}),
        |ad AS (SELECT e.vec_id, e.v, s.cid,
        |    CAST(ROUND((list_inner_product(e.v, e.v)
        |      - 2.0 * list_inner_product(e.v, s.cv)
        |      + list_inner_product(s.cv, s.cv)) * 1e6) AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN s),
        |asg AS (SELECT vec_id, v, cid AS centroid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY dmicro, cid) AS rn FROM ad) WHERE rn = 1),
        |sc AS (SELECT a.centroid, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(ROUND(CAST(SUM(CAST(ROUND(SQRT(GREATEST(
        |      list_inner_product(a.v, a.v)
        |      - 2.0 * list_inner_product(a.v, s.cv)
        |      + list_inner_product(s.cv, s.cv), 0.0)) * 1e6) AS BIGINT))
        |      AS DOUBLE) / COUNT(*)) AS BIGINT) AS s_micro
        |  FROM asg a JOIN s ON s.cid = a.centroid GROUP BY 1),
        |m AS (SELECT s1.cid AS i, s2.cid AS j,
        |    CAST(ROUND(SQRT(GREATEST(list_inner_product(s1.cv, s1.cv)
        |      - 2.0 * list_inner_product(s1.cv, s2.cv)
        |      + list_inner_product(s2.cv, s2.cv), 0.0)) * 1e6) AS BIGINT)
        |      AS m_micro
        |  FROM s s1 JOIN s s2 ON s1.cid <> s2.cid),
        |db AS (SELECT sc1.centroid AS cid,
        |    MAX(CAST(ROUND(1e6 * (sc1.s_micro + sc2.s_micro)
        |      / GREATEST(m.m_micro, 1)) AS BIGINT)) AS db_micro
        |  FROM sc sc1 JOIN m ON m.i = sc1.centroid
        |  JOIN sc sc2 ON sc2.centroid = m.j GROUP BY 1)
        |SELECT CAST(sc.centroid AS BIGINT) AS cid, sc.n, sc.s_micro,
        |  db.db_micro
        |FROM sc LEFT JOIN db ON db.cid = sc.centroid
        |ORDER BY cid""".stripMargin,
    "q332_adjusted_rand" ->
      s"""WITH $ESql,
        |s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e
        |      WHERE vec_id < ${Similarity.IvfKSql}),
        |ad AS (SELECT e.vec_id, s.cid,
        |    CAST(ROUND((list_inner_product(e.v, e.v)
        |      - 2.0 * list_inner_product(e.v, s.cv)
        |      + list_inner_product(s.cv, s.cv)) * 1e6) AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN s),
        |asg AS (SELECT vec_id, cid AS centroid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY dmicro, cid) AS rn FROM ad) WHERE rn = 1),
        |ct AS (SELECT a.centroid, e.label, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM asg a JOIN e ON e.vec_id = a.vec_id GROUP BY 1, 2),
        |core AS (SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS sij,
        |    CAST(COUNT(DISTINCT centroid) AS BIGINT) AS n_clusters,
        |    CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels,
        |    CAST(SUM(n) AS BIGINT) AS nn FROM ct),
        |aa AS (SELECT CAST(SUM(na * (na - 1) // 2) AS BIGINT) AS sa FROM
        |  (SELECT CAST(SUM(n) AS BIGINT) AS na FROM ct GROUP BY centroid)),
        |bb AS (SELECT CAST(SUM(nb * (nb - 1) // 2) AS BIGINT) AS sb FROM
        |  (SELECT CAST(SUM(n) AS BIGINT) AS nb FROM ct GROUP BY label)),
        |f AS (SELECT nn, n_clusters, n_labels, sij, sa, sb,
        |    2 * CAST(sij AS HUGEINT) * nn * (nn - 1)
        |      - 4 * CAST(sa AS HUGEINT) * sb AS num,
        |    (CAST(sa AS HUGEINT) + sb) * nn * (nn - 1)
        |      - 4 * CAST(sa AS HUGEINT) * sb AS den
        |  FROM core, aa, bb)
        |SELECT nn AS n, n_clusters, n_labels, sij, sa, sb,
        |  CASE WHEN den = 0 THEN NULL
        |    ELSE CAST(ROUND(1e6 * CAST(num AS DOUBLE)
        |      / CAST(den AS DOUBLE)) AS BIGINT)
        |  END AS ari_micro
        |FROM f""".stripMargin,
    "q333_simplified_silhouette" ->
      s"""WITH $ESql,
        |s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e
        |      WHERE vec_id < ${Similarity.IvfKSql}),
        |ad AS (SELECT e.vec_id, s.cid,
        |    CAST(ROUND((list_inner_product(e.v, e.v)
        |      - 2.0 * list_inner_product(e.v, s.cv)
        |      + list_inner_product(s.cv, s.cv)) * 1e6) AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN s),
        |r AS (SELECT vec_id, cid, dmicro, ROW_NUMBER() OVER (
        |    PARTITION BY vec_id ORDER BY dmicro, cid) AS rn FROM ad),
        |ab AS (SELECT r1.vec_id, r1.cid,
        |    CAST(ROUND(SQRT(GREATEST(CAST(r1.dmicro AS DOUBLE) / 1e6, 0.0))
        |      * 1e6) AS BIGINT) AS a_micro,
        |    CAST(ROUND(SQRT(GREATEST(CAST(r2.dmicro AS DOUBLE) / 1e6, 0.0))
        |      * 1e6) AS BIGINT) AS b_micro
        |  FROM r r1 LEFT JOIN r r2 ON r2.vec_id = r1.vec_id AND r2.rn = 2
        |  WHERE r1.rn = 1),
        |sm AS (SELECT cid, CAST(ROUND(
        |    1e6 * CAST(b_micro - a_micro AS DOUBLE)
        |    / CAST(GREATEST(GREATEST(a_micro, b_micro), 1) AS DOUBLE))
        |    AS BIGINT) AS s_micro FROM ab)
        |SELECT CAST(cid AS BIGINT) AS cid, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(CAST(SUM(s_micro) AS DOUBLE) / COUNT(*)) AS BIGINT)
        |    AS sil_micro
        |FROM sm GROUP BY 1 ORDER BY cid""".stripMargin,
    "q307_knn_reciprocity" ->
      s"""WITH $ESql,
        |s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e
        |      WHERE vec_id < ${Similarity.IvfKSql}),
        |ad AS (SELECT e.vec_id, e.v, s.cid,
        |    CAST(ROUND((list_inner_product(e.v, e.v)
        |      - 2.0 * list_inner_product(e.v, s.cv)
        |      + list_inner_product(s.cv, s.cv)) * 1e6) AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN s),
        |asg AS (SELECT vec_id, v, cid AS centroid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY dmicro, cid) AS rn FROM ad) WHERE rn = 1),
        |p AS (SELECT x.centroid AS cid, x.vec_id AS src, y.vec_id AS dst,
        |    CAST(ROUND(list_cosine_similarity(x.v, y.v) * 1e6) AS BIGINT)
        |      AS sim_micro
        |  FROM asg x JOIN asg y ON x.centroid = y.centroid
        |    AND x.vec_id <> y.vec_id),
        |edges AS MATERIALIZED (SELECT cid, src, dst FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY src
        |      ORDER BY sim_micro DESC, dst) AS rk FROM p) WHERE rk <= $NoiseK),
        |mu AS (SELECT e.cid, CAST(COUNT(*) AS BIGINT) AS n_mutual
        |  FROM edges e JOIN edges r ON e.src = r.dst AND e.dst = r.src
        |  GROUP BY 1),
        |base AS (SELECT cid, CAST(COUNT(DISTINCT src) AS BIGINT) AS n_nodes,
        |    CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges GROUP BY 1)
        |SELECT CAST(base.cid AS BIGINT) AS cid, n_nodes, n_edges,
        |  COALESCE(mu.n_mutual, 0) AS n_mutual,
        |  CAST(ROUND(1000.0 * COALESCE(mu.n_mutual, 0) / n_edges) AS BIGINT)
        |    AS reciprocity_milli
        |FROM base LEFT JOIN mu ON mu.cid = base.cid ORDER BY cid""".stripMargin,
    "q302_residual_quantization" ->
      s"""WITH $ESql,
        |s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e
        |      WHERE vec_id < ${Similarity.IvfKSql}),
        |ad AS (SELECT e.vec_id, e.v, s.cid,
        |    CAST(ROUND((list_inner_product(e.v, e.v)
        |      - 2.0 * list_inner_product(e.v, s.cv)
        |      + list_inner_product(s.cv, s.cv)) * 1e6) AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN s),
        |asg AS (SELECT vec_id, v, cid AS centroid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY dmicro, cid) AS rn FROM ad) WHERE rn = 1),
        |rvs AS (SELECT a.vec_id, a.centroid,
        |    list_transform(generate_series(1, 64), j -> a.v[j] - s.cv[j]) AS rv
        |  FROM asg a JOIN s ON s.cid = a.centroid),
        |rs AS (SELECT CAST(vec_id - ${Similarity.IvfKSql} AS INT) AS rcid,
        |    rv AS rsv FROM rvs
        |  WHERE vec_id >= ${Similarity.IvfKSql}
        |    AND vec_id < ${Similarity.IvfKSql} + ${Similarity.PqCodes}),
        |ad2 AS (SELECT r.vec_id, r.centroid, r.rv, rs.rcid,
        |    CAST(ROUND((list_inner_product(r.rv, r.rv)
        |      - 2.0 * list_inner_product(r.rv, rs.rsv)
        |      + list_inner_product(rs.rsv, rs.rsv)) * 1e6) AS BIGINT) AS d2
        |  FROM rvs r CROSS JOIN rs),
        |a2 AS (SELECT vec_id, centroid, rv, d2 FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY d2, rcid) AS rn FROM ad2) WHERE rn = 1)
        |SELECT CAST(centroid AS BIGINT) AS cid, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(CAST(SUM(CAST(ROUND(list_inner_product(rv, rv) * 1e6)
        |    AS BIGINT)) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mean_err0_micro,
        |  CAST(ROUND(CAST(SUM(d2) AS DOUBLE) / COUNT(*)) AS BIGINT)
        |    AS mean_err1_micro
        |FROM a2 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q296_geometric_median" -> geoMedianSql,
    "q288_knn_shapley" ->
      s"""WITH $ESql,
        |q AS (SELECT vec_id AS q_id, v AS qv, label AS q_label FROM e
        |      WHERE vec_id % 50 = 0),
        |s AS (SELECT q.q_id, e.vec_id AS train_id, e.label,
        |        CASE WHEN e.label = q.q_label THEN 1 ELSE 0 END AS ind,
        |        CAST(ROUND(list_cosine_similarity(q.qv, e.v) * 1e6) AS BIGINT)
        |          AS sim_micro
        |      FROM q JOIN e ON e.vec_id <> q.q_id),
        |r AS (SELECT *,
        |        ROW_NUMBER() OVER (PARTITION BY q_id
        |          ORDER BY sim_micro DESC, train_id) AS pos,
        |        COUNT(*) OVER (PARTITION BY q_id) AS n
        |      FROM s),
        |t AS (SELECT *, LEAD(ind) OVER (PARTITION BY q_id ORDER BY pos)
        |        AS ind_next FROM r),
        |u AS (SELECT q_id, train_id, label, pos,
        |        CASE WHEN ind_next IS NULL
        |             THEN CAST(ROUND(CAST(ind AS DOUBLE) / n * 1e12) AS BIGINT)
        |             ELSE CAST(ROUND((ind - ind_next) * LEAST($ShapK, pos)
        |                    / ($ShapK.0 * pos) * 1e12) AS BIGINT)
        |        END AS term_e12
        |      FROM t),
        |sh AS (SELECT q_id, train_id, label,
        |        SUM(term_e12) OVER (PARTITION BY q_id ORDER BY pos DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_e12
        |      FROM u),
        |agg AS (SELECT train_id, CAST(label AS BIGINT) AS label,
        |        CAST(COUNT(*) AS BIGINT) AS n_queries,
        |        CAST(SUM(s_e12) AS BIGINT) AS value_e12
        |      FROM sh GROUP BY 1, 2),
        |top AS (SELECT * FROM agg ORDER BY value_e12 DESC, train_id LIMIT 100)
        |SELECT ROW_NUMBER() OVER (ORDER BY value_e12 DESC, train_id) AS rank,
        |  train_id, label, n_queries, value_e12
        |FROM top ORDER BY rank""".stripMargin,
    "q289_kcenter_coreset" -> kcenterSql,
    "q290_ivf_append_drift" ->
      s"""WITH $ESql,
        |s AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e
        |      WHERE vec_id < ${Similarity.IvfKSql}),
        |ad AS (SELECT e.vec_id, s.cid,
        |    CAST(ROUND((list_inner_product(e.v, e.v)
        |      - 2.0 * list_inner_product(e.v, s.cv)
        |      + list_inner_product(s.cv, s.cv)) * 1e6) AS BIGINT) AS dmicro
        |  FROM e CROSS JOIN s),
        |asg AS (SELECT vec_id, cid AS centroid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY dmicro, cid) AS rn FROM ad) WHERE rn = 1),
        |fl AS (SELECT centroid,
        |    CASE WHEN vec_id >= ${Similarity.IvfKSql} AND vec_id % 10 = 7
        |         THEN 1 ELSE 0 END AS isn FROM asg),
        |g AS (SELECT centroid, SUM(1 - isn) AS n_base, SUM(isn) AS n_new
        |      FROM fl GROUP BY 1),
        |t AS (SELECT SUM(n_base) AS tb, SUM(n_new) AS tn FROM g)
        |SELECT CAST(centroid AS BIGINT) AS cid,
        |  CAST(n_base AS BIGINT) AS n_base, CAST(n_new AS BIGINT) AS n_new,
        |  CASE WHEN tb > 0 THEN CAST(ROUND(1e6 * n_base / tb) AS BIGINT)
        |       ELSE 0 END AS share_base_ppm,
        |  CASE WHEN tn > 0 THEN CAST(ROUND(1e6 * n_new / tn) AS BIGINT)
        |       ELSE 0 END AS share_new_ppm,
        |  ABS(CASE WHEN tb > 0 THEN CAST(ROUND(1e6 * n_base / tb) AS BIGINT)
        |           ELSE 0 END
        |    - CASE WHEN tn > 0 THEN CAST(ROUND(1e6 * n_new / tn) AS BIGINT)
        |           ELSE 0 END) AS drift_ppm
        |FROM g, t ORDER BY cid""".stripMargin,
    "q292_retrieval_metrics" -> {
      val discList = DiscE9.mkString("[", ", ", "]")
      val cumList = CumDiscE9.mkString("[", ", ", "]")
      s"""WITH $ESql,
        |lc AS (SELECT label, COUNT(*) AS c FROM e GROUP BY 1),
        |q AS (SELECT e.vec_id AS q_id, e.v AS qv, e.label AS q_label,
        |        lc.c - 1 AS n_rel
        |      FROM e JOIN lc ON lc.label = e.label WHERE e.vec_id % 50 = 0),
        |s AS (SELECT q.q_id, q.n_rel, e.vec_id AS neighbor_id,
        |        CASE WHEN e.label = q.q_label THEN 1 ELSE 0 END AS rel,
        |        CAST(ROUND(list_cosine_similarity(q.qv, e.v) * 1e6) AS BIGINT)
        |          AS sim_micro
        |      FROM q JOIN e ON e.vec_id <> q.q_id),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY sim_micro DESC, neighbor_id) AS rank FROM s),
        |top AS (SELECT * FROM r WHERE rank <= $TopK),
        |perq AS (SELECT q_id, n_rel,
        |        CAST(SUM(rel) AS BIGINT) AS hits,
        |        CAST(SUM(CASE WHEN rel = 1 THEN ($discList)[rank]
        |                      ELSE 0 END) AS BIGINT) AS dcg_e9,
        |        MIN(CASE WHEN rel = 1 THEN rank END) AS first_rel
        |      FROM top GROUP BY 1, 2)
        |SELECT q_id, CAST(n_rel AS BIGINT) AS n_rel, hits,
        |  CASE WHEN n_rel > 0
        |       THEN CAST(ROUND(1e6 * hits / LEAST($TopK, n_rel)) AS BIGINT)
        |       ELSE 0 END AS recall_micro,
        |  CASE WHEN first_rel IS NOT NULL
        |       THEN CAST(ROUND(1e6 / first_rel) AS BIGINT)
        |       ELSE 0 END AS mrr_micro,
        |  CASE WHEN n_rel > 0
        |       THEN CAST(ROUND(1e6 * dcg_e9
        |              / ($cumList)[LEAST($TopK, n_rel)]) AS BIGINT)
        |       ELSE 0 END AS ndcg_micro
        |FROM perq ORDER BY q_id""".stripMargin
    },
    "q293_matryoshka_recall" -> matryoshkaSql)
}
