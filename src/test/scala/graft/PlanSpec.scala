package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{FileSourceScanExec, SimpleMode, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Plan-shape invariants (SURVEY.md §3): these are the properties that
  * keep the engine viable at 100 TB, asserted against the optimized
  * physical plans so regressions fail CI, not the cluster. */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sfDir).queryExecution
      .explainString(SimpleMode)

  test("q1_agg pushes the date filter and prunes to needed columns") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_partkey"), "unused columns must not be read")
    assert(p.contains("partial_sum"), "map-side partial aggregation expected")
  }

  /** Runs `body` with auto-broadcast and AQE off — the static plan a
    * 100 TB input would get, where nothing broadcasts unless hinted. */
  private def atScale[A](body: => A): A = {
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold" -> conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.enabled" -> conf.get("spark.sql.adaptive.enabled"))
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    try body finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  private def scansTable(p: SparkPlan, table: String): Boolean =
    p.collect { case sc: FileSourceScanExec => sc }.exists(
      // match the path's final segment only: a parent directory whose
      // name embeds another table's name must not false-positive
      _.relation.location.rootPaths.exists(_.getName == s"$table.parquet"))

  test("q3_join/q5_join5: dims broadcast, facts never do, one shuffle per fact") {
    atScale {
      for (q <- Seq("q3_join", "q5_join5")) {
        val p = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan
        val bhj = p.collect { case j: BroadcastHashJoinExec => j }
        assert(bhj.nonEmpty, s"$q: hinted dims must still broadcast at scale")
        for (j <- bhj) {
          val build = j.buildSide match {
            case BuildLeft => j.left
            case BuildRight => j.right
          }
          for (fact <- Seq("orders", "lineitem"))
            assert(!scansTable(build, fact),
              s"$q: the $fact fact table must never be on a broadcast build side")
        }
        // the orders⋈lineitem edge is a shuffle join at scale
        assert(p.toString.contains("SortMergeJoin") || p.toString.contains("ShuffledHashJoin"),
          s"$q: the fact-fact edge must be a shuffle join when nothing auto-broadcasts")
        // each fact's RAW rows cross the wire at most once (exchanges above
        // a partial aggregate ship k-sized partials, not fact rows)
        for (fact <- Seq("orders", "lineitem")) {
          val n = p.collect {
            case e: ShuffleExchangeExec if scansTable(e, fact) &&
              e.collect { case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a }.isEmpty => e
          }.length
          assert(n <= 1, s"$q: $fact raw rows must shuffle at most once, saw $n exchanges")
        }
      }
    }
  }

  test("mixture rank windows sort only hash-prefiltered survivors") {
   for (q <- Seq("q_mixture", "q_mixture_quality")) {
    val p = SparkEntry.queries(q)(spark, sfDir).queryExecution.sparkPlan
    // only the ORDERED windows are rank windows over doc rows; the
    // unordered ones are the global min over the k-row per-lang counts
    // (strata-target derivation) and, for the quality variant, the
    // per-source percentile cut — nothing to prefilter in either
    val windows = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.orderSpec.nonEmpty => w
    }
    assert(windows.nonEmpty, s"$q: exact rank window expected")
    // every window must sit above the hash-prefix cut. The predicate
    // references both join sides (hash prefix vs per-stratum cut), so
    // Catalyst may either keep it as a FilterExec or fuse it into the
    // strata BroadcastHashJoin as a residual condition — accept both.
    // Match the 2^32 literal / `cut` attribute, never the `hv` alias
    // (collapse-eliminated in the optimized plan).
    def hasCut(c: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
      val s = c.toString
      s.contains("4.294967296E9") || s.contains("cut")
    }
    for (w <- windows) {
      val cutInFilter = w.child.collect {
        case f: org.apache.spark.sql.execution.FilterExec if hasCut(f.condition) => f
      }.nonEmpty
      val cutInJoin = w.child.collect {
        case j: BroadcastHashJoinExec if j.condition.exists(hasCut) => j
      }.nonEmpty
      assert(cutInFilter || cutInJoin,
        s"$q: window input must be prefiltered by the per-stratum hash cut " +
          "(as a FilterExec or a BroadcastHashJoin residual condition)")
      assert(w.child.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"$q: strata thresholds must reach the scan via a broadcast join")
    }
   }
  }

  test("q_semi_anti at scale: runtime bloom filter prunes the customer scan") {
    // the 100 TB shape: nothing auto-broadcasts, the semi join is a
    // shuffle join, and the selective orders subset must inject a
    // bloom might_contain filter on the customer probe side so the
    // fact scan is pruned BEFORE its exchange. Thresholds are loosened
    // because sf0.001 scans are below the 10 GB application-side
    // default — the assertion is about plan shape, not sizes.
    val conf = spark.conf
    val wanted = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val saved = wanted.map { case (k, _) => k -> conf.get(k) }
    wanted.foreach { case (k, v) => conf.set(k, v) }
    try {
      val p = SparkEntry.queries("q_semi_anti")(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        "expected a bloom might_contain runtime filter on the customer side")
      assert(p.contains("bloom_filter_agg"),
        "expected the bloom build aggregate over the filtered orders keys")
      assert(!p.contains("BroadcastHashJoin"),
        "at scale the semi join must be a shuffle join (no broadcast of a fact subset)")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  /** Queries allowed a BroadcastNestedLoopJoin at scale: each one
    * deliberately broadcast-crosses a provably tiny side (a hinted
    * ≤tens-of-rows query/probe set, k-row cluster state, or a
    * single-row global aggregate), so the nested loop is
    * O(corpus × tiny), never corpus × corpus. Everything else must
    * stay equi-join only.
    *   ann_topk / ann_recall / ann_pq / ann_recall_sweep — hinted
    *     ≤10-row query set, non-equi (self-exclusion) probe over the
    *     corpus;
    *   km_silhouette_exact — k-row cluster-moment broadcast (the
    *     O(n·k) silhouette decomposition);
    *   text_tfidf — single-row corpus-count broadcast (in-plan
    *     replacement for an eager count());
    *   text_heavy_hitters — single-row Misra-Gries candidate+total
    *     broadcast probed with an array_contains residual;
    *   text_quality_bins — single-row quartile-cuts broadcast (the
    *     in-plan alternative to a global-sort ntile);
    *   text_ppl_proxy — single-row corpus-token-total broadcast
    *     (text_tfidf's pattern);
    *   text_ppl_bigram — single-row vocabulary-size broadcast (the
    *     add-1 smoothing denominator, text_tfidf's pattern);
    *   q_kcore — per-round single-row stats cross (n_nodes × n_edges
    *     1-row aggregates of the checkpointed round table);
    *   q_xcorr — single-row global day-span broadcast (the grid
    *     bounds, q_drift's split-instant pattern);
    *   q_survival — single-row span-end and user-total broadcasts
    *     (censor horizon + risk-set base, the same pattern);
    *   q_itemsets — single-row order-total broadcast (the lift
    *     denominator, text_tfidf's pattern);
    *   dedup_eval — three single-row count broadcasts (truth /
    *     candidate / true-positive totals of the eval);
    *   text_quality_learned — single-row median-label-cut broadcast;
    *   q_drift / q_upsert — single-row split-instant broadcast (the
    *     integer-µs midpoint both engines cut on);
    *   q_zorder — single-row max-bounds broadcast (the grid scale);
    *   q_rfm — single-row tercile-cuts broadcast (text_quality_bins'
    *     pattern);
    *   text_cooc — single-row corpus-totals broadcast (text_tfidf's
    *     pattern);
    *   ann_trained_recall — ann_recall_sweep's pattern: the ≤10-row
    *     query-vector broadcast probed with the non-equi
    *     self-exclusion predicate;
    *   ann_sq8 — the same ≤10-row query broadcast + non-equi
    *     self-exclusion probe (ann_pq's shape, over SQ8 codes);
    *   q_triangles — single-row global-triangle-count broadcast
    *     (text_tfidf's pattern: the in-plan alternative to an eager
    *     count, derived from the per-node agg so the wedge join runs
    *     once);
    *   embed_power_iter — per-iteration single-row direction/norm
    *     broadcasts (the declarative power step: 1-row vq array,
    *     1-row n2, and the final λ/share scalars — every crossed side
    *     is one row by construction);
    *   embed_spectrum — the same per-iteration 1-row broadcasts for
    *     BOTH direction chains plus the 1-row deflation (p, q)
    *     scalars;
    *   embed_whiten — embed_spectrum's broadcasts plus the 1-row
    *     integer-mean array the centering projects against;
    *   q_hll — per-column single-row register-sum × exact-count
    *     crossJoin (both sides 1 row by construction);
    *   q_label_prop — single-row community-count broadcast
    *     (q_triangles' pattern);
    *   embed_jl — single-row (n_pairs_total, mean_ratio) summary
    *     broadcast onto the histogram rows;
    *   q_sssp — single-row reached-count broadcast onto the top-20
    *     (q_triangles' pattern);
    *   q_modularity — single-row global fold (Σe_c, Σdeg_c², m)
    *     broadcast onto the top-5 community rows (q_triangles'
    *     pattern, twice: the gm and m scalars);
    *   q_tree2 — the 1-row root-split pick cross-joined back onto
    *     the corpus to derive the branch column (km_bisect's
    *     scalar-subquery idiom, declarative second level);
    *   q_lof — the 1-row dense/sparse census broadcast onto the
    *     top-20 outlier rows (q_triangles' pattern);
    *   q_isoforest — the 1-row bounding-box broadcast every cell
    *     computation normalizes against;
    *   q_diameter — the 1-row census/endpoint broadcasts composing
    *     the single output row (q_triangles' pattern, four scalars);
    *   q_diameter_bracket — the same composition with seven 1-row
    *     scalars (components stats, giant seed, four eccentricities,
    *     iFUB census) plus the 1-row lb broadcast gating the midpoint
    *     pick and census filter;
    *   q_diameter_exact — the bracket's composition (five 1-row
    *     scalars incl. the census-BFS eccentricity aggregate) plus
    *     the 1-row lb broadcast gating midpoint pick and census
    *     source filter;
    *   q_markov_stationary — the 1-row state-count broadcast seeding
    *     the uniform start mass (text_tfidf's pattern);
    *   q_chi2 — the types × 7-dow densification lattice (both sides
    *     category domains, never data-sized) plus the 1-row dims
    *     broadcast every term row carries;
    *   q_densest — per-round 1-row V/E scalars broadcast into the
    *     peel predicate and the census rows (q_kcore's pattern);
    *   q_kmv — the 1-row union-sketch/matches/exact-overlap scalars
    *     composing the intersection row (dedup_eval's pattern);
    *   q_skyline — the 1-row global-bounds broadcast each point
    *     buckets against, plus the dead-cell and cell-pair lattice
    *     joins (bounded by SkylineGrid³ = 512 cells, never by data);
    *   ann_hashed_recall — recallRow's three 1-row broadcasts
    *     (matches × truth-total × candidate-cost, dedup_eval's
    *     pattern) plus the constant 32×64 hyperplane lattice built by
    *     crossing two literal ranges (bounded by MaxPlaneBits ×
    *     FeatureHashDim, never by data);
    *   q_naive_bayes — 1-row vocab-size / total-docs broadcasts into
    *     the vocab-sized model build, and the |classes|-row (5 here,
    *     bounded by the label domain) class-stats broadcast that fans
    *     each test token out to one row per class — the fan-out IS
    *     the operator's semantics and is class-count-bounded;
    *   q_t_closeness — the QI-groups × band-domain densification
    *     cross (q_chi2's lattice pattern: both sides category
    *     domains, never data-sized) plus the 1-row (m, N) global
    *     broadcast every lattice row carries;
    *   text_dsir — the 1-row (T, R) totals broadcast into the
    *     1024-row bucket table and the 1-row P75-threshold broadcast
    *     onto per-doc weights (text_quality_bins' pattern);
    *   q_mst — per-round census row composed from three 1-row
    *     aggregates (selected count × cumulative forest stats ×
    *     component count) over checkpointed state (q_kcore's
    *     pattern);
    *   q_ks_test — the 1-row max-gap broadcast probed back into the
    *     distinct-value table for the argmax, and the 1-row × 1-row
    *     readout crossJoin;
    *   q_neyman — the 1-row Σweight broadcast into the k-strata
    *     allocation table (rule-11 sanctioned global total);
    *   q_record_link — the 1-row truth-count broadcast onto the
    *     3-row decision census;
    *   q_record_link_thresh — the 1-row (tot_false, tot_true)
    *     broadcast onto the 3-row zone census (q_record_link's
    *     pattern);
    *   dedup_eval_sampled — the four 1-row count broadcasts feeding
    *     the single ratio row (dedup_eval's pattern);
    *   q_dtw — the 1-row min-day broadcast and the type-domain
    *     ta < tb pair square (q_xcorr's category-bounded shape);
    *   q_dtw_barycenter_iter — the 1-row per-pass Fréchet² aggregate
    *     broadcast onto that pass's 30 barycenter rows (q_triangles'
    *     pattern; the 30-row barycenter cross inside each pass is
    *     behind the checkpoint seam);
    *   q_pagerank_ppr — the 1-row touched-count broadcast onto the
    *     top-20 (q_sssp's pattern);
    *   q_louvain / q_leiden — the 1-row global-Q fold (Σw_in, ΣΣtot²,
    *     community count) broadcast onto the top-10 community rows
    *     (q_modularity's pattern). */
  private val bnljAllowed: Set[String] =
    Set("ann_topk", "ann_recall", "ann_pq", "ann_pq_rerank",
      "ann_recall_sweep", "ann_trained_recall", "km_silhouette_exact", "text_tfidf",
      "text_heavy_hitters", "text_quality_bins", "text_ppl_proxy",
      "text_quality_learned", "q_drift", "q_upsert", "q_zorder", "q_rfm",
      "text_cooc", "ann_sq8", "q_triangles", "embed_power_iter",
      "text_ppl_bigram", "q_kcore", "q_xcorr", "q_survival", "q_itemsets",
      "dedup_eval", "embed_spectrum", "q_hll", "q_label_prop", "embed_jl",
      "q_sssp", "q_naive_bayes", "q_modularity", "q_tree2", "q_lof",
      "embed_whiten", "q_isoforest", "q_diameter", "q_diameter_bracket",
      "ann_hashed_recall", "q_skyline", "q_kmv", "q_chi2",
      "q_markov_stationary", "q_densest", "q_t_closeness", "text_dsir",
      "q_mst", "q_ks_test", "q_neyman", "q_record_link", "q_dtw",
      "q_clustcoef", "q_record_link_em", "q_record_link_thresh",
      "dedup_eval_sampled", "q_dtw_barycenter_iter", "q_diameter_exact",
      "q_pagerank_ppr", "q_louvain", "q_leiden",
      // q_louvain_incr — louvainReadout's 1-row global-Q fold
      // broadcast onto the top-10 rows (q_louvain's pattern)
      "q_louvain_incr",
      // q_anf — the 1-row round-R mass broadcast onto the R+1 census
      // rows (q_sssp's pattern)
      "q_anf")

  test("all queries at scale: no cartesian products, no unsanctioned nested-loop joins") {
    atScale {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val p = fn(spark, sfDir).queryExecution.executedPlan
          val cart = p.collect {
            case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
          }
          val bnlj = p.collect {
            case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
          }
          (if (cart.nonEmpty) Seq(s"$name: CartesianProduct") else Nil) ++
            (if (bnlj.nonEmpty && !bnljAllowed(name))
              Seq(s"$name: BroadcastNestedLoopJoin") else Nil)
      }
      assert(offenders.isEmpty,
        s"scale-killer join shapes at autoBroadcast=-1/AQE-off: " +
          s"${offenders.mkString("; ")}")
    }
  }

  test("km_assign is shuffle-free (broadcast-literal centroid fold)") {
    val p = plan("km_assign")
    assert(!p.contains("Exchange"), "assignment is a pure map over the scan")
  }

  test("km_update shuffles only the partial-aggregate rows") {
    val p = plan("km_update")
    assert(p.contains("partial_avg") || p.contains("partial_average"),
      "per-cluster means must combine map-side")
  }

  test("dedup candidate joins move ids, not documents") {
    val p = plan("dedup_minhash")
    // the band self-join output feeds dropDuplicates on two id columns
    assert(p.contains("band_val"))
    assert(!p.contains("SortMergeJoin") || !p.contains("wd#"),
      "word arrays must not ride the candidate shuffle")
  }

  test("q_topk_agg shuffles bounded heaps, not sorted rows") {
    val p = plan("q_topk_agg")
    assert(p.contains("partial_topkstructs") || p.contains("TopKStructs"),
      "bounded-heap aggregate must combine map-side")
    assert(!p.contains("WindowGroupLimit") && !p.contains("Sort ["),
      "no full per-group sort should survive in the aggregate variant")
  }

  test("q_anomaly ranks per-type top-5 through the bounded heap — no rank window") {
    val p = plan("q_anomaly")
    assert(p.contains("partial_topkstructs") || p.contains("TopKStructs"),
      "per-type top-5 must run through the TopKStructs heap aggregate")
    assert(!p.contains("Window"),
      "no rank window may survive — a hot event_type would full-sort its " +
        "entire event stream on one reducer")
  }

  test("text_vocab_growth cumulative readout is window-free (two-pass " +
      "range-partitioned prefix sum)") {
    val p = plan("text_vocab_growth")
    assert(!p.contains("Window"),
      "the cumulative fold must ride PrefixSum — a Window.orderBy " +
        "running total lands the docs/100-row bucket table on one reducer")
  }

  test("q_entropy totals are a k-row broadcast join — no per-column window") {
    val p = plan("q_entropy")
    assert(!p.contains("Window"),
      "per-column totals must be a k-row broadcast join, not a window — " +
        "a high-cardinality column would land its distinct set on one reducer")
    assert(p.contains("BroadcastHashJoin"), "totals side must broadcast")
  }

  test("q_asof_join is one partitioned window pass — no join at all") {
    val p = plan("q_asof_join")
    assert(!p.contains("Join"), "as-of must be a carry-forward window, not a join")
    val shuffles = "Exchange".r.findAllIn(p).length
    assert(shuffles <= 1, s"expected a single user_id exchange, saw $shuffles")
  }

  test("q_label_centroid shuffles only k×dim partial sums") {
    val p = plan("q_label_centroid")
    assert(p.contains("partial_avg") || p.contains("partial_average"),
      "vector mean must combine map-side before the exchange")
  }

  test("q_sample is a pure pushed scan+filter — no shuffle") {
    val p = plan("q_sample")
    assert(!p.contains("Exchange"), "hash sampling must not move data")
    assert(p.contains("ReadSchema") && !p.contains("text"),
      "sampling reads keys/strata only, never the document text")
  }

  test("q_range_join is an equi hash join with a band condition, not a cross product") {
    val p = plan("q_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "band predicate must ride the user_id equi join")
  }

  test("ann_ivf broadcasts the probed queries and scans the corpus once") {
    val p = plan("ann_ivf")
    assert(p.contains("BroadcastHashJoin"), "probe set must broadcast")
    assert(!p.contains("SortMergeJoin"), "corpus must not shuffle for the probe join")
  }

  test("collapsed dedup joins stay equi-joins — no cartesian fallback") {
    for (q <- Seq("dedup_jaccard", "dedup_minhash", "dedup_simhash",
        "dedup_clusters", "embed_neardup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: member expansion and rep joins must remain hash equi-joins")
    }
  }

  test("embed_neardup joins key on vector hashes, never float arrays") {
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    import org.apache.spark.sql.types.ArrayType
    val p = SparkEntry.queries("embed_neardup")(spark, sfDir)
      .queryExecution.executedPlan
    def keys(n: SparkPlan): Seq[Expression] = n match {
      case j: BroadcastHashJoinExec => j.leftKeys ++ j.rightKeys
      case j: SortMergeJoinExec     => j.leftKeys ++ j.rightKeys
      case j: ShuffledHashJoinExec  => j.leftKeys ++ j.rightKeys
      case _                        => Nil
    }
    val arrayKeys = p.collect { case n if keys(n).nonEmpty => keys(n) }
      .flatten.filter(_.dataType.isInstanceOf[ArrayType])
    assert(arrayKeys.isEmpty,
      s"collapse/expand joins must hash-key vectors (16 B md5), not ship " +
        s"64-float arrays as join keys; found: ${arrayKeys.mkString(", ")}")
  }

  test("dedup_ngram ships long hash sets, not bigram strings") {
    val p = plan("dedup_ngram")
    assert(p.contains("ngramhashset") || p.contains("NGramHashSet")
      || p.contains("bgd"), "hashed bigram sets expected in the plan")
    assert(!p.contains("transform(sequence"),
      "no interpreted higher-order bigram construction in the hot path")
  }

  test("q_cube and q_grouping_sets expand once and combine map-side") {
    for (q <- Seq("q_cube", "q_grouping_sets")) {
      val p = plan(q)
      assert(p.contains("Expand"), s"$q: grouping-set expansion expected")
      assert(p.contains("partial_"), s"$q: subtotals must combine map-side")
      val shuffles = "Exchange".r.findAllIn(p).length
      assert(shuffles <= 1, s"$q: one grouping exchange expected, saw $shuffles")
    }
  }

  test("q_moving_avg runs all frames in one window pass") {
    val p = plan("q_moving_avg")
    val shuffles = "Exchange".r.findAllIn(p).length
    assert(shuffles <= 1, s"one user_id exchange expected, saw $shuffles")
    val windows = "(?m)^\\s*[+:*-]*\\s*Window ".r.findAllIn(p).length
    assert(windows <= 1,
      s"running sum and moving avg must share one Window operator, saw $windows")
  }

  test("q_sliding_window explodes windows before one partial-agg exchange") {
    val p = plan("q_sliding_window")
    assert(p.contains("partial_"), "window counts must combine map-side")
    val shuffles = "Exchange".r.findAllIn(p).length
    assert(shuffles <= 1, s"one grouping exchange expected, saw $shuffles")
  }

  test("ann_lsh_topk broadcasts bucketed queries — corpus never shuffles for the join") {
    val p = plan("ann_lsh_topk")
    assert(p.contains("BroadcastHashJoin"), "query side must broadcast")
    assert(!p.contains("SortMergeJoin"), "corpus must not shuffle for the bucket join")
  }

  test("q_histogram buckets in the scan projection with partial agg") {
    val p = plan("q_histogram")
    assert(p.contains("partial_"), "bucket counts must combine map-side")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("ann_pq broadcasts the query side; corpus ships codes, not vectors") {
    val p = plan("ann_pq")
    assert(p.contains("Broadcast"), "query set must broadcast")
    assert(!p.contains("SortMergeJoin"), "corpus must not shuffle for the ADC join")
    assert(p.contains("pqencode") || p.contains("PQEncode") || p.contains("codes"),
      "code arrays expected in the plan")
  }

  test("dedup_incremental probes the corpus with broadcasts — no corpus shuffle") {
    val p = plan("dedup_incremental")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "rep joins and member expansion must remain hash equi-joins")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the corpus side must only ever be probed by broadcast (batch ≪ corpus); " +
        "any shuffle join means the corpus is being moved for the join")
  }

  test("text_tfidf builds lazily — no Spark action at plan-build time") {
    // Spark 4 submits one schema-inference job per parquet read, so
    // "lazy" here means: building the full tf-idf plan costs no more
    // jobs than merely opening its input table. An eager count() (the
    // r5/r6 anti-pattern) adds a multi-stage job and fails this.
    // Job groups are thread-local — concurrent suites can't pollute it.
    val sc = spark.sparkContext
    def jobsDuring(group: String)(body: => Any): Int = {
      sc.setJobGroup(group, group, interruptOnCancel = false)
      try { body; sc.statusTracker.getJobIdsForGroup(group).length }
      finally sc.clearJobGroup()
    }
    val baseline = jobsDuring("tfidf-lazy-base")(graft.Tables.documents(spark, sfDir))
    val built = jobsDuring("tfidf-lazy-probe")(
      SparkEntry.queries("text_tfidf")(spark, sfDir))
    assert(built <= baseline,
      s"building the text_tfidf plan submitted $built jobs vs $baseline for a " +
        "bare table read — corpus size must be an in-plan broadcast " +
        "aggregate, not an eager action")
  }

  test("embed_semdedup prunes to id+vector and keeps the cell joins equi") {
    val p = plan("embed_semdedup")
    assert(!p.contains("label"),
      "semantic dedup reads vec_id+embedding only — label must be pruned")
    assert(p.contains("partial_"), "group collapse must combine map-side")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "within-cell pairing must stay an equi join on cid with a residual cosine")
  }

  test("text_filter_pipeline: two-branch collapse shape, map-side funnel") {
    val p = plan("text_filter_pipeline")
    // the §3a collapse plans one member branch + ONE rep branch (the
    // scalar metrics ride the explode as grouping columns); a third
    // scan means a metrics branch split off and re-planned the collapse
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 2, s"member + single rep branch expected, saw $scans scans")
    assert(p.contains("partial_"), "funnel counts must combine map-side")
  }

  test("no regex projection ever sits above an explode (per-token re-eval trap)") {
    // Catalyst collapses a projection placed next to an explode BELOW
    // the Generate's output, silently re-evaluating per-doc scalars
    // once per TOKEN row (a measured 5x on text_filter_pipeline).
    // Guard every doc-exploding text query: any regex must be
    // evaluated under the Generate, never above it.
    import org.apache.spark.sql.catalyst.expressions.{Md5, RegExpExtract,
      RegExpExtractAll, RegExpReplace, StringSplit}
    import org.apache.spark.sql.execution.{GenerateExec, ProjectExec}
    for (q <- Seq("text_filter_pipeline", "text_repetition", "text_tfidf",
        "dedup_spans", "text_contamination", "text_heavy_hitters",
        "text_pack", "text_fingerprint")) {
      val p = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan
      val offenders = p.collect {
        case pr: ProjectExec =>
          val genOut = pr.collect { case g: GenerateExec => g }
            .flatMap(_.generatorOutput).map(_.exprId).toSet
          if (genOut.isEmpty) Nil
          else pr.projectList.filter { e =>
            // expensive work whose inputs are all PRE-explode columns:
            // independent of the generated value, yet evaluated per
            // generated row
            val expensive = e.collectFirst {
              case x @ (_: RegExpReplace | _: RegExpExtract |
                _: RegExpExtractAll | _: StringSplit | _: Md5) => x
            }.nonEmpty
            expensive && e.references.nonEmpty &&
              e.references.forall(a => !genOut.contains(a.exprId))
          }
      }.flatten
      assert(offenders.isEmpty,
        s"$q: doc-level expensive projection above a Generate re-evaluates " +
          s"per generated row: ${offenders.mkString(", ")}")
    }
  }

  test("text_repetition aggregates combine map-side") {
    val p = plan("text_repetition")
    assert(p.contains("partial_"), "token counts must combine map-side")
  }

  test("q_outer_join aggregates events before the outer join") {
    val p = plan("q_outer_join")
    // the groupBy must run below the join: the outer join sees one row
    // per user, not one per event
    val joinIdx = p.indexOf("FullOuter")
    assert(joinIdx >= 0, "full outer join expected in the plan")
    assert(p.substring(joinIdx).contains("HashAggregate"),
      "per-user aggregation must happen under the join, not above it")
  }

  test("text_bpe fuses extraction into the scan projection with partial agg") {
    val p = plan("text_bpe")
    // AQE explain (isFinalPlan=false) hides WholeStageCodegen spans;
    // the codegen-ability invariants are: native regexp in the Project
    // directly over the scan (no UDF/serialization) and map-side combine
    assert(p.contains("regexp_extract_all") && !p.contains("BatchEvalPython")
      && !p.contains("mapelements"), "extraction must stay native")
    assert(p.contains("partial_"), "token stats must combine map-side")
  }
}
