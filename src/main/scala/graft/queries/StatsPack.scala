package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Distribution / sketch statistics pack (SURVEY.md §2). */
object StatsPack extends QueryPack {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact interpolated percentiles per group (order-stat aggregate).
    "q_percentile" -> ((s, d) => {
      events(s, d).groupBy("event_type").agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"))
    }),

    // Exact multi-column distinct counts (expands to two aggregations).
    "q_distinct" -> ((s, d) => {
      lineitem(s, d).groupBy("l_returnflag").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
    }),

    // HLL++ sketch distinct — constant memory per group at any scale;
    // rows-only (sketch estimates are engine-specific by design).
    "q_approx_distinct" -> ((s, d) => {
      lineitem(s, d).groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        count(lit(1)).as("n_rows"))
    }),

    // Approximate percentiles (positional sketch) — the constant-memory
    // twin of q_percentile; rows-only for the same reason as the HLL.
    "q_approx_percentile" -> ((s, d) => {
      events(s, d).groupBy("event_type").agg(
        expr("approx_percentile(value, array(0.5, 0.9), 1000)").as("p"),
        count(lit(1)).as("n"))
        .select(col("event_type"), col("p")(0).as("p50"),
          col("p")(1).as("p90"), col("n"))
    }),

    // Per-label mean embedding: posexplode to narrow (label, dim, v)
    // rows → hash agg with partial combine. The shuffle carries only
    // k×dim partial sums per partition regardless of corpus size.
    "q_label_centroid" -> ((s, d) => {
      embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), (col("pos") + 1).as("dim"))
        .agg(round(avg(col("v").cast("double")), 5).as("c"))
    }),

    // Deterministic stratified sampling — the training-data downsample
    // primitive: md5-hash Bernoulli keyed on doc_id (stable across
    // runs/engines/partitionings, unlike rand()), with a per-stratum
    // rate (en kept at 2× the rest). Pure scan + filter: no shuffle,
    // and the hash filter pushes no data movement at any scale.
    "q_sample" -> ((s, d) => {
      val h = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4),
        16, 10).cast("long")
      val threshold = when(col("lang") === "en", 26214L).otherwise(13107L)
      documents(s, d)
        .select(col("doc_id"), col("lang"), h.as("h"), threshold.as("t"))
        .filter(col("h") < col("t"))
        .select("doc_id", "lang")
    }),

    // Deterministic stratified train/val/test split (round 9): the
    // assignment every training pipeline runs before anything else. A
    // doc's split is a pure function of its id (q_sample's 16-bit md5
    // prefix draw: <80% → train, <90% → val, else test), so the split
    // is stable across runs, engines, repartitions, and corpus GROWTH
    // (a new doc never moves an old one — the property date-modulo or
    // row-number splits lack). Assignment is per-row scan math, the
    // per-stratum report one hash agg; at 100 TB nothing shuffles but
    // the k×3 report rows.
    "q_split" -> ((s, d) => {
      val h = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4),
        16, 10).cast("long")
      documents(s, d)
        .withColumn("split",
          when(h < 52429L, "train").when(h < 58982L, "val").otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
    }),

    // Deterministic mixture rebalance — the domain-mixing primitive:
    // downsample every stratum (lang) to EXACTLY the size of the
    // smallest one, selecting members by md5-hash rank (a seedless,
    // engine- and partitioning-stable random draw). Scale shape: the
    // rank window never sorts a full stratum — a per-stratum hash-prefix
    // PREFILTER (threshold ≈ (2·target+64)/cnt of the 32-bit md5
    // prefix, q_sample's scan-only shape) cuts the window input to
    // ~2×target rows first. The filter keeps a PREFIX of the md5 sort
    // order (kept prefix value < any dropped prefix value), so the
    // top-target rows are identical to the unfiltered rank as long as
    // ≥ target rows survive per stratum — enforced in-plan by a
    // raise_error guard (loud failure, never a silent undersample).
    "q_mixture" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.operators.Sampling
      val docs = documents(s, d).select(col("doc_id"), col("lang"))
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
      // target = min stratum size via a global window over the k-row
      // counts aggregate (k = #langs, not #docs — one partition of k
      // rows at any scale): a single planned subtree, vs the former
      // self-join on counts that planned the documents scan + count
      // aggregation twice and leaned on ReuseExchange to dedup them
      val strata = counts
        .withColumn("target", min("cnt").over(Window.partitionBy()))
        .select(col("lang"), col("target"),
          Sampling.prefixCut(col("target"), col("cnt")).as("cut"))
      Sampling.stratifiedHashDraw(docs, "lang", "doc_id", strata, "q_mixture")
    }),

    // Per-source document cap — the domain-cap curation primitive (a
    // crawl's over-represented domains are truncated, small sources
    // pass through): keep at most 15 docs per source, selected by the
    // same deterministic md5-hash rank as q_mixture. Same scale shape:
    // k-row cap table broadcast, hash-prefix prefilter, bounded rank
    // window.
    "text_source_cap" -> ((s, d) => {
      import graft.operators.Sampling
      val docs = documents(s, d).select(col("doc_id"), col("source"))
      val strata = docs.groupBy("source").agg(count(lit(1)).as("cnt"))
        .select(col("source"), least(lit(15L), col("cnt")).as("target"),
          Sampling.prefixCut(least(lit(15L), col("cnt")), col("cnt")).as("cut"))
      Sampling.stratifiedHashDraw(docs, "source", "doc_id", strata,
        "text_source_cap")
    }),

    // Fixed-width histogram: bucket = floor(price/25k)·25k — a single
    // hash agg; bucket count is bounded by the value range, not rows.
    "q_histogram" -> ((s, d) =>
      orders(s, d)
        .groupBy((floor(col("o_totalprice") / 25000) * 25000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 2).as("avg_price"))),

    // Distribution drift (round 8) — the PSI monitor a pipeline runs
    // between yesterday's corpus and today's before trusting a new
    // snapshot: events split at the integer-µs mid-instant into
    // reference/current windows, value binned on fixed 50-wide edges,
    // population-stability-index per event_type with +1 Laplace
    // smoothing (empty bins stay finite — all 10 bins participate by
    // construction). Scale shape: the SAME single-aggregation plan as
    // the streaming twin `driftMonitorStream` — the 20 (window × bin)
    // cells are conditional-count COLUMNS of ONE hash agg keyed on
    // event_type, PSI is per-row column math over the k finalized
    // rows; the only join in the plan is the whitelisted single-row
    // split-instant broadcast. No densify join, no self-join, no sort;
    // the windows could be two day-partitions without changing it.
    "q_drift" -> ((s, d) => {
      val ev = events(s, d).select(col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      val bounds = ev.agg(expr("(min(ts_us) + max(ts_us)) div 2").as("sp"))
      val binned = ev.crossJoin(broadcast(bounds))
        // clamp BOTH sides: a one-sided least(9, ...) sends negative
        // values to a bin matching no count column — silently excluded
        // from the PSI, so a downward shift past 0 would be invisible
        .withColumn("bin", greatest(lit(0L),
          least(lit(9L), floor(col("value") / 50.0))).cast("long"))
        .withColumn("isRef", col("ts_us") < col("sp"))
      val cells =
        (0 until 10).map(b => sum(when(col("isRef") && col("bin") === b, 1L)
          .otherwise(0L)).as(s"r$b")) ++
        (0 until 10).map(b => sum(when(!col("isRef") && col("bin") === b, 1L)
          .otherwise(0L)).as(s"c$b"))
      val rTot = (0 until 10).map(b => col(s"r$b")).reduce(_ + _)
      val cTot = (0 until 10).map(b => col(s"c$b")).reduce(_ + _)
      val psi = (0 until 10).map { b =>
        val p = (col(s"r$b") + 1.0) / (rTot + 10.0)
        val q = (col(s"c$b") + 1.0) / (cTot + 10.0)
        (q - p) * log(q / p)
      }.reduce(_ + _)
      binned.groupBy("event_type").agg(cells.head, cells.tail: _*)
        // the oracle's ref JOIN cur emits only types seen in BOTH
        // windows — keep that contract on edge data
        .filter(rTot > 0 && cTot > 0)
        .select(col("event_type"), round(psi, 4).as("psi"))
    }),

    // Winsorized robust stats (round 8) — the outlier-capping pass a
    // metrics pipeline runs before averaging heavy-tailed values: per
    // group, values are clamped into [p05, p95] and the raw vs
    // winsorized means are reported with the cap count. Two passes by
    // necessity (the cuts are order statistics of the whole group);
    // the cuts table is k rows joined back on the group key — a
    // broadcast hash join at scale, never a global sort.
    "q_winsorize" -> ((s, d) => {
      val cuts = events(s, d).groupBy("event_type").agg(
        round(expr("percentile(value, 0.05)"), 4).as("p05"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"))
      events(s, d).join(broadcast(cuts), "event_type")
        .withColumn("w", least(greatest(col("value"), col("p05")), col("p95")))
        .groupBy("event_type", "p05", "p95")
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") < col("p05") or col("value") > col("p95"), 1L)
            .otherwise(0L)).as("n_capped"),
          round(avg("value"), 4).as("mean_raw"),
          round(avg("w"), 4).as("mean_wins"))
        .select("event_type", "n", "n_capped", "p05", "p95",
          "mean_raw", "mean_wins")
    }),

    // Time-series gap fill + forward fill (round 8) — the densify pass
    // a reporting pipeline runs so every series has a row per period:
    // per-user daily activity, missing days materialized from each
    // user's [first, last] day via sequence+explode (integer epoch-day
    // arithmetic — no calendar conventions), counts zero-filled, and
    // the last observed daily total carried forward with an
    // ignoreNulls running window. Scale shape: output ∝ series × time
    // range (never events²); the window and both aggs share the
    // user_id partitioning — one exchange serves the whole plan.
    "q_gap_fill" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          col("value"))
        .groupBy("user_id", "day")
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("day_total"))
      val grid = daily.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .withColumn("is_filled", col("n_events").isNull)
        .na.fill(0L, Seq("n_events"))
        .withColumn("ffill_total", last(col("day_total"), ignoreNulls = true).over(w))
        .select("user_id", "day", "n_events", "day_total", "is_filled",
          "ffill_total")
    }),

    // Welch two-sample t-test (round 8) — the A/B significance read a
    // metrics pipeline runs on an experiment: variant = user_id parity
    // (deterministic, data-derived), metric = purchase value. ONE
    // conditional aggregation computes both arms' n/mean/variance in a
    // single scan (no join, no pivot); the t statistic and
    // Welch–Satterthwaite dof are column math over the 1-row result.
    "q_ab_test" -> ((s, d) => {
      val isA = col("user_id") % 2 === 0
      val arm = events(s, d).filter(col("event_type") === "purchase")
        .agg(
          count(when(isA, 1)).as("n_a"),
          count(when(!isA, 1)).as("n_b"),
          avg(when(isA, col("value"))).as("m_a"),
          avg(when(!isA, col("value"))).as("m_b"),
          var_samp(when(isA, col("value"))).as("v_a"),
          var_samp(when(!isA, col("value"))).as("v_b"))
      val sa = col("v_a") / col("n_a")
      val sb = col("v_b") / col("n_b")
      val t = (col("m_a") - col("m_b")) / sqrt(sa + sb)
      val dof = pow(sa + sb, 2) /
        (pow(sa, 2) / (col("n_a") - 1) + pow(sb, 2) / (col("n_b") - 1))
      arm.select(col("n_a"), col("n_b"),
        round(col("m_a"), 4).as("mean_a"), round(col("m_b"), 4).as("mean_b"),
        round(t, 4).as("t_stat"), round(dof, 2).as("dof"),
        (abs(t) > 1.96).as("significant"))
    }),

    // Gini concentration coefficient (Gini 1912; the rank formula
    // G = 2Σi·x/(nΣx) − (n+1)/n, round 11) over per-customer spend —
    // the inequality audit: how concentrated is purchase mass across
    // customers (0 = uniform, →1 = one whale)? Reported with the
    // top-decile share (the readout people actually act on). Exact:
    // spend is integer cents, the rank index is a global (spend,
    // custkey) row_number — ties carry equal x, so Σi·x is invariant
    // under tie order — and Σi·x accumulates in DECIMAL(38) (i·x
    // passes BIGINT at ~1e9 customers × 1e9 cents); the two ratios
    // are single double expressions over exact sums. Scale: one hash
    // agg to the CUSTOMER table, ONE global sort of customer-count
    // rows (bounded by customers, never lineitems — the documented
    // cost; at 1e9 customers this is a real but routine sort), a
    // 1-row fold.
    "q_gini" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("sp"), col("o_custkey"))
      val sp = orders(s, d)
        .groupBy("o_custkey")
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("sp"))
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("nn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy())
          .cast("long"))
      val a = sp.agg(count(lit(1)).as("n"),
        sum("sp").as("tot"),
        sum(col("i").cast("decimal(38,0)") * col("sp")).as("isum"),
        sum(when(col("i") > expr("(9 * nn) div 10"), col("sp"))
          .otherwise(0L)).as("top"))
      a.select(col("n").as("n_customers"), col("tot").as("total_cents"),
        round(lit(2.0) * col("isum").cast("double")
            / (col("n").cast("double") * col("tot").cast("double"))
          - (col("n") + 1).cast("double") / col("n").cast("double"), 6)
          .as("gini"),
        round(col("top").cast("double") / col("tot").cast("double"), 6)
          .as("top_decile_share"))
    }),

    // Mann–Whitney U / Wilcoxon rank-sum (Mann & Whitney 1947, round
    // 11) — q_ab_test's NONPARAMETRIC twin: the t-test reads means
    // and is wrecked by the heavy tails purchase values actually
    // have; the rank test asks only "does one arm stochastically
    // dominate", which survives any monotone transform of value.
    // Exactness: ranks never exist as floats — per DISTINCT value the
    // doubled mid-rank 2·r̄ = 2·cum_before + cnt + 1 is an exact
    // integer (tie-averaging without the .5), so the rank sum 2R_a =
    // Σ cnt_a·rank2, the U statistic 2U_a = 2R_a − n_a(n_a+1), and
    // the tie-correction Σ(t³−t) are all exact integer folds; the
    // normal-approximation z (tie-corrected variance, Lehmann's
    // formula) is one fixed double expression over those integers.
    // Scale: one hash agg to the DISTINCT-value table (bounded by the
    // price domain, q_histogram's argument), one ordered window over
    // it, one 1-row fold.
    "q_mann_whitney" -> ((s, d) => {
      val isA = col("user_id") % 2 === 0
      val perVal = events(s, d).filter(col("event_type") === "purchase")
        .groupBy("value")
        .agg(count(lit(1)).as("cnt"),
          count(when(isA, 1)).as("cnt_a"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("value")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val ranked = perVal
        .withColumn("cumb", sum("cnt").over(w) - col("cnt"))
        .withColumn("rank2", lit(2) * col("cumb") + col("cnt") + 1)
      val agg = ranked.agg(
        sum("cnt").as("n"), sum("cnt_a").as("n_a"),
        sum(col("cnt_a") * col("rank2")).as("r2a"),
        sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tsum"))
      val nb = col("n") - col("n_a")
      val u2a = col("r2a") - col("n_a") * (col("n_a") + 1)
      val mu2 = col("n_a") * nb // 2·E[U] = n_a·n_b
      val varU = (col("n_a") * nb / lit(12.0)) *
        ((col("n") + 1) - col("tsum").cast("double")
          / (col("n") * (col("n") - 1)))
      // a fully-tied sample (one distinct value) has zero rank
      // variance — z undefined, reported NULL rather than an ANSI
      // divide-by-zero
      val z = when(varU === 0, lit(null).cast("double"))
        .otherwise((u2a - mu2).cast("double") / (lit(2.0) * sqrt(varU)))
      agg.select(col("n_a"), nb.as("n_b"),
        (u2a.cast("double") / 2.0).as("u_a"),
        round(z, 4).as("z"), (abs(z) > 1.96).as("significant"))
    }),

    // Hash-sample quantile audit (round 12) — bottom-k-by-hash uniform
    // sampling (the KMV sample re-used as a SAMPLE, not a counter:
    // rows whose seedless md5-u32 is among the k smallest form a
    // uniform random subset, deterministic under repartitioning) with
    // P50/P95 estimated from the 256-row sample AGAINST the exact
    // per-type quantiles — the measured answer to "how wrong are
    // sampled percentiles", which is what a 100 TB engine runs
    // instead of a full sort (q_approx_percentile's library sketch,
    // upgraded to a hash-gated construction — q_hll's discipline).
    // Both sides use the SAME rank rule (1-based ((n−1)·q) div 100
    // + 1 over value-sorted rows) so ties cannot diverge; the values
    // pass through untouched (no arithmetic, no rounding). Scale: the
    // sample rides the bounded TopKStructs heap (k rows per partition
    // cross the wire) — the production path; the exact side is one
    // per-type sort window, the audit's deliberate cost (ann_recall's
    // truth-side argument).
    "q_quantile_sample" -> ((s, d) => {
      import graft.functions.TopKAggregate.topk
      val k = 256
      val h = conv(substring(md5(concat(lit("qs:"),
        col("event_id").cast("string")).cast("binary")), 1, 8), 16, 10)
        .cast("long")
      val ev = events(s, d)
        .select(col("event_type"), col("event_id"), col("value"))
        .localCheckpoint(true) // feeds the sample + the exact sort
      val samp = ev.select(col("event_type"), h.as("h"), col("value"))
        .groupBy("event_type")
        .agg(topk(struct(col("h"), col("value")), k).as("arr"))
        .select(col("event_type"),
          array_sort(col("arr.value")).as("sv"),
          size(col("arr")).as("ns"))
        .select(col("event_type"), col("ns"),
          element_at(col("sv"),
            (expr("((ns - 1) * 50) div 100") + 1).cast("int"))
            .as("p50_est"),
          element_at(col("sv"),
            (expr("((ns - 1) * 95) div 100") + 1).cast("int"))
            .as("p95_est"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("value")
      val exact = ev
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(org.apache.spark.sql
          .expressions.Window.partitionBy("event_type")))
        .select(col("event_type"), col("value"), col("rn"), col("n"))
      val ex = exact
        .withColumn("r50", expr("((n - 1) * 50) div 100") + 1)
        .withColumn("r95", expr("((n - 1) * 95) div 100") + 1)
        .groupBy("event_type")
        .agg(max("n").as("n"),
          max(when(col("rn") === col("r50"), col("value"))).as("p50_exact"),
          max(when(col("rn") === col("r95"), col("value"))).as("p95_exact"))
      ex.join(samp, "event_type")
        .select(col("event_type"), col("n"), col("ns").as("n_sample"),
          col("p50_exact"), col("p50_est"),
          col("p95_exact"), col("p95_est"))
    }),

    // Fixed-REGISTER quantile sketch (round 17) — the histogram
    // member the sketch family still lacked beside the bottom-k
    // sample (q_quantile_sample) and the library call
    // (q_approx_percentile, rows-only): 64 equi-width registers per
    // group over a min/max frame pass, counts merged by ELEMENTWISE
    // ADD (the mergeability spec proves sketch(A)⊎sketch(B) ≡
    // sketch(A∪B) and that the readout agrees), quantiles read by
    // integer interpolation inside the rank's bucket. The error is
    // PROVABLY ≤ one bucket width (est and exact sit in the same
    // bucket by the cumulative-count definition) — emitted as
    // max_err_cq beside the measured abs_err_cq, so the bound is
    // visible, gated (spec) and hash-compared. Everything is integer
    // (centi-units via floor(value·100)): frame, registers, ranks,
    // interpolation — the DuckDB oracle replays all of it. Scale:
    // state is 64 longs per group no matter the row count (q_hll's
    // argument for quantiles); the exact side is the audit's
    // deliberate per-group sort, not the production path.
    "q_quantile_sketch" -> ((s, d) =>
      quantileSketchFrom(events(s, d).select(
        col("event_type").as("g"),
        floor(col("value") * 100).cast("long").as("vq")))),

    // Chi-squared independence test (Pearson 1900, round 12) on the
    // event_type × day-of-week contingency table, with Cramér's V as
    // the effect size — the CATEGORICAL-dependence audit beside
    // q_sql_corr's numeric correlation: is traffic mix a function of
    // weekday at all (feature-selection's first question), asked of
    // counts rather than values. One row: N, table dims, dof, chi²,
    // V = sqrt(chi²/(N·(min(r,c)−1))). Determinism: O/row/col/N are
    // exact integers; each cell's term (O·N − r·c)²/(N·r·c) evaluates
    // in identical double expressions over those integers and
    // floor-quantizes to 1e-6 units BEFORE the cross-cell sum (the §4
    // float-sum rule), so chi² is exact integer micro-units in any
    // partition order. Scale: one hash agg to the (types × 7)-cell
    // table; margins are k-row broadcasts; O·N and r·c approach
    // BIGINT at 1e9-row regimes — the documented DECIMAL(38) swap.
    "q_chi2" -> ((s, d) => {
      val dow = pmod(expr("unix_micros(ts) div 86400000000 + " +
        "(case when unix_micros(ts) % 86400000000 < 0 then -1 else 0 " +
        "end)") + 3, lit(7L))
      val sparse = events(s, d).select(col("event_type"), dow.as("dow"))
        .groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
        .localCheckpoint(true) // feeds the lattice + margins
      // DENSIFY: a zero cell still contributes (r·c/N) to chi² —
      // dropping absent (type, dow) combinations understates the
      // statistic exactly where association is strongest (spec pins
      // the diagonal 2×2 at 20, not the sparse-table 10)
      val cell = sparse.select("event_type").distinct()
        .crossJoin(broadcast(sparse.select("dow").distinct()))
        .join(sparse, Seq("event_type", "dow"), "left")
        .select(col("event_type"), col("dow"),
          coalesce(col("o"), lit(0L)).as("o"))
        .localCheckpoint(true) // feeds margins + the term fold
      val r = cell.groupBy("event_type").agg(sum("o").as("rr"))
      val c = cell.groupBy("dow").agg(sum("o").as("cc"))
      val dims = cell.agg(countDistinct("event_type").as("nt"),
        countDistinct("dow").as("nd"), sum("o").as("n"))
      val dlt = (col("o") * col("n") - col("rr") * col("cc"))
        .cast("double")
      val tq = floor(dlt * dlt
        / (col("n").cast("double") * col("rr") * col("cc")) * 1e6)
        .cast("long")
      cell.join(broadcast(r), "event_type").join(broadcast(c), "dow")
        .crossJoin(broadcast(dims))
        .agg(max("n").as("n"), max("nt").as("n_types"),
          max("nd").as("n_dows"), sum(tq).as("chi2q"))
        .select(col("n"), col("n_types"), col("n_dows"),
          ((col("n_types") - 1) * (col("n_dows") - 1)).as("dof"),
          round(col("chi2q").cast("double") / 1e6, 4).as("chi2"),
          round(sqrt(col("chi2q").cast("double") / 1e6
            / (col("n").cast("double")
              * (least(col("n_types"), col("n_dows")) - 1))), 6)
            .as("cramers_v"))
    }),

    // Per-group OLS trend (round 8) — the metric-trend readout: value
    // regressed on time (fractional epoch-days) per event_type with
    // the native regr_* aggregates — single-scan, codegen'd, no window
    // and no self-join; slope units = value per day.
    "q_ols" -> ((s, d) => {
      val x = unix_micros(col("ts")) / lit(86400000000.0)
      events(s, d).groupBy("event_type").agg(
        count(lit(1)).as("n"),
        round(regr_slope(col("value"), x), 6).as("slope"),
        round(regr_intercept(col("value"), x), 4).as("intercept"),
        round(regr_r2(col("value"), x), 6).as("r2"))
    }),

    // Poisson bootstrap CI (round 8) — the bootstrap that scales: a
    // classic resample would shuffle the data B times; Poisson(1)
    // weights make each replicate a WEIGHTED mean computable in the
    // same scan (Google's production bootstrap), so all 32 replicates
    // are conditional-sum COLUMNS of one hash agg. Weights are exact
    // inverse-CDF draws from the shared 16-bit md5 idiom (integer
    // thresholds — engine-identical), replicate means round to 6
    // before the sort, and the CI is the 2nd/31st order statistic of
    // the 32 replicates (≈ 94% coverage).
    "q_bootstrap" -> ((s, d) => {
      val B = 32
      // cumulative Poisson(1) CDF × 2^16, floored: P(k ≤ 0..6)
      val cums = Seq(24109L, 48226L, 60281L, 64299L, 65304L, 65497L, 65530L)
      def wgt(b: Int): org.apache.spark.sql.Column = {
        val h = conv(substring(md5(concat(col("event_id").cast("string"),
          lit(s":$b")).cast("binary")), 1, 4), 16, 10).cast("long")
        cums.zipWithIndex.foldLeft(when(h < cums.head, 0L)) {
          case (acc, (c, i)) => if (i == 0) acc else acc.when(h < c, i.toLong)
        }.otherwise(7L)
      }
      val aggs = (0 until B).flatMap(b => Seq(
        sum(wgt(b) * col("value")).as(s"s$b"), sum(wgt(b)).as(s"w$b")))
      val head +: tail = aggs :+ count(lit(1)).as("n") :+
        round(avg("value"), 4).as("mean")
      val reps = array_sort(array((0 until B).map(b =>
        round(col(s"s$b") / col(s"w$b"), 6)): _*))
      events(s, d).groupBy("event_type").agg(head, tail: _*)
        .select(col("event_type"), col("n"), col("mean"),
          element_at(reps, 2).as("boot_lo"), element_at(reps, 31).as("boot_hi"))
    }),

    // Changepoint scan (round 8) — where did the metric move? For each
    // event_type, the split day maximizing |mean_before − mean_after|
    // (the exhaustive two-segment scan; CUSUM's batch twin). Candidate
    // evaluation is O(days) via cumulative sums over the DAILY
    // aggregate — the raw stream is reduced once, the scan never
    // touches it again, so the window frames hold ≤ range rows per
    // type. The gap is rounded to 6 BEFORE the argmax so float
    // summation order cannot flip the winner across engines.
    "q_changepoint" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n"), sum("value").as("sv"))
      val byDay = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy("event_type")
      val c = daily
        .withColumn("cn", sum("n").over(byDay))
        .withColumn("cs", sum("sv").over(byDay))
        .withColumn("tn", sum("n").over(whole))
        .withColumn("ts_", sum("sv").over(whole))
        .filter(col("cn") < col("tn"))
        .withColumn("gap", round(abs(col("cs") / col("cn") -
          (col("ts_") - col("cs")) / (col("tn") - col("cn"))), 6))
      c.withColumn("rk", row_number().over(Window.partitionBy("event_type")
          .orderBy(col("gap").desc, col("day"))))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("day").as("split_day"),
          round(col("cs") / col("cn"), 4).as("mean_before"),
          round((col("ts_") - col("cs")) / (col("tn") - col("cn")), 4)
            .as("mean_after"),
          col("gap"))
    }),

    // Benford first-digit audit (round 8) — the fabricated-data smell
    // test: observed first-significant-digit shares of order totals vs
    // the Benford expectation log10(1+1/d). First digit via
    // floor→string (identical truncation in both engines — a log10
    // formulation risks cross-engine rounding at power-of-10 edges).
    // One scan, one 9-row hash agg; the total rides the 9-row window.
    "q_benford" -> ((s, d) => {
      val digit = substring(floor(col("o_totalprice")).cast("long")
        .cast("string"), 1, 1).cast("int")
      val byAll = org.apache.spark.sql.expressions.Window.partitionBy()
      orders(s, d)
        .filter(col("o_totalprice") >= 1.0)
        .groupBy(digit.as("d")).agg(count(lit(1)).as("n"))
        .withColumn("obs_frac", round(col("n") / sum("n").over(byAll), 6))
        .withColumn("benford_frac",
          round(log10(lit(1.0) + lit(1.0) / col("d")), 6))
        .select("d", "n", "obs_frac", "benford_frac")
    }),

    // RFM segmentation (round 8) — the classic customer-value cut:
    // per-user recency (latest purchase instant, integer µs),
    // frequency, monetary over purchases, each scored 1-3 against
    // GLOBAL tercile cuts. The cuts are one 6-value row (the
    // text_quality_bins pattern — a whitelisted 1-row broadcast, the
    // scale-safe alternative to a global-sort ntile); scoring is
    // per-row column math.
    "q_rfm" -> ((s, d) => {
      val pur = events(s, d).filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(
          max(unix_micros(col("ts"))).as("r_us"),
          count(lit(1)).as("f"),
          round(sum("value"), 2).as("m"))
      val cuts = pur.agg(
        round(expr("percentile(r_us, 0.3333333333333333)"), 4).as("r1"),
        round(expr("percentile(r_us, 0.6666666666666666)"), 4).as("r2"),
        round(expr("percentile(f, 0.3333333333333333)"), 4).as("f1"),
        round(expr("percentile(f, 0.6666666666666666)"), 4).as("f2"),
        round(expr("percentile(m, 0.3333333333333333)"), 4).as("m1"),
        round(expr("percentile(m, 0.6666666666666666)"), 4).as("m2"))
      def score(v: org.apache.spark.sql.Column, c1: org.apache.spark.sql.Column,
          c2: org.apache.spark.sql.Column) =
        when(v <= c1, 1L).when(v <= c2, 2L).otherwise(3L)
      pur.join(broadcast(cuts))
        .select(col("user_id"), col("r_us"), col("f"), col("m"),
          score(col("r_us"), col("r1"), col("r2")).as("r_score"),
          score(col("f"), col("f1"), col("f2")).as("f_score"),
          score(col("m"), col("m1"), col("m2")).as("m_score"))
        .withColumn("rfm", concat(col("r_score").cast("string"),
          col("f_score").cast("string"), col("m_score").cast("string")))
    }),

    // k-anonymity audit (round 8) — the governance gate a dataset
    // passes before publication: quasi-identifier = (nation, market
    // segment); rows whose QI group has fewer than k members are
    // re-identifiable. Two hash aggs (group sizes, then the risk
    // rollup) — group count is bounded by the QI domain, never rows.
    "q_k_anon" -> ((s, d) => {
      val k = 5
      customer(s, d)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("gsize"))
        .agg(count(lit(1)).as("n_groups"),
          sum("gsize").as("n_rows"),
          sum(when(col("gsize") < k, 1L).otherwise(0L)).as("n_groups_lt_k"),
          sum(when(col("gsize") < k, col("gsize")).otherwise(0L))
            .as("n_rows_at_risk"),
          min("gsize").as("min_gsize"))
        .withColumn("k", lit(k.toLong))
    }),

    // l-diversity audit (round 11) — k-anonymity's necessary
    // companion: a QI group can be k-large yet reveal everyone's
    // sensitive value if the group is sensitive-homogeneous. Per
    // (nation, segment) QI group: size, count of DISTINCT sensitive
    // values (account-balance band), and the at-risk flag
    // (distinct < l). Two hash aggs; output bounded by the QI domain,
    // never rows — same scale shape as q_k_anon.
    "q_l_diversity" -> ((s, d) => {
      val l = 3
      customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 2000).cast("long").as("band"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("gsize"),
          countDistinct("band").as("n_sens"))
        .withColumn("l", lit(l.toLong))
        .withColumn("at_risk", col("n_sens") < l)
    }),

    // Differentially-private count release (round 11) — the geometric
    // mechanism (Ghosh–Roughgarden–Sundararajan 2009): per-nation
    // customer counts + two-sided-geometric noise, the DISCRETE
    // Laplace that makes ε-DP exact on integers. The draw is the
    // shared 16-bit md5 idiom (u16 of 'dp:'||key) compared against
    // inverse-CDF THRESHOLD LITERALS computed once in Scala and
    // inlined into BOTH plans (the ann codebook trick) — noise is
    // pure integer branching, bit-identical in any engine; no ln/exp
    // ever evaluates inside either engine. Per-row column math over a
    // k-row aggregate; released value clamps at 0. (The md5 draw
    // makes the release REPLAYABLE for the gate; a production release
    // would swap in a secret seed — same plan, different literal.)
    "q_dp_count" -> ((s, d) => {
      val noise = dpNoiseThresholds // (threshold, k) ascending
      val u = expr("conv(substring(md5(cast(concat('dp:', " +
        "cast(c_nationkey as string)) as binary)), 1, 4), 16, 10)")
        .cast("long")
      val noiseCol = noise.init.foldRight(lit(noise.last._2.toLong)) {
        case ((t, k), e) => when(u < t, k.toLong).otherwise(e)
      }
      customer(s, d)
        .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
        .withColumn("noise", noiseCol)
        .withColumn("n_noisy", greatest(lit(0L), col("n") + col("noise")))
    }),

    // t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) —
    // the third leg of the privacy triad: a QI group can be k-large
    // AND l-diverse yet still leak if its sensitive DISTRIBUTION sits
    // far from the global one (the paper's salary example: diverse
    // but all-low). Per (nation, segment) QI group: Earth Mover's
    // Distance of the ordered sensitive attribute (acct-balance band,
    // q_l_diversity's banding) to the global distribution, at_risk =
    // emd > t. For ordered equi-spaced categories EMD reduces to
    // (1/(m−1))·Σᵢ|cum(p−q)|ᵢ (the paper §4.2), and cross-multiplying
    // the two fractions by gsize·N makes every cumulative term an
    // EXACT integer: Dᵢ = |Σ_{j≤i}(cntⱼ·N − totⱼ·gsize)| — products in
    // DECIMAL(38,0) because cnt·N overflows BIGINT once group and
    // corpus counts are both ~10⁹ (embed_dimstats' discipline); ONE
    // float division per group at the end. Scale shape: two hash aggs
    // (band domain, QI-group sizes) + a groups×bands densification
    // cross join BOUNDED by the QI×band domain (never rows — the
    // zero-fill is what makes the cumulative sums correct, the q_chi2
    // lesson), a band-domain-width window per group, one hash agg
    // back to groups.
    "q_t_closeness" -> ((s, d) =>
      tClosenessFrom(customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 2000).cast("long").as("band")))),

    // Neyman-allocated stratified sample (Neyman JRSS 1934; round 13)
    // — the statistically-OPTIMAL mixture sampler completing the
    // family between uniform q_sample, equal-n q_mixture and
    // quality-weighted text_weighted_sample: a fixed budget of 500
    // rows splits across event types ∝ N_h·σ_h (big AND noisy strata
    // get more), which minimizes the variance of the stratified mean
    // estimator. Output: the drawn rows (type, rank, event_id) with
    // each stratum's n/allocation alongside. Determinism: σ_h comes
    // from exact integer moments over vq = floor(value·1e4) (n·Q − S²
    // in DECIMAL(38,0) — it overflows BIGINT already at sf0.1), one
    // fixed sqrt per stratum, weight floor-quantized to an integer
    // BEFORE the allocation division (B·w_h) div Σw, then the
    // LARGEST-REMAINDER seat fill (Hamilton's method): the B − Σfloor
    // leftover rows go to the biggest (B·w_h) mod Σw remainders (ties
    // to type name), so the allocations sum to exactly B whenever
    // Σw > 0 — all integer ranking, no float apportionment; the draw
    // is bottom-rank by seedless md5 (h, id) — deterministic
    // under any repartitioning, q_quantile_sample's sampler. Scale:
    // one events-sized hash agg to k strata rows; the draw rides the
    // bounded TopKStructs heap (B rows per partition per stratum cross
    // the wire, never the stratum); the rank window runs over ≤ k·B
    // heap survivors.
    "q_neyman" -> ((s, d) => {
      import graft.functions.TopKAggregate.topk
      import org.apache.spark.sql.expressions.Window
      val dec = "decimal(38,0)"
      val budget = 500
      val vq = floor(col("value") * 10000).cast("long")
      val h = conv(substring(md5(concat(lit("ny:"),
        col("event_id").cast("string")).cast("binary")), 1, 8), 16, 10)
        .cast("long")
      val ev = events(s, d)
        .select(col("event_type"), col("event_id"), vq.as("vq"), h.as("h"))
        .localCheckpoint(true) // feeds the moment pass + the draw pass
      val g = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("vq").as("sg"),
          sum((col("vq") * col("vq")).cast(dec)).as("qg"))
      val varh = (col("n").cast(dec) * col("qg")
        - col("sg").cast(dec) * col("sg").cast(dec)).cast("double") /
        (col("n").cast("double") * (col("n") - 1).cast("double"))
      val w = g.select(col("event_type"), col("n"),
        floor(col("n").cast("double") * sqrt(varh)).cast("long").as("wq"))
      val wk = org.apache.spark.sql.expressions.Window
        .orderBy(col("rem").desc, col("event_type"))
      val wall = org.apache.spark.sql.expressions.Window.partitionBy()
      val alloc = w
        .crossJoin(broadcast(w.agg(sum("wq").as("tw"))))
        .select(col("event_type"), col("n"),
          expr(s"case when tw = 0 then 0 else ($budget * wq) div tw end")
            .as("a0"),
          expr(s"case when tw = 0 then 0 else ($budget * wq) % tw end")
            .as("rem"))
        .withColumn("leftover", lit(budget.toLong) - sum("a0").over(wall))
        .withColumn("rk", row_number().over(wk))
        .select(col("event_type"), col("n"),
          (col("a0") + when(col("rk") <= col("leftover") && col("rem") > 0,
            1L).otherwise(0L)).as("alloc"))
      val drawn = ev.groupBy("event_type")
        .agg(topk(struct(col("h"), col("event_id")), budget).as("arr"))
        .select(col("event_type"),
          posexplode(array_sort(col("arr"))).as(Seq("i", "t")))
        .select(col("event_type"), (col("i") + 1).cast("long").as("rn"),
          col("t.event_id").as("event_id"))
      drawn.join(broadcast(alloc), "event_type")
        .where(col("rn") <= col("alloc"))
        .select(col("event_type"), col("rn"), col("event_id"),
          col("alloc"), col("n"))
    }),

    // Two-sample Kolmogorov–Smirnov test (Kolmogorov 1933, Smirnov
    // 1939; round 13) — do purchase and view VALUES come from the
    // same distribution AT ALL? The distribution-shape audit beside
    // q_mann_whitney's location test and q_ab_test's mean test: D =
    // sup|F₁−F₂| reacts to ANY difference (spread, shape, tails),
    // where the rank test sees only stochastic dominance (a variance
    // change with equal medians is invisible to U, spec-pinned).
    // Exactness: the statistic never exists as a float until the last
    // row — at each distinct merged value the scaled gap |c₁·n₂ −
    // c₂·n₁| is an exact integer (cross-multiplying D·n₁·n₂ clears
    // both denominators; DECIMAL(38,0) because cum·n products
    // overflow BIGINT once both arms are ~10⁹ rows — embed_dimstats'
    // discipline), the max is an integer max, and d/crit/significant
    // are one fixed double expression. d_loc = the SMALLEST value
    // attaining the max gap (deterministic tie-break). Scale: one
    // hash agg to the DISTINCT-value table (bounded by the value
    // domain, q_histogram's argument), one ordered cumulative window
    // over it, a 1-row max broadcast joined back for the argmax, one
    // 1-row fold. Significance: the asymptotic large-sample rejection
    // rule d > c(α)·sqrt((n₁+n₂)/(n₁n₂)), c(0.05) = 1.358.
    "q_ks_test" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val dec = "decimal(38,0)"
      val pv = events(s, d)
        .filter(col("event_type").isin("purchase", "view"))
        .groupBy("value")
        .agg(count(when(col("event_type") === "purchase", 1)).as("c1"),
          count(when(col("event_type") === "view", 1)).as("c2"))
      val wc = Window.orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wall = Window.partitionBy()
      val cum = pv
        .withColumn("f1", sum("c1").over(wc).cast(dec))
        .withColumn("f2", sum("c2").over(wc).cast(dec))
        .withColumn("n1", sum("c1").over(wall).cast(dec))
        .withColumn("n2", sum("c2").over(wall).cast(dec))
        .select(col("value"), col("n1"), col("n2"),
          abs(col("f1") * col("n2") - col("f2") * col("n1")).as("gap"))
        .localCheckpoint(true) // feeds the max fold + the argmax probe
      val mx = cum.agg(max("gap").as("gmax"),
        max("n1").as("n1"), max("n2").as("n2"),
        count(lit(1)).as("n_distinct"))
      val loc = cum.join(broadcast(mx.select("gmax")),
          col("gap") === col("gmax"))
        .agg(min("value").as("d_loc"))
      val dd = col("gmax").cast("double") /
        (col("n1") * col("n2")).cast("double")
      val crit = lit(1.358) * sqrt((col("n1") + col("n2")).cast("double")
        / (col("n1") * col("n2")).cast("double"))
      mx.crossJoin(broadcast(loc)).select(
        col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
        col("n_distinct"), round(dd, 6).as("d"), col("d_loc"),
        round(crit, 6).as("crit05"), (dd > crit).as("significant"))
    }),

    // One-way ANOVA F-test (Fisher 1925; round 13) of value across
    // ALL event types — q_ab_test generalized from 2 arms to k: does
    // the type explain ANY of the value variance (the k-group screen
    // run before pairwise tests), with eta² = SSB/SST as the effect
    // size. Exactness discipline: per row value quantizes to vq =
    // floor(value·1e4) BEFORE any sum, so per-group n/S=Σvq/Q=Σvq²
    // are exact integers (Q in DECIMAL(38,0) — vq² alone is ~10¹⁶ and
    // the sum ANSI-overflows BIGINT at real row counts); each group's
    // S²/n term floors to WHOLE vq² units over those integers
    // (q_chi2's rule — at this grain the term is already ~10¹⁴
    // quanta; a finer 1e6 sub-grain would push it past BOTH engines'
    // exact ranges, and Spark's floor() saturates at Long.MaxValue
    // where DuckDB's stays DOUBLE→DECIMAL — measured 27× divergence
    // before this grain was chosen) so SSB/SSW are exact integer
    // units in any partition order; F and eta² are one fixed double
    // expression. SSB/SSW report in value² units (÷1e8 for the two
    // vq factors). Headroom: the term saturates Spark's floor→LONG
    // once sg²/ng > 9.2e18 (group Σvq beyond ~3e9·√ng) — the
    // documented swap there is x−x%1 floored in double, cast decimal.
    // Scale: one events-sized hash agg to k rows, one k-row fold.
    "q_anova" -> ((s, d) => {
      val dec = "decimal(38,0)"
      val vq = floor(col("value") * 10000).cast("long")
      val g = events(s, d).select(col("event_type"), vq.as("vq"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("ng"), sum("vq").as("sg"),
          sum((col("vq") * col("vq")).cast(dec)).as("qg"))
      val termq = floor(col("sg").cast("double") * col("sg").cast("double")
        / col("ng").cast("double")).cast(dec)
      val a = g.agg(count(lit(1)).as("k"), sum("ng").as("n"),
        sum("sg").as("stot"), sum("qg").as("qtot"),
        sum(termq).as("tsum"))
      val grandq = floor(col("stot").cast("double") * col("stot").cast("double")
        / col("n").cast("double")).cast(dec)
      val ssbq = (col("tsum") - grandq).cast("double")
      val sswq = (col("qtot") - col("tsum")).cast("double")
      val f = (ssbq / (col("k") - 1).cast("double")) /
        (sswq / (col("n") - col("k")).cast("double"))
      a.select(col("n"), col("k"),
        round(ssbq / 1e8, 4).as("ssb"), round(sswq / 1e8, 4).as("ssw"),
        round(f, 4).as("f"),
        round(ssbq / (ssbq + sswq), 6).as("eta2"))
    })
  )

  /** The t-closeness kernel over any (c_nationkey, c_mktsegment, band)
    * frame — public to the test JVM for the planted-distribution gate. */
  private[graft] def tClosenessFrom(bands: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val dec = "decimal(38,0)"
      val glob = bands.groupBy("band").agg(count(lit(1)).as("tot"))
      val m1 = glob.agg(count(lit(1)).as("m"), sum("tot").as("n_all"))
      val groups = bands.groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("gsize"))
      val cnts = bands.groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      groups.crossJoin(broadcast(glob)).crossJoin(broadcast(m1))
        .join(cnts, Seq("c_nationkey", "c_mktsegment", "band"), "left")
        .withColumn("cnt0", coalesce(col("cnt"), lit(0L)))
        .withColumn("dterm",
          col("cnt0").cast(dec) * col("n_all").cast(dec)
            - col("tot").cast(dec) * col("gsize").cast(dec))
        .withColumn("cumd", sum("dterm").over(w))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(max("gsize").as("gsize"), sum(abs(col("cumd"))).as("emd_num"),
          max("m").as("m"), max("n_all").as("n_all"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("gsize"),
          when(col("m") === 1, lit(0.0)).otherwise(
            round(col("emd_num").cast("double") /
              (col("gsize").cast("double") * col("n_all").cast("double")
                * (col("m") - 1).cast("double")), 6)).as("emd"))
        .withColumn("t", lit(0.2))
        .withColumn("at_risk", col("emd") > 0.2)
  }

  /** Inverse-CDF thresholds for the two-sided geometric (discrete
    * Laplace) mechanism at ε = 0.5, on the 16-bit grid: noise = k for
    * the FIRST threshold t with u16 < t, else +20 (tails clamped at
    * ±20 — beyond 8σ, identically in both engines). Computed once
    * here; both the Spark plan and the DuckDB oracle inline these
    * exact longs. */
  private[graft] lazy val dpNoiseThresholds: Seq[(Long, Int)] = {
    val eps = 0.5
    val alpha = math.exp(-eps)
    val p0 = (1 - alpha) / (1 + alpha)
    var cdf = 0.0
    (-20 to 19).map { k =>
      cdf += p0 * math.pow(alpha, math.abs(k))
      (math.floor(cdf * 65536).toLong, k)
    } :+ ((65536L, 20))
  }

  /** Register count for the histogram quantile sketch — the shared
    * kernel's (one bucket rule for batch and stream). */
  private[graft] val QSketchB = graft.functions.QSketch.B

  /** The frame pass: per-group (lo, hi, n) over (g, vq) rows. */
  private[graft] def qsketchFrame(ev: DataFrame): DataFrame =
    ev.groupBy("g").agg(min("vq").as("lo"), max("vq").as("hi"),
      count(lit(1)).as("n"))

  /** The register pass: per-group bucket counts against a SHARED
    * frame — the mergeable state (merging partial sketches built on
    * the same frame is elementwise addition; the spec proves it).
    * Bucketing through [[graft.functions.QSketch]] — the streaming
    * face sketches through the same expression, and the kernel's
    * edge clamp is a no-op here because the frame IS the min/max. */
  private[graft] def qsketchCounts(ev: DataFrame,
      frame: DataFrame): DataFrame =
    ev.join(broadcast(frame.select("g", "lo", "hi")), "g")
      .select(col("g"), graft.functions.QSketch.bucket.as("b"))
      .groupBy("g", "b").agg(count(lit(1)).as("cb"))

  /** Quantile readout from registers + frame: integer interpolation
    * inside the bucket whose cumulative count crosses the rank. */
  private[graft] def qsketchReadout(counts: DataFrame,
      frame: DataFrame, qs: Seq[Int]): DataFrame = {
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("b")
    val cum = counts.withColumn("c1", sum("cb").over(wc))
      .withColumn("c0", col("c1") - col("cb"))
    val rq = frame.select(col("g"), col("n"), col("lo"), col("hi"),
        explode(array(qs.map(q => struct(lit(q).as("q"),
          (expr(s"((n - 1) * $q) div 100") + lit(1L)).as("r"))): _*))
          .as("qr"))
      .select(col("g"), col("n"), col("lo"), col("hi"),
        col("qr.q").as("q"), col("qr.r").as("r"))
    rq.join(cum, "g")
      .where(col("c0") < col("r") && col("r") <= col("c1"))
      .withColumn("span1", col("hi") - col("lo") + 1)
      .withColumn("lbs",
        col("lo") + expr(s"(b * span1 + ${QSketchB - 1}) div $QSketchB"))
      .withColumn("ubs", col("lo") +
        expr(s"((b + 1) * span1 + ${QSketchB - 1}) div $QSketchB"))
      .withColumn("est_cq",
        col("lbs") + expr("((r - c0 - 1) * (ubs - lbs)) div cb"))
      .select("g", "q", "n", "r", "span1", "est_cq")
  }

  /** The full sketch-vs-exact audit over (g, vq) rows — public to the
    * test JVM for the mergeability and error-bound gates. */
  private[graft] def quantileSketchFrom(ev0: DataFrame,
      qs: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    val ev = ev0.localCheckpoint(true) // frame + registers + exact
    val frame = qsketchFrame(ev)
    val est = qsketchReadout(qsketchCounts(ev, frame), frame, qs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("vq")
    val ex = ev.withColumn("rn", row_number().over(w))
      .join(est.select(col("g"), col("q"), col("r")), "g")
      .where(col("rn") === col("r"))
      .select(col("g"), col("q"), col("vq").as("exact_cq"))
    est.join(ex, Seq("g", "q"))
      .select(col("g").as("event_type"), col("q"), col("n"),
        col("exact_cq"), col("est_cq"),
        abs(col("est_cq") - col("exact_cq")).as("abs_err_cq"),
        expr("(abs(est_cq - exact_cq) * 10000) div span1")
          .as("err_span_bp"),
        expr(s"(span1 + ${QSketchB - 1}) div $QSketchB")
          .as("max_err_cq"))
  }

  def oracles: Map[String, String] = Map(
    "q_percentile" ->
      """SELECT event_type, round(quantile_cont(value, 0.5),4) AS p50,
        |  round(quantile_cont(value, 0.9),4) AS p90, count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    // replay the histogram sketch end to end: frame, 64 equi-width
    // registers, rank rule, integer interpolation, exact rank audit
    "q_quantile_sketch" ->
      """WITH ev AS (SELECT event_type AS g,
        |    CAST(floor(value * 100) AS BIGINT) AS vq FROM events),
        |fr AS (SELECT g, min(vq) AS lo, max(vq) AS hi, count(*) AS n
        |  FROM ev GROUP BY g),
        |cnts AS (SELECT ev.g, ((vq - lo) * 64) // (hi - lo + 1) AS b,
        |    count(*) AS cb
        |  FROM ev JOIN fr ON fr.g = ev.g GROUP BY 1, 2),
        |cum AS (SELECT g, b, cb,
        |    sum(cb) OVER (PARTITION BY g ORDER BY b) AS c1,
        |    sum(cb) OVER (PARTITION BY g ORDER BY b) - cb AS c0
        |  FROM cnts),
        |rq AS (SELECT g, n, lo, hi, qq.q AS q,
        |    ((n - 1) * qq.q) // 100 + 1 AS r
        |  FROM fr, (SELECT unnest([50, 90, 99]) AS q) qq),
        |est AS (SELECT rq.g, rq.q, rq.n, rq.r, hi - lo + 1 AS span1,
        |    lo + (b * (hi - lo + 1) + 63) // 64
        |      + ((rq.r - c0 - 1) * ((lo + ((b + 1) * (hi - lo + 1) + 63) // 64)
        |          - (lo + (b * (hi - lo + 1) + 63) // 64))) // cb AS est_cq
        |  FROM rq JOIN cum ON cum.g = rq.g
        |    AND c0 < rq.r AND rq.r <= c1),
        |rn AS (SELECT g, vq,
        |    row_number() OVER (PARTITION BY g ORDER BY vq) AS rn
        |  FROM ev),
        |ex AS (SELECT rq.g, rq.q, vq AS exact_cq
        |  FROM rq JOIN rn ON rn.g = rq.g AND rn.rn = rq.r)
        |SELECT e.g AS event_type, CAST(e.q AS INT) AS q, e.n,
        |  ex.exact_cq, CAST(e.est_cq AS BIGINT) AS est_cq,
        |  CAST(abs(e.est_cq - ex.exact_cq) AS BIGINT) AS abs_err_cq,
        |  CAST((abs(e.est_cq - ex.exact_cq) * 10000) // e.span1
        |    AS BIGINT) AS err_span_bp,
        |  CAST((e.span1 + 63) // 64 AS BIGINT) AS max_err_cq
        |FROM est e JOIN ex ON ex.g = e.g AND ex.q = e.q""".stripMargin,
    "q_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_label_centroid" ->
      """SELECT label, pos AS dim, round(avg(v),5) AS c FROM (
        |  SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
        |    generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings)
        |GROUP BY label, pos""".stripMargin,
    "q_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
        |  < CASE WHEN lang = 'en' THEN 26214 ELSE 13107 END""".stripMargin,
    "q_split" ->
      """WITH h AS (
        |  SELECT lang, n_chars,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) AS hv
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN hv < 52429 THEN 'train'
        |       WHEN hv < 58982 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
        |FROM h GROUP BY 1, 2""".stripMargin,
    "q_mixture" ->
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        |t AS (SELECT min(cnt) AS target FROM c),
        |r AS (
        |  SELECT doc_id, lang, row_number() OVER (
        |    PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, lang FROM r, t WHERE rk <= t.target""".stripMargin,
    "text_source_cap" ->
      """WITH r AS (
        |  SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, source FROM r WHERE rk <= 15""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice/25000)*25000 AS BIGINT) AS bucket,
        |  count(*) AS n, round(avg(o_totalprice),2) AS avg_price
        |FROM orders GROUP BY 1""".stripMargin,
    "q_drift" ->
      """WITH ev AS (SELECT event_type, value, epoch_us(ts) AS ts_us FROM events),
        |b AS (SELECT (min(ts_us) + max(ts_us)) // 2 AS sp FROM ev),
        |binned AS (SELECT event_type,
        |    CASE WHEN ts_us < sp THEN 'ref' ELSE 'cur' END AS win,
        |    greatest(0, least(9, CAST(floor(value / 50.0) AS BIGINT))) AS bin
        |  FROM ev, b),
        |cnt AS (SELECT event_type, win, bin, count(*) AS n
        |  FROM binned GROUP BY 1, 2, 3),
        |tw AS (SELECT DISTINCT event_type, win FROM binned),
        |filled AS (SELECT tw.event_type, tw.win, g.bin, coalesce(c.n, 0) AS n
        |  FROM tw CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) g
        |  LEFT JOIN cnt c ON c.event_type = tw.event_type
        |    AND c.win = tw.win AND c.bin = g.bin),
        |tot AS (SELECT event_type, win, sum(n) AS tot
        |  FROM filled GROUP BY 1, 2),
        |p AS (SELECT f.event_type, f.win, f.bin,
        |    (f.n + 1.0) / (t.tot + 10.0) AS prop
        |  FROM filled f JOIN tot t USING (event_type, win))
        |SELECT r.event_type,
        |  round(sum((c.prop - r.prop) * ln(c.prop / r.prop)), 4) AS psi
        |FROM p r JOIN p c ON r.event_type = c.event_type AND r.bin = c.bin
        |  AND r.win = 'ref' AND c.win = 'cur'
        |GROUP BY r.event_type""".stripMargin,
    "q_winsorize" ->
      """WITH c AS (SELECT event_type,
        |    round(quantile_cont(value, 0.05), 4) AS p05,
        |    round(quantile_cont(value, 0.95), 4) AS p95
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN e.value < c.p05 OR e.value > c.p95
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_capped,
        |  c.p05, c.p95,
        |  round(avg(e.value), 4) AS mean_raw,
        |  round(avg(least(greatest(e.value, c.p05), c.p95)), 4) AS mean_wins
        |FROM events e JOIN c USING (event_type)
        |GROUP BY e.event_type, c.p05, c.p95""".stripMargin,
    "q_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS n_events, round(sum(value), 2) AS day_total
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, unnest(range(min(day), max(day) + 1)) AS day
        |  FROM daily GROUP BY user_id)
        |SELECT g.user_id, g.day,
        |  CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events, d.day_total,
        |  d.n_events IS NULL AS is_filled,
        |  last_value(d.day_total IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_total
        |FROM grid g LEFT JOIN daily d USING (user_id, day)""".stripMargin,
    "q_ab_test" ->
      """WITH a AS (
        |  SELECT count(CASE WHEN user_id % 2 = 0 THEN 1 END) AS n_a,
        |    count(CASE WHEN user_id % 2 <> 0 THEN 1 END) AS n_b,
        |    avg(CASE WHEN user_id % 2 = 0 THEN value END) AS m_a,
        |    avg(CASE WHEN user_id % 2 <> 0 THEN value END) AS m_b,
        |    var_samp(CASE WHEN user_id % 2 = 0 THEN value END) AS v_a,
        |    var_samp(CASE WHEN user_id % 2 <> 0 THEN value END) AS v_b
        |  FROM events WHERE event_type = 'purchase')
        |SELECT n_a, n_b, round(m_a, 4) AS mean_a, round(m_b, 4) AS mean_b,
        |  round((m_a - m_b) / sqrt(v_a/n_a + v_b/n_b), 4) AS t_stat,
        |  round(pow(v_a/n_a + v_b/n_b, 2) /
        |    (pow(v_a/n_a, 2)/(n_a - 1) + pow(v_b/n_b, 2)/(n_b - 1)), 2) AS dof,
        |  abs((m_a - m_b) / sqrt(v_a/n_a + v_b/n_b)) > 1.96 AS significant
        |FROM a""".stripMargin,
    "q_gini" ->
      """WITH sp AS (SELECT o_custkey,
        |    sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS sp
        |  FROM orders GROUP BY 1),
        |rk AS (SELECT sp,
        |    CAST(row_number() OVER (ORDER BY sp, o_custkey) AS BIGINT) AS i,
        |    count(*) OVER () AS nn
        |  FROM sp),
        |a AS (SELECT count(*) AS n, sum(sp) AS tot,
        |    sum(CAST(i AS HUGEINT) * sp) AS isum,
        |    sum(CASE WHEN i > (9 * nn) // 10 THEN sp ELSE 0 END) AS top
        |  FROM rk)
        |SELECT CAST(n AS BIGINT) AS n_customers,
        |  CAST(tot AS BIGINT) AS total_cents,
        |  round(2.0 * CAST(isum AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
        |    - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini,
        |  round(CAST(top AS DOUBLE) / CAST(tot AS DOUBLE), 6)
        |    AS top_decile_share
        |FROM a""".stripMargin,

    "q_quantile_sample" ->
      """WITH ev AS (SELECT event_type, event_id, value FROM events),
        |h AS (SELECT event_type, value,
        |    CAST(('0x'||substr(md5('qs:'||CAST(event_id AS VARCHAR)),1,8))
        |      AS BIGINT) AS h FROM ev),
        |r AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h, value)
        |      AS rk
        |  FROM h),
        |s2 AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value)
        |      AS vr,
        |    count(*) OVER (PARTITION BY event_type) AS ns
        |  FROM r WHERE rk <= 256),
        |sq AS (SELECT event_type, CAST(max(ns) AS BIGINT) AS ns,
        |    max(CASE WHEN vr = ((ns - 1) * 50) // 100 + 1
        |        THEN value END) AS p50_est,
        |    max(CASE WHEN vr = ((ns - 1) * 95) // 100 + 1
        |        THEN value END) AS p95_est
        |  FROM s2 GROUP BY 1),
        |e2 AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value)
        |      AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM ev),
        |ex AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        |    max(CASE WHEN rn = ((n - 1) * 50) // 100 + 1
        |        THEN value END) AS p50_exact,
        |    max(CASE WHEN rn = ((n - 1) * 95) // 100 + 1
        |        THEN value END) AS p95_exact
        |  FROM e2 GROUP BY 1)
        |SELECT ex.event_type, ex.n, sq.ns AS n_sample,
        |  ex.p50_exact, sq.p50_est, ex.p95_exact, sq.p95_est
        |FROM ex JOIN sq USING (event_type)""".stripMargin,

    "q_chi2" ->
      """WITH sparse AS (SELECT event_type,
        |    ((epoch_us(ts) // 86400000000
        |      + (CASE WHEN epoch_us(ts) % 86400000000 < 0
        |         THEN -1 ELSE 0 END) + 3) % 7 + 7) % 7 AS dow,
        |    count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |cell AS (SELECT t.event_type, d.dow, COALESCE(s.o, 0) AS o
        |  FROM (SELECT DISTINCT event_type FROM sparse) t
        |  CROSS JOIN (SELECT DISTINCT dow FROM sparse) d
        |  LEFT JOIN sparse s USING (event_type, dow)),
        |r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rr
        |  FROM cell GROUP BY 1),
        |c AS (SELECT dow, CAST(sum(o) AS BIGINT) AS cc
        |  FROM cell GROUP BY 1),
        |dims AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS nt,
        |    CAST(count(DISTINCT dow) AS BIGINT) AS nd,
        |    CAST(sum(o) AS BIGINT) AS n FROM cell),
        |terms AS (SELECT
        |    CAST(floor(
        |      CAST(o * n - rr * cc AS DOUBLE)
        |        * CAST(o * n - rr * cc AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * rr * cc) * 1e6) AS BIGINT) AS tq,
        |    n, nt, nd
        |  FROM cell JOIN r USING (event_type) JOIN c USING (dow)
        |    CROSS JOIN dims)
        |SELECT max(n) AS n, max(nt) AS n_types, max(nd) AS n_dows,
        |  (max(nt) - 1) * (max(nd) - 1) AS dof,
        |  round(CAST(sum(tq) AS DOUBLE) / 1e6, 4) AS chi2,
        |  round(sqrt(CAST(sum(tq) AS DOUBLE) / 1e6
        |    / (CAST(max(n) AS DOUBLE)
        |      * (least(max(nt), max(nd)) - 1))), 6) AS cramers_v
        |FROM terms""".stripMargin,

    "q_mann_whitney" ->
      """WITH pv AS (SELECT value, count(*) AS cnt,
        |    count(CASE WHEN user_id % 2 = 0 THEN 1 END) AS cnt_a
        |  FROM events WHERE event_type = 'purchase' GROUP BY value),
        |rk AS (SELECT *,
        |    2 * (sum(cnt) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
        |      + cnt + 1 AS rank2
        |  FROM pv),
        |a AS (SELECT sum(cnt) AS n, sum(cnt_a) AS n_a,
        |    sum(cnt_a * rank2) AS r2a,
        |    sum(cnt * cnt * cnt - cnt) AS tsum
        |  FROM rk),
        |v AS (SELECT *, (n_a * (n - n_a) / 12.0)
        |    * ((n + 1) - CAST(tsum AS DOUBLE) / (n * (n - 1))) AS var_u
        |  FROM a)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n - n_a AS BIGINT) AS n_b,
        |  CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
        |  CASE WHEN var_u = 0 THEN NULL ELSE
        |    round(CAST((r2a - n_a * (n_a + 1)) - n_a * (n - n_a) AS DOUBLE)
        |      / (2.0 * sqrt(var_u)), 4) END AS z,
        |  CASE WHEN var_u = 0 THEN NULL ELSE
        |    abs(CAST((r2a - n_a * (n_a + 1)) - n_a * (n - n_a) AS DOUBLE)
        |      / (2.0 * sqrt(var_u))) > 1.96 END AS significant
        |FROM v""".stripMargin,
    "q_ols" ->
      """SELECT event_type, count(*) AS n,
        |  round(regr_slope(value, epoch_us(ts) / 86400000000.0), 6) AS slope,
        |  round(regr_intercept(value, epoch_us(ts) / 86400000000.0), 4)
        |    AS intercept,
        |  round(regr_r2(value, epoch_us(ts) / 86400000000.0), 6) AS r2
        |FROM events GROUP BY 1""".stripMargin,
    "q_bootstrap" -> {
      // the same 32 Poisson-weight conditional sums, generated in
      // DuckDB's dialect from the same integer thresholds
      val cums = Seq(24109, 48226, 60281, 64299, 65304, 65497, 65530)
      def w(b: Int): String = {
        val h = s"CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) " +
          s"|| ':$b'), 1, 4)) AS INT)"
        val whens = cums.zipWithIndex
          .map { case (c, k) => s"WHEN $h < $c THEN $k" }.mkString(" ")
        s"(CASE $whens ELSE 7 END)"
      }
      val sums = (0 until 32).map(b =>
        s"sum(${w(b)} * value) AS s$b, sum(${w(b)}) AS w$b").mkString(",\n")
      val reps = (0 until 32).map(b => s"round(s$b / w$b, 6)").mkString(", ")
      s"""WITH a AS (
         |  SELECT event_type, count(*) AS n, round(avg(value), 4) AS mean,
         |$sums
         |  FROM events GROUP BY 1),
         |r AS (SELECT event_type, n, mean,
         |    list_sort([$reps]) AS reps FROM a)
         |SELECT event_type, n, mean, reps[2] AS boot_lo, reps[31] AS boot_hi
         |FROM r""".stripMargin
    },
    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS n, sum(value) AS sv
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, day,
        |    sum(n) OVER w AS cn, sum(sv) OVER w AS cs,
        |    sum(n) OVER t AS tn, sum(sv) OVER t AS ts_
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    t AS (PARTITION BY event_type)),
        |g AS (
        |  SELECT *, round(abs(cs/cn - (ts_-cs)/(tn-cn)), 6) AS gap
        |  FROM c WHERE cn < tn),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY gap DESC, day) AS rk FROM g)
        |SELECT event_type, day AS split_day,
        |  round(cs/cn, 4) AS mean_before,
        |  round((ts_-cs)/(tn-cn), 4) AS mean_after, gap
        |FROM r WHERE rk = 1""".stripMargin,
    "q_benford" ->
      """WITH b AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS INTEGER) AS d, count(*) AS n
        |  FROM orders WHERE o_totalprice >= 1.0 GROUP BY 1)
        |SELECT d, n,
        |  round(n / (SELECT CAST(sum(n) AS DOUBLE) FROM b), 6) AS obs_frac,
        |  round(log10(1.0 + 1.0 / d), 6) AS benford_frac
        |FROM b""".stripMargin,
    "q_rfm" ->
      """WITH pur AS (
        |  SELECT user_id, max(epoch_us(ts)) AS r_us, count(*) AS f,
        |    round(sum(value), 2) AS m
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |c AS (
        |  SELECT round(quantile_cont(r_us, 0.3333333333333333), 4) AS r1,
        |    round(quantile_cont(r_us, 0.6666666666666666), 4) AS r2,
        |    round(quantile_cont(f, 0.3333333333333333), 4) AS f1,
        |    round(quantile_cont(f, 0.6666666666666666), 4) AS f2,
        |    round(quantile_cont(m, 0.3333333333333333), 4) AS m1,
        |    round(quantile_cont(m, 0.6666666666666666), 4) AS m2
        |  FROM pur),
        |s AS (
        |  SELECT user_id, r_us, f, m,
        |    CASE WHEN r_us <= r1 THEN 1 WHEN r_us <= r2 THEN 2 ELSE 3 END
        |      AS r_score,
        |    CASE WHEN f <= f1 THEN 1 WHEN f <= f2 THEN 2 ELSE 3 END AS f_score,
        |    CASE WHEN m <= m1 THEN 1 WHEN m <= m2 THEN 2 ELSE 3 END AS m_score
        |  FROM pur, c)
        |SELECT user_id, r_us, CAST(f AS BIGINT) AS f, m,
        |  CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
        |  CAST(m_score AS BIGINT) AS m_score,
        |  r_score || '' || f_score || '' || m_score AS rfm
        |FROM s""".stripMargin,
    "q_k_anon" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS gsize
        |  FROM customer GROUP BY 1, 2)
        |SELECT count(*) AS n_groups,
        |  CAST(sum(gsize) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN gsize < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_groups_lt_k,
        |  CAST(sum(CASE WHEN gsize < 5 THEN gsize ELSE 0 END) AS BIGINT)
        |    AS n_rows_at_risk,
        |  min(gsize) AS min_gsize, CAST(5 AS BIGINT) AS k
        |FROM g""".stripMargin,

    "q_l_diversity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS gsize,
        |  count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT)) AS n_sens,
        |  CAST(3 AS BIGINT) AS l,
        |  count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT)) < 3 AS at_risk
        |FROM customer GROUP BY 1, 2""".stripMargin,

    "q_dp_count" -> {
      // the SAME inverse-CDF threshold literals as the Spark plan
      val cases = dpNoiseThresholds.init
        .map { case (t, k) => s"WHEN u < $t THEN $k" }
        .mkString("\n|    ")
      s"""WITH cnt AS (SELECT c_nationkey, count(*) AS n
         |  FROM customer GROUP BY 1),
         |draw AS (SELECT c_nationkey, n,
         |    CAST(('0x' || substr(md5('dp:' || CAST(c_nationkey AS VARCHAR)),
         |      1, 4)) AS INT) AS u
         |  FROM cnt),
         |noised AS (SELECT c_nationkey, n, CAST(CASE
         |    $cases
         |    ELSE 20 END AS BIGINT) AS noise
         |  FROM draw)
         |SELECT c_nationkey, n, noise,
         |  greatest(0, n + noise) AS n_noisy
         |FROM noised""".stripMargin
    },

    "q_t_closeness" ->
      """WITH b AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS band FROM customer),
        |gband AS (SELECT band, count(*) AS tot FROM b GROUP BY 1),
        |m1 AS (SELECT count(*) AS m, CAST(sum(tot) AS BIGINT) AS n_all
        |  FROM gband),
        |grp AS (SELECT c_nationkey, c_mktsegment, count(*) AS gsize
        |  FROM b GROUP BY 1, 2),
        |cnts AS (SELECT c_nationkey, c_mktsegment, band, count(*) AS cnt
        |  FROM b GROUP BY 1, 2, 3),
        |dense AS (SELECT g.c_nationkey, g.c_mktsegment, g.gsize,
        |    gl.band, gl.tot, m1.m, m1.n_all, COALESCE(c.cnt, 0) AS cnt0
        |  FROM grp g CROSS JOIN gband gl CROSS JOIN m1
        |  LEFT JOIN cnts c ON c.c_nationkey = g.c_nationkey
        |    AND c.c_mktsegment = g.c_mktsegment AND c.band = gl.band),
        |cum AS (SELECT *,
        |    sum(CAST(cnt0 AS DECIMAL(38,0)) * n_all
        |        - CAST(tot AS DECIMAL(38,0)) * gsize) OVER (
        |      PARTITION BY c_nationkey, c_mktsegment ORDER BY band
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumd
        |  FROM dense)
        |SELECT c_nationkey, c_mktsegment, max(gsize) AS gsize,
        |  CASE WHEN max(m) = 1 THEN 0.0
        |    ELSE round(CAST(sum(abs(cumd)) AS DOUBLE) /
        |      (CAST(max(gsize) AS DOUBLE) * CAST(max(n_all) AS DOUBLE)
        |        * (max(m) - 1)), 6) END AS emd,
        |  CAST(0.2 AS DOUBLE) AS t,
        |  CASE WHEN max(m) = 1 THEN 0.0
        |    ELSE round(CAST(sum(abs(cumd)) AS DOUBLE) /
        |      (CAST(max(gsize) AS DOUBLE) * CAST(max(n_all) AS DOUBLE)
        |        * (max(m) - 1)), 6) END > 0.2 AS at_risk
        |FROM cum GROUP BY 1, 2""".stripMargin,

    "q_neyman" ->
      """WITH ev AS (SELECT event_type, event_id,
        |    CAST(floor(value * 10000) AS BIGINT) AS vq,
        |    CAST(('0x'||substr(md5('ny:'||CAST(event_id AS VARCHAR)),1,8))
        |      AS BIGINT) AS h
        |  FROM events),
        |g AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(vq) AS BIGINT) AS sg,
        |    sum(CAST(vq AS DECIMAL(38,0)) * vq) AS qg
        |  FROM ev GROUP BY 1),
        |w AS (SELECT event_type, n,
        |    CAST(floor(CAST(n AS DOUBLE) * sqrt(
        |      CAST(CAST(n AS DECIMAL(38,0)) * qg
        |        - CAST(sg AS DECIMAL(38,0)) * CAST(sg AS DECIMAL(38,0))
        |        AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))))
        |      AS BIGINT) AS wq
        |  FROM g),
        |t AS (SELECT CAST(sum(wq) AS BIGINT) AS tw FROM w),
        |a0 AS (SELECT event_type, n,
        |    CASE WHEN tw = 0 THEN 0 ELSE (500 * wq) // tw END AS a0,
        |    CASE WHEN tw = 0 THEN 0 ELSE (500 * wq) % tw END AS rem
        |  FROM w, t),
        |a AS (SELECT event_type, n, a0 + CASE WHEN
        |      row_number() OVER (ORDER BY rem DESC, event_type)
        |        <= 500 - sum(a0) OVER () AND rem > 0
        |      THEN 1 ELSE 0 END AS alloc
        |  FROM a0),
        |r AS (SELECT event_type, event_id,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY h, event_id) AS rn
        |  FROM ev)
        |SELECT r.event_type, CAST(r.rn AS BIGINT) AS rn, r.event_id,
        |  a.alloc, a.n
        |FROM r JOIN a USING (event_type) WHERE r.rn <= a.alloc"""
        .stripMargin,

    "q_ks_test" ->
      """WITH pv AS (SELECT value,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS c1,
        |    count(CASE WHEN event_type = 'view' THEN 1 END) AS c2
        |  FROM events WHERE event_type IN ('purchase', 'view')
        |  GROUP BY value),
        |cum AS (SELECT value,
        |    CAST(sum(c1) OVER w AS DECIMAL(38,0)) AS f1,
        |    CAST(sum(c2) OVER w AS DECIMAL(38,0)) AS f2,
        |    CAST(sum(c1) OVER () AS DECIMAL(38,0)) AS n1,
        |    CAST(sum(c2) OVER () AS DECIMAL(38,0)) AS n2
        |  FROM pv WINDOW w AS (ORDER BY value
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |gaps AS (SELECT value, n1, n2,
        |    abs(f1 * n2 - f2 * n1) AS gap FROM cum),
        |mx AS (SELECT max(gap) AS gmax, max(n1) AS n1, max(n2) AS n2,
        |    count(*) AS n_distinct FROM gaps),
        |loc AS (SELECT min(value) AS d_loc FROM gaps, mx
        |  WHERE gap = gmax)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  n_distinct,
        |  round(CAST(gmax AS DOUBLE) / CAST(n1 * n2 AS DOUBLE), 6) AS d,
        |  d_loc,
        |  round(1.358 * sqrt(CAST(n1 + n2 AS DOUBLE)
        |    / CAST(n1 * n2 AS DOUBLE)), 6) AS crit05,
        |  CAST(gmax AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)
        |    > 1.358 * sqrt(CAST(n1 + n2 AS DOUBLE)
        |      / CAST(n1 * n2 AS DOUBLE)) AS significant
        |FROM mx, loc""".stripMargin,

    "q_anova" ->
      """WITH vq AS (SELECT event_type,
        |    CAST(floor(value * 10000) AS BIGINT) AS vq FROM events),
        |g AS (SELECT event_type, count(*) AS ng,
        |    CAST(sum(vq) AS BIGINT) AS sg,
        |    sum(CAST(vq AS DECIMAL(38,0)) * vq) AS qg
        |  FROM vq GROUP BY 1),
        |a AS (SELECT count(*) AS k, CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(sg) AS BIGINT) AS stot, sum(qg) AS qtot,
        |    sum(CAST(floor(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |      / CAST(ng AS DOUBLE)) AS DECIMAL(38,0))) AS tsum
        |  FROM g),
        |b AS (SELECT k, n,
        |    CAST(tsum - CAST(floor(CAST(stot AS DOUBLE)
        |      * CAST(stot AS DOUBLE) / CAST(n AS DOUBLE))
        |      AS DECIMAL(38,0)) AS DOUBLE) AS ssbq,
        |    CAST(qtot - tsum AS DOUBLE) AS sswq
        |  FROM a)
        |SELECT n, k, round(ssbq / 1e8, 4) AS ssb,
        |  round(sswq / 1e8, 4) AS ssw,
        |  round((ssbq / (k - 1)) / (sswq / (n - k)), 4) AS f,
        |  round(ssbq / (ssbq + sswq), 6) AS eta2
        |FROM b""".stripMargin
  )
}
