package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Graph / time-series / operational analytics pack (SURVEY.md §2,
  * round 9): PageRank over the part↔supplier graph, exponentially
  * weighted series, robust anomaly ranking, categorical entropy
  * profiling, and the small-file compaction planner.
  *
  * Cross-engine determinism rules (SURVEY §4): every iterative or
  * order-sensitive computation here runs in INTEGER arithmetic
  * (PageRank mass, EWMA dyadic weights, compaction byte cumsums), so
  * no float-association boundary exists between Spark and the oracle;
  * floats appear only in final per-row projections, rounded.
  */
object AnalyticsPack extends QueryPack {

  /** PageRank (damping 0.85) over the bipartite part↔supplier
    * co-occurrence graph from lineitem. The rank unit is integer (1e9
    * per node), per-edge contribution is floor division by out-degree
    * and the damping step is (85·s) div 100 — exact integer math,
    * identical in any engine and any partition order (float PageRank
    * sums are association-dependent). Plan shape at scale: edges
    * localCheckpointed once (reused by the degree agg and every
    * iteration), each iteration is one co-partitioned equi-join + one
    * hash agg keyed on node — the Pregel step as two shuffles;
    * nothing ever collects. The rank table is ALSO localCheckpointed
    * every round: the unrolled lineage's whole-stage-codegen compile
    * cost grows superlinearly with rounds (measured 48.8 s cold at 3
    * unrolled rounds, r9) while each checkpointed round is a
    * constant-size plan; the rank table is node-count rows × 3
    * columns — partition-resident at any scale. Top-20 via
    * TakeOrderedAndProject (sort+limit), never a global window. */
  private[graft] def pagerankPlan(s: SparkSession, d: String, iters: Int,
      ckpt: graft.operators.CheckpointStrategy =
        graft.operators.CheckpointStrategy.Local): DataFrame = {
    // The whole loop runs with AQE OFF so every localCheckpoint
    // CAPTURES its hash partitioning (AdaptiveSparkPlanExec reports
    // unknown partitioning at checkpoint time — ScaleOpsSpec proves
    // static capture retains the layout and AQE-planned consumers
    // reuse it). With edges partitioned on src, deg and pr on node —
    // and node values = src values under the same hash — EVERY
    // per-round equi-join is co-partitioned with NO exchange; the only
    // per-round shuffle is the map-side-combined contribution trickle
    // (≤ V×partitions partial sums) into the node agg. That is the
    // minimal Pregel round: at the 10^12-edge regime nothing
    // edge-sized ever crosses the wire after the one-time layout.
    //
    // The AQE-off discipline is scoped STRUCTURALLY (round 14): the
    // loop plans against a private session clone, so concurrent
    // queries on the shared session can no longer race the capture
    // (the retired failure mode of the session-global toggle).
    // node-sized loop state — quarter-parallelism clone shuffles (the
    // q_betweenness task-floor lever, hash-neutral)
    val pr = graft.operators.SessionScope.withAqeOffQuarterNp(s) { s =>
      val e0 = lineitem(s, d)
        .select(col("l_partkey").cast("long").as("p"),
          col("l_suppkey").cast("long").as("sk")).distinct()
      // tagged-long node ids: part key → k·2, supplier key → k·2+1.
      // A long join key keeps every per-round exchange and the parked
      // edge layout at 8 fixed bytes per key instead of a "p"/"s"-
      // prefixed decimal string (~2× narrower rows, cheaper hashing);
      // the display string is projected only for the final top-20.
      val edges = ckpt(e0.select(
          (col("p") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        .union(e0.select(
          (col("sk") * 2 + 1).as("src"), (col("p") * 2).as("dst")))
        .repartition(col("src")))
      val deg = ckpt(edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg")))
      var state = ckpt(
        deg.select(col("node"), col("deg"), lit(1000000000L).as("pr")))
      for (_ <- 1 to iters) {
        val cin = state.join(edges, state("node") === edges("src"))
          .select(col("dst").as("node"), expr("pr div deg").as("c"))
          .groupBy("node").agg(sum("c").as("cin"))
        // undirected graph: every node has in-edges, inner join keeps all
        state = ckpt(deg.join(cin, "node")
          .select(col("node"), col("deg"),
            (lit(150000000L) + expr("(85 * cin) div 100")).as("pr")))
      }
      state
    }
    // top-20 on the long ids (tie-break: pr desc, id asc), THEN project
    // the human-readable node label — 20 string concats total, not V
    val top = pr.orderBy(col("pr").desc, col("node")).limit(20)
    top.withColumn("rk",
        row_number().over(Window.orderBy(col("pr").desc, col("node"))))
      .withColumn("node",
        concat(when(col("node") % 2 === 0, lit("p")).otherwise(lit("s")),
          expr("node div 2").cast("string")))
  }

  /** Personalized PageRank (random walk with restart; round 15 — the
    * recommendation/similar-node readout `q_pagerank`'s GLOBAL score
    * cannot give): the same damped integer-mass loop, but the teleport
    * mass returns to a SOURCE set (parts p ≤ 2 — q_reach's seed
    * convention) instead of uniformly, so scores measure proximity to
    * the sources. Differences from pagerankPlan, each load-bearing:
    * the restart term is `when(isSrc, 0.15·mass)`, the state table
    * starts AT the sources and stays TOUCHED-proportional — each round
    * is the co-partitioned cin join (rows ∝ touched) union the
    * not-yet-reached sources, never a V-row scan of dormant nodes
    * (push-style PPR's sparsity, the property that makes per-user PPR
    * affordable at graph scale); the oracle computes the same values
    * with a dense left-join + pr > 0 filter (value-identical: dormant
    * non-source nodes read pr = 0 and drop). Same parked layouts,
    * same integer-mass discipline (pr div deg truncation, div-100
    * damping) as q_pagerank. */
  private[graft] def pprPlan(s: SparkSession, d: String, iters: Int = 3,
      ckpt: graft.operators.CheckpointStrategy =
        graft.operators.CheckpointStrategy.Local): DataFrame = {
    val isSrc = col("node") % 2 === 0 && expr("node div 2") <= 2
    // node-sized loop state — quarter-parallelism clone shuffles (the
    // q_betweenness task-floor lever, hash-neutral)
    val pr = graft.operators.SessionScope.withAqeOffQuarterNp(s) { s =>
      val e0 = lineitem(s, d)
        .select(col("l_partkey").cast("long").as("p"),
          col("l_suppkey").cast("long").as("sk")).distinct()
      val edges = ckpt(e0.select(
          (col("p") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        .union(e0.select(
          (col("sk") * 2 + 1).as("src"), (col("p") * 2).as("dst")))
        .repartition(col("src")))
      val deg = ckpt(edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg")))
      val srcNodes = deg.where(isSrc).localCheckpoint(true) // seed-sized
      var state = ckpt(srcNodes
        .select(col("node"), col("deg"), lit(1000000000L).as("pr")))
      for (_ <- 1 to iters) {
        val cin = state.join(edges, state("node") === edges("src"))
          .select(col("dst").as("node"), expr("pr div deg").as("c"))
          .groupBy("node").agg(sum("c").as("cin"))
        val touched = cin.join(deg, Seq("node"))
          .select(col("node"), col("deg"),
            (when(isSrc, lit(150000000L)).otherwise(lit(0L))
              + expr("(85 * cin) div 100")).as("pr"))
        val dormantSrc = srcNodes.join(cin, Seq("node"), "left_anti")
          .select(col("node"), col("deg"), lit(150000000L).as("pr"))
        state = ckpt(touched.unionByName(dormantSrc)
          .where(col("pr") > 0)
          .repartition(col("node")))
      }
      state
    }
    val total = pr.agg(count(lit(1)).as("n_touched"))
    pr.orderBy(col("pr").desc, col("node")).limit(20)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("pr").desc, col("node"))))
      .withColumn("node",
        concat(when(col("node") % 2 === 0, lit("p")).otherwise(lit("s")),
          expr("node div 2").cast("string")))
      .crossJoin(broadcast(total))
      .select(col("rk").cast("int").as("rk"), col("node"), col("pr"),
        col("n_touched"))
  }

  /** Batched multi-source personalized PageRank — the production
    * shape of [[pprPlan]]: many source SETS ride one loop with the
    * set tag `g` in the state key, so each round is ONE edge join and
    * ONE (g, node) aggregate serving every set at once (the
    * q_diameter_exact multi-source BFS census discipline applied to
    * mass). Four sets here: part-seeds pid ∈ 1..11 grouped by
    * pid div 3. Scale: state is Σ_g |touched_g| rows hash-partitioned
    * on `node`, which co-locates the edge join AND satisfies the
    * (g, node) aggregate (subset clustering); per-set top-5 ranks
    * inside a g-partitioned window, so no global sort ever forms.
    * Integer mass discipline identical to pprPlan (1e9 seed units,
    * div-truncated splits — partition-order-exact). */
  private[graft] def pprMultiPlan(s: SparkSession, d: String,
      iters: Int = 3,
      ckpt: graft.operators.CheckpointStrategy =
        graft.operators.CheckpointStrategy.Local): DataFrame = {
    val isSeed = col("node") % 2 === 0 && expr("node div 2") <= 11
    val seedG = expr("(node div 2) div 3")
    // node-sized loop state — quarter-parallelism clone shuffles (the
    // q_betweenness task-floor lever, hash-neutral)
    val pr = graft.operators.SessionScope.withAqeOffQuarterNp(s) { s =>
      val e0 = lineitem(s, d)
        .select(col("l_partkey").cast("long").as("p"),
          col("l_suppkey").cast("long").as("sk")).distinct()
      val edges = ckpt(e0.select(
          (col("p") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        .union(e0.select(
          (col("sk") * 2 + 1).as("src"), (col("p") * 2).as("dst")))
        .repartition(col("src")))
      val deg = ckpt(edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg")))
      val srcNodes = deg.where(isSeed)
        .select(seedG.as("g"), col("node"), col("deg"))
        .localCheckpoint(true) // seed-sized
      var state = ckpt(srcNodes
        .select(col("g"), col("node"), col("deg"),
          lit(1000000000L).as("pr")))
      for (_ <- 1 to iters) {
        val cin = state.join(edges, state("node") === edges("src"))
          .select(col("g"), col("dst").as("node"),
            expr("pr div deg").as("c"))
          .groupBy("g", "node").agg(sum("c").as("cin"))
        val touched = cin.join(deg, Seq("node"))
          .select(col("g"), col("node"), col("deg"),
            (when(isSeed && seedG === col("g"), lit(150000000L))
              .otherwise(lit(0L))
              + expr("(85 * cin) div 100")).as("pr"))
        val dormantSrc = srcNodes.join(cin, Seq("g", "node"), "left_anti")
          .select(col("g"), col("node"), col("deg"),
            lit(150000000L).as("pr"))
        state = ckpt(touched.unionByName(dormantSrc)
          .where(col("pr") > 0)
          .repartition(col("node")))
      }
      state
    }
    val totals = pr.groupBy("g").agg(count(lit(1)).as("n_touched"))
    pr.withColumn("rk", row_number().over(Window.partitionBy("g")
        .orderBy(col("pr").desc, col("node"))))
      .where(col("rk") <= 5)
      .withColumn("node",
        concat(when(col("node") % 2 === 0, lit("p")).otherwise(lit("s")),
          expr("node div 2").cast("string")))
      .join(broadcast(totals), Seq("g"))
      .select(col("g").cast("int").as("grp"),
        col("rk").cast("int").as("rk"), col("node"), col("pr"),
        col("n_touched"))
  }

  /** `q_ewma`'s whole computation over any events-shaped frame
    * (event_type, ts, value): daily 1e-4-quantized integer sums, then
    * the dyadic-weight EWMA over the trailing 8 OBSERVED days. Public
    * so `ewmaStream`'s agreement spec can run the REAL batch plan on
    * its own data rather than a re-typed copy of the expression.
    *
    * Day bucketing is FLOOR division of epoch micros (calendar-correct
    * for pre-1970 timestamps), matching `ewmaStream`'s math.floorDiv
    * exactly. Neither Spark's `div` nor DuckDB's `//` floors (both
    * truncate toward zero — verified: DuckDB `SELECT -7 // 2` → −3),
    * so BOTH engines carry an explicit negative-remainder correction
    * rather than an implicit post-1970 domain assumption. */
  def ewmaDaily(ev: DataFrame): DataFrame = {
    val daily = ev
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000 + " +
          "(case when unix_micros(ts) % 86400000000 < 0 then -1 else 0 end)")
          .as("day"),
        floor(col("value") * 10000).cast("long").as("q"))
      .groupBy("event_type", "day")
      .agg(sum("q").as("dq"), count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val terms = (0 to 7).map { j =>
      val x = if (j == 0) col("dq") else lag(col("dq"), j).over(w)
      val wt = lit(1L << (7 - j))
      (when(x.isNotNull, x * wt).otherwise(lit(0L)),
        when(x.isNotNull, wt).otherwise(lit(0L)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    daily
      .withColumn("ewma", round(num.cast("double") / den / lit(10000.0), 4))
      .select("event_type", "day", "n", "ewma")
  }

  /** Per-type (median, MAD) reference stats in RAW `value` units — the
    * unit contract `streaming.StreamingOps.anomalyMonitorStream`
    * consumes. This is the SAME fit as batch `q_anomaly` (order
    * statistics over the 1e-4-quantized integer grid, so the result is
    * engine- and partition-order-exact), rescaled back to value units:
    * the 1e4 factor cancels inside q_anomaly's z, but the streaming
    * monitor applies stats to raw values, so handing it the quantized
    * integers would inflate every z by ~10⁴. Always derive monitor
    * stats through this helper; types whose MAD is 0 are dropped
    * (z undefined), mirroring q_anomaly's `mad <> 0` filter. */
  def anomalyRefStats(ev: DataFrame): Map[String, (Double, Double)] = {
    val q = ev.select(col("event_type"),
      floor(col("value") * 10000).cast("long").as("q"))
    val med = q.groupBy("event_type")
      .agg(expr("percentile(q, 0.5)").as("med"))
    q.join(broadcast(med), "event_type")
      .groupBy("event_type", "med")
      .agg(expr("percentile(abs(q - med), 0.5)").as("mad"))
      .where(col("mad") =!= 0.0)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1) / 10000.0, r.getDouble(2) / 10000.0)))
      .toMap
  }

  /** Shared daily event-count series with the floor-corrected day
    * bucketing (`ewmaDaily`'s idiom — calendar-correct pre-1970). */
  private def dailyCounts(ev: DataFrame): DataFrame = ev
    .select(col("event_type"),
      expr("unix_micros(ts) div 86400000000 + " +
        "(case when unix_micros(ts) % 86400000000 < 0 then -1 else 0 end)")
        .as("day"))
    .groupBy("event_type", "day").agg(count(lit(1)).as("n"))

  /** The motif family's input: per-type daily VALUE sums (quantized
    * 1e4), floor-corrected day bucketing. */
  private def motifDaily(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000 + " +
          "(case when unix_micros(ts) % 86400000000 < 0 then -1 else 0 end)")
          .as("day"),
        floor(col("value") * 10000).cast("long").as("q"))
      .groupBy("event_type", "day").agg(sum("q").as("dq"))

  /** Markov stationary-distribution iterations and the mass unit
    * (pagerank's 1e9 integer-mass discipline). Six rounds settle the
    * 5-state gate chain to a sub-1e-6 L1 gap — and the oracle replays
    * exactly six. */
  private val MarkovRounds = 6
  private val MarkovUnit = 1000000000L

  /** Stationary distribution of the event-transition Markov chain
    * (power iteration on πP — the long-run readout `q_transitions`'
    * one-step matrix cannot give: where does a user's session settle
    * if the observed dynamics run forever; the difference between
    * one-step popularity and equilibrium share is exactly what makes
    * PageRank more than an in-degree count). States = types with
    * outgoing transitions; mass entering a state with no outgoing row
    * drops (the absorbing-end leak, reported by the masses not
    * summing to the unit — documented, measurable). Output per state:
    * the round-[[MarkovRounds]] mass π (1e9 units) and the last-round
    * delta as the convergence certificate. Determinism: integer mass
    * with per-edge truncating division (pi9·n) div tot — exact in any
    * partition order, the q_pagerank discipline; the oracle replays
    * every round as chained CTEs. Scale: the chain lives on the TYPE
    * domain — transition counts are one events-sized hash agg, then
    * every round is a states×edges join on k²-row frames; at 1e9-unit
    * mass × 1e9-count edges the products approach BIGINT — the
    * documented swap is DECIMAL(38) (embed_dimstats' trade). */
  private[graft] def markovStationaryFrom(pairs: DataFrame): DataFrame = {
    val trans = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val tot = trans.groupBy("from_type").agg(sum("n").as("tot"))
    val t2 = trans.join(tot, "from_type")
      .localCheckpoint(true) // k²-row edge table, scanned every round
    val states = t2.select(col("from_type").as("event_type")).distinct()
      .localCheckpoint(true)
    val ns = states.agg(count(lit(1)).as("ns"))
    var pi = states.crossJoin(broadcast(ns))
      .select(col("event_type"), expr(s"$MarkovUnit div ns").as("pi9"))
    var prev = pi
    for (_ <- 1 to MarkovRounds) {
      prev = pi
      val flow = prev.join(t2, prev("event_type") === t2("from_type"))
        .select(col("to_type").as("event_type"),
          expr("(pi9 * n) div tot").as("c9"))
        .groupBy("event_type").agg(sum("c9").as("m9"))
      pi = states.join(flow, Seq("event_type"), "left")
        .select(col("event_type"), coalesce(col("m9"), lit(0L)).as("pi9"))
    }
    pi.join(prev.select(col("event_type"), col("pi9").as("pp9")),
        "event_type")
      .select(col("event_type"), col("pi9"),
        abs(col("pi9") - col("pp9")).as("delta9"))
  }

  private val markovSql: String = {
    val steps = (1 to MarkovRounds).map { i =>
      s"""p$i AS (SELECT st.event_type, COALESCE(x.m9, 0) AS pi9
         |  FROM st LEFT JOIN (
         |    SELECT t2.to_type AS event_type,
         |      CAST(sum((p.pi9 * t2.n) // t2.tot) AS BIGINT) AS m9
         |    FROM p${i - 1} p JOIN t2 ON p.event_type = t2.from_type
         |    GROUP BY 1) x USING (event_type))""".stripMargin
    }.mkString(",\n")
    s"""WITH pr AS (SELECT event_type AS from_type,
       |    lead(event_type) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS to_type
       |  FROM events),
       |tr AS (SELECT from_type, to_type, count(*) AS n FROM pr
       |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |tt AS (SELECT from_type, sum(n) AS tot FROM tr GROUP BY 1),
       |t2 AS (SELECT tr.from_type, tr.to_type, tr.n, tt.tot
       |  FROM tr JOIN tt USING (from_type)),
       |st AS (SELECT DISTINCT from_type AS event_type FROM tr),
       |ns AS (SELECT count(*) AS ns FROM st),
       |p0 AS (SELECT event_type, $MarkovUnit // ns AS pi9 FROM st, ns),
       |$steps
       |SELECT a.event_type, a.pi9,
       |  abs(a.pi9 - b.pi9) AS delta9
       |FROM p$MarkovRounds a JOIN p${MarkovRounds - 1} b
       |  USING (event_type)""".stripMargin
  }

  /** Classical additive seasonal–trend decomposition (the
    * moving-average method, Macaulay 1931 — the pre-loess core of
    * STL) of the per-type daily count series: trend = centered 7-day
    * moving average, weekly seasonal = per-weekday mean of the
    * detrended series, residual = remainder. The full-table readout
    * `q_seasonality`'s single index cannot give: WHERE the series
    * deviates from trend+season, which is what feeds anomaly triage
    * (a big residual IS the alarm) and seasonal adjustment. Exact in
    * integer SEVENTHS — trend enters as the 7-day SUM t7 (never ÷7),
    * detrended is 7·y − t7, the seasonal is one truncating `div` per
    * (type, dow) group (identical in both engines, verified for
    * negative operands), residual is a subtraction — so every row is
    * a pure integer function of the counts. Edge days (fewer than 7
    * rows in the centered frame) drop, as classical decomposition
    * leaves them undefined. Frames run over OBSERVED days (row
    * frames; q_motif's convention) — densify with q_gap_fill first if
    * calendar alignment matters. Scale: the series is (type ×
    * span-days) rows — one exchange for the window, one 7·types-row
    * broadcast join back; never event-count-sized. */
  private[graft] def decomposeFrom(daily: DataFrame): DataFrame = {
    val wt = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-3, 3)
    val t = daily
      .withColumn("t7", sum("y").over(wt))
      .withColumn("nf", count(lit(1)).over(wt))
      .where(col("nf") === 7)
      .withColumn("detr7", lit(7) * col("y") - col("t7"))
      .withColumn("dow", pmod(col("day") + 3, lit(7L)))
      .localCheckpoint(true) // feeds the seasonal agg + the readout join
    val seas = t.groupBy("event_type", "dow")
      .agg(expr("sum(detr7) div count(1)").as("seas7"))
    t.join(broadcast(seas), Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("y"), col("t7"),
        col("seas7"), (col("detr7") - col("seas7")).as("resid7"))
  }

  /** Skyline grid resolution per dimension: the cell lattice is
    * SkylineGrid³ ≤ 512 cells — a CONSTANT, never data-sized. */
  private[graft] val SkylineGrid = 8L

  /** Pareto skyline (Börzsönyi, Kossmann & Stocker, ICDE 2001) over
    * any (id, d1, d2, d3) frame, all dimensions maximize — the
    * multi-criteria "best customers" readout no single score captures:
    * a row survives iff NO other row is ≥ in every dimension and > in
    * at least one. The naive test is an all-pairs theta join (O(n²),
    * a CartesianProduct at scale — exactly the shape PlanSpec bans);
    * this plan is the grid-pruned skyline: bucket each dimension into
    * [[SkylineGrid]] integer cells from the global min/max (bucketing
    * is monotone, so cell order is value order), then
    * (1) DEAD-CELL PRUNE — a non-empty cell strictly greater in ALL
    * dims kills every point of a cell (each of its points dominates
    * each of theirs), one bounded cells×cells semi-join;
    * (2) CANDIDATE BLOCKING — a survivor can only be dominated from a
    * dominating-or-equal cell, so the pair join is EQUI on the cell
    * triple through the ≤512² cell-pair table; fan-out per point is
    * the population of its dominating cell region, which on anything
    * but fully anti-correlated data is a vanishing corner of the
    * space (the documented trade: an adversarial all-on-the-frontier
    * dataset degrades toward all-pairs — then you raise the grid).
    * Determinism: the skyline SET is unique (no tie-breaks — equal
    * rows don't dominate each other and both survive); every compare
    * is exact integer. Scale: one hash agg builds the input, the
    * lattice joins are constant-size broadcasts, and the pair join
    * ships ids + 3 longs, never source rows. */
  private[graft] def skylineFrom(sp0: DataFrame): DataFrame = {
    val sp = sp0.localCheckpoint(true) // feeds bounds, cells, both join sides
    val bounds = sp.agg(
      min("d1").as("mn1"), max("d1").as("mx1"),
      min("d2").as("mn2"), max("d2").as("mx2"),
      min("d3").as("mn3"), max("d3").as("mx3"))
    def cell(v: String, mn: String, mx: String) =
      expr(s"(($v - $mn) * $SkylineGrid) div ($mx - $mn + 1)")
    val pts = sp.crossJoin(broadcast(bounds)) // 1-row bounds scalar
      .select(col("id"), col("d1"), col("d2"), col("d3"),
        cell("d1", "mn1", "mx1").as("c1"),
        cell("d2", "mn2", "mx2").as("c2"),
        cell("d3", "mn3", "mx3").as("c3"))
      .localCheckpoint(true)
    val cells = pts.groupBy("c1", "c2", "c3").agg(count(lit(1)).as("nc"))
      .localCheckpoint(true) // ≤ SkylineGrid³ rows
    val dead = cells.as("c").join(broadcast(cells.as("e")),
        col("e.c1") > col("c.c1") && col("e.c2") > col("c.c2") &&
          col("e.c3") > col("c.c3"), "left_semi")
      .select(col("c.c1").as("c1"), col("c.c2").as("c2"),
        col("c.c3").as("c3"))
    val live = pts.join(broadcast(dead), Seq("c1", "c2", "c3"), "left_anti")
    val cellPairs = cells.select(col("c1"), col("c2"), col("c3"))
      .join(broadcast(cells.select(col("c1").as("e1"), col("c2").as("e2"),
        col("c3").as("e3"))),
        col("e1") >= col("c1") && col("e2") >= col("c2") &&
          col("e3") >= col("c3"))
    val dominated = live
      .join(broadcast(cellPairs), Seq("c1", "c2", "c3"))
      .join(pts.select(col("c1").as("e1"), col("c2").as("e2"),
          col("c3").as("e3"), col("id").as("qid"), col("d1").as("q1"),
          col("d2").as("q2"), col("d3").as("q3")),
        Seq("e1", "e2", "e3"))
      .where(col("q1") >= col("d1") && col("q2") >= col("d2") &&
        col("q3") >= col("d3") &&
        (col("q1") > col("d1") || col("q2") > col("d2") ||
          col("q3") > col("d3")))
      .select("id").distinct()
    live.join(dominated, Seq("id"), "left_anti")
      .select("id", "d1", "d2", "d3")
  }

  /** SAX motif-search knobs: window length in observed days, PAA
    * segment count (MotifW/MotifSeg days each), motif words ranked per
    * series. Alphabet is fixed at 4 (Gaussian breakpoints ±0.6745, 0:
    * the equiprobable quartiles of N(0,1) — Lin & Keogh's table). */
  private val MotifW = 8
  private val MotifSeg = 4
  private val MotifTop = 5

  /** SAX window-motif discovery (Lin, Keogh, Wei & Lonardi, DMKD 2007;
    * motif-by-collision: Chiu, Keogh & Lonardi, KDD 2003) over the
    * per-type daily value series — the time-series INDEXING member the
    * family lacked beside q_acf (periodicity) / q_changepoint
    * (regime) / q_forecast (extrapolation): each length-8 window of
    * observed days is z-normalized and PAA-discretized to a 4-symbol
    * word; frequent words are the motif candidates (the census), and
    * within each top word the closest NON-overlapping window pair —
    * reported as start days + exact euclidean distance — is the motif
    * occurrence pair. Determinism: symbolization avoids per-window
    * float normalization entirely — z(seg) ≥ b ⟺ seg·MotifSeg − S ≥
    * b·√(W·Q − S²) with S, Q, seg EXACT integers (Q, S² in
    * DECIMAL(38,0)/HUGEINT — a BIGINT q² ANSI-overflows at real daily
    * magnitudes, embed_dimstats' trade), so each window costs ONE
    * sqrt and 12 integer-vs-float compares on identical doubles;
    * pair distances are exact DECIMAL sums of squared integer diffs,
    * ranked (dist, d1, d2); the reported distance is one final
    * sqrt/1e4, rounded. Scale: windows are one lead() pass in ONE
    * event_type exchange; the census is ≤ 4^4 bins per type; the
    * pair self-join is blocked by (type, word) and ONLY the top-5
    * words per type enter it (the collision heuristic: frequent
    * words ARE the candidates) — per-bucket fan-out is bounded by
    * occurrences of that word in a time-bounded series, never
    * row-scale. Gaps: windows run over OBSERVED days (row frames);
    * densify with q_gap_fill first if calendar alignment matters. */
  /** Shared symbolization for the motif family: z-normalized SAX words
    * over length-[[MotifW]] windows plus the top-[[MotifTop]] census.
    * Returns (words, top); words carries (event_type, day, word,
    * x0..x7), both localCheckpointed (each feeds ≥ 2 consumers). */
  private def motifWordsTop(daily: DataFrame): (DataFrame, DataFrame) = {
    val ord = Window.partitionBy("event_type").orderBy("day")
    val withX = (1 until MotifW).foldLeft(
      daily.withColumn("x0", col("dq"))) { case (df, j) =>
        df.withColumn(s"x$j", lead(col("dq"), j).over(ord))
      }.where(col(s"x${MotifW - 1}").isNotNull)
    val s8 = (0 until MotifW).map(j => col(s"x$j")).reduce(_ + _)
    val q8 = (0 until MotifW).map(j =>
      col(s"x$j").cast("decimal(38,0)") * col(s"x$j")).reduce(_ + _)
    val base = withX.withColumn("s8", s8)
      .withColumn("rr", sqrt((q8 * lit(MotifW)
        - col("s8").cast("decimal(38,0)") * col("s8")).cast("double")))
    val segLen = MotifW / MotifSeg
    val syms = (0 until MotifSeg).map { k =>
      val p = (0 until segLen).map(i => col(s"x${segLen * k + i}"))
        .reduce(_ + _)
      val lhs = (p * lit(MotifSeg) - col("s8")).cast("double")
      when(lhs < lit(-0.6745) * col("rr"), lit("a"))
        .when(lhs < lit(0.0), lit("b"))
        .when(lhs < lit(0.6745) * col("rr"), lit("c"))
        .otherwise(lit("d"))
    }
    val words = base.withColumn("word", concat(syms: _*))
      .select(Seq(col("event_type"), col("day"), col("word")) ++
        (0 until MotifW).map(j => col(s"x$j")): _*)
      .localCheckpoint(true) // feeds the census + the pair search
    val census = words.groupBy("event_type", "word")
      .agg(count(lit(1)).as("n_win"))
    val top = census.withColumn("rk", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("n_win").desc, col("word"))))
      .where(col("rk") <= MotifTop)
      .localCheckpoint(true) // <= MotifTop rows per type
    (words, top)
  }

  /** The exact per-pair distance the motif family reports. */
  private def motifDist: Column = (0 until MotifW).map(j =>
    (col(s"a.x$j") - col(s"b.x$j")).cast("decimal(38,0)") *
      (col(s"a.x$j") - col(s"b.x$j"))).reduce(_ + _)

  /** The shared readout: best (pd, d1, d2) pair per top word. */
  private def motifReadout(top: DataFrame, pairs: DataFrame): DataFrame = {
    val best = pairs
      .withColumn("pk", row_number().over(
        Window.partitionBy("event_type", "word")
          .orderBy(col("pd"), col("d1"), col("d2"))))
      .where(col("pk") === 1)
    top.join(best, Seq("event_type", "word"), "left")
      .select(col("event_type"), col("rk").cast("int").as("rk"),
        col("word"), col("n_win"), col("d1"), col("d2"),
        round(sqrt(col("pd").cast("double")) / 10000.0, 4).as("dist"))
  }

  private[graft] def motifFrom(daily: DataFrame): DataFrame = {
    val (words, top) = motifWordsTop(daily)
    val bw = words.join(top.select("event_type", "word"),
      Seq("event_type", "word"), "left_semi")
    val pairs = bw.as("a").join(bw.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.word") === col("b.word") &&
          col("b.day") >= col("a.day") + MotifW)
      .select(col("a.event_type").as("event_type"),
        col("a.word").as("word"), col("a.day").as("d1"),
        col("b.day").as("d2"), motifDist.as("pd"))
    motifReadout(top, pairs)
  }

  /** Cells per dimension of the motif grid index — a constant, so the
    * cell summary is bounded by MotifGrid^MotifSeg per word at ANY
    * series length. */
  private[graft] val MotifGrid = 16L

  /** iSAX-style grid-index pair search for `q_motif_isax` (iSAX:
    * Shieh & Keogh, KDD 2008 — the multi-resolution symbol-bucket
    * index; adapted): identical SEMANTICS and output to [[motifFrom]]
    * (same oracle), but within each top (type, word) bucket the
    * closest-pair search probes a cell index instead of scanning all
    * C(m, 2) window pairs — the scale path when a word recurs m times
    * in a long series.
    *
    * Adaptation, documented honestly: iSAX's mindist lower-bounds the
    * Z-NORMALIZED euclidean distance, but the family's reported motif
    * distance is the exact RAW-integer euclidean — a symbol-space
    * bound does not bound it. The index words here are therefore
    * raw-PAA cells: per-type segment sums quantized into
    * [[MotifGrid]] cells per dimension (iSAX's piecewise-aggregate
    * skeleton on raw values), which admit the exact integer bound
    *   dist²(a,b) = Σ_j (a_j−b_j)² ≥ Σ_k (P_ak − P_bk)² / segLen
    * (Cauchy–Schwarz per segment), and per CELL pair
    *   |P_ak − P_bk| ≥ (|c_ak − c_bk| − 1)·w_k  when the cells differ,
    * so Σ_k gap_k² ≤ segLen · bsf prunes a whole cell pair against the
    * best-so-far without touching its windows.
    *
    * Search = seed + prune, both declarative: (1) SEED — exact
    * distances over same-cell collisions only (the iSAX bucket probe),
    * min per word = bsf; (2) PRUNE — the bounded cell-pair table
    * (equi-join on (type, word); ≤ occupied-cells² per word, cells ≤
    * min(m, MotifGrid^4)) keeps pairs with lb ≤ segLen·bsf (≤, not <:
    * a tying pair must stay visible or the deterministic (pd, d1, d2)
    * tie-break could diverge from the brute force), a missing bsf
    * (no collision) keeps everything; (3) window pairs expand ONLY
    * through surviving cell pairs (same-cell pairs re-enter here, so
    * the final readout needs no seed union). Exactness: any pair with
    * dist² ≤ bsf has lb ≤ segLen·dist² ≤ segLen·bsf — every candidate
    * for the minimum (and every tie) survives the prune, so the
    * readout equals motifFrom's row for row; the ORACLE is motifSql
    * verbatim, making index completeness itself hash-gated
    * (dbscan_grid's discipline). */
  private[graft] def motifIsaxParts(daily: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val (words, top) = motifWordsTop(daily)
    val segLen = MotifW / MotifSeg
    val bw0 = words.join(top.select("event_type", "word"),
      Seq("event_type", "word"), "left_semi")
    val seg = (0 until MotifSeg).foldLeft(bw0) { (df, k) =>
      df.withColumn(s"p$k", (0 until segLen)
        .map(i => col(s"x${segLen * k + i}")).reduce(_ + _))
    }
    val boundAggs = (0 until MotifSeg).flatMap(k => Seq(
      min(s"p$k").as(s"mn$k"), max(s"p$k").as(s"mx$k")))
    val bounds = seg.groupBy("event_type")
      .agg(boundAggs.head, boundAggs.tail: _*)
    val bw = (0 until MotifSeg).foldLeft(
        seg.join(broadcast(bounds), "event_type")) { (df, k) =>
        df.withColumn(s"w$k", greatest(lit(1L),
            expr(s"(mx$k - mn$k + 1) div $MotifGrid")))
          .withColumn(s"c$k", expr(s"(p$k - mn$k) div w$k"))
      }
      .localCheckpoint(true) // cells agg + seed + both expand sides
    val cellCols = (0 until MotifSeg).map(k => s"c$k")
    // cell summary (widths ride along — constant per type)
    val cellKeys = Seq("event_type", "word") ++ cellCols ++
      (0 until MotifSeg).map(k => s"w$k")
    val cells = bw.groupBy(cellKeys.head, cellKeys.tail: _*)
      .agg(count(lit(1)).as("nw"))
      .localCheckpoint(true)
    // seed: exact distances over same-cell collisions
    val seedCond = cellCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _)
    val bsf = bw.as("a").join(bw.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.word") === col("b.word") && seedCond &&
          col("b.day") >= col("a.day") + MotifW)
      .select(col("a.event_type").as("event_type"),
        col("a.word").as("word"), motifDist.as("pd"))
      .groupBy("event_type", "word").agg(min("pd").as("bsf"))
    // prune: cell pairs whose integer lower bound passes bsf
    val lb = (0 until MotifSeg).map { k =>
      val gap = greatest(lit(0L),
        abs(col(s"x.c$k") - col(s"y.c$k")) - 1) * col(s"x.w$k")
      gap.cast("decimal(38,0)") * gap
    }.reduce(_ + _)
    val cp = cells.as("x").join(cells.as("y"),
        col("x.event_type") === col("y.event_type") &&
          col("x.word") === col("y.word"))
      .join(broadcast(bsf),
        col("x.event_type") === bsf("event_type") &&
          col("x.word") === bsf("word"), "left")
      .where(col("bsf").isNull || lb <= lit(segLen) * col("bsf"))
      .select(Seq(col("x.event_type").as("cp_t"),
        col("x.word").as("cp_w")) ++
        cellCols.map(c => col(s"x.$c").as(s"x$c")) ++
        cellCols.map(c => col(s"y.$c").as(s"y$c")): _*)
      .localCheckpoint(true) // counted by the spec + expanded below
    // expand window pairs ONLY through surviving cell pairs
    val cand = bw.as("a")
      .join(cp, col("a.event_type") === col("cp_t") &&
        col("a.word") === col("cp_w") &&
        cellCols.map(c => col(s"a.$c") === col(s"x$c")).reduce(_ && _))
      .join(bw.as("b"), col("b.event_type") === col("cp_t") &&
        col("b.word") === col("cp_w") &&
        cellCols.map(c => col(s"b.$c") === col(s"y$c")).reduce(_ && _) &&
        col("b.day") >= col("a.day") + MotifW)
      .select(col("cp_t").as("event_type"), col("cp_w").as("word"),
        col("a.day").as("d1"), col("b.day").as("d2"), motifDist.as("pd"))
    (cand, cp, top)
  }

  /** `q_motif` through the grid index — see [[motifIsaxParts]]. */
  private[graft] def motifIsaxFrom(daily: DataFrame): DataFrame = {
    val (cand, _, top) = motifIsaxParts(daily)
    motifReadout(top, cand)
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Pareto skyline of customers over (total spend cents, order
    // count, recency day) — all maximize; see skylineFrom for the
    // grid-pruned plan. The oracle brute-forces the NOT EXISTS
    // dominance test, so the blocking's completeness is itself
    // hash-gated (dbscan_grid's discipline).
    "q_skyline" -> ((s, d) => skylineFrom(orders(s, d)
        .groupBy(col("o_custkey").as("id"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("d1"),
          count(lit(1)).as("d2"),
          // o_orderdate is TIMESTAMP_NTZ; the session is pinned UTC in
          // both engines, so the cast is the identity wall-clock map
          max(expr("unix_micros(cast(o_orderdate as timestamp)) " +
            "div 86400000000")).as("d3")))
      .select(col("id").as("custkey"), col("d1").as("spend_cents"),
        col("d2").as("n_orders"), col("d3").as("last_day"))),

    "q_decompose" -> ((s, d) => decomposeFrom(dailyCounts(events(s, d))
      .withColumnRenamed("n", "y"))),

    "q_markov_stationary" -> ((s, d) => {
      val byUt = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      markovStationaryFrom(events(s, d)
        .withColumn("to_type", lead(col("event_type"), 1).over(byUt))
        .filter(col("to_type").isNotNull)
        .select(col("event_type").as("from_type"), col("to_type")))
    }),

    "q_motif" -> ((s, d) => motifFrom(motifDaily(s, d))),

    // q_motif through the iSAX-style grid index (round 15): identical
    // rows — the SAME oracle replays the brute-force pair search, so
    // the index's admissible-bound completeness is itself hash-gated;
    // the spec additionally asserts measured probe pruning (cell pairs
    // touched ≪ window pairs scanned).
    "q_motif_isax" -> ((s, d) => motifIsaxFrom(motifDaily(s, d))),

    "q_pagerank" -> ((s, d) => pagerankPlan(s, d, 3)),

    // Personalized PageRank (round 15): pagerank's loop with teleport
    // mass returned to the source set — proximity scores, state
    // touched-proportional (push-style sparsity).
    "q_pagerank_ppr" -> ((s, d) => pprPlan(s, d, 3)),

    // Batched multi-source PPR (round 16): many users' PPR in ONE
    // loop — the source-set tag rides the state key exactly as
    // q_diameter_exact's census BFS batches sources, so every round
    // is one edge join serving all sets instead of one loop per set.
    "q_pagerank_ppr_multi" -> ((s, d) => pprMultiPlan(s, d, 3)),

    // Autocorrelation function (lags 1..7) of the daily event-count
    // series per type — the periodicity detector (a weekly cycle shows
    // as a lag-7 peak) run before trusting any trend/anomaly readout.
    // The series is mean-centered WITHOUT leaving integers: with nd
    // days and total sn, the centered value is c_t = nd·n_t − sn
    // (= nd² × the usual (n_t − mean)), and the nd² factor cancels in
    // r_k = Σc_t·c_{t−k} / Σc_t² — so every sum is an exact BIGINT in
    // any partition order and the only float op is the final division
    // (float ACF is association-dependent). One hash agg to days, one
    // partitioned window pass for the 7 lags, one k-row agg; series
    // length is bounded by the time range, never event count. At a
    // 1e9-events/day × decade regime the BIGINT products approach
    // overflow — the documented swap is DECIMAL(38) accumulation, the
    // embed_dimstats trade.
    // Kaplan–Meier time-to-conversion survival (round 11, Kaplan &
    // Meier 1958) — the funnel-latency readout with the censoring done
    // RIGHT: at each observed waiting time t (days from a user's first
    // event to their first purchase), the probability of still being
    // unconverted past t. Users who never purchase are CENSORED at the
    // span end — dropping them (what a naive avg-time-to-convert does)
    // biases conversion fast, the exact bias KM removes. Per-user
    // first-event/first-purchase day is ONE user-keyed hash agg;
    // everything after lives on the tiny distinct-waiting-time table:
    // deaths/censored per t, at-risk via a reverse cumulative window
    // (censored users count in the risk set AT their censor time, the
    // standard convention), and S(t) = Π(1 − d/n) accumulated as
    // floor-quantized 1e-12 ln terms (q_entropy's idiom — the
    // cross-row sum is exact-integer; exp of identical doubles at the
    // end). A risk set that converts out entirely (d = n) zeroes S
    // from that t on — flagged through a cumulative max rather than
    // ln(0). Scale: one user-count-bounded agg + k-row windows; the
    // span end is a 1-row broadcast.
    "q_survival" -> ((s, d) => {
      val dayExpr = expr("unix_micros(ts) div 86400000000 + " +
        "(case when unix_micros(ts) % 86400000000 < 0 then -1 else 0 end)")
      val perUser = events(s, d)
        .select(col("user_id"), dayExpr.as("day"),
          (col("event_type") === "purchase").as("isp"))
        .groupBy("user_id")
        .agg(min("day").as("d0"),
          min(when(col("isp"), col("day"))).as("dc"),
          max("day").as("dl"))
      val span = perUser.agg(max("dl").as("d_end"))
      val lt = perUser.crossJoin(broadcast(span))
        .select(
          coalesce(col("dc") - col("d0"), col("d_end") - col("d0")).as("t"),
          col("dc").isNull.cast("long").as("cens"))
      val byT = lt.groupBy("t")
        .agg(count(lit(1)).as("n_at_t"), sum("cens").as("n_censored"),
          (count(lit(1)) - sum("cens")).as("n_death"))
      val w = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPrev = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
      val risk = byT
        .crossJoin(broadcast(lt.agg(count(lit(1)).as("n_users"))))
        .withColumn("n_risk",
          col("n_users") - coalesce(sum("n_at_t").over(wPrev), lit(0L)))
      val term = when(col("n_death") === 0, lit(0L))
        .when(col("n_death") < col("n_risk"),
          floor(log((col("n_risk") - col("n_death")).cast("double")
            / col("n_risk").cast("double")) * 1e12).cast("long"))
        .otherwise(lit(0L))
      risk
        .withColumn("zeroed",
          max((col("n_death") === col("n_risk")).cast("int")).over(w))
        .withColumn("lnq", sum(term).over(w))
        .select(col("t").cast("long").as("t_days"), col("n_risk"),
          col("n_death"), col("n_censored"),
          when(col("zeroed") === 1, lit(0.0))
            .otherwise(round(exp(col("lnq").cast("double") / lit(1e12)), 4))
            .as("surv"))
    }),

    // Lead–lag cross-correlation between event streams (round 11):
    // exact Pearson r between every type pair's daily-count series at
    // lags −3..+3 — the readout that finds "clicks follow views by a
    // day" causality candidates q_acf (same-series) cannot see. The
    // series align on the FULL day grid (sequence over the global
    // span, absent days = 0): correlating only on jointly-active days
    // would bias r upward exactly when activity is bursty. All five
    // Pearson sums are exact BIGINTs over the grid join; r evaluates
    // in one fixed double expression; zero-variance pairs drop (r
    // undefined). Scale: the grid is types × span-days (time-range
    // bounded, never event-count), the join is equi on day with a
    // type-pair residual — per-day fan-out is types² × lags, a
    // constant. At a 1e9-events/day decade the BIGINT squares near
    // overflow — DECIMAL(38) swap, the q_acf/embed_dimstats trade.
    "q_xcorr" -> ((s, d) => {
      val daily = dailyCounts(events(s, d))
      val span = daily.agg(min("day").as("d0"), max("day").as("d1"))
      val grid = daily.select("event_type").distinct()
        .crossJoin(broadcast(span))
        .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val full = grid.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"))
      val b = full.select(col("event_type").as("tb"), col("day").as("dayb"),
          col("n").as("nb"))
        .withColumn("l", explode(array((-3 to 3).map(x => lit(x)): _*)))
        .select(col("tb"), (col("dayb") - col("l")).as("dayj"), col("nb"), col("l"))
      val j = full.select(col("event_type").as("ta"), col("day"),
          col("n").as("na"))
        .join(b, col("day") === col("dayj") && col("ta") < col("tb"))
        .select(col("ta"), col("tb"), col("l"), col("na"), col("nb"))
      val agg = j.groupBy("ta", "tb", "l")
        .agg(count(lit(1)).as("k"), sum("na").as("sa"), sum("nb").as("sb"),
          sum(col("na") * col("na")).as("saa"),
          sum(col("nb") * col("nb")).as("sbb"),
          sum(col("na") * col("nb")).as("sab"))
      val va = col("k") * col("saa") - col("sa") * col("sa")
      val vb = col("k") * col("sbb") - col("sb") * col("sb")
      agg.where(va > 0 && vb > 0)
        .select(col("ta").as("type_a"), col("tb").as("type_b"),
          col("l").cast("int").as("lag"), col("k").as("n_days"),
          round((col("k") * col("sab") - col("sa") * col("sb")).cast("double")
            / (sqrt(va.cast("double")) * sqrt(vb.cast("double"))), 4).as("r"))
    }),

    "q_acf" -> ((s, d) => {
      val daily = dailyCounts(events(s, d))
      val tot = daily.groupBy("event_type")
        .agg(count(lit(1)).as("nd"), sum("n").as("sn"))
      val c = daily.join(broadcast(tot), "event_type")
        .select(col("event_type"), col("day"),
          (col("nd") * col("n") - col("sn")).as("c"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val lagged = (1 to 7).foldLeft(c)((df, k) =>
        df.withColumn(s"c$k", lag(col("c"), k).over(w)))
      val aggs = sum(col("c") * col("c")).as("den") +:
        (1 to 7).map(k => sum(when(col(s"c$k").isNotNull,
          col("c") * col(s"c$k")).otherwise(lit(0L))).as(s"num$k"))
      lagged.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
        .where(col("den") > 0)
        .select(col("event_type"), explode(array((1 to 7).map(k =>
          struct(lit(k).as("lg"), col(s"num$k").as("num"))): _*)).as("t"),
          col("den"))
        .select(col("event_type"), col("t.lg").cast("int").as("lag"),
          round(col("t.num").cast("double") / col("den"), 4).as("r"))
    }),

    // Theil–Sen robust trend (median of pairwise slopes) of the daily
    // count series per type — the outlier-immune alternative to
    // q_ols's least-squares slope (one wild day moves OLS, not the
    // median slope). Slopes are quantized to integer 1e-6 units with
    // truncating integer division (Spark `div` and DuckDB `//` agree:
    // both truncate toward zero), so the median interpolates between
    // INTEGERS — exact dyadic midpoints, the q_anomaly idiom. The
    // pairwise self-join runs on the DAILY table (the raw stream is
    // reduced first): O(days²) pairs per type, bounded by the time
    // range squared — 3650 days = 6.7M pairs — never by event count.
    "q_theilsen" -> ((s, d) => {
      val daily = dailyCounts(events(s, d))
      daily.as("a").join(daily.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("a.day") < col("b.day"))
        .select(col("a.event_type").as("event_type"),
          (col("b.n") - col("a.n")).as("dn"),
          (col("b.day") - col("a.day")).as("dd"))
        .select(col("event_type"), expr("(1000000 * dn) div dd").as("sq"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"), expr("percentile(sq, 0.5)").as("m"))
        .select(col("event_type"), col("n_pairs"),
          round(col("m") / 1e6, 6).as("slope"))
    }),

    // Day-of-week seasonal profile per event type: the seasonal index
    // 7·n_dow/total (1.0 = flat week) — the calendar-cycle readout
    // feeding capacity planning and the seasonality-adjustment step of
    // any daily monitor. Day-of-week derives from the epoch-day
    // INTEGER ((day+3) mod 7, Monday=0, non-negative mod both engines)
    // — never from engine date functions, whose week conventions
    // (Sunday=0 vs 1, locale) differ. One scan-side hash agg to
    // (type, dow) partials; totals are a k-row broadcast back.
    "q_seasonality" -> ((s, d) => {
      val e = events(s, d).select(col("event_type"),
        expr("pmod(unix_micros(ts) div 86400000000 + " +
          "(case when unix_micros(ts) % 86400000000 < 0 then -1 else 0 end)" +
          " + 3, 7)").as("dow"))
      val counts = e.groupBy("event_type", "dow").agg(count(lit(1)).as("n"))
      val tot = counts.groupBy("event_type").agg(sum("n").as("t"))
      counts.join(broadcast(tot), "event_type")
        .select(col("event_type"), col("dow").cast("int").as("dow"), col("n"),
          round(lit(7.0) * col("n") / col("t"), 4).as("idx"))
    }),

    // Deeper replay of the same integer Pregel loop: 8 rounds, far
    // enough for the damped ranks to differentiate hubs from leaves.
    // Exercises the checkpoint-per-round discipline (constant
    // per-round plan, no lineage growth) that iters=3 barely probes.
    "q_pagerank_iter" -> ((s, d) => pagerankPlan(s, d, 8)),

    // Exponentially weighted daily series (α=1/2) per event type — the
    // smoothed-trend readout monitoring dashboards draw. Weights are
    // DYADIC (2^(7-j) over the trailing 8 observed days), and the
    // daily level is pre-quantized to integer 1e-4 units, so numerator
    // and denominator are exact BIGINTs; the only float op is the
    // final division, identical per row in both engines. One hash agg
    // to days + one partitioned window pass; series length is bounded
    // by the time range, never the event count.
    "q_ewma" -> ((s, d) => ewmaDaily(events(s, d))),

    // Brown's double exponential smoothing forecast (Brown 1956; the
    // linear-trend member of the exponential-smoothing family, round
    // 11): q_ewma smooths a LEVEL and forever lags a trending series;
    // Brown runs the SAME smoother twice — s2 = W(s1) — and
    // reconstructs level a = 2s1 − s2 and trend b = (s1 − s2)·α/(1−α)
    // (the dyadic half-weight kernel has α = 1/2, so b = s1 − s2),
    // forecasting a + h·b. Per type: last observed day's state + the
    // 1-day and 7-day-ahead forecasts. Exactness: daily sums are
    // 1e-4-quantized integers (ewmaDaily's discipline, floor-corrected
    // day bucketing); BOTH smoothing passes stay integer via the
    // truncating `div` on the dyadic numerator (Spark div ≡ DuckDB //,
    // verified on negatives), so level/trend/forecasts are exact
    // integers with one float division each at the end. Scale: one
    // hash agg to (type, day) — time-range-bounded — then two window
    // passes and a per-type top-1; nothing row-scale past the first
    // agg. Kernel honesty: the trailing-8 truncated kernel has mean
    // lag L = 247/255 ≈ 0.969 (not the infinite-kernel 1), so on an
    // exactly linear series level recovers x_t EXACTLY (the lags
    // cancel in 2s1−s2) while trend reads m·L — a 3% under-read the
    // spec pins; longer kernels drive L → 1 with the same plan.
    "q_forecast" -> ((s, d) => {
      val daily = events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000 + " +
            "(case when unix_micros(ts) % 86400000000 < 0 then -1 else 0 end)")
            .as("day"),
          floor(col("value") * 10000).cast("long").as("q"))
        .groupBy("event_type", "day")
        .agg(sum("q").as("dq"))
      val w = Window.partitionBy("event_type").orderBy("day")
      def dyadic(src: String, out: String)(df: DataFrame): DataFrame = {
        val terms = (0 to 7).map { j =>
          val x = if (j == 0) col(src) else lag(col(src), j).over(w)
          val wt = lit(1L << (7 - j))
          (when(x.isNotNull, x * wt).otherwise(lit(0L)),
            when(x.isNotNull, wt).otherwise(lit(0L)))
        }
        df.withColumn("num", terms.map(_._1).reduce(_ + _))
          .withColumn("den", terms.map(_._2).reduce(_ + _))
          .withColumn(out, expr("num div den")).drop("num", "den")
      }
      val smoothed = dyadic("s1q", "s2q")(dyadic("dq", "s1q")(daily))
      val level = lit(2L) * col("s1q") - col("s2q")
      val trend = col("s1q") - col("s2q")
      smoothed
        .withColumn("n_days", count(lit(1)).over(
          Window.partitionBy("event_type")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy(col("day").desc)))
        .where(col("rn") === 1)
        .select(col("event_type"), col("day"), col("n_days"),
          round(level.cast("double") / 10000.0, 4).as("level"),
          round(trend.cast("double") / 10000.0, 4).as("trend"),
          round((level + trend).cast("double") / 10000.0, 4).as("fc_1"),
          round((level + lit(7L) * trend).cast("double") / 10000.0, 4)
            .as("fc_7"))
    }),

    // Robust anomaly ranking: modified z-score (Iglewicz–Hoaglin,
    // 0.6745·(x−med)/MAD) per event type, top-5 most anomalous events
    // each. The value is pre-quantized to integer 1e-4 units so the
    // median/MAD order statistics interpolate between INTEGERS: every
    // midpoint is an exact dyadic double (x.0/x.5, then x.25 grains
    // for the MAD), bit-identical across engines — no implementation-
    // defined interpolation arithmetic near a rounding boundary. The
    // scale factor cancels in z (numerator and denominator both carry
    // the 1e4), so z is unchanged up to the quantization grain. Two
    // tiny keyed aggregates broadcast back over the scan; the
    // per-type top-5 runs through the bounded-heap TopKStructs
    // aggregate (the q_topk_agg idiom): k rows per type per partition
    // cross the exchange, so a hot event_type never lands its full
    // event stream on one reducer the way a rank window would. At
    // 100 TB the exact percentile() aggregates (which hold per-group
    // value arrays) swap for approx_percentile, the same documented
    // trade as q_winsorize/text_quality_bins.
    "q_anomaly" -> ((s, d) => {
      import graft.functions.TopKAggregate.topk
      val ev = events(s, d).select(col("event_id"), col("event_type"),
        col("value"), floor(col("value") * 10000).cast("long").as("q"))
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(q, 0.5)").as("med"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(expr("percentile(abs(q - med), 0.5)").as("mad"))
        .where(col("mad") =!= 0.0)
      val z = ev.join(broadcast(mad), "event_type")
        .withColumn("z",
          round(lit(0.6745) * (col("q") - col("med")) / col("mad"), 4))
      z.groupBy("event_type")
        .agg(topk(struct((-abs(col("z"))).as("negaz"),
          col("event_id").as("eid"), col("value").as("v"),
          col("z").as("zz")), 5).as("top"))
        .select(col("event_type"), posexplode(col("top")).as(Seq("i", "t")))
        .select(col("event_type"), (col("i") + 1).cast("int").as("rk"),
          col("t.eid").as("event_id"), col("t.v").as("value"),
          col("t.zz").as("z"))
    }),

    // Categorical column entropy profile — the data-quality twin of
    // q_profile for discrete columns: cardinality, Shannon entropy,
    // normalized entropy, and top-value concentration per column, in
    // one stacked scan per table. A collapsed (entropy→0, top_share→1)
    // column is the classic silent-upstream-failure signal. Value
    // counts partial-aggregate map-side, so hot values never skew the
    // exchange; per-column totals are a k-row aggregate broadcast
    // back over the counts (no `partition by col_name` window — a
    // mistakenly-profiled high-cardinality column would land its
    // whole distinct-value set on one reducer). Each −p·log2(p) term
    // is quantized to integer 1e-12 units BEFORE the cross-row sum,
    // so the sum is exact and partition-order-independent in both
    // engines (the per-term doubles are identical per-row; only the
    // float SUM's association differed) — upholding the pack's
    // "floats only in final per-row projections" rule.
    "q_entropy" -> ((s, d) => {
      val docs = documents(s, d)
      val cats = docs.select(lit("documents.lang").as("col_name"), col("lang").as("val"))
        .union(docs.select(lit("documents.source"), col("source")))
        .union(events(s, d).select(lit("events.event_type"), col("event_type")))
      val counts = cats.groupBy("col_name", "val").agg(count(lit(1)).as("n"))
      val totals = counts.groupBy("col_name").agg(sum("n").as("t"))
      val p = col("n").cast("double") / col("t")
      counts.join(broadcast(totals), "col_name")
        .withColumn("eterm", floor(-(p * log2(p)) * 1e12).cast("long"))
        .groupBy("col_name")
        .agg(
          max("t").as("n_rows"),
          count(lit(1)).as("n_distinct"),
          round(sum("eterm").cast("double") / 1e12, 6).as("entropy"),
          round(max("n").cast("double") / max("t"), 6).as("top_share"))
        .withColumn("norm_entropy",
          when(col("n_distinct") > 1,
            round(col("entropy") / log2(col("n_distinct")), 6)))
    }),

    // Small-file compaction planner — the table-maintenance pass every
    // streaming-ingested 100 TB table needs: treat per (partition,
    // ship-day) byte totals as "files", pack consecutive files into
    // ~1 GB output bins by cumulative-size floor division (the
    // day-ordered first-fit that preserves time locality, so each
    // compacted file still covers a contiguous day range and min/max
    // footer stats stay tight). Byte sizes are exact integers (scaled
    // cents), the cumsum is one partitioned window pass, and the bin
    // rollup is a hash agg — output rows ∝ total bytes / bin size.
    // Multi-touch conversion attribution (the four classic rule-based
    // credit models marketing analytics runs before any data-driven
    // one — first-touch, last-touch, linear, U-shaped/position-based
    // 40/20/40; Shao & Li KDD 2011 frames them as the baselines):
    // conversion = each user's FIRST purchase; touchpoints = their
    // non-purchase events in the strict 7-day lookback before it,
    // ordered by (ts, event_id). Credit is INTEGER millionths of a
    // conversion so every cross-row sum is exact in any partition
    // order: per-touch shares come from truncating `div` on the
    // per-user touch count (quantization under-credits a conversion
    // by < n·1e-6 — documented, identical in both engines), and the
    // U-shape pays 40/40 to the endpoints and 20 split across the
    // middle (n=1 → 100, n=2 → 50/50). Scale: one equi-join on
    // user_id (conversions side is user-count rows), ONE per-user
    // window over the 7-day touch set (lookback-bounded, never
    // history-bounded), one hash agg to channels. Output per channel:
    // touch count + credited conversions under all four models.
    "q_attribution" -> ((s, d) => {
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), expr("unix_micros(ts)").as("tus"))
      val conv = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min("tus").as("cts"))
      val touches = ev.filter(col("event_type") =!= "purchase")
        .join(conv, "user_id")
        .where(col("tus") < col("cts") &&
          col("tus") >= col("cts") - lit(604800000000L))
      val w = Window.partitionBy("user_id")
        .orderBy(col("tus"), col("event_id"))
      val wc = Window.partitionBy("user_id")
      val credited = touches
        .withColumn("rk", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(wc))
        .withColumn("ft", when(col("rk") === 1, 1000000L).otherwise(0L))
        .withColumn("lt",
          when(col("rk") === col("cnt"), 1000000L).otherwise(0L))
        .withColumn("lin", expr("1000000 div cnt"))
        .withColumn("ush",
          when(col("cnt") === 1, 1000000L)
            .when(col("rk") === 1 || col("rk") === col("cnt"),
              when(col("cnt") === 2, 500000L).otherwise(400000L))
            .otherwise(expr("200000 div (cnt - 2)")))
      credited.groupBy(col("event_type").as("channel"))
        .agg(count(lit(1)).as("n_touches"),
          round(sum("ft") / 1000000.0, 3).as("first_touch"),
          round(sum("lt") / 1000000.0, 3).as("last_touch"),
          round(sum("lin") / 1000000.0, 3).as("linear"),
          round(sum("ush") / 1000000.0, 3).as("u_shaped"))
    }),

    "q_compaction" -> ((s, d) => {
      val files = lineitem(s, d)
        .groupBy(col("l_returnflag").as("part"),
          to_date(col("l_shipdate")).as("day"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("bytes"))
      val w = Window.partitionBy("part").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
      files
        .withColumn("cum", coalesce(sum("bytes").over(w), lit(0L)))
        .withColumn("bin", expr("cum div 1000000000"))
        .groupBy("part", "bin")
        .agg(count(lit(1)).as("n_files"), sum("bytes").as("bytes"),
          date_format(min(col("day")), "yyyy-MM-dd").as("from_day"),
          date_format(max(col("day")), "yyyy-MM-dd").as("to_day"))
    }),

    // Dynamic time warping (Sakoe & Chiba, IEEE TASSP 1978; round 13)
    // between every event-type pair's first-30-day count series — the
    // ELASTIC-alignment distance the family lacks: q_xcorr's Pearson
    // at fixed lags sees only rigid shifts, DTW aligns locally
    // stretched/compressed shapes (a campaign ramping one day slower
    // reads as similar, not uncorrelated). Each DP ROW is declarative
    // via the prefix-sum/running-min decomposition: a warping path
    // enters row i at column k (vertically or diagonally) and walks
    // right, so D_i(j) = P_i(j) + min_{k≤j}(V(k) − P_i(k−1)) with
    // P the row's cost prefix sum and V(k) = min(D_{i−1}(k),
    // D_{i−1}(k−1)) — one join + three windows per row instead of a
    // cell-by-cell scan. All costs |a_i − b_j| are exact integer
    // counts, so the distance is an exact BIGINT. Scale: the series
    // is TIME-bounded (30 days regardless of SF), pairs are the
    // type-domain square — every window partitions by (ta, tb), the
    // cost cube is (types² × 900) rows, and row state rides the
    // `CheckpointStrategy` seam every third row to bound plan depth.
    "q_dtw" -> ((s, d) => dtwFrom(dailyCounts(events(s, d)))),

    // Sakoe–Chiba banded DTW (Sakoe & Chiba 1978 §III; round 14) —
    // the form every production matcher runs: cells with |i−j| > 5
    // are unreachable, so the cost cube shrinks from 900 to ~330
    // cells per pair and a pathological warp (one series' whole mass
    // crammed into the other's tail) is priced as DIFFERENT instead
    // of elastically absorbed. The band is ONE WHERE on the cost
    // cube; the V entry-minima table is built by exploding each
    // D_{i−1}(j) onto columns {j, j+1} and taking min — identical
    // values to q_dtw's lag() form inside the band, and exact at the
    // band's right edge, where column i+B exists in row i but not in
    // row i−1 (only the diagonal enters it).
    "q_dtw_banded" -> ((s, d) =>
      dtwBandedFrom(dailyCounts(events(s, d)))),

    // DBA barycenter (Petitjean, Ketterlin & Gançarski, Pattern
    // Recognition 2011; round 14) — the time-series family's CENTROID
    // operator: one DBA pass against the DTW medoid. Medoid = the
    // series minimizing Σ pairwise DTW (from the same row chain);
    // alignment cells are marked DECLARATIVELY — no path backtrack —
    // by the forward+reverse identity D(i,j) + R(i,j) − cst(i,j) =
    // DTW(pair) (a cell lies on an optimal path iff its through-cost
    // meets the total), averaging over ALL optimal alignments, which
    // keeps the operator a pure integer function of the corpus.
    "q_dtw_barycenter" -> ((s, d) =>
      dtwBarycenterFrom(dailyCounts(events(s, d)))),

    // Multi-pass DBA (round 15): 3 fixed re-marking passes against the
    // EVOLVING barycenter, squared local costs (the metric whose mean
    // update is the per-index minimizer — round 14's honest-math
    // find), mean init; the spec gates measured per-pass Fréchet²
    // descent and the oracle replays all three passes as chained CTEs.
    "q_dtw_barycenter_iter" -> ((s, d) =>
      dtwBarycenterIterFrom(dailyCounts(events(s, d))))
  )

  /** DP rows for `q_dtw` — the events table spans exactly 30 days at
    * every SF; a longer corpus gates its first 30 (documented cut,
    * WHERE i < 30 both engines). */
  private[graft] val DtwDays = 30

  /** The DTW fold over any (`event_type`, `day`, `n`) daily-count
    * frame — public to the test JVM so the spec can gate hand series
    * against a driver-side reference DP. */
  private[graft] def dtwFrom(daily: DataFrame,
      ckpt: graft.operators.CheckpointStrategy =
        graft.operators.CheckpointStrategy.Local): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d0 = daily.agg(min("day").as("d0"))
    val idx = daily.crossJoin(broadcast(d0))
      .select(col("event_type").as("t"),
        (col("day") - col("d0")).cast("int").as("i"), col("n"))
      .where(col("i") < DtwDays)
    val grid = idx.select("t").distinct()
      .select(col("t"), explode(sequence(lit(0), lit(DtwDays - 1))).as("i"))
    val full = grid.join(idx, Seq("t", "i"), "left")
      .select(col("t"), col("i"), coalesce(col("n"), lit(0L)).as("c"))
    val cost = ckpt(full.select(col("t").as("ta"), col("i"), col("c").as("ca"))
      .join(full.select(col("t").as("tb"), col("i").as("j"),
        col("c").as("cb")), col("ta") < col("tb"))
      .select(col("ta"), col("tb"), col("i"), col("j"),
        abs(col("ca") - col("cb")).as("cst")))
    val wj = Window.partitionBy("ta", "tb").orderBy("j")
    val wcum = wj.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var dRow = ckpt(cost.where(col("i") === 0)
      .select(col("ta"), col("tb"), col("j"),
        sum("cst").over(wcum).as("d")))
    for (i <- 1 until DtwDays) {
      val v = dRow.select(col("ta"), col("tb"), col("j"),
        least(col("d"), coalesce(lag("d", 1).over(wj), col("d"))).as("v"))
      val p = cost.where(col("i") === i)
        .select(col("ta"), col("tb"), col("j"),
          sum("cst").over(wcum).as("p"))
      val t = p.join(v, Seq("ta", "tb", "j"))
        .select(col("ta"), col("tb"), col("j"), col("p"),
          (col("v") - coalesce(lag("p", 1).over(wj), lit(0L))).as("term"))
      val next = t.select(col("ta"), col("tb"), col("j"),
        (col("p") + min("term").over(wcum)).as("d"))
      dRow = if (i % 3 == 0 || i == DtwDays - 1) ckpt(next) else next
    }
    dRow.where(col("j") === DtwDays - 1)
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("d").as("dtw"),
        round(col("d").cast("double") / (2 * DtwDays), 4).as("dtw_norm"))
  }

  /** Sakoe–Chiba band radius for `q_dtw_banded`: |i−j| ≤ 5 keeps a
    * 30-day alignment within a work-week of drift — wide enough for
    * every honest local stretch, narrow enough to price a pathological
    * whole-series warp as different. */
  private[graft] val DtwBand = 5

  /** The (t, i, c) zero-filled day grid shared by the DTW family. */
  private def dtwFull(daily: DataFrame): DataFrame = {
    val d0 = daily.agg(min("day").as("d0"))
    val idx = daily.crossJoin(broadcast(d0))
      .select(col("event_type").as("t"),
        (col("day") - col("d0")).cast("int").as("i"), col("n"))
      .where(col("i") < DtwDays)
    val grid = idx.select("t").distinct()
      .select(col("t"), explode(sequence(lit(0), lit(DtwDays - 1))).as("i"))
    grid.join(idx, Seq("t", "i"), "left")
      .select(col("t"), col("i"), coalesce(col("n"), lit(0L)).as("c"))
  }

  /** The (ta, tb, i, j, ca, cb, cst) pair cost cube over a day grid —
    * carries both series' values so the barycenter can read aligned
    * points straight off marked cells. */
  private def dtwCostFrom(full: DataFrame): DataFrame =
    full.select(col("t").as("ta"), col("i"), col("c").as("ca"))
      .join(full.select(col("t").as("tb"), col("i").as("j"),
        col("c").as("cb")), col("ta") < col("tb"))
      .select(col("ta"), col("tb"), col("i"), col("j"), col("ca"),
        col("cb"), abs(col("ca") - col("cb")).as("cst"))

  /** The DTW row chain over ANY (ta, tb, i, j, cst) cost cube whose
    * row-i column sets are contiguous and shift right by at most one
    * per row (full cube and every Sakoe–Chiba band qualify). Same
    * prefix-sum/running-min decomposition as [[dtwFrom]], but the V
    * entry-minima table is built by EXPLODING D_{i−1}(j) onto columns
    * {j, j+1} and taking min — value-identical to the lag() form where
    * both columns exist, and exact at a band's right edge, where
    * column i+B exists in row i but not row i−1 (only the diagonal
    * enters, which the explode supplies and lag() cannot). Returns
    * every row frame tagged with its i (checkpoint cadence every
    * third row bounds plan depth; the lazy in-between rows are ≤
    * pairs×31-row window chains, cheap to re-evaluate). */
  // The chain rides ONE parked (ta, tb) hash layout (pagerank's
  // captured-layout idiom): every window partitions by (ta, tb), the
  // v-aggregate groups by (ta, tb, j) and the p⋈v join keys on
  // (ta, tb, j) — all satisfied by SUBSET clustering, so with the cost
  // cube and row-0 checkpointed (ta, tb)-partitioned (AQE off for the
  // capture), EVERY round is exchange-free and each checkpoint is a
  // single-stage job. The first cut left the layout unparked: 3 chains
  // × 30 rounds × ~4 exchanges re-planned as ~400 tiny adaptive stage
  // jobs — 23 s for kilobytes of data.
  private def dtwChainAll(cost: DataFrame,
      ckpt: graft.operators.CheckpointStrategy)
      : Vector[(Int, DataFrame)] = {
    import org.apache.spark.sql.expressions.Window
    val wj = Window.partitionBy("ta", "tb").orderBy("j")
    val wcum = wj.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var dRow = ckpt(cost.where(col("i") === 0)
      .select(col("ta"), col("tb"), col("j"),
        sum("cst").over(wcum).as("d"))
      .repartition(col("ta"), col("tb")))
    val out = Vector.newBuilder[(Int, DataFrame)]
    out += 0 -> dRow
    for (i <- 1 until DtwDays) {
      val v = dRow
        .select(col("ta"), col("tb"),
          explode(array(col("j"), col("j") + 1)).as("j"), col("d"))
        .groupBy("ta", "tb", "j").agg(min("d").as("v"))
      val p = cost.where(col("i") === i)
        .select(col("ta"), col("tb"), col("j"),
          sum("cst").over(wcum).as("p"))
      val t = p.join(v, Seq("ta", "tb", "j"))
        .select(col("ta"), col("tb"), col("j"), col("p"),
          (col("v") - coalesce(lag("p", 1).over(wj), lit(0L))).as("term"))
      val next = t.select(col("ta"), col("tb"), col("j"),
        (col("p") + min("term").over(wcum)).as("d"))
      dRow = if (i % 2 == 0 || i == DtwDays - 1) ckpt(next) else next
      out += i -> dRow
    }
    out.result()
  }

  /** Banded DTW over any (`event_type`, `day`, `n`) daily-count frame
    * — public to the test JVM so the spec can pin band=∞ ≡ [[dtwFrom]]
    * and the band's refusal to absorb a whole-series warp. */
  private[graft] def dtwBandedFrom(daily: DataFrame, band: Int = DtwBand,
      ckpt: graft.operators.CheckpointStrategy =
        graft.operators.CheckpointStrategy.Local): DataFrame =
    graft.operators.SessionScope.withAqeOff(daily.sparkSession) { s2 =>
    // quarter-parallelism shuffles for the pair-sized chain state
    // (the q_mst lever; scoped to the PRIVATE clone, scales with the
    // cluster, partition count never enters a result)
    s2.conf.set("spark.sql.shuffle.partitions", math.max(1,
      s2.sparkContext.defaultParallelism / 4).toString)
    // the p⋈v joins key on (ta, tb, j); accepting the parked (ta, tb)
    // SUBSET co-partitioning needs this (default-on since Spark 3.3,
    // scoped to the private clone)
    s2.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    val d2 = org.apache.spark.sql.graftbridge.SessionBridge
      .rebind(daily, s2)
    val cost = ckpt(dtwCostFrom(dtwFull(d2))
      .where(abs(col("i") - col("j")) <= band)
      .repartition(col("ta"), col("tb")))
    dtwChainAll(cost, ckpt).last._2
      .where(col("j") === DtwDays - 1)
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("d").as("dtw_band"),
        round(col("d").cast("double") / (2 * DtwDays), 4)
          .as("dtw_band_norm"))
  }

  /** One-pass DBA barycenter against the DTW medoid — public to the
    * test JVM so the spec can pin medoid choice, alignment membership
    * and the one-pass cost decrease on a hand corpus. Three phases,
    * all declarative: (1) the all-pairs forward chain's LAST row
    * yields pairwise distances; the medoid minimizes the symmetrized
    * row sum (ties to the smaller type — min(struct)). (2) Forward and
    * reverse chains re-run on the cost cube FILTERED to medoid pairs
    * (a broadcast join with the 1-row medoid frame — at many-type
    * scale this is T−1 pairs, not T²/2); the reverse chain is the
    * forward kernel on the index-flipped cube. (3) A cell (i, j) lies
    * on an optimal warping path iff D(i,j) + R(i,j) − cst(i,j) equals
    * the pair's total (both sides count the cell once), so the
    * barycenter at medoid index i is the exact integer mean of the
    * medoid's own value and EVERY value any optimal alignment of any
    * series puts at i — averaging over all optimal paths instead of
    * backtracking one keeps the operator declarative and
    * tie-deterministic. The mean is DBA's update rule, i.e. the exact
    * minimizer of the SQUARED aligned residuals over a fixed
    * alignment (the spec gates that Fréchet-squared descent on a
    * unique-alignment corpus); under the family's |a−b| display
    * metric the per-index minimizer would be the median — documented
    * trade, mean kept for the canonical DBA semantics. */
  private[graft] def dtwBarycenterFrom(daily: DataFrame,
      ckpt: graft.operators.CheckpointStrategy =
        graft.operators.CheckpointStrategy.Local): DataFrame =
    graft.operators.SessionScope.cloned(daily.sparkSession) { s2 =>
    // Round 16 rebuild, same move as the iter key: the all-pairs +
    // medoid-pair chains (2 × 30 sequential window steps on a parked
    // (ta, tb) layout) were planning/job-floor-bound for kilobyte
    // pair groups. Each pair's 30×30 DP now runs as ONE
    // higher-order-function projection per pair row — value-identical
    // to the window decomposition (exact integer L1 DTW either way;
    // the oracle replays the window form and hashes match). Pairs are
    // independent rows, so the all-pairs phase scales out; only the
    // medoid tag (one value) crosses the driver.
    s2.conf.set("spark.sql.shuffle.partitions", math.max(1,
      s2.sparkContext.defaultParallelism / 4).toString)
    val d2 = org.apache.spark.sql.graftbridge.SessionBridge
      .rebind(daily, s2)
    val L = DtwDays - 1
    val series = ckpt(dtwFull(d2).groupBy("t")
      .agg(expr("transform(array_sort(collect_list(struct(i, c))), " +
        "x -> x.c)").as("cs")))
    def dpSql(x: String): String =
      s"""aggregate(
         |  sequence(1, $L),
         |  array(aggregate(sequence(1, $L), array($x[0][0]),
         |    (r, j) -> array_append(r, element_at(r, -1) + $x[0][j]))),
         |  (acc, i) -> array_append(acc,
         |    aggregate(sequence(1, $L),
         |      array($x[i][0] + element_at(acc, -1)[0]),
         |      (r, j) -> array_append(r, $x[i][j] + least(
         |        element_at(r, -1),
         |        element_at(acc, -1)[j - 1],
         |        element_at(acc, -1)[j])))))""".stripMargin
    // phase 1: per-pair totals in one projection over the pair frame
    val pairs = ckpt(series.select(col("t").as("ta"), col("cs").as("ca"))
      .join(series.select(col("t").as("tb"), col("cs").as("cb")),
        col("ta") < col("tb"))
      .withColumn("m", expr(
        "transform(ca, ai -> transform(cb, bj -> abs(ai - bj)))"))
      .withColumn("dd", expr(dpSql("m")))
      .withColumn("tot", expr(s"dd[$L][$L]"))
      .select("ta", "tb", "ca", "cb", "m", "dd", "tot"))
    // medoid: min symmetrized row sum, ties to the smaller type
    val mt = pairs.select(col("ta").as("t"), col("tot"))
      .unionByName(pairs.select(col("tb").as("t"), col("tot")))
      .groupBy("t").agg(sum("tot").as("s"))
      .agg(min(struct(col("s"), col("t"))).as("m"))
      .select(col("m.t")).collect()(0).getString(0)
    // phases 2+3 run only on the medoid's T−1 pairs: reverse DP, then
    // the all-paths marking (D + R − cst = tot) folded to the medoid
    // axis in-row — mi = i when the medoid is ta, else j; av = the
    // OTHER series' value at the aligned cell
    val medPairs = pairs.where(col("ta") === mt || col("tb") === mt)
      .withColumn("mr", expr(
        s"transform(sequence(0, $L), i -> transform(sequence(0, $L), " +
        s"j -> m[$L - i][$L - j]))"))
      .withColumn("dr", expr(dpSql("mr")))
      .select(col("ta"), col("tb"), col("ca"), col("cb"),
        expr(s"""CASE WHEN ta = '$mt' THEN
                |  transform(sequence(0, $L), i ->
                |    size(filter(sequence(0, $L), j ->
                |      dd[i][j] + dr[$L - i][$L - j] - m[i][j] = tot)))
                |ELSE
                |  transform(sequence(0, $L), j ->
                |    size(filter(sequence(0, $L), i ->
                |      dd[i][j] + dr[$L - i][$L - j] - m[i][j] = tot)))
                |END""".stripMargin).as("na"),
        expr(s"""CASE WHEN ta = '$mt' THEN
                |  transform(sequence(0, $L), i ->
                |    aggregate(filter(sequence(0, $L), j ->
                |      dd[i][j] + dr[$L - i][$L - j] - m[i][j] = tot),
                |      0L, (a, j) -> a + cb[j]))
                |ELSE
                |  transform(sequence(0, $L), j ->
                |    aggregate(filter(sequence(0, $L), i ->
                |      dd[i][j] + dr[$L - i][$L - j] - m[i][j] = tot),
                |      0L, (a, i) -> a + ca[i]))
                |END""".stripMargin).as("sc"))
    val own = series.where(col("t") === mt)
      .select(col("t").as("medoid"), posexplode(col("cs")))
      .select(col("medoid"), col("pos").as("mi"), col("col").as("mc"))
    medPairs.select(posexplode(arrays_zip(col("na"), col("sc"))))
      .groupBy(col("pos").as("mi"))
      .agg(sum("col.na").as("n_align"), sum("col.sc").as("sum_c"))
      .join(own, Seq("mi"))
      .select(col("mi").cast("int").as("i"), col("medoid"),
        col("n_align"), (col("mc") + col("sum_c")).as("sum_c"),
        expr("(mc + sum_c) * 1000000 div (n_align + 1)").as("bary_q"))
  }

  /** Fixed DBA re-marking passes for `q_dtw_barycenter_iter` — fixed
    * so the oracle stays a chain (the km_lloyd_fixed discipline). */
  private[graft] val DbaPasses = 3

  /** Multi-pass DBA (Petitjean, Ketterlin & Gançarski, Pattern
    * Recognition 2011 — the published algorithm ITERATES re-marking
    * against the current barycenter; round 14's one-pass key aligns
    * once against the medoid) over the per-type daily-count series.
    * Differences from the one-pass key, each load-bearing:
    *   - SQUARED local costs: DBA's descent theorem needs the mean
    *     update to minimize the aligned objective, which it does for
    *     squared residuals and NOT for the family's |a−b| display
    *     metric (round 14's honest-math find) — so this key's DTW is
    *     DTW₂² end to end and the spec gates measured per-pass descent
    *     of F(B) = Σ_t DTW₂²(B, t).
    *   - MEAN init (the paper's arbitrary-init license): B⁰(i) =
    *     per-index mean of all series, milli-quantized — no medoid
    *     chain, so each pass costs ONE tagged cube (T pairs × both
    *     directions ride one (ta, tb=dir) chain) instead of the
    *     one-pass key's T²/2 all-pairs chain.
    *   - All-paths marking kept (tie-determinism): a cell is aligned
    *     iff D + R − cst equals the pair total. The paper backtracks
    *     ONE path, under which mean updates provably descend; over the
    *     all-paths union the mean minimizes the union objective, which
    *     can differ — so descent here is MEASURED (spec-gated on the
    *     gate corpora), not assumed, and the trade is this comment.
    * Integer discipline: series values milli-quantized (c·1000) so
    * barycenter updates sum_c·1000 div n stay exact integers; squared
    * diffs ≤ (3e6·1e3)² per cell at sf-gate magnitudes — BIGINT-safe
    * to ~sf100, the DECIMAL switch documented there. Output: one row
    * per (pass, barycenter index) with that pass's PRE-update Fréchet²
    * (descent readout) and POST-update barycenter. Scale: each pass is
    * 2T chain groups over a DtwDays²-cell cube — time-bounded at any
    * SF like the whole DTW family; the barycenter frame is 30 rows
    * (broadcast by construction). */
  private[graft] def dtwBarycenterIterFrom(daily: DataFrame,
      ckpt: graft.operators.CheckpointStrategy =
        graft.operators.CheckpointStrategy.Local): DataFrame =
    graft.operators.SessionScope.cloned(daily.sparkSession) { s2 =>
    // Round 16 rebuild: the chain form (30 sequential window steps ×
    // 2 directions × 3 passes riding a parked (ta, tb) layout) was
    // chain-length-bound — 87 jobs and ~11 s of driver PLANNING for
    // kilobytes of data (np=1 measured WORSE, 24.7 s: not task-floor;
    // per-row folding measured 19.1 s at best). The whole 30×30 DP per
    // series is a bounded per-row computation, so it now runs as ONE
    // higher-order-function projection per (series, direction): the
    // classic recurrence D(i,j) = cst + min(D(i,j−1), D(i−1,j−1),
    // D(i−1,j)) as nested `aggregate` lambdas over the per-row cost
    // matrix — value-identical to the prefix-sum/running-min window
    // decomposition (both compute exact integer DTW₂²; the oracle
    // replays the window form and hashes match). Per pass: one
    // T-row projection + a 30-group fold — 3 jobs instead of ~29.
    // Scale: rows are independent (embarrassingly parallel over T
    // series); per-row state is the bounded DtwDays² cube. The
    // barycenter (30 longs) is the only driver round-trip per pass —
    // centroid-sized, the km_lloyd discipline.
    s2.conf.set("spark.sql.shuffle.partitions", math.max(1,
      s2.sparkContext.defaultParallelism / 4).toString)
    val d2 = org.apache.spark.sql.graftbridge.SessionBridge
      .rebind(daily, s2)
    val L = DtwDays - 1
    // one row per series: its 30-value day grid as an ordered array
    val series = ckpt(dtwFull(d2).groupBy("t")
      .agg(expr("transform(array_sort(collect_list(struct(i, c))), " +
        "x -> x.c)").as("cs")))
    // the DP cube over a cost matrix `x` (array<array<bigint>>,
    // [barycenter axis i][series axis j]), 0-based subscripts
    def dpSql(x: String): String =
      s"""aggregate(
         |  sequence(1, $L),
         |  array(aggregate(sequence(1, $L), array($x[0][0]),
         |    (r, j) -> array_append(r, element_at(r, -1) + $x[0][j]))),
         |  (acc, i) -> array_append(acc,
         |    aggregate(sequence(1, $L),
         |      array($x[i][0] + element_at(acc, -1)[0]),
         |      (r, j) -> array_append(r, $x[i][j] + least(
         |        element_at(r, -1),
         |        element_at(acc, -1)[j - 1],
         |        element_at(acc, -1)[j])))))""".stripMargin
    var baryArr: Seq[Long] = dtwFull(d2).groupBy("i")
      .agg(expr("sum(c) * 1000 div count(1)").as("bq"))
      .orderBy("i").collect().map(_.getLong(1)).toSeq
    val passRows = Vector.newBuilder[(Int, Int, Long, Long, Long)]
    for (p <- 1 to DbaPasses) {
      val bLit = baryArr.map(_.toString + "L")
        .mkString("array(", ",", ")")
      // cst[i][j] = (bq_i − c_j·1000)²; the reverse direction is the
      // index-flipped matrix; a cell (i, j) lies on an optimal path
      // iff D(i,j) + R(L−i, L−j) − cst(i,j) equals the pair total
      // (both sides count the cell once) — the same all-paths marking
      // as the one-pass key, folded per barycenter index in-row
      val perType = ckpt(series.select(col("t"), col("cs"),
        expr(s"""transform($bLit, bi ->
                |  transform(cs, cj -> (bi - cj * 1000L) * (bi - cj * 1000L)))"""
          .stripMargin).as("m"))
        .withColumn("dd", expr(dpSql("m")))
        .withColumn("mr", expr(
          s"transform(sequence(0, $L), i -> transform(sequence(0, $L), " +
          s"j -> m[$L - i][$L - j]))"))
        .withColumn("dr", expr(dpSql("mr")))
        .withColumn("tot", expr(s"dd[$L][$L]"))
        .select(col("t"), col("tot"),
          expr(s"""transform(sequence(0, $L), i ->
                  |  size(filter(sequence(0, $L), j ->
                  |    dd[i][j] + dr[$L - i][$L - j] - m[i][j] = tot)))"""
            .stripMargin).as("na"),
          expr(s"""transform(sequence(0, $L), i ->
                  |  aggregate(filter(sequence(0, $L), j ->
                  |    dd[i][j] + dr[$L - i][$L - j] - m[i][j] = tot),
                  |    0L, (a, j) -> a + cs[j]))""".stripMargin).as("sc")))
      val fre = perType.agg(sum("tot")).collect()(0).getLong(0)
      // every optimal path is corner-to-corner monotone, so each
      // barycenter index aligns ≥ 1 cell per series — no missing rows
      val nb = perType
        .select(posexplode(arrays_zip(col("na"), col("sc"))))
        .groupBy(col("pos").as("i"))
        .agg(sum("col.na").as("n_align"), sum("col.sc").as("sum_c"))
        .select(col("i"), col("n_align"),
          expr("sum_c * 1000 div n_align").as("bq"))
        .orderBy("i").collect()
      passRows ++= nb.map(r => (p, r.getAs[Int]("i"),
        r.getAs[Long]("n_align"), r.getAs[Long]("bq"), fre))
      baryArr = nb.map(_.getAs[Long]("bq")).toSeq
    }
    // output-sized driver materialization (90 rows)
    val out = s2.createDataFrame(passRows.result())
      .toDF("pass", "i", "n_align", "bary_q", "frechet2")
    out
  }

  def oracles: Map[String, String] = {
    // q_motif: the lead()-window SAX chain. HUGEINT pins the Q / S² /
    // squared-diff arithmetic (BIGINT overflows at real magnitudes),
    // mirroring the Spark plan's DECIMAL(38,0).
    val motifSql: String = {
      val xs = (0 until MotifW).map(j => s"x$j")
      val leads = (1 until MotifW)
        .map(j => s"lead(dq, $j) OVER wnd AS x$j").mkString(",\n    ")
      val sumX = xs.mkString(" + ")
      val sumQ = xs.map(x => s"CAST($x AS HUGEINT) * $x").mkString(" + ")
      val segLen = MotifW / MotifSeg
      val syms = (0 until MotifSeg).map { k =>
        val p = (0 until segLen).map(i => s"x${segLen * k + i}")
          .mkString(" + ")
        val lhs = s"CAST($MotifSeg * ($p) - s8 AS DOUBLE)"
        s"""(CASE WHEN $lhs < -0.6745 * rr THEN 'a'
           |      WHEN $lhs < 0 THEN 'b'
           |      WHEN $lhs < 0.6745 * rr THEN 'c'
           |      ELSE 'd' END)""".stripMargin
      }.mkString(" || ")
      val dist = xs.map(x => s"CAST(a.$x - b.$x AS HUGEINT) * (a.$x - b.$x)")
        .mkString(" + ")
      s"""WITH daily AS (SELECT event_type,
         |    epoch_us(ts) // 86400000000
         |      + (CASE WHEN epoch_us(ts) % 86400000000 < 0
         |         THEN -1 ELSE 0 END) AS day,
         |    sum(CAST(floor(value * 10000) AS BIGINT)) AS dq
         |  FROM events GROUP BY 1, 2),
         |lx AS (SELECT event_type, day, dq AS x0,
         |    $leads
         |  FROM daily WINDOW wnd AS (PARTITION BY event_type ORDER BY day)),
         |st AS (SELECT *, ($sumX) AS s8,
         |    sqrt(CAST($MotifW * ($sumQ)
         |      - CAST($sumX AS HUGEINT) * ($sumX) AS DOUBLE)) AS rr
         |  FROM lx WHERE x${MotifW - 1} IS NOT NULL),
         |words AS MATERIALIZED (SELECT event_type, day,
         |    $syms AS word, ${xs.mkString(", ")}
         |  FROM st),
         |census AS (SELECT event_type, word, count(*) AS n_win
         |  FROM words GROUP BY 1, 2),
         |top AS MATERIALIZED (SELECT * FROM (SELECT event_type, word, n_win,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY n_win DESC, word) AS rk
         |  FROM census) WHERE rk <= $MotifTop),
         |bw AS MATERIALIZED (SELECT w.* FROM words w
         |  JOIN top t ON t.event_type = w.event_type AND t.word = w.word),
         |best AS (SELECT * FROM (SELECT a.event_type, a.word,
         |    a.day AS d1, b.day AS d2, ($dist) AS pd,
         |    row_number() OVER (PARTITION BY a.event_type, a.word
         |      ORDER BY ($dist), a.day, b.day) AS pk
         |  FROM bw a JOIN bw b ON a.event_type = b.event_type
         |    AND a.word = b.word AND b.day >= a.day + $MotifW)
         |  WHERE pk = 1)
         |SELECT t.event_type, CAST(t.rk AS INT) AS rk, t.word,
         |  CAST(t.n_win AS BIGINT) AS n_win, s.d1, s.d2,
         |  round(sqrt(CAST(s.pd AS DOUBLE)) / 10000.0, 4) AS dist
         |FROM top t LEFT JOIN best s
         |  ON s.event_type = t.event_type AND s.word = t.word""".stripMargin
    }
    // one PageRank sweep: rank mass in, damped redistribution out.
    // CASTs pin DuckDB's HUGEINT sum back to BIGINT each round, so
    // both engines carry identical 64-bit values end to end.
    def prRound(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT d.node, d.deg,
         |    CAST(150000000 + (85 * c.cin) // 100 AS BIGINT) AS pr
         |  FROM deg d JOIN (
         |    SELECT e.dst AS node, CAST(sum(r.pr // r.deg) AS BIGINT) AS cin
         |    FROM $prev r JOIN edges e ON r.node = e.src GROUP BY 1) c
         |  USING (node))""".stripMargin

    def pagerankSql(iters: Int): String = {
      val rounds = (1 to iters).map(i => prRound(s"r${i - 1}", s"r$i")).mkString(",\n")
      // tagged-long ids mirror the Spark plan: part → k·2, supplier →
      // k·2+1; the display string materializes only for the top-20
      s"""WITH e0 AS (SELECT DISTINCT CAST(l_partkey AS BIGINT) AS p,
         |    CAST(l_suppkey AS BIGINT) AS sk FROM lineitem),
         |edges AS (
         |  SELECT p * 2 AS src, sk * 2 + 1 AS dst FROM e0
         |  UNION ALL
         |  SELECT sk * 2 + 1, p * 2 FROM e0),
         |deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
         |r0 AS (SELECT node, deg, CAST(1000000000 AS BIGINT) AS pr FROM deg),
         |$rounds
         |SELECT (CASE WHEN node % 2 = 0 THEN 'p' ELSE 's' END)
         |    || CAST(node // 2 AS VARCHAR) AS node,
         |  deg, pr,
         |  CAST(row_number() OVER (ORDER BY pr DESC, node) AS INT) AS rk
         |FROM r$iters QUALIFY rk <= 20""".stripMargin
    }

    // the PPR replay: pagerank's chained rounds with the teleport
    // term gated on the source set and a dense left-join + pr > 0
    // filter (value-identical to the Spark side's sparse union)
    def pprRound(prev: String, out: String): String =
      s"""$out AS (SELECT * FROM (
         |  SELECT d.node, d.deg,
         |    CAST((CASE WHEN d.node % 2 = 0 AND d.node // 2 <= 2
         |        THEN 150000000 ELSE 0 END)
         |      + (85 * coalesce(c.cin, 0)) // 100 AS BIGINT) AS pr
         |  FROM deg d LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(r.pr // r.deg) AS BIGINT) AS cin
         |    FROM $prev r JOIN edges e ON r.node = e.src GROUP BY 1) c
         |  USING (node)) WHERE pr > 0)""".stripMargin

    def pprMultiRound(prev: String, out: String): String =
      s"""$out AS (SELECT * FROM (
         |  SELECT s.g, d.node, d.deg,
         |    CAST((CASE WHEN d.node % 2 = 0 AND d.node // 2 <= 11
         |        AND (d.node // 2) // 3 = s.g THEN 150000000 ELSE 0 END)
         |      + (85 * coalesce(c.cin, 0)) // 100 AS BIGINT) AS pr
         |  FROM (SELECT DISTINCT g FROM m0) s CROSS JOIN deg d
         |  LEFT JOIN (
         |    SELECT r.g, e.dst AS node, CAST(sum(r.pr // r.deg) AS BIGINT)
         |      AS cin
         |    FROM $prev r JOIN edges e ON r.node = e.src GROUP BY 1, 2) c
         |  ON c.g = s.g AND c.node = d.node) WHERE pr > 0)""".stripMargin

    def pprMultiSql(iters: Int): String = {
      val rounds = (1 to iters)
        .map(i => pprMultiRound(s"m${i - 1}", s"m$i")).mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT CAST(l_partkey AS BIGINT) AS p,
         |    CAST(l_suppkey AS BIGINT) AS sk FROM lineitem),
         |edges AS (
         |  SELECT p * 2 AS src, sk * 2 + 1 AS dst FROM e0
         |  UNION ALL
         |  SELECT sk * 2 + 1, p * 2 FROM e0),
         |deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
         |m0 AS (SELECT (node // 2) // 3 AS g, node, deg,
         |    CAST(1000000000 AS BIGINT) AS pr
         |  FROM deg WHERE node % 2 = 0 AND node // 2 <= 11),
         |$rounds,
         |tot AS (SELECT g, count(*) AS n_touched FROM m$iters GROUP BY 1)
         |SELECT CAST(r.g AS INT) AS grp,
         |  CAST(row_number() OVER (PARTITION BY r.g
         |    ORDER BY pr DESC, node) AS INT) AS rk,
         |  (CASE WHEN node % 2 = 0 THEN 'p' ELSE 's' END)
         |    || CAST(node // 2 AS VARCHAR) AS node,
         |  pr, CAST(t.n_touched AS BIGINT) AS n_touched
         |FROM m$iters r JOIN tot t USING (g) QUALIFY rk <= 5"""
        .stripMargin
    }

    def pprSql(iters: Int): String = {
      val rounds = (1 to iters)
        .map(i => pprRound(s"r${i - 1}", s"r$i")).mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT CAST(l_partkey AS BIGINT) AS p,
         |    CAST(l_suppkey AS BIGINT) AS sk FROM lineitem),
         |edges AS (
         |  SELECT p * 2 AS src, sk * 2 + 1 AS dst FROM e0
         |  UNION ALL
         |  SELECT sk * 2 + 1, p * 2 FROM e0),
         |deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
         |r0 AS (SELECT node, deg, CAST(1000000000 AS BIGINT) AS pr
         |  FROM deg WHERE node % 2 = 0 AND node // 2 <= 2),
         |$rounds,
         |tot AS (SELECT count(*) AS n_touched FROM r$iters)
         |SELECT CAST(row_number() OVER (ORDER BY pr DESC, node) AS INT)
         |    AS rk,
         |  (CASE WHEN node % 2 = 0 THEN 'p' ELSE 's' END)
         |    || CAST(node // 2 AS VARCHAR) AS node,
         |  pr, CAST(tot.n_touched AS BIGINT) AS n_touched
         |FROM r$iters CROSS JOIN tot QUALIFY rk <= 20""".stripMargin
    }

    // q_dtw: the row-recurrence replay — per DP row a V table
    // (vertical/diagonal entry minima via lag), the row's cost prefix
    // sum, and the running-min composition; MATERIALIZED per row so
    // the 30-deep chain never re-inlines
    val dtwSql: String = {
      val rows = (1 until DtwDays).map { i =>
        s"""v$i AS (SELECT ta, tb, j, least(d, coalesce(lag(d) OVER
           |    (PARTITION BY ta, tb ORDER BY j), d)) AS v FROM r${i - 1}),
           |r$i AS MATERIALIZED (SELECT ta, tb, j, p + min(term) OVER
           |    (PARTITION BY ta, tb ORDER BY j
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d
           |  FROM (SELECT c.ta, c.tb, c.j, c.p,
           |      v.v - coalesce(lag(c.p) OVER
           |        (PARTITION BY c.ta, c.tb ORDER BY c.j), 0) AS term
           |    FROM (SELECT ta, tb, j, sum(cst) OVER
           |        (PARTITION BY ta, tb ORDER BY j
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
           |      FROM cost WHERE i = $i) c
           |    JOIN v$i v ON v.ta = c.ta AND v.tb = c.tb AND v.j = c.j))"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH dy AS (SELECT event_type,
         |    epoch_us(ts) // 86400000000 + (CASE WHEN
         |      epoch_us(ts) % 86400000000 < 0 THEN -1 ELSE 0 END)
         |      AS day FROM events),
         |dc AS (SELECT event_type, day, count(*) AS n
         |  FROM dy GROUP BY 1, 2),
         |d0 AS (SELECT min(day) AS d0 FROM dc),
         |idx AS (SELECT event_type AS t, CAST(day - d0 AS INT) AS i, n
         |  FROM dc, d0 WHERE day - d0 < $DtwDays),
         |g AS (SELECT s.t, CAST(x.range AS INT) AS i
         |  FROM (SELECT DISTINCT t FROM idx) s, range($DtwDays) x),
         |fl AS MATERIALIZED (SELECT g.t, g.i, COALESCE(idx.n, 0) AS c
         |  FROM g LEFT JOIN idx ON idx.t = g.t AND idx.i = g.i),
         |cost AS MATERIALIZED (SELECT a.t AS ta, b.t AS tb,
         |    a.i AS i, b.i AS j, abs(a.c - b.c) AS cst
         |  FROM fl a JOIN fl b ON a.t < b.t),
         |r0 AS MATERIALIZED (SELECT ta, tb, j, sum(cst) OVER
         |    (PARTITION BY ta, tb ORDER BY j
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d
         |  FROM cost WHERE i = 0),
         |$rows
         |SELECT ta AS type_a, tb AS type_b, CAST(d AS BIGINT) AS dtw,
         |  round(CAST(d AS DOUBLE) / ${2 * DtwDays}, 4) AS dtw_norm
         |FROM r${DtwDays - 1} WHERE j = ${DtwDays - 1}""".stripMargin
    }

    // shared preamble for the DTW family: zero-filled day grid `fl`
    // and the pair cost cube (the banded/barycenter variants carry
    // ca/cb for aligned-value readout)
    val dtwPre: String =
      s"""dy AS (SELECT event_type,
         |    epoch_us(ts) // 86400000000 + (CASE WHEN
         |      epoch_us(ts) % 86400000000 < 0 THEN -1 ELSE 0 END)
         |      AS day FROM events),
         |dc AS (SELECT event_type, day, count(*) AS n
         |  FROM dy GROUP BY 1, 2),
         |d0 AS (SELECT min(day) AS d0 FROM dc),
         |idx AS (SELECT event_type AS t, CAST(day - d0 AS INT) AS i, n
         |  FROM dc, d0 WHERE day - d0 < $DtwDays),
         |g AS (SELECT s.t, CAST(x.range AS INT) AS i
         |  FROM (SELECT DISTINCT t FROM idx) s, range($DtwDays) x),
         |fl AS MATERIALIZED (SELECT g.t, g.i, COALESCE(idx.n, 0) AS c
         |  FROM g LEFT JOIN idx ON idx.t = g.t AND idx.i = g.i)"""
        .stripMargin

    // the explode-V row chain (dtwChainAll's form): each D_{i−1}(j)
    // lands on columns {j, j+1}, min per column — exact at band edges
    def dtwChainSql(pfx: String, costCte: String): String =
      (1 until DtwDays).map { i =>
        s"""${pfx}v$i AS (SELECT ta, tb, j, min(d) AS v FROM (
           |    SELECT ta, tb, j, d FROM $pfx${i - 1}
           |    UNION ALL SELECT ta, tb, j + 1 AS j, d FROM $pfx${i - 1})
           |  GROUP BY 1, 2, 3),
           |$pfx$i AS MATERIALIZED (SELECT ta, tb, j, p + min(term) OVER
           |    (PARTITION BY ta, tb ORDER BY j
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d
           |  FROM (SELECT c.ta, c.tb, c.j, c.p,
           |      v.v - coalesce(lag(c.p) OVER
           |        (PARTITION BY c.ta, c.tb ORDER BY c.j), 0) AS term
           |    FROM (SELECT ta, tb, j, sum(cst) OVER
           |        (PARTITION BY ta, tb ORDER BY j
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
           |      FROM $costCte WHERE i = $i) c
           |    JOIN ${pfx}v$i v ON v.ta = c.ta AND v.tb = c.tb
           |      AND v.j = c.j))""".stripMargin
      }.mkString(",\n")

    def dtwChainHead(pfx: String, costCte: String): String =
      s"""${pfx}0 AS MATERIALIZED (SELECT ta, tb, j, sum(cst) OVER
         |    (PARTITION BY ta, tb ORDER BY j
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d
         |  FROM $costCte WHERE i = 0)""".stripMargin

    def dtwAllRows(pfx: String): String =
      (0 until DtwDays).map(i =>
        s"SELECT CAST($i AS INT) AS i, ta, tb, j, d FROM $pfx$i")
        .mkString("\n  UNION ALL ")

    val dtwBandedSql: String =
      s"""WITH $dtwPre,
         |cost AS MATERIALIZED (SELECT a.t AS ta, b.t AS tb,
         |    a.i AS i, b.i AS j, abs(a.c - b.c) AS cst
         |  FROM fl a JOIN fl b ON a.t < b.t
         |  WHERE abs(a.i - b.i) <= $DtwBand),
         |${dtwChainHead("b", "cost")},
         |${dtwChainSql("b", "cost")}
         |SELECT ta AS type_a, tb AS type_b, CAST(d AS BIGINT) AS dtw_band,
         |  round(CAST(d AS DOUBLE) / ${2 * DtwDays}, 4) AS dtw_band_norm
         |FROM b${DtwDays - 1} WHERE j = ${DtwDays - 1}""".stripMargin

    val dtwBarycenterSql: String = {
      val L = DtwDays - 1
      s"""WITH $dtwPre,
         |cost AS MATERIALIZED (SELECT a.t AS ta, b.t AS tb,
         |    a.i AS i, b.i AS j, a.c AS ca, b.c AS cb,
         |    abs(a.c - b.c) AS cst
         |  FROM fl a JOIN fl b ON a.t < b.t),
         |${dtwChainHead("a", "cost")},
         |${dtwChainSql("a", "cost")},
         |tots AS (SELECT ta, tb, d AS tot FROM a$L WHERE j = $L),
         |sums AS (SELECT t, sum(tot) AS s FROM (
         |    SELECT ta AS t, tot FROM tots
         |    UNION ALL SELECT tb AS t, tot FROM tots) GROUP BY 1),
         |med AS (SELECT t AS mt FROM sums ORDER BY s, t LIMIT 1),
         |costm AS MATERIALIZED (SELECT c.*, m.mt FROM cost c
         |  JOIN med m ON c.ta = m.mt OR c.tb = m.mt),
         |costr AS MATERIALIZED (SELECT ta, tb, $L - i AS i,
         |    $L - j AS j, cst FROM costm),
         |${dtwChainHead("f", "costm")},
         |${dtwChainSql("f", "costm")},
         |${dtwChainHead("r", "costr")},
         |${dtwChainSql("r", "costr")},
         |fwdall AS MATERIALIZED (${dtwAllRows("f")}),
         |rvall AS MATERIALIZED (SELECT ta, tb, $L - i AS i,
         |    $L - j AS j, d AS dr FROM (${dtwAllRows("r")})),
         |totm AS (SELECT ta, tb, d AS tot FROM f$L WHERE j = $L),
         |cells AS (SELECT
         |    CASE WHEN c.ta = c.mt THEN f.i ELSE f.j END AS mi,
         |    CASE WHEN c.ta = c.mt THEN c.cb ELSE c.ca END AS av
         |  FROM fwdall f
         |  JOIN rvall r ON r.ta = f.ta AND r.tb = f.tb
         |    AND r.i = f.i AND r.j = f.j
         |  JOIN costm c ON c.ta = f.ta AND c.tb = f.tb
         |    AND c.i = f.i AND c.j = f.j
         |  JOIN totm t ON t.ta = f.ta AND t.tb = f.tb
         |  WHERE f.d + r.dr - c.cst = t.tot),
         |own AS (SELECT m.mt AS medoid, fl.i AS mi, fl.c AS mc
         |  FROM fl JOIN med m ON fl.t = m.mt)
         |SELECT CAST(c.mi AS INT) AS i, o.medoid,
         |  count(*) AS n_align,
         |  CAST(o.mc + sum(c.av) AS BIGINT) AS sum_c,
         |  CAST((o.mc + sum(c.av)) * 1000000 // (count(*) + 1)
         |    AS BIGINT) AS bary_q
         |FROM cells c JOIN own o ON o.mi = c.mi
         |GROUP BY c.mi, o.medoid, o.mc""".stripMargin
    }

    // the 3-pass DBA replay: mean init b0, then per pass the squared
    // cost cube vs b{p−1} (both directions tagged into ONE chain),
    // forward/reverse chains, the marked-cell fold, and b{p}
    val dtwBarycenterIterSql: String = {
      val L = DtwDays - 1
      def pass(p: Int): String = {
        val pfx = s"w$p"
        s"""cf$p AS MATERIALIZED (SELECT fl.t AS ta, b.i AS i, fl.i AS j,
           |    fl.c AS cr,
           |    (b.bq - fl.c * 1000) * (b.bq - fl.c * 1000) AS cst
           |  FROM fl CROSS JOIN b${p - 1} b),
           |cost$p AS MATERIALIZED (SELECT ta, 'f' AS tb, i, j, cst
           |  FROM cf$p
           |  UNION ALL SELECT ta, 'r', $L - i, $L - j, cst FROM cf$p),
           |${dtwChainHead(pfx, s"cost$p")},
           |${dtwChainSql(pfx, s"cost$p")},
           |fa$p AS MATERIALIZED (${dtwAllRows(pfx)}),
           |fw$p AS (SELECT ta, i, j, d FROM fa$p WHERE tb = 'f'),
           |rv$p AS (SELECT ta, $L - i AS i, $L - j AS j, d AS dr
           |  FROM fa$p WHERE tb = 'r'),
           |tt$p AS MATERIALIZED (SELECT ta, d AS tot FROM fw$p
           |  WHERE i = $L AND j = $L),
           |fr$p AS (SELECT CAST(sum(tot) AS BIGINT) AS frechet2
           |  FROM tt$p),
           |cl$p AS (SELECT c.i AS mi, c.cr FROM fw$p f
           |  JOIN rv$p r ON r.ta = f.ta AND r.i = f.i AND r.j = f.j
           |  JOIN cf$p c ON c.ta = f.ta AND c.i = f.i AND c.j = f.j
           |  JOIN tt$p t ON t.ta = f.ta
           |  WHERE f.d + r.dr - c.cst = t.tot),
           |b$p AS MATERIALIZED (SELECT mi AS i, count(*) AS n_align,
           |    CAST(sum(cr) * 1000 // count(*) AS BIGINT) AS bq
           |  FROM cl$p GROUP BY mi)""".stripMargin
      }
      val passes = (1 to DbaPasses).map(pass).mkString(",\n")
      val outs = (1 to DbaPasses).map(p =>
        s"""SELECT $p AS pass, b$p.i, b$p.n_align, b$p.bq AS bary_q,
           |  fr$p.frechet2 FROM b$p CROSS JOIN fr$p""".stripMargin)
        .mkString("\n  UNION ALL ")
      s"""WITH $dtwPre,
         |b0 AS MATERIALIZED (SELECT i,
         |    CAST(sum(c) * 1000 // count(*) AS BIGINT) AS bq
         |  FROM fl GROUP BY i),
         |$passes
         |SELECT CAST(pass AS INT) AS pass, CAST(i AS INT) AS i,
         |  CAST(n_align AS BIGINT) AS n_align, bary_q, frechet2
         |FROM ($outs)""".stripMargin
    }

    Map(
      "q_motif" -> motifSql,
      // the index variant must agree row-for-row with the brute force
      // — ONE oracle pins both (dedup_clusters_star's discipline)
      "q_motif_isax" -> motifSql,
      "q_dtw" -> dtwSql,
      "q_dtw_banded" -> dtwBandedSql,
      "q_dtw_barycenter" -> dtwBarycenterSql,
      "q_dtw_barycenter_iter" -> dtwBarycenterIterSql,

      "q_markov_stationary" -> markovSql,

      "q_decompose" ->
        """WITH daily AS (SELECT event_type,
          |    epoch_us(ts) // 86400000000
          |      + (CASE WHEN epoch_us(ts) % 86400000000 < 0
          |         THEN -1 ELSE 0 END) AS day,
          |    count(*) AS y
          |  FROM events GROUP BY 1, 2),
          |t AS (SELECT *, sum(y) OVER wt AS t7, count(*) OVER wt AS nf
          |  FROM daily WINDOW wt AS (PARTITION BY event_type
          |    ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
          |i AS (SELECT event_type, day, CAST(y AS BIGINT) AS y,
          |    CAST(t7 AS BIGINT) AS t7,
          |    CAST(7 * y - t7 AS BIGINT) AS detr7,
          |    ((day + 3) % 7 + 7) % 7 AS dow
          |  FROM t WHERE nf = 7),
          |s AS (SELECT event_type, dow,
          |    CAST(sum(detr7) AS BIGINT) // count(*) AS seas7
          |  FROM i GROUP BY 1, 2)
          |SELECT i.event_type, i.day, i.y, i.t7, s.seas7,
          |  i.detr7 - s.seas7 AS resid7
          |FROM i JOIN s USING (event_type, dow)""".stripMargin,

      "q_skyline" ->
        """WITH sp AS (SELECT o_custkey AS custkey,
          |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          |      AS spend_cents,
          |    count(*) AS n_orders,
          |    max(epoch_us(o_orderdate) // 86400000000) AS last_day
          |  FROM orders GROUP BY 1)
          |SELECT p.custkey, p.spend_cents, p.n_orders, p.last_day
          |FROM sp p
          |WHERE NOT EXISTS (SELECT 1 FROM sp q
          |  WHERE q.spend_cents >= p.spend_cents
          |    AND q.n_orders >= p.n_orders
          |    AND q.last_day >= p.last_day
          |    AND (q.spend_cents > p.spend_cents
          |      OR q.n_orders > p.n_orders
          |      OR q.last_day > p.last_day))""".stripMargin,
      "q_pagerank" -> pagerankSql(3),
      "q_pagerank_ppr" -> pprSql(3),
      "q_pagerank_ppr_multi" -> pprMultiSql(3),
      "q_pagerank_iter" -> pagerankSql(8),

      "q_ewma" -> {
        val lags = (1 to 7).map(j => s"lag(dq, $j) OVER w AS l$j").mkString(",\n|    ")
        // j=0 term NULL-guarded exactly like the Spark side's
        // when(dq.isNotNull, ...): a NULL daily sum (all-NULL values
        // that day) drops out of BOTH numerator and denominator
        // instead of propagating NULL against a denominator of 128.
        val num = "coalesce(CAST(dq AS BIGINT), 0) * 128 + " +
          (1 to 7).map(j => s"coalesce(l$j, 0) * ${1L << (7 - j)}").mkString(" + ")
        val den = "CASE WHEN dq IS NULL THEN 0 ELSE 128 END + " +
          (1 to 7).map(j => s"CASE WHEN l$j IS NULL THEN 0 ELSE ${1L << (7 - j)} END")
            .mkString(" + ")
        s"""WITH ev AS (SELECT event_type,
           |    epoch_us(ts) // 86400000000 + (CASE WHEN
           |      epoch_us(ts) % 86400000000 < 0 THEN -1 ELSE 0 END) AS day,
           |    CAST(floor(value * 10000) AS BIGINT) AS q FROM events),
           |daily AS (SELECT event_type, day, CAST(sum(q) AS BIGINT) AS dq,
           |    count(*) AS n FROM ev GROUP BY 1, 2),
           |lagd AS (SELECT event_type, day, n, dq,
           |    $lags
           |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day))
           |SELECT event_type, day, n,
           |  round(CAST($num AS DOUBLE) / ($den) / 10000.0, 4) AS ewma
           |FROM lagd""".stripMargin
      },

      "q_survival" ->
        """WITH ev AS (SELECT user_id, event_type,
          |    epoch_us(ts) // 86400000000 + (CASE WHEN
          |      epoch_us(ts) % 86400000000 < 0 THEN -1 ELSE 0 END) AS day
          |  FROM events),
          |pu AS (SELECT user_id, min(day) AS d0,
          |    min(CASE WHEN event_type = 'purchase' THEN day END) AS dc,
          |    max(day) AS dl
          |  FROM ev GROUP BY 1),
          |span AS (SELECT max(dl) AS dend FROM pu),
          |lt AS (SELECT coalesce(dc - d0, dend - d0) AS t,
          |    CAST(dc IS NULL AS BIGINT) AS cens
          |  FROM pu, span),
          |byt AS (SELECT t, count(*) AS n_at_t,
          |    CAST(sum(cens) AS BIGINT) AS n_censored,
          |    CAST(count(*) - sum(cens) AS BIGINT) AS n_death
          |  FROM lt GROUP BY 1),
          |tot AS (SELECT count(*) AS n_users FROM lt),
          |r AS (SELECT byt.*, tot.n_users - coalesce(sum(n_at_t) OVER (
          |      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
          |      AND 1 PRECEDING), 0) AS n_risk
          |  FROM byt, tot),
          |r2 AS (SELECT *,
          |    CASE WHEN n_death = 0 THEN 0
          |      WHEN n_death < n_risk THEN CAST(floor(
          |        ln(CAST(n_risk - n_death AS DOUBLE)
          |           / CAST(n_risk AS DOUBLE)) * 1000000000000) AS BIGINT)
          |      ELSE 0 END AS term,
          |    max(CASE WHEN n_death = n_risk THEN 1 ELSE 0 END) OVER (
          |      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
          |      AND CURRENT ROW) AS zeroed
          |  FROM r),
          |r3 AS (SELECT *, sum(term) OVER (ORDER BY t ROWS BETWEEN
          |    UNBOUNDED PRECEDING AND CURRENT ROW) AS lnq FROM r2)
          |SELECT CAST(t AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
          |  n_death, n_censored,
          |  CASE WHEN zeroed = 1 THEN 0.0
          |    ELSE round(exp(CAST(lnq AS DOUBLE) / 1000000000000), 4)
          |  END AS surv
          |FROM r3""".stripMargin,

      "q_xcorr" ->
        """WITH ev AS (SELECT event_type,
          |    epoch_us(ts) // 86400000000 + (CASE WHEN
          |      epoch_us(ts) % 86400000000 < 0 THEN -1 ELSE 0 END) AS day
          |  FROM events),
          |daily AS (SELECT event_type, day, count(*) AS n FROM ev GROUP BY 1, 2),
          |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
          |grid AS (SELECT event_type, unnest(generate_series(d0, d1)) AS day
          |  FROM (SELECT DISTINCT event_type FROM daily), span),
          |f AS (SELECT g.event_type, g.day, coalesce(daily.n, 0) AS n
          |  FROM grid g LEFT JOIN daily USING (event_type, day)),
          |b AS (SELECT event_type AS tb, day - l.l AS day, n AS nb, l.l
          |  FROM f, (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS l) l),
          |j AS (SELECT a.event_type AS ta, b.tb, b.l, a.n AS na, b.nb
          |  FROM f a JOIN b ON a.day = b.day AND a.event_type < b.tb),
          |agg AS (SELECT ta, tb, l, count(*) AS k,
          |    CAST(sum(na) AS BIGINT) AS sa, CAST(sum(nb) AS BIGINT) AS sb,
          |    CAST(sum(na * na) AS BIGINT) AS saa,
          |    CAST(sum(nb * nb) AS BIGINT) AS sbb,
          |    CAST(sum(na * nb) AS BIGINT) AS sab
          |  FROM j GROUP BY 1, 2, 3)
          |SELECT ta AS type_a, tb AS type_b, CAST(l AS INT) AS lag,
          |  CAST(k AS BIGINT) AS n_days,
          |  round(CAST(k * sab - sa * sb AS DOUBLE)
          |    / (sqrt(CAST(k * saa - sa * sa AS DOUBLE))
          |       * sqrt(CAST(k * sbb - sb * sb AS DOUBLE))), 4) AS r
          |FROM agg
          |WHERE k * saa - sa * sa > 0 AND k * sbb - sb * sb > 0""".stripMargin,

      "q_acf" -> {
        val lags = (1 to 7).map(j => s"lag(c, $j) OVER w AS c$j").mkString(",\n|    ")
        val nums = (1 to 7).map(j =>
          s"CAST(sum(CASE WHEN c$j IS NULL THEN 0 ELSE c * c$j END) AS BIGINT) AS num$j")
          .mkString(",\n|    ")
        val rows = (1 to 7).map(j =>
          s"SELECT event_type, CAST($j AS INT) AS lag," +
            s" round(CAST(num$j AS DOUBLE) / den, 4) AS r FROM a WHERE den > 0")
          .mkString("\n|UNION ALL ")
        s"""WITH ev AS (SELECT event_type,
           |    epoch_us(ts) // 86400000000 + (CASE WHEN
           |      epoch_us(ts) % 86400000000 < 0 THEN -1 ELSE 0 END) AS day
           |  FROM events),
           |daily AS (SELECT event_type, day, count(*) AS n FROM ev GROUP BY 1, 2),
           |tot AS (SELECT event_type, count(*) AS nd, CAST(sum(n) AS BIGINT) AS sn
           |  FROM daily GROUP BY 1),
           |c AS (SELECT event_type, day, CAST(nd * n - sn AS BIGINT) AS c
           |  FROM daily JOIN tot USING (event_type)),
           |lagd AS (SELECT event_type, c,
           |    $lags
           |  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY day)),
           |a AS (SELECT event_type, CAST(sum(c * c) AS BIGINT) AS den,
           |    $nums
           |  FROM lagd GROUP BY 1)
           |$rows""".stripMargin
      },

      "q_theilsen" ->
        """WITH ev AS (SELECT event_type,
          |    epoch_us(ts) // 86400000000 + (CASE WHEN
          |      epoch_us(ts) % 86400000000 < 0 THEN -1 ELSE 0 END) AS day
          |  FROM events),
          |daily AS (SELECT event_type, day, count(*) AS n FROM ev GROUP BY 1, 2),
          |p AS (SELECT a.event_type,
          |    CAST((1000000 * (b.n - a.n)) // (b.day - a.day) AS BIGINT) AS sq
          |  FROM daily a JOIN daily b
          |    ON a.event_type = b.event_type AND a.day < b.day)
          |SELECT event_type, count(*) AS n_pairs,
          |  round(quantile_cont(sq, 0.5) / 1e6, 6) AS slope
          |FROM p GROUP BY 1""".stripMargin,

      "q_seasonality" ->
        """WITH ev AS (SELECT event_type,
          |    ((epoch_us(ts) // 86400000000 + (CASE WHEN
          |      epoch_us(ts) % 86400000000 < 0 THEN -1 ELSE 0 END) + 3)
          |      % 7 + 7) % 7 AS dow
          |  FROM events),
          |counts AS (SELECT event_type, dow, count(*) AS n FROM ev GROUP BY 1, 2),
          |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS t
          |  FROM counts GROUP BY 1)
          |SELECT event_type, CAST(dow AS INT) AS dow, n,
          |  round(7.0 * n / t, 4) AS idx
          |FROM counts JOIN tot USING (event_type)""".stripMargin,

      "q_anomaly" ->
        """WITH ev AS (SELECT event_id, event_type, value,
          |    CAST(floor(value * 10000) AS BIGINT) AS q FROM events),
          |med AS (SELECT event_type, quantile_cont(q, 0.5) AS med
          |  FROM ev GROUP BY 1),
          |mad AS (SELECT event_type, med,
          |    quantile_cont(abs(q - med), 0.5) AS mad
          |  FROM ev JOIN med USING (event_type) GROUP BY 1, 2),
          |z AS (SELECT event_id, event_type, value,
          |    round(0.6745 * (q - med) / mad, 4) AS z
          |  FROM ev JOIN mad USING (event_type) WHERE mad <> 0)
          |SELECT event_type,
          |  CAST(row_number() OVER (PARTITION BY event_type
          |    ORDER BY abs(z) DESC, event_id) AS INT) AS rk,
          |  event_id, value, z
          |FROM z QUALIFY rk <= 5""".stripMargin,

      "q_entropy" ->
        """WITH cats AS (
          |  SELECT 'documents.lang' AS col_name, lang AS val FROM documents
          |  UNION ALL SELECT 'documents.source', source FROM documents
          |  UNION ALL SELECT 'events.event_type', event_type FROM events),
          |counts AS (SELECT col_name, val, count(*) AS n FROM cats GROUP BY 1, 2),
          |totals AS (SELECT col_name, CAST(sum(n) AS BIGINT) AS t
          |  FROM counts GROUP BY 1),
          |wt AS (SELECT col_name, n, t,
          |    CAST(floor(-((CAST(n AS DOUBLE)/t) * log2(CAST(n AS DOUBLE)/t))
          |      * 1000000000000) AS BIGINT) AS eterm
          |  FROM counts JOIN totals USING (col_name)),
          |agg AS (SELECT col_name,
          |    CAST(max(t) AS BIGINT) AS n_rows, count(*) AS n_distinct,
          |    round(CAST(sum(eterm) AS DOUBLE) / 1000000000000, 6) AS entropy,
          |    round(CAST(max(n) AS DOUBLE) / max(t), 6) AS top_share
          |  FROM wt GROUP BY 1)
          |SELECT col_name, n_rows, n_distinct, entropy, top_share,
          |  CASE WHEN n_distinct > 1 THEN round(entropy / log2(n_distinct), 6) END
          |    AS norm_entropy
          |FROM agg""".stripMargin,

      "q_forecast" -> {
        def dyadicSql(src: String): String = {
          val num = (0 to 7).map { j =>
            val x = if (j == 0) src else s"lag($src, $j) OVER wnd"
            s"coalesce($x * ${1L << (7 - j)}, 0)"
          }.mkString(" + ")
          val den = (0 to 7).map { j =>
            val x = if (j == 0) src else s"lag($src, $j) OVER wnd"
            s"CASE WHEN $x IS NOT NULL THEN ${1L << (7 - j)} ELSE 0 END"
          }.mkString(" + ")
          s"CAST(($num) // ($den) AS BIGINT)"
        }
        s"""WITH daily AS (SELECT event_type,
           |    epoch_us(ts) // 86400000000
           |      + (CASE WHEN epoch_us(ts) % 86400000000 < 0
           |         THEN -1 ELSE 0 END) AS day,
           |    sum(CAST(floor(value * 10000) AS BIGINT)) AS dq
           |  FROM events GROUP BY 1, 2),
           |p1 AS (SELECT event_type, day, ${dyadicSql("dq")} AS s1q
           |  FROM daily
           |  WINDOW wnd AS (PARTITION BY event_type ORDER BY day)),
           |p2 AS (SELECT event_type, day, s1q, ${dyadicSql("s1q")} AS s2q,
           |    count(*) OVER (PARTITION BY event_type) AS n_days,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY day DESC) AS rn
           |  FROM p1
           |  WINDOW wnd AS (PARTITION BY event_type ORDER BY day))
           |SELECT event_type, day, CAST(n_days AS BIGINT) AS n_days,
           |  round(CAST(2 * s1q - s2q AS DOUBLE) / 10000.0, 4) AS level,
           |  round(CAST(s1q - s2q AS DOUBLE) / 10000.0, 4) AS trend,
           |  round(CAST(3 * s1q - 2 * s2q AS DOUBLE) / 10000.0, 4) AS fc_1,
           |  round(CAST(9 * s1q - 8 * s2q AS DOUBLE) / 10000.0, 4) AS fc_7
           |FROM p2 WHERE rn = 1""".stripMargin
      },

      "q_attribution" ->
        """WITH ev AS (SELECT event_id, user_id, event_type,
          |    epoch_us(ts) AS tus FROM events),
          |conv AS MATERIALIZED (SELECT user_id, min(tus) AS cts
          |  FROM ev WHERE event_type = 'purchase' GROUP BY 1),
          |touches AS (SELECT e.* FROM ev e JOIN conv c USING (user_id)
          |  WHERE e.event_type != 'purchase' AND e.tus < c.cts
          |    AND e.tus >= c.cts - 604800000000),
          |cr AS (SELECT event_type,
          |    CASE WHEN rk = 1 THEN 1000000 ELSE 0 END AS ft,
          |    CASE WHEN rk = cnt THEN 1000000 ELSE 0 END AS lt,
          |    1000000 // cnt AS lin,
          |    CASE WHEN cnt = 1 THEN 1000000
          |      WHEN rk = 1 OR rk = cnt THEN
          |        (CASE WHEN cnt = 2 THEN 500000 ELSE 400000 END)
          |      ELSE 200000 // (cnt - 2) END AS ush
          |  FROM (SELECT event_type,
          |      row_number() OVER (PARTITION BY user_id
          |        ORDER BY tus, event_id) AS rk,
          |      count(*) OVER (PARTITION BY user_id) AS cnt
          |    FROM touches))
          |SELECT event_type AS channel, count(*) AS n_touches,
          |  round(sum(ft) / 1000000.0, 3) AS first_touch,
          |  round(sum(lt) / 1000000.0, 3) AS last_touch,
          |  round(sum(lin) / 1000000.0, 3) AS linear,
          |  round(sum(ush) / 1000000.0, 3) AS u_shaped
          |FROM cr GROUP BY 1""".stripMargin,

      "q_compaction" ->
        """WITH files AS (SELECT l_returnflag AS part, CAST(l_shipdate AS DATE) AS day,
          |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS bytes
          |  FROM lineitem GROUP BY 1, 2),
          |c AS (SELECT part, day, bytes,
          |    CAST(coalesce(sum(bytes) OVER (PARTITION BY part ORDER BY day
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
          |  FROM files)
          |SELECT part, CAST(cum // 1000000000 AS BIGINT) AS bin,
          |  count(*) AS n_files, CAST(sum(bytes) AS BIGINT) AS bytes,
          |  strftime(min(day), '%Y-%m-%d') AS from_day,
          |  strftime(max(day), '%Y-%m-%d') AS to_day
          |FROM c GROUP BY 1, 2""".stripMargin
    )
  }
}
