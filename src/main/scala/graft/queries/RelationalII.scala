package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Second relational pack: wider query-language surface —
  * lead/lag/rank/cume_dist windows, set operations, correlated scalar
  * subqueries (through `spark.sql`), pivot. */
object RelationalII extends QueryPack {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Peak concurrent sessions per day — the sweep-line / interval
    // overlap operator (the capacity-planning readout q_sessionize's
    // per-session rows cannot give): sessionize with the 30-min-gap
    // rule (q_sessionize's exact lag/cumsum discipline), explode each
    // session into the days it touches CLIPPED to day bounds (so the
    // sweep needs no cross-day carry state), then per day +1/−1
    // deltas at clipped start / end+1µs and the max running sum is
    // the peak. At one instant ends apply before starts (ORDER BY
    // (t, delta): a session ending at t−1µs never overlaps one
    // starting at t); within equal (t, delta) groups the prefix-sum
    // MULTISET is permutation-invariant, so max is deterministic.
    // All integer µs arithmetic, floor-corrected day bucketing (the
    // ewma/dailyCounts idiom). Scale: the sweep windows partition by
    // DAY (never global); fan-out per session = days touched (≈1 for
    // 30-min-gap sessions); n_sessions = deltas div 2, exact.
    "q_concurrency" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val D = 86400000000L
      val sess = events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess", when(col("prev_ts").isNull
          .or(unix_micros(col("ts")) - unix_micros(col("prev_ts"))
            > 1800000000L), 1L).otherwise(0L))
        .withColumn("sess_id", sum("new_sess").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sess_id")
        .agg(min(unix_micros(col("ts"))).as("s_us"),
          max(unix_micros(col("ts"))).as("e_us"))
      val days = sess.select(col("s_us"), col("e_us"),
          explode(expr(s"sequence(s_us div $D + (case when s_us % $D < 0" +
            s" then -1 else 0 end), e_us div $D + (case when e_us % $D <" +
            s" 0 then -1 else 0 end))")).as("day"))
        .select(col("day"),
          greatest(col("s_us"), col("day") * D).as("cs"),
          least(col("e_us"), (col("day") + 1) * D - 1).as("ce"))
      val deltas = days
        .select(col("day"), col("cs").as("t"), lit(1L).as("delta"))
        .unionByName(days.select(col("day"), (col("ce") + 1).as("t"),
          lit(-1L).as("delta")))
      val wd = Window.partitionBy("day").orderBy(col("t"), col("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas.withColumn("cur", sum("delta").over(wd))
        .groupBy("day")
        .agg(expr("count(1) div 2").as("n_sessions"),
          max("cur").as("peak"))
    }),

    // Window-function breadth on an event stream ordering.
    "q_window_funcs" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("prev_value", round(lag("value", 1).over(w), 2))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .withColumn("rk", rank().over(w))
        .withColumn("cd", round(cume_dist().over(w), 6))
        .withColumn("pr", round(percent_rank().over(w), 6))
        .withColumn("quartile", ntile(4).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("prev_value"),
          col("next_type"), col("rk"), col("cd"), col("pr"), col("quartile"))
    }),

    // INTERSECT / EXCEPT on key sets.
    "q_setops" -> ((s, d) => {
      val buyers = orders(s, d).select(col("o_custkey").as("k"))
      val machinery = customer(s, d)
        .filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey").as("k"))
      val both = buyers.intersect(machinery).withColumn("src", lit("both"))
      val onlySeg = machinery.except(buyers).withColumn("src", lit("no_orders"))
      both.unionByName(onlySeg).groupBy("src").agg(count(lit(1)).as("n"))
    }),

    // Correlated scalar subquery through the SQL surface.
    "q_sql_corr" -> ((s, d) => {
      customer(s, d).createOrReplaceTempView("customer_v")
      orders(s, d).createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c_custkey,
          |  (SELECT round(max(o_totalprice), 2) FROM orders_v
          |   WHERE o_custkey = c_custkey) AS max_order
          |FROM customer_v
          |WHERE c_acctbal > 0""".stripMargin)
    }),

    // Pivot: event counts per user bucket × event type.
    "q_pivot" -> ((s, d) => {
      events(s, d)
        .withColumn("ub", (col("user_id") % 10).as("ub"))
        .groupBy("ub")
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
    }),

    // Aggregation into collections: sorted distinct array + ordered
    // string concatenation per group (sort makes both deterministic
    // across partitionings — unsorted collect_* is not). The dumped
    // result carries the collection as csv + cardinality, not the raw
    // array — the gate's compare harness can't sort array columns.
    "q_array_agg" -> ((s, d) => {
      events(s, d)
        .withColumn("ub", (col("user_id") % 10).cast("long"))
        .groupBy("event_type")
        .agg(sort_array(collect_set(col("ub"))).as("buckets"),
          count(lit(1)).as("n"))
        .select(col("event_type"),
          concat_ws(",", col("buckets")).as("bucket_csv"),
          size(col("buckets")).cast("long").as("n_buckets"),
          col("n"))
    }),

    // Typed per-group imperative logic (KeyValueGroupedDataset
    // .flatMapGroups): max inter-event gap per user. The group
    // iterator is sorted in-task by (ts, event_id) — deterministic —
    // and the oracle reproduces it with lag() windows. This is the
    // batch face of the API the streaming sessionizer uses; state is
    // one group in memory at a time.
    "q_typed_groups" -> ((s, d) => {
      import s.implicits._
      val ev = events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("event_id"))
        .as[(Long, Long, Long)]
      ev.groupByKey(_._1)
        .flatMapGroups { (uid: Long, it: Iterator[(Long, Long, Long)]) =>
          val ts = it.toArray.sortBy(r => (r._2, r._3)).map(_._2)
          if (ts.length < 2) Iterator.empty
          else {
            var maxGap = 0L
            var i = 1
            while (i < ts.length) { maxGap = math.max(maxGap, ts(i) - ts(i - 1)); i += 1 }
            Iterator((uid, ts.length.toLong, maxGap))
          }
        }.toDF("user_id", "n_events", "max_gap_us")
    }),

    // Unpivot (wide→long): the inverse of q_pivot's reshaping.
    "q_unpivot" -> ((s, d) => {
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"))
        .unpivot(Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "val")
        .groupBy("measure")
        .agg(count(lit(1)).as("n"), round(sum("val"), 2).as("total"))
    }),

    // CUBE: every subtotal combination, with grouping_id level marker.
    "q_cube" -> ((s, d) =>
      orders(s, d).cube("o_orderstatus", "o_orderpriority")
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("total"))),

    // Explicit GROUPING SETS through the SQL surface (distinct subtotal
    // shapes that neither rollup nor cube expresses).
    "q_grouping_sets" -> ((s, d) => {
      lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
          |  round(sum(l_quantity), 2) AS sum_qty
          |FROM lineitem_v
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
    }),

    // Range join: each purchase joined to the same user's views in the
    // preceding hour. Equi key (user_id) + band predicate — stays a
    // co-partitioned hash join, never a cross product; time compared in
    // epoch micros (the engines' shared truncation of the ns source).
    "q_range_join" -> ((s, d) => {
      val ev = events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id").as("puid"),
          unix_micros(col("ts")).as("pt"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("vuid"), unix_micros(col("ts")).as("vt"),
          col("value").as("vval"))
      p.join(v, col("puid") === col("vuid")
          && col("vt") >= col("pt") - 3600000000L && col("vt") < col("pt"), "left")
        .groupBy("pid")
        .agg(count(col("vt")).as("n_views"), round(sum("vval"), 2).as("view_value"))
    }),

    // Row-frame windows: trailing moving average + running sum.
    "q_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("mavg", round(avg("value").over(w.rowsBetween(-3, 0)), 4))
        .withColumn("rsum", round(sum("value").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "mavg", "rsum")
    }),

    // Calendar breadth: extract-style grouping (UTC on both engines).
    "q_datetime" -> ((s, d) =>
      events(s, d).groupBy(
        year(col("ts")).as("y"), month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("dom"), dayofweek(col("ts")).as("dow"),
        hour(col("ts")).as("h"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sv"))),

    // Skew-salted shuffle join surfaced as a query: the events fact has
    // few, hot user keys; the fact side salts 8 ways off event_id and
    // the (not-broadcastable-by-assumption) dim side replicates per
    // salt, so no reducer owns a hot key alone. Result is identical to
    // the plain join — which is exactly what the oracle checks.
    "q_skew_join" -> ((s, d) => {
      val fact = events(s, d).select(col("user_id"), col("event_id"), col("value"))
      val dim = customer(s, d)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("seg"))
      graft.operators.SkewJoin.saltedJoin(fact, dim, "user_id", "event_id", salts = 8)
        .groupBy("seg")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    }),

    // Typed cogroup (KeyValueGroupedDataset.cogroup): both sides of a
    // key meet in one task with arbitrary per-group logic — the API for
    // custom join semantics no SQL join expresses. Aggregates here are
    // order-free (counts/max) because cogroup iterator order is not
    // deterministic across shuffles.
    "q_cogroup" -> ((s, d) => {
      import s.implicits._
      val ev = events(s, d).select(col("user_id"), col("value"))
        .as[(Long, Double)].groupByKey(_._1)
      val ord = orders(s, d).select(col("o_custkey"), col("o_totalprice"))
        .as[(Long, Double)].groupByKey(_._1)
      ev.cogroup(ord) { (uid, evs, ords) =>
        var nEv = 0L; var maxEv = Double.MinValue
        evs.foreach { e => nEv += 1; if (e._2 > maxEv) maxEv = e._2 }
        var nOrd = 0L; var maxOrd = Double.MinValue
        ords.foreach { o => nOrd += 1; if (o._2 > maxOrd) maxOrd = o._2 }
        Iterator((uid, nEv, if (nEv == 0) 0.0 else maxEv,
          nOrd, if (nOrd == 0) 0.0 else maxOrd))
      }.toDF("user_id", "n_events", "max_event_value", "n_orders", "max_order_price")
    }),

    // Full outer join: activity per known customer UNION customers with
    // no events UNION event users with no customer row — the join type
    // the rest of the pack doesn't cover (inner/semi/anti/asof/range).
    "q_outer_join" -> ((s, d) => {
      val ev = events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_ev"), round(sum("value"), 2).as("ev_value"))
      val cust = customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))
      cust.join(ev, col("c_custkey") === col("user_id"), "full_outer")
        .select(coalesce(col("c_custkey"), col("user_id")).as("k"),
          col("seg"), coalesce(col("n_ev"), lit(0L)).as("n_ev"),
          coalesce(col("ev_value"), lit(0.0)).as("ev_value"))
    }),

    // Skew-salted DISTINCT aggregation: per-type distinct users with
    // the distinct-state bucketed 16 ways by hash(user) — a hot
    // event_type's user set never lands on one reducer. Result is
    // provably the plain aggregate (value→bucket is a function), which
    // is exactly what the oracle checks.
    "q_skew_distinct" -> ((s, d) =>
      graft.operators.SkewAgg.saltedDistinct(
        events(s, d), Seq("event_type"), "user_id", salts = 16)),

    // Sliding (overlapping) time windows: 1-hour span, 30-minute slide —
    // every event lands in exactly two windows.
    "q_sliding_window" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("ws"), col("event_type"),
          col("n"), col("sum_value"))),

    // Time-based RANGE window frame — the "activity in the trailing
    // hour" shape ROWS frames can't express (peers at equal timestamps
    // all join the frame; the frame is defined by VALUE bounds, so the
    // result is deterministic under ties without a tiebreaker column).
    "q_range_window" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("tus"))
        .rangeBetween(-3600000000L, 0) // trailing hour in epoch µs
      events(s, d)
        .withColumn("tus", expr("unix_micros(ts)"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", round(sum("value").over(w), 2))
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "n_1h", "sum_1h")
    }),

    // Ordered conversion funnel (view → click after it → purchase after
    // that): each stage is first-event-per-user AFTER the prior stage's
    // first event — the strictly-ordered funnel, not mere event
    // co-occurrence. Scale shape: per-stage min-ts hash aggs joined on
    // user_id (co-partitioned equi-joins); each stage's input shrinks,
    // and no window sorts the raw event stream.
    "q_funnel" -> ((s, d) => {
      val ev = events(s, d)
      val firstView = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("v_ts"))
      val firstClick = ev.filter(col("event_type") === "click")
        .join(firstView, "user_id")
        .filter(col("ts") > col("v_ts"))
        .groupBy("user_id").agg(min("ts").as("c_ts"))
      val firstPurchase = ev.filter(col("event_type") === "purchase")
        .join(firstClick, "user_id")
        .filter(col("ts") > col("c_ts"))
        .groupBy("user_id").agg(min("ts").as("p_ts"))
      Seq("1_view" -> firstView, "2_click" -> firstClick,
        "3_purchase" -> firstPurchase)
        .map { case (n, df) =>
          df.agg(count(lit(1)).as("n_users")).select(lit(n).as("stage"),
            col("n_users"))
        }.reduce(_ unionByName _)
    }),

    // Cohort retention: cohort = a user's first active epoch-week
    // (integer µs div — no calendar/timezone conventions to disagree
    // on), cells = distinct users active at each week offset. Two hash
    // aggs + one equi-join on user_id; output is cohorts × offsets,
    // bounded by the time range, not the user count.
    "q_retention" -> ((s, d) => {
      val ev = events(s, d)
      val wk = expr("unix_micros(ts) div 604800000000")
      val cohort = ev.groupBy("user_id").agg(min(wk).as("cohort"))
      val active = ev.select(col("user_id"), wk.as("wk")).distinct()
      active.join(cohort, "user_id")
        .groupBy(col("cohort"), (col("wk") - col("cohort")).as("week_offset"))
        .agg(countDistinct("user_id").as("n_users"))
    }),

    // Z-order layout audit (round 8) — the data-layout operator behind
    // multi-dimensional file skipping: (l_partkey, l_suppkey) normalized
    // onto a 16-bit grid, bit-interleaved into a 32-bit Morton key
    // (operators/Layout.zorder16 — pure shift/mask column math), and
    // bucketed by the key's top 4 bits (16 spatial quadrants = the
    // file boundaries a z-sorted write would produce). Output = each
    // bucket's min/max envelope on BOTH dims — exactly the footer
    // stats a scan prunes on; LayoutSpec contrasts the envelopes with
    // a linear sort's. At scale the write is repartitionByRange(z) +
    // sortWithinPartitions(z); the only join here is the whitelisted
    // 1-row max-bounds broadcast.
    "q_zorder" -> ((s, d) => {
      import graft.operators.Layout
      val li = lineitem(s, d).select(col("l_orderkey"), col("l_partkey"),
        col("l_suppkey"))
      val bounds = li.agg(max("l_partkey").as("px"), max("l_suppkey").as("sx"))
      li.crossJoin(broadcast(bounds))
        .withColumn("xn", Layout.grid16("l_partkey", "px"))
        .withColumn("yn", Layout.grid16("l_suppkey", "sx"))
        .withColumn("z", Layout.zorder16(col("xn"), col("yn")))
        .groupBy(expr("z div 268435456").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min("l_partkey").as("pk_min"), max("l_partkey").as("pk_max"),
          min("l_suppkey").as("sk_min"), max("l_suppkey").as("sk_max"))
    }),

    // Markov transition matrix (round 8) — the next-event model behind
    // path analysis and sequence QA: per user, (event, next event)
    // pairs from one lead() pass, then counts and the row-normalized
    // conditional probability p(to | from). One user_id exchange
    // serves the window; the matrix is k² rows, so the normalizing
    // window runs over a driver-trivial frame at any data scale.
    "q_transitions" -> ((s, d) => {
      val byUt = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pairs = events(s, d)
        .withColumn("to_type", lead(col("event_type"), 1).over(byUt))
        .filter(col("to_type").isNotNull)
        .select(col("event_type").as("from_type"), col("to_type"))
      val byFrom = Window.partitionBy("from_type")
      pairs.groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("p", round(col("n") / sum("n").over(byFrom), 4))
    }),

    // Longest activity streak (round 8) — gaps-and-islands, the one
    // classic relational pattern the surface lacked: consecutive
    // active days collapse to islands via the day − row_number trick
    // (consecutive days share a constant difference), then two hash
    // aggs roll islands up to per-user streak stats. Everything after
    // the distinct runs inside one user_id exchange; output is one
    // row per user.
    "q_streak" -> ((s, d) => {
      val byU = Window.partitionBy("user_id").orderBy("day")
      events(s, d)
        .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
        .withColumn("grp", col("day") - row_number().over(byU))
        .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
        .groupBy("user_id").agg(
          sum("len").as("n_active_days"),
          count(lit(1)).as("n_streaks"),
          max("len").as("longest_streak"))
    }),

    // Top user journeys (round 8) — the path-frequency readout next to
    // q_transitions' next-event model: each user's first 5 events in
    // time order become a '>'-joined path string, counted across
    // users. Determinism: collect_list order is shuffle-dependent, so
    // the path is rebuilt from array_sort over (rank, type) structs —
    // the engine-stable idiom every array aggregation here uses. One
    // user_id exchange serves the ranking window and the per-user agg.
    "q_paths" -> ((s, d) => {
      val byUt = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("rn", row_number().over(byUt))
        .filter(col("rn") <= 5)
        .groupBy("user_id")
        .agg(array_sort(collect_list(struct(col("rn"), col("event_type"))))
          .as("a"))
        .select(concat_ws(">", expr("transform(a, s -> s.event_type)"))
          .as("journey"))
        .groupBy("journey").agg(count(lit(1)).as("n_users"))
    }),

    // SCD type-2 history build (round 8) — the warehouse
    // dimension-maintenance shape: each run of consecutive equal
    // event_type per user becomes one version row with
    // [valid_from, valid_to) bounds; the open version is is_current.
    // One shuffle on user_id serves the change-detect window, the
    // run rollup, and the validity chaining — the classic
    // lag→cumsum→group→lead pipeline, all inside one exchange.
    "q_scd2" -> ((s, d) => scd2(s, d)),

    // Point-in-time dimension lookup (round 8) — the consumer of
    // q_scd2's versioned dimension: every event joins to the version
    // row VALID AT its own timestamp ([valid_from, valid_to) with an
    // open current version). The join keys on user_id (co-partitioned
    // hash join — the validity bounds are residual predicates, never a
    // cross product) and every event matches exactly one version, so
    // output = events, verified by the n_versions distinct rollup.
    "q_temporal_join" -> ((s, d) => {
      val dim = scd2(s, d)
        .select(col("user_id"), col("ver"), col("event_type").as("state_type"),
          col("valid_from_us"), col("valid_to_us"))
      val ev = events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts")).as("ts_us"))
      ev.join(dim, Seq("user_id"))
        .filter(col("ts_us") >= col("valid_from_us") &&
          (col("valid_to_us").isNull || col("ts_us") < col("valid_to_us")))
        .groupBy(col("user_id"), col("state_type"))
        .agg(count(lit(1)).as("n_events"), countDistinct("ver").as("n_versions"))
    }),

    // MERGE INTO semantics as one declarative plan (round 8) — the
    // upsert a snapshot-maintenance job runs: target = per-user latest
    // state before the split instant, source = the same after it; a
    // full outer join on the key emits insert/update/keep actions.
    // This is the exact plan a table-format MERGE compiles to (minus
    // the file rewrite, which belongs to the sink): one shuffle per
    // side + the key join, no driver state. The split instant is
    // integer-µs arithmetic so both engines cut identically.
    "q_upsert" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
      val bounds = ev.agg(expr("(min(ts_us) + max(ts_us)) div 2").as("sp"))
      val tagged = ev.crossJoin(broadcast(bounds))
      def latest(df: DataFrame) = {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us").desc, col("event_id").desc)
        df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      }
      val t = latest(tagged.filter(col("ts_us") < col("sp")))
        .select(col("user_id"), col("event_type").as("t_type"),
          round(col("value"), 2).as("t_value"), col("ts_us").as("t_ts"))
      val src = latest(tagged.filter(col("ts_us") >= col("sp")))
        .select(col("user_id"), col("event_type").as("s_type"),
          round(col("value"), 2).as("s_value"), col("ts_us").as("s_ts"))
      t.join(src, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          when(col("t_ts").isNull, "insert")
            .when(col("s_ts").isNull, "keep")
            .otherwise("update").as("action"),
          coalesce(col("s_type"), col("t_type")).as("event_type"),
          coalesce(col("s_value"), col("t_value")).as("value"),
          coalesce(col("s_ts"), col("t_ts")).as("state_ts_us"))
    }),

    // Row-level CHANGE DATA FEED through a REAL transaction log
    // (round 19) — the first hash-gated key that drives the TxLog
    // protocol end to end in-query: build a logged table from an
    // orders carve-out, MERGE a deterministic batch (updates +
    // inserts through the copy-on-write rewrite), then read
    // `tableChanges(v1, v2)` — the CDC face whose scan is the
    // symmetric difference of the live sets, never the table. The
    // emitted rows are a pure function of the data (temp-dir paths
    // never surface); the result is eagerly checkpointed so the
    // scratch table can be deleted before the frame is consumed.
    // Money in integer cents (the §4 discipline); the 10% bump
    // always CHANGES the value (cents ≥ 10 ⇒ bumped > old), so
    // every matched key yields exactly delete + insert.
    "q_cdc" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("qcdc")
      try {
        val t = new graft.sources.TxLogTable(dir.toString)
        val o = orders(s, d).select(col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        val init = o.filter(pmod(col("k"), lit(17)) === 0)
        t.commit(t.writeDataFiles(init), Nil, Some(1L))
        val batch = o.filter(pmod(col("k"), lit(51)) === 0
            || (pmod(col("k"), lit(17)) === 1
              && pmod(col("k"), lit(5)) === 0))
          .withColumn("cents", expr("(cents * 110) div 100"))
        t.merge(s, batch, "k", txn = Some(2L))
        t.tableChanges(s, 1L, 2L).get
          .withColumnRenamed("_change_type", "change_type")
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(dir.toFile)
    }),

    // Time travel + RESTORE through a REAL transaction log (round
    // 19, q_cdc's sibling): version-addressed snapshot, TIMESTAMP AS
    // OF resolution, and rollback-by-commit, all hash-gated against
    // a relational replay. Four faces of one two-commit history:
    // `v1` (the initial carve-out), `v2` (after a deterministic
    // merge update), `asof_v1` (snapshotAt at v1's recorded commit
    // timestamp — v2's stamp is strictly greater by the monotone
    // rule, so the instant resolves to v1), and `restored` (the
    // snapshot after restore(1) — byte-identical rows to v1, proving
    // the rollback re-reads the original files). 57 = 3·19 ⇒ the
    // batch updates a subset of init keys and inserts nothing, so
    // every face is a pure function of orders.
    "q_time_travel" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("qtt")
      try {
        val t = new graft.sources.TxLogTable(dir.toString)
        val o = orders(s, d).select(col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        val init = o.filter(pmod(col("k"), lit(19)) === 0)
        t.commit(t.writeDataFiles(init), Nil, Some(1L))
        val batch = o.filter(pmod(col("k"), lit(57)) === 0)
          .withColumn("cents", expr("(cents * 110) div 100"))
        t.merge(s, batch, "k", txn = Some(2L))
        val ts1 = t.commitTimestamp(1L).get
        val v1 = t.snapshot(s, 1L).get.withColumn("face", lit("v1"))
        val v2 = t.snapshot(s, 2L).get.withColumn("face", lit("v2"))
        val asof = t.snapshotAt(s, ts1).get
          .withColumn("face", lit("asof_v1"))
        require(t.restore(s, 1L).contains(3L), "restore must commit")
        val back = t.snapshot(s).get.withColumn("face", lit("restored"))
        v1.unionByName(v2).unionByName(asof).unionByName(back)
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(dir.toFile)
    }),

    // Snapshot reconciliation diff (round 10) — the backfill/CDC
    // verification pass: given two versions of a table, report what
    // was added, removed, and changed, with the money delta per
    // class. The snapshots derive deterministically from one scan
    // (modulus carve-outs + a price bump), the diff is ONE full-outer
    // join on the key with scan-side comparison — at 100 TB both
    // sides bucket on the key and the join co-locates; nothing is
    // ever collected. The delta sums integer CENTS (the §4 quantized
    // discipline: a float money sum at this magnitude carries
    // association error near the 0.01 rounding grain).
    "q_snapshot_diff" -> ((s, d) => {
      // all money in integer CENTS end to end: the 10% bump is an
      // integer floor division, never a float round (Spark's
      // BigDecimal-string HALF_UP and DuckDB's double rounding
      // disagree by a cent at .xx5 boundaries — caught by the gate)
      val o = orders(s, d).select(col("o_orderkey"),
        floor(col("o_totalprice") * 100).cast("long").as("q"))
      val old = o.filter(pmod(col("o_orderkey"), lit(89)) =!= 0)
        .select(col("o_orderkey"), col("q").as("q_old"))
      val nw = o.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
        .select(col("o_orderkey"),
          when(pmod(col("o_orderkey"), lit(7)) === 0,
            expr("(q * 110) div 100")).otherwise(col("q")).as("q_new"))
      old.join(nw, Seq("o_orderkey"), "full_outer")
        .select(
          when(col("q_old").isNull, "added")
            .when(col("q_new").isNull, "removed")
            .when(col("q_old") =!= col("q_new"), "changed")
            .otherwise("unchanged").as("change_type"),
          (coalesce(col("q_new"), lit(0L)) - coalesce(col("q_old"), lit(0L)))
            .as("dq"))
        .groupBy("change_type")
        .agg(count(lit(1)).as("n"),
          round(sum("dq").cast("double") / 100, 2).as("delta"))
    }),

    // Single-scan column profiling (round 8) — the data-profiling pass
    // every pipeline runs before training (the Deequ/TFDV shape): one
    // aggregate computes every column's stats as an array of structs,
    // exploded to one row per column. ONE scan however many columns
    // are profiled — the naive per-column union would scan the table
    // per column; at 100 TB that difference is the whole job.
    "q_profile" -> ((s, d) => {
      def stats(c: String) = struct(
        lit(c).as("col_name"),
        count(col(c)).as("n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        round(avg(col(c)), 4).as("mean"),
        round(min(col(c)), 4).as("min_v"),
        round(max(col(c)), 4).as("max_v"),
        round(stddev_pop(col(c)), 4).as("stddev"))
      lineitem(s, d)
        .agg(array(stats("l_quantity"), stats("l_extendedprice"),
          stats("l_discount"), stats("l_tax")).as("a"))
        .select(explode(col("a")).as("s"))
        .select("s.*")
    }),

    // Data-quality constraint suite (round 8) — the gate a pipeline
    // evaluates before publishing a snapshot (Deequ's check shape):
    // key uniqueness, null fractions, referential integrity, value
    // ranges — each one scan or one anti-join, reported as
    // (check, metric, passed) so the caller alerts on any false row.
    // Declarative end to end: no eager counts, the checks share the
    // session's scans and the anti-join is bloom-prunable at scale.
    "q_quality_checks" -> ((s, d) => {
      val ord = orders(s, d)
      val chk = (name: String, metric: org.apache.spark.sql.Column) =>
        (df: DataFrame) => df.agg(round(metric, 6).as("metric"))
          .select(lit(name).as("check_name"), col("metric"),
            (col("metric") === 0.0).as("passed"))
      val pkDups = chk("orders_pk_unique",
        (count(lit(1)) - countDistinct(col("o_orderkey"))).cast("double"))(ord)
      val nullFrac = chk("lineitem_qty_null_frac",
        (sum(when(col("l_quantity").isNull, 1L).otherwise(0L)) /
          count(lit(1))).cast("double"))(lineitem(s, d))
      val fkOrphans = chk("orders_fk_customer",
        count(lit(1)).cast("double"))(
        ord.join(customer(s, d), col("o_custkey") === col("c_custkey"), "left_anti"))
      val range = chk("lineitem_discount_range",
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
          .otherwise(0L)).cast("double"))(lineitem(s, d))
      pkDups.unionByName(nullFrac).unionByName(fkOrphans).unionByName(range)
    }),

    // Incremental aggregate maintenance (round 8) — the daily-rollup
    // merge every warehouse pipeline runs: a persisted per-key summary
    // is updated with a new batch by MERGING algebraic states (n, sum,
    // min, max — avg derives at read), never rescanning history. Here
    // both states build from one table split on a time cutoff, and the
    // merged output must equal the direct full aggregate — which is
    // exactly what the oracle computes through the same merge tree.
    // Merge cost scales with |keys|, not |history|; at 100 TB the
    // summary is the small side and the batch is one day, so the
    // update never touches cold data. Distinct counts can't merge this
    // way — that's what the HLL sketch path (q_approx_distinct) is for.
    "q_incremental_agg" -> ((s, d) => {
      val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
      def state(df: DataFrame) = df.groupBy("event_type").agg(
        count(lit(1)).as("n"), sum("value").as("sv"),
        min("value").as("mn"), max("value").as("mx"))
      val summary = state(events(s, d).filter(col("ts") < cutoff))
      val batch = state(events(s, d).filter(col("ts") >= cutoff))
      summary.unionByName(batch).groupBy("event_type").agg(
        sum("n").as("n"), round(sum("sv"), 2).as("sum_value"),
        round(min("mn"), 2).as("min_value"), round(max("mx"), 2).as("max_value"),
        round(sum("sv") / sum("n"), 4).as("avg_value"))
    })
  )

  // the SCD type-2 dimension build, shared by q_scd2 (the gated audit
  // of the build itself) and q_temporal_join (its point-in-time
  // consumer): lag→cumsum→group→lead, all inside one user_id exchange
  private def scd2(s: SparkSession, d: String): DataFrame = {
    val byUt = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val runs = events(s, d)
      .withColumn("prev", lag(col("event_type"), 1).over(byUt))
      .withColumn("chg",
        when(col("prev").isNull.or(col("prev") =!= col("event_type")), 1L)
          .otherwise(0L))
      .withColumn("ver", sum("chg").over(
        byUt.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val vers = runs.groupBy(col("user_id"), col("ver"), col("event_type"))
      .agg(min(unix_micros(col("ts"))).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    val byVer = Window.partitionBy("user_id").orderBy("ver")
    vers
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(byVer))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select("user_id", "ver", "event_type", "valid_from_us",
        "valid_to_us", "n_events", "is_current")
  }

  def oracles: Map[String, String] = Map(
    "q_concurrency" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, epoch_us(ts) AS t_us,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS sess_id
        |  FROM e),
        |b AS (SELECT user_id, sess_id, min(t_us) AS s_us,
        |    max(t_us) AS e_us FROM s GROUP BY 1, 2),
        |dd AS (SELECT s_us, e_us, unnest(generate_series(
        |    s_us // 86400000000 + (CASE WHEN s_us % 86400000000 < 0
        |      THEN -1 ELSE 0 END),
        |    e_us // 86400000000 + (CASE WHEN e_us % 86400000000 < 0
        |      THEN -1 ELSE 0 END))) AS day FROM b),
        |d AS (SELECT day,
        |    greatest(s_us, day * 86400000000) AS cs,
        |    least(e_us, (day + 1) * 86400000000 - 1) AS ce FROM dd),
        |del AS (SELECT day, cs AS t, 1 AS delta FROM d
        |  UNION ALL SELECT day, ce + 1, -1 FROM d),
        |run AS (SELECT day,
        |    sum(delta) OVER (PARTITION BY day ORDER BY t, delta
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur
        |  FROM del)
        |SELECT day, CAST(count(*) AS BIGINT) // 2 AS n_sessions,
        |  CAST(max(cur) AS BIGINT) AS peak
        |FROM run GROUP BY 1""".stripMargin,

    "q_zorder" -> {
      // the same 32 interleave terms as Layout.zorder16, unrolled in
      // DuckDB's bit-operator dialect
      val terms = (0 until 16).flatMap(i => Seq(
        s"((xn >> $i) & 1) * ${1L << (2 * i)}",
        s"((yn >> $i) & 1) * ${1L << (2 * i + 1)}")).mkString(" + ")
      s"""WITH b AS (SELECT max(l_partkey) AS px, max(l_suppkey) AS sx
         |    FROM lineitem),
         |t AS (SELECT l_partkey, l_suppkey,
         |    (CAST(l_partkey AS BIGINT) * 65536) // (CAST(px AS BIGINT) + 1) AS xn,
         |    (CAST(l_suppkey AS BIGINT) * 65536) // (CAST(sx AS BIGINT) + 1) AS yn
         |  FROM lineitem, b),
         |z AS (SELECT l_partkey, l_suppkey, $terms AS z FROM t)
         |SELECT z // 268435456 AS bucket, count(*) AS n,
         |  min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
         |  min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max
         |FROM z GROUP BY 1""".stripMargin
    },
    "q_streak" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |i AS (
        |  SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM d),
        |s AS (
        |  SELECT user_id, grp, count(*) AS len
        |  FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |  count(*) AS n_streaks, max(len) AS longest_streak
        |FROM s GROUP BY 1""".stripMargin,
    "q_paths" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS rn
        |  FROM events),
        |j AS (
        |  SELECT user_id,
        |    string_agg(event_type, '>' ORDER BY rn) AS journey
        |  FROM r WHERE rn <= 5 GROUP BY user_id)
        |SELECT journey, count(*) AS n_users FROM j GROUP BY 1""".stripMargin,
    "q_transitions" ->
      """WITH pr AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS to_type
        |  FROM events)
        |SELECT from_type, to_type, count(*) AS n,
        |  round(count(*) / sum(count(*)) OVER (PARTITION BY from_type), 4) AS p
        |FROM pr WHERE to_type IS NOT NULL GROUP BY 1, 2""".stripMargin,
    "q_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
        |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ver
        |  FROM e),
        |v AS (
        |  SELECT user_id, ver, event_type, min(ts_us) AS valid_from_us,
        |    count(*) AS n_events
        |  FROM r GROUP BY user_id, ver, event_type)
        |SELECT user_id, ver, event_type, valid_from_us,
        |  lead(valid_from_us) OVER wv AS valid_to_us, n_events,
        |  lead(valid_from_us) OVER wv IS NULL AS is_current
        |FROM v WINDOW wv AS (PARTITION BY user_id ORDER BY ver)""".stripMargin,
    "q_temporal_join" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
        |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ver
        |  FROM e),
        |v AS (
        |  SELECT user_id, ver, event_type, min(ts_us) AS valid_from_us
        |  FROM r GROUP BY user_id, ver, event_type),
        |dim AS (
        |  SELECT user_id, ver, event_type AS state_type, valid_from_us,
        |    lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY ver)
        |      AS valid_to_us
        |  FROM v),
        |ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events)
        |SELECT ev.user_id, dim.state_type, count(*) AS n_events,
        |  count(DISTINCT dim.ver) AS n_versions
        |FROM ev JOIN dim ON ev.user_id = dim.user_id
        |  AND ev.ts_us >= dim.valid_from_us
        |  AND (dim.valid_to_us IS NULL OR ev.ts_us < dim.valid_to_us)
        |GROUP BY 1, 2""".stripMargin,
    "q_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS q FROM orders),
        |old AS (SELECT o_orderkey, q AS q_old FROM o WHERE o_orderkey % 89 <> 0),
        |nw AS (SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN CAST((q * 110) // 100 AS BIGINT)
        |         ELSE q END AS q_new
        |  FROM o WHERE o_orderkey % 97 <> 0),
        |j AS (SELECT q_old, q_new,
        |    coalesce(q_new, 0) - coalesce(q_old, 0) AS dq
        |  FROM old FULL OUTER JOIN nw USING (o_orderkey))
        |SELECT CASE WHEN q_old IS NULL THEN 'added'
        |    WHEN q_new IS NULL THEN 'removed'
        |    WHEN q_old <> q_new THEN 'changed'
        |    ELSE 'unchanged' END AS change_type,
        |  count(*) AS n, round(CAST(sum(dq) AS DOUBLE) / 100, 2) AS delta
        |FROM j GROUP BY 1""".stripMargin,
    // replay all four faces relationally: v1/asof_v1/restored are
    // the init carve-out verbatim, v2 is init with the 10% bump
    // applied to the k%57 subset (57 = 3·19 ⇒ updates only)
    "q_time_travel" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |init AS (SELECT * FROM o WHERE k % 19 = 0),
        |v2 AS (SELECT k, CASE WHEN k % 57 = 0
        |    THEN (cents * 110) // 100 ELSE cents END AS cents
        |  FROM init)
        |SELECT k, cents, 'v1' AS face FROM init
        |UNION ALL SELECT k, cents, 'v2' AS face FROM v2
        |UNION ALL SELECT k, cents, 'asof_v1' AS face FROM init
        |UNION ALL SELECT k, cents, 'restored' AS face FROM init"""
        .stripMargin,
    // replay the merge's row-level diff directly: matched keys
    // (51 = 3·17 ⇒ batch-update keys are all in init) emit delete
    // (old) + insert (new), unmatched batch keys insert only
    "q_cdc" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |init AS (SELECT * FROM o WHERE k % 17 = 0),
        |batch AS (SELECT k, (cents * 110) // 100 AS cents FROM o
        |  WHERE k % 51 = 0 OR (k % 17 = 1 AND k % 5 = 0))
        |SELECT i.k, i.cents, 'delete' AS change_type
        |FROM init i JOIN batch b ON b.k = i.k
        |UNION ALL
        |SELECT k, cents, 'insert' AS change_type FROM batch"""
        .stripMargin,
    "q_upsert" ->
      """WITH ev AS (SELECT user_id, event_type, value, epoch_us(ts) AS ts_us,
        |    event_id FROM events),
        |b AS (SELECT (min(ts_us) + max(ts_us)) // 2 AS sp FROM ev),
        |t AS (SELECT user_id, event_type AS t_type, round(value, 2) AS t_value,
        |    ts_us AS t_ts FROM (
        |  SELECT e.*, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM ev e, b WHERE ts_us < sp) WHERE rn = 1),
        |s AS (SELECT user_id, event_type AS s_type, round(value, 2) AS s_value,
        |    ts_us AS s_ts FROM (
        |  SELECT e.*, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM ev e, b WHERE ts_us >= sp) WHERE rn = 1)
        |SELECT user_id,
        |  CASE WHEN t_ts IS NULL THEN 'insert'
        |       WHEN s_ts IS NULL THEN 'keep' ELSE 'update' END AS action,
        |  coalesce(s_type, t_type) AS event_type,
        |  coalesce(s_value, t_value) AS value,
        |  coalesce(s_ts, t_ts) AS state_ts_us
        |FROM t FULL OUTER JOIN s USING (user_id)""".stripMargin,
    "q_profile" ->
      """SELECT 'l_quantity' AS col_name, count(l_quantity) AS n,
        |  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  round(avg(l_quantity), 4) AS mean, round(min(l_quantity), 4) AS min_v,
        |  round(max(l_quantity), 4) AS max_v, round(stddev_pop(l_quantity), 4) AS stddev
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_extendedprice', count(l_extendedprice),
        |  CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  round(avg(l_extendedprice), 4), round(min(l_extendedprice), 4),
        |  round(max(l_extendedprice), 4), round(stddev_pop(l_extendedprice), 4)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_discount', count(l_discount),
        |  CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  round(avg(l_discount), 4), round(min(l_discount), 4),
        |  round(max(l_discount), 4), round(stddev_pop(l_discount), 4)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_tax', count(l_tax),
        |  CAST(sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  round(avg(l_tax), 4), round(min(l_tax), 4),
        |  round(max(l_tax), 4), round(stddev_pop(l_tax), 4)
        |FROM lineitem""".stripMargin,
    "q_quality_checks" ->
      """WITH m AS (
        |  SELECT 'orders_pk_unique' AS check_name,
        |    round(CAST(count(*) - count(DISTINCT o_orderkey) AS DOUBLE), 6) AS metric
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem_qty_null_frac',
        |    round(CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |      / count(*), 6)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders_fk_customer', round(CAST(count(*) AS DOUBLE), 6)
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_custkey IS NULL
        |  UNION ALL
        |  SELECT 'lineitem_discount_range',
        |    round(CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
        |      AS DOUBLE), 6)
        |  FROM lineitem)
        |SELECT check_name, metric, metric = 0.0 AS passed FROM m""".stripMargin,
    "q_incremental_agg" ->
      """WITH h AS (
        |  SELECT event_type, count(*) AS n, sum(value) AS sv,
        |    min(value) AS mn, max(value) AS mx
        |  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1),
        |b AS (
        |  SELECT event_type, count(*) AS n, sum(value) AS sv,
        |    min(value) AS mn, max(value) AS mx
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1),
        |u AS (SELECT * FROM h UNION ALL SELECT * FROM b)
        |SELECT event_type, CAST(sum(n) AS BIGINT) AS n,
        |  round(sum(sv), 2) AS sum_value,
        |  round(min(mn), 2) AS min_value, round(max(mx), 2) AS max_value,
        |  round(sum(sv) / sum(n), 4) AS avg_value
        |FROM u GROUP BY event_type""".stripMargin,
    "q_window_funcs" ->
      """SELECT event_id, user_id, prev_value, next_type, rk, cd, pr, quartile FROM (
        |  SELECT event_id, user_id, event_type,
        |    round(lag(value) OVER w, 2) AS prev_value,
        |    lead(event_type) OVER w AS next_type,
        |    rank() OVER w AS rk,
        |    round(cume_dist() OVER w, 6) AS cd,
        |    round(percent_rank() OVER w, 6) AS pr,
        |    CAST(ntile(4) OVER w AS INT) AS quartile
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |WHERE event_type = 'purchase'""".stripMargin,
    "q_setops" ->
      """WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
        |seg AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY'),
        |u AS (
        |  SELECT k, 'both' AS src FROM (SELECT k FROM buyers INTERSECT SELECT k FROM seg)
        |  UNION ALL
        |  SELECT k, 'no_orders' AS src FROM (SELECT k FROM seg EXCEPT SELECT k FROM buyers))
        |SELECT src, count(*) AS n FROM u GROUP BY src""".stripMargin,
    "q_range_window" ->
      """SELECT event_id, user_id, n_1h, sum_1h FROM (
        |  SELECT event_id, user_id, event_type,
        |    count(*) OVER w AS n_1h,
        |    round(sum(value) OVER w, 2) AS sum_1h
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
        |WHERE event_type = 'purchase'""".stripMargin,
    "q_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e
        |  JOIN v ON v.user_id = e.user_id AND e.ts > v.v_ts
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e
        |  JOIN c ON c.user_id = e.user_id AND e.ts > c.c_ts
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT '1_view' AS stage, count(*) AS n_users FROM v
        |UNION ALL SELECT '2_click', count(*) FROM c
        |UNION ALL SELECT '3_purchase', count(*) FROM p""".stripMargin,
    "q_retention" ->
      """WITH w AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
        |cohort AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, wk FROM w)
        |SELECT c.cohort, a.wk - c.cohort AS week_offset,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM active a JOIN cohort c USING (user_id)
        |GROUP BY c.cohort, a.wk - c.cohort""".stripMargin,
    "q_sql_corr" ->
      """SELECT c_custkey,
        |  (SELECT round(max(o_totalprice), 2) FROM orders
        |   WHERE o_custkey = c_custkey) AS max_order
        |FROM customer
        |WHERE c_acctbal > 0""".stripMargin,
    "q_array_agg" ->
      """SELECT event_type,
        |  array_to_string(list_sort(list_distinct(list(user_id % 10))), ',') AS bucket_csv,
        |  CAST(len(list_distinct(list(user_id % 10))) AS BIGINT) AS n_buckets,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "q_typed_groups" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id)) AS gap
        |  FROM events)
        |SELECT user_id, count(*) AS n_events, max(gap) AS max_gap_us
        |FROM g GROUP BY user_id HAVING count(*) >= 2""".stripMargin,
    "q_unpivot" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', l_discount FROM lineitem)
        |SELECT measure, count(*) AS n, round(sum(val),2) AS total
        |FROM u GROUP BY measure""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,
    "q_range_join" ->
      """WITH p AS (SELECT event_id AS pid, user_id, epoch_us(ts) AS pt
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, epoch_us(ts) AS vt, value AS vval
        |      FROM events WHERE event_type = 'view')
        |SELECT pid, count(vt) AS n_views, round(sum(vval),2) AS view_value
        |FROM p LEFT JOIN v ON p.user_id = v.user_id
        |  AND v.vt >= p.pt - 3600000000 AND v.vt < p.pt
        |GROUP BY pid""".stripMargin,
    "q_moving_avg" ->
      """SELECT event_id, user_id, mavg, rsum FROM (
        |  SELECT event_id, user_id, event_type,
        |    round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mavg,
        |    round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS rsum
        |  FROM events)
        |WHERE event_type = 'purchase'""".stripMargin,
    "q_datetime" ->
      """SELECT CAST(date_part('year', ts) AS INT) AS y,
        |  CAST(date_part('month', ts) AS INT) AS m,
        |  CAST(date_part('day', ts) AS INT) AS dom,
        |  CAST(date_part('dow', ts) + 1 AS INT) AS dow,
        |  CAST(date_part('hour', ts) AS INT) AS h,
        |  count(*) AS n, round(sum(value),2) AS sv
        |FROM events GROUP BY 1, 2, 3, 4, 5""".stripMargin,
    "q_skew_join" ->
      """SELECT c_mktsegment AS seg, count(*) AS n, round(sum(value),2) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1""".stripMargin,
    "q_cogroup" ->
      """WITH e AS (
        |  SELECT user_id, count(*) AS n_events, max(value) AS max_event_value
        |  FROM events GROUP BY user_id),
        |o AS (
        |  SELECT o_custkey AS user_id, count(*) AS n_orders,
        |    max(o_totalprice) AS max_order_price
        |  FROM orders GROUP BY o_custkey)
        |SELECT coalesce(e.user_id, o.user_id) AS user_id,
        |  coalesce(e.n_events, 0) AS n_events,
        |  coalesce(e.max_event_value, 0.0) AS max_event_value,
        |  coalesce(o.n_orders, 0) AS n_orders,
        |  coalesce(o.max_order_price, 0.0) AS max_order_price
        |FROM e FULL OUTER JOIN o ON e.user_id = o.user_id""".stripMargin,
    "q_outer_join" ->
      """WITH ev AS (
        |  SELECT user_id, count(*) AS n_ev, round(sum(value),2) AS ev_value
        |  FROM events GROUP BY user_id)
        |SELECT coalesce(c.c_custkey, ev.user_id) AS k, c.c_mktsegment AS seg,
        |  coalesce(ev.n_ev, 0) AS n_ev, coalesce(ev.ev_value, 0.0) AS ev_value
        |FROM customer c FULL OUTER JOIN ev ON c.c_custkey = ev.user_id""".stripMargin,
    "q_skew_distinct" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
        |FROM events GROUP BY 1""".stripMargin,
    "q_sliding_window" ->
      """WITH e AS (
        |  SELECT event_type, value,
        |    unnest([time_bucket(INTERVAL 30 minutes, ts),
        |            time_bucket(INTERVAL 30 minutes, ts) - INTERVAL 30 minutes]) AS ws
        |  FROM events)
        |SELECT CAST(epoch(ws) AS BIGINT) AS ws, event_type,
        |  count(*) AS n, round(sum(value),2) AS sum_value
        |FROM e GROUP BY 1, 2""".stripMargin,
    "q_pivot" ->
      """SELECT CAST(user_id % 10 AS BIGINT) AS ub,
        |  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view,
        |  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error
        |FROM events GROUP BY 1""".stripMargin
  )
}
