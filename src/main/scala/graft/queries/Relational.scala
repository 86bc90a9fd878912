package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational / OLAP query pack (SURVEY.md §2).
  *
  * Scale notes: every dim-side join is `broadcast()`-hinted; the fact
  * table (`lineitem` / `events`) shuffles at most once per query; all
  * float aggregates are rounded per SURVEY.md §4 so the DuckDB oracle
  * hash-matches; all timestamps leave the query as epoch-second BIGINTs.
  */
object Relational extends QueryPack {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1 shape: scan + pushed filter + grouped multi-aggregate.
    "q1_agg" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // TPC-H Q3 shape: broadcast the dim (customer) into orders map-side;
    // the orders⋈lineitem fact-fact edge is a shuffle join on orderkey —
    // the date filter keeps most of orders, so hinting it broadcast would
    // OOM at scale (AQE still broadcasts at runtime when it truly fits).
    // The groupBy on l_orderkey reuses the join's partitioning: the
    // lineitem fact crosses the wire exactly once.
    "q3_join" -> ((s, d) => {
      val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = orders(s, d).filter(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      val l = lineitem(s, d).filter(col("l_shipdate") > to_timestamp(lit("1998-01-01")))
      l.join(o.join(broadcast(c), col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: star join — nation/region broadcast into customer,
    // the ASIA-pruned customer dim broadcast into the fact stream; the
    // orders⋈lineitem fact-fact edge is a shuffle join (the date filter
    // keeps nearly all of orders — never hint a fact broadcast).
    "q5_join5" -> ((s, d) => {
      val r = region(s, d).filter(col("r_name") === "ASIA")
      val dims = customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      val o = orders(s, d).filter(col("o_orderdate") < to_timestamp(lit("1999-01-01")))
      lineitem(s, d)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Per-group top-k via ranking window.
    "q_topk_window" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_orderpriority"), col("rk"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
    }),

    // Same top-k semantics via the bounded-heap TopKStructs aggregate:
    // only k rows per key per partition cross the shuffle (vs the
    // window's full sort) — the 100 TB shape. Hash-matched against the
    // identical DuckDB oracle as q_topk_window.
    "q_topk_agg" -> ((s, d) => {
      import graft.functions.TopKAggregate.topk
      orders(s, d)
        .groupBy("o_orderpriority")
        .agg(topk(struct((-col("o_totalprice")).as("negp"),
          col("o_orderkey").as("key")), 3).as("top"))
        .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("i", "t")))
        .select(col("o_orderpriority"), (col("i") + 1).cast("int").as("rk"),
          col("t.key").as("o_orderkey"),
          round(-col("t.negp"), 2).as("price"))
    }),

    // EXISTS / NOT EXISTS via semi/anti joins (no row duplication).
    "q_semi_anti" -> ((s, d) => {
      val c = customer(s, d)
      // NO broadcast hint: the filtered orders side is a fact subset —
      // unboundedly large at scale. AQE broadcasts it when it measures
      // small; at 100 TB the semi join runs as a shuffle join and the
      // runtime BLOOM filter (enabled in GraftSession, spec-gated in
      // PlanSpec) prunes the customer scan down to probable matches
      // before the exchange.
      val bigOrders = orders(s, d).filter(col("o_totalprice") > 100000)
      val withBig = c.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with"))
      val without = c.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without"))
      withBig.join(without, Seq("c_mktsegment"), "full_outer")
        .select(col("c_mktsegment"),
          coalesce(col("n_with"), lit(0L)).as("n_with"),
          coalesce(col("n_without"), lit(0L)).as("n_without"))
    }),

    // Hierarchical subtotals.
    "q_rollup" -> ((s, d) => {
      orders(s, d).rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
    }),

    // JSON field extraction (codegen'd path expression, no UDF).
    "q_json" -> ((s, d) => {
      events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n_k"), round(avg(col("k")), 4).as("avg_k"))
    }),

    // Tumbling-window aggregation — identical operator to the streaming path.
    "q_events_window" -> ((s, d) => {
      events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("ws"), col("event_type"),
          col("n"), col("sum_value"))
    }),

    // Session assignment: 30-min-gap sessionization with window functions,
    // then per-session stats. Linear, partitioned by user — no self-join.
    "q_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull
            .or(unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L), 1L)
            .otherwise(0L))
        .withColumn("sess_id", sum("new_sess").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("sess_value"))
    }),

    // Native session windows: the built-in operator twin of the manual
    // lag/cumsum sessionizer above — and the one that also runs under
    // Structured Streaming with state eviction. Session closes when the
    // next event's gap is >= 30 min (session_window's end bound is
    // exclusive; the lag formulation above uses strict >).
    "q_session_window" -> ((s, d) =>
      events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sess_value"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("ss_us"),
          unix_micros(col("sw.end")).as("se_us"),
          col("n_events"), col("sess_value"))),

    // As-of join: each purchase matched to the same user's most recent
    // strictly-prior 'view'. Union+window carry-forward — linear scan,
    // no range cross-join, scales to arbitrary fact sizes.
    "q_asof_join" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      events(s, d)
        .withColumn("view_ev",
          when(col("event_type") === "view",
            struct(col("ts").as("vts"), col("value").as("vval"))))
        .withColumn("prior_view", last(col("view_ev"), ignoreNulls = true).over(byUser))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("prior_view.vts")).as("prior_view_ts"),
          round(col("prior_view.vval"), 2).as("prior_view_value"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),2) AS sum_qty,
        |  round(sum(l_extendedprice),2) AS sum_base_price,
        |  round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        |  round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        |  round(avg(l_quantity),4) AS avg_qty,
        |  round(avg(l_extendedprice),4) AS avg_price,
        |  round(avg(l_discount),6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join" ->
      """SELECT l_orderkey, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_join5" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        |  count(*) AS n_items
        |FROM region, nation, customer, orders, lineitem
        |WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
        |  AND c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_topk_window" ->
      """SELECT o_orderpriority, rk, o_orderkey, price FROM (
        |  SELECT o_orderpriority, o_orderkey, round(o_totalprice,2) AS price,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,
    "q_topk_agg" ->
      """SELECT o_orderpriority, rk, o_orderkey, price FROM (
        |  SELECT o_orderpriority, o_orderkey, round(o_totalprice,2) AS price,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,
    "q_semi_anti" ->
      """WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 100000),
        |w AS (SELECT c_mktsegment, count(*) AS n_with FROM customer
        |      WHERE EXISTS (SELECT 1 FROM big WHERE o_custkey = c_custkey)
        |      GROUP BY c_mktsegment),
        |wo AS (SELECT c_mktsegment, count(*) AS n_without FROM customer
        |       WHERE NOT EXISTS (SELECT 1 FROM big WHERE o_custkey = c_custkey)
        |       GROUP BY c_mktsegment)
        |SELECT c_mktsegment, coalesce(n_with, 0) AS n_with,
        |  coalesce(n_without, 0) AS n_without
        |FROM w FULL OUTER JOIN wo USING (c_mktsegment)""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_json" ->
      """SELECT event_type, count(CAST(json_extract_string(props,'k') AS INT)) AS n_k,
        |  round(avg(CAST(json_extract_string(props,'k') AS INT)),4) AS avg_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q_events_window" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL 1 hour, ts)) AS BIGINT) AS ws,
        |  event_type, count(*) AS n, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e)
        |SELECT user_id,
        |  min(epoch_us(ts)) AS ss_us,
        |  max(epoch_us(ts)) + 1800000000 AS se_us,
        |  count(*) AS n_events, round(sum(value),2) AS sess_value
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, value,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM e)
        |SELECT user_id, sess_id, count(*) AS n_events,
        |  round(sum(value),2) AS sess_value
        |FROM s GROUP BY user_id, sess_id""".stripMargin,
    "q_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
        |      OVER w AS vts,
        |    last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
        |      OVER w AS vval
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, epoch_us(vts) AS prior_view_ts,
        |  round(vval,2) AS prior_view_value
        |FROM e WHERE event_type = 'purchase'""".stripMargin
  )
}
