package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PageRank (3 iterations, damping 0.85) over the bipartite
    // part↔supplier co-occurrence graph from lineitem. The rank unit
    // is integer (1e9 per node), per-edge contribution is floor
    // division by out-degree and the damping step is (85·s) div 100 —
    // exact integer math, identical in any engine and any partition
    // order (float PageRank sums are association-dependent). Plan
    // shape at scale: edges localCheckpointed once (reused by the
    // degree agg and every iteration), each iteration is one
    // co-partitioned equi-join + one hash agg keyed on node — the
    // Pregel step as two shuffles; nothing ever collects. Top-20 via
    // TakeOrderedAndProject (sort+limit), never a global window.
    "q_pagerank" -> ((s, d) => {
      val e0 = lineitem(s, d)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sk")).distinct()
      val edges = e0.select(
          concat(lit("p"), col("p").cast("string")).as("src"),
          concat(lit("s"), col("sk").cast("string")).as("dst"))
        .union(e0.select(
          concat(lit("s"), col("sk").cast("string")).as("src"),
          concat(lit("p"), col("p").cast("string")).as("dst")))
        .localCheckpoint()
      val deg = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
      var pr = deg.select(col("node"), col("deg"), lit(1000000000L).as("pr"))
      for (_ <- 1 to 3) {
        val cin = pr.join(edges, pr("node") === edges("src"))
          .select(col("dst").as("node"), expr("pr div deg").as("c"))
          .groupBy("node").agg(sum("c").as("cin"))
        // undirected graph: every node has in-edges, inner join keeps all
        pr = deg.join(cin, "node")
          .select(col("node"), col("deg"),
            (lit(150000000L) + expr("(85 * cin) div 100")).as("pr"))
      }
      val top = pr.orderBy(col("pr").desc, col("node")).limit(20)
      top.withColumn("rk",
        row_number().over(Window.orderBy(col("pr").desc, col("node"))))
    }),

    // Exponentially weighted daily series (α=1/2) per event type — the
    // smoothed-trend readout monitoring dashboards draw. Weights are
    // DYADIC (2^(7-j) over the trailing 8 observed days), and the
    // daily level is pre-quantized to integer 1e-4 units, so numerator
    // and denominator are exact BIGINTs; the only float op is the
    // final division, identical per row in both engines. One hash agg
    // to days + one partitioned window pass; series length is bounded
    // by the time range, never the event count.
    "q_ewma" -> ((s, d) => {
      val daily = events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
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
    }),

    // Robust anomaly ranking: modified z-score (Iglewicz–Hoaglin,
    // 0.6745·(x−med)/MAD) per event type, top-5 most anomalous events
    // each. Median and MAD are order statistics (no association
    // boundary), rounded to 4 before scoring so every downstream
    // comparison sees identical doubles. Two tiny keyed aggregates
    // broadcast back over the scan; the per-type top-5 is a
    // rank-window over rows that already carry their scores — at
    // scale the window input can be pre-pruned by a per-partition
    // top-5, but the partition count (k types) keeps it cheap.
    "q_anomaly" -> ((s, d) => {
      val ev = events(s, d).select("event_id", "event_type", "value")
      val med = ev.groupBy("event_type")
        .agg(round(expr("percentile(value, 0.5)"), 4).as("med"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(round(expr("percentile(abs(value - med), 0.5)"), 4).as("mad"))
        .where(col("mad") =!= 0.0)
      val z = ev.join(broadcast(mad), "event_type")
        .withColumn("z",
          round(lit(0.6745) * (col("value") - col("med")) / col("mad"), 4))
      val w = Window.partitionBy("event_type")
        .orderBy(abs(col("z")).desc, col("event_id"))
      z.withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
        .select("event_type", "rk", "event_id", "value", "z")
    }),

    // Categorical column entropy profile — the data-quality twin of
    // q_profile for discrete columns: cardinality, Shannon entropy,
    // normalized entropy, and top-value concentration per column, in
    // one stacked scan per table. A collapsed (entropy→0, top_share→1)
    // column is the classic silent-upstream-failure signal. Value
    // counts partial-aggregate map-side, so hot values never skew the
    // exchange; the per-column rollup is k rows.
    "q_entropy" -> ((s, d) => {
      val docs = documents(s, d)
      val cats = docs.select(lit("documents.lang").as("col_name"), col("lang").as("val"))
        .union(docs.select(lit("documents.source"), col("source")))
        .union(events(s, d).select(lit("events.event_type"), col("event_type")))
      val counts = cats.groupBy("col_name", "val").agg(count(lit(1)).as("n"))
      val t = sum("n").over(Window.partitionBy("col_name"))
      val p = col("n").cast("double") / col("t")
      counts.withColumn("t", t)
        .groupBy("col_name")
        .agg(
          max("t").as("n_rows"),
          count(lit(1)).as("n_distinct"),
          round(-sum(p * log2(p)), 6).as("entropy"),
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
    })
  )

  def oracles: Map[String, String] = {
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

    Map(
      "q_pagerank" ->
        s"""WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sk FROM lineitem),
           |edges AS (
           |  SELECT 'p' || CAST(p AS VARCHAR) AS src, 's' || CAST(sk AS VARCHAR) AS dst FROM e0
           |  UNION ALL
           |  SELECT 's' || CAST(sk AS VARCHAR), 'p' || CAST(p AS VARCHAR) FROM e0),
           |deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
           |r0 AS (SELECT node, deg, CAST(1000000000 AS BIGINT) AS pr FROM deg),
           |${prRound("r0", "r1")},
           |${prRound("r1", "r2")},
           |${prRound("r2", "r3")}
           |SELECT node, deg, pr,
           |  CAST(row_number() OVER (ORDER BY pr DESC, node) AS INT) AS rk
           |FROM r3 QUALIFY rk <= 20""".stripMargin,

      "q_ewma" -> {
        val lags = (1 to 7).map(j => s"lag(dq, $j) OVER w AS l$j").mkString(",\n|    ")
        val num = "CAST(dq AS BIGINT) * 128 + " +
          (1 to 7).map(j => s"coalesce(l$j, 0) * ${1L << (7 - j)}").mkString(" + ")
        val den = "128 + " +
          (1 to 7).map(j => s"CASE WHEN l$j IS NULL THEN 0 ELSE ${1L << (7 - j)} END")
            .mkString(" + ")
        s"""WITH ev AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
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

      "q_anomaly" ->
        """WITH ev AS (SELECT event_id, event_type, value FROM events),
          |med AS (SELECT event_type, round(quantile_cont(value, 0.5), 4) AS med
          |  FROM ev GROUP BY 1),
          |mad AS (SELECT event_type, med,
          |    round(quantile_cont(abs(value - med), 0.5), 4) AS mad
          |  FROM ev JOIN med USING (event_type) GROUP BY 1, 2),
          |z AS (SELECT event_id, event_type, value,
          |    round(0.6745 * (value - med) / mad, 4) AS z
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
          |wt AS (SELECT col_name, n,
          |    sum(n) OVER (PARTITION BY col_name) AS t FROM counts),
          |agg AS (SELECT col_name,
          |    CAST(max(t) AS BIGINT) AS n_rows, count(*) AS n_distinct,
          |    round(-sum((CAST(n AS DOUBLE)/t) * log2(CAST(n AS DOUBLE)/t)), 6) AS entropy,
          |    round(CAST(max(n) AS DOUBLE) / max(t), 6) AS top_share
          |  FROM wt GROUP BY 1)
          |SELECT col_name, n_rows, n_distinct, entropy, top_share,
          |  CASE WHEN n_distinct > 1 THEN round(entropy / log2(n_distinct), 6) END
          |    AS norm_entropy
          |FROM agg""".stripMargin,

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
