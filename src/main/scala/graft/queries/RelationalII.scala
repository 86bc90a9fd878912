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

    // Window-function breadth on an event stream ordering.
    "q_window_funcs" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("prev_value", round(lag("value", 1).over(w), 2))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .withColumn("rk", rank().over(w))
        .withColumn("cd", round(cume_dist().over(w), 6))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("prev_value"),
          col("next_type"), col("rk"), col("cd"))
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
    })
  )

  def oracles: Map[String, String] = Map(
    "q_window_funcs" ->
      """SELECT event_id, user_id, prev_value, next_type, rk, cd FROM (
        |  SELECT event_id, user_id, event_type,
        |    round(lag(value) OVER w, 2) AS prev_value,
        |    lead(event_type) OVER w AS next_type,
        |    rank() OVER w AS rk,
        |    round(cume_dist() OVER w, 6) AS cd
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
    "q_sql_corr" ->
      """SELECT c_custkey,
        |  (SELECT round(max(o_totalprice), 2) FROM orders
        |   WHERE o_custkey = c_custkey) AS max_order
        |FROM customer
        |WHERE c_acctbal > 0""".stripMargin,
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
