package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for aggregations (SURVEY.md §3 rule 1/5 applied to
  * groupBy, not joins).
  *
  * Algebraic aggregates (sum/count/avg/min/max) are already skew-immune:
  * map-side partial combine reduces every partition to one row per key
  * before the shuffle. The aggregates that DO hot-spot are the
  * holistic ones — per-key DISTINCT state above all — where a hot key
  * drags its entire value set into a single reducer.
  *
  * `saltedDistinct` splits each key's distinct-state across `salts`
  * reducers by bucketing on hash(value): value → bucket is a function,
  * so per-(key, bucket) distinct counts are additive and the final
  * per-key rollup moves `salts` small longs instead of the value set.
  * State per reducer drops from O(|hot key's values|) to O(…/salts),
  * the same bound AQE's skew-join split gives joins — but for
  * aggregation state, which AQE does not split. */
object SkewAgg {

  /** Exact per-key count(DISTINCT valueCol) with distinct-state salted
    * `salts` ways. Result is identical to the plain aggregate; only the
    * shuffle layout changes (bucket id never reaches the result, so the
    * engine-native hash is fine). */
  def saltedDistinct(df: DataFrame, keyCols: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0)
    val keys = keyCols.map(col)
    df.groupBy(keys :+ pmod(xxhash64(col(valueCol)), lit(salts.toLong)).as("_vb"): _*)
      .agg(count_distinct(col(valueCol)).as("_nd"))
      .groupBy(keys: _*)
      .agg(sum("_nd").as("n_distinct"))
  }
}
