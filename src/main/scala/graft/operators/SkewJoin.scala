package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md §3 rule 5).
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool when one join key dominates so heavily that even a
  * split partition hot-spots, or when AQE is unavailable (streaming
  * micro-batches). The fact side gets a deterministic salt derived from
  * a uniqueness column; the (small-but-not-broadcastable) other side is
  * replicated once per salt, so key cardinality seen by the shuffle is
  * `salts×` and no single reducer owns a hot key alone. */
object SkewJoin {

  /** Inner equi-join with the fact side salted `salts` ways. `uniqueCol`
    * must vary within a key group (any row id / line number works) so
    * rows of a hot key spread across salts deterministically. */
  def saltedJoin(fact: DataFrame, other: DataFrame, key: String,
      uniqueCol: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(uniqueCol)), lit(salts.toLong)).cast("int"))
    val saltedOther = other.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedOther, Seq(key, "_salt")).drop("_salt")
  }
}
