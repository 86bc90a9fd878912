package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftbridge.ExprBridge
import graft.functions.{CosineSimilarity, MinHashBands, NGramHashSet, SimHash64, SortedIntersectSize, SortedLongIntersectSize}

/** Session bootstrap + SQL surface for the graft engine.
  *
  * `builder()` applies the recommended config (shuffle partitions sized
  * to cores — AQE coalesces upward at cluster scale; UTC timestamps).
  * `registerFunctions` exposes the native expressions to SQL so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works without the Scala
  * API. */
object GraftSession {

  def builder(master: String = "local[*]", cores: Int =
      Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")

  /** Registers graft's native expressions under SQL names. */
  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      es => CosineSimilarity(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_bands",
      es => MinHashBands(es.head, 128, 32), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_intersect_size",
      es => SortedIntersectSize(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("ngram_hash_set",
      es => NGramHashSet(es(0),
        es(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
          .value.toString.toInt), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_long_intersect_size",
      es => SortedLongIntersectSize(es(0), es(1)), "scala_udf")
  }
}
