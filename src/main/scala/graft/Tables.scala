package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish tables (see TESTDATA.md).
  *
  * All readers take the scale-factor directory so the same query code
  * runs at any SF; projections/filters applied by callers reach the
  * parquet scan via Catalyst pushdown.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  /** `events.ts` arrives in whichever parquet flavor the generator
    * used: TIMESTAMP(NANOS) (Spark 4 rejects it by default — read
    * nanos as long, truncate to µs; identical truncation to DuckDB's
    * epoch_us on the same file) or plain µs TIMESTAMP (possibly NTZ —
    * cast to the session type; the session is pinned UTC in both
    * engines, so the wall-clock mapping is the identity). Adapting on
    * the OBSERVED schema keeps every query and oracle working across
    * generator versions without touching call sites. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    val ts = raw.schema("ts").dataType match {
      // integer `div`: epoch nanos (~1.7e18) overflow double precision
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }
    raw.withColumn("ts", ts)
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** 2-D points projected from the embeddings table — the Spark-side
    * analogue of the reference's Birch `x y` point file
    * (kmeans_with_mapreduce-cuda.cu:51-70). */
  def points2d(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    embeddings(s, d).select(
      col("vec_id").as("id"),
      element_at(col("embedding"), 1).cast("double").as("x"),
      element_at(col("embedding"), 2).cast("double").as("y"))
  }
}
