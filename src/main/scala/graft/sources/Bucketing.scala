package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table support (SURVEY.md §3 rule 5): co-locate repeated
  * large-large joins by pre-hashing both tables into the same bucket
  * layout, so the join planner skips the shuffle (and, with sorted
  * buckets, the sort) on every subsequent join. The 100 TB shape for a
  * fact table joined on the same key daily. */
object Bucketing {

  /** Writes `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
