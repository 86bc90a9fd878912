package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.multimodal.Multimodal

/** Multimodal plumbing pack (SURVEY.md §2). Rows-only gate: the stub
  * codec's per-byte header math isn't reasonably SQL-expressible;
  * MultimodalSpec asserts the decode against reference values. */
object MultimodalPack extends QueryPack {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode" -> ((s, d) => Multimodal.documentsAsMedia(s, d))
  )

  def oracles: Map[String, String] = Map.empty
}
