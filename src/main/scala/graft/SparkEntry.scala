package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.QueryPack

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each pack under graft.queries contributes `defs` (Spark DataFrame
  * builders) and `oracles` (equivalent DuckDB SQL on the same tables). */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    graft.queries.Clustering,
    graft.queries.ClusteringND,
    graft.queries.Relational,
    graft.queries.RelationalII,
    graft.queries.TextPack,
    graft.queries.DedupPack,
    graft.queries.SimilarityPack,
    graft.queries.MultimodalPack,
    graft.queries.StatsPack,
    graft.queries.AnalyticsPack,
    graft.queries.GraphPack,
    graft.queries.SketchPack,
    graft.queries.LearnPack
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.defs).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. Every
    * oracle is wrapped in the same canonical row order Verify applies
    * to the Spark dumps (all columns asc, nulls first). */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap.map { case (k, sql) =>
      k -> s"SELECT * FROM (\n$sql\n) graft_q ORDER BY ALL NULLS FIRST"
    }
}
