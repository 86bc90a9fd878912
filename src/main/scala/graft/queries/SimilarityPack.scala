package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Embedding similarity query pack over `embeddings` (SURVEY.md §2).
  * The DuckDB oracles compute cosine as dot/(|a||b|) over DOUBLE[]
  * lists — the same sequential double accumulation as the native
  * CosineSimilarity expression. */
object SimilarityPack extends QueryPack {

  private val NumQueries = 10

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "ann_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.topK(emb, emb.filter(col("vec_id") < NumQueries), k = 5)
    }),

    "embed_neardup" -> ((s, d) =>
      Similarity.nearDupPairs(Tables.embeddings(s, d), "label", 0.35)),

    "ann_lsh_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < NumQueries), k = 3)
    })
  )

  private val cosSql =
    """(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
      |   (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
      |    sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))))""".stripMargin

  def oracles: Map[String, String] = Map(
    "ann_topk" ->
      s"""WITH c AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS vid, $cosSql AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < $NumQueries
         |    AND b.vec_id <> a.vec_id),
         |r AS (SELECT qid, vid, cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk FROM c)
         |SELECT qid, rk, vid, round(cos, 4) AS cos FROM r WHERE rk <= 5""".stripMargin,
    "embed_neardup" ->
      s"""WITH p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, round($cosSql, 4) AS cos
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.35""".stripMargin
  )
}
