package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.multimodal.Multimodal

/** Multimodal plumbing pack (SURVEY.md §2). Rows-only gate: the stub
  * codec's per-byte header math isn't reasonably SQL-expressible;
  * MultimodalSpec asserts the decode against reference values. */
object MultimodalPack extends QueryPack {

  private def media(s: SparkSession, d: String) = {
    import org.apache.spark.sql.functions._
    s.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode" -> ((s, d) => Multimodal.documentsAsMedia(s, d)),
    // the feature vector dumps as csv — the gate's compare harness
    // can't sort array columns; the typed Dataset keeps the real array
    "mm_features" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      Multimodal.extractFeatures(media(s, d), "doc_id", "media").toDF()
        .select(col("id"), col("byte_len"),
          concat_ws(",", col("hist")).as("hist_csv"))
    }),
    "mm_framesample" -> ((s, d) =>
      Multimodal.sampleFrames(media(s, d), "doc_id", "media").toDF()),
    "mm_resize" -> ((s, d) =>
      Multimodal.resize(media(s, d), "doc_id", "media").toDF()),
    // The multimodal → similarity bridge — the image-dedup shape every
    // multimodal pipeline runs: per-media feature vectors feed the SAME
    // cell-blocked semantic-dedup operator the embedding pack gates
    // (one pipeline, no special-cased media path). extractFeatures'
    // 8-bin byte histograms stand in for image embeddings (a real
    // model swaps in behind the same signature and this plan is
    // unchanged); vectors flow as array<float> into semDedup's
    // hash-collapse + within-cell pairwise pass, so byte-identical
    // media collapse exactly and near-identical payloads drop within
    // cosine tau. Output is the per-cell funnel. Rows-only gate (the
    // stub codec isn't SQL); MultimodalSpec pins replica collapse and
    // funnel conservation.
    "mm_semdedup" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.operators.{KMeansND, Similarity}
      val feats = Multimodal.extractFeatures(media(s, d), "doc_id", "media")
        .toDF()
        .select(col("id").as("vec_id"),
          transform(col("hist"), v => v.cast("float")).as("embedding"))
      val cells = KMeansND.seed(
        feats.select(col("vec_id").as("id"), col("embedding").as("vec")), 4)
      Similarity.semDedup(feats, cells, tau = 0.98)
    })
  )

  def oracles: Map[String, String] = Map.empty
}
