package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.multimodal.Multimodal

/** Multimodal pack (SURVEY.md §2) — REAL codec since round 11: the
  * corpus is deterministic RGB images encoded through the JDK's actual
  * PNG/BMP writers and decoded back with `ImageIO.read`; every emitted
  * statistic is an integer pixel fact the DuckDB oracle re-derives
  * from the generator formula `(id·31 + f·17 + x·7 + y·13 + c·101)
  * mod 256` with dims (4 + id mod 13) × (4 + id mod 11). The codecs
  * are lossless for 8-bit RGB, so the hash gate catches a single
  * mangled pixel anywhere in encode → container → decode → stat.
  * The oracle enumerates pixels by cross-joining constant `range()`
  * tables (dims are ≤16×14 by construction) — DuckDB's `range` takes
  * no lateral args. Only `mm_semdedup` stays rows-only (its kmeans
  * cell seeding isn't SQL); its funnel spec lives in MultimodalSpec. */
object MultimodalPack extends QueryPack {

  // shared oracle CTEs: per-doc dims + the real pixel lattice
  private val dimsSql =
    """dims AS (SELECT CAST(doc_id AS BIGINT) AS id,
      |    CAST(4 + doc_id % 13 AS INT) AS w, CAST(4 + doc_id % 11 AS INT) AS h
      |  FROM documents)""".stripMargin
  private val pxSql =
    """px AS (SELECT id, w, h, CAST(x.range AS BIGINT) AS x,
      |    CAST(y.range AS BIGINT) AS y
      |  FROM dims, range(16) x, range(14) y
      |  WHERE x.range < w AND y.range < h)""".stripMargin
  // the generator, as a SQL fragment: channel c of frame f at (x, y)
  private def gen(f: String, c: Int): String =
    s"(id*31 + ($f)*17 + x*7 + y*13 + ${c * 101}) % 256"

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode" -> ((s, d) =>
      Multimodal.decodeMeta(Multimodal.imageCorpus(s, d), "id", "media").toDF()),

    "mm_features" -> ((s, d) =>
      Multimodal.channelHistogram(Multimodal.imageCorpus(s, d), "id", "media").toDF()),

    "mm_framesample" -> ((s, d) =>
      Multimodal.sampleFrames(Multimodal.videoCorpus(s, d), "id", "media").toDF()),

    "mm_resize" -> ((s, d) =>
      Multimodal.resizeNN(Multimodal.imageCorpus(s, d), "id", "media").toDF()),

    // The multimodal → similarity bridge — the image-dedup shape every
    // multimodal pipeline runs: per-media feature vectors (REAL decoded
    // channel histograms since round 11) feed the SAME cell-blocked
    // semantic-dedup operator the embedding pack gates (one pipeline,
    // no special-cased media path). Vectors flow as array<float> into
    // semDedup's hash-collapse + within-cell pairwise pass; output is
    // the per-cell funnel. Rows-only gate (kmeans cell seeding isn't
    // SQL); MultimodalSpec pins replica collapse + funnel conservation.
    "mm_semdedup" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.operators.{KMeansND, Similarity}
      val feats = Multimodal.featureVectors(
          Multimodal.imageCorpus(s, d), "id", "media").toDF()
        .select(col("id").as("vec_id"),
          transform(col("hist"), v => v.cast("float")).as("embedding"))
      val cells = KMeansND.seed(
        feats.select(col("vec_id").as("id"), col("embedding").as("vec")), 4)
      Similarity.semDedup(feats, cells, tau = 0.98)
    })
  )

  def oracles: Map[String, String] = Map(
    "mm_decode" ->
      s"""WITH $dimsSql,
         |$pxSql
         |SELECT id, CASE WHEN id % 2 = 0 THEN 'png' ELSE 'bmp' END AS fmt,
         |  w AS width, h AS height, 3 AS channels,
         |  CAST(sum(${gen("0", 0)}) AS BIGINT) AS sum_r,
         |  CAST(sum(${gen("0", 1)}) AS BIGINT) AS sum_g,
         |  CAST(sum(${gen("0", 2)}) AS BIGINT) AS sum_b
         |FROM px GROUP BY id, w, h""".stripMargin,

    "mm_features" ->
      s"""WITH $dimsSql,
         |$pxSql,
         |vals AS (SELECT id, CAST(c.range AS INT) AS channel,
         |    (id*31 + x*7 + y*13 + c.range*101) % 256 AS v
         |  FROM px, range(3) c)
         |SELECT id, channel, CAST(v // 64 AS INT) AS bin, count(*) AS cnt
         |FROM vals GROUP BY id, channel, bin""".stripMargin,

    // nearest-neighbor half-box resample: dw = max(1, w//2), source
    // pixel sx = (dx·w)//dw — the exact contract resizeNN implements
    // over the REAL decoded pixels
    "mm_resize" ->
      s"""WITH $dimsSql,
         |dst AS (SELECT id, w, h, greatest(1, w // 2) AS dw,
         |    greatest(1, h // 2) AS dh FROM dims),
         |px AS (SELECT id, w, h, dw, dh,
         |    CAST((dx.range * w) // dw AS BIGINT) AS x,
         |    CAST((dy.range * h) // dh AS BIGINT) AS y
         |  FROM dst, range(8) dx, range(7) dy
         |  WHERE dx.range < dw AND dy.range < dh)
         |SELECT id, w AS src_w, h AS src_h, dw AS dst_w, dh AS dst_h,
         |  CAST(sum(${gen("0", 0)}) AS BIGINT) AS sum_r,
         |  CAST(sum(${gen("0", 1)}) AS BIGINT) AS sum_g,
         |  CAST(sum(${gen("0", 2)}) AS BIGINT) AS sum_b
         |FROM px GROUP BY id, w, h, dw, dh""".stripMargin,

    // every stride-2 frame of the 1–5-frame container, decoded and
    // summed; f enters the generator with weight 17
    "mm_framesample" ->
      s"""WITH $dimsSql,
         |frames AS (SELECT id, w, h, CAST(f.range AS INT) AS f
         |  FROM dims, range(5) f
         |  WHERE f.range < 1 + id % 5 AND f.range % 2 = 0),
         |px AS (SELECT id, f, w, h, CAST(x.range AS BIGINT) AS x,
         |    CAST(y.range AS BIGINT) AS y
         |  FROM frames, range(16) x, range(14) y
         |  WHERE x.range < w AND y.range < h)
         |SELECT id, f AS frame_idx, w AS width, h AS height,
         |  CAST(sum(${gen("f", 0)}) AS BIGINT) AS sum_r,
         |  CAST(sum(${gen("f", 1)}) AS BIGINT) AS sum_g,
         |  CAST(sum(${gen("f", 2)}) AS BIGINT) AS sum_b
         |FROM px GROUP BY id, f, w, h""".stripMargin
  )
}
