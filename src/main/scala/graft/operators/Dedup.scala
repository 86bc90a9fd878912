package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Document deduplication for the training-data pipeline (SURVEY.md §2).
  *
  * Scale shape (100 TB): no operator here is all-pairs. Candidate
  * generation is always a co-partitioned equi-self-join on a small
  * blocking key (LSH band bucket, SimHash band, lang×length block);
  * exact verification runs only inside buckets. Skewed buckets (a
  * degenerate common signature) are AQE skew-join territory — the join
  * keys are (band_idx, band_val) so hot buckets split cleanly.
  */
object Dedup {

  // ---- MinHash + LSH -------------------------------------------------

  val NumHashes = 128
  val Bands = 32 // 32 bands × 4 rows

  /** Candidate pairs (id_a < id_b) whose MinHash signatures collide in
    * ≥1 band, with exact word-set Jaccard verification ≥ `threshold`.
    *
    * Shuffle discipline: the band self-join moves only (id, band_idx,
    * band_val) — never the documents — and its two sides are identical
    * plans, so Spark reuses one exchange. Word sets re-enter only for
    * the (small) deduplicated candidate set, via equi-joins back to a
    * per-doc distinct-word projection. */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val base = docs.select(col(idCol).as("id"), words(col(textCol)).as("w"))
      .filter(size(col("w")) >= 3)
    val bands = base
      .withColumn("band_val",
        explode(graft.functions.DedupExpressions.minhashBands(col("w"), NumHashes, Bands)))
      .select(col("id"), col("band_val"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_val") === col("b.band_val") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    verifyJaccard(cand, base, threshold)
  }

  /** Join candidate (id_a, id_b) pairs back to per-doc distinct word
    * sets and keep exact Jaccard ≥ threshold. Sets are sorted once per
    * doc so the per-pair intersection is a linear merge (native expr). */
  private[graft] def verifyJaccard(cand: DataFrame, base: DataFrame,
      threshold: Double): DataFrame = {
    val wd = base.select(col("id"),
      sort_array(array_distinct(col("w"))).as("wd")).withColumn("n", size(col("wd")))
    val inter = graft.functions.DedupExpressions
      .sortedIntersectSize(col("a.wd"), col("b.wd"))
    cand
      .join(wd.as("a"), col("id_a") === col("a.id"))
      .join(wd.as("b"), col("id_b") === col("b.id"))
      .withColumn("jaccard",
        round(inter / (col("a.n") + col("b.n") - inter), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact word-set Jaccard similarity. */
  def wordJaccard(wa: Column, wb: Column): Column = {
    val a = array_distinct(wa)
    val b = array_distinct(wb)
    val inter = size(array_intersect(a, b))
    inter / (size(a) + size(b) - inter)
  }

  // ---- duplicate-cluster resolution ---------------------------------

  /** Connected components over near-dup pairs by iterative min-label
    * propagation: every node adopts the smallest label among itself and
    * its neighbors until fixpoint. Iterations are O(component diameter)
    * — dup clusters are near-cliques, so 2-3 rounds in practice. Each
    * round is one co-partitioned join + partial-agg min; nothing is
    * collected except the convergence counter. The cluster id (= min
    * doc id reached) is the canonical keeper for the group. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // eager localCheckpoint per round: persist() alone leaves the
    // logical plan growing with the iteration count (analyzer blow-up →
    // heap); checkpointing truncates lineage to the materialized state,
    // exactly like iterative graph algorithms on a cluster
    val before = pairs.sparkSession.sparkContext.getPersistentRDDs.keySet
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("nid"))
        .agg(min("label").as("nlabel"))
      val next = labels
        .join(neighborMin, labels("id") === col("nid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .localCheckpoint(true)
      changed = next.as("n").join(labels.as("o"), Seq("id"))
        .filter(col("n.label") =!= col("o.label")).count()
      labels = next
      iter += 1
    }
    // re-materialize the small final state, then free every intermediate
    // checkpoint block (they'd otherwise occupy the block manager for
    // the rest of the session)
    val result = labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .localCheckpoint(true)
    val sc = pairs.sparkSession.sparkContext
    val ids = sc.getPersistentRDDs.keySet -- before
    val keep = if (ids.nonEmpty) ids.max else -1
    sc.getPersistentRDDs.foreach { case (id, rdd) =>
      if (ids.contains(id) && id != keep) rdd.unpersist(false)
    }
    result
  }

  // ---- SimHash -------------------------------------------------------

  /** 64-bit SimHash over word hashes: per-bit ±1 votes, sign → bit
    * (native single-pass expression, see SimHash64). */
  def simhash(ws: Column): Column =
    graft.functions.DedupExpressions.simhash64(ws)

  /** Near-dup pairs with Hamming distance ≤ 3 via 4×16-bit band blocking.
    * Complete by pigeonhole: ≤3 differing bits cannot touch all 4 bands,
    * so every qualifying pair collides in ≥1 band — unlike MinHash LSH
    * this blocking loses no recall. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"), words(col(textCol)).as("w"))
      .withColumn("sim", simhash(col("w")))
      .select("id", "sim")
    val banded = sh.withColumn("band", explode(array((0 until 4).map(b =>
        struct(lit(b).as("band_idx"),
          shiftrightunsigned(col("sim"), b * 16).bitwiseAND(lit(0xFFFFL)).as("band_val"))): _*)))
      .select(col("id"), col("sim"), col("band.band_idx").as("band_idx"),
        col("band.band_val").as("band_val"))
    // ids-only band join (exchange reused across both sides), then one
    // join back to the small (id, sim) table for the Hamming check
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx")
          && col("a.band_val") === col("b.band_val")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(sh.as("sa"), col("id_a") === col("sa.id"))
      .join(sh.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sa.sim").bitwiseXOR(col("sb.sim"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
