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

  /** Join candidate (id_a, id_b) pairs back to per-doc distinct
    * word-hash sets and keep exact Jaccard ≥ threshold. Hash sets are
    * sorted once per doc so the per-pair intersection is a linear merge
    * over longs (native expr — several-fold cheaper than string sets). */
  private[graft] def verifyJaccard(cand: DataFrame, base: DataFrame,
      threshold: Double): DataFrame = {
    val wd = base.select(col("id"),
      graft.functions.DedupExpressions.ngramHashSet(col("w"), 1).as("wd"))
      .withColumn("n", size(col("wd")))
    val inter = graft.functions.DedupExpressions
      .sortedLongIntersectSize(col("a.wd"), col("b.wd"))
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

  /** Connected components over near-dup pairs. The cluster id (= min
    * doc id in the component) is the canonical keeper for the group.
    *
    * Adaptive execution, mirroring AQE's broadcast fallback: the dup
    * graph after blocking is orders of magnitude smaller than the
    * corpus (pairs, not documents), so when the materialized edge
    * count fits comfortably on the driver (`localEdgeThreshold`, ~32 MB
    * at the default) it is solved with a single-pass union-find — no
    * per-round job scheduling at all. Above the threshold (a 100 TB
    * corpus can yield 10^9+ pairs) it falls back to the distributed
    * min-label loop below. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
      localEdgeThreshold: Long = 2000000L): DataFrame = {
    val ccDebug = sys.env.contains("SPARK_GRAFT_CC_DEBUG")
    def dbg(m: String): Unit =
      if (ccDebug) System.err.println(s"[cc] $m t=${System.nanoTime() / 1e9}")
    dbg("enter")
    // materialize pair generation exactly once (it is the expensive
    // upstream: LSH banding / blocked verify)
    val edges1 = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .localCheckpoint(true)
    val nEdges = edges1.count()
    dbg(s"edges materialized n=$nEdges")
    val out =
      if (nEdges <= localEdgeThreshold) localUnionFind(edges1)
      else distributedMinLabel(edges1, maxIter, dbg)
    edges1.unpersist(false)
    dbg("done")
    out
  }

  /** Driver-side union-find (path-halving + union toward the running
    * min), then root → component-min relabel. O(E α(E)); only invoked
    * when E is driver-sized. */
  private def localUnionFind(edges1: DataFrame): DataFrame = {
    val spark = edges1.sparkSession
    val es = edges1.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      parent.putIfAbsent(x, x)
      while (parent.get(x) != x) {
        val gp = parent.get(parent.get(x))
        parent.put(x, gp) // path halving
        x = gp
      }
      x
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // union toward the smaller root → root IS the min id
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val rows = parent.keySet().toArray(Array.empty[java.lang.Long])
      .map(id => (id.longValue(), find(id)))
    import spark.implicits._
    spark.createDataset(rows.toIndexedSeq)
      .toDF("doc_id", "cluster_id")
  }

  /** Distributed min-label propagation with pointer jumping. Each round
    * every node adopts the min label over itself and its neighbors, then
    * labels are shortcut through themselves (label := label's label),
    * which contracts long chains in O(log diameter) rounds. Each round
    * is bounded state: joins on (id) with partial-agg min; nothing is
    * collected except the convergence counter. localCheckpoint per
    * round truncates lineage (persist() alone grows the logical plan
    * until analyzer heap exhaustion). */
  private def distributedMinLabel(edges1: DataFrame, maxIter: Int,
      dbg: String => Unit): DataFrame = {
    val spark = edges1.sparkSession
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = edges1
      .union(edges1.select(col("dst"), col("src")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    dbg("labels init")
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("nid"))
        .agg(min("label").as("nlabel"))
      val prop = labels
        .join(neighborMin, labels("id") === col("nid"), "left")
        .select(col("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
      // pointer jumping: resolve each node's propagated label through
      // the propagated label of that label-node, contracting chains
      // exponentially (labels are monotone-decreasing node ids within
      // the component, so the composition stays in-component)
      val jump = prop.select(col("id").as("j_id"), col("label").as("j_label"))
      val next = prop.as("p")
        .join(jump, col("p.label") === col("j_id"), "left")
        .select(col("p.id"), col("p.old_label"),
          least(col("p.label"), coalesce(col("j_label"), col("p.label"))).as("label"))
        .localCheckpoint(true)
      // convergence count is a scan of the materialized round, not
      // another shuffle join against prior state
      changed = next.filter(col("label") =!= col("old_label")).count()
      labels = next.select("id", "label")
      iter += 1
      dbg(s"round $iter changed=$changed")
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"($changed labels still changing); raise maxIter")
    // re-materialize the small final state, then free every intermediate
    // checkpoint block (they'd otherwise occupy the block manager for
    // the rest of the session)
    val result = labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .localCheckpoint(true)
    val sc = spark.sparkContext
    val ids = sc.getPersistentRDDs.keySet -- before
    val keep = if (ids.nonEmpty) ids.max else -1
    sc.getPersistentRDDs.foreach { case (id, rdd) =>
      if (ids.contains(id) && id != keep) rdd.unpersist(false)
    }
    result
  }

  /** End-to-end corpus dedup: resolve near-dup pairs to clusters, keep
    * one canonical doc (min id) per cluster, pass uniques through. The
    * composite a training-data pipeline actually calls: pairs → CC →
    * anti-join of non-keepers against the corpus (one broadcast-able
    * small side: non-keepers ≈ dup count, not corpus size). */
  def applyDedup(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val nonKeepers = connectedComponents(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("_drop_id"))
    docs.join(nonKeepers, docs(idCol) === col("_drop_id"), "left_anti")
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
    // band id and 16-bit slice packed into ONE long key (idx<<16 | val):
    // a single-column equi join hashes/compares half the key bytes
    val banded = sh.withColumn("band_val", explode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sim"), b * 16).bitwiseAND(lit(0xFFFFL))
          + lit(b.toLong << 16)): _*)))
      .select(col("id"), col("band_val"))
    // ids-only band join (exchange reused across both sides), then one
    // join back to the small (id, sim) table for the Hamming check
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band_val") === col("b.band_val")
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
