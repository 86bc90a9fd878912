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

  /** Deterministic (a, b) permutation parameters. Bounded to 2^30 so
    * a*h31+b stays < 2^62 (no ANSI long overflow on executors). */
  private val perms: Seq[(Long, Long)] = {
    var s = 0x9E3779B97F4A7C15L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 34 }
    (0 until NumHashes).map(_ => (next() | 1L, next()))
  }

  /** 128-wide MinHash signature over 3-gram shingles: one xxhash64 per
    * shingle, then 128 linear permutations folded in a single
    * `aggregate` pass (no 128 re-hashes). */
  def minhashSignature(ws: Column): Column = {
    val params = array(perms.map { case (a, b) =>
      struct(lit(a).as("a"), lit(b).as("b"))
    }: _*)
    // mask shingle hashes to 31 bits: 2^30-bounded params keep the
    // linear permutation inside long range under ANSI arithmetic
    val hashes = transform(triShingles(ws), s =>
      xxhash64(s).bitwiseAND(lit(0x7FFFFFFFL)))
    aggregate(hashes,
      array_repeat(lit(Long.MaxValue), NumHashes),
      (acc, h) => zip_with(acc, params, (m, p) =>
        least(m, p.getField("a") * h + p.getField("b"))))
  }

  /** (band_idx, band_val) rows — the LSH blocking key. */
  def lshBands(sig: Column): Column = {
    val rows = NumHashes / Bands
    transform(sequence(lit(0), lit(Bands - 1)), b =>
      struct(b.as("band_idx"),
        xxhash64(concat_ws("_",
          transform(slice(sig, lit(b * rows + 1), lit(rows)), _.cast("string")))).as("band_val")))
  }

  /** Candidate pairs (id_a < id_b) whose MinHash signatures collide in
    * ≥1 band, with exact word-set Jaccard verification ≥ `threshold`. */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val withBands = docs
      .select(col(idCol).as("id"), words(col(textCol)).as("w"))
      .filter(size(col("w")) >= 3)
      .withColumn("band", explode(lshBands(minhashSignature(col("w")))))
      .select(col("id"), col("w"), col("band.band_idx"), col("band.band_val"))
    val cand = withBands.as("a")
      .join(withBands.as("b"),
        col("a.band_idx") === col("b.band_idx")
          && col("a.band_val") === col("b.band_val")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.w").as("wa"), col("b.w").as("wb"))
      .dropDuplicates("id_a", "id_b")
    cand.withColumn("jaccard", round(wordJaccard(col("wa"), col("wb")), 4))
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

  // ---- SimHash -------------------------------------------------------

  /** 64-bit SimHash over word hashes: per-bit ±1 votes, sign → bit.
    * Bit loop unrolled in Scala (shift amounts must be literals in the
    * Column API); the whole thing stays one codegen'd expression. */
  def simhash(ws: Column): Column = {
    val hashes = transform(ws, w => xxhash64(w))
    (0 until 64).map { i =>
      val vote = aggregate(hashes, lit(0), (acc, h) =>
        acc + when(shiftrightunsigned(h, i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

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
    banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx")
          && col("a.band_val") === col("b.band_val")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }
}
