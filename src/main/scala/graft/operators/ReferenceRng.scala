package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Arithmetic-exact port of the reference's centroid-init RNG
  * (random_num_generator.hpp:5-28): `std::default_random_engine`
  * (libstdc++'s minstd_rand0 — the Lehmer/"minimal standard" LCG,
  * x' = 16807·x mod (2³¹−1), Park & Miller, CACM 1988) drawn through
  * `std::uniform_int_distribution<int>(0, max)` (libstdc++'s
  * reject-and-downscale algorithm). Both algorithms are published —
  * the ISO C++ standard pins minstd_rand0's parameters, and the
  * downscale loop is the standard unbiased range-reduction — so the
  * port reproduces the reference's draw stream bit-exactly for any
  * seed (pinned against compiled libstdc++ vectors in
  * KMeansMainSpec).
  *
  * The reference seeds from the wall clock at process start
  * (random_num_generator.hpp:18), so its own runs are unreproducible;
  * the port takes the seed explicitly, which is what makes an exact
  * init-parity spec possible at all.
  */
final class ReferenceRng(seed: Long) {
  private val Mod = 2147483647L // 2^31 - 1
  private val Mult = 16807L
  // minstd_rand0 seeding: seed mod m, with 0 promoted to 1 (the LCG
  // has no zero state)
  private var state: Long = {
    val s = java.lang.Long.remainderUnsigned(seed, Mod)
    if (s == 0L) 1L else s
  }

  /** One raw engine draw in [1, 2^31-2]. */
  def nextRaw(): Long = {
    state = (state * Mult) % Mod
    state
  }

  /** `uniform_int_distribution<int>(0, max)` over this engine —
    * libstdc++'s downscale path (engine range ≫ target range):
    * scaling = floor(urngRange / range), reject draws ≥ range·scaling,
    * divide the rest. Unbiased, and bit-compatible with what the
    * reference's `distribution(generator)` returns. NOTE the
    * reference passes max = NUM_INPUT with an INCLUSIVE upper bound
    * (random_num_generator.hpp:18, config.cuh NUM_INPUT=10000), so
    * index NUM_INPUT itself can be drawn — an off-by-one that reads
    * one past the input array in the original. Callers clamp. */
  def nextInt(max: Int): Int = {
    val range = max.toLong + 1L
    val urngRange = Mod - 2L // max (2^31-2) - min (1)
    val scaling = urngRange / range
    val past = range * scaling
    var r = nextRaw() - 1L // shift to [0, urngRange]
    while (r >= past) r = nextRaw() - 1L
    (r / scaling).toInt
  }
}

object ReferenceRng {

  /** The reference's `initialize_centroids`
    * (kmeans_with_mapreduce-cuda.cu:12-19): k draws from
    * uniform_int(0, n) pick input points BY FILE POSITION as the
    * initial centroids, in draw order (slot i = centroid cid i). The
    * inclusive-bound draw n is clamped to n-1 (in the original it
    * reads past the array — unreproducible garbage). `PointsSource`
    * ids are monotone in file order but not contiguous, so positions
    * are id-ranks — computed by a RANGE-partitioned sort plus
    * `zipWithIndex` (per-partition offsets from one count job), never
    * a global row_number window, which ranks the whole point set on a
    * single reducer; then a k-row collect. Duplicate draws are kept,
    * exactly as the reference does. */
  def seededInit(points: DataFrame, k: Int, n: Int, seed: Long): Seq[KMeansDF.Centroid] = {
    val rng = new ReferenceRng(seed)
    val idx = Seq.fill(k)(math.min(rng.nextInt(n), n - 1).toLong)
    val target = idx.toSet
    val byPos = points.select(col("id"), col("x"), col("y"))
      .orderBy("id").rdd.zipWithIndex()
      .filter { case (_, pos) => target.contains(pos) }
      .map { case (row, pos) =>
        pos -> (row.getDouble(1), row.getDouble(2)) }
      .collect().toMap
    idx.zipWithIndex.map { case (pos, slot) =>
      val (x, y) = byPos(pos)
      KMeansDF.Centroid(slot, x, y)
    }
  }
}
