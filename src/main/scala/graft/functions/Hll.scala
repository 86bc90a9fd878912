package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The HyperLogLog register kernel (Flajolet et al. 2007) shared by the
  * batch `q_hll` query and the streaming `hllStream` face — ONE
  * definition of hash → (register index, rank) and of the register →
  * estimate fold, so stream and batch provably sketch identically (the
  * register merge is an element-wise max: order-free, which is exactly
  * why the sketch streams). 2^8 = 256 registers, σ ≈ 1.04/√256 ≈ 6.5%.
  *
  * Determinism: the hash is the portable u32 md5-prefix (`conv` ↔
  * DuckDB `CAST('0x'||… AS BIGINT)`), the rank a 24-step integer
  * comparison ladder (no float log2), the indicator sum the INTEGER
  * Σ 2^(25−M_j) with one float division at the end. */
object Hll {

  val Registers = 256L

  /** u32 of the first 8 md5 hex chars — the portable hash. */
  private[graft] def u32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** Per-row (idx, rk) register update for a key column. */
  def idxRank(key: Column): (Column, Column) = {
    val hv = u32(concat(lit("hll:"), key.cast("string")))
    val idx = pmod(hv, lit(Registers))
    val wv = shiftright(hv, 8) // == hv div 256 on the non-negative u32
    val rk = (1 to 24).foldRight(lit(25): Column)((r, rest) =>
      when(wv >= (1L << (24 - r)), lit(r)).otherwise(rest))
    (idx, rk)
  }

  /** Fold a (…, idx, mr) register table grouped by `by` into the HLL
    * estimate with the Flajolet small-range (linear-counting)
    * correction: one row per group with `n_est`. */
  def estimate(regs: DataFrame, by: Seq[String]): DataFrame = {
    val est = regs.groupBy(by.map(col): _*)
      .agg(sum(expr("shiftleft(cast(1 as bigint), 25 - mr)")).as("sp"),
        count(lit(1)).as("np"))
      .select(by.map(col) :+
        (col("sp") + (lit(Registers) - col("np")) * lit(1L << 25)).as("si") :+
        (lit(Registers) - col("np")).as("v"): _*)
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))
    val eraw = alpha * lit(65536.0) * lit(33554432.0) / col("si").cast("double")
    val e = when(eraw <= lit(640.0) && col("v") > 0,
      lit(256.0) * log(lit(256.0) / col("v").cast("double"))).otherwise(eraw)
    est.select(by.map(col) :+ round(e, 2).as("n_est"): _*)
  }
}
