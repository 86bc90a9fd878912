package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The k-minimum-values sketch kernel (Bar-Yossef et al. 2002) shared
  * by the batch `q_kmv` query and the streaming `kmvStream` face — ONE
  * definition of the key hash and of the minima → estimate fold, so
  * stream and batch provably sketch identically. The k-minima merge is
  * a set-union-then-take-k: order-free and idempotent, which is
  * exactly why the sketch streams (the same argument as Hll's register
  * max — re-delivered rows collapse into the distinct set).
  *
  * Determinism: the hash is the portable u32 md5-prefix (`conv` ↔
  * DuckDB `CAST('0x'||… AS BIGINT)`); the estimator is one integer
  * `div`. */
object Kmv {

  /** Sketch size: ±1/√k ≈ 12% at 64. */
  val K = 64

  /** u32 of `kmv:<key>` — the portable sketch hash. */
  def hash(key: Column): Column =
    conv(substring(md5(concat(lit("kmv:"), key.cast("string"))
      .cast("binary")), 1, 8), 16, 10).cast("long")

  /** D̂ = (k−1)·2³²/h₍ₖ₎, or the exact size when the sketch holds the
    * whole set — the Scala-side estimate for emitted minima arrays. */
  def estimate(minima: Seq[Long], k: Int = K): Long =
    if (minima.size < k) minima.size.toLong
    else (k - 1).toLong * 4294967296L / minima(k - 1)
}
