package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The fixed-register histogram-quantile kernel shared by the batch
  * `q_quantile_sketch` query and the streaming `qsketchStream` face —
  * ONE definition of value → register index, so stream and batch
  * provably bucket identically (the register merge is an element-wise
  * ADD: order-free, which is exactly why the sketch streams; the
  * batch mergeability spec proves sketch(A) ⊎ sketch(B) ≡
  * sketch(A∪B) against a shared frame).
  *
  * The frame (lo, hi) is the sketch's FIXED domain: the batch audit
  * derives it from a min/max pass, a stream receives it up front
  * (yesterday's frame, a config, a monitoring range — the mergeable-
  * against-shared-frame contract). Values outside the frame CLAMP to
  * the edge registers — a no-op when the frame is the true min/max,
  * which keeps the batch oracle hashes unchanged, and the documented
  * out-of-range behavior on a stream. All integer arithmetic
  * (truncating `div` ≡ DuckDB `//` on the non-negative
  * (vq−lo)·B operand); (hi−lo)·B must fit a Long, bounding the frame
  * span below 2⁵⁷ centi-units — wider domains take the documented
  * DECIMAL(38,0) swap. */
object QSketch {

  /** Register count per group/window. */
  val B = 64

  /** Register index of a `vq` column under frame columns `lo`/`hi` —
    * the one bucket rule. Inputs must be named exactly (vq, lo, hi)
    * in scope (the kernel is an expression over those names, the
    * shared-SQL-text discipline the oracles replay). */
  def bucket: Column =
    expr(s"least(${B - 1}, greatest(0, " +
      s"((vq - lo) * $B) div (hi - lo + 1)))")
}
