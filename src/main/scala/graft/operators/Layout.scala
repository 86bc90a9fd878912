package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional file skipping.
  *
  * Z-ordering (Morton order) interleaves the bits of several columns so
  * that a RANGE of the combined key is a small BOX in every dimension —
  * the property min/max file statistics need for a scan to skip files
  * on filters over ANY of the interleaved columns, not just the leading
  * sort key. At cluster scale the write path is
  * `repartitionByRange(n, zCol)` + `sortWithinPartitions(zCol)` (one
  * range exchange, the same shape as any sorted write); this helper
  * builds the key itself. Reference workloads scan by both part and
  * supplier (ref: src/main.cu:214-233 iterates the full point table per
  * centroid pass — the no-skipping worst case this layout exists to
  * avoid).
  */
object Layout {

  /** 32-bit Morton key from two NON-NEGATIVE columns pre-normalized to
    * [0, 65535]. Pure shift/mask arithmetic — codegen-friendly, no UDF,
    * and bit-identical to the unrolled SQL twin in the DuckDB oracle. */
  def zorder16(xn: Column, yn: Column): Column =
    (0 until 16).map { i =>
      (shiftright(xn, i) % 2) * lit(1L << (2 * i)) +
        (shiftright(yn, i) % 2) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** Scale a non-negative long column onto the 16-bit grid [0, 65535]
    * given its (inclusive) max — integer arithmetic only (`div`), so
    * every engine lands each value in the same cell. Takes column
    * NAMES because the whole expression must stay in the integral
    * domain (a Column `/` would promote to double). */
  def grid16(x: String, xMax: String): Column =
    expr(s"(cast($x AS BIGINT) * 65536) div (cast($xMax AS BIGINT) + 1)")
}
