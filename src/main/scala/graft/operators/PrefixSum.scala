package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed cumulative sums — the scale-safe replacement for a
  * `Window.orderBy(...)` running total, which plans a SINGLE-partition
  * WindowExec (every row through one reducer; fine at readout sizes,
  * unbounded at corpus sizes — text_vocab_growth's bucket table grows
  * as docs/100, a many-million-row single partition at 100 TB).
  *
  * Two passes over a range-partitioned within-partition sort (the
  * 8fa10e4 seed-rank idiom generalized):
  *   1. per-partition column totals — one bounded collect, rows =
  *      shuffle partitions — folded into per-partition OFFSETS;
  *   2. per-row running sums + the partition's offset.
  * The sorted frame is locally checkpointed first so both passes see
  * the SAME range boundaries (RangePartitioner samples its input).
  * Values are identical to the global window: integer addition is
  * associative and range partitioning + within-partition sort give
  * the same total order. Ties in `orderCol` are safe for the same
  * reason they are safe under the global window — all orderings of a
  * tie group yield the same PER-GROUP running totals only at group
  * boundaries, so callers must aggregate to distinct `orderCol` rows
  * first (text_vocab_growth's bucket table is distinct by
  * construction; a require guards the contract). */
object PrefixSum {
  /** Cumulative sums of `valueCols` (non-null LONG columns) in
    * `orderCol` order; output keeps the same column names, now
    * holding running totals. `df` must be distinct on `orderCol`. */
  def cumulative(df: DataFrame, orderCol: String,
      valueCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val st = df.select((orderCol +: valueCols).map(col): _*)
      .repartitionByRange(col(orderCol))
      .sortWithinPartitions(orderCol)
      .localCheckpoint(true)
    val n = valueCols.size
    val totals = st.rdd.mapPartitionsWithIndex { (i, it) =>
      val sums = new Array[Long](n)
      var dup = false
      var prev: Any = null
      var first = true
      it.foreach { r =>
        if (!first && r.get(0) == prev) dup = true
        prev = r.get(0); first = false
        var j = 0
        while (j < n) { sums(j) += r.getLong(j + 1); j += 1 }
      }
      Iterator.single((i, sums, dup))
    }.collect()
    require(!totals.exists(_._3),
      s"PrefixSum.cumulative requires distinct '$orderCol' rows")
    val byPart = totals.map(t => t._1 -> t._2).toMap
    val nparts = st.rdd.getNumPartitions
    val offsets = Array.fill(nparts)(new Array[Long](n))
    var run = new Array[Long](n)
    for (i <- 0 until nparts) {
      offsets(i) = run
      val t = byPart.getOrElse(i, new Array[Long](n))
      run = run.zip(t).map { case (a, b) => a + b }
    }
    val out = st.rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = offsets(i).clone()
      it.map { r =>
        var j = 0
        while (j < n) { acc(j) += r.getLong(j + 1); j += 1 }
        Row.fromSeq(r.get(0) +: acc.toVector)
      }
    }
    spark.createDataFrame(out, st.schema)
  }
}
