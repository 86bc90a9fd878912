package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling (SURVEY.md §2). One draw
  * definition shared by the mixture/cap samplers so every engine-side
  * plan and every DuckDB oracle agree on the selection semantic:
  * within each stratum, members are ranked by
  * (md5(id), id) — a seedless, engine- and partitioning-stable random
  * order — and the top `target` survive.
  *
  * Scale shape: the rank window never sorts a full stratum. A
  * hash-PREFIX filter (threshold ≈ (2·target+64)/cnt of the 32-bit md5
  * prefix — a scan-only Bernoulli cut) reduces the window input to
  * ~2×target rows per stratum first. The filter keeps a prefix of the
  * md5 sort order (every kept prefix value < every dropped one), so
  * the top-target rows are identical to the unfiltered rank as long as
  * ≥ target rows survive — enforced in-plan by a raise_error guard
  * (loud failure, never a silent undersample). */
object Sampling {

  /** Prefix-cut fraction for a stratum of `cnt` rows targeting
    * `target` survivors: ~2×target expected survivors plus a 64-row
    * floor so tiny strata never underflow. */
  def prefixCut(target: Column, cnt: Column): Column =
    least(lit(1.0), (target * 2 + 64).cast("double") / cnt)

  /** Top-`target` rows per stratum by md5-hash rank. `strata` must
    * carry (`strataCol`, `target`, `cut`) — one row per stratum value
    * (broadcast). Returns `docs`' columns for the selected rows. */
  def stratifiedHashDraw(docs: DataFrame, strataCol: String, idCol: String,
      strata: DataFrame, errTag: String): DataFrame = {
    val internal = Seq("md5h", "hv", "rk", "n_surv", "eff_target",
      "target", "cut")
    val clash = docs.columns.toSeq.intersect(internal)
    require(clash.isEmpty,
      s"stratifiedHashDraw reserves columns ${internal.mkString(", ")}; " +
        s"rename ${clash.mkString(", ")} on the input first")
    val outCols = docs.columns.toIndexedSeq
    val h = md5(col(idCol).cast("string").cast("binary"))
    val pre = docs
      .withColumn("md5h", h)
      .withColumn("hv", conv(substring(col("md5h"), 1, 8), 16, 10).cast("long"))
      .join(broadcast(strata), Seq(strataCol))
      .filter(col("hv") < col("cut") * lit(4294967296.0)) // 2^32: prefix cut
    val w = Window.partitionBy(strataCol).orderBy(col("md5h").asc, col(idCol).asc)
    pre.withColumn("rk", row_number().over(w))
      .withColumn("n_surv", count(lit(1)).over(Window.partitionBy(strataCol)))
      .withColumn("eff_target", col("target") +
        when(col("n_surv") < col("target"),
          raise_error(concat(lit(s"$errTag: prefilter underflow in stratum "),
            col(strataCol).cast("string"))))
          .otherwise(lit(0L)))
      .filter(col("rk") <= col("eff_target"))
      .select(outCols.map(col): _*)
  }
}
