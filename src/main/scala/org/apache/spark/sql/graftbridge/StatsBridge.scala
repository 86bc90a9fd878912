package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Bounds the estimated statistics a checkpoint carries forward.
  *
  * Since SPARK-39834, `Dataset.checkpoint`/`localCheckpoint` copy the
  * ORIGIN plan's estimated `Statistics` onto the resulting
  * [[LogicalRDD]]. For an iterative operator that self-joins its own
  * checkpointed state each round (pointer jumping, transitive
  * closure), the size-only estimator then SQUARES `sizeInBytes` per
  * round — the estimate grows double-exponentially (2^(63·2^rounds))
  * until BigInteger arithmetic first dominates planning time and then
  * throws `BigInteger would overflow supported range` (observed in
  * Borůvka MST's jump loop after ~30 compounded self-joins: the spec
  * died inside Catalyst's stats visitor, not in any job).
  *
  * The fix is at the materialization seam: a checkpoint is a REAL
  * table, so no estimate above `Long.MaxValue` carries information —
  * cap `sizeInBytes`/`rowCount` there and the per-round product is
  * bounded forever (each round multiplies a few ≤ 2^63 leaves; the
  * next checkpoint caps it back). Values at or below the cap pass
  * through UNTOUCHED, so join-strategy choices for every sanely-sized
  * plan are byte-identical with and without this wrapper; constraints
  * and the captured output partitioning/ordering are preserved. */
object StatsBridge {

  private val Cap = BigInt(Long.MaxValue)

  /** If `df` is checkpoint-shaped (a bare [[LogicalRDD]]) and carries
    * stats beyond [[Cap]], rewrap the same RDD/partitioning/ordering
    * with the stats capped; otherwise return `df` unchanged. */
  def capCheckpointStats(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val s = l.stats
        if (s.sizeInBytes <= Cap && s.rowCount.forall(_ <= Cap)) df
        else {
          val capped = Statistics(
            sizeInBytes = s.sizeInBytes.min(Cap),
            rowCount = s.rowCount.map(_.min(Cap)))
          val session = df.sparkSession.asInstanceOf[SparkSession]
          Dataset.ofRows(session,
            l.copy()(session, Some(capped), Some(l.constraints)))
        }
      case _ => df
    }
}
