package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.SparkSession

/** Rebind a DataFrame to a sibling session of the same SparkContext.
  *
  * `SparkSession.newSession()` shares the context, the block manager
  * and the SharedState cache but carries a PRIVATE SQLConf — the
  * structural home for the layout-capture discipline (capture with AQE
  * off) that was previously enforced by toggling the SHARED session's
  * conf around iterative loops, which concurrent queries could race.
  * Kernels that receive an already-bound DataFrame rebind it here:
  * the input plans ONCE under its own session, and the resulting
  * internal-row RDD is re-exposed as a leaf in the clone, so every
  * frame derived from it — and every action a caller later runs on the
  * kernel's result — plans under the clone's conf. */
object SessionBridge {
  def rebind(df: DataFrame, to: org.apache.spark.sql.SparkSession): DataFrame = {
    val classic = to.asInstanceOf[SparkSession]
    classic.internalCreateDataFrame(df.queryExecution.toRdd, df.schema)
  }
}
