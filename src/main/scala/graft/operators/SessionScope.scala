package graft.operators

import org.apache.spark.sql.SparkSession

/** Structural scoping for the AQE-off layout-capture discipline.
  *
  * The iterative graph/linkage loops park co-partitioned layouts by
  * checkpointing with AQE disabled (an AdaptiveSparkPlanExec reports
  * unknown partitioning at checkpoint time, so captures must run
  * static — ScaleOpsSpec proves capture + AQE-consumer reuse). Until
  * round 14 each loop toggled the SHARED session conf around its body
  * and restored it in a finally — correct sequentially, but a second
  * query planned concurrently on the same session could capture a
  * checkpoint with AQE re-enabled (losing its layout) or briefly lose
  * AQE on an unrelated plan.
  *
  * `withAqeOff` scopes the discipline structurally: the body runs
  * against a CLONED session (`newSession()` — same SparkContext,
  * same block manager and cache, PRIVATE SQLConf) with AQE off, so
  * nothing global ever mutates. Frames the body builds stay bound to
  * the clone, which also pins the discipline through the caller's
  * later actions on the returned frame. Function/temp-view registries
  * are per-session — bodies must build inputs from tables/paths and
  * Column expressions (every pack query does), not from the shared
  * session's registered names. */
object SessionScope {
  def withAqeOff[T](s: SparkSession)(body: SparkSession => T): T = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    body(s2)
  }

  /** A plain private clone — for loops that tune OTHER session-scoped
    * knobs (q_mst drops shuffle partitions to quarter parallelism for
    * its node-sized rounds) without touching the shared conf. */
  def cloned[T](s: SparkSession)(body: SparkSession => T): T =
    body(s.newSession())

  /** [[withAqeOff]] + quarter-parallelism shuffles on the clone — the
    * task-floor lever for AQE-off iterative loops whose shuffles carry
    * node-sized state or level slices (AQE would coalesce these tiny
    * exchanges at runtime; with capture forcing AQE off, the static
    * partition count must drop instead). Hash-neutral: partition count
    * never reaches any value. Measured round 16: q_betweenness 20.0 →
    * 12.4 s, q_hits 15.7 → 6.6 s warm at sf0.1/local[32]. */
  def withAqeOffQuarterNp[T](s: SparkSession)(body: SparkSession => T): T =
    withAqeOff(s) { s2 =>
      s2.conf.set("spark.sql.shuffle.partitions", math.max(1,
        s2.sparkContext.defaultParallelism / 4).toString)
      body(s2)
    }
}
