package graft.operators

import org.apache.spark.sql.DataFrame

/** Where iterative loops park per-round state (SURVEY.md §3).
  *
  * Every iterative operator here (pagerank, min-label CC, BPE training)
  * re-materializes a small state table each round to truncate lineage —
  * without it the unrolled logical plan grows until analyzer/codegen
  * cost dominates (measured 48.8 s cold at 3 unrolled pagerank rounds).
  * HOW that state is materialized is an availability decision, not a
  * semantics one, so it is a strategy seam:
  *
  *  - [[CheckpointStrategy.Local]] — `localCheckpoint`: blocks live in
  *    executor memory/disk via the block manager. Fastest, but a LOST
  *    EXECUTOR loses blocks whose lineage was truncated → the job
  *    fails and restarts from scratch. The right default on a stable
  *    cluster or local mode.
  *  - [[CheckpointStrategy.Reliable]] — `checkpoint` to a reliable
  *    directory (HDFS/object store at cluster scale): rounds survive
  *    executor loss; a re-scheduled task re-reads the checkpoint files.
  *    Costs a write+read of the state table per round — state here is
  *    node/vocab-sized, never edge/corpus-sized, so the premium is
  *    bounded. The production variant for long iterative jobs.
  *
  * Both paths materialize eagerly and both CAPTURE the physical layout
  * the same way (the resulting LogicalRDD reports the executed plan's
  * partitioning), so the captured-layout discipline — capture with AQE
  * off, every round participant or none — is strategy-independent;
  * CheckpointStrategySpec proves layout capture and result equality on
  * both paths. */
sealed trait CheckpointStrategy {
  /** Eagerly materialize `df`, truncating lineage and preserving its
    * physical partitioning for consumers. */
  def apply(df: DataFrame): DataFrame
}

object CheckpointStrategy {

  /** Executor-memory materialization (`localCheckpoint(eager)`).
    * Carried-forward stats estimates are capped at the seam
    * ([[org.apache.spark.sql.graftbridge.StatsBridge]]) so iterated
    * self-joins of checkpointed state cannot compound them
    * double-exponentially (SPARK-39834 copies origin stats onto the
    * checkpoint; pointer-jump loops then square sizeInBytes per round
    * until BigInteger overflows inside the planner). */
  case object Local extends CheckpointStrategy {
    def apply(df: DataFrame): DataFrame =
      org.apache.spark.sql.graftbridge.StatsBridge
        .capCheckpointStats(df.localCheckpoint(true))
  }

  /** Reliable-storage materialization (`checkpoint(eager)` under
    * `dir`). The session's checkpoint dir is set once; passing a
    * different dir to a session that already checkpoints elsewhere is
    * a configuration error and fails loudly rather than silently
    * writing rounds into two places. */
  final case class Reliable(dir: String) extends CheckpointStrategy {
    def apply(df: DataFrame): DataFrame = {
      val sc = df.sparkSession.sparkContext
      // setCheckpointDir stores a FS-qualified URI with a random
      // subdirectory per context — compare against the qualified parent
      val p = new org.apache.hadoop.fs.Path(dir)
      val qualified =
        p.getFileSystem(sc.hadoopConfiguration).makeQualified(p).toString
      sc.getCheckpointDir match {
        case Some(existing) if existing.startsWith(qualified) => ()
        case Some(existing) =>
          throw new IllegalStateException(
            s"session already checkpoints to $existing; refusing $dir")
        case None => sc.setCheckpointDir(dir)
      }
      org.apache.spark.sql.graftbridge.StatsBridge
        .capCheckpointStats(df.checkpoint(true))
    }
  }
}
