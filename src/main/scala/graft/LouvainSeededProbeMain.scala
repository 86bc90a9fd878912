package graft

/** Dev measurement main (not part of the driver contract): split
  * `q_louvain_incr`'s cost into its two production phases on a given
  * sf dir — the NIGHTLY offline fit (louvainMembership on the corpus
  * graph, persisted to parquet) and the DAILY seeded update
  * (louvainIncrSeeded reading that parquet back and paying only the
  * seeded sweeps over the merged graph). The self-contained oracle
  * face replays both phases in-query; this main measures what a real
  * deployment pays per day once the membership is state, not
  * recomputation.
  *
  *   SPARK_GRAFT_CPUS=32 sbt -batch \
  *     "runMain graft.LouvainSeededProbeMain /tmp/sfx /tmp/louvain_m"
  *
  * Prints one JSON line: fit seconds (one pass — the nightly job),
  * seeded seconds (min of two passes — Bench's warm-up discipline),
  * and the seeded rows' agreement with the in-query face is implied
  * by GraphPackSpec's round-trip equivalence gate. */
object LouvainSeededProbeMain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, memDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.registerFunctions(spark)
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    val gp = graft.queries.GraphPack
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    // nightly: fit the corpus graph, persist (node, community)
    val old = gp.copurchaseEdgesW(spark, sfDir, minSupport = 2,
      orderFilter = col("o") % 8 =!= 0)
    val (tFit, _) = timed {
      val (m, _, _, _) = gp.louvainMembership(old,
        gp.LouvainIncrOldRounds,
        graft.operators.CheckpointStrategy.Local, refine = false)
      m.write.mode("overwrite").parquet(memDir)
    }
    // daily: read the persisted membership, pay only the seeded sweeps
    val full = gp.copurchaseEdgesW(spark, sfDir, minSupport = 2)
    def daily(): Long = {
      val n = gp.louvainIncrSeeded(spark.read.parquet(memDir), full)
        .collect().length.toLong
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      n
    }
    val (t1, n1) = timed(daily())
    val (t2, n2) = timed(daily())
    require(n1 == n2 && n1 > 0, s"seeded readout unstable: $n1 vs $n2")
    val tSeed = math.min(t1, t2)
    println(f"""{"fit_sec":$tFit%.2f,"seeded_sec":$tSeed%.2f,""" +
      f""""seeded_passes":[$t1%.2f,$t2%.2f],"rows":$n1,"sf":"$sfDir"}""")
    spark.stop()
  }
}
