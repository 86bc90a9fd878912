package graft

import org.apache.spark.sql.SparkSession
import graft.operators.CheckpointStrategy

/** Dev measurement main (not part of the driver contract): time the
  * iterative operators under Local vs Reliable checkpointing on a
  * given sf dir — the number the production executor-loss story needs
  * (SURVEY §3: Reliable pays a node/vocab-sized state write+read per
  * round; this main measures that premium instead of asserting it).
  *
  *   SPARK_GRAFT_CPUS=32 sbt -batch \
  *     "runMain graft.SoakMain /tmp/sfx /tmp/soak_ckpt"
  *
  * Prints one JSON line: per key, seconds under each strategy and the
  * reliable/local ratio. Results are also correctness-checked: both
  * strategies must return identical rows (CheckpointStrategySpec
  * proves it at gate scale; this re-proves it at probe scale). */
object SoakMain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, ckptDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.registerFunctions(spark)
    spark.sparkContext.setLogLevel("WARN")
    val reliable = CheckpointStrategy.Reliable(ckptDir)
    val plans: Seq[(String, CheckpointStrategy => org.apache.spark.sql.DataFrame)] = Seq(
      "q_pagerank_iter" -> (st =>
        graft.queries.AnalyticsPack.pagerankPlan(spark, sfDir, 8, st)),
      "text_bpe_train" -> (st =>
        graft.queries.TextPack.bpeTrain(spark, sfDir, ckpt = st)),
      "text_textrank" -> (st =>
        graft.queries.TextPack.textrankFrom(
          Tables.documents(spark, sfDir).withColumn("w",
            org.apache.spark.sql.functions.split(
              org.apache.spark.sql.functions.col("text"), "\\s+")),
          ckpt = st))
    )
    def run(fn: CheckpointStrategy => org.apache.spark.sql.DataFrame,
        st: CheckpointStrategy): (Double, Set[String]) = {
      val t0 = System.nanoTime()
      val rows = fn(st).collect().map(_.toString).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      (dt, rows)
    }
    val out = plans.map { case (name, fn) =>
      // min of two interleaved passes per strategy — the first pass of
      // anything is charged JVM/codegen warm-up ([[Bench]]'s
      // min-of-passes discipline)
      val (tl1, rl) = run(fn, CheckpointStrategy.Local)
      val (tr1, rr) = run(fn, reliable)
      val (tl2, _) = run(fn, CheckpointStrategy.Local)
      val (tr2, _) = run(fn, reliable)
      require(rl == rr, s"$name: strategies disagree on rows")
      val (tl, tr) = (math.min(tl1, tl2), math.min(tr1, tr2))
      f""""$name":{"local":$tl%.2f,"reliable":$tr%.2f,"ratio":${tr / tl}%.2f}"""
    }
    println(s"{${out.mkString(",")}}")
    spark.stop()
  }
}
