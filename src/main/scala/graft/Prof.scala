package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-job profiler for a single query key: runs
  * `SparkEntry.queries(key)` twice (pass 1 pays codegen/JIT warmup)
  * and prints every job over 300 ms with its stage/task shape — the
  * tool that localized q_mst's cost to AQE-off task floors rather
  * than job count. Usage:
  * {{{ sbt "runMain graft.Prof q_mst /root/testdata/sf0.1" }}} */
object Prof {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("q_mst")
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.registerFunctions(spark)
    spark.sparkContext.setLogLevel("WARN")
    val starts = collection.concurrent.TrieMap.empty[Int, Long]
    val descs = collection.concurrent.TrieMap.empty[Int, String]
    var jobs = 0
    var jobMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts(j.jobId) = System.nanoTime()
        val names = j.stageInfos.map(_.name.takeWhile(_ != '\n'))
          .distinct.take(3).mkString(" | ")
        descs(j.jobId) = (s"[${j.stageInfos.size} stages, " +
          s"${j.stageInfos.map(_.numTasks).sum} tasks] $names").take(160)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        jobs += 1
        val dt = (System.nanoTime() -
          starts.getOrElse(j.jobId, System.nanoTime())) / 1000000
        jobMs += dt
        if (dt > 300)
          println(s"  JOB ${j.jobId}: $dt ms :: ${descs.getOrElse(j.jobId, "?")}")
      }
    })
    // warm the parquet-footer / codegen paths like Bench does
    SparkEntry.queries("q1_agg")(spark, d).count()
    for (pass <- 1 to 2) {
      jobs = 0; jobMs = 0
      val t0 = System.nanoTime()
      SparkEntry.queries(key)(spark, d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PASS $pass ($key): $dt%.2f s, $jobs jobs, ${jobMs / 1000.0}%.2f s in jobs")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
