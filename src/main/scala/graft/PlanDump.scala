package graft

/** Dev tool for the optimization rounds: dump `.explain("formatted")`
  * for a comma-separated key list to `<outDir>/<key>_<tag>.txt` — the
  * plan evidence the judge checks against plan claims. Usage:
  * {{{ sbt "runMain graft.PlanDump before plans/r17 q1_agg,dedup_eval [sfDir]" }}} */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val outDir = args(1)
    val keys = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val d = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.registerFunctions(spark)
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${k}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] $k -> $outDir/${k}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
