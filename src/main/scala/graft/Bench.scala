package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.registerFunctions(spark)
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM / codegen / parquet-footer paths so the first timed
    // query isn't charged session startup
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => }
    // optional comma-separated subset for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.contains(name))
    }
    // a failing query must be LOUD in the artifact — a swallowed throw
    // would record a near-zero time and read as "fast and fine"
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Either[String, Double] = {
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // sweep any blocks a query left behind (kept checkpoints, caches)
      // so the block manager stays empty across the full run —
      // earlier queries must not degrade later ones via memory pressure
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      err.toLeft(dt)
    }
    // best of two passes per query: this box shows multi-minute
    // contention windows (observed 5-30x inflation on whatever ran
    // during one); a window can straddle one pass but not both, so the
    // min is the machine's real throughput, not the window's. When the
    // two passes disagree >3x a tie-break third pass runs — and every
    // per-pass time is published in the JSON ("passes") so a contention
    // window is self-evident from the artifact, no re-run needed.
    val pass1 = selected.map { case (name, fn) => name -> timeOnce(fn) }
    val passes = selected.map { case (name, fn) =>
      pass1(name) match {
        case Left(e) => name -> Left(e)
        case Right(t1) =>
          timeOnce(fn) match {
            case Left(e) => name -> Left(e)
            case Right(t2) =>
              val p = List(t1, t2)
              val disputed = p.max > 3 * p.min && p.max - p.min > 0.5
              if (!disputed) name -> Right(p)
              else timeOnce(fn) match {
                case Left(e) => name -> Left(e)
                case Right(t3) => name -> Right(p :+ t3)
              }
          }
      }
    }
    val results = passes.collect { case (name, Right(p)) => name -> p.min }
    val errors = passes.collect { case (name, Left(e)) => name -> e }
    def jstr(s: String) = "\"" + s.replaceAll("[\"\\\\\\n\\r\\t]", " ") + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val ps = passes.collect { case (k, Right(p)) =>
      jstr(k) + ":" + p.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val es = errors.map { case (k, e) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$ps,"errors":$es,"n_queries":${results.size},"n_errors":${errors.size},"sf":"$sfDir"}"""
    println(line)
    // the driver's stdout capture truncates long tails — ALSO persist
    // the full JSON where the repo snapshot keeps it durable
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
        line.getBytes("UTF-8"))
    } catch { case _: java.io.IOException => () }
    if (errors.nonEmpty) {
      // stderr, not an exit code: the driver must still snapshot the
      // JSON artifact (which carries the same per-query error markers)
      System.err.println(s"BENCH ERRORS (${errors.size}): " +
        errors.map { case (k, e) => s"$k -> $e" }.mkString("; "))
    }
    spark.stop()
  }
}
