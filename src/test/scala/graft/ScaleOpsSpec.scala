package graft

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin
import graft.sources.Bucketing

/** Skew-salting and bucketing — the shuffle-discipline utilities. */
class ScaleOpsSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  test("saltedJoin returns exactly the plain join result") {
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = o.join(c, "o_custkey")
      .select("o_orderkey", "c_mktsegment").as[(Long, String)].collect().toSet
    val salted = SkewJoin.saltedJoin(o, c, "o_custkey", "o_orderkey", 7)
      .select("o_orderkey", "c_mktsegment").as[(Long, String)].collect().toSet
    assert(salted === plain)
  }

  test("saltedDistinct returns exactly the plain distinct counts") {
    val ev = Tables.events(spark, sfDir)
    val plain = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n_distinct"))
      .as[(String, Long)].collect().toSet
    val salted = graft.operators.SkewAgg
      .saltedDistinct(ev, Seq("event_type"), "user_id", salts = 16)
      .as[(String, Long)].collect().toSet
    assert(salted === plain)
  }

  test("saltedDistinct state is spread: first stage groups on (key, bucket)") {
    val p = graft.operators.SkewAgg
      .saltedDistinct(Tables.events(spark, sfDir), Seq("event_type"), "user_id", 16)
      .queryExecution.explainString(SimpleMode)
    assert(p.contains("pmod(xxhash64"),
      "value-bucket expression must reach the first aggregate's keys")
    assert(p.contains("partial_"), "both stages must combine map-side")
  }

  test("salts actually spread a hot key across partitions") {
    val hot = Seq.fill(1000)((1L, "x")).toDF("k", "v")
      .withColumn("row", monotonically_increasing_id())
    val salts = hot.select(pmod(xxhash64(col("row")), lit(8L))).distinct().count()
    assert(salts > 4, "a hot key must land on many salts")
  }

  test("AQE splits a skewed shuffle join at runtime — and where it " +
    "can't, the manual salt remains the tool (SURVEY §3 rule 5)") {
    // the 100 TB operator question: when does Spark 4's AQE skew-join
    // handle a hot key for free, and when is SkewJoin.saltedJoin still
    // required? Measured here on the same hot-key data: one key owning
    // ~100x the median partition volume, joined to a
    // small-but-not-broadcastable dim (broadcast disabled, as at scale
    // where the dim side exceeds the driver budget).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // toy volumes: scale the byte thresholds down so the same
      // factor-5 skew geometry that triggers at 256 MB triggers here
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pad = "x" * 64
      val hot = (1 to 60000).map(i => (1L, i.toLong, pad)) ++
        (1 to 100).flatMap(k => (1 to 50).map(i => (k.toLong + 1, i.toLong, pad)))
      val fact = hot.toDF("k", "row", "pad").repartition(8)
      val dim = (1 to 101).map(k => (k.toLong, s"d$k")).toDF("k", "dv")
      val joined = fact.join(dim, "k")
      // execute THIS queryExecution (count() would plan a separate
      // query and leave this one un-finalized under AQE)
      assert(joined.collect().length === hot.size)
      val finalPlan = joined.queryExecution.executedPlan.toString
      // AQE marks the split join and the skewed shuffle read in the
      // final adaptive plan
      assert(finalPlan.contains("skew=true") ||
        finalPlan.toLowerCase.contains("skewed"),
        s"AQE must split the hot partition, plan was:\n$finalPlan")
      // the salted join yields the identical result on the same data —
      // the fallback for when AQE cannot see the skew
      val plain = joined.select("row", "dv").as[(Long, String)].collect().toSet
      val salted = SkewJoin.saltedJoin(fact, dim, "k", "row", 8)
        .select("row", "dv").as[(Long, String)].collect().toSet
      assert(salted === plain)
      // WHERE AQE DOES NOT HELP, measured on the same data: a skewed
      // AGGREGATION. AQE skew handling only splits join partitions — a
      // hash aggregate's hot group still lands on one reducer, so the
      // final plan carries no skew-split marker and the two-stage salt
      // (SkewAgg.saltedDistinct) remains necessary. (The other
      // AQE-free zone is stateful streaming: micro-batch plans disable
      // AQE, so streaming joins keep the manual salt too.)
      val agg = fact.groupBy("k").agg(countDistinct("row").as("n"))
      assert(agg.collect().length === 101)
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("skew=true") &&
        !aggPlan.toLowerCase.contains("skewed"),
        "AQE has no skew split for aggregates — the salt earns its keep")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("a repartition-then-localCheckpoint side keeps its partitioning: " +
    "the iterative-join idiom shuffles only the changing side") {
    // q_pagerank's per-round contract: edges are repartitioned on the
    // join key ONCE before the checkpoint, so every iteration's join
    // reuses that layout and only the (changing) rank side crosses an
    // exchange — measured 13.8 s → 9.5 s on the 8-round variant
    // at-scale shape: nothing auto-broadcasts, the join must shuffle
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val edges = Tables.orders(spark, sfDir)
        .select(col("o_custkey").as("src"), col("o_orderkey").as("dst"))
        .repartition(col("src"))
        .localCheckpoint()
      val ranks = Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("node"), lit(1L).as("pr"))
      val joined = ranks.join(edges, ranks("node") === edges("src"))
      val p = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges === 1,
        s"only the rank side may shuffle — the checkpointed layout must be " +
          s"reused, saw $exchanges exchanges in:\n$p")
      // the partitioning survives into AQE-planned consumers too: the
      // capture had to happen with AQE off (AdaptiveSparkPlanExec
      // reports unknown partitioning at checkpoint time), but a join
      // planned WITH AQE reuses the captured layout
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      val p2 = ranks.join(edges, ranks("node") === edges("src"))
        .queryExecution.executedPlan.toString
      val ex2 = "Exchange hashpartitioning".r.findAllIn(p2).length
      assert(ex2 === 1,
        s"an AQE-planned join must also reuse the captured layout, " +
          s"saw $ex2 exchanges in:\n$p2")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("pagerank round shape: one exchange per round — the contribution " +
    "trickle; both equi-joins co-partitioned off checkpointed layouts") {
    import org.apache.spark.sql.functions.{concat, count, expr, sum}
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // the exact loop shapes of pagerankPlan, small input — tagged-long
      // node ids (k·2 / k·2+1), the round-11 narrow-key layout
      val e0 = Tables.orders(spark, sfDir)
        .select(col("o_custkey").cast("long").as("p"),
          (col("o_orderkey") % 10).cast("long").as("sk"))
        .distinct()
      val edges = e0.select(
          (col("p") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        .union(e0.select(
          (col("sk") * 2 + 1).as("src"), (col("p") * 2).as("dst")))
        .repartition(col("src"))
        .localCheckpoint()
      val deg = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      val state = deg.select(col("node"), col("deg"), lit(1000000000L).as("pr"))
        .localCheckpoint()
      val cin = state.join(edges, state("node") === edges("src"))
        .select(col("dst").as("node"), expr("pr div deg").as("c"))
        .groupBy("node").agg(sum("c").as("cin"))
      val round = deg.join(cin, "node")
        .select(col("node"), col("deg"),
          (lit(150000000L) + expr("(85 * cin) div 100")).as("pr"))
      val p = round.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(p).length
      assert(exchanges === 1,
        s"a pagerank round must shuffle ONLY the partial contribution " +
          s"sums — both joins are co-partitioned, saw $exchanges in:\n$p")
      // deg's captured layout must make the node-side join exchange-free:
      // the single exchange sits below the aggregate, not above it
      assert(p.contains("partial_sum"), "contributions must combine map-side")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("bucketed tables join without a shuffle") {
    // in-memory catalog forgets tables between JVMs; clear leftover files
    for (t <- Seq("b_orders", "b_lineitem")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    Bucketing.writeBucketed(
      Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice"),
      "b_orders", "o_orderkey")
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey")
    // disable auto-broadcast so the shuffle-join path is what's planned —
    // at real scale neither side broadcasts; bucketing must absorb it
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"scan must use buckets:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === Tables.lineitem(spark, sfDir).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("layout capture is scoped to a private session: concurrent " +
      "capturing queries never flip the shared conf, results intact") {
    // two AQE-off-capturing loops (pagerank's parked layout, reach's
    // frontier) run CONCURRENTLY on the shared session while a watcher
    // samples its AQE conf: with the round-12 structural scoping
    // (SessionScope clones) nothing global mutates — the retired
    // failure mode was a capture racing another query's restore
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    val seqPr = SparkEntry.queries("q_pagerank")(spark, sfDir)
      .collect().toSeq
    val seqRe = SparkEntry.queries("q_reach")(spark, sfDir)
      .collect().toSeq
    @volatile var flips = 0
    @volatile var stop = false
    val watcher = Future {
      while (!stop) {
        if (spark.conf.get("spark.sql.adaptive.enabled") != "true")
          flips += 1
        Thread.sleep(2)
      }
    }
    val fPr = Future(
      SparkEntry.queries("q_pagerank")(spark, sfDir).collect().toSeq)
    val fRe = Future(
      SparkEntry.queries("q_reach")(spark, sfDir).collect().toSeq)
    val (rPr, rRe) = (Await.result(fPr, 5.minutes),
      Await.result(fRe, 5.minutes))
    stop = true
    Await.result(watcher, 1.minute)
    assert(flips === 0, "the shared session's AQE conf must never flip")
    assert(rPr === seqPr && rRe === seqRe,
      "concurrent runs must equal the sequential baselines")
  }

  test("PrefixSum.cumulative equals the driver-side running total and " +
      "rejects duplicate order keys") {
    import graft.operators.PrefixSum
    // sparse, shuffled order keys across many partitions
    val rows = (0 until 5000).map(i =>
      ((i * 2654435761L) % 100000, (i % 97).toLong, (i % 13).toLong))
      .distinct.groupBy(_._1).map(_._2.head).toSeq
    val df = rows.toDF("b", "x", "y").repartition(16)
    val got = PrefixSum.cumulative(df, "b", Seq("x", "y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val want = rows.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, cx, cy), (b, x, y)) =>
        (b, cx + x, cy + y) }.drop(1)
    assert(got.toSeq === want.toSeq)
    val dup = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("b", "x")
    val e = intercept[IllegalArgumentException](
      PrefixSum.cumulative(dup.coalesce(1), "b", Seq("x")).collect())
    assert(e.getMessage.contains("distinct"))
  }
}
