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
}
