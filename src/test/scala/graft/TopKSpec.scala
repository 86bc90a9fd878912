package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKAggregate.topk

class TopKSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  test("topk keeps the k smallest structs, sorted, across partitions") {
    // force many partitions so serialize/deserialize/merge all run
    val df = spark.range(0, 1000).repartition(13)
      .select((col("id") * 37 % 1000).as("v"), col("id"))
    val got = df.agg(topk(struct(col("v"), col("id")), 5).as("t"))
      .select(explode(col("t")).as("e")).select("e.v").as[Long].collect()
    assert(got.toSeq === (0 until 5).map(i => (0 until 1000).map(x => x * 37 % 1000).sorted.apply(i).toLong))
  }

  test("q_topk_agg reproduces the window formulation exactly") {
    val a = SparkEntry.queries("q_topk_agg")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val w = SparkEntry.queries("q_topk_window")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a === w)
  }

  test("groups with fewer than k rows return all rows ranked") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("g", "v")
    val got = df.groupBy("g").agg(topk(struct(col("v")), 5).as("t"))
      .select(col("g"), size(col("t")).as("n")).as[(String, Int)].collect().toMap
    assert(got === Map("a" -> 2, "b" -> 1))
  }
}
