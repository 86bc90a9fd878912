package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: the point of Morton keys is that every bucket of a
  * z-sorted file bounds EVERY interleaved dimension, so min/max footer
  * stats can prune scans filtering on any of them — where a linear
  * sort bounds only its leading key. These specs measure that on the
  * actual per-bucket envelopes. */
class LayoutSpec extends SparkSpec {

  // mean per-bucket envelope width as a fraction of the key's domain —
  // the expected fraction of buckets a uniform point filter must read
  private def meanSpanFrac(rows: Seq[(Long, Long)], domain: Long): Double =
    rows.map { case (lo, hi) => (hi - lo + 1).toDouble / domain }.sum / rows.size

  test("z-order buckets bound both dimensions; a linear sort leaves the second unbounded") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"))
    val (px, sx) = {
      val r = li.agg(max("l_partkey"), max("l_suppkey")).head()
      (r.getLong(0), r.getLong(1))
    }

    val z = SparkEntry.queries("q_zorder")(spark, sfDir)
    val zPk = z.select("pk_min", "pk_max").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val zSk = z.select("sk_min", "sk_max").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

    // linear layout twin: 16 equal partkey ranges (what a sort by
    // l_partkey alone would put in each file)
    val lin = li
      .withColumn("bucket", expr(s"(cast(l_partkey AS BIGINT) * 16) div (${px + 1})"))
      .groupBy("bucket")
      .agg(min("l_suppkey").as("lo"), max("l_suppkey").as("hi"))
    val linSk = lin.select("lo", "hi").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

    val zPkFrac = meanSpanFrac(zPk, px + 1)
    val zSkFrac = meanSpanFrac(zSk, sx + 1)
    val linSkFrac = meanSpanFrac(linSk, sx + 1)

    // 16 quadrant buckets = a 4×4 grid ⇒ each bucket should cover ~1/4
    // of each dimension; leave headroom for boundary raggedness
    assert(zPkFrac < 0.5, s"z buckets must bound l_partkey, got $zPkFrac")
    assert(zSkFrac < 0.5, s"z buckets must bound l_suppkey, got $zSkFrac")
    assert(linSkFrac > 0.9,
      s"a partkey-sorted layout should leave l_suppkey unbounded per " +
        s"bucket (that's why z-order exists), got $linSkFrac")
    assert(zSkFrac < linSkFrac / 2,
      s"z-order must at least halve the suppkey scan fraction: " +
        s"$zSkFrac vs $linSkFrac")
  }

  test("zorder16 interleaves bits exactly (Morton round-trip on corners)") {
    val df = spark.range(1).select(
      Layout.zorder16(lit(0L), lit(0L)).as("z00"),
      Layout.zorder16(lit(65535L), lit(0L)).as("zx"),
      Layout.zorder16(lit(0L), lit(65535L)).as("zy"),
      Layout.zorder16(lit(65535L), lit(65535L)).as("zxy"),
      Layout.zorder16(lit(1L), lit(0L)).as("z10"),
      Layout.zorder16(lit(0L), lit(1L)).as("z01"))
    val r = df.head()
    assert(r.getAs[Long]("z00") === 0L)
    // x occupies the even bits, y the odd bits
    assert(r.getAs[Long]("zx") === 0x55555555L)
    assert(r.getAs[Long]("zy") === 0xAAAAAAAAL)
    assert(r.getAs[Long]("zxy") === 0xFFFFFFFFL)
    assert(r.getAs[Long]("z10") === 1L)
    assert(r.getAs[Long]("z01") === 2L)
  }
}
