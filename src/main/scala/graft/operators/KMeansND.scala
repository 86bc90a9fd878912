package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._

/** n-dimensional Lloyd's over `array<float>` embeddings — the reference
  * algorithm (kmeans_mapreduce_core.cu) generalized past 2-D, still
  * Spark-shaped: broadcast centroid table, shuffle only k×dim partial
  * sums per partition per iteration.
  *
  * Distances use |a|² − 2a·b + |b|², each dot a sequential double
  * accumulation — bit-identical to `list_dot_product` on DOUBLE[] in
  * DuckDB, so assignment steps are oracle-checkable even at 64
  * dimensions. */
object KMeansND {

  /** argmin over baked-in centroids; returns struct(cid, dist). Ties
    * break to the lowest cid (centroid arrays sorted by cid, strict <). */
  case class NearestCentroidND(child: Expression, cids: Array[Int],
      centroids: Array[Array[Double]], norms: Array[Double])
    extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = StructType(Seq(
      StructField("cid", IntegerType, nullable = false),
      StructField("dist", DoubleType, nullable = false)))

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      val x = new Array[Double](n)
      var i = 0
      var na = 0.0
      while (i < n) { x(i) = a.getFloat(i).toDouble; na += x(i) * x(i); i += 1 }
      var best = Double.MaxValue
      var bestC = -1
      var c = 0
      while (c < cids.length) {
        val cv = centroids(c)
        var dot = 0.0
        var j = 0
        while (j < n && j < cv.length) { dot += x(j) * cv(j); j += 1 }
        val d = (na - 2 * dot) + norms(c)
        if (d < best) { best = d; bestC = cids(c) }
        c += 1
      }
      InternalRow(bestC, best)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Sequential |v|² — must match DuckDB's list_dot_product(v, v). */
  def norm2(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    s
  }

  def nearest(vec: Column, centroids: Seq[(Int, Array[Double])]): Column = {
    val sorted = centroids.sortBy(_._1)
    ExprBridge.column(NearestCentroidND(ExprBridge.expression(vec),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray,
      sorted.map(c => norm2(c._2)).toArray))
  }

  /** Map phase over (id, vec): +cid, +dist. */
  def assign(points: DataFrame, centroids: Seq[(Int, Array[Double])]): DataFrame =
    points.withColumn("_n", nearest(col("vec"), centroids))
      .withColumn("cid", col("_n.cid")).withColumn("dist", col("_n.dist"))
      .drop("_n")

  /** One Lloyd iteration: per-cluster per-dim means via narrow
    * (cid, dim, v) partial aggregation; empty clusters unchanged. */
  def step(points: DataFrame, centroids: Seq[(Int, Array[Double])],
      roundTo: Int = 6): Seq[(Int, Array[Double])] = {
    val means = assign(points, centroids)
      .select(col("cid"), posexplode(col("vec")).as(Seq("dim", "x")))
      .groupBy("cid", "dim")
      .agg(round(avg(col("x").cast("double")), roundTo).as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
      }
    centroids.map { case (cid, cv) => cid -> means.getOrElse(cid, cv) }
      .sortBy(_._1)
  }

  /** Deterministic seed: vectors with id < k, cid = id. */
  def seed(points: DataFrame, k: Int): Seq[(Int, Array[Double])] =
    points.filter(col("id") < k).collect().map { r =>
      r.getAs[Long]("id").toInt ->
        r.getAs[Seq[Float]]("vec").map(_.toDouble).toArray
    }.sortBy(_._1).toSeq

  /** One Lloyd iteration over a pinned vector RDD: broadcast k×dim
    * centroids, treeAggregate of k×dim partial sums — no Catalyst work
    * in the inner loop (a fresh plan would re-analyze every round since
    * the centroid literals change; MLlib's own KMeans has this shape). */
  private def stepRdd(rdd: org.apache.spark.rdd.RDD[Array[Double]],
      centroids: Seq[(Int, Array[Double])], roundTo: Int = 6): Seq[(Int, Array[Double])] = {
    val sorted = centroids.sortBy(_._1)
    val cvs = sorted.map(_._2).toArray
    require(cvs.forall(_.length == cvs.head.length),
      s"ragged centroid dims: ${cvs.map(_.length).distinct.mkString(",")}")
    val cns = cvs.map(norm2)
    val k = cvs.length
    val bc = rdd.sparkContext.broadcast((cvs, cns))
    try {
      val (sums, cnt) = rdd.treeAggregate(
        (Array.fill(k)(Array.empty[Double]), new Array[Long](k)))(
        seqOp = { case ((s, n), x) =>
          val (cv, cn) = bc.value
          // a ragged corpus must fail fast, not yield a silently-partial
          // dot product or mis-sized sum arrays downstream
          require(cv.isEmpty || x.length == cv(0).length,
            s"vector dim ${x.length} != centroid dim ${cv(0).length}")
          var na = 0.0; var i = 0
          while (i < x.length) { na += x(i) * x(i); i += 1 }
          var best = Double.MaxValue; var bi = 0; var c = 0
          while (c < k) {
            var dot = 0.0; var j = 0
            val v = cv(c)
            while (j < x.length) { dot += x(j) * v(j); j += 1 }
            val d = (na - 2 * dot) + cn(c)
            if (d < best) { best = d; bi = c } // strict < → lowest cid wins
            c += 1
          }
          if (s(bi).isEmpty) s(bi) = new Array[Double](x.length)
          var j = 0
          while (j < x.length) { s(bi)(j) += x(j); j += 1 }
          n(bi) += 1
          (s, n)
        },
        combOp = { case ((sa, na), (sb, nb)) =>
          var c = 0
          while (c < k) {
            if (sa(c).isEmpty) sa(c) = sb(c)
            else if (sb(c).nonEmpty) {
              var j = 0
              while (j < sa(c).length) { sa(c)(j) += sb(c)(j); j += 1 }
            }
            na(c) += nb(c)
            c += 1
          }
          (sa, na)
        })
      def rnd(v: Double): Double =
        BigDecimal(v).setScale(roundTo, BigDecimal.RoundingMode.HALF_UP).toDouble
      sorted.zipWithIndex.map { case ((cid, cv), i) =>
        if (cnt(i) == 0) cid -> cv // empty cluster unchanged
        else cid -> sums(i).map(s => rnd(s / cnt(i)))
      }
    } finally bc.destroy()
  }

  def fit(points: DataFrame, k: Int, maxIter: Int = 20, tol: Double = 1e-4)
      : Seq[(Int, Array[Double])] = {
    val spark = points.sparkSession
    val rdd = points.select(col("vec"))
      .rdd.map { r =>
        val s = r.getSeq[Float](0)
        val a = new Array[Double](s.length)
        var i = 0
        while (i < s.length) { a(i) = s(i).toDouble; i += 1 }
        a
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cs = seed(points, k)
      var iter = 0
      var moved = Double.MaxValue
      while (iter < maxIter && moved >= tol) {
        val next = stepRdd(rdd, cs)
        moved = cs.zip(next).map { case ((_, a), (_, b)) =>
          a.zip(b).map { case (p, q) => math.abs(p - q) }.max
        }.max
        cs = next
        iter += 1
      }
      cs
    } finally rdd.unpersist(blocking = false)
  }
}
