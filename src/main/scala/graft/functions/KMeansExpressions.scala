package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._

/** Nearest-centroid assignment (the reference's mapper,
  * kmeans_mapreduce_core.cu:21-35) as one codegen'd expression: the
  * centroid table is baked into the generated code as primitive arrays,
  * the argmin loop is branch-free-ish and allocation-free, and ties
  * break to the lowest cid (strict `<` over cid-ascending order).
  * Returns struct(cid int, dist double). */
case class NearestCentroid2D(left: Expression, right: Expression,
    cids: Array[Int], cxs: Array[Double], cys: Array[Double])
  extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false)))

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[Double]
    val y = r.asInstanceOf[Double]
    var best = Double.MaxValue
    var bestC = -1
    var i = 0
    while (i < cids.length) {
      val dx = x - cxs(i); val dy = y - cys(i)
      val d = dx * dx + dy * dy
      if (d < best) { best = d; bestC = cids(i) }
      i += 1
    }
    InternalRow(bestC, best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val cidsRef = ctx.addReferenceObj("cids", cids, "int[]")
      val cxsRef = ctx.addReferenceObj("cxs", cxs, "double[]")
      val cysRef = ctx.addReferenceObj("cys", cys, "double[]")
      val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
      val i = ctx.freshName("i")
      val dx = ctx.freshName("dx"); val dy = ctx.freshName("dy")
      val d = ctx.freshName("d")
      s"""
         |double $best = Double.MAX_VALUE; int $bestC = -1;
         |for (int $i = 0; $i < $cidsRef.length; $i++) {
         |  double $dx = $x - $cxsRef[$i]; double $dy = $y - $cysRef[$i];
         |  double $d = $dx * $dx + $dy * $dy;
         |  if ($d < $best) { $best = $d; $bestC = $cidsRef[$i]; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$bestC, $best});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object KMeansExpressions {
  def nearestCentroid(x: Column, y: Column,
      centroids: Seq[(Int, Double, Double)]): Column = {
    val sorted = centroids.sortBy(_._1)
    ExprBridge.column(NearestCentroid2D(
      ExprBridge.expression(x), ExprBridge.expression(y),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray, sorted.map(_._3).toArray))
  }
}
