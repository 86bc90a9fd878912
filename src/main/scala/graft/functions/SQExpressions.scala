package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._

/** Scalar-quantization (SQ8) kernels for compressed ANN (SURVEY.md §2,
  * round 11) — the simpler sibling of PQ: each DIMENSION is quantized
  * independently to one byte against a per-dim [lo, hi] range
  * (code = clamp(floor((x−lo)/scale), 0, 255)), giving 4× compression
  * over float32 (64 B vs 256 B here) with much higher fidelity than
  * PQ's 32×. This is FAISS's SQ8 / the common "int8 embedding" layout:
  * the right trade when memory budget allows ~N bytes per dim and
  * recall must stay near-exact.
  *
  * The (lo, scale) vectors are the trained artifact (one corpus min/max
  * pass), inlined as plan literals exactly like the PQ codebooks.
  * Decode is v̂ = lo + (code + 0.5)·scale (midpoint rule); asymmetric
  * distance is the (|q|² − 2q·v̂) + |v̂|² identity with sequential
  * double dots, matching DuckDB `list_dot_product` bit-for-bit (the
  * PQExpressions discipline).
  */
object SQ8 {
  private[functions] def check(lo: Seq[Double], scale: Seq[Double]): Unit =
    require(lo.nonEmpty && lo.length == scale.length && scale.forall(_ > 0),
      "SQ8 takes equal-length lo/scale vectors with positive scales")
}

/** float/double-array vector → one byte per dimension. */
case class SQ8Encode(child: Expression, lo: Seq[Double], scale: Seq[Double])
    extends UnaryExpression with CodegenFallback {
  SQ8.check(lo, scale)

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    PQ.checkVector(child.dataType, "as input")

  @transient private lazy val loA = lo.toArray
  @transient private lazy val scA = scale.toArray
  @transient private lazy val vIsFloat = PQ.isFloatArray(child.dataType)

  override def nullSafeEval(v0: Any): Any = {
    val v = v0.asInstanceOf[ArrayData]
    require(v.numElements() == loA.length,
      s"vector dim ${v.numElements()} != trained dim ${loA.length}")
    val out = new Array[Byte](loA.length)
    var j = 0
    while (j < loA.length) {
      val x = if (vIsFloat) v.getFloat(j).toDouble else v.getDouble(j)
      val c = math.floor((x - loA(j)) / scA(j))
      out(j) = (if (c < 0) 0 else if (c > 255) 255 else c.toInt).toByte
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** (query vector, SQ8 codes) → asymmetric distance to the decoded
  * corpus vector: (|q|² − 2q·v̂) + |v̂|², three sequential dots. */
case class SQ8ADCDist(left: Expression, right: Expression,
    lo: Seq[Double], scale: Seq[Double])
    extends BinaryExpression with CodegenFallback {
  SQ8.check(lo, scale)

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    PQ.checkVector(left.dataType, "on the query side") match {
      case TypeCheckResult.TypeCheckSuccess if right.dataType != BinaryType =>
        TypeCheckResult.TypeCheckFailure(
          s"SQ8 codes must be binary, got ${right.dataType.sql}")
      case r => r
    }

  @transient private lazy val loA = lo.toArray
  @transient private lazy val scA = scale.toArray
  @transient private lazy val qIsFloat = PQ.isFloatArray(left.dataType)

  override def nullSafeEval(q0: Any, codes0: Any): Any = {
    val q = q0.asInstanceOf[ArrayData]
    val codes = codes0.asInstanceOf[Array[Byte]]
    require(q.numElements() == loA.length && codes.length == loA.length)
    var qq = 0.0; var qv = 0.0; var vv = 0.0
    var j = 0
    while (j < loA.length) {
      val x = if (qIsFloat) q.getFloat(j).toDouble else q.getDouble(j)
      val vh = loA(j) + ((codes(j) & 0xFF) + 0.5) * scA(j)
      qq += x * x; qv += x * vh; vv += vh * vh
      j += 1
    }
    (qq - 2 * qv) + vv
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SQExpressions {
  def sq8Encode(v: Column, lo: Seq[Double], scale: Seq[Double]): Column =
    ExprBridge.column(SQ8Encode(ExprBridge.expression(v), lo, scale))

  def sq8AdcDist(q: Column, codes: Column, lo: Seq[Double],
      scale: Seq[Double]): Column =
    ExprBridge.column(
      SQ8ADCDist(ExprBridge.expression(q), ExprBridge.expression(codes), lo, scale))
}
