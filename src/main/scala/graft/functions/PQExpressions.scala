package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._

/** Product-quantization kernels for compressed ANN (SURVEY.md §2).
  *
  * PQ is the standard way to fit billion-vector similarity search in
  * memory: the 64-d float vector (256 B) becomes `subspaces` small
  * codeword ids (8 B at 8×16), and query-time distance is approximated
  * from the codes alone (ADC) — the corpus scan touches codes, never
  * the original vectors. Codebooks are k full-width rows; subspace m
  * reads dims [m·sub, (m+1)·sub).
  *
  * Arithmetic mirrors the oracle exactly: every subspace distance is
  * the (|x|² − 2x·c) + |c|² identity with sequential double dots
  * (= DuckDB `list_dot_product` on DOUBLE[] slices), and the ADC total
  * accumulates subspace terms in ascending-m order, so results are
  * bit-reproducible in SQL.
  */
object PQ {
  @inline private[functions] def subDist(
      v: ArrayData, vIsFloat: Boolean, cb: Array[Array[Double]], code: Int,
      base: Int, sub: Int): Double = {
    val cw = cb(code)
    var xx = 0.0; var xc = 0.0; var cc = 0.0
    var i = 0
    while (i < sub) {
      val x = if (vIsFloat) v.getFloat(base + i).toDouble
        else v.getDouble(base + i)
      val w = cw(base + i)
      xx += x * x; xc += x * w; cc += w * w
      i += 1
    }
    (xx - 2 * xc) + cc
  }

  /** Raw float embeddings and double residuals both flow through the PQ
    * kernels. Callers see a bad element type at ANALYSIS time — the
    * expressions override `checkInputDataTypes` with [[checkVector]] —
    * so by eval time this match is total. */
  private[functions] def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private[functions] def checkVector(t: DataType, side: String): TypeCheckResult =
    t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"PQ kernels take array<float> or array<double> $side, got ${other.sql}")
    }
}

/** float-array vector → `binary` of per-subspace nearest-codeword ids,
  * one BYTE per subspace (ties to the lowest code, like every argmin in
  * the engine). Byte-packed codes are the point of PQ at scale: the
  * corpus ranking column is `subspaces` bytes per row (8 B at 8×256)
  * instead of an int-array header + 4 B per code. */
case class PQEncode(child: Expression, codebook: Seq[Seq[Double]], subspaces: Int)
    extends UnaryExpression with CodegenFallback {
  require(codebook.nonEmpty && codebook.head.length % subspaces == 0
    && codebook.forall(_.length == codebook.head.length),
    "codebook rows must share one dimensionality divisible by subspaces")
  require(codebook.length <= 256, "byte codes address at most 256 codewords")

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    PQ.checkVector(child.dataType, "as input")

  @transient private lazy val cb = codebook.map(_.toArray).toArray
  @transient private lazy val vIsFloat = PQ.isFloatArray(child.dataType)
  private val dim = codebook.head.length
  private val sub = dim / subspaces

  override def nullSafeEval(v0: Any): Any = {
    val v = v0.asInstanceOf[ArrayData]
    require(v.numElements() == dim,
      s"vector dim ${v.numElements()} != codebook dim $dim")
    val out = new Array[Byte](subspaces)
    var m = 0
    while (m < subspaces) {
      val base = m * sub
      var best = Double.MaxValue
      var bc = 0
      var c = 0
      while (c < cb.length) {
        val d = PQ.subDist(v, vIsFloat, cb, c, base, sub)
        if (d < best) { best = d; bc = c } // strict < → lowest code wins
        c += 1
      }
      out(m) = bc.toByte
      m += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** (query float-array, byte-packed codes) → asymmetric (ADC) distance:
  * Σ_m subspace-dist(query_m, codeword(codes[m])_m), ascending m. */
case class PQADCDist(left: Expression, right: Expression,
    codebook: Seq[Seq[Double]], subspaces: Int)
    extends BinaryExpression with CodegenFallback {
  require(codebook.nonEmpty && codebook.head.length % subspaces == 0
    && codebook.forall(_.length == codebook.head.length),
    "codebook rows must share one dimensionality divisible by subspaces")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    PQ.checkVector(left.dataType, "on the query side") match {
      case TypeCheckResult.TypeCheckSuccess if right.dataType != BinaryType =>
        TypeCheckResult.TypeCheckFailure(
          s"ADC codes must be binary, got ${right.dataType.sql}")
      case r => r
    }

  @transient private lazy val cb = codebook.map(_.toArray).toArray
  @transient private lazy val qIsFloat = PQ.isFloatArray(left.dataType)
  private val dim = codebook.head.length
  private val sub = dim / subspaces

  override def nullSafeEval(q0: Any, codes0: Any): Any = {
    val q = q0.asInstanceOf[ArrayData]
    val codes = codes0.asInstanceOf[Array[Byte]]
    require(q.numElements() == dim && codes.length == subspaces)
    // first term, then += in ascending m: matches the oracle's
    // left-associative t0 + t1 + ... + t7 bit-for-bit
    var total = PQ.subDist(q, qIsFloat, cb, codes(0) & 0xFF, 0, sub)
    var m = 1
    while (m < subspaces) {
      total += PQ.subDist(q, qIsFloat, cb, codes(m) & 0xFF, m * sub, sub)
      m += 1
    }
    total
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PQExpressions {
  def pqEncode(v: Column, codebook: Seq[Seq[Double]], subspaces: Int): Column =
    ExprBridge.column(PQEncode(ExprBridge.expression(v), codebook, subspaces))

  def pqAdcDist(q: Column, codes: Column, codebook: Seq[Seq[Double]],
      subspaces: Int): Column =
    ExprBridge.column(
      PQADCDist(ExprBridge.expression(q), ExprBridge.expression(codes), codebook, subspaces))
}
