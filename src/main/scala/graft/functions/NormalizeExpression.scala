package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static NFC kernel (standalone object so the generated code can call
  * it through the guaranteed static forwarder). UAX#15 canonical
  * composition via `java.text.Normalizer` — the same standard DuckDB's
  * `nfc_normalize` implements, so md5 over normalized text is
  * oracle-comparable. Already-normalized strings (ASCII in particular)
  * return the input UTF8String untouched: the common case allocates
  * nothing beyond the isNormalized scan. */
object NfcNorm {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization as a native unary expression. Unlike the
  * CodegenFallback kernels (which sever the codegen span), this one
  * emits a real `doGenCode` static call, so a normalize → lower →
  * regexp chain stays inside one WholeStageCodegen stage — it sits in
  * the per-row hot path of every cleaning pipeline. */
case class NormalizeNFC(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = NfcNorm.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeExpression {
  /** NFC-normalize a string column. */
  def nfcNormalize(text: Column): Column =
    ExprBridge.column(NormalizeNFC(ExprBridge.expression(text)))
}
