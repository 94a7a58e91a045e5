package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the text
  * canonicalization pass every multilingual pipeline needs before dedup
  * (a decomposed "é" = e + U+0301 and a precomposed "é" are byte-different
  * but render identically, so fingerprints split without it).
  *
  * Both the JDK (`java.text.Normalizer`) and DuckDB's `nfc_normalize`
  * implement UAX #15 canonical composition, so normalized output is
  * byte-identical cross-engine — hash-checkable with no tolerance.
  *
  * Codegen: one static call per row inside the generated consume path —
  * stays inside the WholeStageCodegen span (no interpreted lambda, no UDF
  * boundary).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    // quick check: most corpus text is already NFC — skip the rebuild
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
