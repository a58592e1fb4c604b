package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a native
  * expression — Spark ships no unicode-normalize builtin, and a pipeline
  * ingesting web text needs NFC hygiene BEFORE any hash/dedup stage (the
  * same logical text in composed vs decomposed form would otherwise carry
  * two fingerprints). Named `nfc_normalize` to mirror DuckDB's builtin of
  * the same name and semantics, so oracles replay it verbatim.
  *
  * Fast path: `Normalizer.isNormalized` is allocation-free for the
  * already-NFC (and all-ASCII) common case, so the per-row cost on clean
  * corpora is one scan of the bytes; only rows that actually need
  * composition pay the String round-trip. Map-only, null-preserving. */
object NfcNormalizeCore {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalizeCore.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.expressions.NfcNormalizeCore.nfc($s)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
