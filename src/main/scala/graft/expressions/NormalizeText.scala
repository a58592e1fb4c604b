package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The engine-wide text normalization — lowercase, non-alphanumeric runs
  * to single spaces, trim — as ONE byte walk instead of the built-in
  * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9]+", " "), " +", " "))`
  * chain (see [[graft.ops.TextOps.normalize]]).
  *
  * Why native: normalization fronts EVERY tokenize-bearing query, and the
  * corpus is deliberately re-normalized per query (CLAUDE.md r16 rule b —
  * caching the tokenized corpus would make the DuckDB comparison
  * asymmetric), so the chain's two Java-regex passes over the full text
  * are the llm family's largest shared constant (~1-2 s per query at the
  * sf1.0 decade; Java regex pays UTF8String→String→UTF8String conversions
  * per pass on top of the automaton).
  *
  * Bit-parity argument (pinned by NormalizeTextSpec against the built-in
  * chain): lowercasing delegates to the SAME `UTF8String.toLowerCase` the
  * `lower()` expression calls; after it, the only bytes the regex class
  * `[a-z0-9]` can keep are single ASCII bytes (every byte of a multi-byte
  * UTF-8 code point is ≥ 0x80, so non-ASCII text is separator bytes in
  * both formulations), maximal non-keeper runs collapse to one 0x20 — the
  * first regex — which makes the second regex (" +") a no-op, and
  * emitting no leading/trailing space IS `trim` (which strips 0x20 only).
  * A NULL input is NULL (UnaryExpression default). */
object NormalizeTextCore {
  def normalize(s: UTF8String): UTF8String = {
    val lower = s.toLowerCase
    val b = lower.getBytes
    val out = new Array[Byte](b.length)
    var k = 0
    var pendingSpace = false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      val keep = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (keep) {
        if (pendingSpace) { out(k) = ' '; k += 1; pendingSpace = false }
        out(k) = c
        k += 1
      } else if (k > 0) {
        pendingSpace = true // collapses runs; never emits before first keeper
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, k)
  }
}

case class NormalizeText(child: Expression) extends UnaryExpression {
  override def prettyName: String = "normalize_text"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text expects STRING, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NormalizeTextCore.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NormalizeTextCore.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}
