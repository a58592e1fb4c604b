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

/** Fused normalize + tokenize: the token ARRAY of [[NormalizeTextCore]]'s
  * normalization, one byte walk, no intermediate normalized string and no
  * regex split (Spark's `split(s, " ")` compiles the single-space pattern
  * as a regex and re-allocates per token).
  *
  * Parity contract (pinned by NormalizeTextSpec): identical to
  * `split(normalize_text(s), " ")` — each [a-z0-9] run of the lowered
  * text is one token; ZERO runs yield `[""]` (split of the empty string
  * is a one-element empty-string array — the "tokens is never empty"
  * invariant CLAUDE.md documents and callers' element_at(_toks, 1)
  * guards rely on). */
object TokensNormCore {
  def tokens(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val lower = s.toLowerCase
    val b = lower.getBytes
    val out = new java.util.ArrayList[Object](16)
    var start = -1
    var i = 0
    while (i < b.length) {
      val c = b(i)
      val keep = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (keep) { if (start < 0) start = i }
      else if (start >= 0) {
        out.add(UTF8String.fromBytes(b, start, i - start)); start = -1
      }
      i += 1
    }
    if (start >= 0) out.add(UTF8String.fromBytes(b, start, b.length - start))
    if (out.isEmpty) out.add(UTF8String.EMPTY_UTF8)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

case class TokensNorm(child: Expression) extends UnaryExpression {
  override def prettyName: String = "tokens_norm"
  // containsNull = true matches StringSplit's dataType, so swapping the
  // built-in formulation in and out never changes a schema.
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tokens_norm expects STRING, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TokensNormCore.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokensNormCore.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): TokensNorm =
    copy(child = newChild)
}
