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

/** Punctuation-character count of the RAW text — the quality-filter punct
  * signal `length(t) - length(regexp_replace(t, "[^a-zA-Z0-9 ]", ""))` as
  * one byte walk instead of a full Java-regex rewrite pass (the BENCHNOTES
  * round-17 residual's candidate (b): the punct regex was the last regex
  * in the llm_quality/llm_quality_filter/llm_mix_report hot path after
  * normalize/tokenize went native, and regexp_replace pays
  * UTF8String→String→UTF8String conversion plus an automaton walk plus
  * the rewritten-string allocation just to take a LENGTH).
  *
  * Parity argument (pinned by NormalizeTextSpec against the regex form):
  * Spark `length` on a string is `UTF8String.numChars` (code points);
  * the regex keeps exactly the ASCII bytes [a-zA-Z0-9 ] — every kept char
  * is a single UTF-8 byte, and every non-ASCII code point (lead byte
  * ≥ 0xC0 + continuations) matches the negated class once per CODE POINT,
  * exactly what `numChars - keptBytes` counts. Valid-UTF-8 inputs only
  * (parquet strings are; an invalid byte sequence would diverge from the
  * regex form's U+FFFD replacement semantics, not crash). NULL → NULL. */
object PunctCountCore {
  def count(s: UTF8String): Int = {
    val n = s.numBytes()
    var keep = 0
    var i = 0
    while (i < n) {
      val c = s.getByte(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == ' ') keep += 1
      i += 1
    }
    s.numChars() - keep
  }
}

case class PunctCount(child: Expression) extends UnaryExpression {
  override def prettyName: String = "punct_count"
  // INT, matching `length(a) - length(b)` so swapping the regex form in
  // and out never changes a schema.
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"punct_count expects STRING, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PunctCountCore.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.PunctCountCore.count($c)")

  override protected def withNewChildInternal(newChild: Expression): PunctCount =
    copy(child = newChild)
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
