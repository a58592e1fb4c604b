package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Span excision + reassembly over a token array, one JVM pass per row —
  * the row-local half of Lee et al. exact-substring removal ("Deduplicating
  * Training Data Makes Language Models Better"); see
  * [[graft.ops.DedupOps.removeDuplicatedSpans]] for the full operator.
  *
  * Input: the document's token array and the (unordered) list of masked
  * window START positions (0-based), plus the constant window width. The
  * kernel marks every position covered by any window (overlapping windows
  * merge by position-set union — no double removal), rebuilds the text
  * from the surviving tokens in order, and returns
  * struct(cleaned_text STRING, n_kept BIGINT).
  *
  * Why native: the built-in formulation fans each masked window out to
  * `width` (id, pos) rows (explode), anti-joins them against a
  * posexplode of EVERY token in the corpus (an occurrence-scale shuffle),
  * and reassembles each doc with an `array_sort(collect_list(struct))`
  * fold — three occurrence-scale stages for what is per-doc-local work
  * once the masked starts are gathered. With starts aggregated per doc
  * (doc-length-bounded `collect_list`), this expression replaces all
  * three stages with one map-side loop (round-9 rule a: the per-row
  * constant of a single JVM pass beats both the HOF chain and the
  * shuffle shape). Position marking is a boolean array walk —
  * O(tokens + starts×width) per doc; reassembly reuses the token bytes
  * via UTF8String.concatWs (no per-token string copies).
  *
  * Null contract: standard null-intolerant binary expression — a NULL
  * token array or NULL starts array yields NULL (callers coalesce the
  * left-join's missing starts to an empty array BEFORE the kernel, which
  * keeps "no masked windows" an explicit, codegen-friendly value).
  * Starts out of range are ignored defensively (clipped by the bounds
  * check), never thrown: the operator derives them from the same token
  * array in the same query. */
object ExciseSpansCore {
  private val Space = UTF8String.fromString(" ")

  def excise(toks: ArrayData, starts: ArrayData, width: Int): InternalRow = {
    val n = toks.numElements()
    val m = starts.numElements()
    if (m == 0 || n == 0) {
      // Fast path: nothing masked — rejoin every token (the normalized
      // text) without allocating the mask.
      val all = new Array[UTF8String](n)
      var i = 0
      while (i < n) { all(i) = toks.getUTF8String(i); i += 1 }
      return new GenericInternalRow(
        Array[Any](UTF8String.concatWs(Space, all: _*), n.toLong))
    }
    val masked = new Array[Boolean](n)
    var j = 0
    while (j < m) {
      val raw = starts.getLong(j)
      // Defensive: a start outside [0, n) is IGNORED (scaladoc contract) —
      // bounds-check the long before narrowing so >Int.MaxValue values
      // can't wrap into a bogus in-range position.
      if (raw >= 0L && raw < n) {
        var p = raw.toInt
        val end = Math.min(p + width, n)
        while (p < end) { masked(p) = true; p += 1 }
      }
      j += 1
    }
    var kept = 0
    var i = 0
    while (i < n) { if (!masked(i)) kept += 1; i += 1 }
    val out = new Array[UTF8String](kept)
    i = 0
    var k = 0
    while (i < n) {
      if (!masked(i)) { out(k) = toks.getUTF8String(i); k += 1 }
      i += 1
    }
    new GenericInternalRow(
      Array[Any](UTF8String.concatWs(Space, out: _*), kept.toLong))
  }
}

/** `excise_spans(tokens, starts)` with a constant window width — see
  * [[ExciseSpansCore.excise]]. `starts` is ARRAY<BIGINT> (the collect_list
  * of window start indices). */
case class ExciseSpans(left: Expression, right: Expression, width: Int)
    extends BinaryExpression {
  require(width >= 1, "excise_spans width must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("cleaned_text", StringType, nullable = false),
    StructField("n_kept", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"excise_spans expects (ARRAY<STRING>, ARRAY<BIGINT>), got (${l.catalogString}, ${r.catalogString})")
  }

  override protected def nullSafeEval(toks: Any, starts: Any): Any =
    ExciseSpansCore.excise(
      toks.asInstanceOf[ArrayData], starts.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, s) => s"graft.expressions.ExciseSpansCore.excise($t, $s, $width)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExciseSpans =
    copy(left = newLeft, right = newRight)
}
