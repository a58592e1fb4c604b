package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document span pre-aggregation kernels — the [[GramCountsCore]]
  * lever (r19) extended to width-N token windows (r20, the r19 verdict's
  * task 1/2). Both walk the token array ONCE per row in the JVM and emit
  * per-doc-grouped structs, so the downstream explode is per-doc-DISTINCT
  * scale and the corpus aggregation keys stay exact strings — no hash
  * collision caveat, oracles unchanged.
  *
  * What this replaces (measured shape, `DedupOps.spanRows`/`segmentRows`):
  * `explode(sequence(..))` + a width-wide `element_at`/`slice` +
  * `concat_ws` projection. That form pays per-OCCURRENCE Generate rows
  * and — the dominant term — carries the full `_toks` array through the
  * Generate output, copied into every exploded unsafe row (O(tokens ×
  * doc_length) bytes of row production for a window enumeration that
  * needs O(tokens × width)). The kernel builds each span string directly
  * from the array and emits only the grouped (span, payload) structs.
  *
  * Span-string semantics replicate the expression forms EXACTLY: windows
  * are RAW array windows, elements joined by a single space with nulls
  * skipped (`concat_ws` semantics; the engine tokenizer never yields null
  * or empty tokens, so with `tokens_norm` input the two notions coincide).
  * A null input array yields null (nullSafeEval).
  */
object SpanCountsCore {
  private val SPACE = UTF8String.fromString(" ")

  /** Join arr[from, from+len) with single spaces, skipping nulls —
    * `concat_ws(" ", ...)` over the window. */
  private def joinWindow(arr: ArrayData, from: Int, len: Int,
                         scratch: Array[UTF8String]): UTF8String = {
    var i = 0
    while (i < len) { scratch(i) = arr.getUTF8String(from + i); i += 1 }
    while (i < scratch.length) { scratch(i) = null; i += 1 } // clear tail
    UTF8String.concatWs(SPACE, scratch: _*)
  }

  /** SLIDING windows (stride 1): every `width`-token window, grouped to
    * (span, within-doc count) in first-occurrence order. Documents with
    * fewer than `width` tokens emit an empty array — the
    * `filter(size(_toks) >= width)` guard becomes unnecessary. */
  def sliding(arr: ArrayData, width: Int): ArrayData = {
    val n = arr.numElements()
    if (n < width) return new GenericArrayData(Array.empty[Any])
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]](Math.max(16, n))
    val scratch = new Array[UTF8String](width)
    var i = 0
    while (i <= n - width) {
      val span = joinWindow(arr, i, width, scratch)
      val v = m.get(span)
      if (v == null) m.put(span, Array(1L)) else v(0) += 1L
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      // concatWs results are fresh allocations — no clone needed
      out(i) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** SLIDING windows with POSITIONS: every `width`-token window grouped to
    * (span, ascending window-start list) in first-occurrence order — the
    * [[sliding]] shape for consumers that need occurrence positions
    * (span-removal keeper election / masking). Documents with fewer than
    * `width` tokens emit an empty array. */
  def slidingGroups(arr: ArrayData, width: Int): ArrayData = {
    val n = arr.numElements()
    if (n < width) return new GenericArrayData(Array.empty[Any])
    val m = new java.util.LinkedHashMap[UTF8String, java.util.ArrayList[Long]](
      Math.max(16, n))
    val scratch = new Array[UTF8String](width)
    var i = 0
    while (i <= n - width) {
      val span = joinWindow(arr, i, width, scratch)
      var v = m.get(span)
      if (v == null) { v = new java.util.ArrayList[Long](1); m.put(span, v) }
      v.add(i.toLong)
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      val idxList = e.getValue
      val idxs = new Array[Long](idxList.size())
      var j = 0
      while (j < idxs.length) { idxs(j) = idxList.get(j); j += 1 }
      out(i) = new GenericInternalRow(
        Array[Any](e.getKey, new GenericArrayData(idxs)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** ALIGNED segments (stride = width): segment i covers tokens
    * [i*width, min(n, (i+1)*width)) — the last segment may be short —
    * grouped to (segment, ascending seg_idx list) in first-occurrence
    * order. An empty token array emits an empty result. */
  def aligned(arr: ArrayData, width: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val nSegs = (n + width - 1) / width
    val m = new java.util.LinkedHashMap[UTF8String, java.util.ArrayList[Long]](
      Math.max(16, nSegs * 2))
    val scratch = new Array[UTF8String](width)
    var s = 0
    while (s < nSegs) {
      val from = s * width
      val seg = joinWindow(arr, from, Math.min(width, n - from), scratch)
      var v = m.get(seg)
      if (v == null) { v = new java.util.ArrayList[Long](1); m.put(seg, v) }
      v.add(s.toLong)
      s += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      val idxList = e.getValue
      val idxs = new Array[Long](idxList.size())
      var j = 0
      while (j < idxs.length) { idxs(j) = idxList.get(j); j += 1 }
      out(i) = new GenericInternalRow(
        Array[Any](e.getKey, new GenericArrayData(idxs)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `span_counts(tokens, width)` → `array<struct<s: string, c: bigint>>` of
  * (sliding width-token span, within-doc count), first-occurrence order. */
case class SpanCounts(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "span_counts"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    SpanCounts.check("span_counts", left, right, minWidth = 2)

  override protected def nullSafeEval(toks: Any, width: Any): Any =
    SpanCountsCore.sliding(toks.asInstanceOf[ArrayData], width.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) => s"graft.expressions.SpanCountsCore.sliding($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanCounts =
    copy(left = newLeft, right = newRight)
}

object SpanCounts {
  private[expressions] def check(name: String, left: Expression,
                                 right: Expression, minWidth: Int): TypeCheckResult =
    if (!left.dataType.isInstanceOf[ArrayType] ||
      left.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$name expects ARRAY<STRING> tokens, got ${left.dataType.catalogString}")
    else if (!right.foldable || right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$name width must be a constant INT")
    else right.eval() match {
      case w: Integer if w >= minWidth => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$name width must be a non-null constant >= $minWidth")
    }
}

/** `span_groups(tokens, width)` → `array<struct<s: string, x: array<bigint>>>`
  * of (sliding width-token span, ascending window-start list) — the
  * position-carrying twin of [[SpanCounts]]. */
case class SpanGroups(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "span_groups"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", StringType, nullable = false),
    StructField("x", ArrayType(LongType, containsNull = false), nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    SpanCounts.check("span_groups", left, right, minWidth = 2)

  override protected def nullSafeEval(toks: Any, width: Any): Any =
    SpanCountsCore.slidingGroups(toks.asInstanceOf[ArrayData], width.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) => s"graft.expressions.SpanCountsCore.slidingGroups($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanGroups =
    copy(left = newLeft, right = newRight)
}

/** `seg_groups(tokens, width)` → `array<struct<s: string, x: array<bigint>>>`
  * of (aligned width-token segment, ascending seg_idx list) — the row-local
  * form of `segmentRows + groupBy(segment, id).agg(collect_list(seg_idx))`,
  * deleting that occurrence-scale exchange outright. */
case class SegGroups(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "seg_groups"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", StringType, nullable = false),
    StructField("x", ArrayType(LongType, containsNull = false), nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    SpanCounts.check("seg_groups", left, right, minWidth = 1)

  override protected def nullSafeEval(toks: Any, width: Any): Any =
    SpanCountsCore.aligned(toks.asInstanceOf[ArrayData], width.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) => s"graft.expressions.SpanCountsCore.aligned($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SegGroups =
    copy(left = newLeft, right = newRight)
}
