package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE symbol count of a NORMALIZED text under a driver-held merge table —
  * one JVM walk per document (r20, the r19-verdict task 3).
  *
  * Replaces `Bpe.segmentTextFlat` + `flatSymbolCount` on the counting
  * consumers (llm_bpe_tokenize / llm_bpe_fertility), which paid ~k+4
  * full-text string passes per doc: a lookaround regex inserting `||` at
  * every intra-word character boundary, the word-boundary wrap, k merge
  * `replace` passes each allocating a new document-sized string, and two
  * `length` reads. This kernel never materializes a segmentation: per
  * word it tracks symbols as (start, len) spans into the text — a merge
  * of adjacent spans is span concatenation because BPE symbols are always
  * CONTIGUOUS substrings of their word — and applies each merge as one
  * left-to-right non-overlapping pass over the span array, exactly the
  * `replace` contract the wrapped-string encoding pins (a merged symbol
  * cannot be the LHS of another match in the same pass; the symbol after
  * it can). Spec-pinned equal to the flat form, whose oracle replay is
  * unchanged.
  *
  * Expects normalized text (`[a-z0-9 ]`, single spaces — ASCII, so byte
  * positions are char positions). Words = space-separated runs; the
  * symbol count of a document is the sum over words. Empty text counts 0.
  * Null text yields null. Merge arrays are rank-ordered, element i of
  * `lhs`/`rhs` forming merge i.
  */
object BpeSymCountCore {
  def count(text: UTF8String, lhsArr: ArrayData, rhsArr: ArrayData): Long = {
    val s = text.toString
    val k = lhsArr.numElements()
    val lhs = new Array[String](k)
    val rhs = new Array[String](k)
    var p = 0
    while (p < k) {
      lhs(p) = lhsArr.getUTF8String(p).toString
      rhs(p) = rhsArr.getUTF8String(p).toString
      p += 1
    }
    var total = 0L
    val n = s.length
    var wStart = 0
    // reusable span buffers sized to the longest word seen so far
    var st: Array[Int] = null
    var ln: Array[Int] = null
    while (wStart < n) {
      var wEnd = s.indexOf(' ', wStart)
      if (wEnd < 0) wEnd = n
      val wlen = wEnd - wStart
      if (wlen == 1) total += 1L
      else if (wlen > 1) {
        if (st == null || st.length < wlen) {
          st = new Array[Int](wlen); ln = new Array[Int](wlen)
        }
        var i = 0
        while (i < wlen) { st(i) = wStart + i; ln(i) = 1; i += 1 }
        var m = wlen
        p = 0
        while (p < k && m >= 2) {
          val l = lhs(p); val r = rhs(p)
          var in = 0; var out = 0
          while (in < m) {
            if (in + 1 < m &&
                ln(in) == l.length && s.regionMatches(st(in), l, 0, ln(in)) &&
                ln(in + 1) == r.length && s.regionMatches(st(in + 1), r, 0, ln(in + 1))) {
              st(out) = st(in); ln(out) = ln(in) + ln(in + 1); in += 2
            } else {
              st(out) = st(in); ln(out) = ln(in); in += 1
            }
            out += 1
          }
          m = out; p += 1
        }
        total += m
      }
      wStart = wEnd + 1
    }
    total
  }
}

/** `bpe_sym_count(norm_text, lhs_array, rhs_array)` → BIGINT. */
case class BpeSymCount(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def prettyName: String = "bpe_sym_count"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def strArr(e: Expression) = e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bpe_sym_count expects STRING text, got ${first.dataType.catalogString}")
    else if (!strArr(second) || !strArr(third))
      TypeCheckResult.TypeCheckFailure(
        "bpe_sym_count expects ARRAY<STRING> lhs/rhs merge arrays")
    else TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(text: Any, lhs: Any, rhs: Any): Any =
    BpeSymCountCore.count(text.asInstanceOf[UTF8String],
      lhs.asInstanceOf[ArrayData], rhs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, l, r) =>
      s"graft.expressions.BpeSymCountCore.count($t, $l, $r)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BpeSymCount =
    copy(first = newFirst, second = newSecond, third = newThird)
}
