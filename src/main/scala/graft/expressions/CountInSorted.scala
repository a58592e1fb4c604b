package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Count of elements of the left BIGINT array present in the right SORTED
  * BIGINT array — binary search per element, one JVM loop per row.
  *
  * The membership-probe half of the decontaminate fast path (r19): when
  * the test split's distinct shingle set fits a driver cap, it rides in as
  * ONE `Literal` node (an ArrayData value — NOT a per-element expression
  * tree, so the r7 rule-b JIT-size hazard does not apply) and the whole
  * train-side scan stays map-only: no broadcast-join build job, no
  * occurrence explode, no per-doc groupBy exchange.
  *
  * Contract: the right array MUST be ascending-sorted and null-free
  * (callers sort the collected set once on the driver); null elements on
  * the LEFT are skipped (never counted — the shingle arrays it probes are
  * null-free by construction). A null left or right array yields null via
  * nullSafeEval. */
object CountInSortedCore {
  def count(hs: ArrayData, sorted: ArrayData): Long = {
    val n = hs.numElements()
    val m = sorted.numElements()
    if (m == 0) return 0L
    var c = 0L
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val v = hs.getLong(i)
        // inline binary search over ArrayData (no long[] copy per row)
        var lo = 0
        var hi = m - 1
        var found = false
        while (lo <= hi && !found) {
          val mid = (lo + hi) >>> 1
          val sv = sorted.getLong(mid)
          if (sv == v) found = true
          else if (sv < v) lo = mid + 1
          else hi = mid - 1
        }
        if (found) c += 1L
      }
      i += 1
    }
    c
  }
}

/** String twin of [[CountInSortedCore]]: count of left ARRAY<STRING>
  * elements present in the right UTF8-binary-ascending sorted ARRAY<STRING>
  * (r20). Built for the language-ID marker probes — the per-token HOF
  * `filter(toks, t.isin(markers))` form paid |langs| interpreted lambda
  * passes over every token array; this is one JVM loop + binary search per
  * (row, lang). Same null contract as the BIGINT form. */
object CountInSortedStrCore {
  def count(toks: ArrayData, sorted: ArrayData): Long = {
    val n = toks.numElements()
    val m = sorted.numElements()
    if (m == 0) return 0L
    var c = 0L
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val v = toks.getUTF8String(i)
        var lo = 0
        var hi = m - 1
        var found = false
        while (lo <= hi && !found) {
          val mid = (lo + hi) >>> 1
          val cmp = sorted.getUTF8String(mid).compareTo(v)
          if (cmp == 0) found = true
          else if (cmp < 0) lo = mid + 1
          else hi = mid - 1
        }
        if (found) c += 1L
      }
      i += 1
    }
    c
  }
}

case class CountInSortedStr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "count_in_sorted_str"
  override def dataType: DataType = LongType

  private def isStrArray(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!isStrArray(left.dataType) || !isStrArray(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"count_in_sorted_str expects (ARRAY<STRING>, ARRAY<STRING>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(toks: Any, sorted: Any): Any =
    CountInSortedStrCore.count(toks.asInstanceOf[ArrayData], sorted.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, s) => s"graft.expressions.CountInSortedStrCore.count($t, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountInSortedStr =
    copy(left = newLeft, right = newRight)
}

case class CountInSorted(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "count_in_sorted"
  override def dataType: DataType = LongType

  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!isLongArray(left.dataType) || !isLongArray(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"count_in_sorted expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(hs: Any, sorted: Any): Any =
    CountInSortedCore.count(hs.asInstanceOf[ArrayData], sorted.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (h, s) => s"graft.expressions.CountInSortedCore.count($h, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountInSorted =
    copy(left = newLeft, right = newRight)
}
