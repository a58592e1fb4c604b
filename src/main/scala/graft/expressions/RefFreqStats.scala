package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local reference-frequency scoring (r19): folds a document's
  * `gram_counts` (token, within-doc count) entries against a SORTED
  * driver-held vocabulary (keys + document frequencies as two array
  * Literals — the decontaminate tier-1 pattern) into
  * `struct(n_toks, n_oov, rsum, nv)`:
  *
  *   n_toks = Σ c           n_oov = Σ c where token ∉ vocab
  *   rsum   = Σ c · (10⁶ div df)   nv = Σ c where token ∈ vocab
  *
  * — exactly the four sums [[graft.ops.TextOps.refFreqQuality]]'s
  * vocab-join + per-doc aggregation produces, so the map-only path is
  * bit-identical to the join path (truncating integer div both ways) and
  * the oracle stays unchanged.
  *
  * Contract: `keys` must be ascending in UTF8String BINARY order and
  * null-free with `vals` aligned by index (the caller sorts the collected
  * vocab once on the driver; tokens here are [a-z0-9]+ so Java-string and
  * byte order coincide, but the sort is done on UTF8String anyway). Null
  * entries are skipped. Null input → null (nullSafeEval). */
object RefFreqStatsCore {
  def stats(entries: ArrayData, keys: ArrayData, vals: ArrayData): GenericInternalRow = {
    val n = entries.numElements()
    val m = keys.numElements()
    var nToks = 0L
    var nOov = 0L
    var rsum = 0L
    var nv = 0L
    var i = 0
    while (i < n) {
      if (!entries.isNullAt(i)) {
        val e = entries.getStruct(i, 2)
        val tok = e.getUTF8String(0)
        val c = e.getLong(1)
        nToks += c
        // binary search over the sorted UTF8String key array
        var lo = 0
        var hi = m - 1
        var found = -1
        while (lo <= hi && found < 0) {
          val mid = (lo + hi) >>> 1
          val cmp = keys.getUTF8String(mid).compareTo(tok)
          if (cmp == 0) found = mid
          else if (cmp < 0) lo = mid + 1
          else hi = mid - 1
        }
        if (found >= 0) {
          nv += c
          rsum += c * (1000000L / vals.getLong(found)) // truncating div, df >= 1
        } else nOov += c
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nToks, nOov, rsum, nv))
  }
}

case class RefFreqStats(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def prettyName: String = "reffreq_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("n_oov", LongType, nullable = false),
    StructField("rsum", LongType, nullable = false),
    StructField("nv", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    val entriesOk = first.dataType match {
      case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == StringType && b.dataType == LongType => true
      case _ => false
    }
    def longArr(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true; case _ => false
    }
    def strArr(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true; case _ => false
    }
    if (!entriesOk)
      TypeCheckResult.TypeCheckFailure(
        s"reffreq_stats expects ARRAY<STRUCT<STRING, BIGINT>> entries, got ${first.dataType.catalogString}")
    else if (!strArr(second.dataType) || !longArr(third.dataType))
      TypeCheckResult.TypeCheckFailure(
        "reffreq_stats expects (entries, ARRAY<STRING> sorted keys, ARRAY<BIGINT> dfs)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(e: Any, k: Any, v: Any): Any =
    RefFreqStatsCore.stats(e.asInstanceOf[ArrayData], k.asInstanceOf[ArrayData],
      v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (e, k, v) => s"graft.expressions.RefFreqStatsCore.stats($e, $k, $v)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RefFreqStats =
    copy(first = f, second = s, third = t)
}
