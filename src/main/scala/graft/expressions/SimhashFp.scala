package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** SimHash fingerprint of a token array, computed row-locally: hash every
  * (non-empty) token occurrence, accumulate the ±1 bit sums, and set bit
  * `i` iff its sum is positive — `bits` wide (≤ 60), NULL when the array
  * has no non-empty tokens (mirrors the exploded form, where such docs
  * emit no rows).
  *
  * Why native: the built-in formulation explodes one row per token
  * OCCURRENCE (corpus-token-scale), sha256s each, and shuffles them into
  * a doc-keyed aggregate with `bits` conditional sums. This is the same
  * sum in one JVM loop per document — MAP-ONLY, no explode, no exchange;
  * the fingerprint leaves the scan projection finished. Hash contract is
  * the engine-wide `hash60` (first 15 hex chars of sha256, base-16) —
  * identical to the SQL the oracle replays, so the unchanged DuckDB
  * formulation stays the cross-check. */
object SimhashFpCore {
  def fp(arr: ArrayData, bits: Int): Any = {
    val n = arr.numElements()
    val sums = new Array[Int](bits)
    var counted = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      // null elements are skipped like empties (the type check accepts
      // containsNull=true arrays — any SQL caller can pass one)
      if (t != null && t.numBytes() > 0) {
        counted += 1
        val h = WinnowMinsCore.hash60Raw(t.getBytes)
        var b = 0
        while (b < bits) {
          if (((h >> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    if (counted == 0) null
    else {
      var v = 0L
      var b = 0
      while (b < bits) { if (sums(b) > 0) v |= (1L << b); b += 1 }
      java.lang.Long.valueOf(v)
    }
  }
}

case class SimhashFp(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[ArrayType] ||
      left.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"simhash_fp expects ARRAY<STRING> tokens, got ${left.dataType.catalogString}")
    else if (!right.foldable || right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("simhash_fp width must be a constant INT")
    else right.eval() match {
      case b: Integer if b >= 1 && b <= 60 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("simhash_fp width must be in [1, 60]")
    }

  override protected def nullSafeEval(toks: Any, bits: Any): Any =
    SimhashFpCore.fp(toks.asInstanceOf[ArrayData], bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val core = "graft.expressions.SimhashFpCore"
    nullSafeCodeGen(ctx, ev, (t, b) => {
      s"""Object r = $core.fp($t, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) r).longValue(); }
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimhashFp =
    copy(left = newLeft, right = newRight)
}
