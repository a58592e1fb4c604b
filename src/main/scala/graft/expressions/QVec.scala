package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Int64 dot product / squared-L2 of two quantized BIGINT vectors as native
  * expressions — ONE compiled JVM loop per row.
  *
  * Why native: these are the innermost kernels of every pair stage
  * (semanticDedup's within-cell pruning, embeddingNearDup's candidate
  * verify, IVF/PQ scoring) where each evaluation touches `dim` elements.
  * The HOF formulation `aggregate(zip_with(a, b, ...), ...)` runs its
  * lambdas INTERPRETED — ~1 µs per element evaluation (round-9 rule a) —
  * so a 64-dim pair filter pays ~128 interpreted evals per PAIR; the
  * native loop is two orders of magnitude cheaper and participates in
  * whole-stage codegen via `doGenCode` (round-10 s5 rule a: the same
  * reshape won 2.5-10× on pair_structs/winnow_mins/simhash_fp).
  *
  * Null semantics REPLICATE the HOF forms bit-for-bit, so swapping them in
  * is invisible to results and to the DuckDB oracles:
  *  - either input NULL → NULL (BinaryExpression default);
  *  - unequal lengths → NULL (zip_with pads with null → null product →
  *    null sum);
  *  - any NULL element → NULL (null propagates through the lambda sum).
  */
object QVecCore {
  def dot(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  def dist2(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}

sealed abstract class QVecBinary extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<BIGINT> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  protected def coreMethod: String

  override protected def nullSafeEval(a: Any, b: Any): Any = null // overridden

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""Object r = graft.expressions.QVecCore.$coreMethod($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) r).longValue(); }
         |""".stripMargin
    })
}

case class QDot(left: Expression, right: Expression) extends QVecBinary {
  override def prettyName: String = "qdot_q"
  override protected def coreMethod: String = "dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    QVecCore.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QDot =
    copy(left = l, right = r)
}

case class QDist2(left: Expression, right: Expression) extends QVecBinary {
  override def prettyName: String = "qdist2_q"
  override protected def coreMethod: String = "dist2"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    QVecCore.dist2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QDist2 =
    copy(left = l, right = r)
}
