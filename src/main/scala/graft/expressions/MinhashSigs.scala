package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The whole MinHash signature of a document in one JVM pass:
  * `sig_j = min over shingles of ((a_j·h + b_j) mod P)` for the fixed
  * permutation family (`a_j = 2j+3`, `b_j = 12289·(j+1)`,
  * `P = 2³¹−1` — [[graft.ops.DedupOps.permParams]]), over the 3-token
  * shingle hashes ([[WinnowMinsCore.shingleHashMod]] — hash60 % P,
  * shared with the winnowing expression so the shingle contract can
  * never drift). Documents with fewer than 3 tokens use the supplied
  * whole-document fallback hash as their single "shingle", exactly like
  * the exploded `shingleHashRows` form.
  *
  * Why native: the built-in shape explodes one row per shingle
  * occurrence and re-aggregates them doc-keyed with `numPerms` min
  * columns — correct and map-side-combined, but the explode + aggregate
  * machinery is pure overhead around a per-document loop. This emits
  * the finished signature struct from the scan projection: MAP-ONLY,
  * the one exchange left in the signature pipeline is the parallelism
  * repartition its caller chooses. Duplicate shingles are irrelevant to
  * a min, so occurrence-vs-distinct handling cannot diverge.
  *
  * Returns struct(sig_0 … sig_{n-1}), all BIGINT, never null. */
object MinhashSigsCore {
  private val P = 2147483647L // 2^31 - 1

  def sigs(arr: ArrayData, fallback: Long, n: Int): GenericInternalRow = {
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    def update(h: Long): Unit = {
      var j = 0
      while (j < n) {
        val v = ((2L * j + 3) * h + 12289L * (j + 1)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
    }
    val m = arr.numElements() - 2
    if (m <= 0) update(fallback)
    else {
      var i = 0
      while (i < m) { update(WinnowMinsCore.shingleHashMod(arr, i)); i += 1 }
    }
    val out = new Array[Any](n)
    var j = 0
    while (j < n) { out(j) = mins(j); j += 1 }
    new GenericInternalRow(out)
  }
}

case class MinhashSigs(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  private lazy val n: Int = third.eval().asInstanceOf[Number].intValue()

  override def dataType: DataType = StructType(
    (0 until n).map(j => StructField(s"sig_$j", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (!first.dataType.isInstanceOf[ArrayType] ||
      first.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs expects ARRAY<STRING> tokens, got ${first.dataType.catalogString}")
    else if (second.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("minhash_sigs fallback hash must be BIGINT")
    else if (!third.foldable || third.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("minhash_sigs numPerms must be a constant INT")
    else third.eval() match {
      case p: Integer if p >= 1 && p <= 64 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("minhash_sigs numPerms must be in [1, 64]")
    }

  override protected def nullSafeEval(toks: Any, fallback: Any, perms: Any): Any =
    MinhashSigsCore.sigs(toks.asInstanceOf[ArrayData],
      fallback.asInstanceOf[Long], perms.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, f, p) =>
      s"graft.expressions.MinhashSigsCore.sigs($t, $f, $p)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinhashSigs =
    copy(first = newFirst, second = newSecond, third = newThird)
}
