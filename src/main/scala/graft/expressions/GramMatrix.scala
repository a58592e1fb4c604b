package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Gram (uncentered covariance) matrix of integer-quantized vectors as a
  * native Catalyst aggregate: for rows holding an `ARRAY<BIGINT>` of fixed
  * length `dim`, accumulates `G[i·dim + j] = Σ_rows q_i · q_j` and returns
  * the flattened `dim²` row-major matrix.
  *
  * Why an imperative aggregate and not explode-and-groupBy: the buffer is
  * bounded at `dim²` longs per partial on every executor and the inner
  * double loop is ONE compiled JVM loop per row (round-9 rule a — a
  * 64-dim row costs 4096 multiply-adds in tight code, where the
  * posexplode×posexplode formulation materializes 4096 shuffle-bound rows
  * per input row and the HOF formulation pays ~1 µs per interpreted
  * lambda element). Map-side partial aggregation means the shuffle
  * carries exactly one `dim²` array per partition — corpus size never
  * appears in the plan's exchanged bytes.
  *
  * Deterministic (integer addition commutes), so it is oracle-checkable:
  * DuckDB replays the same sums with a `range(dim) × range(dim)` lateral
  * (see the `ann_pca_power` oracle). Overflow headroom: entries are
  * bounded by `N · max(q)²`; at quantization scale 1000 over unit-norm-ish
  * embeddings (|q| ≤ ~600) that is safe through N ≈ 2.5·10¹³ rows — past
  * that, shard the corpus and merge normalized matrices.
  *
  * Rows whose array is NULL, not exactly `dim` elements, or containing any
  * NULL element are skipped (ragged vectors are an upstream integrity
  * failure, not a crash site — `ann_integrity` audits them; a NULL element
  * would NPE through `toLongArray` on GenericArrayData or silently read a
  * 0 slot on UnsafeArrayData, so it is checked explicitly).
  */
case class GramMatrix(
    child: Expression,
    dimExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val dim: Int = dimExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, dimExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_matrix"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!dimExpr.foldable)
      TypeCheckResult.TypeCheckFailure("gram_matrix dim must be a constant")
    else if (!(child.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }))
      TypeCheckResult.TypeCheckFailure(
        s"gram_matrix expects ARRAY<BIGINT>, got ${child.dataType.catalogString}")
    else dimExpr.eval() match { // null dim would NPE through intValue()
      case n: Number if n.intValue() >= 1 && n.intValue() <= 4096 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "gram_matrix dim must be a non-null constant in [1, 4096]")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim * dim)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var hasNull = false
      if (arr.numElements() == dim) {
        var k = 0
        while (k < dim && !hasNull) { hasNull = arr.isNullAt(k); k += 1 }
      }
      if (arr.numElements() == dim && !hasNull) {
        val q = arr.toLongArray()
        var i = 0
        while (i < dim) {
          val qi = q(i)
          val base = i * dim
          var j = 0
          while (j < dim) { buffer(base + j) += qi * q(j); j += 1 }
          i += 1
        }
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramMatrix =
    copy(child = newChildren(0), dimExpr = newChildren(1))
}
