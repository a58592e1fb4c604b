package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-minimum-values (KMV) distinct-count sketch as a native Catalyst
  * aggregate: keeps the `k` smallest DISTINCT values of a uniform hash and
  * returns them sorted ascending. The caller estimates the distinct count
  * as `(k-1) / R_k` where `R_k` is the k-th smallest hash normalized to
  * [0,1) — or reads the exact count when fewer than `k` distinct values
  * were seen (the sketch IS the distinct set then).
  *
  * Why an imperative aggregate and not `collect_set` + `slice(array_sort)`:
  * the buffer here is bounded at `k` longs per group on every executor, and
  * partial aggregation runs map-side — the shuffle carries at most `k`
  * values per (partition, group), never the distinct set. `collect_set`
  * carries ALL distinct values through the shuffle and materializes them
  * per group, which is exactly what a sketch exists to avoid at 100 TB.
  *
  * Deterministic given a deterministic hash (we feed it sha-256-derived
  * 60-bit hashes, `DedupOps.hash60`), so it is oracle-checkable — unlike
  * HyperLogLog-based `approx_count_distinct`, whose register layout is
  * engine-private. Mergeable by construction (union, keep k smallest), the
  * same property HLL offers.
  */
case class KmvMins(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_mins"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("kmv_mins k must be a constant")
    else if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"kmv_mins expects a BIGINT hash, got ${child.dataType.catalogString}")
    else kExpr.eval() match { // null k would NPE through intValue()
      case n: Number if n.intValue() >= 2 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("kmv_mins k must be a non-null constant >= 2")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buffer: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buffer.add(v.asInstanceOf[Long])
      if (buffer.size > k) buffer.pollLast() // keep the k smallest
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buffer.add(it.next())
      if (buffer.size > k) buffer.pollLast()
    }
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr) // TreeSet iterates ascending
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { set.add(bb.getLong); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMins =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMins =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvMins =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
