package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-state per-group top-k as a native Catalyst aggregate: keeps the
  * `k` best (score DESC, id ASC — deterministic tie-break) pairs per group
  * and returns them ordered. The scale argument is the same as
  * [[KmvMins]]'s: a window `row_number() <= k` sorts and shuffles EVERY
  * row of every group; this buffer holds at most `k` pairs per
  * (partition, group), partial-aggregates map-side, and the shuffle
  * carries only those — the difference between "top 3 of a billion-row
  * group" costing a billion-row sort and costing k·partitions pairs.
  *
  * Ties on (score, id) are impossible by construction (id is unique per
  * group in sane inputs) and deduplicated if not — the TreeSet keys on the
  * full pair. Deterministic, so oracle-checkable against a SQL window. */
case class TopKPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  // score DESC, id ASC; TreeSet iterates in this order, worst element last.
  // Explicit compares, not Ordering.by(-score): negation overflows for
  // Long.MinValue (-MinValue == MinValue) and would rank the worst score
  // first.
  private val ord: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    override def compare(x: (Long, Long), y: (Long, Long)): Int = {
      val s = java.lang.Long.compare(y._1, x._1)
      if (s != 0) s else java.lang.Long.compare(x._2, y._2)
    }
  }

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_pairs"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("topk_pairs k must be a constant")
    else if (scoreExpr.dataType != LongType || idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_pairs expects (BIGINT score, BIGINT id), got " +
          s"(${scoreExpr.dataType.catalogString}, ${idExpr.dataType.catalogString})")
    else kExpr.eval() match { // null k would NPE through intValue()
      case n: Number if n.intValue() >= 1 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("topk_pairs k must be a non-null constant >= 1")
    }

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](ord)

  override def update(buffer: java.util.TreeSet[(Long, Long)],
                      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buffer.add((s.asInstanceOf[Long], i.asInstanceOf[Long]))
      if (buffer.size > k) buffer.pollLast()
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[(Long, Long)],
                     other: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) {
      buffer.add(it.next())
      if (buffer.size > k) buffer.pollLast()
    }
    buffer
  }

  override def eval(buffer: java.util.TreeSet[(Long, Long)]): Any = {
    val arr = new Array[Any](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) {
      val (s, id) = it.next()
      arr(i) = new GenericInternalRow(Array[Any](s, id))
      i += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(buffer: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) { val (s, i) = it.next(); bb.putLong(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.TreeSet[(Long, Long)](ord)
    var i = 0
    while (i < n) { set.add((bb.getLong, bb.getLong)); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}

/** [[TopKPairs]] carrying an opaque per-row payload (`tag`) that rides along
  * but never participates in the ordering — the shape the IVF top-k needs,
  * where each candidate's cluster id must survive into the result without a
  * join-back against the (corpus-scale) assignment table. Ordering and
  * bounded-state semantics are identical to [[TopKPairs]]: k best
  * (score DESC, id ASC) triples per group, partial-aggregated map-side. The
  * comparator keys on (score, id) only; id is unique per group in every
  * caller, so a tag can never be the deciding field. */
case class TopKPairsTagged(
    scoreExpr: Expression,
    idExpr: Expression,
    tagExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long, Long)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  // score DESC, id ASC; tag is payload, never compared (see class doc).
  private val ord: Ordering[(Long, Long, Long)] = new Ordering[(Long, Long, Long)] {
    override def compare(x: (Long, Long, Long), y: (Long, Long, Long)): Int = {
      val s = java.lang.Long.compare(y._1, x._1)
      if (s != 0) s else java.lang.Long.compare(x._2, y._2)
    }
  }

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, tagExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("tag", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_pairs_tag"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("topk_pairs_tag k must be a constant")
    else if (scoreExpr.dataType != LongType || idExpr.dataType != LongType ||
      tagExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_pairs_tag expects (BIGINT score, BIGINT id, BIGINT tag), got " +
          s"(${scoreExpr.dataType.catalogString}, ${idExpr.dataType.catalogString}, " +
          s"${tagExpr.dataType.catalogString})")
    else kExpr.eval() match {
      case n: Number if n.intValue() >= 1 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("topk_pairs_tag k must be a non-null constant >= 1")
    }

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long, Long)] =
    new java.util.TreeSet[(Long, Long, Long)](ord)

  override def update(buffer: java.util.TreeSet[(Long, Long, Long)],
                      input: InternalRow): java.util.TreeSet[(Long, Long, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    val t = tagExpr.eval(input)
    if (s != null && i != null && t != null) {
      buffer.add((s.asInstanceOf[Long], i.asInstanceOf[Long], t.asInstanceOf[Long]))
      if (buffer.size > k) buffer.pollLast()
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[(Long, Long, Long)],
                     other: java.util.TreeSet[(Long, Long, Long)]): java.util.TreeSet[(Long, Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) {
      buffer.add(it.next())
      if (buffer.size > k) buffer.pollLast()
    }
    buffer
  }

  override def eval(buffer: java.util.TreeSet[(Long, Long, Long)]): Any = {
    val arr = new Array[Any](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) {
      val (s, id, t) = it.next()
      arr(i) = new GenericInternalRow(Array[Any](s, id, t))
      i += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(buffer: java.util.TreeSet[(Long, Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 24 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) {
      val (s, i, t) = it.next(); bb.putLong(s); bb.putLong(i); bb.putLong(t)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.TreeSet[(Long, Long, Long)](ord)
    var i = 0
    while (i < n) { set.add((bb.getLong, bb.getLong, bb.getLong)); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsTagged =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsTagged =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairsTagged =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1), tagExpr = newChildren(2),
      kExpr = newChildren(3))
}
