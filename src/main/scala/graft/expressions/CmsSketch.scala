package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch as a native Catalyst aggregate: a `depth × width` grid
  * of counters; each input hash increments one counter per depth row, and a
  * point estimate reads the MIN across its depth cells — an overestimate,
  * never an undercount. The buffer is a fixed `depth·width` long array per
  * group regardless of input cardinality, partials combine map-side, and
  * merge is element-wise addition — the frequency-sketch analog of the
  * bounded-state argument for [[KmvMins]]: `collect_list`-style exact
  * counting carries every distinct value through the shuffle; the sketch
  * carries a constant-size grid.
  *
  * Unlike most CMS implementations this one is fully deterministic AND
  * engine-portable: the input is a pre-computed 60-bit sha-derived hash
  * (`DedupOps.hash60`) and the per-depth bucket is the same integer
  * permutation family MinHash uses — `((a_d·(h mod p) + b_d) mod p) mod
  * width` with `a_d = 2d+3`, `b_d = 12289·(d+1)`, `p = 2^31-1` — so the
  * whole grid (and every estimate read from it) is reproducible in DuckDB
  * SQL and oracle-checked, not just "approximately right".
  */
case class CmsCounts(
    child: Expression,
    depthExpr: Expression,
    widthExpr: Expression,
    weightExpr: Option[Expression] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val P = 2147483647L // 2^31 - 1

  private lazy val depth: Int = depthExpr.eval().asInstanceOf[Number].intValue()
  private lazy val width: Int = widthExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] =
    Seq(child, depthExpr, widthExpr) ++ weightExpr
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!depthExpr.foldable || !widthExpr.foldable)
      TypeCheckResult.TypeCheckFailure("cms_counts depth/width must be constants")
    else if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_counts expects a BIGINT hash, got ${child.dataType.catalogString}")
    else if (weightExpr.exists(_.dataType != LongType))
      TypeCheckResult.TypeCheckFailure(
        s"cms_counts weight must be BIGINT, got ${weightExpr.get.dataType.catalogString}")
    else (depthExpr.eval(), widthExpr.eval()) match { // null would NPE intValue()
      case (d: Number, w: Number)
        if d.intValue() >= 1 && d.intValue() <= 16 && w.intValue() >= 2 &&
          d.longValue() * w.longValue() <= (1 << 24) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "cms_counts needs non-null constants: 1 <= depth <= 16, width >= 2, depth*width <= 2^24")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // Optional WEIGHT (r18): incrementing by w is bit-identical to w
      // unit updates of the same hash — it lets pre-aggregated
      // (value, count) rows feed the grid so the sketch input can be
      // vocabulary-scale instead of occurrence-scale (sk_cms_freq). A
      // NULL weight row contributes nothing (matches the null-hash rule).
      val w = weightExpr match {
        case None => 1L
        case Some(we) => we.eval(input) match {
          case null => 0L
          case x => x.asInstanceOf[Long]
        }
      }
      // floorMod: the SQL surface accepts any BIGINT (xxhash64 is negative
      // half the time); a signed % would index out of bounds at d=0 and
      // silently corrupt the previous depth row at d>=1. Non-negative
      // inputs (the engine's hash60) are unaffected.
      val hm = java.lang.Math.floorMod(v.asInstanceOf[Long], P)
      if (w != 0L) {
        var d = 0
        while (d < depth) {
          val bucket = (((2L * d + 3) * hm + 12289L * (d + 1)) % P % width).toInt
          buffer(d * width + bucket) += w
          d += 1
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
    val arr = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < arr.length) { arr(i) = bb.getLong; i += 1 }
    arr
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsCounts =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsCounts =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsCounts =
    copy(child = newChildren(0), depthExpr = newChildren(1), widthExpr = newChildren(2),
      weightExpr = newChildren.lift(3))
}
