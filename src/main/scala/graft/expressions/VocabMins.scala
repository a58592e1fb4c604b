package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k (key, value) pairs by UTF8 binary key order with k-BOUNDED
  * aggregate state — `kmv_mins` for a string-keyed vocabulary. Keeps the k
  * lexicographically-smallest distinct keys (last value wins on a duplicate
  * key, which cannot occur on a grouped input) in a TreeMap of at most k
  * entries per partial, and returns `array<struct<tok,df>>` ascending by
  * key — the exact order `sort_array(collect_list(struct(tok, df)))`
  * produces and the `reffreq_stats` binary search needs.
  *
  * Purpose (r20, the r19 `kmv_mins` probe-and-fetch doctrine applied to
  * `TextOps.refFreqQuality`): called with k = cap+1, a result holding
  * ≤ cap entries IS the complete sorted vocabulary, while cap+1 entries
  * mean the vocab is over the driver cap and the join tiers take over —
  * one job, and no partial ever materializes more than cap+1 entries. The
  * `collect_list` fetch it replaces materialized the WHOLE vocabulary in
  * one aggregate row before the length check (the fetch-then-check hazard:
  * a caller-controlled minDf=1 on non-natural text defeats the Zipf-bound
  * rationale the old comment leaned on).
  */
case class VocabMins(
    keyExpr: Expression,
    valExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[UTF8String, Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(keyExpr, valExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("tok", StringType, nullable = false),
      StructField("df", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "vocab_mins"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("vocab_mins k must be a constant")
    else if (keyExpr.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"vocab_mins expects a STRING key, got ${keyExpr.dataType.catalogString}")
    else if (valExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"vocab_mins expects a BIGINT value, got ${valExpr.dataType.catalogString}")
    else kExpr.eval() match { // null k would NPE through intValue()
      case n: Number if n.intValue() >= 1 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("vocab_mins k must be a non-null constant >= 1")
    }

  override def createAggregationBuffer(): java.util.TreeMap[UTF8String, Long] =
    new java.util.TreeMap[UTF8String, Long]()

  override def update(buffer: java.util.TreeMap[UTF8String, Long],
                      input: InternalRow): java.util.TreeMap[UTF8String, Long] = {
    val kv = keyExpr.eval(input)
    val vv = valExpr.eval(input)
    if (kv != null && vv != null) {
      val key = kv.asInstanceOf[UTF8String]
      // only clone (copy out of the reused unsafe-row buffer) when the key
      // actually enters the map
      if (buffer.size < k || key.compareTo(buffer.lastKey()) < 0 ||
          buffer.containsKey(key)) {
        buffer.put(key.clone(), vv.asInstanceOf[Long])
        if (buffer.size > k) buffer.pollLastEntry()
      }
    }
    buffer
  }

  override def merge(buffer: java.util.TreeMap[UTF8String, Long],
                     other: java.util.TreeMap[UTF8String, Long]): java.util.TreeMap[UTF8String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buffer.put(e.getKey, e.getValue)
      if (buffer.size > k) buffer.pollLastEntry()
    }
    buffer
  }

  override def eval(buffer: java.util.TreeMap[UTF8String, Long]): Any = {
    val arr = new Array[Any](buffer.size)
    val it = buffer.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      arr(i) = new GenericInternalRow(Array[Any](e.getKey, e.getValue))
      i += 1
    }
    new GenericArrayData(arr) // TreeMap iterates ascending by key
  }

  override def serialize(buffer: java.util.TreeMap[UTF8String, Long]): Array[Byte] = {
    var bytes = 4
    val sz = buffer.entrySet().iterator()
    while (sz.hasNext) bytes += 4 + sz.next().getKey.numBytes() + 8
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buffer.size)
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      bb.putInt(kb.length); bb.put(kb); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val map = new java.util.TreeMap[UTF8String, Long]()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      map.put(UTF8String.fromBytes(kb), bb.getLong)
      i += 1
    }
    map
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VocabMins =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VocabMins =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VocabMins =
    copy(keyExpr = newChildren(0), valExpr = newChildren(1), kExpr = newChildren(2))
}
