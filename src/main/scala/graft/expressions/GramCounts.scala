package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document n-gram count pre-aggregation over a token array — one JVM
  * pass per row, emitting `array<struct<s: string, c: bigint>>` of
  * (gram, within-doc occurrence count) in first-occurrence order.
  *
  * `mode` is a bit set: 1 = unigrams, 2 = adjacent bigrams (tokens joined
  * by a single space), 3 = both in one walk. Unigram strings never contain
  * a space and bigram strings always do, so a mode-3 caller can split the
  * exploded rows by `contains(' ')` — that disjointness is what lets
  * llm_collocations build its unigram AND bigram tables from ONE corpus
  * pass and ONE aggregation.
  *
  * Why native (r19; the same reasoning as [[RepetitionCore]]): the built-in
  * shape explodes one row per token/bigram OCCURRENCE and aggregates
  * corpus-wide, paying per-occurrence Generate rows, a corpus-scale
  * exchange before map-side partials can collapse, and (for multi-consumer
  * queries) a second tokenize pass. This collapses the within-document
  * repetition row-locally (always safe — the "pre-aggregation" of r6 rule
  * (b) that lost was CROSS-row (shingle, source) keying; within-row
  * grouping has no shuffle to defeat), so the explode downstream is
  * per-doc-DISTINCT scale and grouping keys stay exact strings — no hash
  * collision caveat, no string-resolution join-back, oracles unchanged.
  *
  * Null/empty contract: null and empty-string tokens are skipped entirely
  * (the `tokens_norm` tokenizer only yields `[""]` for an empty document,
  * which thus maps to an empty result — the `filter(element_at(_toks, 1)
  * =!= "")` guard becomes unnecessary). Bigram adjacency is RAW array
  * adjacency; a pair is emitted only when both members are non-empty
  * (with the engine tokenizer the two notions coincide). A null input
  * array yields null (nullSafeEval). */
object GramCountsCore {
  private val SPACE = UTF8String.fromString(" ")

  def counts(arr: ArrayData, mode: Int): ArrayData = {
    val n = arr.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]](Math.max(16, n * 2))
    def add(k: UTF8String): Unit = {
      val v = m.get(k)
      if (v == null) m.put(k, Array(1L)) else v(0) += 1L
    }
    val uni = (mode & 1) != 0
    val bi = (mode & 2) != 0
    var i = 0
    var prev: UTF8String = null
    while (i < n) {
      val t = arr.getUTF8String(i)
      val ok = t != null && t.numBytes() > 0
      if (ok && uni) add(t)
      if (bi && ok && prev != null) add(UTF8String.concatWs(SPACE, prev, t))
      prev = if (ok) t else null
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      // clone: unigram keys may reference the input array's backing bytes
      // (UnsafeArrayData inputs reuse buffers across rows); concat results
      // are already fresh, but one small copy per DISTINCT gram is cheap
      // insurance against every caller having to reason about buffer reuse.
      out(i) = new GenericInternalRow(Array[Any](e.getKey.clone(), e.getValue()(0)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `hash_counts(array<bigint>)` → `array<struct<h: bigint, c: bigint>>` of
  * (hash, within-row count) in first-occurrence order — [[GramCountsCore]]
  * for ready-hashed shingles (r20). Null elements are skipped; a null
  * array yields null. Makes per-(doc, hash) occurrence counts ROW-LOCAL,
  * deleting the near-unique-key (hash, doc) exchange the old
  * groupBy-after-explode paid (the r19 tfidf tf move, hash edition). */
object HashCountsCore {
  def counts(arr: org.apache.spark.sql.catalyst.util.ArrayData): ArrayData = {
    val n = arr.numElements()
    val m = new java.util.LinkedHashMap[java.lang.Long, Array[Long]](Math.max(16, n * 2))
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val k = java.lang.Long.valueOf(arr.getLong(i))
        val v = m.get(k)
        if (v == null) m.put(k, Array(1L)) else v(0) += 1L
      }
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(Array[Any](e.getKey.longValue(), e.getValue()(0)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class HashCounts(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "hash_counts"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash_counts expects ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(arr: Any): Any =
    HashCountsCore.counts(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.HashCountsCore.counts($a)")

  override protected def withNewChildInternal(newChild: Expression): HashCounts =
    copy(child = newChild)
}

/** `bigram_buckets(tokens, buckets)` → `array<struct<h: bigint, c: bigint>>`
  * of (DSIR feature bucket, within-doc count) in first-occurrence order
  * (r20): bucket = `hash60(tok_i || ' ' || tok_{i+1}) pmod buckets` via
  * the shared [[WinnowMinsCore.bigramHashRaw]] sha core — bit-identical
  * to the SQL form, so the oracle replays values unchanged. One JVM pass
  * per doc replaces the index-explode + per-occurrence
  * sha2→hex→conv→pmod chain AND makes the (doc, bucket) count row-local
  * (the r19 tfidf-tf move). Fewer than 2 tokens → empty; null array →
  * null. */
object BigramBucketsCore {
  def counts(arr: org.apache.spark.sql.catalyst.util.ArrayData, buckets: Long): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val m = new java.util.LinkedHashMap[java.lang.Long, Array[Long]](Math.max(16, n))
    var i = 0
    while (i < n - 1) {
      val b = java.lang.Long.valueOf(WinnowMinsCore.bigramHashRaw(arr, i) % buckets)
      val v = m.get(b)
      if (v == null) m.put(b, Array(1L)) else v(0) += 1L
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(Array[Any](e.getKey.longValue(), e.getValue()(0)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class BigramBuckets(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "bigram_buckets"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[ArrayType] ||
      left.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bigram_buckets expects ARRAY<STRING> tokens, got ${left.dataType.catalogString}")
    else if (!right.foldable || right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("bigram_buckets bucket count must be a constant BIGINT")
    else right.eval() match {
      case b: java.lang.Long if b >= 1 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bigram_buckets bucket count must be a non-null constant >= 1")
    }

  override protected def nullSafeEval(toks: Any, buckets: Any): Any =
    BigramBucketsCore.counts(toks.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      buckets.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, b) => s"graft.expressions.BigramBucketsCore.counts($t, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BigramBuckets =
    copy(left = newLeft, right = newRight)
}

case class GramCounts(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "gram_counts"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[ArrayType] ||
      left.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"gram_counts expects ARRAY<STRING> tokens, got ${left.dataType.catalogString}")
    else if (!right.foldable || right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("gram_counts mode must be a constant INT")
    else right.eval() match {
      case m: Integer if m >= 1 && m <= 3 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "gram_counts mode must be 1 (unigrams), 2 (bigrams) or 3 (both)")
    }

  override protected def nullSafeEval(toks: Any, mode: Any): Any =
    GramCountsCore.counts(toks.asInstanceOf[ArrayData], mode.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, m) => s"graft.expressions.GramCountsCore.counts($t, $m)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramCounts =
    copy(left = newLeft, right = newRight)
}
