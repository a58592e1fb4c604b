package graft.expressions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Winnowing fingerprint minima over a token array — the distinct
  * per-window minima of the 3-token shingle hashes (Schleimer/Wilkerson/
  * Aiken MOSS winnowing), as `array<bigint>`, one JVM pass per row.
  *
  * Why native: the built-in formulation explodes one row per window
  * position and re-hashes every shingle once PER WINDOW it overlaps (w×
  * redundant sha256, measured in the dedup_winnow warm floor), then
  * `distinct()`s position-scale rows. This hashes each shingle exactly
  * once, slides the window in place, and emits the already-distinct
  * minima set — the explode downstream is minima-scale, not
  * position-scale.
  *
  * Hash contract (oracle-portable): identical to the engine-wide `hash60`
  * — `conv(substring(sha2(shingle, 256), 1, 15), 16, 10) % (2^31-1)` with
  * the shingle = three consecutive tokens joined by single spaces. The
  * JVM reproduces it as the first 15 hex chars of the SHA-256 digest
  * parsed base-16 (< 2^60, so the parse never overflows), mod the same
  * Mersenne prime.
  *
  * Callers handle the under-3-token fallback (whole-doc hash) — with
  * fewer than 3 tokens there are no shingles and this returns an empty
  * array. Window semantics mirror the exploded form: positions
  * `0..max(m-w, 0)` over `m` shingles, each window clipped at `m`. */
object WinnowMinsCore {
  private val P = 2147483647L // 2^31 - 1 (DedupOps.MersennePrime31)
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("SHA-256")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  /** First 15 hex chars of sha256(bytes) parsed base-16 — byte-identical
    * to the engine-wide `conv(substring(sha2(s,256),1,15),16,10)`. */
  def hash60Raw(bytes: Array[Byte]): Long = {
    val d = digest.get()
    d.reset()
    val h = d.digest(bytes)
    // 15 hex chars = 7.5 bytes: bytes 0..6 fully, high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xf0L) >> 4)
  }

  /** [[hash60Raw]] mod 2^31-1 — the shingle-hash form (`hash60(s) % P`). */
  def hash60Mod(bytes: Array[Byte]): Long = hash60Raw(bytes) % P

  /** hash60 % P of the 3-token shingle starting at `i` — tokens joined by
    * single spaces, null elements dropped like concat_ws skips null args;
    * the all-non-null fast path stays allocation-light. Shared by
    * [[WinnowMins]] and [[MinhashSigs]] so the shingle-hash contract can
    * never drift between them. */
  def shingleHashMod(arr: org.apache.spark.sql.catalyst.util.ArrayData, i: Int): Long = {
    val t0 = arr.getUTF8String(i)
    val t1 = arr.getUTF8String(i + 1)
    val t2 = arr.getUTF8String(i + 2)
    val buf = if (t0 != null && t1 != null && t2 != null) {
      val b0 = t0.getBytes; val b1 = t1.getBytes; val b2 = t2.getBytes
      val b = new Array[Byte](b0.length + b1.length + b2.length + 2)
      System.arraycopy(b0, 0, b, 0, b0.length)
      b(b0.length) = ' '
      System.arraycopy(b1, 0, b, b0.length + 1, b1.length)
      b(b0.length + 1 + b1.length) = ' '
      System.arraycopy(b2, 0, b, b0.length + 2 + b1.length, b2.length)
      b
    } else {
      val parts = Seq(t0, t1, t2).filter(_ != null).map(_.getBytes)
      val b = new Array[Byte](parts.map(_.length).sum + Math.max(parts.size - 1, 0))
      var off = 0
      parts.zipWithIndex.foreach { case (p, j) =>
        if (j > 0) { b(off) = ' '; off += 1 }
        System.arraycopy(p, 0, b, off, p.length)
        off += p.length
      }
      b
    }
    hash60Mod(buf)
  }

  /** Raw hash60 (NO % P) of the 2-token gram starting at `i` — tokens
    * joined by a single space, null elements dropped like concat_ws.
    * The DSIR feature hash (`hash60(concat_ws(' ', t1, t2))`). */
  def bigramHashRaw(arr: org.apache.spark.sql.catalyst.util.ArrayData, i: Int): Long = {
    val t0 = arr.getUTF8String(i)
    val t1 = arr.getUTF8String(i + 1)
    val buf = if (t0 != null && t1 != null) {
      val b0 = t0.getBytes; val b1 = t1.getBytes
      val b = new Array[Byte](b0.length + b1.length + 1)
      System.arraycopy(b0, 0, b, 0, b0.length)
      b(b0.length) = ' '
      System.arraycopy(b1, 0, b, b0.length + 1, b1.length)
      b
    } else if (t0 != null) t0.getBytes
    else if (t1 != null) t1.getBytes
    else Array.empty[Byte]
    hash60Raw(buf)
  }

  def mins(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    val m = n - 2
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // hash each shingle exactly once ([[shingleHashMod]] — shared with
    // MinhashSigs; null elements dropped like concat_ws, review catch)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      hs(i) = shingleHashMod(arr, i)
      i += 1
    }
    val out = new java.util.LinkedHashSet[Long]()
    val lastStart = Math.max(m - w, 0)
    var start = 0
    while (start <= lastStart) {
      var mn = Long.MaxValue
      var j = start
      val end = Math.min(start + w, m)
      while (j < end) { if (hs(j) < mn) mn = hs(j); j += 1 }
      out.add(mn)
      start += 1
    }
    val res = new Array[Any](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { res(i) = it.next(); i += 1 }
    new GenericArrayData(res)
  }
}

/** All 3-token shingle hashes of a token array, in position order, as
  * `array<bigint>` — one JVM pass per row (r18; VERDICT r17 tasks 2/3).
  *
  * Why native: [[graft.ops.DedupOps.shingleHashRows]] fronted every
  * shingle-family operator (source dup rollup, decontamination, Jaccard
  * verify, KMV source overlap) with an index explode whose per-OCCURRENCE
  * work was `conv(substring(sha2(concat_ws(...)), 1, 15), 16, 10) % P` —
  * a UTF8String concat allocation, a hex-string digest render, a
  * base-16 string parse and a substring per shingle. This computes the
  * digest over the raw token bytes and parses nothing ([[WinnowMinsCore
  * .hash60Mod]] — the first 7.5 digest bytes ARE the 15-hex-char value),
  * hashing each shingle exactly once; the explode downstream carries
  * ready longs. Same hash contract as winnow_mins/minhash_sigs via the
  * shared [[WinnowMinsCore.shingleHashMod]], so the SQL oracles replay
  * values unchanged.
  *
  * Under 3 tokens there are no shingles — returns an empty array; callers
  * keep the whole-doc-hash fallback (the `shingleHashRows` contract). */
object ShingleHashesCore {
  def hashes(arr: ArrayData): ArrayData = {
    val m = arr.numElements() - 2
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = java.lang.Long.valueOf(WinnowMinsCore.shingleHashMod(arr, i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class ShingleHashes(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects ARRAY<STRING> tokens, got ${other.catalogString}")
  }

  override protected def nullSafeEval(toks: Any): Any =
    ShingleHashesCore.hashes(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expressions.ShingleHashesCore.hashes($t)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

case class WinnowMins(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[ArrayType] ||
      left.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"winnow_mins expects ARRAY<STRING> tokens, got ${left.dataType.catalogString}")
    else if (!right.foldable || right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("winnow_mins window must be a constant INT")
    else right.eval() match {
      case w: Integer if w >= 2 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("winnow_mins window must be >= 2")
    }

  override protected def nullSafeEval(toks: Any, w: Any): Any =
    WinnowMinsCore.mins(toks.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) => s"graft.expressions.WinnowMinsCore.mins($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WinnowMins =
    copy(left = newLeft, right = newRight)
}
