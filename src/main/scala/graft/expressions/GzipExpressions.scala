package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Native Catalyst expressions for gzip compress/decompress (F5).
  *
  * The reference requires gzip in two hot paths (payload compression before
  * HTTP/broker publish — Source/Helpers/Gzip.cs:9-18, MessageQueueService.cs
  * :142-151). A Scala UDF works but pays per-row serialization and blocks
  * whole-stage codegen around the call; these expressions generate a direct
  * static call inside the produced code, so the surrounding projection stays
  * in one codegen span — the "(b) custom Catalyst Expression beats a UDF"
  * rung of the extension ladder.
  */
object GzipCodec {
  def compress(input: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(input); gz.close()
    bos.toByteArray
  }

  def decompress(input: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(input))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }
}

case class GzipCompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gzip expects BINARY, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    GzipCodec.compress(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.GzipCodec.compress($c)")

  override protected def withNewChildInternal(newChild: Expression): GzipCompress =
    copy(child = newChild)
}

case class GzipDecompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gunzip expects BINARY, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    GzipCodec.decompress(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.GzipCodec.decompress($c)")

  override protected def withNewChildInternal(newChild: Expression): GzipDecompress =
    copy(child = newChild)
}
