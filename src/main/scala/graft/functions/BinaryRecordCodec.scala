package graft.functions

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Binary record codec — the engine's scodec analogue (reference A26).
  *
  * The reference types state-store records with scodec `Codec`s; its test
  * codec is `(variableSizeBytes(uint16, utf8) :: int32 :: bool).as[Record]`
  * (/root/reference/src/it/scala/KeyValueStoreSpec.scala:13-17). This
  * expression decodes exactly that wire format from a BinaryType column:
  *
  *   [len: uint16 BE][utf8 bytes: len][k: int32 BE][flag: 1 byte]
  *
  * Malformed input (short buffer, trailing bytes) decodes to NULL — the
  * errors-stay-in-stream contract (`error = input IS NOT NULL AND decoded
  * IS NULL`), same as Envelope.decodeJson.
  *
  * CodegenFallback: record decode is not a hot analytic path (it runs once
  * per ingested record, not per pair), so interpreted eval is fine; the
  * codegen-critical vector path has its own expression (VectorDot).
  */
case class BinaryRecordDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryRecordDecode.schema
  override def prettyName: String = "binary_record_decode"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length < 2) return null
    val len = ((bytes(0) & 0xff) << 8) | (bytes(1) & 0xff)
    val total = 2 + len + 4 + 1
    if (bytes.length != total) return null
    val s = UTF8String.fromBytes(bytes, 2, len)
    var o = 2 + len
    val k = ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
      ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    o += 4
    val flag = bytes(o) != 0
    InternalRow(s, k, flag)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level encoder for the same wire format — the scodec `Codec` is
  * bidirectional, so the engine's analogue must be too. Together with
  * [[BinaryRecordDecode]] this gives the round-trip law `decode(encode(r))
  * == r` as an executable query (q53), not just a JVM-side test.
  */
case class BinaryRecordEncode(i: Expression, k: Expression, bla: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(i, k, bla)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "binary_record_encode"

  override def eval(input: InternalRow): Any = {
    val iv = i.eval(input)
    val kv = k.eval(input)
    val bv = bla.eval(input)
    if (iv == null || kv == null || bv == null) null
    else BinaryRecordDecode.encode(
      iv.asInstanceOf[UTF8String].toString,
      kv.asInstanceOf[Int],
      bv.asInstanceOf[Boolean])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(i = newChildren(0), k = newChildren(1), bla = newChildren(2))
}

object BinaryRecordDecode {
  val schema: StructType = StructType(Seq(
    StructField("i", StringType),
    StructField("k", IntegerType),
    StructField("bla", BooleanType)))

  def decode(c: Column): Column =
    ColumnBridge.column(BinaryRecordDecode(ColumnBridge.expression(c)))

  def encodeCol(i: Column, k: Column, bla: Column): Column =
    ColumnBridge.column(BinaryRecordEncode(
      ColumnBridge.expression(i), ColumnBridge.expression(k),
      ColumnBridge.expression(bla)))

  /** Test-side encoder for the same layout (the reference encodes via
    * scodec; round-trip property: decode(encode(r)) == r).
    */
  def encode(i: String, k: Int, bla: Boolean): Array[Byte] = {
    val sb = i.getBytes(StandardCharsets.UTF_8)
    require(sb.length <= 0xffff, "uint16 length prefix")
    val out = new Array[Byte](2 + sb.length + 4 + 1)
    out(0) = ((sb.length >> 8) & 0xff).toByte
    out(1) = (sb.length & 0xff).toByte
    System.arraycopy(sb, 0, out, 2, sb.length)
    var o = 2 + sb.length
    out(o) = ((k >> 24) & 0xff).toByte
    out(o + 1) = ((k >> 16) & 0xff).toByte
    out(o + 2) = ((k >> 8) & 0xff).toByte
    out(o + 3) = (k & 0xff).toByte
    o += 4
    out(o) = if (bla) 1.toByte else 0.toByte
    out
  }
}
