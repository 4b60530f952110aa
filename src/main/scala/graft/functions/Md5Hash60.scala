package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** First 60 bits of md5 as a non-negative long — bit-identical to the SQL
  * formulation `conv(substring(md5(x), 1, 15), 16, 10)` (= DuckDB's
  * `('0x' || substr(md5(x), 1, 15))::BIGINT`) but computed straight off the
  * digest bytes: the hex-string render + substring + base-16 reparse per
  * value was the remaining per-token cost in the simhash/fingerprint paths.
  * First 15 hex digits = first 7.5 bytes big-endian = (first 8 bytes as
  * unsigned BE long) >>> 4.
  */
case class Md5Hash60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash60"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val d = Md5Hash60.digest.get().digest(bytes)
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash60 {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def hash60(c: Column): Column =
    ColumnBridge.column(Md5Hash60(ColumnBridge.expression(c)))
}
