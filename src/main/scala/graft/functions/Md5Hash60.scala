package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  *
  * Generates real code (a call to the static [[Md5Hash60.eval60]] helper)
  * rather than extending CodegenFallback: a fallback expression anywhere in
  * a projection collapses the WHOLE stage out of whole-stage codegen, and
  * this hash sits inside the hottest token-scale projections in the repo
  * (q124 CDC boundaries, q128 winnowing, the minhash/simhash families).
  */
case class Md5Hash60(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash60"

  override def nullSafeEval(input: Any): Any =
    Md5Hash60.eval60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash60.eval60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash60 {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Static entry point shared by interpreted eval and generated code (the
    * Scala-object static forwarder makes it reachable as a plain Java
    * static call from janino).
    */
  def eval60(input: UTF8String): Long = {
    val d = digest.get().digest(input.getBytes)
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  def hash60(c: Column): Column =
    ColumnBridge.column(Md5Hash60(ColumnBridge.expression(c)))
}
