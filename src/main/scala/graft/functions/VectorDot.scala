package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product of two float-vector columns, accumulating in
  * double.
  *
  * This is the one place the engine drops below `functions._`: the
  * higher-order-function formulation (`aggregate(zip_with(...))`) evaluates
  * its lambda interpreted per element — at 2M embedding pairs × 64 dims that
  * interpretation dominated the near-dup join (~220 s at sf0.1). This
  * expression generates a tight primitive loop inside whole-stage codegen
  * (~100× cheaper) and is the SIMD-friendly shape a columnar engine would
  * emit. Used for the non-oracle-facing fast paths (prefilters, ANN
  * scoring); hash-checked outputs still go through VectorFunctions.dotDec
  * for cross-engine exactness.
  *
  * Null semantics are HOF-strict: a NULL array, a length mismatch, or any
  * NULL element yields NULL — exactly what the declarative
  * aggregate(zip_with(...)) shape produces, which is what makes the
  * VectorDotRewrite substitution sound (see the doGenCode comment).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  // Strict HOF-equivalent semantics: length mismatch or a null element
  // yields NULL — exactly what aggregate(zip_with(a, b, ·*·), 0.0, ·+·)
  // produces (zip_with pads the short side with nulls; null poisons the
  // fold). This is what makes the VectorDotRewrite optimizer rule a
  // bit-for-bit-safe substitution, not just a dense-vector shortcut.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      VectorDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
