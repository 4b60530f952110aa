package graft.plans

import graft.functions.VectorDot
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the interpreted higher-order-function dot-product
  * shape
  *
  *   aggregate(zip_with(a, b, (x, y) => double(x) * double(y)), 0.0,
  *             (acc, v) => acc + v)
  *
  * over two `array<float>` columns into the codegen'd [[VectorDot]]
  * expression. The substitution is bit-for-bit: same IEEE ops in the same
  * sequential order, and VectorDot mirrors the HOF's null semantics
  * (length mismatch / null element ⇒ NULL). What changes is execution — a
  * primitive loop inside whole-stage codegen instead of per-element
  * interpreted lambda dispatch (~100× on 64-dim floats, see VectorDot).
  *
  * This is the engine's demonstration of SURVEY §7's extension ladder rung
  * (c): a `Rule[LogicalPlan]` injected through `SparkSessionExtensions`
  * (GraftExtensions) so USER-written declarative code silently gets the
  * fast path — the user never has to know VectorDot exists.
  */
object VectorDotRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  private def doubleCastOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case Cast(nv: NamedLambdaVariable, DoubleType, _, _) => nv.exprId == v.exprId
    case _ => false
  }

  /** (x, y) => double(x) * double(y), either operand order. */
  private def isCastMultiply(f: Expression, x: NamedLambdaVariable,
      y: NamedLambdaVariable): Boolean = f match {
    case Multiply(l, r, _) =>
      (doubleCastOf(l, x) && doubleCastOf(r, y)) ||
        (doubleCastOf(l, y) && doubleCastOf(r, x))
    case _ => false
  }

  /** (acc, v) => acc + v, either operand order (IEEE add commutes). */
  private def isAccAdd(f: Expression, acc: NamedLambdaVariable,
      v: NamedLambdaVariable): Boolean = f match {
    case Add(l, r, _) =>
      (sameVar(l, acc) && sameVar(r, v)) || (sameVar(l, v) && sameVar(r, acc))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(mult, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(addF, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(facc: NamedLambdaVariable), _))
          // bit-exact +0.0 check: -0.0 == 0.0 is true, but an empty-array
          // fold would return -0.0 where VectorDot returns +0.0
          if zero.isInstanceOf[Double] &&
            java.lang.Double.doubleToRawLongBits(zero.asInstanceOf[Double]) == 0L &&
            isFloatArray(a) && isFloatArray(b) &&
            isCastMultiply(mult, x, y) && isAccAdd(addF, acc, v) &&
            sameVar(fin, facc) =>
        VectorDot(a, b)
    }
}
