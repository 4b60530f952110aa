package graft.plans

import graft.functions.{BinaryRecordDecode, VectorDot}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions wiring: registers graft's custom Catalyst
  * expressions as SQL functions, so `spark.sql("... vec_dot(a, b) ...")`
  * works next to the Column API. Installed by Engine.configure via
  * `withExtensions` — the injection point a deployment would use to ship
  * the engine as a plain Spark extension jar
  * (`spark.sql.extensions=graft.plans.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("binary_record_decode"),
      new ExpressionInfo(classOf[BinaryRecordDecode].getName, "binary_record_decode"),
      (exprs: Seq[Expression]) => BinaryRecordDecode(exprs.head)))
    // Spark keeps BloomFilterMightContain internal (runtime filters only);
    // surfacing it lets SQL users apply a pre-built filter:
    // `might_contain(bf_bytes, xxhash64(key))` (cf. functions.BloomFilters)
    e.injectFunction((
      new FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (exprs: Seq[Expression]) => {
        // explicit arity error — ad-hoc SQL is this function's audience
        require(exprs.length == 2,
          s"might_contain(filter_binary, xxhash64(key)) takes 2 arguments, got ${exprs.length}")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs.head, exprs(1))
      }))
    // user-written HOF dot products silently get the codegen'd loop
    e.injectOptimizerRule(_ => VectorDotRewrite)
  }
}
