package graft.plans

import graft.functions.{BinaryRecordDecode, Md5Hash60, VectorDot, WordNGrams}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

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
    // the engine's stable 60-bit digest, SQL-side: md5_hash60(s) ≡ DuckDB's
    // ('0x' || substr(md5(s), 1, 15))::BIGINT — the hash every fingerprint
    // family keys on (Md5Hash60Spec pins the conv-formulation equality)
    e.injectFunction((
      new FunctionIdentifier("md5_hash60"),
      new ExpressionInfo(classOf[Md5Hash60].getName, "md5_hash60"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"md5_hash60(s) takes 1 argument, got ${exprs.length}")
        Md5Hash60(exprs.head)
      }))
    // single-pass distinct word n-grams: word_ngrams(text, n) with a
    // literal n (the shingle width is plan-time structure, not data)
    e.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"word_ngrams(text, n) takes 2 arguments, got ${exprs.length}")
        val n = exprs(1) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"word_ngrams n must be an integer literal, got $other")
        }
        WordNGrams(exprs.head, n)
      }))
    // user-written HOF dot products silently get the codegen'd loop
    e.injectOptimizerRule(_ => VectorDotRewrite)
  }
}
