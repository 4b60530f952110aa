package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of a single-space-separated string, in one pass.
  *
  * The built-in formulation (`split` → `transform(sequence…)` →
  * `concat_ws` → `array_distinct`) allocates a token array, evaluates its
  * lambda interpreted per shingle, concatenates per shingle, then dedups —
  * the dominant CPU cost of the text-dedup family. This expression walks
  * the string once, slices shingles directly (no per-token allocation
  * beyond the UTF8String views), and dedups inline. Semantics match the
  * built-in chain exactly (verified by DedupSpec + the q17/q19 oracles:
  * shingle = n consecutive space-separated tokens joined by ' ', distinct,
  * fewer-than-n-token documents → empty array).
  *
  * Generates real code (one static call per row) rather than extending
  * CodegenFallback: the body itself amortizes per shingle, but a fallback
  * expression anywhere in a projection collapses the WHOLE stage out of
  * whole-stage codegen and deoptimizes every sibling expression (the same
  * lesson as [[Md5Hash60]]).
  */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNGrams.evalNGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNGrams.evalNGrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNGrams {
  /** Static entry point shared by interpreted eval and generated code. */
  def evalNGrams(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = s.getBytes
    // token start offsets (single-space separated; empty string → 1 token)
    val starts = scala.collection.mutable.ArrayBuffer[Int](0)
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') starts += i + 1
      i += 1
    }
    val numToks = starts.length
    if (numToks < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var t = 0
    while (t + n <= numToks) {
      val from = starts(t)
      val until = if (t + n < numToks) starts(t + n) - 1 else bytes.length
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      t += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def distinctNGrams(c: Column, n: Int): Column =
    ColumnBridge.column(WordNGrams(ColumnBridge.expression(c), n))
}
