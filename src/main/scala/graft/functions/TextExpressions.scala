package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass distinct word-n-gram shingling as a native expression.
  *
  * The built-ins-only formulation (transform ∘ sequence ∘ slice ∘
  * concat_ws ∘ array_distinct) allocates one lambda frame + slice array
  * per shingle in the interpreted higher-order-function evaluator; this
  * expression walks the token array once with a sliding window and
  * dedups via an insertion-ordered set — same output, same
  * first-occurrence order as array_distinct. Shingling sits under all
  * three near-dup queries, so it's the second measured hot spot
  * (after the dot product) worth a custom Catalyst node.
  */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects array<string> and n>=1, got " +
        s"${child.dataType.simpleString}, n=$n")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { window(j) = words.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, window: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextExpressions {
  def wordShingles(words: Column, n: Int): Column =
    GraftColumnBridge.column(
      WordShinglesExpr(GraftColumnBridge.expression(words), n))
}
