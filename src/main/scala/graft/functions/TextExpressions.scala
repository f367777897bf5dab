package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects array<string> and n>=1, got " +
        s"${child.dataType.simpleString}, n=$n")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShinglesExpr.compute(input.asInstanceOf[ArrayData], n)

  /** Static-call codegen: the surrounding stage stays in whole-stage
    * codegen (a CodegenFallback would split the generated projection). */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordShinglesExpr.compute($a, $n);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WordShinglesExpr {
  private val sep = UTF8String.fromString(" ")

  /** One pass, sliding window, insertion-ordered dedup. */
  def compute(words: ArrayData, n: Int): ArrayData = {
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
}

/** Polynomial rolling hash (Rabin–Karp) over a string's code points:
  * h_{i+1} = (h_i * B + c_{i+1}) mod M with B=31, M=2³¹−1. M is small
  * enough that the recurrence is exact in BOTH 64-bit integer arithmetic
  * (here) and DuckDB's BIGINT `list_reduce` (the oracle replicates the
  * identical recurrence) — the determinism constraint that rules out a
  * 64-bit modulus. The incremental form is what makes k-gram winnowing
  * fingerprints O(n) at scale. */
case class RollingHashExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects string, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHashExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RollingHashExpr.compute($a);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RollingHashExpr {
  private val M = 2147483647L // 2^31 - 1
  private val B = 31L

  def compute(u: UTF8String): Long = {
    val s = u.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * B + cp) % M
      i += Character.charCount(cp)
    }
    h
  }
}

/** One-pass hashed bag-of-words bucketing: text → array<bigint> of
  * per-token feature buckets — the codegen'd twin of
  * [[graft.ops.HashedLinear.bucketsExprSql]]'s triple-nested
  * higher-order functions (transform ∘ aggregate ∘ transform ∘ split),
  * which evaluate INTERPRETED with one lambda frame and one single-char
  * UTF8String allocation per character of every document. This walks
  * the string once with zero per-char allocation and the IDENTICAL
  * arithmetic, so results are bit-equal (pinned by test) and the DuckDB
  * oracles replaying the HOF formulation in SQL stay authoritative.
  *
  * Replicated semantics of the HOF chain (probed empirically, r20):
  *  - `split(text, ' ')` is a limit=-1 regex split on a single space:
  *    consecutive / leading / trailing spaces yield EMPTY tokens, all
  *    kept; empty input is ONE empty token. So token count is always
  *    (number of spaces + 1).
  *  - `ascii(c)` over `split(t, '')` folds per Unicode CODE POINT (a
  *    non-BMP char is one element, its full code point the value); an
  *    empty token folds [ascii('') = 0] → (0·31+0) mod M = 0, the same
  *    value as folding zero chars, so the empty-token case needs no
  *    special branch.
  *  - fold: h ← (h·31 + cp) mod 1000003, then bucket = h mod `buckets`
  *    (all operands non-negative — Scala %, Spark % and DuckDB % agree).
  */
case class TokenBucketsExpr(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if buckets >= 1 => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"token_buckets expects string and buckets>=1, got " +
        s"${dt.simpleString}, buckets=$buckets")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_buckets"

  override def nullSafeEval(input: Any): Any =
    TokenBucketsExpr.compute(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokenBucketsExpr.compute($a, $buckets);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TokenBucketsExpr {
  private val M = 1000003L
  private val B = 31L

  def compute(u: UTF8String, buckets: Int): ArrayData = {
    val s = u.toString
    val n = s.length
    var count = 1
    var i = 0
    while (i < n) { if (s.charAt(i) == ' ') count += 1; i += 1 }
    val out = new Array[Long](count)
    var h = 0L
    var k = 0
    i = 0
    while (i < n) {
      if (s.charAt(i) == ' ') {
        out(k) = h % buckets
        k += 1
        h = 0L
        i += 1
      } else {
        val cp = s.codePointAt(i)
        h = (h * B + cp) % M
        i += Character.charCount(cp)
      }
    }
    out(k) = h % buckets
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

object TextExpressions {
  def wordShingles(words: Column, n: Int): Column =
    GraftColumnBridge.column(
      WordShinglesExpr(GraftColumnBridge.expression(words), n))

  def rollingHash(text: Column): Column =
    GraftColumnBridge.column(
      RollingHashExpr(GraftColumnBridge.expression(text)))

  def tokenBuckets(text: Column, buckets: Int): Column =
    GraftColumnBridge.column(
      TokenBucketsExpr(GraftColumnBridge.expression(text), buckets))
}
