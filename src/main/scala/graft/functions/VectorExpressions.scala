package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the vector hot path (SURVEY.md §7.3's
  * one justified escalation): the higher-order-function formulation
  * (`aggregate(zip_with(...))`) is evaluated interpreted, outside
  * whole-stage codegen — measured 14s for the IVF search at sf0.1. This
  * expression emits a tight primitive-double loop into the generated
  * code, with arithmetic IDENTICAL to the fold (ascending index,
  * s += a[i]*b[i]) so results stay bit-equal to the DuckDB oracle.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Codegen'd scaled squared distance Σ_i (n·x_i − s_i)² over two
  * `array<bigint>` columns and a `bigint` scale — the inner loop of every
  * centroid/codeword distance in the vector family (KMeans.assign, the
  * IVF probe, PQ train/encode/ADC tables, the exact-baseline d2 of the
  * recall audits with n = 1). The higher-order twin
  * `aggregate(zip_with(q, sv, (x, s) -> (x*n − s)²), 0L, +)` evaluates
  * OUTSIDE whole-stage codegen (HOFs are interpreted and allocate an
  * intermediate array per row pair); this expression emits a tight
  * primitive-long loop with arithmetic IDENTICAL to the fold — ascending
  * index, exact Long ops (`Math.multiplyExact`/`addExact`, matching the
  * ANSI-mode overflow throw of the lambda's Multiply/Add; the documented
  * |q| ≤ 127 magnitude bounds keep every registered input far from the
  * edge) — so results are bit-equal and the DuckDB oracles replaying the
  * HOF formulation stay authoritative.
  *
  * Null semantics mirror the HOF twin exactly: any NULL input → NULL
  * (nullSafeEval), a NULL element in either array → NULL (zip_with's
  * lambda nulls the term, the fold propagates it), and a LENGTH MISMATCH
  * → NULL (zip_with pads the shorter side with nulls → every padded term
  * is null → the sum is null). */
case class ScaledSqDistExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (arr(first.dataType) && arr(second.dataType) &&
        third.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sqdist expects (array<bigint>, array<bigint>, bigint), got " +
        s"${first.dataType.simpleString} / ${second.dataType.simpleString}" +
        s" / ${third.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sqdist"
  override def nullable: Boolean = true

  override def nullSafeEval(xv: Any, sv: Any, nv: Any): Any = {
    val x = xv.asInstanceOf[ArrayData]
    val s = sv.asInstanceOf[ArrayData]
    val n = nv.asInstanceOf[Long]
    val len = x.numElements()
    if (len != s.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < len) {
      if (x.isNullAt(i) || s.isNullAt(i)) return null
      val t = Math.subtractExact(
        Math.multiplyExact(x.getLong(i), n), s.getLong(i))
      acc = Math.addExact(acc, Math.multiplyExact(t, t))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val acc = ctx.freshName("acc")
      val t = ctx.freshName("t")
      val bad = ctx.freshName("bad")
      s"""
         |int $len = $a.numElements();
         |boolean $bad = $len != $b.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $len && !$bad; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    $bad = true;
         |  } else {
         |    long $t = java.lang.Math.subtractExact(
         |      java.lang.Math.multiplyExact($a.getLong($i), $c),
         |      $b.getLong($i));
         |    $acc = java.lang.Math.addExact(
         |      $acc, java.lang.Math.multiplyExact($t, $t));
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(newFirst, newSecond, newThird)
}

/** Codegen'd Long dot product Σ_i a_i·b_i over `array<bigint>` columns —
  * the integer twin of [[DotProductExpr]] for the self-dot/dot-identity
  * sites (coreset seeding's `saa` and center-distance). Same exactness
  * and null contract as [[ScaledSqDistExpr]]: exact Long arithmetic in
  * ascending-index order, NULL on null element or length mismatch —
  * bit-equal to `aggregate(zip_with(a, b, _*_), 0L, _+_)`. */
case class DotLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot_long expects array<bigint> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"
  override def nullable: Boolean = true

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val x = av.asInstanceOf[ArrayData]
    val y = bv.asInstanceOf[ArrayData]
    val len = x.numElements()
    if (len != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < len) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc = Math.addExact(acc,
        Math.multiplyExact(x.getLong(i), y.getLong(i)))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $len = $a.numElements();
         |boolean $bad = $len != $b.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $len && !$bad; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    $bad = true;
         |  } else {
         |    $acc = java.lang.Math.addExact(
         |      $acc, java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i)));
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object VectorExpressions {

  /** Codegen'd dot product over ArrayType(DoubleType) columns. */
  def graftDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Codegen'd scaled squared distance Σ(n·x − s)² over array<bigint>. */
  def scaledSqDist(x: Column, sv: Column, n: Column): Column =
    GraftColumnBridge.column(ScaledSqDistExpr(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(sv),
      GraftColumnBridge.expression(n)))

  /** Codegen'd Long dot product Σ a·b over array<bigint>. */
  def dotLong(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotLongExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Optional SQL registration: `SELECT graft_dot(a, b)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProductExpr(exprs.head, exprs(1)),
      "built-in")
}
