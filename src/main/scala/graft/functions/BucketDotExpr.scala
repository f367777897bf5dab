package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd Σ weights(bk(i)) over an `array<bigint>` bucket column
  * against a driver-baked Long table — the inference hot loop of the
  * hashed-feature operators (quality-classifier scoring, domain-affinity
  * dots). The higher-order twin `aggregate(bk, 0L, (a, b) ->
  * a + element_at(lit, b + 1))` evaluates OUTSIDE whole-stage codegen
  * (HOF aggregates are interpreted — PLANS.md shows the scoring Project
  * without a `*` span); this expression emits a tight primitive loop
  * into the generated code with arithmetic IDENTICAL to the fold
  * (ascending index, Long add), so results are bit-equal and the DuckDB
  * oracles replaying the HOF formulation in SQL stay authoritative.
  *
  * Out-of-range buckets throw (fail fast): the shared char-polynomial
  * hash mods every bucket into [0, weights.length), so a wild index is
  * corruption, not data — silently skipping would diverge from the HOF
  * twin's NULL and hide the defect. A NULL ELEMENT, by contrast, is a
  * value the fold must propagate: the HOF twin's `a + element_at(...)`
  * turns any null element into a NULL result, so this expression does
  * the same (the bucket arrays come from `transform(... % ...)`, whose
  * declared element type is nullable even though the hash never
  * produces null in practice).
  */
case class BucketDotExpr(child: Expression, weights: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_bucket_dot expects array<bigint>, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bucket_dot"
  override def nullable: Boolean = child.nullable || (child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      // mirror doGenCode's null branch exactly: when the schema says
      // containsNull=false a null element is corrupt data — throw in
      // BOTH execution modes rather than emit a NULL from a declared
      // non-nullable expression
      if (a.isNullAt(i)) {
        if (!nullable) throw new IllegalStateException(
          "null element in non-nullable bucket array")
        return null
      }
      val b = a.getLong(i)
      require(b >= 0 && b < weights.length, s"bucket out of range: $b")
      s += weights(b.toInt)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val b = ctx.freshName("b")
      val anyNull = ctx.freshName("anyNull")
      // ev.isNull is a compile-time `false` literal when this
      // expression is non-nullable; only emit the assignment when the
      // null branch is actually reachable per the schema
      val nullBranch =
        if (nullable) s"${ev.isNull} = true;"
        else "throw new IllegalStateException(\"null element in " +
          "non-nullable bucket array\");"
      s"""
         |int $n = $a.numElements();
         |long $s = 0L;
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n && !$anyNull; $i++) {
         |  if ($a.isNullAt($i)) {
         |    $anyNull = true;
         |  } else {
         |    long $b = $a.getLong($i);
         |    if ($b < 0 || $b >= $w.length) {
         |      throw new IllegalArgumentException("bucket out of range: " + $b);
         |    }
         |    $s += $w[(int) $b];
         |  }
         |}
         |if ($anyNull) {
         |  $nullBranch
         |} else {
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object BucketDotExpr {
  /** Column API: codegen'd bucket-table fold. */
  def bucketDot(buckets: Column, weights: Array[Long]): Column =
    GraftColumnBridge.column(BucketDotExpr(
      GraftColumnBridge.expression(buckets), weights))
}
