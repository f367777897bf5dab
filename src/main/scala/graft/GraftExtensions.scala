package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProductExpr, RollingHashExpr, WordShinglesExpr}

/** SparkSessionExtensions entry point: injects graft's custom expressions
  * as SQL functions into any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), so pure-SQL users get
  * `graft_dot`, `rolling_hash` and `word_shingles` without touching the
  * Scala API. This is the full extension-registration surface (SURVEY §7.3
  * escalation path (c)) — planner rules/strategies are deliberately NOT
  * injected because no operator here needs one; Catalyst plans everything
  * the engine does from the declarative API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - codegen'd double-array dot product"),
      (exprs: Seq[Expression]) => DotProductExpr(exprs.head, exprs(1))))
    e.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(s) - Rabin-Karp polynomial hash mod 2^31-1"),
      (exprs: Seq[Expression]) => RollingHashExpr(exprs.head)))
    e.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(words, n) - distinct word n-grams"),
      (exprs: Seq[Expression]) => {
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"word_shingles n must be a literal, got $other")
        }
        WordShinglesExpr(exprs.head, n)
      }))
  }
}
