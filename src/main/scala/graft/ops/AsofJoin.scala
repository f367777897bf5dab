package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join (the time-series classic Spark lacks natively):
  * for every left row, attach the latest right row with the same key and
  * right.time <= left.time.
  *
  * Formulation: tag both sides, union, carry the last non-null right
  * payload forward in (key, time, side) order, keep left rows. The
  * carry is NOT a per-key window (`last(…, ignoreNulls=true)` over
  * partitionBy(key) plans one task per key — a hot instrument/user
  * holding half the ticks becomes a straggler no cluster size fixes)
  * but [[SkewWindows.carryForward]]: range layout over (key, time,
  * side), per-(partition, key) last-non-null summaries threaded by the
  * driver, narrow re-derivation. ONE shuffle on (key, time), no per-row
  * subquery, no broadcast of either side, no per-key task — the shape
  * you'd run on 100 TB with both sides arbitrarily large and skewed.
  * Left-side ties (same key+time) are harmless: left rows never change
  * the carried state, so every such row reads the same payload.
  *
  * Contract: right must be unique per (key, time) — pre-aggregate it
  * (otherwise "the" as-of row is ill-defined; DuckDB's native ASOF JOIN
  * has the same ambiguity). Ties left.time == right.time match
  * (inclusive), because right rows sort before left rows at equal time.
  */
object AsofJoin {

  /** @param left        left rows (kept 1:1 in the output)
    * @param right       right rows, unique per (key, time)
    * @param leftKey/rightKey    equi key columns
    * @param leftTime/rightTime  comparable time columns (same type)
    * @param payload     right columns to carry (become nullable) */
  def asofBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val pStruct = struct(payload.map(right(_)): _*)

    val rightSel: Seq[Column] =
      Seq(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side"), pStruct.as("__p")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))
    val taggedRight = right.select(rightSel: _*)
    val leftSel: Seq[Column] =
      Seq(col(leftKey).as("__k"), col(leftTime).as("__t"),
        lit(1).as("__side"),
        lit(null).cast(taggedRight.schema("__p").dataType).as("__p")) ++
        leftCols.map(col)
    val taggedLeft = left.select(leftSel: _*)

    SkewWindows.carryForward(taggedRight.unionByName(taggedLeft),
        "__k", Seq(col("__t"), col("__side")), "__p", "__carried")
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__carried.$p").as(p)): _*)
  }
}
