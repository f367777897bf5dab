package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join (the time-series classic Spark lacks natively):
  * for every left row, attach the latest right row with the same key and
  * right.time <= left.time.
  *
  * Formulation: tag both sides, union, one window pass per key ordered by
  * (time, side) carrying the last non-null right payload forward
  * (`last(..., ignoreNulls=true)` over an unbounded-preceding rows
  * frame), keep left rows. This is the scalable shape — ONE shuffle on
  * the key, no per-row subquery, no broadcast of either side, state is a
  * single struct per partition-row — and it is exactly how you'd do it
  * on 100 TB (both sides arbitrarily large).
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

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("__carried", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__carried.$p").as(p)): _*)
  }
}
