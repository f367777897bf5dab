package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native time expressions replacing the reference's two Python UDFs
  * (SURVEY.md §2.5 F2/F3; reference etl.py:215-220).
  *
  * The reference forks a Python worker per executor and pickles every row
  * through it twice. These are pure Catalyst expressions — they stay inside
  * whole-stage codegen, which is the single biggest physical-execution win
  * of the rewrite (SURVEY §4). Semantics are bit-identical under
  * `spark.sql.session.timeZone=UTC`: epoch millis / 1000.0 →
  * `datetime.utcfromtimestamp` wall clock.
  */
object TimeOps {

  /** F2 — epoch-millis long → TimestampType, UTC (etl.py:215-216). */
  def epochMillisToTs(millis: Column): Column =
    (millis / 1000L).cast(TimestampType)

  /** F3 — epoch-millis long → 'yyyy-MM-dd HH:mm:ss' STRING at second
    * granularity (etl.py:219-220; the UDF declared no return type, so the
    * reference's `start_time` really is a string — SURVEY §2.8.3). */
  def startTimeString(millis: Column): Column =
    date_format(epochMillisToTs(millis), "yyyy-MM-dd HH:mm:ss")

  /** F1 family — unit extraction exactly as the reference applies it
    * (etl.py:230-235): `weekofyear` = ISO week, `dayofweek` 1=Sunday.
    * Returns the 6 derived columns in reference order. */
  def timeUnits(ts: Column): Seq[(String, Column)] = Seq(
    "hour"    -> hour(ts),
    "day"     -> dayofmonth(ts),
    "week"    -> weekofyear(ts),
    "month"   -> month(ts),
    "year"    -> year(ts),
    "weekday" -> dayofweek(ts))
}
