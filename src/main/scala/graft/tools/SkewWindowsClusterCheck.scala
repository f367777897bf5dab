package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multi-node evidence for the boundary-only [[graft.ops.SkewWindows]]
  * phase 2 (r11): the per-partition first/last-group summaries are
  * collected to the DRIVER and handed back to executors inside a task
  * closure — a pattern whose failure modes (stale closure capture,
  * partition-id mismatch between the collect and the assignment pass)
  * only exist when executors are SEPARATE JVMs. A
  * `local-cluster[2,1,1024]` master runs real executor processes, so
  * this cannot run inside the shared-session test JVM —
  * `SkewWindowsClusterSpec` launches it via spark-submit and asserts on
  * the verdict line (the OrderedIdClusterCheck pattern).
  *
  * Checks, for all three boundary-handoff ops on a 90%-skew corpus
  * with per-user-cardinality minor groups:
  *   (1) output equals the single-task window form exactly;
  *   (2) the phase-2 collect stayed ≤ 2 rows per partition
  *       (O(partitions), the r11 contract) even though distinct groups
  *       outnumber partitions ~600×.
  * Exits nonzero on any failure.
  */
object SkewWindowsClusterCheck {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = SparkSession.builder()
      .appName("skewwindows-cluster-check")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val sc = spark.sparkContext
    try {
      require(!sc.isLocal, s"master ${sc.master} reports isLocal=true")
      // 40k rows: 90% one hot group, 5,000 minor groups (per-user shape)
      val df = spark.range(40000).select(
        col("id"),
        when(col("id") % 10 =!= 0, lit(-1L))
          .otherwise(col("id") % 5000).as("g"),
        (col("id") % 13).as("v"),
        (col("id") * 600000000L +
          when(col("id") % 13 === 0, 7200000000L).otherwise(0L)).as("us"),
        when(col("id") % 3 === 0, col("id")).otherwise(lit(null)).as("p"))
      def pin(tag: String, out: org.apache.spark.sql.DataFrame): Unit = {
        val parts = out.rdd.getNumPartitions
        val rows = graft.ops.SkewWindows.lastPhase2Rows(tag)
        require(rows >= 0 && rows <= 2 * parts,
          s"$tag: phase-2 collected $rows rows for $parts partitions")
      }
      val w = Window.partitionBy("g").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // rankedPrefix
      val expRk = df.withColumn("rk", row_number()
          .over(Window.partitionBy("g").orderBy("id")).cast(LongType))
        .withColumn("cum", sum(col("v")).over(w))
        .select("id", "rk", "cum").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val gotRkDf = graft.ops.SkewWindows
        .rankedPrefix(df, "g", Seq(col("id")), Some("v"), "rk", "cum")
      pin("rankedPrefix", gotRkDf)
      val gotRk = gotRkDf.select("id", "rk", "cum").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      require(gotRk == expRk && gotRk.size == 40000, "rankedPrefix != window")
      // sessionNumbers
      val wS = Window.partitionBy("g").orderBy(col("us"), col("id"))
      val wRun = wS.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val expSe = df.withColumn("prev", lag(col("us"), 1).over(wS))
        .withColumn("ns",
          when(col("us") - col("prev") <= 1800000000L, 0L).otherwise(1L))
        .withColumn("sess", sum(col("ns")).over(wRun))
        .select("id", "sess").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gotSeDf = graft.ops.SkewWindows.sessionNumbers(df, "g", "us",
        Seq(col("us"), col("id")), 1800000000L, "sess")
      pin("sessionNumbers", gotSeDf)
      val gotSe = gotSeDf.select("id", "sess").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      require(gotSe == expSe, "sessionNumbers != window")
      // carryForward
      val expCf = df.withColumn("c",
          last(col("p"), ignoreNulls = true).over(w))
        .select("id", "c").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val gotCfDf = graft.ops.SkewWindows
        .carryForward(df, "g", Seq(col("id")), "p", "c")
      pin("carryForward", gotCfDf)
      val gotCf = gotCfDf.select("id", "c").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      require(gotCf == expCf, "carryForward != window")
      println(s"[clustercheck] OK n=40000 groups=5001 " +
        s"master=${sc.master} executors=2")
    } finally spark.stop()
  }
}
