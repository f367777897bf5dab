package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Readers.NanosAsLongKey, "true")
      .config("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
      .config("spark.ui.enabled", "false")
    // fork-free local fs - see graft.sources.NioLocalFs
    val spark = graft.sources.NioLocalFs.SessionConfs
      .foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Caches.quietNoisyLogs()
    new java.io.File(outDir).mkdirs()
    // Dev loop: SPARK_GRAFT_VERIFY_ONLY=name1,name2 restricts the dump
    // (same contract as Bench's SPARK_GRAFT_BENCH_ONLY). Unset = all.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None        => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      Caches.clearAll(spark) // per-query blocks must not outlive the query
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter(kv => only.forall(_(kv._1)))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // tolerance-mode oracles (opt-in epsilon compare, r13 verdict #6):
    // separate file so the driver's exact-hash gate never consumes them
    // (it records its rows-only check instead); tools/check.py compares
    // float columns under |got-exp| <= rtol*|exp|, the rest exactly
    val tolJson = SparkEntry.toleranceSql
      .filter(kv => only.forall(_(kv._1)))
      .map { case (k, (sql, rtol)) =>
        s"${q(k)}: {${q("sql")}: ${q(sql)}, ${q("rtol")}: $rtol}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/tolerance_oracle_sql.json"),
      tolJson)
    spark.stop()
  }
}
