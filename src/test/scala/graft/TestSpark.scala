package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole test JVM (suites use `lazy val`). */
object TestSpark {
  lazy val spark: SparkSession = {
    val builder = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Readers.NanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
    // fork-free local fs - see graft.sources.NioLocalFs
    val s = graft.sources.NioLocalFs.SessionConfs
      .foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
