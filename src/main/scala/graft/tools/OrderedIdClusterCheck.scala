package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multi-node evidence for [[graft.ops.Ids.orderedId]]'s durable branch
  * (ops/Ids.scala): on any non-local master with a checkpoint dir the
  * range-partitioned phase-1 frame is reliably checkpointed, so a lost
  * executor block cannot lineage-recompute the shuffle between the
  * phase-2 offsets and the phase-3 assignment. A `local-cluster[2,1,
  * 1024]` master runs REAL separate executor JVMs (the closest thing to
  * a cluster a single box offers, and the exact master string
  * `sc.isLocal` must route to the durable branch), so this cannot run
  * inside the shared-session test JVM — `ClusterIdsSpec` launches it via
  * spark-submit and asserts on the verdict line.
  *
  * Checks: (1) the checkpoint dir is actually written (durable branch
  * taken, not the persist fallback); (2) ids are exactly 1..n in key
  * order; (3) after every cached/persistent block is dropped — the
  * simulated block loss — a re-collect off the checkpointed plan yields
  * byte-identical ids. Exits nonzero on any failure.
  */
object OrderedIdClusterCheck {
  def main(args: Array[String]): Unit = {
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    val spark = SparkSession.builder()
      .appName("orderedid-cluster-check")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val sc = spark.sparkContext
    try {
      require(!sc.isLocal, s"master ${sc.master} reports isLocal=true")
      sc.setCheckpointDir(ckptDir.toString)
      val n = 20000L
      // unique scrambled keys: range-partitioning must genuinely move
      // rows (id order != key order)
      val df = spark.range(n)
        .select((pmod(col("id") * 2654435761L, lit(1048576L)) * 100000L
          + col("id")).as("k"))
      val out = graft.ops.Ids.orderedId(df, Seq(col("k")), "rid")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val first = out.orderBy("k").select("rid").collect().map(_.getLong(0))
      require(first.toSeq == (1L to n).toSeq,
        s"ids not 1..$n in key order (got ${first.take(5).mkString(",")}…)")
      val ckptFiles = java.nio.file.Files.walk(ckptDir)
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      require(ckptFiles > 0, "durable branch not taken: checkpoint dir empty")
      // simulated block loss: drop EVERY cached block; the second pass
      // can only re-derive from the reliable checkpoint files
      sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val second = out.orderBy("k").select("rid").collect().map(_.getLong(0))
      require(second.toSeq == first.toSeq,
        "ids changed after block loss + recompute")
      println(s"[clustercheck] OK n=$n ckptFiles=$ckptFiles " +
        s"master=${sc.master} executors=2")
    } finally {
      spark.stop()
      try {
        java.nio.file.Files.walk(ckptDir)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
