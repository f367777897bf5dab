package graft.sources

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import ManifestLog.{DvRef, LogicalConflict}

/** The optimistic serializable commit protocol (r16): losers of the
  * physical version race REBASE when winners are logically disjoint
  * and fail with LogicalConflict when a winner removed or vectored a
  * file in their footprint. Pins: the racing-appenders case (all
  * succeed, one version each, union state), the single-writer rebase,
  * every conflict rule (remove-vs-read, remove-vs-remove, dv-vs-read,
  * remove-vs-dv), and append-vs-reader write-serializable tolerance. */
class CommitProtocolSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def newRoot(): String = graft.TempDirs.deleteOnExit(
    Files.createTempDirectory("graft_ser")).toString

  /** Lands a one-row parquet file under `sub` and returns its paths. */
  private def land(root: String, sub: String, k: Long): Seq[String] = {
    import spark.implicits._
    Seq((k, k * 10L)).toDF("k", "v").coalesce(1)
      .write.parquet(s"$root/$sub")
    ManifestLog.partFiles(root, sub)
  }

  test("8 racing blind appenders: every txn commits exactly once, " +
      "the final state is the union, and versions are a dense range") {
    val root = newRoot()
    val adds = (0 until 8).map(i => land(root, s"data/t$i", i.toLong))
    val latch = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(8)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    (0 until 8).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          latch.await()
          got.add(ManifestLog.commitSerializable(root, readVersion = -1L,
            adds = adds(i), removes = Seq.empty, op = "append"))
        }
      })
    }
    latch.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(60, TimeUnit.SECONDS))
    val versions = scala.jdk.CollectionConverters
      .CollectionHasAsScala(got).asScala.toSeq.sorted
    assert(versions == (0L to 7L), s"got $versions")
    assert(ManifestLog.filesAsOf(root, 7).toSet == adds.flatten.toSet)
  }

  test("a loser with a disjoint footprint rebases the SAME actions " +
      "to the next free version — no recomputation") {
    val root = newRoot()
    val a = land(root, "data/a", 1L)
    // writer W read snapshot -1 and prepared an append; meanwhile two
    // other commits land
    ManifestLog.commit(root, 0, land(root, "data/x", 2L), Seq.empty, "w")
    ManifestLog.commit(root, 1, land(root, "data/y", 3L), Seq.empty, "w")
    val v = ManifestLog.commitSerializable(root, readVersion = -1L,
      adds = a, removes = Seq.empty, op = "append")
    assert(v == 2L)
    assert(ManifestLog.filesAsOf(root, 2).size == 3)
  }

  test("winner REMOVES a file in the loser's footprint → " +
      "LogicalConflict for readers, removers and vector writers") {
    val root = newRoot()
    val f = land(root, "data/v0", 1L)
    ManifestLog.commit(root, 0, f, Seq.empty, "write")
    // the winner compacts f away
    ManifestLog.commit(root, 1, land(root, "data/v1", 1L), removes = f,
      op = "rewrite")
    // loser 1: computed FROM f (readFiles) — stale
    intercept[LogicalConflict] {
      ManifestLog.commitSerializable(root, readVersion = 0L,
        adds = land(root, "data/d1", 9L), removes = Seq.empty,
        op = "append", readFiles = f.toSet)
    }
    // loser 2: also removing f — double rewrite
    intercept[LogicalConflict] {
      ManifestLog.commitSerializable(root, readVersion = 0L,
        adds = land(root, "data/d2", 9L), removes = f, op = "rewrite")
    }
    // loser 3: vectoring f — vector computed against a retired file
    intercept[LogicalConflict] {
      ManifestLog.commitSerializable(root, readVersion = 0L,
        adds = Seq.empty, removes = Seq.empty, op = "delete",
        dvs = Map(f.head -> DvRef(s"${f.head}.v9.dv", 1)))
    }
  }

  test("winner VECTORS a file in the loser's footprint → " +
      "LogicalConflict; disjoint appends still rebase past it") {
    val root = newRoot()
    val f = land(root, "data/v0", 5L)
    ManifestLog.commit(root, 0, f, Seq.empty, "write")
    ManifestLog.deleteWhereMor(spark, root, 0, 1, col("k") === 5L)
    // loser read f at v0 — the winner's DV invalidated those rows
    intercept[LogicalConflict] {
      ManifestLog.commitSerializable(root, readVersion = 0L,
        adds = land(root, "data/d", 9L), removes = Seq.empty,
        op = "append", readFiles = f.toSet)
    }
    // write-serializable: a blind append never conflicts with the DV
    val v = ManifestLog.commitSerializable(root, readVersion = 0L,
      adds = land(root, "data/ok", 9L), removes = Seq.empty,
      op = "append")
    assert(v == 2L)
  }

  test("appendChecked composes the three write seams: constraint " +
      "gate before landing, single-pass stats in the commit, " +
      "serializable publish past interleaved winners") {
    import spark.implicits._
    val root = newRoot()
    val v0 = ManifestLog.appendChecked(spark,
      Seq((1L, 10L)).toDF("k", "v").coalesce(1), root, "data/b0",
      statsCols = Seq("k"))
    assert(v0 == 0L)
    ManifestLog.commit(root, 1, Seq.empty, Seq.empty, op = "checks",
      checks = Some(Seq("v_pos" -> "v > 0")))
    // a violating batch dies at the gate, landing nothing
    intercept[IllegalArgumentException] {
      ManifestLog.appendChecked(spark,
        Seq((2L, -5L)).toDF("k", "v").coalesce(1), root, "data/bad",
        statsCols = Seq("k"))
    }
    assert(ManifestLog.latestVersion(root).contains(1L))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "data/bad")) ||
      ManifestLog.partFiles(root, "data/bad").isEmpty ||
      ManifestLog.filesAsOf(root, 1).forall(!_.startsWith("data/bad")))
    // a clean batch lands with stats; an interleaved winner between
    // its snapshot and publish costs only a rebase
    val racerAdds = land(root, "data/racer", 7L)
    val t = new Thread(() => ManifestLog.commitSerializable(root, 1L,
      racerAdds, Seq.empty, op = "append"))
    t.start(); t.join()
    val v = ManifestLog.appendChecked(spark,
      Seq((3L, 30L)).toDF("k", "v").coalesce(1), root, "data/b3",
      statsCols = Seq("k"))
    assert(v == 3L)
    assert(ManifestLog.colStatsAsOf(root, v).values
      .exists(_.get("k").exists(st => st.min == 3L && st.max == 3L)))
    assert(ManifestLog.readVersion(spark, root, v).count() == 3)
  }

  test("deleteWhereMorRetrying re-derives on logical conflict: two " +
      "threads vectoring the SAME file both commit, serialized, and " +
      "the final state excludes both delete sets") {
    import spark.implicits._
    val root = newRoot()
    (0L until 10L).map(k => (k, k * 10L)).toDF("k", "v").coalesce(1)
      .write.parquet(s"$root/data/v0")
    ManifestLog.commit(root, 0, ManifestLog.partFiles(root, "data/v0"),
      Seq.empty, op = "write")
    val latch = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    Seq(col("k") === 2L || col("k") === 3L, col("k") === 7L).foreach { p =>
      pool.submit(new Runnable {
        def run(): Unit = {
          latch.await()
          try got.add(ManifestLog.deleteWhereMorRetrying(spark, root, p))
          catch { case t: Throwable => errs.add(t) }
        }
      })
    }
    latch.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(errs.isEmpty, errs)
    val versions = scala.jdk.CollectionConverters
      .CollectionHasAsScala(got).asScala.toSeq.sorted
    assert(versions == Seq(1L, 2L), s"got $versions")
    // serialized result: both predicates applied exactly once
    val rows = ManifestLog.readVersion(spark, root, 2)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == Seq(0L, 1L, 4L, 5L, 6L, 8L, 9L))
    // the final vector is the union (the loser folded the winner's)
    assert(ManifestLog.dvsAsOf(root, 2).head._2.nDeleted == 3)
    // v1 (whichever delete won) removed exactly its own set
    assert(ManifestLog.readVersion(spark, root, 1).count() >= 8)
  }
}
