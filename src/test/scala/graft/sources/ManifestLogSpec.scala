package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Commit protocol + replay semantics of the manifest log — above all
  * the CONCURRENT-WRITER race: two writers publishing the same version
  * must serialize (exactly one wins, the loser conflicts and rebases),
  * which is the entire point of routing snapshots through a log instead
  * of path conventions. */
class ManifestLogSpec extends AnyFunSuite {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_mlog").toString

  test("replay folds adds and removes in commit order") {
    val root = freshRoot()
    ManifestLog.commit(root, 0, Seq("data/v0/a.parquet",
      "data/v0/b.parquet"), Seq.empty, "write")
    ManifestLog.commit(root, 1, Seq("data/v1/c.parquet"),
      Seq("data/v0/a.parquet", "data/v0/b.parquet"), "merge")
    ManifestLog.commit(root, 2, Seq("data/v2/d.parquet"),
      Seq("data/v1/c.parquet"), "merge")
    assert(ManifestLog.versions(root) == Seq(0L, 1L, 2L))
    assert(ManifestLog.latestVersion(root).contains(2L))
    assert(ManifestLog.filesAsOf(root, 0) ==
      Seq("data/v0/a.parquet", "data/v0/b.parquet"))
    assert(ManifestLog.filesAsOf(root, 1) == Seq("data/v1/c.parquet"))
    assert(ManifestLog.filesAsOf(root, 2) == Seq("data/v2/d.parquet"))
    // a never-committed version must fail loudly, not resolve v2
    intercept[IllegalArgumentException](ManifestLog.filesAsOf(root, 7))
  }

  test("concurrent writers racing one version: exactly one commit wins") {
    val root = freshRoot()
    ManifestLog.commit(root, 0, Seq("data/v0/base.parquet"), Seq.empty,
      "write")
    // many writers, one contested version, one barrier start — the
    // loser set must all see Conflict and the log must hold ONE v1
    val n = 8
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val attempts = (0 until n).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            gate.await()
            try {
              ManifestLog.commit(root, 1, Seq(s"data/v1/w$i.parquet"),
                Seq("data/v0/base.parquet"), "merge")
              true
            } catch { case ManifestLog.Conflict(1L) => false }
          }
        })
      }
      gate.countDown()
      val wins = attempts.map(_.get()).count(identity)
      assert(wins == 1, s"expected exactly one winning commit, got $wins")
    } finally pool.shutdown()
    assert(ManifestLog.versions(root) == Seq(0L, 1L))
    // the committed v1 is internally consistent: one writer's file set
    val v1 = ManifestLog.filesAsOf(root, 1)
    assert(v1.length == 1 && v1.head.startsWith("data/v1/w"))
    // no stage litter left behind by the losers
    val leftovers = java.nio.file.Files
      .list(java.nio.file.Paths.get(root, "_log")).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (leftovers.hasNext) names += leftovers.next().getFileName.toString
    assert(names.forall(nm => nm.endsWith(".json") && !nm.startsWith(".")),
      s"stage temp files leaked: $names")
  }

  test("checkpoint: tail replay == full replay, idempotent, survives " +
      "manifest pruning") {
    val root = freshRoot()
    ManifestLog.commit(root, 0, Seq("data/v0/a.parquet"), Seq.empty,
      "write")
    ManifestLog.commit(root, 1, Seq("data/v1/b.parquet"),
      Seq("data/v0/a.parquet"), "merge")
    ManifestLog.commit(root, 2, Seq("data/v2/c.parquet"),
      Seq("data/v1/b.parquet"), "merge")
    val full2 = ManifestLog.filesAsOf(root, 2)
    ManifestLog.writeCheckpoint(root, 2)
    // derived state: racing/repeated publication is a no-op
    ManifestLog.writeCheckpoint(root, 2)
    assert(ManifestLog.checkpointVersions(root) == Seq(2L))
    assert(ManifestLog.filesAsOf(root, 2) == full2,
      "checkpoint-seeded resolve must equal the full replay")
    ManifestLog.commit(root, 3, Seq("data/v3/d.parquet"),
      Seq("data/v2/c.parquet"), "merge")
    assert(ManifestLog.filesAsOf(root, 3) == Seq("data/v3/d.parquet"),
      "tail replay after the checkpoint must fold manifest 3")
    // the retention story: prune the folded manifests; everything at
    // or after the checkpoint must still resolve
    (0L to 2L).foreach { v =>
      java.nio.file.Files.delete(java.nio.file.Paths.get(
        root, "_log", f"$v%020d.json"))
    }
    assert(ManifestLog.filesAsOf(root, 2) == full2)
    assert(ManifestLog.filesAsOf(root, 3) == Seq("data/v3/d.parquet"))
    // a pruned, non-checkpointed version is GONE and must say so
    intercept[IllegalArgumentException](ManifestLog.filesAsOf(root, 1))
  }

  test("conflicted writer rebases and commits the next version") {
    val root = freshRoot()
    ManifestLog.commit(root, 0, Seq("data/v0/a.parquet"), Seq.empty,
      "write")
    ManifestLog.commit(root, 1, Seq("data/v1/b.parquet"),
      Seq("data/v0/a.parquet"), "merge")
    // a writer that read v0, lost the race for v1, retries on top of
    // the CURRENT latest — the standard optimistic-concurrency loop
    intercept[ManifestLog.Conflict] {
      ManifestLog.commit(root, 1, Seq("data/v1/mine.parquet"),
        Seq("data/v0/a.parquet"), "merge")
    }
    val next = ManifestLog.latestVersion(root).get + 1
    ManifestLog.commit(root, next, Seq("data/v2/mine.parquet"),
      ManifestLog.filesAsOf(root, next - 1), "merge")
    assert(ManifestLog.filesAsOf(root, 2) == Seq("data/v2/mine.parquet"))
  }
}
