package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ClusterSubmit

/** Drives [[graft.tools.SkewWindowsClusterCheck]] on a
  * `local-cluster[2,1,1024]` master — real separate executor JVMs — via
  * spark-submit (the OrderedIdClusterCheck pattern: a second
  * SparkContext cannot share the test JVM). Pins the r11 boundary-only
  * phase 2 where its failure modes actually live: driver-collected
  * summaries handed back to executor tasks in a closure, across
  * process boundaries, with distinct groups outnumbering partitions
  * ~600×. */
class SkewWindowsClusterSpec extends AnyFunSuite {

  test("SkewWindows boundary handoff on local-cluster: window-exact, " +
      "phase-2 collect O(partitions)") {
    ClusterSubmit.assertOk(ClusterSubmit.run("graft.tools.SkewWindowsClusterCheck"))
  }
}
