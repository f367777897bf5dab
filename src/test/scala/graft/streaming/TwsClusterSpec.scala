package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[graft.tools.TwsClusterCheck]] on a `local-cluster[2,1,1024]`
  * master — real separate executor JVMs — via spark-submit. The
  * transformWithState processors are serialized driver→executor here,
  * which is where a non-serializable field, a stale closure capture, or
  * an executor-side RocksDB/native issue would actually surface; the
  * shared-JVM `local[n]` drains structurally cannot show those. */
class TwsClusterSpec extends AnyFunSuite {

  test("tws processors on local-cluster: stats + timer sessions exact") {
    graft.ClusterSubmit.assertOk(
      graft.ClusterSubmit.run("graft.tools.TwsClusterCheck"))
  }
}
