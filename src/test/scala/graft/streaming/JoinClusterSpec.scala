package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.ClusterSubmit

/** Drives [[graft.tools.JoinClusterCheck]] on `local-cluster[2,1,1024]`
  * — the TOGGLED RocksDB provider path (`EventStream.StateStoreKey`)
  * on real separate executor JVMs, where the native RocksDB instances
  * actually open inside executor processes and the late-data restart
  * restores executor-written checkpoint files. Complements
  * `TwsClusterSpec` (which covers the transformWithState processors,
  * RocksDB-forced regardless of toggle). */
class JoinClusterSpec extends AnyFunSuite {

  test("rocksdb-toggled join drain + late-data restart on local-cluster") {
    ClusterSubmit.assertOk(ClusterSubmit.run("graft.tools.JoinClusterCheck"))
  }
}
