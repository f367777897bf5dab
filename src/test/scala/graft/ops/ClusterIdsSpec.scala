package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ClusterSubmit

/** Drives [[graft.tools.OrderedIdClusterCheck]] on a
  * `local-cluster[2,1,1024]` master — real separate executor JVMs — via
  * spark-submit (a second SparkContext cannot share the test JVM).
  * `spark-internal` is spark-submit's no-primary-resource sentinel; the
  * compiled classes ride on both driver and executor classpaths.
  */
class ClusterIdsSpec extends AnyFunSuite {

  test("orderedId durable branch on local-cluster: checkpoint written, " +
      "ids survive simulated block loss") {
    ClusterSubmit.assertOk(ClusterSubmit.run("graft.tools.OrderedIdClusterCheck"))
  }
}
