package graft.ops

import org.scalatest.funsuite.AnyFunSuite

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
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val cmd = Seq("/opt/spark/bin/spark-submit",
      "--master", "local-cluster[2,1,1024]",
      "--driver-class-path", classes,
      "--conf", s"spark.executor.extraClassPath=$classes",
      "--conf", "spark.ui.enabled=false",
      "--class", "graft.tools.SkewWindowsClusterCheck",
      "spark-internal")
    val buf = new StringBuilder
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = reader.readLine()
    while (line != null) { buf.append(line).append('\n'); line = reader.readLine() }
    val finished = proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly()
    val out = buf.toString
    assert(finished, s"spark-submit timed out:\n${out.takeRight(4000)}")
    assert(proc.exitValue() == 0,
      s"cluster check exited ${proc.exitValue()}:\n${out.takeRight(4000)}")
    assert(out.contains("[clustercheck] OK"),
      s"no OK verdict:\n${out.takeRight(4000)}")
  }
}
