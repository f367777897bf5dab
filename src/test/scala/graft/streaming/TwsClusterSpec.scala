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
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val cmd = Seq("/opt/spark/bin/spark-submit",
      "--master", "local-cluster[2,1,1024]",
      "--driver-class-path", classes,
      "--conf", s"spark.executor.extraClassPath=$classes",
      "--conf", "spark.ui.enabled=false",
      "--class", "graft.tools.TwsClusterCheck",
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
