package graft

/** Shared spark-submit driver for the `local-cluster[2,1,1024]` checks
  * (real separate executor JVMs). Output is redirected to a FILE, not a
  * pipe: reading a pipe to EOF before waitFor blocks forever on a hung
  * child that keeps stdout open, and the kill path never runs. With the
  * file redirect, waitFor's timeout bites first and destroyForcibly
  * actually fires.
  */
object ClusterSubmit {

  /** Runs `mainClass` under spark-submit on local-cluster and returns
    * (finished-within-timeout, exitValue, combined output). `extraEnv`
    * is applied to the child environment (e.g. the state-store toggle).
    */
  def run(mainClass: String,
          extraEnv: Map[String, String] = Map.empty,
          timeoutSec: Long = 300): (Boolean, Int, String) = {
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val cmd = Seq("/opt/spark/bin/spark-submit",
      "--master", "local-cluster[2,1,1024]",
      "--driver-class-path", classes,
      "--conf", s"spark.executor.extraClassPath=$classes",
      "--conf", "spark.ui.enabled=false",
      "--class", mainClass,
      "spark-internal")
    val outFile = java.nio.file.Files.createTempFile("cluster_check", ".log")
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      .redirectOutput(outFile.toFile)
    extraEnv.foreach { case (k, v) => pb.environment().put(k, v) }
    val proc = pb.start()
    val finished = proc.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly()
    val out = new String(java.nio.file.Files.readAllBytes(outFile), "UTF-8")
    (finished, if (finished) proc.exitValue() else -1, out)
  }

  /** Standard assertion set: completed, exit 0, printed the OK verdict. */
  def assertOk(result: (Boolean, Int, String)): Unit = {
    val (finished, exit, out) = result
    assert(finished, s"spark-submit timed out:\n${out.takeRight(4000)}")
    assert(exit == 0, s"cluster check exited $exit:\n${out.takeRight(4000)}")
    assert(out.contains("[clustercheck] OK"),
      s"no OK verdict:\n${out.takeRight(4000)}")
  }
}
