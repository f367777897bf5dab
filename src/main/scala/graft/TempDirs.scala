package graft

/** Temp-dir hygiene for layout-demo queries (z-order / DPP / versioned
  * copies): JVM-lifetime caching — the rewrite is SETUP for the measured
  * read, so a bench pass must not pay or re-pay it per call — plus
  * recursive deletion at JVM exit, the same shutdown-hook pattern
  * EventStream uses for its streaming landing dirs. */
object TempDirs {
  // values are memoizing cells, not results: computeIfAbsent only
  // CREATES the cell (cheap, non-reentrant), and the Spark build job
  // runs in the cell's lazy initializer OUTSIDE the map's bin lock —
  // a build that itself calls cachedDir (or two builders whose keys
  // share a bin) can no longer deadlock or throw
  // IllegalStateException("recursive update") inside the map
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, () => String]()

  /** One directory per (tag, key) per JVM: created, registered for
    * exit-time deletion, and populated by `build` exactly once;
    * subsequent calls return the cached path. Concurrent first calls
    * for the SAME key serialize on the cell's lazy-init monitor (build
    * still runs once); calls for different keys never block each other. */
  def cachedDir(tag: String, key: String)(build: String => Unit): String = {
    val cell = cache.computeIfAbsent(s"$tag|$key", { _ =>
      lazy val dir: String = {
        val d = deleteOnExit(java.nio.file.Files.createTempDirectory(tag))
        build(d.toString)
        d.toString
      }
      () => dir
    })
    cell()
  }

  /** Registers `dir` for recursive deletion at JVM shutdown. */
  def deleteOnExit(dir: java.nio.file.Path): java.nio.file.Path = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try {
        java.nio.file.Files.walk(dir)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case scala.util.control.NonFatal(_) => () }
    }))
    dir
  }
}
