package graft

/** Temp-dir hygiene for fixture-building queries (q37/q45/q52/q73/q76
  * stage writes under java.io.tmpdir). `File.deleteOnExit` silently
  * no-ops on non-empty directories, so maintenance/publish fixtures were
  * accumulating across driver rounds; this registers ONE shutdown hook
  * that recursively deletes every directory created through it. */
object Tmp {
  private val roots = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(() => {
    roots.forEach { p =>
      try delete(p.toFile)
      catch { case _: Throwable => () } // exit-path cleanup is best-effort
    }
  }))

  private def delete(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(delete)
    f.delete(): Unit
  }

  /** Create a temp directory that is recursively deleted at JVM exit. */
  def dir(prefix: String): java.nio.file.Path = {
    hook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    roots.add(p)
    p
  }
}
