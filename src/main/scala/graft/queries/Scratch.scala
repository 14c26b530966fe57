package graft.queries

/** Per-JVM scratch base for graded queries that materialize real state
  * (warehouse commits, stream staging dirs, checkpoints), removed
  * recursively at JVM exit. Bench/verify invoke each query repeatedly
  * and every run writes real files; without cleanup /tmp accumulates a
  * copy per invocation.
  */
private[queries] object Scratch {
  lazy val base: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_q_scratch")
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      try Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { try Files.deleteIfExists(f) catch { case _: Throwable => () }; () })
      catch { case _: Throwable => () }
    }
    p
  }

  /** Fresh empty dir for one query invocation. */
  def dir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(base, prefix).toString
}
