package graft.sources

/** Recursive temp-tree deletion shared by every temp-store owner (the
  * query layer's cached Arrow stores, ScaleProbe's probe stores) — one
  * copy of the walk/deepest-first/delete protocol so a semantics fix
  * (e.g. symlink handling) lands once.
  */
object TempTrees {

  /** Delete `d` and everything under it, deepest paths first;
    * per-path failures are swallowed (best-effort cleanup).
    */
  def deleteTree(d: String): Unit = {
    val root = java.nio.file.Paths.get(d)
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => try java.nio.file.Files.deleteIfExists(p)
          catch { case _: Exception => () })
    }
  }

  /** Register [[deleteTree]] of `d` at JVM exit. */
  def deleteOnExit(d: String): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try deleteTree(d) catch { case _: Exception => () }
    }))
}
