package graft.core

/** Recursive temp-directory cleanup shared by the queries and specs that
  * materialize on-disk stores (streaming sinks, sketch stores, partition
  * layouts): deepest-first walk, errors swallowed — cleanup must never
  * mask the result of the work it follows. */
object Fs {
  def rmTree(path: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(path))
      java.nio.file.Files.walk(path).iterator().asScala.toSeq.reverse
        .foreach(p => try java.nio.file.Files.deleteIfExists(p) catch { case _: Throwable => () })
  }
  def rmTree(path: String): Unit = rmTree(java.nio.file.Paths.get(path))
}
