package graft.core

/** Recursive temp-directory cleanup shared by the queries and specs that
  * materialize on-disk stores (streaming sinks, sketch stores, partition
  * layouts): deepest-first walk, errors swallowed — cleanup must never
  * mask the result of the work it follows. */
object Fs {
  def rmTree(path: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    import scala.util.control.NonFatal
    if (java.nio.file.Files.exists(path))
      scala.util.Using.resource(java.nio.file.Files.walk(path)) { walk =>
        walk.iterator().asScala.toSeq.reverse
          .foreach(p => try java.nio.file.Files.deleteIfExists(p) catch { case NonFatal(_) => () })
      }
  }
  def rmTree(path: String): Unit = rmTree(java.nio.file.Paths.get(path))
}
