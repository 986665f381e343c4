package graft

/** Tiny filesystem helpers shared by the query layer and tests. */
object Fs {
  /** Best-effort recursive delete (children before parents); quiet on
    * races — a vanished temp/checkpoint dir is never worth failing a
    * query or a bench run over. */
  def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    try java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(f => java.nio.file.Files.deleteIfExists(f))
    catch { case _: Exception => }
  }
}
