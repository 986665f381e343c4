package graft

/** Tiny filesystem helpers shared by the query layer and tests. */
object Fs {
  /** A tmpfs base for ephemeral scratch (streaming checkpoints, serving
    * layouts) when the host has one with ample headroom — containers
    * commonly cap /dev/shm at 64 MB, and a filled tmpfs would fail jobs
    * the disk-backed default handles, hence the 4 GiB guard. A `def`, not
    * a `val`: the headroom is re-checked at every call (a cheap FileStore
    * stat), so a tmpfs that fills MID-RUN — other processes, concurrent
    * checkpoint trees — demotes later callers to the disk-backed default
    * instead of failing them on a stale class-load-time answer. */
  def fastTempBase: Option[java.nio.file.Path] = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    try {
      if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm) &&
          java.nio.file.Files.getFileStore(shm).getUsableSpace > (4L << 30))
        Some(shm)
      else None
    } catch { case _: Exception => None }
  }
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
