package graft.pointcloud.connector

import java.io.{InputStream, OutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption, NoSuchFileException}

import org.apache.hadoop.fs.{FileSystem, Path}

/** Local-filesystem fast path for the point-cloud task writers.
  *
  * On `file:` URIs the Hadoop local FS is far more expensive than the
  * files it writes: `LocalFileSystem` is checksummed (every create also
  * creates a `.name.crc` sidecar, every open verifies it) and — with no
  * native hadoop library in the runtime — `RawLocalFileSystem
  * .setPermission` FORKS a `chmod` process per created file. A
  * multi-task container write (one .las/.laz per task) pays ~4 process
  * forks per task, which jstack sampling showed dominating the encode
  * itself. This helper routes creates/opens/renames/deletes through
  * plain `java.nio.file` when the FS is local (no forks, no sidecars)
  * and falls back to the Hadoop API verbatim on any other scheme.
  *
  * Sidecar hygiene: earlier Hadoop-API writes may have left `.crc`
  * sidecars that `ChecksumFileSystem` readers would verify against a
  * NIO-rewritten file and fail — so every local create/delete/rename
  * also drops the destination's stale sidecar.
  */
private[pointcloud] object LocalIo {

  /** One JVM-wide Hadoop Configuration for the connector's read-only
    * FileSystem lookups: constructing a Configuration parses the XML
    * default resources off the classpath (two classloader scans plus a
    * DOM parse, ~10 ms), and the per-split readers and per-task writers
    * were each paying it. Read-only by contract — a caller that needs
    * custom entries must construct its own.
    *
    * Binds `fs.file.impl` to the fork-free local FS
    * ([[graft.hadoop.NoForkRawLocalFileSystem]]) — the same class the
    * session-level `spark.hadoop.fs.file.impl` registers. The Hadoop
    * FileSystem CACHE keys on (scheme, authority, ugi) only, so
    * whichever lookup runs first decides the instance everyone gets:
    * naming the same class in both confs makes initialization order
    * irrelevant. */
  lazy val conf = {
    val c = new org.apache.hadoop.conf.Configuration()
    c.set("fs.file.impl", classOf[graft.hadoop.NoForkLocalFileSystem].getName)
    c.set("fs.AbstractFileSystem.file.impl", classOf[graft.hadoop.NoForkLocalFs].getName)
    c
  }

  def isLocal(fs: FileSystem): Boolean = fs.getScheme == "file"

  private def nio(p: Path): java.nio.file.Path = Paths.get(p.toUri.getPath)

  private def crcSidecar(p: Path): Path =
    new Path(p.getParent, "." + p.getName + ".crc")

  /** Create-or-truncate `p` for writing (parents created on demand,
    * matching Hadoop `create` semantics). */
  def create(fs: FileSystem, p: Path): OutputStream =
    if (isLocal(fs)) {
      val t = nio(p)
      Files.deleteIfExists(nio(crcSidecar(p)))
      try Files.newOutputStream(t)
      catch { case _: NoSuchFileException =>
        Files.createDirectories(t.getParent)
        Files.newOutputStream(t)
      }
    } else fs.create(p, true)

  def open(fs: FileSystem, p: Path): InputStream =
    if (isLocal(fs)) Files.newInputStream(nio(p)) else fs.open(p)

  def delete(fs: FileSystem, p: Path): Unit =
    if (isLocal(fs)) {
      Files.deleteIfExists(nio(p))
      Files.deleteIfExists(nio(crcSidecar(p)))
    } else { fs.delete(p, false); () }

  /** Atomically move `src` over `dst` (same filesystem/mount in every
    * caller — the writers rename from a temp subdirectory into its
    * parent output dir). POSIX rename replaces the destination, so
    * unlike the Hadoop path there is no absent-name window; throws on
    * failure like the callers' existing rename-failed branch. A
    * cross-mount destination (no atomic rename possible) falls back to
    * a copy-then-delete move rather than failing where the Hadoop path
    * would have copied. */
  def rename(fs: FileSystem, src: Path, dst: Path): Unit =
    if (isLocal(fs)) {
      Files.deleteIfExists(nio(crcSidecar(dst)))
      try Files.move(nio(src), nio(dst), StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(nio(src), nio(dst), StandardCopyOption.REPLACE_EXISTING)
      }
      ()
    } else {
      fs.delete(dst, false)
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"failed to finalize $src -> $dst")
    }
}
