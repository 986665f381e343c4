package graft.hadoop

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FileStatus, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local (`file:`) filesystem without process forks.
  *
  * With no native hadoop library on the classpath, Hadoop's local FS
  * shells out — `chmod` from `setPermission` on every created file, and
  * `readlink`/`ls` from `getFileLinkStatus`'s deprecated fallback on
  * every FileContext rename — so each streaming-checkpoint commit
  * (offset log, commit log, state deltas, schema files) and each parquet
  * task commit forks at least one process. jstack sampling showed those
  * forks, not the data, dominating the per-micro-batch floor.
  *
  * Overrides, both value-preserving on a local FS:
  *  - `setPermission` is a no-op ONLY for the default modes (file 666,
  *    dir 777, raw or umask-applied): the JVM already creates files at
  *    0666 & umask, which is exactly what the default-permission chmod
  *    would set. A caller requesting a NON-default mode (e.g. a 700
  *    staging dir) falls through to the real chmod instead of being
  *    silently dropped — nothing in this engine does today, but the
  *    class is registered session-wide.
  *  - `getFileLinkStatus` answers from `getFileStatus` (no readlink
  *    fork): the engine writes no symlinks, and for a regular file both
  *    calls return the same status.
  *
  * Scheme-bound to `file:` — on a production HDFS/S3 deployment these
  * classes never engage. Registered via `fs.file.impl` (FileSystem API)
  * and `fs.AbstractFileSystem.file.impl` (FileContext API, the one
  * streaming checkpoints use). Note the FileContext binding replaces the
  * checksummed `LocalFs`, so FileContext writes (streaming offset/commit
  * logs) lose their `.crc` sidecars: those logs are ephemeral
  * run-to-completion artifacts here (fresh checkpoint per query, deleted
  * after), where a crc sidecar buys nothing — not because another layer
  * checksums them.
  */
class NoForkRawLocalFileSystem extends RawLocalFileSystem {
  // computed once per FS instance (after initialize has set the conf) —
  // the hot create path must not re-parse the umask per file
  private lazy val defaultModes: Set[Short] = {
    val umask = FsPermission.getUMask(getConf)
    Set(
      FsPermission.getFileDefault.toShort,
      FsPermission.getDirDefault.toShort,
      FsPermission.getFileDefault.applyUMask(umask).toShort,
      FsPermission.getDirDefault.applyUMask(umask).toShort)
  }
  override def setPermission(p: Path, permission: FsPermission): Unit =
    if (permission != null && !defaultModes.contains(permission.toShort))
      super.setPermission(p, permission)
  override def getFileLinkStatus(f: Path): FileStatus = getFileStatus(f)
  override def supportsSymlinks(): Boolean = false
}

/** The FileSystem-API binding: a [[org.apache.hadoop.fs.LocalFileSystem]]
  * (several Spark components — e.g. the RocksDB checkpoint file manager —
  * pattern-match or cast the `file:` FileSystem to exactly that type)
  * whose wrapped raw FS is the fork-free one above. Checksum semantics
  * are LocalFileSystem's own, unchanged; only the raw layer's
  * shell-outs are gone. */
class NoForkLocalFileSystem extends LocalFileSystem(new NoForkRawLocalFileSystem)

/** The FileContext (AbstractFileSystem) binding of
  * [[NoForkRawLocalFileSystem]] — same delegation shape as Hadoop's own
  * `RawLocalFs`. */
class NoForkLocalFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new NoForkRawLocalFileSystem, conf, "file", false)
