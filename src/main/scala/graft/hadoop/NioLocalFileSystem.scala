package graft.hadoop

import java.nio.file.attribute.PosixFilePermission
import java.util.EnumSet

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` filesystem whose permission operations stay inside the
  * JVM.
  *
  * Hadoop's RawLocalFileSystem without libhadoop FORKS a `chmod` shell
  * process for every `setPermission` — and `mkdirs` / `create` with an
  * explicit FsPermission (every state-store directory and checkpoint
  * file Structured Streaming makes, every committed output file) route
  * through it. From a multi-GB JVM each fork is a milliseconds-scale
  * page-table copy; r22 thread sampling put 24/50 busy executor-task
  * samples of the stream-stream join inside
  * `RawLocalFileSystem.setPermission → Shell.execCommand` (plus 12 more
  * reading the forked process's output) — the same pathology class as
  * the r21 `renameTempFile → readlink` find, one layer deeper.
  *
  * The override sets the same 9 POSIX mode bits through
  * `java.nio.file.Files.setPosixFilePermissions` — no process, no page
  * tables, same resulting mode. Permissions beyond the POSIX nine
  * (sticky/setuid/setgid) and non-POSIX filesystems fall back to the
  * inherited shell path, so behavior is unchanged where nio cannot
  * express the request. Wired as `spark.hadoop.fs.file.impl`; on a
  * cluster with libhadoop the native chmod makes this class a harmless
  * near-no-op (it is strictly an in-JVM replacement for the fork
  * fallback).
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val bits = permission.toShort.toInt
    if ((bits & ~0x1ff) != 0) super.setPermission(p, permission)
    else {
      val set = EnumSet.noneOf(classOf[PosixFilePermission])
      import PosixFilePermission._
      if ((bits & 0x100) != 0) set.add(OWNER_READ)
      if ((bits & 0x080) != 0) set.add(OWNER_WRITE)
      if ((bits & 0x040) != 0) set.add(OWNER_EXECUTE)
      if ((bits & 0x020) != 0) set.add(GROUP_READ)
      if ((bits & 0x010) != 0) set.add(GROUP_WRITE)
      if ((bits & 0x008) != 0) set.add(GROUP_EXECUTE)
      if ((bits & 0x004) != 0) set.add(OTHERS_READ)
      if ((bits & 0x002) != 0) set.add(OTHERS_WRITE)
      if ((bits & 0x001) != 0) set.add(OTHERS_EXECUTE)
      try java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, set)
      catch {
        case _: UnsupportedOperationException =>
          super.setPermission(p, permission) // non-POSIX store: shell path
        case e: java.nio.file.NoSuchFileException =>
          throw new java.io.FileNotFoundException(e.getMessage)
      }
    }
    ()
  }
}

/** The checksummed `file://` filesystem over [[NioRawLocalFileSystem]] —
  * what `spark.hadoop.fs.file.impl` instantiates. Keeps
  * ChecksumFileSystem's CRC sidecar behavior for data files identical
  * to stock LocalFileSystem; only the permission syscall path changes.
  */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)
