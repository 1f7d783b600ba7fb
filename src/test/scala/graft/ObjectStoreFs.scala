package graft

import org.apache.hadoop.fs.{FSDataOutputStream, FileStatus, FileUtil, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

import java.net.URI

/** Test-only Hadoop FileSystem with OBJECT-STORE semantics over a local
  * directory, registered under the `graftobj://` scheme.
  *
  * Purpose: every Store/Iceberg IO path already routes through the Hadoop
  * `FileSystem` abstraction, but the only scheme this container can
  * exercise is `file://` (no s3a jar ships here). This impl closes that
  * gap as a tested CONTRACT: it forbids exactly the posix shortcuts object
  * stores lack, so any engine code that silently relied on them fails
  * loudly in ObjectStoreFsSpec instead of in production against S3
  * (reference write path: /root/reference/src/common/storage_utils.go:75-91).
  *
  * Deliberate differences from a posix FS, modeled on S3A:
  *  - `rename` is COPY + DELETE — non-atomic, never clobbers an existing
  *    destination object (returns false like S3A does);
  *  - `append` is unsupported (objects are immutable once written);
  *  - no client-side checksum shadow files (RawLocalFileSystem base);
  *  - hard links are impossible (the Store's local-link fast path is
  *    gated on the `file` scheme and must degrade to a copy here).
  */
class ObjectStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "graftobj"
  override def getUri: URI = URI.create("graftobj:///")

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(
      "append is not supported on an object store")

  // RawLocal's statuses load permissions LAZILY via `new java.io.File(uri)`,
  // which rejects any non-file scheme; materialize a plain status instead
  // (object stores report synthetic permissions anyway)
  private def solid(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      FsPermission.getDefault, null, null, st.getPath)

  override def getFileStatus(f: Path): FileStatus = solid(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(solid)

  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    ObjectStoreFs.renames.incrementAndGet()
    val target =
      if (exists(dst) && getFileStatus(dst).isDirectory) new Path(dst, src.getName)
      else dst
    if (exists(target)) return false // object stores do not clobber-rename
    // copy+delete, deliberately non-atomic (the S3A shape): a crash between
    // the two leaves BOTH trees — engine commit protocols must not depend
    // on rename atomicity on this scheme
    if (!FileUtil.copy(this, src, this, target, false, getConf)) return false
    delete(src, true)
    true
  }
}

object ObjectStoreFs {
  /** Rename invocations observed (spec hook: proves the scheme was hit). */
  val renames = new java.util.concurrent.atomic.AtomicLong()

  /** Register the scheme on the session's Hadoop conf (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftobj.impl", classOf[ObjectStoreFs].getName)
}
