package graft.sources.sstable

import java.io.IOException
import java.net.URI
import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardCopyOption}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Object-store-SEMANTICS simulation backend (`objsim://` scheme): a
  * Hadoop `FileSystem` over local disk that exposes exactly the
  * capability set of an S3/GCS-class store instead of POSIX's, so every
  * layer above [[HadoopStorage]] — the lease, staged commits, trash
  * swaps, snapshots, the whole SQL catalog — can be driven end-to-end
  * against the semantics of the 100 TB deployment target (VERDICT r10
  * missing #4: "the largest unproven assumption") without network or
  * vendor SDKs. Wire it with:
  *
  * {{{
  * spark.hadoop.fs.objsim.impl = graft.sources.sstable.ObjSimFileSystem
  * spark.hadoop.fs.AbstractFileSystem.objsim.impl =
  *   graft.sources.sstable.ObjSimAbstractFs
  * warehouse = objsim:///abs/local/path
  * }}}
  *
  * The modeled contract (each simulated with local primitives, which is
  * an implementation detail — what matters is the semantics the layers
  * above can observe):
  *  - **No hardlinks.** `HadoopStorage` never overrides `Storage.link`,
  *    so pins/publishes byte-copy and `linkIsCheap=false` routes the
  *    catalog write path to in-directory staging (link-publish gated
  *    off) — exactly the real-adapter behavior.
  *  - **No server-side rename.** [[rename]] is a client-side copy then
  *    delete. A FILE rename refuses an existing destination ATOMICALLY
  *    (modeling a conditional PUT / If-None-Match — the primitive
  *    `MaintenanceLease.acquire`'s exclusivity needs; S3 and GCS both
  *    have it) and the destination appears only complete (PUT
  *    visibility). A DIRECTORY rename is per-object copy+delete and is
  *    NOT atomic: a concurrent lister can observe both trees, a partial
  *    destination, or (briefly) neither name for a given object. The
  *    catalog's CTAS commit / trash swaps stay CORRECT for their
  *    single-actor design (staged DDL is lease/refusal-guarded), but
  *    the one-rename atomicity POSIX/HDFS gave them degrades to a
  *    visibility window — the documented capability-matrix entry for
  *    object-store deployments.
  *  - **Atomic overwrite PUT.** `Storage.replace` (via
  *    `FileContext.rename(OVERWRITE)` → [[ObjSimAbstractFs]]) swaps the
  *    full object atomically — readers see old bytes or new bytes,
  *    never a missing `_table` (the ADVICE r8 window this seam exists
  *    to keep closed).
  *  - **Synthetic directory metadata.** Prefixes are not objects:
  *    directory `getFileStatus` reports mtime 0. Liveness/retention
  *    logic must ride FILE stamps — `_pinned-at` (r9), the stage/trash
  *    heartbeat stamps, staging-file mtimes (both r11, found by this
  *    audit) — and the suites prove it does.
  *  - **No append** (object immutability): loud UnsupportedOperation.
  *  - **PUT visibility on create:** a writer's in-progress object does
  *    not exist until close (staged to a hidden sibling, moved — i.e.
  *    "uploaded" — on close).
  */
class ObjSimFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "objsim"
  override def getUri: URI = ObjSimFileSystem.NameUri

  private def local(p: Path): java.nio.file.Path = {
    val raw = p.toUri.getPath
    require(raw != null && raw.startsWith("/"), s"objsim path must be absolute: $p")
    Paths.get(raw)
  }

  /** Prefixes are free on an object store: materialize local parents on
    * demand so a bare PUT under an unseen prefix succeeds. */
  private def mkParents(d: java.nio.file.Path): Unit = {
    val parent = d.getParent
    if (parent != null) Files.createDirectories(parent)
    ()
  }

  /** Directory statuses carry SYNTHETIC metadata (prefixes are not
    * objects): mtime 0, like S3A's pseudo-directory statuses. */
  override def getFileStatus(f: Path): FileStatus = {
    val s = super.getFileStatus(f)
    if (!s.isDirectory) s
    else new FileStatus(0L, true, 0, 0L, 0L, s.getPath)
  }

  /** Client-side copy + delete. Files: conditional-PUT refusal (atomic)
    * + full-object visibility. Directories: per-object, non-atomic. */
  override def rename(src: Path, dst: Path): Boolean = {
    val s = local(src)
    val d = local(dst)
    if (!Files.exists(s)) return false
    if (Files.exists(d)) return false
    if (Files.isDirectory(s)) {
      copyTree(s, d)
      deleteTree(s)
      true
    } else {
      mkParents(d)
      val tmp = d.resolveSibling(
        s".${d.getFileName}.put-${java.util.UUID.randomUUID().toString.take(8)}")
      Files.copy(s, tmp, StandardCopyOption.REPLACE_EXISTING)
      try Files.createLink(d, tmp) // the If-None-Match condition, atomically
      catch {
        case _: FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          return false
      }
      Files.deleteIfExists(tmp)
      Files.delete(s)
      true
    }
  }

  private def children(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val st = Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.toVector
    } finally st.close()
  }
  private def copyTree(s: java.nio.file.Path, d: java.nio.file.Path): Unit = {
    Files.createDirectories(d)
    children(s).foreach { child =>
      val target = d.resolve(child.getFileName)
      if (Files.isDirectory(child)) copyTree(child, target)
      else Files.copy(child, target, StandardCopyOption.REPLACE_EXISTING)
    }
  }
  private def deleteTree(s: java.nio.file.Path): Unit = {
    if (Files.isDirectory(s)) children(s).foreach(deleteTree)
    Files.deleteIfExists(s)
    ()
  }

  /** PUT visibility: bytes stage to a hidden sibling and "upload" (one
    * atomic move) at close — the object never exists half-written, and
    * a non-overwrite create refuses an existing object at close time
    * (conditional PUT). */
  // RawLocalFileSystem dispatches some public create() overloads to this
  // variant directly, bypassing the permission one — route both here
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    create(f, null: FsPermission, overwrite, bufferSize, replication,
      blockSize, progress)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val d = local(f)
    if (!overwrite && Files.exists(d))
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(
        s"objsim: $f already exists")
    mkParents(d)
    val tmp = d.resolveSibling(
      s".${d.getFileName}.put-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = Files.newOutputStream(tmp)
    val put = new java.io.FilterOutputStream(out) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
      override def close(): Unit = {
        super.close()
        if (overwrite)
          Files.move(tmp, d, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
        else {
          try Files.createLink(d, tmp)
          catch {
            case e: FileAlreadyExistsException =>
              Files.deleteIfExists(tmp)
              throw new IOException(s"objsim: $f already exists (conditional PUT)", e)
          }
          Files.deleteIfExists(tmp)
        }
        ()
      }
    }
    new FSDataOutputStream(put, null)
  }

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(
      "objsim: objects are immutable — no append")
}

object ObjSimFileSystem {
  private val NameUri = URI.create("objsim:///")
  /** Hadoop conf entries that wire the scheme up (use with `new
    * Configuration` directly or prefixed `spark.hadoop.` on a session). */
  val ConfEntries: Seq[(String, String)] = Seq(
    "fs.objsim.impl" -> classOf[ObjSimFileSystem].getName,
    "fs.AbstractFileSystem.objsim.impl" -> classOf[ObjSimAbstractFs].getName)
  def conf(): Configuration = {
    val c = new Configuration()
    ConfEntries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

/** The `FileContext` binding for `objsim://`, supplying the ONE primitive
  * [[graft.sources.sstable.HadoopStorage.replace]] rides: an ATOMIC
  * overwrite (object stores' full-object PUT) — a reader of the
  * destination sees old bytes or new bytes, never a missing object. */
class ObjSimAbstractFs(uri: URI, conf: Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      uri, new ObjSimFileSystem, conf, "objsim", false) {
  override def renameInternal(src: Path, dst: Path,
                              overwrite: Boolean): Unit =
    if (overwrite) {
      Files.move(Paths.get(src.toUri.getPath), Paths.get(dst.toUri.getPath),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      ()
    } else renameInternal(src, dst)
}
