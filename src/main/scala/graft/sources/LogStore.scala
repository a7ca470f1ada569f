package graft.sources

import java.io.InputStream
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The MANIFEST-PLANE storage contract of a [[SnapshotTable]] — every
  * byte of transactional metadata (delta manifests, full-state
  * anchors, deletion-vector sidecars) goes through one of these, so
  * the commit protocol's correctness rests on exactly ONE primitive
  * per backing store: [[putIfAbsent]], an atomic create-if-not-exists
  * publish. A losing racer MUST observe `false` (or an exception it
  * maps to `false`) — never silently replace the winner's bytes; that
  * single guarantee is what makes commits linearizable
  * (Delta Lake's LogStore is the published precedent for this seam).
  *
  * Two shipped implementations:
  *
  *  - [[PosixLogStore]] (default): java.nio on a shared POSIX root.
  *    The publish primitive is `Files.createLink` — POSIX `rename(2)`
  *    silently REPLACES an existing target, while hard-link creation
  *    atomically fails when the target exists.
  *  - [[HadoopFsLogStore]]: Hadoop `FileContext` with
  *    `Options.Rename.NONE` — the rename refuses an existing
  *    destination, which IS atomic-no-overwrite on HDFS (and checked
  *    on the local `file://` scheme, which is how the full spec
  *    battery exercises this adapter without a cluster). An
  *    object-store deployment supplies a conditional-put
  *    (`If-None-Match`) implementation of the same trait.
  *
  * Path tokens are the table root's own namespace (the same contract
  * Delta's Hadoop-Path-typed LogStore uses): both shipped stores
  * address a filesystem root — POSIX directly, Hadoop via `toUri`.
  * Everything except [[putIfAbsent]] is plain (non-atomic) read /
  * list / delete plumbing, present on any store client.
  *
  * Implementations must be [[Serializable]] and cheap to reconstruct:
  * deletion-vector sidecars are written and read from EXECUTOR tasks,
  * which capture the store in the task closure.
  */
trait LogStore extends Serializable {

  /** Atomically publish `bytes` at `path` iff nothing exists there.
    * Returns false when a concurrent writer already owns `path` — the
    * caller retries against the new head. NEVER replaces existing
    * content. */
  def putIfAbsent(path: Path, bytes: Array[Byte]): Boolean

  /** Publish a file STAGED by `stage` (for codecs that must write
    * through their own writer, e.g. the parquet anchor codec) at
    * `path` iff absent, with [[putIfAbsent]]'s exact race contract.
    * The default stages to a scratch file and republishes its bytes;
    * stores with a cheaper local primitive (hard link) override. */
  def putFileIfAbsent(path: Path, stage: Path => Unit): Boolean = {
    val tmp = Files.createTempFile(
      path.getParent, s"_tmp_${path.getFileName}-", ".inprogress")
    try {
      Files.deleteIfExists(tmp) // some writers refuse existing paths
      stage(tmp)
      putIfAbsent(path, Files.readAllBytes(tmp))
    } finally { Files.deleteIfExists(tmp); () }
  }

  def exists(path: Path): Boolean
  def open(path: Path): InputStream
  def readLines(path: Path): Seq[String] = {
    val in = open(path)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }
  def readBytes(path: Path): Array[Byte] = {
    val in = open(path)
    try in.readAllBytes() finally in.close()
  }
  /** Immediate child FILE names of `dir` (no directories, no paths). */
  def list(dir: Path): Seq[String]
  /** Immediate child DIRECTORY names of `dir`. */
  def listDirs(dir: Path): Seq[String]
  /** Delete if present; false when nothing was there. */
  def delete(path: Path): Boolean
  def mkdirs(dir: Path): Unit
  def size(path: Path): Long
  /** Stable identifier, recorded by diagnostics and specs. */
  def name: String
}

/** java.nio on a shared POSIX root (NFS, Lustre, local disk). The
  * publish primitive is hard-link creation: the one POSIX filesystem
  * operation that atomically fails when the target exists. */
object PosixLogStore extends LogStore {
  override def putIfAbsent(path: Path, bytes: Array[Byte]): Boolean = {
    val tmp = Files.createTempFile(
      path.getParent, s"_tmp_${path.getFileName}-", ".inprogress")
    Files.write(tmp, bytes)
    try {
      Files.createLink(path, tmp)
      Files.deleteIfExists(tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); false
    }
  }

  /** Link the staged file directly — no byte round-trip. */
  override def putFileIfAbsent(path: Path, stage: Path => Unit): Boolean = {
    val tmp = Files.createTempFile(
      path.getParent, s"_tmp_${path.getFileName}-", ".inprogress")
    try {
      Files.deleteIfExists(tmp)
      stage(tmp)
      try { Files.createLink(path, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally { Files.deleteIfExists(tmp); () }
  }

  override def exists(path: Path): Boolean = Files.exists(path)
  override def open(path: Path): InputStream = Files.newInputStream(path)
  override def readLines(path: Path): Seq[String] =
    Files.readAllLines(path).asScala.toList
  override def readBytes(path: Path): Array[Byte] = Files.readAllBytes(path)
  override def list(dir: Path): Seq[String] = {
    val st = Files.list(dir)
    try st.iterator().asScala.filter(Files.isRegularFile(_))
      .map(_.getFileName.toString).toList
    finally st.close()
  }
  override def listDirs(dir: Path): Seq[String] = {
    val st = Files.list(dir)
    try st.iterator().asScala.filter(Files.isDirectory(_))
      .map(_.getFileName.toString).toList
    finally st.close()
  }
  override def delete(path: Path): Boolean = Files.deleteIfExists(path)
  override def mkdirs(dir: Path): Unit = { Files.createDirectories(dir); () }
  override def size(path: Path): Long = Files.size(path)
  override def name: String = "posix"
}

/** Hadoop `FileContext` adapter — the commit plane for storage where
  * hard links don't exist (HDFS, and any scheme with an
  * atomic-no-overwrite rename). The publish primitive is
  * `FileContext.rename(src, dst, Options.Rename.NONE)`: the rename
  * REFUSES an existing destination (`FileAlreadyExistsException`),
  * which HDFS implements atomically in the NameNode. The local
  * `file://` scheme (RawLocalFs) implements the same refuse contract
  * (check-then-rename), which is what lets the entire SnapshotTable
  * spec battery run against this adapter on local disk.
  *
  * Stateless and serializable: the `FileContext` is rebuilt lazily
  * per JVM (executor tasks capture the store for sidecar I/O). A
  * cluster deployment injects its own `core-site` via the default
  * Hadoop configuration chain — this adapter adds nothing on top.
  */
final class HadoopFsLogStore extends LogStore {
  import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path => HPath}

  @transient private lazy val fc: FileContext =
    FileContext.getFileContext(new org.apache.hadoop.conf.Configuration())

  private def hp(p: Path): HPath = new HPath(p.toUri)

  override def putIfAbsent(path: Path, bytes: Array[Byte]): Boolean = {
    val dst = hp(path)
    val tmp = hp(path.resolveSibling(
      s"_tmp_${path.getFileName}-${System.nanoTime()}" +
        s"_t${Thread.currentThread().getId}.inprogress"))
    val out = fc.create(tmp,
      java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(bytes) finally out.close()
    // HDFS implements Rename.NONE atomically in the NameNode; the
    // LOCAL scheme (RawLocalFs — the spec battery's transport) is a
    // check-then-rename whose window a concurrent same-JVM writer
    // could slip through, and POSIX rename(2) would then silently
    // REPLACE the winner — serialize same-JVM publishes to the same
    // target through an interned monitor. CROSS-process local races
    // remain the POSIX store's job (its hard link is the atomic local
    // primitive and the default for local roots); this adapter's
    // design point is the schemes whose rename is atomic.
    val monitor = HadoopFsLogStore.publishMonitor(path)
    try monitor.synchronized {
      if (fc.util().exists(dst)) { fc.delete(tmp, false); return false }
      fc.rename(tmp, dst); true // default Options.Rename.NONE
    }
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
          _: java.nio.file.FileAlreadyExistsException |
          _: org.apache.hadoop.fs.ParentNotDirectoryException =>
        fc.delete(tmp, false); false
      case _: java.io.IOException if fc.util().exists(dst) =>
        // some AbstractFileSystems surface the refused rename as a
        // generic IOException — the destination existing is the signal
        fc.delete(tmp, false); false
    }
  }

  /** Stage to a LOCAL scratch file (the parent may live on a remote
    * scheme), then publish the bytes through [[putIfAbsent]]. */
  override def putFileIfAbsent(path: Path, stage: Path => Unit): Boolean = {
    val tmp = Files.createTempFile(s"_graft_stage_${path.getFileName}-", ".tmp")
    try {
      Files.deleteIfExists(tmp)
      stage(tmp)
      putIfAbsent(path, Files.readAllBytes(tmp))
    } finally { Files.deleteIfExists(tmp); () }
  }

  override def exists(path: Path): Boolean = fc.util().exists(hp(path))
  override def open(path: Path): InputStream = fc.open(hp(path))
  override def list(dir: Path): Seq[String] = {
    val it = fc.listStatus(hp(dir))
    val b = List.newBuilder[String]
    while (it.hasNext) { val s = it.next(); if (s.isFile) b += s.getPath.getName }
    b.result()
  }
  override def listDirs(dir: Path): Seq[String] = {
    val it = fc.listStatus(hp(dir))
    val b = List.newBuilder[String]
    while (it.hasNext) {
      val s = it.next(); if (s.isDirectory) b += s.getPath.getName }
    b.result()
  }
  override def delete(path: Path): Boolean =
    try fc.delete(hp(path), false)
    catch { case _: java.io.FileNotFoundException => false }
  override def mkdirs(dir: Path): Unit =
    fc.mkdir(hp(dir), FileContext.DIR_DEFAULT_PERM, true)
  override def size(path: Path): Long = fc.getFileStatus(hp(path)).getLen
  override def name: String = "hadoop-fs"
}

object HadoopFsLogStore {
  // interned per-target monitors for the local-scheme publish window;
  // bounded: keyed by the target file name only (manifest names are
  // v<digits>.json — collisions across tables just over-serialize)
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[sources] def publishMonitor(p: java.nio.file.Path): Object = {
    if (monitors.size > 1024) monitors.clear() // monitors are stateless
    monitors.computeIfAbsent(p.getFileName.toString, _ => new Object)
  }
}

object LogStore {
  val posix: LogStore = PosixLogStore
  val hadoopFs: LogStore = new HadoopFsLogStore

  /** System property selecting the DEFAULT store for tables opened
    * without an explicit one (`posix` | `hadoop-fs`). Read per table
    * construction, so a spec battery can swap the whole commit plane
    * without touching call sites. */
  val DefaultProp = "graft.logstore"

  // roots OPENED with an explicit store pin it here, so internal
  // re-constructions (catalog loads, DML rules, maintenance verbs)
  // of the same root resolve the same commit primitive. Bounded
  // ACCESS-ORDER LRU: on overflow only the least-recently-RESOLVED
  // pin drops (scratch roots from bench reps churn through; a live
  // table's pin is refreshed by every forRoot hit, so it never falls
  // back mid-lineage to a different publish primitive).
  private val pinned =
    new java.util.LinkedHashMap[String, LogStore](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, LogStore]): Boolean = size > 4096
    }

  private[sources] def pin(root: String, store: LogStore): Unit =
    pinned.synchronized { pinned.put(root, store); () }

  /** Resolve the store for `root`: an explicit pin wins, then the
    * [[DefaultProp]] system property, then POSIX. */
  def forRoot(root: String): LogStore =
    Option(pinned.synchronized(pinned.get(root))).getOrElse(
      sys.props.get(DefaultProp) match {
        case Some("hadoop-fs") | Some("hadoop") => hadoopFs
        case _ => posix
      })
}
