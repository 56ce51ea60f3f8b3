package graft.tables

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Filesystem facade for the deltalike table format, so the log and
  * data-file plumbing aren't welded to `java.nio` (local disk only):
  * local paths keep the fast NIO path with hard-link atomic commits;
  * any other scheme (hdfs://, s3a://, ...) routes through Hadoop's
  * [[FileSystem]] — the same boundary Spark itself reads/writes through,
  * so a table root like `s3a://bucket/table` works wherever Spark does.
  *
  * Commit atomicity contract per store: NIO uses `Files.createLink`
  * (create-exclusive, atomic). Hadoop schemes use FileContext's
  * rename-without-overwrite (atomic on HDFS). Schemes known to LACK an
  * atomic rename (S3 family, GCS, ...) are rejected at `forPath` unless
  * `-Dgraft.io.allowNonAtomicRename=true` opts into single-writer
  * discipline — the caveat Delta documents for its S3 LogStore, enforced
  * instead of documented.
  */
private[tables] trait TableIO {
  /** File/dir names directly under `dir`; empty if `dir` is absent. */
  def listNames(dir: String): Seq[String]
  def isDir(path: String): Boolean
  def readLines(path: String): Seq[String]
  /** Publish `content` at `path` atomically; throw
    * [[java.nio.file.FileAlreadyExistsException]] if `path` exists.
    */
  def writeExclusive(path: String, content: String): Unit
  def writeString(path: String, content: String): Unit
  def mkdirs(path: String): Unit
  /** Metadata-only move (same filesystem). */
  def rename(src: String, dst: String): Unit
  def delete(path: String): Boolean
  def deleteRecursively(path: String): Unit
  def size(path: String): Long
  /** Last-modified epoch millis. */
  def modifiedTime(path: String): Long
  /** Byte-for-byte file copy; parent directories created as needed. */
  def copy(src: String, dst: String): Unit
  /** Relative paths of all regular files under `dir` (recursive). */
  def walkFiles(dir: String): Seq[String]
}

private[tables] object TableIO {
  /** Schemes whose rename is copy-then-delete or silently overwrites —
    * no atomic create-exclusive, so the commit protocol's mutual
    * exclusion does not hold. Failing fast here beats doc-level
    * discipline; a coordinated single-writer deployment can opt out via
    * `-Dgraft.io.allowNonAtomicRename=true` (the same posture as Delta's
    * S3 single-cluster LogStore).
    */
  private val NonAtomicRenameSchemes = Set("s3", "s3a", "s3n", "gs", "oss", "cos")

  /** Local paths (no scheme / file:) get NIO; anything else Hadoop.
    * `-Dgraft.io.forceHadoop=true` routes local paths through
    * [[HadoopTableIO]] too — CI uses it to drive a full table lifecycle
    * through the non-NIO branch without a cluster.
    */
  def forPath(path: String): TableIO = {
    val scheme = new HPath(path).toUri.getScheme
    if ((scheme == null || scheme == "file") &&
      !java.lang.Boolean.getBoolean("graft.io.forceHadoop")) NioTableIO
    else if (scheme == null || scheme == "file")
      new HadoopTableIO(new HPath(path), hadoopConf())
    else {
      require(
        !NonAtomicRenameSchemes.contains(scheme) ||
          java.lang.Boolean.getBoolean("graft.io.allowNonAtomicRename"),
        s"scheme '$scheme' lacks atomic rename: concurrent commits can corrupt " +
          "the log. Set -Dgraft.io.allowNonAtomicRename=true only with " +
          "single-writer discipline or an external commit coordinator.")
      new HadoopTableIO(new HPath(path), hadoopConf())
    }
  }

  private def hadoopConf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
}

/** Local-disk implementation — hard-link commits, NIO walks. */
private[tables] object NioTableIO extends TableIO {
  def listNames(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala.map(_.getFileName.toString).toSeq
      finally s.close()
    }
  }

  def isDir(path: String): Boolean = Files.isDirectory(Paths.get(path))

  def readLines(path: String): Seq[String] =
    Files.readAllLines(Paths.get(path)).asScala.toSeq

  def writeExclusive(path: String, content: String): Unit = {
    val target = Paths.get(path)
    val tmp = Files.createTempFile(target.getParent, s".tmp-${target.getFileName}-", ".json")
    try {
      Files.writeString(tmp, content)
      Files.createLink(target, tmp) // atomic create-exclusive
    } finally Files.deleteIfExists(tmp)
  }

  def writeString(path: String, content: String): Unit =
    Files.writeString(Paths.get(path), content): Unit

  def mkdirs(path: String): Unit = Files.createDirectories(Paths.get(path)): Unit

  def rename(src: String, dst: String): Unit =
    Files.move(Paths.get(src), Paths.get(dst), StandardCopyOption.ATOMIC_MOVE): Unit

  def delete(path: String): Boolean = Files.deleteIfExists(Paths.get(path))

  def deleteRecursively(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally s.close()
    }
  }

  def size(path: String): Long = Files.size(Paths.get(path))

  def modifiedTime(path: String): Long =
    Files.getLastModifiedTime(Paths.get(path)).toMillis

  def copy(src: String, dst: String): Unit = {
    val d = Paths.get(dst)
    Files.createDirectories(d.getParent)
    Files.copy(Paths.get(src), d, StandardCopyOption.REPLACE_EXISTING): Unit
  }

  def walkFiles(dir: String): Seq[String] = {
    val root = Paths.get(dir)
    val s = Files.walk(root)
    try s.iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(root.relativize(_).toString)
      .toSeq
    finally s.close()
  }
}

/** Hadoop-FileSystem implementation for non-local schemes. */
private[tables] final class HadoopTableIO(anchor: HPath, conf: Configuration)
    extends TableIO {
  private val fs: FileSystem = anchor.getFileSystem(conf)

  def listNames(dir: String): Seq[String] = {
    val p = new HPath(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }

  def isDir(path: String): Boolean = {
    val p = new HPath(path)
    fs.exists(p) && fs.getFileStatus(p).isDirectory
  }

  def readLines(path: String): Seq[String] = {
    val in = fs.open(new HPath(path))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** None when the scheme ships no AbstractFileSystem binding (s3a, gs,
    * ... provide only a FileSystem) — those reach this class solely via
    * the `allowNonAtomicRename` opt-in, whose contract is single-writer
    * discipline anyway, so the non-atomic fallback below is acceptable
    * there by construction.
    */
  private lazy val fcOpt: Option[org.apache.hadoop.fs.FileContext] =
    try Some(
      if (anchor.toUri.getScheme == null)
        org.apache.hadoop.fs.FileContext.getFileContext(conf)
      else org.apache.hadoop.fs.FileContext.getFileContext(anchor.toUri, conf))
    catch { case _: org.apache.hadoop.fs.UnsupportedFileSystemException => None }

  def writeExclusive(path: String, content: String): Unit = {
    val target = new HPath(path)
    val tmp = new HPath(target.getParent, s".tmp-${target.getName}-${java.util.UUID.randomUUID().toString.take(8)}")
    write(tmp, content)
    // FileContext.rename WITHOUT Rename.OVERWRITE: one atomic
    // rename-no-overwrite primitive on HDFS (no exists() probe, no
    // TOCTOU window — the FileSystem.rename path silently overwrites on
    // some stores and needed a racy pre-check). Readers still never see
    // partial files: content lands in tmp first.
    try fcOpt match {
      case Some(fc) => fc.rename(tmp, target)
      case None => // opt-in non-atomic scheme: best-effort probe + rename
        if (fs.exists(target) || !fs.rename(tmp, target))
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(path)
    } catch {
      case e: java.io.IOException =>
        fs.delete(tmp, false)
        // FileAlreadyExistsException (hadoop.fs or mapped) and the
        // generic-IOE-because-target-exists case both mean: lost the race
        if (e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] ||
          fs.exists(target))
          throw new java.nio.file.FileAlreadyExistsException(path)
        else throw e
    }
  }

  def writeString(path: String, content: String): Unit =
    write(new HPath(path), content)

  private def write(p: HPath, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def mkdirs(path: String): Unit = { fs.mkdirs(new HPath(path)): Unit }

  def rename(src: String, dst: String): Unit = {
    if (!fs.rename(new HPath(src), new HPath(dst)))
      throw new java.io.IOException(s"rename $src -> $dst failed")
  }

  def delete(path: String): Boolean = fs.delete(new HPath(path), false)

  def deleteRecursively(path: String): Unit = {
    val p = new HPath(path)
    if (fs.exists(p)) fs.delete(p, true): Unit
  }

  def size(path: String): Long = fs.getFileStatus(new HPath(path)).getLen

  def modifiedTime(path: String): Long =
    fs.getFileStatus(new HPath(path)).getModificationTime

  def copy(src: String, dst: String): Unit =
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new HPath(src), fs, new HPath(dst),
      false /* deleteSource */, true /* overwrite */, conf): Unit

  def walkFiles(dir: String): Seq[String] = {
    val root = new HPath(dir)
    if (!fs.exists(root)) return Seq.empty
    val rootUri = fs.getFileStatus(root).getPath.toUri.getPath
    val it = fs.listFiles(root, true)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile)
        out += st.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
    }
    out.toSeq
  }
}
