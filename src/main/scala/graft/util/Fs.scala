package graft.util

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Storage-layer filesystem helpers, expressed against the Hadoop
  * `FileSystem` API so the warehouse/upsert/state layout code works on any
  * Spark-reachable scheme (`file://`, `hdfs://`, `s3a://`, ...), not just the
  * local filesystem. Every helper resolves the filesystem from the path
  * itself via `Path.getFileSystem(conf)` — the conf should be
  * `spark.sparkContext.hadoopConfiguration` so scheme credentials/settings
  * follow the session.
  *
  * Single-writer semantics: `swapInto` is delete-then-rename, which is atomic
  * on HDFS-like filesystems (rename is a metadata op) and best-effort on
  * object stores; callers rely on the documented single-writer contract
  * (SURVEY.md ST3) plus idempotent re-runs for crash recovery.
  */
object Fs {

  def fileSystem(path: String, conf: Configuration): FileSystem =
    new Path(path).getFileSystem(conf)

  def exists(path: String, conf: Configuration): Boolean = {
    val p = new Path(path)
    p.getFileSystem(conf).exists(p)
  }

  /** True when `path` exists and has at least one child entry. */
  def nonEmptyDir(path: String, conf: Configuration): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** True when `path` contains at least one child DIRECTORY whose name starts
    * with `prefix` (partition-layout detection, e.g. `__graft_bucket=`). */
  def hasChildDirWithPrefix(path: String, prefix: String, conf: Configuration): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith(prefix))
  }

  /** Names of child directories of `path` starting with `prefix`. */
  def childDirsWithPrefix(path: String, prefix: String, conf: Configuration): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.collect {
      case s if s.isDirectory && s.getPath.getName.startsWith(prefix) => s.getPath.getName
    }
  }

  /** Cheap content fingerprint of everything under `path`: md5 over the
    * sorted recursive listing of (relative name, length, mtime). A rewrite
    * of any file — even same-size — changes the mtime and therefore the
    * fingerprint, without reading a byte of data. Metadata-only, so it is
    * O(files) namenode/inode work: fine to evaluate per query even when the
    * data itself is 100 TB. Missing path → "absent". */
  def fingerprint(path: String, conf: Configuration): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) "absent"
    else {
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val s = it.next()
        entries += s"${s.getPath.toUri.getPath}|${s.getLen}|${s.getModificationTime}"
      }
      org.apache.commons.codec.digest.DigestUtils
        .md5Hex(entries.sorted.mkString("\n")).substring(0, 12)
    }
  }

  def deleteRecursively(path: String, conf: Configuration): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, true): Unit
  }

  /** Replace `target` with `src` (delete-then-rename). The caller must have
    * fully materialized `src` first. */
  def swapInto(src: String, target: String, conf: Configuration): Unit = {
    val s = new Path(src)
    val t = new Path(target)
    val fs = s.getFileSystem(conf)
    if (fs.exists(t)) fs.delete(t, true): Unit
    val parent = t.getParent
    if (parent != null && !fs.exists(parent)) fs.mkdirs(parent): Unit
    if (!fs.rename(s, t))
      throw new java.io.IOException(s"rename failed: $src -> $target")
  }

  /** Write a marker file atomically-enough: content lands in a temp file
    * first, then renames over the target. A crash mid-write never leaves a
    * TORN/empty marker (readers parse markers to drive skip/layout
    * decisions; a torn marker would wedge them); the post-crash states are
    * "old marker intact" (overwrite-rename path) or — only on filesystems
    * without overwriting rename, where we must delete first — "marker
    * absent", which readers treat as not-applied/not-a-layout and the
    * replay guards re-derive. */
  def writeMarker(path: String, content: String, conf: Configuration): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val tmp = new Path(path + ".__graft_tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // Prefer a single overwriting rename (no absent-marker window); fall
    // back to delete-then-rename on filesystems that don't support it.
    val overwrote =
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
        fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        true
      } catch { case scala.util.control.NonFatal(_) => false }
    if (!overwrote) {
      if (fs.exists(p)) fs.delete(p, false): Unit
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(s"marker rename failed: $tmp -> $path")
    }
  }

  // Scratch dirs created by declared queries / harness mains (stream
  // checkpoints, sketch-lake seams, floor probes). Registered here and
  // deleted by a single JVM shutdown hook: repeated bench/correctness runs
  // previously leaked one temp tree per invocation (q107's daily-sketch
  // parquet copy alone is a full table per run).
  private val scratchDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val scratchHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      // Scratch dirs can hold embedded Derby databases (q99 / StreamFloors
      // JDBC sinks); Derby's OWN shutdown hook writes a final checkpoint
      // into the database directory at exit, racing this deletion and
      // leaving partial trees behind (advisor, r12). Shut the engine down
      // first — the system-wide shutdown URL deregisters Derby's hook and
      // flushes synchronously; XJ015 is its documented success signal.
      try {
        java.sql.DriverManager.getConnection("jdbc:derby:;shutdown=true")
        ()
      } catch {
        case _: java.sql.SQLException => () // XJ015 "system shut down" = ok
        case scala.util.control.NonFatal(_) => () // driver never loaded
      }
      scratchDirs.forEach { root =>
        try {
          java.nio.file.Files.walk(root)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(p => try java.nio.file.Files.deleteIfExists(p): Unit
                     catch { case _: java.io.IOException => })
        } catch { case scala.util.control.NonFatal(_) => }
      }
    }, "graft-scratch-cleanup"))
  }

  /** Create a LOCAL temp directory that is removed when this JVM exits.
    * For per-run scratch only (checkpoints, staging copies) — never for
    * data a later run must see (persisted indexes use the stable
    * `graft-index` root instead). */
  def scratchDir(prefix: String): String = {
    scratchHook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchDirs.add(p)
    p.toString
  }

  /** Create `path` with `content` ONLY if it does not already exist;
    * returns false when it does. On HDFS-like filesystems
    * `FileSystem.create(p, overwrite=false)` is an atomic namenode
    * operation. On the LOCAL filesystem Hadoop's create is
    * exists-check-then-create — NOT atomic (the 8-writer lock hammer in
    * UpsertSpec caught two same-instant winners) — so local paths go
    * through the kernel's O_CREAT|O_EXCL via java.nio instead. Parent
    * dirs are created as needed.
    *
    * Only "already exists" maps to false; any OTHER IOException (transient
    * network/permission failure) is rethrown — a lock caller must not
    * mistake an IO outage for "another writer holds the lock". NOTE on
    * object stores (s3a): `create(overwrite=false)` is a HEAD-then-PUT
    * check-then-create, not atomic — there this lock is ADVISORY (it
    * catches overlapping writers seconds apart, not same-instant races).
    * HDFS/ABFS create is an atomic namenode/metadata operation. */
  def createExclusive(path: String, content: String, conf: Configuration): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val isLocal = fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
    if (isLocal) {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      try {
        if (local.getParent != null)
          java.nio.file.Files.createDirectories(local.getParent)
        java.nio.file.Files.write(local,
          content.getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try {
        val out = fs.create(p, false)
        try out.write(content.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
        // Hadoop filesystems historically signal exists-collisions as bare
        // IOException with an "already exists" message; match that shape
        // but rethrow everything else (transient IO must not read as
        // "lock held by another writer").
        case e: java.io.IOException
            if e.getMessage != null &&
              e.getMessage.toLowerCase(java.util.Locale.ROOT)
                .contains("already exists") => false
      }
    }
  }

  def readMarker(path: String, conf: Configuration): Option[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, StandardCharsets.UTF_8).trim)
      } finally in.close()
    }
  }
}
