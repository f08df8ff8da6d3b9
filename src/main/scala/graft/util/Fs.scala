package graft.util

/** Shared local-filesystem helpers (single-writer warehouse utilities). */
object Fs {
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  def writeMarker(path: String, content: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), content): Unit

  def readMarker(path: String): Option[String] = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p))
      Some(java.nio.file.Files.readString(p).trim)
    else None
  }
}
