package graft.io

import java.io.{BufferedInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.zip.ZipInputStream

/** E-stage of the reference pipeline: archive download + extraction
  * (reference extract/execute.py:10-33; SURVEY.md §2.1 S1/S2).
  *
  * Driver-side, single-process by design — this runs BEFORE any Spark
  * job, staging raw archives onto shared storage. Streaming copy in
  * bounded chunks (no whole-file buffering), zip-slip guarded.
  */
object Extract {

  /** Stream a URL (http(s) or file scheme) to `dest`, 8 KiB chunks —
    * same chunked-download shape as the reference. */
  def download(url: String, dest: Path): Path = {
    val in = new BufferedInputStream(new java.net.URI(url).toURL.openStream())
    try {
      Files.createDirectories(dest.getParent)
      Files.copy(in, dest, StandardCopyOption.REPLACE_EXISTING)
      dest
    } finally in.close()
  }

  /** Extract a zip into `destDir` (zip-slip safe), return entries. */
  def unzip(zip: Path, destDir: Path): Seq[Path] = {
    Files.createDirectories(destDir)
    val zin = new ZipInputStream(new BufferedInputStream(Files.newInputStream(zip)))
    val out = Seq.newBuilder[Path]
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        val target = destDir.resolve(entry.getName).normalize()
        require(target.startsWith(destDir.normalize()),
          s"zip entry escapes destination: ${entry.getName}")
        if (entry.isDirectory) Files.createDirectories(target)
        else {
          Files.createDirectories(target.getParent)
          val fos = new FileOutputStream(target.toFile)
          try {
            val buf = new Array[Byte](8192)
            var n = zin.read(buf)
            while (n >= 0) { fos.write(buf, 0, n); n = zin.read(buf) }
          } finally fos.close()
          out += target
        }
        zin.closeEntry()
        entry = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** Reference flow: download → unzip → delete the archive. */
  def downloadAndExtract(url: String, workDir: Path): Seq[Path] = {
    val zip = download(url, workDir.resolve("downloaded.zip"))
    val files = unzip(zip, workDir)
    Files.deleteIfExists(zip)
    files
  }
}
