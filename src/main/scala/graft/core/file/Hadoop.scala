package graft.core.file

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Storage abstraction over Hadoop `FileSystem` — the analog of the
  * reference's storage-agnostic `MothDataSource` interface
  * (/root/reference/pkg/store/MothDataSource.go:14-17). Any scheme with a
  * registered FileSystem (hdfs://, s3a://, file:, …) works; scheme-less and
  * `file:` paths take a direct RandomAccessFile fast path (no Hadoop
  * wrapping on the hot local case).
  *
  * Executors resolve the configuration from the classpath
  * (core-site.xml/hdfs-site.xml — how Hadoop FS settings reach every JVM of
  * a real cluster); tests may mutate [[Sources.conf]] to register schemes
  * process-wide.
  */
object Sources {
  /** Process-wide Hadoop configuration (lazily built from the classpath). */
  lazy val conf: Configuration = new Configuration()

  private def isLocal(p: Path): Boolean = {
    val s = p.toUri.getScheme
    s == null || s == "file"
  }

  private def localPathOf(p: Path): String = p.toUri.getPath

  /** Positioned-read source for any supported path/URI. */
  def forPath(path: String): ByteSource = {
    val p = new Path(path)
    if (isLocal(p)) new FileSource(localPathOf(p)) else new HadoopSource(p, conf)
  }

  /** (size, mtime) for cache keying. */
  def status(path: String): (Long, Long) = {
    val p = new Path(path)
    if (isLocal(p)) {
      val f = new java.io.File(localPathOf(p))
      (f.length(), f.lastModified())
    } else {
      val s = p.getFileSystem(conf).getFileStatus(p)
      (s.getLen, s.getModificationTime)
    }
  }

  def fileSystemOf(path: String): FileSystem = new Path(path).getFileSystem(conf)

  /** All .moth files under `path` (or `path` itself if it is a file),
    * sorted by name — one listing RPC, no recursion (the writers lay files
    * flat, matching the reference's directory layout).
    */
  def listMoth(path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    if (st.isFile) Seq(fs.makeQualified(p).toString)
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".moth"))
      .map(_.getPath.toString)
      .sorted
  }
}

/** ByteSource over `FSDataInputStream` positioned reads (thread-safe per
  * the Hadoop PositionedReadable contract; no seek state shared between
  * concurrent readers of one split).
  */
final class HadoopSource(p: Path, conf: Configuration) extends ByteSource {
  private val fs = p.getFileSystem(conf)
  private val len = fs.getFileStatus(p).getLen
  private val in = fs.open(p)
  def size: Long = len
  protected def readImpl(pos: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    in.readFully(pos, out, 0, n)
    out
  }
  override def close(): Unit = in.close()
}
