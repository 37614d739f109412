package graft

/** CONTENT stamp of a parquet table (a `<table>.parquet` file or
  * part-file directory) — the cache key the session-scoped store
  * caches ([[graft.queries.IrSql]] bm25 stats store,
  * [[graft.ops.Similarity]] / [[graft.ops.Pq]] loaded ANN stores) use
  * so "built once per corpus" means corpus CONTENT, not path.
  *
  * Folds, per part file: name, size, mtime, and a CRC32 of the LAST
  * 64 bytes. The tail of a parquet file is its footer (column-chunk
  * offsets, row-group stats, the footer-length word), which moves on
  * virtually any content change — so a corpus rewritten IN PLACE
  * within one mtime tick with identical file names and sizes still
  * changes the stamp (r12 ADVICE: the same-millisecond rewrite window
  * name+size+mtime alone leaves open). Cost: one ≤64-byte pread per
  * part file, driver-side, once per cache-key computation. */
object StoreStamp {

  def of(dir: String, table: String): String = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val p = Paths.get(dir, s"$table.parquet")
    if (Files.isDirectory(p)) {
      val ls = Files.list(p)
      try ls.iterator().asScala.toSeq.sortBy(_.toString)
        .filter(_.toString.endsWith(".parquet"))
        .map(f => s"${f.getFileName}:${Files.size(f)}:" +
          s"${Files.getLastModifiedTime(f).toMillis}:${tailCrc(f)}")
        .mkString(",")
      finally ls.close()
    } else s"${Files.size(p)}:" +
      s"${Files.getLastModifiedTime(p).toMillis}:${tailCrc(p)}"
  }

  private def tailCrc(p: java.nio.file.Path): Long = {
    val ch = java.nio.channels.FileChannel.open(
      p, java.nio.file.StandardOpenOption.READ)
    try {
      val n = math.min(64L, ch.size()).toInt
      val buf = java.nio.ByteBuffer.allocate(n)
      ch.position(ch.size() - n)
      while (buf.hasRemaining && ch.read(buf) >= 0) {}
      val crc = new java.util.zip.CRC32
      crc.update(buf.array(), 0, buf.position())
      crc.getValue
    } finally ch.close()
  }
}
