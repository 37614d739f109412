package graft.sources

import java.util
import scala.collection.JavaConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 reader for TREC XML collections — the reference's
  * split-boundary-safe `XMLInputFormat` scan
  * (`CODE/edu/umd/cloud9/collection/XMLInputFormat.java:41-198`)
  * re-expressed on Spark's public connector API (SURVEY §2.1 row 1:
  * "at 100 TB: custom DataSourceV2/FileFormat with the same
  * split-realignment").
  *
  * Semantics: a file is a concatenation of `<DOC> … </DOC>` blocks;
  * each block is one row `(docid, content)` where docid is the trimmed
  * text between `<DOCNO>`/`</DOCNO>` (`TrecDocument.java:76-89`) and
  * content is the whole block including the delimiting tags
  * (`TrecDocument.java:94-96` — the reference indexes the raw doc).
  *
  * Scale design:
  *  - files are split into byte ranges of `splitSize` (default
  *    128 MiB); a record belongs to the split where its `<DOC>` tag
  *    STARTS, and the reader scans past its range end to finish the
  *    last record — the same ownership rule the reference's
  *    `readUntilMatch` establishes, so multi-GB single files
  *    parallelize without record tearing;
  *  - `.gz` files are not splittable and read whole
  *    (`XMLInputFormat.java:82-100`);
  *  - required-column pruning is pushed into the reader: a
  *    `select(docid)` never materializes content strings.
  *
  * Usage: `spark.read.format("trec").option("path", dir).load()`.
  */
class TrecDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "trec"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TrecDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TrecTable(new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = false
}

object TrecDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("docid", StringType),
    StructField("content", StringType),
    StructField("metadata", MapType(StringType, StringType))))

  /** Reference URL scrub (`TrecWebParser.java:37-53`), JVM form for the
    * reader path; the relational twin is
    * [[graft.corpus.TrecCorpus.scrubUrl]] (spec-pinned to agree). */
  private[sources] def scrubUrl(u0: String): String = {
    var url = u0
    if (url.nonEmpty && url.last == '#') url = url.dropRight(1)
    url = url.toLowerCase(java.util.Locale.ROOT)
    url = url.replace(":80/", "/")
    if (url.endsWith(":80")) url = url.replace(":80", "")
    while (url.nonEmpty && url.last == '/') url = url.dropRight(1)
    url
  }

  val DefaultSplitSize: Long = 128L * 1024 * 1024

  private[sources] val DocOpen = "<DOC>".getBytes("UTF-8")
  private[sources] val DocClose = "</DOC>".getBytes("UTF-8")
}

private[sources] class TrecTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"trec(${options.get("path")})"
  override def schema(): StructType = TrecDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new TrecScanBuilder(opts)
}

private[sources] class TrecScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = TrecDataSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new TrecScan(
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("trec source requires a path")),
    Option(options.get("splitSize")).map(_.toLong)
      .getOrElse(TrecDataSource.DefaultSplitSize),
    required)
}

private[sources] case class TrecInputPartition(path: String, start: Long,
                                               length: Long, gzip: Boolean)
    extends InputPartition

private[sources] class TrecScan(path: String, splitSize: Long,
                                required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files = {
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).filter(_.isFile)
          .filterNot(f => f.getPath.getName.startsWith("_") ||
            f.getPath.getName.startsWith("."))
          .sortBy(_.getPath.toString)
      else Array(st)
    }
    files.flatMap { f =>
      val gz = f.getPath.getName.endsWith(".gz")
      if (gz || f.getLen <= splitSize)
        Seq(TrecInputPartition(f.getPath.toString, 0, f.getLen, gz))
      else
        (0L until f.getLen by splitSize).map { off =>
          TrecInputPartition(f.getPath.toString, off,
            math.min(splitSize, f.getLen - off), gzip = false)
        }
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TrecPartitionReaderFactory(required)
}

private[sources] class TrecPartitionReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TrecPartitionReader(partition.asInstanceOf[TrecInputPartition], required)
}

/** Streams one byte range of one file, yielding every record whose
  * `<DOC>` tag starts within [start, start+length); the final record
  * may extend beyond the range end (the next split skips it because
  * its tag started before that split's start). */
private[sources] class TrecPartitionReader(part: TrecInputPartition,
                                           required: StructType)
    extends PartitionReader[InternalRow] {
  import TrecDataSource.{DocClose, DocOpen}

  private val wantDocid = required.fieldNames.contains("docid")
  private val wantContent = required.fieldNames.contains("content")
  private val wantMetadata = required.fieldNames.contains("metadata")

  private val in: java.io.InputStream = {
    val fs = new Path(part.path).getFileSystem(new Configuration())
    val raw = fs.open(new Path(part.path))
    if (part.gzip)
      new java.util.zip.GZIPInputStream(
        new java.io.BufferedInputStream(raw, 1 << 16))
    else {
      if (part.start > 0) raw.seek(part.start)
      new java.io.BufferedInputStream(raw, 1 << 16)
    }
  }
  /** Bytes consumed relative to part.start (gzip: uncompressed pos,
    * whole file owned anyway). */
  private var pos: Long = 0L
  /** Absolute position where record tags stop belonging to this split
    * (gzip/whole-file: unbounded). */
  private val ownEnd: Long =
    if (part.gzip) Long.MaxValue else part.length
  private var row: InternalRow = _
  private var done = false

  private def readByte(): Int = {
    val b = in.read()
    if (b >= 0) pos += 1
    b
  }

  /** Advance the stream until `pat` has just been consumed. Returns
    * the position of the FIRST byte of the match (relative to range
    * start), or -1 at EOF. `bound`: stop (return -1) once a match can
    * no longer START before it. */
  private def scanFor(pat: Array[Byte], bound: Long): Long = {
    var matched = 0
    while (true) {
      if (matched == 0 && bound != Long.MaxValue && pos >= bound) return -1L
      val b = readByte()
      if (b < 0) return -1L
      if (b == pat(matched)) {
        matched += 1
        if (matched == pat.length) {
          val startAt = pos - pat.length
          // the mismatch-restart below can carry matched==1 across the
          // ownership boundary (e.g. "<<DOC>" split between the two
          // '<'), so the matched==0 gate alone is not enough: a match
          // STARTING at/after the bound belongs to the next split —
          // and so does every later one (records are in stream order)
          if (bound != Long.MaxValue && startAt >= bound) return -1L
          return startAt
        }
      } else {
        // restart match; a byte equal to pat(0) may begin a new match
        matched = if (b == pat(0)) 1 else 0
      }
    }
    -1L
  }

  /** Read bytes into `buf` until `pat` has been consumed (inclusive).
    * False at EOF (torn trailing record — dropped, matching the
    * reference's readUntilMatch-with-buffer EOF behavior). */
  private def readUntil(pat: Array[Byte],
                        buf: java.io.ByteArrayOutputStream): Boolean = {
    var matched = 0
    while (true) {
      val b = readByte()
      if (b < 0) return false
      buf.write(b)
      if (b == pat(matched)) {
        matched += 1
        if (matched == pat.length) return true
      } else {
        matched = if (b == pat(0)) 1 else 0
      }
    }
    false
  }

  override def next(): Boolean = {
    if (done) return false
    val openAt = scanFor(DocOpen, ownEnd)
    if (openAt < 0) { done = true; return false }
    val buf = new java.io.ByteArrayOutputStream(4096)
    buf.write(DocOpen)
    if (!readUntil(DocClose, buf)) { done = true; return false }
    val content = new String(buf.toByteArray, "UTF-8")
    val docid = if (wantDocid || wantMetadata) {
      val s = content.indexOf("<DOCNO>")
      val e = content.indexOf("</DOCNO>")
      if (s >= 0 && e > s) content.substring(s + 7, e).trim else null
    } else null
    val values = required.fieldNames.map {
      case "docid" => if (docid == null) null else UTF8String.fromString(docid)
      case "content" =>
        if (wantContent) UTF8String.fromString(content) else null
      case "metadata" => if (wantMetadata) metadataMap(content, docid) else null
    }
    row = InternalRow.fromSeq(values.toIndexedSeq)
    true
  }

  /** The reference's per-doc metadata (`TrecWebParser.java:91-93`):
    * `identifier` always; `url` (scrubbed first token of the line after
    * `<DOCHDR>`) when the block carries a web header. Built only when
    * the column survives pruning — a `select(docid)` pays nothing. */
  private def metadataMap(content: String, docid: String) = {
    import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
    val keys = scala.collection.mutable.ArrayBuffer.empty[Any]
    val vals = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (docid != null) {
      keys += UTF8String.fromString("identifier")
      vals += UTF8String.fromString(docid)
    }
    val h = content.indexOf("<DOCHDR>")
    if (h >= 0) {
      val nl = content.indexOf('\n', h)
      if (nl >= 0) {
        val end = content.indexOf('\n', nl + 1)
        val line = if (end >= 0) content.substring(nl + 1, end)
                   else content.substring(nl + 1)
        val sp = line.indexOf(' ')
        val raw = if (sp >= 0) line.substring(0, sp) else line
        keys += UTF8String.fromString("url")
        vals += UTF8String.fromString(TrecDataSource.scrubUrl(raw))
      }
    }
    new ArrayBasedMapData(new GenericArrayData(keys.toArray),
      new GenericArrayData(vals.toArray))
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
