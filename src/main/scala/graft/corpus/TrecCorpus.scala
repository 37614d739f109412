package graft.corpus

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Stage.StageOps

/** TREC corpus ingestion (SURVEY.md §2.1).
  *
  * The reference splits files on `<DOC>`/`</DOC>` byte patterns with a
  * split-boundary-safe custom InputFormat
  * (`CODE/edu/umd/cloud9/collection/XMLInputFormat.java:41-198`) and
  * extracts the docid as the trimmed text between `<DOCNO>` tags
  * (`CODE/edu/umd/cloud9/collection/trec/TrecDocument.java:76-89`).
  *
  * Spark-native equivalent: `spark.read.option("lineSep", "</DOC>")`
  * gives the same record split (Hadoop LineRecordReader realigns
  * records across file-split boundaries, matching the reference's
  * boundary logic), then `regexp_extract` projects the docid. At 100 TB
  * this scan parallelizes per file split exactly like the reference's;
  * gzip inputs degrade to whole-file splits in both designs.
  */
object TrecCorpus {

  /** Read a TREC corpus: one row per `<DOC>` block:
    * (docid STRING, content STRING). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("lineSep", "</DOC>").text(path)
      .filter(col("value").contains("<DOCNO>"))
      .select(
        trim(regexp_extract(col("value"), "<DOCNO>(.*?)</DOCNO>", 1))
          .as("docid"),
        col("value").as("content"))

  /** The reference's URL scrub (`TrecWebParser.java:37-53`,
    * `scrubUrl`) as column expressions, step for step: drop ONE
    * trailing `#`, lowercase, `:80/` → `/` (all occurrences), drop a
    * trailing `:80` (Java replace-all when it ends with it), strip all
    * trailing slashes. */
  def scrubUrl(url: Column): Column = {
    val lowered = lower(regexp_replace(url, "#$", ""))
    val noPort0 = regexp_replace(lowered, ":80/", "/")
    val noPort = when(noPort0.endsWith(":80"),
      regexp_replace(noPort0, ":80", "")).otherwise(noPort0)
    regexp_replace(noPort, "/+$", "")
  }

  /** TREC-web per-block projection (`TrecWebParser.java:65-96`):
    * docid from `<DOCNO>`, url = first token of the line after the
    * `<DOCHDR>` line (scrubbed), content = everything after the
    * `</DOCHDR>` line, and the reference's metadata map
    * (`url` → scrubbed url, `identifier` → docid) as a
    * `MAP<STRING,STRING>` column. */
  def webFields(raw: Column): Column = {
    val docid = trim(regexp_extract(raw, "<DOCNO>(.*?)</DOCNO>", 1))
    val urlLine = regexp_extract(raw, "(?s)<DOCHDR>[^\n]*\n([^\n]*)", 1)
    val url = scrubUrl(regexp_extract(urlLine, "^([^ ]*)", 1))
    val content = regexp_extract(raw, "(?s)</DOCHDR>[^\n]*\n(.*)", 1)
    struct(docid.as("docid"), url.as("url"), content.as("content"),
      map(lit("url"), url, lit("identifier"), docid).as("metadata"))
  }

  /** Read a TREC-WEB corpus: one row per `<DOC>` block with the parsed
    * web fields + metadata map (SURVEY §1.3 maps the reference's
    * `Document.metadata` to a `MapType` column). */
  def readWeb(spark: SparkSession, path: String): DataFrame =
    spark.read.option("lineSep", "</DOC>").text(path)
      .filter(col("value").contains("<DOCNO>"))
      .select(webFields(col("value")).as("w"))
      .select(col("w.docid").as("docid"), col("w.url").as("url"),
        col("w.content").as("content"), col("w.metadata").as("metadata"))

  /** The 10 whitelisted TREC-text section start tags, in the
    * reference's order (`TrecTextParser.java:58-63`). */
  val TrecTextStartTags: Seq[String] = Seq(
    "<TEXT>", "<HEADLINE>", "<TITLE>", "<HL>", "<HEAD>",
    "<TTL>", "<DD>", "<DATE>", "<LP>", "<LEADPARA>")

  /** Faithful LINE-oriented TREC-text section parser
    * (`TrecTextParser.java:49-94`) over one raw `<DOC>` block,
    * reproducing the reference's exact quirks:
    *  - kept content is whole LINES of the 10 whitelisted sections,
    *    INCLUDING the start/end tag lines, each re-terminated with \n;
    *  - an end tag only closes its section when it STARTS a line — a
    *    same-line `<DATE>…</DATE>` leaves the section open;
    *  - tag lines inside an open section that don't close it are kept
    *    (nested tags survive);
    *  - the docno may span lines (accumulated until `</DOCNO>`).
    * Returns (docid, kept) or None for a block with no parsable docno. */
  def parseTrecText(block: String): Option[(String, String)] = {
    val it = block.split("\n", -1).iterator
    if (!it.exists(_.startsWith("<DOC>"))) return None
    var all = it.find(_.startsWith("<DOCNO>")).getOrElse(return None)
    while (!all.contains("</DOCNO>") && it.hasNext) all += it.next()
    val s = all.indexOf("<DOCNO>") + 7
    val e = all.indexOf("</DOCNO>")
    if (e < s) return None
    val docid = all.substring(s, e).trim
    val endTags = TrecTextStartTags.map(t => "</" + t.substring(1))
    val buf = new StringBuilder
    var inTag = -1
    var done = false
    while (!done && it.hasNext) {
      val line = it.next()
      if (line.startsWith("</DOC>")) done = true
      else {
        if (line.startsWith("<")) {
          if (inTag >= 0 && line.startsWith(endTags(inTag))) {
            inTag = -1
            buf.append(line).append('\n')
          } else if (inTag < 0) {
            inTag = TrecTextStartTags.indexWhere(line.startsWith)
          }
        }
        if (inTag >= 0) buf.append(line).append('\n')
      }
    }
    Some((docid, buf.toString))
  }

  /** [[parseTrecText]] as a UDF column: struct(docid, kept). */
  val parseTrecTextUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((block: String) => parseTrecText(block))

  /** Read a TREC-TEXT corpus through the faithful section parser:
    * (docid, kept) — kept is the whitelisted-section content the
    * reference indexes. */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.option("lineSep", "</DOC>").text(path)
      .filter(col("value").contains("<DOCNO>"))
      // the lineSep split strips the closing tag; the parser's </DOC>
      // stop condition needs it back
      .select(parseTrecTextUdf(concat(col("value"), lit("\n</DOC>")))
        .as("p"))
      .filter(col("p").isNotNull)
      .select(col("p._1").as("docid"), col("p._2").as("kept"))

  /** Dense docno assignment 1..N in sorted-docid order (the reference's
    * single-reducer `NumberTrecDocuments` — SURVEY §2.4 "sequential
    * numbering"). `row_number` over one window partition is the same
    * deliberate serial point; fine for the dictionary-sized doc_map.
    */
  def docnoMapping(corpus: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    corpus.select(col("docid"))
      .withColumn("docno",
        row_number().over(Window.orderBy("docid")).cast("long"))
  }

  /** The reference's PackTextFile utility (SURVEY §2.1): text lines →
    * `(line_no, line)` columnar table (parquet replaces SequenceFile).
    * line_no is a TRUE sequential ordinal via zipWithIndex (two jobs:
    * per-partition counts, then assignment) — monotonically_
    * increasing_id leaves 2^33-sized gaps between input splits and is
    * layout-dependent, which breaks any consumer joining on expected
    * ordinals (r4 review). */
  def packTextFile(spark: SparkSession, inPath: String,
                   outPath: String): Unit = {
    import spark.implicits._
    spark.read.text(inPath)
      .select(col("value")).as[String]
      .rdd.zipWithIndex()
      .toDF("line", "line_no")
      .select(col("line_no"), col("line"))
      .write.mode("overwrite").parquet(outPath)
  }

  /** The reference's docno-mapping text sink — `docid\tdocno` lines
    * (`NumberTrecDocuments.java:154`); the binary re-encode post-pass is
    * obsolete (parquet/`broadcast` replace R5, SURVEY §1.3). */
  def writeDocMapText(docMap: DataFrame, path: String): Unit =
    docMap.select(col("docid"), col("docno"))
      .orderBy("docno")
      .coalesce(1)
      .write.mode("overwrite").option("sep", "\t").csv(path)

  /** Scalable docno assignment for corpora where the doc_map itself is
    * big: range-partition by docid (sampled RangePartitioner — no single
    * serial task), count per partition, and offset each partition by the
    * running total. Only the per-partition counts (one long per
    * partition) touch the driver. Same output as [[docnoMapping]]. */
  def docnoMappingScalable(spark: SparkSession, corpus: DataFrame,
                           partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val p = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    // persisted so the count pass and the assign pass see identical
    // (sampled) range-partition boundaries
    val sorted = corpus.select(col("docid").as[String])
      .repartitionByRange(p, col("docid"))
      .sortWithinPartitions("docid")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // LONG per-partition counts: Iterator.size returns Int and would
    // wrap negative past 2^31 rows in one range partition, corrupting
    // every downstream offset (duplicate/negative docnos) at exactly
    // the corpus sizes this two-phase form exists for
    val counts = sorted.mapPartitions { it =>
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      Iterator.single(n)
    }.collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    // partition id must be the RDD partition index, NOT
    // TaskContext.getPartitionId(): under a downstream coalesce() the
    // task id is the COALESCED partition's, which would restart every
    // merged range-partition at the same offset (duplicate docnos)
    // eager localCheckpoint: the numbering materializes here, the
    // range-partitioned staging cache releases immediately (it used to
    // stay pinned for the JVM lifetime, one copy per index build — r4
    // review), and the returned frame is lineage-free (ContextCleaner
    // collects it once unreferenced)
    val out = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = bc.value(pid)
      it.map { d => n += 1; (d, n) }
    }.toDF("docid", "docno").stageEager()
    sorted.unpersist()
    out
  }
}
