package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** TREC DataSourceV2: record decode, split-boundary ownership, gzip
  * whole-file reads, and required-column pruning. */
class TrecSourceSpec extends SparkSpec {

  private def doc(id: String, body: String): String =
    s"<DOC>\n<DOCNO> $id </DOCNO>\n<TEXT>\n$body\n</TEXT>\n</DOC>\n"

  private def stage(content: String, name: String = "corpus.xml"): String = {
    val dir = Files.createTempDirectory("trec_spec")
    Files.write(dir.resolve(name), content.getBytes("UTF-8"))
    dir.toString
  }

  test("decodes every record with trimmed docids and full raw content") {
    val path = stage(doc("AP-1", "alpha beta") + doc("AP-2", "gamma") +
      doc("AP-3", "delta epsilon zeta"))
    val got = spark.read.format("trec").load(path)
      .orderBy("docid").collect()
    assert(got.map(_.getString(0)).toSeq === Seq("AP-1", "AP-2", "AP-3"))
    // content keeps the delimiting tags (the reference indexes raw docs)
    assert(got.head.getString(1).startsWith("<DOC>") &&
      got.head.getString(1).endsWith("</DOC>"))
    assert(got.head.getString(1).contains("alpha beta"))
  }

  test("tiny splits produce multiple partitions but exactly one row per record") {
    // ~80 docs with bodies long enough that most straddle a 256-byte
    // split boundary; every record must appear exactly once
    val docs = (1 to 80).map(i => doc(f"FB-$i%03d", ("word" + i + " ") * 40))
    val path = stage(docs.mkString)
    val df = spark.read.format("trec").option("splitSize", "256").load(path)
    assert(df.rdd.getNumPartitions > 10, "expected many splits")
    val ids = df.select("docid").as[String](
      org.apache.spark.sql.Encoders.STRING).collect().sorted
    assert(ids.toSeq === (1 to 80).map(i => f"FB-$i%03d").sorted)
  }

  test("record set is invariant under EVERY split size (boundary sweep)") {
    // adversarial corpus: '<'-runs before tags, bodies containing the
    // literal strings "<DOC" and "</DOC" fragments inside text, plus
    // varied record lengths — then sweep splitSize so every byte
    // offset of the first few records serves as a boundary at least
    // once. Any ownership bug (double emit or drop) shows as a
    // changed multiset of docids.
    val docs = (1 to 12).map { i =>
      val noise = "<" * (i % 4) + " not a <DOC tag " + "x" * (i * 7)
      doc(f"SW-$i%02d", noise)
    }
    val content = docs.mkString
    val path = stage(content)
    val expect = (1 to 12).map(i => f"SW-$i%02d").sorted
    // every size from 1 byte past trivial up to just beyond one record,
    // plus a few larger strides — boundaries land on every offset mod
    // size, covering all alignments of "<DOC>" and "</DOC>"
    val sizes = (17 to 97 by 8) ++ Seq(128, 200, 333, content.length - 1)
    sizes.foreach { s =>
      val ids = spark.read.format("trec")
        .option("splitSize", s.toString).load(path)
        .select("docid").as[String](
          org.apache.spark.sql.Encoders.STRING).collect().sorted.toSeq
      assert(ids == expect, s"splitSize=$s: got $ids")
    }
  }

  test("a partial tag prefix straddling the split end does not leak ownership") {
    // Regression (ADVICE r3): bytes "<<DOC>" with the split boundary
    // between the two '<' — the first split's scanner restarts its
    // match on the second '<' with matched==1, bypassing the
    // matched==0 bound gate, and used to claim a record whose <DOC>
    // starts at the next split's first byte (which also claims it →
    // duplicate row). Construct a corpus where a '<' immediately
    // precedes a split boundary that a <DOC> tag starts on.
    val split = 64
    val d1 = doc("DU-1", "x")
    // pad doc 1's tail so the NEXT doc's "<DOC>" starts exactly at a
    // split boundary, with the padding ending in '<'-like bait: we
    // append spaces then a stray '<' as the last byte of the split
    val pad = " " * (split - (d1.length % split) - 1) + "<"
    val content = d1 + pad + doc("DU-2", "y") + doc("DU-3", "z")
    assert((d1 + pad).length % split === 0)
    val path = stage(content)
    val df = spark.read.format("trec")
      .option("splitSize", split.toString).load(path)
    val ids = df.select("docid").as[String](
      org.apache.spark.sql.Encoders.STRING).collect().sorted.toSeq
    assert(ids === Seq("DU-1", "DU-2", "DU-3"), s"got $ids")
  }

  test("gzip files are read whole") {
    val body = doc("GZ-1", "squeeze me") + doc("GZ-2", "twice")
    val dir = Files.createTempDirectory("trec_gz")
    val out = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("c.xml.gz")))
    out.write(body.getBytes("UTF-8")); out.close()
    val got = spark.read.format("trec")
      .option("splitSize", "16") // must be ignored for .gz
      .load(dir.toString).orderBy("docid")
      .select("docid").collect().map(_.getString(0))
    assert(got.toSeq === Seq("GZ-1", "GZ-2"))
  }

  test("metadata column carries identifier + scrubbed url, and prunes away") {
    val content = "<DOC>\n<DOCNO> W-9 </DOCNO>\n<DOCHDR>\n" +
      "HTTP://Ex.COM:80/Y/# junk after space\nHeader: x\n</DOCHDR>\n" +
      "body\n</DOC>\n"
    val path = stage(content)
    val m = spark.read.format("trec").load(path)
      .select("metadata").collect().head.getAs[Map[String, String]](0)
    assert(m == Map("identifier" -> "W-9", "url" -> "http://ex.com/y"))
    // a docid-only projection prunes both content and metadata
    val pruned = spark.read.format("trec").load(path).select("docid")
    assert(pruned.queryExecution.executedPlan.schema.fieldNames.toSeq ==
      Seq("docid"))
  }

  test("JVM and relational URL scrubs agree on the reference's edge cases") {
    val urls = Seq(
      "HTTP://A.COM:80/X/#", "http://a.com:80", "http://a.com/x///",
      "HTTPS://B.ORG/Path", "http://c.net:80/:80/z", "#", "")
    val jvm = urls.map(TrecDataSource.scrubUrl)
    import spark.implicits._
    val rel = graft.corpus.TrecCorpus.scrubUrl(col("u"))
    val got = urls.toDF("u").select(rel.as("s")).collect().map(_.getString(0))
    assert(got.toSeq == jvm)
  }

  test("column pruning reaches the reader") {
    val path = stage(doc("PR-1", "only ids needed"))
    val scan = spark.read.format("trec").load(path).select("docid")
    assert(scan.queryExecution.executedPlan.toString.contains("docid"))
    assert(!scan.queryExecution.executedPlan.schema.fieldNames
      .contains("content"))
    assert(scan.collect().map(_.getString(0)).toSeq === Seq("PR-1"))
  }
}
