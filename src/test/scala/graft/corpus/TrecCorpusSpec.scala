package graft.corpus

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TrecCorpusSpec extends SparkSpec {

  lazy val corpus = TrecCorpus.read(spark, resourcePath("/graft/sample-trec.xml"))

  test("reads one row per <DOC> block with trimmed docid") {
    val rows = corpus.orderBy("docid").collect()
    assert(rows.length == 20)
    assert(rows.head.getString(0) == "FT911-0001")
    assert(rows.last.getString(0) == "FT911-0020")
    assert(rows.forall(_.getString(1).contains("<DOCNO>")))
  }

  test("docno mapping is dense 1..N in sorted docid order") {
    val m = TrecCorpus.docnoMapping(corpus).orderBy("docno").collect()
    assert(m.map(_.getLong(1)).toSeq == (1L to 20L))
    assert(m.map(_.getString(0)).toSeq == m.map(_.getString(0)).sorted.toSeq)
  }

  test("doc map text sink writes docid\\tdocno lines") {
    val dir = java.nio.file.Files.createTempDirectory("graft_map").toString
    TrecCorpus.writeDocMapText(TrecCorpus.docnoMapping(corpus), dir)
    val lines = spark.read.option("sep", "\t").csv(dir).collect()
    assert(lines.length == 20)
    assert(lines.exists(r =>
      r.getString(0) == "FT911-0001" && r.getString(1) == "1"))
  }

  test("packTextFile converts text lines to a (line_no, line) table") {
    val out = java.nio.file.Files.createTempDirectory("graft_pack").toString
    TrecCorpus.packTextFile(spark,
      resourcePath("/graft/stopwords_terrier.txt"), out)
    val packed = spark.read.parquet(out)
    assert(packed.columns.toSeq == Seq("line_no", "line"))
    assert(packed.count() == 733)
    assert(packed.select("line_no").distinct().count() == 733)
  }

  test("TREC-text parser keeps whitelisted sections with the reference's quirks") {
    val block =
      """<DOC>
        |<DOCNO> TT-7
        | </DOCNO>
        |<HEADLINE>
        |big news
        |</HEADLINE>
        |<GARBAGE>
        |dropped
        |</GARBAGE>
        |<TEXT>
        |body line
        |<NESTED>survives</NESTED>
        |</TEXT>
        |<DATE>2026-08-12</DATE>
        |after same-line close
        |</DOC>
        |""".stripMargin
    val Some((docid, kept)) = TrecCorpus.parseTrecText(block)
    // docno spans lines and is trimmed
    assert(docid == "TT-7")
    // whole lines kept INCLUDING tag lines; GARBAGE dropped; the nested
    // tag line inside TEXT survives
    assert(kept.startsWith("<HEADLINE>\nbig news\n</HEADLINE>\n"))
    assert(!kept.contains("dropped"))
    assert(kept.contains("<TEXT>\nbody line\n<NESTED>survives</NESTED>\n</TEXT>\n"))
    // reference quirk: a same-line <DATE>…</DATE> does NOT close the
    // section (end tag must START a line), so trailing lines are kept
    assert(kept.contains("<DATE>2026-08-12</DATE>\nafter same-line close\n"))
  }

  test("readText runs the section parser over a staged TREC-text file") {
    val file =
      "<DOC>\n<DOCNO> A-1 </DOCNO>\n<TITLE>\nt one\n</TITLE>\n</DOC>\n" +
      "<DOC>\n<DOCNO> A-2 </DOCNO>\n<JUNK>\nx\n</JUNK>\n<TEXT>\nt two\n</TEXT>\n</DOC>\n"
    val dir = java.nio.file.Files.createTempDirectory("graft_tt")
    java.nio.file.Files.write(dir.resolve("t.xml"), file.getBytes("UTF-8"))
    val got = TrecCorpus.readText(spark, dir.toString)
      .orderBy("docid").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("A-1", "A-2"))
    assert(got(0).getString(1) == "<TITLE>\nt one\n</TITLE>\n")
    assert(got(1).getString(1) == "<TEXT>\nt two\n</TEXT>\n")
  }

  test("readWeb parses docid, scrubbed url, body, and the metadata map") {
    val block =
      """<DOC>
        |<DOCNO> WEB-1 </DOCNO>
        |<DOCHDR>
        |HTTP://WWW.Foo.COM:80/A/B/# ignored after space
        |Content-Type: text/html
        |</DOCHDR>
        |line one
        |line two
        |</DOC>
        |""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("graft_web")
    java.nio.file.Files.write(dir.resolve("w.xml"), block.getBytes("UTF-8"))
    val got = TrecCorpus.readWeb(spark, dir.toString).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("docid") == "WEB-1")
    // one trailing '#' dropped, lowered, :80 port gone, trailing / gone
    assert(r.getAs[String]("url") == "http://www.foo.com/a/b")
    assert(r.getAs[String]("content") == "line one\nline two\n")
    assert(r.getAs[Map[String, String]]("metadata") ==
      Map("url" -> "http://www.foo.com/a/b", "identifier" -> "WEB-1"))
  }

  test("scalable docno mapping matches the windowed one") {
    val a = TrecCorpus.docnoMapping(corpus)
    val b = TrecCorpus.docnoMappingScalable(spark, corpus, partitions = 3)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("scalable docno mapping survives a downstream coalesce") {
    // regression: numbering once keyed off TaskContext.getPartitionId,
    // which a coalesce() rewrites — every merged range partition then
    // restarted at the same offset (duplicate docnos)
    val a = TrecCorpus.docnoMapping(corpus)
    val b = TrecCorpus.docnoMappingScalable(spark, corpus, partitions = 3)
      .coalesce(1)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }
}
