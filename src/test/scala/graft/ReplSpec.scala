package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}

import graft.corpus.TrecCorpus
import graft.index.{CharKGramIndex, InvertedIndex}

/** Drives [[Repl.loop]] through piped input, asserting the reference
  * client's interaction shape (greeting → prompt → ranked lines →
  * terminate on empty / over-long queries) plus the wildcard route. */
class ReplSpec extends SparkSpec {

  lazy val corpus = TrecCorpus.read(spark, resourcePath("/graft/sample-trec.xml"))
  lazy val ix = InvertedIndex.build(spark, corpus, k = 1)
  lazy val chargrams = CharKGramIndex.build(spark, corpus, k = 3)
  lazy val positional = graft.index.PositionalIndex.build(spark, corpus)

  private def run(input: String, withWildcards: Boolean = true,
                  withPositional: Boolean = true): String = {
    val out = new ByteArrayOutputStream()
    Repl.loop(ix, if (withWildcards) Some(chargrams) else None,
      new BufferedReader(new StringReader(input)), new PrintStream(out, true),
      positional = if (withPositional) Some(positional) else None)
    out.toString("UTF-8")
  }

  test("ranked search prints docid score lines, empty line quits") {
    val got = run("merge\n\n")
    assert(got.contains("query > "))
    // the first result rides the prompt line ("query > FT911-...")
    assert(got.contains("FT911-0017 1."), s"top doc missing in:\n$got")
    // 4 docs contain 'merg'
    assert(got.linesIterator.count(_.matches(".*FT911-\\d+ \\d.*")) == 4)
  }

  test("wildcard queries route through the char-gram expansion") {
    val got = run("re*ve\n\n")
    assert(got.contains("FT911-0013 "),
      s"wildcard fodder doc missing in:\n$got")
  }

  test("a 3-word query terminates the loop like the reference") {
    val got = run("one two three\nmerge\n\n")
    assert(got.contains("1-2 words"))
    // the 'merge' line after it must never have been served
    assert(!got.contains("FT911-0017"))
  }

  test("stopword-only and no-hit queries report no results") {
    val got = run("the\n\n")
    assert(got.contains("No results"))
  }

  test("wildcards degrade gracefully without a char-gram index") {
    val got = run("re*ve\n\n", withWildcards = false)
    assert(got.contains("needs a char-gram index"))
  }

  test("quoted phrases route through the positional index") {
    val got = run("\"merge engine\"\n\n")
    assert(got.contains("FT911-0001 1."), s"phrase hit missing in:\n$got")
    // adjacency matters: both words occur in doc 1, never consecutively
    assert(run("\"sorted buffers\"\n\n").contains("No results"))
    // an all-stopword phrase reports no results instead of erroring
    assert(run("\"the of\"\n\n").contains("No results"))
  }

  test("NEAR queries route through the proximity templates") {
    // doc 1 holds merg and engin within 3 tokens; template and fresh
    // paths must agree with PositionalIndex.near
    val want = graft.index.PositionalIndex.near(positional, "merge", "engine", 3)
      .collect().map(_.getString(0)).toSeq
    assert(want.nonEmpty)
    val got = run("merge NEAR/3 engine\n\n")
    want.foreach(d => assert(got.contains(d), s"missing $d in:\n$got"))
    // window 0 can never hit (distinct positions), and the default
    // window is 3 (`a NEAR b` == `a NEAR/3 b`)
    assert(run("merge NEAR/0 engine\n\n").contains("No results"))
    val gotDefault = run("merge near engine\n\n")
    want.foreach(d => assert(gotDefault.contains(d)))
    // a stopword side reports the arity error without killing the loop
    val afterErr = run("the NEAR merge\nmerge\n\n")
    assert(afterErr.contains("single non-stopword"))
    assert(afterErr.contains("FT911-0017"), "loop died after NEAR error")
  }

  test("NEAR degrades gracefully without a positional index") {
    val got = run("merge NEAR/3 engine\n\n", withPositional = false)
    assert(got.contains("needs a positional index"))
  }

  test("phrases degrade gracefully without a positional index") {
    val got = run("\"merge engine\"\n\n", withPositional = false)
    assert(got.contains("needs a positional index"))
  }

  test("persist + open serves ranked AND wildcard queries from the written index") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ixstore").toString
    Repl.persist(ix, Some(chargrams), dir, Some(positional))
    val Repl.Session(lx, lcg, lpos) = Repl.open(spark, dir)
    assert(lcg.isDefined, "durable char-gram table not loaded")
    assert(lpos.isDefined, "durable positional index not loaded")
    // phrase parity on the loaded positional artifacts
    val builtPhrase = graft.index.PositionalIndex
      .phrase(positional, "merge engine").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val loadedPhrase = graft.index.PositionalIndex
      .phrase(lpos.get, "merge engine").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(loadedPhrase == builtPhrase && builtPhrase.nonEmpty)
    // ranked search parity: loaded parquet artifacts == built index,
    // on BOTH serving paths (pushdown serveSearch and the cached
    // template the REPL defaults to)
    val built = query.QueryEngine.serveSearch(ix, "merge")
      .collect().map(r => (r.getString(1), r.getDouble(2))).toSeq
    val loaded = query.QueryEngine.serveSearch(lx, "merge")
      .collect().map(r => (r.getString(1), r.getDouble(2))).toSeq
    assert(loaded == built, s"loaded=$loaded built=$built")
    val template = new query.PointServer(lx).search("merge")
      .map(t => (t._2, t._3))
    assert(template == built, s"template=$template built=$built")
    // wildcard on the LOADED index (r4 gap: the load path had no
    // char-gram table, so '*' patterns only worked corpus-built)
    val out = new ByteArrayOutputStream()
    // loaded indexes serve through literal predicates (pushdown), as
    // Repl.main selects for a written-index dir
    Repl.loop(lx, lcg,
      new BufferedReader(new StringReader("merge\nre*ve\n\n")),
      new PrintStream(out, true), usePointServer = false)
    assert(out.toString("UTF-8").contains("FT911-0013 "),
      s"wildcard miss on loaded index:\n$out")
  }
}
