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
                  withPositional: Boolean = true,
                  bm25: Option[graft.query.Bm25Server] = None,
                  ann: Option[(org.apache.spark.sql.SparkSession,
                    String, String)] = None,
                  hybrid: Option[(graft.query.HybridServer,
                    Seq[Float])] = None): String = {
    val out = new ByteArrayOutputStream()
    Repl.loop(ix, if (withWildcards) Some(chargrams) else None,
      new BufferedReader(new StringReader(input)), new PrintStream(out, true),
      positional = if (withPositional) Some(positional) else None,
      bm25 = bm25, ann = ann, hybrid = hybrid)
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
    val opened = Repl.open(spark, dir)
    val (lx, lcg, lpos) = (opened.ix, opened.chargrams, opened.positional)
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

  private val sfDir = "/root/testdata/sf0.001"

  test("bm25 queries route through the prepared multi-term server " +
    "and print the exact unpruned ranking") {
    val srv = new graft.query.Bm25Server(spark,
      graft.queries.IrSql.bm25StatsStore(spark, sfDir))
    val terms = graft.queries.IrSql.ExpandedQueryTerms
    val want = graft.queries.IrSql.q10Bm25Multi(spark, sfDir, terms)
      .collect().map(r => f"${r.getLong(0)}%d ${r.getDouble(1)}%.4f")
    val got = run(s"bm25 ${terms.mkString(" ")}\n\n", bm25 = Some(srv))
    want.foreach(line =>
      assert(got.contains(line), s"missing [$line] in:\n$got"))
    // a bm25 query longer than 2 words must NOT trip the arity exit:
    // the loop keeps serving afterwards
    val got2 = run(s"bm25 merge stream data\nmerge\n\n", bm25 = Some(srv))
    assert(got2.contains("FT911-0017"), "loop died after a bm25 query")
    // all-unknown terms report no results instead of erroring
    assert(run("bm25 zzzqqq xxyy\n\n", bm25 = Some(srv))
      .contains("No results"))
  }

  test("ann queries route through the adaptive filtered probe over " +
    "the durable store") {
    val store = graft.ops.Similarity.cachedIvfStore(spark, sfDir)
    val annCtx = Some((spark, store, sfDir))
    val want = graft.ops.Similarity
      .probeIvfStoreFilteredAuto(spark, store, sfDir, qId = 0L)
      .collect().map(r => f"${r.getLong(0)}%d ${r.getDouble(1)}%.4f")
    assert(want.nonEmpty)
    val got = run("ann 0\n\n", ann = annCtx)
    want.foreach(line =>
      assert(got.contains(line), s"missing [$line] in:\n$got"))
    // unknown vec_id reports cleanly and the loop survives
    val got2 = run("ann 99999999\nmerge\n\n", ann = annCtx)
    assert(got2.contains("no such vec_id"))
    assert(got2.contains("FT911-0017"), "loop died after the ann error")
  }

  test("bm25 and ann degrade gracefully without their serving state") {
    assert(run("bm25 merge stream data\n\n")
      .contains("needs the index-time stats store"))
    assert(run("ann 0\n\n").contains("needs the vector store"))
  }

  test("hybrid queries fuse the two prepared arms and print the RRF " +
    "rows; degrade gracefully without the servers") {
    import org.apache.spark.sql.functions.col
    val srv = graft.query.HybridServer.forCorpus(spark, sfDir)
    val qv = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val terms = graft.queries.IrSql.DefaultQueryTerms
    val want = srv.search(terms, qv).map { case (d, lr, sr, rrf) =>
      s"$d rrf=$rrf lex=${lr.getOrElse("-")} sem=${sr.getOrElse("-")}"
    }
    assert(want.nonEmpty)
    val got = run(s"hybrid ${terms.mkString(" ")}\nmerge\n\n",
      hybrid = Some((srv, qv)))
    want.foreach(line =>
      assert(got.contains(line), s"missing [$line] in:\n$got"))
    assert(got.contains("FT911-0017"), "loop died after a hybrid query")
    assert(run("hybrid merge stream\n\n")
      .contains("needs both the stats store and the vector store"))
  }

  test("hybridf serves the FILTERED fusion (== searchFiltered under " +
    "the corpus keep set); degrades gracefully without the stores") {
    import org.apache.spark.sql.functions.col
    val srv = graft.query.HybridServer.forCorpus(spark, sfDir)
    val qv = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val keep = new java.util.HashSet[java.lang.Long]()
    graft.ops.Similarity.filterIds(spark, sfDir).collect()
      .foreach(r => keep.add(r.getLong(0)))
    val terms = graft.queries.IrSql.DefaultQueryTerms
    val want = srv.searchFiltered(terms, qv, keep)
      .map { case (d, lr, sr, rrf) =>
        s"$d rrf=$rrf lex=${lr.getOrElse("-")} sem=${sr.getOrElse("-")}"
      }
    assert(want.nonEmpty)
    val got = run(s"hybridf ${terms.mkString(" ")}\nmerge\n\n",
      hybrid = Some((srv, qv)),
      ann = Some((spark, graft.ops.Similarity.cachedIvfStore(spark, sfDir),
        sfDir)))
    want.foreach(line =>
      assert(got.contains(line), s"missing [$line] in:\n$got"))
    assert(got.contains("FT911-0017"), "loop died after a hybridf query")
    assert(run("hybridf merge stream\n\n")
      .contains("hybridf needs"))
  }

  test("takedown removes docs from the live serving state: the next " +
    "bm25 and ann queries exclude them, no reopen") {
    // a DEDICATED corpus copy: the takedown mutates its stores, and
    // the shared session-cached stores must stay untouched
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val td = Files.createTempDirectory("graft_repl_td").toString
    Seq("documents.parquet", "embeddings.parquet").foreach { f =>
      Files.copy(Paths.get(s"$sfDir/$f"), Paths.get(s"$td/$f"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val bmSrv = new graft.query.Bm25Server(spark,
      graft.queries.IrSql.bm25StatsStore(spark, td))
    val ivf = Files.createTempDirectory("graft_repl_td_ivf").toString
    graft.ops.Similarity.writeIvfLayout(spark, td, ivf)
    val annCtx = Some((spark, ivf, td))
    val terms = graft.queries.IrSql.ExpandedQueryTerms
    val preTop = bmSrv.search(terms).head._1
    val preAnnTop = graft.ops.Similarity
      .probeIvfStoreFilteredAuto(spark, ivf, td, qId = 0L)
      .collect().map(_.getLong(0)).head
    val victims = Seq(preTop, preAnnTop).distinct
    val got = run(
      s"takedown ${victims.mkString(" ")}\n" +
        s"bm25 ${terms.mkString(" ")}\nann 0\n\n",
      bm25 = Some(bmSrv), ann = annCtx)
    assert(got.contains("takedown:"), s"no takedown ack in:\n$got")
    // the post-takedown outputs must not rank the victims
    val post = got.substring(got.indexOf("takedown:"))
    victims.foreach { v =>
      assert(!post.linesIterator.exists(_.startsWith(s"$v ")),
        s"victim $v still served after takedown in:\n$post")
    }
    // and both surfaces still return results (serving continues)
    assert(post.linesIterator.count(_.matches("\\d+ -?\\d.*")) >= 2,
      s"serving died after the takedown in:\n$post")
  }

  test("recrawl replaces a doc's text in the live bm25 serving state: " +
    "the next search ranks the new content, no reopen") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val td = Files.createTempDirectory("graft_repl_rc").toString
    Seq("documents.parquet", "embeddings.parquet").foreach { f =>
      Files.copy(Paths.get(s"$sfDir/$f"), Paths.get(s"$td/$f"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val bmSrv = new graft.query.Bm25Server(spark,
      graft.queries.IrSql.bm25StatsStore(spark, td))
    val ivf = Files.createTempDirectory("graft_repl_rc_ivf").toString
    graft.ops.Similarity.writeIvfLayout(spark, td, ivf)
    val got = run(
      "recrawl 42 zzqfresh zzqfresh content\n" +
        "bm25 zzqfresh\n\n",
      bm25 = Some(bmSrv), ann = Some((spark, ivf, td)))
    assert(got.contains("recrawl: doc 42 replaced"),
      s"no recrawl ack in:\n$got")
    val post = got.substring(got.indexOf("recrawl:"))
    assert(post.linesIterator.exists(
        _.replaceFirst("^query > ", "").startsWith("42 ")),
      s"re-crawled doc not served for its new term in:\n$post")
  }
}
