package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Conformance against the reference's full analysis pipeline
  * (`CODE/ivory/tokenize/GalagoTokenizer.java:139-183` = TagTokenizer →
  * Terrier stopwords → Snowball stem). The vectors resource pairs input
  * text (`\n` escaped as `\\n`) with reference output tokens, generated
  * by running the reference implementation over the sf0.01 documents
  * plus crafted HTML/entity/acronym edge cases. */
class TextPipelineSpec extends AnyFunSuite {

  test("matches reference pipeline on vector corpus") {
    val in = getClass.getResourceAsStream("/graft/pipeline_vectors.tsv")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    val bad = lines.flatMap { l =>
      val parts = l.split("\t", -1)
      // input text may itself contain tabs (escaped corpus line) — the
      // expected tokens are the final field, input is the rest re-joined
      val (textEsc, exp) = (parts.init.mkString("\t"), parts.last)
      val got = TextPipeline.processContent(textEsc.replace("\\n", "\n"))
        .mkString(" ")
      if (got != exp) Some(s"[$textEsc] got=[$got] exp=[$exp]") else None
    }
    assert(bad.isEmpty, s"${bad.size} mismatches; first: ${bad.take(3)}")
    assert(lines.size >= 500)
  }

  test("tag stripping, script/style content dropped") {
    assert(TagTokenizer.tokenize("<b>Bold</b> text") == Seq("bold", "text"))
    assert(TagTokenizer.tokenize("<script>var x=1;</script>after")
      == Seq("after"))
    assert(TagTokenizer.tokenize("<style>.c{}</style>styled")
      == Seq("styled"))
    assert(TagTokenizer.tokenize("a<!-- c <t> -->b") == Seq("a", "b"))
  }

  test("acronym and period handling") {
    assert(TagTokenizer.tokenize("I.B.M.") == Seq("ibm"))
    assert(TagTokenizer.tokenize("umass.edu") == Seq("umass", "edu"))
    // single-char segments are dropped by the reference implementation
    assert(TagTokenizer.tokenize("ph.d.") == Seq("ph"))
    assert(TagTokenizer.tokenize("trailing.") == Seq("trailing"))
  }

  test("entities split; invalid entity is a plain split at &") {
    assert(TagTokenizer.tokenize("AT&T") == Seq("at", "t"))
    assert(TagTokenizer.tokenize("x &amp; y") == Seq("x", "y"))
    assert(TagTokenizer.tokenize("a&bogus b") == Seq("a", "bogus", "b"))
  }

  test("apostrophes removed, case folded") {
    assert(TagTokenizer.tokenize("don't O'Clock") == Seq("dont", "oclock"))
  }

  test("100-byte token cap") {
    val long = "a" * 101
    val ok = "b" * 99
    assert(TagTokenizer.tokenize(s"$long $ok") == Seq(ok))
  }

  test("stopwords filtered before stemming") {
    // "the"/"a" are stopwords; "running" stems to "run"
    assert(TextPipeline.processContent("the a running dogs")
      == Seq("run", "dog"))
  }
}
