package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the text pipeline (SURVEY §5 point 3),
  * via seeded ScalaCheck generators (deterministic sampling — the
  * scalatest bridge artifact isn't in the offline cache). */
class TextPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val SplitChars = " \t\n\r;\"&/:!#?$%()@^*+-,=><[]{}|`~_"
  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(SplitChars.toSeq),
    1 -> Gen.oneOf('.', '\'', '<', '>', 'A', 'Z'),
    1 -> Gen.oneOf("äöµ√".toSeq))).map(_.mkString)

  test("tokens never contain split chars, uppercase, apostrophes, periods") {
    samples(textGen).foreach { text =>
      TagTokenizer.tokenize(text).foreach { t =>
        assert(t.nonEmpty, s"empty token from [$text]")
        assert(!t.exists(c => SplitChars.contains(c) || c == '.' || c == '\''),
          s"dirty token [$t] from [$text]")
        assert(!t.exists(c => c >= 'A' && c <= 'Z'), s"upper [$t]")
      }
    }
  }

  test("byte cap: no token both >16 chars and >=100 utf8 bytes") {
    val long = Gen.oneOf(textGen,
      Gen.choose(90, 120).map(n => "x" * n + " ok"))
    samples(long).foreach { text =>
      TagTokenizer.tokenize(text).foreach { t =>
        assert(!(t.length > 16 && t.getBytes("UTF-8").length >= 100), t)
      }
    }
  }

  test("re-tokenizing clean token output is stable") {
    samples(textGen).foreach { text =>
      val toks = TagTokenizer.tokenize(text)
        .filter(_.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')))
      assert(TagTokenizer.tokenize(toks.mkString(" ")) == toks)
    }
  }

  test("pipeline = tokenize ∘ stopword-filter ∘ stem") {
    samples(textGen).foreach { text =>
      assert(TextPipeline.processContent(text) ==
        TagTokenizer.tokenize(text)
          .filterNot(TextPipeline.stopwords)
          .map(PorterStemmer.stem))
    }
  }

  test("stemmer: lowercase alpha words stem to nonempty lowercase") {
    val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    samples(wordGen, 1000).foreach { w =>
      val s = PorterStemmer.stem(w)
      assert(s.nonEmpty && s.forall(c => c >= 'a' && c <= 'z'),
        s"[$w] -> [$s]")
    }
  }

  test("polyhash: value in [0, p), matches BigInt Horner evaluation") {
    import graft.functions.PolyHashExpr
    val p = 1000000007L
    samples(Gen.asciiPrintableStr, 500).foreach { s =>
      val h = PolyHashExpr.hash(s, p)
      assert(h >= 0 && h < p)
      val ref = s.foldLeft(BigInt(0))((acc, c) =>
        (acc * 31 + c.toInt) mod BigInt(p))
      assert(BigInt(h) == ref, s"[$s]")
    }
  }
}
