package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("two-pass replace merge semantics are the spec'd fixpoint-ish " +
    "variant (both engines run the same passes)") {
    import spark.implicits._
    val seqs = Seq("|a|a|a|a|", "|a|a|a|a|a|", "|a|b|a|b|", "|a|", "|b|a|")
      .toDF("seq")
    val out = seqs.select(Bpe.applyRule(col("seq"), "a", "a").as("s"))
      .as[String].collect().toSeq
    // 4 a's: pass1 misses the delimiter-consumed middle pair, pass2
    // picks it up; 5 a's: pass1 already lands on [aa, a, aa] (the
    // non-greedy-but-deterministic placement the class doc documents)
    assert(out == Seq("|aa|aa|", "|aa|a|aa|", "|a|b|a|b|", "|a|", "|b|a|"))
    val ab = seqs.select(Bpe.applyRule(col("seq"), "a", "b").as("s"))
      .as[String].collect().toSeq
    assert(ab == Seq("|a|a|a|a|", "|a|a|a|a|a|", "|ab|ab|", "|a|", "|b|a|"))
  }

  test("initSeq delimits characters") {
    import spark.implicits._
    val got = Seq("the", "x").toDF("word")
      .select(Bpe.initSeq(col("word")).as("s")).as[String].collect().toSeq
    assert(got == Seq("|t|h|e|", "|x|"))
  }

  test("local merge loop == distributed merge loop (rules AND final " +
    "sequence table)") {
    // the default cap routes this corpus through the driver-side loop;
    // cap 0 forces the distributed per-iteration loop — both must
    // learn identical rules and produce an identical sequence table
    val (localRules, localSeqs) = Bpe.train(spark, dir)
    spark.conf.set(Bpe.LocalTrainMaxWordsKey, "0")
    val (distRules, distSeqs) =
      try Bpe.train(spark, dir)
      finally spark.conf.unset(Bpe.LocalTrainMaxWordsKey)
    assert(localRules == distRules)
    assert(localSeqs.exceptAll(distSeqs).isEmpty &&
      distSeqs.exceptAll(localSeqs).isEmpty)
  }

  test("training learns Merges ranked rules with non-increasing counts") {
    val rules = Bpe.train(spark, dir)._1
    assert(rules.map(_.rank) == (1 to Bpe.Merges))
    // classic BPE invariant: a merged pair's count can never exceed an
    // earlier pick (every occurrence of a later symbol pair existed,
    // embedded, when the earlier argmax was taken)
    assert(rules.sliding(2).forall {
      case Seq(a, b) => a.count >= b.count
      case _         => true
    })
    assert(rules.forall(r => r.lhs.nonEmpty && r.rhs.nonEmpty))
  }

  test("map-side apply equals the dictionary join against the trained " +
    "sequence table (the oracle identity)") {
    val (rules, seqs) = Bpe.train(spark, dir)
    val viaChain = Bpe.bpeApply(spark, dir)
    val viaJoin = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        explode(CrossHash.tokensArrayFast(col("text"))).as("word"))
      .join(seqs.select(col("word"), col("seq")), Seq("word"))
      .select(col("doc_id"),
        (size(split(col("seq"), "\\|")) - 2).cast("long").as("syms"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("syms")).as("bpe_tokens"))
    assert(viaChain.exceptAll(viaJoin).isEmpty &&
      viaJoin.exceptAll(viaChain).isEmpty)
    assert(rules.size == Bpe.Merges)
  }

  test("BPE packing: layout weights equal bpeApply's subword counts, " +
    "offsets are a gapless permutation, bins span correctly") {
    val layout = Bpe.bpePack(spark, dir).collect()
    val counts = Bpe.bpeApply(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(layout.nonEmpty && layout.length == counts.size)
    var total = 0L
    layout.foreach { r =>
      assert(counts(r.getLong(0)) == r.getLong(2),
        s"doc ${r.getLong(0)}: layout weight != bpeApply count")
      assert(r.getLong(3) == r.getLong(1) / 512 &&
        r.getLong(4) == (r.getLong(1) + r.getLong(2) - 1) / 512)
      total += r.getLong(2)
    }
    // offsets tile [0, total) exactly: sorted starts are the running sum
    val spans = layout.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    var cum = 0L
    spans.foreach { case (s, n) => assert(s == cum); cum += n }
    assert(cum == total)
  }

  test("BPE shortens every document's token stream, never below the " +
    "word count") {
    val df = Bpe.bpeApply(spark, dir)
      .join(graft.Tables.load(spark, dir, "documents")
          .select(col("doc_id"),
            aggregate(transform(CrossHash.tokensArrayFast(col("text")),
              w => length(w).cast("long")), lit(0L), (a, b) => a + b)
              .as("n_chars")),
        Seq("doc_id"))
    val bad = df.filter(col("bpe_tokens") < col("n_words") ||
      col("bpe_tokens") > col("n_chars"))
    assert(bad.isEmpty)
    // and the merges actually bite: corpus-wide strictly fewer symbols
    // than characters
    val agg = df.agg(sum("bpe_tokens"), sum("n_chars")).head()
    assert(agg.getLong(0) < agg.getLong(1))
  }
}
