package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import CrossHash._

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING and
  * application — the vocabulary-learning step of an LLM data pipeline,
  * next to [[TextAnalysis.vocab]]'s word-level induction.
  *
  * The published recipe (Sennrich et al., "Neural Machine Translation
  * of Rare Words with Subword Units") trains on the WORD-FREQUENCY
  * table, not the raw corpus — and that is exactly what makes it
  * scale: the corpus is touched ONCE (tokenize → word counts, one
  * shuffle with map-side partial aggregation); every merge iteration
  * after that runs over the vocabulary table, which is orders of
  * magnitude smaller than the corpus (and sublinear in corpus size —
  * Heaps' law). Per iteration: one vocab-size pair-count aggregation
  * (partial-agg'd, skew-free — pair keys are near-uniform), one 1-row
  * argmax collect, one narrow column rewrite. Nothing corpus-scale
  * ever repeats.
  *
  * Cross-engine determinism (the CrossHash discipline): a word's
  * symbol sequence is a `'|'`-delimited string (`"the"` →
  * `"|t|h|e|"`); applying a merge (l, r) is TWO left-to-right
  * non-overlapping string replaces of `"|l|r|"` with `"|lr|"` —
  * `String.replace` (Java) and `replace()` (DuckDB) share those
  * semantics exactly, so both engines produce the identical
  * tokenization. One pass alone can miss an occurrence whose leading
  * delimiter was consumed by the previous match (`"|a|a|a|a|"` →
  * `"|aa|a|a|"`); the second pass picks those up ([[ReplacePasses]] is
  * part of the algorithm spec — both engines run the same count, so
  * any residual unmerged occurrence is residual on BOTH sides). Ties
  * in pair counts break on (lhs, rhs) ascending — pure-ASCII symbols,
  * so Spark's UTF8 ordering and DuckDB's default collation agree.
  *
  * Application back to the corpus ([[bpeApply]]) needs NO join and no
  * dictionary: the learned merge table (a few hundred rules at most)
  * folds into a chain of literal `replace` columns applied map-side —
  * embarrassingly parallel, zero shuffle, the 100 TB shape.
  */
object Bpe {

  /** Number of merge rules learned — mirrored by the oracle's unrolled
    * CTE chain ([[TrainingOracles]]), so keep the two in sync. */
  val Merges = 10

  /** Merge application = this many left-to-right replace passes (see
    * class doc — part of the cross-engine algorithm spec). */
  val ReplacePasses = 2

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** One learned merge rule. */
  final case class Rule(rank: Int, lhs: String, rhs: String, count: Long)

  /** `'|'`-delimited character sequence of a word:
    * `"the"` → `"|t|h|e|"`. */
  private[ops] def initSeq(word: Column): Column =
    concat(lit("|"), regexp_replace(word, "(.)", "$1|"))

  /** Apply one merge rule to a delimited sequence column
    * ([[ReplacePasses]] passes, see class doc). */
  private[ops] def applyRule(seq: Column, l: String, r: String): Column = {
    val pat = lit(s"|$l|$r|")
    val rep = lit(s"|$l$r|")
    (1 to ReplacePasses).foldLeft(seq)((c, _) => replace(c, pat, rep))
  }

  /** The word-frequency table with initial character sequences — the
    * ONE corpus-scale pass (tokenize is narrow; the word grouping is
    * one shuffle with map-side combine). */
  private def wordSeqs(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(explode(tokensArrayFast(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("seq", initSeq(col("word")))

  /** Word-count cap for the LOCAL merge loop: at or below it the
    * word-frequency table collects to the driver ONCE and the
    * `merges`-iteration argmax loop runs in memory — above it the
    * distributed per-iteration loop runs unchanged. Rationale (guide
    * §1.2): each distributed iteration is one vocab-size shuffle + a
    * 1-row collect, which on a small vocabulary is pure scheduling
    * constant (measured ~0.1 s/iteration at sf0.1 — the train loop was
    * 10 jobs over a table of a few hundred rows); the vocabulary is
    * Heaps-law sublinear in corpus size, but the guard keeps the
    * collect bounded regardless (the [[graft.ops.Graph]] size-guarded
    * single-task discipline). Identical rules by construction: same
    * pair counts, same (pc desc, lhs, rhs) tie-break under UTF-8 byte
    * order — BpeSpec pins the invariants and bpeApply/bpePack ride
    * the same rule chain either way. */
  val LocalTrainMaxWords = 65536

  /** Conf override for [[LocalTrainMaxWords]] — set it to 0 to force
    * the distributed loop at any vocabulary size (the cluster-shaped
    * conf's knob, and how BpeSpec pins distributed == local). */
  val LocalTrainMaxWordsKey = "spark.graft.bpe.localTrainMaxWords"

  private def localTrainCap(spark: SparkSession): Int =
    spark.conf.get(LocalTrainMaxWordsKey,
      LocalTrainMaxWords.toString).toInt

  /** The in-memory merge loop over a collected (cnt, seq) vocabulary —
    * step-for-step [[train]]'s distributed iteration: symbol arrays
    * are the `'|'`-split interior, pair counts weight by word count,
    * the argmax tie-breaks on (lhs, rhs) ascending in UTF-8 byte order
    * (Spark's UTF8String ordering), and each rule applies as
    * [[ReplacePasses]] left-to-right non-overlapping literal replaces
    * (`String.replace` == Spark `replace`, the [[subwordCounter]]
    * parity). */
  private def trainLocal(words: Array[(Long, String)],
                         merges: Int): Seq[Rule] = {
    def utf8Lt(a: String, b: String): Boolean = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      x.length < y.length
    }
    val cnts = words.map(_._1)
    val seqs = words.map(_._2)
    val rules = Seq.newBuilder[Rule]
    for (rank <- 1 to merges) {
      val pc = new scala.collection.mutable.HashMap[(String, String), Long]
      var w = 0
      while (w < seqs.length) {
        val arr = seqs(w).split("\\|", -1) // keep trailing empties (Spark split parity)
        // interior symbols: drop the leading/trailing delimiter empties
        var i = 1
        while (i < arr.length - 2) {
          val k = (arr(i), arr(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + cnts(w))
          i += 1
        }
        w += 1
      }
      require(pc.nonEmpty,
        s"BPE ran out of pairs at rank $rank — corpus too small for $merges merges")
      var best: ((String, String), Long) = null
      pc.foreach { kv =>
        if (best == null || kv._2 > best._2 ||
            (kv._2 == best._2 && (utf8Lt(kv._1._1, best._1._1) ||
              (kv._1._1 == best._1._1 && utf8Lt(kv._1._2, best._1._2)))))
          best = kv
      }
      val ((l, r), c) = best
      rules += Rule(rank, l, r, c)
      val pat = s"|$l|$r|"
      val rep = s"|$l$r|"
      w = 0
      while (w < seqs.length) {
        var s = seqs(w)
        var p = 0
        while (p < ReplacePasses) { s = s.replace(pat, rep); p += 1 }
        seqs(w) = s
        w += 1
      }
    }
    rules.result()
  }

  /** Train `merges` BPE rules. Returns the learned rules (rank order)
    * and the final per-word sequence table. Below [[LocalTrainMaxWords]]
    * the merge loop runs driver-side over the collected vocabulary (see
    * there); above it, each iteration materializes the rewritten vocab
    * through [[Stage.cut]] (lineage stays constant-depth; blocks are
    * executor-resident and cleaner-reclaimed) and the per-iteration
    * collect is ONE row — the argmax pair. */
  def train(spark: SparkSession, dir: String,
            merges: Int = Merges): (Seq[Rule], DataFrame) = {
    require(merges >= 1, s"train needs merges >= 1, got $merges")
    val ws = wordSeqs(spark, dir)
    val cap = localTrainCap(spark)
    val local =
      if (cap <= 0) Array.empty[org.apache.spark.sql.Row]
      else ws.select(col("cnt"), col("seq")).limit(cap + 1).collect()
    if (cap > 0 && local.length <= cap) {
      val rules = trainLocal(
        local.map(r => (r.getLong(0), r.getString(1))), merges)
      // the returned sequence table = the rule chain folded over the
      // initial sequences — identical to the iterative rewrite by
      // construction (the bpeApply identity, spec-pinned)
      val seqFinal = rules.foldLeft(col("seq"))(
        (c, r) => applyRule(c, r.lhs, r.rhs))
      return (rules, Stage.cut(ws.withColumn("seq", seqFinal),
        eager = false))
    }
    var seqs = Stage.cut(ws, eager = false)
    val rules = Seq.newBuilder[Rule]
    for (rank <- 1 to merges) {
      // adjacent symbol pairs of each word, weighted by word count;
      // guard: sequence(1, n-1) DESCENDS when n < 2 — emit no pairs
      val sym = slice(split(col("seq"), "\\|"), lit(2),
        size(split(col("seq"), "\\|")) - 2)
      val top = seqs
        .select(col("cnt"), sym.as("sym"))
        .select(col("cnt"), explode(when(size(col("sym")) >= 2,
          transform(sequence(lit(1), size(col("sym")) - 1),
            i => struct(element_at(col("sym"), i).as("lhs"),
              element_at(col("sym"), i + 1).as("rhs"))))
          .otherwise(array().cast("array<struct<lhs:string,rhs:string>>")))
          .as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("lhs"), col("rhs"))
        .limit(1)
        .collect()
      require(top.nonEmpty,
        s"BPE ran out of pairs at rank $rank — corpus too small for $merges merges")
      val (l, r, pc) =
        (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      rules += Rule(rank, l, r, pc)
      val next = Stage.cut(
        seqs.withColumn("seq", applyRule(col("seq"), l, r)), eager = false)
      seqs = next
    }
    (rules.result(), seqs)
  }

  /** q27_bpe_train: the learned merge table — (rank, lhs, rhs, merged,
    * pc), the artifact a tokenizer ships. */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (rules, _) = train(spark, dir)
    rules.map(r => (r.rank, r.lhs, r.rhs, r.lhs + r.rhs, r.count))
      .toDF("rank", "lhs", "rhs", "merged", "pc")
      .orderBy("rank")
  }

  /** q27_bpe_apply: per-document BPE token counts — the learned rules
    * fold into a literal replace chain applied MAP-SIDE to each word
    * (no join, no dictionary broadcast, zero shuffle beyond the final
    * per-doc aggregation). Identical to joining the trained sequence
    * table by construction: the chain is exactly how that table's
    * sequences were computed. */
  /** q27_bpe_pack: the packed-sequence layout of the BPE-TOKENIZED
    * corpus — [[TextAnalysis.packSequences]]' two-phase scalable
    * cumsum over SUBWORD counts instead of word counts: the layout a
    * training run actually consumes, where sequence length is counted
    * in tokenizer units. Per-doc subword counts come from a pure
    * per-row fold (the learned replace chain applied INSIDE a
    * `transform` lambda over the token array — no explode, no extra
    * shuffle before the layout's own). */
  def bpePack(spark: SparkSession, dir: String,
              seqLen: Long = 512): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val (rules, _) = train(spark, dir)
    // JVM fold, not a Catalyst HOF: the transform/aggregate form
    // evaluates interpreted (20 replace nodes per token — measured
    // 5.4 s at sf0.1); Java String.replace has the IDENTICAL
    // left-to-right non-overlapping semantics the oracle's replace
    // runs, so the counts are unchanged (the sanctioned
    // hot-HOF-chain→UDF trade, and BpeSpec pins layout weights ==
    // bpeApply counts)
    val subwordCount = subwordCounter(rules)
    val counts = docs(spark, dir)
      .select(col("doc_id"),
        subwordCount(tokensArrayFast(col("text"))).as("n"),
        graft.functions.GraftFunctions.polyhash(col("text"), P).as("h"))
    TextAnalysis.packLayout(spark, counts, seqLen)
  }

  /** The per-doc subword-count fold over a token array for a learned
    * rule chain — shared by [[bpePack]] and the merge-depth
    * measurements ([[graft.BpeProf]]), so the apply arithmetic under
    * test is the shipped one. */
  def subwordCounter(rules: Seq[Rule])
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val ruleArr = rules.map(r =>
      (s"|${r.lhs}|${r.rhs}|", s"|${r.lhs}${r.rhs}|")).toArray
    udf((toks: Seq[String]) => {
      var total = 0L
      toks.foreach { w =>
        val sb = new StringBuilder(w.length * 2 + 1).append('|')
        w.foreach(c => sb.append(c).append('|'))
        var s = sb.toString
        var i = 0
        while (i < ruleArr.length) {
          val (pat, rep) = ruleArr(i)
          var p = 0
          while (p < ReplacePasses) { s = s.replace(pat, rep); p += 1 }
          i += 1
        }
        total += s.split("\\|", -1).length - 2
      }
      total
    })
  }

  def bpeApply(spark: SparkSession, dir: String): DataFrame = {
    val (rules, _) = train(spark, dir)
    val seqFinal = rules.foldLeft(initSeq(col("word")))(
      (c, r) => applyRule(c, r.lhs, r.rhs))
    docs(spark, dir)
      .select(col("doc_id"), explode(tokensArrayFast(col("text"))).as("word"))
      .select(col("doc_id"),
        (size(split(seqFinal, "\\|")) - 2).cast("long").as("syms"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("syms")).as("bpe_tokens"))
      .orderBy("doc_id")
  }
}
