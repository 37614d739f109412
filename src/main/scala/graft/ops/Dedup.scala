package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Stage.StageOps
import graft.Tables
import CrossHash._

/** Deduplication operators over the `documents` table — the operations a
  * large-scale training-data pipeline needs (exact, MinHash+LSH, SimHash,
  * n-gram Jaccard), each expressed as a declarative Spark plan with a
  * DuckDB oracle (see [[TrainingOracles]]).
  *
  * Scale posture (100 TB): nothing here ever compares all pairs of a
  * full corpus. Exact dedup is a hash groupBy (one shuffle on the
  * digest). MinHash/LSH shuffles per-(doc, shingle) rows, then
  * per-(doc, band) buckets — candidate pairs come from the **bucket
  * equi-join**, which Catalyst executes as a shuffled hash join on
  * (band, key); only bucket collisions are scored. SimHash reduces each
  * doc to one 30-bit int; at scale the pair step would bucket on
  * rotated-bit bands the same way (the all-pairs form here is a
  * correctness query bounded to the verify SF). The quadratic jaccard
  * query joins on shared shingles, so disjoint docs never pair.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** Exact dedup: group by content digest; keeper = min doc_id per
    * cluster. `n_dups > 1` rows are removable duplicates. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(col("text")).as("digest"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keeper"))
      .orderBy("digest")

  /** APPLY exact dedup — the materialization step a pipeline runs after
    * [[exact]]: keep exactly one document per content digest (the
    * min-doc_id keeper), semi-joining the keeper set back into the
    * corpus. Two shuffles (digest agg, keeper semi-join on doc_id),
    * output is the deduplicated corpus itself. */
  def applyExact(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val keepers = d.groupBy(md5(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("keeper"))
    d.join(keepers, col("doc_id") === col("keeper"), "left_semi")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** SUB-document exact dedup at fixed token-window granularity (the
    * "paragraph dedup" a training-data pipeline runs to strip repeated
    * boilerplate passages out of otherwise-distinct documents — here a
    * chunk is `width` consecutive tokens, the sub-unit this corpus
    * actually repeats). Tokenize once, window the array, hash each
    * chunk, group — one shuffle on the digest, same scale shape as
    * [[exact]]. REPEATED digests survive (`n_occurrences > 1`) —
    * including a chunk repeated within ONE document, boilerplate worth
    * flagging too; `n_docs` separates cross-document repeats for
    * callers that only want those. */
  def chunkDedup(spark: SparkSession, dir: String,
                 width: Int = 10): DataFrame = {
    val t = docs(spark, dir).select(col("doc_id"),
      tokensArrayFast(col("text")).as("l"))
    val c = t.select(col("doc_id"),
      explode(when(size(col("l")) > 0,
        transform(
          sequence(lit(0),
            floor((size(col("l")) - 1) / lit(width)).cast("int")),
          i => array_join(
            slice(col("l"), i * width + 1, lit(width)), " ")))
        .otherwise(array().cast("array<string>"))).as("chunk"))
    c.groupBy(md5(col("chunk")).as("digest"))
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("keeper"))
      .filter(col("n_occurrences") > 1)
      .orderBy("digest")
  }

  /** Chunk width shared with the generated oracle SQL. */
  val ChunkWidthDefault = 10

  /** CDC rolling window (tokens) / boundary divisor — shared with the
    * oracle. Expected chunk length ≈ divisor tokens. */
  val CdcWindow = 4
  val CdcDivisor = 16L

  /** CONTENT-DEFINED chunking dedup — the shift-robust member of the
    * chunking family: boundaries fall where the rolling hash of the
    * last [[CdcWindow]] tokens is ≡ 0 mod [[CdcDivisor]], so a chunk
    * edge is a function of LOCAL content, not of absolute offsets.
    * [[chunkDedup]]'s fixed windows lose every boundary downstream of
    * a single inserted token; CDC boundaries re-align immediately
    * (the storage-dedup / rsync recipe, applied at token level —
    * spec-pinned: a head insertion changes O(1) chunks). Same output
    * contract as [[chunkDedup]].
    *
    * Scale shape: cut detection and span slicing are narrow per-row
    * array expressions (per-doc state only); the single shuffle is
    * the digest group-by with map-side partial aggregation. */
  def cdcChunks(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    cdcChunksOf(docs(spark, dir).select(col("doc_id"),
      tokensArrayFast(col("text")).as("l")))
  }

  /** [[cdcChunks]] over an explicit (doc_id, l ARRAY<STRING>) frame —
    * the spec hook for constructed corpora. */
  private[ops] def cdcChunksOf(t0: DataFrame): DataFrame =
    cdcSpans(t0).groupBy(md5(col("chunk")).as("digest"))
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("keeper"))
      .filter(col("n_occurrences") > 1)
      .orderBy("digest")

  /** The CDC span table shared by [[cdcChunksOf]] and [[cdcApply]]:
    * one row per content-defined chunk, with its 1-based inclusive
    * token interval [s, e] — so the report and the apply cut the
    * corpus at IDENTICAL boundaries by construction. */
  private[ops] def cdcSpans(t0: DataFrame): DataFrame = {
    val w = CdcWindow
    val t = t0.filter(size(col("l")) > 0)
    // cut AFTER token e (= i + w - 1 for gram start i) when the gram
    // hash divides; never at the last token (the final span ends there
    // anyway). sequence() DESCENDS when size < w — guard to empty.
    val cuts = when(size(col("l")) >= w,
      filter(
        transform(sequence(lit(1), size(col("l")) - (w - 1)),
          i => (i + (w - 1)).cast("int")),
        e => pmod(graft.functions.GraftFunctions.polyhash(
          array_join(slice(col("l"), e - (w - 1), lit(w)), " "), CrossHash.P),
          lit(CdcDivisor)) === 0 && e < size(col("l"))))
      .otherwise(array().cast("array<int>"))
    t.select(col("doc_id"), col("l"),
        concat(array(lit(0)), cuts,
          array(size(col("l")))).as("bounds"))
      .select(col("doc_id"), col("l"),
        explode(transform(sequence(lit(1), size(col("bounds")) - 1),
          j => struct(
            (element_at(col("bounds"), j) + 1).as("s"),
            element_at(col("bounds"), j + 1).as("e")))).as("sp"))
      .select(col("doc_id"), col("sp.s").as("s"), col("sp.e").as("e"),
        array_join(slice(col("l"), col("sp.s"),
          col("sp.e") - col("sp.s") + 1), " ").as("chunk"))
  }

  /** APPLY content-defined chunking dedup — the materialization step
    * [[cdcChunks]] reports on, closing the CDC family's report→apply
    * gap (the [[spanDedupApply]] contract at content-defined
    * boundaries): every token inside a REMOVABLE chunk — an instance
    * of a digest occurring ≥2 times corpus-wide that is not the
    * canonical smallest-(doc_id, start) occurrence — is dropped, the
    * rest re-joined by single spaces. The canonical copy of each
    * repeated chunk survives, so repeated passages are kept exactly
    * once; because the boundaries are content-defined, a passage
    * shifted by an insertion still dedups (the fixed-window apply
    * would miss every realigned copy).
    *
    * Output (doc_id, n_kept, clean_text); docs with no removable
    * chunk (or no tokens) pass through intact.
    *
    * Scale shape (the spanDedupApply discipline): the digest stats
    * and the instances→stats join are EQUI-joins on the digest (one
    * shuffle each, map-side partial agg, AQE skew-split applies); a
    * doc's removal intervals are collected per doc (bounded by its
    * own chunk count — CDC chunks are disjoint within a doc, so no
    * interval union is even needed); the strip is a narrow per-row
    * array filter against the row's own interval list — no
    * inequality join anywhere. */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    cdcApplyOf(docs(spark, dir).select(col("doc_id"),
      tokensArrayFast(col("text")).as("l")))
  }

  /** [[cdcApply]] over an explicit (doc_id, l ARRAY<STRING>) frame —
    * the spec hook for constructed corpora. */
  private[ops] def cdcApplyOf(t: DataFrame): DataFrame = {
    val sp = cdcSpans(t)
      .select(col("doc_id"), col("s"), col("e"),
        md5(col("chunk")).as("digest"))
    val stats = sp.groupBy(col("digest"))
      .agg(count(lit(1)).as("n_occ"),
        min(struct(col("doc_id"), col("s"))).as("canon"))
      .filter(col("n_occ") >= 2)
    val ivs = sp.join(stats, "digest")
      .filter(!(col("doc_id") === col("canon.doc_id") &&
        col("s") === col("canon.s")))
      .select(col("doc_id"),
        struct((col("s") - 1).cast("long").as("s"),
          (col("e") - 1).cast("long").as("e")).as("iv"))
      .groupBy(col("doc_id"))
      .agg(collect_list(col("iv")).as("ivs"))
    t.join(ivs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        filter(col("l"), (tok, i) =>
          !exists(coalesce(col("ivs"),
              array().cast("array<struct<s:long,e:long>>")),
            iv => i >= iv("s") && i <= iv("e"))).as("kept"))
      .select(col("doc_id"),
        size(col("kept")).cast("long").as("n_kept"),
        array_join(col("kept"), " ").as("clean_text"))
      .orderBy("doc_id")
  }

  /** Single-pass doc → distinct word-3-shingles, semantically identical
    * to `array_distinct(shingles(tokensArray(text)))` (lower, alnum-run
    * tokens, 3-token space-joined windows, set-dedup) but ~50× faster:
    * the expression chain costs ~3ms/doc in array allocation, and the
    * dedup self-joins recompute their input several times. */
  private def shingleSeq(text: String): Seq[String] =
    shingleSeqCounted(text)._1

  /** [[shingleSeq]] plus the raw token count (before shingle dedup) —
    * tokenization identical to [[CrossHash.tokensArrayFast]], so the
    * count matches `size(tokensArrayFast(text))` without a second
    * tokenize pass. */
  private def shingleSeqCounted(text: String): (Seq[String], Int) = {
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    while (i <= lower.length) {
      val c = if (i < lower.length) lower.charAt(i) else ' '
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.nonEmpty) { toks += sb.toString; sb.clear() }
      i += 1
    }
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    var j = 0
    while (j + 2 < toks.length) {
      out += s"${toks(j)} ${toks(j + 1)} ${toks(j + 2)}"
      j += 1
    }
    (out.toSeq, toks.length)
  }

  private val distinctShingles3 = udf(shingleSeq _)

  /** FNV-1a 64-bit over UTF-16 code units — the internal sort/merge
    * key for [[graft.functions.HashedIntersectSizeExpr]]; never
    * surfaced in results, so cross-engine parity is irrelevant here. */
  private def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Per doc: distinct shingles as PARALLEL arrays (64-bit hash,
    * shingle) sorted by (hash asc, shingle asc) — the input shape the
    * hashed sorted-merge intersection expects — plus the doc's raw
    * TOKEN count (same alnum-run tokenization, counted before the
    * shingle dedup). ONE tokenize pass per doc; every downstream shape
    * (incidence rows, sizes, intersection, survivor token counts)
    * derives from this without re-tokenizing. */
  private val hashedShingleSets = udf((text: String) => {
    val (sh, nToks) = shingleSeqCounted(text)
    val arr = sh.map(s => (fnv1a64(s), s)).toArray
    java.util.Arrays.sort(arr, (x: (Long, String), y: (Long, String)) =>
      if (x._1 != y._1) java.lang.Long.compare(x._1, y._1)
      else x._2.compareTo(y._2))
    (arr.map(_._1), arr.map(_._2), nToks.toLong)
  })

  /** (doc_id, sh_hash ARRAY<LONG>, sh_set ARRAY<STRING>, n_tokens)
    * parallel arrays, (hash, shingle)-sorted. */
  private[graft] def docShingleSets(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), hashedShingleSets(col("text")).as("hs"))
      .select(col("doc_id"), col("hs._1").as("sh_hash"),
        col("hs._2").as("sh_set"), col("hs._3").as("n_tokens"))

  /** (doc_id, shingle) distinct word-3-shingles. */
  private[graft] def docShingles(spark: SparkSession, dir: String): DataFrame =
    docShinglesOf(docs(spark, dir))

  /** [[docShingles]] over an arbitrary (doc_id, text) frame — the
    * per-micro-batch form the streaming decontamination gate shingles
    * with (same expression ⇒ stream/batch shingle parity). */
  private[graft] def docShinglesOf(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      explode(distinctShingles3(col("text"))).as("shingle"))

  /** n-gram Jaccard near-dup with PREFIX FILTERING (lossless for a
    * Jaccard threshold): order each doc's shingles by global rarity
    * (df asc, shingle asc) and join only the first
    * `|S| - ceil(t*|S|) + 1` of them — any pair with J ≥ t must share a
    * prefix shingle, so candidates are exact while hot (common)
    * shingles never drive the join. Exact |∩| for each surviving
    * candidate pair comes from the codegen'd hashed sorted-merge
    * [[graft.functions.HashedIntersectSizeExpr]] over the two
    * per-doc shingle-set arrays (bounded by doc length), NOT from a second
    * (doc,shingle) incidence self-join — the verify step is two narrow
    * hash joins on doc_id plus a per-row array op, so its cost scales
    * with |candidates|, never with shingle df skew. Same output as the
    * naive shingle join the DuckDB oracle runs. */
  def jaccard(spark: SparkSession, dir: String,
              threshold: Double = 0.5): DataFrame =
    jaccardStages(spark, dir, threshold)._1.orderBy("doc_a", "doc_b")

  /** DEDUP QUALITY EVALUATION — the third eval battery beside
    * retrieval ([[graft.queries.IrSql.q39IrEval]]) and ANN recall
    * ([[Similarity.annRecallEval]]): score the MinHash+LSH candidate
    * pairs against exact-Jaccard ground truth (pairs with true
    * Jaccard ≥ 0.5 — the [[jaccard]] contract) and report the one-row
    * precision/recall panel every dedup deployment tunes its
    * bands/rows against. Both arms are the existing candidate-bounded
    * pipelines; the compare is one equi-join on the pair key. */
  def dedupEval(spark: SparkSession, dir: String): DataFrame = {
    // stage() both arms: each pair frame feeds a count AND the hit
    // join — unstaged, the banded-LSH and exact-Jaccard pipelines
    // would each evaluate twice (lazy localCheckpoint, not persist —
    // the jaccardStages lifecycle rationale: no release point exists
    // for a CacheManager pin, checkpointed blocks are
    // ContextCleaner-reclaimed once the counts and join complete)
    val (lsh0, truth0) = dedupEvalArms(spark, dir)
    val lsh = lsh0.stage()
    val truth = truth0.stage()
    val nL = lsh.count()
    val nT = truth.count()
    val hit = lsh.join(truth, Seq("doc_a", "doc_b")).count()
    import spark.implicits._
    // ratios round through the SQL round (HALF_UP, same as DuckDB's)
    // rather than driver math — the cross-engine discipline
    Seq((nL, nT, hit)).toDF("n_candidates", "n_true", "n_hit")
      .select(col("n_candidates"), col("n_true"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_candidates"), 4)
          .as("lsh_precision"),
        round(col("n_hit").cast("double") / col("n_true"), 4)
          .as("lsh_recall"))
  }

  /** The two pair arms [[dedupEval]] compares — (LSH candidates,
    * exact-Jaccard truth), each as an unordered (doc_a, doc_b) frame.
    * Exposed for the plan-evidence dump ([[graft.PlanDump]]).
    *
    * ONE tokenize/shingle pass feeds BOTH arms (the
    * [[dedupEvalSampled]] discipline backported to the exact panel —
    * guide §1.2: the two corpus scans were the panel's dominant
    * independent term): the truth arm is the [[jaccard]] pair stage
    * over the staged set table, and the LSH arm re-derives the
    * minhash incidence by exploding the SAME staged sets — identical
    * signatures to [[minhashWide]]'s, since the per-doc shingle set
    * is the same and `min` is order-independent. The LSH arm stops at
    * the band-collision candidate pair set: [[minhashLsh]]'s
    * signature re-join only decorates the same pairs with
    * `est_jaccard`, which the panel never reads, and its global
    * `orderBy` orders a frame this panel only counts. */
  private[graft] def dedupEvalArms(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(spark)
    val sets = docShingleSets(spark, dir)
      .withColumn("n", size(col("sh_set")))
      .stage()
    val inc = sets.select(col("doc_id"),
        explode(col("sh_set")).as("shingle"))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.polyhash(col("shingle"), PM).as("h"))
    val mins = MinhashPerms.map { case (i, a, b) =>
      min((lit(a) * col("h") + lit(b)) % PM).as(s"mh$i") }
    val bands = bandTable(
      inc.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)).stage()
    val lsh = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    (lsh, jaccardPairsOver(sets, threshold = 0.5)
      .select(col("doc_a"), col("doc_b")))
  }

  /** Target sample SIZE (docs) for [[dedupEvalSampled]] — a FIXED
    * size, not a rate: a fixed-rate sample keeps touching-pair volume
    * a constant fraction of the (super-linear) full pair space
    * (measured: 0.58 exponent at 20%), while a fixed-size sample's
    * touching pairs grow only with per-doc pair density — the whole
    * point of a monitoring panel a 100×-scale pipeline can afford on
    * every run. Shared with the oracle. */
  val DedupEvalSampleTarget = 2000L

  /** The sample-threshold arithmetic shared bit-for-bit with the
    * oracle SQL: keep docs whose content hash mod 10000 falls below
    * ⌈target·10000/n⌉ (integer ceil), capped at the whole corpus. */
  private[graft] def sampleThreshold(target: Long, n: Long): Long =
    math.min(10000L, (target * 10000L + n - 1) / n)

  /** SAMPLED-TRUTH dedup monitoring panel — the scale-viable form of
    * [[dedupEval]] (whose exact-truth arm was the dedup family's one
    * remaining super-linear term, so no quality number survived to
    * production scale): restrict BOTH arms to pairs TOUCHING a
    * deterministic FIXED-SIZE content-hash sample (~`target` docs via
    * polyhash(text) mod 10000 under a count-derived threshold — the
    * q27_split stable-hash discipline, so the draw is reproducible
    * run-over-run and engine-over-engine):
    *  - LSH arm: the sample's band rows probe the FULL band table
    *    (the [[neardupProbe]] shape — a sample-bounded equi-join,
    *    never the full self-join),
    *  - truth arm: the sample's prefix rows probe the full prefix
    *    table; the prefix + length pruning stays lossless for
    *    touching pairs (a J ≥ t pair shares a prefix shingle
    *    whichever side is sampled) and the exact intersection verify
    *    stays candidate-bounded, as in [[jaccard]].
    * Touching precision/recall estimate the full panel: under the
    * content-hash draw each pair is touched with probability
    * 2p − p² independent of its Jaccard (the hash is uniform over
    * content), so both ratios are unbiased with binomial
    * O(1/√n_touching) confidence width — n_sample/n_true/n_candidates
    * are in the row exactly so an operator can read that width. On a
    * corpus at or below the target the threshold caps at the whole
    * table and the panel IS [[dedupEval]]; the exact-truth entry
    * stays as the test-scale fidelity check. */
  def dedupEvalSampled(spark: SparkSession, dir: String,
                       target: Long = DedupEvalSampleTarget): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val d = docs(spark, dir)
    val thr = sampleThreshold(target, d.count())
    val smp = d
      .select(col("doc_id"),
        pmod(graft.functions.GraftFunctions.polyhash(col("text"), P),
          lit(10000L)).as("h"))
      .filter(col("h") < thr)
      .select("doc_id")
      .stage()
    val nS = smp.count()
    // ONE tokenize/shingle pass feeds BOTH arms: the truth arm's
    // staged per-doc shingle sets re-explode into the minhash
    // incidence (same distinct shingles, min is order-independent ⇒
    // signatures identical to minhashWide's) instead of a second
    // full-corpus tokenization — at 26× the two corpus scans were the
    // panel's dominant term
    val sets = docShingleSets(spark, dir)
      .withColumn("n", size(col("sh_set")))
      .stage()
    val inc = sets.select(col("doc_id"),
        explode(col("sh_set")).as("shingle"))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.polyhash(col("shingle"), PM).as("h"))
    val mins = MinhashPerms.map { case (i, a, b) =>
      min((lit(a) * col("h") + lit(b)) % PM).as(s"mh$i") }
    val bands = bandTable(
      inc.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)).stage()
    val bandsS = bands.join(smp, Seq("doc_id"), "left_semi")
    val lsh = bandsS.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      .distinct()
      .stage()
    val truth = jaccardTouchingOf(sets, smp, 0.5)
      .select("doc_a", "doc_b").stage()
    val nL = lsh.count()
    val nT = truth.count()
    val hit = lsh.join(truth, Seq("doc_a", "doc_b")).count()
    import spark.implicits._
    Seq((nS, nL, nT, hit))
      .toDF("n_sample", "n_candidates", "n_true", "n_hit")
      .select(col("n_sample"), col("n_candidates"), col("n_true"),
        col("n_hit"),
        round(col("n_hit").cast("double") / col("n_candidates"), 4)
          .as("lsh_precision"),
        round(col("n_hit").cast("double") / col("n_true"), 4)
          .as("lsh_recall"))
  }

  /** [[jaccard]]'s candidate machinery with generation restricted to
    * pairs touching `smp`, via ONE-SIDED prefix filtering: only the
    * SAMPLE's shingles get the rarity-ranked prefix cut (the window
    * sorts ~|sample| docs, never the corpus — the full-corpus per-doc
    * window was the panel's residual super-linear term); partners
    * join as raw incidence rows. Lossless for touching pairs: with
    * the length filter t·|A| ≤ |B|, J ≥ t ⟹ |A∩B| ≥ t(|A|+|B|)/(1+t)
    * ≥ t·|A| ⟹ |A∩B| ≥ ⌈t|A|⌉ > |A| − prefixLen, so the
    * intersection must hit ANY (|A|−⌈t|A|⌉+1)-subset of A — rarity
    * ordering is purely the join-fan-out heuristic (global df keeps
    * hot shingles out of the probe side). The exact verify is
    * unchanged. Output == the full [[jaccard]] pair set filtered to
    * touching pairs, spec-pinned. */
  private def jaccardTouchingOf(sets: DataFrame, smp: DataFrame,
                                threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = sets.select(col("doc_id"), col("n"),
      explode(col("sh_set")).as("shingle"))
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("sdf"))
    val prefixS = sh
      .join(smp, Seq("doc_id"), "left_semi")
      .join(dfreq, "shingle")
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("sdf"), col("shingle"))))
      .filter(col("pos") <=
        col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select(col("doc_id"), col("shingle"), col("n"))
    val cand = prefixS.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") =!= col("b.doc_id") &&
          col("a.n") * threshold <= col("b.n") &&
          col("b.n") * threshold <= col("a.n"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
    cand
      .join(sets.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sets.as("y"), col("doc_b") === col("y.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.GraftFunctions
          .intersectSize(col("x.sh_hash"), col("x.sh_set"),
            col("y.sh_hash"), col("y.sh_set")).as("inter"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter") / (col("na") + col("nb") - col("inter"))).as("j"))
      .filter(col("j") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 4).as("jaccard"))
  }

  /** The jaccard pipeline with its reusable stages exposed: (scored
    * near-dup pairs ≥ threshold, UNordered; the persisted per-doc set
    * table (doc_id, sh_hash, sh_set, n, n_tokens)). [[survivors]] and
    * [[dedupClusters]] build on the pair stage, and survivor selection
    * reads token counts straight off the cached set table instead of
    * re-tokenizing cluster members. */
  private[graft] def jaccardStages(spark: SparkSession, dir: String,
                                   threshold: Double): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(spark)
    // one shingling pass feeds everything (sizes, df, prefix, verify).
    // Lazy localCheckpoint, not persist: the returned pair/set frames
    // read these blocks, so a persist() has no release point and pins
    // a CacheManager entry per invocation — checkpointed blocks are
    // ContextCleaner-reclaimed once the results go unreferenced
    val sets = docShingleSets(spark, dir)
      .withColumn("n", size(col("sh_set")))
      .stage()
    (jaccardPairsOver(sets, threshold), sets)
  }

  /** The pair stage of [[jaccardStages]] over a PRE-STAGED per-doc
    * set table (doc_id, sh_hash, sh_set, n_tokens, n) — split out so
    * [[dedupEval]] can feed BOTH its arms from one shingling pass. */
  private def jaccardPairsOver(sets: DataFrame,
                               threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = sets.select(col("doc_id"), col("n"),
      explode(col("sh_set")).as("shingle"))
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("sdf"))
    // rarity rank via a per-doc window (shuffle+sort on doc_id). An
    // array-side rank (collect_list + array_sort + slice) was measured
    // SLOWER (4.3s vs 2.4s warm at sf0.1): struct collection +
    // re-explode costs more than the window's sort. Keep the window.
    val prefix = sh
      .join(dfreq, "shingle")
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("sdf"), col("shingle"))))
      .filter(col("pos") <=
        col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select(col("doc_id"), col("shingle"), col("n"))
      // both sides of the candidate self-join read this (window + join
      // otherwise run twice); lazy checkpoint for the same lifecycle
      // reason as `sets` above
      .stage()
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id") &&
          // length filter (also lossless): J ≥ t ⟹ t ≤ |A|/|B| ≤ 1/t
          col("a.n") * threshold <= col("b.n") &&
          col("b.n") * threshold <= col("a.n"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val scored = cand
      .join(sets.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sets.as("y"), col("doc_b") === col("y.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.GraftFunctions
          .intersectSize(col("x.sh_hash"), col("x.sh_set"),
            col("y.sh_hash"), col("y.sh_set")).as("inter"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter") / (col("na") + col("nb") - col("inter"))).as("j"))
      // threshold the TRUE jaccard: the prefix/length pruning is
      // lossless exactly for J >= t, so thresholding the ROUNDED value
      // would admit borderline pairs (J < t rounding up to t) that the
      // pruning already dropped — a cross-engine divergence at the
      // boundary; the oracle filters unrounded too
      .filter(col("j") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 4).as("jaccard"))
    scored
  }

  /** WIDE MinHash signature: (doc_id, mh0..mh15) — all 16 affine
    * permutations of the shingle polynomial hash as 16 `min` aggregate
    * expressions in ONE HashAggregate over the (doc, hash) incidence.
    * No 16× crossJoin row explode (the narrow (doc_id, i, mh) shape
    * shuffled 16·|incidence| rows; this shuffles |incidence| with
    * map-side partial mins). The shingle hash is the codegen'd
    * [[graft.functions.PolyHashExpr]] computed INLINE on the
    * incidence rows (~50ns each) — bit-identical to
    * [[CrossHash.polyHash]]/the DuckDB oracle; no distinct+join
    * detour, so the plan shape is SF-independent. */
  def minhashWide(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val inc = docShingles(spark, dir)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.polyhash(col("shingle"), PM).as("h"))
    val mins = MinhashPerms.map { case (i, a, b) =>
      min((lit(a) * col("h") + lit(b)) % PM).as(s"mh$i") }
    inc.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      // reused by banding and both sides of the candidate re-score;
      // lazy checkpoint so repeated invocations don't pin caches
      .stage()
  }

  /** MinHash + LSH near-dup: band the 16-component signature into 4
    * bands of 4; docs sharing any band bucket are candidates; estimated
    * jaccard = fraction of matching signature components, computed
    * straight off the wide vectors (no per-component join). */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashWide(spark, dir)
    val bands = bandTable(sig)
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val matches = MinhashPerms.map { case (i, _, _) =>
      when(col(s"x.mh$i") === col(s"y.mh$i"), 1L).otherwise(0L) }
      .reduce(_ + _)
    cand
      .join(sig.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sig.as("y"), col("doc_b") === col("y.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(matches / lit(MinhashPerms.size.toDouble), 4)
          .as("est_jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** NEAR-DUP delta probe — the incremental form of [[minhashLsh]],
    * completing the delta-dedup family: [[deltaDedup]]/[[bloomProbe]]
    * catch EXACT duplicates of a new batch against the indexed base;
    * this catches NEAR duplicates, by probing the delta's minhash
    * band keys into the base's banded signature table (the standing
    * LSH index an ingest pipeline maintains). Same half-split fixture
    * as the exact probes (doc_id < half = base).
    *
    * Output (delta_doc, base_doc, est_jaccard) for every
    * band-colliding cross pair — the candidate set a pipeline then
    * gates (est ≥ t → reject/cluster the new doc).
    *
    * Scale shape: the base band table is a precomputable durable
    * artifact (at 100 TB: written once, bucketed/partitioned by band
    * key, appended per batch like the base digest set); a probe is
    * ONE equi-join of the (batch-sized) delta bands against it plus a
    * signature re-join on the bounded candidate set — the base is
    * never self-joined per batch, and the delta never joins the base
    * CORPUS, only its band index. Identical banding/permutations to
    * [[minhashLsh]] ([[CrossHash.MinhashPerms]]), so recall follows
    * the same S-curve. */
  def neardupProbe(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashWide(spark, dir).stage()
    val half = docs(spark, dir).count() / 2
    val bands = bandTable(sig)
    val cand = bands.filter(col("doc_id") >= half).as("y")
      .join(bands.filter(col("doc_id") < half).as("x"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key"))
      .select(col("y.doc_id").as("delta_doc"),
        col("x.doc_id").as("base_doc"))
      .distinct()
    val matches = MinhashPerms.map { case (i, _, _) =>
      when(col(s"x.mh$i") === col(s"y.mh$i"), 1L).otherwise(0L) }
      .reduce(_ + _)
    cand
      .join(sig.as("y"), col("delta_doc") === col("y.doc_id"))
      .join(sig.as("x"), col("base_doc") === col("x.doc_id"))
      .select(col("delta_doc"), col("base_doc"),
        round(matches / lit(MinhashPerms.size.toDouble), 4)
          .as("est_jaccard"))
      .orderBy("delta_doc", "base_doc")
  }

  /** The (doc_id, band, key) banding of a wide minhash signature —
    * ONE definition of the band-key rendering shared by the LSH
    * self-join, the delta probe, and the sampled eval's probe. */
  private def bandTable(sig: DataFrame): DataFrame = {
    val bandKeys = (0 until Bands).map { b =>
      concat_ws(",", (b * RowsPerBand until (b + 1) * RowsPerBand)
        .map(i => col(s"mh$i").cast("string")): _*) }
    sig.select(col("doc_id"),
      posexplode(array(bandKeys: _*)).as(Seq("band", "key")))
  }

  /** Minhash band-key rows over an arbitrary (doc_id, text) frame,
    * with the full wide signature carried on every row:
    * (doc_id, band, key, mh0..mh15). The batch-side building block of
    * the STREAMING near-dup ingest gate
    * ([[graft.queries.IrEngine.q29NeardupStream]]): per ingest batch
    * these rows are (a) probed against the accumulated durable band
    * index and (b) appended to it. Carrying the signature on the band
    * rows makes the candidate est-jaccard computable straight off the
    * matched rows — no second signature join against the base; the 4×
    * signature redundancy is the classic space-for-joins index trade. */
  private[graft] def bandRowsOf(df: DataFrame): DataFrame = {
    val inc = df.select(col("doc_id"),
        explode(distinctShingles3(col("text"))).as("shingle"))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.polyhash(col("shingle"), PM).as("h"))
    val mins = MinhashPerms.map { case (i, a, b) =>
      min((lit(a) * col("h") + lit(b)) % PM).as(s"mh$i") }
    val sig = inc.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    val bandKeys = (0 until Bands).map { b =>
      concat_ws(",", (b * RowsPerBand until (b + 1) * RowsPerBand)
        .map(i => col(s"mh$i").cast("string")): _*) }
    sig.select(col("doc_id") +:
      posexplode(array(bandKeys: _*)).as(Seq("band", "key")) +:
      MinhashPerms.map { case (i, _, _) => col(s"mh$i") }: _*)
  }

  /** The signature-match fraction between the x/y sides of a joined
    * [[bandRowsOf]] pair — shared by the streaming gate's probe. */
  private[graft] def bandMatchFraction: org.apache.spark.sql.Column =
    round(MinhashPerms.map { case (i, _, _) =>
      when(col(s"x.mh$i") === col(s"y.mh$i"), 1L).otherwise(0L) }
      .reduce(_ + _) / lit(MinhashPerms.size.toDouble), 4)

  /** The delta-dedup fixture shared by [[deltaDedup]] and
    * [[bloomProbe]]: the corpus split at its median doc_id into
    * (distinct base digests, per-doc delta digests). */
  private def deltaParts(spark: SparkSession,
                         dir: String): (DataFrame, DataFrame) = {
    val d = docs(spark, dir)
    val half = d.count() / 2
    (d.filter(col("doc_id") < half)
       .select(md5(col("text")).as("digest")).distinct(),
     d.filter(col("doc_id") >= half)
       .select(col("doc_id"), md5(col("text")).as("digest")))
  }

  /** INCREMENTAL dedup: check a delta (the upper half of doc ids)
    * against the base corpus WITHOUT re-comparing base-vs-base — the
    * operation a continuously-ingesting pipeline runs per batch. One
    * digest semi-probe of the delta into the base's digest set (at
    * scale: the base digests are a bucketed/indexed table, the probe
    * is a broadcast or bucket-local join — never a corpus self-join).
    * Output: each delta doc with its dup-in-base flag. */
  def deltaDedup(spark: SparkSession, dir: String): DataFrame = {
    val (base, delta) = deltaParts(spark, dir)
    delta
      .join(base.withColumn("in_base", lit(1L)), Seq("digest"), "left")
      .select(col("doc_id"),
        (coalesce(col("in_base"), lit(0L)) === 1L).as("dup_in_base"))
      .orderBy("doc_id")
  }

  /** Bloom-filter DELTA probe — the no-shuffle form of [[deltaDedup]]
    * and the right first pass at 100 TB: build a Bloom filter over the
    * base corpus's content digests once (one aggregation, mergeable
    * sketch), broadcast it, and probe each delta document map-side.
    * Probing is a narrow scan — no join, no shuffle of the delta — and
    * the filter is ~1.2 GB per billion base digests at 1% fpp, i.e.
    * broadcastable where the base digest SET is not. Docs the filter
    * rejects are GUARANTEED new (Bloom filters have no false
    * negatives); only the "maybe" fraction (true dups + ~fpp of the
    * rest) needs the exact digest join. The oracle contract mirrors
    * the sketch queries: exact membership per doc plus a checked
    * no-false-negative flag (`maybe_dup` must hold wherever
    * `dup_in_base` does). */
  def bloomProbe(spark: SparkSession, dir: String,
                 fpp: Double = 0.01): DataFrame = {
    // materialize the distinct base digests once: the bloom-filter
    // aggregation and the exact verification join both read them.
    // localCheckpoint (not persist): the returned DataFrame keeps
    // reading these blocks lazily, so there is no point to unpersist
    // in a finally — checkpointed blocks are reclaimed by the
    // ContextCleaner once the result goes unreferenced.
    val (base0, delta) = deltaParts(spark, dir)
    val base = base0.stageEager()
    val nBase = base.count()
    val bloom = base.stat.bloomFilter("digest", math.max(nBase, 1L), fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val maybe = udf((s: String) => bc.value.mightContainString(s))
    delta
      .withColumn("maybe_dup", maybe(col("digest")))
      .join(base.withColumn("in_base", lit(1L)), Seq("digest"), "left")
      .select(col("doc_id"),
        (coalesce(col("in_base"), lit(0L)) === 1L).as("dup_in_base"),
        (col("maybe_dup") || coalesce(col("in_base"), lit(0L)) === 0L)
          .as("no_false_neg"))
      .orderBy("doc_id")
  }

  /** Duplicate-CLUSTER resolution: connected components over the
    * near-dup pair graph (J ≥ threshold), labeling every involved doc
    * with its component's smallest doc_id and flagging that doc as the
    * cluster keeper — the step a dedup pipeline runs after pair
    * generation to drop all-but-one of each duplicate group
    * transitively (A~B, B~C ⇒ {A,B,C} one cluster even if A≁C).
    *
    * Two execution paths, picked by the measured edge count (the pair
    * graph holds only near-dup MEMBERS, so it is tiny relative to the
    * corpus at any scale — 100 TB of docs with 1% near-dups is still a
    * graph that fits one task):
    *  - ≤ [[SmallGraphEdges]] edges: ONE executor task runs union-find
    *    over the edge list ([[clustersUnionFind]]) — no per-round Spark
    *    jobs at all (the r3 iterative loop was scheduler-bound: 17.6s
    *    of near-empty 32-partition stages for a 477-node graph);
    *  - larger: distributed min-label propagation with pointer jumping
    *    ([[clustersPropagate]]) — O(log diameter) rounds, one action
    *    per round, loop parallelism sized to the graph. */
  def dedupClusters(spark: SparkSession, dir: String,
                    threshold: Double = 0.5): DataFrame =
    clusters(spark,
      jaccardStages(spark, dir, threshold)._1
        .select(col("doc_a"), col("doc_b")))

  /** Connected components over an arbitrary (doc_a, doc_b) edge list —
    * the shared engine behind [[dedupClusters]] and
    * [[Similarity.semanticClusters]]. Optimistic single-action path:
    * try union-find directly (its task guard aborts past
    * [[SmallGraphEdges]]); pair generation materializes at full
    * parallelism into the cache either way, so the rare giant graph
    * pays only the aborted post-shuffle task before falling back to
    * distributed propagation. */
  def clusters(spark: SparkSession, pairsIn: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pairs = pairsIn.persist(MEMORY_AND_DISK)
    // eager localCheckpoint: materializes INSIDE the try (the lazy plan
    // would surface the task-side size guard at the CALLER's first
    // action — past this fallback) and holds the per-node result
    // without a CacheManager entry — the ContextCleaner releases it
    // when the result goes unreferenced, so repeated invocations don't
    // accumulate pinned caches.
    try clustersUnionFind(spark, pairs, SmallGraphEdges).stageEager()
    catch {
      case e: Throwable if graphTooLarge(e) =>
        clustersPropagate(spark, pairs, pairs.count())
    } finally pairs.unpersist()
  }

  private def graphTooLarge(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .exists(t => t.getMessage != null &&
        t.getMessage.contains("GRAFT_GRAPH_TOO_LARGE"))

  /** Edge-count bound for the single-task path: 10M (doc_a, doc_b)
    * pairs is ~160 MB of longs plus the id→parent map — comfortable in
    * one task, far past any plausible near-dup candidate set. */
  val SmallGraphEdges: Long = 10000000L

  /** Single-task exact connected components: union-find (union by min
    * id, path-compressed finds) over the whole edge list in one narrow
    * executor task — the entire loop the iterative form schedules as
    * jobs happens in-memory here. Output identical to
    * [[clustersPropagate]]. `maxEdges` is a task-side guard: exceeding
    * it aborts with a marker the caller maps to the distributed
    * fallback, so the common (small-graph) case needs no separate
    * edge-count action. */
  private[graft] def clustersUnionFind(spark: SparkSession,
                                       pairs: DataFrame,
                                       maxEdges: Long = Long.MaxValue): DataFrame = {
    import spark.implicits._
    pairs.select(col("doc_a"), col("doc_b")).as[(Long, Long)]
      // repartition, NOT coalesce: coalesce(1) would pull the whole
      // upstream final stage (candidate verify) into the single task
      // on first materialization; the round-trip shuffle of a
      // candidate-bounded edge list is cheap and keeps it parallel
      .repartition(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def add(x: Long): Unit = if (!parent.contains(x)) parent(x) = x
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        var m = 0L
        it.foreach { case (a, b) =>
          m += 1
          if (m > maxEdges) throw new IllegalStateException(
            s"GRAFT_GRAPH_TOO_LARGE: > $maxEdges edges; " +
              "use the distributed propagation path")
          add(a); add(b)
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent(rb) = ra
          else if (rb < ra) parent(ra) = rb
        }
        // min-id unions ⇒ every root IS its component's smallest doc_id
        val nodes = parent.keys.toArray
        nodes.iterator.map { n =>
          val c = find(n)
          (n, c, if (n == c) 1L else 0L)
        }
      }
      .toDF("doc_id", "cluster", "keeper")
      .orderBy("doc_id")
  }

  /** Distributed min-label propagation with POINTER JUMPING: each round
    * every node takes min(own label, neighbor labels), then shortcuts
    * through its label's label (lab(lab(node)) ≤ lab(node) always) —
    * O(log diameter) rounds, so the 64-round cap is unreachable for any
    * real graph; if it IS hit, throw rather than silently return split
    * clusters (ADVICE r3). Loop parallelism is sized to the graph
    * (`max(1, edges/100k)` shuffle partitions, conf saved/restored) and
    * each round issues exactly ONE action: `next` is a lazy
    * `localCheckpoint` (truncates plan growth) and the convergence
    * count rides the filter that materializes it. */
  private[graft] def clustersPropagate(spark: SparkSession, pairs: DataFrame,
                                       nEdges: Long): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val parts = math.max(1, (nEdges / 100000L).toInt)
    val shufConf = "spark.sql.shuffle.partitions"
    val prevShuf = spark.conf.get(shufConf)
    spark.conf.set(shufConf, parts.toString)
    val edges = pairs.union(
        pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .repartition(parts, col("doc_b"))
      .persist(MEMORY_AND_DISK)
    try {
      var labels = edges.select(col("doc_a").as("node")).distinct()
        .withColumn("lab", col("node"))
        .stageEager()
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < 64) {
        val nbrMin = edges.join(labels, col("doc_b") === col("node"))
          .groupBy(col("doc_a")).agg(min(col("lab")).as("nlab"))
        val prop = labels.withColumnRenamed("lab", "old")
          .join(nbrMin, col("node") === col("doc_a"), "left")
          .select(col("node"), col("old"),
            least(col("old"), coalesce(col("nlab"), col("old"))).as("lab1"))
        val next = prop.as("a")
          .join(prop.select(col("node").as("pn"), col("lab1").as("plab")),
            col("a.lab1") === col("pn"), "left")
          .select(col("a.node").as("node"), col("old"),
            least(col("a.lab1"), coalesce(col("plab"), col("a.lab1")))
              .as("lab"))
          .stage()
        changed = next.filter(col("lab") =!= col("old")).count()
        labels = next.select(col("node"), col("lab"))
        rounds += 1
      }
      if (changed > 0)
        throw new IllegalStateException(
          s"dedupClusters: min-label propagation not converged after " +
            s"$rounds rounds ($changed labels still changing)")
      labels
        .select(col("node").as("doc_id"), col("lab").as("cluster"),
          when(col("node") === col("lab"), 1L).otherwise(0L).as("keeper"))
        .orderBy("doc_id")
    } finally {
      // labels is checkpoint-backed, so the edge cache releases on the
      // success path AND the non-convergence / job-failure paths
      edges.unpersist()
      spark.conf.set(shufConf, prevShuf)
    }
  }

  /** Quality-aware SURVIVOR selection over the near-dup clusters: per
    * duplicate cluster keep the doc with the MOST tokens (the standard
    * keep-longest heuristic — near-dup groups usually contain truncated
    * or boilerplate-stripped variants of one document, and a pipeline
    * wants the fullest copy, not the smallest id), ties broken by min
    * doc_id. One hash aggregate per cluster via `max(struct(...))` —
    * no per-cluster window, no row buffering — so the selection adds a
    * single shuffle on the (tiny, near-dup-members-only) cluster
    * labeling regardless of corpus scale. */
  def survivors(spark: SparkSession, dir: String,
                threshold: Double = 0.5): DataFrame = {
    // one shared pipeline: the pair stage's cached per-doc set table
    // already carries each doc's token count (counted inside the same
    // UDF pass that shingles it), so survivor selection is ONE join of
    // the (tiny, members-only) labeling against the cached sets plus
    // one aggregate — no re-tokenize of members, no second corpus scan
    val (scored, sets) = jaccardStages(spark, dir, threshold)
    val cl = clusters(spark, scored.select(col("doc_a"), col("doc_b")))
    cl.join(sets.select(col("doc_id"), col("n_tokens")), "doc_id")
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("n_tokens").as("nt"),
          (-col("doc_id")).as("nd"))).as("m"))
      .select(col("cluster"), (-col("m.nd")).as("survivor"),
        col("m.nt").as("survivor_tokens"), col("n_members"))
      .orderBy("cluster")
  }

  /** SimHash bit width (polyHash mod P is < 2^30). */
  val SimhashBits = 30

  /** SimHash fingerprints: (doc_id, simhash) — tf-weighted sign-sum over
    * 30 bit planes of the token hash, computed as 30 aggregate
    * expressions in ONE HashAggregate (no per-bit row explode, no
    * second shuffle); the token hash is the codegen'd PolyHashExpr
    * inline on the per-(doc, term) tf rows — no distinct+join detour.
    * One narrow value per doc. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val tok = docs(spark, dir)
      .select(col("doc_id"), explode(tokensArrayFast(col("text"))).as("term"))
    val tf = tok
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("h",
        graft.functions.GraftFunctions.polyhash(col("term"), P))
    val bitSums = (0 until SimhashBits).map(j =>
      sum(col("tf") * (expr(s"shiftright(h, $j) & 1") * 2 - 1)).as(s"b$j"))
    tf.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until SimhashBits).map(j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
      .orderBy("doc_id")
  }

  /** SimHash near-dup pairs: hamming(simhash_a, simhash_b) ≤ 1. (The
    * synthetic corpus has ~31 distinct terms, so simhashes cluster
    * tightly — ≤1 keeps near-dups meaningful.)
    *
    * Multi-index bit-flip probing, never all-pairs: a qualifying pair
    * either has EQUAL fingerprints (one self-equi-join on simhash) or
    * differs in EXACTLY one known bit — so each doc emits its 30
    * one-bit-flipped variants and an equi-join of variants against
    * exact fingerprints finds each hamming-1 pair exactly once (the
    * flip that maps a onto b). Both joins are pure equi-joins on a
    * 64-bit key: linear row expansion (31×), hash-partitionable,
    * no quadratic half-key buckets (the previous 15-bit-half banding
    * put 1/3 of all docs in one bucket on this corpus → ~2M junk
    * pairs). For hamming ≤ k at scale, the same idea generalizes to
    * multi-index hashing over ⌈bits/(k+1)⌉-bit disjoint bands. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    // lazy checkpoint (read by three join sides; no release point)
    val sh = simhash(spark, dir).stage()
    val equal = sh.as("a").join(sh.as("b"),
        col("a.simhash") === col("b.simhash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        lit(0L).as("hamming"))
    val flips = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until SimhashBits).map(j =>
        col("simhash").bitwiseXOR(lit(1L << j))): _*)).as("probe"))
    val oneBit = flips.as("a").join(sh.as("b"),
        col("a.probe") === col("b.simhash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        lit(1L).as("hamming"))
    equal.union(oneBit).orderBy("doc_a", "doc_b")
  }

  /** Window width for [[spanDedup]], shared with the generated oracle
    * SQL. The published exact-substring-dedup recipe uses 50-token
    * spans on web-scale text; this corpus's documents are 10–99 tokens,
    * so 20 keeps the same "longer than any plausible coincidental
    * overlap" intent at the test scale. */
  val SpanWidthDefault = 20

  /** EXACT duplicated-SPAN detection over OVERLAPPING token windows —
    * the substring-level dedup a training pipeline runs so a passage
    * repeated across (or within) otherwise-distinct documents is kept
    * ONCE and stripped everywhere else (the suffix-array exact-substring
    * dedup of the "Deduplicating Training Data" recipe, re-expressed as
    * a sliding-window grouping — the relational-scale equivalent:
    * every length-`width` token window, grouped by content).
    *
    * Differs from [[chunkDedup]] (non-overlapping fixed chunks, report
    * only): windows overlap, so a repeated passage is caught at ANY
    * alignment, and the output is per-DOCUMENT removal accounting: which
    * windows are non-canonical repeats and how many tokens they cover
    * after interval union.
    *
    * Semantics: a window instance is a removable duplicate iff its gram
    * occurs ≥2 times corpus-wide AND the instance is not the canonical
    * (smallest (doc_id, pos)) occurrence — the canonical copy survives.
    * `dup_tokens` is the size of the union of the removable windows'
    * [pos, pos+width-1] intervals (overlapping windows don't double-
    * count), computed per doc by a gaps-and-islands pass.
    *
    * Scale shape: tokenize is narrow; the gram grouping is ONE shuffle
    * with map-side partial aggregation (skew-safe: a boilerplate gram
    * repeated millions of times still partial-aggregates); the
    * instances→stats join shuffles on gram where AQE's skew-join
    * splitting applies (a window-function formulation was rejected —
    * count()-over-gram-partition puts the whole hot gram in one task
    * with no partial-agg or skew-split escape); the island pass
    * partitions by doc_id — per-doc state is O(doc windows), never
    * corpus-wide. No all-pairs stage anywhere. */
  def spanDedup(spark: SparkSession, dir: String,
                width: Int = SpanWidthDefault): DataFrame =
    spanStages(spark, dir, width)._1

  /** APPLY [[spanDedup]] — the materialization step: every token
    * covered by a removable (non-canonical) duplicated window is
    * dropped, the rest re-joined by single spaces. Canonicity is
    * PER-GRAM: each repeated gram's smallest-(doc_id, pos) window is
    * exempt from removal, but removable windows of OTHER grams may
    * overlap a canonical window and strip tokens inside it — so in
    * pathological overlaps a passage can lose tokens from every copy.
    * This matches the published exact-substring-dedup recipe (Lee et
    * al. cut each duplicated span independently); the oracle computes
    * the same semantics, so the engines agree by construction.
    *
    * Scale shape: the merged removal intervals are collected PER DOC
    * (`collect_list` after the per-doc island pass — bounded by that
    * doc's window count, never corpus-wide), joined back on doc_id, and
    * the strip itself is a narrow per-row array filter; the range
    * predicate lives inside the row's own interval list, so no
    * inequality join (a broadcast-nested-loop trap) ever forms. */
  def spanDedupApply(spark: SparkSession, dir: String,
                     width: Int = SpanWidthDefault): DataFrame = {
    val (_, t, islands) = spanStages(spark, dir, width)
    val ivs = islands
      .groupBy(col("doc_id"), col("iid"))
      .agg(min(col("pos")).cast("long").as("s"),
        max(col("e")).cast("long").as("e"))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("s"), col("e"))).as("ivs"))
    t.join(ivs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        filter(col("l"), (tok, i) =>
          !exists(coalesce(col("ivs"),
              array().cast("array<struct<s:long,e:long>>")),
            iv => i >= iv("s") && i <= iv("e"))).as("kept"))
      .select(col("doc_id"),
        size(col("kept")).cast("long").as("n_kept"),
        array_join(col("kept"), " ").as("clean_text"))
      .orderBy("doc_id")
  }

  /** Shared pipeline behind [[spanDedup]] / [[spanDedupApply]]:
    * (per-doc report, tokenized docs, per-doc islands of removable
    * window intervals). */
  private def spanStages(spark: SparkSession, dir: String,
                         width: Int): (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val t = docs(spark, dir).select(col("doc_id"),
      tokensArrayFast(col("text")).as("l"))
    // (doc_id, pos, gram): pos is the 0-based token index the window
    // starts at; posexplode over the shingle array supplies it directly
    val inst = t.select(col("doc_id"),
        posexplode(shingles(col("l"), width)))
      .select(col("doc_id"), col("pos"), col("col").as("gram"))
    // gram → (occurrence count, canonical first instance); struct min
    // is lexicographic (doc_id, pos) — the survivor everyone else is a
    // repeat of. Only duplicated grams survive the filter, so the join
    // back touches instances of repeated passages only.
    val stats = inst.groupBy(col("gram"))
      .agg(count(lit(1)).as("n_occ"),
        min(struct(col("doc_id"), col("pos"))).as("canon"))
      .filter(col("n_occ") >= 2)
    val dup = inst.join(stats, "gram")
      .filter(!(col("doc_id") === col("canon.doc_id") &&
        col("pos") === col("canon.pos")))
      .select(col("doc_id"), col("pos"),
        (col("pos") + lit(width - 1)).as("e"))
    // gaps-and-islands: union the removable intervals per doc. pos is
    // unique per doc (one window per start), so the order is total.
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val isl = dup
      .withColumn("pme", max(col("e")).over(
        byPos.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("iid", sum(
        when(col("pme").isNull || col("pos") > col("pme") + 1, 1L)
          .otherwise(0L)).over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perDoc = isl.groupBy(col("doc_id"), col("iid"))
      .agg((max(col("e")) - min(col("pos")) + 1).as("tkns"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tkns")).as("dup_tokens"))
    val nDup = dup.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_windows"))
    val report = t
      .select(col("doc_id"), size(col("l")).cast("long").as("n_tokens"),
        greatest(size(col("l")) - lit(width - 1), lit(0)).cast("long")
          .as("n_windows"))
      .join(nDup, Seq("doc_id"), "left")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
      .orderBy("doc_id")
    (report, t, isl)
  }
}
