package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.InvertedIndex.Index
import graft.text.TextPipeline

/** tf-idf ranked search + wildcard term expansion — the reference's
  * interactive client (`IntDocVectorsForwardIndex.java:278-321`,
  * SURVEY.md §3.3) as cached-DataFrame programs.
  *
  * Plan shape per query: literal IN-filter on postings (partition/
  * row-group pruned parquet or cached DF — no shuffle of the index),
  * broadcast join of per-term df, HashAggregate on docno,
  * TakeOrderedAndProject for top-k. No wide exchange at any corpus
  * size; the only shuffle is the final tiny per-doc score agg.
  *
  * Scoring modes (SURVEY §2.10 Q1-Q3 decisions):
  *  - intended (default): df = postings-list length, true division,
  *    exact double sort with docno tiebreak
  *  - bugCompat: reproduces the shipped binary — df=1 for every term
  *    (so idf degenerates to log10(N)) and integer-floored N/df
  */
object QueryEngine {

  /** Analyze a raw query with the exact indexing pipeline (same code
    * path ⇒ index/query consistency, SURVEY §2.2). */
  def analyze(query: String): Seq[String] =
    TextPipeline.processContent(query)

  /** The reference accepts only 1-2 word raw queries
    * (`IntDocVectorsForwardIndex.java:292-297`). */
  def requireArity(query: String): Seq[String] = {
    val words = query.trim.split("\\s+").toSeq
    require(words.nonEmpty && words.size <= 2,
      s"query must be 1-2 words, got ${words.size}")
    analyze(query)
  }

  /** tf-idf top-k: score(doc) = Σ_t (1+ln tf) * log10(N/df). */
  def search(ix: Index, query: String, topK: Int = 10,
             bugCompat: Boolean = false): DataFrame = {
    val terms = requireArity(query)
    if (terms.isEmpty) return ix.docMap.sparkSession.emptyDataFrame
      .select(lit(0L).as("docno"), lit("").as("docid"), lit(0.0).as("score"))
      .limit(0)
    val hits = ix.postings.filter(col("kgram").isin(terms: _*))
    val idf =
      if (bugCompat)
        // df stays 1 on the shipped path (SURVEY §2.10-Q1) and the
        // idf ratio N/df is int/int division (§2.10-Q2)
        log10(floor(lit(ix.nDocs.toDouble)))
      else
        log10(lit(ix.nDocs.toDouble) / col("df").cast("double"))
    val scored = hits
      .join(broadcast(ix.termStats), "kgram")
      .groupBy(col("docno"))
      .agg(sum((lit(1.0) + log(col("tf"))) * idf).as("score"))
    scored
      .join(broadcast(ix.docMap), "docno")
      .select(col("docno"), col("docid"), round(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col("docno"))
      .limit(topK)
  }

  /** Expand a single-`*` wildcard pattern (e.g. `re*ve`) to matching
    * vocabulary terms via the char-k-gram index: grams of the anchored
    * pattern segments → intersect term lists → verify with LIKE.
    * This is the lookup path R4 was built for (SURVEY §7.1 step 5). */
  def wildcardTerms(chargrams: DataFrame, pattern: String,
                    k: Int = 3): DataFrame = {
    require(pattern.count(_ == '*') == 1, "exactly one * supported")
    val Array(pre, post) = pattern.split("\\*", -1)
    val padded = s"$$$pre*$post$$"
    val segGrams = padded.split("\\*", -1).toSeq
      .flatMap(seg => (0 to seg.length - k).map(i => seg.substring(i, i + k)))
      .distinct
    val verify = col("term").like(pattern.replace("*", "%"))
    if (segGrams.isEmpty) {
      // pattern shorter than k on both sides: scan the vocabulary
      chargrams.select(explode(col("terms")).as("term"))
        .distinct().filter(verify).orderBy("term")
    } else {
      chargrams
        .filter(col("gram").isin(segGrams: _*))
        .select(col("gram"), explode(col("terms")).as("term"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("ng"))
        // candidate must contain every pattern gram
        .filter(col("ng") === segGrams.size)
        .filter(verify)
        .select(col("term"))
        .orderBy("term")
    }
  }

  /** Wildcard search: expand the pattern, then disjunctive tf-idf over
    * the expansion (collected: expansions are vocabulary-bounded and
    * the reference's query client is likewise term-at-a-time). */
  def wildcardSearch(ix: Index, chargrams: DataFrame, pattern: String,
                     topK: Int = 10): DataFrame = {
    // expansion yields surface forms (char-gram index is over raw
    // tokens); the postings are stemmed → analyze each expansion with
    // the same pipeline before lookup
    val terms = wildcardTerms(chargrams, pattern)
      .collect().map(_.getString(0)).toSeq
      .flatMap(TextPipeline.processContent).distinct
    val hits = ix.postings.filter(col("kgram").isin(terms: _*))
    hits.join(broadcast(ix.termStats), "kgram")
      .groupBy(col("docno"))
      .agg(round(sum((lit(1.0) + log(col("tf"))) *
        log10(lit(ix.nDocs.toDouble) / col("df").cast("double"))), 4)
        .as("score"))
      .join(broadcast(ix.docMap), "docno")
      .select(col("docno"), col("docid"), col("score"))
      .orderBy(col("score").desc, col("docno"))
      .limit(topK)
  }
}
