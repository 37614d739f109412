package graft.text

import org.apache.spark.sql.SparkSession

/** The reference's `processContent` pipeline (tokenize → stopword filter
  * → stem; `CODE/ivory/tokenize/GalagoTokenizer.java:139-183`) as pure
  * functions + Spark UDF registration. The same function serves index
  * build and query analysis — the index/query consistency the reference
  * gets from sharing one code path (SURVEY.md §2.2).
  */
object TextPipeline {

  /** Terrier stopword list (733 words), copied verbatim from
    * `GalagoTokenizer.java:35-125` as a data resource. */
  lazy val stopwords: Set[String] = {
    val in = getClass.getResourceAsStream("/graft/stopwords_terrier.txt")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSet
    finally in.close()
  }

  /** Full pipeline: tag-aware tokenize, drop stopwords, Porter2-stem. */
  def processContent(text: String): Seq[String] =
    TagTokenizer.tokenize(text)
      .filterNot(stopwords.contains)
      .map(PorterStemmer.stem)

  /** Tokenize without stemming/stopping (for char-k-gram indexing the
    * reference builds over raw tokens). */
  def tokenizeOnly(text: String): Seq[String] = TagTokenizer.tokenize(text)

  /** Register SQL-callable UDFs: graft_tokenize, graft_stem,
    * graft_tokenize_raw. UDF (not codegen Expression) is the documented
    * §7.2 starting point; these sit in one projection per doc, so the
    * serialization overhead is per-row, not per-token. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_tokenize",
      (s: String) => if (s == null) Seq.empty[String] else processContent(s))
    spark.udf.register("graft_tokenize_raw",
      (s: String) => if (s == null) Seq.empty[String] else tokenizeOnly(s))
    spark.udf.register("graft_stem",
      (s: String) => if (s == null) null else PorterStemmer.stem(s))
  }
}
