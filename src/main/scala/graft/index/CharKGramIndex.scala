package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextPipeline

/** Char-k-gram → term index (SURVEY.md §2.1 R4): per distinct raw
  * token, wrap as `$token$` and emit every k-char substring; group to a
  * sorted distinct term list (`CharKGramTermIndexer.java:98-110`;
  * canonical sorted/distinct semantics per SURVEY §2.10-Q6 decision).
  *
  * The capability R4 exists for is wildcard queries: grams of a pattern
  * like `re*ve` → intersect the gram term lists → candidate terms (used
  * by [[graft.query.QueryEngine.wildcardTerms]]).
  */
object CharKGramIndex {

  /** (gram, terms ARRAY<STRING> sorted distinct) from a raw corpus. */
  def build(spark: SparkSession, corpus: DataFrame, k: Int = 3): DataFrame = {
    TextPipeline.register(spark)
    val vocab = corpus
      .select(explode(expr("graft_tokenize_raw(content)")).as("term"))
      .distinct()
    grams(vocab, k)
      .groupBy(col("gram"))
      .agg(sort_array(collect_set(col("term"))).as("terms"))
  }

  /** Incremental maintenance: merge a DELTA corpus's vocabulary into
    * an existing chargram table without re-tokenizing the old
    * collection — the delta path the other three index artifacts
    * already have ([[InvertedIndex.merge]], [[PositionalIndex.merge]],
    * [[graft.queries.IrSql.mergeBm25Stats]]); without it, terms new
    * to a merged corpus were wildcard-UNREACHABLE until a full
    * rebuild. Only the delta is tokenized; grams whose term lists the
    * delta doesn't touch are carried through UNCHANGED (left-anti —
    * at store scale the rewrite cost is proportional to the delta's
    * gram footprint, not the corpus vocabulary); touched grams union
    * the new terms into the sorted distinct list. Term lists are
    * VOCABULARY-level (no counts), so merge == full rebuild
    * content-identically: the rebuilt list for a gram is the sorted
    * distinct union of both sides' term sets (spec-pinned). Deleting
    * terms is out of scope, exactly as for the reference's
    * rebuild-only indexer (SURVEY §2.1 R4). */
  def merge(spark: SparkSession, base: DataFrame, delta: DataFrame,
            k: Int = 3): DataFrame = {
    TextPipeline.register(spark)
    val vocabD = delta
      .select(explode(expr("graft_tokenize_raw(content)")).as("term"))
      .distinct()
    val dLists = grams(vocabD, k)
      .groupBy(col("gram"))
      .agg(collect_set(col("term")).as("new_terms"))
    val untouched = base
      .join(dLists.select(col("gram")), Seq("gram"), "left_anti")
    val touched = dLists
      .join(base, Seq("gram"), "left")
      .select(col("gram"),
        sort_array(array_distinct(concat(
          coalesce(col("terms"),
            array().cast("array<string>")),
          col("new_terms")))).as("terms"))
    untouched.unionByName(touched)
  }

  /** Persist / load the chargram table (parquet, repartitioned by gram
    * so a pattern's gram lookups touch few files). */
  def write(chargrams: DataFrame, dir: String): Unit =
    chargrams.repartition(col("gram")).sortWithinPartitions("gram")
      .write.mode("overwrite").parquet(dir)

  def load(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** (gram, term) pairs for a vocabulary DF with column `term`. Terms
    * whose wrapped form is shorter than k produce NOTHING: without the
    * filter, `sequence(1, n)` with n < 1 counts DOWN by default and
    * the negative positions emit wrong-length garbage grams (relevant
    * only for k > 3; the k=3 floor is a 1-char term, wrapped to 3). */
  def grams(vocab: DataFrame, k: Int): DataFrame =
    vocab
      .filter(length(col("term")) + 2 >= k)
      .withColumn("wrapped", concat(lit("$"), col("term"), lit("$")))
      .select(col("term"),
        explode(transform(sequence(lit(1), length(col("term")) + 2 - (k - 1)),
          i => col("wrapped").substr(i, lit(k)))).as("gram"))
      .distinct()
}
