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
