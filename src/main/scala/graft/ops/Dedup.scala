package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  /** (doc_id, shingle) distinct word-3-shingles. */
  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        explode(array_distinct(shingles(tokensArray(col("text")))))
          .as("shingle"))

  /** n-gram Jaccard near-dup: join docs on shared shingles (never
    * all-pairs), jaccard = |∩| / |∪| ≥ 0.5. */
  def jaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShingles(spark, dir)
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sz.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sz.as("y"), col("doc_b") === col("y.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter") /
          (col("x.n") + col("y.n") - col("inter")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash signatures: (doc_id, i, mh) for 16 affine permutations of
    * the shingle polynomial hash. Permutation table is broadcast. */
  def minhashSignature(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perms = MinhashPerms.toDF("i", "a", "b")
    docShingles(spark, dir)
      .withColumn("h", polyHash(col("shingle"), PM))
      .crossJoin(broadcast(perms))
      .groupBy(col("doc_id"), col("i"))
      .agg(min((col("a") * col("h") + col("b")) % PM).as("mh"))
  }

  /** MinHash + LSH near-dup: band the 16-component signature into 4
    * bands of 4; docs sharing any band bucket are candidates; estimated
    * jaccard = fraction of matching signature components. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignature(spark, dir)
    val bands = sig
      .withColumn("band", expr(s"i div $RowsPerBand"))
      .groupBy(col("doc_id"), col("band"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("i"), col("mh")))),
          x => x.getField("mh").cast("string")), ",").as("key"))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand.as("c")
      .join(sig.as("s1"), col("c.doc_a") === col("s1.doc_id"))
      .join(sig.as("s2"),
        col("c.doc_b") === col("s2.doc_id") && col("s1.i") === col("s2.i"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(round(
        sum(when(col("s1.mh") === col("s2.mh"), 1L).otherwise(0L)) /
          lit(MinhashPerms.size.toDouble), 4).as("est_jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash bit width (polyHash mod P is < 2^30). */
  val SimhashBits = 30

  /** SimHash fingerprints: (doc_id, simhash) — tf-weighted sign-sum over
    * 30 bit planes of the token hash. One narrow value per doc. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val tf = docs(spark, dir)
      .select(col("doc_id"), explode(tokensArray(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("h", polyHash(col("term"), P))
    tf.select(col("doc_id"), col("tf"), col("h"),
        explode(sequence(lit(0), lit(SimhashBits - 1))).as("j"))
      .groupBy(col("doc_id"), col("j"))
      .agg(when(
        sum(col("tf") *
          (expr("shiftright(h, cast(j as int)) & 1") * 2 - 1)) > 0, 1L)
        .otherwise(0L).as("bit"))
      .groupBy(col("doc_id"))
      .agg(sum(expr("shiftleft(bit, cast(j as int))")).as("simhash"))
      .orderBy("doc_id")
  }

  /** SimHash near-dup pairs: hamming(simhash_a, simhash_b) ≤ 1. (The
    * synthetic corpus has ~31 distinct terms, so simhashes cluster
    * tightly — ≤1 keeps near-dups meaningful.) All-pairs on one int per
    * doc at verify SF; banded at scale (see object doc). */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = simhash(spark, dir)
    sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("long").as("hamming"))
      .filter(col("hamming") <= 1)
      .orderBy("doc_a", "doc_b")
  }
}
