package graft.index

import org.apache.hadoop.fs.Path
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

  /** The delta corpus's gram → new-term lists (the merge input both
    * the frame-level and the store-level merge consume). */
  private def deltaLists(spark: SparkSession, delta: DataFrame,
                         k: Int): DataFrame = {
    TextPipeline.register(spark)
    val vocabD = delta
      .select(explode(expr("graft_tokenize_raw(content)")).as("term"))
      .distinct()
    grams(vocabD, k)
      .groupBy(col("gram"))
      .agg(collect_set(col("term")).as("new_terms"))
  }

  /** The ONE merge rule, shared by [[merge]] and [[mergeIntoStore]]:
    * grams the delta doesn't touch carry through unchanged
    * (left-anti); touched grams union the new terms into the sorted
    * distinct list. Term lists are VOCABULARY-level (no counts), so
    * the result is content-identical to a full rebuild. */
  private def mergeLists(base: DataFrame, dLists: DataFrame): DataFrame = {
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

  /** Incremental maintenance, FRAME level: merge a DELTA corpus's
    * vocabulary into an existing chargram frame without re-tokenizing
    * the old collection — the delta path the other three index
    * artifacts already have ([[InvertedIndex.merge]],
    * [[PositionalIndex.merge]], [[graft.queries.IrSql
    * .mergeBm25Stats]]); without it, terms new to a merged corpus
    * were wildcard-UNREACHABLE until a full rebuild. Only the delta
    * is tokenized. NOTE the cost scope: the RETURNED FRAME unions
    * untouched + touched rows, so materializing it (a full `write`)
    * rewrites the whole table — the delta-proportional WRITE path is
    * [[mergeIntoStore]], which rewrites only the part files whose
    * gram ranges the delta intersects. Deleting terms is out of
    * scope, exactly as for the reference's rebuild-only indexer
    * (SURVEY §2.1 R4). */
  def merge(spark: SparkSession, base: DataFrame, delta: DataFrame,
            k: Int = 3): DataFrame =
    mergeLists(base, deltaLists(spark, delta, k))

  /** Persist the chargram table: RANGE-partitioned on gram (each file
    * covers one contiguous gram range, so a wildcard pattern's gram
    * lookups prune to single files via parquet min/max — and
    * [[mergeIntoStore]]'s file surgery has disjoint ranges to route
    * against; the previous hash layout scattered every range across
    * all files, defeating both). */
  def write(chargrams: DataFrame, dir: String,
            rowsPerFile: Long = InvertedIndex.WriteRowsPerFile): Unit = {
    // explicit file count (the InvertedIndex.write discipline): an
    // unsized repartitionByRange lets AQE coalesce the whole table
    // into one file, defeating both pruning and file surgery
    val n = math.max(1L,
      (chargrams.count() + rowsPerFile - 1) / rowsPerFile).toInt
    chargrams.repartitionByRange(n, col("gram"))
      .sortWithinPartitions("gram")
      .write.mode("overwrite").parquet(dir)
  }

  def load(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  private val StagedDir = "_graft_cg_new"
  private val Marker = "_graft_cg_inflight"

  /** Incremental maintenance, STORE level — the delta-proportional
    * WRITE path: merge a delta corpus's vocabulary directly into a
    * WRITTEN chargram store, rewriting ONLY the part files whose gram
    * ranges the delta touches (plus one new range for grams no file
    * covers). Untouched part files are left byte-identical
    * (spec-pinned), so at store scale the write cost is proportional
    * to the delta's gram footprint, not the corpus vocabulary — the
    * claim the frame-level [[merge]] cannot make.
    *
    * Protocol (the [[graft.queries.IrSql.mergeBm25Stats]] staged
    * commit, extended with a touched-file list because surgery
    * REPLACES files rather than appending):
    *  1. route the delta's grams against the store's per-file ranges
    *     (one narrow gram-column scan — O(files) driver state);
    *  2. build replacement rows = [[mergeLists]] over ONLY the
    *     touched files' rows (+ delta grams no file covers) and stage
    *     them, range-laid, into a hidden dir inside the store;
    *  3. COMMIT: write the marker file listing the touched part
    *     files, then delete those files, rename the staged parts in,
    *     clear the marker.
    * [[recoverCgMerge]] (run at every entry) rolls an uncommitted
    * attempt back (marker absent → delete staging) or completes a
    * committed one (marker present → staging is complete by
    * construction: delete any listed file still present, move staged
    * parts in, clear). Run behind the serving path's quiesce, as all
    * store maintenance. */
  def mergeIntoStore(spark: SparkSession, dir: String, delta: DataFrame,
                     k: Int = 3,
                     rowsPerFile: Long = InvertedIndex.WriteRowsPerFile)
      : Unit = {
    recoverCgMerge(spark, dir)
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    import graft.ops.Stage.StageOps
    val dLists = deltaLists(spark, delta, k).stage()
    // per-file gram ranges: a narrow scan of the gram column only
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("gram")).as("lo"), max(col("gram")).as("hi"))
    val routed = dLists.select(col("gram"))
      .join(broadcast(ranges),
        col("gram") >= col("lo") && col("gram") <= col("hi"),
        "left")
      .select(col("gram"), col("file"))
      .stage()
    val touchedFiles = routed.filter(col("file").isNotNull)
      .select(col("file")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    // delta grams covered by NO file open a new range; covered grams
    // rewrite their covering file — either way they are "relevant"
    // to the replacement region, and nothing else is
    val baseTouched =
      if (touchedFiles.isEmpty)
        spark.read.parquet(dir).limit(0)
      else spark.read.parquet(touchedFiles: _*)
    val replacement = mergeLists(baseTouched, dLists).stage()
    val staged = new Path(root, StagedDir)
    val nRep = math.max(1L,
      (replacement.count() + rowsPerFile - 1) / rowsPerFile).toInt
    replacement.repartitionByRange(nRep, col("gram"))
      .sortWithinPartitions("gram")
      .write.mode("overwrite").parquet(staged.toString)
    // COMMIT POINT: the marker records which files the swap replaces
    val out = fs.create(new Path(root, Marker), false)
    try out.write(touchedFiles.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    finishCgSwap(fs, root, touchedFiles)
  }

  /** Delete the replaced files, move the staged parts in, clear the
    * marker — each step idempotent, so a crash anywhere replays. */
  private def finishCgSwap(fs: org.apache.hadoop.fs.FileSystem,
                           root: Path, touched: Seq[String]): Unit = {
    touched.foreach { f => fs.delete(new Path(f), false); () }
    val staged = new Path(root, StagedDir)
    if (fs.exists(staged))
      fs.listStatus(staged)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .foreach { f =>
          require(fs.rename(f.getPath,
              new Path(root, f.getPath.getName)),
            s"rename ${f.getPath} -> $root failed mid-cg-swap")
        }
    fs.delete(staged, true)
    fs.delete(new Path(root, Marker), false)
    ()
  }

  /** Crash recovery for [[mergeIntoStore]]: marker ABSENT → any
    * staging dir is an uncommitted attempt, roll back by deleting it
    * (the store proper was never touched); marker PRESENT → the
    * staged replacement completed before the commit, so finish the
    * swap from the marker's touched-file list. Safe when no merge was
    * in flight. */
  def recoverCgMerge(spark: SparkSession, dir: String): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(root, Marker)
    if (!fs.exists(marker)) {
      fs.delete(new Path(root, StagedDir), true)
      ()
    } else {
      val in = fs.open(marker)
      val touched =
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").toSeq.filter(_.nonEmpty)
        finally in.close()
      finishCgSwap(fs, root, touched)
    }
  }

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
