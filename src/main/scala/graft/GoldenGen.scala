package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Generates the committed golden parquet files for the faithful-IR
  * queries whose semantics (tag tokenizer → Terrier stopwords → Porter2
  * stem) are not SQL-expressible, so DuckDB cannot recompute them from
  * the raw tables. The generator itself is proven by the conformance
  * specs: 530 reference-generated tokenizer vectors
  * (`TextPipelineSpec`) and 38k stemmer vectors (`PorterStemmerSpec`)
  * pin the pipeline to the reference implementation, so its sf0.01
  * output is a legitimate fixed oracle; the driver's DuckDB check then
  * reads the golden with a plain parquet scan (`oracleSql`) and
  * hash-compares as usual.
  *
  * Regenerate (only after an intentional pipeline change):
  *   sbt "runMain graft.GoldenGen /root/testdata/sf0.01 /root/repo/golden"
  */
object GoldenGen {

  /** The queries with committed goldens — keep in sync with the
    * `golden/…` entries in [[SparkEntry.oracleSql]]. */
  val Names: Seq[String] =
    Seq("q26_ir_terms", "q26_ir_index", "q26_ir_search", "q26_ir_rm3",
      "q26_ir_wildcard",
      "q35_rewrite_wildcard", "q36_phrase", "q36_near",
      "q36_near_ordered", "q36_near_topk", "q36_snippet",
      "q36_phrase_wildcard", "q36_phrase_deleted",
      "q26_ir_search_deleted", "q36_phrase_updated",
      "q26_ir_search_updated")

  /** Golden generators. Most goldens come from the query itself (the
    * pipeline is vector-pinned by the conformance specs); the rewrite
    * query's golden deliberately comes from the UN-rewritten fallback
    * path, so the driver compare proves rewritten == fallback. */
  private def gen(name: String): (SparkSession, String) =>
      org.apache.spark.sql.DataFrame =
    if (name == "q35_rewrite_wildcard")
      (s, d) => graft.queries.IrEngine.q35Fallback(s, d)
    else if (name == "q36_phrase")
      (s, d) => graft.queries.IrEngine.q36PhraseBrute(s, d)
    else if (name == "q36_phrase_deleted")
      (s, d) => graft.queries.IrEngine.q36PhraseDeletedBrute(s, d)
    else if (name == "q26_ir_search_deleted")
      (s, d) => graft.queries.IrEngine.q26SearchDeletedBrute(s, d)
    else if (name == "q36_phrase_updated")
      (s, d) => graft.queries.IrEngine.q36PhraseUpdatedBrute(s, d)
    else if (name == "q26_ir_search_updated")
      (s, d) => graft.queries.IrEngine.q26SearchUpdatedBrute(s, d)
    else if (name == "q36_near")
      (s, d) => graft.queries.IrEngine.q36NearBrute(s, d)
    else if (name == "q36_near_ordered")
      (s, d) => graft.queries.IrEngine.q36NearOrderedBrute(s, d)
    else if (name == "q36_near_topk")
      (s, d) => graft.queries.IrEngine.q36NearTopKBrute(s, d)
    else if (name == "q36_snippet")
      (s, d) => graft.queries.IrEngine.q36SnippetBrute(s, d)
    else if (name == "q36_phrase_wildcard")
      (s, d) => graft.queries.IrEngine.q36PhraseWildcardBrute(s, d)
    else SparkEntry.queries(name)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = if (args.length > 1) args(1) else "/root/repo/golden"
    // optional trailing names: regenerate only that subset (a new
    // query's golden shouldn't force rewriting every committed one)
    val subset = args.drop(2).toSet
    val unknown = subset -- Names.toSet
    require(unknown.isEmpty, s"unknown goldens: ${unknown.mkString(", ")}")
    val selected = if (subset.isEmpty) Names else Names.filter(subset)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    selected.foreach { name =>
      val tmp = Files.createTempDirectory(s"golden_$name")
      gen(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString
        .matches("part-.*\\.parquet")).findFirst().get()
      Files.move(part, Paths.get(outDir, s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      println(s"[golden] wrote $outDir/$name.parquet")
    }
    spark.stop()
  }
}
