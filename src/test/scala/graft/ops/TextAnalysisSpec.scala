package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("partitioned corpus sink prunes partitions and bounds files") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_corpus").toString
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "lang", "text")
    TextAnalysis.writeCorpus(docs, out)

    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())

    // reading one language must touch only its partition directory
    val en = back.filter(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("lang"), s"no partition pruning in:\n$plan")
    assert(en.count() == docs.filter(col("lang") === "en").count())

    // file count per partition is bounded by the repartition subkey
    val langDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
    assert(langDirs.nonEmpty)
    langDirs.foreach { d =>
      val parts = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(parts >= 1 && parts <= 4,
        s"${d.getName}: $parts files (expected 1..4)")
    }
  }

  test("compaction collapses a fragmented directory without changing " +
    "its rows") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_compact").toString
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text")
    // fragment: one file per of 64 partitions
    docs.repartition(64).write.mode("overwrite").parquet(out)
    def files() = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files() == 64)
    val before = docs.collect().map(_.getLong(0)).sorted.toSeq
    TextAnalysis.compact(spark, out)
    assert(files() < 8, s"still ${files()} files")
    val after = spark.read.parquet(out)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after == before)
  }

  test("hash-bucket sample keeps roughly keep/buckets of the corpus") {
    val total = graft.Tables.load(spark, dir, "documents").count().toDouble
    val kept = TextAnalysis.sampleByHash(spark, dir).count().toDouble
    val frac = kept / total
    // 3 of 10 buckets; the polynomial hash should spread text uniformly
    assert(frac > 0.15 && frac < 0.45, s"sample fraction $frac")
  }
}
