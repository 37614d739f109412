package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The Stage cut-point contract: (a) mode is purely an ops decision —
  * `reliable` (recoverable checkpoint files) produces exactly the
  * `local` results; (b) staged ops leave NO CacheManager entry behind
  * (the lifecycle bug persist() had: no release point for a cache an
  * already-returned frame reads). */
class StageSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("reliable mode produces identical results and writes " +
    "recoverable checkpoint files") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    // a representative pipeline crossing several staged cut-points
    // (shingle sets + prefix table in jaccardStages)
    val local = rows(Dedup.jaccard(spark, dir, threshold = 0.5))
    assert(local.nonEmpty)
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft_stage_reliable")
    try {
      spark.conf.set(Stage.ModeKey, "reliable")
      spark.conf.set(Stage.DirKey, ckptDir.toString)
      val reliable = rows(Dedup.jaccard(spark, dir, threshold = 0.5))
      assert(reliable == local)
      // the cut really went through reliable storage: checkpoint
      // partition files exist under the configured dir
      val wk = java.nio.file.Files.walk(ckptDir)
      val files =
        try wk.filter(java.nio.file.Files.isRegularFile(_)).count()
        finally wk.close()
      assert(files > 0, "reliable mode wrote no checkpoint files")
    } finally {
      spark.conf.unset(Stage.ModeKey)
      spark.conf.unset(Stage.DirKey)
      val wk = java.nio.file.Files.walk(ckptDir)
      try wk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally wk.close()
    }
  }

  test("unknown mode fails loudly") {
    try {
      spark.conf.set(Stage.ModeKey, "bogus")
      val e = intercept[IllegalArgumentException] {
        Stage.cut(graft.Tables.load(spark, dir, "documents"), eager = false)
      }
      assert(e.getMessage.contains("bogus"))
    } finally spark.conf.unset(Stage.ModeKey)
  }

  test("staged TextAnalysis ops leave no CacheManager entry behind") {
    val cm = spark.sharedState.cacheManager
    cm.clearCache()
    assert(cm.isEmpty)
    // each op stages a shared subtree internally; invoking and fully
    // consuming each twice must leave the cache registry empty — a
    // persist() with no release point would accumulate an entry per
    // invocation for the session lifetime
    (1 to 2).foreach { _ =>
      assert(TextAnalysis.repetition(spark, dir).count() > 0)
      assert(TextAnalysis.contamination(spark, dir).count() > 0)
      assert(TextAnalysis.packSequences(spark, dir).count() > 0)
    }
    assert(cm.isEmpty,
      "a TextAnalysis op pinned a CacheManager entry with no release point")
  }
}
