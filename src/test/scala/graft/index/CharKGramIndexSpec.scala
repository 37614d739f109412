package graft.index

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.corpus.TrecCorpus
import graft.query.QueryEngine

/** Pins the chargram table's incremental merge: merge == full rebuild
  * content-identically, terms new to the delta become wildcard-
  * REACHABLE (the gap the delta path closes), and untouched grams'
  * rows are carried through unchanged. */
class CharKGramIndexSpec extends SparkSpec {

  lazy val corpus =
    TrecCorpus.read(spark, resourcePath("/graft/sample-trec.xml"))

  test("merge == full rebuild, delta-only terms become wildcard-" +
    "reachable, untouched grams carry through unchanged") {
    val ids = corpus.select("docid").orderBy("docid").collect()
      .map(_.getString(0))
    val half = ids(ids.length / 2)
    val base = corpus.filter(col("docid") < half)
    val delta = corpus.filter(col("docid") >= half)
    val baseCg = CharKGramIndex.build(spark, base)
    val merged = CharKGramIndex.merge(spark, baseCg, delta)
    val rebuilt = CharKGramIndex.build(spark, corpus)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(merged) == rows(rebuilt), "merge != full rebuild")
    // a vocabulary term present ONLY in the delta half: unreachable
    // through the base table, reachable through the merged one
    val baseVocab = baseCg
      .select(explode(col("terms")).as("t")).distinct()
      .collect().map(_.getString(0)).toSet
    val deltaOnly = rebuilt
      .select(explode(col("terms")).as("t")).distinct()
      .collect().map(_.getString(0))
      .filterNot(baseVocab)
      .filter(_.length >= 4)
    assert(deltaOnly.nonEmpty, "fixture halves share the whole vocab")
    val probe = deltaOnly.minBy(t => (t.length, t))
    val pattern = probe.take(2) + "*" + probe.takeRight(2)
    assert(!QueryEngine.wildcardTerms(baseCg, pattern)
        .collect().map(_.getString(0)).contains(probe),
      s"'$probe' should be unknown to the base table")
    assert(QueryEngine.wildcardTerms(merged, pattern)
        .collect().map(_.getString(0)).contains(probe),
      s"'$probe' unreachable through the merged table")
    // untouched grams: rows identical to the base table's
    val touched = CharKGramIndex.grams(
        delta.select(explode(expr("graft_tokenize_raw(content)"))
          .as("term")).distinct(), k = 3)
      .select("gram").distinct()
      .collect().map(_.getString(0)).toSet
    val mergedUntouched = merged
      .filter(!col("gram").isin(touched.toSeq: _*))
    val baseUntouched = baseCg
      .filter(!col("gram").isin(touched.toSeq: _*))
    assert(rows(mergedUntouched) == rows(baseUntouched),
      "an untouched gram's row changed under merge")
  }

  private def fileState(dir: String): Map[String, (Long, Long)] =
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val crc = new java.util.zip.CRC32
        crc.update(java.nio.file.Files.readAllBytes(f.toPath))
        f.getName -> (f.length(), crc.getValue)
      }.toMap

  test("store-level merge rewrites ONLY the touched part files " +
    "(untouched files byte-identical); merged store == full rebuild; " +
    "wildcards reach delta-only terms; both crash states recover") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cg_store").toString + "/cg"
    // a bigger vocabulary than the sample corpus: the testdata docs
    // give the range layout several files, so surgery has something
    // to route around
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("string").as("docid"),
        col("text").as("content"))
    // a delta whose gram footprint is TINY relative to the store (two
    // docs of words unique to the delta, plus one shared word so a
    // touched gram also has a real union to compute)
    val delta = spark.createDataFrame(Seq(
      ("d1", "zzaqvex zzarwog data"),
      ("d2", "zzaqvex yyqondrel"))).toDF("docid", "content")
    val docs = base.unionByName(delta)
    CharKGramIndex.write(CharKGramIndex.build(spark, base), dir,
      rowsPerFile = 4L)
    val before = fileState(dir)
    assert(before.size > 3, s"fixture store has ${before.size} files — " +
      "surgery needs a multi-file range layout")
    CharKGramIndex.mergeIntoStore(spark, dir, delta, rowsPerFile = 4L)
    val after = fileState(dir)
    val untouchedNames = after.keySet.intersect(before.keySet)
    assert(untouchedNames.nonEmpty,
      "every part file was rewritten — surgery routed nothing around")
    untouchedNames.foreach { n =>
      assert(after(n) == before(n), s"untouched file $n changed bytes")
    }
    assert(after.keySet != before.keySet,
      "no file was replaced — the delta touched nothing?")
    // content == full rebuild (the merge==rebuild contract, now at
    // the STORE level)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val rebuilt = CharKGramIndex.build(spark, docs)
    assert(rows(CharKGramIndex.load(spark, dir)) == rows(rebuilt),
      "surgically-merged store != full rebuild")
    // wildcard reachability through the merged STORE
    val baseVocab = CharKGramIndex.build(spark, base)
      .select(explode(col("terms")).as("t")).distinct()
      .collect().map(_.getString(0)).toSet
    val deltaOnly = rebuilt.select(explode(col("terms")).as("t"))
      .distinct().collect().map(_.getString(0))
      .filterNot(baseVocab).filter(_.length >= 4)
    assert(deltaOnly.nonEmpty)
    val probe = deltaOnly.minBy(t => (t.length, t))
    val pattern = probe.take(2) + "*" + probe.takeRight(2)
    assert(QueryEngine.wildcardTerms(CharKGramIndex.load(spark, dir),
        pattern).collect().map(_.getString(0)).contains(probe),
      s"'$probe' unreachable through the surgically-merged store")
    // crash state A: staged replacement present, NO marker → rollback
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val staged = new org.apache.hadoop.fs.Path(dir, "_graft_cg_new")
    CharKGramIndex.load(spark, dir).limit(5)
      .write.parquet(staged.toString)
    val snapA = fileState(dir)
    CharKGramIndex.recoverCgMerge(spark, dir)
    assert(!fs.exists(staged), "uncommitted staging not rolled back")
    assert(fileState(dir) == snapA, "rollback touched the store proper")
    // crash state B: committed (marker present, listing one replaced
    // file) with complete staging → recovery finishes the swap
    val victim = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val victimRows = spark.read.parquet(victim.getPath)
    victimRows.write.parquet(staged.toString) // "replacement" = same rows
    val out = fs.create(
      new org.apache.hadoop.fs.Path(dir, "_graft_cg_inflight"), false)
    out.write(victim.getPath.getBytes("UTF-8")); out.close()
    CharKGramIndex.recoverCgMerge(spark, dir)
    assert(!fs.exists(staged) && !fs.exists(
      new org.apache.hadoop.fs.Path(dir, "_graft_cg_inflight")))
    assert(rows(CharKGramIndex.load(spark, dir)) == rows(rebuilt),
      "crash recovery changed the store's content")
  }
}
