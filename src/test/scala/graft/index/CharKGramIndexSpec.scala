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

  private def rows2(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("doc deletion == the vocabulary recount: the deleted store's " +
    "content equals a rebuild from the reduced corpus; terms whose " +
    "last doc left are wildcard-unreachable; shared terms survive; " +
    "replaying the delete is a no-op; untouched files byte-identical") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cg_docdel").toString
    // many small files so surgery has untouched files to spare
    CharKGramIndex.write(CharKGramIndex.build(spark, corpus), dir,
      rowsPerFile = 32L)
    val docTerms = CharKGramIndex.docTermsOf(spark, corpus)
    CharKGramIndex.writeVocabDf(spark, dir, docTerms)
    // victim: the doc with the FEWEST exclusive terms (≥1 — some term
    // must die for the fixture to prove anything; few, so their grams
    // leave part files untouched on this small corpus)
    val victim = docTerms.groupBy("term")
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("doc"))
      .filter(col("df") === 1)
      .groupBy(col("doc")).agg(count(lit(1)).as("nexcl"))
      .orderBy(col("nexcl"), col("doc")).head().getString(0)
    val deadDocTerms = docTerms.filter(col("doc_id") === victim)
    val preFiles = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.getName, f.getLen, f.getModificationTime))
      .sortBy(_._1).toSeq
    CharKGramIndex.deleteDocs(spark, dir, deadDocTerms)
    // == rebuild from the reduced corpus, row for row
    val rebuilt = CharKGramIndex.build(spark,
      corpus.filter(col("docid") =!= victim))
    assert(rows2(CharKGramIndex.load(spark, dir)) == rows2(rebuilt),
      "deleted store != vocabulary recount rebuild")
    // files not covering a dead term's grams stayed byte-identical
    val deadTerms = deadDocTerms.select("term")
      .join(docTerms.filter(col("doc_id") =!= victim).select("term"),
        Seq("term"), "left_anti")
    assert(deadTerms.count() > 0, "victim doc had no exclusive terms")
    val postFiles = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.getName, f.getLen, f.getModificationTime))
      .sortBy(_._1).toSeq
    val kept = postFiles.toSet.intersect(preFiles.toSet)
    assert(kept.nonEmpty, "every part file rewrote — no surgery")
    assert(postFiles.size < preFiles.size + 8,
      "unexpected file explosion")
    // replay: no-op (the deleted-docs sidecar guards it)
    val snapshot = rows2(CharKGramIndex.load(spark, dir))
    CharKGramIndex.deleteDocs(spark, dir, deadDocTerms)
    assert(rows2(CharKGramIndex.load(spark, dir)) == snapshot,
      "replaying the delete changed the store")
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.getName, f.getLen, f.getModificationTime))
      .sortBy(_._1).toSeq == postFiles,
      "replay rewrote files")
  }

  test("a frame-level full rewrite cannot leave a stale df sidecar: " +
    "write() over the store dir clears every sidecar (overwrite " +
    "deletes the whole dir), and deleteDocs then fails loudly until " +
    "writeVocabDf is re-run") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cg_stale").toString
    CharKGramIndex.write(CharKGramIndex.build(spark, corpus), dir)
    val docTerms = CharKGramIndex.docTermsOf(spark, corpus)
    CharKGramIndex.writeVocabDf(spark, dir, docTerms)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      dir, CharKGramIndex.VocabDfDir)))
    // the discouraged path: frame-level merge materialized by a full
    // write() over the same store dir (instead of mergeIntoStore)
    import spark.implicits._
    val delta = Seq(("DX1", "zyzzyva quagga")).toDF("docid", "content")
    val merged = CharKGramIndex.merge(spark,
      CharKGramIndex.load(spark, dir), delta)
    CharKGramIndex.write(merged, dir)
    // the sidecar did NOT survive to go stale — overwrite cleared it
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      dir, CharKGramIndex.VocabDfDir)),
      "full rewrite left the df sidecar behind (stale-df hazard)")
    // and the recount path refuses until a fresh sidecar is written
    intercept[IllegalStateException] {
      CharKGramIndex.deleteDocs(spark, dir,
        docTerms.limit(1))
    }
    CharKGramIndex.writeVocabDf(spark, dir, CharKGramIndex.docTermsOf(
      spark, corpus.unionByName(delta.withColumnRenamed("docid", "docid"))))
    CharKGramIndex.deleteDocs(spark, dir,
      CharKGramIndex.docTermsOf(spark, delta))
    // back on the maintained path: the delta doc's exclusive terms die
    assert(CharKGramIndex.load(spark, dir)
      .select(explode(col("terms")).as("t"))
      .filter(col("t") === "zyzzyva").count() == 0,
      "recount after re-seeding the sidecar missed the dead term")
  }

  test("df sidecar survives a store-level merge: a term whose only " +
    "doc arrived in the DELTA dies when that doc is deleted after " +
    "the merge") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cg_mergedel").toString
    val ids = corpus.select("docid").orderBy("docid").collect()
      .map(_.getString(0))
    val half = ids(ids.length / 2)
    val base = corpus.filter(col("docid") < half)
    val delta = corpus.filter(col("docid") >= half)
    CharKGramIndex.write(CharKGramIndex.build(spark, base), dir)
    CharKGramIndex.writeVocabDf(spark, dir,
      CharKGramIndex.docTermsOf(spark, base))
    CharKGramIndex.mergeIntoStore(spark, dir, delta)
    // df sidecar must now cover the merged corpus exactly
    val expectDf = CharKGramIndex.docTermsOf(spark, corpus)
      .groupBy("term").agg(count(lit(1)).as("df"))
    assert(rows2(spark.read.parquet(s"$dir/_graft_vocab_df"))
      == rows2(expectDf), "merge left the df sidecar stale")
    // delete a delta doc holding a delta-exclusive term
    val docTerms = CharKGramIndex.docTermsOf(spark, corpus)
    val deltaDocs = delta.select(col("docid")).collect()
      .map(_.getString(0)).toSet
    val exclusive = docTerms.groupBy("term")
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("doc"))
      .filter(col("df") === 1)
      .collect().filter(r => deltaDocs.contains(r.getString(2)))
    assert(exclusive.nonEmpty, "no delta-exclusive single-doc term")
    val victim = exclusive.minBy(_.getString(0)).getString(2)
    CharKGramIndex.deleteDocs(spark, dir,
      docTerms.filter(col("doc_id") === victim))
    val rebuilt = CharKGramIndex.build(spark,
      corpus.filter(col("docid") =!= victim))
    assert(rows2(CharKGramIndex.load(spark, dir)) == rows2(rebuilt),
      "post-merge delete != recount rebuild")
  }

  test("delete crash states: an uncommitted staged delete rolls " +
    "back (store, df, and replay guard untouched); a committed one " +
    "replays to completion") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cg_delcrash").toString
    CharKGramIndex.write(CharKGramIndex.build(spark, corpus), dir)
    val docTerms = CharKGramIndex.docTermsOf(spark, corpus)
    CharKGramIndex.writeVocabDf(spark, dir, docTerms)
    val pre = rows2(CharKGramIndex.load(spark, dir))
    val preDf = rows2(spark.read.parquet(s"$dir/_graft_vocab_df"))
    val victim = docTerms.groupBy("term")
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("doc"))
      .filter(col("df") === 1).orderBy("term").head().getString(2)
    val dead = docTerms.filter(col("doc_id") === victim)
    // A: stage sidecars but no marker → recovery rolls back
    import spark.implicits._
    Seq(("ghost", 1L)).toDF("term", "df").write
      .parquet(s"$dir/_graft_cg_new/_df")
    Seq(victim).toDF("doc_id").write
      .parquet(s"$dir/_graft_cg_new/_deleted")
    CharKGramIndex.recoverCgMerge(spark, dir)
    assert(rows2(CharKGramIndex.load(spark, dir)) == pre)
    assert(rows2(spark.read.parquet(s"$dir/_graft_vocab_df")) == preDf,
      "rollback leaked a staged df")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/_graft_deleted_docs")), "rollback leaked the guard batch")
    // B: a real delete, then REPLAY the finished state via recovery
    CharKGramIndex.deleteDocs(spark, dir, dead)
    val post = rows2(CharKGramIndex.load(spark, dir))
    CharKGramIndex.recoverCgMerge(spark, dir) // idle recovery: no-op
    assert(rows2(CharKGramIndex.load(spark, dir)) == post)
    // the guard batch exists and blocks the replay
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/_graft_deleted_docs")))
    CharKGramIndex.deleteDocs(spark, dir, dead)
    assert(rows2(CharKGramIndex.load(spark, dir)) == post)
  }

  test("updateDocs: update == rebuild over the updated corpus; born " +
    "terms wildcard-reachable; dead terms gone; untouched files " +
    "byte-identical; same-op replay is a no-op") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cg_upd").toString
    CharKGramIndex.write(CharKGramIndex.build(spark, corpus), dir,
      rowsPerFile = 32L)
    val docTerms = CharKGramIndex.docTermsOf(spark, corpus)
    CharKGramIndex.writeVocabDf(spark, dir, docTerms)
    // victim: a doc with at least one exclusive term (it must DIE
    // when the content is replaced outright)
    val victim = docTerms.groupBy("term")
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("doc"))
      .filter(col("df") === 1)
      .groupBy(col("doc")).agg(count(lit(1)).as("nexcl"))
      .orderBy(col("nexcl"), col("doc")).head().getString(0)
    val updatedCorpus = corpus.select(col("docid"),
      when(col("docid") === victim, lit("zzqborn shared"))
        .otherwise(col("content")).as("content"))
    val oldTerms = docTerms.filter(col("doc_id") === victim)
    val newTerms = CharKGramIndex.docTermsOf(spark,
      updatedCorpus.filter(col("docid") === victim))
    val preFiles = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.getName, f.getLen, f.getModificationTime))
      .sortBy(_._1).toSeq
    CharKGramIndex.updateDocs(spark, dir, "op-1", oldTerms, newTerms)
    val rebuilt = CharKGramIndex.build(spark, updatedCorpus)
    assert(rows2(CharKGramIndex.load(spark, dir)) == rows2(rebuilt),
      "updated store != rebuild over updated corpus")
    // the born term is wildcard-reachable through the updated store
    val hits = graft.query.QueryEngine.wildcardTerms(
      CharKGramIndex.load(spark, dir), "zz*orn")
      .collect().map(_.getString(0)).toSeq
    assert(hits == Seq("zzqborn"), s"born term unreachable: $hits")
    // surgery, not a rewrite: some files byte-identical
    val postFiles = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.getName, f.getLen, f.getModificationTime))
      .sortBy(_._1).toSeq
    assert(postFiles.toSet.intersect(preFiles.toSet).nonEmpty,
      "every part file rewrote - no surgery")
    // replaying the SAME operation id is a no-op
    val pre = rows2(CharKGramIndex.load(spark, dir))
    val preDf = rows2(spark.read.parquet(s"$dir/_graft_vocab_df"))
    CharKGramIndex.updateDocs(spark, dir, "op-1", oldTerms, newTerms)
    assert(rows2(CharKGramIndex.load(spark, dir)) == pre,
      "op replay changed the store")
    assert(rows2(spark.read.parquet(s"$dir/_graft_vocab_df")) == preDf,
      "op replay changed the df sidecar")
  }

  test("updateDocs un-deletes: updating a doc in the deleted ledger " +
    "re-admits it as a pure insert, and a LATER delete of the " +
    "re-added doc applies (the ledger was cleaned)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cg_undel").toString
    CharKGramIndex.write(CharKGramIndex.build(spark, corpus), dir,
      rowsPerFile = 32L)
    val docTerms = CharKGramIndex.docTermsOf(spark, corpus)
    CharKGramIndex.writeVocabDf(spark, dir, docTerms)
    val victim = docTerms.groupBy("term")
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("doc"))
      .filter(col("df") === 1)
      .groupBy(col("doc")).agg(count(lit(1)).as("nexcl"))
      .orderBy(col("nexcl").desc, col("doc")).head().getString(0)
    val victimTerms = docTerms.filter(col("doc_id") === victim)
    CharKGramIndex.deleteDocs(spark, dir, victimTerms)
    val reduced = corpus.filter(col("docid") =!= victim)
    assert(rows2(CharKGramIndex.load(spark, dir)) ==
      rows2(CharKGramIndex.build(spark, reduced)))
    // re-crawl the deleted doc with fresh content: the old terms
    // contribute no decrement (already out), the new ones insert
    val reborn = reduced.unionByName(
      corpus.filter(col("docid") === victim)
        .select(col("docid"), lit("zzqreborn shared").as("content")))
    val rebornTerms = CharKGramIndex.docTermsOf(spark,
      reborn.filter(col("docid") === victim))
    CharKGramIndex.updateDocs(spark, dir, "op-undel",
      victimTerms, rebornTerms)
    assert(rows2(CharKGramIndex.load(spark, dir)) ==
      rows2(CharKGramIndex.build(spark, reborn)),
      "un-delete update != rebuild over reborn corpus")
    // the re-added doc is deletable again (ledger cleaned)
    CharKGramIndex.deleteDocs(spark, dir, rebornTerms)
    assert(rows2(CharKGramIndex.load(spark, dir)) ==
      rows2(CharKGramIndex.build(spark, reduced)),
      "post-update delete of the re-added doc did not apply")
  }
}
