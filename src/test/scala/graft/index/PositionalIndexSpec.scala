package graft.index

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Positional index: known-position phrase/proximity semantics on a
  * constructed corpus, and full-corpus parity of the index paths
  * against the index-free brute evaluations the goldens come from. */
class PositionalIndexSpec extends SparkSpec {

  private lazy val ix = {
    val corpus = spark.createDataFrame(Seq(
      ("A", "alpha beta gamma alpha beta delta"),
      ("B", "gamma delta gamma"),
      ("C", "beta alpha beta"))).toDF("docid", "content")
    PositionalIndex.build(spark, corpus)
  }

  private def phraseHits(q: String): Map[String, Long] =
    PositionalIndex.phrase(ix, q).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("postings carry sorted occurrence positions") {
    val rows = ix.postings.collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getSeq[Int](2).toList, r.getLong(3)))
    val byTerm = rows.groupBy(_._1)
    // doc A is docno of "A" — resolve through the map
    val docnoA = ix.docMap.filter(col("docid") === "A")
      .head().getAs[Long]("docno")
    val alphaA = byTerm("alpha").find(_._2 == docnoA).get
    assert(alphaA._3 == List(0, 3) && alphaA._4 == 2L)
    rows.foreach { case (_, _, ps, tf) =>
      assert(ps == ps.sorted && ps.size == tf)
    }
  }

  test("phrase intersection counts every occurrence, at any length") {
    assert(phraseHits("alpha beta") == Map("A" -> 2L, "C" -> 1L))
    assert(phraseHits("beta gamma") == Map("A" -> 1L))
    assert(phraseHits("alpha beta delta") == Map("A" -> 1L))
    assert(phraseHits("delta alpha").isEmpty)
  }

  test("a single-term phrase degenerates to the term's tf") {
    val hits = phraseHits("alpha")
    assert(hits == Map("A" -> 2L, "C" -> 1L))
    // cross-check against the raw postings
    val docnoToId = ix.docMap.collect()
      .map(r => r.getAs[Long]("docno") -> r.getAs[String]("docid")).toMap
    val tfs = ix.postings.filter(col("term") === "alpha").collect()
      .map(r => docnoToId(r.getAs[Long]("docno")) -> r.getAs[Long]("tf"))
      .toMap
    assert(hits == tfs)
  }

  test("wildcard phrase composes char-gram expansion with position intersection") {
    val corpus = spark.createDataFrame(Seq(
      ("A", "alpha beta gamma alpha beta delta"),
      ("B", "gamma delta gamma"),
      ("C", "beta alpha beta"))).toDF("docid", "content")
    val cg = CharKGramIndex.build(spark, corpus, k = 3)
    def wild(q: String): Map[String, Long] =
      PositionalIndex.phraseWildcard(ix, cg, q).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // "*ta" expands to {beta, delta}: disjunctive second slot
    assert(wild("alpha *ta") == Map("A" -> 2L, "C" -> 1L))
    // wildcard in the FIRST slot: beta|delta followed by gamma
    assert(wild("*ta gamma") == Map("A" -> 1L, "B" -> 1L))
    // no wildcard degenerates to the exact phrase path
    assert(wild("alpha beta") == phraseHits("alpha beta"))
    // an expansion matching nothing yields no hits
    assert(wild("zz* alpha").isEmpty)
  }

  test("proximity respects the window bound in either order") {
    def near(a: String, b: String, w: Int): Set[String] =
      PositionalIndex.near(ix, a, b, w).collect()
        .map(_.getString(0)).toSet
    assert(near("alpha", "delta", 2) == Set("A"))
    assert(near("alpha", "delta", 1) == Set.empty[String])
    assert(near("gamma", "delta", 1) == Set("B"))
    assert(near("gamma", "delta", 3) == Set("A", "B"))
  }

  test("ordered proximity keeps only forward matches and is a subset " +
    "of unordered") {
    def ord(a: String, b: String, w: Int): Set[String] =
      PositionalIndex.nearOrdered(ix, a, b, w).collect()
        .map(_.getString(0)).toSet
    // doc B = "gamma delta gamma": delta AFTER gamma at gap 1, and
    // gamma AFTER delta at gap 1 — both directions hit
    assert(ord("gamma", "delta", 1) == Set("B"))
    assert(ord("delta", "gamma", 1) == Set("B"))
    // doc A: delta (5) is after gamma (2) at gap 3 — only one direction
    assert(ord("gamma", "delta", 3) == Set("A", "B"))
    assert(ord("delta", "gamma", 3) == Set("B"))
    val un = PositionalIndex.near(ix, "gamma", "delta", 3).collect()
      .map(_.getString(0)).toSet
    assert(ord("gamma", "delta", 3).subsetOf(un))
  }

  test("snippets window the reconstructed token stream, clamped at edges") {
    def snips(q: String, ctx: Int): Map[String, (Long, String)] =
      PositionalIndex.snippet(ix, q, ctx).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    // doc A tokens: alpha beta gamma alpha beta delta
    val s = snips("beta gamma", 1)
    assert(s("A") == ((1L, "alpha beta gamma alpha")))
    // left edge clamps: phrase at pos 0
    val s2 = snips("alpha beta", 1)
    assert(s2("A") == ((0L, "alpha beta gamma")))
    assert(s2("C") == ((1L, "beta alpha beta"))) // right edge clamps
  }

  test("merge of a split corpus == full rebuild; write/load round-trips") {
    val full = spark.createDataFrame(Seq(
      ("A", "alpha beta gamma alpha beta delta"),
      ("B", "gamma delta gamma"),
      ("C", "beta alpha beta"),
      ("D", "alpha beta epsilon"))).toDF("docid", "content")
    val basePart = full.filter(col("docid") < "C")
    val deltaPart = full.filter(col("docid") >= "C")
    val merged = PositionalIndex.merge(spark,
      PositionalIndex.build(spark, basePart), deltaPart)
    val rebuilt = PositionalIndex.build(spark, full)
    def hits(ix: PositionalIndex.PIndex): Map[String, Long] =
      PositionalIndex.phrase(ix, "alpha beta").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.nDocs == rebuilt.nDocs)
    assert(hits(merged) == hits(rebuilt))
    assert(hits(merged) == Map("A" -> 2L, "C" -> 1L, "D" -> 1L))
    val tmp = java.nio.file.Files.createTempDirectory("pos_ix").toString
    PositionalIndex.write(merged, tmp)
    val loaded = PositionalIndex.load(spark, tmp)
    assert(hits(loaded) == hits(merged) && loaded.nDocs == merged.nDocs)
  }

  test("varint gap codec round-trips sorted position lists exactly") {
    import spark.implicits._
    val cases = Seq(Seq(0), Seq(5), Seq(0, 1, 2, 3), Seq(7, 7 + 127),
      Seq(1, 200, 16500, 2000000), Seq.range(0, 300), Seq.empty[Int])
    val got = cases.toDF("ps")
      .select(PositionalIndex.posDec(
        PositionalIndex.posEnc(col("ps"))).as("rt"))
      .as[Seq[Int]].collect().toSeq
    assert(got == cases)
  }

  test("compressed layout: load decodes to the identical postings and " +
    "every query path agrees") {
    val dirSrc = "/root/testdata/sf0.001"
    val full = graft.queries.IrEngine.corpus(spark, dirSrc).limit(120)
    val built = PositionalIndex.build(spark, full)
    val plain = java.nio.file.Files.createTempDirectory("pos_p").toString
    val comp = java.nio.file.Files.createTempDirectory("pos_z").toString
    PositionalIndex.write(built, plain)
    PositionalIndex.write(built, comp, compressed = true)
    val lp = PositionalIndex.load(spark, plain)
    val lz = PositionalIndex.load(spark, comp)
    // postings identical row for row after decode
    assert(lz.postings.exceptAll(lp.postings).isEmpty &&
      lp.postings.exceptAll(lz.postings).isEmpty)
    // phrase + proximity identical through the compressed path
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m(PositionalIndex.phrase(lz, "hash join")) ==
      m(PositionalIndex.phrase(lp, "hash join")))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("docid").collect().map(_.getString(0)).toSet
    assert(ids(PositionalIndex.near(lz, "hash", "join", 3)) ==
      ids(PositionalIndex.near(lp, "hash", "join", 3)))
    // size is corpus-shaped and measured, not asserted: PosSizeProf
    // found parquet-native encodings BEAT the varint blob on this
    // corpus's short position lists (see posEnc's scaladoc)
  }

  test("streamed positional ingest: cumulative merge == full rebuild") {
    import java.nio.file.Files
    val full = spark.createDataFrame(Seq(
      ("A", "alpha beta gamma alpha beta delta"),
      ("B", "gamma delta gamma"),
      ("C", "beta alpha beta"),
      ("D", "alpha beta epsilon"))).toDF("docid", "content")
    val ingest = Files.createTempDirectory("pos_stream").toString
    Seq(full.filter(col("docid") < "C"), full.filter(col("docid") >= "C"))
      .zipWithIndex.foreach { case (chunk, i) =>
        val tmp = Files.createTempDirectory(s"pos_chunk$i")
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val ls = Files.list(tmp)
        val part =
          try ls.filter(_.toString.endsWith(".parquet")).findFirst().get()
          finally ls.close()
        val dst = java.nio.file.Paths.get(ingest, s"chunk-$i.parquet")
        Files.move(part, dst)
        // deterministic batch order for the file source
        dst.toFile.setLastModified(1000000000000L + i * 60000L)
        ()
      }
    // UDFs must exist before the micro-batch engine clones the session
    graft.text.TextPipeline.register(spark)
    var streamed: PositionalIndex.PIndex = null
    val q = spark.readStream
      .schema("docid STRING, content STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(ingest)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val bs = batch.sparkSession
        streamed =
          if (streamed == null) PositionalIndex.build(bs, batch)
          else PositionalIndex.merge(bs, streamed, batch)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    def hits(ix: PositionalIndex.PIndex): Map[String, Long] =
      PositionalIndex.phrase(ix, "alpha beta").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rebuilt = PositionalIndex.build(spark, full)
    assert(streamed != null && streamed.nDocs == rebuilt.nDocs)
    assert(hits(streamed) == hits(rebuilt))
  }

  test("index phrase/proximity == brute full-scan on the test corpus") {
    val dir = "/root/testdata/sf0.001"
    import graft.queries.IrEngine
    val idx = IrEngine.q36Phrase(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val brute = IrEngine.q36PhraseBrute(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(idx == brute)
    val idxN = IrEngine.q36Near(spark, dir).collect()
      .map(_.getString(0)).toSet
    val bruteN = IrEngine.q36NearBrute(spark, dir).collect()
      .map(_.getString(0)).toSet
    assert(idxN == bruteN && idxN.nonEmpty)
  }
}
