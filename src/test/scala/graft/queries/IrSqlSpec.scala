package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IrSqlSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("wildcard with only short segments falls back to LIKE over the " +
    "whole vocabulary instead of an empty gram intersection") {
    // both anchored segments of s*m are shorter than k=3 → no grams
    val got = IrSql.q09Wildcard(spark, dir, pattern = "s*m")
      .collect().map(_.getString(0)).toSeq
    val expected = IrSql.q08CharGrams(spark, dir)
      .select("term").distinct()
      .filter(col("term").like("s%m"))
      .orderBy("term")
      .collect().map(_.getString(0)).toSeq
    assert(expected.nonEmpty, "test vocabulary should contain s…m terms")
    assert(got == expected)
  }

  test("gram-filtered wildcard path still agrees with a plain LIKE scan") {
    val got = IrSql.q09Wildcard(spark, dir, pattern = "st*am")
      .collect().map(_.getString(0)).toSeq
    val expected = IrSql.q08CharGrams(spark, dir)
      .select("term").distinct()
      .filter(col("term").like("st%am"))
      .orderBy("term")
      .collect().map(_.getString(0)).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("IR eval battery: one row per query term, metrics in [0,1], " +
    "MRR/recall consistent with a driver recompute of the ranking") {
    val got = IrSql.q39IrEval(spark, dir).collect()
    assert(got.map(_.getString(0)).toSeq == IrSql.EvalQueryTerms.sorted)
    got.foreach { r =>
      val (nRel, rec, mrr, ndcg) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(nRel > 0)
      Seq(rec, mrr, ndcg).foreach(m => assert(m >= 0.0 && m <= 1.0,
        s"${r.getString(0)}: metric out of range: $r"))
      // recall@10 can't exceed 10/n_rel
      assert(rec <= math.rint(10.0 / nRel * 1e4) / 1e4 + 1e-9)
    }
    // driver recompute of MRR and recall for one term from the raw
    // tf table (independent of the engine's heap/window machinery)
    val term = IrSql.EvalQueryTerms.head
    val tf = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        explode(graft.ops.CrossHash.tokensArray(col("text"))).as("t"))
      .filter(col("t") === term)
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = graft.Tables.load(spark, dir, "documents").count().toDouble
    val df = tf.size.toDouble
    def score(c: Long): Double =
      math.rint((1.0 + math.log(c)) * math.log10(n / df) * 1e4) / 1e4
    val top = tf.toSeq.map { case (d, c) => (d, score(c)) }
      .sortBy { case (d, s) => (-s, d) }.take(10).map(_._1)
    val rel = tf.filter(_._2 >= IrSql.EvalRelMinTf).keySet
    val wantRec = math.rint(
      top.count(rel.contains).toDouble / rel.size * 1e4) / 1e4
    val firstRel = top.zipWithIndex.collectFirst {
      case (d, i) if rel.contains(d) => 1.0 / (i + 1) }.getOrElse(0.0)
    val row = got.find(_.getString(0) == term).get
    assert(row.getDouble(2) == wantRec, s"recall: ${row.getDouble(2)} != $wantRec")
    assert(row.getDouble(3) == math.rint(firstRel * 1e4) / 1e4)
    // per-query top-k rides the bounded heap
    val plan = IrSql.q39IrEval(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no bounded heap:\n$plan")
  }

  test("bm25 stats store rebuilds when the corpus at a path changes " +
    "(cache keys on content stamp, not path)") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_bm25_mut").toString
    def writeCorpus(bound: Long): Unit =
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") < bound)
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def top(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    writeCorpus(400)
    val first = top(IrSql.q10Bm25Pruned(spark, tmp))
    assert(first == top(IrSql.q10Bm25Multi(spark, tmp)))
    writeCorpus(200)
    val second = top(IrSql.q10Bm25Pruned(spark, tmp))
    // the full scorer recomputes from text every call — if the pruned
    // path still matches it after the rewrite, the store was rebuilt
    assert(second == top(IrSql.q10Bm25Multi(spark, tmp)),
      "pruned path served the stale pre-rewrite store")
    assert(first != second, "fixture must change the ranking")
  }

  test("maxScoreEssential: -inf keeps all terms, a huge threshold " +
    "keeps only the top term, the tail sum stops strictly below") {
    val imps = Seq("a" -> 5.0, "b" -> 1.0, "c" -> 0.5, "d" -> 0.4)
    assert(IrSql.maxScoreEssential(imps, Double.NegativeInfinity) ==
      Seq("a", "b", "c", "d"))
    assert(IrSql.maxScoreEssential(imps, 100.0) == Seq("a"))
    // tail d+c = 0.9 < 1.0 but +b = 1.9 ≥ 1.0 → b stays essential
    assert(IrSql.maxScoreEssential(imps, 1.0) == Seq("a", "b"))
  }

  test("MaxScore-pruned BM25 == full multi-term ranking, pruning " +
    "engages on this corpus, and the bound argument verifies") {
    val multi = IrSql.q10Bm25Multi(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val pruned = IrSql.q10Bm25Pruned(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(multi.size == 10)
    assert(pruned == multi, "pruned ranking diverged from full scorer")

    // driver recompute of the index-time stats from raw tokens
    val k1 = IrSql.Bm25K1; val b = IrSql.Bm25B
    val toks = IrSql.tokens(spark, dir).select("doc_id", "term")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val dl = toks.groupBy(_._1).map { case (d, xs) => d -> xs.length }
    val tt = dl.values.map(_.toLong).sum.toDouble
    val nd = dl.size.toDouble
    val terms = IrSql.ExpandedQueryTerms
    val tf = toks.filter(t => terms.contains(t._2))
      .groupBy(identity).map { case ((d, t), xs) => (t, d, xs.length) }
      .toSeq
    val dfm = tf.groupBy(_._1).map { case (t, xs) => t -> xs.size }
    def s(t: String, d: Long, c: Int): Double =
      math.log((nd - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0) *
        (c * (k1 + 1)) /
        (c + k1 * ((1 - b) + b * dl(d) / (tt / nd)))
    val byDesc = terms
      .map(t => t -> tf.filter(_._1 == t).map(x => s(t, x._2, x._3)).max)
      .sortBy { case (t, i) => (-i, t) }
    val thetaTop = tf.filter(_._1 == byDesc.head._1)
      .map(x => (s(byDesc.head._1, x._2, x._3), x._2))
      .sortBy { case (sc, d) => (-sc, d) }.take(10)
    val theta =
      if (thetaTop.size < 10) Double.NegativeInfinity
      else thetaTop.last._1
    val ess = IrSql.maxScoreEssential(byDesc, theta)
    assert(ess.size < terms.size,
      s"pruning should engage here (essential = $ess)")
    // safety: every doc holding NO essential term scores strictly
    // below θ — the docs the pruned plan never reads cannot place
    val essSet = ess.toSet
    val byDoc = tf.groupBy(_._2)
    val excluded = byDoc.filter { case (_, xs) =>
      !xs.exists(x => essSet(x._1)) }
    assert(excluded.nonEmpty, "some docs should actually be pruned")
    excluded.foreach { case (d, xs) =>
      val full = xs.map(x => s(x._1, d, x._3)).sum
      assert(full < theta, s"doc $d bound violated: $full >= $theta")
    }
  }

  test("maxScoreEssential keeps a term whose tail bound sits inside " +
    "the ThetaEps quantization margin") {
    val imps = Seq("a" -> 5.0, "b" -> 1.0)
    // tail b = 1.0 is below θ but within ε of it: a doc holding only b
    // could round into a tie with the kept k-th — b must stay essential
    assert(IrSql.maxScoreEssential(imps, 1.0 + 1e-5) == Seq("a", "b"))
    // comfortably past the margin the tail prunes as before
    assert(IrSql.maxScoreEssential(imps, 1.0 + 1e-3) == Seq("a"))
  }

  test("driver bm25Score == the bm25S column expression, value for " +
    "value, over a (tf, dl, df) grid") {
    import spark.implicits._
    val grid = for {
      tf <- Seq(1L, 2L, 7L, 40L)
      dl <- Seq(5L, 60L, 400L)
      df <- Seq(1L, 13L, 90L)
    } yield (tf, dl, df, 12345L, 100L)
    val fromCol = grid.toDF("tf", "dl", "df", "tt", "nd")
      .select(col("tf"), col("dl"), col("df"),
        IrSql.bm25SForSpec.as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3))
      .toMap
    grid.foreach { case (tf, dl, df, tt, nd) =>
      assert(IrSql.bm25Score(tf, dl, df, tt, nd) == fromCol((tf, dl, df)),
        s"driver/column divergence at tf=$tf dl=$dl df=$df")
    }
  }

  test("bm25 stats-store incremental merge == full rebuild, content-" +
    "identical on every artifact; the merged store serves the exact " +
    "unpruned ranking; repair reconstructs the derived artifacts") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bm25_merge").toString
    val full = spark.read.parquet(s"$dir/documents.parquet")
    val half = full.count() / 2
    full.filter(col("doc_id") < half)
      .write.mode("overwrite").parquet(s"$root/base/documents.parquet")
    // rebuilt-from-everything reference store
    val fullStore = s"$root/store_full"
    IrSql.writeBm25Stats(spark, dir, fullStore)
    // base store + delta merge
    val mergedStore = s"$root/store_merged"
    IrSql.writeBm25Stats(spark, s"$root/base", mergedStore)
    IrSql.mergeBm25Stats(spark, mergedStore,
      full.filter(col("doc_id") >= half).select("doc_id", "text"))
    def rows(store: String, art: String): Seq[String] =
      spark.read.parquet(s"$store/$art").collect()
        .map(_.toString).sorted.toSeq
    Seq("postings", "doclen", "corpus", "stats").foreach { art =>
      assert(rows(fullStore, art) == rows(mergedStore, art),
        s"merge != rebuild on $art")
    }
    // the merged store answers the exact unpruned ranking
    def top(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(IrSql.q10Bm25PrunedAt(spark, mergedStore,
        IrSql.ExpandedQueryTerms, 10)) ==
      top(IrSql.q10Bm25Multi(spark, dir)))
    // disjointness guard: re-merging the same delta must refuse
    intercept[IllegalArgumentException] {
      IrSql.mergeBm25Stats(spark, mergedStore,
        full.filter(col("doc_id") >= half).select("doc_id", "text"))
    }
    // repair: wipe the derived artifacts, reconstruct from
    // postings+doclen, compare against the rebuilt reference
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$mergedStore/stats"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$mergedStore/corpus"), true)
    IrSql.repairBm25Stats(spark, mergedStore)
    Seq("corpus", "stats").foreach { art =>
      assert(rows(fullStore, art) == rows(mergedStore, art),
        s"repair != rebuild on $art")
    }
  }

  test("bm25 store compaction: repeated merges fragment the postings " +
    "layout, compaction restores one global range layout with results " +
    "unchanged, and both mid-swap crash states recover") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bm25_compact").toString
    val full = spark.read.parquet(s"$dir/documents.parquet")
    val n = full.count()
    full.filter(col("doc_id") < n / 2)
      .write.mode("overwrite").parquet(s"$root/base/documents.parquet")
    val store = s"$root/store"
    IrSql.writeBm25Stats(spark, s"$root/base", store)
    IrSql.mergeBm25Stats(spark, store,
      full.filter(col("doc_id") >= n / 2 && col("doc_id") < 3 * n / 4)
        .select("doc_id", "text"))
    IrSql.mergeBm25Stats(spark, store,
      full.filter(col("doc_id") >= 3 * n / 4).select("doc_id", "text"))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def files(name: String): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$store/$name"))
        .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    def top(): Seq[(Long, Double)] =
      IrSql.q10Bm25PrunedAt(spark, store, IrSql.ExpandedQueryTerms, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val before = files("postings")
    val want = top()
    assert(want == IrSql.q10Bm25Multi(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // force compaction with a bound below the merged file count
    val rewritten = IrSql.compactBm25Store(spark, store,
      maxFiles = math.max(1, before - 1))
    assert(rewritten >= 1, s"compaction did not trigger (files=$before)")
    assert(files("postings") < before, "postings not consolidated")
    assert(top() == want, "compaction changed the ranking")
    // crash state A: between swap steps 2 and 3 with a COMPLETE new
    // dir — recovery must finish the swap
    val p = new org.apache.hadoop.fs.Path(s"$store/postings")
    val neu = new org.apache.hadoop.fs.Path(s"$store/_graft_new_postings")
    val old = new org.apache.hadoop.fs.Path(s"$store/_graft_old_postings")
    spark.read.parquet(p.toString).write.parquet(neu.toString)
    fs.rename(p, old)
    IrSql.recoverArtifact(spark, store, "postings")
    assert(fs.exists(p) && !fs.exists(neu) && !fs.exists(old))
    assert(top() == want, "recovery (finish) lost rows")
    // crash state B: same point but the new dir is INCOMPLETE (no
    // _SUCCESS) — recovery must roll the old layout back
    spark.read.parquet(p.toString).write.parquet(neu.toString)
    fs.delete(new org.apache.hadoop.fs.Path(neu, "_SUCCESS"), false)
    fs.rename(p, old)
    IrSql.recoverArtifact(spark, store, "postings")
    assert(fs.exists(p) && !fs.exists(neu) && !fs.exists(old))
    assert(top() == want, "recovery (rollback) lost rows")
  }

  test("batch bm25: each qid's ranking equals the standalone " +
    "multi-term scorer on the same terms (qid 4 IS the expanded set)") {
    val batch = IrSql.q10Bm25Batch(spark, dir).collect()
      .groupBy(_.getLong(0))
    assert(batch.keySet == IrSql.BatchQueries.map(_._1).toSet)
    IrSql.BatchQueries.foreach { case (qid, terms) =>
      val want = IrSql.q10Bm25Multi(spark, dir, terms).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = batch(qid).sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getDouble(3))).toSeq
      assert(got == want, s"qid=$qid: batch != standalone multi")
      // ranks dense from 1
      assert(batch(qid).map(_.getLong(1)).sorted.toSeq ==
        (1L to batch(qid).length))
    }
    // the whole batch rides ONE postings scan: the heap aggregate is
    // present and no window exec ranks the scored space
    val plan = IrSql.q10Bm25Batch(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no bounded heap:\n$plan")
    assert(!plan.contains("Window"), s"window exec leaked:\n$plan")
    // the store-served batch answers identically (df from the stats
    // store, stats from the corpus artifact — never a corpus rescan)
    assert(IrSql.q10Bm25BatchStored(spark, dir).collect()
        .map(_.toSeq).toSeq ==
      IrSql.q10Bm25Batch(spark, dir).collect().map(_.toSeq).toSeq,
      "stored batch != corpus batch")
  }

  test("bm25 merge crash states: an UNCOMMITTED merge (staged deltas, " +
    "no marker) rolls back and the retried merge == rebuild; a " +
    "COMMITTED merge (marker, parts half-moved) completes to the " +
    "rebuild store") {
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files
      .createTempDirectory("graft_bm25_crash").toString
    val full = spark.read.parquet(s"$dir/documents.parquet")
    val n = full.count()
    val base = full.filter(col("doc_id") < n / 2)
      .select("doc_id", "text")
    val delta = full.filter(col("doc_id") >= n / 2)
      .select("doc_id", "text")
    base.write.mode("overwrite").parquet(s"$root/base/documents.parquet")
    delta.write.mode("overwrite")
      .parquet(s"$root/delta/documents.parquet")
    val fullStore = s"$root/store_full"
    IrSql.writeBm25Stats(spark, dir, fullStore)
    // a store whose postings/doclen ARE exactly the staged delta
    // artifacts a crashed merge leaves behind
    val deltaStore = s"$root/store_delta"
    IrSql.writeBm25Stats(spark, s"$root/delta", deltaStore)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val conf = spark.sparkContext.hadoopConfiguration
    def stageDeltas(store: String): Unit = {
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new Path(s"$deltaStore/postings"),
        fs, new Path(s"$store/_graft_delta_postings"), false, conf)
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new Path(s"$deltaStore/doclen"),
        fs, new Path(s"$store/_graft_delta_doclen"), false, conf)
      ()
    }
    def rows(store: String, art: String): Seq[String] =
      spark.read.parquet(s"$store/$art").collect()
        .map(_.toString).sorted.toSeq
    // --- state A: staged deltas, NO marker (crash before commit) ---
    val sa = s"$root/store_a"
    IrSql.writeBm25Stats(spark, s"$root/base", sa)
    val baseCorpus = rows(sa, "corpus")
    stageDeltas(sa)
    IrSql.repairBm25Stats(spark, sa) // any maintenance entry recovers
    assert(!fs.exists(new Path(s"$sa/_graft_delta_postings")) &&
      !fs.exists(new Path(s"$sa/_graft_delta_doclen")),
      "uncommitted staged deltas not rolled back")
    assert(rows(sa, "corpus") == baseCorpus,
      "rollback changed the store's content")
    IrSql.mergeBm25Stats(spark, sa, delta) // the RETRY must be clean
    Seq("postings", "doclen", "corpus", "stats").foreach { art =>
      assert(rows(fullStore, art) == rows(sa, art),
        s"retry-after-rollback != rebuild on $art (double-append?)")
    }
    // --- state B: marker present, postings parts HALF-moved ---
    val sb = s"$root/store_b"
    IrSql.writeBm25Stats(spark, s"$root/base", sb)
    stageDeltas(sb)
    fs.create(new Path(s"$sb/_graft_merge_inflight"), false).close()
    val staged = fs.listStatus(new Path(s"$sb/_graft_delta_postings"))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    staged.headOption.foreach(f => fs.rename(f.getPath,
      new Path(s"$sb/postings/${f.getPath.getName}")))
    IrSql.repairBm25Stats(spark, sb)
    assert(!fs.exists(new Path(s"$sb/_graft_merge_inflight")),
      "merge marker not cleared after completion")
    Seq("postings", "doclen", "corpus", "stats").foreach { art =>
      assert(rows(fullStore, art) == rows(sb, art),
        s"completed crashed merge != rebuild on $art")
    }
  }
}
