package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // derived from the table, not hardcoded: the spec must break on a
  // real PQ regression, not on a regenerated test corpus (ADVICE r8)
  private lazy val embTable = graft.Tables.load(spark, dir, "embeddings")
  private lazy val nVecs = embTable.count()
  private lazy val dims =
    embTable.select(size(col("embedding"))).head().getInt(0)

  test("codebooks: one per subspace, bounded size, subdim = dims/m") {
    val cb = Pq.codebooks(spark, dir)
    assert(cb.length == Pq.Subspaces)
    cb.foreach { cents =>
      assert(cents.nonEmpty && cents.length <= Pq.Codebook)
      assert(cents.forall(_._2.length == dims / Pq.Subspaces))
      // cids are a subset of the seed ids, sorted
      assert(cents.map(_._1).toSeq == cents.map(_._1).sorted.toSeq)
      assert(cents.forall(c => c._1 >= 0 && c._1 < Pq.Codebook))
    }
  }

  test("pq codes reference live centroids only") {
    val cb = Pq.codebooks(spark, dir)
    val live = cb.map(_.map(_._1).toSet)
    val rows = Pq.pqCodes(spark, dir).collect()
    assert(rows.length.toLong == nVecs)
    rows.foreach { r =>
      (0 until Pq.Subspaces).foreach { s =>
        assert(live(s).contains(r.getLong(1 + s)),
          s"vec ${r.getLong(0)} sub $s code ${r.getLong(1 + s)} not a centroid")
      }
    }
  }

  test("ADC result = per-subspace distance-table lookups of the " +
    "assigned codes (recomputed independently)") {
    val cb = Pq.codebooks(spark, dir)
    val sd = dims / Pq.Subspaces
    val e = graft.Tables.load(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .head().getSeq[Float](e.columns.indexOf("embedding"))
    val codes = Pq.pqCodes(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (0 until Pq.Subspaces).map(s => r.getLong(1 + s))).toMap
    val vecs = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def l2(a: Seq[Float], off: Int, c: Array[Double]): Double = {
      var acc = 0.0
      for (i <- c.indices) {
        val d = a(off + i).toDouble - c(i); acc += d * d
      }
      acc
    }
    val got = Pq.annPq(spark, dir).collect()
    assert(got.length == Pq.TopK)
    got.foreach { r =>
      val vid = r.getLong(0)
      val want = (0 until Pq.Subspaces).foldLeft(0.0) { (acc, s) =>
        val cid = codes(vid)(s)
        val cv = cb(s).find(_._1 == cid).get._2
        acc + l2(q, s * sd, cv)
      }
      assert(math.abs(r.getDouble(1) - (math.rint(want * 1e4) / 1e4)) < 1e-9 ||
        math.abs(r.getDouble(1) - want) < 1e-4,
        s"vec $vid: got ${r.getDouble(1)}, want ~$want")
    }
    // distances non-decreasing down the top-k
    val ds = got.map(_.getDouble(1)).toSeq
    assert(ds == ds.sorted)
  }

  test("IVF-PQ: results are the ADC scores of exactly the probed " +
    "cells' candidates — a subset of full-corpus ADC scoring") {
    val full = Pq.annPq(spark, dir, k = 500).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = Pq.annIvfPq(spark, dir).collect()
    assert(got.length == Pq.TopK)
    // every IVF-PQ hit carries its full-ADC distance (routing only
    // restricts the candidate set, never changes a score)
    got.foreach(r => assert(full(r.getLong(0)) == r.getDouble(1),
      s"vec ${r.getLong(0)}: cell-routed ${r.getDouble(1)} != ADC ${full(r.getLong(0))}"))
    val ds = got.map(_.getDouble(1)).toSeq
    assert(ds == ds.sorted)
  }

  test("filtered IVF-PQ: exactly the unfiltered probed candidates " +
    "that pass the metadata predicate, scores unchanged; loaded == " +
    "in-memory; nothing filtered-out leaks") {
    val pass = graft.Tables.load(spark, dir, "documents")
      .filter(col("lang") === Similarity.FilterLang &&
        col("n_chars") >= Similarity.FilterMinChars)
      .collect().map(_.getLong(0)).toSet
    // unfiltered probed-cell ADC ranking, deep enough to cover top-k
    // of the filtered subset
    val probedAll = Pq.annIvfPq(spark, dir, k = 1000).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val want = probedAll.filter(p => pass(p._1)).take(Pq.TopK).toSeq
    val got = Pq.annIvfPqFiltered(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want,
      "filtered IVF-PQ != predicate-filtered probed ADC ranking")
    assert(got.forall(p => pass(p._1)), "a filtered-out vector leaked")
    assert(Pq.annIvfPqFilteredLoaded(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq == got,
      "loaded filtered probe diverged from the in-memory form")
  }

  test("PQ-coded durable store: schema is codes-only (no embedding), " +
    "probe is partition-pruned and == in-memory IVF-PQ at nProbe 1 and 2") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_store").toString
    Pq.writeIvfPqStore(spark, dir, out)
    // the compressed layout holds vec_id + m codes + the partition
    // column — the raw fp32 vectors never land in the serving store
    val stored = spark.read.parquet(out)
    assert(stored.columns.sorted.toSeq ==
      (Seq("vec_id", "cell") ++
        (0 until Pq.Subspaces).map(s => s"c$s")).sorted)
    assert(stored.count() == nVecs)
    Seq(1, 2).foreach { np =>
      val got = Pq.probeIvfPqStore(spark, dir, out, nProbe = np).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val mem = Pq.annIvfPq(spark, dir, nProbe = np).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == mem, s"nProbe=$np: store probe diverged from in-memory")
    }
    // the probe scan prunes to the probed cell directories
    val plan = Pq.probeIvfPqStore(spark, dir, out)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"PQ store probe did not partition-prune:\n$plan")
  }

  test("ADC scan plan is shuffle-free (broadcast tables + TakeOrdered)") {
    val plan = Pq.annPq(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange "),
      s"unexpected exchange in ADC plan:\n$plan")
  }

  test("adaptive filtered IVF-PQ: matches a driver recompute of the " +
    "ladder rule, == the fixed form at its landing rung, durable form " +
    "identical and partition-pruned") {
    val vecs = embTable.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val qv = vecs.find(_._1 == 0L).get._2
    val pass = graft.Tables.load(spark, dir, "documents")
      .filter(col("lang") === Similarity.FilterLang &&
        col("n_chars") >= Similarity.FilterMinChars)
      .collect().map(_.getLong(0)).toSet
    val cents = vecs.filter(_._1 < Similarity.IvfCentroids)
    def cellOf(v: Seq[Float]): Long =
      cents.map(c => (c._1, Similarity.cosSeqInf(v, c._2)))
        .maxBy { case (cid, s) => (s, -cid) }._1
    val ranked = cents.map(c => (c._1, Similarity.cosSeqInf(qv, c._2)))
      .sortBy { case (cid, s) => (-s, cid) }.map(_._1).toSeq
    val byCell = vecs.filter(v => v._1 != 0L && pass(v._1))
      .groupBy(v => cellOf(v._2)).view.mapValues(_.length).toMap
    val target = Similarity.FilteredAutoOversample * Pq.TopK
    val chosenNp = Similarity.autoLadder(ranked.length).find(np =>
      ranked.take(np).map(c => byCell.getOrElse(c, 0)).sum >= target)
      .getOrElse(ranked.length)
    val auto = Pq.annIvfPqFilteredAuto(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(auto == Pq.annIvfPqFiltered(spark, dir, nProbe = chosenNp)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq,
      s"auto != fixed IVF-PQ at the landing rung (np=$chosenNp)")
    // durable form: identical output; rung counts + final ranking
    // prune to cell directories
    val out = graft.TempDirs.scratch("graft_ivfpq_auto")
    Pq.writeIvfPqStore(spark, dir, out)
    assert(Pq.probeIvfPqStoreFilteredAuto(spark, dir, out).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq == auto,
      "loaded adaptive coded probe diverged from the in-memory form")
    val plan = Pq.probeIvfPqStoreFilteredAuto(spark, dir, out)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"adaptive coded probe did not partition-prune:\n$plan")
  }

  test("adaptive filtered IVF-PQ walks to the cap on a starved corpus " +
    "and then ranks EVERY filter survivor by ADC (the full-filtered " +
    "coded scan — recall 1.0 of the coded ranking)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_starve").toString
    val docs = graft.Tables.load(spark, dir, "documents")
    val qualifying = docs
      .filter(col("lang") === Similarity.FilterLang &&
        col("n_chars") >= Similarity.FilterMinChars)
      .select("doc_id").orderBy("doc_id").limit(7)
      .collect().map(_.getLong(0)).toSet
    docs.withColumn("n_chars",
        when(col("lang") === Similarity.FilterLang &&
          col("n_chars") >= Similarity.FilterMinChars &&
          !col("doc_id").isin(qualifying.toSeq: _*),
          lit(0L)).otherwise(col("n_chars")))
      .write.mode("overwrite").parquet(s"$root/documents.parquet")
    spark.read.parquet(s"$dir/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$root/embeddings.parquet")
    val auto = Pq.annIvfPqFilteredAuto(spark, root).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // cap rung == all cells probed == the filtered corpus-wide ADC scan
    val capScan = Pq.annIvfPqFiltered(spark, root,
        nProbe = Similarity.IvfCentroids.toInt).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(capScan.nonEmpty && capScan.size < Pq.TopK,
      "fixture must actually starve the filter")
    assert(auto == capScan,
      "cap-level adaptive coded probe must rank every survivor")
  }
}
