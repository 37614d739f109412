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

  test("domain quality gate: every kept doc clears its OWN source's " +
    "p75 bar; thresholds reproduce from a driver percentile recompute") {
    val kept = TextAnalysis.domainTopQuality(spark, dir).collect()
    assert(kept.nonEmpty)
    kept.foreach(r => assert(r.getDouble(2) >= r.getDouble(3),
      s"doc ${r.getLong(0)} below its domain bar"))
    // independent recompute: score = round(mean token length, 4),
    // thr = linear-interpolation p75 per source, rounded
    val scores = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map { r =>
        val toks = r.getString(2).toLowerCase
          .split("[^a-z0-9]+").filter(_.nonEmpty)
        (r.getLong(0), r.getString(1),
          BigDecimal(toks.map(_.length.toLong).sum.toDouble / toks.length)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    val thrBySrc = scores.groupBy(_._2).map { case (src, rs) =>
      val v = rs.map(_._3).sorted
      val pos = TextAnalysis.DomainQualityPct * (v.length - 1)
      val lo = v(pos.toInt)
      val hi = v(math.min(pos.toInt + 1, v.length - 1))
      src -> BigDecimal(lo + (hi - lo) * (pos - pos.toInt))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val wantKept = scores.filter { case (_, src, s) => s >= thrBySrc(src) }
      .map(_._1).toSet
    assert(kept.map(_.getLong(0)).toSet == wantKept)
    kept.foreach(r =>
      assert(r.getDouble(3) == thrBySrc(r.getString(1)),
        s"source ${r.getString(1)} threshold diverged"))
    // the gate keeps roughly the top quarter of each source — never
    // everything (a constant-score domain would; mean token length
    // varies in this corpus)
    assert(kept.length < scores.length)
  }

  test("token drift: one-row JSD panel consistent with a driver " +
    "recompute of the two unigram distributions") {
    val r = TextAnalysis.tokenDrift(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    val (ta, tb) = (row.getLong(0), row.getLong(1))
    val (va, vb, vs) = (row.getLong(2), row.getLong(3), row.getLong(4))
    val jsd = row.getDouble(5)
    assert(jsd >= 0.0 && jsd <= 1.0)
    assert(vs <= math.min(va, vb))
    // driver recompute with the same 1e-9 fixed-point sum
    val counts = scala.collection.mutable.Map
      .empty[String, (Long, Long)].withDefaultValue((0L, 0L))
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect().foreach { d =>
        val isA = d.getLong(0) % 2 == 0
        d.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
          .foreach { t =>
            val (a, b) = counts(t)
            counts(t) = if (isA) (a + 1, b) else (a, b + 1)
          }
      }
    val wta = counts.values.map(_._1).sum
    val wtb = counts.values.map(_._2).sum
    assert((ta, tb) == (wta, wtb))
    assert(va == counts.values.count(_._1 > 0).toLong)
    assert(vb == counts.values.count(_._2 > 0).toLong)
    assert(vs == counts.values.count(v => v._1 > 0 && v._2 > 0).toLong)
    val sum9 = counts.values.map { case (ca, cb) =>
      val p = ca.toDouble / wta
      val q = cb.toDouble / wtb
      val c =
        (if (ca > 0) p * (math.log(2 * p / (p + q)) / math.log(2.0))
         else 0.0) * 0.5 +
        (if (cb > 0) q * (math.log(2 * q / (p + q)) / math.log(2.0))
         else 0.0) * 0.5
      math.rint(c * TextAnalysis.DriftScale).toLong
    }.sum
    val wantJsd = BigDecimal(sum9.toDouble / TextAnalysis.DriftScale)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(jsd - wantJsd) <= 1e-4,
      s"jsd $jsd vs driver recompute $wantJsd")
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
    // both mid-swap crash states recover (the swapIn protocol):
    // A — target renamed away, COMPLETE staging dir → finish the swap
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val t = new org.apache.hadoop.fs.Path(out)
    val neu = new org.apache.hadoop.fs.Path(out + "_compacting")
    val old = new org.apache.hadoop.fs.Path(out + "_precompact")
    spark.read.parquet(out).write.parquet(neu.toString)
    fs.rename(t, old)
    TextAnalysis.recoverCompact(spark, out)
    assert(fs.exists(t) && !fs.exists(neu) && !fs.exists(old))
    assert(spark.read.parquet(out).collect()
      .map(_.getLong(0)).sorted.toSeq == before, "recovery (finish)")
    // B — same point but INCOMPLETE staging (no _SUCCESS) → roll back
    spark.read.parquet(out).write.parquet(neu.toString)
    fs.delete(new org.apache.hadoop.fs.Path(neu, "_SUCCESS"), false)
    fs.rename(t, old)
    TextAnalysis.recoverCompact(spark, out)
    assert(fs.exists(t) && !fs.exists(neu) && !fs.exists(old))
    assert(spark.read.parquet(out).collect()
      .map(_.getLong(0)).sorted.toSeq == before, "recovery (rollback)")
    // C — target absent, old copy ALSO absent, COMPLETE staging (the
    // rename(tmp,dst)-returned-false-then-old-deleted hazard, or a
    // crash after the old-copy delete began): the staged rows are the
    // only complete copy — recovery must promote them, not strand them
    spark.read.parquet(out).write.parquet(neu.toString)
    fs.delete(t, true)
    TextAnalysis.recoverCompact(spark, out)
    assert(fs.exists(t) && !fs.exists(neu) && !fs.exists(old))
    assert(spark.read.parquet(out).collect()
      .map(_.getLong(0)).sorted.toSeq == before, "recovery (promote staged)")
  }

  test("hash-bucket sample keeps roughly keep/buckets of the corpus") {
    val total = graft.Tables.load(spark, dir, "documents").count().toDouble
    val kept = TextAnalysis.sampleByHash(spark, dir).count().toDouble
    val frac = kept / total
    // 3 of 10 buckets; the polynomial hash should spread text uniformly
    assert(frac > 0.15 && frac < 0.45, s"sample fraction $frac")
  }

  test("repetition signals stay in range and cover every ≥3-token doc") {
    val reps = TextAnalysis.repetition(spark, dir).collect()
    val eligible = graft.Tables.load(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.size(
        graft.ops.CrossHash.tokensArrayFast(col("text"))) >= 3).count()
    assert(reps.length == eligible)
    reps.foreach { r =>
      val top = r.getAs[Double]("top_bigram_frac")
      val dup = r.getAs[Double]("dup_trigram_frac")
      assert(top > 0.0 && top <= 1.0, s"top_bigram_frac $top")
      assert(dup >= 0.0 && dup < 1.0, s"dup_trigram_frac $dup")
    }
  }

  test("contamination never flags benchmark docs and bounds overlap") {
    val rows = TextAnalysis.contamination(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % TextAnalysis.ContamMod != 0)
      val shared = r.getAs[Long]("n_shared")
      assert(shared >= 1 && shared <= r.getAs[Long]("n_trigrams"))
    }
  }

  test("mixture downsamples toward targets without upsampling and " +
    "keeps the binding language whole") {
    val d = graft.Tables.load(spark, dir, "documents")
    val totals = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextAnalysis.mixCorpus(spark, dir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // never upsample
    kept.foreach { case (l, k) => assert(k <= totals(l), s"$l kept $k") }
    // the binding language (min count/weight) is kept whole
    val w = TextAnalysis.MixTargets.toMap
    val binding = totals.keys.filter(w.contains)
      .minBy(l => totals(l) / w(l))
    assert(kept(binding) == totals(binding),
      s"binding $binding kept ${kept(binding)} of ${totals(binding)}")
    // deterministic: a second run returns the identical kept set
    val a = TextAnalysis.mixCorpus(spark, dir).collect().toSeq
    val b = TextAnalysis.mixCorpus(spark, dir).collect().toSeq
    assert(a == b)
  }

  test("train/val/test split covers every doc with roughly 80/10/10 " +
    "shares, deterministically") {
    val rows = TextAnalysis.trainValTestSplit(spark, dir).collect()
    val bySplit = rows.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = bySplit.values.sum
    assert(total == graft.Tables.load(spark, dir, "documents").count())
    val trainFrac = bySplit("train").toDouble / total
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train share $trainFrac")
    assert(bySplit.keySet == Set("train", "val", "test"))
    val again = TextAnalysis.trainValTestSplit(spark, dir).collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("alpha mixing flattens language shares toward uniform, " +
    "downsample-only") {
    val before = graft.Tables.load(spark, dir, "documents")
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = TextAnalysis.mixCorpusAlpha(spark, dir)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    after.foreach { case (l, k) =>
      assert(k <= before(l), s"$l upsampled: $k > ${before(l)}")
    }
    // temperature < 1 flattens: the head/tail imbalance must shrink
    def ratio(m: Map[String, Long]) =
      m.values.max.toDouble / m.values.min
    assert(ratio(after) <= ratio(before) + 1e-9,
      s"not flattened: ${ratio(after)} vs ${ratio(before)}")
  }

  test("heavy hitters: CMS bounds hold and counts equal the exact agg") {
    val hh = TextAnalysis.heavyHitters(spark, dir, k = 10).collect()
    assert(hh.length == 10)
    assert(hh.forall(r => r.getBoolean(2) && r.getBoolean(3)))
    val exact = graft.Tables.load(spark, dir, "documents")
      .select(explode(CrossHash.tokensArrayFast(col("text"))).as("term"))
      .groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    hh.foreach(r => assert(exact(r.getString(0)) == r.getLong(1)))
    // descending and deterministically tie-broken
    val counts = hh.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted.reverse)
  }

  test("LM score: every multi-token doc scored, log-probs negative, " +
    "pair counts match token counts") {
    val lm = TextAnalysis.lmScore(spark, dir).collect()
    val nToks = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(CrossHash.tokensArrayFast(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val eligible = nToks.count(_._2 >= 2)
    assert(lm.length == eligible)
    lm.foreach { r =>
      assert(r.getLong(1) == nToks(r.getLong(0)) - 1,
        s"doc ${r.getLong(0)}: ${r.getLong(1)} pairs")
      assert(r.getDouble(2) < 0.0, s"doc ${r.getLong(0)} non-negative")
    }
  }

  test("n-gram lang-ID separates disjoint-alphabet languages perfectly") {
    val tmp = java.nio.file.Files.createTempDirectory("lid_docs").toString
    val rows = (0 until 6).map { i =>
      if (i % 2 == 0) (i.toLong, "abba bacca cabba abba cab", "aa")
      else (i.toLong, "xyzzy zyxxy yzxxz xyzzy zyx", "zz")
    }
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.langIdNgram(spark, tmp).collect()
    assert(got.length == 6)
    got.foreach { r =>
      assert(r.getBoolean(3), s"doc ${r.getLong(0)} misclassified " +
        s"as ${r.getString(2)} (true ${r.getString(1)})")
    }
  }

  test("langIdNgram: pre-agg'd shape == occurrence-row shape " +
    "(the scale crossover changes cost only)") {
    // default crossover (50k docs) picks occurrence rows at this SF;
    // crossover 0 forces the pre-agg'd 26×-shape — results must be
    // bit-identical (same fixed-point sums, grouped or not)
    val occ = TextAnalysis.langIdNgram(spark, dir).collect().toSeq
    spark.conf.set(TextAnalysis.LangIdPreAggCrossoverKey, "0")
    try {
      val pre = TextAnalysis.langIdNgram(spark, dir).collect().toSeq
      assert(occ == pre)
    } finally
      spark.conf.unset(TextAnalysis.LangIdPreAggCrossoverKey)
  }

  test("vocab coverage: OOV vanishes once the vocabulary holds every term") {
    val full = TextAnalysis.vocabCoverage(spark, dir, v = 100000).collect()
    assert(full.nonEmpty)
    full.foreach { r =>
      assert(r.getLong(2) == r.getLong(1), s"doc ${r.getLong(0)} oov")
      assert(r.getDouble(3) == 0.0)
    }
    val cut = TextAnalysis.vocabCoverage(spark, dir, v = 5).collect()
    assert(cut.exists(_.getDouble(3) > 0.0), "a 5-term vocab must miss")
    cut.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("DSIR selection overrepresents the target (quality-kept) docs " +
    "and scores come back sorted") {
    val sel = TextAnalysis.dsirSelect(spark, dir).collect()
    assert(sel.length == TextAnalysis.DsirKeep)
    val scores = sel.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse, "scores not descending")
    val kept = TextAnalysis.filterApply(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val total = graft.Tables.load(spark, dir, "documents").count().toDouble
    val fracSel = sel.count(r => kept.contains(r.getLong(0))) /
      sel.length.toDouble
    val fracAll = kept.size / total
    assert(fracSel > fracAll,
      s"selection ($fracSel) no better than base rate ($fracAll)")
  }

  test("DSIR scoring joins the bucket table by broadcast (the table " +
    "is bounded by DsirBuckets, so this holds at any corpus size)") {
    val plan = TextAnalysis.dsirSelect(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("stratified sample: exactly min(k, stratum size) per lang, " +
    "deterministic, served by the bounded-heap aggregate (no window)") {
    val k = 7
    val got = TextAnalysis.stratifiedSample(spark, dir, k).collect()
    val sizes = graft.Tables.load(spark, dir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perLang = got.groupBy(_.getString(0))
    assert(perLang.keySet == sizes.keySet)
    perLang.foreach { case (lang, rows) =>
      assert(rows.length.toLong == math.min(k.toLong, sizes(lang)),
        s"$lang: ${rows.length} sampled")
      // ranks dense from 1, hashes ascending (smallest-k contract)
      assert(rows.map(_.getLong(1)).toSeq == (1L to rows.length).toSeq)
      val hs = rows.map(_.getLong(3)).toSeq
      assert(hs == hs.sorted, s"$lang hash order broken")
    }
    // deterministic: a second run returns the identical sample
    val again = TextAnalysis.stratifiedSample(spark, dir, k).collect()
    assert(got.map(_.toSeq.toList).toSeq == again.map(_.toSeq.toList).toSeq)
    // the plan rides the O(k)-state aggregate, not a window sort
    val plan = TextAnalysis.stratifiedSample(spark, dir, k)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no bounded-heap agg:\n$plan")
    assert(!plan.contains("Window"), s"window exec in sample plan:\n$plan")
  }

  test("decontamination apply: keeps exactly the under-threshold docs, " +
    "zero-overlap docs survive with explicit zeros") {
    val kept = TextAnalysis.decontaminate(spark, dir).collect()
    assert(kept.nonEmpty)
    kept.foreach(r => assert(
      r.getDouble(3) < TextAnalysis.ContamDropThreshold, r.toString))
    // zero-overlap docs are in the kept set with n_shared = 0
    assert(kept.exists(r => r.getLong(2) == 0L))
    // flagged docs over the threshold are exactly the ones missing
    val flagged = TextAnalysis.contamination(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val keptIds = kept.map(_.getLong(0)).toSet
    flagged.foreach { case (id, ratio) =>
      assert(keptIds.contains(id) ==
        (ratio < TextAnalysis.ContamDropThreshold),
        s"doc $id ratio $ratio kept=${keptIds.contains(id)}")
    }
    // the contamination report itself is unchanged by the refactor:
    // every reported row has shared trigrams
    assert(flagged.nonEmpty)
  }

  test("multi-benchmark decontamination: keep-if-ALL-below gate, " +
    "per-benchmark overlap columns match a driver recompute") {
    val mod = TextAnalysis.ContamMod
    val thr = TextAnalysis.ContamDropThreshold
    val benchIds = TextAnalysis.MultiBenchIds
    val got = TextAnalysis.decontaminateMulti(spark, dir).collect()
    assert(got.nonEmpty)
    // driver recompute from the same shingle stream
    val sh = Dedup.docShingles(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bench = benchIds.map(b =>
      b -> sh.filter(_._1 % mod == b).map(_._2).toSet).toMap
    val train = sh.filter(t => !benchIds.contains(t._1 % mod))
      .groupBy(_._1)
    def ratio(shared: Long, total: Long): Double =
      BigDecimal(shared.toDouble / total)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = train.map { case (id, rows) =>
      val total = rows.size.toLong
      val shares = benchIds.map(b =>
        rows.count(t => bench(b).contains(t._2)).toLong)
      (id, total, shares)
    }.filter { case (_, total, shares) =>
      shares.forall(s => ratio(s, total) < thr)
    }
    assert(got.map(_.getLong(0)).toSet == expect.map(_._1).toSet,
      "kept-doc set diverged from the recompute")
    // no training doc from either benchmark slice leaks in, and every
    // kept row's per-benchmark columns reproduce
    val expById = expect.map(e => e._1 -> e).toMap
    got.foreach { r =>
      val id = r.getLong(0)
      assert(!benchIds.contains(id % mod), s"benchmark doc $id in output")
      val (_, total, shares) = expById(id)
      assert(r.getLong(1) == total, s"doc $id n_trigrams")
      benchIds.zipWithIndex.foreach { case (b, i) =>
        assert(r.getLong(2 + 2 * i) == shares(i), s"doc $id n_shared_b$b")
        assert(r.getDouble(3 + 2 * i) == ratio(shares(i), total),
          s"doc $id ratio_b$b")
      }
    }
    // the gate is genuinely multi-benchmark on this corpus: some doc
    // passes one benchmark's threshold but not another's
    val mixed = train.exists { case (_, rows) =>
      val total = rows.size.toLong
      val rs = benchIds.map(b =>
        ratio(rows.count(t => bench(b).contains(t._2)).toLong, total))
      rs.exists(_ < thr) && rs.exists(_ >= thr)
    }
    assert(mixed, "fixture never distinguishes the benchmarks")
  }

  test("chunking: windows tile every doc's tokens at the stride, " +
    "overlap carries, text slices reconstruct exactly") {
    import graft.ops.CrossHash
    val w = TextAnalysis.ChunkTokens
    val s = TextAnalysis.ChunkStride
    val got = TextAnalysis.chunk(spark, dir).collect()
    assert(got.nonEmpty)
    val toks = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), CrossHash.tokensArrayFast(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val byDoc = got.groupBy(_.getLong(0))
    toks.filter(_._2.nonEmpty).foreach { case (id, ts) =>
      val rows = byDoc(id).sortBy(_.getLong(1))
      val n = ts.length
      // a trailing window wholly inside the previous one is suppressed:
      // chunk count = 1 + ceil((n - w) / s) clamped at 1
      val expect = if (n <= w) 1 else (n - w + s - 1) / s + 1
      assert(rows.length == expect, s"doc $id: chunk count")
      // every emitted chunk EXTENDS coverage past its predecessor
      rows.sliding(2).filter(_.length == 2).foreach { pc =>
        val (p, c) = (pc(0), pc(1))
        assert(c.getLong(2) + c.getLong(3) > p.getLong(2) + p.getLong(3),
          s"doc $id chunk ${c.getLong(1)} adds no new tokens")
      }
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == i)
        val start = i.toLong * s
        assert(r.getLong(2) == start)
        val len = math.min(w.toLong, n - start)
        assert(r.getLong(3) == len, s"doc $id chunk $i: n_tokens")
        assert(r.getString(4) ==
          ts.slice(start.toInt, start.toInt + w).mkString(" "),
          s"doc $id chunk $i: text slice")
      }
      // coverage: the last chunk reaches the final token
      assert(rows.last.getLong(2) + rows.last.getLong(3) == n)
    }
    // empty docs produce no chunks
    assert(byDoc.keySet == toks.filter(_._2.nonEmpty).keySet)
  }

  test("upsampling: per-doc copy counts follow the lang weights and " +
    "the deterministic hash gate; copies dense from 1") {
    import graft.ops.CrossHash
    val got = TextAnalysis.upsample(spark, dir).collect()
    assert(got.nonEmpty)
    val wmap = TextAnalysis.UpsampleWeights
      .map { case (l, b, e) => l -> (b, e) }.toMap
    val hv = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        (CrossHash.polyHash(col("text")) % 100).as("hv"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val byDoc = got.groupBy(_.getLong(0))
    hv.foreach { case (id, (lang, h)) =>
      val (b, e) = wmap.getOrElse(lang, TextAnalysis.UpsampleDefault)
      val want = b + (if (h < e) 1L else 0L)
      val copies = byDoc.get(id).map(_.length.toLong).getOrElse(0L)
      assert(copies == want, s"doc $id ($lang, hv=$h): $copies != $want")
      if (want > 0)
        assert(byDoc(id).map(_.getLong(1)).sorted.toSeq == (1L to want),
          s"doc $id: copy numbering")
    }
    // at least one doc must actually downsample (weight < 1) and one
    // must upsample past 2 — otherwise the fixture isn't exercising
    // the fractional arithmetic
    assert(hv.exists { case (id, _) => !byDoc.contains(id) })
    assert(byDoc.values.exists(_.length >= 3))
  }

  test("curation funnel: one monotone row whose stage counts " +
    "reproduce from the standalone component queries") {
    val r = TextAnalysis.curationFunnel(spark, dir).head()
    val (nTotal, nLang, nQual, nDedup, nNd, nFinal) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    assert(nTotal >= nLang && nLang >= nQual && nQual >= nDedup &&
      nDedup >= nNd && nNd >= nFinal, s"funnel not monotone: $r")
    assert(nTotal ==
      graft.Tables.load(spark, dir, "documents").count())
    assert(nLang == TextAnalysis.langId(spark, dir)
      .filter(col("lang_pred") === "en").count())
    // lang ∧ quality is exactly filterApply's kept set
    val kept = TextAnalysis.filterApply(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(nQual == kept.size.toLong)
    val keeperSet = spark.read
      .parquet(s"$dir/documents.parquet")
      .groupBy(md5(col("text"))).agg(min(col("doc_id")).as("d"))
      .collect().map(_.getLong(1)).toSet
    assert(nDedup == (kept & keeperSet).size.toLong)
    // near-dup representatives: not the larger id of any LSH pair
    val ndDrop = graft.ops.Dedup.minhashLsh(spark, dir)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    assert(nNd == ((kept & keeperSet) -- ndDrop).size.toLong)
    val decSet = TextAnalysis.decontaminate(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(nFinal ==
      (((kept & keeperSet) -- ndDrop) & decSet).size.toLong)
    // the funnel must actually discriminate at every stage on this
    // corpus — all-equal counts would mean the gates test nothing
    assert(nFinal < nTotal)
  }

  test("funnel apply: kept set == all-gates-pass flags under BOTH " +
    "survivor policies; keep-longest keeps each pair's (max tokens, " +
    "min id) member") {
    val pairs = Dedup.minhashLsh(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty, "no LSH pair on this corpus — fixture moot")
    val nt = TextAnalysis.quality(spark, dir)
      .select(col("doc_id"), col("n_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver recompute of each policy's drop set
    val dropFirst = pairs.map(_._2).toSet
    val dropLongest = pairs.map { case (a, b) =>
      if (nt(a) > nt(b) || (nt(a) == nt(b) && a < b)) b else a
    }.toSet
    Seq(false -> dropFirst, true -> dropLongest).foreach {
      case (kl, drop) =>
        val flags = TextAnalysis.curationFunnelFlags(spark, dir, kl)
          .collect().map(r => r.getLong(0) ->
            ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
              r.getBoolean(4), r.getBoolean(5)))).toMap
        flags.foreach { case (d, (_, _, _, g4, _)) =>
          assert(g4 == !drop(d), s"keepLongest=$kl doc $d g4") }
        val kept = TextAnalysis.curationFunnelApply(spark, dir, kl)
          .collect().map(_.getLong(0)).toSeq
        val want = flags.collect {
          case (d, (a, b, c, e, f)) if a && b && c && e && f => d
        }.toSeq.sorted
        assert(kept == want, s"keepLongest=$kl kept set != flags")
    }
    // the knob must be observable: some pair's longer member carries
    // the larger id, so the two policies keep different docs
    assert(dropFirst != dropLongest,
      "fixture cannot distinguish the survivor policies")
  }
}
