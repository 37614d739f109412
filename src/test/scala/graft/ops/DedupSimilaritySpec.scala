package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Cross-algorithm consistency on the deterministic sf0.001 tables:
  * the approximate structures must agree with their exact counterparts
  * in the directions theory promises. */
class DedupSimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("minhash LSH finds every exact-jaccard near-dup pair") {
    val exact = Dedup.jaccard(spark, dir, threshold = 0.5)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(exact.subsetOf(lsh),
      s"missed by LSH: ${exact.diff(lsh)}")
  }

  test("minhash estimate tracks exact jaccard on shared pairs") {
    val exact = Dedup.jaccard(spark, dir, threshold = 0.5)
    val est = Dedup.minhashLsh(spark, dir)
    val joined = exact.join(est, Seq("doc_a", "doc_b"))
      .select(col("jaccard"), col("est_jaccard")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 0.35,
        s"estimate too far: $r")
    }
  }

  test("simhash recalls most of the highest-jaccard duplicates") {
    // simhash is tf-weighted, so docs with near-identical shingle SETS
    // can still differ by >1 bit — high recall, not containment, is
    // the honest property at hamming ≤ 1
    val topDups = Dedup.jaccard(spark, dir, threshold = 0.5)
      .filter(col("jaccard") >= 0.97)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(topDups.nonEmpty)
    val recall = topDups.count(sim.contains).toDouble / topDups.size
    assert(recall >= 0.8, s"recall $recall; missed: ${topDups.diff(sim)}")
  }

  test("single-task union-find and distributed propagation produce identical clusters") {
    val pairs = Dedup.jaccard(spark, dir, threshold = 0.5)
      .select(col("doc_a"), col("doc_b")).persist()
    val n = pairs.count()
    assert(n > 0)
    val uf = Dedup.clustersUnionFind(spark, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val prop = Dedup.clustersPropagate(spark, pairs, n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(uf === prop)
    pairs.unpersist()
  }

  test("survivors: one keep-longest doc per cluster, from its own members") {
    import graft.ops.CrossHash.tokensArrayFast
    val cl = Dedup.dedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq // (doc_id, cluster)
    val byCluster = cl.groupMap(_._2)(_._1)
    val lens = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), size(tokensArrayFast(col("text"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sv = Dedup.survivors(spark, dir).collect()
    assert(sv.map(_.getLong(0)).toSet == byCluster.keySet) // one per cluster
    sv.foreach { r =>
      val (cluster, survivor, nTok, nMembers) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val members = byCluster(cluster)
      assert(members.contains(survivor), s"survivor $survivor not in $cluster")
      assert(nMembers == members.length)
      assert(nTok == lens(survivor))
      val best = members.map(lens).max
      assert(nTok == best, s"cluster $cluster kept $nTok, best is $best")
      // tie-break: smallest doc_id among the longest members
      assert(survivor == members.filter(lens(_) == best).min)
    }
  }

  test("int8-quantized cosine tracks exact cosine within quantization error") {
    val exact = Similarity.annTopK(spark, dir, k = 1000000).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val quant = Similarity.annQuantized(spark, dir, k = 10).collect()
    assert(quant.length == 10)
    quant.foreach { r =>
      val (id, qc) = (r.getLong(0), r.getDouble(1))
      assert(math.abs(qc - exact(id)) < 0.02,
        s"vec $id: quantized $qc vs exact ${exact(id)}")
    }
    // the quantized top-10 should mostly agree with the exact top-10
    val exactTop = Similarity.annTopK(spark, dir, k = 10).collect()
      .map(_.getLong(0)).toSet
    assert(quant.map(_.getLong(0)).count(exactTop) >= 7)
  }

  test("multi-probe LSH dominates single-probe positionally") {
    // the probe set contains the query's own bucket, so candidates are
    // a superset — every ranked score must be at least as good
    val single = Similarity.annLsh(spark, dir, k = 10)
      .collect().map(_.getDouble(1))
    val multi = Similarity.annLshMultiProbe(spark, dir, k = 10)
      .collect().map(_.getDouble(1))
    assert(multi.length >= single.length)
    single.zip(multi).foreach { case (s, m) =>
      assert(m >= s - 1e-9, s"multi-probe rank worse: $m < $s")
    }
  }

  test("nProbe=2 IVF dominates single-cell probing positionally") {
    val one = Similarity.annIvf(spark, dir, k = 10)
      .collect().map(_.getDouble(1))
    val two = Similarity.annIvfProbe(spark, dir, k = 10, nProbe = 2)
      .collect().map(_.getDouble(1))
    assert(two.length >= one.length)
    one.zip(two).foreach { case (s, m) =>
      assert(m >= s - 1e-9, s"nProbe=2 rank worse: $m < $s")
    }
  }

  test("semDedup cells degenerate to ivfCells at sub-threshold corpus size") {
    // n=500 → k = max(IvfCentroids, ceil(500/128)) = IvfCentroids: the
    // dynamic-k path must reproduce the pinned 8-cell assignment exactly
    val ivf = Similarity.ivfCells(spark, dir)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val sem = Similarity.semDedupCells(spark, dir)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sem.size == 500)
    assert(sem == ivf)
  }

  test("semDedup pairs are the cell-gated subset of brute all-pairs, scores exact") {
    val brute = {
      val e = graft.Tables.load(spark, dir, "embeddings")
      e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id"),
          round(Similarity.cosine(col("a.embedding"), col("b.embedding")), 4)
            .as("cos"))
        .filter(col("cos") >= Similarity.SemDedupThreshold)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
    }
    val cellBounded = Similarity.semDedupPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(cellBounded.nonEmpty)
    // cell-bounding only REMOVES candidates (boundary-straddling pairs);
    // every surviving pair's cosine must equal the brute value exactly
    cellBounded.foreach { case (k, c) =>
      assert(brute.contains(k), s"pair $k not in brute all-pairs set")
      assert(brute(k) == c, s"score drift on $k: brute ${brute(k)} vs $c")
    }
  }

  test("semDedupFull clusters: one keeper per cluster, label = min member") {
    val rows = Similarity.semDedupFull(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (cluster, members) =>
      assert(members.map(_._1).min == cluster,
        s"cluster $cluster label is not its min member")
      assert(members.count(_._3 == 1L) == 1,
        s"cluster $cluster keeper count != 1")
      members.foreach { case (vid, _, keeper) =>
        assert((keeper == 1L) == (vid == cluster))
      }
    }
  }

  test("semDedupSurvivors = documents minus cluster non-keepers, exactly") {
    val full = Similarity.semDedupFull(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val dropped = full.collect { case (vid, 0L) => vid }.toSet
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val survivors = Similarity.semDedupSurvivors(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(survivors == docs -- dropped)
    // keepers (and untouched docs) all survive; every drop is a real doc
    assert(full.collect { case (vid, 1L) => vid }.toSet.subsetOf(survivors))
    assert(dropped.subsetOf(docs))
  }

  test("union-find task guard aborts oversized graphs with the fallback marker") {
    val pairs = Dedup.jaccard(spark, dir, threshold = 0.5)
      .select(col("doc_a"), col("doc_b"))
    val e = intercept[Exception] {
      Dedup.clustersUnionFind(spark, pairs, maxEdges = 1).collect()
    }
    def chain(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
    assert(chain(e).exists(t => t.getMessage != null &&
      t.getMessage.contains("GRAFT_GRAPH_TOO_LARGE")), e.toString)
  }

  test("fixed-point centroids match the exact-fold reference, with no collect_list in the plan") {
    val fix = Similarity.labelCentroids(spark, dir)
    assert(!fix.queryExecution.executedPlan.toString.contains("collect_list"),
      "serving centroid plan must not buffer vectors per label")
    val fold = Similarity.labelCentroidsFold(spark, dir)
      .withColumnRenamed("c", "c_fold")
    val joined = fix.join(fold, Seq("label", "dim", "n")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val d = math.abs(r.getAs[Double]("c") - r.getAs[Double]("c_fold"))
      assert(d <= 1e-4, s"centroid drift $d at $r")
    }
  }

  test("k-means partitions every vector into exactly one complete cell") {
    val total = graft.Tables.load(spark, dir, "embeddings").count()
    val cents = Similarity.kmeansCentroids(spark, dir).collect()
    // (cid, dim) grid is complete and n is constant across a cell's dims
    val byCell = cents.groupBy(_.getAs[Long]("cid"))
    assert(byCell.nonEmpty && byCell.size <= Similarity.IvfCentroids)
    byCell.values.foreach { rows =>
      assert(rows.map(_.getAs[Number]("dim").longValue).sorted.toSeq ==
        (1L to rows.length).toSeq)
      assert(rows.map(_.getAs[Long]("n")).toSet.size == 1)
    }
    // every vector lands in exactly one cell
    val assignedPerDim = cents
      .filter(_.getAs[Number]("dim").longValue == 1L)
      .map(_.getAs[Long]("n")).sum
    assert(assignedPerDim == total)
    // deeper iteration counts must still partition the full set
    val s3 = Similarity.kmeansCentroids(spark, dir, iters = 3)
      .filter(col("dim") === 1).select(col("n"))
      .collect().map(_.getLong(0)).sum
    assert(s3 == total)
  }

  test("order-sensitive outputs are invariant under shuffle-partition " +
    "count — the cross-engine determinism claim, mechanically") {
    // the fixed-point centroid sums, k-means means, and hash folds all
    // claim order-insensitivity; re-running under a different shuffle
    // parallelism permutes every aggregation's input order, so equal
    // output here is the claim made mechanical
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.mkString("|")).sorted.toSeq
    val conf = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(conf)
    val at4 = Seq(
      canon(Similarity.labelCentroids(spark, dir)),
      canon(Similarity.kmeansCentroids(spark, dir)),
      canon(graft.ops.TextAnalysis.sampleByHash(spark, dir)))
    try {
      spark.conf.set(conf, "1")
      val at1 = Seq(
        canon(Similarity.labelCentroids(spark, dir)),
        canon(Similarity.kmeansCentroids(spark, dir)),
        canon(graft.ops.TextAnalysis.sampleByHash(spark, dir)))
      assert(at1 == at4)
    } finally spark.conf.set(conf, before)
  }

  test("exact dedup finds no duplicates in the synthetic corpus") {
    assert(Dedup.exact(spark, dir).filter(col("n_dups") > 1).count() == 0)
  }

  test("LSH ANN results are a subset of brute-force ranking, same scores") {
    val brute = Similarity.annTopK(spark, dir, k = 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = Similarity.annLsh(spark, dir, k = 10).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      assert(brute(r.getLong(0)) == r.getDouble(1),
        s"score mismatch for vec ${r.getLong(0)}")
    }
    // LSH can't beat brute force: its best is at most the global best
    val bruteBest = Similarity.annTopK(spark, dir, k = 1)
      .head().getDouble(1)
    assert(lsh.head.getDouble(1) <= bruteBest)
  }

  test("span dedup: canonical copy survives, repeats are interval-counted") {
    // constructed corpus with exactly-known overlap at width 20:
    //   doc 0: t1..t30                       — all windows canonical
    //   doc 1: identical to doc 0            — every window a repeat
    //   doc 2: u1..u5, t1..t20, v1..v5       — ONE embedded 20-token span
    //   doc 3: five tokens                   — shorter than the window
    val a = (1 to 30).map("t" + _).mkString(" ")
    val c = ((1 to 5).map("u" + _) ++ (1 to 20).map("t" + _) ++
      (1 to 5).map("v" + _)).mkString(" ")
    val d = (1 to 5).map("s" + _).mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("span_docs").toString
    spark.createDataFrame(Seq((0L, a), (1L, a), (2L, c), (3L, d)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.spanDedup(spark, tmp, width = 20)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(0L) == ((30L, 11L, 0L, 0L)))   // canonical: nothing removed
    assert(got(1L) == ((30L, 11L, 11L, 30L))) // full doc covered by union
    assert(got(2L) == ((30L, 11L, 1L, 20L)))  // embedded span only
    assert(got(3L) == ((5L, 0L, 0L, 0L)))     // no window fits
    val cleaned = Dedup.spanDedupApply(spark, tmp, width = 20)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(cleaned(0L) == ((30L, a)))         // canonical text untouched
    assert(cleaned(1L) == ((0L, "")))         // exact dup fully stripped
    assert(cleaned(2L) == ((10L,              // embedded span cut out
      ((1 to 5).map("u" + _) ++ (1 to 5).map("v" + _)).mkString(" "))))
    assert(cleaned(3L) == ((5L, d)))
  }

  test("span report and span apply agree doc-by-doc: " +
    "n_kept == n_tokens - dup_tokens") {
    val report = Dedup.spanDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1) - r.getLong(4))).toMap
    val kept = Dedup.spanDedupApply(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(report.keySet == kept.keySet && report.nonEmpty)
    report.foreach { case (doc, expected) =>
      assert(kept(doc) == expected,
        s"doc $doc: apply kept ${kept(doc)}, report implies $expected")
    }
  }

  test("span dedup flags the corpus's exact duplicates as fully covered") {
    val full = Dedup.spanDedup(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    val exactDups = Dedup.exact(spark, dir)
      .filter(col("n_dups") > 1).select(col("keeper")).collect()
    // the sf0.001 corpus has no exact dups (pinned below), but every
    // doc must satisfy the coverage bound either way
    full.values.foreach { case (n, _, cov) => assert(cov <= n) }
    assert(exactDups.isEmpty || exactDups.forall { r =>
      full(r.getLong(0))._3 == full(r.getLong(0))._1
    })
  }

  test("bloom probe never misses a true duplicate and agrees with the " +
    "exact delta join") {
    val bloom = Dedup.bloomProbe(spark, dir).collect()
    assert(bloom.nonEmpty)
    // the no-false-negative guarantee must hold row by row
    assert(bloom.forall(_.getBoolean(2)))
    val exact = Dedup.deltaDedup(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    bloom.foreach { r =>
      assert(exact(r.getLong(0)) == r.getBoolean(1))
    }
  }

  test("durable IVF store: probe plan prunes to the query's cell " +
    "partition and matches the cached path exactly") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_spec").toString
    Similarity.writeIvfLayout(spark, dir, out)
    // one directory per cell on disk
    val cellDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.length > 1, "expected multiple cell partitions")
    val loaded = Similarity.annIvfLoaded(spark, dir)
    val plan = loaded.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition pruning in probe plan:\n$plan")
    val cached = Similarity.annIvf(spark, dir)
    assert(loaded.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      cached.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("CDC chunking is shift-robust: a head insertion re-aligns " +
    "boundaries, fixed-width chunking loses them all") {
    import spark.implicits._
    // a long synthetic token stream; doc B = doc A with ONE token
    // prepended — content-defined boundaries must re-align right after
    // the edit, so nearly all of A's chunks reappear in B
    val words = (1 to 400).map(i => s"w${i % 57}x${(i * 7) % 31}")
    val a = words
    val b = "inserted" +: words
    def chunksOf(l: Seq[String]): Set[String] = {
      val df = Seq((1L, l)).toDF("doc_id", "l")
      // reuse the spec-hook form but keep EVERY chunk (occurrence
      // filter off): group on the raw chunk strings instead
      Dedup.cdcChunksOf(df.union(Seq((2L, l)).toDF("doc_id", "l")))
        .collect().map(_.getString(0)).toSet // digests of shared chunks
    }
    val ca = chunksOf(a)
    val cb = chunksOf(b)
    // shared digests: every chunk of A appears (duplicated across the
    // two copies), so ca is A's full chunk digest set; same for B
    val common = ca.intersect(cb)
    assert(ca.nonEmpty && cb.nonEmpty)
    val lost = ca.size - common.size
    assert(lost <= 2,
      s"CDC lost $lost of ${ca.size} chunks after a single head insertion")
    // contrast: fixed-width chunking loses (nearly) everything — the
    // insertion shifts every window
    def fixedChunks(l: Seq[String]): Set[String] =
      l.grouped(Dedup.ChunkWidthDefault).map(_.mkString(" ")).toSet
    val fCommon = fixedChunks(a).intersect(fixedChunks(b))
    assert(fCommon.size <= 1,
      s"fixed chunking unexpectedly survived the shift (${fCommon.size})")
  }

  test("near-dup delta probe == the full LSH restricted to cross-half " +
    "pairs (the incremental probe loses nothing the batch run finds)") {
    val half = graft.Tables.load(spark, dir, "documents").count() / 2
    val full = Dedup.minhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a < half && b >= half }
      .map { case (a, b, j) => (b, a, j) } // (delta, base, est)
      .sortBy(t => (t._1, t._2)).toSeq
    val probe = Dedup.neardupProbe(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(probe == full, "delta probe diverged from batch LSH cross pairs")
    assert(probe.nonEmpty, "fixture should hold cross-half near-dups")
  }

  test("coarse-routed SemDeDup cells: verbatim duplicates co-locate, " +
    "assignment agrees with the flat argmax on most vectors") {
    val exact = Similarity.semDedupCellTable(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val coarse = Similarity.semDedupCellsCoarse(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.keySet == coarse.keySet)
    // identical vectors take identical argmax paths → same cell (the
    // property that keeps verbatim duplicates dedupable)
    val e = graft.Tables.load(spark, dir, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    e.groupBy(_._2).values.filter(_.size > 1).foreach { grp =>
      val cells = grp.map(g => coarse(g._1)).distinct
      assert(cells.size == 1, s"identical vectors split: ${grp.map(_._1)}")
    }
    // the pre-router is a recall trade, not a scramble: the two
    // assignments agree on a solid majority (measured 0.74 on this
    // corpus; bound set loose so data regeneration doesn't flap it)
    val agree = exact.count { case (v, c) => coarse(v) == c }
    assert(agree.toDouble / exact.size > 0.5,
      s"agreement ${agree.toDouble / exact.size}")
  }

  test("CDC apply: canonical copies survive, non-canonical duplicates " +
    "strip, untouched docs pass through intact") {
    import spark.implicits._
    // constructed corpus: B is an exact copy of A (all of B's chunks
    // are non-canonical), C shares nothing
    val a = (1 to 300).map(i => s"w${i % 57}x${(i * 7) % 31}")
    val c = (1 to 120).map(i => s"q${i % 41}z${(i * 11) % 29}")
    val out = Dedup.cdcApplyOf(
        Seq((1L, a), (2L, a), (3L, c)).toDF("doc_id", "l"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(out(1L) == ((a.size.toLong, a.mkString(" "))),
      "canonical copy must survive intact")
    assert(out(2L) == ((0L, "")), "full duplicate must strip entirely")
    assert(out(3L) == ((c.size.toLong, c.mkString(" "))),
      "doc sharing no digest must pass through verbatim")

    // table-level invariants at sf0.001: every doc present, kept
    // bounds respected, report and apply agree on who is touched
    val applied = Dedup.cdcApply(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val toks = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), CrossHash.tokensArrayFast(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(applied.keySet == toks.keySet)
    applied.foreach { case (id, (nKept, clean)) =>
      assert(nKept <= toks(id).size)
      assert(clean.isEmpty || clean.split(" ").length.toLong == nKept)
    }
    val touched = applied.filter { case (id, (n, _)) => n < toks(id).size }
      .keySet
    // a doc the apply left alone reads back verbatim
    (toks.keySet -- touched).take(5).foreach { id =>
      assert(applied(id)._2 == toks(id).mkString(" "))
    }
    // the report and the apply must agree: stripping happens iff some
    // digest is duplicated
    val reported = Dedup.cdcChunks(spark, dir).collect()
    assert(reported.nonEmpty == touched.nonEmpty,
      s"report (${reported.length} dup digests) vs apply " +
        s"(${touched.size} touched docs) disagree")
  }

  test("CDC apply is shift-robust: an inserted token still dedups the " +
    "copy against the original") {
    import spark.implicits._
    val words = (1 to 400).map(i => s"w${i % 57}x${(i * 7) % 31}")
    val df = Seq((1L, words), (2L, "inserted" +: words))
      .toDF("doc_id", "l")
    val out = Dedup.cdcApplyOf(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 is canonical everywhere → intact; doc 2 re-aligns after
    // the head edit, so all but the first chunk (and the inserted
    // token's own chunk) strip away
    assert(out(1L) == words.size.toLong)
    assert(out(2L) <= (words.size + 1) / 10,
      s"shifted copy kept ${out(2L)} of ${words.size + 1} tokens")
  }

  test("incremental IVF store: delta append-assign == written-at-once " +
    "(probe results identical; base files untouched)") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.load(spark, dir, "embeddings")
    // base keeps the seeds (vec_id < 8) and the query (0); ~10% delta
    val isDelta = pmod(xxhash64(col("vec_id")), lit(10)) === 0 &&
      col("vec_id") >= Similarity.IvfCentroids.toLong
    val base = e.filter(!isDelta)
    val delta = e.filter(isDelta)
    assert(delta.count() > 0)
    val inc = java.nio.file.Files
      .createTempDirectory("graft_ivf_inc").toString
    Similarity.assignCells(spark, dir, base)
      .write.partitionBy("cell").mode("overwrite").parquet(inc)
    val baseFiles = new java.io.File(inc).listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .map(f => f.getPath -> f.lastModified).toMap
    Similarity.appendIvfLayout(spark, dir, inc, delta)
    // the append never rewrote a base file
    baseFiles.foreach { case (p, m) =>
      val f = new java.io.File(p)
      assert(f.exists && f.lastModified == m, s"base file touched: $p")
    }
    val full = java.nio.file.Files
      .createTempDirectory("graft_ivf_full").toString
    Similarity.writeIvfLayout(spark, dir, full)
    def res(d: String) = Similarity.probeIvfStore(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(res(inc) == res(full))
  }

  test("coarse DELTA assignment == the whole-table coarse assignment " +
    "at the same k (the gate's corpus-sized-k routing cannot drift)") {
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    val k = math.max(Similarity.IvfCentroids.toLong,
      (n + Similarity.SemDedupCellSize - 1) / Similarity.SemDedupCellSize)
    val viaDelta = Similarity.assignCellsCoarse(spark, dir, e, k)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toMap
    val whole = Similarity.semDedupCellsCoarse(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toMap
    assert(viaDelta == whole)
  }

  test("knn graph: <=k dense-ranked same-cell neighbors per vector, " +
    "served by the bounded-heap aggregate (no window exec)") {
    val k = 3
    val got = Similarity.knnGraph(spark, dir, k).collect()
    assert(got.nonEmpty)
    val cells = Similarity.semDedupCells(spark, dir)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val occupancy = cells.groupBy(_._2).map { case (c, m) => c -> m.size }
    val byVec = got.groupBy(_.getLong(0))
    byVec.foreach { case (v, rows) =>
      val want = math.min(k, occupancy(cells(v)) - 1)
      assert(rows.length == want, s"vec $v: ${rows.length} != $want")
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to want),
        s"vec $v: ranks not dense")
      // neighbors stay inside the vector's own cell
      rows.foreach(r => assert(cells(r.getLong(2)) == cells(v)))
    }
    // every vector with a non-singleton cell appears
    assert(byVec.keySet == cells.keySet.filter(v => occupancy(cells(v)) > 1))
    // the top-k tail must be the bounded heap in BOTH arms; the
    // no-window pin lives on the PLAIN reference arm (the balanced
    // default's assignment legitimately ranks sub-seeds in a window)
    val plan = Similarity.knnGraphPlain(spark, dir, k)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no bounded heap:\n$plan")
    assert(!plan.contains("Window"), s"window exec leaked:\n$plan")
    assert(Similarity.knnGraph(spark, dir, k)
      .queryExecution.executedPlan.toString
      .contains("ObjectHashAggregate"), "default arm lost the heap")
  }

  test("negative sampling: cross-cell only, first-k by probe order, " +
    "matches a driver recompute") {
    val rows = Similarity.negatives(spark, dir).collect()
    assert(rows.nonEmpty)
    val cells = Similarity.semDedupCells(spark, dir)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val n = cells.size.toLong
    val byAnchor = rows.groupBy(_.getLong(0))
    byAnchor.foreach { case (v, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length))
      rs.foreach(r => assert(cells(r.getLong(2)) != cells(v),
        s"anchor $v got a same-cell negative ${r.getLong(2)}"))
    }
    // driver recompute for every anchor
    cells.keySet.foreach { v =>
      val cands = Similarity.NegativeCoeffs.zipWithIndex
        .map { case ((a, b), i) => (i, ((v * a + b) % n + n) % n) }
        .filter { case (_, c) => c != v && cells(c) != cells(v) }
        .groupBy(_._2).map { case (c, ps) => (ps.map(_._1).min, c) }
        .toSeq.sorted.take(3).map(_._2)
      val want = cands
      val gotIds = byAnchor.get(v).map(_.sortBy(_.getLong(1))
        .map(_.getLong(2)).toSeq).getOrElse(Seq.empty)
      assert(gotIds == want, s"anchor $v: $gotIds != $want")
    }
  }

  test("coarse knob: auto-select equals flat below the crossover; " +
    "forced-coarse consumers ride the two-level cells") {
    // n << CoarseConsumerCrossover here, so the default (None) must
    // resolve to the flat assignment bit-for-bit
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(rows(Similarity.knnGraph(spark, dir)) ==
      rows(Similarity.knnGraph(spark, dir, coarse = Some(false))))
    assert(rows(Similarity.negatives(spark, dir)) ==
      rows(Similarity.negatives(spark, dir, coarse = Some(false))))
    assert(rows(Similarity.semDedupPairs(spark, dir)) ==
      rows(Similarity.semDedupPairs(spark, dir, coarse = Some(false))))
    // forced coarse: the graph's neighbor sets are same-cell under the
    // COARSE assignment (and the corpora differ enough here that the
    // two assignments are not identical — the knob is observable)
    val coarseCells = Similarity.semDedupCellsCoarse(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val flatCells = Similarity.semDedupCells(spark, dir)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    assert(coarseCells != flatCells,
      "fixture too small to distinguish the assignments")
    val g = Similarity.knnGraph(spark, dir, coarse = Some(true)).collect()
    assert(g.nonEmpty)
    g.foreach(r => assert(coarseCells(r.getLong(2)) ==
      coarseCells(r.getLong(0)),
      s"coarse graph edge ${r.getLong(0)}->${r.getLong(2)} crosses cells"))
    val occ = coarseCells.groupBy(_._2).map { case (c, m) => c -> m.size }
    assert(g.map(_.getLong(0)).toSet ==
      coarseCells.keySet.filter(v => occ(coarseCells(v)) > 1))
    // forced-coarse negatives reject same-cell under the coarse cells
    val neg = Similarity.negatives(spark, dir, coarse = Some(true))
      .collect()
    assert(neg.nonEmpty)
    neg.foreach(r => assert(coarseCells(r.getLong(2)) !=
      coarseCells(r.getLong(0)),
      s"coarse negatives kept a same-cell candidate for ${r.getLong(0)}"))
  }

  test("remapDense: rank-by-id renumbering to 0..n-1, payload columns " +
    "preserved, stable under a sparse stride layout") {
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val sparse = e.select((col("vec_id") * 1000 + 3).as("vec_id"),
      col("embedding"))
    val out = Similarity.remapDense(spark, sparse).collect()
    val n = out.length
    assert(n == e.count())
    // dense_id is exactly the rank of vec_id
    val byId = out.sortBy(_.getLong(0))
    byId.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("dense_id") == i.toLong,
        s"vec ${r.getLong(0)}: dense_id ${r.getAs[Long]("dense_id")} != $i")
    }
    // the embedding column rides through untouched
    val orig = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    byId.foreach { r =>
      assert(r.getSeq[Float](1) == orig((r.getLong(0) - 3) / 1000))
    }
  }

  test("negativesDense: identity on a dense layout; restores the full " +
    "probe yield on a sparse stride layout (mapped-id parity)") {
    def tuples(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
    val dense = tuples(Similarity.negatives(spark, dir))
    assert(tuples(Similarity.negativesDense(spark, dir)) == dense,
      "dense-layout negativesDense must equal negatives (identity remap)")
    // sparse twin corpus: same vectors, ids strided — modular probes
    // land mostly on nonexistent ids, so the RAW path under-yields
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_sparse_emb").toString
    graft.Tables.load(spark, dir, "embeddings")
      .select((col("vec_id") * 1000 + 3).as("vec_id"),
        col("embedding"), col("label"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val raw = tuples(Similarity.negatives(spark, tmp))
    val viaDense = tuples(Similarity.negativesDense(spark, tmp))
    assert(raw.size < dense.size / 2,
      s"sparse layout should starve the raw probes (got ${raw.size})")
    // the dense path recovers EXACTLY the dense-layout mining, with
    // both id columns mapped through the stride
    assert(viaDense ==
      dense.map { case (v, r, g) => (v * 1000 + 3, r, g * 1000 + 3) },
      "negativesDense did not recover the dense-space mining")
  }

  test("binary ANN: packed sign codes give per-dim mismatch hamming; " +
    "result is the exact-cosine top-k of the bounded hamming candidates") {
    val vecs = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val qv = vecs(0L)
    def ham(v: Seq[Float]): Long =
      v.indices.count(i => (v(i) >= 0) != (qv(i) >= 0)).toLong
    val cand = vecs.keys.filter(_ != 0L).toSeq
      .map(id => (id, ham(vecs(id))))
      .sortBy { case (id, h) => (h, id) }
      .take(Similarity.BinaryCandidates)
    val want = cand
      .map { case (id, h) => (id, h, Similarity.cosSeqInf(vecs(id), qv)) }
      .sortBy { case (id, _, c) => (-c, id) }
      .take(10)
      .map { case (id, h, c) =>
        (id, h, BigDecimal(c).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0) }
    val got = Similarity.annBinary(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want, s"binary ANN diverged from driver recompute")
    // the packed-long XOR/popcount path really is what ran: recompute
    // one code from the column expression and from the sign bits
    val code0 = graft.Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") === 1L)
      .select(Similarity.binaryCode(col("embedding"))).head().getLong(0)
    val wantCode = vecs(1L).foldLeft(0L)((acc, x) =>
      (acc << 1) | (if (x >= 0) 1L else 0L))
    assert(code0 == wantCode, "packed sign code mismatch")
  }

  test("quant recall panel: one row per method, hits reproduce from " +
    "the component queries' own outputs vs the exact top-10") {
    val rows = Similarity.quantRecallEval(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq ==
      Seq("binary", "int8", "mrl8", "pq_adc"))
    val truth = Similarity.annTopK(spark, dir, 10).collect()
      .map(_.getLong(0)).toSet
    val armIds = Map(
      "binary" -> Similarity.annBinary(spark, dir),
      "int8" -> Similarity.annQuantized(spark, dir),
      "mrl8" -> Similarity.annMrl(spark, dir),
      "pq_adc" -> Pq.annPq(spark, dir)
    ).map { case (n, df) =>
      n -> df.select("vec_id").collect().map(_.getLong(0)).toSet }
    rows.foreach { case (m, hits, rec) =>
      assert(hits == (armIds(m) & truth).size.toLong,
        s"$m hits diverged from component recompute")
      assert(rec == math.rint(hits.toDouble / 10 * 10000) / 10000)
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // the ladder ordering sanity on THIS corpus: int8 (least lossy)
    // should not trail the 1-bit code
    val byM = rows.map(r => r._1 -> r._3).toMap
    assert(byM("int8") >= byM("binary"))
  }

  test("filtered ANN: exact arm == driver recompute, IVF arm == " +
    "probed-cells recompute, predicate pushed to the documents scan") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val pass = docs.filter { case (_, l, n) =>
      l == Similarity.FilterLang && n >= Similarity.FilterMinChars }
      .map(_._1).toSet
    assert(pass.nonEmpty && pass.size < docs.length,
      "predicate must be selective but non-empty at spec scale")
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val qv = vecs.find(_._1 == 0L).get._2
    def top10(ids: Set[Long]): Seq[Long] =
      vecs.filter(v => v._1 != 0L && ids(v._1))
        .map(v => (v._1, Similarity.cosSeqInf(v._2, qv)))
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)

    val exact = Similarity.annFiltered(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(exact == top10(pass), "exact filtered arm diverged")

    // IVF arm: argmax cell per vector vs the 8 seed centroids, top-2
    // probed cells for the query, filter inside the probed candidates
    val cents = vecs.filter(_._1 < Similarity.IvfCentroids)
    def cellOf(v: Seq[Float]): Long =
      cents.map(c => (c._1, Similarity.cosSeqInf(v, c._2)))
        .maxBy { case (cid, s) => (s, -cid) }._1
    val probed = cents.map(c => (c._1, Similarity.cosSeqInf(qv, c._2)))
      .sortBy { case (cid, s) => (-s, cid) }.take(2).map(_._1).toSet
    val inProbed = vecs.filter(v => probed(cellOf(v._2))).map(_._1).toSet
    val wantIvf = top10(pass & inProbed)
    val ivf = Similarity.annIvfFiltered(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(ivf == wantIvf, "IVF filtered arm diverged from recompute")
    assert(ivf.forall(pass), "IVF result leaked a filtered-out vector")

    // the metadata predicate must reach the parquet scan
    val plan = Similarity.annFiltered(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(n_chars"),
      "documents predicate not pushed to the scan")
  }

  test("filtered ANN recall panel: hits reproduce from the component " +
    "queries (adaptive arm included) and recall is monotone in nProbe") {
    val rows = Similarity.annFilteredRecallEval(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq ==
      Seq("auto", "auto_pq", "nprobe1", "nprobe2"))
    val truth = Similarity.annFiltered(spark, dir).collect()
      .map(_.getLong(0)).toSet
    rows.foreach { case (m, hits, rec) =>
      val arm = (if (m == "auto") Similarity.annIvfFilteredAuto(spark, dir)
        else if (m == "auto_pq") Pq.annIvfPqFilteredAuto(spark, dir)
        else Similarity.annIvfFiltered(spark, dir,
          nProbe = m.stripPrefix("nprobe").toInt))
        .collect().map(_.getLong(0)).toSet
      assert(hits == (arm & truth).size.toLong,
        s"$m hits diverged from component recompute")
      assert(rec == math.rint(hits.toDouble / 10 * 10000) / 10000)
    }
    val byM = rows.map(r => r._1 -> r._2).toMap
    assert(byM("nprobe2") >= byM("nprobe1"),
      "recall must be monotone in nProbe")
    assert(byM("auto") >= byM("nprobe1"),
      "the adaptive probe can never see fewer cells than nProbe=1")
  }

  test("adaptive filtered probe: ladder choice reproduces from a " +
    "driver recompute, equals the fixed-nProbe ranking at its chosen " +
    "rung, and the loaded form matches the in-memory form") {
    // driver recompute of the escalation rule
    val vecs = graft.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
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
    val ladder = Similarity.autoLadder(ranked.length)
    val target = Similarity.FilteredAutoOversample * 10
    val chosenNp = ladder.find(np =>
      ranked.take(np).map(c => byCell.getOrElse(c, 0)).sum >= target)
      .getOrElse(ranked.length)
    val probedSet = ranked.take(chosenNp).toSet
    val wantIds = vecs
      .filter(v => v._1 != 0L && pass(v._1) && probedSet(cellOf(v._2)))
      .map(v => (v._1, Similarity.cosSeqInf(v._2, qv)))
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSeq
    val auto = Similarity.annIvfFilteredAuto(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(auto.map(_._1) == wantIds,
      s"adaptive probe diverged from the rule recompute (np=$chosenNp)")
    // at its chosen rung the adaptive ranking == the fixed-nProbe one
    assert(auto == Similarity.annIvfFiltered(spark, dir,
        nProbe = chosenNp)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq,
      "auto != fixed nProbe at the same rung")
    // durable-store form: identical output
    val out = graft.TempDirs.scratch("graft_fann_auto")
    Similarity.writeIvfLayout(spark, dir, out)
    assert(Similarity.probeIvfStoreFilteredAuto(spark, out, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == auto,
      "loaded adaptive probe diverged from the in-memory form")
  }

  test("loaded-ANN harness stores are session-cached on corpus " +
    "content: repeat calls reuse one store, a rewritten corpus gets " +
    "a fresh one") {
    val s1 = Similarity.cachedIvfStore(spark, dir)
    assert(Similarity.cachedIvfStore(spark, dir) == s1,
      "second call must reuse the session store")
    // the loaded entries answer from it (and still match in-memory)
    assert(Similarity.annIvfLoaded(spark, dir).collect().toSeq ==
      Similarity.annIvf(spark, dir).collect().toSeq)
    // rewrite a corpus copy in place: content stamp changes → new store
    val root = java.nio.file.Files
      .createTempDirectory("graft_store_cache").toString
    spark.read.parquet(s"$dir/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$root/embeddings.parquet")
    val c1 = Similarity.cachedIvfStore(spark, root)
    assert(Similarity.cachedIvfStore(spark, root) == c1)
    // NO sleep: the stamp's footer-tail CRC (StoreStamp) must catch a
    // rewrite landing inside one mtime tick
    spark.read.parquet(s"$dir/embeddings.parquet")
      .limit(400).coalesce(1)
      .write.mode("overwrite").parquet(s"$root/embeddings.parquet")
    assert(Similarity.cachedIvfStore(spark, root) != c1,
      "rewritten corpus must not serve the stale store")
  }

  test("adaptive filtered probe stops at the cap on a starved corpus " +
    "and then IS the exact pre-filtered truth (recall 1.0)") {
    // constructed corpus: copy sf0.001 but leave < target qualifying
    // docs, so every ladder rung under-fills and the rule must walk to
    // the cap (all cells probed == exact pre-filter scan)
    val root = java.nio.file.Files
      .createTempDirectory("graft_fann_starve").toString
    val docs = graft.Tables.load(spark, dir, "documents")
    val qualifying = docs
      .filter(col("lang") === Similarity.FilterLang &&
        col("n_chars") >= Similarity.FilterMinChars)
      .select("doc_id").orderBy("doc_id").limit(7)
      .collect().map(_.getLong(0)).toSet
    // demote every other qualifying doc below the length gate
    docs.withColumn("n_chars",
        when(col("lang") === Similarity.FilterLang &&
          col("n_chars") >= Similarity.FilterMinChars &&
          !col("doc_id").isin(qualifying.toSeq: _*),
          lit(0L)).otherwise(col("n_chars")))
      .write.mode("overwrite").parquet(s"$root/documents.parquet")
    spark.read.parquet(s"$dir/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$root/embeddings.parquet")
    val auto = Similarity.annIvfFilteredAuto(spark, root)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = Similarity.annFiltered(spark, root)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(exact.nonEmpty && exact.size < 10,
      "fixture must actually starve the filter")
    assert(auto == exact,
      "cap-level adaptive probe must equal the exact filtered truth")
  }

  test("filtered ANN durable-store probe == in-memory filtered " +
    "ranking, and its scan is partition-pruned to the probed cells") {
    val mem = Similarity.annIvfFiltered(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val out = graft.TempDirs.scratch("graft_fann_store")
    Similarity.writeIvfLayout(spark, dir, out)
    val loadedDf = Similarity.probeIvfStoreFiltered(spark, out, dir)
    val loaded = loadedDf.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(loaded == mem,
      "durable filtered probe diverged from the in-memory ranking")
    val plan = loadedDf.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"store scan not partition-pruned:\n$plan")
  }

  test("balanced k-NN graph: identical to the plain graph when no " +
    "cell exceeds the cap; on a clustered corpus the split engages, " +
    "near-copies stay co-located, and candidate pairs shrink") {
    // uniform corpus (sf0.001: occupancy ~62 ≪ cap) — balanced == plain
    assert(Similarity.knnGraphBalanced(spark, dir).collect().toSeq ==
      Similarity.knnGraph(spark, dir).collect().toSeq,
      "no-split corpus must leave the graph untouched")
    // clustered corpus: the base vectors plus 600 near-copies of one
    // vector — its argmax cell oversizes far past the cap
    val root = java.nio.file.Files
      .createTempDirectory("graft_knn_bal").toString
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n0 = e.count()
    val blob = e.filter(col("vec_id") === 100)
      .crossJoin(spark.range(600).select(col("id")))
      .select((col("id") + n0).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + (pmod(col("id") * 31 + i, lit(7)).cast("float") -
            lit(3.0f)) * lit(1e-4f)).as("embedding"))
    e.unionByName(blob).coalesce(1)
      .write.mode("overwrite").parquet(s"$root/embeddings.parquet")
    val cells = Similarity.balancedCellsOf(spark, root, None)
      .select("vec_id", "cell", "sub").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val occByCell = cells.groupBy(c => c._2).view.mapValues(_.length)
    assert(occByCell.values.max > Similarity.BalancedCellCap.toInt ||
      cells.exists(_._3 != 0L),
      "fixture must actually trigger a split")
    assert(cells.exists(_._3 != 0L), "no sub-cell assigned")
    // near-copies co-locate: the blob rows that share vec 100's cell
    // overwhelmingly share ONE (cell, sub) bucket with each other
    val blobBuckets = cells.filter(_._1 >= n0)
      .groupBy(c => (c._2, c._3)).view.mapValues(_.length).toMap
    assert(blobBuckets.values.max >= 300,
      s"near-copies scattered: $blobBuckets")
    // the balance actually bounds pair work: sum occ² over (cell,sub)
    // buckets < sum occ² over raw cells
    val rawOcc = Similarity.semDedupCellsOf(spark, root, None)
      .groupBy("cell").count().collect().map(_.getLong(1))
    val balOcc = cells.groupBy(c => (c._2, c._3)).map(_._2.length.toLong)
    assert(balOcc.map(c => c * c).sum < rawOcc.map(c => c * c).sum,
      "split did not reduce candidate-pair volume")
    // and the graph itself still returns k rows per vector, ranked by
    // the same tie rule (driver recompute on one split bucket)
    val graph = Similarity.knnGraphBalanced(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(graph.nonEmpty && graph.groupBy(_._1).values
      .forall(_.map(_._2).toSeq == (1 to 3).map(_.toLong)),
      "per-vector ranks must be 1..3")
    // the semdedup PAIR family rides the same routing decision:
    // balanced default == plain on the no-skew corpus, and on the
    // clustered corpus the bucket pairs are a strict SUBSET of the
    // plain cell pairs (the split can only separate, never invent)
    def pairRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairRows(Similarity.semDedupPairs(spark, dir)) ==
      pairRows(Similarity.semDedupPairsPlain(spark, dir)),
      "no-split corpus must leave the pair set untouched")
    // (the COST shrink is the Σocc² assert above; the reported pair
    // set shrinks only when an over-threshold pair straddles subs —
    // near-copies co-locate by design, so subset is the contract)
    assert(pairRows(Similarity.semDedupPairs(spark, root)).subsetOf(
      pairRows(Similarity.semDedupPairsPlain(spark, root))),
      "balanced pairs must be a subset of the plain cell pairs")
  }

  test("semDedup recall eval: cell pairs are a SUBSET of exact truth " +
    "(precision structurally 1), counts reproduce, coarse comparable") {
    val r = Similarity.semDedupEval(spark, dir).head()
    val (nc, nt, nh, rec) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(nh == nc, "a cell-bounded pair failed the exact truth check")
    assert(nt > 0 && nh <= nt && rec > 0.0 && rec <= 1.0)
    assert(nt == Similarity.embedNearDup(spark, dir).count())
    assert(nc == Similarity.semDedupPairs(spark, dir)
      .filter(col("vec_a") < 200 && col("vec_b") < 200).count())
    // the coarse-routed panel holds the same subset property; its
    // recall may differ (different boundaries — that's the point of
    // measuring both)
    val c = Similarity.semDedupEval(spark, dir, Some(true)).head()
    assert(c.getLong(2) == c.getLong(0))
    assert(c.getLong(1) == nt, "truth arm must not depend on the knob")
  }

  test("sampled dedup eval: both arms equal the full arms filtered " +
    "to sample-touching pairs, the counts reproduce, and an " +
    "at-or-below-target corpus degrades to the full panel") {
    import graft.functions.GraftFunctions
    // a target below the corpus size so the touching logic engages
    val target = 100L
    val n = graft.Tables.load(spark, dir, "documents").count()
    val thr = (target * 10000L + n - 1) / n
    val smp = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        pmod(GraftFunctions.polyhash(col("text"), graft.ops.CrossHash.P),
          lit(10000L)).as("h"))
      .filter(col("h") < thr)
      .collect().map(_.getLong(0)).toSet
    assert(smp.nonEmpty && smp.size < n, "sample must be a proper subset")
    def touching(ps: Seq[(Long, Long)]): Set[(Long, Long)] =
      ps.filter(p => smp(p._1) || smp(p._2)).toSet
    val fullLsh = Dedup.minhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val fullTruth = Dedup.jaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val wantL = touching(fullLsh)
    val wantT = touching(fullTruth)
    val row = Dedup.dedupEvalSampled(spark, dir, target).head()
    assert(row.getLong(0) == smp.size.toLong, "n_sample diverged")
    assert(row.getLong(1) == wantL.size.toLong,
      s"n_candidates ${row.getLong(1)} != touching LSH ${wantL.size}")
    assert(row.getLong(2) == wantT.size.toLong,
      s"n_true ${row.getLong(2)} != touching truth ${wantT.size}")
    assert(row.getLong(3) == (wantL & wantT).size.toLong)
    assert(wantT.nonEmpty, "fixture must produce touching truth pairs")
    // default target ≥ this corpus: threshold caps, panel == dedupEval
    val capped = Dedup.dedupEvalSampled(spark, dir).head()
    val full = Dedup.dedupEval(spark, dir).head()
    assert(capped.getLong(0) == n)
    assert((1 to 5).forall(i => capped.get(i) == full.get(i - 1)),
      s"capped panel must BE the full panel: $capped vs $full")
  }

  test("dedup eval: one-row panel consistent with the two pair sets " +
    "it compares") {
    val r = Dedup.dedupEval(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    val lsh = Dedup.minhashLsh(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val truth = Dedup.jaccard(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(row.getLong(0) == lsh.size && row.getLong(1) == truth.size)
    assert(row.getLong(2) == (lsh & truth).size)
    assert(row.getDouble(3) >= 0 && row.getDouble(3) <= 1)
    assert(row.getDouble(4) >= 0 && row.getDouble(4) <= 1)
  }

  test("ANN recall eval: one row per eval query, hits = |ivf ∩ brute| " +
    "by driver recompute, recall = hits/10") {
    val got = Similarity.annRecallEval(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    val cells = Similarity.ivfCells(spark, dir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1),
        r.getAs[Number](2).longValue))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      a.indices.foreach { i =>
        ab += a(i).toDouble * b(i); aa += a(i).toDouble * a(i)
        bb += b(i).toDouble * b(i) }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    got.foreach { r =>
      val qid = r.getLong(0)
      val (_, qv, qcell) = cells.find(_._1 == qid).get
      val scored = cells.filter(_._1 >= 4)
        .map { case (id, v, cl) => (id, cl, cos(qv, v)) }
      def topk(xs: Seq[(Long, Long, Double)]): Set[Long] =
        xs.sortBy { case (id, _, c) => (-c, id) }.take(10).map(_._1).toSet
      val brute = topk(scored.toSeq)
      val ivf = topk(scored.filter(_._2 == qcell).toSeq)
      val hits = (brute & ivf).size.toLong
      assert(r.getLong(1) == hits, s"q$qid hits ${r.getLong(1)} != $hits")
      assert(r.getDouble(2) == math.rint(hits / 10.0 * 1e4) / 1e4)
    }
  }

  test("MRL truncated-dim ANN: exact top-k over 8-dim prefixes, " +
    "matches a driver recompute; full-dim ranking differs (real knob)") {
    val dims = 8
    val got = Similarity.annMrl(spark, dir, k = 10, dims = dims).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.length == 10 && got.map(_._1).distinct.length == 10)
    val vecs = graft.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).take(dims)).toMap
    def cosP(a: Seq[Float], b: Seq[Float]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        ab += x * y; aa += x * x; bb += y * y
      }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val q = vecs(0L)
    val want = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cosP(q, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10)
      .map { case (id, c) => (id, math.rint(c * 1e4) / 1e4) }
    assert(got == want, s"got=$got want=$want")
    // the truncation is a real ranking knob on this fixture, not a
    // no-op: the full-dim top-10 differs
    val full = Similarity.annTopK(spark, dir, 10).collect()
      .map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet != full)
  }

  test("durable-store centroid ranking collects seeds ONCE per store " +
    "per session (repeat probes hit the cache)") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_seedcache").toString
    Similarity.writeIvfLayout(spark, dir, out)
    val first = Similarity.probeIvfStore(spark, out, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val cached = Similarity.storeSeedCache.get(out)
    assert(cached != null, "probe did not populate the seed cache")
    val second = Similarity.probeIvfStore(spark, out, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(Similarity.storeSeedCache.get(out) eq cached,
      "repeat probe re-collected the store's seed centroids")
    assert(second == first)
    // a full-store REWRITE at the same path invalidates the cache —
    // the writeIvfLayout contract, not a caller discipline
    Similarity.writeIvfLayout(spark, dir, out)
    assert(Similarity.storeSeedCache.get(out) == null,
      "store rewrite left stale seed centroids cached")
  }

  test("hybrid RRF: fused scores recompute from the arm ranks, " +
    "descending, no rankless rows") {
    val rows = Similarity.hybridRrf(spark, dir).collect()
    assert(rows.length == 10)
    def c(r: Any): Long = r match {
      case null      => 0L
      case l: Long   => 1000000L / (l + 60L)
    }
    rows.foreach { r =>
      val (lr, sr) = (r.get(1), r.get(2))
      assert(lr != null || sr != null, "a fused row must rank in an arm")
      Seq(lr, sr).collect { case l: Long => l }
        .foreach(l => assert(l >= 1 && l <= 10))
      assert(r.getLong(3) == c(lr) + c(sr),
        s"doc ${r.getLong(0)}: rrf ${r.getLong(3)} != ${c(lr) + c(sr)}")
    }
    val scores = rows.map(_.getLong(3)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("FILTERED hybrid RRF: every fused doc passes the metadata " +
    "filter, arms reproduce from their components, fusion arithmetic " +
    "holds") {
    val rows = Similarity.hybridRrfFiltered(spark, dir).collect()
    assert(rows.nonEmpty)
    val pass = graft.Tables.load(spark, dir, "documents")
      .filter(col("lang") === Similarity.FilterLang &&
        col("n_chars") >= Similarity.FilterMinChars)
      .collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(pass(r.getLong(0)),
      s"doc ${r.getLong(0)} leaked past the filter"))
    // arm recomputes: ranks re-derived by the entry's own window rule
    // (rounded score desc, id asc) over each arm's top-10 output
    val lexIds = graft.queries.IrSql.q10Bm25Filtered(spark, dir,
        Similarity.filterIds(spark, dir)
          .select(col("vec_id").as("doc_id")))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (d, s) => (-s, d) }.map(_._1).toSeq
    val semIds = Similarity.annIvfFilteredAuto(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (d, s) => (-s, d) }.map(_._1).toSeq
    def c(r: Any): Long = r match {
      case null    => 0L
      case l: Long => 1000000L / (l + 60L)
    }
    rows.foreach { r =>
      val d = r.getLong(0)
      val (lr, sr) = (r.get(1), r.get(2))
      assert(lr != null || sr != null)
      if (lr != null)
        assert(lexIds(lr.asInstanceOf[Long].toInt - 1) == d,
          s"doc $d lex_rank mismatch")
      if (sr != null)
        assert(semIds(sr.asInstanceOf[Long].toInt - 1) == d,
          s"doc $d sem_rank mismatch")
      assert(r.getLong(3) == c(lr) + c(sr))
    }
  }
}
