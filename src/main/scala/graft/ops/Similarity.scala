package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Stage.StageOps
import graft.Tables

/** Similarity search over the `embeddings` table (`ARRAY<FLOAT>` column).
  *
  * Dot products / norms are sequential left-folds in double arithmetic
  * (`aggregate` over `zip_with`), bit-identical to the DuckDB oracle's
  * `list_reduce` (see [[CrossHash]] rationale) — so cosine scores, top-k
  * cutoffs and thresholds agree exactly across engines.
  *
  * Scale posture (100 TB): brute-force top-k against one query vector is
  * a single narrow map + TakeOrderedAndProject — linear scan, no shuffle,
  * embarrassingly parallel; that IS the right plan for one query at any
  * scale. The quadratic pair queries are bounded samples (correctness
  * surface). The scale path for repeated queries is [[lshBuckets]]:
  * deterministic random-hyperplane signs bucket vectors so candidate
  * generation is a bucket equi-join instead of all-pairs; re-rank with
  * exact cosine inside the bucket ([[annLsh]]).
  */
object Similarity {

  private def emb(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, dir, "embeddings")
  }

  /** Σ a_i * b_i as a sequential double fold (oracle bit-parity).
    * Declarative reference form; [[cosine]] uses the one-pass native
    * [[graft.functions.CosineExpr]] with identical fold arithmetic
    * (HOFs evaluate interpreted — ~6× first-run penalty). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine(a, b)

  /** THE driver-side sequential-fold cosine (dimension order, one
    * running double per term — the oracle's `list_reduce` arithmetic),
    * NaN → +∞ so zero vectors rank first like the engines' DESC sorts.
    * Single definition shared by every driver-side ranking ([[graft
    * .ops.Pq]] coarse probes, [[graft.query.IvfServer]] routing) so
    * the determinism-critical fold can never fork. */
  private[graft] def cosSeqInf(a: Seq[Float], b: Seq[Float]): Double = {
    var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      ab += x * y; aa += x * x; bb += y * y; i += 1
    }
    val c = ab / (math.sqrt(aa) * math.sqrt(bb))
    if (java.lang.Double.isNaN(c)) Double.PositiveInfinity else c
  }

  /** Exact pairwise cosine over a small sample (vec_id < 100) — SURVEY
    * §2.9 Q25 contract; deterministic pair ordering. */
  def cosinePairs(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).filter(col("vec_id") < 100)
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        // + 0.0 canonicalizes IEEE -0.0 (Spark's round drops the sign
        // via BigDecimal; DuckDB keeps it — both sides normalize).
        (round(cosine(col("a.embedding"), col("b.embedding")), 4) + 0.0)
          .as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  /** Brute-force cosine top-k for the query vector vec_id=0: broadcast
    * the 1-row query side, scan once, TakeOrderedAndProject. */
  def annTopK(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), cosine(col("embedding"), col("qv")).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("c"), 4).as("cos"))
  }

  /** Matryoshka-style TRUNCATED-dimension ANN: rank by exact cosine
    * over only the FIRST `dims` dimensions of each embedding — the
    * memory/bandwidth knob of MRL-trained models, where prefixes are
    * usable sub-embeddings (Kusupati et al.), orthogonal to int8/PQ
    * compression: nothing is re-encoded, the scorer just folds fewer
    * dimensions (dims/D of the arithmetic and, with a prefix-sliced
    * stored column, dims/D of the scan bytes). Same plan shape as
    * [[annTopK]] (broadcast 1-row query, one scan,
    * TakeOrderedAndProject); recall vs the full-dim ranking is the
    * measured trade (spec reports overlap@k). */
  def annMrl(spark: SparkSession, dir: String, k: Int = 10,
             dims: Int = 8): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(slice(col("embedding"), 1, dims).as("qv"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        cosine(slice(col("embedding"), 1, dims), col("qv")).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("c"), 4).as("cos"))
  }

  /** Deterministic probe coefficients for [[negatives]] — fixed so the
    * DuckDB oracle embeds the identical affine maps. */
  val NegativeCoeffs: Seq[(Long, Long)] =
    Seq((7L, 3L), (11L, 5L), (13L, 9L), (17L, 2L), (19L, 6L), (23L, 4L))

  /** CONTRASTIVE NEGATIVE SAMPLING — the training-pair miner beside
    * [[knnGraph]]'s positives: for each anchor vector, up to `k`
    * deterministic pseudo-random negatives drawn by fixed affine
    * probes (cand = (vec_id·a + b) mod n), REJECTING candidates in
    * the anchor's own cell (a same-cell candidate is plausibly a
    * near-duplicate — the false-negative trap of random sampling).
    * Reproducible run-over-run and engine-over-engine (no rand());
    * per-anchor work is |coeffs| probes + two bounded equi-joins, and
    * the first-k-by-probe-order selection rides the bounded-heap
    * aggregate (score = −probe), not a window sort. Anchors whose six
    * probes all land in-cell or on themselves yield fewer than k
    * rows — the contract, mirrored by the oracle. The probes assume a
    * DENSE id space 0..n−1 (a probe landing on a nonexistent id is
    * dropped by the candidate join — deterministic, but sparse id
    * layouts get fewer negatives; [[negativesDense]] composes the
    * [[remapDense]] renumbering in front for exactly that case). The
    * `coarse` knob routes the cell assignment through the two-level
    * router ([[semDedupCellsOf]]; `None` auto-selects past
    * [[CoarseConsumerCrossover]] — the CONSUMER ledger, not the
    * bare-assignment [[CoarseAssignCrossover]]). */
  def negatives(spark: SparkSession, dir: String, k: Int = 3,
                coarse: Option[Boolean] = None): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    negativesFromCells(
      semDedupCellsOf(spark, dir, coarse)
        .select(col("vec_id"), col("cell")), k)
  }

  /** The probe miner shared by [[negatives]] (raw ids) and
    * [[negativesDense]] (remapped ids): fixed affine probes mod n over
    * a (vec_id, cell) assignment, same-cell rejection, first-k by
    * probe order through the bounded heap. */
  private def negativesFromCells(cellsIn: DataFrame, k: Int): DataFrame = {
    val cells = cellsIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = cells.count()
    val probes = NegativeCoeffs.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i.toLong).as("p"),
        pmod(col("vec_id") * a + b, lit(n)).as("cand"))
    }
    val cand = cells.select(col("vec_id"), col("cell").as("acell"),
        explode(array(probes: _*)).as("pc"))
      .select(col("vec_id"), col("acell"),
        col("pc.p").as("p"), col("pc.cand").as("cand"))
      .filter(col("cand") =!= col("vec_id"))
      .join(cells.select(col("vec_id").as("cand"),
        col("cell").as("ccell")), "cand")
      .filter(col("ccell") =!= col("acell"))
      // two probes can map to the same candidate: keep its first probe
      .groupBy(col("vec_id"), col("cand"))
      .agg(min(col("p")).as("p"))
    cand.groupBy(col("vec_id"))
      .agg(graft.functions.GraftFunctions
        .topkBy((-col("p")).cast("double"), col("cand"), k).as("top"))
      .select(col("vec_id"), posexplode(col("top")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("neg_rank"),
        col("col.id").as("neg_id"))
      .orderBy("vec_id", "neg_rank")
  }

  /** DENSE-ID REMAP — deterministic rank-by-id renumbering of a
    * vector frame onto the contiguous space 0..n−1, appended as a
    * `dense_id` column: the standard precondition of any MODULAR
    * probing scheme ([[negatives]]' affine probes land mostly on
    * nonexistent ids under sparse layouts — post-dedup corpora,
    * strided shards — silently shrinking the yield). Two-phase like
    * the q03 docno numbering: range-partition by vec_id, count per
    * partition (one long each to the driver), offset each partition
    * by the running total — no global window, no serial task, exactly
    * one shuffle at any corpus size. Output is eagerly cut
    * (lineage-free; the range-partitioned staging cache releases
    * immediately). */
  def remapDense(spark: SparkSession, vectors: DataFrame): DataFrame = {
    val p = spark.sessionState.conf.numShufflePartitions
    val sorted = vectors
      .repartitionByRange(p, col("vec_id"))
      .sortWithinPartitions("vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // LONG per-partition counts (Iterator.size wraps past 2^31 — the
    // docnoMappingScalable rationale)
    val counts = sorted.rdd.mapPartitions { it =>
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      Iterator.single(n)
    }.collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types
        .StructField("dense_id", org.apache.spark.sql.types.LongType,
          nullable = false))
    // partition id = the RDD partition index, NOT TaskContext (the
    // coalesce trap documented at the q03 numbering)
    val out = spark.createDataFrame(
      sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        var n = bc.value(pid) - 1
        it.map { r =>
          n += 1
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ n)
        }
      }, schema).stageEager()
    sorted.unpersist()
    out
  }

  /** [[negatives]] over a DENSELY REMAPPED id space — the full-yield
    * form for sparse vec_id layouts: [[remapDense]] renumbers the
    * corpus to 0..n−1, the probe miner runs entirely in dense space
    * (seeds, cells, affine probes — so every probe lands on a real
    * vector and yield returns to ~k per anchor), and the emitted
    * anchor/negative ids translate back to the ORIGINAL vec_ids
    * through two bounded equi-joins against the map. On an
    * already-dense corpus this is [[negatives]] exactly (the remap is
    * the identity). */
  def negativesDense(spark: SparkSession, dir: String,
                     k: Int = 3,
                     coarse: Option[Boolean] = None): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val dense = remapDense(spark,
      emb(spark, dir).select(col("vec_id"), col("embedding")))
    val m = dense.select(col("vec_id").as("orig_id"), col("dense_id"))
    val e2 = dense.select(col("dense_id").as("vec_id"), col("embedding"))
    val n = e2.count()
    val kCells = math.max(IvfCentroids.toLong,
      (n + SemDedupCellSize - 1) / SemDedupCellSize)
    val cells =
      (if (coarse.getOrElse(n >= CoarseConsumerCrossover))
        coarseCellsAgainst(e2,
          e2.filter(col("vec_id") < kCells)
            .select(col("vec_id").as("cid"), col("embedding").as("cvec")),
          kCells)
      else argmaxCells(e2, kCells))
        .select(col("vec_id"), col("cell"))
    negativesFromCells(cells, k)
      .join(m.withColumnRenamed("dense_id", "vec_id")
        .withColumnRenamed("orig_id", "anchor"), "vec_id")
      .join(m.select(col("dense_id").as("neg_id"),
        col("orig_id").as("neg")), "neg_id")
      .select(col("anchor").as("vec_id"), col("neg_rank"),
        col("neg").as("neg_id"))
      .orderBy("vec_id", "neg_rank")
  }

  /** k-NN JOIN: top-k cosine neighbors for EVERY query in a query set
    * (vec_id < 4 here) — the batched form of [[annTopK]] and the shape
    * a retrieval/eval pipeline actually runs. The query set broadcasts
    * into one scan of the corpus; per-query top-k rides the custom
    * bounded-heap aggregate (`graft_topk`: O(k) state per query per
    * partition, map-side partials through ObjectHashAggregate) — with
    * a large query batch this shuffles k rows per (query, partition)
    * instead of window-sorting every scored row. */
  def annKnnJoin(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    e.filter(col("vec_id") >= 4)
      .crossJoin(broadcast(q))
      .select(col("qid"), col("vec_id"),
        cosine(col("embedding"), col("qv")).as("c"))
      .groupBy(col("qid"))
      .agg(graft.functions.GraftFunctions
        .topkBy(col("c"), col("vec_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rn"),
        col("col.id").as("vec_id"),
        // + 0.0: IEEE -0.0 canonicalization (see cosinePairs)
        (round(col("col.score"), 4) + 0.0).as("cos"))
      .orderBy("qid", "rn")
  }

  /** ANN RECALL EVALUATION — [[graft.queries.IrSql.q39IrEval]]'s
    * vector twin: for each query in the evaluation set (vec_id < 4,
    * the [[annKnnJoin]] batch), compare the IVF single-cell ranking
    * against ground-truth brute force over the IDENTICAL candidate
    * pool and report recall@k — the number every ANN deployment tracks
    * beside its latency. One broadcast of the query set into one
    * scored scan feeds BOTH arms (the ivf arm just adds the cell
    * filter); per-query top-k rides the bounded heap on each side.
    * Query-set-bounded everywhere after the scan. */
  def annRecallEval(spark: SparkSession, dir: String,
                    k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val cells = ivfCells(spark, dir)
    val q = cells.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("cell").as("qcell"))
    val scored = cells.filter(col("vec_id") >= 4)
      .crossJoin(broadcast(q))
      .select(col("qid"), col("qcell"), col("vec_id"), col("cell"),
        cosine(col("embedding"), col("qv")).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def topk(df: DataFrame): DataFrame = df.groupBy(col("qid"))
      .agg(graft.functions.GraftFunctions
        .topkBy(col("c"), col("vec_id"), k).as("top"))
      .select(col("qid"), explode(col("top.id")).as("vec_id"))
    val brute = topk(scored)
    val ivf = topk(scored.filter(col("cell") === col("qcell")))
    val hits = brute.join(ivf, Seq("qid", "vec_id"))
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    q.select(col("qid")).join(hits, Seq("qid"), "left")
      .na.fill(0L, Seq("hits"))
      .select(col("qid"), col("hits"),
        round(col("hits").cast("double") / k, 4).as("recall10"))
      .orderBy("qid")
  }

  /** QUANTIZATION-LADDER recall panel — the measurement that pairs
    * with [[annRecallEval]]: that one isolates ROUTING loss (IVF cell
    * restriction vs brute force over identical scoring); this one
    * isolates QUANTIZATION loss — recall@k of each compressed
    * representation's full-corpus ranking (int8 [[annQuantized]],
    * PQ-ADC [[Pq.annPq]], sign-bit [[annBinary]], MRL prefix
    * [[annMrl]]) against the exact fp32 top-k ([[annTopK]]). One row
    * per method — the table a deployment reads to pick its point on
    * the memory/recall curve. Every arm IS the already-oracle-checked
    * standalone query (no re-implementation to drift); each is a
    * bounded top-k scan, the truth list broadcasts (k rows), so the
    * panel costs the sum of its arms at any corpus size. */
  def quantRecallEval(spark: SparkSession, dir: String,
                      k: Int = 10): DataFrame = {
    val truth = broadcast(annTopK(spark, dir, k).select(col("vec_id")))
    // k threads into EVERY arm (r11 ADVICE: the arms previously ran at
    // their default k=10, so k != 10 silently divided a top-10 arm's
    // hits by k), and the recall column is named for the k actually
    // evaluated — the default panel keeps the oracle's `recall10`
    val arms: Seq[(String, DataFrame)] = Seq(
      "binary" -> annBinary(spark, dir, k),
      "int8" -> annQuantized(spark, dir, k),
      "mrl8" -> annMrl(spark, dir, k),
      "pq_adc" -> Pq.annPq(spark, dir, k))
    arms.map { case (name, df) =>
      df.select(col("vec_id")).join(truth, Seq("vec_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(name).as("method"), col("hits"),
          round(col("hits").cast("double") / k, 4).as(s"recall$k"))
    }.reduce(_ unionByName _).orderBy("method")
  }

  /** Embedding near-dup: pairs with cosine ≥ [[SemDedupThreshold]] on
    * the vec_id < 200 sample — the EXACT-all-pairs correctness surface
    * (every pair's cosine is checked, nothing cell-bounded). The
    * corpus-scale path over the full table is [[semDedupPairs]] /
    * [[semDedupFull]]; this sampled form stays as the exhaustive
    * cross-check of the pair scores themselves. */
  def embedNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).filter(col("vec_id") < 200)
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .filter(col("c") >= SemDedupThreshold)
      .select(col("vec_a"), col("vec_b"), round(col("c"), 4).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  /** SemDeDup-style semantic clustering: connected components over the
    * embedding near-dup graph ([[embedNearDup]]'s cosine ≥ 0.35 pairs)
    * — one representative (min vec_id) per cluster of semantically
    * near-identical items, the embedding-space counterpart of the
    * lexical q24 duplicate clusters. Reuses the same union-find /
    * distributed-propagation machinery. */
  def semanticClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.clusters(spark,
        embedNearDup(spark, dir)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .select(col("doc_id").as("vec_id"), col("cluster"), col("keeper"))
      .orderBy("vec_id")

  /** JOINT lexical+semantic dedup — the full modern pipeline gate in
    * one plan: a doc survives if it is its exact-duplicate group's
    * keeper (min doc_id per md5) AND not a non-keeper member of a
    * semantic cluster ([[semanticClusters]]; vec_id aligns 1:1 with
    * doc_id in the testdata). Docs outside the near-dup graph are
    * trivially semantic keepers. Both gates are bounded-size joins
    * against the corpus scan. */
  def jointDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables.load(spark, dir, "documents")
    val lexKeepers = d.groupBy(md5(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val semDrop = semanticClusters(spark, dir)
      .filter(col("keeper") === 0)
      .select(col("vec_id").as("doc_id"))
    d.join(lexKeepers, "doc_id")
      .join(semDrop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Number of random hyperplanes = LSH signature bits. */
  val Planes = 16

  /** Single-scan bucket computation. Hyperplane weights are
    * arithmetic-only (no stored plane matrix):
    * w(j, d) = ((j*1103515245 + d*12345) % 1001 - 500) / 500 ∈ [-1, 1].
    * Per plane, the projection is the same left-fold over dims (double
    * adds in index order) as the DuckDB oracle's list_reduce —
    * bit-identical — without a 16× row explode. */
  private val bucketUdf = udf((e: Seq[Float]) => {
    var bucket = 0L
    var j = 0
    while (j < Planes) {
      var acc = 0.0
      var d = 0
      while (d < e.length) {
        val w = ((j * 1103515245L + d * 12345L) % 1001L - 500L).toDouble / 500.0
        acc += e(d).toDouble * w
        d += 1
      }
      if (acc > 0) bucket |= 1L << j
      j += 1
    }
    bucket
  })

  /** Sign-of-projection LSH bucket id (16-bit) per vector. */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(col("vec_id"), bucketUdf(col("embedding")).as("bucket"))

  /** Bucket occupancy histogram — the oracle-checked face of the LSH
    * machinery (bucket ids and counts must match exactly). */
  def lshBucketHistogram(spark: SparkSession, dir: String): DataFrame =
    lshBuckets(spark, dir)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  /** Fixed-point quantization scale for [[labelCentroids]]: 2^40.
    * A float (24-bit mantissa) times a power of two is EXACT in double
    * arithmetic — no rounding in the multiply — so the quantized long
    * `round(v * 2^40)` is a deterministic pure function of the input
    * value on ANY engine, and the integer sum over a group is exact
    * and order-insensitive. Quantization error ≤ 2^-41 per element —
    * invisible at the 4-decimal output rounding. */
  val CentroidScale: Double = 1099511627776.0 // 2^40

  /** Per-label centroid of the embedding column, exploded to scalar
    * rows (label, dim, c, n) for oracle hashing.
    *
    * Scale posture (the r3 fold form buffered EVERY vector of a label
    * in one aggregation task — the one unbounded-buffer plan in the
    * repo): quantize each element to a 2^40 fixed-point long (exact,
    * see [[CentroidScale]]), then per-(label, dim) SUM of
    * DECIMAL(38,0) — a plain two-phase hash aggregation with map-side
    * partial sums, shuffle-order independent, bit-identical across
    * engines because every step (power-of-two multiply, half-away-
    * from-zero round, exact integer sum, one double division chain) is
    * deterministic IEEE arithmetic on both sides. No `collect_list`
    * anywhere in the executed plan. */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("dim0", "v")))
      .groupBy(col("label"), (col("dim0") + 1).as("dim"))
      .agg(
        sum(round(col("v").cast("double") * CentroidScale)
          .cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("n"))
      .select(col("label"), col("dim"),
        round(col("s").cast("double") / CentroidScale / col("n"), 4).as("c"),
        col("n"))
      .orderBy("label", "dim")

  /** Documented reference form of [[labelCentroids]]: per-label sorted
    * collect + sequential fold (bit-identical to a `list_reduce`
    * oracle). Kept for the exact-double-fold semantics; NOT the serving
    * path — it funnels a whole label through one aggregation buffer. */
  def labelCentroidsFold(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val vs = e.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        transform(
          sort_array(collect_list(struct(col("vec_id"), col("embedding")))),
          x => transform(x.getField("embedding"), f => f.cast("double")))
          .as("vecs"))
    val summed = vs.select(col("label").cast("long").as("label"), col("n"),
      aggregate(col("vecs"),
        transform(element_at(col("vecs"), 1), v => lit(0.0)),
        (acc, v) => zip_with(acc, v, (a, b) => a + b)).as("sum"))
    summed.select(col("label"), col("n"),
        posexplode(col("sum")).as(Seq("dim0", "s")))
      .select(col("label"), (col("dim0") + 1).as("dim"),
        round(col("s") / col("n"), 4).as("c"), col("n"))
      .orderBy("label", "dim")
  }

  /** Number of IVF centroids (deterministic: the embeddings of
    * vec_id 0..7 serve as fixed seed centroids, so both engines build
    * the identical partition). */
  val IvfCentroids = 8

  /** Lloyd's k-means over the embedding column — the training step the
    * [[ivfCells]] scaladoc documents, made real. Deterministic end to
    * end: seeds are the embeddings of vec_id < [[IvfCentroids]]; each
    * iteration is
    *   (1) assignment — broadcast the k centroids (k×dims, always
    *       broadcastable no matter the corpus size), score with the
    *       same sequential-fold cosine as everywhere else (norms
    *       precomputed once per side — same double ops as the inlined
    *       form), argmax per vector via ONE max(struct) hash
    *       aggregation (no window, no extra shuffle), and
    *   (2) update — 2^40 fixed-point quantization + exact integer sums
    *       per (cell, dim) (see [[labelCentroids]]), means rounded to
    *       4 decimals so both engines feed identical doubles into the
    *       next iteration's folds.
    * Each iteration = one broadcast join + two hash aggregations — the
    * canonical distributed k-means shape at any scale. Returns the
    * final (cid, dim, c, n) centroid rows. */
  def kmeansCentroids(spark: SparkSession, dir: String,
                      iters: Int = 2): DataFrame = {
    require(iters >= 1, s"kmeansCentroids needs iters >= 1, got $iters")
    val e = emb(spark, dir).select(col("vec_id"), col("embedding"))
    // centroids live driver-side between iterations (k×dims doubles —
    // the MLlib pattern; broadcastable at any corpus size). Norms are
    // the same sequential x*x fold the oracle's sqrt(dot(c,c)) runs.
    def withNorms(cs: Array[(Long, Array[Double])])
        : Array[(Long, Array[Double], Double)] =
      cs.map { case (cid, cv) =>
        var bb = 0.0; var i = 0
        while (i < cv.length) { bb += cv(i) * cv(i); i += 1 }
        (cid, cv, math.sqrt(bb))
      }
    var cents: Array[(Long, Array[Double], Double)] = withNorms(
      e.filter(col("vec_id") < IvfCentroids)
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0),
          r.getSeq[Float](1).toArray.map(_.toDouble))))
    var sums: DataFrame = null
    for (it <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(cents)
      // one narrow scan: per vector, fold cos against each centroid in
      // index order (bit-identical to the oracle's list_reduce), keep
      // the argmax (ties → smallest cid). No crossJoin, no shuffle.
      val assign = udf((v: Seq[Float]) => {
        var aa = 0.0
        var i = 0
        while (i < v.length) {
          val x = v(i).toDouble; aa += x * x; i += 1
        }
        val nv = math.sqrt(aa)
        var bestK = Double.NegativeInfinity
        var bestC = Long.MinValue
        for ((cid, cv, nc) <- bc.value) {
          // dimension-mismatched centroids are skipped (a truncated-
          // prefix cosine would be silently wrong — CosineExpr's
          // loud-null contract, adapted to an argmax)
          if (cv.length == v.length) {
            var ab = 0.0; var j = 0
            while (j < cv.length) { ab += v(j).toDouble * cv(j); j += 1 }
            val s = ab / (nv * nc)
            // NaN (zero vector or zero-norm centroid) ranks LARGEST,
            // matching the oracle's ORDER BY cos DESC (DuckDB sorts
            // NaN above +inf) — `s > best` comparisons would silently
            // DROP NaN and emit a phantom sentinel cid instead
            val k = if (java.lang.Double.isNaN(s))
              Double.PositiveInfinity else s
            if (k > bestK || (k == bestK && cid < bestC) ||
                bestC == Long.MinValue) {
              bestK = k; bestC = cid
            }
          }
        }
        // every centroid dimension-mismatched → FAIL LOUDLY: the
        // sentinel would otherwise masquerade as a plausible cid and
        // feed a phantom group into the next iteration's means
        if (bestC == Long.MinValue)
          throw new IllegalStateException(
            s"kmeans: no centroid matches vector dimension ${v.length}")
        bestC
      })
      sums = e
        // cid BEFORE the explode (its own projection): inlined with
        // the generator, the UDF would re-run once per generated row —
        // a dims× blowup of the fold work
        .select(assign(col("embedding")).as("cid"), col("embedding"))
        .select(col("cid"), posexplode(col("embedding"))
          .as(Seq("dim0", "x")))
        .groupBy(col("cid"), (col("dim0") + 1).as("dim"))
        .agg(sum(round(col("x").cast("double") * CentroidScale)
          .cast("decimal(38,0)")).as("s"), count(lit(1)).as("n"))
        .select(col("cid"), col("dim"),
          (round(col("s").cast("double") / CentroidScale / col("n"), 4)
            + 0.0).as("c"),
          col("n"))
      if (it < iters)
        cents = withNorms(
          sums.orderBy("cid", "dim").collect()
            .groupBy(_.getLong(0)).toArray.sortBy(_._1)
            .map { case (cid, rows) =>
              (cid, rows.sortBy(_.getAs[Number]("dim").longValue)
                .map(_.getDouble(2)))
            })
    }
    sums.orderBy("cid", "dim")
  }

  /** IVF cell assignment: (vec_id, cell) where cell = the centroid
    * with the highest cosine (ties → smallest centroid id). The
    * centroid table is broadcast; assignment is a narrow 8-way scored
    * scan + per-vector `max(struct)` argmax aggregation (the same
    * shape as [[kmeansCentroids]]' assignment step) — partial
    * aggregation collapses each vector to ONE candidate map-side, so
    * the single shuffle moves one row per vector, where the old
    * row_number window form moved every (vector × centroid) row into
    * a sort exchange. The embedding rides inside the struct: struct
    * max compares field-by-field, and (s, -cid) is unique per vector,
    * so the array field is never reached by the comparator. NaN
    * cosines (zero vectors) sort largest under both the window's DESC
    * order and struct max — same ties, same oracle. */
  def ivfCells(spark: SparkSession, dir: String): DataFrame =
    argmaxCells(emb(spark, dir), IvfCentroids.toLong)

  /** Shared argmax-cosine cell assignment against the seed centroids
    * `vec_id < k` (see [[ivfCells]] for the plan-shape rationale —
    * broadcast centroids, one scored scan, `max(struct)` argmax). */
  private def argmaxCells(e: DataFrame, k: Long): DataFrame =
    argmaxCellsAgainst(e,
      e.filter(col("vec_id") < k)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec")))

  /** The ONE argmax-cosine assignment block — shared by the
    * whole-table form above and [[assignCells]]' delta-ingest form, so
    * the tie/NaN semantics can never desynchronize between them (the
    * incremental==full store invariant depends on it). */
  private def argmaxCellsAgainst(vectors: DataFrame,
                                 cents: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        struct(
          cosine(col("embedding"), col("cvec")).as("s"),
          (-col("cid")).as("neg_cid"),
          col("embedding").as("embedding")).as("cand"))
      .groupBy(col("vec_id"))
      .agg(max(col("cand")).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        (-col("best.neg_cid")).as("cell"))

  /** Target EXPECTED cell size for corpus-scale SemDeDup: the cell
    * count k = max([[IvfCentroids]], ceil(n / SemDedupCellSize)) grows
    * WITH the corpus, so within-cell pairwise work stays
    * ~n·SemDedupCellSize/2 — LINEAR in corpus size — where a fixed k
    * would reintroduce the O(n²/k) all-pairs term the sample gate of
    * [[embedNearDup]] merely hides. */
  val SemDedupCellSize = 128L

  /** Cosine threshold above which two vectors count as semantic
    * near-duplicates (shared by the sampled [[embedNearDup]] and the
    * corpus-scale [[semDedupPairs]]; the synthetic data holds no >0.5
    * pairs, so 0.35 exercises the cutoff against real value spread). */
  val SemDedupThreshold = 0.35

  /** Dynamic-k cell assignment for corpus-scale SemDeDup
    * ([[semDedupPairs]]): seeds are the first k = ceil(n/128) vectors,
    * so both engines build the identical partition at ANY corpus size
    * and expected occupancy stays ~[[SemDedupCellSize]].
    *
    * Scale posture: the centroid table is k×dims ≈ n/128 vectors —
    * broadcastable far past any single-table corpus here (at 10M
    * centroids × 64 dims ≈ 2.5 GB it crosses the practical broadcast
    * bound; past that, the SemDeDup-paper recipe fixes k to the
    * largest value whose cells fit executor memory and accepts
    * O(n²/k) in-cell work, or pre-routes assignment through a coarse
    * quantizer — the knob is this one constant either way). The n×k
    * assignment scan is the dominant cost and is embarrassingly
    * parallel (no shuffle before the one-row-per-vector argmax). */
  def semDedupCells(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val k = math.max(IvfCentroids.toLong,
      (e.count() + SemDedupCellSize - 1) / SemDedupCellSize)
    argmaxCells(e, k)
  }

  /** Corpus size past which the dynamic-k consumers default to the
    * COARSE two-level assignment: below it the flat n·k argmax is
    * faster (the coarse path's second aggregate stage + block
    * equi-join cost ~0.9 s fixed, measured in SCALING.md round-9);
    * past it the flat path's n²/[[SemDedupCellSize]] cosines dominate
    * everything (~80 s of cosines at n = 500k vs ~3.5 s coarse at the
    * measured ~24M cosines/s). This is the STANDALONE-assignment
    * ledger (output read once); the dynamic-k consumer entry points
    * auto-select on the much lower [[CoarseConsumerCrossover]] —
    * explicit `Some(...)` forces a path on every knob either way. */
  val CoarseAssignCrossover = 500000L

  /** The auto-select crossover for the CONSUMER paths ([[knnGraph]],
    * [[negatives]], [[semDedupPairs]] and derivatives — everything
    * routed through [[semDedupCellsOf]]): in those queries the
    * assignment's embedding-carrying argmax structs feed a staged
    * frame read twice as the self-join sides, so the coarse router's
    * 2n·√k candidate cut pays off FAR earlier than the bare-assignment
    * arithmetic behind [[CoarseAssignCrossover]] predicts — measured
    * (SCALING.md round-11): a wash at 2k vectors (±3%), coarse 2.4×
    * (knnGraph) to 3.4× (negatives) faster at 52k. 16k splits the
    * bracket conservatively: the worst case below it is the measured
    * wash, the win above it grows with n. Standalone assignments
    * ([[semDedupCellTable]], [[reclusterIvfStore]]'s one-shot
    * reassignment) keep the bare crossover — their output is read
    * once, so the original ledger applies. */
  val CoarseConsumerCrossover = 16384L

  /** The dynamic-k cell assignment behind every batch SemDeDup-family
    * consumer, with the flat/coarse routing in ONE place: k = n/128
    * ([[SemDedupCellSize]] discipline), flat argmax below
    * [[CoarseConsumerCrossover]] (the CONSUMER crossover — these
    * callers stage + self-join the assignment, where the coarse
    * candidate cut pays off at the measured 16k-class sizes, not the
    * bare-assignment 500k), the 2n·√k two-level router
    * ([[assignCellsCoarse]] — spec-pinned identical to
    * [[semDedupCellsCoarse]]) past it. Returns
    * (vec_id, embedding, cell). */
  private[graft] def semDedupCellsOf(spark: SparkSession, dir: String,
                                     coarse: Option[Boolean]): DataFrame = {
    val e = emb(spark, dir)
    val n = e.count()
    val k = math.max(IvfCentroids.toLong,
      (n + SemDedupCellSize - 1) / SemDedupCellSize)
    if (coarse.getOrElse(n >= CoarseConsumerCrossover))
      assignCellsCoarse(spark, dir,
        e.select(col("vec_id"), col("embedding")), k)
    else argmaxCells(e, k)
  }

  /** The [[semDedupCells]] assignment as a DRIVER-CONTRACT query:
    * (vec_id, cell), the partition every SemDeDup stage derives from.
    * Exposed so the exact and coarse assignments can be measured and
    * oracle-checked side by side. */
  def semDedupCellTable(spark: SparkSession, dir: String): DataFrame =
    semDedupCells(spark, dir)
      .select(col("vec_id"), col("cell"))
      .orderBy("vec_id")

  /** TWO-LEVEL (coarse-routed) SemDeDup cell assignment — the
    * pre-router the [[semDedupCells]] scaladoc names for the regime
    * where the flat n×k argmax scan dominates (k = n/128 grows with
    * the corpus → n²/128 cosines; measured as the dominant
    * fixed-density term in SCALING.md round-9). Seeds split into
    * ⌈√k⌉-wide BLOCKS; a vector first argmaxes over the ⌈k/B⌉ block
    * leaders (every B-th seed), then over the B seeds of the winning
    * block — n·(k/B + B) ≈ 2n·√k cosines instead of n·k, with the
    * same (cosine desc, cid asc) tie order at both levels.
    *
    * The trade is recall-shaped, not correctness-shaped: a vector may
    * land in a different (still nearby) cell than the flat argmax
    * would give, moving some near-dup pairs across cell boundaries —
    * the same boundary-miss class the recipe already accepts.
    * Identical vectors still co-locate (same two argmaxes), so
    * verbatim duplicates are never lost. The DuckDB oracle mirrors
    * both levels exactly, so the assignment itself is hash-checked.
    *
    * Plan shape: one broadcast of the k/B block leaders (coarse scan),
    * then a broadcast EQUI-join on the block id (seeds bounded) + one
    * more argmax — no corpus-side shuffle before the one-row-per-
    * vector aggregates. */
  def semDedupCellsCoarse(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val n = e.count()
    val k = math.max(IvfCentroids.toLong,
      (n + SemDedupCellSize - 1) / SemDedupCellSize)
    assignCellsCoarse(spark, dir,
        e.select(col("vec_id"), col("embedding")), k)
      .select(col("vec_id"), col("cell"))
      .orderBy("vec_id")
  }

  /** [[assignCells]]' COARSE-ROUTED twin for corpus-sized k — the
    * [[semDedupCellsCoarse]] two-level argmax applied to an arbitrary
    * delta batch: block leaders first (n·k/B cosines), then the
    * winning block's B seeds (n·B), ≈ 2n·√k instead of n·k — and the
    * wide embedding-carrying struct agg shrinks by the same factor,
    * which is the term that actually dominates a flat per-batch
    * assignment at large k (measured in SCALING.md round-10: the
    * streaming gate at corpus-sized k=407 paid 14× wall-time through
    * the flat path). Same (cos desc, cid asc) ties at both levels;
    * same recall trade as the coarse SemDeDup assignment. Returns
    * (vec_id, embedding, cell). */
  private[graft] def assignCellsCoarse(spark: SparkSession, dir: String,
                                       vectors: DataFrame,
                                       k: Long): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    coarseCellsAgainst(vectors,
      emb(spark, dir).filter(col("vec_id") < k)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec")), k)
  }

  /** The two-level argmax itself, against an ARBITRARY (cid, cvec)
    * seed frame — [[assignCellsCoarse]] binds it to a table's own
    * seeds; [[negativesDense]] binds it to remapped-id seeds. Blocks
    * are ⌈√k⌉ wide over the seed ids. */
  private def coarseCellsAgainst(vectors: DataFrame, seedsIn: DataFrame,
                                 k: Long): DataFrame = {
    val b = math.ceil(math.sqrt(k.toDouble)).toLong
    val seeds = seedsIn
      .select(col("cid"), col("cvec"), expr(s"cid DIV $b").as("blk"))
    val leaders = seeds.filter(pmod(col("cid"), lit(b)) === 0)
    val coarse = vectors.crossJoin(broadcast(leaders))
      .select(col("vec_id"),
        struct(
          cosine(col("embedding"), col("cvec")).as("s"),
          (-col("cid")).as("neg_cid"),
          col("blk").as("blk"),
          col("embedding").as("embedding")).as("cand"))
      .groupBy(col("vec_id"))
      .agg(max(col("cand")).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("best.blk").as("blk"))
    coarse.join(broadcast(seeds), "blk")
      .select(col("vec_id"),
        struct(
          cosine(col("embedding"), col("cvec")).as("s"),
          (-col("cid")).as("neg_cid"),
          col("embedding").as("embedding")).as("cand"))
      .groupBy(col("vec_id"))
      .agg(max(col("cand")).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        (-col("best.neg_cid")).as("cell"))
  }

  /** Cell-bounded k-NN GRAPH — the materialized neighbor table a
    * curation pipeline builds once and reuses (near-dup graphs,
    * diversity sampling, hard-negative mining): for EVERY vector, its
    * top-`k` exact-cosine neighbors among its own IVF cell's vectors.
    * The same-cell equi-join replaces the all-pairs self-join
    * (candidates = n·occupancy, linear when k grows with the corpus —
    * the [[semDedupPairs]] discipline), and per-vector top-k rides the
    * bounded-heap `graft_topk` aggregate — O(k) state per vector with
    * map-side partial aggregation, no window shuffle-and-sort (the
    * oracle IS the window form, so the compare re-proves heap ==
    * row_number on this shape too). Cells come from the DYNAMIC-k
    * assignment ([[semDedupCellsOf]] — k = n/128 grows with the
    * corpus), so candidate volume stays linear at any scale; the
    * `coarse` knob routes the assignment itself through the 2n·√k
    * two-level router (`None` auto-selects past
    * [[CoarseConsumerCrossover]] — the consumer ledger: this query
    * stages + self-joins the assignment, where the coarse cut pays
    * off far below the bare-assignment crossover, past which the
    * flat n·k argmax IS the query). At the test SFs (n ≤ 1024) the dynamic k equals the
    * fixed store k. Boundary neighbors (nearest vector in a DIFFERENT
    * cell) are missed — the standard IVF recall trade; nProbe-style
    * widening composes if needed. */
  def knnGraph(spark: SparkSession, dir: String, k: Int = 3,
               coarse: Option[Boolean] = None): DataFrame =
    // DEFAULT ROUTING IS THE BALANCED ASSIGNMENT (r12 VERDICT: the
    // plain default was the round's one `weak` — super-linear under
    // embedding skew, exponent 0.75–0.95 vs balanced 0.35 at 26×).
    // On a corpus with no over-cap cell every sub = 0 and this IS the
    // plain graph (spec-pinned); [[knnGraphPlain]] stays as the
    // oracle reference arm for the cell-only shape.
    knnGraphBalanced(spark, dir, k, coarse)

  /** The PLAIN cell-only k-NN graph — the reference arm kept beside
    * the balanced default so the heap == row_number compare still
    * covers the unsplit candidate shape. On a skewed corpus its
    * candidate pairs grow with Σocc² (measured ×147 for ×26 data on
    * the amplified corpus) — use [[knnGraph]] unless pinning against
    * this exact shape. */
  def knnGraphPlain(spark: SparkSession, dir: String, k: Int = 3,
                    coarse: Option[Boolean] = None): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val cells = semDedupCellsOf(spark, dir, coarse)
    val scored = cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("nbr"),
        cosine(col("a.embedding"), col("b.embedding")).as("c"))
    knnTop(scored, k)
  }

  /** The shared per-source top-k tail of the k-NN graph family. */
  private def knnTop(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("src"))
      .agg(graft.functions.GraftFunctions
        .topkBy(col("c"), col("nbr"), k).as("top"))
      .select(col("src"), posexplode(col("top")))
      .select(col("src").as("vec_id"),
        (col("pos") + 1).cast("long").as("rn"),
        col("col.id").as("nbr"), round(col("col.score"), 4).as("cos"))
      .orderBy("vec_id", "rn")

  /** Occupancy past which [[balancedCellsOf]] re-splits a cell: 4×
    * the [[SemDedupCellSize]] target — small drift is normal argmax
    * variance, a 4× cell is the Σocc² skew that breaks the family's
    * linear-work argument (shared with the oracle generator). */
  val BalancedCellCap: Long = 4L * SemDedupCellSize

  /** OCCUPANCY-BALANCED dynamic-k assignment — the answer to the
    * measured knn-graph pair skew (round-12 KnnGraphProf at 26×:
    * median cell 62 but max 1,823 on the amplified corpus, so
    * candidate pairs grow with Σocc² — ×147 for ×26 data — while the
    * ÷128 sizing only controls the MEAN): cells whose occupancy
    * exceeds [[BalancedCellCap]] are re-seeded INSIDE the cell (its
    * m = ⌈occ/[[SemDedupCellSize]]⌉ smallest vec_ids, numbered by id
    * rank — the store-family seed discipline) and their vectors
    * argmax-assigned to sub-cells with the family's (cos desc, seed
    * asc) tie rule; under-cap cells keep sub = 0. The re-split is the
    * standard balanced-IVF maintenance (FAISS-style): work per split
    * cell is occ × m, i.e. bounded by the skew it removes, and the
    * recall trade is the same boundary-miss class the base recipe
    * already accepts (near-copies of one vector stay co-located —
    * they argmax to the same sub-seed). Returns
    * (vec_id, embedding, cell, sub). */
  private[graft] def balancedCellsOf(spark: SparkSession, dir: String,
                                     coarse: Option[Boolean]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = semDedupCellsOf(spark, dir, coarse).stage()
    val occ = cells.groupBy(col("cell")).agg(count(lit(1)).as("occ"))
    val big = occ.filter(col("occ") > BalancedCellCap)
      .select(col("cell"),
        ceil(col("occ").cast("double") / SemDedupCellSize)
          .cast("long").as("m"))
      .stage()
    // the no-skew common case: zero over-cap cells means the balanced
    // assignment IS the plain one (every sub = 0, spec-pinned), so
    // skip the re-split machinery (anti-join, seed window, re-argmax)
    // entirely — the default-routed families then pay only this one
    // cells-count-sized aggregate over the plain recipe
    if (big.limit(1).count() == 0)
      return cells.select(col("vec_id"), col("embedding"), col("cell"),
        lit(0L).as("sub"))
    val small = cells
      .join(broadcast(big.select("cell")), Seq("cell"), "left_anti")
      .select(col("vec_id"), col("embedding"), col("cell"),
        lit(0L).as("sub"))
    val bigVecs = cells.join(broadcast(big), Seq("cell")).stage()
    val subSeeds = bigVecs
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("cell")).orderBy(col("vec_id"))))
      .filter(col("rk") <= col("m"))
      .select(col("cell"), (col("rk") - 1).cast("long").as("sid"),
        col("embedding").as("svec"))
    val bigAssigned = bigVecs
      .select(col("vec_id"), col("embedding"), col("cell"))
      .join(subSeeds, Seq("cell"))
      .select(col("vec_id"), col("cell"),
        struct(
          cosine(col("embedding"), col("svec")).as("s"),
          (-col("sid")).as("neg_sid"),
          col("embedding").as("embedding")).as("cand"))
      .groupBy(col("vec_id"), col("cell"))
      .agg(max(col("cand")).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("cell"), (-col("best.neg_sid")).as("sub"))
    small.unionByName(bigAssigned)
  }

  /** [[knnGraph]] over the occupancy-BALANCED assignment — neighbors
    * come from the (cell, sub) bucket, so candidate volume stays
    * ~n·occupancy even when the embedding space clusters (the
    * amplified-corpus regime where the plain graph's pairs grew
    * ×147 for ×26 data). On a corpus with no over-cap cell the
    * assignment is untouched (every sub = 0) and this IS
    * [[knnGraph]]. */
  def knnGraphBalanced(spark: SparkSession, dir: String, k: Int = 3,
                       coarse: Option[Boolean] = None): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val cells = balancedCellsOf(spark, dir, coarse).stage()
    val scored = cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.sub") === col("b.sub") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("nbr"),
        cosine(col("a.embedding"), col("b.embedding")).as("c"))
    knnTop(scored, k)
  }

  /** CORPUS-SCALE SemDeDup candidate pairs: exact cosine ≥
    * [[SemDedupThreshold]] computed only WITHIN a [[semDedupCells]]
    * cell — the actual SemDeDup recipe (Abbas et al.: k-means cells,
    * pairwise similarity inside each cell) — over the ENTIRE
    * embeddings table, no sample gate. The cell equi-join replaces the
    * all-pairs inequality self-join: candidate count is
    * ~n·cellSize/2, linear in n because k grows with the corpus
    * ([[SemDedupCellSize]]). Recall trade (inherent to the recipe):
    * a near-dup pair straddling a cell boundary is missed; the
    * verbatim-duplicate pairs dedup actually targets always
    * co-locate (identical vectors score identically → same argmax
    * cell). */
  def semDedupPairs(spark: SparkSession, dir: String,
                    coarse: Option[Boolean] = None): DataFrame = {
    // DEFAULT ROUTING IS THE BALANCED ASSIGNMENT (the knnGraph
    // decision applied to the whole pair family — the r12
    // KnnGraphProf decomposition measured the same-cell pair term at
    // Σocc², ×147 for ×26 data on the amplified corpus, and this is
    // the same self-join shape): candidates come from the (cell, sub)
    // bucket, so pair volume stays ~n·occupancy under embedding skew.
    // On a corpus with no over-cap cell every sub = 0 and this IS the
    // plain recipe ([[semDedupPairsPlain]], the oracle reference
    // arm). Derivatives ([[semDedupFull]], [[semDedupSurvivors]],
    // [[semDedupEval]]) ride the default. stage(): the self-join
    // reads the assignment blocks twice; without the cut the n×k
    // argmax scan would run once per side.
    val cells = balancedCellsOf(spark, dir, coarse).stage()
    cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.sub") === col("b.sub") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .filter(col("c") >= SemDedupThreshold)
      .select(col("vec_a"), col("vec_b"), round(col("c"), 4).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  /** The PLAIN cell-only SemDeDup pairs — the reference arm beside
    * the balanced default ([[semDedupPairs]]), kept so the unsplit
    * candidate shape stays oracle-pinned (the knnGraphPlain
    * discipline). Super-linear under embedding skew. */
  def semDedupPairsPlain(spark: SparkSession, dir: String,
                         coarse: Option[Boolean] = None): DataFrame = {
    val cells = semDedupCellsOf(spark, dir, coarse).stage()
    cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .filter(col("c") >= SemDedupThreshold)
      .select(col("vec_a"), col("vec_b"), round(col("c"), 4).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  /** SEMDEDUP RECALL EVALUATION — the boundary-miss measurement the
    * cell-bounded recipe's scaladocs keep referencing, computed: over
    * the exact-check sample (vec_id < 200, where the all-pairs truth
    * of [[embedNearDup]] is affordable), compare the corpus-scale
    * cell-bounded pairs ([[semDedupPairs]] restricted to the sample)
    * against the exact pair set and report recall — the fraction of
    * true near-dup pairs that did NOT straddle a cell boundary.
    * Precision is structurally 1 (cell pairs score with the same
    * exact cosine and threshold, so they are a SUBSET of truth —
    * n_hit == n_cell_pairs, asserted by spec); recall is the recipe's
    * one trade, now a tracked number beside the ANN-recall and
    * LSH-precision/recall panels. Both arms staged (each feeds a
    * count and the hit join). The `coarse` knob threads so the
    * two assignment paths' recall can be compared directly. */
  def semDedupEval(spark: SparkSession, dir: String,
                   coarse: Option[Boolean] = None): DataFrame = {
    val sample = 200
    val cell = semDedupPairs(spark, dir, coarse)
      .filter(col("vec_a") < sample && col("vec_b") < sample)
      .select(col("vec_a"), col("vec_b"))
      .stage()
    val truth = embedNearDup(spark, dir)
      .select(col("vec_a"), col("vec_b"))
      .stage()
    val nC = cell.count()
    val nT = truth.count()
    val hit = cell.join(truth, Seq("vec_a", "vec_b")).count()
    import spark.implicits._
    Seq((nC, nT, hit)).toDF("n_cell_pairs", "n_true_pairs", "n_hit")
      .select(col("n_cell_pairs"), col("n_true_pairs"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_true_pairs"), 4)
          .as("cell_recall"))
  }

  /** Full-corpus SemDeDup: connected components + keeper flag over the
    * cell-bounded near-dup graph ([[semDedupPairs]]) — the
    * corpus-scale form of [[semanticClusters]], every stage bounded
    * (grows-with-n cells, linear candidate set, union-find with
    * distributed-propagate fallback). */
  def semDedupFull(spark: SparkSession, dir: String,
                   coarse: Option[Boolean] = None): DataFrame =
    Dedup.clusters(spark,
        semDedupPairs(spark, dir, coarse)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .select(col("doc_id").as("vec_id"), col("cluster"), col("keeper"))
      .orderBy("vec_id")

  /** Corpus-scale SemDeDup APPLIED to the corpus — the report→apply
    * pattern of the q24 dedup family: a doc survives unless it is a
    * non-keeper member of a [[semDedupFull]] semantic cluster (vec_id
    * aligns 1:1 with doc_id in the testdata; docs outside the
    * near-dup graph are trivial keepers). One left-anti join of the
    * corpus scan against the cluster non-keepers — the drop set is
    * bounded by the (duplicate-density-bounded) pair graph, so the
    * apply stays a single equi-join at any corpus size. */
  def semDedupSurvivors(spark: SparkSession, dir: String,
                        coarse: Option[Boolean] = None): DataFrame = {
    val d = graft.Tables.load(spark, dir, "documents")
    val drop = semDedupFull(spark, dir, coarse)
      .filter(col("keeper") === 0)
      .select(col("vec_id").as("doc_id"))
    d.join(drop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** IVF-accelerated ANN: probe only the query vector's cell, exact
    * cosine re-rank inside it. The standard recall/latency trade —
    * at scale, probe the nProbe nearest cells. */
  def annIvf(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    // lazy localCheckpoint, not persist: the returned plan reads these
    // blocks, so there is no release point — checkpointed blocks are
    // reclaimed by the ContextCleaner once the result goes
    // unreferenced, where a persist() would pin a CacheManager entry
    // per invocation for the session lifetime (the bloomProbe pattern)
    val cells = ivfCells(spark, dir).stage()
    val q = cells.filter(col("vec_id") === 0)
      .select(col("cell").as("qcell"), col("embedding").as("qv"))
    cells.filter(col("vec_id") =!= 0)
      .join(broadcast(q), col("cell") === col("qcell"))
      .select(col("vec_id"), cosine(col("embedding"), col("qv")).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("c"), 4).as("cos"))
  }

  /** DURABLE IVF layout: the embedding table written
    * `partitionBy(cell)` — one directory per IVF cell, the vector-store
    * layout a 100 TB ANN service actually reads. A probe then carries
    * its cell as a LITERAL partition filter, so the scan touches ONE
    * cell directory (`PartitionFilters` in the plan — spec-pinned) and
    * the other k−1/k of the corpus is never opened. This is
    * [[graft.query.LoadedPointServer]]'s zone-map idea expressed
    * through Hive-style partition pruning instead of driver routing. */
  def writeIvfLayout(spark: SparkSession, dir: String,
                     outDir: String): Unit =
    writeIvfLayoutK(spark, dir, outDir, IvfCentroids.toLong)

  /** [[writeIvfLayout]] with the centroid count as a knob — the
    * store-creation half of the k ≈ n/128 sizing discipline (and the
    * parity reference for [[reclusterIvfStore]]: a reclustered store
    * must probe identically to one written at the new k from
    * scratch). Writes the store's `_graft_store_meta` (its k) so
    * probe routing reads the store's OWN seed count instead of
    * assuming the fixed family default. */
  def writeIvfLayoutK(spark: SparkSession, dir: String,
                      outDir: String, k: Long): Unit = {
    assignCells(spark, dir,
        emb(spark, dir).select(col("vec_id"), col("embedding")), k)
      .write.partitionBy("cell").mode("overwrite").parquet(outDir)
    val root = new org.apache.hadoop.fs.Path(outDir)
    writeStoreMeta(
      root.getFileSystem(spark.sparkContext.hadoopConfiguration), root, k)
    // a full-store rewrite REPLACES the seed coordinate system, so the
    // session seed cache must drop the path — otherwise rebuilding a
    // store at a previously-probed path serves stale centroids to
    // nProbe routing (the 'seeds fixed per store' invariant is about
    // appends, not rewrites)
    storeSeedCache.remove(outDir)
    ()
  }

  /** Store metadata file: the centroid count k this store's layout was
    * built (or last re-clustered) at. Underscore-prefixed, so Spark
    * parquet readers never see it. Absent on pre-meta stores →
    * [[IvfCentroids]] (the fixed family default). */
  private[graft] val StoreMetaName = "_graft_store_meta"

  private def writeStoreMeta(fs: org.apache.hadoop.fs.FileSystem,
                             root: org.apache.hadoop.fs.Path,
                             k: Long): Unit = {
    val o = fs.create(new org.apache.hadoop.fs.Path(root, StoreMetaName),
      true)
    try o.write(k.toString.getBytes("UTF-8")) finally o.close()
  }

  /** The centroid count of a durable store (its own meta, or the
    * family default for pre-meta stores). */
  private[graft] def storeK(spark: SparkSession, storeDir: String): Long = {
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(root, StoreMetaName)
    if (!fs.exists(p)) IvfCentroids.toLong
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  /** Assign an arbitrary vector batch to the SEED-centroid cells of
    * `dir`'s embedding table — the delta-ingest half of the durable
    * store: new vectors join the fixed coarse partition without
    * touching (or re-reading) the base. Same argmax-cosine semantics
    * as [[ivfCells]]. `k` defaults to the store family's fixed
    * [[IvfCentroids]]; a corpus-sized k (the [[SemDedupCellSize]]
    * discipline) pins cell occupancy — the knob the streaming gate's
    * scale study measures. */
  def assignCells(spark: SparkSession, dir: String, vectors: DataFrame,
                  k: Long = IvfCentroids.toLong): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    argmaxCellsAgainst(vectors,
      emb(spark, dir).filter(col("vec_id") < k)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec")))
  }

  /** Append a delta vector batch into a [[writeIvfLayout]] store:
    * assign ONLY the delta against the fixed seed centroids, then
    * partition-append — new files land inside the existing `cell=`
    * directories, the base is never rewritten or re-read. The
    * incremental path of the vector store (the [[graft.index
    * .PositionalIndex.merge]] idea applied to embeddings); a spec pins
    * incremental == written-at-once. */
  def appendIvfLayout(spark: SparkSession, dir: String, outDir: String,
                      delta: DataFrame): Unit =
    assignCells(spark, dir, delta)
      .write.partitionBy("cell").mode("append").parquet(outDir)

  /** Probe an EXISTING [[writeIvfLayout]] store: the query row (vec 0)
    * is read first (its own partition prune), then the probe scans
    * only its nearest `nProbe` cell directories — the recall knob of
    * [[annIvfProbe]] on the partition-pruned path. nProbe = 1 reads
    * exactly the query's own cell (its argmax centroid); nProbe > 1
    * ranks ALL seed centroids against the query driver-side (k×dims —
    * bounded at any corpus size, the [[graft.query.IvfServer]]
    * routing) and filters the scan with an `isin` of nProbe cell
    * LITERALS, so partition pruning still applies and the probe is
    * still one job over nProbe directories. */
  def probeIvfStore(spark: SparkSession, storeDir: String,
                    k: Int = 10, qId: Long = 0L,
                    nProbe: Int = 1): DataFrame = {
    val stored = liveIvfStore(spark, storeDir)
    val qRow = stored.filter(col("vec_id") === qId)
      .select(col("cell"), col("embedding")).head()
    val qv = qRow.getSeq[Float](1)
    val cells: Seq[Long] =
      if (nProbe <= 1) Seq(qRow.getAs[Number]("cell").longValue)
      else probeCellsOf(spark, storeDir, qv, nProbe)
    stored.filter(col("cell").isin(cells: _*) && col("vec_id") =!= qId)
      .select(col("vec_id"),
        cosine(col("embedding"), typedLit(qv)).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("c"), 4).as("cos"))
  }

  /** Session cache of a durable store's seed centroids, keyed by store
    * path. Seeds are the store's FIXED coordinate system — writes
    * create them once and [[appendIvfLayout]] assigns deltas AGAINST
    * them without ever rewriting them — so one collect per store per
    * session is sound, and repeat probes skip the every-cell centroid
    * scan ([[graft.query.IvfServer]] already holds its seeds; this
    * gives the entry-point path the same discipline). */
  private[graft] val storeSeedCache = new java.util.concurrent
    .ConcurrentHashMap[String, Array[(Long, Seq[Float])]]()

  /** The top-`nProbe` cells for a query vector against a store's seed
    * centroids — same (cosine desc, cid asc) order as [[annIvfProbe]]'s
    * relational centroid ranking and the same [[cosSeqInf]] arithmetic
    * as [[graft.query.IvfServer.cellOf]], so the three probe paths
    * choose identical cell sets. */
  /** A store's seed centroids, session-cached: the store's OWN k
    * (meta; family default pre-meta), seeds = its k smallest
    * vec_ids — the dense-layout `vec_id < k` discipline generalized
    * to arbitrary id sets, so routing stays correct after a
    * re-clustering changed k. */
  private[graft] def storeSeeds(spark: SparkSession,
                                storeDir: String): Array[(Long, Seq[Float])] =
    storeSeedCache.computeIfAbsent(storeDir, _ => {
      val k = storeK(spark, storeDir)
      require(k <= Int.MaxValue, s"store k $k exceeds collect bound")
      spark.read.parquet(storeDir)
        .select(col("vec_id"), col("embedding"))
        .orderBy("vec_id").limit(k.toInt)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1)))
    })

  private[graft] def probeCellsOf(spark: SparkSession, storeDir: String,
                                  qv: Seq[Float], nProbe: Int): Seq[Long] =
    storeSeeds(spark, storeDir)
      .sortBy { case (cid, cv) => (-cosSeqInf(qv, cv), cid) }
      .take(nProbe).map(_._1).toSeq

  /** Session cache of the HARNESS-SHAPE durable stores the
    * `*Loaded` entry points build (one [[writeIvfLayout]] per source
    * table per session instead of per call — r11 VERDICT hardening:
    * the per-call write was correct but invited copying the build
    * into a serving path). Keyed on the source table's CONTENT stamp
    * (file names + sizes + mtimes — the [[graft.queries.IrSql]]
    * bm25StoreKey discipline), so a corpus rewritten at the same
    * path builds a fresh store. Probes are read-only, so sharing one
    * store across entries is sound; mutation specs build their own
    * scratch stores directly. */
  private[graft] val loadedStoreCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The embeddings-table content stamp, shared with [[Pq]]'s loaded
    * store cache key. */
  private[graft] def loadedStampOf(dir: String): String =
    tableStamp(dir, "embeddings")

  private def tableStamp(dir: String, table: String): String =
    graft.StoreStamp.of(dir, table)

  private[graft] def cachedIvfStore(spark: SparkSession,
                                    dir: String): String =
    loadedStoreCache.computeIfAbsent(
      s"$dir|ivf|${tableStamp(dir, "embeddings")}", _ => {
        val out = graft.TempDirs.scratch("graft_ivf_store")
        writeIvfLayout(spark, dir, out)
        out
      })

  /** [[annIvfProbe]] served from the durable store — the nProbe recall
    * knob on the partition-pruned path. Output-identical to the
    * in-memory [[annIvfProbe]] by construction; the driver checks it
    * against the SAME oracle. */
  def annIvfLoadedNprobe(spark: SparkSession, dir: String,
                         k: Int = 10, nProbe: Int = 2): DataFrame =
    probeIvfStore(spark, cachedIvfStore(spark, dir), k, nProbe = nProbe)

  /** [[probeIvfStore]] with the metadata pre-filter applied INSIDE the
    * partition-pruned cell scan — the durable-store form of
    * [[annIvfFiltered]]: the probe carries its nProbe cells as
    * partition filters (only those directories ever open), and the
    * pushed-down filtered documents scan equi-joins the already
    * cell-restricted candidates — at store scale the filter join
    * touches nProbe directories of vectors, never the corpus. */
  def probeIvfStoreFiltered(spark: SparkSession, storeDir: String,
                            dir: String, k: Int = 10, qId: Long = 0L,
                            nProbe: Int = 2): DataFrame = {
    val stored = liveIvfStore(spark, storeDir)
    val qv = stored.filter(col("vec_id") === qId)
      .select(col("embedding")).head().getSeq[Float](0)
    val cells = probeCellsOf(spark, storeDir, qv, nProbe)
    stored.filter(col("cell").isin(cells: _*) && col("vec_id") =!= qId)
      .join(filterIds(spark, dir), Seq("vec_id"))
      .select(col("vec_id"),
        cosine(col("embedding"), typedLit(qv)).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("c"), 4).as("cos"))
  }

  /** [[annIvfFiltered]] served from the durable store — output-
    * identical by construction (same seed system, same routing order,
    * same filter predicate), so the driver checks it against the SAME
    * oracle (the annIvfLoaded pattern). */
  def annIvfFilteredLoaded(spark: SparkSession, dir: String,
                           k: Int = 10, nProbe: Int = 2): DataFrame =
    probeIvfStoreFiltered(spark, cachedIvfStore(spark, dir), dir, k,
      nProbe = nProbe)

  /** The fixed synthetic takedown rule for the deletion oracle
    * entries: every vec_id ≡ [[DeletedVecsRem]] (mod
    * [[DeletedVecsMod]]) is deleted — deliberately includes a SEED id
    * (5 < [[IvfCentroids]]), so the oracle also pins the
    * retained-coordinate semantics, and never the query vector 0. */
  val DeletedVecsMod = 13
  val DeletedVecsRem = 5

  /** Session-cached harness store WITH the fixed takedown applied —
    * the [[cachedIvfStore]] discipline for the deletion entries
    * (store built once per embeddings-table content stamp; both
    * deleted entries and repeat bench passes reuse it). */
  private[graft] def cachedDeletedStore(spark: SparkSession,
                                        dir: String): String =
    loadedStoreCache.computeIfAbsent(
      s"$dir|ivfdel|${tableStamp(dir, "embeddings")}", _ => {
        val out = graft.TempDirs.scratch("graft_ivf_del")
        writeIvfLayout(spark, dir, out)
        deleteIvfVectors(spark, out,
          emb(spark, dir)
            .filter(col("vec_id") % DeletedVecsMod === DeletedVecsRem)
            .select(col("vec_id")))
        out
      })

  /** IVF probe over a store with PENDING tombstones — the takedown
    * contract for vectors: results == the same probe over a corpus
    * that never held the deleted ids (oracle-checked; cell routing
    * still uses every seed centroid, deleted or not — the
    * retained-coordinate rule). */
  def annIvfDeleted(spark: SparkSession, dir: String,
                    k: Int = 10): DataFrame =
    probeIvfStore(spark, cachedDeletedStore(spark, dir), k)

  /** [[annIvfDeleted]] after [[compactIvfDeletes]] physically
    * reclaimed the tombstoned rows — same oracle (reclaim must not
    * change any answer); dead non-seed rows are gone from disk, dead
    * seeds retained as coordinates and still excluded. */
  def annIvfDeletedCompacted(spark: SparkSession, dir: String,
                             k: Int = 10): DataFrame = {
    val store = cachedDeletedStore(spark, dir)
    compactIvfDeletes(spark, store)
    probeIvfStore(spark, store, k)
  }

  /** UPDATE vectors in a durable IVF store — the re-crawl shape for
    * embeddings (a re-embedded doc keeps its vec_id, its vector
    * changes): tombstone the old versions ([[deleteIvfVectors]]),
    * reclaim them ([[compactIvfDeletes]] — required before a same-id
    * re-add: tombstones are vec_id-keyed, so an appended new version
    * would be hidden by its own pending tombstone), then route the
    * new versions back in by the cheapest safe leg:
    *
    *  - every updated id ABOVE the seed range → [[appendIvfStore]]
    *    (delta-bounded; the coordinate system is untouched);
    *  - any updated id INSIDE the seed range → the seed's vector IS a
    *    routing coordinate, and the derived-seed rule ("k smallest
    *    vec_ids") would silently re-derive a DIFFERENT system under
    *    later sessions if the row changed in place — so this leg
    *    re-clusters at the store's CURRENT k with the new versions as
    *    the rebuild [[reclusterIvfStore replacement]] (a full
    *    re-coordinate, the documented cost of mutating a seed; an
    *    update never resizes the store — resizing stays recluster's
    *    own knob).
    *
    * REPLAY: re-running the same update converges — delete tombstones
    * the already-updated rows, reclaim drops them, and the same new
    * versions land again (spec-pinned). Run behind the serving
    * quiesce; a serving [[graft.query.IvfServer]] detects either leg
    * through its version stamps. */
  def updateIvfVectors(spark: SparkSession, storeDir: String,
                       newVecs: DataFrame): Unit = {
    val minRow = newVecs.agg(min(col("vec_id"))).head()
    if (minRow.isNullAt(0)) return // empty update
    deleteIvfVectors(spark, storeDir,
      newVecs.select(col("vec_id")))
    compactIvfDeletes(spark, storeDir)
    val maxSeedId = storeSeeds(spark, storeDir).map(_._1).max
    if (minRow.getLong(0) > maxSeedId)
      appendIvfStore(spark, storeDir, newVecs)
    else {
      reclusterIvfStore(spark, storeDir,
        Some(storeK(spark, storeDir)), Some(newVecs))
      ()
    }
  }

  /** The fixed re-crawl set of the vector update entries — shared
    * with the oracle (`vec_id % mod = rem`), deliberately including a
    * SEED id (3 < [[IvfCentroids]]) so the entry exercises the
    * re-coordinate leg; the transform (negation) is norm-preserving
    * and exactly representable, so Spark and DuckDB agree bit-for-bit. */
  val UpdatedVecsMod = 17
  val UpdatedVecsRem = 3

  /** The update set's NEW versions: the embedding negated. */
  private[graft] def updatedVecsNew(spark: SparkSession,
                                    dir: String): DataFrame =
    emb(spark, dir)
      .filter(col("vec_id") % UpdatedVecsMod === UpdatedVecsRem)
      .select(col("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))

  private[graft] def cachedUpdatedStore(spark: SparkSession,
                                        dir: String): String =
    loadedStoreCache.computeIfAbsent(
      s"$dir|ivfupd|${tableStamp(dir, "embeddings")}", _ => {
        val out = graft.TempDirs.scratch("graft_ivf_upd")
        writeIvfLayout(spark, dir, out)
        updateIvfVectors(spark, out, updatedVecsNew(spark, dir))
        out
      })

  /** IVF probe over a store whose fixed re-crawl set was UPDATED in
    * place (one updated id is a seed → the re-coordinate leg ran):
    * oracle-checked against the probe computed over the embeddings
    * table with the update set's vectors replaced — update-in-place
    * == rebuild-over-updated-embeddings, coordinate system included. */
  def annIvfUpdated(spark: SparkSession, dir: String,
                    k: Int = 10): DataFrame =
    probeIvfStore(spark, cachedUpdatedStore(spark, dir), k)

  /** COMPACT a [[writeIvfLayout]] store in place: each
    * [[appendIvfLayout]] delta lands one small file per touched cell,
    * so a long-lived store's partition-pruned probe degrades from a
    * one-directory scan to a many-small-files scan. Cells whose file
    * count exceeds `maxFilesPerCell` are rewritten as a single file
    * (per-cell coalesce — cell contents are probe-bounded by the IVF
    * design, so one file per cell is the right post-compaction shape
    * until a cell approaches file-size limits); cells under the bound
    * are left byte-identical.
    *
    * SWAP PROTOCOL (crash-safe, per cell — nothing is DELETED until
    * the replacement is visible):
    *  1. write the replacement into `_graft_compact_tmp` (hidden from
    *     Spark readers; carries a `_SUCCESS` marker),
    *  2. write `_graft_swap_manifest` (hidden): line 1 the ATTEMPT'S
    *     unique replacement name (Spark part names embed a per-job
    *     UUID — a re-compaction of a cell that already holds an older
    *     `compact-*` file cannot be confused with it), then the exact
    *     names of the visible files this attempt will move,
    *  3. MOVE the manifest-listed files into `_graft_swap` (renames —
    *     also hidden),
    *  4. rename the replacement in under the manifest's name,
    *  5. delete the hidden dirs + manifest.
    * A crash at ANY point leaves every row present in either the
    * visible or a hidden location, and the RECOVERY pass at the next
    * [[compactIvfStore]] entry finishes or rolls back from the
    * markers, keyed on the MANIFEST (never on a name prefix):
    * manifest's replacement visible → the swap is complete, clean up;
    * replacement not visible but tmp complete → first finish moving
    * EVERY still-visible manifest-listed file into `_graft_swap`
    * (otherwise their rows would duplicate the replacement's), then
    * redo step 4; tmp incomplete → move the swap contents back.
    * A manifest with no swap dir means nothing moved yet — the
    * attempt is abandoned wholesale. No state loses or duplicates
    * data.
    *
    * CONCURRENCY: compaction is a MAINTENANCE operation — a probe
    * running concurrently with steps 2–3 can transiently see a
    * partial cell (files are moved one rename at a time; no
    * multi-file atomicity exists on a plain filesystem). Run it
    * behind the serving path's quiesce, or accept transiently
    * reduced recall during the seconds a cell swaps; a serving
    * [[graft.query.IvfServer]] notices the finished mutation through
    * its per-cell version stamps (or an explicit `refresh()`).
    * Probe results are IDENTICAL pre/post (spec-pinned). Returns the
    * number of cells rewritten. */
  def compactIvfStore(spark: SparkSession, storeDir: String,
                      maxFilesPerCell: Int = 8): Int =
    sweepCells(spark, storeDir,
      (_, files) => files.length > maxFilesPerCell, identity)

  /** Bound on concurrent per-cell rewrite jobs in [[sweepCells]] —
    * each is one small coalesce(1) write, so the sweep's wall time is
    * ceil(touched / this) job rounds instead of `touched` rounds. */
  private val SweepRewriteThreads = 8

  /** Per-cell crash-safe rewrite sweep shared by [[compactIvfStore]]
    * (file-count coalesce) and [[compactIvfDeletes]] (tombstone
    * reclaim): recovery of any crashed swap runs for EVERY cell dir
    * first (sequential — driver-side metadata ops), then cells passing
    * `shouldRewrite` are replaced by `transform` of their contents
    * under the swap protocol documented at [[compactIvfStore]]. The
    * rewrites run CONCURRENTLY (bounded pool): each swap touches only
    * its own cell directory, so the protocol's crash states compose —
    * a crash mid-sweep leaves each cell in one of the states the next
    * sweep's recovery pass handles. */
  private def sweepCells(
      spark: SparkSession, storeDir: String,
      shouldRewrite: (org.apache.hadoop.fs.Path,
        Array[org.apache.hadoop.fs.FileStatus]) => Boolean,
      transform: DataFrame => DataFrame): Int = {
    import org.apache.hadoop.fs.Path
    val root = new Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cellDirs = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
    def parquets(p: Path) = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    def cleanup(cd: Path): Unit = {
      fs.delete(new Path(cd, "_graft_swap"), true)
      fs.delete(new Path(cd, "_graft_compact_tmp"), true)
      fs.delete(new Path(cd, "_graft_swap_manifest"), false); ()
    }
    // RECOVERY from a previous crash (see protocol above)
    cellDirs.foreach { cds =>
      val cd = cds.getPath
      val tmp = new Path(cd, "_graft_compact_tmp")
      val swap = new Path(cd, "_graft_swap")
      val manifest = new Path(cd, "_graft_swap_manifest")
      if (fs.exists(manifest) && !fs.exists(swap)) {
        // manifest written, nothing moved yet — abandon the attempt
        cleanup(cd)
      } else if (fs.exists(swap) && fs.exists(manifest)) {
        val in = fs.open(manifest)
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().toVector
          finally in.close()
        val target = new Path(cd, lines.head)
        val listed = lines.tail
        val tmpComplete = fs.exists(new Path(tmp, "_SUCCESS"))
        if (fs.exists(target)) {
          // step 4 completed under THIS attempt's name; any
          // manifest-listed straggler still visible holds rows the
          // replacement already carries — park it in swap, clean up
          listed.foreach { n =>
            val p = new Path(cd, n)
            if (fs.exists(p)) { fs.rename(p, new Path(swap, n)); () }
          }
          cleanup(cd)
        } else if (tmpComplete) {
          // finish step 3 for every still-visible listed file (a bare
          // rename-in here would duplicate their rows), then redo 4
          listed.foreach { n =>
            val p = new Path(cd, n)
            if (fs.exists(p)) { fs.rename(p, new Path(swap, n)); () }
          }
          fs.rename(parquets(tmp).head.getPath, target)
          cleanup(cd)
        } else {
          // no usable replacement — roll the moved files back
          parquets(swap).foreach(f =>
            fs.rename(f.getPath, new Path(cd, f.getPath.getName)))
          cleanup(cd)
        }
      } else if (fs.exists(swap)) {
        // swap without a manifest (pre-manifest layout). That protocol
        // could crash BETWEEN its rename-in and its cleanup, leaving
        // the replacement visible with swap still present — rolling
        // the swap back then would duplicate every compacted row. The
        // discriminator is the tmp dir: the replacement part is
        // renamed OUT of a completed tmp, so a `_SUCCESS`-marked tmp
        // with no parquet left inside means the rename-in happened
        // (the part went to the one place renames send it — the cell
        // dir) and the swap is completed garbage; a tmp still holding
        // its parquet (or absent) means nothing was renamed in — roll
        // the swap files back.
        val renamedIn = fs.exists(new Path(tmp, "_SUCCESS")) &&
          parquets(tmp).isEmpty
        if (!renamedIn)
          parquets(swap).foreach(f =>
            fs.rename(f.getPath, new Path(cd, f.getPath.getName)))
        cleanup(cd)
      } else if (fs.exists(tmp)) fs.delete(tmp, true)
    }
    // REWRITE the selected cells — each swap is cell-dir-local, so
    // the writes fan out across a bounded pool
    def rewrite(cd: Path, dataFiles: Array[org.apache.hadoop.fs
        .FileStatus]): Unit = {
      val tmp = new Path(cd, "_graft_compact_tmp")
      val swap = new Path(cd, "_graft_swap")
      val manifest = new Path(cd, "_graft_swap_manifest")
      // 1. replacement (hidden)
      transform(spark.read.parquet(cd.toString))
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val newFile = parquets(tmp).head.getPath
      // 2. manifest: the attempt's unique target name + exactly the
      //    files being swapped out (closed before any file moves)
      val mo = fs.create(manifest, true)
      try mo.write(
        (s"compact-${newFile.getName}" +:
          dataFiles.map(_.getPath.getName).toVector)
          .mkString("\n").getBytes("UTF-8"))
      finally mo.close()
      // 3. old files move (not delete) into the hidden swap dir
      fs.mkdirs(swap)
      dataFiles.foreach(f =>
        fs.rename(f.getPath, new Path(swap, f.getPath.getName)))
      // 4. replacement becomes visible under the manifest's name
      fs.rename(newFile, new Path(cd, s"compact-${newFile.getName}"))
      // 5. cleanup — only now is anything deleted
      cleanup(cd)
    }
    val selected = cellDirs.iterator
      .map(cds => (cds.getPath, parquets(cds.getPath)))
      .filter { case (cd, files) => shouldRewrite(cd, files) }
      .toVector
    if (selected.isEmpty) 0
    else if (selected.length == 1) {
      rewrite(selected.head._1, selected.head._2); 1
    } else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(SweepRewriteThreads, selected.length))
      try selected.map { case (cd, files) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = rewrite(cd, files)
        })
      }.foreach(_.get())
      finally { pool.shutdown(); () }
      selected.length
    }
  }

  // ---- takedown deletion for the durable vector store -------------

  /** Tombstones directory of a durable IVF store: underscore-prefixed
    * (invisible to Spark parquet readers of the store itself), holding
    * append-only parquet batches of deleted vec_ids. */
  private[graft] val IvfTombstonesName = "_graft_tombstones"

  /** TAKEDOWN-shaped deletion for a [[writeIvfLayout]] store (the
    * embeddings half of a curation pipeline's removal request — the
    * [[graft.queries.IrSql.deleteBm25Docs]] discipline applied to
    * vectors): `ids` (a `vec_id` column; takedown-sized) are
    * TOMBSTONED — appended as one parquet batch under
    * [[IvfTombstonesName]] — and every probe path reads the store
    * through [[liveIvfStore]]'s anti-join, so tombstoned vectors stop
    * appearing in results immediately, with NO data rewrite at delete
    * time. [[compactIvfDeletes]] physically reclaims them; a SEED
    * vector (the store's coordinate system is derived as its k
    * smallest vec_ids) is excluded from results like any other id but
    * its row survives compaction as a retained centroid until the
    * next [[reclusterIvfStore]] purges it with the rest.
    *
    * Idempotent on the SET: replaying a delete appends a duplicate
    * batch, and every reader dedups. Appending a batch is the only
    * mutation — a crash mid-write leaves staging garbage Spark
    * readers never see. Re-ingesting a previously tombstoned id is
    * NOT supported until a re-clustering has cleared its tombstone
    * (the takedown contract: removal wins). */
  def deleteIvfVectors(spark: SparkSession, storeDir: String,
                       ids: DataFrame): Unit = {
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverTombstoneShrink(fs, root)
    ids.select(col("vec_id").cast("long").as("vec_id")).distinct()
      .coalesce(1)
      .write.mode("append")
      .parquet(s"$storeDir/$IvfTombstonesName")
  }

  /** The store's pending tombstone set (deduped across batches), or
    * None when no deletions are pending. Runs the shrink-swap
    * recovery first, so a crashed [[compactIvfDeletes]] can never
    * hide tombstones from a reader. */
  private[graft] def ivfTombstones(spark: SparkSession,
                                   storeDir: String): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverTombstoneShrink(fs, root)
    val t = new org.apache.hadoop.fs.Path(root, IvfTombstonesName)
    if (fs.exists(t) && fs.listStatus(t).exists(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet")))
      Some(spark.read.parquet(t.toString)
        .select(col("vec_id")).distinct())
    else None
  }

  /** A durable store's LIVE view: its contents minus pending
    * tombstones. The anti side is takedown-sized and broadcasts, so
    * the view costs one hash-lookup per scanned row — partition
    * pruning on `cell` still reaches the file scan underneath. */
  private[graft] def liveIvfStore(spark: SparkSession,
                                  storeDir: String): DataFrame = {
    val stored = spark.read.parquet(storeDir)
    ivfTombstones(spark, storeDir) match {
      case Some(t) => stored.join(broadcast(t), Seq("vec_id"), "left_anti")
      case None => stored
    }
  }

  /** Replace (or drop) the tombstones dir under a crash-safe rename
    * swap: stage the remainder, park the current dir, swap in, delete
    * the parked copy. Every crash state is recovered by
    * [[recoverTombstoneShrink]], and every intermediate state
    * OVER-filters at worst (a rolled-back shrink re-hides ids whose
    * rows are already gone — a no-op anti-join), never under. */
  private def replaceTombstones(
      spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      remaining: Option[DataFrame]): Unit = {
    import org.apache.hadoop.fs.Path
    val cur = new Path(root, IvfTombstonesName)
    val old = new Path(root, IvfTombstonesName + "_old")
    remaining match {
      case Some(df) =>
        val next = new Path(root, IvfTombstonesName + "_next")
        df.coalesce(1).write.mode("overwrite").parquet(next.toString)
        require(fs.rename(cur, old), s"rename $cur -> $old failed")
        require(fs.rename(next, cur), s"rename $next -> $cur failed")
      case None =>
        require(fs.rename(cur, old), s"rename $cur -> $old failed")
    }
    fs.delete(old, true)
    ()
  }

  /** Recovery for [[replaceTombstones]]: finish a complete staged
    * shrink forward, else roll the parked dir back. */
  private def recoverTombstoneShrink(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit = {
    import org.apache.hadoop.fs.Path
    val cur = new Path(root, IvfTombstonesName)
    val next = new Path(root, IvfTombstonesName + "_next")
    val old = new Path(root, IvfTombstonesName + "_old")
    if (fs.exists(old)) {
      if (fs.exists(cur)) { fs.delete(old, true); () }
      else if (fs.exists(next) &&
          fs.exists(new Path(next, "_SUCCESS"))) {
        require(fs.rename(next, cur), s"rename $next -> $cur failed")
        fs.delete(old, true); ()
      } else {
        require(fs.rename(old, cur), s"rename $old -> $cur failed")
      }
    }
    if (fs.exists(next)) { fs.delete(next, true); () }
  }

  /** Physically reclaim tombstoned vectors: rewrite ONLY the cell
    * directories that hold a dead non-seed row (each under
    * [[sweepCells]]'s crash-safe swap — untouched cells stay
    * byte-identical), then shrink the tombstone set to the retained
    * remainder (dead SEEDS — rows kept as the derived coordinate
    * system until a re-clustering; the shrink itself swaps under
    * [[replaceTombstones]]). Probe results are identical pre/post
    * (spec-pinned). Returns the number of cells rewritten.
    *
    * At store scale the reclaim cost follows the takedown's CELL
    * footprint (one batch touches at most |batch| of the k cells),
    * never the corpus — the [[graft.queries.IrSql.compactBm25Deletes]]
    * posture for vectors. */
  def compactIvfDeletes(spark: SparkSession, storeDir: String): Int =
    compactCellDeletes(spark, storeDir, retainSeeds = true)

  /** The reclaim shared with the PQ codes-only layout
    * ([[Pq.compactPqDeletes]]): `retainSeeds = false` for stores
    * whose coordinate system lives OUTSIDE the store (the PQ coarse
    * seeds come from the embeddings table), so every tombstoned row
    * reclaims and the tombstone dir drops entirely. */
  private[graft] def compactCellDeletes(spark: SparkSession,
                                        storeDir: String,
                                        retainSeeds: Boolean): Int = {
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ivfTombstones(spark, storeDir) match {
      case None => 0
      case Some(dead) =>
        import spark.implicits._
        val seedDf =
          if (retainSeeds) storeSeeds(spark, storeDir).map(_._1).toSeq
            .toDF("vec_id")
          else Seq.empty[Long].toDF("vec_id")
        val deadGone = dead.join(seedDf, Seq("vec_id"), "left_anti")
        val touched = spark.read.parquet(storeDir)
          .join(broadcast(deadGone), Seq("vec_id"), "left_semi")
          .select(col("cell")).distinct()
          .collect().map(_.getAs[Number](0).longValue).toSet
        val rewritten =
          if (touched.isEmpty) 0
          else sweepCells(spark, storeDir,
            (p, _) => p.getName.startsWith("cell=") &&
              touched.contains(p.getName.stripPrefix("cell=").toLong),
            df => df.join(broadcast(deadGone), Seq("vec_id"), "left_anti"))
        val remaining = dead.join(seedDf, Seq("vec_id"), "left_semi")
        replaceTombstones(spark, fs, root,
          if (remaining.isEmpty) None else Some(remaining))
        rewritten
    }
  }

  /** RE-CLUSTER a durable store in place — the maintenance step the
    * streaming gate's sizing discipline prescribes (k ≈ n/128, so
    * per-probe work stays ~[[SemDedupCellSize]] as the corpus grows):
    * re-seed at the corpus-sized k from the store's CURRENT contents
    * (seeds = its k smallest vec_ids — the dense-layout `vec_id < k`
    * rule generalized), reassign every stored vector (flat argmax;
    * the coarse two-level router past [[CoarseAssignCrossover]]), and
    * swap the new `cell=` layout in under a crash-safe protocol. A
    * store built at a small k whose occupancy has drifted probes
    * identically to one built at the new k from scratch
    * (spec-pinned against [[writeIvfLayoutK]]).
    *
    * SWAP PROTOCOL (store-level twin of [[compactIvfStore]]'s —
    * nothing is deleted until the replacement layout is visible):
    *  1. write the replacement layout into `_graft_recluster_tmp`
    *     (hidden; `repartition(cell)` first — one file per cell),
    *  2. write `_graft_recluster_manifest`: line 1 the new k, then
    *     the names of the visible `cell=` dirs being replaced,
    *  3. MOVE the old cell dirs into `_graft_recluster_swap`, then
    *     touch `_graft_recluster_moved` — the marker that separates
    *     "old dirs leaving" from "new dirs arriving" (old and new
    *     dirs share names, so without it a recovery could not tell
    *     which generation a visible dir belongs to),
    *  4. move the tmp layout's cell dirs in, write the store meta
    *     (new k), invalidate the session seed cache,
    *  5. delete the hidden dirs and markers.
    * RECOVERY (at the next recluster entry): moved-marker present →
    * every visible cell dir is already new, finish step 4; swap
    * without the marker → mid-step-3 crash, roll the swap dirs back;
    * manifest without swap → nothing moved, abandon the attempt.
    *
    * CONCURRENCY: like compaction, a maintenance operation — run it
    * behind the serving path's quiesce; a serving
    * [[graft.query.IvfServer]] notices the mutation through its
    * version stamps. Returns the new k.
    *
    * `replacement` (the [[updateIvfVectors]] seed-range leg): extra
    * (vec_id, embedding) rows unioned into the rebuild SOURCE beside
    * the live view — re-ingested versions of ids whose OLD rows are
    * tombstoned. The new coordinate system derives over live ∪
    * replacement, exactly as a from-scratch build over the updated
    * corpus would; their tombstones are among the batches the rebuild
    * consumes and trims. */
  def reclusterIvfStore(spark: SparkSession, storeDir: String,
                        k: Option[Long] = None,
                        replacement: Option[DataFrame] = None): Long = {
    import org.apache.hadoop.fs.Path
    val root = new Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverRecluster(spark, fs, root, storeDir)
    // a re-clustering is the full-purge point of the deletion story:
    // it rebuilds from the LIVE view, so tombstoned rows (including
    // dead seed remnants compaction retained) never reach the new
    // layout. Snapshot the tombstone batches NOW — only these are
    // cleared after the swap (a takedown arriving mid-rebuild keeps
    // its tombstone; a crash before the trim leaves stale tombstones
    // that over-filter ids no longer present, a harmless no-op).
    val tombPath = new Path(root, IvfTombstonesName)
    val tombBatches: Seq[Path] =
      if (fs.exists(tombPath))
        fs.listStatus(tombPath).filter(_.isFile).map(_.getPath).toSeq
      else Nil
    val stored = {
      val live = liveIvfStore(spark, storeDir)
        .select(col("vec_id"), col("embedding"))
      replacement.fold(live)(r =>
        live.unionByName(r.select(col("vec_id"), col("embedding"))))
    }
    val n = stored.count()
    val newK = k.getOrElse(math.max(IvfCentroids.toLong,
      (n + SemDedupCellSize - 1) / SemDedupCellSize))
    require(newK <= Int.MaxValue, s"recluster k $newK exceeds seed bound")
    val seeds = stored.orderBy("vec_id").limit(newK.toInt)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val assigned =
      if (n >= CoarseAssignCrossover) coarseCellsAgainst(stored, seeds, newK)
      else argmaxCellsAgainst(stored, seeds)
    val tmp = new Path(root, "_graft_recluster_tmp")
    val swap = new Path(root, "_graft_recluster_swap")
    val manifest = new Path(root, "_graft_recluster_manifest")
    val moved = new Path(root, "_graft_recluster_moved")
    // 1. replacement layout, hidden (this WRITE is also the action
    // that materializes the reassignment — the old layout is still
    // fully in place while it reads)
    assigned.repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(tmp.toString)
    // 2. manifest (closed before anything moves)
    val oldCells = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
    val mo = fs.create(manifest, true)
    try mo.write(
      (newK.toString +: oldCells.map(_.getPath.getName).toVector)
        .mkString("\n").getBytes("UTF-8"))
    finally mo.close()
    // 3. old cell dirs move OUT (renames), then the generation marker
    fs.mkdirs(swap)
    oldCells.foreach(cd =>
      fs.rename(cd.getPath, new Path(swap, cd.getPath.getName)))
    fs.create(moved, true).close()
    // 4.–5. new dirs in, meta, cache invalidation, cleanup
    finishRecluster(fs, root, storeDir, newK)
    // trim exactly the tombstone batches the rebuild consumed
    tombBatches.foreach(p => fs.delete(p, false))
    if (fs.exists(tombPath) &&
        fs.listStatus(tombPath).forall(f =>
          !f.isFile || !f.getPath.getName.endsWith(".parquet")))
      fs.delete(tombPath, true)
    newK
  }

  /** Steps 4–5 of the recluster protocol — also the recovery tail for
    * a crash after the moved-marker: every visible `cell=` dir is
    * already the new generation; move the remaining tmp dirs in
    * (renames are atomic — a dir lives on exactly one side), write
    * the meta, drop the seed cache, delete the markers. */
  private def finishRecluster(fs: org.apache.hadoop.fs.FileSystem,
                              root: org.apache.hadoop.fs.Path,
                              storeDir: String, newK: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = new Path(root, "_graft_recluster_tmp")
    // tmp may already be drained AND deleted by a recovery that
    // crashed mid-cleanup — the remaining steps are idempotent
    if (fs.exists(tmp))
      fs.listStatus(tmp)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
        .foreach(cd =>
          fs.rename(cd.getPath, new Path(root, cd.getPath.getName)))
    writeStoreMeta(fs, root, newK)
    storeSeedCache.remove(storeDir)
    fs.delete(new Path(root, "_graft_recluster_swap"), true)
    fs.delete(tmp, true)
    fs.delete(new Path(root, "_graft_recluster_moved"), false)
    fs.delete(new Path(root, "_graft_recluster_manifest"), false)
    ()
  }

  /** Crash recovery for [[reclusterIvfStore]] (see its protocol). */
  private def recoverRecluster(spark: SparkSession,
                               fs: org.apache.hadoop.fs.FileSystem,
                               root: org.apache.hadoop.fs.Path,
                               storeDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = new Path(root, "_graft_recluster_tmp")
    val swap = new Path(root, "_graft_recluster_swap")
    val manifest = new Path(root, "_graft_recluster_manifest")
    val moved = new Path(root, "_graft_recluster_moved")
    if (!fs.exists(manifest)) {
      // a tmp with no manifest: the attempt died before anything
      // could move — abandon the replacement wholesale
      if (fs.exists(tmp)) { fs.delete(tmp, true); () }
    } else if (fs.exists(moved)) {
      // all old dirs are in swap; visible cell dirs are new — finish
      val in = fs.open(manifest)
      val newK =
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().next().trim.toLong
        finally in.close()
      finishRecluster(fs, root, storeDir, newK)
    } else if (fs.exists(swap)) {
      // mid-step-3 crash: nothing renamed in yet — roll the swap back
      // (manifest-listed dirs still visible never moved; renames are
      // atomic so each dir is on exactly one side)
      fs.listStatus(swap)
        .filter(_.isDirectory)
        .foreach(cd =>
          fs.rename(cd.getPath, new Path(root, cd.getPath.getName)))
      fs.delete(swap, true); fs.delete(tmp, true)
      fs.delete(manifest, false)
      ()
    } else {
      // manifest with no swap: nothing moved — abandon
      fs.delete(tmp, true); fs.delete(manifest, false)
      ()
    }
  }

  /** ONE-CALL store maintenance — the documented cadence API behind
    * a long-lived store (the streaming gate runs the compaction half
    * in-loop; an operator or scheduler runs THIS on whatever cadence
    * the ingest rate warrants): finish any crashed re-clustering
    * (recovery is [[reclusterIvfStore]]'s entry pass), compact cells
    * past the file bound, then RE-CLUSTER iff occupancy has drifted
    * past `driftFactor` × [[SemDedupCellSize]] AND the corpus-sized k
    * actually exceeds the current k (a store already at its sized k
    * is left alone — re-clustering is a full rewrite, not a tick).
    * Returns (cells compacted, the store's k after maintenance). */
  def maintainIvfStore(spark: SparkSession, storeDir: String,
                       maxFilesPerCell: Int = 8,
                       driftFactor: Double = 2.0): (Int, Long) = {
    // finish any crashed re-clustering FIRST (r11 ADVICE medium):
    // without this entry pass, a moved-marker crash state would be
    // compacted and counted as a PARTIAL store — drift/k computed from
    // the partial view, and when the drift gate doesn't fire the store
    // keeps serving missing rows until some later reclusterIvfStore
    {
      val root = new org.apache.hadoop.fs.Path(storeDir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      recoverRecluster(spark, fs, root, storeDir)
    }
    compactIvfDeletes(spark, storeDir)
    val compacted = compactIvfStore(spark, storeDir, maxFilesPerCell)
    // LIVE count: retained dead-seed rows and any tombstones that
    // arrived since the reclaim must not inflate the drift math
    val n = liveIvfStore(spark, storeDir).count()
    val k = storeK(spark, storeDir)
    val target = math.max(IvfCentroids.toLong,
      (n + SemDedupCellSize - 1) / SemDedupCellSize)
    val newK =
      if (target > k && n.toDouble / k > driftFactor * SemDedupCellSize)
        reclusterIvfStore(spark, storeDir)
      else k
    (compacted, newK)
  }

  /** Append a delta batch against a store's OWN seed system — the
    * maintenance-correct twin of [[appendIvfLayout]] for stores whose
    * k no longer matches the source table's family default (i.e.
    * after [[reclusterIvfStore]]): the delta is argmax-assigned
    * against the store's cached seed centroids (meta-k smallest
    * vec_ids — exactly the coordinate system its probes route by),
    * then partition-appended. */
  def appendIvfStore(spark: SparkSession, storeDir: String,
                     delta: DataFrame): Unit = {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val seedRows = storeSeeds(spark, storeDir)
    // the seed system is DERIVED ('k smallest vec_ids'): a delta id at
    // or below the current max seed id would change what a later
    // session derives as the seed set, silently mis-routing every
    // probe against rows assigned under the old system (r11 ADVICE) —
    // ids must grow monotonically past the frozen seed range
    val maxSeedId = seedRows.map(_._1).max
    val minRow = delta.agg(min(col("vec_id"))).head()
    if (minRow.isNullAt(0)) return // empty delta: nothing to append
    val minDelta = minRow.getLong(0)
    require(minDelta > maxSeedId,
      s"delta vec_id $minDelta intrudes into the store's seed range " +
        s"(max seed id $maxSeedId): appended ids must exceed every " +
        "seed id or the derived seed set changes under later sessions")
    val seeds = seedRows.toSeq
      .toDF("cid", "cvec")
      .select(col("cid"), col("cvec").cast("array<float>").as("cvec"))
    argmaxCellsAgainst(delta, seeds)
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("append").parquet(storeDir)
  }

  /** [[annIvf]] served from the durable [[writeIvfLayout]] store with
    * NO cached corpus. Output-identical to [[annIvf]] by
    * construction — the driver checks it against the SAME oracle. */
  def annIvfLoaded(spark: SparkSession, dir: String,
                   k: Int = 10): DataFrame =
    probeIvfStore(spark, cachedIvfStore(spark, dir), k)

  /** IVF ANN with nProbe > 1 — the recall knob the [[annIvf]] scaladoc
    * documents, made real: rank ALL centroids by cosine against the
    * query, probe the top `nProbe` cells, exact re-rank inside them.
    * Probe set is a broadcast of nProbe rows; candidates can't
    * duplicate (each vector lives in exactly one cell). */
  def annIvfProbe(spark: SparkSession, dir: String, k: Int = 10,
                  nProbe: Int = 2): DataFrame = {
    // lazy localCheckpoint, not persist — see annIvf
    val cells = ivfCells(spark, dir).stage()
    val e = emb(spark, dir)
    val cents = e.filter(col("vec_id") < IvfCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val probeCells = q.crossJoin(broadcast(cents))
      .select(col("qv"), col("cid"), cosine(col("qv"), col("cvec")).as("s"))
      .orderBy(col("s").desc, col("cid"))
      .limit(nProbe)
      .select(col("qv"), col("cid"))
    cells.filter(col("vec_id") =!= 0)
      .join(broadcast(probeCells), col("cell") === col("cid"))
      .select(col("vec_id"), cosine(col("embedding"), col("qv")).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("c"), 4).as("cos"))
  }

  /** Metadata predicate for the FILTERED-ANN family — the "vector
    * search with a WHERE clause" every production store serves
    * (per-tenant / language / length gates). Fixed so the DuckDB
    * oracle embeds the identical predicate: document is [[FilterLang]]
    * with at least [[FilterMinChars]] chars (~28% of the test corpus —
    * selective enough that filtering matters, dense enough that a
    * probed cell still fills k). */
  val FilterLang = "en"
  val FilterMinChars = 200L

  /** The filter side of every filtered-ANN variant: a documents scan
    * whose predicate PUSHES DOWN (both columns are plain parquet
    * attributes — `PushedFilters` in the plan, spec-pinned) projecting
    * only the id. vec_id aligns 1:1 with doc_id in the testdata; a
    * corpus with separate id spaces swaps in its mapping join here. */
  private[graft] def filterIds(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.load(spark, dir, "documents")
      .filter(col("lang") === FilterLang &&
        col("n_chars") >= FilterMinChars)
      .select(col("doc_id").as("vec_id"))

  /** FILTERED exact ANN — brute-force cosine top-k restricted to
    * vectors passing [[filterIds]]: the PRE-FILTER ground truth (filter
    * first, then rank — never misses a qualifying vector, unlike
    * post-filtering a fixed-size unfiltered candidate list). Plan: one
    * embeddings scan equi-joined with the pushed-down metadata scan
    * (at warehouse scale the two tables co-partition/bucket on the id,
    * so this join never shuffles the big side twice), broadcast 1-row
    * query, TakeOrderedAndProject. */
  def annFiltered(spark: SparkSession, dir: String,
                  k: Int = 10): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    e.filter(col("vec_id") =!= 0)
      .join(filterIds(spark, dir), Seq("vec_id"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), cosine(col("embedding"), col("qv")).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("c"), 4).as("cos"))
  }

  /** FILTERED IVF ANN — the scale path for [[annFiltered]]: probe the
    * query's nProbe nearest cells ([[annIvfProbe]]'s routing), apply
    * the metadata filter INSIDE the probed-cell candidate set (the
    * filter frame equi-joins the already-cell-restricted scan — on the
    * durable layout the cell restriction is partition pruning, so the
    * filter join touches nProbe directories of vectors, not the
    * corpus), exact cosine re-rank. Semantics = pre-filter within the
    * probed cells; like every IVF query it trades recall for the
    * (1 − nProbe/k) of the corpus never opened, and a highly selective
    * filter empties cells faster — the standard operational answer is
    * raising nProbe, which is the knob here.
    * [[probeIvfStoreFiltered]] is this query against the durable
    * layout, where the cell restriction is literal partition
    * pruning. */
  def annIvfFiltered(spark: SparkSession, dir: String, k: Int = 10,
                     nProbe: Int = 2): DataFrame =
    // lazy localCheckpoint, not persist — see annIvf
    annIvfFilteredOver(spark, dir, ivfCells(spark, dir).stage(), k, nProbe)

  /** [[annIvfFiltered]] over a PRE-STAGED cell assignment — split out
    * so [[annFilteredRecallEval]] feeds every IVF arm from ONE
    * assignment pass (the dedupEval shared-pass discipline): standalone
    * the arm stages its own cells, in the panel all arms read the same
    * checkpointed frame. Output-identical either way. */
  private[graft] def annIvfFilteredOver(spark: SparkSession, dir: String,
      cells: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val e = emb(spark, dir)
    val cents = e.filter(col("vec_id") < IvfCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val probeCells = q.crossJoin(broadcast(cents))
      .select(col("qv"), col("cid"), cosine(col("qv"), col("cvec")).as("s"))
      .orderBy(col("s").desc, col("cid"))
      .limit(nProbe)
      .select(col("qv"), col("cid"))
    cells.filter(col("vec_id") =!= 0)
      .join(broadcast(probeCells), col("cell") === col("cid"))
      .join(filterIds(spark, dir), Seq("vec_id"))
      .select(col("vec_id"), cosine(col("embedding"), col("qv")).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("c"), 4).as("cos"))
  }

  /** Survivor oversample factor for the ADAPTIVE filtered probe: the
    * escalation stops once the probed cells hold `oversample × k`
    * filter survivors (or every cell is probed). Plain `≥ k` stops at
    * the first cell whenever the filter is dense there — exactly the
    * regime where nProbe=1 recall is lowest — so the production rule
    * over-fetches (the standard filtered-search practice); shared
    * with the oracle generator. */
  val FilteredAutoOversample = 3

  /** The escalation ladder: nProbe doubles from 1 and is capped at
    * the cell count (the cap itself is always a rung, so a filter too
    * selective for any prefix degrades to the exact pre-filtered scan
    * rather than an under-filled answer). */
  private[graft] def autoLadder(nCells: Int): Seq[Int] =
    (Iterator.iterate(1)(_ * 2).takeWhile(_ < nCells).toSeq
      :+ nCells).distinct

  /** ADAPTIVE-nProbe filtered ANN — closes the operational hole the
    * recall panel measures (a selective filter starves the probed
    * cells; a FIXED nProbe silently returns an under-recalled or
    * under-filled list): rank the cells against the query once, then
    * walk the doubling ladder, counting filter SURVIVORS in each
    * newly probed slice, until the probed prefix holds
    * [[FilteredAutoOversample]]·k survivors or every cell is probed —
    * then exact-rank inside the chosen prefix (the same scoring and
    * rounding as [[annIvfFiltered]], so at an equal nProbe the two
    * are output-identical, spec-pinned). Each escalation step touches
    * only the NEW cells (on the durable layout, new partition dirs —
    * [[probeIvfStoreFilteredAuto]]), so the worst case costs one
    * ladder walk of the same directories a fixed cap-level probe
    * reads once. When the filter leaves fewer than the target
    * survivors corpus-wide, the cap rung makes the answer the EXACT
    * pre-filtered truth (recall 1.0 — spec-pinned on a constructed
    * starved corpus). The DuckDB oracle replicates the ladder rule
    * itself, so the escalation CHOICE is hash-checked, not just the
    * final ranking. */
  def annIvfFilteredAuto(spark: SparkSession, dir: String, k: Int = 10,
                         minSurvivors: Option[Int] = None): DataFrame =
    annIvfFilteredAutoOver(spark, dir, ivfCells(spark, dir).stage(), k,
      minSurvivors)

  /** [[annIvfFilteredAuto]] over a PRE-STAGED cell assignment (see
    * [[annIvfFilteredOver]] — the recall panel's shared pass). */
  private[graft] def annIvfFilteredAutoOver(spark: SparkSession,
      dir: String, cells: DataFrame, k: Int,
      minSurvivors: Option[Int]): DataFrame = {
    val target = minSurvivors.getOrElse(FilteredAutoOversample * k)
    val e = emb(spark, dir)
    val qv = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val cents = e.filter(col("vec_id") < IvfCentroids)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val ranked = cents
      .sortBy { case (cid, cv) => (-cosSeqInf(qv, cv), cid) }
      .map(_._1).toSeq
    val chosen = escalate(ranked, target) { newCells =>
      cells.filter(col("cell").isin(newCells: _*) && col("vec_id") =!= 0)
        .join(filterIds(spark, dir), Seq("vec_id")).count()
    }
    cells.filter(col("cell").isin(chosen: _*) && col("vec_id") =!= 0)
      .join(filterIds(spark, dir), Seq("vec_id"))
      .select(col("vec_id"),
        cosine(col("embedding"), typedLit(qv)).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("c"), 4).as("cos"))
  }

  /** [[annIvfFilteredAuto]] WITHOUT the metadata filter — the
    * routed-probe production default of the UNFILTERED serving path
    * ([[graft.query.HybridServer]]'s vector arm): rank the cells
    * against the query, walk the doubling ladder until the probed
    * prefix holds `oversample × k` candidates (survivor = any corpus
    * vector, so the ladder escalates only out of SMALL cells — the
    * clustered-corpus case where nProbe=1 under-fills), then
    * exact-rank inside the chosen prefix. At an equal landing nProbe
    * this is output-identical to [[annIvfProbe]]; the DuckDB oracle
    * replicates the ladder rule, so the escalation choice is
    * hash-checked (the annIvfFilteredAuto discipline, filter-free). */
  def annIvfAuto(spark: SparkSession, dir: String, k: Int = 10,
                 minSurvivors: Option[Int] = None): DataFrame = {
    val target = minSurvivors.getOrElse(FilteredAutoOversample * k)
    val cells = ivfCells(spark, dir).stage()
    val e = emb(spark, dir)
    val qv = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val cents = e.filter(col("vec_id") < IvfCentroids)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val ranked = cents
      .sortBy { case (cid, cv) => (-cosSeqInf(qv, cv), cid) }
      .map(_._1).toSeq
    val chosen = escalate(ranked, target) { newCells =>
      cells.filter(col("cell").isin(newCells: _*) && col("vec_id") =!= 0)
        .count()
    }
    cells.filter(col("cell").isin(chosen: _*) && col("vec_id") =!= 0)
      .select(col("vec_id"),
        cosine(col("embedding"), typedLit(qv)).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("c"), 4).as("cos"))
  }

  /** The ladder walk shared by the in-memory and durable-store auto
    * probes: count survivors slice by slice (each rung's count job
    * touches only the cells the previous rung didn't), stop at the
    * first rung whose cumulative count reaches `target`, else the
    * cap. Returns the chosen cell prefix. Driver-side callers with a
    * per-cell count dictionary ([[graft.query.IvfServer]]) pass a
    * map-sum `countIn` — zero Spark jobs for the walk. */
  private[graft] def escalate(ranked: Seq[Long], target: Long)
                           (countIn: Seq[Long] => Long): Seq[Long] = {
    val ladder = autoLadder(ranked.length)
    var probed = 0
    var survivors = 0L
    var i = 0
    while (i < ladder.length &&
        (survivors < target && probed < ranked.length)) {
      val np = ladder(i)
      survivors += countIn(ranked.slice(probed, np))
      probed = np
      i += 1
    }
    ranked.take(probed)
  }

  /** [[annIvfFilteredAuto]] against the durable store: cell ranking
    * from the store's own seeds, each ladder rung's survivor count a
    * PARTITION-PRUNED scan of only the newly probed `cell=` dirs, the
    * final ranking [[probeIvfStoreFiltered]]'s plan over the chosen
    * prefix. Output-identical to the in-memory form on the same
    * corpus (same seeds, routing order, rule, and predicate). */
  def probeIvfStoreFilteredAuto(spark: SparkSession, storeDir: String,
                                dir: String, k: Int = 10, qId: Long = 0L,
                                minSurvivors: Option[Int] = None)
      : DataFrame = {
    val target = minSurvivors.getOrElse(FilteredAutoOversample * k)
    val stored = liveIvfStore(spark, storeDir)
    val qv = stored.filter(col("vec_id") === qId)
      .select(col("embedding")).head().getSeq[Float](0)
    val ranked = storeSeeds(spark, storeDir)
      .sortBy { case (cid, cv) => (-cosSeqInf(qv, cv), cid) }
      .map(_._1).toSeq
    val chosen = escalate(ranked, target) { newCells =>
      stored.filter(col("cell").isin(newCells: _*) &&
          col("vec_id") =!= qId)
        .join(filterIds(spark, dir), Seq("vec_id")).count()
    }
    stored.filter(col("cell").isin(chosen: _*) && col("vec_id") =!= qId)
      .join(filterIds(spark, dir), Seq("vec_id"))
      .select(col("vec_id"),
        cosine(col("embedding"), typedLit(qv)).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("c"), 4).as("cos"))
  }

  /** The auto probe over the session-cached harness store — the
    * loaded driver entry (shares the in-memory form's oracle). */
  def annIvfFilteredAutoLoaded(spark: SparkSession, dir: String,
                               k: Int = 10): DataFrame =
    probeIvfStoreFilteredAuto(spark, cachedIvfStore(spark, dir), dir, k)

  /** FILTERED-ANN recall panel — the operational question of filtered
    * vector search measured: does the metadata filter empty the probed
    * cells, and does raising nProbe recover it? One row per nProbe
    * (1, 2) plus the ADAPTIVE probe ([[annIvfFilteredAuto]] — the
    * rule's landing point on this corpus): hits of each arm's top-k
    * within the exact pre-filtered truth ([[annFiltered]]). Recall is
    * MONOTONE in nProbe by construction (a truth vector inside the
    * candidate set is always inside its top-k — fewer than k corpus
    * vectors beat it), so the panel reads as the knob's recovery
    * curve. Arms ARE the standalone oracle-checked queries; the truth
    * list broadcasts (k rows). */
  def annFilteredRecallEval(spark: SparkSession, dir: String,
                            k: Int = 10): DataFrame = {
    // ONE cell-assignment pass: all four IVF arms read the same staged
    // [[ivfCells]] frame instead of each re-running the broadcast-
    // centroid scored scan + argmax shuffle (guide §1.2 — the panel's
    // dominant repeated term; the dedupEval/hybridRecallEval shared-
    // pass discipline). Each arm's plan past the assignment is the
    // standalone oracle-checked query, unchanged.
    val cells = ivfCells(spark, dir).stage()
    val truth = broadcast(annFiltered(spark, dir, k).select(col("vec_id")))
    val arms: Seq[(String, DataFrame)] =
      Seq(1, 2).map(np =>
        s"nprobe$np" -> annIvfFilteredOver(spark, dir, cells, k,
          nProbe = np)) ++
        Seq("auto" -> annIvfFilteredAutoOver(spark, dir, cells, k, None),
          // the CODED adaptive arm (r13): its top-k ranks by ADC
          // distance, so its recall vs the exact-cosine truth also
          // prices the quantization loss, beside the ladder's
          // routing loss the fp32 auto arm isolates
          "auto_pq" -> Pq.annIvfPqFilteredAutoOver(spark, dir, cells, k,
            None))
    arms.map { case (name, df) =>
      df.select(col("vec_id")).join(truth, Seq("vec_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(name).as("method"), col("hits"),
          round(col("hits").cast("double") / k, 4).as(s"recall$k"))
    }.reduce(_ unionByName _).orderBy("method")
  }

  /** LSH-accelerated ANN: candidates = vectors sharing the query's
    * bucket; exact cosine re-rank inside the bucket. Falls back to
    * fewer than k results if the bucket is small (standard LSH
    * recall/latency trade — [[annLshMultiProbe]] widens recall). */
  def annLsh(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    // bucket computed IN the scan projection: joining the corpus back
    // against lshBuckets re-attached a column derivable from the row
    // itself, at the cost of a second scan + a full corpus shuffle
    val e = emb(spark, dir).select(col("vec_id"), col("embedding"),
      bucketUdf(col("embedding")).as("bucket"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("bucket").as("qb"), col("embedding").as("qv"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(q), col("bucket") === col("qb"))
      .select(col("vec_id"), cosine(col("embedding"), col("qv")).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("c"), 4).as("cos"))
  }

  /** Int8 scalar quantization of a float vector: scale = max|v|,
    * code_i = floor(v_i * 127 / scale + 0.5) ∈ [-127, 127]. The half
    * rule is floor(x + 0.5) — the one rounding with identical semantics
    * on both engines (Scala math.round and DuckDB round disagree on
    * negative halves). A float times/over exact small ints stays
    * deterministic IEEE double arithmetic, so the codes are a pure
    * function of the input on any engine. The scale CANCELS in cosine,
    * so quantized scoring needs only the codes; scale is kept for
    * dot-product/L2 reconstruction. */
  private val quantize8 = udf((v: Seq[Float]) => {
    var sc = 0.0
    v.foreach(x => sc = math.max(sc, math.abs(x.toDouble)))
    val codes = new Array[Byte](v.length)
    if (sc > 0) {
      var i = 0
      while (i < codes.length) {
        codes(i) = math.floor(v(i).toDouble * 127.0 / sc + 0.5).toInt.toByte
        i += 1
      }
    }
    (sc / 127.0, codes)
  })

  /** Cosine of two int8 code vectors: integer dot/norm sums in long
    * arithmetic (≤ 127²·dims — exact, order-free), one double division
    * chain at the end. Bit-identical to the oracle's double folds
    * because every summand is an integer far below 2^53. */
  private val qcosUdf = udf((a: Array[Byte], b: Array[Byte]) => {
    var dot = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < a.length) {
      dot += a(i).toLong * b(i)
      na += a(i).toLong * a(i)
      nb += b(i).toLong * b(i)
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  })

  /** The int8-quantized embedding store: (vec_id, scale DOUBLE,
    * qvec BINARY) — ONE BYTE per dimension, a 4× scan-size reduction
    * over fp32. Zero vectors (scale 0) are unquantizable and dropped on
    * both engines. */
  def quantized(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(col("vec_id"), quantize8(col("embedding")).as("q"))
      .select(col("vec_id"), col("q._1").as("scale"), col("q._2").as("qvec"))
      .filter(col("scale") > 0)

  /** Brute-force ANN over the int8 store: the [[annTopK]] plan
    * (broadcast 1-row query, narrow scan, TakeOrderedAndProject)
    * reading a quarter of the bytes — at 100 TB of fp32 embeddings
    * THIS is the store the first-stage scan reads; exact fp re-rank of
    * the short list is the optional second stage. */
  def annQuantized(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = quantized(spark, dir)
    val q = e.filter(col("vec_id") === 0).select(col("qvec").as("qq"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), qcosUdf(col("qvec"), col("qq")).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), (round(col("c"), 4) + 0.0).as("qcos"))
  }

  /** Hamming-rerank candidate-list size (the recall knob of
    * [[annBinary]]): the exact re-rank stage reads this many fp32
    * vectors, no matter the corpus size. */
  val BinaryCandidates = 50

  /** BINARY (sign-bit) quantization: each dimension collapses to its
    * sign, packed MSB-first into one LONG per 64 dims — a 32×
    * reduction over fp32 (here: 64 dims → exactly one long). Pure
    * Catalyst fold (`aggregate` + shiftleft/bitwiseOR — bit ops, so no
    * ANSI overflow on the top bit), codegen'd, no UDF. */
  def binaryCode(v: Column): Column =
    aggregate(v, lit(0L), (acc, x) =>
      shiftleft(acc, 1).bitwiseOR(when(x >= 0f, lit(1L)).otherwise(lit(0L))))

  /** BINARY-QUANTIZED ANN — the memory-floor point of the quantization
    * ladder (fp32 → int8 [[annQuantized]] → PQ [[Pq.annPq]] → 1 bit):
    * stage 1 ranks the WHOLE corpus by Hamming distance on the packed
    * sign codes — `bit_count(code XOR qcode)`, one xor+popcount per
    * candidate over an 8-byte column, the cheapest possible
    * first-stage scan — and keeps the [[BinaryCandidates]] best
    * (hamming asc, vec_id asc — deterministic cut); stage 2 joins the
    * BOUNDED candidate list (broadcast) back to the fp32 table for the
    * exact-cosine top-k. At 100 TB the stage-1 scan reads 1/32 of the
    * embedding bytes and the fp32 table is touched for exactly
    * [[BinaryCandidates]] rows. */
  def annBinary(spark: SparkSession, dir: String, k: Int = 10,
                c: Int = BinaryCandidates): DataFrame = {
    val e = emb(spark, dir)
    // the codes projection — at scale this is the persisted 8 B/vector
    // sign store, not a recompute
    val codes = e.select(col("vec_id"), binaryCode(col("embedding")).as("code"))
    val q = codes.filter(col("vec_id") === 0).select(col("code").as("qcode"))
    val cand = codes.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        call_function("bit_count", col("code").bitwiseXOR(col("qcode")))
          .cast("long").as("hamming"))
      .orderBy(col("hamming"), col("vec_id"))
      .limit(c)
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    e.join(broadcast(cand), Seq("vec_id"))
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), col("hamming"),
        cosine(col("embedding"), col("qv")).as("c0"))
      .orderBy(col("c0").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("hamming"),
        (round(col("c0"), 4) + 0.0).as("cos"))
  }

  /** MULTI-PROBE LSH ANN — the standard recall knob: probe the query's
    * bucket plus its 16 one-bit-flipped neighbors (the buckets a
    * near-neighbor most likely fell into when one hyperplane
    * disagreed). Still a bucket equi-join — the probe set (17 rows)
    * broadcasts into the bucketed vectors; each vector has exactly one
    * bucket, so probes can't duplicate candidates. Exact cosine
    * re-rank as usual. */
  def annLshMultiProbe(spark: SparkSession, dir: String,
                       k: Int = 10): DataFrame = {
    // same narrow bucket projection as annLsh — no corpus self-join
    val e = emb(spark, dir).select(col("vec_id"), col("embedding"),
      bucketUdf(col("embedding")).as("bucket"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("bucket").as("qb"), col("embedding").as("qv"))
    val probes = q.select(col("qv"),
      explode(array(col("qb") +: (0 until Planes).map(j =>
        col("qb").bitwiseXOR(lit(1L << j))): _*)).as("pb"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(probes), col("bucket") === col("pb"))
      .select(col("vec_id"), cosine(col("embedding"), col("qv")).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("c"), 4).as("cos"))
  }

  /** HYBRID retrieval via reciprocal rank fusion (RRF, Cormack et al.):
    * fuse the lexical BM25 ranking ([[graft.queries.IrSql.q10Bm25]])
    * with the semantic ANN ranking ([[annTopK]]) by summing
    * `1/(60 + rank)` per arm — the standard score-free fusion of a
    * sparse and a dense retriever (rank-based, so the arms'
    * incomparable score scales never meet). Documents surfacing in one
    * arm only still fuse (full outer join, missing arm contributes 0).
    *
    * Determinism: ranks come from row_number over (rounded score desc,
    * id) on each arm's top-k OUTPUT; contributions are
    * `floor(1e6/(rank+60))` — floor, not cast: DuckDB's double→BIGINT
    * cast ROUNDS where Spark's truncates, floor agrees everywhere.
    *
    * Scale shape: each arm ends in a TakeOrderedAndProject, so the
    * rank windows and the fusion join run over ≤topK-row bounded
    * frames — the single-partition window is bounded by construction,
    * never corpus-sized. */
  /** FILTERED hybrid retrieval — the plain [[hybridRrf]] fusion under
    * a metadata WHERE clause on BOTH arms (the real deployment shape:
    * "retrieve, but only documents passing the filter"): the lexical
    * arm is filtered BM25 ([[graft.queries.IrSql.q10Bm25Filtered]] —
    * candidates restricted before the top-k, term statistics still
    * collection-global), the semantic arm is the ADAPTIVE filtered
    * probe ([[annIvfFilteredAuto]] — the escalating production path,
    * its ladder rule independently hash-checked by
    * q25_ann_filtered_auto). Same RRF arithmetic and bounded rank
    * windows as the plain fusion. */
  def hybridRrfFiltered(spark: SparkSession, dir: String, k: Int = 10,
                        kRrf: Int = 60): DataFrame = {
    require(k <= 10,
      s"hybridRrfFiltered fuses top-10 arms; k=$k would read past them")
    import org.apache.spark.sql.expressions.Window
    val keep = filterIds(spark, dir)
      .select(col("vec_id").as("doc_id"))
    val lex = graft.queries.IrSql.q10Bm25Filtered(spark, dir, keep)
      .withColumn("lex_rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id")))
        .cast("long"))
    val sem = annIvfFilteredAuto(spark, dir, k = 10)
      .withColumn("sem_rank", row_number()
        .over(Window.orderBy(col("cos").desc, col("vec_id")))
        .cast("long"))
    def contrib(r: Column): Column =
      coalesce(floor(lit(1000000.0) / (r + lit(kRrf))).cast("long"), lit(0L))
    lex.select(col("doc_id"), col("lex_rank"))
      .join(sem.select(col("vec_id").as("doc_id"), col("sem_rank")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("sem_rank"),
        (contrib(col("lex_rank")) + contrib(col("sem_rank"))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }

  /** [[hybridRrf]] with the semantic arm ROUTED — the batch twin of
    * [[graft.query.HybridServer]]'s production default: the exact
    * BM25 lexical arm fused with [[annIvfAuto]] (doubling-ladder
    * escalation from nProbe=1) instead of the brute-force scan. Same
    * RRF arithmetic, same bounded rank windows; where the routed arm
    * lands on the full cell set the two fusions are identical, and
    * where it does not, the difference is exactly the IVF recall
    * trade the q37_hybrid_recall panel prices. */
  def hybridRrfAuto(spark: SparkSession, dir: String, k: Int = 10,
                    kRrf: Int = 60): DataFrame = {
    require(k <= 10,
      s"hybridRrfAuto fuses top-10 arms; k=$k would read past them")
    import org.apache.spark.sql.expressions.Window
    val lex = graft.queries.IrSql.q10Bm25(spark, dir)
      .withColumn("lex_rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id")))
        .cast("long"))
    val sem = annIvfAuto(spark, dir, k = 10)
      .withColumn("sem_rank", row_number()
        .over(Window.orderBy(col("cos").desc, col("vec_id")))
        .cast("long"))
    def contrib(r: Column): Column =
      coalesce(floor(lit(1000000.0) / (r + lit(kRrf))).cast("long"), lit(0L))
    lex.select(col("doc_id"), col("lex_rank"))
      .join(sem.select(col("vec_id").as("doc_id"), col("sem_rank")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("sem_rank"),
        (contrib(col("lex_rank")) + contrib(col("sem_rank"))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }

  /** HYBRID recall panel — the operational price of routing the
    * fused ranking's vector arm: hits of the ROUTED fusion's top-k
    * ([[hybridRrfAuto]] — the serving default's batch twin) within
    * the cap-probe fused truth ([[hybridRrf]], whose semantic arm is
    * the exact scan). Both arms ARE the standalone oracle-checked
    * entries (q25_ann_recall's discipline applied to the fusion). */
  def hybridRecallEval(spark: SparkSession, dir: String,
                       k: Int = 10): DataFrame = {
    require(k <= 10,
      s"hybridRecallEval fuses top-10 arms; k=$k would read past them")
    import org.apache.spark.sql.expressions.Window
    val kRrf = 60
    // ONE lexical pass: both fusions rank the SAME q10Bm25 frame, so
    // stage it instead of letting [[hybridRrf]] and [[hybridRrfAuto]]
    // each re-run the corpus-tokenizing BM25 arm (guide §1.2 — the
    // panel's two arms shared half their work); the fusion arithmetic
    // below is [[hybridRrf]]'s verbatim, and only the top-k doc_id
    // set (identical ordering, identical ties) feeds the compare
    val lex = graft.queries.IrSql.q10Bm25(spark, dir)
      .withColumn("lex_rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id")))
        .cast("long"))
      .select(col("doc_id"), col("lex_rank"))
      .stage()
    def contrib(r: Column): Column =
      coalesce(floor(lit(1000000.0) / (r + lit(kRrf))).cast("long"), lit(0L))
    def fuse(sem: DataFrame): DataFrame = {
      val semR = sem.withColumn("sem_rank", row_number()
          .over(Window.orderBy(col("cos").desc, col("vec_id")))
          .cast("long"))
        .select(col("vec_id").as("doc_id"), col("sem_rank"))
      lex.join(semR, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          (contrib(col("lex_rank")) + contrib(col("sem_rank"))).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(k)
        .select(col("doc_id"))
    }
    val truth = broadcast(fuse(annTopK(spark, dir, k = 10)))
    fuse(annIvfAuto(spark, dir, k = 10))
      .join(truth, Seq("doc_id"))
      .agg(count(lit(1)).as("hits"))
      .select(lit("auto").as("method"), col("hits"),
        round(col("hits").cast("double") / k, 4).as(s"recall$k"))
  }

  def hybridRrf(spark: SparkSession, dir: String, k: Int = 10,
                kRrf: Int = 60): DataFrame = {
    // both arms are top-10 (q10Bm25's fixed LIMIT); fusing deeper than
    // the arms would silently compute wrong RRF scores for ranks past
    // the truncation — refuse instead
    require(k <= 10, s"hybridRrf fuses top-10 arms; k=$k would read past them")
    import org.apache.spark.sql.expressions.Window
    val lex = graft.queries.IrSql.q10Bm25(spark, dir)
      .withColumn("lex_rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id")))
        .cast("long"))
    val sem = annTopK(spark, dir, k = 10)
      .withColumn("sem_rank", row_number()
        .over(Window.orderBy(col("cos").desc, col("vec_id")))
        .cast("long"))
    def contrib(r: Column): Column =
      coalesce(floor(lit(1000000.0) / (r + lit(kRrf))).cast("long"), lit(0L))
    lex.select(col("doc_id"), col("lex_rank"))
      .join(sem.select(col("vec_id").as("doc_id"), col("sem_rank")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("sem_rank"),
        (contrib(col("lex_rank")) + contrib(col("sem_rank"))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }
}
