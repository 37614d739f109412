package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Stage.StageOps
import graft.Tables

/** Link-analysis operators — the graph side of an IR / training-data
  * engine (the reference family's lineage is literally PageRank-era
  * MapReduce; see the iterative min-label loop in [[Dedup.clusters]]
  * for the same Pregel shape applied to components).
  *
  * PageRank here is the canonical bulk-synchronous iteration: per
  * round, one equi-join (ranks into edges) + one aggregation
  * (contributions by destination), materialized per round so the plan
  * stays O(1) deep. At cluster scale the same plan holds: edges are
  * hash-partitioned on `src` once and reused every round (the join key
  * never changes), contributions shuffle on `dst`, and rounds are a
  * fixed barrier count — no driver-side data beyond one scalar.
  *
  * Determinism: ranks are fixed-point BIGINTs (1e9 = rank 1.0) and
  * every division is integer division, so the result is bit-identical
  * across engines, partitionings, and summation orders — the same
  * sanctioned pattern as the centroid/LM fixed-point sums.
  */
object Graph {

  /** Initial rank mass per node (fixed-point 1.0). */
  val RankOne: Long = 1000000000L

  /** Damping factor 0.85 as a fixed-point pair: r' = Teleport +
    * DampNum * (Σ contrib div DampDen). Dividing the sum BEFORE the
    * multiply keeps the intermediate within one rank-sum of Long range
    * (the sum itself overflows only past ~9e9 nodes' mass on a single
    * hub); the truncation this order costs is < DampNum fixed-point
    * units (1e-7 of a rank) and is applied identically in the oracle. */
  val Teleport: Long = 150000000L
  val DampNum: Long = 85L
  val DampDen: Long = 100L

  /** Bulk-synchronous rounds for [[q33PageRank]] — shared with the
    * oracle's unrolled CTE depth so the two sides cannot drift. */
  val DefaultIters = 10

  /** Affine link-map coefficients (a, b): each doc links to
    * (doc_id * a + b) mod N for each pair — shared with the oracle.
    * The two successor maps guarantee short cycles (every consecutive
    * id triple closes a triangle); the multiplicative maps add
    * long-range cross edges. */
  val LinkCoeffs: Seq[(Long, Long)] =
    Seq((1L, 1L), (1L, 2L), (7L, 3L), (13L, 5L), (31L, 11L))

  /** Synthetic hyperlink graph over the documents table: each doc
    * links to |LinkCoeffs| (five) deterministic targets (affine maps mod N), self
    * loops dropped, parallel edges deduplicated. Stands in for a real
    * crawl's link extraction — the formulas are corpus-size-covariant
    * so the graph scales with the table. */
  def linkEdges(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents").select(col("doc_id"))
    val n = d.count()
    d.select(col("doc_id").as("src"), explode(array(
        LinkCoeffs.map { case (a, b) =>
          pmod(col("doc_id") * a + b, lit(n))
        }: _*)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Edge-count bound for the single-task path — THE
    * [[Dedup.SmallGraphEdges]] threshold (one constant, one retuning
    * point): a graph this small is cheaper to iterate in one task than
    * to schedule 10 rounds of near-empty distributed stages for. */
  val SmallGraphEdges: Long = Dedup.SmallGraphEdges

  /** Fixed-point PageRank over an arbitrary (src, dst) edge list.
    * Returns (node, r) with r in 1e9 units after `iters` full
    * bulk-synchronous rounds.
    *
    * Two execution paths, picked by the measured edge count (the same
    * two-path design as [[Dedup.clusters]]): ≤ [[SmallGraphEdges]]
    * edges run the whole iteration in ONE executor task (no per-round
    * Spark jobs — the distributed loop's ~10 rounds of tiny stages
    * cost ~3s of pure scheduling at verify SF); larger graphs run the
    * bulk-synchronous loop. The two are spec-pinned to agree. */
  def pageRank(spark: SparkSession, edges: DataFrame,
               iters: Int = DefaultIters): DataFrame = {
    // cache the edge plan across (count, degree join, node set) — but
    // only if the CALLER hasn't already: unpersisting a caller-owned
    // cache entry would silently drop it for them
    val callerCached =
      edges.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val cached =
      if (callerCached) edges
      else edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nEdges = cached.count()
      if (nEdges <= SmallGraphEdges) pageRankSingleTask(spark, cached, iters)
      else pageRankLoop(spark, cached, nEdges, iters)
    } finally { if (!callerCached) { cached.unpersist(); () } }
  }

  /** Single-task path: the full integer recurrence over an in-memory
    * edge array — identical arithmetic to [[pageRankLoop]], zero
    * per-round jobs. The result is materialized by the task before the
    * input cache is dropped (the caller localCheckpoints). */
  private[graft] def pageRankSingleTask(spark: SparkSession,
                                        edges: DataFrame,
                                        iters: Int): DataFrame = {
    import spark.implicits._
    edges.select(col("src"), col("dst")).as[(Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        // PRIMITIVE edge arrays, not Array[Tuple2]: boxed tuples cost
        // ~55 bytes/edge (≈550 MB at the 10M-edge bound) where two
        // long arrays cost 16 — the "~160 MB of longs" calibration the
        // shared SmallGraphEdges constant was justified with
        val sb = new scala.collection.mutable.ArrayBuilder.ofLong
        val db = new scala.collection.mutable.ArrayBuilder.ofLong
        it.foreach { case (s, d) => sb += s; db += d }
        val srcs = sb.result(); val dsts = db.result()
        val m = srcs.length
        val deg = scala.collection.mutable.LongMap.empty[Long]
        val nodes = scala.collection.mutable.LongMap.empty[Long]
        var i = 0
        while (i < m) {
          deg(srcs(i)) = deg.getOrElse(srcs(i), 0L) + 1L
          nodes(srcs(i)) = RankOne; nodes(dsts(i)) = RankOne
          i += 1
        }
        var ranks = nodes
        for (_ <- 1 to iters) {
          val sums = scala.collection.mutable.LongMap.empty[Long]
          i = 0
          while (i < m) {
            sums(dsts(i)) = sums.getOrElse(dsts(i), 0L) +
              ranks(srcs(i)) / deg(srcs(i))
            i += 1
          }
          val next = scala.collection.mutable.LongMap.empty[Long]
          ranks.foreachKey { n =>
            next(n) = Teleport + DampNum * (sums.getOrElse(n, 0L) / DampDen)
          }
          ranks = next
        }
        ranks.iterator.map { case (n, r) => (n, r) }
      }
      .toDF("node", "r")
      .stageEager()
  }

  /** Distributed bulk-synchronous path (see [[pageRank]]); `edges` is
    * already cached and counted by the caller. */
  private[graft] def pageRankLoop(spark: SparkSession, edges: DataFrame,
                                  nEdges: Long,
                                  iters: Int = DefaultIters): DataFrame = {
    // size the loop's parallelism to the graph, not the session
    // default: tiny graphs at verify SF otherwise pay ~32 near-empty
    // tasks per stage per round (the r3 clusters-loop lesson). The
    // conf governs the join/agg shuffles INSIDE the loop — the
    // explicit repartitions alone don't reach those (saved/restored,
    // as in Dedup.clustersPropagate)
    val p = math.max(1L, nEdges / 100000L).toInt
    val shufConf = "spark.sql.shuffle.partitions"
    val prevShuf = spark.conf.get(shufConf)
    spark.conf.set(shufConf, p.toString)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = edges.join(deg, "src")
      .repartition(p, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .repartition(p, col("node"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var ranks = nodes.select(col("node"), lit(RankOne).as("r"))
        .stageEager()
      for (_ <- 1 to iters) {
        val contrib = ed.join(ranks, col("src") === col("node"))
          .select(col("dst").as("node"), expr("r div deg").as("c"))
          .groupBy("node").agg(sum(col("c")).as("s"))
        // localCheckpoint per round: truncates lineage (plan depth
        // stays O(1)) and is the round barrier — one job per
        // iteration; the final ranks are lineage-free, so the
        // caches can be dropped on exit
        ranks = nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(Teleport) + lit(DampNum) *
              expr(s"coalesce(s, 0L) div $DampDen")).as("r"))
          .stageEager()
      }
      ranks
    } finally {
      spark.conf.set(shufConf, prevShuf)
      ed.unpersist(); nodes.unpersist(); ()
    }
  }

  /** Q33: PageRank over the synthetic document link graph —
    * [[DefaultIters]] rounds, ranked output. Oracle: the identical
    * integer recurrence unrolled as a CTE of the same depth. */
  def q33PageRank(spark: SparkSession, dir: String): DataFrame =
    pageRank(spark, linkEdges(spark, dir))
      .orderBy(col("r").desc, col("node"))

  /** TRIANGLE COUNTING per node — the classic clustering-coefficient
    * building block, via DEGREE ORDERING: orient every undirected edge
    * from its lower-(degree, id) endpoint to the higher one, build
    * wedges only from each node's out-edges, and close them with one
    * more equi-join. Orientation bounds every node's out-degree by
    * O(√m) on any graph, so no wedge explosion on high-degree hubs —
    * the reason this shape (and not the naive a<b<c self-join) is the
    * one that survives skewed graphs at scale. Three equi-joins, all
    * on node keys; each triangle found exactly once. */
  def triangleCounts(spark: SparkSession, edges: DataFrame): DataFrame = {
    val und = canonicalUndirected(edges)
    triangleCountsOn(und, degreesOf(und))
  }

  /** Canonical undirected edge set (u < v, deduped), eagerly
    * checkpointed — it feeds the degree aggregation and the
    * orientation join; left lazy, the scan+distinct subtree
    * re-executes per reference (measured 4-7s instead of <1s at
    * sf0.1). Checkpointed results are lineage-free and the
    * ContextCleaner reclaims them when unreferenced. */
  private def canonicalUndirected(edges: DataFrame): DataFrame =
    edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .stageEager()

  private def degreesOf(und: DataFrame): DataFrame =
    und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

  /** [[triangleCounts]] over a PREBUILT canonical edge set + degree
    * table — lets [[clusteringCoefficient]] share them instead of
    * re-deriving and re-checkpointing the same inputs. */
  private def triangleCountsOn(und: DataFrame, deg: DataFrame): DataFrame = {
    // orient by (deg, id): carry both endpoints' degrees for the
    // canonical wedge ordering downstream
    val ori = und
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("t"),
        // the target t is always the higher-(deg, id) endpoint, so its
        // degree is the pairwise max
        greatest(col("du"), col("dv")).as("dt"))
      .stageEager()
    // wedges: two out-edges of s, canonicalized by (deg, id) of the tips
    val wedges = ori.as("a").join(ori.as("b"),
        col("a.s") === col("b.s") &&
          (col("a.dt") < col("b.dt") ||
            (col("a.dt") === col("b.dt") && col("a.t") < col("b.t"))))
      .select(col("a.s").as("x"), col("a.t").as("y"), col("b.t").as("z"))
    // close: the (y, z) edge, if present, is oriented y → z by the
    // same (deg, id) rule the wedge was canonicalized with
    val tri = wedges.join(ori.select(col("s").as("y"), col("t").as("z")),
      Seq("y", "z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
      .orderBy("node")
  }

  /** Q33b: per-node triangle counts over the synthetic link graph. */
  def q33Triangles(spark: SparkSession, dir: String): DataFrame =
    triangleCounts(spark, linkEdges(spark, dir))

  /** Q33c: LOCAL CLUSTERING COEFFICIENT — triangles through a node
    * over its wedge capacity, cc = 2·T / (deg·(deg−1)): the standard
    * "how clique-like is this neighborhood" signal (spam-farm link
    * rings score near 1, organic hubs near 0). One extra degree join
    * over [[triangleCounts]]; rows are triangle members (any node in a
    * triangle has deg ≥ 2, so the denominator never vanishes). */
  def clusteringCoefficient(spark: SparkSession,
                            edges: DataFrame): DataFrame = {
    // ONE canonical edge set + degree table, shared with the triangle
    // pass (the previous form re-derived and re-checkpointed both)
    val und = canonicalUndirected(edges)
    val deg = degreesOf(und)
    triangleCountsOn(und, deg)
      .join(deg, "node")
      .select(col("node"), col("n_tri"), col("deg"),
        round(lit(2.0) * col("n_tri") /
          (col("deg") * (col("deg") - 1)), 4).as("cc"))
      .orderBy("node")
  }

  /** Q33c entry over the synthetic link graph. */
  def q33Clustering(spark: SparkSession, dir: String): DataFrame =
    clusteringCoefficient(spark, linkEdges(spark, dir))
}
