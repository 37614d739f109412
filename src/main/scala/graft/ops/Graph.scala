package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
    * (DampNum * Σ contrib) div DampDen. */
  val Teleport: Long = 150000000L
  val DampNum: Long = 85L
  val DampDen: Long = 100L

  /** Synthetic hyperlink graph over the documents table: each doc
    * links to three deterministic targets (affine maps mod N), self
    * loops dropped, parallel edges deduplicated. Stands in for a real
    * crawl's link extraction — the formulas are corpus-size-covariant
    * so the graph scales with the table. */
  def linkEdges(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents").select(col("doc_id"))
    val n = d.count()
    d.select(col("doc_id").as("src"), explode(array(
        pmod(col("doc_id") * 7 + 3, lit(n)),
        pmod(col("doc_id") * 13 + 5, lit(n)),
        pmod(col("doc_id") * 31 + 11, lit(n)))).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Fixed-point PageRank over an arbitrary (src, dst) edge list.
    * Returns (node, r) with r in 1e9 units after `iters` full
    * bulk-synchronous rounds. */
  def pageRank(spark: SparkSession, edges: DataFrame,
               iters: Int = 10): DataFrame = {
    val nEdges = edges.count()
    // size the loop's parallelism to the graph, not the session
    // default: tiny graphs at verify SF otherwise pay ~32 near-empty
    // tasks per stage per round (the r3 clusters-loop lesson)
    val p = math.max(1L, nEdges / 100000L).toInt
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = edges.join(deg, "src")
      .repartition(p, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .repartition(p, col("node"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.select(col("node"), lit(RankOne).as("r"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = ed.join(ranks, col("src") === col("node"))
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      // localCheckpoint per round: truncates lineage (plan depth stays
      // O(1)) and is the round barrier — one job per iteration
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(Teleport) +
            expr(s"($DampNum * coalesce(s, 0L)) div $DampDen")).as("r"))
        .localCheckpoint()
    }
    ranks
  }

  /** Q33: PageRank over the synthetic document link graph — 10 rounds,
    * ranked output. Oracle: the identical integer recurrence unrolled
    * as a 10-level CTE in DuckDB. */
  def q33PageRank(spark: SparkSession, dir: String): DataFrame =
    pageRank(spark, linkEdges(spark, dir))
      .orderBy(col("r").desc, col("node"))
}
