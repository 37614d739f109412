package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pageRank concentrates rank on the sink of a fan-in graph") {
    import spark.implicits._
    // A->B, C->B: B collects from both donors; A and C have no
    // in-links and settle at exactly the teleport mass
    val edges = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    val r = Graph.pageRank(spark, edges, iters = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet == Set(1L, 2L, 3L))
    assert(r(1L) == Graph.Teleport && r(3L) == Graph.Teleport, s"ranks $r")
    // steady state: 0.15 + 0.85 * (0.15 + 0.15) = 0.405
    assert(r(2L) == Graph.Teleport +
      Graph.DampNum * (2 * Graph.Teleport) / Graph.DampDen, s"ranks $r")
  }

  test("pageRank is invariant under shuffle partitioning") {
    val edges = Graph.linkEdges(spark, dir)
    val a = Graph.q33PageRank(spark, dir).collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Graph.q33PageRank(spark, dir).collect().toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // every node keeps at least the teleport mass, and total mass stays
    // below the initial budget (integer division only loses mass)
    val n = edges.select(col("src")).union(edges.select(col("dst")))
      .distinct().count()
    val rs = a.map(_.getLong(1))
    assert(rs.forall(_ >= Graph.Teleport))
    assert(rs.sum <= n * Graph.RankOne)
  }

  test("single-task and distributed pageRank paths agree exactly") {
    val edges = Graph.linkEdges(spark, dir).persist()
    val n = edges.count()
    val a = Graph.pageRankSingleTask(spark, edges, Graph.DefaultIters)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.pageRankLoop(spark, edges, n, Graph.DefaultIters)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    edges.unpersist()
  }

  test("triangle counts match hand-counted fixture") {
    import spark.implicits._
    // K4 minus edge {3,4}: triangles {1,2,3} and {1,2,4}
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("src", "dst")
    val r = Graph.triangleCounts(spark, edges)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L), s"got $r")
  }

  test("degree-ordered triangles equal the naive id-ordered enumeration") {
    import org.apache.spark.sql.functions._
    val und = Graph.linkEdges(spark, dir)
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val naive = und.as("a")
      .join(und.as("b"), col("a.v") === col("b.u"))
      .join(und.as("c"),
        col("c.u") === col("a.u") && col("c.v") === col("b.v"))
      .select(explode(array(col("a.u"), col("a.v"), col("b.v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val fast = Graph.q33Triangles(spark, dir)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(fast == naive)
    assert(fast.nonEmpty)
  }

  test("clustering coefficient is in (0, 1] and covers every " +
    "triangle member") {
    val cc = Graph.q33Clustering(spark, dir).collect()
    val tri = Graph.q33Triangles(spark, dir).count()
    assert(cc.length == tri)
    cc.foreach { r =>
      val v = r.getDouble(3)
      assert(v > 0.0 && v <= 1.0, s"node ${r.getLong(0)}: cc $v")
      assert(r.getLong(2) >= 2, "triangle member with deg < 2")
    }
  }

  test("link graph has no self loops and no duplicate edges") {
    val e = Graph.linkEdges(spark, dir)
    assert(e.filter(col("src") === col("dst")).count() == 0)
    assert(e.count() == e.distinct().count())
  }
}
