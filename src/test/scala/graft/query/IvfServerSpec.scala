package graft.query

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Similarity

class IvfServerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val store = {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_srv").toString
    Similarity.writeIvfLayout(spark, dir, out)
    out
  }

  test("served probe == the oracle-checked store probe, for several " +
    "query vectors") {
    val srv = new IvfServer(spark, store)
    val vecs = spark.read.parquet(store)
      .filter(col("vec_id").isin(0L, 7L, 42L, 123L, 321L))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    vecs.foreach { case (id, qv) =>
      val served = srv.probe(qv, excludeId = id).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val checked = Similarity.probeIvfStore(spark, store, qId = id)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(served == checked, s"query $id diverged")
    }
  }

  test("driver-side cell routing agrees with the store's assignment") {
    val srv = new IvfServer(spark, store)
    val rows = spark.read.parquet(store)
      .select(col("vec_id"), col("embedding"), col("cell"))
      .limit(200).collect()
    rows.foreach { r =>
      assert(srv.cellOf(r.getSeq[Float](1)) ==
        r.getAs[Number]("cell").longValue,
        s"vec ${r.getLong(0)}: driver routing != stored cell")
    }
  }

  test("prepared template: sequential queries return each its own " +
    "results (no stale plan state), equal to the fresh probe") {
    val srv = new IvfServer(spark, store)
    val vecs = spark.read.parquet(store)
      .filter(col("vec_id").isin(0L, 7L, 42L, 123L, 321L))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // interleave queries (some land in the same cell — template reuse)
    (vecs.toSeq ++ vecs.toSeq.reverse).foreach { case (id, qv) =>
      val tpl = srv.probeTemplate(qv, excludeId = id)
      val fresh = srv.probe(qv, excludeId = id).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(tpl == fresh, s"query $id: template diverged from fresh")
    }
  }

  test("the template plan is exchange-free (safe to re-execute)") {
    val srv = new IvfServer(spark, store)
    val qv = spark.read.parquet(store).filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    val plan = srv.templatePlan(qv)
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("refresh() realigns templates with a mutated store (append " +
    "then refresh: template == fresh probe again)") {
    // private store copy — the shared `store` must stay immutable for
    // the other tests
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_mut").toString
    val e = graft.Tables.load(spark, dir, "embeddings")
    val isDelta = pmod(xxhash64(col("vec_id")), lit(10)) === 0 &&
      col("vec_id") >= Similarity.IvfCentroids.toLong
    Similarity.assignCells(spark, dir, e.filter(!isDelta))
      .write.partitionBy("cell").mode("overwrite").parquet(out)
    val srv = new IvfServer(spark, out)
    val qv = spark.read.parquet(out).filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    srv.probeTemplate(qv, excludeId = 0L) // template now caches pre-append files
    Similarity.appendIvfLayout(spark, dir, out, e.filter(isDelta))
    srv.refresh()
    val tpl = srv.probeTemplate(qv, excludeId = 0L)
    val fresh = srv.probe(qv, excludeId = 0L).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(tpl == fresh, "refreshed template diverged from fresh probe")
  }

  test("a probe is one job over one cell directory") {
    val srv = new IvfServer(spark, store)
    val qv = spark.read.parquet(store).filter(col("vec_id") === 0L)
      .head().getSeq[Float](
        spark.read.parquet(store).columns.indexOf("embedding"))
    val df = srv.probe(qv)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // the scan location is the single cell directory, not the store root
    assert(plan.contains(s"cell=${srv.cellOf(qv)}"),
      s"scan not bounded to the routed cell dir:\n$plan")
  }
}
