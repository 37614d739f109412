package graft.query

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.{Pq, Similarity}

class IvfPqServerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val store = {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_srv").toString
    Pq.writeIvfPqStore(spark, dir, out)
    out
  }

  private def vecOf(id: Long): Seq[Float] =
    graft.Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") === id)
      .select("embedding").head().getSeq[Float](0)

  test("served PQ probe == the oracle-checked store probe (vec 0, " +
    "nProbe 1 and 2)") {
    val srv = new IvfPqServer(spark, dir, store)
    val qv = vecOf(0L)
    Seq(1, 2).foreach { np =>
      val served = srv.probe(qv, excludeId = 0L, nProbe = np).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val checked = Pq.probeIvfPqStore(spark, dir, store, nProbe = np)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(served == checked, s"nProbe=$np: served diverged")
    }
  }

  test("prepared template: sequential queries each return their own " +
    "results (no stale ref state), equal to the fresh served probe") {
    val srv = new IvfPqServer(spark, dir, store)
    val ids = Seq(0L, 7L, 42L, 123L, 321L)
    val vecs = ids.map(id => id -> vecOf(id)).toMap
    // interleave (cell-set reuse across queries exercises the pool)
    (ids ++ ids.reverse).foreach { id =>
      val tpl = srv.probeTemplate(vecs(id), excludeId = id)
      val fresh = srv.probe(vecs(id), excludeId = id).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(tpl == fresh, s"query $id: template diverged from fresh")
    }
  }

  test("the template plan is exchange-free and reads only the code " +
    "columns (no embedding column exists in the compressed store)") {
    val srv = new IvfPqServer(spark, dir, store)
    val plan = srv.templatePlan(vecOf(0L))
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("embedding"), plan)
  }

  test("staleness: a file landing in a probed cell is caught by the " +
    "per-borrow version stamp; duplicate vec_ids collapse to k " +
    "distinct") {
    // private mutable store copy
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_mut").toString
    Pq.writeIvfPqStore(spark, dir, out)
    val srv = new IvfPqServer(spark, dir, out)
    val qv = vecOf(0L)
    val before = srv.probeTemplate(qv, excludeId = 0L)
    assert(before.nonEmpty)
    // replay the CURRENT top neighbor's code row into its cell dir —
    // an append-replay shape: same vec_id twice in the cell
    val topId = before.head._1
    val cell = srv.cellsOf(qv, 2).head
    val row = spark.read.parquet(out)
      .filter(col("vec_id") === topId && col("cell") === cell)
      .drop("cell")
    assert(row.count() == 1)
    row.coalesce(1).write.mode("append").parquet(s"$out/cell=$cell")
    val after = srv.probeTemplate(qv, excludeId = 0L)
    // the rebuilt template saw the duplicate; the collapse keeps
    // exactly k DISTINCT ids and the result set is unchanged
    assert(after == before,
      s"duplicate replay changed results:\n$before\nvs\n$after")
    assert(after.map(_._1).distinct.length == after.length)
  }

  test("8 concurrent threads each get their own query's results") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val srv = new IvfPqServer(spark, dir, store)
    val ids = Seq(0L, 7L, 42L, 123L, 321L, 200L, 77L, 11L)
    val vecs = ids.map(id => id -> vecOf(id)).toMap
    val want = ids.map(id =>
      id -> srv.probeTemplate(vecs(id), excludeId = id)).toMap
    val got = Await.result(
      Future.sequence(ids.zipWithIndex.map { case (_, i) =>
        Future {
          val order = ids.drop(i) ++ ids.take(i)
          order.map(id =>
            id -> srv.probeTemplate(vecs(id), excludeId = id))
        }
      }), 300.seconds)
    got.flatten.foreach { case (id, rs) =>
      assert(rs == want(id), s"concurrent query $id diverged")
    }
  }

  test("a takedown under a LIVE coded server is honored on the next " +
    "probe with NO refresh (plain + template); the physical reclaim " +
    "drops every dead row and the tombstone dir, changing no answer") {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_live_del").toString
    Pq.writeIvfPqStore(spark, dir, out)
    val srv = new IvfPqServer(spark, dir, out)
    val qv = vecOf(0L)
    val pre = srv.probeTemplate(qv, excludeId = 0L) // warm the pool
    val victim = pre.head._1
    Pq.deletePqVectors(spark, out, Seq(victim).toDF("vec_id"))
    val checked = Pq.probeIvfPqStore(spark, dir, out)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(!checked.exists(_._1 == victim))
    assert(srv.probeTemplate(qv, excludeId = 0L) == checked,
      "warm coded template served the deleted vector")
    assert(srv.probe(qv, excludeId = 0L).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq == checked,
      "plain coded probe served the deleted vector")
    // reclaim: no retained seeds in a codes-only store — dead row and
    // tombstone dir both gone, answers identical (cell stamp catches
    // the rewrite under the live server)
    assert(Pq.compactPqDeletes(spark, out) > 0)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$out/${graft.ops.Similarity.IvfTombstonesName}")),
      "codes-only reclaim left the tombstone dir")
    assert(spark.read.parquet(out).filter(col("vec_id") === victim)
      .count() == 0, "the dead code row survived reclaim")
    assert(srv.probeTemplate(qv, excludeId = 0L) == checked,
      "reclaim changed the served coded answer")
  }
}
