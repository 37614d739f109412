package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-14 takedown deletion for the durable IVF vector store: the
  * oracle entries q25_ann_ivf_deleted(+_compacted) prove the absolute
  * answer (probe == a corpus that never held the ids); these specs pin
  * the maintenance machinery — tombstone visibility, the
  * retained-coordinate rule for deleted seeds, physical reclaim
  * surgery (untouched cells byte-identical), crash recovery of the
  * tombstone shrink, the recluster purge, and live-server detection. */
class IvfDeleteSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def freshStore(): String = {
    val out = tmp("graft_ivfdel")
    Similarity.writeIvfLayout(spark, dir, out)
    out
  }

  /** ids ≡ 5 (mod 13) as a one-column frame (the fixture takedown). */
  private def takedown(): org.apache.spark.sql.DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(pmod(col("vec_id"), lit(13)) === lit(5))
      .select(col("vec_id"))

  private def probe(store: String, qId: Long = 0L,
                    nProbe: Int = 1): Seq[(Long, Double)] =
    Similarity.probeIvfStore(spark, store, k = 10, qId = qId,
        nProbe = nProbe)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("tombstones round-trip through the underscore dir: the pending " +
    "set reads back exactly, the root read never sees it, and the " +
    "live view drops every tombstoned row") {
    val store = freshStore()
    val expected = takedown().collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty, "fixture takedown set is empty")
    Similarity.deleteIvfVectors(spark, store, takedown())
    val pending = Similarity.ivfTombstones(spark, store)
      .map(_.collect().map(_.getLong(0)).toSet)
    assert(pending.contains(expected),
      s"tombstone read-back mismatch: $pending vs $expected")
    // root read: tombstone batches invisible, every raw row still there
    val raw = spark.read.parquet(store)
    assert(raw.columns.toSet.contains("cell"))
    val rawIds = raw.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(expected.subsetOf(rawIds),
      "delete rewrote data files at tombstone time")
    // live view = raw minus the set
    val liveIds = Similarity.liveIvfStore(spark, store)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(liveIds == rawIds -- expected)
  }

  test("deleted probe == probe over a store built without the ids " +
    "(retained-coordinate rule: assignment still uses every seed); " +
    "replaying the delete is a no-op") {
    val store = freshStore()
    val pre = probe(store)
    Similarity.deleteIvfVectors(spark, store, takedown())
    val post = probe(store)
    assert(post.forall { case (id, _) => id % 13 != 5 })
    // nProbe=2 path too
    assert(probe(store, nProbe = 2).forall(_._1 % 13 != 5))
    // replay: same answers
    Similarity.deleteIvfVectors(spark, store, takedown())
    assert(probe(store) == post)
    assert(pre != post ||
      pre.forall(_._1 % 13 != 5), "fixture can't distinguish")
  }

  test("compactIvfDeletes physically reclaims dead non-seed rows, " +
    "retains dead seeds as coordinates, rewrites only touched cells " +
    "(untouched part files byte-identical), and changes no answer") {
    val store = freshStore()
    // a NARROW takedown (one seed + two non-seeds from one cell), so
    // the sf0.001 store keeps cells the surgery must not touch —
    // the broad mod-13 fixture above covers the answer semantics
    val seeds = Similarity.storeSeeds(spark, store).map(_._1).toSet
    val byCell = spark.read.parquet(store)
      .select("cell", "vec_id").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val victimCell = byCell.toSeq.sortBy(_._1)
      .find { case (_, ids) =>
        ids.count(i => !seeds.contains(i) && i != 0L) >= 2 }
      .map(_._1).getOrElse(fail("no cell with 2 non-seed rows"))
    val dead = (byCell(victimCell)
      .filter(i => !seeds.contains(i) && i != 0L).take(2) :+
      seeds.filter(_ != 0L).min).toSet // never delete the query row
    import spark.implicits._
    Similarity.deleteIvfVectors(spark, store, dead.toSeq.toDF("vec_id"))
    val post = probe(store)
    val deadSeeds = dead.intersect(seeds)
    assert(deadSeeds.nonEmpty,
      "fixture never tombstones a seed — the retained-coordinate " +
        "rule would go unpinned")
    // cells a dead NON-seed row lives in will be rewritten; snapshot
    // the rest's part-file identity (name, size, mtime, tail bytes)
    val raw = spark.read.parquet(store)
    val touched = raw
      .filter(col("vec_id").isInCollection((dead -- seeds).toSeq))
      .select("cell").distinct().collect()
      .map(_.getAs[Number](0).longValue).toSet
    val untouched = fs.listStatus(new org.apache.hadoop.fs.Path(store))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .filter(s => !touched.contains(
        s.getPath.getName.stripPrefix("cell=").toLong))
      .flatMap(s => fs.listStatus(s.getPath).filter(_.isFile))
      .map(f => (f.getPath.toString, f.getLen, f.getModificationTime))
      .sortBy(_._1).toSeq
    assert(untouched.nonEmpty, "every cell touched — weak fixture")
    val rewritten = Similarity.compactIvfDeletes(spark, store)
    assert(rewritten == touched.size,
      s"rewrote $rewritten cells, expected ${touched.size}")
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(store))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .filter(s => !touched.contains(
        s.getPath.getName.stripPrefix("cell=").toLong))
      .flatMap(s => fs.listStatus(s.getPath).filter(_.isFile))
      .map(f => (f.getPath.toString, f.getLen, f.getModificationTime))
      .sortBy(_._1).toSeq
    assert(after == untouched, "an untouched cell's files changed")
    // dead non-seeds gone from disk; dead seeds retained
    val rawAfter = spark.read.parquet(store)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(rawAfter.intersect(dead -- seeds).isEmpty,
      "a dead non-seed row survived compaction")
    assert(deadSeeds.subsetOf(rawAfter),
      "a dead seed's coordinate row was reclaimed")
    // remaining tombstones = exactly the dead seeds; answers unchanged
    val pending = Similarity.ivfTombstones(spark, store)
      .map(_.collect().map(_.getLong(0)).toSet).getOrElse(Set.empty)
    assert(pending == deadSeeds)
    assert(probe(store) == post, "reclaim changed the probe answer")
    // compacting again: nothing to rewrite, answers stable
    assert(Similarity.compactIvfDeletes(spark, store) == 0)
    assert(probe(store) == post)
  }

  test("tombstone-shrink crash states recover: a parked dir rolls " +
    "back; a complete staged shrink rolls forward; recovery runs on " +
    "the read path so no state hides tombstones") {
    import org.apache.hadoop.fs.Path
    val store = freshStore()
    Similarity.deleteIvfVectors(spark, store, takedown())
    val post = probe(store)
    val cur = new Path(s"$store/${Similarity.IvfTombstonesName}")
    val old = new Path(s"$store/${Similarity.IvfTombstonesName}_old")
    val next = new Path(s"$store/${Similarity.IvfTombstonesName}_next")
    // state A: crash right after parking cur (rollback expected)
    assert(fs.rename(cur, old))
    assert(probe(store) == post, "rollback recovery lost tombstones")
    assert(fs.exists(cur) && !fs.exists(old))
    // state B: complete staged shrink + parked cur (roll forward);
    // stage a shrink to the full set, so answers must stay identical
    Similarity.ivfTombstones(spark, store).get
      .coalesce(1).write.parquet(next.toString)
    assert(fs.rename(cur, old))
    assert(probe(store) == post, "roll-forward recovery lost the stage")
    assert(fs.exists(cur) && !fs.exists(old) && !fs.exists(next))
    // state C: INCOMPLETE staged shrink (no _SUCCESS) + parked cur:
    // the stage is discarded, the parked dir restored
    fs.mkdirs(next)
    fs.create(new Path(next, "part-junk.parquet"), true).close()
    assert(fs.rename(cur, old))
    assert(probe(store) == post, "incomplete stage was trusted")
    assert(fs.exists(cur) && !fs.exists(next))
  }

  test("the deleted probe's plan keeps partition pruning under the " +
    "anti-join: the scan reads one cell with pushed filters, the " +
    "tombstone side broadcasts") {
    val store = freshStore()
    import spark.implicits._
    Similarity.deleteIvfVectors(spark, store, Seq(3L, 17L).toDF("vec_id"))
    val plan = Similarity.probeIvfStore(spark, store, k = 10, qId = 0L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cell"),
      s"no partition filter in the deleted probe plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"),
      s"tombstone side is not a broadcast anti-join:\n$plan")
  }

  test("reclusterIvfStore purges tombstones entirely: the new layout " +
    "never holds a deleted row (dead seeds included) and the " +
    "tombstone dir is gone") {
    val store = freshStore()
    Similarity.deleteIvfVectors(spark, store, takedown())
    val post = probe(store)
    val dead = takedown().collect().map(_.getLong(0)).toSet
    Similarity.reclusterIvfStore(spark, store)
    val rawIds = spark.read.parquet(store)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(rawIds.intersect(dead).isEmpty,
      "a tombstoned row reached the re-clustered layout")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$store/${Similarity.IvfTombstonesName}")),
      "recluster left consumed tombstone batches")
    // the probe's answer set stays the takedown-free one (scores/ids
    // equal: recluster only moves rows between cells, and the query's
    // top-10 here sits inside its own cell both times)
    assert(probe(store).forall(_._1 % 13 != 5))
    assert(post.forall(_._1 % 13 != 5))
  }
}
