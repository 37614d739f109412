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

  test("version stamps catch a store mutation WITHOUT an explicit " +
    "refresh (append → next template borrow rebuilds)") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_mut2").toString
    val e = graft.Tables.load(spark, dir, "embeddings")
    val isDelta = pmod(xxhash64(col("vec_id")), lit(10)) === 0 &&
      col("vec_id") >= Similarity.IvfCentroids.toLong
    Similarity.assignCells(spark, dir, e.filter(!isDelta))
      .write.partitionBy("cell").mode("overwrite").parquet(out)
    val srv = new IvfServer(spark, out)
    val qv = spark.read.parquet(out).filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    srv.probeTemplate(qv, excludeId = 0L) // pools a pre-append template
    Similarity.appendIvfLayout(spark, dir, out, e.filter(isDelta))
    // NO refresh(): the borrow's cell-dir version stat must notice
    val tpl = srv.probeTemplate(qv, excludeId = 0L)
    val fresh = srv.probe(qv, excludeId = 0L).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(tpl == fresh, "stale template served after store mutation")
  }

  test("a delta append replaying an existing vec_id: template still " +
    "returns exactly k DISTINCT neighbors, same set as pre-append") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_dup").toString
    Similarity.writeIvfLayout(spark, dir, out)
    val srv = new IvfServer(spark, out)
    val qv = spark.read.parquet(out).filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    val pre = srv.probeTemplate(qv, excludeId = 0L)
    assert(pre.length == 10)
    // replay the TOP neighbor's row through the append path — it lands
    // in the same cell (same argmax assignment), inside the top-k
    // fetch window, as a second physical row with the same vec_id
    val dupId = pre.head._1
    val dupRow = spark.read.parquet(out)
      .filter(col("vec_id") === dupId)
      .select(col("vec_id"), col("embedding"))
    Similarity.appendIvfLayout(spark, dir, out, dupRow)
    val post = srv.probeTemplate(qv, excludeId = 0L)
    assert(post.map(_._1).distinct.length == 10,
      s"duplicate vec_id shrank the distinct result set: $post")
    assert(post == pre,
      "replaying an existing row changed the neighbor set")
  }

  test("version stamp catches a mutation even when file mtimes do not " +
    "move (same-timestamp-tick append)") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_tick").toString
    val e = graft.Tables.load(spark, dir, "embeddings")
    val isDelta = pmod(xxhash64(col("vec_id")), lit(10)) === 0 &&
      col("vec_id") >= Similarity.IvfCentroids.toLong
    Similarity.assignCells(spark, dir, e.filter(!isDelta))
      .write.partitionBy("cell").mode("overwrite").parquet(out)
    // freeze EVERY file and dir mtime to one instant, before AND after
    // the mutation — the stamp must notice through file count/bytes,
    // not timestamps
    val t0 = 1700000000000L
    def freeze(): Unit = {
      val wk = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      try wk.forEach(p => { p.toFile.setLastModified(t0); () })
      finally wk.close()
    }
    freeze()
    val srv = new IvfServer(spark, out)
    val qv = spark.read.parquet(out).filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    srv.probeTemplate(qv, excludeId = 0L) // pools a pre-append template
    Similarity.appendIvfLayout(spark, dir, out, e.filter(isDelta))
    freeze()
    val tpl = srv.probeTemplate(qv, excludeId = 0L)
    val fresh = srv.probe(qv, excludeId = 0L).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(tpl == fresh,
      "stale template served when mtimes were unchanged by a mutation")
  }

  test("nProbe: served template == durable-store probe == the " +
    "in-memory relational ranking") {
    val srv = new IvfServer(spark, store)
    val qv = spark.read.parquet(store).filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    val relational = Similarity.annIvfProbe(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val stored = Similarity.probeIvfStore(spark, store, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val servedTpl = srv.probeTemplate(qv, excludeId = 0L, nProbe = 2)
    val served = srv.probe(qv, excludeId = 0L, nProbe = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(stored == relational, "store nProbe diverged from in-memory")
    assert(served == relational, "served nProbe diverged")
    assert(servedTpl == relational, "served nProbe template diverged")
    // nProbe=2 must widen (or equal) recall vs nProbe=1: the top-k of
    // the 2-cell candidate set dominates the 1-cell set's
    val one = srv.probeTemplate(qv, excludeId = 0L)
    assert(servedTpl.map(_._2).sum >= one.map(_._2).sum - 1e-9)
  }

  test("routed auto probe == the in-memory annIvfAuto ranking; a " +
    "corpus-sized survivor target escalates to the cap probe; the " +
    "count cache revalidates after an append with NO refresh") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_auto").toString
    val e = graft.Tables.load(spark, dir, "embeddings")
    Similarity.writeIvfLayout(spark, dir, out)
    val srv = new IvfServer(spark, out)
    val qv = spark.read.parquet(out).filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    // parity: same seeds, ranking, ladder rule, counts, arithmetic
    val auto = srv.probeAutoTemplate(qv, excludeId = 0L)
    val want = Similarity.annIvfAuto(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(auto == want, s"auto=$auto want=$want")
    // a target no prefix can satisfy forces the ladder to the cap —
    // the exact-scan parity arm
    val n = spark.read.parquet(out).count().toInt
    val capped = srv.probeAutoTemplate(qv, excludeId = 0L,
      minSurvivors = Some(n + 1))
    val cap = srv.probeTemplate(qv, excludeId = 0L, nProbe = srv.nCells)
    assert(capped == cap, "cap-forced auto diverged from the cap probe")
    // append under the live server: the next auto probe must walk the
    // ladder against the NEW counts (stamped count cache), not stale
    val dupRow = spark.read.parquet(out)
      .filter(col("vec_id") === auto.head._1)
      .select(col("vec_id"), col("embedding"))
    Similarity.appendIvfLayout(spark, dir, out, dupRow)
    val post = srv.probeAutoTemplate(qv, excludeId = 0L)
    assert(post == auto,
      "replaying an existing row changed the auto-probed neighbor set")
  }

  test("8 concurrent template probes return each its own correct " +
    "results (pooled templates, no shared-ref race)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val srv = new IvfServer(spark, store)
    val vecs = spark.read.parquet(store)
      .filter(col("vec_id").isin(0L, 7L, 42L, 123L, 321L, 11L, 99L, 200L))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq
    assert(vecs.size == 8)
    // sequential golden answers first
    val want = vecs.map { case (id, qv) =>
      id -> srv.probeTemplate(qv, excludeId = id)
    }.toMap
    // 3 rounds of 8 parallel probes, every thread its own query
    (1 to 3).foreach { _ =>
      val got = Await.result(
        Future.sequence(vecs.map { case (id, qv) =>
          Future(id -> srv.probeTemplate(qv, excludeId = id))
        }), 120.seconds).toMap
      vecs.foreach { case (id, _) =>
        assert(got(id) == want(id), s"concurrent probe $id diverged")
      }
    }
  }

  test("compaction: many-delta cells rewrite to one file, probe " +
    "results identical pre/post, version stamps notice") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_cpt").toString
    val e = graft.Tables.load(spark, dir, "embeddings")
    val slot = pmod(xxhash64(col("vec_id")), lit(6))
    Similarity.assignCells(spark, dir,
        e.filter(slot === 0 || col("vec_id") < Similarity.IvfCentroids.toLong))
      .write.partitionBy("cell").mode("overwrite").parquet(out)
    // five delta appends → up to 6 files per touched cell
    (1 to 5).foreach { i =>
      Similarity.appendIvfLayout(spark, dir, out,
        e.filter(slot === i && col("vec_id") >= Similarity.IvfCentroids.toLong))
    }
    val srv = new IvfServer(spark, out)
    val qv = spark.read.parquet(out).filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    def files(): Int = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
    assert(files() > 3, s"append sequence should fragment cells (max=${files()})")
    val pre = srv.probeTemplate(qv, excludeId = 0L, nProbe = 2)
    val preStored = Similarity.probeIvfStore(spark, out, qId = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val n = Similarity.compactIvfStore(spark, out, maxFilesPerCell = 3)
    assert(n > 0, "no cell was compacted")
    assert(files() <= 3, s"cells still fragmented after compaction (${files()})")
    // version stamp notices the rewrite — no refresh() call
    val post = srv.probeTemplate(qv, excludeId = 0L, nProbe = 2)
    val postStored = Similarity.probeIvfStore(spark, out, qId = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(post == pre, "probe results changed across compaction")
    assert(postStored == preStored, "store probe changed across compaction")
  }

  test("compaction crash recovery: an interrupted swap rolls back or " +
    "completes, never losing rows") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_rcv").toString
    Similarity.writeIvfLayout(spark, dir, out)
    val before = spark.read.parquet(out).count()
    val cellDir = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .maxBy(_.listFiles().count(_.getName.endsWith(".parquet")))
    // simulate a crash mid step 2 (files moved to _graft_swap, no
    // usable replacement): recovery must roll the files BACK
    val swap = new java.io.File(cellDir, "_graft_swap")
    swap.mkdirs()
    val moved = cellDir.listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(moved.nonEmpty)
    moved.foreach(f => assert(
      f.renameTo(new java.io.File(swap, f.getName))))
    assert(cellDir.listFiles().count(_.getName.endsWith(".parquet")) == 0)
    Similarity.compactIvfStore(spark, out, maxFilesPerCell = 1000)
    assert(!swap.exists, "swap marker not cleaned up")
    assert(spark.read.parquet(out).count() == before,
      "rows lost across crash recovery")
    // simulate a crash PARTWAY through step 3 (complete replacement in
    // tmp, manifest written, only SOME listed files moved): recovery
    // must finish moving the stragglers before renaming the
    // replacement in — a bare rename would duplicate their rows
    val tmp = new java.io.File(cellDir, "_graft_compact_tmp")
    spark.read.parquet(cellDir.toString).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val tmpPart = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    val visible = cellDir.listFiles().filter(_.getName.endsWith(".parquet"))
    val manifest = new java.io.File(cellDir, "_graft_swap_manifest")
    java.nio.file.Files.write(manifest.toPath,
      (s"compact-${tmpPart.getName}" +: visible.map(_.getName).toVector)
        .mkString("\n").getBytes("UTF-8"))
    val swap2 = new java.io.File(cellDir, "_graft_swap")
    swap2.mkdirs()
    // move only half the listed files — the rest stay visible
    val (movedHalf, stayed) = visible.splitAt(visible.length / 2)
    movedHalf.foreach(f =>
      assert(f.renameTo(new java.io.File(swap2, f.getName))))
    assert(stayed.nonEmpty && stayed.forall(_.exists))
    Similarity.compactIvfStore(spark, out, maxFilesPerCell = 1000)
    assert(!swap2.exists && !tmp.exists && !manifest.exists,
      "markers not cleaned up")
    assert(spark.read.parquet(out).count() == before,
      "rows lost or DUPLICATED finishing an interrupted swap")
    assert(cellDir.listFiles()
      .exists(_.getName == s"compact-${tmpPart.getName}"),
      "replacement not made visible under the manifest's name")
  }

  test("compaction crash recovery: a re-compaction crash with an OLDER " +
    "compact- file still visible completes without losing swap rows") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_rcv2").toString
    Similarity.writeIvfLayout(spark, dir, out)
    val cellDir = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .maxBy(_.listFiles().count(_.getName.endsWith(".parquet")))
    // make the cell look post-compaction: its file carries the
    // reusable compact- prefix an earlier attempt left behind
    val first = cellDir.listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(first.renameTo(
      new java.io.File(cellDir, s"compact-old-${first.getName}")))
    val before = spark.read.parquet(out).count()
    // a NEW compaction attempt crashes partway through step 3: the
    // old compact- file is still visible, a fresh non-compact file
    // has already moved to swap. Pre-manifest recovery misread the
    // visible compact- prefix as "step completed" and DELETED swap.
    val extraSrc = new java.io.File(cellDir, "_x")
    spark.read.parquet(cellDir.toString).limit(5).coalesce(1)
      .write.mode("overwrite").parquet(extraSrc.toString)
    val extraPart = extraSrc.listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val extra = new java.io.File(cellDir, s"delta-${extraPart.getName}")
    assert(extraPart.renameTo(extra))
    org.apache.commons.io.FileUtils.deleteDirectory(extraSrc)
    val before2 = spark.read.parquet(out).count()
    assert(before2 == before + 5)
    val tmp = new java.io.File(cellDir, "_graft_compact_tmp")
    spark.read.parquet(cellDir.toString).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val tmpPart = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    val listed = cellDir.listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toVector
    java.nio.file.Files.write(
      new java.io.File(cellDir, "_graft_swap_manifest").toPath,
      (s"compact-${tmpPart.getName}" +: listed)
        .mkString("\n").getBytes("UTF-8"))
    val swap = new java.io.File(cellDir, "_graft_swap")
    swap.mkdirs()
    assert(extra.renameTo(new java.io.File(swap, extra.getName)))
    // recovery: must NOT take the "completed" branch off the stale
    // compact- prefix (that deleted swap, losing the 5 moved rows)
    Similarity.compactIvfStore(spark, out, maxFilesPerCell = 1000)
    assert(!swap.exists && !tmp.exists)
    assert(spark.read.parquet(out).count() == before2,
      "rows lost to the stale compact- prefix misclassification")
  }

  test("compaction crash recovery: a manifest with no swap dir means " +
    "nothing moved — the attempt is abandoned, store untouched") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_rcv3").toString
    Similarity.writeIvfLayout(spark, dir, out)
    val before = spark.read.parquet(out).count()
    val cellDir = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).head
    val manifest = new java.io.File(cellDir, "_graft_swap_manifest")
    java.nio.file.Files.write(manifest.toPath,
      "compact-ghost.parquet\nnot-a-file.parquet".getBytes("UTF-8"))
    Similarity.compactIvfStore(spark, out, maxFilesPerCell = 1000)
    assert(!manifest.exists, "abandoned manifest not cleaned up")
    assert(spark.read.parquet(out).count() == before)
  }

  private def probeSig(out: String, nProbe: Int = 1): Seq[(Long, Double)] =
    Similarity.probeIvfStore(spark, out, nProbe = nProbe)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("recluster: a drifted small-k store probes identically to a " +
    "fresh store written at the new k; meta + seed routing follow") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_recl").toString
    Similarity.writeIvfLayoutK(spark, dir, out, 4)
    assert(Similarity.storeK(spark, out) == 4)
    val rows = spark.read.parquet(out).count()
    val newK = Similarity.reclusterIvfStore(spark, out, Some(16))
    assert(newK == 16 && Similarity.storeK(spark, out) == 16)
    assert(spark.read.parquet(out).count() == rows,
      "recluster changed the row count")
    // no markers left behind
    val leftovers = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("_graft_recluster"))
    assert(leftovers.isEmpty, leftovers.mkString(", "))
    val fresh = java.nio.file.Files
      .createTempDirectory("graft_ivf_recl_fresh").toString
    Similarity.writeIvfLayoutK(spark, dir, fresh, 16)
    assert(probeSig(out) == probeSig(fresh), "nProbe=1 parity")
    assert(probeSig(out, 2) == probeSig(fresh, 2), "nProbe=2 parity")
    // the k-sizing default: auto recluster picks max(8, ceil(n/128))
    assert(Similarity.reclusterIvfStore(spark, out) == 8L)
    assert(Similarity.storeK(spark, out) == 8)
    assert(probeSig(out, 2) == {
      val f8 = java.nio.file.Files
        .createTempDirectory("graft_ivf_recl_f8").toString
      Similarity.writeIvfLayout(spark, dir, f8)
      probeSig(f8, 2)
    }, "auto-k recluster != family-default store")
  }

  test("recluster + appendIvfStore: a delta appended AFTER recluster " +
    "is assigned in the store's own (new) seed system") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_recl_app").toString
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // base = all but the top-20 ids; store starts at the family k then
    // re-clusters to 16 — the appended delta must follow the NEW cells
    val base = e.filter(col("vec_id") < 480)
    val delta = e.filter(col("vec_id") >= 480)
    Similarity.assignCells(spark, dir, base)
      .write.partitionBy("cell").mode("overwrite").parquet(out)
    Similarity.reclusterIvfStore(spark, out, Some(16))
    Similarity.appendIvfStore(spark, out, delta)
    val stored = spark.read.parquet(out)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    assert(stored.size == 500)
    // driver recompute: argmax cosine against the store's 16 seeds
    val seeds = Similarity.storeSeeds(spark, out)
    assert(seeds.length == 16)
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
      .toMap
    delta.collect().map(_.getLong(0)).foreach { v =>
      val want = seeds.map { case (cid, cv) =>
        (Similarity.cosSeqInf(vecs(v), cv), cid)
      }.maxBy { case (s, cid) => (s, -cid) }._2
      assert(stored(v) == want, s"delta vec $v cell ${stored(v)} != $want")
    }
  }

  test("recluster crash recovery: a mid-move-out crash (swap, no " +
    "moved-marker) rolls back; re-clustering then converges") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_recl_rb").toString
    Similarity.writeIvfLayout(spark, dir, out)
    val before = spark.read.parquet(out).count()
    val sig = probeSig(out, 2)
    val rootF = new java.io.File(out)
    // fake a crashed attempt: manifest listing the cell dirs, HALF of
    // them already moved into swap, no moved-marker, stale tmp
    val cells = rootF.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    val manifest = new java.io.File(rootF, "_graft_recluster_manifest")
    java.nio.file.Files.write(manifest.toPath,
      ("16" +: cells.map(_.getName).toVector).mkString("\n")
        .getBytes("UTF-8"))
    val swap = new java.io.File(rootF, "_graft_recluster_swap")
    swap.mkdirs()
    val tmpDir = new java.io.File(rootF, "_graft_recluster_tmp")
    tmpDir.mkdirs()
    cells.take(cells.length / 2).foreach(c =>
      assert(c.renameTo(new java.io.File(swap, c.getName))))
    Similarity.storeSeedCache.remove(out)
    // recovery rolls back, then the requested recluster (same k as the
    // original family store) must land on the identical layout
    Similarity.reclusterIvfStore(spark, out, Some(8))
    assert(spark.read.parquet(out).count() == before,
      "rows lost or duplicated across rollback")
    assert(probeSig(out, 2) == sig, "rollback+recluster diverged")
    assert(!swap.exists && !tmpDir.exists && !manifest.exists)
  }

  test("recluster crash recovery: a crash AFTER the moved-marker " +
    "completes the new generation (no row loss, new meta)") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_recl_fin").toString
    Similarity.writeIvfLayoutK(spark, dir, out, 4)
    val before = spark.read.parquet(out).count()
    val rootF = new java.io.File(out)
    // build the would-be replacement layout in tmp (same contents the
    // real step 1 writes: the k=16 assignment of the same vectors)
    val tmp = new java.io.File(rootF, "_graft_recluster_tmp")
    Similarity.writeIvfLayoutK(spark, dir, tmp.toString, 16)
    // manifest + ALL old cell dirs moved out + moved-marker = the
    // state immediately before step 4
    val cells = rootF.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    val manifest = new java.io.File(rootF, "_graft_recluster_manifest")
    java.nio.file.Files.write(manifest.toPath,
      ("16" +: cells.map(_.getName).toVector).mkString("\n")
        .getBytes("UTF-8"))
    val swap = new java.io.File(rootF, "_graft_recluster_swap")
    swap.mkdirs()
    cells.foreach(c => assert(c.renameTo(new java.io.File(swap, c.getName))))
    new java.io.File(rootF, "_graft_recluster_moved").createNewFile()
    Similarity.storeSeedCache.remove(out)
    // ANY maintenance entry recovers it — recluster at the same k is
    // then a no-op relayout of the recovered generation
    Similarity.reclusterIvfStore(spark, out, Some(16))
    assert(Similarity.storeK(spark, out) == 16)
    assert(spark.read.parquet(out).count() == before,
      "rows lost or duplicated completing the moved generation")
    val fresh = java.nio.file.Files
      .createTempDirectory("graft_ivf_recl_fin_f").toString
    Similarity.writeIvfLayoutK(spark, dir, fresh, 16)
    assert(probeSig(out, 2) == probeSig(fresh, 2))
    assert(rootF.listFiles()
      .forall(f => !f.getName.startsWith("_graft_recluster")))
  }

  test("IvfServer serves a meta-k (re-clustered) store: routing reads " +
    "the store's own seeds; served == store probe at both nProbe") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_srv_meta").toString
    Similarity.writeIvfLayoutK(spark, dir, out, 4)
    Similarity.reclusterIvfStore(spark, out, Some(16))
    val srv = new IvfServer(spark, out)
    // routing agrees with the stored assignment for every vector
    spark.read.parquet(out)
      .select(col("vec_id"), col("embedding"), col("cell"))
      .limit(100).collect().foreach { r =>
        assert(srv.cellOf(r.getSeq[Float](1)) ==
          r.getAs[Number]("cell").longValue,
          s"vec ${r.getLong(0)}: routing != stored cell on meta-k store")
      }
    val vecs = spark.read.parquet(out)
      .filter(col("vec_id").isin(0L, 42L, 321L))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    vecs.foreach { case (id, qv) =>
      Seq(1, 2).foreach { np =>
        val served = srv.probeTemplate(qv, excludeId = id, nProbe = np)
        val checked = Similarity
          .probeIvfStore(spark, out, qId = id, nProbe = np)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(served == checked, s"query $id nProbe=$np diverged")
      }
    }
  }

  test("maintainIvfStore: one call compacts past the file bound and " +
    "re-clusters on occupancy drift; settled stores are left alone") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_maint").toString
    Similarity.writeIvfLayoutK(spark, dir, out, 4) // occupancy ~125
    // default drift factor 2.0: 125 < 256 → no recluster, k stays
    val (_, k0) = Similarity.maintainIvfStore(spark, out)
    assert(k0 == 4L && Similarity.storeK(spark, out) == 4)
    // tighter factor: 125 > 0.5·128 AND sized k (8) > 4 → recluster
    val (_, k1) = Similarity.maintainIvfStore(spark, out,
      driftFactor = 0.5)
    assert(k1 == 8L && Similarity.storeK(spark, out) == 8)
    // already at the sized k: a repeat call leaves the store alone
    // (occupancy 62.5 and target == k — both gates hold it)
    val (_, k2) = Similarity.maintainIvfStore(spark, out,
      driftFactor = 0.5)
    assert(k2 == 8L)
    // the maintained store probes like a fresh family store
    val fresh = java.nio.file.Files
      .createTempDirectory("graft_ivf_maint_f").toString
    Similarity.writeIvfLayout(spark, dir, fresh)
    assert(probeSig(out, 2) == probeSig(fresh, 2))
    // fragmentation half: appends accrete files, maintenance at a
    // tight bound compacts them without changing contents
    val delta = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") >= 490)
    (1 to 3).foreach(_ => Similarity.appendIvfStore(spark, out, delta))
    val before = spark.read.parquet(out).count()
    val (compacted, _) = Similarity.maintainIvfStore(spark, out,
      maxFilesPerCell = 1, driftFactor = 0.5)
    assert(compacted > 0, "no cell compacted after 3 appends")
    assert(spark.read.parquet(out).count() == before)
    new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .foreach { cd =>
        val n = cd.listFiles().count(_.getName.endsWith(".parquet"))
        assert(n == 1, s"${cd.getName}: $n files after maintenance")
      }
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

  test("a takedown under a LIVE server is honored on the next probe " +
    "with NO refresh — plain, template, routed-auto, and filtered " +
    "paths (deletion beats the caller's keep set); the physical " +
    "reclaim changes no answer") {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_live_del").toString
    Similarity.writeIvfLayout(spark, dir, out)
    val srv = new IvfServer(spark, out)
    val qv = spark.read.parquet(out).filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    // warm every path pre-delete, then tombstone the top neighbor
    val pre = srv.probeTemplate(qv, excludeId = 0L)
    srv.probeAutoTemplate(qv, excludeId = 0L)
    val victim = pre.head._1
    Similarity.deleteIvfVectors(spark, out, Seq(victim).toDF("vec_id"))
    val checked = Similarity.probeIvfStore(spark, out, qId = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(!checked.exists(_._1 == victim))
    val post = srv.probeTemplate(qv, excludeId = 0L)
    assert(post == checked, "warm template served the deleted vector")
    val postPlain = srv.probe(qv, excludeId = 0L).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(postPlain == checked, "plain probe served the deleted vector")
    val postAuto = srv.probeAutoTemplate(qv, excludeId = 0L)
    assert(!postAuto.exists(_._1 == victim),
      "routed auto probe served the deleted vector")
    // filtered path: the keep set EXPLICITLY includes the victim —
    // takedown wins over the caller's filter
    val keep = new java.util.HashSet[java.lang.Long]()
    (pre.map(_._1) :+ victim).foreach(i => keep.add(i))
    val postFiltered = srv.probeFilteredAutoTemplate(qv, keep,
      excludeId = 0L)
    assert(!postFiltered.exists(_._1 == victim),
      "filtered probe let a kept-but-deleted vector through")
    // physical reclaim under the live server: cell stamp catches the
    // rewrite, answers stay the tombstoned ones
    assert(Similarity.compactIvfDeletes(spark, out) > 0)
    assert(srv.probeTemplate(qv, excludeId = 0L) == post)
    assert(srv.probe(qv, excludeId = 0L).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq == checked)
  }
}
