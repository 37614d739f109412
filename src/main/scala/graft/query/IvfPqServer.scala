package graft.query

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import graft.ops.{Pq, Similarity}

/** Per-cell-directory version stamp for durable vector stores: folds
  * each cell's parquet FILE COUNT, total BYTES, and file mtimes, so a
  * mutation landing within one timestamp tick still changes the stamp
  * (the file list or its sizes move). Shared by [[IvfServer]] and
  * [[IvfPqServer]] so the two serving paths can't drift on what
  * "stale" means. */
private[query] object CellVersion {
  def of(hfs: org.apache.hadoop.fs.FileSystem, storeDir: String,
         cells: Seq[Long]): Long =
    cells.foldLeft(17L) { (acc, c) =>
      val h =
        try {
          val fsx = hfs.listStatus(
            new org.apache.hadoop.fs.Path(s"$storeDir/cell=$c"))
            .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
            .sortBy(_.getPath.getName)
          fsx.foldLeft(fsx.length.toLong)((a, f) =>
            (a * 31 + f.getModificationTime) * 31 + f.getLen)
        } catch { case _: java.io.FileNotFoundException => -1L }
      acc * 1000003 + h
    }
}

/** Serving-path IVF-PQ over a durable [[Pq.writeIvfPqStore]] store —
  * the [[IvfServer]] discipline applied to the COMPRESSED layout (the
  * store a 100 TB deployment actually keeps hot: m small ints per
  * vector, 64× under fp32):
  *
  *  - coarse routing is DRIVER-side against the seed centroids
  *    (collected once; k×dims floats, bounded at any corpus size) —
  *    a probe is one Spark job over its `nProbe` cell directories,
  *    the partition prune a PATH;
  *  - the per-query ADC distance TABLE ([[Pq.Subspaces]]×[[
  *    Pq.Codebook]] doubles) is driver arithmetic; candidates are
  *    scored as [[Pq.Subspaces]] table lookups on the stored codes —
  *    the scan never touches an embedding column and moves m bytes
  *    per candidate;
  *  - prepared templates: one EXCHANGE-FREE plan per (cell set, k)
  *    (scan → [[RefLongSetContains]] exclude → per-subspace
  *    [[RefLongDoubleLookup]] summed in subspace order →
  *    TakeOrderedAndProject); per query only the driver-side
  *    references change — the [[Rm3Server]] lookup expressions reused
  *    as the ADC table. Identical arithmetic to
  *    [[Pq.probeIvfPqStore]] (same fold order), so served results are
  *    oracle-adjacent by construction (spec-pinned equal).
  *
  * CONCURRENCY: the shared [[TemplatePool]] — each probe borrows its
  * own instance for the set-refs-then-collect window. STALENESS: per
  * borrow, each template's [[CellVersion]] stamp is revalidated
  * against the live cell listings (driver-side metadata only);
  * [[refresh]] stays the explicit hammer for object-store layouts
  * where listings can lag. */
final class IvfPqServer(spark: SparkSession, dir: String,
                        storeDir: String) {

  // the quantizer the STORE was encoded under: its frozen sidecar
  // (falls back to table-derived for pre-sidecar stores) — a table
  // update can no longer silently desync the distance tables and the
  // coarse routing from the stored codes
  private val quantizer = Pq.storeQuantizer(spark, dir, storeDir)
  private val cents = quantizer._1
  private val sd = cents(0)(0)._2.length

  private val seeds: Array[(Long, Array[Float])] =
    quantizer._2.map { case (cid, cv) => (cid, cv.toArray) }

  require(seeds.nonEmpty, s"no seed centroids found under $dir")

  /** The query's top-`nProbe` cells by centroid cosine, (cosine desc,
    * cid asc) — the same ranking as [[Pq.annIvfPq]]'s coarse probe, so
    * the served and oracle-checked paths choose identical cell sets. */
  def cellsOf(qv: Seq[Float], nProbe: Int): Seq[Long] =
    seeds.map { case (cid, cv) =>
      (cid, Similarity.cosSeqInf(qv, scala.collection.immutable
        .ArraySeq.unsafeWrapArray(cv)))
    }.sortBy { case (cid, c) => (-c, cid) }
      .take(nProbe).map(_._1).toSeq

  private val hfs = new org.apache.hadoop.fs.Path(storeDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def existingCellPaths(cells: Seq[Long]): Seq[String] =
    cells.map(c => s"$storeDir/cell=$c")
      .filter(p => hfs.exists(new org.apache.hadoop.fs.Path(p)))

  // takedown awareness — the [[IvfServer]] discipline verbatim: the
  // pending tombstone set rides the driver-updated exclude set behind
  // a [[DirVersion]] stamp of the tombstones dir, so a
  // [[Pq.deletePqVectors]] under a live server is honored on the next
  // probe with zero template rebuilds; the physical reclaim's cell
  // rewrites are caught by the per-borrow [[CellVersion]] stamp.
  private val tombRef = new java.util.concurrent.atomic.AtomicReference[
    (Long, java.util.HashSet[java.lang.Long])](null)

  private def tombstones(): (Long, java.util.HashSet[java.lang.Long]) = {
    val v = DirVersion.of(hfs,
      Seq(s"$storeDir/${Similarity.IvfTombstonesName}"))
    val cached = tombRef.get
    if (cached != null && cached._1 == v) cached
    else {
      val s = new java.util.HashSet[java.lang.Long]
      Similarity.ivfTombstones(spark, storeDir).foreach(
        _.collect().foreach(r => s.add(r.getLong(0))))
      val snap = (v, s)
      tombRef.set(snap)
      snap
    }
  }

  private def emptyResult: DataFrame =
    spark.range(0).selectExpr("id AS vec_id",
      "CAST(0.0 AS DOUBLE) AS pq_dist")

  /** The per-query ADC table: subspace → (code → exact-query-to-
    * centroid squared L2), the [[Pq.l2]] sequential fold — driver
    * arithmetic over m×k entries. */
  private def dtables(qv: Seq[Float]): Array[Map[Long, Double]] =
    Array.tabulate(Pq.Subspaces) { s =>
      cents(s).map { case (cid, cv) => cid -> Pq.l2(qv, s * sd, cv) }.toMap
    }

  /** Fresh-plan probe of the compressed store: one job over the
    * `nProbe` nearest cell directories, codes scored via broadcast
    * map-literal lookups ([[Pq.probeIvfPqStore]]'s scan shape with the
    * routing already done driver-side). */
  def probe(qv: Seq[Float], k: Int = Pq.TopK, excludeId: Long = -1L,
            nProbe: Int = 2): DataFrame = {
    val paths = existingCellPaths(cellsOf(qv, nProbe))
    if (paths.isEmpty) return emptyResult
    val dt = dtables(qv)
    val score = (0 until Pq.Subspaces)
      .map(s => element_at(typedLit(dt(s)), col(s"c$s")))
      .reduce(_ + _)
    val ts = tombstones()._2
    val scan = spark.read.parquet(paths: _*)
    (if (ts.isEmpty) scan
     else {
       import scala.jdk.CollectionConverters._
       scan.filter(!col("vec_id").isInCollection(
         ts.asScala.map(_.longValue).toSeq))
     })
      .filter(col("vec_id") =!= excludeId)
      .select(col("vec_id"), score.as("d"))
      .orderBy(col("d"), col("vec_id"))
      .limit(k)
      .select(col("vec_id"), (round(col("d"), 4) + 0.0).as("pq_dist"))
  }

  private final case class Tmpl(
      dt: Array[AtomicReference[
        java.util.HashMap[java.lang.Long, java.lang.Double]]],
      exclude: AtomicReference[java.util.HashSet[java.lang.Long]],
      df: DataFrame, version: Long)

  private val pools = new TemplatePool[(Seq[Long], Int), Tmpl](
    { case (cells, k) => buildTmpl(cells, k) }, maxKeys = 32)

  /** Drop every pooled template (see the staleness note above). */
  def refresh(): Unit = { pools.clear(); tombRef.set(null) }

  private def buildTmpl(cells: Seq[Long], k: Int): Tmpl = {
    // version BEFORE the read, so a mutation racing the build leaves
    // the stamp mismatched and the next borrow rebuilds
    val version = CellVersion.of(hfs, storeDir, cells)
    val dt = Array.fill(Pq.Subspaces)(new AtomicReference(
      new java.util.HashMap[java.lang.Long, java.lang.Double]()))
    val ex = new AtomicReference[java.util.HashSet[java.lang.Long]](
      new java.util.HashSet)
    val paths = existingCellPaths(cells)
    val df =
      if (paths.isEmpty) emptyResult
      else spark.read.parquet(paths: _*)
        .filter(!Bridge.column(RefLongSetContains(
          Bridge.expression(col("vec_id")), ex)))
        .select(col("vec_id"),
          (0 until Pq.Subspaces)
            .map(s => Bridge.column(RefLongDoubleLookup(
              Bridge.expression(col(s"c$s")), dt(s))))
            .reduce(_ + _).as("d"))
        .orderBy(col("d"), col("vec_id"))
        .limit(k)
        .select(col("vec_id"), (round(col("d"), 4) + 0.0).as("pq_dist"))
    df.queryExecution.executedPlan // plan + codegen now, not per query
    Tmpl(dt, ex, df, version)
  }

  /** [[probe]] through a borrowed prepared plan — zero per-query
    * Catalyst work once the (cell set, k) pool is warm, safe from
    * concurrent threads. Duplicate vec_ids (a store rewrite replaying
    * rows) collapse driver-side to the best-distance occurrence with
    * doubling refetch, so callers always see k distinct neighbors when
    * the probed cells hold that many — the [[IvfServer.probeTemplate]]
    * contract. */
  def probeTemplate(qv: Seq[Float], k: Int = Pq.TopK,
                    excludeId: Long = -1L,
                    nProbe: Int = 2): Seq[(Long, Double)] = {
    val cells = cellsOf(qv, nProbe)
    val tables = dtables(qv)
    var fetch = k
    while (true) {
      val rows = pools.withInstance((cells, fetch),
          (t: Tmpl) => t.version == CellVersion.of(hfs, storeDir, cells)) {
        t =>
          var s = 0
          while (s < Pq.Subspaces) {
            val m = new java.util.HashMap[java.lang.Long, java.lang.Double]()
            tables(s).foreach { case (cid, d) => m.put(cid, d) }
            t.dt(s).set(m)
            s += 1
          }
          val ex = new java.util.HashSet[java.lang.Long](tombstones()._2)
          if (excludeId != -1L) ex.add(excludeId)
          t.exclude.set(ex)
          t.df.collect().iterator
            .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      }
      // rows arrive (dist asc, vec_id asc): first occurrence per id wins
      val seen = new java.util.HashSet[Long]()
      val distinct = rows.filter(r => seen.add(r._1))
      if (distinct.length >= k || rows.length < fetch)
        return distinct.take(k)
      fetch *= 2
    }
    throw new IllegalStateException("unreachable")
  }

  /** The executed plan of `qv`'s cell template (spec hook: the
    * exchange-free invariant that makes plan reuse safe). */
  private[query] def templatePlan(qv: Seq[Float]): String =
    pools.withInstance((cellsOf(qv, 2), Pq.TopK))(
      _.df.queryExecution.executedPlan.toString)
}
