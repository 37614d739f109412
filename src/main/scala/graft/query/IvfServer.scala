package graft.query

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import graft.ops.Similarity

/** Cosine of a float-array column against a DRIVER-UPDATED reference
  * vector — the [[RefSetContains]] idea for ANN serving: the query
  * vector is read from the [[AtomicReference]] when a job's tasks are
  * serialized, so one physical plan serves every query. Sequential
  * dimension-order fold (identical arithmetic to
  * [[graft.functions.CosineExpr]]); dimension mismatch → null (the
  * loud-null contract). */
private[query] case class RefVecCosine(
    child: Expression, ref: AtomicReference[Array[Float]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ref_vec_cosine expects array<float>, got $other")
    }

  override def prettyName: String = "graft_ref_vec_cosine"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData].toFloatArray()
    val q = ref.get
    if (a.length != q.length) null
    else {
      var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = q(i).toDouble
        ab += x * y; aa += x * x; bb += y * y; i += 1
      }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
  }

  override protected def withNewChildInternal(c: Expression): RefVecCosine =
    copy(child = c)
}

/** Serving-path ANN over a durable [[Similarity.writeIvfLayout]]
  * store — the [[LoadedPointServer]] idea for vectors: the coarse
  * routing decision moves to the DRIVER, so a probe is ONE Spark job
  * over one cell directory.
  *
  * At construction the k seed centroids are read once (k×dims floats —
  * bounded at any corpus size). A probe takes the QUERY VECTOR (what a
  * real ANN service receives — resolving an id to its vector is client
  * work), assigns its cell in microseconds driver-side (same
  * argmax-cosine, NaN→+∞, smallest-cid ties as [[Similarity
  * .ivfCells]]), and scans only `cell=<qcell>/` — the partition prune
  * becomes a PATH, not even a filter. Exact cosine re-rank +
  * TakeOrderedAndProject inside the cell.
  *
  * vs [[Similarity.probeIvfStore]] (the oracle-checked form): same
  * results by construction (spec-pinned); this class trades its
  * generality for one-job probes.
  */
final class IvfServer(spark: SparkSession, storeDir: String) {

  // the store's OWN seed system: meta-k (family default pre-meta)
  // smallest vec_ids — so the server routes correctly on stores
  // created at any k and on re-clustered stores (a recluster changes
  // both k and the layout; construct a fresh server, or refresh()
  // after the stamp invalidation catches the mutation)
  private val seeds: Array[(Long, Array[Float])] = {
    val k = Similarity.storeK(spark, storeDir)
    require(k <= Int.MaxValue, s"store k $k exceeds seed bound")
    spark.read.parquet(storeDir)
      .select(col("vec_id"), col("embedding"))
      .orderBy("vec_id")
      .limit(k.toInt)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
  }

  require(seeds.nonEmpty, s"no seed centroids found in $storeDir")

  /** The cell the store's assignment would give this vector (the ONE
    * shared driver fold — [[Similarity.cosSeqInf]]). */
  def cellOf(qv: Seq[Float]): Long = cellsOf(qv, 1).head

  /** The query's top-`nProbe` cells by centroid cosine, (cosine desc,
    * cid asc) — the same order as [[Similarity.annIvfProbe]]'s
    * relational centroid ranking and [[Similarity.probeCellsOf]], so
    * every probe path chooses identical cell sets. */
  def cellsOf(qv: Seq[Float], nProbe: Int): Seq[Long] =
    seeds.map { case (cid, cv) =>
      (cid, Similarity.cosSeqInf(qv, scala.collection.immutable
        .ArraySeq.unsafeWrapArray(cv)))
    }.sortBy { case (cid, c) => (-c, cid) }
      .take(nProbe).map(_._1).toSeq

  /** Cell count of the store — the cap rung of any probe (probing
    * every cell is the exact scan; [[HybridServer]]'s parity form). */
  private[query] def nCells: Int = seeds.length

  /** The constructed cell paths that EXIST — a ranked centroid's cell
    * can be empty (`partitionBy` writes no directory for it, e.g. a
    * duplicate seed whose ties all break to the lower cid), and a
    * probe must skip it rather than fail the read. */
  private def existingCellPaths(cells: Seq[Long]): Seq[String] =
    cells.map(c => s"$storeDir/cell=$c")
      .filter(p => hfs.exists(new org.apache.hadoop.fs.Path(p)))

  /** An empty (vec_id, cos) result for probes whose ranked cells all
    * turn out directory-less. */
  private def emptyResult: DataFrame =
    spark.range(0).selectExpr("id AS vec_id",
      "CAST(0.0 AS DOUBLE) AS cos")

  /** Top-k exact-cosine neighbors of `qv` inside its `nProbe` nearest
    * cells (one job over nProbe directories — the recall knob on the
    * served path). `excludeId` drops the query's own row when probing
    * with a stored vector. */
  def probe(qv: Seq[Float], k: Int = 10, excludeId: Long = -1L,
            nProbe: Int = 1): DataFrame = {
    val paths = existingCellPaths(cellsOf(qv, nProbe))
    if (paths.isEmpty) return emptyResult
    val ts = tombstones()._2
    val scan = spark.read.parquet(paths: _*)
    (if (ts.isEmpty) scan
     else {
       import scala.jdk.CollectionConverters._
       scan.filter(!col("vec_id").isInCollection(
         ts.asScala.map(_.longValue).toSeq))
     })
      .filter(col("vec_id") =!= excludeId)
      .select(col("vec_id"),
        Similarity.cosine(col("embedding"), typedLit(qv)).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("c"), 4).as("cos"))
  }

  // ---- prepared templates: EXCHANGE-FREE plans per (cell set, k)
  // (scan → RefLongSetContains exclude → RefVecCosine project →
  // TakeOrderedAndProject); per query only the two driver-side
  // references change. CONCURRENCY: the shared [[TemplatePool]] —
  // each probe borrows its own instance for the set-refs-then-collect
  // window. STALENESS: each template carries a version stamp of its
  // cell directories (per-cell parquet file count + sizes + mtimes,
  // see cellsVersion), taken BEFORE the scan pins its file listing (a
  // mutation landing in between leaves the stamp mismatched with the
  // files, so the next borrow's validate rebuilds — the safe
  // direction of the race); the validate hook re-lists the
  // directories per borrow (driver-side metadata only).
  // [[Similarity.appendIvfLayout]] / [[Similarity.compactIvfStore]]
  // both change a touched cell's file list; [[refresh]] stays as the
  // explicit big hammer for layouts where listings can lag
  // (eventually consistent object stores).
  private final case class Tmpl(
      ref: AtomicReference[Array[Float]],
      exclude: AtomicReference[java.util.HashSet[java.lang.Long]],
      keep: AtomicReference[java.util.HashSet[java.lang.Long]],
      df: DataFrame, version: Long)

  private val hfs = new org.apache.hadoop.fs.Path(storeDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // the stamp folds per-cell parquet FILE COUNT, total BYTES, and the
  // max file mtime — a mutation landing within the directory-mtime's
  // timestamp tick (ms locally, 1 s on some filesystems) still changes
  // the file list or its sizes, so equality can't pass stale
  // (definition shared with [[IvfPqServer]] via [[CellVersion]])
  private def cellsVersion(cells: Seq[Long]): Long =
    CellVersion.of(hfs, storeDir, cells)

  // read-coherence epoch hold ([[graft.ops.Epoch]]): a multi-store
  // fan-out is mid-flight, so every stale-stamp branch below KEEPS
  // its cached value (template, tombstone set, cell counts) — the
  // arm serves the pre-request state until the epoch's single commit
  // flips all arms at once. Checked only where a stamp already
  // moved; the warm path pays nothing.
  private def epochHold(): Boolean =
    graft.ops.Epoch.pending(hfs, storeDir)

  // key: (cell set, k, FILTERED shape?) — the filtered twin adds a
  // driver-updated keep-set predicate to the scan (the served form of
  // probeIvfStoreFiltered's candidate restriction)
  private val pools = new TemplatePool[(Seq[Long], Int, Boolean), Tmpl](
    { case (cells, k, f) => buildTmpl(cells, k, f) }, maxKeys = 32)

  // survivor-count templates for the FILTERED ladder walk: one
  // single-partition count plan per cell slice (keep ∩ slice, query
  // row excluded) — each escalation rung is a prepared job over only
  // the newly probed directories, mirroring probeIvfStoreFilteredAuto
  private final case class CountTmpl(
      keep: AtomicReference[java.util.HashSet[java.lang.Long]],
      exclude: AtomicReference[java.util.HashSet[java.lang.Long]],
      df: DataFrame, version: Long)

  private val countPools = new TemplatePool[Seq[Long], CountTmpl](
    buildCount, maxKeys = 32)

  private def buildCount(cells: Seq[Long]): CountTmpl = {
    val version = cellsVersion(cells)
    val keep = new AtomicReference(new java.util.HashSet[java.lang.Long])
    val ex = new AtomicReference(new java.util.HashSet[java.lang.Long])
    val paths = existingCellPaths(cells)
    val df =
      if (paths.isEmpty)
        spark.range(0).agg(count(lit(1)).as("n"))
      else spark.read.parquet(paths: _*)
        .filter(Bridge.column(RefLongSetContains(
            Bridge.expression(col("vec_id")), keep)) &&
          !Bridge.column(RefLongSetContains(
            Bridge.expression(col("vec_id")), ex)))
        .coalesce(1)
        .agg(count(lit(1)).as("n"))
    df.queryExecution.executedPlan
    CountTmpl(keep, ex, df, version)
  }

  /** Drop every pooled template. Staleness after a store mutation is
    * normally caught by the per-borrow version stamp (see the pool
    * comment); call this where directory modification times can't
    * reflect mutations, or to release plans eagerly. */
  def refresh(): Unit = {
    pools.clear(); countPools.clear()
    tombRef.set(null); countsRef.set(null)
  }

  // ---- takedown awareness: the store's pending tombstone set held
  // driver-side (takedown-sized by the [[Similarity.deleteIvfVectors]]
  // contract) and revalidated per probe against a [[DirVersion]] stamp
  // of the tombstones dir — so a delete under a LIVE server is honored
  // on the very next probe with ZERO template rebuilds: the exclusion
  // rides the same driver-updated [[RefLongSetContains]] set that
  // drops the query's own row. A physical reclaim
  // ([[Similarity.compactIvfDeletes]]) additionally rewrites cell
  // files, which the per-borrow cellsVersion stamp catches — the two
  // stamps compose, and every intermediate state over-excludes at
  // worst (a reclaimed id still in the exclude set has no row left to
  // drop), never serves a deleted vector.
  private val tombRef =
    new AtomicReference[(Long, java.util.HashSet[java.lang.Long])](null)

  private def tombVersion(): Long =
    DirVersion.of(hfs,
      Seq(s"$storeDir/${Similarity.IvfTombstonesName}"))

  /** (stamp, ids) of the pending tombstones — stamp taken BEFORE the
    * read (the template discipline's safe race direction). */
  private def tombstones(): (Long, java.util.HashSet[java.lang.Long]) = {
    val v = tombVersion()
    val cached = tombRef.get
    if (cached != null && (cached._1 == v || epochHold())) cached
    else {
      val s = new java.util.HashSet[java.lang.Long]
      Similarity.ivfTombstones(spark, storeDir).foreach(
        _.collect().foreach(r => s.add(r.getLong(0))))
      val snap = (v, s)
      tombRef.set(snap)
      snap
    }
  }

  private def buildTmpl(cells: Seq[Long], k: Int,
                        filtered: Boolean): Tmpl = {
    // version BEFORE the read: see the staleness note above
    val version = cellsVersion(cells)
    val ref = new AtomicReference[Array[Float]](Array.empty[Float])
    val ex = new AtomicReference[java.util.HashSet[java.lang.Long]](
      new java.util.HashSet)
    val keep = new AtomicReference[java.util.HashSet[java.lang.Long]](
      new java.util.HashSet)
    val paths = existingCellPaths(cells)
    val df =
      if (paths.isEmpty) emptyResult
      else {
        val scan = spark.read.parquet(paths: _*)
          .filter(!Bridge.column(RefLongSetContains(
            Bridge.expression(col("vec_id")), ex)))
        val kept =
          if (filtered)
            scan.filter(Bridge.column(RefLongSetContains(
              Bridge.expression(col("vec_id")), keep)))
          else scan
        kept.select(col("vec_id"),
            Bridge.column(RefVecCosine(
              Bridge.expression(col("embedding")), ref)).as("c"))
          .orderBy(col("c").desc, col("vec_id"))
          .limit(k)
          .select(col("vec_id"), round(col("c"), 4).as("cos"))
      }
    df.queryExecution.executedPlan // plan + codegen now, not per query
    Tmpl(ref, ex, keep, df, version)
  }

  /** [[probe]] through a borrowed prepared plan — zero per-query
    * Catalyst work once the (cell set, k) pool is warm, and SAFE to
    * call from concurrent threads (each call owns its borrowed
    * template for the set-then-collect window). The exclusion happens
    * INSIDE the template (driver-updated id set). DUPLICATE vec_ids —
    * an append replaying a batch lands the same id twice in a cell —
    * are collapsed driver-side to the highest-cosine occurrence; when
    * collapsing leaves fewer than k distinct ids AND the fetch was
    * full (more rows may exist), the fetch doubles and retries through
    * the pool, so callers always see k distinct neighbors when the
    * probed cells hold that many. */
  def probeTemplate(qv: Seq[Float], k: Int = 10, excludeId: Long = -1L,
                    nProbe: Int = 1): Seq[(Long, Double)] =
    probeTemplateCells(cellsOf(qv, nProbe), qv, k, excludeId)

  // ---- routed adaptive probe: per-cell row counts cached with a
  // CellVersion stamp over ALL cells (k-bounded driver state; ONE
  // count job per store generation), so the escalation ladder of
  // [[graft.ops.Similarity.escalate]] walks as pure driver
  // arithmetic — a routed auto probe costs the same single Spark job
  // as a fixed-nProbe probe, plus one listing pass for the stamp.
  private val countsRef =
    new AtomicReference[(Long, Map[Long, Long])](null)

  /** Per-cell LIVE row counts of the CURRENT store generation —
    * tombstoned rows excluded (the stamp folds the tombstones dir, so
    * a takedown re-counts), keeping the driver-side ladder arithmetic
    * exact against what the templates will actually scan. */
  private def cellCounts(): Map[Long, Long] = {
    val all = seeds.map(_._1).toSeq
    val (tv, ts) = tombstones()
    val v = CellVersion.of(hfs, storeDir, all) * 31 + tv
    val cached = countsRef.get
    if (cached != null && (cached._1 == v || epochHold())) cached._2
    else {
      val scan = spark.read.parquet(storeDir)
      val live =
        if (ts.isEmpty) scan
        else {
          import scala.jdk.CollectionConverters._
          scan.filter(!col("vec_id").isInCollection(
            ts.asScala.map(_.longValue).toSeq))
        }
      val m = live
        .groupBy(col("cell")).count().collect()
        .map(r => (r.getAs[Number]("cell").longValue, r.getLong(1)))
        .toMap
      countsRef.set((v, m))
      m
    }
  }

  /** ROUTED-nProbe probe with escalation — the production default of
    * the unfiltered serving path ([[HybridServer]]'s vector arm):
    * walk the doubling ladder over the query's cell ranking until the
    * probed prefix holds `minSurvivors` candidates (default
    * [[Similarity.FilteredAutoOversample]]·k — the shared rule), then
    * rank inside the chosen prefix through the prepared template.
    * Output-identical to [[graft.ops.Similarity.annIvfAuto]] on the
    * same corpus (same seeds, ranking order, ladder rule, arithmetic
    * — spec-pinned). The ladder itself runs on the driver against the
    * cached per-cell counts, so the whole probe is ONE template job.
    * `excludeId` must be the query's OWN stored id (or -1): its row
    * is subtracted from its cell's count, which is exact precisely
    * because the store assigned it by the same argmax rule that ranks
    * the cells here. */
  def probeAutoTemplate(qv: Seq[Float], k: Int = 10,
                        excludeId: Long = -1L,
                        minSurvivors: Option[Int] = None)
      : Seq[(Long, Double)] = {
    val target =
      minSurvivors.getOrElse(Similarity.FilteredAutoOversample * k)
    val ranked = cellsOf(qv, nCells)
    val counts = cellCounts()
    val own = ranked.head // the query vector's own assignment
    // a tombstoned excludeId is already out of the live counts — don't
    // subtract its row twice
    val ownDead = excludeId != -1L && tombstones()._2.contains(excludeId)
    val chosen = Similarity.escalate(ranked, target.toLong) { slice =>
      slice.iterator.map { c =>
        counts.getOrElse(c, 0L) -
          (if (excludeId != -1L && !ownDead && c == own) 1L else 0L)
      }.sum
    }
    probeTemplateCells(chosen, qv, k, excludeId)
  }

  /** [[probeAutoTemplate]] under a metadata filter — the served twin
    * of [[graft.ops.Similarity.annIvfFilteredAuto]] /
    * `probeIvfStoreFilteredAuto` (same seeds, cell ranking, ladder
    * rule, survivor predicate, arithmetic — spec-pinned): each ladder
    * rung's survivor count is a prepared single-partition job over
    * only the newly probed cell directories, the final ranking a
    * prepared filtered template over the chosen prefix. `keep` is the
    * caller's per-query filter working set (a driver-held id set —
    * the [[Bm25Server.searchFiltered]] shape; corpus-dense predicates
    * belong on the batch path). */
  def probeFilteredAutoTemplate(qv: Seq[Float],
                                keep: java.util.HashSet[java.lang.Long],
                                k: Int = 10, excludeId: Long = -1L,
                                minSurvivors: Option[Int] = None)
      : Seq[(Long, Double)] = {
    val target =
      minSurvivors.getOrElse(Similarity.FilteredAutoOversample * k)
    val ranked = cellsOf(qv, nCells)
    val ex = new java.util.HashSet[java.lang.Long](tombstones()._2)
    if (excludeId != -1L) ex.add(excludeId)
    val chosen = Similarity.escalate(ranked, target.toLong) { slice =>
      countPools.withInstance(slice,
          (t: CountTmpl) => t.version == cellsVersion(slice) ||
            epochHold()) { t =>
        t.keep.set(keep)
        t.exclude.set(ex)
        t.df.head().getLong(0)
      }
    }
    probeTemplateCells(chosen, qv, k, excludeId, Some(keep))
  }

  private def probeTemplateCells(cells: Seq[Long], qv: Seq[Float],
                                 k: Int, excludeId: Long,
                                 keep: Option[java.util.HashSet[
                                   java.lang.Long]] = None)
      : Seq[(Long, Double)] = {
    var fetch = k
    while (true) {
      val rows = pools.withInstance((cells, fetch, keep.isDefined),
          (t: Tmpl) => t.version == cellsVersion(cells) ||
            epochHold()) { t =>
        t.ref.set(qv.toArray)
        val ex = new java.util.HashSet[java.lang.Long](tombstones()._2)
        if (excludeId != -1L) ex.add(excludeId)
        t.exclude.set(ex)
        keep.foreach(t.keep.set)
        t.df.collect().iterator
          .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      }
      // rows arrive (cos desc, vec_id asc): first occurrence per id wins
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
    pools.withInstance((cellsOf(qv, 1), 10, false))(
      _.df.queryExecution.executedPlan.toString)
}
