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

  private val seeds: Array[(Long, Array[Float])] =
    spark.read.parquet(storeDir)
      .filter(col("vec_id") < Similarity.IvfCentroids.toLong)
      .select(col("vec_id"), col("embedding"))
      .orderBy("vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  require(seeds.nonEmpty, s"no seed centroids found in $storeDir")

  /** The cell the store's assignment would give this vector (the ONE
    * shared driver fold — [[Similarity.cosSeqInf]]). */
  def cellOf(qv: Seq[Float]): Long =
    seeds.map { case (cid, cv) =>
      (cid, Similarity.cosSeqInf(qv, scala.collection.immutable
        .ArraySeq.unsafeWrapArray(cv)))
    }.maxBy { case (cid, c) => (c, -cid) }._1

  /** Top-k exact-cosine neighbors of `qv` inside its cell. `excludeId`
    * drops the query's own row when probing with a stored vector. */
  def probe(qv: Seq[Float], k: Int = 10, excludeId: Long = -1L): DataFrame =
    spark.read.parquet(s"$storeDir/cell=${cellOf(qv)}")
      .filter(col("vec_id") =!= excludeId)
      .select(col("vec_id"),
        Similarity.cosine(col("embedding"), typedLit(qv)).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("c"), 4).as("cos"))

  // ---- prepared templates: one EXCHANGE-FREE plan per cell (scan →
  // RefVecCosine project → TakeOrderedAndProject), LRU-bounded; per
  // query only the driver-side vector reference changes. k+1 rows come
  // back so the query's own row can drop without a templated filter.
  private final case class Tmpl(ref: AtomicReference[Array[Float]],
                                df: DataFrame, k: Int)

  private val MaxTemplates = 32
  private val templates =
    new java.util.LinkedHashMap[Long, Tmpl](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long, Tmpl]): Boolean =
        size > MaxTemplates
    }

  /** Drop every cached template. A template's file listing is pinned
    * at creation, so after [[Similarity.appendIvfLayout]] grows the
    * store, templates would keep serving the PRE-append files while
    * [[probe]] (which re-lists per call) sees the new ones — call this
    * after any store mutation to realign the two paths (spec-pinned). */
  def refresh(): Unit = synchronized { templates.clear() }

  /** [[probe]] through the cell's prepared plan — zero per-query
    * Catalyst work once a cell's template exists. One in-flight query
    * per server instance (the [[PointServer]] discipline: the ref and
    * the job must pair atomically). After mutating the store
    * ([[Similarity.appendIvfLayout]]), call [[refresh]] — see there. */
  def probeTemplate(qv: Seq[Float], k: Int = 10,
                    excludeId: Long = -1L): Seq[(Long, Double)] =
    synchronized {
      val cell = cellOf(qv)
      var t = templates.get(cell)
      if (t == null || t.k != k) {
        val ref = new AtomicReference[Array[Float]](Array.empty[Float])
        val df = spark.read.parquet(s"$storeDir/cell=$cell")
          .select(col("vec_id"),
            Bridge.column(RefVecCosine(
              Bridge.expression(col("embedding")), ref)).as("c"))
          .orderBy(col("c").desc, col("vec_id"))
          .limit(k + 1)
          .select(col("vec_id"), round(col("c"), 4).as("cos"))
        t = Tmpl(ref, df, k)
        templates.put(cell, t)
      }
      t.ref.set(qv.toArray)
      t.df.collect().iterator
        .map(r => (r.getLong(0), r.getDouble(1)))
        .filter(_._1 != excludeId)
        .take(k).toSeq
    }

  /** The executed plan of `qv`'s cell template (spec hook: the
    * exchange-free invariant that makes plan reuse safe). */
  private[query] def templatePlan(qv: Seq[Float]): String = synchronized {
    probeTemplate(qv)
    templates.get(cellOf(qv)).df.queryExecution.executedPlan.toString
  }
}
