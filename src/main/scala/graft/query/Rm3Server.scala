package graft.query

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.index.InvertedIndex.Index

/** Double-valued lookup of a string column against a DRIVER-UPDATED
  * map — the [[RefSetContains]] idea extended from membership to a
  * per-key weight, for the RM3 weighted-scoring template. Missing key
  * → null (loud-null contract; unreachable when the filter and the map
  * share the same key set, which the server guarantees). */
private[query] case class RefStringDoubleLookup(
    child: Expression,
    ref: AtomicReference[java.util.HashMap[UTF8String, java.lang.Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "ref_string_double_lookup expects string")

  override def prettyName: String = "graft_ref_string_double_lookup"

  override def nullSafeEval(v: Any): Any =
    ref.get.get(v.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(
      c: Expression): RefStringDoubleLookup = copy(child = c)
}

/** [[RefStringDoubleLookup]]'s Long twin, for the per-feedback-doc
  * score lookup. */
private[query] case class RefLongDoubleLookup(
    child: Expression,
    ref: AtomicReference[java.util.HashMap[java.lang.Long, java.lang.Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "ref_long_double_lookup expects bigint")

  override def prettyName: String = "graft_ref_long_double_lookup"

  override def nullSafeEval(v: Any): Any =
    ref.get.get(v.asInstanceOf[Long])

  override protected def withNewChildInternal(
      c: Expression): RefLongDoubleLookup = copy(child = c)
}

/** Prepared-plan RM3 serving — [[QueryEngine.rm3Search]] re-plans both
  * retrieval passes AND the feedback aggregation per query; this class
  * builds the three exchange-free score plans ONCE and re-executes
  * them per query, swapping only driver-side references (the
  * [[PointServer]] discipline, applied stage-wise):
  *
  *  1. pass-1 template: postings → term-set filter ([[RefSetContains]])
  *     → coalesce(1) → window df → per-doc tf-idf score → top-fbDocs
  *     (the [[PointServer]] score plan with the feedback depth),
  *  2. feedback template: postings → feedback-docno filter
  *     ([[RefLongSetContains]]) → coalesce(1) → window doc length →
  *     per-doc score via [[RefLongDoubleLookup]] →
  *     rm(t) = Σ_d tf/len·s(d) per term → top-fbTerms,
  *  3. final template: postings → expanded-term filter → coalesce(1) →
  *     window df → weight via [[RefStringDoubleLookup]] →
  *     score(d) = Σ_t q(t)·(1+ln tf)·idf → top-k.
  *
  * The λ-blend between passes 2 and 3 is driver arithmetic over
  * fbTerms-bounded rows — [[QueryEngine.rm3Weights]], SHARED with the
  * fresh path so the two cannot drift. Docid resolution stays a fresh
  * tiny literal-isin plan per query (the [[PointServer]] resolve
  * rationale: literals keep stat pruning; ≤ topK rows). Results are
  * identical to [[QueryEngine.rm3Search]] (spec-pinned). Like
  * [[PointServer]], intended for a CACHED index — reference-reading
  * predicates are opaque to parquet pushdown.
  *
  * CONCURRENCY: all three plans + their references live in ONE pooled
  * instance, borrowed for the query's whole three-stage window
  * ([[TemplatePool]] — concurrent callers each get their own). */
final class Rm3Server private (
    ix0: Index, topK: Int, fbDocs: Int, fbTerms: Int, lambda: Double,
    reload: Option[() => Index], version: Option[() => Long]) {

  /** Snapshot-serving constructor over a caller-owned (cached) index
    * — the struct is immutable, so there is nothing to go stale
    * against (the store-backed [[Rm3Server.overStore]] form is where
    * mutation is real and stamped). */
  def this(ix: Index, topK: Int = 10, fbDocs: Int = 5,
           fbTerms: Int = 10, lambda: Double = 0.5) =
    this(ix, topK, fbDocs, fbTerms, lambda, None, None)

  private final case class Tmpl(
      qRef: AtomicReference[java.util.HashSet[UTF8String]],
      pass1: DataFrame,
      fbDocRef: AtomicReference[java.util.HashSet[java.lang.Long]],
      fbScoreRef: AtomicReference[
        java.util.HashMap[java.lang.Long, java.lang.Double]],
      fb: DataFrame,
      wTermRef: AtomicReference[java.util.HashSet[UTF8String]],
      wRef: AtomicReference[
        java.util.HashMap[UTF8String, java.lang.Double]],
      fin: DataFrame)

  /** The shared exchange-free score skeleton: term-set filter →
    * single task → window df → per-doc weighted tf-idf → top-`limitN`.
    * `weight` is 1 for pass 1, the RM3 blend lookup for the final
    * pass. */
  private def scorePlan(ix: Index,
      termRef: AtomicReference[java.util.HashSet[UTF8String]],
      weight: org.apache.spark.sql.Column, limitN: Int): DataFrame =
    ix.postings
      .filter(Bridge.column(RefSetContains(
        Bridge.expression(col("kgram")), termRef)))
      .coalesce(1)
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("kgram"))))
      .groupBy(col("docno"))
      .agg(sum(weight * (lit(1.0) + log(col("tf"))) *
        log10(lit(ix.nDocs.toDouble) / col("df").cast("double"))).as("s0"))
      .select(col("docno"), round(col("s0"), 4).as("score"))
      .orderBy(col("score").desc, col("docno"))
      .limit(limitN)

  private def buildTmpl(ix: Index): Tmpl = {
    val qRef = new AtomicReference[java.util.HashSet[UTF8String]](
      new java.util.HashSet)
    val pass1 = scorePlan(ix, qRef, lit(1.0), fbDocs)
    val fbDocRef = new AtomicReference[java.util.HashSet[java.lang.Long]](
      new java.util.HashSet)
    val fbScoreRef = new AtomicReference[
      java.util.HashMap[java.lang.Long, java.lang.Double]](
      new java.util.HashMap)
    // rm(t) = Σ_d (tf(t,d)/len(d))·s(d) — same arithmetic as
    // rm3Search's relational form, over the single funneled partition
    val fb = ix.postings
      .filter(Bridge.column(RefLongSetContains(
        Bridge.expression(col("docno")), fbDocRef)))
      .coalesce(1)
      .withColumn("dlen",
        sum(col("tf")).over(Window.partitionBy(col("docno"))))
      .withColumn("s", Bridge.column(RefLongDoubleLookup(
        Bridge.expression(col("docno")), fbScoreRef)))
      .groupBy(col("kgram"))
      .agg(sum(col("tf").cast("double") / col("dlen") * col("s"))
        .as("rm0"))
      .orderBy(col("rm0").desc, col("kgram"))
      .limit(fbTerms)
    val wTermRef = new AtomicReference[java.util.HashSet[UTF8String]](
      new java.util.HashSet)
    val wRef = new AtomicReference[
      java.util.HashMap[UTF8String, java.lang.Double]](
      new java.util.HashMap)
    val fin = scorePlan(ix, wTermRef,
      Bridge.column(RefStringDoubleLookup(
        Bridge.expression(col("kgram")), wRef)), topK)
    // force planning + codegen at build, not on the first query
    pass1.queryExecution.executedPlan
    fb.queryExecution.executedPlan
    fin.queryExecution.executedPlan
    Tmpl(qRef, pass1, fbDocRef, fbScoreRef, fb, wTermRef, wRef, fin)
  }

  private final class State(val version: Long, val ix: Index) {
    val pool = new TemplatePool[Unit, Tmpl](_ => buildTmpl(ix),
      maxKeys = 1)
  }

  private def storeVersion(): Long = version.fold(0L)(_())

  private val stateRef = new AtomicReference[State](
    new State(storeVersion(), ix0))

  stateRef.get.pool.withInstance(())(_ => ()) // plan+codegen at ctor

  /** The snapshot current against the store version — rebuilds (once,
    * double-checked) when the [[DirVersion]] stamp moved; constant
    * for the snapshot-serving form. */
  private def current(): State = {
    val st = stateRef.get
    if (st.version == storeVersion()) st
    else this.synchronized {
      val held = stateRef.get
      val v = storeVersion()
      if (held.version == v) held
      else {
        val fresh = new State(v, reload.get())
        stateRef.set(fresh)
        held.ix.postings.unpersist(blocking = false)
        held.ix.docMap.unpersist(blocking = false)
        fresh
      }
    }
  }

  /** Drop the snapshot and reload from the store NOW (store-backed
    * form only — a no-op snapshot rebuild otherwise). */
  def refresh(): Unit = this.synchronized {
    reload.foreach { r =>
      val held = stateRef.get
      stateRef.set(new State(storeVersion(), r()))
      held.ix.postings.unpersist(blocking = false)
      held.ix.docMap.unpersist(blocking = false)
    }
  }

  /** The three reused physical plans (spec hook: the exchange-free
    * invariant that makes re-execution safe). */
  private[graft] def templatePlans: Seq[org.apache.spark.sql.execution.SparkPlan] =
    current().pool.withInstance(())(t => Seq(t.pass1, t.fb, t.fin)
      .map(_.queryExecution.executedPlan))

  private def utf8Set(ts: Iterable[String]) = {
    val s = new java.util.HashSet[UTF8String]()
    ts.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  /** (docno, docid, score) rows, (score desc, docno asc) — the same
    * output contract as [[QueryEngine.rm3Search]], from the prepared
    * plans. Safe for concurrent callers. */
  def search(query: String): Seq[(Long, String, Double)] = {
    val st = current()
    val qTerms = QueryEngine.requireArity(query).distinct
    if (qTerms.isEmpty) return Seq.empty
    val top = st.pool.withInstance(()) { t =>
      t.qRef.set(utf8Set(qTerms))
      val fbRows = t.pass1.collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      if (fbRows.isEmpty) Seq.empty[(Long, Double)]
      else {
        val ds = new java.util.HashSet[java.lang.Long]()
        val sm = new java.util.HashMap[java.lang.Long, java.lang.Double]()
        fbRows.foreach { case (d, s) => ds.add(d); sm.put(d, s) }
        t.fbDocRef.set(ds); t.fbScoreRef.set(sm)
        val rm = t.fb.collect()
          .map(r => (r.getString(0), r.getDouble(1))).toSeq
        val weights = QueryEngine.rm3Weights(qTerms, rm, lambda)
        val wm = new java.util.HashMap[UTF8String, java.lang.Double]()
        weights.foreach { case (k, w) =>
          wm.put(UTF8String.fromString(k), w) }
        t.wTermRef.set(utf8Set(weights.map(_._1)))
        t.wRef.set(wm)
        t.fin.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      }
    }
    if (top.isEmpty) return Seq.empty
    // fresh tiny plan per query — literal isin keeps stat/row-group
    // pruning (the PointServer resolve rationale); ≤ topK rows
    val ids = st.ix.docMap
      .filter(col("docno").isin(top.map(_._1): _*))
      .select(col("docno"), col("docid"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    top.flatMap { case (d, s) => ids.get(d).map(id => (d, id, s)) }
  }
}

object Rm3Server {

  /** STORE-BACKED form: load a written [[graft.index.InvertedIndex
    * .write]] layout, cache postings + doc_map (the cached-only
    * contract), and serve with per-search [[DirVersion]] staleness
    * revalidation — a merge/rewrite of `dir` under the live server
    * rebuilds the snapshot (and all three templates) before the next
    * query runs. */
  def overStore(spark: org.apache.spark.sql.SparkSession, dir: String,
                topK: Int = 10, fbDocs: Int = 5, fbTerms: Int = 10,
                lambda: Double = 0.5): Rm3Server = {
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stamp(): Long = DirVersion.of(hfs, dir,
      Seq("postings", "term_stats", "doc_map", "corpus_stats",
        "tombstones").map(n => s"$dir/$n"))
    def loadCached(): Index = {
      val ix = graft.index.InvertedIndex.load(spark, dir)
      ix.postings.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ix.docMap.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ix.postings.count() // materialize at (re)build, not first query
      ix.docMap.count()
      ix
    }
    new Rm3Server(loadCached(), topK, fbDocs, fbTerms, lambda,
      Some(() => loadCached()), Some(() => stamp()))
  }
}
