package graft.query

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import graft.index.InvertedIndex
import graft.index.InvertedIndex.Index

/** Set-membership predicate against a DRIVER-UPDATED reference,
  * comparing the column's `UTF8String` directly (no per-row String
  * materialization — measured as the dominant cost of a UDF filter
  * over a ~500k-row cached postings scan). The set is captured when a
  * job's tasks are serialized, so each execution sees the value current
  * at submit time. */
private[query] case class RefSetContains(
    child: Expression,
    ref: AtomicReference[java.util.HashSet[UTF8String]])
    extends UnaryExpression with Predicate with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("ref_set_contains expects string")

  override def prettyName: String = "graft_ref_set_contains"

  override def nullSafeEval(v: Any): Any =
    ref.get.contains(v.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(c: Expression): RefSetContains =
    copy(child = c)
}

/** Reusable point-query serving template — the "prepared statement"
  * form of [[QueryEngine.serveSearch]] for a standing serving node.
  *
  * [[QueryEngine.serveSearch]] builds a fresh DataFrame per query, so
  * every lookup pays Catalyst end-to-end (parse/analyze/optimize/
  * physical planning + codegen lookup — measured ≈40% of warm point
  * latency) plus a broadcast round-trip for docid resolution. This
  * class builds TWO plans once and re-executes them for every query,
  * swapping only driver-side state:
  *
  *  - score template: postings → term-set filter (a predicate reading
  *    an [[AtomicReference]] at job submit) → coalesce(1) → window df
  *    → per-doc score aggregate → top-k.
  *
  * Re-executing a cached physical plan is only safe because the
  * template is EXCHANGE-FREE: broadcast/shuffle exchange nodes cache
  * their first result and would serve the first query's data to every
  * later query. The single-partition scoring plan satisfies all
  * distribution requirements without an exchange (the same trade
  * serveSearch documents: a serving node funnels one query's postings
  * through one task).
  *
  * Docid RESOLUTION is NOT a template: it builds a fresh tiny
  * `isin(literal docnos)` plan per query. Only the score side needs
  * the zero-Catalyst trick (it scans postings); resolve touches ≤ topK
  * rows, so fresh planning costs microseconds and the LITERAL
  * predicate keeps what an opaque reference-reading one forfeits —
  * cached-batch min/max stat pruning (and parquet row-group pruning on
  * a loaded index). A templated UDF filter here was O(corpus) per
  * query: free at 50k docs, the serving path's linear term at 10⁹.
  * Unresolvable docnos are DROPPED, matching serveSearch's inner-join
  * semantics (unreachable with a well-formed index). The tiny (≤ topK)
  * join of the two runs on the driver.
  *
  * Each query's term/docno set is captured when its job is submitted
  * (task closures are serialized per job), so the pattern holds on a
  * real cluster, not just local mode. Results are identical to
  * serveSearch (spec-pinned, including the stopword-only → empty
  * case). `bugCompat` scoring stays on serveSearch — a standing
  * serving endpoint wants the intended semantics.
  *
  * Intended for a CACHED (in-memory) index: the reference-reading
  * predicates are opaque to parquet pushdown and cached-batch stats,
  * so over a parquet-backed loaded index this template would scan the
  * full postings per query — there, [[QueryEngine.serveSearch]]'s
  * literal filters keep file/row-group pruning (Repl selects
  * accordingly).
  *
  * STALENESS: a server handed an in-memory [[Index]] serves that
  * SNAPSHOT — the struct is immutable, there is no shared store to go
  * stale against (a caller that merges builds a new Index and a new
  * server). The store-backed form ([[PointServer.overStore]]) is
  * where mutation is real: it loads + caches the written artifacts
  * and revalidates a [[DirVersion]] stamp per [[search]], rebuilding
  * the snapshot (and its templates) when the directory moved — so an
  * [[InvertedIndex.merge]]-then-write under a live server is
  * detected, never silently served stale ([[Bm25Server]]'s
  * discipline). [[refresh]] is the explicit hammer for layouts where
  * listings can lag. */
final class PointServer private (
    ix0: Index, topK: Int,
    reload: Option[() => Index],
    version: Option[() => Long]) {

  /** Snapshot-serving constructor over a caller-owned (cached) index. */
  def this(ix: Index, topK: Int = 10) = this(ix, topK, None, None)

  private final case class Tmpl(
      ref: AtomicReference[java.util.HashSet[UTF8String]], df: DataFrame)

  private def buildTmpl(ix: Index): Tmpl = {
    val termsRef = new AtomicReference[java.util.HashSet[UTF8String]](
      new java.util.HashSet)
    val inTerms =
      Bridge.column(RefSetContains(Bridge.expression(col("kgram")), termsRef))
    val df = ix.postings.filter(inTerms).coalesce(1)
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("kgram"))))
      .groupBy(col("docno"))
      .agg(sum((lit(1.0) + log(col("tf"))) *
        log10(lit(ix.nDocs.toDouble) / col("df").cast("double"))).as("s0"))
      .select(col("docno"), round(col("s0"), 4).as("score"))
      .orderBy(col("score").desc, col("docno"))
      .limit(topK)
    // force planning + codegen at build, not on the instance's first query
    df.queryExecution.executedPlan
    Tmpl(termsRef, df)
  }

  // CONCURRENCY (round 9): score templates live in a pool — each
  // search() borrows its own instance for the set-refs-then-collect
  // window, so concurrent callers can't race on a shared reference
  // cell (previously a class-wide `synchronized`, one in-flight query
  // per server). Single shape → single key.
  private final class State(val version: Long, val ix: Index) {
    val pool = new TemplatePool[Unit, Tmpl](_ => buildTmpl(ix),
      maxKeys = 1)
  }

  private def storeVersion(): Long = version.fold(0L)(_())

  private val stateRef = new AtomicReference[State](
    new State(storeVersion(), ix0))

  stateRef.get.pool.withInstance(())(_ => ()) // plan+codegen at ctor

  /** The snapshot current against the store version — rebuilds (once,
    * double-checked) when the stamp moved; constant for the
    * snapshot-serving form. */
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

  /** The reused physical plan, exposed so specs can assert the
    * exchange-free invariant under any session conf (AQE, partition
    * counts) — an exchange sneaking in here is the stale-result trap
    * the class doc describes. */
  private[graft] def templatePlan: org.apache.spark.sql.execution.SparkPlan =
    current().pool.withInstance(())(_.df.queryExecution.executedPlan)

  /** (docno, docid, score) rows, score desc then docno asc — the same
    * output (and arity contract) as [[QueryEngine.serveSearch]].
    * Safe for concurrent callers: each borrows a pooled template
    * instance (see [[TemplatePool]]). */
  def search(query: String): Seq[(Long, String, Double)] =
    searchTerms(QueryEngine.requireArity(query))

  /** [[search]] over an already-analyzed term set with NO arity cap —
    * the scoring tail of a WILDCARD expansion
    * ([[WildcardServer.search]]): the pooled template's ref set takes
    * any number of terms (the arity rule is the interactive client's
    * contract, not the plan's). Same output and ordering. */
  private[query] def searchTerms(terms: Seq[String])
      : Seq[(Long, String, Double)] = {
    val st = current()
    if (terms.isEmpty) return Seq.empty // stopword-only: no job at all
    val set = new java.util.HashSet[UTF8String]()
    terms.foreach(t => set.add(UTF8String.fromString(t)))
    val top = st.pool.withInstance(()) { t =>
      t.ref.set(set)
      t.df.collect().map(r => (r.getLong(0), r.getDouble(1)))
    }
    if (top.isEmpty) return Seq.empty
    // fresh tiny plan per query — literal isin keeps stat/row-group
    // pruning (see class doc); ≤ topK rows, planning cost is noise
    val ids = st.ix.docMap
      .filter(col("docno").isin(top.map(_._1).toSeq: _*))
      .select(col("docno"), col("docid"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // inner-join semantics: a docno the map cannot resolve is dropped
    top.toSeq.flatMap { case (d, s) => ids.get(d).map(id => (d, id, s)) }
  }
}

object PointServer {

  /** STORE-BACKED form: load a written [[InvertedIndex.write]] layout,
    * cache postings + doc_map in memory (the cached-only contract the
    * class doc requires), and serve with per-search [[DirVersion]]
    * staleness revalidation — a merge/rewrite of `dir` under the live
    * server rebuilds the snapshot before the next query runs. */
  def overStore(spark: SparkSession, dir: String,
                topK: Int = 10): PointServer = {
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stamp(): Long = DirVersion.of(hfs, dir,
      Seq("postings", "term_stats", "doc_map", "corpus_stats",
        "tombstones").map(n => s"$dir/$n"))
    def loadCached(): Index = {
      val ix = InvertedIndex.load(spark, dir)
      ix.postings.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ix.docMap.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ix.postings.count() // materialize at (re)build, not first query
      ix.docMap.count()
      ix
    }
    new PointServer(loadCached(), topK,
      Some(() => loadCached()), Some(() => stamp()))
  }
}
