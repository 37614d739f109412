package graft.query

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String

/** [[RefSetContains]]' Long twin, for the docno resolve template. */
private[query] case class RefLongSetContains(
    child: Expression,
    ref: AtomicReference[java.util.HashSet[java.lang.Long]])
    extends UnaryExpression with Predicate with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("ref_long_set_contains expects bigint")

  override def prettyName: String = "graft_ref_long_set_contains"

  override def nullSafeEval(v: Any): Any =
    ref.get.contains(v.asInstanceOf[Long])

  override protected def withNewChildInternal(c: Expression): RefLongSetContains =
    copy(child = c)
}

/** Prepared-plan point-query serving over a LOADED (pure-parquet)
  * index — the durable-artifact counterpart of [[PointServer]].
  *
  * [[PointServer]]'s reusable template is documented cached-only: its
  * reference-reading predicate is opaque to parquet pushdown, so over
  * parquet artifacts it would scan the FULL postings per query —
  * O(corpus), the exact failure mode its resolve path was cured of.
  * And [[QueryEngine.serveSearch]] on a loaded index keeps pruning
  * (literal filters) but pays fresh Catalyst planning per query —
  * measured ≈40% of warm point latency.
  *
  * This class keeps BOTH properties: scans bounded by pruning AND
  * amortized planning. The trick is to do the pruning DRIVER-SIDE and
  * key the prepared plans by its result:
  *
  *  - [[graft.index.InvertedIndex.write]] persists zone-map manifests
  *    (per-file min/max of the range-partitioned sort key). Opening a
  *    server reads the two tiny manifests — O(files) driver state, no
  *    corpus scan.
  *  - A query's terms are routed to their covering files by binary
  *    search over those ranges (range partitioning keeps all postings
  *    of a term in exactly ONE file, so a 1-2 term query touches 1-2
  *    files; unknown terms route nowhere).
  *  - The prepared score plan for that FILE SET is fetched from an LRU
  *    plan cache (built on miss: a scan of just those files + the same
  *    exchange-free single-task score shape as [[PointServer]], with a
  *    driver-updated term-set predicate). The scan is file-bounded BY
  *    CONSTRUCTION — the opaque predicate no longer needs pushdown,
  *    because the pruning already happened when the plan was keyed.
  *  - Docid resolution routes the ≤topK docnos through the doc_map
  *    manifest the same way ([[RefLongSetContains]]); the tiny final
  *    join runs on the driver, unresolved docnos drop (inner-join
  *    semantics, same as [[PointServer]]).
  *
  * Planning cost therefore amortizes across all queries whose terms
  * fall in the same file set — at any scale the cache holds plans for
  * the HOT file sets, and a cold file set costs one planning pass, not
  * one per query. Results are spec-pinned identical to
  * [[QueryEngine.serveSearch]] on the same loaded index.
  *
  * STALENESS: the snapshot (zone-map manifests, nDocs, plan pools)
  * lives in a versioned State revalidated per [[search]] against a
  * [[DirVersion]] stamp of the five index artifact dirs — an
  * [[graft.index.InvertedIndex.merge]]-then-[[graft.index
  * .InvertedIndex.write]] of the SAME directory under a live server
  * is detected and the manifests re-read (the [[Bm25Server]]
  * discipline; previously the manifests were read once at open, so a
  * merged index was silently routed with the PRE-merge ranges).
  * [[refresh]] stays the explicit hammer for layouts where listings
  * can lag (eventually consistent object stores).
  *
  * Safe for concurrent callers: templates live in per-file-set
  * [[TemplatePool]]s — each query borrows its own instance for the
  * set-refs-then-collect window. */
final class LoadedPointServer(spark: SparkSession, dir: String,
                              topK: Int = 10, maxPlans: Int = 64) {

  private val hfs = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def storeVersion(): Long =
    DirVersion.of(hfs, dir,
      Seq("postings", "doc_map", "corpus_stats", "postings_ranges",
        "doc_map_ranges", "tombstones").map(n => s"$dir/$n"))

  private final case class ScoreTmpl(
      ref: AtomicReference[java.util.HashSet[UTF8String]], df: DataFrame)
  private final case class ResolveTmpl(
      ref: AtomicReference[java.util.HashSet[java.lang.Long]], df: DataFrame)

  /** One immutable snapshot of the on-disk index: loaded frames,
    * routing manifests, and the plan pools keyed by their file names
    * (a rewrite changes file names, so stale plans can't be reused
    * across a State swap even by accident). */
  private final class State(val version: Long) {
    val ix: graft.index.InvertedIndex.Index =
      graft.index.InvertedIndex.load(spark, dir)

    // write-time zone-map manifests → driver-side routing ([[Routing]])
    val postRanges: Array[(String, String, String)] =
      Routing.stringRanges(spark, s"$dir/postings_ranges")
    val docRanges: Array[(Long, Long, String)] =
      Routing.longRanges(spark, s"$dir/doc_map_ranges")

    val scorePlans = new TemplatePool[Seq[String], ScoreTmpl](
      fs => buildScore(this, fs), maxKeys = maxPlans)
    val resolvePlans = new TemplatePool[Seq[String], ResolveTmpl](
      fs => buildResolve(this, fs), maxKeys = maxPlans)

    // PENDING DELETIONS: the templates scan part files directly
    // (bypassing load()'s anti-join), so the tombstoned docnos load
    // into a driver set and every template built under this State
    // filters them out (the LoadedPhraseServer discipline; the
    // tombstones dir rides in the stamp)
    val tombs: java.util.HashSet[java.lang.Long] = {
      val s = new java.util.HashSet[java.lang.Long]()
      graft.index.InvertedIndex.readTombs(spark, dir).foreach(
        _.collect().foreach(r => s.add(r.getLong(0))))
      s
    }
  }

  private def buildScore(st: State, files: Seq[String]): ScoreTmpl = {
    val ref =
      new AtomicReference[java.util.HashSet[UTF8String]](new java.util.HashSet)
    val inTerms =
      Bridge.column(RefSetContains(Bridge.expression(col("kgram")), ref))
    // explicit schema: no inference job when the plan is first built;
    // pending deletions filter out at the scan (tombstone-free States
    // keep the unfiltered plan)
    val scan0 = spark.read.schema(st.ix.postings.schema)
      .parquet(files: _*)
    val scan =
      if (st.tombs.isEmpty) scan0
      else scan0.filter(!Bridge.column(RefLongSetContains(
        Bridge.expression(col("docno")),
        new AtomicReference(st.tombs))))
    val df = scan
      .filter(inTerms).coalesce(1)
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("kgram"))))
      .groupBy(col("docno"))
      .agg(sum((lit(1.0) + log(col("tf"))) *
        log10(lit(st.ix.nDocs.toDouble) / col("df").cast("double"))).as("s0"))
      .select(col("docno"), round(col("s0"), 4).as("score"))
      .orderBy(col("score").desc, col("docno"))
      .limit(topK)
    df.queryExecution.executedPlan // plan + codegen now, not per query
    ScoreTmpl(ref, df)
  }

  private def buildResolve(st: State, files: Seq[String]): ResolveTmpl = {
    val ref = new AtomicReference[java.util.HashSet[java.lang.Long]](
      new java.util.HashSet)
    val inDocs =
      Bridge.column(RefLongSetContains(Bridge.expression(col("docno")), ref))
    val df = spark.read.schema(st.ix.docMap.schema).parquet(files: _*)
      .filter(inDocs).coalesce(1)
      .select(col("docno"), col("docid"))
    df.queryExecution.executedPlan
    ResolveTmpl(ref, df)
  }

  private val stateRef = new AtomicReference[State](
    new State(storeVersion()))

  /** The snapshot current against the on-disk version — rebuilds
    * (once, double-checked) when the stamp moved. */
  private def current(): State = {
    val st = stateRef.get
    if (st.version == storeVersion()) st
    else this.synchronized {
      val held = stateRef.get
      val v = storeVersion()
      if (held.version == v) held
      else {
        val fresh = new State(v)
        stateRef.set(fresh)
        fresh
      }
    }
  }

  /** Drop the snapshot and re-read the manifests NOW — the explicit
    * hammer for layouts where directory listings can lag a mutation;
    * routine staleness is already caught per [[search]] by the
    * version stamp. */
  def refresh(): Unit = this.synchronized {
    stateRef.set(new State(storeVersion()))
    ()
  }

  /** The loaded index, for callers that also want analytic plans over
    * the same artifacts. */
  def index: graft.index.InvertedIndex.Index = current().ix

  /** The score template's executed plan for a term's file set (spec
    * hook: the exchange-free invariant that makes plan reuse safe). */
  private[graft] def templatePlan(query: String)
      : org.apache.spark.sql.execution.SparkPlan = {
    val st = current()
    val files = QueryEngine.requireArity(query)
      .flatMap(t => Routing.route(st.postRanges, t)).distinct.sorted
    st.scorePlans.withInstance(files)(_.df.queryExecution.executedPlan)
  }

  /** (docno, docid, score) rows, score desc then docno asc — the same
    * output contract as [[QueryEngine.serveSearch]] /
    * [[PointServer.search]]. */
  def search(query: String): Seq[(Long, String, Double)] = {
    val st = current()
    val terms = QueryEngine.requireArity(query)
    if (terms.isEmpty) return Seq.empty // stopword-only: no job at all
    val files = terms.flatMap(t => Routing.route(st.postRanges, t))
      .distinct.sorted
    if (files.isEmpty) return Seq.empty // no term in any file's range
    val set = new java.util.HashSet[UTF8String]()
    terms.foreach(t => set.add(UTF8String.fromString(t)))
    val top = st.scorePlans.withInstance(files) { s =>
      s.ref.set(set)
      s.df.collect().map(r => (r.getLong(0), r.getDouble(1)))
    }
    if (top.isEmpty) return Seq.empty
    val docFiles = top.map(_._1).toSeq
      .flatMap(d => Routing.route(st.docRanges, d)).distinct.sorted
    if (docFiles.isEmpty) return Seq.empty
    val dset = new java.util.HashSet[java.lang.Long]()
    top.foreach(t => dset.add(t._1))
    val ids = st.resolvePlans.withInstance(docFiles) { rt =>
      rt.ref.set(dset)
      rt.df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    // inner-join semantics: a docno the map cannot resolve is dropped
    top.toSeq.flatMap { case (d, s) => ids.get(d).map(id => (d, id, s)) }
  }
}
