package graft.query

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.unsafe.types.UTF8String

import graft.index.CharKGramIndex

/** PREPARED WILDCARD serving — the last query family to get a warm
  * template (point/phrase/near/ANN/BM25/RM3/hybrid/batch all have
  * one): [[graft.queries.IrSql.q09Wildcard]]'s gram-intersection
  * lookup re-planned per call costs a full Catalyst pass over the
  * chargram store — here the store's (gram, term) pairs are cached
  * ONCE and a single pooled template serves every pattern.
  *
  * Held per snapshot:
  *  - the exploded (gram, term) relation, cached (the chargram store
  *    R4 exists for — at 100 TB this is the vocabulary-sized working
  *    set a serving node holds, not the corpus);
  *  - the store's gram length k, derived from the data (a mismatched
  *    k would silently expand to nothing);
  *  - lazily, the distinct vocabulary as a driver array — only the
  *    all-short-segment fallback patterns pay for it (the
  *    [[Bm25Server]] full-dictionary discipline).
  *
  * Per query, ONE template execution: the pattern's `$`-anchored
  * segment grams land in a driver-updated [[RefSetContains]] set, the
  * cached scan counts matched grams per candidate term
  * (exchange-free: single coalesced partition), and the driver keeps
  * candidates holding EVERY gram that also pass the anchored-regex
  * verify — output-identical to
  * [[QueryEngine.wildcardTerms]] (spec-pinned, same q09 oracle
  * semantics). [[search]] feeds the expansion through the existing
  * [[PointServer]] scoring tail — served wildcard RETRIEVAL, equal to
  * [[QueryEngine.wildcardSearch]].
  *
  * STALENESS: the chargram store now mutates in place
  * ([[CharKGramIndex.mergeIntoStore]]/`deleteDocs`/`updateDocs`), so
  * the snapshot carries the store's [[DirVersion]] stamp — O(1) via
  * the [[graft.StoreGen]] generation its commit protocol bumps — and
  * every call revalidates it: a vocabulary update under a live server
  * is served exactly, never stale. Run mutations behind the quiesce
  * for cutover-exact semantics, as everywhere in the serving layer. */
final class WildcardServer(spark: SparkSession, cgDir: String,
                           point: Option[PointServer] = None,
                           defaultK: Int = 3) {

  private val hfs = new org.apache.hadoop.fs.Path(cgDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def storeVersion(): Long =
    DirVersion.of(hfs, cgDir,
      Seq(cgDir, s"$cgDir/${CharKGramIndex.VocabDfDir}",
        s"$cgDir/${CharKGramIndex.DeletedDocsDir}",
        s"$cgDir/${CharKGramIndex.AppliedOpsDir}"))

  private final case class Tmpl(
      ref: AtomicReference[java.util.HashSet[UTF8String]],
      df: org.apache.spark.sql.DataFrame)

  private final class State(val version: Long) {
    val pairs = CharKGramIndex.load(spark, cgDir)
      .select(col("gram"), explode(col("terms")).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count() // materialize at (re)build, not first query

    /** The store's gram length, from the data (empty store → the
      * constructor default; every lookup is then empty anyway). */
    val k: Int = pairs.select(length(col("gram")))
      .limit(1).collect().headOption.map(_.getInt(0))
      .getOrElse(defaultK)

    /** Driver vocabulary for the all-short-segment fallback — built
      * on first need only. */
    lazy val vocab: Array[String] = pairs.select(col("term"))
      .distinct().collect().map(_.getString(0)).sorted

    val pool = new TemplatePool[Unit, Tmpl](_ => buildTmpl(this),
      maxKeys = 1)
  }

  private def buildTmpl(st: State): Tmpl = {
    val ref = new AtomicReference[java.util.HashSet[UTF8String]](
      new java.util.HashSet)
    val inGrams = Bridge.column(
      RefSetContains(Bridge.expression(col("gram")), ref))
    val df = st.pairs.filter(inGrams).coalesce(1)
      .groupBy(col("term")).agg(count(lit(1)).as("ng"))
    df.queryExecution.executedPlan // plan + codegen at build
    Tmpl(ref, df)
  }

  private val stateRef = new AtomicReference[State](
    new State(storeVersion()))

  stateRef.get.pool.withInstance(())(_ => ()) // plan+codegen at ctor

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
        held.pairs.unpersist(blocking = false)
        fresh
      }
    }
  }

  /** Drop the snapshot and rebuild NOW (the explicit hammer for
    * eventually consistent listings; routine staleness is caught per
    * call by the version stamp). */
  def refresh(): Unit = this.synchronized {
    val held = stateRef.get
    stateRef.set(new State(storeVersion()))
    held.pairs.unpersist(blocking = false)
    ()
  }

  /** The reused physical plan (spec hook: exchange-free). */
  private[graft] def templatePlan
      : org.apache.spark.sql.execution.SparkPlan =
    current().pool.withInstance(())(_.df.queryExecution.executedPlan)

  /** The pattern's matching vocabulary terms, ascending — identical
    * to [[QueryEngine.wildcardTerms]] over the same store. */
  def lookup(pattern: String): Seq[String] = {
    require(pattern.contains("*"), "pattern needs at least one *")
    val st = current()
    val pat = pattern.toLowerCase(java.util.Locale.ROOT)
    val re = java.util.regex.Pattern
      .compile(QueryEngine.wildcardRegex(pat))
    val padded = s"$$$pat$$"
    val segGrams = padded.split("\\*", -1).toSeq
      .flatMap(seg =>
        (0 to seg.length - st.k).map(i => seg.substring(i, i + st.k)))
      .distinct
    if (segGrams.isEmpty)
      // all segments shorter than k: no gram narrows — the driver
      // dictionary verifies alone (zero jobs)
      st.vocab.filter(t => re.matcher(t).matches()).toSeq
    else {
      val set = new java.util.HashSet[UTF8String]()
      segGrams.foreach(g => set.add(UTF8String.fromString(g)))
      st.pool.withInstance(()) { t =>
        t.ref.set(set)
        t.df.collect()
          .filter(r => r.getLong(1) == segGrams.size &&
            re.matcher(r.getString(0)).matches())
          .map(_.getString(0)).sorted.toSeq
      }
    }
  }

  /** Served wildcard RETRIEVAL: expand, re-analyze with the indexing
    * pipeline, score through the held [[PointServer]]'s pooled
    * template — (docno, docid, score) rows equal to
    * [[QueryEngine.wildcardSearch]] on the same index + store. */
  def search(pattern: String): Seq[(Long, String, Double)] = {
    val ps = point.getOrElse(throw new IllegalStateException(
      "wildcard retrieval needs the PointServer scoring arm — " +
        "construct with point = Some(...)"))
    val stems = lookup(pattern)
      .flatMap(graft.text.TextPipeline.processContent).distinct
    ps.searchTerms(stems)
  }
}

/** LOADED wildcard serving — [[WildcardServer]] for nodes that can't
  * hold the vocabulary: nothing vocabulary-sized is cached. Held per
  * snapshot, O(part files) driver state only:
  *  - the store's per-file gram RANGES, derived by ONE narrow
  *    gram-column scan per store generation (the
  *    [[LoadedPointServer]] zone-map discipline; derived rather than
  *    manifest-read because the chargram table IS its store root and
  *    file surgery maintains it in place — the same on-the-fly
  *    routing [[CharKGramIndex.mergeIntoStore]] uses);
  *  - an LRU of prepared per-file-set plans (driver-updated
  *    [[RefSetContains]] gram set, exchange-free single-partition
  *    count — the routed prune happens at the FILE level, where a
  *    driver-ref predicate can't be pushed into parquet).
  *
  * Per query: route the pattern's segment grams to their covering
  * part files (driver arithmetic), scan ONLY those files through the
  * pooled plan, keep candidates holding every gram that pass the
  * anchored-regex verify — output-identical to
  * [[QueryEngine.wildcardTerms]] / [[WildcardServer.lookup]]
  * (spec-pinned; q09's oracle semantics). All-short-segment patterns
  * (no gram to narrow by) fall back to a full distinct-vocabulary
  * scan PER CALL — the deliberate price of not holding the
  * dictionary.
  *
  * STALENESS: the same [[DirVersion]]/[[graft.StoreGen]] stamp
  * discipline as every loaded server, revalidated per call — a
  * `mergeIntoStore`/`deleteDocs`/`updateDocs` under a live server
  * re-derives the ranges and re-routes on the very next lookup. */
final class LoadedWildcardServer(spark: SparkSession, cgDir: String,
                                 point: Option[PointServer] = None,
                                 defaultK: Int = 3) {

  private val hfs = new org.apache.hadoop.fs.Path(cgDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def storeVersion(): Long =
    DirVersion.of(hfs, cgDir,
      Seq(cgDir, s"$cgDir/${CharKGramIndex.VocabDfDir}",
        s"$cgDir/${CharKGramIndex.DeletedDocsDir}",
        s"$cgDir/${CharKGramIndex.AppliedOpsDir}"))

  private final case class Tmpl(
      ref: AtomicReference[java.util.HashSet[UTF8String]],
      df: org.apache.spark.sql.DataFrame)

  private final class State(val version: Long) {
    /** Sorted (lo, hi, file) gram ranges — O(files) driver state. */
    val ranges: Array[(String, String, String)] =
      CharKGramIndex.load(spark, cgDir)
        .select(col("gram"), input_file_name().as("file"))
        .groupBy(col("file"))
        .agg(min(col("gram")).as("lo"), max(col("gram")).as("hi"))
        .collect()
        .map(r => (r.getString(1), r.getString(2), r.getString(0)))
        .sortBy(_._1)

    /** Gram length from the range endpoints (grams are fixed-width
      * `$`-padded windows); empty store → the constructor default. */
    val k: Int = ranges.headOption.map(_._1.length).getOrElse(defaultK)

    val pool = new TemplatePool[Seq[String], Tmpl](buildTmpl,
      maxKeys = 32)
  }

  private def buildTmpl(files: Seq[String]): Tmpl = {
    val ref = new AtomicReference[java.util.HashSet[UTF8String]](
      new java.util.HashSet)
    val inGrams = Bridge.column(
      RefSetContains(Bridge.expression(col("gram")), ref))
    val df = spark.read.parquet(files: _*)
      .filter(inGrams)
      .select(explode(col("terms")).as("term"))
      .coalesce(1)
      .groupBy(col("term")).agg(count(lit(1)).as("ng"))
    df.queryExecution.executedPlan // plan + codegen at build
    Tmpl(ref, df)
  }

  private val stateRef = new AtomicReference[State](
    new State(storeVersion()))

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

  /** Drop the snapshot and re-derive the ranges NOW (the explicit
    * hammer for eventually consistent listings). */
  def refresh(): Unit = this.synchronized {
    stateRef.set(new State(storeVersion()))
    ()
  }

  /** The part files the pattern's lookup would scan (spec hook for
    * the routed-prune claim). */
  private[graft] def routedFiles(pattern: String): Seq[String] = {
    val st = current()
    val pat = pattern.toLowerCase(java.util.Locale.ROOT)
    val padded = s"$$$pat$$"
    padded.split("\\*", -1).toSeq
      .flatMap(seg =>
        (0 to seg.length - st.k).map(i => seg.substring(i, i + st.k)))
      .distinct
      .flatMap(g => Routing.route(st.ranges, g)).distinct.sorted
  }

  /** The pattern's matching vocabulary terms, ascending — identical
    * to [[QueryEngine.wildcardTerms]] / [[WildcardServer.lookup]]
    * over the same store. */
  def lookup(pattern: String): Seq[String] = {
    require(pattern.contains("*"), "pattern needs at least one *")
    val st = current()
    val pat = pattern.toLowerCase(java.util.Locale.ROOT)
    val re = java.util.regex.Pattern
      .compile(QueryEngine.wildcardRegex(pat))
    val padded = s"$$$pat$$"
    val segGrams = padded.split("\\*", -1).toSeq
      .flatMap(seg =>
        (0 to seg.length - st.k).map(i => seg.substring(i, i + st.k)))
      .distinct
    if (segGrams.isEmpty)
      // all segments shorter than k: nothing narrows — the un-cached
      // arm pays a full distinct-vocabulary scan per call
      CharKGramIndex.load(spark, cgDir)
        .select(explode(col("terms")).as("term")).distinct()
        .collect().map(_.getString(0))
        .filter(t => re.matcher(t).matches()).sorted.toSeq
    else {
      val files = segGrams
        .flatMap(g => Routing.route(st.ranges, g)).distinct.sorted
      if (files.isEmpty) Seq.empty // no file covers any gram
      else {
        val set = new java.util.HashSet[UTF8String]()
        segGrams.foreach(g => set.add(UTF8String.fromString(g)))
        st.pool.withInstance(files) { t =>
          t.ref.set(set)
          t.df.collect()
            .filter(r => r.getLong(1) == segGrams.size &&
              re.matcher(r.getString(0)).matches())
            .map(_.getString(0)).sorted.toSeq
        }
      }
    }
  }

  /** Served wildcard RETRIEVAL over the routed lookup — same scoring
    * tail as [[WildcardServer.search]]. */
  def search(pattern: String): Seq[(Long, String, Double)] = {
    val ps = point.getOrElse(throw new IllegalStateException(
      "wildcard retrieval needs the PointServer scoring arm — " +
        "construct with point = Some(...)"))
    val stems = lookup(pattern)
      .flatMap(graft.text.TextPipeline.processContent).distinct
    ps.searchTerms(stems)
  }
}
