package graft

import graft.queries.{IrSql, Relational}
import graft.ops.{Dedup, Similarity}

/** Physical-plan assertions: the scale properties claimed in the
  * operator docs must actually appear in the executed plan — filters
  * and projections reach the parquet scan, small dims broadcast, top-k
  * compiles to TakeOrderedAndProject, narrow pipelines don't shuffle.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("Q1 scan: filter pushed down, only needed columns read") {
    val p = plan(Relational.q01ScanFilter(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"),
      s"missing pushdown in:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string,n_chars:bigint>"),
      s"column pruning failed in:\n$p")
  }

  test("Q11 join: bounded dim is broadcast, price filter pushed to scan") {
    val p = plan(Relational.q11Join(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,400000.0)"),
      s"price filter not pushed in:\n$p")
  }

  test("Q18 top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan(Relational.q18TopK(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), s"top-k not heap-based:\n$p")
    assert(!p.replace("TakeOrderedAndProject", "").contains("Sort "),
      s"unexpected full sort in:\n$p")
  }

  test("Q18b per-group top-k: bounded-heap ObjectHashAggregate " +
    "partial/final pair, no window sort") {
    val p = plan(Relational.q18TopKGroup(spark, dir))
    assert(p.contains("ObjectHashAggregate"), s"no object agg in:\n$p")
    assert("partial_graft_topk".r.findAllIn(p).nonEmpty,
      s"no map-side partial top-k in:\n$p")
    assert(!p.contains("Window"), s"window leaked into:\n$p")
    // agreement with the window form (same desc-score asc-key order)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Tables.load(spark, dir, "orders")
      .withColumn("rn", row_number().over(Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn").cast("long").as("rn"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")
      .collect().toSeq
    val a = Relational.q18TopKGroup(spark, dir).collect().toSeq
    assert(a == w)
  }

  test("Q13 agg: partial aggregation before the shuffle") {
    val p = plan(Relational.q13Revenue(spark, dir))
    assert(p.contains("HashAggregate(keys=[l_orderkey"), p)
    // partial + final pair
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("tf-idf query: postings filter applied before aggregation, " +
    "stats joined broadcast") {
    val p = plan(IrSql.q10TfIdf(spark, dir))
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin")
      || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ANN top-k: single narrow scan + broadcast query vector + heap") {
    val p = plan(Similarity.annTopK(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("exact dedup: one shuffle on the digest, partial agg first") {
    val p = plan(Dedup.exact(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("minhash LSH candidates come from an equi-join, not a cross join") {
    val p = plan(Dedup.minhashLsh(spark, dir))
    // the wide signature build has NO row-exploding perm cross join
    // (16 min-aggregates in one HashAggregate) and candidate
    // generation + re-score are pure equi-joins
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"nested-loop join leaked in:\n$p")
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(p).nonEmpty, s"no equi-join for candidates:\n$p")
  }

  test("span dedup: pruned scan, partial agg on gram, no nested-loop join") {
    val p = plan(Dedup.spanDedup(spark, dir))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"span scan not pruned to (doc_id, text):\n$p")
    assert(p.contains("partial_count"), s"no partial agg in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in span plan:\n$p")
  }

  test("span apply: the interval strip is a per-row filter, " +
    "no inequality join") {
    val p = plan(Dedup.spanDedupApply(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"range-predicate join materialized in apply plan:\n$p")
  }

  test("positional build: no shuffle anywhere in the postings lineage") {
    // build() persists postings; the cached build lineage sits under
    // the InMemoryRelation — assert on the UNCACHED equivalent plan,
    // which is what the cache materializes from (STATE.md gotcha:
    // plan strings of cached frames show the stored lineage)
    import org.apache.spark.sql.functions._
    graft.text.TextPipeline.register(spark)
    val c = graft.queries.IrEngine.corpus(spark, dir)
    val ix = graft.index.PositionalIndex.build(spark, c)
    val p = ix.postings.queryExecution.withCachedData.toString
    assert(p.contains("InMemoryRelation"), s"postings not cached:\n$p")
    // the size-guarded docMap BROADCAST is expected; the claim is that
    // the per-doc positional grouping shuffles nothing
    assert(!p.contains("ShuffleExchange") &&
      !p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning"),
      s"shuffle in the positional build lineage:\n$p")
    ix.postings.unpersist(); ix.docMap.unpersist(); ()
  }

  test("past BroadcastDocs the corpus join plans NO broadcast exchange") {
    import org.apache.spark.sql.functions._
    val corpus = spark.range(20)
      .select(concat(lit("D"), col("id")).as("docid"),
        lit("alpha beta").as("content"))
    val dm = spark.range(20)
      .select(concat(lit("D"), col("id")).as("docid"), col("id").as("docno"))
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      // emulate the corpus-sized docMap: stats-based broadcast election
      // is off, so ONLY the guard's hint could introduce an exchange
      spark.conf.set(key, "-1")
      val small = plan(graft.index.InvertedIndex
        .corpusDocJoin(corpus, dm, nDocs = 20))
      assert(small.contains("BroadcastExchange"),
        s"guarded hint missing below the bound:\n$small")
      val large = plan(graft.index.InvertedIndex.corpusDocJoin(
        corpus, dm, nDocs = graft.index.InvertedIndex.BroadcastDocs + 1))
      assert(!large.contains("BroadcastExchange"),
        s"corpus-sized broadcast reintroduced past the bound:\n$large")
    } finally spark.conf.set(key, prev)
  }

  test("IVF cell assignment: max(struct) argmax aggregation, no window") {
    val p = plan(Similarity.ivfCells(spark, dir))
    assert(!p.contains("Window"), s"window argmax leaked back into:\n$p")
    // map-side partial max collapses each vector to one candidate
    // before the single shuffle on vec_id
    assert("partial_max".r.findAllIn(p).nonEmpty,
      s"no map-side partial argmax in:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"centroids not broadcast in:\n$p")
  }

  test("phrase over an APPENDED positional store: term filters still " +
    "reach the parquet scan (zone-map pruning survives the " +
    "multi-generation layout)") {
    import org.apache.spark.sql.functions._
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select(format_string("D%05d", col("doc_id")).as("docid"),
        col("text").as("content"))
    val ids = corpus.select("docid").orderBy("docid").collect()
      .map(_.getString(0))
    val half = ids(ids.length / 2)
    val store = java.nio.file.Files
      .createTempDirectory("graft_plan_app").toString
    graft.index.PositionalIndex.write(
      graft.index.PositionalIndex.build(spark,
        corpus.filter(col("docid") <= half)), store)
    graft.index.PositionalIndex.appendToStore(spark, store,
      corpus.filter(col("docid") > half))
    val p = plan(graft.index.PositionalIndex.phrase(
      graft.index.PositionalIndex.load(spark, store), "agg hash window"))
    Seq("agg", "hash", "window").foreach { t =>
      assert(p.contains(s"EqualTo(term,$t)"),
        s"term filter for '$t' not pushed over the appended store:\n$p")
    }
  }
}
