package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.CrossHash
import graft.text.PorterStemmer

/** The native Catalyst expressions must agree exactly with their
  * reference implementations (the fold expression that defines the
  * DuckDB-oracle semantics, and the pure Scala stemmer). The shared
  * test session is built WITH GraftExtensions, so SQL-name resolution
  * itself exercises the injectFunction path. */
class GraftFunctionsSpec extends SparkSpec {

  test("graft_polyhash matches the reference fold on the vocabulary") {
    import spark.implicits._
    val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(split(lower(col("text")), " ")).as("s"))
      .distinct()
    val mismatches = df.select(col("s"),
        CrossHash.polyHash(col("s"), CrossHash.PM).as("ref"),
        GraftFunctions.polyhash(col("s"), CrossHash.PM).as("native"))
      .filter(col("ref") =!= col("native"))
      .count()
    assert(mismatches == 0)
    // pinned value cross-checked with DuckDB: hash('abc') chain
    val v = Seq("abc").toDF("s")
      .select(GraftFunctions.polyhash(col("s"), 1000000007L)).head().getLong(0)
    assert(v == 96354L)
  }

  test("graft_stem_native matches PorterStemmer") {
    import spark.implicits._
    val words = Seq("running", "generously", "communication", "skis", "abc")
    val got = words.toDF("w")
      .select(GraftFunctions.stemNative(col("w")))
      .collect().map(_.getString(0)).toSeq
    assert(got == words.map(PorterStemmer.stem))
  }

  test("functions resolve by SQL name via extensions") {
    val r = spark.sql(
      "SELECT graft_polyhash('abc', CAST(1000000007 AS BIGINT)) AS h, " +
        "graft_stem_native('running') AS s").head()
    assert(r.getLong(0) == 96354L)
    assert(r.getString(1) == "run")
  }

  test("expressions stay inside WholeStageCodegen (no udf fence)") {
    // parquet-backed input: literals would constant-fold to a
    // LocalTableScan (which is itself proof of native evaluation)
    val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(GraftFunctions.polyhash(col("text"), CrossHash.PM).as("h"))
      .filter(col("h") >= 0)
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_polyhash"), plan)
    assert(plan.contains("*(1) Filter"), plan)
    assert(df.count() > 0)
  }

  test("graft_topk equals the row_number window on randomized data " +
    "(ties, duplicates, skewed groups)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    GraftFunctions.register(spark)
    val rowGen = for {
      g <- Gen.chooseNum(0L, 7L)
      // small score domain forces plenty of exact ties
      s <- Gen.chooseNum(0, 5).map(_ * 0.5)
      i <- Gen.chooseNum(0L, 1000L)
    } yield (g, s, i)
    val rows = (0 until 400).flatMap(n =>
      rowGen.apply(Gen.Parameters.default, Seed(n.toLong)))
    // duplicate (score, id) pairs within a group are possible above —
    // the window then numbers them distinctly while the heap keeps
    // both; dedup to keep the comparison well-defined
    val df = rows.distinct.toDF("g", "s", "i")
    val viaAgg = df.groupBy("g")
      .agg(GraftFunctions.topkBy(col("s"), col("i"), 3).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rn"),
        col("col.id").as("i"), col("col.score").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val viaWindow = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("s").desc, col("i"))))
      .filter(col("rn") <= 3)
      .select(col("g"), col("rn").cast("long"), col("i"), col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("graft_topk orders NaN scores like a DESC window (retention " +
    "and presentation agree)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Double.NaN, 10L), (1L, 5.0, 11L), (1L, 3.0, 12L),
      (2L, 1.0, 20L), (2L, 2.0, 21L))
      .toDF("g", "s", "i")
    val got = df.groupBy("g")
      .agg(GraftFunctions.topkBy(col("s"), col("i"), 2).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col.id").as("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // group 1: NaN ranks FIRST (window DESC order), 5.0 second,
    // 3.0 evicted; group 2: 2.0 then 1.0
    assert(got == Set((1L, 0, 10L), (1L, 1, 11L),
      (2L, 0, 21L), (2L, 1, 20L)), s"got $got")
  }
}
