package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Bpe, CrossHash}

/** Merge-depth scaling measurement for the distributed BPE trainer
  * (SCALING.md round-9): [[graft.ops.Bpe.Merges]] = 10 certifies the
  * algorithm; a real tokenizer trains hundreds of rules. This runs
  * `train(merges)` at several depths over an amplified corpus (the
  * rot-cipher copies multiply the 31-word synthetic vocabulary, so
  * deep merge chains have pairs to consume) and times:
  *
  *  - the TRAIN loop per depth, split into first-half vs second-half
  *    per-merge cost — the vocab-bounded claim predicts ~flat
  *    per-merge cost as the chain deepens (each iteration is one
  *    vocab-table aggregation + a 1-row collect, independent of rank);
  *  - the APPLY fold ([[graft.ops.Bpe.subwordCounter]] — the shipped
  *    bpePack arithmetic) per depth over the full corpus — the
  *    replace-chain cost model is linear in rule count, amortized by
  *    the JVM fold.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 sbt "runMain graft.BpeProf 10 50 200"
  */
object BpeProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val depths = if (args.nonEmpty) args.map(_.toInt).toSeq
                 else Seq(10, 50, 200)
    val spark = ExtraConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.load(spark, sfDir, "documents")
    println(s"[bpeprof] corpus: ${docs.count()} docs, " +
      s"${docs.select(explode(CrossHash.tokensArrayFast(col("text"))))
        .distinct().count()} distinct words")
    // warmup: one small train compiles the codegen paths
    Bpe.train(spark, sfDir, merges = 2)
    depths.foreach { m =>
      // per-merge cost split: a separate half-depth train measures the
      // first m/2 merges (the loop is deterministic, so both runs do
      // identical work over that prefix); flat first-half vs full
      // per-merge cost = the vocab-bounded claim holds at depth
      val half = math.max(1, m / 2)
      val h0 = System.nanoTime()
      Bpe.train(spark, sfDir, merges = half)
      val tHalf = System.nanoTime() - h0
      val f0 = System.nanoTime()
      val (rules, _) = Bpe.train(spark, sfDir, merges = m)
      val tFull = System.nanoTime() - f0
      println(f"[bpeprof] train m=$m%4d: full ${tFull / 1e9}%7.2f s " +
        f"(${tFull / 1e6 / m}%6.1f ms/merge), first $half merges " +
        f"${tHalf / 1e9}%7.2f s (${tHalf / 1e6 / half}%6.1f ms/merge)")
      // APPLY cost at this depth: the shipped subword fold over the
      // full corpus (the aggregate forces it; the total is a sanity
      // anchor — deeper chains must never INCREASE token counts)
      val counter = Bpe.subwordCounter(rules)
      System.gc()
      val a0 = System.nanoTime()
      val total = docs
        .select(counter(CrossHash.tokensArrayFast(col("text"))).as("n"))
        .agg(sum(col("n"))).head().getLong(0)
      val aSec = (System.nanoTime() - a0) / 1e9
      println(f"[bpeprof] apply m=$m%4d rules: $aSec%7.2f s " +
        f"($total%d subword tokens)")
    }
    spark.stop()
  }
}
